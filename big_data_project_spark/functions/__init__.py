"""Column-function library — the engine's public expression surface.

Everything here is a pure ``Column -> Column`` builder (JVM-side, codegen'd,
UDF-free) collected from the operator families for direct use in ad-hoc
DataFrame code:

    from big_data_project_spark import functions as BF
    df.select(BF.normalize_text(F.col("title")), BF.parse_money("price"))
"""

from big_data_project_spark.operators.cleaning import (
    normalize_text_col as normalize_text,
)
from big_data_project_spark.operators.cleaning import parse_money, record_id
from big_data_project_spark.operators.dedup import hamming_distance, shingles_col
from big_data_project_spark.operators.multimodal import sniff_media_type
from big_data_project_spark.operators.relational import davg, dsum
from big_data_project_spark.operators.text import bpe_ish_token_count, words_col
from big_data_project_spark.operators.vector import cosine, dot, l2_sq, norm

__all__ = [
    "normalize_text",
    "parse_money",
    "record_id",
    "dsum",
    "davg",
    "words_col",
    "bpe_ish_token_count",
    "shingles_col",
    "hamming_distance",
    "sniff_media_type",
    "dot",
    "l2_sq",
    "cosine",
    "norm",
]
