"""U4: real Python UDTFs (Spark 4 table-function surface).

The engine's one-row→many ops are normally JVM explodes (text.py — U4's
fast path); this module exercises the actual Python UDTF execution path
(driver registers the class, executors stream rows through a Python worker,
LATERAL join fans results out) so the surface itself is covered and
hash-verified, not just emulated. Reference parity: the NER chunking shape
(one doc → many entities, ai_powered_financial_analysis.py:348-352).

UDTFs run row-at-a-time in Python — keep them OFF 100 TB hot paths (use the
explode/posexplode formulation there); they exist for logic that genuinely
needs imperative Python per row.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


#: Java's \s character class — ASCII only. Python's str.split()/re \s are
#: Unicode-aware, which would diverge from the JVM twin (words_col) and
#: the DuckDB oracle on e.g. non-breaking spaces in web text.
_JVM_WS = re.compile(r"[ \t\n\x0b\f\r]+")

#: per-call temp-view sequence (process-unique names)
_VIEW_SEQ = itertools.count()


@udtf(returnType="pos: int, ngram: string")
class WordNGrams:
    """Sliding word n-grams with positions — deterministic, so the UDTF
    path can be value-hashed against a pure-SQL mirror. Tokenization
    matches Java's ``\\s+`` exactly (ASCII whitespace), not Python's
    Unicode split."""

    def eval(self, text: str, n: int):  # noqa: D102 - UDTF contract
        ws = [w for w in _JVM_WS.split(text or "") if w]
        for i in range(max(0, len(ws) - n + 1)):
            yield i, " ".join(ws[i : i + n])


def ngram_explode_udtf(
    df: DataFrame, n: int = 3, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fan each document out to its word n-grams THROUGH the Python UDTF
    path (LATERAL join). Same output contract as the JVM transform/explode
    formulation — tests pin the two identical."""
    spark = df.sparkSession
    spark.udtf.register("bdps_word_ngrams", WordNGrams)
    # unique per call: a shared name would race concurrent callers onto
    # each other's DataFrame; dropped right after — spark.sql resolves
    # the plan eagerly, so the returned DataFrame no longer needs it
    view = f"bdps_udtf_src_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT d.{id_col}, g.pos, g.ngram "
            f"FROM {view} d, LATERAL bdps_word_ngrams(d.{text}, {int(n)}) g"
        )
    finally:
        spark.catalog.dropTempView(view)
