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

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, ngram: string")
class WordNGrams:
    """Sliding word n-grams with positions — deterministic, so the UDTF
    path can be value-hashed against a pure-SQL mirror."""

    def eval(self, text: str, n: int):  # noqa: D102 - UDTF contract
        ws = [w for w in (text or "").split() if w]
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
    view = f"bdps_udtf_src_{abs(hash((id_col, text, n))) % 10**8}"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.{id_col}, g.pos, g.ngram "
        f"FROM {view} d, LATERAL bdps_word_ngrams(d.{text}, {int(n)}) g"
    )
