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


def _sql_over_view(df: DataFrame, udtf_name, udtf_class, sql_template: str):
    """ONE copy of the UDTF-call scaffold: register the function, expose
    ``df`` under a per-call unique temp view (a shared name would race
    concurrent callers onto each other's DataFrame), run the SQL with
    ``{view}`` substituted, and drop the view — spark.sql resolves the
    plan eagerly, so the returned DataFrame no longer needs it."""
    spark = df.sparkSession
    spark.udtf.register(udtf_name, udtf_class)
    view = f"bdps_udtf_src_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(sql_template.format(view=view))
    finally:
        spark.catalog.dropTempView(view)


def ngram_explode_udtf(
    df: DataFrame, n: int = 3, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fan each document out to its word n-grams THROUGH the Python UDTF
    path (LATERAL join). Same output contract as the JVM transform/explode
    formulation — tests pin the two identical."""
    return _sql_over_view(
        df,
        "bdps_word_ngrams",
        WordNGrams,
        f"SELECT d.{id_col}, g.pos, g.ngram "
        f"FROM {{view}} d, LATERAL bdps_word_ngrams(d.{text}, {int(n)}) g",
    )


@udtf(returnType="user_id: bigint, event_id: bigint, gap_us: bigint")
class UserGaps:
    """U5: PARTITIONED TABLE-ARGUMENT UDTF — invoked as
    ``user_gaps(TABLE(v) PARTITION BY user_id ORDER BY ts, event_id)``.
    Spark instantiates one UDTF per partition and streams that user's rows
    in order, so plain per-instance state (the previous timestamp) is a
    correct sequential scan — the imperative escape hatch for per-key
    ordered logic that window functions can't express. Emits the exact
    integer microsecond gap since the user's previous event (NULL for the
    first)."""

    def __init__(self):
        self._prev = None

    def eval(self, row):  # noqa: D102 - UDTF contract
        gap = None
        if self._prev is not None:
            d = row.ts - self._prev
            gap = (d.days * 86_400_000_000 + d.seconds * 1_000_000
                   + d.microseconds)
        self._prev = row.ts
        yield int(row.user_id), int(row.event_id), gap


def user_gaps_udtf(df: DataFrame) -> DataFrame:
    """Per-user ordered inter-event gaps through the partitioned
    table-argument UDTF path. Requires columns (user_id, event_id, ts).
    The ORDER BY list is parenthesized — the table-arg grammar requires
    it for multiple sort expressions."""
    return _sql_over_view(
        df,
        "bdps_user_gaps",
        UserGaps,
        "SELECT * FROM bdps_user_gaps(TABLE({view}) "
        "PARTITION BY user_id ORDER BY (ts, event_id))",
    )


def _masked_schema(fields):
    """string → masked string, integral → long passthrough; anything else
    is rejected loudly (masking a float/binary silently would be a lie)."""
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType, StringType, StructType,
    )

    out = StructType()
    for f in fields:
        if isinstance(f.dataType, StringType):
            out = out.add(f.name, "string")
        elif isinstance(f.dataType, (ByteType, ShortType, IntegerType, LongType)):
            out = out.add(f.name, "long")
        else:
            raise TypeError(
                f"mask_table_udtf: unsupported column type {f.dataType} "
                f"for {f.name!r} (string/integral only)"
            )
    return out


@udtf
class MaskStrings:
    """U6: POLYMORPHIC UDTF — no fixed returnType; ``analyze`` derives the
    output schema from whatever table the CALL SITE passes (same names,
    strings masked to first-2-chars + '***', integrals as long). The
    schema-adapts-to-input contract is what Spark 4's analyze() adds over
    a statically-typed UDTF: one masking function serves any table."""

    @staticmethod
    def analyze(t):  # noqa: D102 - AnalyzeArgument -> AnalyzeResult
        from pyspark.sql.functions import AnalyzeResult

        return AnalyzeResult(schema=_masked_schema(t.dataType.fields))

    def eval(self, row):  # noqa: D102 - UDTF contract
        out = []
        for v in row:
            if v is None or isinstance(v, int):
                out.append(v)
            else:
                out.append(v[:2] + "***")
        yield tuple(out)


def mask_table_udtf(df: DataFrame) -> DataFrame:
    """Schema-polymorphic masking through the analyze() UDTF path: the
    output schema is computed from ``df`` itself at plan time."""
    return _sql_over_view(
        df,
        "bdps_mask_strings",
        MaskStrings,
        "SELECT * FROM bdps_mask_strings(TABLE({view}))",
    )
