"""Cleaning / dedup / set-op operators (SURVEY §2.3) and the §1.4 semantics
fixes.

Reference evidence: clean_text at ai_powered_financial_analysis.py:230-235 and
py:340-343 (repeated py:502-505, py:629-632), trim py:230-232, dropDuplicates
py:244, positional union py:336/509/636. The engine implements the *intent*
(documented divergences: SURVEY §1.4) — e.g. deterministic dedup instead of
arbitrary-row dedup, unionByName instead of positional union, comma-stripping
money parser instead of cast-to-null.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: C1 regexes — must match the reference byte-for-byte (py:341-343):
#: lowercase → strip HTML-ish tags → strip non-alphanumeric/space.
_TAG_RE = "<[^>]*>"
_NON_ALNUM_RE = "[^a-zA-Z0-9\\s]"


def normalize_text_col(col: Column | str) -> Column:
    """C1 (py:340-343): lower → strip tags → strip punctuation. Same Java
    regex semantics as the reference's Spark regexp_replace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(F.lower(c), _TAG_RE, ""), _NON_ALNUM_RE, ""
    )


def clean_text(df: DataFrame, column: str, out: str | None = None) -> DataFrame:
    """C1 as a DataFrame transform (the reference mutates in place)."""
    return df.withColumn(out or column, normalize_text_col(column))


def trim_lower(df: DataFrame, columns: list[str]) -> DataFrame:
    """C2 (py:230-232): lower(trim(col)) on the named columns."""
    return df.withColumns({c: F.lower(F.trim(F.col(c))) for c in columns})


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """C3 (py:244): dropDuplicates on a key set — keeps an arbitrary row,
    exactly as the reference. Prefer dedup_deterministic for testable output."""
    return df.dropDuplicates(keys)


def dedup_deterministic(
    df: DataFrame, keys: list[str], tiebreak: list[str]
) -> DataFrame:
    """C3-det (SURVEY §1.4.5): keep exactly one row per key, chosen by the
    tiebreak ordering — window + row_number, one shuffle on the keys.
    At scale this is the same cost as dropDuplicates (hash shuffle on keys)
    but reproducible."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in tiebreak])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """C4 (py:336 positional union → engine intent, SURVEY §1.4.4):
    UNION ALL by column name, tolerating missing columns."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """C5: UNION (distinct)."""
    return a.unionByName(b).distinct()


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """C5: INTERSECT (distinct semantics, like SQL INTERSECT)."""
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """C5: EXCEPT (distinct semantics, like SQL EXCEPT). ``subtract`` drops
    every left row that appears in b at all; ``exceptAll`` would instead do
    bag subtraction, which is a different operator."""
    return a.subtract(b)


def except_all_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """C5b: EXCEPT ALL (bag subtraction)."""
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# §1.4 semantics fixes (money parsing, record ids, null-default ordering)
# --------------------------------------------------------------------------

def parse_money(col: Column | str, default: float | None = None) -> Column:
    """§1.4.1+§1.4.3: parse comma-formatted decimals ("559,365,151.11").
    The reference casts the raw string → null (py:246, ipynb cell 22); the
    intent per Report.pdf §Experiments-1 is numeric parsing. Parse first,
    then coalesce the default (the reference null-defaulted *before* the
    cast, which never fired)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_cast, not cast: under ANSI semantics (Spark 4 default) a garbage
    # value ('N/A', stray unicode quotes in the real SEC feed) must become
    # NULL → default, not fail the job 90 TB into a scan.
    parsed = F.regexp_replace(c, ",", "").try_cast("double")
    if default is not None:
        parsed = F.coalesce(parsed, F.lit(float(default)))
    return parsed


def record_id(*cols: str) -> Column:
    """§1.4.2: stable string record id. The reference used numeric `+` on
    strings (py:281-282) → always-null double; the intent is concatenation."""
    return F.concat_ws("_", *[F.col(c) for c in cols])


def nfc_normalize(
    df: DataFrame, column: str = "text", out: str | None = None
) -> DataFrame:
    """Unicode NFC canonicalization — the multilingual-curation step the
    byte-level fingerprints silently need: 'café' composed (U+00E9) and
    decomposed (e + U+0301) are the SAME text but different bytes, so
    exact dedup, MinHash shingles and md5 fingerprints all treat them as
    distinct documents until the corpus is canonicalized. Arrow-batched
    pandas UDF over Python's unicodedata (the JVM has no NFC builtin
    reachable from Spark SQL); probed byte-identical to DuckDB's
    ``nfc_normalize`` (utf8proc) across composed/decomposed Latin,
    canonical reordering of stacked combining marks, Hangul Jamo
    composition and singleton mappings (U+2126 Ohm → U+03A9 Omega), so
    the operator is oracle-checkable. Narrow map — no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # self-contained: imports inside, no module refs
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return df.withColumn(out or column, _nfc(F.col(column)))
