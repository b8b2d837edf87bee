"""Row-wise and vectorized UDF surface (SURVEY §2.9 U1/U2, P6).

Deterministic string/integer transforms so both UDF execution paths are
driver-oracle-checkable (the semantics are mirrorable in ANSI SQL even though
execution goes through the Python worker / Arrow batches).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers the
eval type from *live* annotations, and PEP-563 stringification breaks it.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import LongType, StringType


@udf(StringType())
def tag_name(name):
    """U1/P6: row-at-a-time Python UDF — deterministic string transform
    (upper + length suffix). Kept OFF the hot path by design: this is the
    slow row-per-row pickled boundary the engine avoids; it exists to prove
    the escape hatch works."""
    if name is None:
        return None
    return name.upper() + ":" + str(len(name))


@pandas_udf(LongType())
def scaled_qty(qty: pd.Series, line: pd.Series) -> pd.Series:
    """U2: vectorized (Arrow-batched) scalar pandas UDF — integer-exact
    arithmetic (qty*10 + linenumber), ~10-100x the row UDF's throughput."""
    return (qty.astype("int64") * 10 + line.astype("int64")).astype("int64")


def arrow_text_stats(df):
    """U7: mapInArrow — the Arrow-NATIVE batch boundary (RecordBatch in,
    RecordBatch out; no pandas materialization at all, unlike
    mapInPandas). The cheapest Python escape hatch for columnar logic:
    pyarrow.compute kernels run vectorized in C++, and only Arrow buffers
    cross the process boundary. Emits (doc_id, n_chars, n_bytes) — code
    points vs utf8 bytes, both integer-exact and SQL-mirrorable.
    Input column pruning still applies: select before calling."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = "doc_id long, n_chars long, n_bytes long"

    def stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_bytes"],
            )

    return df.select("doc_id", "text").mapInArrow(stats, schema)


def _arrow_udfs():
    """U8: scalar Arrow UDFs (Spark 4.1 ``arrow_udf``) — column-level
    sibling of mapInArrow: per-expression pyarrow.compute kernels with no
    pandas hop, usable anywhere a Column fits. Built lazily so importing
    this module never requires the arrow_udf symbol at collection time."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    # DataType objects, not DDL strings: the string form parses through an
    # ACTIVE session at decoration time and fails without one
    @arrow_udf(LongType())
    def utf8_bytes(v: pa.Array) -> pa.Array:
        return pc.cast(pc.binary_length(v), pa.int64())

    @arrow_udf(LongType())
    def digit_count(v: pa.Array) -> pa.Array:
        return pc.cast(pc.count_substring_regex(v, "[0-9]"), pa.int64())

    return utf8_bytes, digit_count
