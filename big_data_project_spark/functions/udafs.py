"""Pandas-UDAF surface (SURVEY §2.9 U3).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers the
eval type from *live* annotations, and PEP-563 stringification breaks it."""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# returnType must be a DataType instance, not a DDL string: string parsing
# requires an active SparkSession at import time.
@pandas_udf(DoubleType())
def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
    """GROUPED_AGG UDAF: Σ(value·weight) / Σweight, Arrow-batched per group."""
    den = weight.sum()
    return float((value * weight).sum() / den) if den else float("nan")
