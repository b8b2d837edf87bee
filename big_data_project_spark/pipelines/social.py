"""CNBC + Reddit normalization pipeline (ai_powered_financial_analysis.py:
99-174 Reddit, py:334-345 CNBC) — unify heterogeneous social/news feeds into
one document table shaped like the engine's ``documents`` schema.

Reference behaviors kept (with §1.4 fixes):
- CNBC arrives as two JSON files unioned positionally (py:336) → here
  unionByName with missing-column tolerance (§1.4.4).
- Reddit Post_Time arrives BOTH as ISO-8601 ("2025-04-19T19:41:52.000Z",
  raw file) and PRAW-formatted ("2025-04-21 07:29:17", py:120) → a
  coalesced two-format timestamp parse.
- clean_text (py:340-345) = the C1 normalize operator, applied to the body.
- Field coalescing (py:412-422): title/content candidates collapse to one
  text field; empty docs are dropped.

The external fetch itself (requests/PRAW, py:10-31/99-122) is a connector
*outside* the engine core (SURVEY §2.1 S5/S6): whatever lands as JSON-lines
is the engine's contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_spark import io
from big_data_project_spark.operators import cleaning

CNBC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

REDDIT_SCHEMA = T.StructType(
    [
        T.StructField("Title", T.StringType()),
        T.StructField("URL", T.StringType()),
        T.StructField("Upvotes", T.IntegerType()),
        T.StructField("Comments_Count", T.IntegerType()),
        T.StructField("Post_Time", T.StringType()),
    ]
)


def parse_post_time(col: str) -> F.Column:
    """Two-format timestamp parse: ISO-8601 with Z, or PRAW's
    '%Y-%m-%d %H:%M:%S' (py:120). try_to_timestamp: under ANSI semantics
    (Spark 4 default) a non-matching format must yield null for the
    coalesce, not an error."""
    return F.coalesce(
        F.try_to_timestamp(F.col(col), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSX")),
        F.try_to_timestamp(F.col(col), F.lit("yyyy-MM-dd HH:mm:ss")),
    )


def normalize_cnbc(df: DataFrame) -> DataFrame:
    """CNBC_SCHEMA-shaped rows → the unified feed projection. ONE copy of
    the normalization, whatever the ingestion path (file reader, in-memory
    rows, or the ``cnbc_articles`` Data Source)."""
    return df.select(
        F.col("url"),
        F.col("title"),
        # try_to_timestamp, not to_timestamp: under Spark 4 ANSI defaults a
        # single malformed date would abort the whole job; NULL-on-miss is
        # the pipeline contract (same rule parse_post_time documents)
        F.try_to_timestamp(F.col("date"), F.lit("yyyy-MM-dd HH:mm:ss")).alias("ts"),
        F.col("content").alias("body"),
        F.lit("cnbc").alias("source"),
    )


def normalize_reddit(df: DataFrame) -> DataFrame:
    """REDDIT_SCHEMA-shaped rows → the unified feed projection (single
    copy, any ingestion path)."""
    return df.select(
        F.col("URL").alias("url"),
        F.col("Title").alias("title"),
        parse_post_time("Post_Time").alias("ts"),
        F.lit(None).cast("string").alias("body"),
        F.lit("reddit").alias("source"),
    )


def load_cnbc(spark: SparkSession, *paths: str) -> DataFrame:
    """S2+C4 (py:334-338): read each JSON-lines file, union by name."""
    dfs = [io.read_json(spark, p, schema=CNBC_SCHEMA) for p in paths]
    return normalize_cnbc(cleaning.union_by_name(*dfs))


def load_reddit(spark: SparkSession, path: str) -> DataFrame:
    """S6-contract (py:151-165): normalize the PRAW projection."""
    return normalize_reddit(io.read_json(spark, path, schema=REDDIT_SCHEMA))


def unify(*feeds: DataFrame) -> DataFrame:
    """Normalize + coalesce text fields + drop empty docs; stable doc_id from
    the url (md5 prefix → long), mirroring the engine's documents schema."""
    df = cleaning.union_by_name(*feeds)
    text = F.trim(
        F.concat_ws(
            " ",
            F.coalesce(F.col("title"), F.lit("")),
            F.coalesce(F.col("body"), F.lit("")),
        )
    )
    out = (
        df.withColumn("text", F.trim(cleaning.normalize_text_col(text)))
        .where(F.length("text") > 0)
        .select(
            F.conv(F.substring(F.md5("url"), 1, 15), 16, 10)
            .cast("long")
            .alias("doc_id"),
            "url",
            "ts",
            "text",
            "source",
            # long, not int: DuckDB length() is BIGINT (determinism contract)
            F.length(F.col("text")).cast("long").alias("n_chars"),
        )
    )
    return out


def run(spark: SparkSession, cnbc_paths: list[str], reddit_path: str, out_path: str) -> int:
    docs = unify(load_cnbc(spark, *cnbc_paths), load_reddit(spark, reddit_path))
    io.write_parquet(docs, out_path)
    return spark.read.parquet(out_path).count()
