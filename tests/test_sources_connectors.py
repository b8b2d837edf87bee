"""Python Data Source connectors (S5/S6): fixture-mode parity with the
plain JSON-lines reader, partition fan-out, and the streaming poll."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from big_data_project_spark import io
from big_data_project_spark.pipelines import social
from big_data_project_spark.sources import register_connectors

CNBC_1 = "/root/reference/CNBC_financial_news_1.json"
CNBC_2 = "/root/reference/CNBC_financial_articles_2.json"
REDDIT = "/root/reference/reddit_posts.json"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cnbc_connector_matches_json_reader(spark):
    register_connectors(spark)
    via_source = spark.read.format("cnbc_articles").option(
        "path", f"{CNBC_1},{CNBC_2}"
    ).load()
    via_json = io.read_json(spark, CNBC_1, schema=social.CNBC_SCHEMA).unionByName(
        io.read_json(spark, CNBC_2, schema=social.CNBC_SCHEMA)
    )
    assert via_source.schema == via_json.schema
    assert _sorted_rows(via_source) == _sorted_rows(via_json)


def test_cnbc_connector_one_partition_per_file(spark):
    register_connectors(spark)
    df = spark.read.format("cnbc_articles").option(
        "path", f"{CNBC_1},{CNBC_2}"
    ).load()
    assert df.rdd.getNumPartitions() == 2


def test_reddit_connector_matches_json_reader(spark):
    register_connectors(spark)
    via_source = spark.read.format("reddit_posts").option("path", REDDIT).load()
    via_json = io.read_json(spark, REDDIT, schema=social.REDDIT_SCHEMA)
    assert via_source.schema == via_json.schema
    assert _sorted_rows(via_source) == _sorted_rows(via_json)
    assert via_source.count() == 500


def test_connector_feeds_unify_equals_file_pipeline(spark):
    """The end-to-end claim: connector-sourced feeds run through
    pipelines.social.unify and land IDENTICAL to the file-based pipeline
    (same doc_ids, same text) — a user can swap the ingestion path without
    touching anything downstream."""
    register_connectors(spark)
    cn = spark.read.format("cnbc_articles").option(
        "path", f"{CNBC_1},{CNBC_2}"
    ).load()
    cn = cn.select(
        "url",
        "title",
        F.try_to_timestamp(F.col("date"), F.lit("yyyy-MM-dd HH:mm:ss")).alias("ts"),
        F.col("content").alias("body"),
        F.lit("cnbc").alias("source"),
    )
    rd = spark.read.format("reddit_posts").option("path", REDDIT).load()
    rd = rd.select(
        F.col("URL").alias("url"),
        F.col("Title").alias("title"),
        social.parse_post_time("Post_Time").alias("ts"),
        F.lit(None).cast("string").alias("body"),
        F.lit("reddit").alias("source"),
    )
    got = social.unify(cn, rd)
    want = social.unify(
        social.load_cnbc(spark, CNBC_1, CNBC_2), social.load_reddit(spark, REDDIT)
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_reddit_stream_reader_polls_to_completion(spark, tmp_path):
    """Fixture-mode micro-batch poll: batch_size lines per trigger, offset
    advances by rows emitted, the exhausted source returns empty batches —
    processAllAvailable() terminates with every post delivered once."""
    register_connectors(spark)
    out = (
        spark.readStream.format("reddit_posts")
        .option("path", REDDIT)
        .option("batch_size", "150")
        .load()
        .writeStream.format("memory")
        .queryName("reddit_stream_tbl")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        out.processAllAvailable()
    finally:
        out.stop()
    got = spark.table("reddit_stream_tbl")
    want = io.read_json(spark, REDDIT, schema=social.REDDIT_SCHEMA)
    assert got.count() == 500
    assert _sorted_rows(got.select(*want.columns)) == _sorted_rows(want)


def test_reddit_stream_offset_resume(spark, tmp_path):
    """read(start) is a pure function of the offset: re-reading from a
    mid-stream offset re-emits the identical rows (replayability — the
    property that gives exactly-once into idempotent sinks)."""
    from big_data_project_spark.sources.connectors import _RedditStreamReader

    fixture = tmp_path / "mini.json"
    with open(fixture, "w") as fh:
        for i in range(7):
            fh.write(
                json.dumps(
                    {
                        "Title": f"t{i}",
                        "URL": f"u{i}",
                        "Upvotes": i,
                        "Comments_Count": 0,
                        "Post_Time": "2025-04-21 07:29:17",
                    }
                )
                + "\n"
            )
    r = _RedditStreamReader({"path": str(fixture), "batch_size": "3"})
    rows1, off1 = r.read(r.initialOffset())
    rows1 = list(rows1)
    assert len(rows1) == 3 and off1 == {"line": 3, "name": ""}
    rows1_replay = list(r.read(r.initialOffset())[0])
    assert rows1_replay == rows1
    rows2, off2 = r.read(off1)
    rows3, off3 = r.read(off2)
    assert len(list(rows2)) == 3 and len(list(rows3)) == 1
    assert off3 == {"line": 7, "name": ""}
    empty, off4 = r.read(off3)
    assert list(empty) == [] and off4 == off3


def test_connector_requires_a_mode(spark):
    register_connectors(spark)
    with pytest.raises(Exception, match="path=.*or"):
        spark.read.format("cnbc_articles").load().collect()
