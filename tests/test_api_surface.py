"""À-la-carte operator API: the registry proves families via op-tagged
composites, but the individual functions are the user-facing API — each
needs at least one direct behavioral test so none of them rots as dead
code behind its composite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_spark import io


def test_filter_rows_and_dedup_exact(spark, sf_dir):
    from big_data_project_spark.operators import cleaning, relational

    cust = io.load_table(spark, sf_dir, "customer")
    f = relational.filter_rows(cust, F.col("c_acctbal") > 0)
    assert f.count() == cust.where("c_acctbal > 0").count()

    dup = cust.limit(5).unionByName(cust.limit(5))
    assert cleaning.dedup_exact(dup, ["c_custkey"]).count() == 5


def test_except_all_multiset_semantics(spark):
    from big_data_project_spark.operators import cleaning

    a = spark.createDataFrame([(1,), (1,), (2,)], ["x"])
    b = spark.createDataFrame([(1,)], ["x"])
    got = sorted(r.x for r in cleaning.except_all_rows(a, b).collect())
    assert got == [1, 2]  # one copy of 1 survives (EXCEPT ALL, not EXCEPT)


def test_event_value_delta_and_rolling_spend(spark, sf_dir):
    from big_data_project_spark.operators import relational

    ev = io.load_table(spark, sf_dir, "events").limit(500)
    d = relational.event_value_delta(ev)
    # first event per user has NULL delta; all others are value - lag
    per_user = d.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("delta").isNull().cast("int")).alias("n_null"),
    )
    assert per_user.where("n_null != 1").count() == 0

    orders = io.load_table(spark, sf_dir, "orders")
    r = relational.rolling_order_spend(orders, frame=1000000)
    # with an effectively-unbounded frame the last row per customer equals
    # the customer's total spend
    w_tot = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("tot")
    )
    last = r.groupBy("o_custkey").agg(F.max("rolling_spend").alias("mx"))
    joined = w_tot.join(last, "o_custkey")
    assert joined.where(F.abs(F.col("tot") - F.col("mx")) > 0.02).count() == 0


def test_hamming_distance_column(spark):
    from big_data_project_spark.operators import dedup as dd

    df = spark.createDataFrame([(0b1011, 0b0011), (7, 7)], ["a", "b"])
    got = [r.d for r in df.select(dd.hamming_distance(F.col("a"), F.col("b")).alias("d")).collect()]
    assert got == [1, 0]


def test_bpe_ish_token_count(spark):
    from big_data_project_spark.operators import text as tx

    df = spark.createDataFrame(
        [("ab cd",), ("internationalization",)], ["text"]
    )
    got = [r.n for r in df.select(tx.bpe_ish_token_count("text").alias("n")).collect()]
    assert got[0] == 2          # two short words -> one token each
    assert got[1] == 5          # 20 chars -> ceil(20/4)


def test_sniff_media_type_magic(spark):
    from big_data_project_spark.operators import multimodal as mm

    rows = [
        (bytearray(b"\x89PNG\r\n\x1a\n...."),),
        (bytearray(b"plain text bytes"),),
    ]
    df = spark.createDataFrame(rows, "payload: binary")
    got = [r.t for r in df.select(mm.sniff_media_type("payload").alias("t")).collect()]
    assert got == ["image/png", "application/octet-stream"]


def test_hash_embed_unit_norm_and_determinism():
    from big_data_project_spark.plugins import hash_embed

    a = hash_embed("some text", dim=16)
    b = hash_embed("some text", dim=16)
    assert a == b and len(a) == 16
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9


def test_davg_is_decimal_exact(spark):
    from big_data_project_spark.operators import relational

    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], ["v"])
    got = df.agg(relational.davg("v", 1).alias("m")).collect()[0].m
    # each value rounds to exact decimal 0.1/0.2/0.3, the sum is exactly
    # decimal 0.6 regardless of order, and the final /3 happens once in
    # double — bit-identical to python 0.6/3
    assert got == 0.6 / 3


def test_connector_helpers_fail_loudly_offline():
    """The live-fetch helpers are real stdlib-urllib code now (not raising
    seams); in this offline container they must surface the network error
    untouched — never fabricate rows."""
    from urllib.error import URLError

    from big_data_project_spark import sources

    with pytest.raises((URLError, OSError, ValueError)):
        sources.fetch_cnbc_articles("https://localhost:1/index", "prefix")
    # base_url injected as unroutable so the test is environment-independent
    # (a networked host must not silently reach the real feed here)
    with pytest.raises((URLError, OSError, ValueError)):
        sources.fetch_reddit_posts("stocks", limit=5, base_url="https://localhost:1")


def test_driver_window_contract():
    """The driver records exactly the FIRST 50 registry entries: the
    curated _PRIORITY list must be exactly 50 names, be exactly the
    registry's head, and every window entry must carry a full value-hash
    oracle (a rows-only row in the window wastes a slot)."""
    import re

    from big_data_project_spark import registry as reg

    src = open(reg.__file__).read()
    names = re.findall(r'"([a-z0-9_]+)"', re.search(
        r"_PRIORITY = \[(.*?)\n\]", src, re.S).group(1))
    assert len(names) == 50
    assert list(reg.REGISTRY)[:50] == names
    rows_only = [n for n in names if reg.REGISTRY[n].oracle is None]
    assert rows_only == [], f"window slots without oracles: {rows_only}"
