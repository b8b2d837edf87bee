"""UDF-surface (§2.9 U1/U2/U3) and IO roundtrip (S7–S9) tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_spark import io
from big_data_project_spark.functions.udafs import weighted_avg


def test_u1_row_udf_vs_u2_pandas_udf(spark):
    """U1 (scalar python UDF) and U2 (Arrow pandas UDF) must agree; the
    engine standard is U2 — U1 exists for parity with the reference's
    rdd.map (py:70)."""

    @F.udf(T.DoubleType())
    def net_u1(price, disc):
        return price * (1 - disc)

    @F.pandas_udf("double")
    def net_u2(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    df = spark.range(100).select(
        (F.col("id") * 1.5).alias("price"), (F.col("id") % 10 / 100).alias("disc")
    )
    a = df.select(net_u1("price", "disc").alias("v")).collect()
    b = df.select(net_u2("price", "disc").alias("v")).collect()
    assert [r.v for r in a] == pytest.approx([r.v for r in b])


def test_u3_udaf_matches_sql_formulation(spark, sf_dir):
    li = io.load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: r.weighted_price
        for r in li.groupBy("l_returnflag")
        .agg(weighted_avg("l_extendedprice", "l_quantity").alias("weighted_price"))
        .collect()
    }
    want = {
        r.l_returnflag: r.w
        for r in li.groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
             / F.sum("l_quantity")).alias("w")
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_sink_roundtrip(spark, sf_dir, tmp_path, fmt):
    """S7/S8/S9: write, re-read, count — the reference's own verification
    pattern (py:296-307), for every sink format."""
    df = io.load_table(spark, sf_dir, "nation")
    n = io.verify_roundtrip(spark, df, str(tmp_path / f"out_{fmt}"), fmt)
    assert n == df.count() > 0


def test_in_memory_source(spark):
    """S4 (py:83, py:151-154)."""
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = io.from_rows(spark, [(1, "a"), (2, "b")], schema)
    assert df.count() == 2 and df.schema == schema


def test_csv_reader_quoting(spark, tmp_path):
    """S1: embedded commas inside quotes survive (py:205-209)."""
    p = tmp_path / "q.csv"
    p.write_text('a,b\n"1,234.56",x\n')
    df = io.read_csv(spark, str(p))
    assert df.collect()[0].a == "1,234.56"

def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be invisible in the result set."""
    from big_data_project_spark.operators.relational import salted_join

    orders = io.load_table(spark, sf_dir, "orders")
    customer = io.load_table(spark, sf_dir, "customer")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(orders, customer, "o_custkey", "c_custkey", salt=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_canonicalize_url_branches(spark):
    from big_data_project_spark.operators import curation

    cases = [
        # scheme+host lowercased, www + default port stripped, fragment
        # dropped, tracking params dropped, params sorted, // collapsed,
        # trailing slash stripped
        ("HTTPS://WWW.Ex.COM:443/A//b/?utm_source=x&b=2&a=1#f",
         "https://ex.com/A/b?a=1&b=2"),
        # http default port; path case preserved
        ("http://Ex.com:80/Path/", "http://ex.com/Path"),
        # non-default port survives; empty path -> /
        ("https://ex.com:8443?b=1", "https://ex.com:8443/?b=1"),
        # ftp: no default-port rule (only http/https have one), port kept;
        # ref/fbclid/gclid dropped
        ("ftp://Ex.com:21/x?ref=a&fbclid=b&gclid=c&z=9",
         "ftp://ex.com:21/x?z=9"),
        # all params tracking -> query dropped entirely
        ("https://ex.com/x?utm_a=1&utm_b=2", "https://ex.com/x"),
        # bare root
        ("https://WWW.EX.com", "https://ex.com/"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    got = df.select(
        "expected", curation.canonicalize_url("url").alias("canonical")
    ).collect()
    for r in got:
        assert r.canonical == r.expected, (r.canonical, r.expected)


def test_dedup_by_url_keeps_smallest_id(spark):
    from big_data_project_spark.operators import curation

    rows = [
        (3, "https://ex.com/a?b=2&a=1"),
        (1, "HTTPS://WWW.ex.com:443/a/?a=1&b=2&utm_x=1#frag"),
        (2, "https://ex.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = curation.dedup_by_url(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].canonical_url == "https://ex.com/a?a=1&b=2"


def test_udtf_ngrams_equals_jvm_explode(spark, sf_dir):
    """The Python UDTF fan-out must agree row-for-row with the JVM
    transform/explode formulation (the hot-path twin)."""
    from pyspark.sql import functions as F

    from big_data_project_spark import io
    from big_data_project_spark.functions.udtfs import ngram_explode_udtf
    from big_data_project_spark.operators.text import words_col

    docs = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {(r.doc_id, r.pos, r.ngram) for r in ngram_explode_udtf(docs, 3).collect()}
    jvm = docs.select(
        "doc_id", words_col("text").alias("w")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(CASE WHEN size(w) >= 3 THEN sequence(0, size(w) - 3)"
                " ELSE CAST(array() AS array<int>) END,"
                " i -> struct(i AS pos,"
                " concat_ws(' ', w[i], w[i+1], w[i+2]) AS ngram))"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").cast("int").alias("pos"), "g.ngram")
    want = {(r.doc_id, r.pos, r.ngram) for r in jvm.collect()}
    assert got == want


def test_udtf_ngrams_short_and_empty_docs(spark):
    from big_data_project_spark.functions.udtfs import ngram_explode_udtf

    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None), (4, "  x   y  z ")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.pos, r.ngram) for r in ngram_explode_udtf(df, 3).collect()}
    assert rows == {(4, 0, "x y z")}


def test_read_csv_audited_quarantines_malformed(spark, tmp_path):
    from pyspark.sql import types as T

    from big_data_project_spark import io

    p = tmp_path / "feed.csv"
    p.write_text(
        "k,v,amount\n"
        "1,alpha,10.5\n"
        "2,beta,not_a_number\n"      # type breakage → corrupt
        "3,\"gamma, quoted\",7.25\n"  # embedded comma, clean
        "4,delta\n"                   # missing column → corrupt
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = io.read_csv_audited(spark, str(p), schema)
    clean, bad = io.split_corrupt(df)
    got = {(r.k, r.v, r.amount) for r in clean.collect()}
    assert got == {(1, "alpha", 10.5), (3, "gamma, quoted", 7.25)}
    raw = {r.raw_line for r in bad.collect()}
    assert raw == {"2,beta,not_a_number", "4,delta"}
    df.unpersist()


def test_read_json_audited_quarantines_malformed(spark, tmp_path):
    from pyspark.sql import types as T

    from big_data_project_spark import io

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"k": 1, "v": "alpha"}\n'
        '{"k": 2, "v": "beta"'       # truncated JSON → corrupt
        "\n"
        'not json at all\n'          # garbage line → corrupt
        '{"k": 3, "v": "gamma"}\n'
    )
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = io.read_json_audited(spark, str(p), schema)
    clean, bad = io.split_corrupt(df)
    assert {(r.k, r.v) for r in clean.collect()} == {(1, "alpha"), (3, "gamma")}
    raw = {r.raw_line for r in bad.collect()}
    assert raw == {'{"k": 2, "v": "beta"', "not json at all"}
    df.unpersist()


def test_write_parquet_observed_single_pass_metrics(spark, sf_dir, tmp_path):
    """observe() must report the write's own row count and null counts —
    no second scan — and agree with a ground-truth recount."""
    from big_data_project_spark import io

    df = io.load_table(spark, sf_dir, "orders").withColumn(
        "maybe_null",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderstatus")),
    )
    path = str(tmp_path / "observed")
    m = io.write_parquet_observed(df, path, metric_cols=["maybe_null", "o_orderkey"])
    back = spark.read.parquet(path)
    assert m["n_rows"] == back.count()
    assert m["n_null_maybe_null"] == back.where(F.col("maybe_null").isNull()).count()
    assert m["n_null_o_orderkey"] == 0


def test_xml_roundtrip_with_special_chars(spark, tmp_path):
    """XML roundtrip must escape markup-significant characters; schema'd
    read returns them byte-identical."""
    from big_data_project_spark import io as eio

    df = spark.createDataFrame(
        [(1, 'a < b & "c" > d'), (2, None), (3, "plain")],
        "k long, v string",
    )
    path = str(tmp_path / "xmlrt")
    eio.write_xml(df, path)
    back = eio.read_xml(spark, path, schema="k long, v string")
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (1, 'a < b & "c" > d'),
        (2, None),
        (3, "plain"),
    ]
