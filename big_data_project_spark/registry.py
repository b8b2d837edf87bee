"""Query registry — the driver-facing inventory.

Every implemented operator from SURVEY.md §2 registers here with
(a) a Spark builder `(spark, sf_dir) -> DataFrame`, and
(b) an ANSI-SQL oracle string DuckDB can run on the same parquet views
    (or None for non-SQL-expressible ops → driver does a rows-only check).

Column names are aliased identically on both sides (the driver sorts columns
by name before value-hashing). Float aggregates are rounded in the query on
BOTH sides so cross-engine summation-order noise cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_spark import io
from big_data_project_spark import streaming
from big_data_project_spark.operators import (
    cleaning,
    dedup,
    multimodal,
    rag,
    relational,
    text,
    vector,
)


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False  # included in bench.py
    note: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False, note: str = ""
):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, headline, note)
        return fn

    return deco


def _t(spark, sf_dir, name):
    return io.load_table(spark, sf_dir, name)


# ===========================================================================
# Flagship + scans (S3) + filters/projections (§2.2)
# ===========================================================================

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
                                                                        AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE)
                                                                        AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) / count(*)      AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark, sf_dir):
    """A2/A3/O1: TPC-H Q1-shape flagship aggregate."""
    return relational.pricing_summary(_t(spark, sf_dir, "lineitem"))


@register(
    "p5_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_returnflag IN ('A', 'R')
      AND l_quantity > 25
    """,
    headline=True,
)
def p5_filter_project(spark, sf_dir):
    """S3+P1+P5: parquet scan with pushed-down predicates + computed projection."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") > 25)
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@register(
    "p1_project_rename",
    oracle="""
    SELECT c_custkey AS customer_id,
           c_name    AS customer_name,
           c_mktsegment AS segment
    FROM customer
    """,
)
def p1_project_rename(spark, sf_dir):
    """P1 (ref py:267-280): select + rename."""
    return relational.project_rename(
        _t(spark, sf_dir, "customer"),
        {"c_custkey": "customer_id", "c_name": "customer_name", "c_mktsegment": "segment"},
    )


@register(
    "p2_record_id",
    oracle="""
    SELECT concat_ws('_', c_custkey, c_mktsegment) AS record_id, c_name
    FROM customer
    """,
)
def p2_record_id(spark, sf_dir):
    """P2+§1.4.2: derived string record id (intent of the reference's buggy
    numeric `+` at py:281-282)."""
    cust = _t(spark, sf_dir, "customer")
    return relational.with_derived(
        cust, "record_id", cleaning.record_id("c_custkey", "c_mktsegment")
    ).select("record_id", "c_name")


@register(
    "p3_p4_cast_null_default",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT)                       AS price_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)                AS order_day,
           coalesce(nullif(o_orderstatus, 'P'), 'unknown')           AS status_filled
    FROM orders
    """,
)
def p3_p4_cast_null_default(spark, sf_dir):
    """P3 casts (py:246-249, py:156) + P4 null-default (py:237-242)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("unknown")
        ).alias("status_filled"),
    )


@register(
    "p3_parse_money",
    oracle="""
    SELECT p_partkey,
           coalesce(CAST(regexp_replace(money_str, ',', '', 'g') AS DOUBLE), 0.0)
             AS parsed
    FROM (SELECT p_partkey,
                 CASE WHEN p_partkey % 7 = 0 THEN NULL
                      ELSE concat(CAST(p_partkey AS VARCHAR), ',', '234.56') END
                   AS money_str
          FROM part)
    """,
)
def p3_parse_money(spark, sf_dir):
    """§1.4.1: comma-formatted money parsing (the reference's cast-to-null
    bug, fixed). Comma-formatted strings are synthesized from part prices so
    the parser is exercised without external fixtures."""
    p = _t(spark, sf_dir, "part")
    money = p.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 7 == 0, F.lit(None)).otherwise(
            F.concat(F.col("p_partkey").cast("string"), F.lit(","), F.lit("234.56"))
        ).alias("money_str"),
    )
    return money.select(
        "p_partkey", cleaning.parse_money("money_str", default=0.0).alias("parsed")
    )


# ===========================================================================
# Aggregations (§2.7 A*)
# ===========================================================================

@register(
    "a1_counts",
    oracle="""
    SELECT l_returnflag, count(*) AS n_rows,
           count(DISTINCT l_partkey)  AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a1_counts(spark, sf_dir):
    return relational.counts(_t(spark, sf_dir, "lineitem"))


@register(
    "a4_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def a4_rollup(spark, sf_dir):
    return relational.rollup_agg(_t(spark, sf_dir, "orders"))


@register(
    "a4_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def a4_cube(spark, sf_dir):
    return relational.cube_agg(_t(spark, sf_dir, "orders"))


@register("a5_approx_distinct", oracle=None, note="HLL++ — bound-tested in pytest")
def a5_approx_distinct(spark, sf_dir):
    return relational.approx_distinct(_t(spark, sf_dir, "lineitem"))


# ===========================================================================
# Joins (§2.7 J*)
# ===========================================================================

@register(
    "j1_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    headline=True,
)
def j1_revenue_by_segment(spark, sf_dir):
    return relational.revenue_by_segment(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


@register(
    "j2_part_revenue_by_brand",
    oracle="""
    SELECT p_brand,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    headline=True,
)
def j2_part_revenue_by_brand(spark, sf_dir):
    return relational.part_revenue_by_brand(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


@register(
    "j3_customer_order_stats",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey) AS n_orders,
           coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 0.0) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def j3_customer_order_stats(spark, sf_dir):
    return relational.customer_order_stats(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register(
    "j4_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
)
def j4_semi(spark, sf_dir):
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return relational.customers_with_orders(_t(spark, sf_dir, "customer"), big)


@register(
    "j4_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
)
def j4_anti(spark, sf_dir):
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return relational.customers_without_orders(_t(spark, sf_dir, "customer"), big)


_BANDS = [
    ("budget", 0.0, 925.0),
    ("mid", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, 1e9),
]


@register(
    "j5_price_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('budget', 0.0, 925.0), ('mid', 925.0, 950.0),
               ('premium', 950.0, 975.0), ('luxury', 975.0, 1e9)
    )
    SELECT band, count(*) AS n_parts, CAST(sum(CAST(p_retailprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def j5_price_band_join(spark, sf_dir):
    bands = spark.createDataFrame(
        _BANDS,
        T.StructType(
            [
                T.StructField("band", T.StringType()),
                T.StructField("lo", T.DoubleType()),
                T.StructField("hi", T.DoubleType()),
            ]
        ),
    )
    return relational.price_band_join(_t(spark, sf_dir, "part"), bands)


@register(
    "j5_asof_join",
    oracle="""
    SELECT user_id, event_id, value, asof_event_id FROM (
        SELECT user_id, event_id, event_type, value,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_event_id
        FROM events)
    WHERE event_type = 'purchase'
    """,
)
def j5_asof_join(spark, sf_dir):
    return relational.asof_latest_event(_t(spark, sf_dir, "events"))


@register(
    "j6_cross_join",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def j6_cross_join(spark, sf_dir):
    return relational.region_nation_matrix(
        _t(spark, sf_dir, "region"), _t(spark, sf_dir, "nation")
    )


# ===========================================================================
# Windows + sort/top-k (§2.7 W*/O*)
# ===========================================================================

@register(
    "w1_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
    headline=True,
)
def w1_top_orders_per_customer(spark, sf_dir):
    return relational.top_orders_per_customer(_t(spark, sf_dir, "orders"))


@register(
    "w2_event_value_delta",
    oracle="""
    SELECT user_id, event_id, value,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
             AS delta
    FROM events
    """,
)
def w2_event_value_delta(spark, sf_dir):
    return relational.event_value_delta(_t(spark, sf_dir, "events"))


@register(
    "w3_rolling_order_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rolling_spend
    FROM orders
    """,
)
def w3_rolling_order_spend(spark, sf_dir):
    return relational.rolling_order_spend(_t(spark, sf_dir, "orders"))


@register(
    "o2_top_parts",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10
    """,
)
def o2_top_parts(spark, sf_dir):
    return relational.top_parts_by_price(_t(spark, sf_dir, "part"))


@register(
    "o1_ordered_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    ORDER BY l_shipdate DESC NULLS LAST, l_orderkey, l_linenumber
    LIMIT 1000
    """,
)
def o1_ordered_scan(spark, sf_dir):
    return relational.ordered_lineitems(_t(spark, sf_dir, "lineitem"))


# ===========================================================================
# Cleaning / set ops (§2.3)
# ===========================================================================

@register(
    "c3_dedup_deterministic",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               row_number() OVER (PARTITION BY c_mktsegment, c_nationkey
                                  ORDER BY c_custkey) AS rn
        FROM customer)
    WHERE rn = 1
    """,
)
def c3_dedup_deterministic(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    return cleaning.dedup_deterministic(
        cust, ["c_mktsegment", "c_nationkey"], ["c_custkey"]
    )


@register(
    "c4_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
    """,
)
def c4_union_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_orderstatus")
    b = o.where(F.col("o_totalprice") > 100000).select("o_orderkey", "o_orderstatus")
    return cleaning.union_by_name(a, b)


@register(
    "c5_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def c5_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return cleaning.intersect_rows(
        o.where("o_orderstatus = 'F'").select("o_custkey"),
        o.where("o_orderstatus = 'O'").select("o_custkey"),
    )


@register(
    "c5_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def c5_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return cleaning.except_rows(
        o.where("o_orderstatus = 'F'").select("o_custkey"),
        o.where("o_orderstatus = 'O'").select("o_custkey"),
    )


@register(
    "c5_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def c5_union_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return cleaning.union_distinct(
        o.where("o_orderstatus = 'F'").select("o_custkey"),
        o.where("o_orderstatus = 'O'").select("o_custkey"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def headline_queries() -> dict[str, Query]:
    return {name: q for name, q in REGISTRY.items() if q.headline}


# ===========================================================================
# Text / NLP-deterministic carriers (§2.4) + text-analysis closure
# ===========================================================================

# The synthetic corpus has no punctuation/HTML, so normalize/NER queries
# decorate the text in-query (identically on both sides) to exercise the
# regex semantics for real.
@register(
    "c1_normalize_text",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               lower(concat('<b>', upper(substr(text, 1, 10)), '</b>! @', text)),
               '<[^>]*>', '', 'g'),
             '[^a-zA-Z0-9\\s]', '', 'g') AS normalized
    FROM documents
    """,
)
def c1_normalize_text(spark, sf_dir):
    """C1 (ref py:340-343): lower → strip tags → strip punctuation, applied
    to deterministically-decorated text."""
    d = _t(spark, sf_dir, "documents")
    decorated = F.concat(
        F.lit("<b>"), F.upper(F.substring("text", 1, 10)), F.lit("</b>! @"), F.col("text")
    )
    return d.select(
        "doc_id", cleaning.normalize_text_col(decorated).alias("normalized")
    )


@register(
    "c2_trim_lower",
    oracle="""
    SELECT doc_id, lower(trim(concat('  ', upper(source), ' '))) AS src_clean
    FROM documents
    """,
)
def c2_trim_lower(spark, sf_dir):
    """C2 (ref py:230-232): lower(trim(col)) on padded/upper-cased input."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("  "), F.upper("source"), F.lit(" ")).alias("src_clean"),
    )
    return cleaning.trim_lower(d, ["src_clean"])


@register(
    "n3_coalesce_fields",
    oracle="""
    SELECT doc_id, coalesce(nullif(lang, 'en'), source) AS picked
    FROM documents
    """,
)
def n3_coalesce_fields(spark, sf_dir):
    """N3 (ref py:412-422): first-present of candidate fields."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.nullif(F.col("lang"), F.lit("en")).alias("cand1"),
        F.col("source").alias("cand2"),
    )
    return text.coalesce_fields(d, ["cand1", "cand2"], "picked").select(
        "doc_id", "picked"
    )


@register(
    "n4_assemble_doc",
    oracle="""
    SELECT doc_id,
           concat_ws(' ', source, coalesce(nullif(lang, 'zh'), '')) AS assembled
    FROM documents
    """,
)
def n4_assemble_doc(spark, sf_dir):
    """N4 (ref py:363-367): title + ' ' + content with null→''."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.nullif(F.col("lang"), F.lit("zh")).alias("content")
    )
    return text.assemble_doc_text(d, "source", "content", "assembled").select(
        "doc_id", "assembled"
    )


@register(
    "n5_token_stats",
    oracle="""
    SELECT doc_id,
           len(w) AS n_words,
           length(text) AS n_chars,
           len(list_distinct(w)) AS n_distinct_words,
           CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
             AS avg_word_len
    FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
          FROM documents)
    """,
)
def n5_token_stats(spark, sf_dir):
    """N5 (ref py:589-590): token/char/diversity stats."""
    return text.token_stats(_t(spark, sf_dir, "documents"))


@register(
    "n5_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(w,
                x -> CAST(greatest(1, ceil(length(x) / 4.0)) AS BIGINT)))
             AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM documents)
    """,
)
def n5_bpe_token_count(spark, sf_dir):
    """Token counting (BPE-ish subword correction) for budget estimation."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.bpe_ish_token_count("text").alias("n_tokens"))


@register(
    "n1_ner_gazetteer",
    oracle="""
    SELECT doc_id, unnest(regexp_extract_all(text,
           '\\b(spark|join|merge|window|stream|vector)\\b', 1)) AS entity
    FROM documents
    """,
)
def n1_ner_gazetteer(spark, sf_dir):
    """N1 deterministic carrier: gazetteer NER, one row per hit (U4)."""
    return text.ner_gazetteer(_t(spark, sf_dir, "documents"))


@register(
    "n1_ner_regex",
    oracle="""
    WITH decorated AS (
      SELECT doc_id,
             concat(text, ' $', CAST(doc_id AS VARCHAR), '.50 costs ',
                    CAST(n_chars AS VARCHAR), '% on 2024-01-15 says ',
                    upper(substr(source, 1, 3))) AS text
      FROM documents)
    SELECT doc_id, 'MONEY' AS entity_type,
           unnest(regexp_extract_all(text, '\\$[0-9][0-9,]*(?:\\.[0-9]+)?')) AS entity
    FROM decorated
    UNION ALL
    SELECT doc_id, 'PERCENT',
           unnest(regexp_extract_all(text, '[0-9]+(?:\\.[0-9]+)?%'))
    FROM decorated
    UNION ALL
    SELECT doc_id, 'DATE',
           unnest(regexp_extract_all(text, '[0-9]{4}-[0-9]{2}-[0-9]{2}'))
    FROM decorated
    UNION ALL
    SELECT doc_id, 'TICKER',
           unnest(regexp_extract_all(text, '\\b[A-Z]{2,5}\\b'))
    FROM decorated
    """,
)
def n1_ner_regex(spark, sf_dir):
    """N1 regex classes (MONEY/PERCENT/DATE/TICKER — the entity types
    validated in Report.pdf §Experiments-2), over decorated text."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" $"), F.col("doc_id").cast("string"), F.lit(".50 costs "),
            F.col("n_chars").cast("string"), F.lit("% on 2024-01-15 says "),
            F.upper(F.substring("source", 1, 3)),
        ).alias("text"),
    )
    return text.ner_regex(d)


@register(
    "n2_sentiment_lexicon",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\b(fast|big)\\b')) AS n_pos,
           len(regexp_extract_all(text, '\\b(slow|small|dup)\\b')) AS n_neg,
           len(regexp_extract_all(text, '\\b(fast|big)\\b'))
             - len(regexp_extract_all(text, '\\b(slow|small|dup)\\b')) AS score,
           CASE WHEN len(regexp_extract_all(text, '\\b(fast|big)\\b'))
                     > len(regexp_extract_all(text, '\\b(slow|small|dup)\\b'))
                THEN 'positive'
                WHEN len(regexp_extract_all(text, '\\b(fast|big)\\b'))
                     < len(regexp_extract_all(text, '\\b(slow|small|dup)\\b'))
                THEN 'negative' ELSE 'neutral' END AS sentiment
    FROM documents
    """,
)
def n2_sentiment_lexicon(spark, sf_dir):
    """N2 deterministic carrier: lexicon sentiment (claimed README.md:7,
    absent from reference code — see SURVEY §2.4)."""
    return text.sentiment_lexicon(_t(spark, sf_dir, "documents"))


@register(
    "tx_lang_id",
    oracle="""
    SELECT doc_id,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS detected_lang,
           greatest(s_en, s_de, s_es, s_fr) AS stopword_hits
    FROM (SELECT doc_id,
                 len(regexp_extract_all(text, '\\b(the|a|of|and|is)\\b'))   AS s_en,
                 len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS s_de,
                 len(regexp_extract_all(text, '\\b(el|la|de|y|es)\\b'))     AS s_es,
                 len(regexp_extract_all(text, '\\b(le|la|et|les|est)\\b'))  AS s_fr
          FROM documents)
    """,
)
def tx_lang_id(spark, sf_dir):
    """Language ID: stopword-hit argmax, deterministic tie-break."""
    return text.lang_id(_t(spark, sf_dir, "documents"))


@register(
    "tx_quality_score",
    oracle="""
    SELECT doc_id,
           len(w) AS n_words,
           CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|is)\\b')) AS DOUBLE)
             / len(w) AS stopword_ratio,
           CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS diversity,
           CASE WHEN len(w) >= 20 THEN 1 ELSE 0 END AS len_ok
    FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
          FROM documents)
    """,
)
def tx_quality_score(spark, sf_dir):
    """Quality heuristics for training-data filtering."""
    return text.quality_score(_t(spark, sf_dir, "documents"))


@register(
    "tx_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(lower(text), '<[^>]*>', '', 'g'),
               '[^a-zA-Z0-9\\s]', '', 'g')) AS fingerprint
    FROM documents
    """,
)
def tx_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of normalized text."""
    return text.fingerprint(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Dedup family (LLM-pipeline closure)
# ===========================================================================

@register(
    "dd_exact_groups",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
    )
    SELECT md5(regexp_replace(regexp_replace(lower(text), '<[^>]*>', '', 'g'),
               '[^a-zA-Z0-9\\s]', '', 'g')) AS content_hash,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM corpus GROUP BY 1
    """,
)
def dd_exact_groups(spark, sf_dir):
    """Exact dedup groups. The corpus has no native dups, so it is unioned
    with an id-shifted copy of itself — every group must come back with
    n_copies=2 and the original id as keeper."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return dedup.exact_dedup_groups(corpus)


@register(
    "dd_jaccard_top_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w) - 1),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
)
def dd_jaccard_top_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard, top-20 most similar pairs — the oracle for the
    MinHash-LSH scale path."""
    pairs = dedup.jaccard_pairs(_t(spark, sf_dir, "documents"))
    return pairs.orderBy(
        F.col("jaccard").desc(), F.col("id_a"), F.col("id_b")
    ).limit(20)


@register(
    "dd_minhash_lsh",
    oracle=None,
    note="recall-gated vs dd_jaccard_top_pairs in pytest (non-SQL hash fns)",
)
def dd_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs — the 100 TB dedup path."""
    return dedup.minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


@register(
    "dd_simhash",
    oracle=None,
    note="property-tested in pytest (bit ops not portable to duckdb SQL)",
)
def dd_simhash(spark, sf_dir):
    """SimHash 60-bit fingerprints."""
    return dedup.simhash(_t(spark, sf_dir, "documents"))


# ===========================================================================
# Vector similarity search (§2.5)
# ===========================================================================

_VEC_SCORE_L2 = """list_sum(list_transform(
        list_zip(CAST(embedding AS DOUBLE[]), CAST(q AS DOUBLE[])),
        s -> (s[1] - s[2]) * (s[1] - s[2])))"""
_VEC_SCORE_IP = "list_dot_product(CAST(embedding AS DOUBLE[]), CAST(q AS DOUBLE[]))"


@register(
    "e3_knn_l2",
    oracle=f"""
    WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label, {_VEC_SCORE_L2} AS score
    FROM embeddings, qv
    ORDER BY score, vec_id LIMIT 10
    """,
    headline=True,
)
def e3_knn_l2(spark, sf_dir):
    """E3 (FAISS IndexFlatL2, ref py:371-380): exact L2 top-k, distributed."""
    emb = _t(spark, sf_dir, "embeddings")
    return vector.knn_topk(emb, vector.query_vector_of(emb, 0), k=10, metric="l2")


@register(
    "e4_knn_ip",
    oracle=f"""
    WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label, {_VEC_SCORE_IP} AS score
    FROM embeddings, qv
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def e4_knn_ip(spark, sf_dir):
    """E4 (FAISS IndexFlatIP, ref py:429-430): exact inner-product top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    return vector.knn_topk(emb, vector.query_vector_of(emb, 0), k=10, metric="ip")


@register(
    "e4_knn_cosine",
    oracle=f"""
    WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           {_VEC_SCORE_IP}
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))))
             AS score
    FROM embeddings, qv
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def e4_knn_cosine(spark, sf_dir):
    """Cosine top-k (embedding-similarity dedup/search carrier)."""
    emb = _t(spark, sf_dir, "embeddings")
    return vector.knn_topk(emb, vector.query_vector_of(emb, 0), k=10, metric="cosine")


@register(
    "e6_knn_documents",
    oracle=f"""
    WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    hits AS (
      SELECT vec_id, {_VEC_SCORE_IP} AS score
      FROM embeddings, qv
      ORDER BY score DESC, vec_id LIMIT 5)
    SELECT h.vec_id, h.score, substr(d.text, 1, 100) AS snippet
    FROM hits h JOIN documents d ON h.vec_id = d.doc_id
    """,
)
def e6_knn_documents(spark, sf_dir):
    """E6 (ref py:380): map top-k hits back to document rows + truncate."""
    emb = _t(spark, sf_dir, "embeddings")
    hits = vector.knn_topk(emb, vector.query_vector_of(emb, 0), k=5, metric="ip")
    return vector.knn_join_documents(
        hits, _t(spark, sf_dir, "documents"), truncate=100
    ).select("vec_id", "score", "snippet")


@register(
    "e5_ann_lsh",
    oracle=None,
    note="recall@10 >= 0.9 vs e4_knn_cosine gated in pytest",
)
def e5_ann_lsh(spark, sf_dir):
    """E5 (FAISS IVFFlat, ref py:730-740): LSH-bucketed approximate top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    return vector.ann_topk(emb, vector.query_vector_of(emb, 0), k=10)


# ===========================================================================
# Streaming closure (§2.8) — batch semantics of the streaming operators,
# oracle-checked here; stream≡batch equivalence is pinned in
# tests/test_streaming.py.
# ===========================================================================

@register(
    "st_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', make_timestamp(epoch_ns(ts) // 1000))
             AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
)
def st_tumbling_hourly(spark, sf_dir):
    """T2 batch semantics: tumbling-window count+sum per event type."""
    return streaming.tumbling_window_agg(_t(spark, sf_dir, "events"))


@register(
    "st_sessionize",
    oracle="""
    SELECT user_id, session_seq,
           min(ts_us) AS session_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
    FROM (
      SELECT user_id, value, ts_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM (
        SELECT user_id, event_id, value, ts_us,
               CASE WHEN epoch(ts_us)
                         - lag(epoch(ts_us)) OVER (PARTITION BY user_id
                                                   ORDER BY ts_us, event_id)
                         > 300
                    OR lag(ts_us) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM (SELECT *, make_timestamp(epoch_ns(ts) // 1000) AS ts_us
              FROM events)))
    GROUP BY user_id, session_seq
    """,
)
def st_sessionize(spark, sf_dir):
    """T4 batch formulation: lag+cumsum sessionization (5-minute gap)."""
    return streaming.sessionize_batch(_t(spark, sf_dir, "events"), 5)


# ===========================================================================
# RAG deterministic carriers (§2.6)
# ===========================================================================

_RAG_QUESTION = "the spark join data stream"


@register(
    "r1_prompt_assembly",
    oracle=f"""
    WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    hits AS (
      SELECT vec_id, {_VEC_SCORE_IP} AS score
      FROM embeddings, qv
      ORDER BY score DESC, vec_id LIMIT 7),
    docs AS (
      SELECT h.score, substr(d.text, 1, 1000) AS snippet
      FROM hits h JOIN documents d ON h.vec_id = d.doc_id)
    SELECT '{_RAG_QUESTION}' AS question,
           string_agg(snippet, chr(10) || chr(10) ORDER BY -score, snippet)
             AS context,
           concat('Use the following context to answer the question.',
                  chr(10), chr(10), 'Context:', chr(10),
                  string_agg(snippet, chr(10) || chr(10) ORDER BY -score, snippet),
                  chr(10), chr(10), 'Question: ', '{_RAG_QUESTION}',
                  chr(10), chr(10), 'Answer:') AS prompt
    FROM docs
    """,
)
def r1_prompt_assembly(spark, sf_dir):
    """R1 (ref py:459-477): retrieval → truncate → deterministic prompt."""
    emb = _t(spark, sf_dir, "embeddings")
    return rag.run_retrieval(
        emb,
        _t(spark, sf_dir, "documents"),
        vector.query_vector_of(emb, 0),
        _RAG_QUESTION,
        k=7,
    )


@register(
    "r4_evaluate_response",
    oracle=f"""
    SELECT question,
           CAST(len(list_intersect(q_terms, ctx_terms)) AS DOUBLE) / len(q_terms)
             AS accuracy,
           CASE WHEN CAST(len(list_intersect(q_terms, ctx_terms)) AS DOUBLE)
                     / len(q_terms) > 0.5
                THEN 'High' ELSE 'Low' END AS accuracy_label,
           len(a_terms_all) AS answer_words,
           length(answer) - length(replace(answer, '.', '')) + 1 AS answer_sentences,
           CASE WHEN len(a_terms_all) < 100
                 AND length(answer) - length(replace(answer, '.', '')) + 1 > 1
                THEN 'High' ELSE 'Low' END AS clarity_label,
           CAST(len(list_intersect(list_distinct(a_terms_all), ctx_terms)) AS DOUBLE)
             / len(list_distinct(a_terms_all)) AS grounding
    FROM (
      SELECT doc_id,
             '{_RAG_QUESTION}' AS question,
             substr(text, 1, 120) AS answer,
             list_distinct(string_split_regex(trim(lower('{_RAG_QUESTION}')), '\\s+'))
               AS q_terms,
             string_split_regex(trim(lower(substr(text, 1, 120))), '\\s+')
               AS a_terms_all,
             string_split_regex(trim(lower(text)), '\\s+') AS ctx_terms
      FROM documents)
    """,
)
def r4_evaluate_response(spark, sf_dir):
    """R4 (ref py:579-594): heuristic accuracy/clarity/grounding over a
    batch of (question, answer, context) rows — answers are deterministic
    text prefixes so the evaluator itself is what's tested."""
    d = _t(spark, sf_dir, "documents").select(
        F.lit(_RAG_QUESTION).alias("question"),
        F.substring("text", 1, 120).alias("answer"),
        F.col("text").alias("context"),
    )
    return rag.evaluate_response(d)


# ===========================================================================
# Multimodal columns
# ===========================================================================

@register(
    "mm_binary_stats",
    oracle="""
    WITH payloads AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN from_hex('89504E47') || encode(text)
                  WHEN doc_id % 3 = 1
                  THEN from_hex('52494646') || encode(text)
                  ELSE encode(text) END AS payload
      FROM documents)
    SELECT doc_id,
           octet_length(payload) AS n_bytes,
           CASE substr(hex(payload), 1, 8)
                WHEN '89504E47' THEN 'image/png'
                WHEN 'FFD8FFE0' THEN 'image/jpeg'
                WHEN '52494646' THEN 'audio/wav'
                WHEN '1A45DFA3' THEN 'video/webm'
                ELSE 'application/octet-stream' END AS media_type
    FROM payloads
    """,
)
def mm_binary_stats(spark, sf_dir):
    """Multimodal metadata: byte length + magic-byte sniff over binary
    payloads (synthesized with real PNG/RIFF magics from document text)."""
    d = _t(spark, sf_dir, "documents")
    payload = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.unhex(F.lit("89504E47")), F.encode("text", "UTF-8")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.unhex(F.lit("52494646")), F.encode("text", "UTF-8")),
        )
        .otherwise(F.encode("text", "UTF-8"))
    )
    stats = multimodal.binary_stats(d.withColumn("payload", payload))
    return stats.withColumn("n_bytes", F.col("n_bytes").cast("long"))


@register(
    "mm_frame_sample",
    oracle="""
    WITH payloads AS (SELECT doc_id, encode(text) AS payload FROM documents)
    SELECT doc_id, frame_no,
           octet_length(payload) AS n_bytes_total
    FROM payloads,
         unnest(range(0, least(8, octet_length(payload) // 64 + 1))) t(frame_no)
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: per-payload byte-slice explosion. The oracle
    checks the fan-out shape (doc, frame_no, total bytes); slice contents are
    binary and engine-checked in pytest."""
    d = multimodal.attach_binary(_t(spark, sf_dir, "documents"))
    frames = multimodal.frame_sample(d)
    return (
        frames.join(
            d.select("doc_id", F.length("payload").cast("long").alias("n_bytes_total")),
            "doc_id",
        ).select("doc_id", F.col("frame_no").cast("long").alias("frame_no"), "n_bytes_total")
    )


@register(
    "mm_decode_features",
    oracle=None,
    note="mapInPandas decode plumbing; codec stubbed (deterministic fake)",
)
def mm_decode_features(spark, sf_dir):
    """Decode/feature-extract stage over binary payloads (Arrow-batched)."""
    d = multimodal.attach_binary(_t(spark, sf_dir, "documents"))
    return multimodal.decode_features(d)


# ===========================================================================
# SQL surface — multi-join analytics through spark.sql over registered views
# (same Catalyst plans as the DataFrame API; exercises join reordering).
# ===========================================================================

_Q3_SQL = """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                AS DOUBLE) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS {strtype}) AS order_day
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@register(
    "q3_shipping_priority",
    oracle=_Q3_SQL.format(strtype="VARCHAR"),
    headline=True,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shape: 3-way fact join + agg + top-k, via the SQL surface."""
    io.register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q3_SQL.format(strtype="STRING"))


_Q5_SQL = """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


@register("q5_local_supplier", oracle=_Q5_SQL, headline=True)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5-shape: 6-table join (Catalyst join reordering + broadcast of
    every dimension), via the SQL surface."""
    io.register_views(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    return spark.sql(_Q5_SQL)


@register(
    "a2_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                         AS DECIMAL(30,2))) AS DOUBLE) AS qty_O,
           CAST(sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                         AS DECIMAL(30,2))) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a2_pivot(spark, sf_dir):
    """Pivot: per-returnflag quantity split by linestatus columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(relational.dsum("l_quantity"))
        .withColumnsRenamed({"O": "qty_O", "F": "qty_F"})
    )


# ===========================================================================
# UDF/UDAF surface (§2.9) — pandas-UDF paths, rows-only (Python arithmetic
# is outside the cross-engine bit-exactness contract)
# ===========================================================================

@register(
    "u3_weighted_avg_udaf",
    oracle=None,
    note="pandas GROUPED_AGG UDAF; checked vs SQL formulation in pytest",
)
def u3_weighted_avg_udaf(spark, sf_dir):
    """U3: custom UDAF — discount-weighted mean price per returnflag via a
    pandas GROUPED_AGG UDF (Arrow-batched)."""
    from big_data_project_spark.functions.udafs import weighted_avg

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("weighted_price")
    )


# ===========================================================================
# Remaining closure: GROUPING SETS, JSON extraction, datetime functions
# ===========================================================================

_GS_SQL = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("a4_grouping_sets", oracle=_GS_SQL)
def a4_grouping_sets(spark, sf_dir):
    """A4c: explicit GROUPING SETS via the SQL surface."""
    io.register_views(spark, sf_dir, ["orders"])
    return spark.sql(_GS_SQL)


@register(
    "p7_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def p7_json_extract(spark, sf_dir):
    """Semi-structured access: pull a typed field out of the JSON props
    column (the events table's nested payload)."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "dt_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS BIGINT)  AS order_year,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS order_month,
           strftime(o_orderdate, '%Y-%m')                  AS order_ym,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch_start,
           CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR)
             AS order_quarter
    FROM orders
    """,
)
def dt_datetime_functions(spark, sf_dir):
    """Datetime function surface: extract/format/diff/trunc."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_trunc("quarter", F.col("o_orderdate"))
        .cast("date")
        .cast("string")
        .alias("order_quarter"),
    )


# ===========================================================================
# Percentiles, correlated subquery, unpivot, sliding window oracle
# ===========================================================================

@register(
    "a6_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)       AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a6_percentiles(spark, sf_dir):
    """A5b: exact interpolated percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition and match
    bitwise on identical input doubles."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("p75_price"),
    )


_Q17_SQL = """
    SELECT p_brand,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS small_qty_revenue,
           count(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    GROUP BY p_brand
"""


@register("q17_correlated_subquery", oracle=_Q17_SQL)
def q17_correlated_subquery(spark, sf_dir):
    """TPC-H Q17-shape: correlated scalar subquery (Catalyst decorrelates to
    an aggregate+join). Quantities are integral so the per-part avg is exact
    on both engines and the threshold comparison cannot flip."""
    io.register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q17_SQL)


@register(
    "o3_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    """,
)
def o3_unpivot(spark, sf_dir):
    """Unpivot/melt: wide → long."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").cast("double").alias("custkey")
    ).withColumnRenamed("o_totalprice", "totalprice")
    return o.unpivot(
        ["o_orderkey"], ["totalprice", "custkey"], "metric", "value"
    )


@register(
    "st_sliding_halfhour",
    oracle="""
    SELECT ws AS window_start, event_type, count(*) AS n FROM (
      SELECT event_type,
             unnest([time_bucket(INTERVAL 30 minutes, tsu),
                     time_bucket(INTERVAL 30 minutes, tsu) - INTERVAL 30 minutes])
               AS ws
      FROM (SELECT event_type, make_timestamp(epoch_ns(ts) // 1000) AS tsu
            FROM events))
    GROUP BY ws, event_type
    """,
)
def st_sliding_halfhour(spark, sf_dir):
    """T3 batch semantics: 1-hour windows sliding every 30 minutes — each
    event lands in exactly two windows."""
    return streaming.sliding_window_agg(
        _t(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


# ===========================================================================
# Embedding near-dup + IVF ANN (north-star closure)
# ===========================================================================

@register(
    "dd_embedding_neardup",
    oracle=None,
    note="LSH-bucketed cosine pairs; recall-gated vs brute force in pytest",
)
def dd_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via LSH blocking — the vector
    analogue of MinHash dedup."""
    emb = _t(spark, sf_dir, "embeddings")
    return vector.cosine_neardup_pairs(emb, threshold=0.5)


@register(
    "e5_ann_ivf",
    oracle=None,
    note="IVF (FAISS IVFFlat parity, ref py:730-740); recall-gated in pytest",
)
def e5_ann_ivf(spark, sf_dir):
    """E5b: IVF-style ANN — coarse quantizer + probed inverted lists."""
    emb = _t(spark, sf_dir, "embeddings")
    return vector.ivf_topk(emb, vector.query_vector_of(emb, 0), k=10)


# ===========================================================================
# Final closure batch: outer join, analytic windows, string/array functions,
# scalar subquery, Q10-shape returned-item report
# ===========================================================================

@register(
    "j3_full_outer",
    oracle="""
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           a.n_f AS n_f, b.n_o AS n_o
    FROM (SELECT o_custkey, count(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey, count(*) AS n_o FROM orders
          WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
    ON a.o_custkey = b.o_custkey
    """,
)
def j3_full_outer(spark, sf_dir):
    """J3b: full outer join with nulls on both sides."""
    o = _t(spark, sf_dir, "orders")
    a = (
        o.where("o_orderstatus = 'F'")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_f"))
    )
    b = (
        o.where("o_orderstatus = 'O'")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_o"))
    )
    # USING-style join key: Spark already emits one coalesced o_custkey
    return a.join(b, "o_custkey", "full_outer").select(
        F.col("o_custkey").alias("custkey"), "n_f", "n_o"
    )


@register(
    "w2_lead_first_last",
    oracle="""
    SELECT user_id, event_id,
           lead(event_id) OVER w                    AS next_event,
           first_value(event_id) OVER w             AS first_event,
           nth_value(event_id, 2) OVER w            AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w2_lead_first_last(spark, sf_dir):
    """W2b: lead / first_value / nth_value analytic windows."""
    from pyspark.sql.window import Window

    base = Window.partitionBy("user_id").orderBy("event_id")
    w = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.lead("event_id").over(base).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
    )


@register(
    "p8_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                           AS uname,
           substr(c_name, 1, 8)                    AS prefix,
           replace(c_name, 'Customer', 'Cust')     AS replaced,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           CAST(length(c_name) AS BIGINT)          AS name_len,
           CAST(strpos(c_name, '#') AS BIGINT)     AS hash_pos,
           reverse(c_mktsegment)                   AS rseg,
           repeat(c_mktsegment, 2)                 AS seg2
    FROM customer
    """,
)
def p8_string_functions(spark, sf_dir):
    """String-function surface: case, slice, replace, pad, locate, reverse."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.length("c_name").cast("long").alias("name_len"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg2"),
    )


@register(
    "a7_array_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), ',')      AS nations_csv,
           CAST(len(list(n_name)) AS BIGINT)                       AS n_nations,
           list_contains(list(n_name ORDER BY n_name), 'NATION_3') AS has_n3,
           list(n_name ORDER BY n_name)[1]                         AS first_nation
    FROM nation GROUP BY n_regionkey
    """,
)
def a7_array_agg(spark, sf_dir):
    """Array aggregation + array functions: collect (sorted for
    determinism), size, contains, element access. The array itself is
    emitted joined to a string — array-typed outputs stringify differently
    per engine/pandas and would break value hashing."""
    n = _t(spark, sf_dir, "nation")
    nations = F.array_sort(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.array_join(nations, ",").alias("nations_csv"),
        F.size(F.collect_list("n_name")).cast("long").alias("n_nations"),
        F.array_contains(nations, "NATION_3").alias("has_n3"),
        F.element_at(nations, 1).alias("first_nation"),
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders
                                WHERE o_orderdate < TIMESTAMP '1996-01-01')
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery in a predicate. Not exactly grid-aligned
    — but the avg is computed from a decimal-exact sum on both sides via the
    same SQL, so the threshold is bit-identical."""
    io.register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders
                                    WHERE o_orderdate < TIMESTAMP '1996-01-01')
        """
    )


_Q10_SQL = """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4)))
                AS DOUBLE) AS revenue,
           c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_SQL, headline=True)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10-shape: top-20 customers by returned-item revenue."""
    io.register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q10_SQL)


# ===========================================================================
# Batch vector serving, TF-IDF, column profiling
# ===========================================================================

@register(
    "e7_knn_batch",
    oracle=f"""
    WITH qv AS (SELECT vec_id AS qid, embedding AS q FROM embeddings
                WHERE vec_id IN (0, 7, 42)),
    scored AS (
      SELECT qid, e.vec_id, e.label, {_VEC_SCORE_IP} AS score
      FROM embeddings e, qv)
    SELECT qid, vec_id, label, score, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY qid
                     ORDER BY score DESC, vec_id) AS BIGINT) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def e7_knn_batch(spark, sf_dir):
    """E7: batched top-k — N query vectors answered in ONE scan of the
    table (broadcast query set + per-qid window), the serving-path shape."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    return vector.knn_topk_batch(emb, queries, k=5, metric="ip")


@register(
    "tx_tf_idf",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, tf.term, tf, df,
           tf * (CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS tfidf
    FROM tf JOIN dfreq ON tf.term = dfreq.term, n
    """,
)
def tx_tf_idf(spark, sf_dir):
    """TF-IDF (ratio idf — integer-exact, oracle-stable; ln variant is
    rows-only via use_log=True)."""
    return text.tf_idf(_t(spark, sf_dir, "documents"))


@register(
    "a8_profile_columns",
    oracle="""
    SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT c_custkey) AS n_distinct,
           min(CAST(c_custkey AS VARCHAR)) AS min_str,
           max(CAST(c_custkey AS VARCHAR)) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*),
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT c_mktsegment),
           min(CAST(c_mktsegment AS VARCHAR)), max(CAST(c_mktsegment AS VARCHAR))
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*),
           CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT c_acctbal),
           min(CAST(c_acctbal AS VARCHAR)), max(CAST(c_acctbal AS VARCHAR))
    FROM customer
    """,
)
def a8_profile_columns(spark, sf_dir):
    """Data profiling: per-column stats summary (ANALYZE-style). exact=True
    so distinct counts hash-match the oracle; default approx mode is the
    100 TB path (bound-tested in test_profile_approx_bounds)."""
    return relational.profile_columns(
        _t(spark, sf_dir, "customer"),
        ["c_custkey", "c_mktsegment", "c_acctbal"],
        exact=True,
    )


# ===========================================================================
# Null handling, conditionals, range frames, IN-subquery, bitwise, variance
# ===========================================================================

@register(
    "p9_null_surface",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P')                       AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'proc')     AS nvl_status,
           (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS nullsafe_is_f,
           CASE WHEN o_totalprice > 250000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                              AS price_band,
           least(o_totalprice, 200000.0)                    AS capped,
           greatest(o_totalprice, 50000.0)                  AS floored
    FROM orders
    """,
)
def p9_null_surface(spark, sf_dir):
    """Null-handling + conditional surface: nullif/coalesce/null-safe
    equality (<=>)/CASE/least/greatest."""
    o = _t(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("proc")).alias("nvl_status"),
        status_or_null.eqNullSafe(F.lit("F")).alias("nullsafe_is_f"),
        F.when(F.col("o_totalprice") > 250000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored"),
    )


@register(
    "w3_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_90d
    FROM orders
    """,
)
def w3_range_frame(spark, sf_dir):
    """W3b: RANGE frame over event-time — trailing-90-day spend per
    customer (rangeBetween needs a numeric sort key → epoch seconds).
    Deterministic despite same-day ties: RANGE frames include ALL peers of
    the current sort value, so the frame set is order-independent; the
    decimal sum keeps the total exact."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        # NTZ timestamps can't cast straight to long; go via TIMESTAMP
        # (session tz pinned UTC → epoch matches DuckDB's epoch()).
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-90 * 86400, 0)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .over(w)
        .cast("double")
        .alias("spend_90d"),
    )


_IN_SQL = """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                             WHERE l_quantity > 49)
"""


@register("q_in_subquery", oracle=_IN_SQL)
def q_in_subquery(spark, sf_dir):
    """IN / NOT IN subquery predicates (semi/anti under the hood)."""
    io.register_views(spark, sf_dir, ["orders", "customer", "lineitem"])
    return spark.sql(_IN_SQL)


@register(
    "a9_bitwise_agg",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS and_ln,
           bit_or(l_linenumber)  AS or_ln,
           bit_xor(l_orderkey)   AS xor_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_bitwise_agg(spark, sf_dir):
    """Bitwise aggregates (order-independent by construction)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("and_ln"),
        F.bit_or("l_linenumber").alias("or_ln"),
        F.bit_xor("l_orderkey").alias("xor_ok"),
    )


@register(
    "a10_variance_deterministic",
    oracle="""
    SELECT l_returnflag,
           (CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,2))) AS DOUBLE)
            - CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
              * CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*))
           / count(*) AS var_pop_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a10_variance_deterministic(spark, sf_dir):
    """Population variance via the sum-of-squares identity over EXACT
    decimal sums — the built-in var_pop merges partial (mean, M2) states in
    partition order and is not bit-reproducible across engines/runs; this
    formulation is, with identical arithmetic on both sides."""
    li = _t(spark, sf_dir, "lineitem")
    sum_sq = relational.dsum(F.col("l_quantity") * F.col("l_quantity"))
    sum_q = relational.dsum("l_quantity")
    n = F.count("*")
    return li.groupBy("l_returnflag").agg(
        ((sum_sq - sum_q * sum_q / n) / n).alias("var_pop_qty")
    )


@register(
    "p10_regexp_surface",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '(spark|stream)\\s+(\\w+)', 2) AS word_after,
           regexp_matches(text, 'join.*merge')                 AS has_join_then_merge
    FROM documents
    WHERE regexp_matches(text, '\\bvector\\b')
    """,
)
def p10_regexp_surface(spark, sf_dir):
    """Regex surface: rlike filter + group extraction."""
    d = _t(spark, sf_dir, "documents")
    return d.where(F.col("text").rlike(r"\bvector\b")).select(
        "doc_id",
        F.regexp_extract("text", r"(spark|stream)\s+(\w+)", 2).alias("word_after"),
        F.col("text").rlike("join.*merge").alias("has_join_then_merge"),
    )
