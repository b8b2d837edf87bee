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
from big_data_project_spark.operators import cleaning, relational


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
