"""Relational operator corpus — TPC-H-flavored queries over the driver
tables, covering the reference's inherited DataFusion 48 SQL surface
(SURVEY.md §2.B: scans, projections/filters, all join types, hash
aggregation, window functions, sorts/limits/top-k, set ops, subqueries,
CTEs incl. recursive, grouping sets/rollup/cube, scalar functions).

Reference evidence for the surface: the raw-SQL pass-through
``crates/cli/src/main.rs:17,72,116`` → ``crates/core/src/context.rs:93-105``
with DataFusion default features (``context.rs:32-33``).

Scale notes (100 TB posture), applied throughout:

- Calendar-bounded dimensions (region/nation) and 1-row scalars are
  joined with ``F.broadcast``; SF-scaling dimensions (part, supplier,
  customer) are AQE-sized — runtime broadcast while they measure
  small, shuffle join past the threshold, never a forced-hint OOM.
- Aggregations are expressed as single ``groupBy().agg()`` so Catalyst
  plans partial (map-side) + final HashAggregate — one shuffle of
  pre-aggregated data, not raw rows.
- Filters are plain column predicates → pushed to the parquet scan
  (verify: ``PushedFilters`` in ``.explain("formatted")``).
- Top-k uses ``orderBy().limit()`` → Catalyst's
  ``TakeOrderedAndProject`` (no global sort materialization).
- Windows partition on high-cardinality keys (suppkey/user_id), so
  state is distributed; no single-partition windows on big inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adt_spark.queries import register, tables

# Exact money math: cast the clean 2-dp doubles to DECIMAL before any
# arithmetic; cast back to DOUBLE only at the output boundary.  Both
# engines then emit bit-identical doubles (see queries/__init__ rules).
MONEY = T.DecimalType(12, 2)
RATE = T.DecimalType(4, 2)
# Quantity fits (8,2): per-row qty <= 50, and the sum buffer (8+10,2)
# stays within Spark's long-backed Decimal (precision <= 18) -- ~2x
# faster accumulation than BigDecimal -- while still holding 1e12-row
# group sums (5e13 << 1e16).  Money stays (12,2): its 100 TB group
# sums genuinely need the (22,2) BigDecimal buffer.
QTY = T.DecimalType(8, 2)


def _money(c: str):
    return F.col(c).cast(MONEY)


def _qty(c: str = "l_quantity"):
    return F.col(c).cast(QTY)


def _rate(c: str):
    return F.col(c).cast(RATE)


def _disc_price():
    return _money("l_extendedprice") * (F.lit(1) - _rate("l_discount"))


# SQL fragments for the DuckDB oracles (same math, DuckDB dialect).
_D_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_D_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_D_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_D_TAX = "CAST(l_tax AS DECIMAL(4,2))"
_D_DISC_PRICE = f"{_D_EP} * (1 - {_D_DISC})"


# ---------------------------------------------------------------------------
# Aggregation / scan / filter
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({_D_QTY}) AS DOUBLE) AS sum_qty,
           CAST(sum({_D_EP}) AS DOUBLE) AS sum_base_price,
           CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({_D_DISC_PRICE} * (1 + {_D_TAX})) AS DOUBLE) AS sum_charge,
           CAST(sum({_D_QTY}) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum({_D_EP}) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum({_D_DISC}) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan aggregation with 8 aggregates.

    Plan shape at scale: parquet scan (shipdate filter pushed down,
    only 7 columns read) → partial HashAggregate per partition →
    shuffle on (returnflag, linestatus) [6 groups — tiny] → final
    HashAggregate.  No joins, one shuffle of 6 rows per partition.
    """
    li = tables(spark, sf_dir)["lineitem"]
    # Pre-project the shared decimal subexpressions ONCE per row —
    # inlining _disc_price() into both sum_disc_price and sum_charge
    # makes codegen evaluate the BigDecimal product twice per row
    # (aggregate exprs are not CSE'd across agg functions); the
    # projection halves q01 wall time (2.44 s → 1.22 s at sf0.1).
    pre = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .select(
            "l_returnflag",
            "l_linestatus",
            _qty().alias("q"),
            _money("l_extendedprice").alias("p"),
            _rate("l_discount").alias("d"),
            _rate("l_tax").alias("t"),
        )
        .withColumn("dp", F.col("p") * (F.lit(1) - F.col("d")))
        .withColumn("ch", F.col("dp") * (F.lit(1) + F.col("t")))
    )
    cnt = F.count("*")
    return pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("q").cast("double").alias("sum_qty"),
        F.sum("p").cast("double").alias("sum_base_price"),
        F.sum("dp").cast("double").alias("sum_disc_price"),
        F.sum("ch").cast("double").alias("sum_charge"),
        (F.sum("q").cast("double") / cnt).alias("avg_qty"),
        (F.sum("p").cast("double") / cnt).alias("avg_price"),
        (F.sum("d").cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT CAST(sum({_D_EP} * {_D_DISC}) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective filter + global aggregate.

    All three predicates are scan-pushable (min/max row-group pruning
    on shipdate); the aggregate is a single partial→final reduction —
    the cheapest possible shape at 100 TB.
    """
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_money("l_extendedprice") * _rate("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY sum({_D_DISC_PRICE}) DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + aggregate + top-10.

    customer is ~1.5% of lineitem — small enough that AQE broadcasts
    it at runtime, but it SCALES with SF so the hint is not forced
    (no 100×-scale OOM); orders⋈lineitem is
    the one real shuffle (both sides hashed on orderkey).  The top-10
    runs as TakeOrderedAndProject (per-partition heap, no full sort).
    Ordering ties broken by unique l_orderkey for determinism.
    """
    t = tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("date"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.col("_rev_dec").cast("double").alias("revenue"), "o_orderdate")
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join.

    region/nation force-broadcast (calendar-bounded); supplier and
    customer scale with SF, so their joins are AQE-sized (runtime
    broadcast when small); lineitem⋈orders is the fact-fact shuffle.
    Join order puts the most selective filters (region → nation)
    into broadcast hash maps so fact rows are filtered early.
    """
    t = tables(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = t["lineitem"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_D_DISC_PRICE}) DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20."""
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev_dec").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


@register(
    "q_join_outer_counts",
    oracle="""
    SELECT n_name,
           count(c_custkey) AS n_customers,
           CAST(coalesce(sum(CAST(c_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_acctbal
    FROM nation
    LEFT JOIN customer ON n_nationkey = c_nationkey AND c_acctbal > 9000
    GROUP BY n_name
    """,
    tags=("join", "outer"),
)
def q_join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving empty dimension rows (null-aware
    count + coalesce over the null-extended side)."""
    t = tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_acctbal") > 9000)
    return (
        t["nation"]
        .join(cust, F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum(_money("c_acctbal")), F.lit(0).cast(MONEY))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "q_join_semi_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
    tags=("join", "subquery"),
)
def q_join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → LEFT SEMI join (Catalyst decorrelates the
    SQL form identically; the DataFrame form is explicit)."""
    t = tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q_join_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "subquery"),
)
def q_join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → LEFT ANTI join (customers with no orders)."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, s.seg, count(*) AS n
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    GROUP BY r_name, s.seg
    """,
    tags=("join", "cross"),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN of two tiny inputs (both sides broadcast-sized)."""
    t = tables(spark, sf_dir)
    segs = t["customer"].select(F.col("c_mktsegment").alias("seg")).distinct()
    return t["region"].crossJoin(segs).groupBy("r_name", "seg").agg(F.count("*").alias("n"))


@register(
    "q_join_in_subquery",
    oracle="""
    SELECT p_brand, count(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND p_size BETWEEN 10 AND 40
    GROUP BY p_brand
    """,
    tags=("join", "subquery", "filter"),
)
def q_join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → semi join, plus BETWEEN scan filter."""
    t = tables(spark, sf_dir)
    hot = t["lineitem"].filter(F.col("l_quantity") >= 49).select("l_partkey")
    return (
        t["part"]
        .filter(F.col("p_size").between(10, 40))
        .join(hot, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "agg"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (orders above global average).

    Expressed in Spark SQL so Catalyst plans the scalar subquery as a
    broadcast single-row join — same shape it gives the SQL form.
    """
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
            FROM orders)
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_running_revenue",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(sum({_D_DISC_PRICE}) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue
    FROM lineitem
    WHERE l_suppkey < 5
    """,
    tags=("window",),
)
def q_window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-supplier revenue: window aggregate with a ROWS frame.

    Partitioned by suppkey (high-cardinality at real scale → state is
    distributed); total order inside each partition via the unique
    (shipdate, orderkey, linenumber) triple keeps the cumulative sum
    deterministic.
    """
    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") < 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_disc_price()).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "q_window_rank_lag",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(lag(c_acctbal)  OVER w AS DOUBLE) AS prev_bal,
           CAST(lead(c_acctbal) OVER w AS DOUBLE) AS next_bal,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY row_number() OVER w <= 5
    """,
    tags=("window", "topk"),
)
def q_window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family + lag/lead/ntile, top-5 per nation.

    The row_number ≤ k filter is the distributed top-k-per-group
    pattern: each partition keeps a bounded heap, no global sort.
    """
    cust = tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.lag("c_acctbal").over(w).cast("double").alias("prev_bal"),
            F.lead("c_acctbal").over(w).cast("double").alias("next_bal"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT s_suppkey,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           count(*) OVER (ORDER BY s_acctbal RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
             AS peers_within_500
    FROM supplier
    """,
    tags=("window",),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window) — peers within ±500 acctbal.

    Un-partitioned RANGE window is acceptable only on dimension-sized
    input (supplier); on a fact table this would need a partition key.
    """
    sup = tables(spark, sf_dir)["supplier"]
    w = W.orderBy(F.col("s_acctbal")).rangeBetween(-500, 500)
    return sup.select(
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        F.count("*").over(w).alias("peers_within_500"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / ordered-set aggregates
# ---------------------------------------------------------------------------


@register(
    "q_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name,
           CAST(grouping(r_name) AS INT) AS g_region,
           CAST(grouping(n_name) AS INT) AS g_nation,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING markers."""
    t = tables(spark, sf_dir)
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count("*").alias("n_customers"),
        F.sum(_money("c_acctbal")).cast("double").alias("total_bal"),
    )


@register(
    "q_cube_segment_status",
    oracle="""
    SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
    tags=("agg", "cube"),
)
def q_cube_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    t = tables(spark, sf_dir)
    joined = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return joined.cube("c_mktsegment", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(_money("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    tags=("agg", "rollup"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL form; Catalyst expands to a union
    of aggregates over one shuffle)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "q_agg_stats_family",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           count(DISTINCT o_custkey) AS n_custs,
           CAST(min(o_totalprice) AS DOUBLE) AS min_price,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price,
           CAST(min(o_orderdate) AS DATE) AS first_order,
           CAST(max(o_orderdate) AS DATE) AS last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def q_agg_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max over numerics and temporals + exact DISTINCT count.

    count(DISTINCT) adds a second shuffle keyed on (group, custkey) —
    Catalyst's expand-based rewrite; at 100 TB prefer
    approx_count_distinct when tolerance allows (not oracle-comparable,
    so the exact form is checked here).
    """
    orders = tables(spark, sf_dir)["orders"]
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.min("o_orderdate").cast("date").alias("first_order"),
        F.max("o_orderdate").cast("date").alias("last_order"),
    )


@register(
    "q_string_agg_ordered",
    oracle="""
    SELECT r_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
    tags=("agg", "string"),
)
def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (DataFusion string_agg / Spark 4
    listagg; deterministic via WITHIN GROUP ordering)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_regionkey
        """
    )


# ---------------------------------------------------------------------------
# Set operations / sorts / limits
# ---------------------------------------------------------------------------


@register(
    "q_set_operations",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < -900
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT chain (PostgreSQL precedence:
    INTERSECT binds tighter; UNION/EXCEPT associate left)."""
    t = tables(spark, sf_dir)
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = t["orders"].filter(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("c_custkey"))
    negative = t["customer"].filter(F.col("c_acctbal") < -900).select("c_custkey")
    pending = t["orders"].filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(big).union(negative).distinct().subtract(pending)


@register(
    "q_sort_limit_offset",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(nullif(c_acctbal, 0) AS DOUBLE) AS bal_or_null
    FROM customer
    ORDER BY nullif(c_acctbal, 0) DESC NULLS LAST, c_custkey
    LIMIT 25 OFFSET 10
    """,
    tags=("sort", "limit"),
)
def q_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST + LIMIT/OFFSET.

    nullif() manufactures nulls so the null-ordering contract is
    actually exercised (the driver tables are non-nullable).
    """
    cust = tables(spark, sf_dir)["customer"]
    bal = F.nullif(F.col("c_acctbal"), F.lit(0.0))
    return (
        cust.select(
            "c_custkey",
            "c_name",
            bal.cast("double").alias("bal_or_null"),
        )
        .orderBy(F.col("bal_or_null").desc_nulls_last(), F.col("c_custkey"))
        .offset(10)
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Expressions: CASE / scalar functions / casts
# ---------------------------------------------------------------------------


@register(
    "q_case_conditional",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           count(*) AS n,
           CAST(greatest(max(c_acctbal), 0) AS DOUBLE) AS max_pos_bal
    FROM customer
    GROUP BY 1, 2
    """,
    tags=("expr",),
)
def q_case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN buckets + coalesce/nullif/greatest null plumbing."""
    cust = tables(spark, sf_dir)["customer"]
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
    return (
        cust.groupBy(bucket.alias("bal_bucket"), seg.alias("seg_or_other"))
        .agg(
            F.count("*").alias("n"),
            F.greatest(F.max("c_acctbal"), F.lit(0.0)).cast("double").alias("max_pos_bal"),
        )
    )


@register(
    "q_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           substr(p_type, 1, 4) AS type_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           reverse(p_brand) AS rbrand,
           split_part(p_type, ' ', 1) AS first_word,
           CAST(instr(p_name, 'a') AS INT) AS a_pos,
           trim(concat('  ', p_name, '  ')) AS trimmed
    FROM part
    WHERE p_partkey <= 200
    """,
    tags=("expr", "string"),
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (DataFusion string/unicode packages →
    Spark builtins, SURVEY.md §2.B)."""
    part = tables(spark, sf_dir)["part"].filter(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.reverse("p_brand").alias("rbrand"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "q_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INT) AS yr,
           CAST(extract(month FROM o_orderdate) AS INT) AS mon,
           CAST(extract(day FROM o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(extract(dow FROM o_orderdate) AS INT) AS dow
    FROM orders
    WHERE o_orderkey <= 500
    """,
    tags=("expr", "datetime"),
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: extract/date_trunc/interval arithmetic/last_day.

    DuckDB dow: 0=Sunday; Spark dayofweek: 1=Sunday → subtract 1.
    """
    orders = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
    )


@register(
    "q_regex_like",
    oracle="""
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%'
       OR regexp_matches(p_name, '^[ab].*[xyz]$')
    """,
    tags=("expr", "regex"),
)
def q_regex_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix match (scan-pushable) + regex match (the reference's
    PostgreSQL ``~`` operator; our dialect layer rewrites ``~`` →
    RLIKE, adt_spark.dialect.translate)."""
    part = tables(spark, sf_dir)["part"]
    return part.filter(
        F.col("p_type").like("PROMO%") | F.col("p_name").rlike("^[ab].*[xyz]$")
    ).select("p_partkey", "p_type")


# ---------------------------------------------------------------------------
# CTEs / derived tables / unnest / pivot
# ---------------------------------------------------------------------------


@register(
    "q_cte_top_nations",
    oracle=f"""
    WITH nation_rev AS (
        SELECT s_nationkey AS nationkey, sum({_D_DISC_PRICE}) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    )
    SELECT n_name, CAST(rev AS DOUBLE) AS revenue
    FROM nation_rev JOIN nation ON nationkey = n_nationkey
    ORDER BY rev DESC, n_name
    LIMIT 5
    """,
    tags=("cte", "join", "topk"),
)
def q_cte_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-clause pipeline: aggregate CTE joined back to a dimension."""
    t = tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    return (
        rev.join(F.broadcast(t["nation"]), F.col("nationkey") == F.col("n_nationkey"))
        .orderBy(F.col("rev").desc(), F.col("n_name"))
        .limit(5)
        .select("n_name", F.col("rev").cast("double").alias("revenue"))
    )


@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE series(n, total) AS (
        SELECT 1, 1
        UNION ALL
        SELECT n + 1, total + n + 1 FROM series WHERE n < 15
    )
    SELECT n, total FROM series
    """,
    tags=("cte", "recursive"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (DataFusion 48 ``recursive_protection`` surface —
    SURVEY.md gap G1, closed natively by Spark 4)."""
    return spark.sql(
        """
        WITH RECURSIVE series(n, total) AS (
            SELECT 1, 1
            UNION ALL
            SELECT n + 1, total + n + 1 FROM series WHERE n < 15
        )
        SELECT n, total FROM series
        """
    )


@register(
    "q_unnest_sequence",
    oracle="""
    SELECT r_name, CAST(unnest(generate_series(1, r_regionkey + 1)) AS BIGINT) AS n
    FROM region
    """,
    tags=("unnest",),
)
def q_unnest_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST of a generated series (DataFusion generate_series +
    unnest → Spark sequence + explode)."""
    region = tables(spark, sf_dir)["region"]
    return region.select(
        "r_name",
        F.explode(F.sequence(F.lit(1), F.col("r_regionkey") + 1)).alias("n"),
    ).select("r_name", F.col("n").cast("bigint").alias("n"))


@register(
    "q_pivot_status",
    oracle="""
    SELECT c_mktsegment,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_open,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_filled,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_pending
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("pivot", "agg"),
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-status counts per market segment (DataFrame
    ``.pivot()`` with a pinned value list → one shuffle, no second
    pass to discover pivot values)."""
    t = tables(spark, sf_dir)
    joined = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    pivoted = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


@register(
    "q_values_inline_join",
    oracle="""
    SELECT v.code, count(*) AS n
    FROM (VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending')) AS v(status, code)
    JOIN orders ON o_orderstatus = v.status
    GROUP BY v.code
    """,
    tags=("values", "join"),
)
def q_values_inline_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory VALUES table joined to a fact table (reference's
    ``CREATE TABLE AS VALUES`` surface; broadcast by construction)."""
    t = tables(spark, sf_dir)
    lookup = spark.createDataFrame(
        [("O", "open"), ("F", "filled"), ("P", "pending")], ["status", "code"]
    )
    return (
        t["orders"]
        .join(F.broadcast(lookup), F.col("o_orderstatus") == F.col("status"))
        .groupBy("code")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_correlated_above_nation_avg",
    oracle="""
    WITH nation_avg AS (
        SELECT c_nationkey AS nk,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, count(*) AS n_above
    FROM customer JOIN nation_avg ON c_nationkey = nk
    WHERE c_acctbal > avg_bal
    GROUP BY c_nationkey
    """,
    tags=("subquery", "join", "agg"),
)
def q_correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern (customers above their nation's
    average) expressed as aggregate + self-join — the decorrelated
    plan Catalyst would produce from the subquery form, stated
    directly so the shuffle structure is explicit."""
    cust = tables(spark, sf_dir)["customer"]
    avg_bal = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        (F.sum(_money("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_above"))
    )


@register(
    "q_join_natural_using",
    oracle="""
    WITH c AS (SELECT c_custkey, c_nationkey AS nationkey FROM customer),
         n AS (SELECT n_nationkey AS nationkey, n_regionkey AS regionkey,
                      n_name FROM nation),
         r AS (SELECT r_regionkey AS regionkey, r_name FROM region)
    SELECT n_name AS nation, r_name AS region, count(*) AS n_customers
    FROM (c JOIN n USING (nationkey)) JOIN r USING (regionkey)
    GROUP BY n_name, r_name
    """,
    tags=("join", "using", "natural"),
)
def q_join_natural_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING(col) / NATURAL-JOIN surface (SURVEY §2.B joins table:
    ``USING(col)`` → ``df.join(d2, ["col"])``).  Column names are
    pre-aligned (``nationkey`` / ``regionkey``) so both engines run
    the identical name-equi join; bounded dimensions broadcast.
    """
    t = tables(spark, sf_dir)
    cust = t["customer"].withColumnRenamed("c_nationkey", "nationkey")
    nat = t["nation"].withColumnRenamed("n_nationkey", "nationkey").withColumnRenamed(
        "n_regionkey", "regionkey"
    )
    reg = t["region"].withColumnRenamed("r_regionkey", "regionkey")
    return (
        cust.join(F.broadcast(nat), ["nationkey"])
        .join(F.broadcast(reg), ["regionkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q_ordered_array_agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderdate, o_orderkey), ',')
             AS order_keys
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "array_agg", "ordered"),
)
def q_ordered_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``array_agg(x ORDER BY y)`` (SURVEY gap G5: Spark's
    collect_list has no per-aggregate ORDER BY): collect (key, value)
    structs, array_sort — struct comparison is field-lexicographic, so
    (o_orderdate, o_orderkey) gives the exact ORDER BY — then project
    the value field.  All array-local work after the one groupBy
    shuffle; no window, no second shuffle.  The output array is
    serialized with array_join on BOTH sides because the driver's
    value hasher cannot handle list cells (round-1 driver err).
    """
    orders = tables(spark, sf_dir)["orders"]
    return orders.groupBy("o_custkey").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(o_orderdate AS k,"
            " o_orderkey AS v))), s -> cast(s.v AS string)), ',')"
        ).alias("order_keys")
    )


@register(
    "q_window_groups_frame",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty, l_returnflag,
             dense_rank() OVER (PARTITION BY l_returnflag
                                ORDER BY CAST(l_quantity AS BIGINT)) AS dr
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(sum(qty) OVER (PARTITION BY l_returnflag ORDER BY dr
                               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                AS BIGINT) AS grp_sum
    FROM ranked
    """,
    tags=("window", "groups_frame"),
)
def q_window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS-frame emulation (SURVEY gap G6: Spark has no GROUPS
    BETWEEN): ``GROUPS 1 PRECEDING AND 1 FOLLOWING`` ≡ a RANGE frame
    of ±1 over the peer-group index, i.e. ``dense_rank()`` of the
    ORDER BY key.  Two window passes over the SAME partitioning+sort —
    Catalyst plans one shuffle and one sort, the second Window reuses
    the ordering.  (DuckDB also lacks GROUPS mode; the oracle runs the
    identical construction, pinning the recipe cross-engine.)

    Round-12 (guide §2.5/§2.6): evaluated over the distinct
    (l_returnflag, qty) grain — dense_rank over rows ordered by qty
    equals row-rank over the DISTINCT qtys, and the RANGE ±1 frame in
    dr-space selects whole peer groups, so sum(qty) over the frame is
    the windowed sum of per-key sums.  One parallel groupBy replaces
    the 3-task full-data window; the ~|flags × qtys| result broadcasts
    back (same contract as dialect/keyed_windows.py).
    """
    li = tables(spark, sf_dir)["lineitem"]
    qty = F.col("l_quantity").cast("long")
    base = li.select(
        "l_orderkey", "l_linenumber", qty.alias("qty"), "l_returnflag"
    )
    w_rank = W.partitionBy("l_returnflag").orderBy("qty")
    w_groups = W.partitionBy("l_returnflag").orderBy("dr").rangeBetween(-1, 1)
    keyed = (
        base.groupBy("l_returnflag", "qty")
        .agg(F.sum("qty").alias("__kw_ksum"))
        .withColumn("dr", F.dense_rank().over(w_rank))
        .withColumn("grp_sum", F.sum("__kw_ksum").over(w_groups))
        .select(
            F.col("l_returnflag").alias("__kw_rf"),
            F.col("qty").alias("__kw_qty"),
            "grp_sum",
        )
    )
    return base.join(
        keyed,
        base["l_returnflag"].eqNullSafe(keyed["__kw_rf"])
        & base["qty"].eqNullSafe(keyed["__kw_qty"]),
        "left",
    ).select("l_orderkey", "l_linenumber", "grp_sum")


def _sql_frames(spark: SparkSession, sql: str) -> DataFrame:
    """Run raw frame-grammar SQL through the EXCLUDE/UBF rewriter and
    then the round-12 keyed-window compression (evaluate RANGE windows
    over the distinct (partition, order-key) grain — guide §2.5/§2.6;
    equivalence contract and refusal gates in
    adt_spark/dialect/keyed_windows.py; ROWS-frame statements pass
    through compression untouched)."""
    from adt_spark.dialect.keyed_windows import compress_keyed_windows
    from adt_spark.dialect.window_frames import rewrite_window_frames

    rewritten = rewrite_window_frames(sql)
    return spark.sql(compress_keyed_windows(rewritten) or rewritten)


_EXCL_FRAME = (
    "PARTITION BY l_returnflag ORDER BY qty "
    "RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING"
)


@register(
    "q_window_exclude",
    oracle=f"""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(sum(qty) OVER ({_EXCL_FRAME} EXCLUDE CURRENT ROW) AS BIGINT)
             AS sum_excl_current,
           CAST(sum(qty) OVER ({_EXCL_FRAME} EXCLUDE GROUP) AS BIGINT)
             AS sum_excl_group,
           CAST(sum(qty) OVER ({_EXCL_FRAME} EXCLUDE TIES) AS BIGINT)
             AS sum_excl_ties
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame EXCLUDE emulation (SURVEY §2.B windows; DataFusion
    48 frames support EXCLUDE, Spark has none — COVERAGE.md documents
    the subtract-the-excluded-rows workaround; this query proves it
    against DuckDB's native EXCLUDE):

    - ``EXCLUDE CURRENT ROW`` ≡ frame_sum − qty
    - ``EXCLUDE GROUP``       ≡ frame_sum − peer_sum, where peer_sum
      is the same window with ``RANGE BETWEEN CURRENT ROW AND CURRENT
      ROW`` (exactly the ORDER-BY peer group)
    - ``EXCLUDE TIES``        ≡ frame_sum − peer_sum + qty

    SQL semantics note: an empty exclusion result is NULL (sum over
    zero rows), so subtractions go through a null-safe guard only
    where the frame can empty out — with a ±5 RANGE the frame always
    contains the peer group, so frame_sum ≥ peer_sum > 0 here.

    Round-12 (guide §2.5/§2.6): both windows are evaluated over the
    distinct (l_returnflag, qty) grain — a RANGE frame's membership
    is a pure function of the key values, so frame_sum is the
    windowed sum of per-key sums and peer_sum IS the per-key sum (the
    [0, 0] frame is exactly the peer group; no second window at all).
    One parallel groupBy replaces the 3-task full-data window; the
    ~|flags × qtys| result broadcasts back (same contract as
    dialect/keyed_windows.py).
    """
    li = tables(spark, sf_dir)["lineitem"]
    qty = F.col("l_quantity").cast("long")
    base = li.select(
        "l_orderkey", "l_linenumber", "l_returnflag", qty.alias("qty")
    )
    w = W.partitionBy("l_returnflag").orderBy("qty")
    keyed = (
        base.groupBy("l_returnflag", "qty")
        .agg(F.sum("qty").alias("peer_sum"))
        .withColumn("frame_sum", F.sum("peer_sum").over(w.rangeBetween(-5, 5)))
        .select(
            F.col("l_returnflag").alias("__kw_rf"),
            F.col("qty").alias("__kw_qty"),
            "frame_sum",
            "peer_sum",
        )
    )
    joined = base.join(
        keyed,
        base["l_returnflag"].eqNullSafe(keyed["__kw_rf"])
        & base["qty"].eqNullSafe(keyed["__kw_qty"]),
        "left",
    )
    frame_sum = F.col("frame_sum")
    peer_sum = F.col("peer_sum")
    excl_current = frame_sum - F.col("qty")
    excl_group = frame_sum - peer_sum
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        # sum over an emptied frame is NULL in SQL; mirror that
        F.when(excl_current == 0, F.lit(None)).otherwise(excl_current)
        .alias("sum_excl_current"),
        F.when(excl_group == 0, F.lit(None)).otherwise(excl_group)
        .alias("sum_excl_group"),
        (frame_sum - peer_sum + F.col("qty")).alias("sum_excl_ties"),
    )


_MM_F1 = (
    "PARTITION BY l_returnflag ORDER BY qty "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
)
_MM_F2 = (
    "PARTITION BY l_returnflag ORDER BY qty "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
)
_MM_SELECT = f"""SELECT l_orderkey, l_linenumber,
       min(qty) OVER ({_MM_F1} EXCLUDE GROUP) AS min_excl_group,
       max(qty) OVER ({_MM_F2} EXCLUDE TIES) AS max_excl_ties,
       first_value(qty) OVER ({_MM_F1} EXCLUDE GROUP) AS fv_excl_group,
       last_value(qty) OVER ({_MM_F2} EXCLUDE GROUP) AS lv_excl_group"""


@register(
    "q_window_exclude_minmax",
    oracle=f"""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    {_MM_SELECT}
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE GROUP/TIES under min/max/first_value/last_value through
    the RAW-SQL split-frame rewrite itself (DataFusion 48 accepts
    EXCLUDE under any window aggregate — crates/core/src/context.rs:32-33
    via the CLI pass-through crates/cli/src/main.rs:116; Spark parses
    no EXCLUDE at all).  The statement is the adt-script form, pushed
    through ``rewrite_window_frames`` and executed with ``spark.sql``
    — so the driver's oracle gate covers the dialect path, not a
    hand-built DataFrame equivalent.  The aggregate arg equals the
    sort key, so first/last among peer rows is value-determined in
    both engines.

    Round-12 plan (machine-checked, test_plans.py::
    test_exclude_family_keyed_compression): the keyed-window
    compression evaluates every half-frame window — including the
    formerly O(n²) UnboundedFollowing RANGE pair, measured 226 s at
    sf0.1 — over the distinct (l_returnflag, qty) grain and
    broadcast-joins back (0.8 s; dialect/keyed_windows.py).
    """
    li = tables(spark, sf_dir)["lineitem"]
    li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    ).createOrReplaceTempView("adt_wx_minmax_t")
    return _sql_frames(spark, f"{_MM_SELECT}\nFROM adt_wx_minmax_t")


_RX_F1 = (
    "PARTITION BY l_returnflag ORDER BY qty, l_orderkey, l_linenumber "
    "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING"
)
_RX_F2 = (
    "PARTITION BY l_returnflag ORDER BY qty, l_orderkey, l_linenumber "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
)
_RX_SELECT = f"""SELECT l_orderkey, l_linenumber,
       min(qty) OVER ({_RX_F1} EXCLUDE CURRENT ROW) AS min_excl_cur,
       max(qty) OVER ({_RX_F1} EXCLUDE CURRENT ROW) AS max_excl_cur,
       first_value(qty) OVER ({_RX_F2} EXCLUDE CURRENT ROW) AS fv_excl_cur,
       last_value(qty) OVER ({_RX_F2} EXCLUDE CURRENT ROW) AS lv_excl_cur,
       CAST(sum(qty) OVER ({_RX_F1} EXCLUDE CURRENT ROW) AS BIGINT)
         AS sum_excl_cur"""


@register(
    "q_window_exclude_rows",
    oracle=f"""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    {_RX_SELECT}
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT ROW over **ROWS** frames on
    min/max/first_value/last_value (row-space split-frame rewrite:
    ``ROWS [lo, 1 PRECEDING]`` / ``ROWS [1 FOLLOWING, hi]``) plus sum
    (subtraction), through the RAW-SQL rewrite itself — the last
    EXCLUDE construct a ported adt script could hit (DataFusion 48
    accepts the full frame grammar, crates/core/src/context.rs:32-33
    via the CLI pass-through crates/cli/src/main.rs:116; Spark parses
    no EXCLUDE at all).  The ORDER BY is a UNIQUE composite
    (qty, l_orderkey, l_linenumber): ROWS frames are only
    deterministic under a total order, so both engines see identical
    frame contents per output row.  All five windows share one
    partitioning and sort, so Catalyst plans ONE exchange + ONE sort
    (machine-checked, test_plans.py::test_exclude_rows_single_exchange).
    """
    from adt_spark.dialect.window_frames import rewrite_window_frames

    li = tables(spark, sf_dir)["lineitem"]
    li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    ).createOrReplaceTempView("adt_wx_rows_t")
    sql = f"{_RX_SELECT}\nFROM adt_wx_rows_t"
    return spark.sql(rewrite_window_frames(sql))


_NX_ORD = "PARTITION BY l_returnflag ORDER BY qty, l_orderkey, l_linenumber "
#: Spark-side text: EXCLUDE over frames that cannot contain the
#: current row; the rewrite must reduce each to its base frame (the
#: order key chain is NOT NULL, so the RANGE key-gate arm never fires).
_NX_SELECT_SPARK = f"""SELECT l_orderkey, l_linenumber,
       min(qty) OVER ({_NX_ORD}ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
         EXCLUDE CURRENT ROW) AS min_prev,
       max(qty) OVER ({_NX_ORD}ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING
         EXCLUDE CURRENT ROW) AS max_next,
       CAST(sum(qty) OVER ({_NX_ORD}ROWS BETWEEN UNBOUNDED PRECEDING AND
         1 PRECEDING EXCLUDE CURRENT ROW) AS BIGINT) AS sum_before,
       CAST(count(*) OVER ({_NX_ORD}ROWS BETWEEN 1 FOLLOWING AND 5
         FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS cnt_after,
       CAST(sum(qty) OVER (PARTITION BY l_returnflag ORDER BY qty
         RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING EXCLUDE GROUP)
         AS BIGINT) AS sum_rng"""
#: oracle: the SAME windows over their BASE frames (no EXCLUDE) —
#: the no-op's definition; DuckDB's own native EXCLUDE is
#: nonconformant on some non-straddling frames (see
#: tests/test_window_frames.py), so the oracle encodes the standard.
_NX_SELECT_ORACLE = f"""SELECT l_orderkey, l_linenumber,
       min(qty) OVER ({_NX_ORD}ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
         AS min_prev,
       max(qty) OVER ({_NX_ORD}ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
         AS max_next,
       CAST(sum(qty) OVER ({_NX_ORD}ROWS BETWEEN UNBOUNDED PRECEDING AND
         1 PRECEDING) AS BIGINT) AS sum_before,
       CAST(count(*) OVER ({_NX_ORD}ROWS BETWEEN 1 FOLLOWING AND 5
         FOLLOWING) AS BIGINT) AS cnt_after,
       CAST(sum(qty) OVER (PARTITION BY l_returnflag ORDER BY qty
         RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS sum_rng"""


@register(
    "q_window_exclude_noop",
    oracle=f"""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    {_NX_SELECT_ORACLE}
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude_noop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE over frames that CANNOT contain the current row (both
    bounds strictly preceding / strictly following) through the
    raw-SQL rewrite: pure removals of absent rows are no-ops, so each
    window must reduce to its base frame — CURRENT ROW over four
    non-straddling ROWS frames (all aggregate families) plus GROUP
    over a non-straddling value-offset RANGE frame, where the rewrite
    additionally gates on key nullness (a NULL-keyed row's
    numeric-RANGE frame is its null peer group — here qty is NOT
    NULL, so the gate arm is dead but present in the plan).
    DataFusion 48 accepts the full frame grammar
    (crates/core/src/context.rs:32-33 via crates/cli/src/main.rs:116);
    Spark parses no EXCLUDE at all.  The composite ORDER BY
    (qty, l_orderkey, l_linenumber) is unique, so ROWS frames are
    deterministic on both engines.

    Frame-shape note (measured): a moving-start frame ending at
    UNBOUNDED FOLLOWING routes Spark aggregates through
    UnboundedFollowingWindowFunctionFrame, which RECOMPUTES the
    aggregate from scratch per row — O(n²) per partition (~470 s on
    sf0.1's 3 return-flag partitions vs ~2 s for the identical query
    over bounded frames).  Since round 7 the rewriter's second pass
    (`_rewrite_moving_start_ubf`) rewrites those frames into O(n)
    complements — exercised and oracled by
    q_window_unbounded_following; this benched query keeps its
    trailing frames bounded (they predate the pass and already
    measure the bounded plan).
    """
    from adt_spark.dialect.window_frames import rewrite_window_frames

    li = tables(spark, sf_dir)["lineitem"]
    li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    ).createOrReplaceTempView("adt_wx_noop_t")
    sql = f"{_NX_SELECT_SPARK}\nFROM adt_wx_noop_t"
    return spark.sql(rewrite_window_frames(sql))


_VR_ORD = "PARTITION BY l_returnflag ORDER BY qty "
#: one SQL text for BOTH engines (DuckDB native EXCLUDE is
#: conformant on straddling frames — the nonconformance the noop
#: oracle routes around is specific to non-straddling ones).  Every
#: argument is value-determined (l_orderkey min/max over a
#: value-defined row set; first/last over expressions functionally
#: dependent on the order key), so tied qty values cannot make the
#: comparison nondeterministic.
_VR_SELECT = f"""SELECT l_orderkey, l_linenumber,
       min(l_orderkey) OVER ({_VR_ORD}RANGE BETWEEN 2 PRECEDING AND
         2 FOLLOWING EXCLUDE GROUP) AS min_ok_xg,
       max(l_orderkey) OVER ({_VR_ORD}RANGE BETWEEN 2 PRECEDING AND
         2 FOLLOWING EXCLUDE TIES) AS max_ok_xt,
       first_value(qty * 3 - 1) OVER ({_VR_ORD}RANGE BETWEEN 2 PRECEDING
         AND 2 FOLLOWING EXCLUDE GROUP) AS fv_xg,
       last_value(qty * 3 - 1) OVER ({_VR_ORD}RANGE BETWEEN 2 PRECEDING
         AND 2 FOLLOWING EXCLUDE TIES) AS lv_xt,
       min(l_orderkey) OVER ({_VR_ORD}RANGE BETWEEN UNBOUNDED PRECEDING
         AND 2 FOLLOWING EXCLUDE GROUP) AS min_ok_unb,
       CAST(sum(qty) OVER ({_VR_ORD}RANGE BETWEEN 2 PRECEDING AND
         2 FOLLOWING EXCLUDE GROUP) AS BIGINT) AS sum_xg,
       CAST(count(qty) OVER ({_VR_ORD}RANGE BETWEEN 2 PRECEDING AND
         2 FOLLOWING EXCLUDE TIES) AS BIGINT) AS cnt_xt"""


@register(
    "q_window_exclude_range_value",
    oracle=f"""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    {_VR_SELECT}
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude_range_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE GROUP/TIES on the order-statistic family over
    value-offset RANGE frames with an INTEGER order key — the round-6
    verdict's last sound-but-refused EXCLUDE residue (item 6), now the
    VALUE-SPACE split rewrite: for integral keys the non-peer frame
    rows are exactly ``RANGE [lo, 1 PRECEDING]`` ∪ ``RANGE
    [1 FOLLOWING, hi]`` (key < k ⇔ key ≤ k−1), combined with the same
    least/greatest and count-guarded forms the peer-space split uses —
    no injected dense_rank, no statement wrap.  The emitted SQL
    carries a whole-partition runtime integrality guard
    (raise_error() on fractional/degenerate keys: a textual rewrite
    cannot see column types) and NULL-key CASE arms encoding the
    measured null-frame behavior; qty is NOT NULL here, so those arms
    are dead-but-present (the NULL behavior itself is pinned against
    DuckDB native EXCLUDE in tests/test_window_frames.py's value-range
    matrix).  DataFusion 48 accepts the full frame grammar
    (crates/core/src/context.rs:32-33 via crates/cli/src/main.rs:116).
    sum/count ride along proving the subtraction family composes in
    the same statement.  The oracle is the IDENTICAL text on DuckDB's
    native EXCLUDE, conformant on straddling frames.
    """
    li = tables(spark, sf_dir)["lineitem"]
    li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    ).createOrReplaceTempView("adt_wx_vrng_t")
    return _sql_frames(spark, f"{_VR_SELECT}\nFROM adt_wx_vrng_t")


_DVR_ORD = "PARTITION BY o_orderstatus ORDER BY od "
_DVR_F = "INTERVAL '3' DAY PRECEDING AND INTERVAL '3' DAY FOLLOWING"
#: one SQL text for BOTH engines (DuckDB native EXCLUDE, conformant on
#: straddling frames, vs Spark through the rewriter).  Arguments are
#: value-determined: min/max over o_orderkey (set-determined on a
#: value-defined row set), first/last over the order key itself, and
#: the subtraction family over an exact-integer derivation — tied
#: order dates cannot make the comparison nondeterministic.
_DVR_SELECT = f"""SELECT o_orderkey,
       min(o_orderkey) OVER ({_DVR_ORD}RANGE BETWEEN {_DVR_F}
         EXCLUDE GROUP) AS min_ok_xg,
       max(o_orderkey) OVER ({_DVR_ORD}RANGE BETWEEN {_DVR_F}
         EXCLUDE TIES) AS max_ok_xt,
       first_value(od) OVER ({_DVR_ORD}RANGE BETWEEN {_DVR_F}
         EXCLUDE GROUP) AS fv_xg,
       last_value(od) OVER ({_DVR_ORD}RANGE BETWEEN {_DVR_F}
         EXCLUDE TIES) AS lv_xt,
       min(o_orderkey) OVER ({_DVR_ORD}RANGE BETWEEN UNBOUNDED PRECEDING
         AND INTERVAL '3' DAY FOLLOWING EXCLUDE GROUP) AS min_ok_unb,
       CAST(sum(okm) OVER ({_DVR_ORD}RANGE BETWEEN {_DVR_F}
         EXCLUDE GROUP) AS BIGINT) AS sum_xg,
       CAST(count(okm) OVER ({_DVR_ORD}RANGE BETWEEN {_DVR_F}
         EXCLUDE TIES) AS BIGINT) AS cnt_xt"""


@register(
    "q_window_exclude_range_date",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_orderdate AS DATE) AS od,
             o_orderkey % 97 AS okm
      FROM orders
    )
    {_DVR_SELECT}
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude_range_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE GROUP/TIES on the order-statistic family over RANGE
    frames with ``INTERVAL DAY`` offsets and a DATE order key — the
    round-7 verdict's item 4 (the next soundly rewritable subset after
    integers): 1 DAY is the unit step of DATE-key space, so the
    non-peer frame rows are exactly ``RANGE [lo, INTERVAL '1' DAY
    PRECEDING]`` ∪ ``RANGE [INTERVAL '1' DAY FOLLOWING, hi]``
    (key < k ⇔ key ≤ k − 1 DAY), combined with the same least/greatest
    and count-guarded forms as the integer split.  The emitted SQL
    carries a whole-partition runtime day-alignment guard
    (raise_error() on sub-day TIMESTAMP keys — a textual rewrite
    cannot see column types); od is NOT NULL here, so the NULL-key
    CASE arms are dead-but-present (the NULL behavior is pinned
    against DuckDB native EXCLUDE in tests/test_window_frames.py's
    date matrix).  DataFusion 48 accepts the full frame grammar
    (crates/core/src/context.rs:32-33 via crates/cli/src/main.rs:116).
    sum/count ride along proving the subtraction family composes over
    the same newly-parsed interval frames.  The oracle is the
    IDENTICAL text on DuckDB's native EXCLUDE.
    """
    o = tables(spark, sf_dir)["orders"]
    o.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("od"),
        (F.col("o_orderkey") % 97).alias("okm"),
    ).createOrReplaceTempView("adt_wx_drng_t")
    return _sql_frames(spark, f"{_DVR_SELECT}\nFROM adt_wx_drng_t")


_MVR_ORD = "PARTITION BY o_orderstatus ORDER BY od "
_MVR_F = "INTERVAL '2' MONTH PRECEDING AND INTERVAL '1' MONTH FOLLOWING"
#: one SQL text for BOTH engines — measured this round: DuckDB's
#: native EXCLUDE equals the standard frame arithmetic on STRADDLING
#: MONTH/YEAR frames (the divergence is non-straddling-only; see
#: tests/test_window_frames.py::test_ym_nonstraddling_…), so the
#: subtraction family can be graded against it directly.
_MVR_SELECT = f"""SELECT o_orderkey,
       CAST(sum(okm) OVER ({_MVR_ORD}RANGE BETWEEN {_MVR_F}
         EXCLUDE GROUP) AS BIGINT) AS sum_xg,
       CAST(count(okm) OVER ({_MVR_ORD}RANGE BETWEEN {_MVR_F}
         EXCLUDE TIES) AS BIGINT) AS cnt_xt,
       CAST(avg(okm) OVER ({_MVR_ORD}RANGE BETWEEN {_MVR_F}
         EXCLUDE CURRENT ROW) AS DOUBLE) AS avg_xc,
       CAST(sum(okm) OVER ({_MVR_ORD}RANGE BETWEEN INTERVAL '1' YEAR
         PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS BIGINT) AS sum_y_xg"""


@register(
    "q_window_exclude_range_month",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_orderdate AS DATE) AS od,
             o_orderkey % 97 AS okm
      FROM orders
    )
    {_MVR_SELECT}
    FROM t
    """,
    tags=("window", "exclude"),
)
def q_window_exclude_range_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE over RANGE frames with ``INTERVAL MONTH/YEAR`` offsets
    on a DATE order key — the round-11 adjudication of the r10
    verdict's #5 (the last EXCLUDE residue).  Measured on Spark 4:
    YearMonthIntervalType RANGE bounds ARE accepted on DATE/TIMESTAMP
    keys, so the SUBTRACTION family (sum/count/avg/variance) — which
    emits the user's frame UNCHANGED and subtracts the peer-group
    aggregate — now covers MONTH/YEAR frames outright; no unit-step
    split is involved, so no runtime guard is needed.  The
    order-statistic split stays loudly gated with the precise Spark
    refusal (mixed YearMonth/DayTime frame bounds —
    DATATYPE_MISMATCH.SPECIFIED_WINDOW_FRAME_DIFF_TYPES — and no
    year-month unit step exists), and non-straddling MONTH frames
    refuse on the measured DuckDB-vs-standard clamping divergence.
    DataFusion 48 accepts the full frame grammar
    (crates/core/src/context.rs:32-33 via crates/cli/src/main.rs:116).
    The oracle is the IDENTICAL text on DuckDB's native EXCLUDE,
    conformant on straddling frames (measured, month-end clamp dates
    included in the local matrix)."""
    o = tables(spark, sf_dir)["orders"]
    o.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("od"),
        (F.col("o_orderkey") % 97).alias("okm"),
    ).createOrReplaceTempView("adt_wx_mrng_t")
    return _sql_frames(spark, f"{_MVR_SELECT}\nFROM adt_wx_mrng_t")


_UF_ORD = "PARTITION BY rf ORDER BY qty, l_orderkey, l_linenumber "
#: one SQL text for BOTH engines: DuckDB runs it natively (its
#: incremental evaluator is conformant here), Spark runs it through
#: the rewriter — so the oracle grades the rewrite against the
#: un-rewritten semantics directly.  ``nqty`` is deterministically
#: NULL on every third line, exercising the count guards.
_UF_SELECT = f"""SELECT l_orderkey, l_linenumber,
       CAST(sum(nqty) OVER ({_UF_ORD}ROWS BETWEEN 1 FOLLOWING AND
         UNBOUNDED FOLLOWING) AS BIGINT) AS sum_after,
       CAST(count(nqty) OVER ({_UF_ORD}ROWS BETWEEN 2 PRECEDING AND
         UNBOUNDED FOLLOWING) AS BIGINT) AS cnt_from_prev,
       CASE WHEN count(nqty) OVER ({_UF_ORD}ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING) = 0 THEN NULL
            ELSE CAST(sum(nqty) OVER ({_UF_ORD}ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING) AS DOUBLE)
               / count(nqty) OVER ({_UF_ORD}ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING) END AS avg_from_cur,
       min(qty) OVER ({_UF_ORD}ROWS BETWEEN 1 FOLLOWING AND
         UNBOUNDED FOLLOWING) AS min_after,
       max(qty) OVER ({_UF_ORD}ROWS BETWEEN 3 PRECEDING AND
         UNBOUNDED FOLLOWING) AS max_from_prev,
       first_value(nqty) OVER ({_UF_ORD}ROWS BETWEEN 2 FOLLOWING AND
         UNBOUNDED FOLLOWING) AS fv_after,
       last_value(nqty) OVER ({_UF_ORD}ROWS BETWEEN 50 FOLLOWING AND
         UNBOUNDED FOLLOWING) AS lv_far"""


@register(
    "q_window_unbounded_following",
    oracle=f"""
    WITH t AS (
      -- grouped to UNIQUE (l_orderkey, l_linenumber): the synthetic
      -- lineitem has duplicate key pairs, and a tied ROWS order is
      -- nondeterministic on every engine (and under the reversal)
      SELECT l_orderkey, l_linenumber,
             min(l_returnflag) AS rf,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CASE WHEN l_linenumber % 3 = 0 THEN NULL
                  ELSE CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
             END AS nqty
      FROM lineitem GROUP BY l_orderkey, l_linenumber
    )
    {_UF_SELECT}
    FROM t
    """,
    tags=("window", "frames"),
)
def q_window_unbounded_following(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-start ``ROWS … AND UNBOUNDED FOLLOWING`` frames on every
    rewritable aggregate family, through the raw-SQL rewriter
    (`window_frames._rewrite_moving_start_ubf`, round-6 verdict item
    2): Spark executes these frames through
    UnboundedFollowingWindowFunctionFrame — O(n²) per partition,
    measured 469.7 s vs 3.1 s at sf0.1 — while DataFusion evaluates
    them incrementally (a ported adt script hits the cliff only on
    Spark; DataFusion 48 accepts the full frame grammar,
    crates/core/src/context.rs:32-33 via crates/cli/src/main.rs:116).
    The rewrite: count becomes whole-partition minus running prefix
    (integer subtraction, exact); sum/avg/min/max run the same NATIVE
    aggregate over the REVERSED order with the complementary
    moving-END frame (type-faithful for DECIMAL — round-7 ADVICE
    item 1 — and O(n), Spark evaluates moving-END incrementally);
    first_value becomes lead(), last_value the count-guarded
    partition edge value.  The average is spelled as count-guarded
    sum/count in the SHARED text because DuckDB's native windowed avg
    accumulates doubles (measured 1.4e-14 off the exact integer ratio
    at sf0.01; the avg() rewrite itself is matrix-tested in
    tests/test_window_frames.py).  The oracle is the
    UN-rewritten SQL on DuckDB's conformant incremental evaluator —
    grading the rewrite against the original semantics directly.
    Start offsets cover FOLLOWING / CURRENT ROW / PRECEDING and a
    50-row start whose frame is empty near each partition tail
    (NULL-guard coverage); ``nqty`` is NULL on every third line
    (all-NULL-suffix coverage).  The source is GROUPED to unique
    (l_orderkey, l_linenumber) pairs — the synthetic lineitem has
    duplicate key pairs, and a tied ROWS order is nondeterministic on
    every engine (measured: the reversal realizes a different valid
    tie order) — so the composite ORDER BY is a total order and the
    frames are deterministic on both engines.  A plan check
    (test_plans.py::test_unbounded_following_rewritten_out) asserts
    no moving-start UnboundedFollowing frame survives into the
    physical plan; integer args keep the subtraction exact
    (queries/__init__.py rule 1).
    """
    from adt_spark.dialect.window_frames import rewrite_window_frames

    li = tables(spark, sf_dir)["lineitem"]
    g = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.min("l_returnflag").alias("rf"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    g.select(
        "l_orderkey",
        "l_linenumber",
        "rf",
        "qty",
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("qty"))
        .alias("nqty"),
    ).createOrReplaceTempView("adt_wx_ubf_t")
    sql = f"{_UF_SELECT}\nFROM adt_wx_ubf_t"
    return spark.sql(rewrite_window_frames(sql))


@register(
    "q_lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name AS nation, t.c_name AS customer, t.c_acctbal AS acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
    tags=("join", "lateral", "topk"),
)
def q_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT
    (top-2 customers by balance per nation) — the PostgreSQL-dialect
    construct, run natively by Spark 4's parser.  Catalyst decorrelates
    it to the window top-k plan (WindowGroupLimit), so the SQL sugar
    costs nothing over the explicit ``row_number() <= k`` formulation;
    the unique-key tiebreak makes the result set deterministic across
    engines.
    """
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_name AS customer, t.c_acctbal AS acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )


@register(
    "q_group_order_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("agg", "group_by_all"),
)
def q_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` — the modern-dialect sugar
    (DuckDB / DataFusion / Spark 3.4+ all parse it natively): group by
    every non-aggregate select item, order by every output column.
    Runs through ``spark.sql`` on the registered views, proving the
    SQL entry point accepts the spelling unmodified."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )
