"""Extended TPC-H-adapted corpus — the remaining classic TPC-H query
shapes expressible over the driver's trimmed schema (no partsupp
table; lineitem lacks commitdate/receiptdate/shipmode; part lacks
container/mfgr).  Each query keeps the canonical plan shape of its
TPC-H counterpart — that is what exercises the optimizer — with
predicates re-anchored to this data's value domains
(nations NATION_0..24, p_type in 6 classes, p_name adjective-noun).

Covers the reference's inherited DataFusion 48 join/agg/subquery
surface (SURVEY.md §2.B; raw-SQL pass-through crates/cli/src/main.rs:116
→ crates/core/src/context.rs:93-105).

Exactness: money math in DECIMAL(12,2)/(4,2); ratios divide DOUBLES
(decimal-division precision/scale rules differ across engines);
output doubles cast at the boundary only.  Top-k orderings carry a
unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables
from adt_spark.queries.relational import (
    _D_DISC_PRICE,
    _D_EP,
    _disc_price,
    _money,
    _qty,
)


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (late-line variant: commitdate/receiptdate columns do
    not exist here, so "late" = any line shipped after the order
    date).  Correlated EXISTS → left-semi join with a non-equi
    residual; the quarter filter prunes orders at the scan before the
    shuffle on orderkey.
    """
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Nation sides are forced broadcasts (25 rows); supplier/customer
    are left to AQE (they SCALE with SF — small-SF runs broadcast
    them at runtime, huge SFs degrade to shuffle, never OOM); the
    disjunctive nation-pair predicate is applied after the joins, as
    in the spec.  lineitem⋈orders on orderkey is the one shuffle.
    """
    t = tables(spark, sf_dir)
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
        )
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(coalesce(sum(CASE WHEN nation = 'NATION_3' THEN volume END), 0) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_D_DISC_PRICE} AS volume, n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) GROUP BY o_year
    """,
    tags=("join", "agg", "conditional"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market per year.

    8-way star join: nation/region force-broadcast (bounded);
    part/supplier/customer are AQE's call (they scale with SF);
    lineitem⋈orders is the one guaranteed shuffle.
    Both numerator and denominator are exact decimal sums; the share
    divides doubles (decimal division rounds differently per engine).
    """
    t = tables(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "AMERICA")
    n1 = t["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    part = t["part"].filter(F.col("p_type") == "ECONOMY")
    vol = _disc_price()
    return (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("nation") == "NATION_3", vol)), F.lit(0)
            ).cast("double").alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .select("o_year", (F.col("_num") / F.col("_den")).alias("mkt_share"))
    )


@register(
    "q09_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_D_DISC_PRICE} AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    """,
    tags=("join", "agg"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (no partsupp/supplycost in this schema, so profit =
    discounted revenue) by supplier nation × order year for parts
    matching a name pattern.  The LIKE filter prunes part before the
    join (AQE broadcasts the pruned side when it measures small —
    part scales with SF, so the hint is not forced); 25 × 7 groups.
    """
    t = tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * CAST(coalesce(sum(CASE WHEN p_type = 'PROMO'
                                           THEN {_D_DISC_PRICE} END), 0) AS DOUBLE)
             / CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
    """,
    tags=("join", "agg", "conditional"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share in one month.  The part join is
    AQE-sized (part scales with SF — broadcast at runtime when small);
    the month filter is scan-pushed on lineitem; single global
    aggregate — map-side partials reduce to one row.
    """
    t = tables(spark, sf_dir)
    vol = _disc_price()
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("date"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("p_type") == "PROMO", vol)), F.lit(0)
            ).cast("double").alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .select((F.lit(100.00) * F.col("_num") / F.col("_den")).alias("promo_revenue"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_D_DISC_PRICE}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue.

    The revenue CTE aggregates once; the max is a 1-row broadcast
    joined back on decimal equality (sums are exact decimals, so the
    equality is deterministic — never compare float totals).
    """
    t = tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("_rev_dec"))
    )
    top = rev.agg(F.max("_rev_dec").alias("_max_rev"))
    return (
        rev.join(F.broadcast(top), rev._rev_dec == F.col("_max_rev"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("_rev_dec").cast("double").alias("total_revenue")
        )
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT CAST(sum({_D_EP}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("join", "subquery", "agg"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of below-half-average-quantity lines.

    The correlated per-part average decorrelates to groupBy(partkey)
    joined back on partkey — both sides pre-filtered to the brand's
    partkeys (per-part avg is unchanged by the restriction, and at
    scale this turns a full-lineitem aggregation into a sliver).
    l_quantity is integral-valued so sum/count divide exactly: the
    0.5*avg threshold is engine-independent.
    """
    t = tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = t["lineitem"].join(part, F.col("l_partkey") == F.col("p_partkey"))
    avgs = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("_half_avg")
    )
    return (
        li.join(avgs, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg((F.sum(_money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 160
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    tags=("join", "agg", "having", "topk"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold.

    Aggregate lineitem by orderkey FIRST (partial-agg shrinks the
    shuffle), filter with HAVING, then join the surviving handful of
    orders; top-100 via TakeOrderedAndProject with orderkey tiebreak.
    """
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_qty("l_quantity")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 160)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("_qty_dec").cast("double").alias("sum_qty"),
        )
    )


@register(
    "q19_bracketed_revenue",
    oracle=f"""
    SELECT CAST(sum({_D_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    tags=("join", "filter", "agg"),
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (container column absent → brand/size/quantity
    brackets): disjunctive mixed-table predicate over an equi-join.
    The part-only disjuncts (brand ∈ {{12,23,34}}) pre-filter the
    broadcast side; the residual OR evaluates post-join in codegen.
    """
    t = tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))

    def bracket(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    return (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            bracket("Brand#12", 15, 1, 30)
            | bracket("Brand#23", 25, 10, 40)
            | bracket("Brand#34", 35, 20, 50)
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey
    """,
    tags=("join", "anti", "subquery", "agg"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (no phone column → "idle" = above-average balance and
    no orders since 2000).  Scalar-avg subquery becomes a 1-row
    broadcast cross join; NOT EXISTS becomes a left-anti join against
    date-filtered orders.  The average is computed as exact decimal
    sum ÷ count, divided in doubles — a plain avg over doubles is
    accumulation-order-dependent and could flip the > gate for a
    balance within 1 ulp of the threshold.
    """
    t = tables(spark, sf_dir)
    cust = t["customer"]
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_money("c_acctbal")).cast("double") / F.count("*")).alias("_avg_bal")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
