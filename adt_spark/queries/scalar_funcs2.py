"""Second scalar/aggregate/window function coverage wave — fills the
remaining SURVEY.md §2.B inventory rows not exercised by
``scalar_funcs``/``relational``:

- window distribution family: ntile / percent_rank / cume_dist /
  nth_value / first_value / last_value (DataFusion
  ``datafusion-functions-window``, Cargo.lock:1818)
- bit/bool aggregates: bit_and/or/xor, bool_and/bool_or
  (``datafusion-functions-aggregate``, Cargo.lock:1735)
- ``FILTER (WHERE …)`` aggregate clauses (DataFusion SQL surface via
  the raw pass-through, crates/cli/src/main.rs:116)
- linear-regression aggregate family: regr_slope/intercept/r2/…
- extended string family: levenshtein, initcap, translate, strpos,
  lpad/rpad, left/right, repeat, reverse, ascii, chr
  (``string_expressions``/``unicode_expressions``)
- extended array family: array_union/intersect/except, slice,
  position, flatten, sort (``nested_expressions``, Cargo.lock:1781)

Cross-engine exactness: outputs are integers, strings, or doubles
that either derive from exact integer arithmetic (bit/bool/count) or
are rounded at the boundary (regr_* use incremental float updates
whose accumulation order differs per engine).  Array results are
sorted and joined to strings — element order of set operations is
engine-defined, the sorted content is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from adt_spark.queries import register, tables


@register(
    "q_window_dist_family",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS INT) AS tile4,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist,
           nth_value(c_custkey, 2) OVER w AS second_key,
           first_value(c_custkey) OVER w AS first_key,
           last_value(c_custkey) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_key
    FROM customer
    WHERE c_custkey <= 500
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def q_window_dist_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/navigation window family.  The order key carries a
    unique tiebreak (custkey) so RANGE-frame defaults and ntile
    bucketing are deterministic; last_value uses an explicit
    unbounded ROWS frame (the default frame stops at CURRENT ROW,
    which would make it a no-op alias of the current row).
    Scale: partitioned by nationkey — per-partition window state,
    no global sort.
    """
    cust = tables(spark, sf_dir)["customer"].filter(F.col("c_custkey") <= 500)
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).cast("int").alias("tile4"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("c_custkey", 2).over(w).alias("second_key"),
        F.first_value("c_custkey").over(w).alias("first_key"),
        F.last_value("c_custkey").over(w_full).alias("last_key"),
    )


@register(
    "q_agg_bit_bool",
    oracle="""
    SELECT p_brand,
           CAST(bit_and(p_size) AS INT) AS size_bit_and,
           CAST(bit_or(p_size) AS INT) AS size_bit_or,
           CAST(bit_xor(p_size) AS INT) AS size_bit_xor,
           bool_and(p_retailprice > 500) AS all_over_500,
           bool_or(p_size > 45) AS any_big
    FROM part
    GROUP BY p_brand
    """,
    tags=("agg", "bit", "bool"),
)
def q_agg_bit_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit/bool aggregate family — exact integer/boolean lattice
    operations, engine-independent by construction; one partial+final
    hash aggregate."""
    part = tables(spark, sf_dir)["part"]
    return part.groupBy("p_brand").agg(
        F.bit_and("p_size").cast("int").alias("size_bit_and"),
        F.bit_or("p_size").cast("int").alias("size_bit_or"),
        F.bit_xor("p_size").cast("int").alias("size_bit_xor"),
        F.bool_and(F.col("p_retailprice") > 500).alias("all_over_500"),
        F.bool_or(F.col("p_size") > 45).alias("any_big"),
    )


_FILTER_SQL = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
              FILTER (WHERE o_orderdate >= DATE '2000-01-01') AS DOUBLE)
         AS recent_total,
       CAST(count(*) AS BIGINT) AS n_all
FROM orders
GROUP BY o_orderpriority
"""


@register("q_agg_filter_clause", oracle=_FILTER_SQL, tags=("agg", "filter"))
def q_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FILTER (WHERE …)`` aggregate clauses, run through ``spark.sql``
    on the registered views — the same SQL text executes on both
    engines (SQL-92 FILTER is common syntax), exercising our raw-SQL
    entry path (reference: main.rs:116 pass-through).  The filtered
    sums stay DECIMAL until the output cast."""
    tables(spark, sf_dir)
    return spark.sql(_FILTER_SQL)


@register(
    "q_regr_family",
    oracle="""
    SELECT c_mktsegment,
           CAST(regr_count(c_acctbal, c_nationkey) AS BIGINT) AS n,
           round(regr_slope(c_acctbal, c_nationkey), 6) AS slope_r6,
           round(regr_intercept(c_acctbal, c_nationkey), 6) AS icept_r6,
           round(regr_r2(c_acctbal, c_nationkey), 6) AS r2_r6,
           round(regr_avgx(c_acctbal, c_nationkey), 6) AS avgx_r6,
           round(regr_avgy(c_acctbal, c_nationkey), 6) AS avgy_r6
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "regr"),
)
def q_regr_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (y = acctbal over x = nationkey per
    segment).  Both engines use incremental (order-dependent) float
    updates internally, so the comparable surface is the 6-dp-rounded
    value; regr_count is exact."""
    cust = tables(spark, sf_dir)["customer"]
    y, x = F.col("c_acctbal"), F.col("c_nationkey").cast("double")
    return cust.groupBy("c_mktsegment").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope_r6"),
        F.round(F.regr_intercept(y, x), 6).alias("icept_r6"),
        F.round(F.regr_r2(y, x), 6).alias("r2_r6"),
        F.round(F.regr_avgx(y, x), 6).alias("avgx_r6"),
        F.round(F.regr_avgy(y, x), 6).alias("avgy_r6"),
    )


@register(
    "q_string_extra",
    oracle="""
    SELECT n_nationkey,
           levenshtein(n_name, 'NATION_0') AS lev_to_n0,
           upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2)
             AS name_initcap,
           translate(n_name, 'NATIO', 'natio') AS name_translated,
           CAST(strpos(n_name, '_') AS INT) AS underscore_pos,
           lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_lpad,
           rpad(n_name, 12, '.') AS name_rpad,
           left(n_name, 6) AS name_left,
           right(n_name, 2) AS name_right,
           repeat('ab', n_nationkey % 3 + 1) AS rep,
           reverse(n_name) AS name_rev,
           CAST(ascii(n_name) AS INT) AS first_ascii,
           chr(65 + n_nationkey % 26) AS letter
    FROM nation
    """,
    tags=("expr", "string"),
)
def q_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family.  ``initcap`` has no DuckDB builtin — the
    oracle emulates it with upper(first)+lower(rest), which matches
    Spark's initcap exactly on these single-word values.  ``strpos``
    (DataFusion/Postgres name) maps to Spark ``instr`` — also exposed
    as a session UDF by the dialect shim."""
    nation = tables(spark, sf_dir)["nation"]
    n = F.col("n_name")
    return nation.select(
        "n_nationkey",
        F.levenshtein(n, F.lit("NATION_0")).alias("lev_to_n0"),
        F.initcap(F.lower(n)).alias("name_initcap"),
        F.translate(n, "NATIO", "natio").alias("name_translated"),
        F.instr(n, "_").cast("int").alias("underscore_pos"),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("key_lpad"),
        F.rpad(n, 12, ".").alias("name_rpad"),
        F.left(n, F.lit(6)).alias("name_left"),
        F.right(n, F.lit(2)).alias("name_right"),
        F.repeat(F.lit("ab"), (F.col("n_nationkey") % 3 + 1).cast("int")).alias("rep"),
        F.reverse(n).alias("name_rev"),
        F.ascii(n).cast("int").alias("first_ascii"),
        F.chr((F.lit(65) + F.col("n_nationkey") % 26).cast("bigint")).alias("letter"),
    )


@register(
    "q_array_extended",
    oracle="""
    WITH base AS (
      SELECT n_nationkey, n_regionkey,
             [n_nationkey, n_regionkey, n_nationkey % 7] AS a,
             [n_regionkey, n_nationkey % 7, 99] AS b
      FROM nation
    )
    SELECT n_nationkey,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',')
             AS union_sorted,
           array_to_string(list_sort(list_intersect(a, b)), ',') AS intersect_sorted,
           coalesce(array_to_string(
             list_sort(list_filter(list_distinct(a),
                                   x -> NOT list_contains(b, x))), ','), '')
             AS except_sorted,
           array_to_string(a[2:3], ',') AS slice_2_3,
           CAST(list_position(a, n_regionkey) AS INT) AS pos_of_region,
           array_to_string(flatten([a, b]), ',') AS flat,
           CAST(len(a) AS INT) AS len_a
    FROM base
    """,
    tags=("expr", "array"),
)
def q_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended array family (union/intersect/except/slice/position/
    flatten).  Set-operation element order is engine-defined, so the
    comparison surface is the sorted, comma-joined content; slice and
    flatten preserve order and compare verbatim.  Spark's 1-based
    ``slice``/``element_at`` semantics match DuckDB's 1-based list
    indexing (SURVEY.md §2.B nested_expressions: matching 1-based
    semantics)."""
    nation = tables(spark, sf_dir)["nation"]
    k = F.col("n_nationkey")
    a = F.array(k, F.col("n_regionkey"), k % 7)
    b = F.array(F.col("n_regionkey"), k % 7, F.lit(99).cast("int"))
    join_sorted = lambda arr: F.array_join(F.array_sort(arr), ",")  # noqa: E731
    return nation.select(
        "n_nationkey",
        join_sorted(F.array_distinct(F.concat(a, b))).alias("union_sorted"),
        join_sorted(F.array_intersect(a, b)).alias("intersect_sorted"),
        join_sorted(F.array_except(a, b)).alias("except_sorted"),
        F.array_join(F.slice(a, 2, 2), ",").alias("slice_2_3"),
        F.array_position(a, F.col("n_regionkey")).cast("int").alias("pos_of_region"),
        F.array_join(F.flatten(F.array(a, b)), ",").alias("flat"),
        F.size(a).alias("len_a"),
    )
