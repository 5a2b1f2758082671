"""Scalar-function family coverage — the DataFusion function packages
the reference compiles in (SURVEY.md §2.B: math, crypto, encoding,
struct/map, conditional, casts), exercised row-wise over driver
tables with exact or boundary-safe oracles.

Exactness notes:
- sqrt/abs/floor/ceil/round/sign are IEEE-exact → compared raw.
- exp/ln/sin/cos are libm-dependent (JVM StrictMath vs DuckDB libm
  can differ in the last ulp) → compared after round(…, 6), where a
  1-ulp difference cannot flip the rounded value away from boundary.
- md5/sha2/hex/base64 are byte-exact strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables


@register(
    "q_math_functions",
    oracle="""
    SELECT p_partkey,
           sqrt(CAST(p_size AS DOUBLE)) AS sqrt_size,
           abs(p_retailprice - 1000) AS abs_diff,
           CAST(ceil(p_retailprice / 100) AS BIGINT) AS ceil_h,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS floor_h,
           round(p_retailprice / 7, 2) AS seventh_r2,
           CAST(sign(p_retailprice - 1200) AS DOUBLE) AS sgn,
           CAST(p_size % 7 AS INT) AS size_mod7,
           round(exp(CAST(p_size AS DOUBLE) / 50), 6) AS exp_r6,
           round(ln(CAST(p_size AS DOUBLE) + 1), 6) AS ln_r6,
           round(sin(CAST(p_size AS DOUBLE)), 6) AS sin_r6,
           round(pow(CAST(p_size AS DOUBLE), 2), 1) AS size_sq
    FROM part
    WHERE p_partkey <= 300
    """,
    tags=("expr", "math"),
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (DataFusion math_expressions → Spark builtins)."""
    part = tables(spark, sf_dir)["part"].filter(F.col("p_partkey") <= 300)
    size_d = F.col("p_size").cast("double")
    return part.select(
        "p_partkey",
        F.sqrt(size_d).alias("sqrt_size"),
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.ceil(F.col("p_retailprice") / 100).cast("bigint").alias("ceil_h"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("floor_h"),
        F.round(F.col("p_retailprice") / 7, 2).alias("seventh_r2"),
        F.signum(F.col("p_retailprice") - 1200).alias("sgn"),
        (F.col("p_size") % 7).cast("int").alias("size_mod7"),
        F.round(F.exp(size_d / 50), 6).alias("exp_r6"),
        F.round(F.log(size_d + 1), 6).alias("ln_r6"),
        F.round(F.sin(size_d), 6).alias("sin_r6"),
        F.round(F.pow(size_d, 2), 1).alias("size_sq"),
    )


@register(
    "q_crypto_encoding",
    oracle="""
    SELECT n_nationkey,
           md5(n_name) AS name_md5,
           sha256(n_name) AS name_sha256,
           lower(hex(encode(n_name))) AS name_hex,
           to_base64(encode(n_name)) AS name_b64,
           decode(from_base64(to_base64(encode(n_name)))) AS roundtrip
    FROM nation
    """,
    tags=("expr", "crypto"),
)
def q_crypto_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto + encoding families (md5/sha2, hex, base64 round-trip;
    reference: crypto_expressions + encoding_expressions)."""
    nation = tables(spark, sf_dir)["nation"]
    blob = F.encode(F.col("n_name"), "UTF-8")
    return nation.select(
        "n_nationkey",
        F.md5(F.col("n_name")).alias("name_md5"),
        F.sha2(blob, 256).alias("name_sha256"),
        F.lower(F.hex(blob)).alias("name_hex"),
        F.base64(blob).alias("name_b64"),
        F.decode(F.unbase64(F.base64(blob)), "UTF-8").alias("roundtrip"),
    )


@register(
    "q_struct_map_array",
    oracle="""
    SELECT o_orderkey,
           struct_pack(k := o_orderkey, p := o_orderpriority).k AS s_key,
           struct_pack(k := o_orderkey, p := o_orderpriority).p AS s_pri,
           map(['status','priority'], [o_orderstatus, o_orderpriority])['status'][1]
             AS m_status,
           [o_orderstatus, o_orderpriority][1] AS arr_first,
           CAST(len([o_orderkey, o_custkey]) AS INT) AS arr_len
    FROM orders
    WHERE o_orderkey <= 200
    """,
    tags=("expr", "nested"),
)
def q_struct_map_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct / map / array construction and access (DataFusion
    struct/map/nested packages).  Nested values are built then
    re-projected to scalars so the comparison surface is plain
    columns on both engines."""
    orders = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") <= 200)
    s = F.named_struct(
        F.lit("k"), F.col("o_orderkey"), F.lit("p"), F.col("o_orderpriority")
    )
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    arr = F.array(F.col("o_orderstatus"), F.col("o_orderpriority"))
    return orders.select(
        "o_orderkey",
        s.getField("k").alias("s_key"),
        s.getField("p").alias("s_pri"),
        m.getItem("status").alias("m_status"),
        F.element_at(arr, 1).alias("arr_first"),
        F.size(F.array(F.col("o_orderkey"), F.col("o_custkey"))).alias("arr_len"),
    )


@register(
    "q_cast_conditional",
    oracle="""
    SELECT c_custkey,
           try_cast(c_name AS BIGINT) AS bad_cast,
           try_cast(substr(c_name, 10, 8) AS BIGINT) AS digit_cast,
           CAST(c_acctbal AS VARCHAR) IS NOT NULL AS cast_str_ok,
           c_acctbal IS DISTINCT FROM 0.0 AS nonzero,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'other' ELSE 'building' END AS nvl2_tag,
           ifnull(nullif(c_mktsegment, c_mktsegment), 'was_null') AS ifnull_tag
    FROM customer
    WHERE c_custkey <= 200
    """,
    tags=("expr", "cast"),
)
def q_cast_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST, IS DISTINCT FROM, nvl2/ifnull conditionals
    (PostgreSQL-dialect cast + conditional family)."""
    cust = tables(spark, sf_dir)["customer"].filter(F.col("c_custkey") <= 200)
    return cust.select(
        "c_custkey",
        F.col("c_name").try_cast("bigint").alias("bad_cast"),
        F.substring(F.col("c_name"), 10, 8).try_cast("bigint").alias("digit_cast"),
        F.col("c_acctbal").cast("string").isNotNull().alias("cast_str_ok"),
        F.expr("c_acctbal IS DISTINCT FROM 0.0").alias("nonzero"),
        F.nvl2(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            F.lit("other"),
            F.lit("building"),
        ).alias("nvl2_tag"),
        F.ifnull(
            F.nullif(F.col("c_mktsegment"), F.col("c_mktsegment")), F.lit("was_null")
        ).alias("ifnull_tag"),
    )


@register(
    "q_hash_sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '10'
    """,
    tags=("sample",),
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (~6.25% of rows): the reproducible
    alternative to TABLESAMPLE for pipeline subsetting — the same
    rows are selected on any engine, any cluster size, any run.
    Partition-local (no shuffle), scales linearly.
    """
    li = tables(spark, sf_dir)["lineitem"]
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.filter(F.substring(F.md5(key), 1, 2) < "10").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q_approx_distinct_check",
    oracle="""
    SELECT o_orderpriority,
           abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
             <= 0.05 * count(DISTINCT o_custkey) AS approx_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "approx"),
)
def q_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HyperLogLog — DataFusion approx_distinct):
    the estimates themselves differ across engines by design, so the
    oracle-comparable surface is the accuracy CONTRACT — each engine's
    estimate is within 5% of its own exact count (true on both).
    Spark's sketch is sized rsd=0.01 — the default 0.05 rsd means a
    single group can legitimately exceed the 5% gate."""
    orders = tables(spark, sf_dir)["orders"]
    approx = F.approx_count_distinct("o_custkey", 0.01)
    exact = F.countDistinct("o_custkey")
    return orders.groupBy("o_orderpriority").agg(
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct")
    )


@register(
    "q_percentile_median",
    oracle="""
    SELECT l_returnflag,
           CAST(median(l_quantity) AS DOUBLE) AS med_qty,
           CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS q25,
           CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q_percentile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / continuous percentiles (DataFusion median +
    approx_percentile_cont surface; exact interpolated form is
    engine-independent because l_quantity is integral-valued)."""
    li = tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").cast("double").alias("med_qty"),
        F.percentile(F.col("l_quantity"), F.lit(0.25)).cast("double").alias("q25"),
        F.percentile(F.col("l_quantity"), F.lit(0.75)).cast("double").alias("q75"),
    )


@register(
    "q_stats_aggregates",
    oracle="""
    SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS sd_r4,
           round(var_samp(o_totalprice), 2) AS var_r2,
           round(corr(o_totalprice, o_custkey), 8) AS corr_r8,
           round(covar_samp(o_totalprice, o_custkey), 2) AS covar_r2,
           CAST(regr_count(o_totalprice, o_custkey) AS BIGINT) AS regr_n
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "stats"),
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (stddev/var/corr/covar/regr_*).

    These are summation-order-dependent over doubles, so the
    comparable surface is rounded: the two engines' results agree to
    well past the rounding precision (relative error ~1e-12 from
    different partial-aggregation trees), the same tolerance contract
    a distributed run at any cluster size provides.
    """
    orders = tables(spark, sf_dir)["orders"]
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_r4"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_r2"),
        F.round(F.corr("o_totalprice", "o_custkey"), 8).alias("corr_r8"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("covar_r2"),
        F.regr_count(F.col("o_totalprice"), F.col("o_custkey"))
        .cast("bigint")
        .alias("regr_n"),
    )
