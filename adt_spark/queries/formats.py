"""Format-matrix queries — the CSV / JSON(NDJSON) read paths exercised
inside the oracle-checked corpus, not only in unit tests.

The reference's listing factory serves six formats through one code
path (SURVEY.md §2.A A1/A18, listing.rs:50-158 + context.rs:37-42);
these queries prove the non-parquet paths produce value-identical
results: each converts a driver table to the format under test
(deterministic temp location, overwritten per run), reads it back
through ``spark.read.<fmt>`` with an explicit schema — schema
*inference* differences are a documented non-goal (SURVEY §7
"moderate"); pinned schemas are the production posture anyway — and
aggregates.  The DuckDB oracle aggregates the original parquet, so a
hash match proves the format round-trip is lossless.

Scale note: the conversion step is itself a distributed write
(partition-per-task); the read-back is a normal distributed scan.
Temp data lands under /tmp keyed by scale factor — bounded by the
dimension tables used (nation/orders), not the corpus.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adt_spark.queries import register, tables


def _tmp(sf_dir: str, fmt: str) -> str:
    key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(tempfile.gettempdir(), f"adt_fmt_{key}_{fmt}")


@register(
    "q_csv_roundtrip_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
    tags=("format", "csv"),
)
def q_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV path: nation → CSV (header, default comma) → read back with
    a pinned schema → aggregate.  Hash-matching the parquet-side
    oracle proves the CSV writer/reader pair round-trips values
    exactly (incl. the int/string column mix)."""
    nation = tables(spark, sf_dir)["nation"]
    path = _tmp(sf_dir, "csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).option("header", "true").csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )


@register(
    "q_json_roundtrip_agg",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("format", "json", "ndjson"),
)
def q_json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON path: orders → line-delimited JSON → read back with a
    pinned schema → aggregate with the engine's exact decimal money
    rules.  JSON is the reference's ndjson format (cli.rs:6-12 —
    DataFusion's JSON is newline-delimited, exactly ``spark.read.json``
    semantics)."""
    orders = tables(spark, sf_dir)["orders"]
    path = _tmp(sf_dir, "json")
    orders.select("o_orderkey", "o_orderpriority", "o_totalprice").write.mode(
        "overwrite"
    ).json(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(T.DecimalType(12, 2)))
        .cast("double")
        .alias("total"),
    )


@register(
    "q_delta_roundtrip_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
    tags=("format", "delta"),
)
def q_delta_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta path UNDER THE DRIVER GATE: nation → native protocol
    writer (overwrite commit) → native log-replay reader → aggregate.
    A hash match against the parquet-side oracle proves the entire
    jar-free Delta round-trip — staging write, commit, snapshot
    replay, distributed read-back — is value-lossless, not just
    locally unit-tested.
    """
    from adt_spark.sources.delta_native import read_delta_native
    from adt_spark.sources.delta_native_write import write_delta_native

    nation = tables(spark, sf_dir)["nation"]
    path = _tmp(sf_dir, "delta")
    write_delta_native(nation, path, mode="overwrite")
    back = read_delta_native(spark, path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )


@register(
    "q_avro_roundtrip_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
    tags=("format", "avro"),
)
def q_avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro path UNDER THE DRIVER GATE: nation → native container
    writer (per-partition, executor-side) → native Arrow-batched
    distributed decode → aggregate.  Proves the jar-free Avro format
    (the one the reference registers but cannot execute) round-trips
    values exactly.
    """
    from adt_spark.sources.avro_native import read_avro_native, write_avro_native

    nation = tables(spark, sf_dir)["nation"]
    path = _tmp(sf_dir, "avro")
    write_avro_native(nation, path, mode="overwrite")
    back = read_avro_native(spark, path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )


@register(
    "q_orc_roundtrip_agg",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
    tags=("format", "orc"),
)
def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC path UNDER THE DRIVER GATE: nation → Spark-native ORC
    write → ORC read-back → aggregate, hash-matched against the
    parquet-side oracle.  ORC is beyond the reference's six formats
    (a Spark-native columnar format its DataFusion core lacks);
    registry + COPY sink expose it under the same listing-table and
    ``STORED AS`` surfaces as the others.
    """
    nation = tables(spark, sf_dir)["nation"]
    path = _tmp(sf_dir, "orc")
    nation.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
    )


@register(
    "q_delta_cdf_incremental_dedup",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, md5(lower(trim(text))) AS digest
      FROM documents WHERE doc_id % 10 <> 0
    ),
    arriving AS (
      SELECT doc_id, md5(lower(trim(text))) AS digest
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, digest
      FROM base WHERE doc_id % 100 = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_inserted,
           CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM base b
                                      WHERE b.digest = a.digest)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
           CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM base b
                                      WHERE b.digest = a.digest)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_unique
    FROM arriving a
    """,
    tags=("format", "delta", "cdf", "dedup", "incremental"),
)
def q_delta_cdf_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus maintenance end-to-end UNDER THE DRIVER
    GATE — the cross-layer composition a production pipeline actually
    runs: the existing corpus is a Delta table (native protocol
    writer), today's crawl lands as an APPEND commit, the dedup stage
    reads ONLY the change feed of that commit (native ``table_changes``
    — the no-_change_data derivation of the Delta spec) and
    anti-joins the arriving digests against the base corpus.  Output:
    one row (n_inserted, n_exact_dup, n_unique).  This is
    dedup_incremental's exact-digest half driven by CDF instead of a
    batch slice — proving the Delta layer and the pipeline operators
    compose: a hash match against the parquet-side oracle certifies
    the write → append → change-feed read → dedup chain end-to-end.

    Determinism: the commit versions returned by the writer scope the
    CDF read exactly (re-runs append new commits; the read is pinned
    to THIS call's append), and ``_commit_version`` is excluded from
    the output so the result is run-independent.  Digests are the
    module-standard md5(lower(trim(text))) on both engines.

    Scale shape: the CDF read scans ONLY the appended files (log scan
    is driver-side metadata); digesting is scan-local; the membership
    check is one digest-keyed LEFT SEMI-style join (AQE-sized — the
    base digest set is corpus-scale, never broadcast by force)
    feeding a single-row conditional aggregate.  At 100 TB this is
    the whole point of CDF: per-increment cost tracks the increment,
    not the corpus.
    """
    from adt_spark.sources.delta_native import table_changes
    from adt_spark.sources.delta_native_write import write_delta_native

    docs = tables(spark, sf_dir)["documents"]
    base = docs.filter(F.col("doc_id") % 10 != 0)
    # today's crawl = the arriving slice PLUS re-collected copies of
    # some existing pages under fresh ids (the fixture plants only
    # NEAR-dups, so without the re-collects the exact-dup branch
    # would be structurally zero and untested)
    recollected = base.filter(F.col("doc_id") % 100 == 1).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    arriving = docs.filter(F.col("doc_id") % 10 == 0).unionByName(
        recollected
    )
    path = _tmp(sf_dir, "delta_cdf")
    write_delta_native(base, path, mode="overwrite")
    v_append = write_delta_native(arriving, path, mode="append")
    changes = table_changes(
        spark, path, starting_version=v_append, ending_version=v_append
    )
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    new_rows = changes.filter(F.col("_change_type") == "insert").select(
        "doc_id", digest.alias("digest")
    )
    known = base.select(digest.alias("digest")).distinct()
    flagged = new_rows.join(
        known.withColumn("_hit", F.lit(1)), "digest", "left"
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_inserted"),
        F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact_dup"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unique"),
    )
