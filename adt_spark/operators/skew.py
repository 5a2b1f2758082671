"""Skew-handling operators — explicit two-phase (salted) aggregation.

AQE's skew-join splitting (on) handles skewed *joins* at runtime; for
aggregations over pathologically hot keys (a handful of event types /
languages across billions of rows), the classic explicit mitigation is
salting: shard each hot key across S sub-keys, aggregate the shards
(partial state stays small per shard), then merge the shards.  Spark's
partial+final HashAggregate already does map-side combining, so
salting only wins when per-key state is too big for one reducer
(huge count-distinct sets, large collect-type state) — this operator
demonstrates the pattern with an exact distinct-count, whose state is
precisely the kind that concentrates on one reducer without salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables

_N_SALT = 8


@register(
    "q_salted_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "agg"),
)
def q_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via salted two-phase
    aggregation: 5 event types would otherwise send ALL distinct-user
    state to 5 reducers; salting by ``user_id % 8`` shards each key's
    distinct-set 8-ways, then the merge phase sums shard counts
    (shards partition the user space, so shard-distincts add up —
    no double counting by construction).

    Shuffle structure: shuffle 1 on (event_type, salt) — 40 uniform
    groups instead of 5 hot ones; shuffle 2 on event_type moves only
    40 pre-aggregated rows.  The same derived-salt key works for any
    decomposable aggregate; for non-decomposable state, salt and
    merge with an exact second phase as here.
    """
    ev = tables(spark, sf_dir)["events"]
    salted = (
        ev.withColumn("salt", (F.col("user_id") % _N_SALT).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.countDistinct("user_id").alias("shard_users"),
            F.count("*").alias("shard_events"),
        )
    )
    return salted.groupBy("event_type").agg(
        F.sum("shard_users").cast("bigint").alias("n_users"),
        F.sum("shard_events").cast("bigint").alias("n_events"),
    )


@register(
    "q_skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("skew", "join", "salting"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-to-dimension join: events concentrate on a
    handful of hot user_ids (15 distinct users across the whole event
    log — the billions-of-rows-per-key shape that sends an entire hot
    key to one join task).  The explicit mitigation replicates the
    DIMENSION side S ways and salts the FACT side with a uniform
    derived key, so each hot user's rows spread across S join tasks:

      fact.salt  = xxhash64(event_id) % S        (uniform per row)
      dim x S    = explode(sequence(0, S-1))     (tiny side, S copies)
      join on (user_id = c_custkey AND salt = salt)

    The aggregate after the join is decomposable, so correctness is
    unchanged (oracle = the plain unsalted join).  The join is FORCED
    to a shuffled hash join (``hint("shuffle_hash")``): under a
    broadcast join the fact side never shuffles and salting would be a
    no-op — the pattern only means something when the join key
    partitions the data, which is exactly the 100 TB regime (dimension
    too large to broadcast, hot keys too large for one task; AQE's
    skew splitting covers moderate skew, this is the explicit form for
    single-key state larger than an executor).

    Money math per exactness rule 1: values sum as DECIMAL(12,2),
    cast to double only at the output boundary.
    """
    t = tables(spark, sf_dir)
    ev = t["events"].withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALT)).cast("int")
    )
    cust = (
        t["customer"]
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        ev.join(
            cust.hint("shuffle_hash"),
            (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
