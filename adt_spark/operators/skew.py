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
