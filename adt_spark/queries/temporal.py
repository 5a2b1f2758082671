"""Temporal join operators the reference lacks entirely — as-of join
and bounded range join over the ``events`` table.

The reference's DataFusion 48 surface has **no AS-OF / interval /
range-join operator** (SURVEY.md §2.B joins table: "no AS-OF /
interval / range-join operator in DF 48"); a non-equi theta join there
falls back to NestedLoopJoinExec, i.e. an O(n·m) cartesian-with-filter.
These two operators are the scale-correct Spark formulations:

- **As-of join** (``q_asof_join_latest_click``): the union + running
  ``last_value(ignorenulls)`` window pattern.  ONE shuffle on the join
  key, no range fan-out, no nested loop — each probe row picks up the
  most recent build row in a single sorted pass per key partition.
  This is how as-of joins survive 100 TB: cost is a sort within each
  key partition, identical to any windowed aggregation.
- **Range join** (``q_range_join_purchase_error``): time-bucketed
  candidate generation.  Build rows explode to the 3 buckets they can
  match (width = the range bound), probe rows keep their 1 bucket, and
  the join is a plain equi-join on (key, bucket) + exact filter.
  Fan-out is a constant 3×, each pair arises exactly once (no dedup
  pass), and the shuffle is on (user_id, bucket) — fine-grained and
  uniform, so no single key partition grows with total data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from adt_spark.queries import register, tables

# Range-join bound: 1 hour, in microseconds (events ts is µs precision).
_RANGE_US = 3_600_000_000


@register(
    "q_asof_join_latest_click",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value,
           c.ts AS click_ts,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT ck.ts, ck.value
      FROM events ck
      WHERE ck.event_type = 'click'
        AND ck.user_id = p.user_id AND ck.ts <= p.ts
      ORDER BY ck.ts DESC, ck.event_id DESC
      LIMIT 1
    ) c ON TRUE
    """,
    tags=("join", "asof", "temporal"),
)
def q_asof_join_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase ← the same user's most recent click
    at-or-before it (left semantics: purchases with no prior click
    keep NULLs).

    Implementation: tag click/purchase rows, union, and run
    ``last_value(ignorenulls=True)`` over a per-user window ordered by
    (ts, side, event_id) — clicks sort before purchases at equal ts
    (matching the ``<=`` bound) and equal-ts clicks resolve to the
    highest event_id, a total order both engines share.  One hash shuffle on user_id, one sort
    per partition; no non-equi join, no fan-out.  (The oracle is an
    explicit LATERAL top-1 with the same tiebreak — DuckDB's native
    ASOF JOIN picks arbitrarily among equal-ts clicks.)
    """
    ev = tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("ord_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("purchase_value"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("ord_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_value"),
    )
    # total order: (ts, side, event_id) — among equal-ts clicks the
    # HIGHEST event_id wins (last in window order), the defined rule
    # the lateral oracle mirrors; without the id tiebreak the pick
    # would be shuffle-order nondeterministic (corpus rule 3)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "ord_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("click_value", F.last("c_value", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "purchase_value",
            "click_ts",
            "click_value",
        )
    )


@register(
    "q_range_join_purchase_error",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           e.event_id AS error_id,
           p.user_id AS user_id,
           date_diff('microsecond', e.ts, p.ts) AS delta_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND abs(date_diff('microsecond', e.ts, p.ts)) <= {_RANGE_US}
    """,
    tags=("join", "range", "temporal"),
)
def q_range_join_purchase_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchase × error pairs of the same user within ±1h.

    Implementation: bucket ts by the range width (1h).  A pair within
    ±1h differs by at most one bucket, so exploding each error to
    buckets {b−1, b, b+1} and equi-joining on the purchase's single
    bucket finds every pair exactly once (the 3 exploded keys are
    distinct → no dedup pass).  Shuffle key (user_id, bucket) is
    fine-grained: partition size tracks events-per-user-per-hour, not
    corpus size, so the plan holds at 100 TB where a plain non-equi
    join would be a per-user cartesian.
    """
    ev = tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        (F.unix_micros("ts") / F.lit(_RANGE_US)).cast("long").alias("bucket"),
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.unix_micros("ts").alias("e_us"),
            (F.unix_micros("ts") / F.lit(_RANGE_US)).cast("long").alias("b"),
        )
        .select(
            "error_id",
            "user_id",
            "e_us",
            F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)).alias(
                "bucket"
            ),
        )
    )
    return (
        purchases.join(errors, ["user_id", "bucket"])
        .withColumn("delta_us", F.col("p_us") - F.col("e_us"))
        .filter(F.abs(F.col("delta_us")) <= _RANGE_US)
        .select("purchase_id", "error_id", "user_id", "delta_us")
    )
