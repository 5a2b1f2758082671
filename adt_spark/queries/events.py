"""Event-table corpus: time bucketing, JSON extraction, sessionization,
top-k per key — the semi-structured/temporal slice of the surface.

The reference's JSON functions were declared-but-unregistered
(SURVEY.md §2.A "latent surface", crates/core/Cargo.toml:23); Spark's
native ``get_json_object`` / ``from_json`` make this a superset.
``date_bin`` (SURVEY.md gap G7) is closed by the
``date_bin_seconds`` SQL UDF in adt_spark.dialect.functions.

Scale notes: every query here groups or windows on
(user_id | event_type | time bucket) — high-cardinality or bounded
keys that hash-partition evenly; sessionization uses a window over
user_id so state is distributed per user, the Structured-Streaming
analog being session_window (adt_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adt_spark.queries import register, tables

_VAL = "CAST(value AS DECIMAL(12,2))"


@register(
    "q_events_hourly_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           count(*) AS n_events,
           CAST(sum({_VAL}) AS DOUBLE) AS total_value,
           CAST(sum({_VAL}) AS DOUBLE) / count(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "datetime", "agg"),
)
def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rollup — the canonical time-bucketed aggregate.

    date_trunc is a pure projection (no UDF), so the whole plan is
    scan → partial agg → one shuffle on (hour, type) → final agg.
    """
    ev = tables(spark, sf_dir)["events"]
    total = F.sum(F.col("value").cast(T.DecimalType(12, 2)))
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            total.cast("double").alias("total_value"),
            (total.cast("double") / F.count("*")).alias("avg_value"),
        )
    )


@register(
    "q_events_date_bin",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts, TIMESTAMP '2024-01-01') AS TIMESTAMP)
             AS bucket,
           count(*) AS n
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("events", "datetime"),
)
def q_events_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute bins via the date_bin shim (DataFusion date_bin —
    SURVEY.md gap G7; DuckDB oracle uses time_bucket)."""
    ev = tables(spark, sf_dir)["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT date_bin_seconds(900, CAST(ts AS TIMESTAMP), TIMESTAMP '2024-01-01') AS bucket,
               count(*) AS n
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
        """
    )


@register(
    "q_events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END)
             AS n_high
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column (Spark-native
    get_json_object; the reference never registered its JSON package —
    SURVEY.md §2.A latent surface — so this is a superset)."""
    ev = tables(spark, sf_dir)["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


@register(
    "q_events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                         - epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    tags=("events", "window", "sessionize"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag() gap detection + per-user session
    count (30-minute inactivity gap).

    The window partitions on user_id — at 100 TB this distributes
    per-user state across executors; the streaming analog is
    session_window in adt_spark.streaming.  Tie order pinned with
    (ts, event_id).
    """
    ev = tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.unix_millis(F.lag("ts").over(w).cast("timestamp"))
    cur_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    is_new = F.when(prev_ms.isNull() | ((cur_ms - prev_ms) > 1800000), 1).otherwise(0)
    return (
        ev.select("user_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q_events_topk_users",
    oracle=f"""
    WITH totals AS (
        SELECT event_type, user_id, sum({_VAL}) AS total
        FROM events GROUP BY event_type, user_id
    ), ranked AS (
        SELECT event_type, user_id, total,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY total DESC, user_id) AS rn
        FROM totals
    )
    SELECT event_type, user_id, CAST(total AS DOUBLE) AS total_value,
           CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
    tags=("events", "window", "topk"),
)
def q_events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by spend per event type: aggregate → window top-k.

    Two-phase shape: partial+final agg on (type, user) first shrinks
    the input, then the rank window runs over the small aggregate —
    never a window over raw events.  Decimal totals make the ordering
    exact; user_id breaks ties.
    """
    ev = tables(spark, sf_dir)["events"]
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast(T.DecimalType(12, 2))).alias("total")
    )
    w = W.partitionBy("event_type").orderBy(F.col("total").desc(), F.col("user_id"))
    return (
        totals.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "event_type",
            "user_id",
            F.col("total").cast("double").alias("total_value"),
            "rn",
        )
    )


#: the funnel stage derivation as composable oracle CTEs — the ONE
#: copy shared by q_event_funnel and q_event_funnel_latency, so the
#: latency report can never desynchronize from the funnel counts.
_FUNNEL_CTES = """s1 AS (
      SELECT user_id, min(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t_signup
        AND e.ts <= s1.t_signup + INTERVAL 3 DAY
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
        AND e.ts <= s2.t_click + INTERVAL 3 DAY
      GROUP BY e.user_id
    )"""


def _funnel_stages(spark: SparkSession, sf_dir: str):
    """(s1, s2, s3) stage DataFrames — first signup, first click
    within 3 days strictly after it, first purchase within 3 days
    strictly after that (the Spark twin of _FUNNEL_CTES; every stage
    keyed by user_id so the aggregations and joins share one hash
    partitioning)."""
    ev = tables(spark, sf_dir)["events"]
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t_signup"))
            & (F.col("ts") <= F.col("t_signup") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return s1, s2, s3


@register(
    "q_event_funnel",
    oracle=f"""
    WITH {_FUNNEL_CTES}
    SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT 'click_within_3d', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 'purchase_within_3d', CAST(count(*) AS BIGINT) FROM s3
    """,
    tags=("events", "funnel", "sequence"),
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel: first signup → first click within
    3 days strictly after it → first purchase within 3 days strictly
    after that.  The ordered-sequence-over-event-log shape (product
    funnels, multi-stage pipeline monitors) the reference's pure-SQL
    surface can express only this way — no MATCH_RECOGNIZE in either
    engine.

    Scale shape: every stage is keyed by user_id — three aggregations
    and two joins all sharing one hash partitioning, so Catalyst
    reuses the exchange across stages; per-stage state is one
    timestamp per user.  Each stage's input shrinks monotonically
    (funnel property), so later stages are cheaper, not costlier.
    """
    s1, s2, s3 = _funnel_stages(spark, sf_dir)

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage("signup", s1)
        .unionByName(stage("click_within_3d", s2))
        .unionByName(stage("purchase_within_3d", s3))
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT f.cohort_day,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN a.d = f.cohort_day + 7
                                    THEN f.user_id END) AS BIGINT)
             AS retained_d7
    FROM first_seen f LEFT JOIN activity a USING (user_id)
    GROUP BY f.cohort_day
    """,
    tags=("events", "retention", "cohort"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-7 retention by first-seen cohort: for each cohort day, how
    many users were active exactly 7 days later — the standard
    activity-retention analytic over an event log.

    Scale shape: first-seen and daily-activity both aggregate on
    user_id (one shared partitioning); the cohort join is user-keyed,
    and the final rollup groups to cohort days — tiny output.  The
    distinct-day projection bounds the join input to
    users × active-days, not raw events.
    """
    ev = tables(spark, sf_dir)["events"]
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    return (
        first_seen.join(activity, "user_id", "left")
        .groupBy("cohort_day")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct(
                F.when(F.col("d") == F.date_add(F.col("cohort_day"), 7), F.col("user_id"))
            ).alias("retained_d7"),
        )
    )


def anomaly_thresholds(ev: DataFrame) -> DataFrame:
    """Per-event-type (mean, std) from exact decimal moments — shared
    by the oracle-checked batch detector and the streaming alerter so
    the pinned pair cannot drift."""
    vdec = F.col("value").cast(T.DecimalType(12, 2))
    stats = (
        ev.select("event_type", vdec.alias("vdec"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vdec").cast("double").alias("s1"),
            F.sum(F.col("vdec") * F.col("vdec")).cast("double").alias("s2"),
        )
    )
    mean = F.col("s1") / F.col("n")
    return stats.select(
        "event_type",
        mean.alias("mean"),
        F.sqrt(F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))).alias(
            "std"
        ),
    )


@register(
    "q_events_anomaly",
    oracle=f"""
    WITH d AS (
      SELECT event_id, event_type, CAST({_VAL} AS DOUBLE) AS v,
             {_VAL} AS vdec
      FROM events
    ), stats AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(vdec) AS DOUBLE) AS s1,
             CAST(sum(vdec * vdec) AS DOUBLE) AS s2
      FROM d GROUP BY event_type
    ), m AS (
      SELECT event_type, n,
             s1 / n AS mean,
             sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS std
      FROM stats
    )
    SELECT d.event_id, d.event_type, d.v AS value,
           (d.v - m.mean) / m.std AS zscore
    FROM d JOIN m USING (event_type)
    WHERE abs(d.v - m.mean) > 3.0 * m.std
    """,
    tags=("events", "anomaly", "stats"),
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outlier detection over event values — the
    monitoring primitive (fraud spikes, instrumentation bugs) built
    the scale-correct way: per-type moments from ONE partial+final
    aggregate (exact decimal sums — sum and sum-of-squares are
    decomposable, so map-side combine does almost all the work), the
    tiny per-type stats table broadcast back against the event
    stream, and the outlier filter evaluated scan-side.  Two passes
    over events, zero wide shuffles of the fact table.

    Exactness: moments are DECIMAL sums of 2-decimal money values
    (rule 1 — exact, order-independent); mean/variance/z-score are
    then a fixed chain of identical double ops, sqrt being IEEE
    correctly-rounded (rule 6 family allows sqrt, bans log/exp);
    variance clamps at 0 against catastrophic cancellation on both
    sides identically.
    """
    ev = tables(spark, sf_dir)["events"]
    vdec = F.col("value").cast(T.DecimalType(12, 2))
    d = ev.select("event_id", "event_type", vdec.cast("double").alias("v"))
    m = anomaly_thresholds(ev)
    return (
        d.join(F.broadcast(m), "event_type")
        .filter(F.abs(F.col("v") - F.col("mean")) > 3.0 * F.col("std"))
        .select(
            "event_id",
            "event_type",
            F.col("v").alias("value"),
            F.try_divide(F.col("v") - F.col("mean"), F.col("std")).alias("zscore"),
        )
    )


# M4 bucket width: 6 hours of event time.
_M4_W_US = 6 * 3600 * 1_000_000


@register(
    "q_events_m4_downsample",
    oracle=f"""
    WITH k AS (
      SELECT epoch_us(ts) // {_M4_W_US} AS bucket,
             printf('%020d', epoch_us(ts)) || printf('%012d', event_id) AS ord,
             value
      FROM events
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_points,
           min(value) AS v_min,
           max(value) AS v_max,
           arg_min(value, ord) AS v_first,
           arg_max(value, ord) AS v_last
    FROM k GROUP BY bucket
    """,
    tags=("events", "timeseries", "downsample"),
)
def q_events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    time bucket keep min, max, first, and last — the four values that
    make a line chart pixel-exact at any zoom, and the standard
    width-bounded rollup for dashboarding huge event streams.

    First/last use ``min_by``/``max_by`` over a zero-padded
    (event-time, event_id) string key — a total order both engines
    compare identically (the decorated-ordering idiom; numeric
    composite keys would overflow BIGINT at epoch-micros scale).

    Scale shape: ONE partial+final aggregate keyed by time bucket —
    min/max/min_by/max_by are all decomposable, so map-side combine
    reduces each partition to |buckets| rows before the only shuffle.
    Unlike LTTB (sequentially dependent on the previous selection), M4
    is embarrassingly parallel — which is why it is the scalable
    choice at 100 TB.
    """
    ev = tables(spark, sf_dir)["events"]
    ordkey = F.format_string(
        "%020d%012d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    return (
        ev.select(
            (F.floor(F.unix_micros(F.col("ts")) / _M4_W_US)).cast("bigint").alias("bucket"),
            ordkey.alias("ord"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.expr("min_by(value, ord)").alias("v_first"),
            F.expr("max_by(value, ord)").alias("v_last"),
        )
    )


_HIST_W = 50.0   # bin width
_HIST_N = 10     # bins; values >= N*W clamp into the last bin


@register(
    "q_events_value_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(least(floor(value / {_HIST_W}), {_HIST_N - 1}) AS BIGINT) AS bin,
           CAST(least(floor(value / {_HIST_W}), {_HIST_N - 1}) * {_HIST_W}
                AS DOUBLE) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, bin, bin_lo
    """,
    tags=("events", "histogram"),
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram per event type — the value-dimension
    dashboard primitive (M4 covers the time dimension): bin =
    ``least(floor(value / width), n-1)`` with the overflow mass
    clamped into the last bin.

    Exactness: the bin index is floor of a single double division
    (deterministic both engines); per-bin mass sums in DECIMAL
    (rule 1).  Scale shape: ONE partial+final aggregate on
    (event_type, bin) — bounded keys, map-side combine does nearly
    all the work; at 100 TB this is a single scan-speed pass, unlike
    exact-percentile formulations that need a global sort.
    """
    ev = tables(spark, sf_dir)["events"]
    bin_idx = F.least(
        F.floor(F.col("value") / _HIST_W), F.lit(_HIST_N - 1)
    ).cast("bigint")
    return (
        ev.select(
            "event_type",
            bin_idx.alias("bin"),
            (bin_idx * _HIST_W).cast("double").alias("bin_lo"),
            F.col("value").cast(T.DecimalType(12, 2)).alias("vdec"),
        )
        .groupBy("event_type", "bin", "bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vdec").cast("double").alias("total_value"),
        )
    )


@register(
    "q_events_rolling_actives",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
    contrib AS (
        SELECT user_id, d + CAST(u.i AS INT) AS day
        FROM ud, unnest(generate_series(0, 6)) AS u(i)
    )
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS actives_7d
    FROM contrib, bounds
    WHERE day >= lo AND day <= hi
    GROUP BY day
    """,
    tags=("events", "rolling", "dau"),
)
def q_events_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (the WAU-by-day product
    metric).  A naive formulation is COUNT(DISTINCT) OVER a RANGE
    frame — which Spark cannot express (no DISTINCT in windows) and
    which a range self-join makes O(days x users).  This uses the
    CONTRIBUTION-EXPLODE idiom instead: each (user, active-day) row
    contributes to exactly the 7 window-end days it is visible in, so
    the whole metric is one explode(sequence(0, 6)) projection plus
    ONE distinct aggregation keyed on (day, user) - no window
    functions, no self-join, no range join.

    Cross-engine exactness: dates are UTC calendar truncations of the
    same timestamps (the session-conf contract all temporal queries
    share); counts are pinned BIGINT; the day-bounds filter uses the
    1-row global (min, max) - genuinely broadcastable at any scale.

    Scale shape: the (user, day) dedup is one uniform two-phase
    shuffle; the 7x fan-out is a bounded array explode (constant
    factor, no join); countDistinct re-shuffles on (day, user) with
    map-side partials.  Day cardinality is calendar-bounded, so the
    final per-day rows are tiny everywhere.
    """
    ev = tables(spark, sf_dir)["events"]
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    bounds = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    contrib = ud.select(
        "user_id", "d", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i")
    ).select("user_id", F.date_add("d", F.col("i")).alias("day"))
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter((F.col("day") >= F.col("lo")) & (F.col("day") <= F.col("hi")))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("actives_7d"))
    )


@register(
    "q_events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    )
    SELECT event_type AS from_type, nxt AS to_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type) AS p
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("events", "markov", "behavior"),
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (from_type, to_type) pair, the transition count
    and the conditional probability P(to | from) — the standard
    behavioral model behind next-action prediction and funnel-leak
    diagnosis, complementing q_event_funnel (fixed path) and
    q_events_sessionize (boundaries).

    Cross-engine exactness: the sequence order (ts, event_id) is a
    total order; counts are exact BIGINTs and P(to | from) is ONE
    double division of exact integers (the row-count window sum is
    integer arithmetic, rule 2 applies — no float accumulation).

    Scale shape: the lead() window is PARTITIONED by user_id —
    parallel, state bounded per user; the pair count is a two-phase
    aggregate on (from, to) — event-type-squared cardinality, tiny;
    the denominator is a window over that aggregate's handful of
    rows, not over events.
    """
    seq = tables(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    counts = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("nxt").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wf)).alias("p"),
    )


@register(
    "q_events_value_concentration",
    oracle=f"""
    WITH totals AS (
        SELECT user_id, sum({_VAL}) AS t
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    topk AS (
        SELECT t FROM totals ORDER BY t DESC, user_id LIMIT 10
    ),
    g AS (SELECT sum(t) AS grand FROM totals)
    SELECT CAST(10 AS INT) AS top_k,
           CAST((SELECT sum(t) FROM topk) AS DOUBLE) AS top_value,
           CAST(grand AS DOUBLE) AS total_value,
           CASE WHEN grand = 0 THEN NULL
                ELSE CAST((SELECT sum(t) FROM topk) AS DOUBLE)
                     / CAST(grand AS DOUBLE) END AS top_share
    FROM g
    """,
    tags=("events", "pareto", "concentration"),
)
def q_events_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value concentration: the share of total purchase value captured
    by the top-10 spenders — the Pareto "whales" metric product teams
    track (and the scale-sound formulation of it: a full cumulative
    Pareto curve needs a GLOBAL running window — single-task in Spark —
    whereas top-k share needs only TakeOrderedAndProject's per-partition
    heaps plus a 1-row grand total).

    Cross-engine exactness: per-user totals and both sums are exact
    DECIMAL; the top-10 cut is totally ordered by (total DESC,
    user_id); doubles appear only at the output boundary, and the
    share is one division of exact-decimal-derived doubles.

    Scale shape: one two-phase aggregate on user_id (high-cardinality,
    uniform), a top-10 via per-partition heaps (no sort, no window),
    and a 1-row broadcast cross join for the grand total.
    """
    ev = tables(spark, sf_dir)["events"].filter(F.col("event_type") == "purchase")
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast(T.DecimalType(12, 2))).alias("t")
    )
    topk = (
        totals.orderBy(F.col("t").desc(), "user_id")
        .limit(10)
        .agg(F.sum("t").alias("top_dec"))
    )
    grand = totals.agg(F.sum("t").alias("grand_dec"))
    return (
        topk.crossJoin(F.broadcast(grand))
        .select(
            F.lit(10).cast("int").alias("top_k"),
            F.col("top_dec").cast("double").alias("top_value"),
            F.col("grand_dec").cast("double").alias("total_value"),
            # NULL (not ANSI-error/NaN) when the grand total is zero —
            # same both-engine guard as chars_per_piece
            F.when(
                F.col("grand_dec") != 0,
                F.col("top_dec").cast("double")
                / F.col("grand_dec").cast("double"),
            ).alias("top_share"),
        )
    )


@register(
    "q_event_funnel_latency",
    oracle=f"""
    WITH {_FUNNEL_CTES}, lat AS (
      SELECT 'signup_to_click' AS stage,
             epoch_us(s2.t_click) - epoch_us(s1.t_signup) AS lat_us
      FROM s1 JOIN s2 USING (user_id)
      UNION ALL
      SELECT 'click_to_purchase',
             epoch_us(s3.t_purchase) - epoch_us(s2.t_click)
      FROM s2 JOIN s3 USING (user_id)
    ), r AS (
      SELECT stage, lat_us,
             row_number() OVER (PARTITION BY stage ORDER BY lat_us) AS rn,
             count(*) OVER (PARTITION BY stage) AS n
      FROM lat
    )
    SELECT stage,
           CAST(max(n) AS BIGINT) AS n_pairs,
           CAST(max(CASE WHEN rn = CAST(floor((n - 1) * 5 / 10.0) AS BIGINT) + 1
                         THEN lat_us END) AS DOUBLE) / 1000000.0 AS p50_seconds,
           CAST(max(CASE WHEN rn = CAST(floor((n - 1) * 9 / 10.0) AS BIGINT) + 1
                         THEN lat_us END) AS DOUBLE) / 1000000.0 AS p90_seconds,
           CAST(sum(lat_us) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * 1000000.0) AS mean_seconds
    FROM r GROUP BY stage
    """,
    tags=("events", "funnel", "latency", "percentile"),
)
def q_event_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution per funnel stage — exact p50 /
    p90 / mean seconds between first signup → first click and first
    click → first purchase, under q_event_funnel's exact stage
    definitions (the time-to-convert report that accompanies every
    funnel count).

    Cross-engine exactness (the quality_length_outliers discipline):
    latencies are exact epoch-microsecond BIGINT differences;
    percentiles are ELEMENT PICKS at integer ranks
    ``floor((n−1)·q) + 1`` over a (lat_us)-ordered row_number — ties
    share the value, so the picked value is order-independent — never
    an engine-specific interpolating percentile function; the mean is
    one exact BIGINT sum with a single boundary division.

    Scale shape: the stage tables are q_event_funnel's user-keyed
    aggregates (shared _funnel_stages builder); the latency union is
    two user-keyed equi-joins; the percentile window partitions by STAGE
    (2 partitions), so the per-stage sort is the exact-percentile
    cost — converted-user-sized, far below event count; at the
    extreme, swap in approx_percentile (the sketch path) with the
    same frame, as text_vocab_topk notes for approx_top_k.
    """
    s1, s2, s3 = _funnel_stages(spark, sf_dir)
    lat1 = s1.join(s2, "user_id").select(
        F.lit("signup_to_click").alias("stage"),
        (F.unix_micros("t_click") - F.unix_micros("t_signup")).alias("lat_us"),
    )
    lat2 = s2.join(s3, "user_id").select(
        F.lit("click_to_purchase").alias("stage"),
        (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias("lat_us"),
    )
    lat = lat1.unionByName(lat2)
    w = W.partitionBy("stage")
    r = lat.withColumn(
        "rn", F.row_number().over(w.orderBy("lat_us"))
    ).withColumn("n", F.count(F.lit(1)).over(w))
    rank_of = lambda q10: (  # noqa: E731
        F.floor((F.col("n") - 1) * q10 / 10.0).cast("bigint") + 1
    )
    return r.groupBy("stage").agg(
        F.max("n").alias("n_pairs"),
        (
            F.max(F.when(F.col("rn") == rank_of(5), F.col("lat_us"))).cast("double")
            / 1000000.0
        ).alias("p50_seconds"),
        (
            F.max(F.when(F.col("rn") == rank_of(9), F.col("lat_us"))).cast("double")
            / 1000000.0
        ).alias("p90_seconds"),
        (
            F.sum("lat_us").cast("double")
            / (F.max("n").cast("double") * 1000000.0)
        ).alias("mean_seconds"),
    )
