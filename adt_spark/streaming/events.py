"""Structured Streaming operators over the ``events`` table.

The reference has NO streaming surface (SURVEY.md §2.B Streaming —
execution is strictly batch, main.rs:20 collect()); this module is
the M7 extension (SURVEY.md §7 step 8): the same event analytics
expressed as an unbounded computation with watermarks, so the engine
covers the streaming half of a training-data pipeline (log ingest,
rolling quality metrics).

Scale posture: tumbling-window aggregation state is keyed by
(window, event_type) — bounded keys; the watermark bounds state
retention; ``session_window`` distributes per-user session state.
The parquet directory stands in for a real source (Kafka/queue) —
``readStream`` semantics are identical.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adt_spark.queries import register, tables


def streaming_events_schema() -> T.StructType:
    """events schema for readStream (streams can't infer)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # epoch-nanos (nanosAsLong)
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def windowed_counts_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Unbounded plan: 1-hour tumbling windows per event_type with a
    2-hour watermark for late data."""
    # FileStreamSource needs a directory/glob, not a bare file path.
    path = events_dir if os.path.isdir(events_dir) else os.path.join(
        os.path.dirname(events_dir), os.path.basename(events_dir).split(".")[0] + ".*"
    )
    stream = (
        spark.readStream.schema(streaming_events_schema())
        .format("parquet")
        .load(path)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(T.DecimalType(12, 2))).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register("streaming_events_windowed", oracle=None, tags=("streaming",))
def streaming_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the windowed-count stream over the events directory to
    completion (memory sink, processAllAvailable) and return the
    result — the driver's rows-only check exercises the full
    readStream → watermark → window-agg → sink path.

    (No SQL oracle: streaming triggers/watermarks are not
    SQL-expressible; the batch equivalent q_events_hourly_rollup IS
    oracle-checked, and test_streaming.py asserts stream/batch
    agreement, which is the stronger guarantee.)
    """
    tables(spark, sf_dir)  # registers views; also validates layout
    events_path = os.path.join(sf_dir, "events.parquet")
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts_stream(spark, events_path)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
