"""Streaming ⇔ batch agreement: the windowed stream over events must
produce exactly the batch groupBy's result (stronger than a rows-only
smoke — it pins the streaming semantics to the oracle-checked batch
query family)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from adt_spark.queries import load_all, tables


def test_stream_matches_batch(spark, sf_dir):
    stream_df = load_all()["streaming_events_windowed"].spark_fn(spark, sf_dir)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in stream_df.collect()
    }

    ev = tables(spark, sf_dir)["events"]
    batch = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(T.DecimalType(12, 2))).cast("double").alias("total_value"),
        )
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want
