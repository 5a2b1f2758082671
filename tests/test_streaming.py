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


def test_sliding_stream_matches_batch(spark, sf_dir):
    stream_df = load_all()["streaming_events_sliding"].spark_fn(spark, sf_dir)
    got = {(r.window_start, r.event_type): r.n_events for r in stream_df.collect()}

    ev = tables(spark, sf_dir)["events"]
    batch = (
        ev.groupBy(F.window("ts", "2 hours", "30 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    want = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert got == want


def test_session_window_stream_matches_batch(spark, sf_dir):
    stream_df = load_all()["streaming_events_session_window"].spark_fn(spark, sf_dir)
    got = {
        (r.session_start, r.session_end, r.user_id): r.n_events
        for r in stream_df.collect()
    }
    ev = tables(spark, sf_dir)["events"]
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    want = {
        (r.session_start, r.session_end, r.user_id): r.n_events
        for r in batch.collect()
    }
    assert got == want


def test_stateful_totals_match_batch(spark, sf_dir):
    stream_df = load_all()["streaming_user_totals_stateful"].spark_fn(spark, sf_dir)
    # Update mode emits one row per user per micro-batch; the final
    # state is the row with the max count per user.
    import collections

    got = {}
    for r in stream_df.collect():
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6))

    ev = tables(spark, sf_dir)["events"]
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, _) in want.items():
        assert got[uid][0] == n


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    """Streaming dropDuplicatesWithinWatermark emits exactly the
    batch-distinct key set (one row per key, no loss)."""
    got = sorted(
        map(tuple, load_all()["streaming_dedup_events"].spark_fn(spark, sf_dir).collect())
    )
    ev = tables(spark, sf_dir)["events"]
    want = sorted(
        map(
            tuple,
            ev.select(
                "user_id",
                "event_type",
                F.date_trunc("minute", F.col("ts")).cast("timestamp").alias("minute"),
            )
            .distinct()
            .collect(),
        )
    )
    assert got == want


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join emits exactly the batch range-join
    pairs (watermarks only bound state, never drop in-order file data)."""
    got = sorted(
        map(tuple, load_all()["streaming_interval_join"].spark_fn(spark, sf_dir).collect())
    )
    ev = tables(spark, sf_dir)["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = sorted(
        map(
            tuple,
            p.join(
                c,
                (F.col("p_user") == F.col("c_user"))
                & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
                & (F.col("c_ts") <= F.col("p_ts")),
            )
            .select(
                "purchase_id",
                "click_id",
                F.col("p_user").alias("user_id"),
                (
                    F.unix_micros(F.col("p_ts").cast("timestamp"))
                    - F.unix_micros(F.col("c_ts").cast("timestamp"))
                ).alias("delta_us"),
            )
            .collect(),
        )
    )
    assert got == want


def test_enriched_purchases_match_batch(spark, sf_dir):
    """Stream-static join agrees with the identical batch join."""
    from adt_spark.queries import load_all, tables
    import pyspark.sql.functions as F

    got = load_all()["streaming_enriched_purchases"].spark_fn(spark, sf_dir)
    ev = tables(spark, sf_dir)["events"]
    cust = tables(spark, sf_dir)["customer"]
    want = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            F.col("value").cast("decimal(12,2)").cast("double").alias("value"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_delta_ingest_roundtrip(spark, sf_dir):
    """The foreachBatch → native-Delta-writer sink lands exactly the
    batch rollup, read back through the native Delta reader."""
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in load_all()["streaming_delta_ingest"].spark_fn(spark, sf_dir).collect()
    }
    ev = tables(spark, sf_dir)["events"]
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(T.DecimalType(12, 2))).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_streaming_docs_dedup_matches_batch_admit_set(spark, sf_dir):
    """streaming_docs_dedup_ingest == the batch admit set: distinct
    new-batch content hashes not present in the corpus (the streaming
    counterpart of dedup_incremental's is_exact_dup = false, plus
    within-stream dedup)."""
    import os

    from pyspark.sql import functions as F

    got = load_all()["streaming_docs_dedup_ingest"].spark_fn(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    chash = F.md5(F.lower(F.trim(F.col("text"))))
    corpus = docs.filter(F.col("doc_id") % 10 != 0).select(chash.alias("chash")).distinct()
    batch_admit = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(chash.alias("chash"))
        .distinct()
        .join(F.broadcast(corpus), "chash", "left_anti")
    )
    assert {r.chash for r in got.collect()} == {r.chash for r in batch_admit.collect()}
    assert got.count() == got.select("chash").distinct().count()  # in-stream dedup held


def test_streaming_neardup_matches_batch_band_join(spark, sf_dir):
    """streaming_docs_neardup_ingest == the batch band join over the
    same slice split: the shared band_keys_projection guarantees key
    derivation parity, so the flagged (new_doc, corpus_doc) pair set
    must match exactly (and contain no duplicates — the pair-keyed
    dropDuplicates state held)."""
    import os

    from pyspark.sql import functions as F

    from adt_spark.operators.dedup import band_keys_projection

    got = load_all()["streaming_docs_neardup_ingest"].spark_fn(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    new_bands = band_keys_projection(docs.filter(F.col("doc_id") % 10 == 0))
    corpus_bands = band_keys_projection(
        docs.filter(F.col("doc_id") % 10 != 0)
    ).withColumnRenamed("doc_id", "corpus_doc_id")
    batch_pairs = (
        new_bands.join(corpus_bands, "band_key")
        .select("doc_id", "corpus_doc_id")
        .distinct()
    )
    got_rows = got.collect()
    got_set = {(r.doc_id, r.corpus_doc_id) for r in got_rows}
    want = {(r.doc_id, r.corpus_doc_id) for r in batch_pairs.collect()}
    assert got_set == want and len(want) > 0
    assert len(got_rows) == len(got_set)  # pair-keyed dedup state held


def test_anomaly_alerts_stream_matches_batch(spark, sf_dir):
    """streaming_anomaly_alerts drains to exactly the oracle-checked
    q_events_anomaly batch output (thresholds trained on the same
    history; zero streaming state)."""
    from adt_spark.queries import load_all

    reg = load_all()
    streamed = reg["streaming_anomaly_alerts"].spark_fn(spark, sf_dir)
    batch = reg["q_events_anomaly"].spark_fn(spark, sf_dir)
    got = {(r.event_id, r.event_type, r.value, r.zscore) for r in streamed.collect()}
    want = {(r.event_id, r.event_type, r.value, r.zscore) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_unbounded_external_table_streams(spark, tmp_path):
    """CREATE UNBOUNDED EXTERNAL TABLE (DataFusion's unbounded listing
    grammar flag) registers a Structured Streaming file source: new
    files under LOCATION become new rows of the stream."""
    from adt_spark.context import ADTContext

    ctx = ADTContext.__new__(ADTContext)
    ctx.spark = spark
    src = str(tmp_path / "ub_src")
    spark.range(5).write.mode("overwrite").parquet(src)
    ctx.sql(f"CREATE UNBOUNDED EXTERNAL TABLE ub_tbl STORED AS parquet LOCATION '{src}'")
    sdf = spark.sql("SELECT count(*) AS n FROM ub_tbl")
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("ub_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT n FROM ub_counts").collect()[0].n == 5
    # a new file landing in LOCATION is picked up by the next run
    spark.range(5, 8).write.mode("append").parquet(src)
    q2 = (
        spark.sql("SELECT count(*) AS n FROM ub_tbl")
        .writeStream.format("memory")
        .queryName("ub_counts2")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql("SELECT n FROM ub_counts2").collect()[0].n == 8


def test_unbounded_declared_schema_and_format_guard(spark, tmp_path):
    from adt_spark.context import ADTContext
    from adt_spark.sources.registry import UnsupportedFormatError

    ctx = ADTContext.__new__(ADTContext)
    ctx.spark = spark
    src = str(tmp_path / "ub_csv")
    import os

    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "a.csv"), "w") as f:
        f.write("7,alpha\n8,beta\n")
    ctx.sql(
        "CREATE UNBOUNDED EXTERNAL TABLE ub_csv (k INT, v TEXT) "
        f"STORED AS csv LOCATION '{src}'"
    )
    sdf = spark.sql("SELECT k, v FROM ub_csv")
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == ["k", "v"]
    with __import__("pytest").raises(UnsupportedFormatError, match="streaming"):
        ctx.sql(
            f"CREATE UNBOUNDED EXTERNAL TABLE ub_bad STORED AS arrow LOCATION '{src}'"
        )


def test_streaming_m4_matches_batch(spark, sf_dir):
    """streaming_m4_downsample drains to exactly the oracle-checked
    batch M4 rollup (same buckets, same four stats per bucket)."""
    from adt_spark.queries import load_all

    reg = load_all()
    streamed = reg["streaming_m4_downsample"].spark_fn(spark, sf_dir)
    batch = reg["q_events_m4_downsample"].spark_fn(spark, sf_dir)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_streaming_quality_ingest_matches_batch(spark, sf_dir):
    """streaming_docs_quality_ingest == the batch scoring of the same
    arriving slice under ratios trained on the same corpus slice (the
    shared quality_scored_ingest builder guarantees derivation
    parity); fixed-point accumulation makes scores and admit flags
    exactly equal, not approximately."""
    import os

    from pyspark.sql import functions as F

    from adt_spark.streaming.events import quality_scored_ingest

    got = load_all()["streaming_docs_quality_ingest"].spark_fn(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    want_df = quality_scored_ingest(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )
    got_set = {
        (r.doc_id, r.n_known_tokens, r.score, r.admit) for r in got.collect()
    }
    want = {
        (r.doc_id, r.n_known_tokens, r.score, r.admit)
        for r in want_df.collect()
    }
    assert got_set == want and len(want) > 0
    # both halves of the admit rule must occur on the fixture, or the
    # gate degenerates to a constant
    admits = {a for (_d, _n, _s, a) in want}
    assert admits == {True, False}
    # EVERY arriving document gets a verdict — the gate may not drop
    # docs whose vocabulary the model has never seen
    arriving = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    }
    assert {d for (d, _n, _s, _a) in got_set} == arriving


def test_streaming_threshold_ingest_matches_batch(spark, sf_dir):
    """streaming_docs_threshold_ingest == the batch threshold-gated
    derivation over the same slice split (shared
    threshold_gated_ingest builder); fixed-point scoring plus the
    shared select_thresholds cut make every column exactly equal."""
    import os

    from pyspark.sql import functions as F

    from adt_spark.streaming.events import threshold_gated_ingest

    got = load_all()["streaming_docs_threshold_ingest"].spark_fn(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    want_df = threshold_gated_ingest(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
    )
    cols = ("doc_id", "source", "threshold", "n_known_tokens", "score", "admit")
    got_set = {tuple(r[c] for c in cols) for r in got.collect()}
    want = {tuple(r[c] for c in cols) for r in want_df.collect()}
    assert got_set == want and len(want) > 0
    # every arriving doc gets a verdict
    n_arriving = docs.filter(F.col("doc_id") % 7 == 0).count()
    assert len(want) == n_arriving
    # the per-source gate must differ from the global 1.0 gate for at
    # least one source on the fixture (else the op degenerates to
    # streaming_docs_quality_ingest) and both admit outcomes occur
    thresholds = {t for (_d, _s, t, _n, _sc, _a) in want if t is not None}
    assert any(abs(t - 1.0) > 1e-12 for t in thresholds), thresholds
    assert {a for (*_x, a) in want} == {True, False}


def test_streaming_priority_sample_matches_batch(spark, sf_dir):
    """The streaming weighted sample's FINAL per-source state equals
    q_priority_sample's batch answer.  Update mode emits every
    intermediate heap; emissions are nested prefix-min sets, so the
    k smallest (prio_key, doc_id) per source across ALL emitted rows
    ARE the final state — compare that reconstruction exactly."""
    from adt_spark.operators.sampling import _PRIO_K

    stream_df = load_all()["streaming_priority_sample"].spark_fn(spark, sf_dir)
    emitted = {}
    for r in stream_df.collect():
        emitted.setdefault(r.source, set()).add(
            (r.prio_key, r.doc_id, r.n_chars)
        )
    got = {
        src: sorted(rows)[:_PRIO_K] for src, rows in emitted.items()
    }
    batch = load_all()["q_priority_sample"].spark_fn(spark, sf_dir)
    want = {}
    for r in batch.collect():
        want.setdefault(r.source, []).append((r.prio_key, r.doc_id, r.n_chars))
    want = {src: sorted(rows) for src, rows in want.items()}
    assert got == want
