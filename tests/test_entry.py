"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_queries_and_oracles_aligned(spark):
    mod = _entry_mod()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every oracle-less query is an intentional rows-only check
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "streaming_events_windowed",
        "streaming_events_sliding",
        "streaming_events_session_window",
        "streaming_user_totals_stateful",
        "streaming_enriched_purchases",
        "streaming_dedup_events",
        "streaming_interval_join",
        "streaming_delta_ingest",
        "streaming_docs_dedup_ingest",
        "streaming_docs_neardup_ingest",
        "streaming_docs_quality_ingest",
        "streaming_docs_threshold_ingest",
        "streaming_m4_downsample",
        "streaming_anomaly_alerts",
        "streaming_priority_sample",
        # iterative (per-round data-dependent argmax) — not
        # SQL-expressible; pinned exactly to an independent Python
        # reference in tests/test_bpe_train.py
        "text_bpe_train_merges",
        "text_bpe_encode",
    }, rows_only
