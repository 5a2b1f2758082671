"""Spark-vs-DuckDB oracle comparison harness — DRIVER-STRICT.

Mirrors the driver's correctness gate (row-count + schema +
order-insensitive value hashing) so every query is validated locally
before the driver ever sees it.  The driver canonicalizes with pandas
(columns sorted by name, rows sorted) and hashes values with a
dtype-sensitive hasher (``pd.util.hash_pandas_object`` semantics):

- int64 vs float64 hash DIFFERENTLY even when values are equal
  (round-1 failure q_window_groups_frame), so this harness fails on
  any cross-kind column pair instead of widening.
- float32 vs float64 hash differently, so float width must match
  exactly (no widening).
- list/array cells are UNHASHABLE and crash the driver outright
  (round-1 failure q_ordered_array_agg), so any non-scalar cell is a
  hard local failure.
- integer widths (int32 vs int64) hash identically, so ints are
  safely widened to int64.
- datetime64 is normalized to [us] (what both Spark toPandas and
  DuckDB fetchdf emit); object-dtype date/datetime cells are
  converted the same way on both sides.

Comparison is EXACT — the corpus is engineered (decimal money math,
pinned output types, total ordering for top-k) so both engines emit
identical values; a float tolerance would only hide engineering
mistakes.  A final whole-frame ``hash_pandas_object`` check mirrors
the driver literally as a belt-and-braces guard.
"""

from __future__ import annotations

import datetime as _dt
import os

import duckdb
import numpy as np
import pandas as pd

from adt_spark.context import SF_TABLES

#: Cell types the driver's hasher cannot handle — emitting any of
#: these from a query is a bug (stringify with array_join/concat_ws,
#: or to_json, before the output boundary).
_NON_SCALAR = (list, tuple, set, dict, np.ndarray)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with each driver table registered as a view
    (the driver pre-registers the same views for oracle SQL)."""
    con = duckdb.connect()
    for table in SF_TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(pdf: pd.DataFrame, name: str = "", side: str = "") -> pd.DataFrame:
    """Canonical form: columns sorted by name, driver-safe dtypes
    (ints widened to int64, datetimes to [us], object dates to
    datetime64[us]), rows sorted by all columns.

    Raises AssertionError on any cell the driver's hasher would choke
    on (lists/arrays/dicts) — round 1 proved the driver dies with
    ``TypeError: unhashable type: 'list'`` on these.
    """
    pdf = pdf[sorted(pdf.columns)].copy()
    for col in pdf.columns:
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[col] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            # int widths hash identically under the driver's hasher
            pdf[col] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            # float widths hash DIFFERENTLY — leave untouched so a
            # float32/float64 mismatch is caught, not masked.
            pass
        elif pd.api.types.is_object_dtype(s):
            non_null = s.dropna()
            # scan EVERY cell: a list at row 25 past a 20-row sample
            # would skip this actionable guard and die later as an
            # opaque hasher TypeError (test-scale frames — cheap)
            bad = [v for v in non_null if isinstance(v, _NON_SCALAR)]
            head = list(non_null.head(20))
            if bad:
                raise AssertionError(
                    f"{name} [{side}].{col}: non-scalar cell {type(bad[0]).__name__} "
                    f"— the driver's hasher crashes on these (round-1 "
                    f"q_ordered_array_agg). Stringify at the output boundary "
                    f"(array_join / concat_ws / to_json) on BOTH sides."
                )
            if head and all(isinstance(v, (_dt.date, _dt.datetime)) for v in head):
                pdf[col] = pd.to_datetime(s).astype("datetime64[us]")
            # strings / Decimals stay as-is: a Decimal column will
            # fail the dtype-kind check against DuckDB's float64,
            # which is exactly the rule-1 violation we want surfaced.
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="first", kind="mergesort")
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    a = _normalize(spark_pdf, name, "spark")
    b = _normalize(oracle_pdf, name, "oracle")
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for col in a.columns:
        da, db = a[col].dtype, b[col].dtype
        if da.kind != db.kind or (da.kind in "fMm" and da != db):
            # Driver-strict: int64-vs-float64 (and f4-vs-f8, M8[ns]-vs-
            # M8[us]) hash differently even when values are equal.
            raise AssertionError(
                f"{name}.{col}: dtype mismatch spark={da} oracle={db} — the "
                f"driver hashes dtype-sensitively (round-1 q_window_groups_frame); "
                f"pin the type with an explicit CAST on both sides."
            )
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if da.kind == "f":
            both_nan = pd.isna(av) & pd.isna(bv)
            exact = (av == bv) | both_nan
            if not exact.all():
                bad = ~exact
                diffs = np.abs(av[bad] - bv[bad])
                raise AssertionError(
                    f"{name}.{col}: {bad.sum()} float mismatches, "
                    f"max_abs_diff={np.nanmax(diffs)}, "
                    f"first spark={av[bad][:3]} oracle={bv[bad][:3]}"
                )
        else:
            a_na, b_na = pd.isna(av), pd.isna(bv)
            eq = (a_na & b_na) | ((~a_na) & (~b_na) & (av == bv))
            if not np.asarray(eq, dtype=bool).all():
                bad = ~np.asarray(eq, dtype=bool)
                raise AssertionError(
                    f"{name}.{col}: {bad.sum()} mismatches, "
                    f"first spark={av[bad][:3]!r} oracle={bv[bad][:3]!r}"
                )
    # Literal driver mirror: the canonicalized frames must hash
    # identically cell-for-cell.
    ha = pd.util.hash_pandas_object(a, index=False)
    hb = pd.util.hash_pandas_object(b, index=False)
    assert ha.equals(hb), f"{name}: value-hash mismatch after exact compare (driver hasher)"


def check_query(spark, sf_dir: str, name: str) -> int:
    """Run one registered query against its oracle; return row count."""
    from adt_spark.queries import load_all

    q = load_all()[name]
    spark_pdf = q.spark_fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0
        return len(spark_pdf)
    with duckdb_connection(sf_dir) as con:
        oracle_pdf = con.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)
    return len(spark_pdf)
