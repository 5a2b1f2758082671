"""Spark-vs-DuckDB oracle comparison harness.

Mirrors the driver's correctness gate (row-count + schema +
order-insensitive value comparison) so every query is validated
locally before the driver ever sees it.  Comparison is EXACT — the
corpus is engineered (decimal money math, pinned output types, total
ordering for top-k) so both engines emit identical values; a float
tolerance would only hide engineering mistakes.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from adt_spark.context import SF_TABLES


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


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, dtypes widened to a
    common representation, rows sorted by all columns."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for col in pdf.columns:
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[col] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[col] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[col] = s.astype("int64")
        elif pd.api.types.is_object_dtype(s):
            import datetime as _dt

            non_null = s.dropna()
            if len(non_null) and all(
                isinstance(v, (_dt.date, _dt.datetime)) for v in non_null.head(5)
            ):
                pdf[col] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                # decimals / lists → stable string form
                pdf[col] = s.map(lambda v: None if v is None else str(v))
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="first", kind="mergesort")
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if pd.api.types.is_float_dtype(a[col]) and pd.api.types.is_float_dtype(b[col]):
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
