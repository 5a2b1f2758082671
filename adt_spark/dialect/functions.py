"""DataFusion / PostgreSQL function-name shims for Spark SQL.

The reference exposes DataFusion 48's full scalar-function registry
(reference: crates/core/src/context.rs:32-33 ``with_default_features``;
inventory in SURVEY.md §2.B).  Spark 4 has native equivalents for
almost everything; the residue is closed two ways:

1. **SQL UDFs** here (``CREATE TEMPORARY FUNCTION … RETURN <expr>``)
   — these are Catalyst expressions, JVM-side and codegen-eligible,
   NOT Python UDFs, so they cost nothing at 100 TB scale.
2. **Name rewrites** in :mod:`adt_spark.dialect.translate` for pure
   renames (``approx_distinct`` → ``approx_count_distinct`` …).

SQL UDFs require concrete parameter types, so array shims are
registered for ``ARRAY<STRING>`` (the dominant case in the corpus);
generic use goes through the equivalent builtin compositions noted in
each docstring.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (signature, body).  Each body is a single Catalyst expression.
_SQL_UDFS: dict[str, tuple[str, str]] = {
    # DataFusion strpos(str, substr) — 1-based, 0 when absent (= instr).
    "strpos": ("(s STRING, sub STRING) RETURNS INT", "instr(s, sub)"),
    # DataFusion date_bin(stride, source, origin) — SURVEY.md gap G7.
    # Seconds-stride variant; floor() keeps pre-origin timestamps in
    # the correct (earlier) bin, matching DataFusion.
    "date_bin_seconds": (
        "(stride BIGINT, ts TIMESTAMP, origin TIMESTAMP) RETURNS TIMESTAMP",
        "timestamp_micros(unix_micros(origin) + cast(floor((unix_micros(ts) - unix_micros(origin)) / (stride * 1000000)) AS BIGINT) * stride * 1000000)",
    ),
    # DataFusion iszero(x).
    "iszero": ("(x DOUBLE) RETURNS BOOLEAN", "x = 0.0d"),
    # DataFusion array_empty(arr).
    "array_empty": ("(arr ARRAY<STRING>) RETURNS BOOLEAN", "cardinality(arr) = 0"),
    # DataFusion array_has_all(arr, needles) — every needle present.
    "array_has_all": (
        "(arr ARRAY<STRING>, needles ARRAY<STRING>) RETURNS BOOLEAN",
        "forall(needles, x -> array_contains(arr, x))",
    ),
    # DataFusion array_pop_front / array_pop_back — SURVEY.md gap G8.
    "array_pop_front": (
        "(arr ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "slice(arr, 2, greatest(cardinality(arr) - 1, 0))",
    ),
    "array_pop_back": (
        "(arr ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "slice(arr, 1, greatest(cardinality(arr) - 1, 0))",
    ),
    # DataFusion array_resize(arr, size, fill).
    "array_resize": (
        "(arr ARRAY<STRING>, size INT, fill STRING) RETURNS ARRAY<STRING>",
        "CASE WHEN size <= cardinality(arr) THEN slice(arr, 1, size) "
        "ELSE concat(arr, array_repeat(fill, size - cardinality(arr))) END",
    ),
    # DataFusion array_dims / array_ndims (1-D arrays).
    "array_dims": ("(arr ARRAY<STRING>) RETURNS ARRAY<INT>", "array(cardinality(arr))"),
    "array_ndims": ("(arr ARRAY<STRING>) RETURNS INT", "1"),
    # DataFusion to_unixtime(ts) → epoch seconds (fractional).
    "to_unixtime": ("(ts TIMESTAMP) RETURNS DOUBLE", "unix_micros(ts) / 1000000.0d"),
    # DataFusion nullif-adjacent nvl2 exists natively; digest(s, 'sha256')
    # family maps to sha2 — register the 2-arg digest for convenience.
    "digest": ("(s STRING, algo STRING) RETURNS STRING",
               "CASE algo WHEN 'md5' THEN md5(s) WHEN 'sha224' THEN sha2(s, 224) "
               "WHEN 'sha256' THEN sha2(s, 256) WHEN 'sha384' THEN sha2(s, 384) "
               "WHEN 'sha512' THEN sha2(s, 512) END"),
    # DataFusion's standalone sha-width names (crypto_expressions).
    "sha224": ("(s STRING) RETURNS STRING", "sha2(s, 224)"),
    "sha256": ("(s STRING) RETURNS STRING", "sha2(s, 256)"),
    "sha384": ("(s STRING) RETURNS STRING", "sha2(s, 384)"),
    "sha512": ("(s STRING) RETURNS STRING", "sha2(s, 512)"),
    # DataFusion gcd/lcm (math_expressions) — Spark has no builtin.
    # Euclid's algorithm as a bounded fold.  Worst case for 64-bit
    # inputs is ~90 division steps (consecutive Fibonacci numbers
    # F_92, F_91 — verified: 48 steps returned 701408733 instead of
    # gcd 1), so the bound is 96; the loop is a pure Catalyst
    # `aggregate` — codegen-eligible, no Python.
    "gcd": (
        "(a BIGINT, b BIGINT) RETURNS BIGINT",
        "element_at(aggregate(sequence(1, 96), array(abs(a), abs(b)), "
        "(acc, i) -> CASE WHEN element_at(acc, 2) = 0 THEN acc "
        "ELSE array(element_at(acc, 2), element_at(acc, 1) % element_at(acc, 2)) END), 1)",
    ),
    "lcm": (
        "(a BIGINT, b BIGINT) RETURNS BIGINT",
        "CASE WHEN a = 0 OR b = 0 THEN 0 ELSE abs(a DIV gcd(a, b) * b) END",
    ),
    # DataFusion array_any_value(arr) — first non-null element.
    "array_any_value": (
        "(arr ARRAY<STRING>) RETURNS STRING",
        "element_at(filter(arr, x -> x IS NOT NULL), 1)",
    ),
}


def register_dialect_functions(spark: SparkSession) -> None:
    """Register every shim as a session-scoped SQL function.

    Memoized per session object (round-11 optimization): the ~19
    ``CREATE OR REPLACE TEMPORARY FUNCTION`` statements cost ~0.2 s of
    SQL parsing per call, and ``__spark_entry__._prepare`` runs this
    inside every query builder.  Temporary functions are session-scoped
    and nothing in the repo drops or shadows them, so registering once
    per session is behavior-identical; the flag lives on the session
    object so a fresh session (or ``newSession()``) re-registers."""
    if getattr(spark, "_adt_dialect_fns_registered", False):
        return
    for name, (signature, body) in _SQL_UDFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature} RETURN {body}")
    spark._adt_dialect_fns_registered = True
