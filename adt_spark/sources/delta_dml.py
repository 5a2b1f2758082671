"""SQL dispatch for native Delta DML — routes ``DELETE`` / ``UPDATE`` /
``VACUUM`` statements over path tables (``delta.`/path``` URL-table
sugar, reference context.rs:55) to the native copy-on-write writer, so
the engine's SQL entry point covers table mutation without delta-spark
jars.

Grammar (one statement each; the path form only — catalog tables with
delta-spark present parse natively in Spark SQL):

    DELETE FROM delta.`/path` WHERE <predicate>
    UPDATE delta.`/path` SET col = expr [, ...] WHERE <predicate>
    VACUUM delta.`/path` [RETAIN <n> HOURS]
    OPTIMIZE delta.`/path` [ZORDER BY (col, ...)]

Each returns a 1-row metrics DataFrame (affected-row / file counts),
matching the shape Spark's own DML commands report.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+delta\.`(?P<path>[^`]+)`\s+WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+delta\.`(?P<path>[^`]+)`\s+SET\s+(?P<sets>.+?)"
    r"\s+WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+delta\.`(?P<path>[^`]+)`"
    r"(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]+)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+delta\.`(?P<path>[^`]+)`"
    r"(?:\s+RETAIN\s+(?P<hours>\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*$",
    re.IGNORECASE,
)


def is_delta_dml(sql: str) -> bool:
    return bool(
        _DELETE.match(sql)
        or _UPDATE.match(sql)
        or _VACUUM.match(sql)
        or _OPTIMIZE.match(sql)
    )


def _split_assignments(sets: str) -> dict[str, str]:
    """``a = expr, b = expr`` → {a: expr, b: expr}; splits on commas at
    paren-depth 0 outside string literals."""
    parts: list[str] = []
    depth = 0
    in_str = False
    buf: list[str] = []
    for ch in sets:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch in "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(buf))
                buf = []
                continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    out: dict[str, str] = {}
    for part in parts:
        col, eq, expr = part.partition("=")
        if not eq:
            raise ValueError(f"malformed SET assignment: {part.strip()!r}")
        out[col.strip().strip("`")] = expr.strip()
    return out


_DELTA_URL = re.compile(
    r"\bdelta\.`(?P<path>[^`]+)`"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+))?",
    re.IGNORECASE,
)


def rewrite_delta_url_tables(spark: SparkSession, sql: str) -> str:
    """``FROM delta.`/path``` URL-table sugar without delta-spark jars:
    register each referenced path as a temp view through the native
    reader and substitute the view name (reference parity: URL tables
    work for every registered format, context.rs:55 + the deltatable
    factory).  With the jars present the syntax is native — callers
    skip this rewrite.  Views are snapshot-per-statement: re-resolved
    on every call, matching the reference's snapshot-per-scan
    (deltatable.rs:293-296).

    Time travel: ``delta.`/path` VERSION AS OF n`` (delta-spark's SQL
    spelling) replays the log only to version n — each (path, version)
    binds its own view.
    """
    import hashlib

    from adt_spark.sources.delta_native import read_delta_native

    def sub(m: re.Match[str]) -> str:
        path = m.group("path")
        version = int(m.group("version")) if m.group("version") else None
        key = f"{path}@{version if version is not None else 'latest'}"
        name = "delta_url_" + hashlib.md5(key.encode()).hexdigest()[:10]
        read_delta_native(spark, path, version=version).createOrReplaceTempView(name)
        return name

    return _DELTA_URL.sub(sub, sql)


def execute_delta_dml(spark: SparkSession, sql: str) -> DataFrame:
    from adt_spark.sources.delta_native_write import (
        delete_where,
        update_where,
        vacuum,
    )

    if m := _DELETE.match(sql):
        version, n = delete_where(spark, m.group("path"), m.group("pred"))
        return spark.createDataFrame(
            [(n, version)], "num_affected_rows bigint, version bigint"
        )
    if m := _UPDATE.match(sql):
        version, n = update_where(
            spark, m.group("path"), m.group("pred"), _split_assignments(m.group("sets"))
        )
        return spark.createDataFrame(
            [(n, version)], "num_affected_rows bigint, version bigint"
        )
    if m := _OPTIMIZE.match(sql):
        from adt_spark.sources.delta_native_write import (
            optimize_compact,
            optimize_zorder,
        )

        path = m.group("path")
        if cols := m.group("cols"):
            zcols = [c.strip().strip("`") for c in cols.split(",")]
            version = optimize_zorder(spark, path, zcols)
            return spark.createDataFrame(
                [(version, ",".join(zcols))], "version bigint, zorder_by string"
            )
        version = optimize_compact(spark, path)
        return spark.createDataFrame([(version,)], "version bigint")
    if m := _VACUUM.match(sql):
        hours = float(m.group("hours")) if m.group("hours") else 168.0
        deleted = vacuum(spark, m.group("path"), retain_hours=hours)
        return spark.createDataFrame([(len(deleted),)], "num_files_deleted bigint")
    raise ValueError(f"not a delta DML statement: {sql!r}")
