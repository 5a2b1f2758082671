"""Oracle-checked query corpus — the engine's operator inventory.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) is exercised by at least one named query registered here.
Each entry carries:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the PySpark
  implementation (DataFrame API / Spark SQL; Catalyst-optimized).
- ``oracle`` — an equivalent SQL string runnable by DuckDB on the
  same parquet tables, or ``None`` for non-SQL-expressible operators
  (the driver then records a weaker rows-only check).

Cross-engine determinism rules (so value-hashes match exactly):

1. Money math is done in DECIMAL (exact), cast to DOUBLE only at the
   output boundary — both engines then produce bit-identical doubles.
2. Averages are ``cast(exact_decimal_sum as double) / count`` — never
   a native ``avg`` over doubles (summation order differs).
3. Every top-k / limit has a total-order tiebreak on a unique key.
4. Aggregate outputs are explicitly cast (DuckDB's ``sum(BIGINT)``
   returns HUGEINT, Spark returns BIGINT — always pin the type).
5. Column names are identical on both sides (the driver sorts columns
   by name before hashing).
6. Never cast arbitrary DOUBLEs to a fractional DECIMAL: a binary
   fraction's decimal expansion can terminate with an exact '5' one
   digit past the target scale (e.g. 2^-16 at scale 15), and Spark
   rounds such ties HALF_UP while DuckDB rounds HALF_EVEN — measured
   divergence.  Money columns generated with 2 decimals are safe at
   DECIMAL(_,2); derived float products are NOT.  For exact sums over
   derived doubles use tie-free fixed-point: floor(x * 2^k) (power-of-
   two multiply is exact, floor never ties) — see emb_covariance.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation with its oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module and return the full registry."""
    from adt_spark.queries import (  # noqa: F401
        events,
        formats,
        relational,
        scalar_funcs,
        scalar_funcs2,
        temporal,
        tpch_extra,
        tpch_rest,
    )
    from adt_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        quality,
        sampling,
        similarity,
        skew,
        text,
    )
    from adt_spark.streaming import events as streaming_events  # noqa: F401

    return REGISTRY


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from adt_spark.context import register_sf_tables

    return register_sf_tables(spark, sf_dir)
