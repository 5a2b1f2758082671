"""adt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference engine (aolwas/adt).

The reference is a thin Rust CLI over Apache DataFusion 48 + Delta
(see /root/repo/SURVEY.md).  This package re-expresses that surface
Spark-first:

- ``adt_spark.context.ADTContext``  — session/catalog layer
  (reference: crates/core/src/context.rs).
- ``adt_spark.sources``             — table registration over files
  (reference: crates/providers/src/listing.rs, deltatable.rs).
- ``adt_spark.dialect``             — DataFusion/Postgres → Spark SQL
  function shims (SURVEY.md §2.B gap table).
- ``adt_spark.queries``             — the oracle-checked relational
  query corpus (SURVEY.md §2 inventory).
- ``adt_spark.operators``           — LLM-data-pipeline extensions:
  dedup, similarity search, text analysis, multimodal columns.
- ``adt_spark.streaming``           — Structured Streaming operators.
- ``adt_spark.cli``                 — view / schema / execute CLI
  (reference: crates/cli/src/main.rs).

Everything is DataFrame/SQL-first: plans are declared via the PySpark
DataFrame API or Spark SQL and optimized by Catalyst; Python UDFs are
used only where built-ins cannot express the semantics, and then only
as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from adt_spark.context import ADTContext, build_session

__all__ = ["ADTContext", "build_session", "__version__"]
