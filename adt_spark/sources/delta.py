"""Delta Lake source — the reference's core custom component
(crates/providers/src/deltatable.rs: snapshot read, log replay,
partition typing, deletion vectors, pushdowns; SURVEY.md §2.A A4-A11).

On Spark the whole of A4-A11 is library behavior: delta-spark reads
snapshots, prunes partitions and files from the log (stronger than
the reference, which skips log-level pruning — SURVEY.md §4.1 note),
honors deletion vectors, and maps every Delta type 1:1 onto
``pyspark.sql.types`` (SURVEY.md §1.2 table).  Zero custom scan code
is the correct port.

This container ships without the delta-spark jars, so the reader is
gated: it raises a clear error locally and works unchanged on any
cluster with ``io.delta:delta-spark`` on the classpath (plus
``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Session confs required for Delta on a real cluster.
DELTA_SESSION_CONF = {
    "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
}


class DeltaUnavailableError(RuntimeError):
    pass


def delta_available(spark: SparkSession) -> bool:
    """Probe through Spark's own data-source resolution — Class.forName
    uses the SYSTEM classloader and misses jars added with
    --packages/spark.jars.packages (Spark's MutableURLClassLoader)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "delta", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, location: str, version: int | None = None) -> DataFrame:
    """Snapshot read of a Delta table (reference deltatable.rs:99-384;
    snapshot-per-scan semantics deltatable.rs:293-296).  ``version``
    maps to time travel (``versionAsOf``).

    Two paths, mirroring the reference's two Delta providers
    (feature-gated ``adt-delta`` kernel provider vs the default
    deltalake-crate provider, SURVEY.md §2.A A4/A5):

    1. **delta-spark** when its jars are on the classpath — full
       feature surface (column mapping, log-level data skipping).
    2. **native log-replay reader** (``delta_native``) otherwise —
       pure PySpark over the public Delta protocol: checkpoint +
       commit replay, typed partition values, deletion vectors.
    """
    if delta_available(spark):
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", str(version))
        return reader.load(location)
    from adt_spark.sources.delta_native import read_delta_native

    return read_delta_native(spark, location, version)
