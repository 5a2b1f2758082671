"""Dataset sampling / mixing operators — the steps between "deduped
corpus" and "training mix" in an LLM data pipeline.

All sampling here is **deterministic hash sampling**: membership is a
pure function of (seed, row key), so the same rows are selected on any
engine, any cluster size, any run — reproducibility that
``TABLESAMPLE`` / ``rand()`` cannot give, and the property the DuckDB
oracles rely on.  (Same scheme as ``q_hash_sample``; cf. the
fingerprint-hash splits used by large-corpus pipeline papers.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables

#: lang → (hex threshold on md5 prefix, repeat factor).  '40'/256 ≈ 25%
#: (downsample dominant English), 'c0' ≈ 75%, 'ff'+2 ≈ keep-all ×2
#: (upweight the underrepresented language by epoch repetition).
_MIX = [("en", "40", 1), ("de", "c0", 1), ("es", "c0", 1), ("fr", "c0", 1), ("zh", "ff", 2)]


@register(
    "q_stratified_sample",
    oracle="""
    WITH rates(lang, thresh, repeats) AS (
        VALUES ('en', '40', 1), ('de', 'c0', 1), ('es', 'c0', 1),
               ('fr', 'c0', 1), ('zh', 'ff', 2)
    )
    SELECT d.doc_id AS doc_id, d.lang AS lang, CAST(u.i AS INT) AS repeat_idx
    FROM documents d
    JOIN rates r ON d.lang = r.lang,
         unnest(generate_series(1, r.repeats)) AS u(i)
    WHERE substr(md5('strat-' || CAST(d.doc_id AS VARCHAR)), 1, 2) < r.thresh
    """,
    tags=("sampling", "mixing"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling + repeat-based upweighting: per-language
    sampling rates (downsample the dominant stratum, repeat the
    underrepresented one) — the core of training-mix construction.

    Scale shape: the rate table is a literal broadcast (no shuffle),
    membership is a partition-local md5 test, and upweighting is a
    row-local ``explode(sequence(...))`` — the whole operator is
    embarrassingly parallel with zero shuffles, so it costs one corpus
    scan at any scale.
    """
    docs = tables(spark, sf_dir)["documents"]
    rates = spark.createDataFrame(_MIX, "lang string, thresh string, repeats int")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(
            F.substring(F.md5(F.concat(F.lit("strat-"), F.col("doc_id").cast("string"))), 1, 2)
            < F.col("thresh")
        )
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("repeats"))).alias("repeat_idx"),
        )
    )


@register(
    "q_deterministic_shuffle",
    oracle="""
    SELECT doc_id, md5('shuf-' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    """,
    tags=("sampling", "shuffle"),
)
def q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: a reproducible training order via
    total sort on a seeded content hash (identical order every run and
    on every engine, unlike ``orderBy(rand())``).

    Scale shape: one range-partitioned sort — Spark samples key
    ranges, so output partitions are balanced regardless of input
    order; at 100 TB this is the canonical "shuffle the corpus once,
    write it back ordered" job.
    """
    docs = tables(spark, sf_dir)["documents"]
    key = F.md5(F.concat(F.lit("shuf-"), F.col("doc_id").cast("string")))
    return docs.select("doc_id", key.alias("shuffle_key")).orderBy("shuffle_key")
