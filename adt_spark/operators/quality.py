"""Corpus-quality operators over the ``documents`` table — Gopher-style
repetition filtering and benchmark decontamination.

The reference has no text processing at all (its surface is the
DataFusion 48 SQL engine, SURVEY.md §2.B); these are LLM-data-pipeline
north-star extensions (BASELINE.json) alongside operators/text.py.

Scale posture:

- ``text_repetition_stats`` is the explode → two-phase-aggregate
  shape: the shuffle key is (doc_id, token), so partition size tracks
  tokens-per-document, never corpus size.  For 10k-token web documents
  at 100 TB this stays uniform; the per-row higher-order-function
  alternative (O(L²) per document) would not.
- ``dedup_decontaminate`` joins training shingles against the
  *benchmark* shingle set.  Benchmark/eval corpora are tiny relative
  to training data (MBs vs TBs), so the eval side is broadcast —
  contamination checking at 100 TB is then one shuffle-free scan over
  the training shingles plus a per-doc partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables

#: Shingle width for decontamination (published pipelines use 8–13-gram
#: word overlap; 4 fits the driver's short synthetic documents).
NGRAM = 4

#: Deterministic benchmark split: every 20th document stands in for the
#: held-out eval set being protected from contamination.
EVAL_MOD = 20


@register(
    "text_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), c AS (
      SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
             AS top_token_ratio,
           CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
             / CAST(sum(cnt) AS DOUBLE) AS dup_token_ratio
    FROM c GROUP BY doc_id
    """,
    tags=("text", "quality", "repetition"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition ratios per document: the fraction of
    tokens taken by the single most frequent token, and the fraction
    belonging to any repeated token.  High values flag boilerplate /
    degenerate documents for removal from a training mix.

    Two-phase aggregation: count per (doc_id, token) — map-side
    partial combine absorbs the within-document repetition before the
    shuffle — then fold per doc_id.  Ratios are double divisions of
    exact integer counts, bit-identical to the oracle.
    """
    docs = tables(spark, sf_dir)["documents"]
    per_token = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_token.groupBy("doc_id")
        .agg(
            F.max("cnt").alias("max_cnt"),
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup"),
        )
        .select(
            "doc_id",
            (F.col("max_cnt").cast("double") / F.col("n_tokens").cast("double")).alias(
                "top_token_ratio"
            ),
            (F.col("dup").cast("double") / F.col("n_tokens").cast("double")).alias(
                "dup_token_ratio"
            ),
        )
    )


@register(
    "dedup_decontaminate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_transform(range(len(toks) - {NGRAM - 1}),
                                   i -> array_to_string(toks[i+1:i+{NGRAM}], ' ')))
               AS shingle
      FROM t WHERE len(toks) >= {NGRAM}
    ), ev AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
    )
    SELECT s.doc_id, CAST(count(DISTINCT s.shingle) AS BIGINT) AS n_hit_shingles
    FROM sh s JOIN ev USING (shingle)
    WHERE s.doc_id % {EVAL_MOD} <> 0
    GROUP BY s.doc_id
    """,
    tags=("dedup", "decontamination", "ngram"),
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word {NGRAM}-gram with the held-out eval split, with the count of
    distinct overlapping shingles (the PaLM/GPT-3 eval-overlap rule).

    The eval shingle set is broadcast (benchmarks are MBs; training
    data is TBs), so the training side is a single scan — explode to
    shingles, broadcast-hash-join, per-doc aggregate — with its only
    shuffle keyed by doc_id for the final count-distinct.
    """
    docs = tables(spark, sf_dir)["documents"]
    shingled = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).filter(F.size("toks") >= NGRAM).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {NGRAM}),"
                f" i -> array_join(slice(toks, i + 1, {NGRAM}), ' '))"
            )
        ).alias("shingle"),
    )
    eval_shingles = (
        shingled.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        shingled.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hit_shingles"))
    )
