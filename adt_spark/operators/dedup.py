"""Deduplication operators over the ``documents`` / ``embeddings``
tables — exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup (BASELINE.json north-star operators).

Design for 100 TB, applied to every operator here:

- **No cartesian products.**  Candidate pairs come from equi-joins on
  derived keys (content hash, shingle, LSH band bucket, SimHash
  band), so Spark shuffles on the key and each bucket joins locally.
- **No Python in the hot path.**  Shingling, hashing, signatures and
  verification are Catalyst higher-order functions + md5/crc —
  whole-stage-codegen'd JVM execution.
- **Deterministic hashing.**  All hashes are md5 hex strings (shared
  with the DuckDB oracles), seeded by literal prefixes — no RNG, so
  results are reproducible across engines, runs, and cluster sizes.
- **Skew awareness.**  Ubiquitous shingles create hot join keys; the
  inverted-index joins filter postings longer than a cap (stopword
  shingles carry no dedup signal), the standard mitigation in
  MinHash pipelines, and AQE skew-join splits any residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables

# MinHash parameters: 12 permutations → 4 bands × 3 rows.
_N_HASHES = 12
_N_BANDS = 4
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
_JACCARD_T = 0.8
# Drop shingles occurring in more than this many docs (hot-key cap).
_MAX_POSTING = 100


# ---------------------------------------------------------------------------
# Shared shingle derivation (word 3-grams, distinct per doc)
# ---------------------------------------------------------------------------

_SHINGLE_SQL = """
    SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t,
         unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS u(i)
"""


def _shingles(docs: DataFrame) -> DataFrame:
    """doc_id → exploded distinct word-3-gram shingles.

    The 3-gram array is built by transform(sequence) in one
    projection and **materialized via cache() before the explode**.
    Without a hard barrier Catalyst collapses the projection into
    Generate and re-evaluates the whole transform+array_distinct per
    OUTPUT row — quadratic in doc length (measured 95s vs 0.9s at
    sf0.1; a repartition exchange does NOT help because column
    pruning defers the array expression above the exchange).  The
    cache is MEMORY_AND_DISK, ≈ corpus-sized, so at cluster scale it
    spills rather than OOMs; every downstream consumer (signatures,
    sizes, verification) re-reads the materialized arrays instead of
    re-shingling.
    """
    toks = F.split(F.col("text"), " ")
    arr = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    pre = docs.select("doc_id", arr.alias("shingle_arr")).cache()
    return pre.select("doc_id", F.explode("shingle_arr").alias("shingle"))


# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content; keep min id.

    One shuffle on the 128-bit content hash — uniform by construction,
    no skew.  At 100 TB this is the cheapest possible dedup: partial
    aggregation collapses per-partition duplicates before the shuffle.
    """
    docs = tables(spark, sf_dir)["documents"]
    return (
        docs.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    filtered AS (
        SELECT doc_id, shingle FROM sh
        QUALIFY count(*) OVER (PARTITION BY shingle) <= {_MAX_POSTING}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM filtered a JOIN filtered b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {_JACCARD_T}
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard ≥ 0.8 via an
    inverted shingle index — never a doc×doc cartesian.

    Shuffle structure: explode shingles → shuffle on shingle (hot
    shingles capped at {_MAX_POSTING} postings — ubiquitous shingles
    carry no signal) → pair counts shuffle on (doc_a, doc_b).  Join
    fan-out is Σ postings², bounded by the cap; Jaccard is exact
    integer arithmetic so the 0.8 gate is engine-independent.
    """
    docs = tables(spark, sf_dir)["documents"]
    sh = _shingles(docs)  # array DF cached inside _shingles
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # Hot-shingle cap as a broadcast anti-join: the >cap list is tiny,
    # so this costs one aggregation instead of a window sort over the
    # whole index, and the anti-join is a broadcast (no shuffle).
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > _MAX_POSTING)
        .select("shingle")
    )
    filtered = sh.join(F.broadcast(hot), ["shingle"], "left_anti")
    a = filtered.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = filtered.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, ["shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, ["doc_a"])
        .join(sb, ["doc_b"])
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= _JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_sig_cols():
    """One min-aggregate per seed: sig_k = min(md5('k|' || shingle)).

    Computing all signatures in a single groupBy means the shingle
    explosion is scanned once — no per-seed re-shuffle; lexicographic
    min over md5 hex is a valid uniform min-hash and is identical in
    DuckDB (ASCII compare).
    """
    return [
        F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle")))).alias(f"sig{k}")
        for k in range(_N_HASHES)
    ]


_SIG_SQL = ",\n           ".join(
    f"min(md5('{k}|' || shingle)) AS sig{k}" for k in range(_N_HASHES)
)
_BAND_KEYS_SQL = ",\n           ".join(
    "md5('b%d|' || %s) AS band%d"
    % (
        b,
        " || ".join(f"sig{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)),
        b,
    )
    for b in range(_N_BANDS)
)
_BAND_UNION_SQL = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, band{b} AS band_key FROM bands" for b in range(_N_BANDS)
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sigs AS (
        SELECT doc_id,
           {_SIG_SQL}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id,
           {_BAND_KEYS_SQL}
        FROM sigs
    ),
    exploded AS (
{_BAND_UNION_SQL}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM exploded a JOIN exploded b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    verified AS (
        SELECT doc_a, doc_b, count(*) AS c
        FROM cands
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b AND x.shingle = y.shingle
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM verified
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {_JACCARD_T}
    """,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup: shingle → 12 min-hash signatures →
    4 bands × 3 rows → band-bucket join → exact-Jaccard verification.

    This is the scale path for near-dup: candidate generation joins
    on band buckets (tiny, uniform md5 keys), so the pair count is
    ~ true-positive pairs + banding false positives — independent of
    corpus size, unlike the full inverted-index join.  The verify
    step re-joins only candidate pairs against the shingle index.

    Everything is one DataFrame DAG: signatures are 12 min-aggregates
    in ONE groupBy (single shuffle), bands are projections, the
    bucket join shuffles on band_key.  Deterministic: md5-seeded
    hashes, no RNG.
    """
    docs = tables(spark, sf_dir)["documents"]
    sh = _shingles(docs)  # array DF cached inside _shingles
    sigs = sh.groupBy("doc_id").agg(*_minhash_sig_cols())
    band_cols = [
        F.md5(
            F.concat(
                F.lit(f"b{b}|"),
                *[F.col(f"sig{b * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)],
            )
        ).alias(f"band{b}")
        for b in range(_N_BANDS)
    ]
    bands = sigs.select("doc_id", *band_cols)
    exploded = bands.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{b}") for b in range(_N_BANDS)])).alias("band_key"),
    )
    cands = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    y = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    verified = (
        cands.join(x, ["doc_a"])
        .join(y, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        verified.join(sa, ["doc_a"])
        .join(sb, ["doc_b"])
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= _JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32


def _bit_sql(b: int, token_expr: str) -> str:
    """Portable SQL for bit ``b`` (0 = most-significant hex digit's
    high bit) of md5(token): decode one hex digit via instr, then
    shift/mask with integer arithmetic only."""
    digit = f"substr(md5({token_expr}), {1 + b // 4}, 1)"
    val = f"(instr('0123456789abcdef', {digit}) - 1)"
    shift = 2 ** (3 - b % 4)
    return f"(CAST(floor({val} / {shift}) AS INT) % 2)"


_SIM_SUMS_SQL = ",\n           ".join(
    f"sum(CASE WHEN {_bit_sql(b, 'tok')} = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(_SIMHASH_BITS)
)
_SIM_FP_SQL = " + ".join(
    f"(CASE WHEN s{b} >= 0 THEN CAST({2 ** (_SIMHASH_BITS - 1 - b)} AS BIGINT) ELSE 0 END)"
    for b in range(_SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    sums AS (
        SELECT doc_id,
           {_SIM_SUMS_SQL}
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST({_SIM_FP_SQL} AS BIGINT) AS simhash
    FROM sums
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit) document fingerprints: per-token md5 bits,
    ±1 vote per bit weighted by token multiplicity, sign → bit.

    One explode (linear) + ONE groupBy computing all 32 bit-sums as
    plain aggregates — the signature never leaves the JVM.  Near-dup
    candidates at scale group on simhash bands (e.g. 4×8-bit
    sub-keys) exactly like MinHash banding; the fingerprint itself is
    the oracle-checked output.  Hex-digit decoding uses
    instr('0123456789abcdef', d) — portable to DuckDB.
    """
    docs = tables(spark, sf_dir)["documents"]
    # Hash each token ONCE in a materialized projection (cache barrier,
    # same rationale as _shingles): without it CollapseProject inlines
    # md5 into all 32 aggregate expressions → 32 digests per token.
    pre = docs.select(
        "doc_id",
        F.transform(F.split(F.col("text"), " "), lambda t: F.md5(t)).alias("hashes"),
    ).cache()
    toks = pre.select("doc_id", F.explode("hashes").alias("h"))
    md5c = F.col("h")

    def bit(b: int):
        digit = F.substring(md5c, 1 + b // 4, 1)
        val = F.instr(F.lit("0123456789abcdef"), digit) - 1
        shift = 2 ** (3 - b % 4)
        return (F.floor(val / shift).cast("int") % 2)

    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"s{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") >= 0, F.lit(2 ** (_SIMHASH_BITS - 1 - b)).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("bigint").alias("simhash"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

_COS_T = 0.45

_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_NORM_SQL = (
    "sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST({t}.embedding[i] AS DOUBLE) * CAST({t}.embedding[i] AS DOUBLE))))"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_DOT_SQL} / ({_NORM_SQL.format(t='a')} * {_NORM_SQL.format(t='b')}) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_DOT_SQL} / ({_NORM_SQL.format(t='a')} * {_NORM_SQL.format(t='b')}) >= {_COS_T}
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ 0.45, computed as a
    broadcast matrix scan inside mapInPandas.

    Shape: the corpus matrix (n×64 float64) broadcasts to every task;
    each Arrow batch of vectors scores against it with numpy — the
    distributed analog of a block-row × full-matrix product, so the
    scan parallelizes over partitions and only the ≥-threshold pairs
    ever materialize as rows.  (A pure-Catalyst zip_with/aggregate
    theta-join version was 25× slower at sf0.1 — 12.5M interpreted
    64-element folds; this is the sanctioned Arrow-vectorized path.)

    Bit-exactness vs the DuckDB oracle: the accumulation loops run
    over dimension k in ascending order (``acc += A[:,k]·B[:,k]``),
    the same left-to-right double-add order as DuckDB's list_sum and
    Catalyst's aggregate fold — so cosines are bit-identical; no
    tolerance needed.

    The broadcast bounds this operator to corpora whose embedding
    matrix fits executor memory (~2 GB per 4M vectors); beyond that,
    use ``ann_lsh_bucketed`` (sign-LSH candidate generation) — the
    same threshold gate with bucket-bounded candidates.
    """
    import numpy as np
    import pandas as pd

    emb = tables(spark, sf_dir)["embeddings"]
    corpus = emb.select("vec_id", "embedding").toPandas()
    ids = corpus["vec_id"].to_numpy()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in corpus["embedding"]])
    dim = M.shape[1]
    norms = np.zeros(len(M))
    for k in range(dim):  # sequential-k: matches list_sum fold order
        norms += M[:, k] * M[:, k]
    norms = np.sqrt(norms)
    # Ship the matrix in the task closure (a few MB pickled) rather
    # than a Broadcast — no driver-side broadcast lifecycle to leak.

    def scan(batches):
        ids_b, M_b, norms_b = ids, M, norms
        tmp = None
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy()
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            a_norms = np.zeros(len(A))
            dots = np.zeros((len(A), len(M_b)))
            if tmp is None or tmp.shape != dots.shape:
                tmp = np.empty_like(dots)
            for k in range(dim):
                a_norms += A[:, k] * A[:, k]
                # preallocated buffer: no per-iteration temporaries,
                # keeps 32 parallel workers off the allocator
                np.multiply(A[:, k][:, None], M_b[None, :, k], out=tmp)
                dots += tmp
            cos = dots / (np.sqrt(a_norms)[:, None] * norms_b[None, :])
            ai, bi = np.nonzero((cos >= _COS_T) & (a_ids[:, None] < ids_b[None, :]))
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": ids_b[bi],
                    "cosine": cos[ai, bi],
                }
            )

    # Spread the scan side across tasks: a single parquet file arrives
    # as one partition, which would serialize the whole matrix scan.
    scan_side = emb.select("vec_id", "embedding").repartition(
        spark.sparkContext.defaultParallelism
    )
    return scan_side.mapInPandas(scan, schema="vec_a long, vec_b long, cosine double")
