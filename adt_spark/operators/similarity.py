"""Similarity search over the ``embeddings`` table (``array<float>``
column): brute-force cosine top-k as the exactness baseline, and an
LSH sign-bucketed variant as the 100 TB scale path.

Vector arithmetic is zip_with + left-to-right aggregate folds over
doubles — JVM-side, codegen-eligible, and accumulation-order-identical
to DuckDB's list_sum, so cosine values match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from adt_spark.queries import register, tables

_DIM = 64
_TOP_K = 10
_N_QUERIES = 5  # query set: vec_id < 5
# Sign-LSH: 8 deterministic pseudo-hyperplanes from dimension picks.
_N_PLANES = 8


def _dlit_array(vals):
    """An ``array<double>`` literal built as ONE parsed SQL expression
    instead of ``F.lit(list)`` / per-element ``F.lit`` chains.
    Measured: ``F.lit`` on a 512-float list costs ~0.3 s of py4j
    per-element conversion PER CALL (the round-7 K=32 codebooks made
    that the dominant cost of the whole PQ family — 2.2 s of DRIVER
    time building one distortion plan), while the parsed form is
    ~1.5 ms.  Exactness is unchanged: ``repr(float)`` is the shortest
    round-trip decimal and Spark's ``…D`` double literal parses it
    back to the identical bits."""
    return F.expr("array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")")


def _vec_double(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


_DOT_SQL_T = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _norm_sql(tbl: str) -> str:
    return (
        "sqrt("
        + _DOT_SQL_T.format(dim=_DIM, a=f"{tbl}.embedding", b=f"{tbl}.embedding")
        + ")"
    )


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {_DOT_SQL_T.format(dim=_DIM, a='q.embedding', b='e.embedding')}
                 / ({_norm_sql('q')} * {_norm_sql('e')}) AS cosine
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_TOP_K}
    """,
    tags=("similarity", "ann"),
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    The query side ({_N_QUERIES} vectors) broadcasts → corpus scan
    stays partition-parallel with zero shuffle for scoring; the only
    shuffle is the per-query top-k window over (queries × corpus)
    scores, bounded by row_number pushdown (WindowGroupLimit keeps
    per-partition heaps of k).  This is the pattern that survives a
    1000-executor corpus: scoring cost is linear and perfectly
    partitioned, top-k state is k rows per query per partition.
    """
    return _exact_topk_full(spark, sf_dir)


def _scored_query_pairs(
    spark: SparkSession, sf_dir: str, dim: int = _DIM
) -> DataFrame:
    """(query_id, neighbor_id, cosine) for the broadcast query set ×
    corpus — the shared exact-scoring stem of ann_topk_bruteforce,
    ann_range_search, and emb_matryoshka_recall.  ONE copy on
    purpose: the ascending-k cosine fold is the bit-exactness-critical
    code, and a fold-order change must move every consumer (and its
    oracle) together.  ``dim < _DIM`` scores over the embedding
    PREFIX (matryoshka truncation)."""
    from adt_spark.context import spread

    emb = spread(tables(spark, sf_dir)["embeddings"])
    if dim < _DIM:
        v = F.transform(
            F.slice(F.col("embedding"), 1, dim), lambda x: x.cast("double")
        )
    else:
        v = _vec_double()
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        v.alias("v_n"),
        F.sqrt(_dot(v, v)).alias("norm_n"),
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        v.alias("v_q"),
        F.sqrt(_dot(v, v)).alias("norm_q"),
    )
    return corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    ).withColumn(
        "cosine",
        F.try_divide(_dot(F.col("v_q"), F.col("v_n")), F.col("norm_q") * F.col("norm_n")),
    )


#: cosine radius for range search — 0.3 yields a data-dependent,
#: non-trivial result set for the fixture query vectors (18 hits at
#: sf0.01; the 0.4 near-dup gate fires only for planted pairs, none
#: of which fall in the query id range)
_RANGE_R = 0.3


@register(
    "ann_range_search",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES})
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           {_DOT_SQL_T.format(dim=_DIM, a='q.embedding', b='e.embedding')}
             / ({_norm_sql('q')} * {_norm_sql('e')}) AS cosine
    FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE {_DOT_SQL_T.format(dim=_DIM, a='q.embedding', b='e.embedding')}
             / ({_norm_sql('q')} * {_norm_sql('e')}) >= {_RANGE_R}
    """,
    tags=("similarity", "ann", "range"),
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius neighbor search (FAISS ``range_search`` parity): every
    corpus vector within cosine ≥ {_RANGE_R} of each query — the
    retrieval mode where the RESULT SIZE is data-dependent, so no
    top-k heap applies and the gate is a plain filter.

    Same scale shape as ann_topk_bruteforce minus the window: the
    query set broadcasts, scoring is a shuffle-FREE partition-parallel
    scan with the radius filter fused into it (one pass, no
    WindowGroupLimit state at all) — strictly cheaper than top-k.
    For corpora where even the linear scan is the bottleneck, bucket
    first (ann_lsh_bucketed) and verify candidates with this exact
    gate.  Cosines use the same ascending-k fold as every embedding
    operator (shared stem _scored_query_pairs) — bit-identical to the
    oracle, no tolerance.
    """
    return (
        _scored_query_pairs(spark, sf_dir)
        .filter(F.col("cosine") >= _RANGE_R)
        .select("query_id", "neighbor_id", "cosine")
    )


#: truncated ("matryoshka") prefix dimensionality for retrieval-recall
#: evaluation — the MRL question: how much top-k does a 4x-cheaper
#: prefix embedding preserve?
_MRL_DIM = 16


@register(
    "emb_matryoshka_recall",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
    full_rank AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     {_DOT_SQL_T.format(dim=_DIM, a='q.embedding', b='e.embedding')}
                       / ({_norm_sql('q')} * {_norm_sql('e')}) DESC,
                     e.vec_id) AS rn
            FROM q JOIN embeddings e ON e.vec_id <> q.vec_id)
        WHERE rn <= {_TOP_K}
    ),
    trunc_rank AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     {_DOT_SQL_T.format(dim=_MRL_DIM, a='q.embedding', b='e.embedding')}
                       / (sqrt({_DOT_SQL_T.format(dim=_MRL_DIM, a='q.embedding', b='q.embedding')})
                        * sqrt({_DOT_SQL_T.format(dim=_MRL_DIM, a='e.embedding', b='e.embedding')})) DESC,
                     e.vec_id) AS rn
            FROM q JOIN embeddings e ON e.vec_id <> q.vec_id)
        WHERE rn <= {_TOP_K}
    )
    SELECT f.query_id, CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(count(t.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_at_k
    FROM full_rank f
    LEFT JOIN trunc_rank t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
    tags=("similarity", "eval", "matryoshka"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-recall evaluation for truncated ("matryoshka")
    embeddings (Kusupati et al. 2022, "Matryoshka Representation
    Learning", public): per query, how many of the full-{_DIM}-dim
    cosine top-{_TOP_K} survive when retrieval uses only the first
    {_MRL_DIM} dims — the measurement a pipeline runs before swapping
    in the 4x-cheaper prefix index.

    Both rankings are exact brute force over the broadcast query set
    (two shuffle-free scoring scans + two WindowGroupLimit top-k
    passes), joined on (query, neighbor) and folded to one overlap
    count per query.  Ascending-k folds keep every cosine — full and
    truncated — bit-identical to the oracle, and the neighbor-id
    tiebreak makes both top-k sets deterministic.
    """
    def topk(dim: int, out_q: str, out_n: str) -> DataFrame:
        scored = _scored_query_pairs(spark, sf_dir, dim)
        w = W.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _TOP_K)
            .select(
                F.col("query_id").alias(out_q), F.col("neighbor_id").alias(out_n)
            )
        )

    # full-dim side = the memoized shared ground-truth stem; only the
    # truncated ranking re-scans
    full = _exact_topk(spark, sf_dir)
    trunc = topk(_MRL_DIM, "tq", "tn")
    return (
        full.join(
            trunc,
            (F.col("tq") == F.col("query_id")) & (F.col("tn") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("tn").alias("n_overlap"),
            (F.count("tn").cast("double") / _TOP_K).alias("recall_at_k"),
        )
    )


def _plane_weights(p: int) -> list[int]:
    """±1 weight vector for pseudo-hyperplane p, derived from md5 of
    (plane, dim) — no RNG.  Evaluated once in Python at plan-build
    time (hashlib md5 ≡ SQL md5 on the same ASCII input) and inlined
    as a literal array, instead of re-hashing 8×64 constants per ROW
    at execution (which dominated this operator's runtime)."""
    import hashlib

    weights = []
    for i in range(1, _DIM + 1):
        digit = hashlib.md5(f"p{p}d{i}".encode()).hexdigest()[0]
        # instr('0123456789abcdef', d) % 2 == 1  ⇔  int(d, 16) even
        weights.append(1 if int(digit, 16) % 2 == 0 else -1)
    return weights


def _plane_sign_expr(vec, p: int):
    """Deterministic pseudo-hyperplane p: sign of the ±1-weighted sum
    of dimensions.  The fold multiplies by nothing — it keeps the
    exact when(w=1, x, -x) arithmetic of the SQL oracle, so the sum
    and therefore the sign bit are bit-identical.  sign >= 0 → bit 1.
    """
    w_lit = F.array(*[F.lit(w) for w in _plane_weights(p)])
    weighted = F.aggregate(
        F.zip_with(vec, w_lit, lambda x, w: F.when(w == 1, x).otherwise(-x)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(weighted >= 0, F.lit(1)).otherwise(F.lit(0))


def _plane_sign_sql(tbl: str, p: int) -> str:
    return (
        f"(CASE WHEN list_sum(list_transform(generate_series(1, {_DIM}), "
        f"i -> CASE WHEN instr('0123456789abcdef', "
        f"substr(md5('p{p}d' || CAST(i AS VARCHAR)), 1, 1)) % 2 = 1 "
        f"THEN CAST({tbl}.embedding[i] AS DOUBLE) "
        f"ELSE -CAST({tbl}.embedding[i] AS DOUBLE) END)) >= 0 THEN 1 ELSE 0 END)"
    )


def _bucket_sql(tbl: str) -> str:
    return " || ".join(f"CAST({_plane_sign_sql(tbl, p)} AS VARCHAR)" for p in range(_N_PLANES))


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
        FROM embeddings
    )
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           {_DOT_SQL_T.format(dim=_DIM, a='x.embedding', b='y.embedding')}
             / ({_norm_sql('x')} * {_norm_sql('y')}) AS cosine
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {_DOT_SQL_T.format(dim=_DIM, a='x.embedding', b='y.embedding')}
             / ({_norm_sql('x')} * {_norm_sql('y')}) >= 0.4
    """,
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed similarity: 8 deterministic hyperplane signs
    → 8-bit bucket key → equi-join within buckets → exact cosine gate.

    The scale path for all-pairs similarity: candidate pairs are
    bucket-local (expected bucket size n/256), the join shuffles on
    the bucket key, and the exact cosine verifies candidates — the
    same candidate-generation/verification split as MinHash-LSH.
    Hyperplane weights derive from md5(plane, dim) parity — fully
    deterministic and portable to the DuckDB oracle.
    """
    b = _lsh_bucketed_corpus(spark, sf_dir)
    x = b.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"),
        F.col("norm").alias("norm_a"), "bucket",
    )
    y = b.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"),
        F.col("norm").alias("norm_b"), "bucket",
    )
    return (
        x.join(y, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.try_divide(_dot(F.col("v_a"), F.col("v_b")), F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("cosine") >= 0.4)
        .select("vec_a", "vec_b", "cosine")
    )


@register(
    "emb_label_centroids",
    oracle=f"""
    SELECT label,
           count(*) AS n,
           CAST(round(avg(CAST(embedding[1] AS DOUBLE)), 10) AS DOUBLE) AS dim1_mean_r10
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "agg"),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label counts + first-dimension mean (rounded to 10 dp: the
    mean over doubles is summation-order-dependent across engines, so
    the comparable surface is the rounded value; counts stay exact).
    Representative of centroid computation (k-means/IVF training):
    one partial+final aggregation, no shuffle of raw vectors.
    """
    emb = tables(spark, sf_dir)["embeddings"]
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.element_at(_vec_double(), 1)), 10).alias("dim1_mean_r10"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cluster-scale candidate-generation path
# ---------------------------------------------------------------------------

_N_CELLS = 16
_N_PROBE = 4

_IVF_ORACLE = f"""
    WITH cents AS (
        SELECT vec_id AS cell, embedding AS cv FROM embeddings
        WHERE vec_id < {_N_CELLS}
    ),
    scored_cells AS (
        SELECT e.vec_id, c.cell, e.embedding,
               {_DOT_SQL_T.format(dim=_DIM, a='e.embedding', b='c.cv')}
                 / ({_norm_sql('e')} *
                    sqrt({_DOT_SQL_T.format(dim=_DIM, a='c.cv', b='c.cv')})) AS ccos
        FROM embeddings e CROSS JOIN cents c
    ),
    assign AS (
        SELECT vec_id, cell, embedding FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cell) AS rn
            FROM scored_cells) WHERE rn = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, cell, embedding AS qv FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, cell) AS rn
            FROM scored_cells WHERE vec_id < {_N_QUERIES})
        WHERE rn <= {_N_PROBE}
    ),
    cand AS (
        SELECT q.query_id, a.vec_id AS neighbor_id,
               {_DOT_SQL_T.format(dim=_DIM, a='q.qv', b='a.embedding')}
                 / (sqrt({_DOT_SQL_T.format(dim=_DIM, a='q.qv', b='q.qv')})
                    * sqrt({_DOT_SQL_T.format(dim=_DIM, a='a.embedding', b='a.embedding')}))
                 AS cosine
        FROM qprobe q JOIN assign a ON q.cell = a.cell
                                   AND a.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM cand)
    WHERE rn <= {_TOP_K}
"""


@register(
    "ann_ivf_recall",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
    full_rank AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     {_DOT_SQL_T.format(dim=_DIM, a='q.embedding', b='e.embedding')}
                       / ({_norm_sql('q')} * {_norm_sql('e')}) DESC,
                     e.vec_id) AS rn
            FROM q JOIN embeddings e ON e.vec_id <> q.vec_id)
        WHERE rn <= {_TOP_K}
    )
    SELECT f.query_id, CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(count(t.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_at_k
    FROM full_rank f
    LEFT JOIN (SELECT query_id, neighbor_id FROM ({_IVF_ORACLE})) t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
    tags=("similarity", "ann", "ivf", "eval"),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_TOP_K} of the IVF-probe index against exact brute
    force — the index-quality measurement that decides nprobe/ncells
    before a pipeline trusts the approximate path (FAISS's standard
    eval loop).  Composes ann_ivf_probe's top-k with the exact ranking
    from the one shared cosine stem; per query, the overlap count and
    recall fraction.  Everything exact: both rankings tiebreak on
    neighbor_id and every cosine is the ascending-k fold.
    """
    full = _exact_topk(spark, sf_dir)
    ivf = ann_ivf_probe(spark, sf_dir).select(
        F.col("query_id").alias("iq"), F.col("neighbor_id").alias("inb")
    )
    return (
        full.join(
            ivf,
            (F.col("iq") == F.col("query_id")) & (F.col("inb") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("inb").alias("n_overlap"),
            (F.count("inb").cast("double") / _TOP_K).alias("recall_at_k"),
        )
    )


# shared SQL fragments for the LSH recall evals — the exactness-
# critical ranking/tail text exists ONCE so a tiebreak or TOP_K
# change moves both oracles together (same single-copy rule as
# _scored_query_pairs on the Spark side)
_LSH_B_Q_CTES = f"""b AS (
        SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id < {_N_QUERIES})"""

_LSH_RANKED_TOPK_SQL = (
    "SELECT query_id, neighbor_id FROM (\n"
    "            SELECT {q}.vec_id AS query_id, e.vec_id AS neighbor_id,\n"
    "                   row_number() OVER (PARTITION BY {q}.vec_id ORDER BY\n"
    f"                     {{dot}}\n"
    f"                       / ({{qn}} * {_norm_sql('e')}) DESC,\n"
    "                     e.vec_id) AS rn\n"
    "            FROM {frm})\n"
    f"        WHERE rn <= {_TOP_K}"
)


def _lsh_topk_cte(q: str, frm: str) -> str:
    return _LSH_RANKED_TOPK_SQL.format(
        q=q,
        frm=frm,
        dot=_DOT_SQL_T.format(dim=_DIM, a=f"{q}.embedding", b="e.embedding"),
        qn=_norm_sql(q),
    )


_LSH_RECALL_TAIL_SQL = f"""SELECT f.query_id, CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
           CAST(count(t.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_at_k
    FROM full_rank f
    LEFT JOIN lsh t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id"""


@register(
    "ann_lsh_recall",
    oracle=f"""
    WITH {_LSH_B_Q_CTES},
    lsh AS (
        {_lsh_topk_cte('q', 'q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id')}
    ),
    full_rank AS (
        {_lsh_topk_cte('q', 'q JOIN embeddings e ON e.vec_id <> q.vec_id')}
    )
    {_LSH_RECALL_TAIL_SQL}
    """,
    tags=("similarity", "ann", "lsh", "eval"),
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_TOP_K} of single-probe sign-LSH top-k against exact
    brute force — the companion eval ann_ivf_recall has for IVF
    (verdict r3 item 6): per query, rank only the query's own-bucket
    candidates by exact cosine, take top-{_TOP_K}, and count overlap
    with the exact top-{_TOP_K} from the shared cosine stem.  A
    sub-1.0 recall here IS the measurement: it quantifies what one
    8-plane bucket probe loses, the number that decides bands/probes
    before trusting the approximate path at 100 TB.

    Scale: the exact side is brute force over the BOUNDED query set
    only (that is the eval, same boundary as ann_ivf_recall); the LSH
    side broadcasts the bounded query rows onto the bucket-keyed
    corpus scan — no corpus-side broadcast, no all-pairs join.
    Determinism: both rankings use the ascending-k cosine fold and
    tiebreak (cosine DESC, neighbor_id ASC).
    """
    b = _lsh_bucketed_corpus(spark, sf_dir)
    q = b.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"), "bucket",
    )
    return _overlap_vs_exact(
        _exact_topk(spark, sf_dir), _lsh_topk_ids(_lsh_scored_candidates(b, q))
    )


def _exact_topk_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{_TOP_K} (query_id, neighbor_id, cosine, rn)
    off the shared scoring stem, MEMOIZED per session+corpus
    (localCheckpoint; {_N_QUERIES}×{_TOP_K} rows) — the ground truth
    of every cosine recall eval AND ann_topk_bruteforce's output:
    without the memo each of the four consumers re-ran the
    query×corpus cosine scan (the _L2_TRUTH_MEMO discipline)."""
    tk = (spark.sparkContext.applicationId, sf_dir)
    memo = _COSINE_TOPK_MEMO.get(tk)
    if memo is not None:
        return memo
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    out = (
        _scored_query_pairs(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
        .localCheckpoint(eager=False)
    )
    _COSINE_TOPK_MEMO[tk] = out
    return out


def _exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{_TOP_K} (query_id, neighbor_id) — the id projection
    of the memoized _exact_topk_full stem."""
    return _exact_topk_full(spark, sf_dir).select("query_id", "neighbor_id")


def _lsh_scored_candidates(b: DataFrame, probes: DataFrame) -> DataFrame:
    """Bucket-join the (bounded, broadcast) probe table onto the
    LSH-keyed corpus and score candidates by exact cosine."""
    return (
        b.join(F.broadcast(probes), ["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.try_divide(_dot(F.col("qv"), F.col("v")), F.col("qnorm") * F.col("norm")),
        )
    )


def _lsh_topk_ids(cand: DataFrame) -> DataFrame:
    """Approximate top-{_TOP_K} ids (lq, lnb) from scored candidates
    — same (cosine DESC, id ASC) tiebreak as the exact side."""
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select(F.col("query_id").alias("lq"), F.col("vec_id").alias("lnb"))
    )


def _overlap_vs_exact(full: DataFrame, approx: DataFrame, k: int = _TOP_K) -> DataFrame:
    """recall@k tail shared by the ANN evals: per query, how many of
    the exact top-k (``full``: query_id, neighbor_id) the approximate
    top-k (``approx``: lq, lnb) recovered."""
    return (
        full.join(
            approx,
            (F.col("lq") == F.col("query_id")) & (F.col("lnb") == F.col("neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("lnb").alias("n_overlap"),
            (F.count("lnb").cast("double") / k).alias("recall_at_k"),
        )
    )


def _lsh_bucketed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, norm, bucket) — the sign-LSH-keyed corpus shared by
    the bucketed join and both recall evals."""
    from adt_spark.context import spread

    emb = spread(tables(spark, sf_dir)["embeddings"])
    v = _vec_double()
    bucket = F.concat_ws(
        "", *[_plane_sign_expr(v, p).cast("string") for p in range(_N_PLANES)]
    )
    return emb.select(
        "vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("norm"), bucket.alias("bucket")
    )


def _flip_bit(bucket, p: int):
    """The 8-char '0'/'1' bucket string with 1-based position p
    flipped — a Hamming-1 neighbor bucket."""
    return F.concat(
        F.substring(bucket, 1, p - 1),
        F.when(F.substring(bucket, p, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring(bucket, p + 1, _N_PLANES),
    )


_MP_FLIP_SQL = (
    "CASE WHEN u.p = 0 THEN q.bucket ELSE "
    "substr(q.bucket, 1, u.p - 1) || "
    "(CASE WHEN substr(q.bucket, u.p, 1) = '1' THEN '0' ELSE '1' END) || "
    "substr(q.bucket, u.p + 1) END"
)


@register(
    "ann_lsh_multiprobe_recall",
    oracle=f"""
    WITH {_LSH_B_Q_CTES},
    probes AS (
        SELECT q.vec_id, q.embedding, {_MP_FLIP_SQL} AS bucket
        FROM q, unnest(generate_series(0, {_N_PLANES})) AS u(p)
    ),
    lsh AS (
        {_lsh_topk_cte('q', 'probes q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id')}
    ),
    full_rank AS (
        {_lsh_topk_cte('q', 'q JOIN embeddings e ON e.vec_id <> q.vec_id')}
    )
    {_LSH_RECALL_TAIL_SQL}
    """,
    tags=("similarity", "ann", "lsh", "eval"),
)
def ann_lsh_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_TOP_K} of MULTI-PROBE sign-LSH: each query probes its
    own bucket plus all {_N_PLANES} Hamming-1 neighbor buckets (flip
    one plane sign — the standard multi-probe LSH trick, Lv et al.
    2007, public), directly comparable with single-probe
    ``ann_lsh_recall``: the recall lift per extra probe is the number
    that tunes probes-vs-latency before a 100 TB rollout.

    Scale: candidates stay bucket-local — the probe table is the
    bounded query set × {_N_PLANES + 1} rows, broadcast onto the
    bucket-keyed corpus exactly like the single-probe eval; a corpus
    vector matches a query at most once (its one bucket is at most
    one of the query's nine distinct probes), so no pair dedup is
    needed.  Determinism: ascending-k cosine fold, (cosine DESC, id)
    tiebreaks, same as every ANN eval here.
    """
    b = _lsh_bucketed_corpus(spark, sf_dir)
    probes = b.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[_flip_bit(F.col("bucket"), p) for p in range(1, _N_PLANES + 1)],
            )
        ).alias("bucket"),
    )
    return _overlap_vs_exact(
        _exact_topk(spark, sf_dir), _lsh_topk_ids(_lsh_scored_candidates(b, probes))
    )


@register("ann_ivf_probe", oracle=_IVF_ORACLE, tags=("similarity", "ann", "ivf"))
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer (the first
    {_N_CELLS} vectors as cells — k-means init without the iterations,
    so the oracle is SQL-expressible) partitions the corpus into
    inverted lists; queries probe their {_N_PROBE} nearest cells and
    re-rank candidates by exact cosine.  This is deliberately the
    ANCHOR-quantizer teaching variant; the DEPLOYED trained-quantizer
    search is the IVFPQ family (ann_ivf_pq_topk and friends, re-keyed
    onto ann_ivf_train_cells' centroids in round 6 — the 'swap in
    trained centroids at deployment' promise, taken there).

    The 100 TB story: assignment is one broadcast pass over the corpus
    (centroids are tiny), the inverted lists are an equi-partitioned
    table keyed by cell — the probe join shuffles only on cell id, and
    per-query work is bounded by the probed lists' size instead of the
    corpus.  Swap the quantizer for trained k-means centroids at
    deployment; the plan shape is identical.

    Determinism: cosine folds are ascending-k (bit-identical to the
    oracle's list_sum); cell assignment and top-k tie-break on
    (score DESC, id ASC) — a total order.
    """
    from adt_spark.context import spread

    emb = spread(tables(spark, sf_dir)["embeddings"])
    v = _vec_double()
    base = emb.select("vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("norm"))
    cents = base.filter(F.col("vec_id") < _N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    scored_cells = base.join(F.broadcast(cents)).withColumn(
        "ccos", F.try_divide(_dot(F.col("v"), F.col("cv")), F.col("norm") * F.col("cnorm"))
    )
    w_cell = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    ranked = scored_cells.withColumn("rn", F.row_number().over(w_cell))
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cell", "v", "norm")
    qprobe = (
        ranked.filter((F.col("vec_id") < _N_QUERIES) & (F.col("rn") <= _N_PROBE))
        .select(F.col("vec_id").alias("query_id"), "cell",
                F.col("v").alias("qv"), F.col("norm").alias("qnorm"))
    )
    cand = (
        assign.alias("a")
        .join(F.broadcast(qprobe).alias("q"),
              (F.col("a.cell") == F.col("q.cell"))
              & (F.col("a.vec_id") != F.col("q.query_id")))
        .withColumn("cosine",
                    F.try_divide(_dot(F.col("q.qv"), F.col("a.v")),
                                 F.col("q.qnorm") * F.col("a.norm")))
        .select("query_id", F.col("a.vec_id").alias("neighbor_id"), "cosine")
    )
    w_k = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               greatest(
                   list_aggregate(embedding, 'max'),
                   -list_aggregate(embedding, 'min')
               ) AS max_abs
        FROM embeddings
    )
    SELECT vec_id,
           CAST(max_abs AS DOUBLE) AS scale,
           array_to_string(
               list_transform(
                   embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / CAST(max_abs AS DOUBLE) + 0.5) AS INT)
               ), ','
           ) AS q8_csv
    FROM s
    """,
    tags=("embedding", "quantize"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    feature-store compaction step (4 bytes → 1 byte per dim) before
    ANN index build or training-data export.

    Per-vector max-abs scaling, quantized as floor(x·127/s + 0.5) —
    floor of a double is bit-deterministic in every engine, unlike
    round()'s half-tie conventions.  Pure projection over array
    columns: zero shuffles, whole-stage codegen'd, scan-parallel.
    The int8 vector is emitted as a CSV string (corpus convention:
    scalar comparison surfaces only — array cells stringify
    differently across Arrow/non-Arrow pandas paths).
    """
    emb = tables(spark, sf_dir)["embeddings"]
    xd = lambda c: c.cast("double")  # noqa: E731
    max_abs = F.greatest(
        F.array_max(F.col("embedding")), -F.array_min(F.col("embedding"))
    )
    s = emb.select("vec_id", "embedding", max_abs.alias("max_abs"))
    return s.select(
        "vec_id",
        xd(F.col("max_abs")).alias("scale"),
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    F.try_divide(xd(x) * F.lit(127.0), xd(F.col("max_abs")))
                    + F.lit(0.5)
                ).cast("int"),
            ),
            ",",
        ).alias("q8_csv"),
    )


_KM_K = 4
_KM_DIM = 64


#: the one-Lloyd-iteration assignment as composable oracle CTEs —
#: shared by emb_kmeans_assign and dedup_semantic (SemDeDup)
_KM_CTES = f"""v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < {_KM_K}
    ), d1 AS (
      SELECT v.vec_id, c0.cid,
             list_reduce(list_transform(range({_KM_DIM}),
               i -> (vec[i+1]-cvec[i+1])*(vec[i+1]-cvec[i+1])), (a,b) -> a+b)
               AS dist
      FROM v CROSS JOIN c0
    ), a1 AS (
      SELECT vec_id, cid FROM d1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
    ), dims AS (
      SELECT a1.cid, r.i AS pos,
             CAST(floor(v.vec[r.i+1] * 1099511627776.0) AS HUGEINT) AS val
      FROM a1 JOIN v USING (vec_id) CROSS JOIN range({_KM_DIM}) r(i)
    ), sums AS (
      SELECT cid, pos,
             CAST(sum(val) AS DOUBLE) / (count(*) * 1099511627776.0) AS m
      FROM dims GROUP BY cid, pos
    ), c1 AS (
      SELECT cid, list(m ORDER BY pos) AS cvec FROM sums GROUP BY cid
    ), d2 AS (
      SELECT v.vec_id, c1.cid,
             list_reduce(list_transform(range({_KM_DIM}),
               i -> (vec[i+1]-cvec[i+1])*(vec[i+1]-cvec[i+1])), (a,b) -> a+b)
               AS dist
      FROM v CROSS JOIN c1
    ), km_assign AS (
      SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM d2
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
    )"""


@register(
    "emb_kmeans_assign",
    oracle=f"""
    WITH {_KM_CTES}
    SELECT vec_id, cluster_id FROM km_assign
    """,
    tags=("embedding", "kmeans", "iterative"),
)
def emb_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd (k-means) iteration over the embedding corpus:
    deterministic init (centroids = the k lowest vec_ids), assign →
    recompute means → reassign; output the final assignment.  The
    building block of embedding-space corpus curation (cluster-balanced
    sampling, semantic dedup, domain discovery).

    Cross-engine exactness for an *iterative float* algorithm — the
    hard case the correctness rules exist for:

    - distances fold left-to-right over ``zip_with`` (both engines
      reduce the 64-term sum in array order — no shuffle-order
      nondeterminism can enter a per-row fold);
    - centroid means accumulate in TIE-FREE FIXED POINT —
      floor(x·2⁴⁰) (exact power-of-two multiply, floor never ties —
      exactness rule 6: double→DECIMAL casts round HALF_UP on Spark
      vs HALF_EVEN on DuckDB and binary fractions DO tie) summed as
      exact integers, one double division at the boundary;
    - argmin tiebreaks on (dist, cid) via field-lexicographic struct
      min.

    Scale posture: centroids are k×dim — kilobytes at any corpus
    size — so they live in the plan as literals (the classic Lloyd's
    broadcast); assignment is a per-row expression, zero shuffle.  The
    only shuffles are the (cluster, dim)-keyed mean aggregations —
    k×dim groups, partial+final.  The driver holds exactly k×dim
    doubles per round (bounded; documented analog of the reference's
    zero iterative surface — DataFusion 48 has no iteration at all,
    SURVEY.md §2.B).
    """
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    cents = {k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _KM_K}
    cents1 = _km_mean_update(_km_assign(v, cents))
    return _km_assign(v, cents1).select("vec_id", "cluster_id")


def _argmin_cid_expr(vec_col, cents: dict[int, list[float]]):
    """struct-min argmin over centroid literals, (dist, cid) tiebreak
    — the exactness-critical Lloyd fold as a reusable Column (shared
    by _km_assign and the distributed-SemDeDup coarse-cell router)."""
    structs = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in cvec]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            F.lit(cid).cast("long").alias("cid"),
        )
        for cid, cvec in sorted(cents.items())
    ]
    return F.array_min(F.array(*structs)).getField("cid")


def _km_assign(v: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """Lloyd assignment column over (vec_id, vec) rows: struct-min
    argmin over centroid literals, (dist, cid) tiebreak — shared by
    emb_kmeans_assign and emb_kmeans_iter2 (one copy of the
    exactness-critical fold)."""
    return v.withColumn(
        "cluster_id", _argmin_cid_expr(F.col("vec"), cents)
    )


def _km_mean_update(assigned: DataFrame) -> dict[int, list[float]]:
    """One exact mean update: (cluster, dim)-keyed fixed-point means
    (floor(x·2⁴⁰) summed as DECIMAL(38,0), one double division at the
    boundary), collected as k×dim bounded driver state."""
    sums = (
        assigned.select("cluster_id", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("val") * 1099511627776.0).cast("decimal(38,0)"))
                .cast("double")
                / (F.count("*").cast("double") * 1099511627776.0)
            ).alias("m")
        )
    )
    cents: dict[int, list[float]] = {}
    for r in sums.collect():
        cents.setdefault(int(r.cluster_id), [0.0] * _KM_DIM)[r.pos] = r.m
    return cents


# ---------------------------------------------------------------------------
# Embedding norm statistics (corpus health check for vector columns)
# ---------------------------------------------------------------------------


@register(
    "emb_norm_stats",
    oracle=f"""
    WITH n AS (
      SELECT CAST(label AS BIGINT) AS label,
             {_DOT_SQL_T.format(dim=_DIM, a='embeddings.embedding', b='embeddings.embedding')}
               AS norm2
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           min(norm2) AS min_norm2,
           max(norm2) AS max_norm2
    FROM n GROUP BY label
    """,
    tags=("embeddings", "stats"),
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm-squared range over the embedding corpus — the
    standard sanity screen before similarity search (zero-norm or
    exploding-norm vectors break cosine math and flag upstream encoder
    bugs; per-label ranges localize which class of vectors drifted).

    Shape: norm^2 is a per-row left-to-right fold over the vector (JVM
    codegen, same accumulation order as DuckDB's list_sum, so doubles
    are bit-identical); the group-by is one partial+final aggregate on
    a ~cardinality(label) state — min/max/count are trivially
    decomposable, so 100 TB of vectors reduce map-side to one row per
    label per task.  No mean/variance here deliberately: a cross-row
    double sum is accumulation-order-dependent, which the exactness
    rules ban from oracle-checked outputs.
    """
    emb = tables(spark, sf_dir)["embeddings"]
    v = _vec_double()
    norm2 = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        emb.select(F.col("label").cast("long").alias("label"), norm2.alias("norm2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.min("norm2").alias("min_norm2"),
            F.max("norm2").alias("max_norm2"),
        )
    )


# ---------------------------------------------------------------------------
# Covariance / Gram-matrix block (PCA preparation)
# ---------------------------------------------------------------------------

#: Fixed-point quantization scale for cross-engine-exact covariance
#: sums.  2^40 (a power of two) multiplies doubles EXACTLY, and
#: floor() is tie-free — unlike double->DECIMAL(38,15) casts, whose
#: exact decimal-expansion ties at digit 16 Spark rounds HALF_UP but
#: DuckDB rounds HALF_EVEN (measured: 2^-16 casts differently).
_FP_SCALE = float(1 << 40)


@register(
    "emb_covariance",
    oracle=f"""
    WITH v AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ), p AS (
      SELECT a.i, b.j
      FROM generate_series(0, {_DIM - 1}) a(i), generate_series(0, {_DIM - 1}) b(j)
      WHERE b.j >= a.i
    ), sums AS (
      SELECT p.i, p.j,
             count(*) AS n,
             sum(CAST(floor(ve[p.i + 1] * ve[p.j + 1] * {_FP_SCALE!r}) AS BIGINT))
               AS sxy,
             sum(CAST(floor(ve[p.i + 1] * {_FP_SCALE!r}) AS BIGINT)) AS sx,
             sum(CAST(floor(ve[p.j + 1] * {_FP_SCALE!r}) AS BIGINT)) AS sy
      FROM v, p
      GROUP BY p.i, p.j
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           (CAST(sxy AS DOUBLE) / {_FP_SCALE!r}) / n
             - ((CAST(sx AS DOUBLE) / {_FP_SCALE!r}) / n)
               * ((CAST(sy AS DOUBLE) / {_FP_SCALE!r}) / n) AS cov
    FROM sums
    """,
    tags=("embeddings", "covariance", "pca"),
)
def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding corpus — the
    input to driver-side PCA (eigendecompose the dim x dim result;
    dim^2 is metadata-sized no matter how many rows feed it, the same
    legitimate driver boundary as k-means' k x dim centroids).

    Shape is the classic distributed Gram-matrix outer-product
    aggregation: each row explodes to its dim*(dim+1)/2 upper-triangle
    products, and the partial HashAggregate folds them MAP-SIDE into a
    fixed 2,080-row state per task — so the shuffle moves one matrix
    per task, never per row, at any corpus size.  (A mapInArrow numpy
    X^T X per partition would be faster per CPU but float accumulation
    order would break cross-engine exactness; at 100 TB you'd flip to
    it and accept tolerance-based verification.)

    Exactness via fixed-point quantization: each product is scaled by
    2^40 (exact — power-of-two multiply) and floored (tie-free, unlike
    double->decimal casts whose digit-16 expansion ties Spark rounds
    HALF_UP but DuckDB HALF_EVEN), making every sum an exact integer;
    the covariance is then a fixed chain of identical double ops.  The
    2^-40 (~9e-13) quantization is deliberate and documented — it buys
    bit-exact cross-engine verification for a statistic whose inputs
    are float32 (~1e-7 granular) to begin with.

    100 TB configuration: set ``ADT_COV_ARROW=1`` to switch to the
    mapInArrow fast path (_emb_covariance_arrow) — per-partition numpy
    XᵀX partials, dim² state per task, one tiny shuffle of
    (#partitions × 2,080) rows.  Same plan-scale shape, ~CPU-bound
    speedup; float accumulation order becomes partition-dependent, so
    verification is tolerance-based (test_covariance_arrow_agrees).
    The exact explode path stays the oracle-verified default.
    """
    import os

    if os.environ.get("ADT_COV_ARROW", "").lower() in ("1", "true"):
        return _emb_covariance_arrow(spark, sf_dir)
    return _emb_covariance_exact(spark, sf_dir)


def _emb_covariance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    from adt_spark.context import spread

    v = _vec_double()
    s = repr(_FP_SCALE)
    pairs = F.expr(
        f"flatten(transform(sequence(0, {_DIM - 1}), "
        f"i -> transform(sequence(i, {_DIM - 1}), "
        f"j -> struct(i AS i, j AS j, "
        f"floor(ve[i] * ve[j] * {s}) AS xy, "
        f"floor(ve[i] * {s}) AS x, floor(ve[j] * {s}) AS y))))"
    )
    exploded = (
        spread(emb)
        .select(v.alias("ve"))
        .select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.xy", "p.x", "p.y")
    )
    dec = "decimal(38,0)"  # exact integer sums; no int64 overflow at any n
    sums = exploded.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xy").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
    )
    scale = F.lit(_FP_SCALE)
    return sums.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        (
            (F.col("sxy").cast("double") / scale) / F.col("n")
            - ((F.col("sx").cast("double") / scale) / F.col("n"))
            * ((F.col("sy").cast("double") / scale) / F.col("n"))
        ).alias("cov"),
    )


def _emb_covariance_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow covariance: each Arrow batch folds to ONE partial
    (n, Σx vector, upper-triangle of XᵀX) with BLAS-backed numpy, so
    Python sees O(#batches) rows and the shuffle carries #partials ×
    2,080 tiny rows.  E[xy] − E[x]E[y] math identical to the exact
    path minus the fixed-point quantization — agreement is within
    float tolerance, not bit-exact (accumulation order varies with
    partitioning), which is the documented trade for the ~CPU-bound
    speedup at 100 TB."""
    import numpy as np
    import pyarrow as pa

    from adt_spark.context import spread

    dim = _DIM
    tri_i, tri_j = np.triu_indices(dim)
    out_schema = pa.schema(
        [
            pa.field("n", pa.int64()),
            pa.field("s", pa.list_(pa.float64())),
            pa.field("m", pa.list_(pa.float64())),
        ]
    )

    def partials(batches):
        for batch in batches:
            col = batch.column(0)
            flat = np.asarray(col.flatten(), dtype=np.float64)
            X = flat.reshape(len(col), dim)
            M = X.T @ X
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([len(X)], pa.int64()),
                    pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
                    pa.array([M[tri_i, tri_j].tolist()], pa.list_(pa.float64())),
                ],
                schema=out_schema,
            )

    emb = tables(spark, sf_dir)["embeddings"]
    src = spread(emb).select(_vec_double().alias("ve"))
    parts = src.mapInArrow(partials, schema="n long, s array<double>, m array<double>")
    # upper-triangle (i, j) index table as a plan literal; k is the
    # position of (i, j) in the flattened triangle
    pairs = F.expr(
        f"flatten(transform(sequence(0, {dim - 1}), "
        f"i -> transform(sequence(i, {dim - 1}), "
        f"j -> struct(i AS i, j AS j))))"
    )
    ex = (
        parts.select("n", "s", "m", F.posexplode(pairs).alias("k", "p"))
        .select(
            F.col("p.i").alias("i"),
            F.col("p.j").alias("j"),
            F.col("n"),
            F.expr("element_at(m, k + 1)").alias("xy"),
            F.expr("element_at(s, p.i + 1)").alias("x"),
            F.expr("element_at(s, p.j + 1)").alias("y"),
        )
    )
    sums = ex.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("xy").alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    return sums.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        (
            F.col("sxy") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
        ).alias("cov"),
    )


# ---------------------------------------------------------------------------
# Top principal component via fixed-step power iteration
# ---------------------------------------------------------------------------

_PI_ITERS = 12


def _oracle_cov_ctes() -> str:
    """The emb_covariance pipeline as oracle CTEs (`tri` = upper
    triangle), shared by the covariance and PCA oracles."""
    return f"""
    v0 AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ), p AS (
      SELECT a.i, b.j
      FROM generate_series(0, {_DIM - 1}) a(i), generate_series(0, {_DIM - 1}) b(j)
      WHERE b.j >= a.i
    ), sums AS (
      SELECT p.i, p.j, count(*) AS n,
             sum(CAST(floor(ve[p.i + 1] * ve[p.j + 1] * {_FP_SCALE!r}) AS BIGINT))
               AS sxy,
             sum(CAST(floor(ve[p.i + 1] * {_FP_SCALE!r}) AS BIGINT)) AS sx,
             sum(CAST(floor(ve[p.j + 1] * {_FP_SCALE!r}) AS BIGINT)) AS sy
      FROM v0, p GROUP BY p.i, p.j
    ), tri AS (
      SELECT i, j, (CAST(sxy AS DOUBLE) / {_FP_SCALE!r}) / n
             - ((CAST(sx AS DOUBLE) / {_FP_SCALE!r}) / n)
               * ((CAST(sy AS DOUBLE) / {_FP_SCALE!r}) / n) AS cov
      FROM sums
    )"""


@register(
    "emb_pca_power1",
    oracle=f"""
    WITH RECURSIVE {_oracle_cov_ctes()},
    full_m AS (
      SELECT i, j, cov FROM tri
      UNION ALL SELECT j AS i, i AS j, cov FROM tri WHERE i <> j
    ), rows_m AS (
      SELECT i, list(cov ORDER BY j) AS r FROM full_m GROUP BY i
    ), mat AS MATERIALIZED (
      SELECT list(r ORDER BY i) AS mm FROM rows_m
    ), pw(k, v) AS (
      SELECT 0, list_transform(generate_series(1, {_DIM}),
                               x -> CAST(0.125 AS DOUBLE))
      UNION ALL
      SELECT pw.k + 1,
             list_transform(generate_series(1, {_DIM}),
               i -> list_sum(list_transform(generate_series(1, {_DIM}),
                    j -> mat.mm[i][j] * pw.v[j])))
      FROM pw, mat WHERE pw.k < {_PI_ITERS}
    ), vf AS MATERIALIZED (
      SELECT list_transform(v,
               x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS v
      FROM pw WHERE k = {_PI_ITERS}
    )
    SELECT e.vec_id,
           list_sum(list_transform(generate_series(1, {_DIM}),
             j -> CAST(e.embedding[j] AS DOUBLE) * vf.v[j])) AS pc1
    FROM embeddings e, vf
    """,
    tags=("embeddings", "pca", "iterative"),
)
def emb_pca_power1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection of every embedding onto the corpus's top principal
    component, computed by 12 fixed power-iteration steps —
    an ITERATIVE algorithm verified value-hash-exact against a DuckDB
    recursive-CTE oracle (like emb_kmeans_assign, proving iterative
    numerics can be engineered cross-engine-exact, not just rows-only).

    Distribution boundary: the dim x dim covariance is aggregated
    distributed (emb_covariance's outer-product shape), then its 2,080
    cells — metadata-sized at ANY corpus size — collect to the driver,
    where the 12 matvec steps run in pure Python floats (CPython floats
    ARE IEEE doubles; left-to-right sums match DuckDB's in-order
    list_sum; sqrt is IEEE correctly-rounded, so the whole iteration is
    deterministic — unlike log/exp, which rule 6's family of gotchas
    bans).  The final component broadcasts back as 64 literals and the
    projection is a per-row zip_with fold: one distributed pass in, one
    distributed pass out, driver work O(dim^2) only.

    No per-step normalization: matvec is linear, so scaling commutes;
    normalizing once at the end is bit-identical on both sides and
    keeps the recursion one expression.  (12 steps of a ~0.016-norm
    matrix reach ~1e-43 — far above double underflow at 1e-308.)

    Sign convention: determined by the all-0.125 start vector (both
    engines), so the hash matches without a sign fixup.
    """
    cov_rows = _emb_covariance_exact(spark, sf_dir).collect()
    mm = [[0.0] * _DIM for _ in range(_DIM)]
    for r in cov_rows:
        mm[r.i][r.j] = r.cov
        mm[r.j][r.i] = r.cov
    v = [0.125] * _DIM
    for _ in range(_PI_ITERS):
        w = []
        for i in range(_DIM):
            s = 0.0
            for j in range(_DIM):
                s = s + mm[i][j] * v[j]
            w.append(s)
        v = w
    import math

    n2 = 0.0
    for y in v:
        n2 = n2 + y * y
    nrm = math.sqrt(n2)
    vf = [x / nrm for x in v]

    emb = tables(spark, sf_dir)["embeddings"]
    comp = F.array(*[F.lit(x) for x in vf])
    pc1 = F.aggregate(
        F.zip_with(_vec_double(), comp, lambda x, c: x * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select("vec_id", pc1.alias("pc1"))


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup): k-means cluster, then within-cluster cosine
# ---------------------------------------------------------------------------

#: within-cluster cosine threshold (matches dedup_embedding_cosine's
#: corpus-wide threshold so the planted near-dup pairs are the target)
_SEM_T = 0.45

#: vectors per within-cluster block — bounds any single scoring task
#: to a ≤ block×block cosine matrix even for a 100k+-vector cluster
#: (same sizing rationale as dedup._COS_BLOCK_ROWS; module-level so
#: tests can shrink it to force the multi-block path on small data)
_SEM_BLOCK_ROWS = 100_000

#: (applicationId, sf_dir, sem_k) → (materialized assignment⋈vector,
#: size map); sem_k = the ADT_SEM_K scale knob (0 = oracled default).
#: Release with clear_similarity_state() for long-lived sessions.
_SEM_ASSIGNED_MEMO: dict[tuple[str, str, int], tuple[DataFrame, dict]] = {}

#: (applicationId, sf_dir) → {vec_id: [double]} below the call-time bound
#: max(_KM_K, _PQ_K+_PQ_NQ, _N_CELLS) —
#: the ONE bounded driver collect behind every centroid/codebook/query
#: literal in this module (k-means seeds, PQ anchors, ADC queries, IVF
#: cells).  Each consumer previously ran its own filter+collect job;
#: at sf0.1 that was one extra ~0.5 s Spark job per ANN query, and the
#: rows are identical by construction (same _vec_double cast of the
#: same scan).  Bounded: bound × _DIM doubles — kilobytes at any
#: corpus size, the documented driver boundary.
_SMALL_VECS_MEMO: dict[tuple[str, str], dict[int, list[float]]] = {}

#: (applicationId, sf_dir, variant) → localCheckpointed PQ codes table.
#: "plain" (vec_id + 4 codes) is shared by ann_pq_adc_topk and — via
#: its call — ann_pq_recall; "cell" (plus the IVF cell) by
#: ann_ivf_pq_topk and ann_ivfpq_recall.  The encode projection is a
#: large codegen'd expression (16 cell-dot folds + 16 sub-argmins over
#: literal codebooks): compiling and running it once per session+corpus
#: instead of once per consuming query is the same discipline as
#: dedup._SHINGLE_MEMO (measured: the recall evals re-ran the whole
#: encode at bench time).
_CODES_MEMO: dict[tuple[str, str, str], DataFrame] = {}

#: same keys → the UN-checkpointed codes projection.  localCheckpoint
#: wraps the plan immediately (even eager=False), so the memoized copy
#: prints as Scan ExistingRDD — plan-shape tests assert the fused
#: zero-join encode on THIS builder instead.
_CODES_PLAN: dict[tuple[str, str, str], DataFrame] = {}

#: (applicationId, sf_dir) → localCheckpointed exact squared-L2 top-k
#: (k rows per bounded query — tiny) shared by ann_pq_recall and
#: ann_ivfpq_recall.
_L2_TRUTH_MEMO: dict[tuple[str, str], DataFrame] = {}

#: (applicationId, sf_dir) → localCheckpointed exact cosine top-k
#: (query_id, neighbor_id, cosine, rn) — the shared ground truth of
#: the cosine recall evals and ann_topk_bruteforce's output.
_COSINE_TOPK_MEMO: dict[tuple[str, str], DataFrame] = {}

#: (applicationId, sf_dir) → trained PQ codebook {cid: full-dim vec}
#: (K×dim doubles — kilobytes of driver model state, the Lloyd
#: pattern) shared by every PQ encode/search/eval consumer.
_PQ_CB_MEMO: dict[tuple[str, str], dict[int, list[float]]] = {}


def _small_vecs(spark: SparkSession, sf_dir: str) -> dict[int, list[float]]:
    # the bound is computed at CALL time from the governing constants
    # (they are defined later in the module, and a hardcoded copy here
    # would fail silently through the consumers' `if k in small`
    # guards if any constant grew)
    n = max(_KM_K, _PQ_K + _PQ_NQ, _N_CELLS)
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _SMALL_VECS_MEMO.get(key)
    if memo is None:
        v = tables(spark, sf_dir)["embeddings"].select(
            "vec_id", _vec_double().alias("vec")
        )
        memo = {
            int(r.vec_id): list(r.vec)
            for r in v.filter(F.col("vec_id") < n).collect()
        }
        _SMALL_VECS_MEMO[key] = memo
    return memo


def clear_similarity_state() -> None:
    """Release memoized similarity intermediates (checkpoint blocks
    are reclaimed by the ContextCleaner once unreferenced)."""
    _COSINE_TOPK_MEMO.clear()
    _SEM_ASSIGNED_MEMO.clear()
    _SMALL_VECS_MEMO.clear()
    _CODES_MEMO.clear()
    _CODES_PLAN.clear()
    _L2_TRUTH_MEMO.clear()
    _PQ_CB_MEMO.clear()
    _IVF_CELLS_MEMO.clear()


#: largest ADT_SEM_K served by literal centroids: beyond this the
#: seeds collect (k×dim driver heap) and the k-struct argmin
#: expression (Janino codegen size — the same ceiling the PQ encode
#: kernel measured) both grow with k, so assignment switches to the
#: distributed coarse-cell path.
_SEM_K_LITERAL_MAX = 64

#: largest ADT_SEM_CELLS router served by C literal cell anchors:
#: past this the router itself would re-grow the plan with C×dim
#: literals (the same literal/Janino ceiling that capped k), so
#: routing switches to the TWO-LEVEL form — ≤64 literal SUPER-cells,
#: cells as a DataFrame, candidate arrays through equi-joins.  The
#: production contract C ≈ √(n·k) (SCALING.md v3 finding 6) makes
#: this the path that actually runs at corpus scale.
_SEM_CELLS_LITERAL_MAX = 64


def _l2_sq(a, b):
    """Squared-L2 fold between two array columns — zip_with product
    + left-fold sum, the exactness-critical order every argmin in
    this module shares (literal and data-array forms alike)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_over_array(vec_col, arr_col, id_field: str, vec_field: str):
    """(dist, cid) struct-min argmin over a DATA array of candidate
    (id, vec) structs — the distributed-router twin of
    ``_argmin_cid_expr``: identical fold order and tiebreak, but the
    candidates arrive as column DATA through a join instead of plan
    literals, so plan size and codegen are independent of the
    candidate count."""
    return F.array_min(
        F.transform(
            arr_col,
            lambda c: F.struct(
                _l2_sq(vec_col, c[vec_field]).alias("dist"),
                c[id_field].cast("long").alias("cid"),
            ),
        )
    ).getField("cid")


def _sem_assign_two_level(
    spark: SparkSession,
    emb: DataFrame,
    sem_k: int,
    n_cells: int,
) -> DataFrame:
    """Distributed SemDeDup assignment with a DISTRIBUTED router
    (round-8 verdict item 1): at production C ≈ √(n·k) the round-8
    router's C×dim cell-anchor literals hit the same plan/codegen
    wall the PQ kernel measured, so the router becomes two-level —
    the classic IVF-HNSW-free hierarchy (S ≈ √C literal SUPER-cells,
    cells as a DataFrame):

    1. the C cell anchors stay a DATAFRAME; each cell routes to its
       nearest super-cell via an S-literal argmin (S ≤ 64, constant);
    2. centroids route super-cell → cell through a scell equi-join
       carrying the cell-candidate ARRAY (one row per scell), then a
       data-array argmin — never a C-literal expression;
    3. vectors route the same way over the CENTROID-OCCUPIED cells
       only (the ≥1-candidate guarantee, now via a semi-join instead
       of a collected cell list), then meet their cell's centroid
       array in one final equi-join + data-array argmin.

    Distance evals per vector: S + |cells in scell| + |cents in
    cell| ≈ 2√C + k/C — the textbook two-level IVF cost, reached
    with ZERO corpus shuffles (the vector side only broadcast/hash
    JOINS against metadata-sized tables and computes argmins in
    projections; no groupBy on vec_id).  Driver state: S×dim super
    anchors + two ≤S used-scell int lists — bounded regardless of
    BOTH k and C (machine-checked flat-in-C, tests/test_plans.py).
    Tiebreaks and fold order are identical to the literal path, so
    a run whose candidate geometry happens to coincide is
    bit-identical.
    """
    # S is PINNED at the literal cap (not √C): two-level mode only
    # runs past C = 64, where √C optimality and the cap coincide
    # within a small factor, and a constant S makes the plan EXACTLY
    # flat in C (the machine-checked contract) instead of √C-creeping
    # toward the cap
    n_super = _SEM_CELLS_LITERAL_MAX
    supers = {
        int(r.vec_id): list(r.vec)
        for r in emb.filter(F.col("vec_id") < n_super).collect()
    }
    cells = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("vec").alias("cellvec")
    )
    cells_routed = cells.withColumn(
        "scell", _argmin_cid_expr(F.col("cellvec"), supers)
    ).localCheckpoint(eager=False)
    used_s = sorted(
        r.scell for r in cells_routed.select("scell").distinct().collect()
    )
    scell_cells = cells_routed.groupBy("scell").agg(
        F.collect_list(F.struct("cell_id", "cellvec")).alias("cand_cells")
    )

    seeds = emb.filter(F.col("vec_id") < sem_k).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )

    def assign(cents: DataFrame) -> DataFrame:
        routed = (
            cents.withColumn(
                "scell",
                _argmin_cid_expr(F.col("cvec"), {s: supers[s] for s in used_s}),
            )
            .join(scell_cells, "scell")
            .select(
                "cid",
                "cvec",
                _argmin_over_array(
                    F.col("cvec"), F.col("cand_cells"), "cell_id", "cellvec"
                ).alias("cell"),
            )
            .localCheckpoint(eager=False)
        )
        cands = routed.groupBy("cell").agg(
            F.collect_list(F.struct("cid", "cvec")).alias("cands")
        )
        used_cells = cells_routed.join(
            routed.select(F.col("cell").alias("cell_id")).distinct(),
            "cell_id",
            "semi",
        )
        used_s2 = sorted(
            r.scell for r in used_cells.select("scell").distinct().collect()
        )
        used_scell_cells = used_cells.groupBy("scell").agg(
            F.collect_list(F.struct("cell_id", "cellvec")).alias("cand_cells")
        )
        v = (
            emb.withColumn(
                "scell",
                _argmin_cid_expr(F.col("vec"), {s: supers[s] for s in used_s2}),
            )
            .join(used_scell_cells, "scell")
            .select(
                "vec_id",
                "vec",
                _argmin_over_array(
                    F.col("vec"), F.col("cand_cells"), "cell_id", "cellvec"
                ).alias("cell"),
            )
        )
        return v.join(cands, "cell").select(
            "vec_id",
            _argmin_over_array(
                F.col("vec"), F.col("cands"), "cid", "cvec"
            ).alias("cluster_id"),
        )

    a1 = assign(seeds)
    c1 = (
        a1.join(emb, "vec_id")
        .select("cluster_id", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("val") * 1099511627776.0).cast("decimal(38,0)"))
                .cast("double")
                / (F.count("*").cast("double") * 1099511627776.0)
            ).alias("m")
        )
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
        .select(F.col("cluster_id").alias("cid"), "cvec")
    )
    return assign(c1)


def _sem_assign_distributed(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame,
    sem_k: int,
    n_cells: int | None = None,
) -> DataFrame:
    """Distributed one-Lloyd SemDeDup assignment for production k
    (round-7 verdict item 3 / SCALING.md note 1): the k seed
    centroids live as a DATAFRAME — never collected — and candidate
    generation is an EQUI-JOIN on a coarse routing cell, the
    FAISS-IVF shape SemDeDup's own pipeline uses at scale (Abbas et
    al. 2023 §2 cluster with faiss; reference has no iterative
    surface at all — DataFusion 48, SURVEY.md §2.B).

    Geometry: centroids and vectors each route to their nearest
    coarse cell (L2 argmin over CONSTANT-size cell-anchor literals —
    the one piece of driver state, independent of k); vectors route
    over the NON-EMPTY cells only (a ≤C-int collect), so every
    vector meets ≥1 candidate centroid; the final argmin is a
    per-vector min over the (dist, cid) struct — the same tie-free
    tiebreak as the literal path.  Assignment is cell-CONFINED (a
    vector is never compared to a centroid routed elsewhere): the
    standard IVF nprobe=1 approximation, which is genuinely
    different — and at production k, the only scalable — SemDeDup
    clustering semantics.

    Scale shape: two cell-keyed equi-joins (candidates ∝ n·k/C per
    Lloyd half-step; Catalyst picks broadcast vs shuffle-hash for
    the k-row side) + one (cluster, dim)-keyed fixed-point mean
    aggregate.  C defaults to the trained IVF quantizer
    (_N_CELLS literals); ADT_SEM_CELLS widens the router — C is the
    join's key cardinality, so production sizing is C ≈ √(n·k)
    (IVF's rule) to keep per-cell candidate lists and join-key skew
    bounded.  Driver state: C×dim router literals + a ≤C-int
    non-empty-cell list + nothing else — BOUNDED REGARDLESS OF k
    (machine-checked: plan size flat in k, tests/test_plans.py).

    Router width: literal cell anchors serve C ≤
    ``_SEM_CELLS_LITERAL_MAX``; past that the router itself is
    distributed (``_sem_assign_two_level`` — ≤64 literal super-cells,
    cells as a DataFrame), so plan/driver state is bounded regardless
    of C as well (machine-checked flat-in-C).
    """
    import os

    if n_cells is None:
        n_cells = int(os.environ.get("ADT_SEM_CELLS", str(_N_CELLS)))
    if n_cells > _SEM_CELLS_LITERAL_MAX:
        # production router width: the C cell anchors themselves are
        # too many for plan literals — route through the two-level
        # distributed router (plan size flat in C)
        return _sem_assign_two_level(spark, emb, sem_k, n_cells)
    if n_cells == _N_CELLS:
        cells = _ivf_trained_cells(spark, sf_dir)
    else:
        # custom router width: raw first-C anchors (untrained — the
        # trained quantizer is memoized at _N_CELLS only); bounded
        # C×dim collect
        cells = {
            int(r.vec_id): list(r.vec)
            for r in emb.filter(F.col("vec_id") < n_cells).collect()
        }

    seeds = emb.filter(F.col("vec_id") < sem_k).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )

    def assign(cents: DataFrame) -> DataFrame:
        routed = cents.withColumn(
            "cell", _argmin_cid_expr(F.col("cvec"), cells)
        ).localCheckpoint(eager=False)
        # vectors route over NON-EMPTY cells only — guaranteed ≥1
        # candidate; the collect is ≤C ints (bounded by the router,
        # NOT by k)
        used = sorted(r.cell for r in routed.select("cell").distinct().collect())
        v = emb.withColumn(
            "cell", _argmin_cid_expr(F.col("vec"), {c: cells[c] for c in used})
        )
        dist = F.aggregate(
            F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            v.join(routed, "cell")
            .select(
                "vec_id",
                F.struct(dist.alias("dist"), F.col("cid").alias("cid")).alias("dc"),
            )
            .groupBy("vec_id")
            .agg(F.min("dc").alias("dc"))
            .select("vec_id", F.col("dc.cid").alias("cluster_id"))
        )

    a1 = assign(seeds)
    # distributed mean update: the (cluster, dim)-keyed fixed-point
    # means (_km_mean_update's exact recipe) REASSEMBLED as k
    # DataFrame rows instead of a k×dim driver collect
    c1 = (
        a1.join(emb, "vec_id")
        .select("cluster_id", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("val") * 1099511627776.0).cast("decimal(38,0)"))
                .cast("double")
                / (F.count("*").cast("double") * 1099511627776.0)
            ).alias("m")
        )
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
        .select(F.col("cluster_id").alias("cid"), "cvec")
    )
    return assign(c1)


def _sem_block_input(spark: SparkSession, sf_dir: str):
    """(assigned, both, multi_block): the k-means-joined corpus and
    the scorer's grouped input — every row tagged with its
    (cluster_id, i, j) block pair and side.  Factored out so tests can
    machine-check the per-task bound (rows per group ≤ the two blocks'
    sizes) directly on the DataFrame the Arrow scorer consumes.

    The per-cluster sizes are k rows (k-means k — metadata-sized by
    construction, same driver boundary as the centroids themselves),
    so they are COLLECTED and the block geometry is baked into the
    plan as literals: a map literal for nblk and a literal block-pair
    table, replacing two aggregate+broadcast-join stages.  When every
    cluster fits one block (``multi_block`` False — the common case
    once k is sized so clusters ≈ _SEM_BLOCK_ROWS), the input
    degenerates to one diagonal group per cluster with zero extra
    stages."""
    import math
    from itertools import chain

    import os

    # SCALE KNOB (measured, round-7 scaling probe): SemDeDup's pair
    # count is Σ cluster² — with the oracled fixture k (_KM_K = 4)
    # clusters grow WITH the corpus and the pair population is
    # effectively n²/k (measured 3.9 s → 58.5 s for 10× vectors,
    # SCALING.md).  The production contract is k ∝ n / target-cluster
    # size (SemDeDup's own recipe); ADT_SEM_K sets that k — same
    # deterministic first-k-seeds one-Lloyd-iteration recipe as
    # emb_kmeans_assign, k×dim bounded driver state.  The DEFAULT
    # (unset) keeps the oracled fixture clustering, so the registered
    # query's DuckDB parity is untouched; a different k is genuinely
    # different SemDeDup semantics (pairs confine to different
    # clusters), not a different answer to the same question.
    sem_k = int(os.environ.get("ADT_SEM_K", "0"))
    # router width participates in the memo key: the distributed path
    # reads it, and a key without it would silently serve a stale
    # assignment after ADT_SEM_CELLS changes (round-8 review finding 4)
    sem_cells = int(os.environ.get("ADT_SEM_CELLS", str(_N_CELLS)))

    # Session memo (same lifecycle discipline as dedup._SHINGLE_MEMO):
    # the Lloyd pass + vector join is the dominant cost and is
    # identical across calls, so the materialized checkpoint and the
    # k-row size map are computed once per (session, corpus, k).
    memo_key = (spark.sparkContext.applicationId, sf_dir, sem_k, sem_cells)
    memo = _SEM_ASSIGNED_MEMO.get(memo_key)
    if memo is not None:
        assigned, csz = memo
    else:
        emb = tables(spark, sf_dir)["embeddings"].select(
            "vec_id", _vec_double().alias("vec")
        )
        if sem_k > _SEM_K_LITERAL_MAX:
            # DISTRIBUTED path (round-7 verdict item 3): beyond the
            # literal ceiling the k×dim seeds collect and the
            # k-literal argmin expression both grow with k (driver
            # heap AND Janino codegen) — centroids stay a DataFrame
            # and assignment becomes a coarse-cell equi-join; driver
            # state is the constant-size cell router only.
            assign_df = _sem_assign_distributed(
                spark, sf_dir, emb, sem_k, n_cells=sem_cells
            )
        elif sem_k > 0:
            # ANY positive k takes the seeds path (round-7 ADVICE
            # item 3: values in 1.._KM_K were silently ignored); at
            # sem_k == _KM_K it degenerates to the fixture recipe
            # bit-for-bit (_small_vecs filtered at < _KM_K IS this
            # collect, and the two-assign pipeline is the same code)
            seeds = {
                int(r.vec_id): list(r.vec)
                for r in emb.filter(F.col("vec_id") < sem_k).collect()
            }  # bounded: sem_k × dim doubles — the Lloyd driver state
            assign_df = _km_assign(emb, _km_mean_update(_km_assign(emb, seeds))).select(
                "vec_id", "cluster_id"
            )
        else:
            assign_df = emb_kmeans_assign(spark, sf_dir)
        # Materialize (assignment ⋈ vector) ONCE: the block-pair
        # expansion references it on both sides, and without a barrier
        # the whole Lloyd pipeline (with its centroid collects) would
        # be re-planned per reference.
        assigned = (
            assign_df
            .join(emb, "vec_id")
            .localCheckpoint(eager=False)
        )
        csz = {
            r.cluster_id: r.cnt
            for r in assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        _SEM_ASSIGNED_MEMO[memo_key] = (assigned, csz)
    nblk = {c: max(1, math.ceil(n / _SEM_BLOCK_ROWS)) for c, n in csz.items()}
    multi_block = any(b > 1 for b in nblk.values())

    if not multi_block:
        both = assigned.select(
            "cluster_id",
            F.lit(0).alias("i"),
            F.lit(0).alias("j"),
            F.lit("a").alias("side"),
            "vec_id",
            "vec",
        )
        return assigned, both, False

    nblk_map = F.create_map(
        *chain.from_iterable((F.lit(c), F.lit(b)) for c, b in nblk.items())
    )
    bpairs = spark.createDataFrame(
        [
            (c, i, j)
            for c, b in nblk.items()
            for i in range(b)
            for j in range(i, b)
        ],
        "cluster_id long, i int, j int",
    )
    blocks = assigned.select(
        "cluster_id",
        "vec_id",
        "vec",
        (F.col("vec_id") % F.element_at(nblk_map, F.col("cluster_id")))
        .cast("int")
        .alias("blk"),
    )
    left = blocks.join(
        F.broadcast(bpairs),
        on=["cluster_id"],
    ).where(F.col("blk") == F.col("i")).select(
        "cluster_id", "i", "j", F.lit("a").alias("side"), "vec_id", "vec"
    )
    right = blocks.join(
        F.broadcast(bpairs.where(F.col("i") != F.col("j"))),
        on=["cluster_id"],
    ).where(F.col("blk") == F.col("j")).select(
        "cluster_id", "i", "j", F.lit("b").alias("side"), "vec_id", "vec"
    )
    return assigned, left.unionByName(right), True


@register(
    "dedup_semantic",
    oracle=f"""
    WITH {_KM_CTES},
    pairs AS (
      SELECT b.vec_id AS dropped
      FROM km_assign a
      JOIN km_assign b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      JOIN v av ON av.vec_id = a.vec_id
      JOIN v bv ON bv.vec_id = b.vec_id
      WHERE list_sum(list_transform(generate_series(1, {_DIM}),
                     i -> av.vec[i] * bv.vec[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
                     i -> av.vec[i] * av.vec[i])))
               * sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
                     i -> bv.vec[i] * bv.vec[i])))) >= {_SEM_T}
    )
    SELECT k.vec_id, k.cluster_id,
           k.vec_id NOT IN (SELECT dropped FROM pairs) AS is_kept
    FROM km_assign k
    """,
    tags=("dedup", "semantic", "embedding"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", public): cluster the embedding space with k-means,
    then drop every vector that has a LOWER-id near-twin (cosine >=
    {_SEM_T}) **within its cluster** — pairwise search confined to
    clusters is what makes semantic dedup tractable at corpus scale
    (candidate space is sum of cluster sizes squared, not corpus
    squared; k grows with the corpus so cluster size stays bounded).

    Composition: the cluster assignment IS emb_kmeans_assign (same
    deterministic Lloyd iteration, oracle-shared CTEs); within-cluster
    scoring reuses dedup_embedding_cosine's BLOCK-PAIR idiom *inside
    each cluster* (round-2 verdict fix — a single task per cluster
    held the full |cluster|² matrix, unbounded for data-dependent
    cluster sizes): each cluster splits into ceil(|cluster| /
    _SEM_BLOCK_ROWS) blocks by vec_id hash, the tiny per-cluster
    block-pair table broadcasts onto the vectors, and one Arrow task
    scores exactly one (cluster, block i, block j) pair — per-task
    memory is bounded by _SEM_BLOCK_ROWS regardless of cluster size.
    Sequential-k accumulation matches the oracle's list_sum fold
    order bit-for-bit, and a pair's cosine is identical under any
    blocking (each dot still sums dimensions in ascending k), so no
    tolerance is needed.  Keep/drop is a left join on the distinct
    dropped set.  Lower-id-wins needs no transitive closure — a
    vector is dropped iff ANY lower-id neighbor is within the
    threshold, exactly SemDeDup's keep-one-per-epsilon-ball rule with
    id as the ranking.
    """
    assigned, both, multi_block = _sem_block_input(spark, sf_dir)
    import numpy as np
    import pandas as pd

    def _block_cos(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        dots = np.zeros((len(A), len(B)))
        a_norms = np.zeros(len(A))
        b_norms = np.zeros(len(B))
        tmp = np.empty_like(dots)
        for k in range(A.shape[1]):  # sequential-k: list_sum fold order
            a_norms += A[:, k] * A[:, k]
            b_norms += B[:, k] * B[:, k]
            np.multiply(A[:, k][:, None], B[None, :, k], out=tmp)
            dots += tmp
        return dots / (np.sqrt(a_norms)[:, None] * np.sqrt(b_norms)[None, :])

    def drop_block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _cluster, i, j = key
        empty = pd.DataFrame({"vec_id": []}).astype({"vec_id": "int64"})
        a_pdf = pdf[pdf["side"] == "a"]
        if i == j:
            if len(a_pdf) < 2:
                return empty
            ids = a_pdf["vec_id"].to_numpy()
            A = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["vec"]])
            cos = _block_cos(A, A)
            mask = ((cos >= _SEM_T) & (ids[:, None] < ids[None, :])).any(axis=0)
            return pd.DataFrame({"vec_id": ids[mask]})
        b_pdf = pdf[pdf["side"] == "b"]
        if not len(a_pdf) or not len(b_pdf):
            return empty
        a_ids = a_pdf["vec_id"].to_numpy()
        b_ids = b_pdf["vec_id"].to_numpy()
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["vec"]])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["vec"]])
        cos = _block_cos(A, B)
        hit = cos >= _SEM_T
        # blocks are vec_id-disjoint: each cross pair appears once
        drop_b = (hit & (a_ids[:, None] < b_ids[None, :])).any(axis=0)
        drop_a = (hit & (b_ids[None, :] < a_ids[:, None])).any(axis=1)
        return pd.DataFrame(
            {"vec_id": np.concatenate([a_ids[drop_a], b_ids[drop_b]])}
        )

    dropped = both.groupBy("cluster_id", "i", "j").applyInPandas(
        drop_block_pair, schema="vec_id long"
    )
    if multi_block:
        # a vector can be dropped by several block pairs — the keep
        # join below needs one row per id (single-block clusters emit
        # each id at most once, so the extra shuffle is skipped there)
        dropped = dropped.distinct()
    dropped = dropped.withColumn("is_dropped", F.lit(True))
    return assigned.select("vec_id", "cluster_id").join(
        dropped, "vec_id", "left"
    ).select(
        "vec_id",
        "cluster_id",
        F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("is_kept"),
    )


@register(
    "emb_pca_top2",
    oracle=f"""
    WITH RECURSIVE {_oracle_cov_ctes()},
    full_m AS (
      SELECT i, j, cov FROM tri
      UNION ALL SELECT j AS i, i AS j, cov FROM tri WHERE i <> j
    ), rows_m AS (
      SELECT i, list(cov ORDER BY j) AS r FROM full_m GROUP BY i
    ), mat AS MATERIALIZED (
      SELECT list(r ORDER BY i) AS mm FROM rows_m
    ), pw(k, v) AS (
      SELECT 0, list_transform(generate_series(1, {_DIM}),
                               x -> CAST(0.125 AS DOUBLE))
      UNION ALL
      SELECT pw.k + 1,
             list_transform(generate_series(1, {_DIM}),
               i -> list_sum(list_transform(generate_series(1, {_DIM}),
                    j -> mat.mm[i][j] * pw.v[j])))
      FROM pw, mat WHERE pw.k < {_PI_ITERS}
    ), v1 AS MATERIALIZED (
      SELECT list_transform(v,
               x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS v
      FROM pw WHERE k = {_PI_ITERS}
    ), lam AS MATERIALIZED (
      SELECT list_sum(list_transform(generate_series(1, {_DIM}),
               i -> v1.v[i] * list_sum(list_transform(generate_series(1, {_DIM}),
                    j -> mat.mm[i][j] * v1.v[j])))) AS l1
      FROM v1, mat
    ), mat2 AS MATERIALIZED (
      SELECT list_transform(generate_series(1, {_DIM}),
               i -> list_transform(generate_series(1, {_DIM}),
                    j -> mat.mm[i][j] - lam.l1 * v1.v[i] * v1.v[j])) AS mm
      FROM mat, v1, lam
    ), pw2(k, v) AS (
      SELECT 0, list_transform(generate_series(1, {_DIM}),
                               x -> CAST(0.125 AS DOUBLE))
      UNION ALL
      SELECT pw2.k + 1,
             list_transform(generate_series(1, {_DIM}),
               i -> list_sum(list_transform(generate_series(1, {_DIM}),
                    j -> mat2.mm[i][j] * pw2.v[j])))
      FROM pw2, mat2 WHERE pw2.k < {_PI_ITERS}
    ), v2 AS (
      SELECT list_transform(v,
               x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS v
      FROM pw2 WHERE k = {_PI_ITERS}
    )
    SELECT e.vec_id,
           list_sum(list_transform(generate_series(1, {_DIM}),
             j -> CAST(e.embedding[j] AS DOUBLE) * v1.v[j])) AS pc1,
           list_sum(list_transform(generate_series(1, {_DIM}),
             j -> CAST(e.embedding[j] AS DOUBLE) * v2.v[j])) AS pc2
    FROM embeddings e, v1, v2
    """,
    tags=("embeddings", "pca", "iterative"),
)
def emb_pca_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D corpus map coordinates: every embedding projected onto the
    top TWO principal components — PC2 obtained by Hotelling
    deflation (M' = M − λ1·v1·v1ᵀ, λ1 the Rayleigh quotient) followed
    by a second 12-step power iteration.  The workhorse behind corpus
    visualization / drift dashboards ("where did this crawl land in
    embedding space?").

    Same exactness regime as emb_pca_power1, now across a multi-stage
    derivation: every matvec/Rayleigh/deflation value is a fixed
    chain of IEEE double ops in identical order on both engines
    (driver Python mirrors the oracle's nested list_sum folds
    term-for-term; sqrt correctly rounded; no transcendentals), so
    the two projections hash-match bit-for-bit.  Distribution
    boundary unchanged: one distributed covariance in, dim² driver
    math, one zero-shuffle projection pass out with both components
    as literal arrays.
    """
    cov_rows = _emb_covariance_exact(spark, sf_dir).collect()
    mm = [[0.0] * _DIM for _ in range(_DIM)]
    for r in cov_rows:
        mm[r.i][r.j] = r.cov
        mm[r.j][r.i] = r.cov

    import math

    def matvec(m, v):
        w = []
        for i in range(_DIM):
            s = 0.0
            for j in range(_DIM):
                s = s + m[i][j] * v[j]
            w.append(s)
        return w

    def power(m):
        v = [0.125] * _DIM
        for _ in range(_PI_ITERS):
            v = matvec(m, v)
        n2 = 0.0
        for y in v:
            n2 = n2 + y * y
        nrm = math.sqrt(n2)
        return [x / nrm for x in v]

    v1 = power(mm)
    w = matvec(mm, v1)
    lam1 = 0.0
    for i in range(_DIM):
        lam1 = lam1 + v1[i] * w[i]
    mm2 = [
        [mm[i][j] - lam1 * v1[i] * v1[j] for j in range(_DIM)] for i in range(_DIM)
    ]
    v2 = power(mm2)

    emb = tables(spark, sf_dir)["embeddings"]
    c1 = F.array(*[F.lit(x) for x in v1])
    c2 = F.array(*[F.lit(x) for x in v2])

    def proj(comp):
        return F.aggregate(
            F.zip_with(_vec_double(), comp, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return emb.select("vec_id", proj(c1).alias("pc1"), proj(c2).alias("pc2"))


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011 — the IVFPQ building block)
# ---------------------------------------------------------------------------

_PQ_M = 4          # subspaces
_PQ_SUB = 16       # dims per subspace (4 × 16 = 64)
#: centroids per subspace codebook.  32, not a token 4: at K=4 the
#: codebook saturates retrieval loss on this corpus and every recall
#: eval reads exactly 0.0 at sf0.001 AND sf0.01 (round-6 verdict item
#: 1 — a zero-recall eval cannot detect a regression in the quantizer
#: it exists to grade).  K=32 with the 8-query eval set puts
#: ann_pq_recall / ann_ivfpq_recall strictly inside (0,1) at both
#: test scales (measured: mean recall ≈ 0.175/0.175 PQ, 0.125/0.200
#: IVFPQ), and a deliberately collapsed codebook measurably drops to
#: 0.0 (tests/test_ann_recall_control.py negative control) — the eval is now
#: discriminative, matching Jégou 2011's reported recall@k curves
#: being interior points, never zeros.
_PQ_K = 32


#: PQ code derivation as composable oracle CTEs — shared by
#: emb_pq_train, emb_pq_assign and ann_pq_adc_topk.  ``cb`` is the
#: TRAINED codebook (Jégou 2011 §III runs per-subspace k-means): one
#: exact Lloyd iteration per subspace from the first-{_PQ_K} anchor
#: init — assign each sub-vector to its nearest anchor sub-vector,
#: recompute per-(subspace, centroid, dim) means in the tie-free
#: fixed point floor(x·2⁴⁰) (the _KM_CTES recipe), keep the anchor
#: value for any empty cell — re-concatenated to full-dim vectors so
#: every downstream CTE keeps its shape.
_PQ_CTES = f"""v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), cb0 AS (
      SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < {_PQ_K}
    ), pd AS (
      SELECT v.vec_id, m.i AS m, cb0.cid,
             list_reduce(list_transform(range({_PQ_SUB}),
               i -> (vec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])
                    * (vec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])),
               (a,b) -> a+b) AS dist
      FROM v CROSS JOIN range({_PQ_M}) m(i) CROSS JOIN cb0
    ), pa AS (
      SELECT vec_id, m, cid FROM pd
      QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) = 1
    ), pdim AS (
      SELECT pa.m, pa.cid, r.i AS pos,
             CAST(floor(v.vec[pa.m*{_PQ_SUB} + r.i + 1] * 1099511627776.0)
                  AS HUGEINT) AS val
      FROM pa JOIN v USING (vec_id) CROSS JOIN range({_PQ_SUB}) r(i)
    ), psum AS (
      SELECT m, cid, pos,
             CAST(sum(val) AS DOUBLE) / (count(*) * 1099511627776.0) AS val
      FROM pdim GROUP BY m, cid, pos
    ), pcell AS (
      SELECT mm.i AS m, cb0.cid, r.i AS pos,
             cb0.cvec[mm.i*{_PQ_SUB} + r.i + 1] AS aval
      FROM range({_PQ_M}) mm(i) CROSS JOIN cb0 CROSS JOIN range({_PQ_SUB}) r(i)
    ), cbt AS (
      SELECT pcell.m, pcell.cid, pcell.pos,
             coalesce(psum.val, pcell.aval) AS val
      FROM pcell LEFT JOIN psum
        ON psum.m = pcell.m AND psum.cid = pcell.cid AND psum.pos = pcell.pos
    ), cb AS (
      SELECT cid, list(val ORDER BY m, pos) AS cvec FROM cbt GROUP BY cid
    ), d AS (
      SELECT v.vec_id, m.i AS m, cb.cid,
             list_reduce(list_transform(range({_PQ_SUB}),
               i -> (vec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])
                    * (vec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])),
               (a,b) -> a+b) AS dist
      FROM v CROSS JOIN range({_PQ_M}) m(i) CROSS JOIN cb
    ), a AS (
      SELECT vec_id, m, cid, dist FROM d
      QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) = 1
    ), pq_codes AS (
      SELECT vec_id,
             max(CASE WHEN m = 0 THEN cid END) AS c0,
             max(CASE WHEN m = 1 THEN cid END) AS c1,
             max(CASE WHEN m = 2 THEN cid END) AS c2,
             max(CASE WHEN m = 3 THEN cid END) AS c3,
             max(CASE WHEN m = 0 THEN dist END) AS d0,
             max(CASE WHEN m = 1 THEN dist END) AS d1,
             max(CASE WHEN m = 2 THEN dist END) AS d2,
             max(CASE WHEN m = 3 THEN dist END) AS d3
      FROM a GROUP BY vec_id
    )"""


@register(
    "emb_pq_assign",
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT vec_id,
           CAST(c0 AS INT) AS code_0, CAST(c1 AS INT) AS code_1,
           CAST(c2 AS INT) AS code_2, CAST(c3 AS INT) AS code_3,
           d0 + d1 + d2 + d3 AS recon_err
    FROM pq_codes
    """,
    tags=("embedding", "pq", "quantization"),
)
def emb_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector
    into {M} subspaces of {SUB} dims and encode each subspace as its
    nearest codebook centroid — the compression behind FAISS IVFPQ
    (64 floats → {M} small codes).  The codebook is TRAINED
    (_pq_trained_codebooks: one per-subspace Lloyd iteration from the
    deterministic anchor init, Jégou 2011 §III) and lives in the same
    literal slot the anchor init used.

    Cross-engine exactness (the emb_kmeans_assign discipline):
    per-subspace distances fold left-to-right over the fixed 16-term
    array — no cross-row float reduction anywhere — argmin tiebreaks
    (dist, cid) via field-lexicographic struct min, and the
    reconstruction error adds the {M} subspace minima in fixed
    expression order.

    Scale shape: the codebook is M×K×{SUB} floats (kilobytes) living
    in the plan as literals; encoding is a pure per-row projection —
    ZERO shuffles at any corpus size, the defining property that makes
    PQ the 100 TB embedding-compression path.
    """
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    return _pq_encode(v, _pq_trained_codebooks(spark, sf_dir))


def _vec_np_batch(col, n: int) -> "np.ndarray":
    """Zero-copy an Arrow ``array<double>`` vector column into an
    (n × _DIM) float64 ndarray — the ingest step shared by the three
    Arrow kernels (_pq_encode, _ivf_encode, the PQ distortion eval).
    ``ListArray.flatten().to_numpy()`` reads the child value buffer
    in place (round-7 ADVICE item 4: the previous ``to_pylist()``
    round-tripped every element through Python objects, O(rows·dim)
    allocation on the kernels' only hot ingest path), and a NULL /
    ragged embedding raises with a named error instead of numpy's
    opaque object-dtype failure."""
    import numpy as np

    if col.null_count:
        raise ValueError(
            f"NULL embedding vector in Arrow batch ({col.null_count} of "
            f"{n} rows): the PQ/IVF kernels require a non-null vec — "
            "filter or impute upstream"
        )
    flat = col.flatten()
    if flat.null_count or len(flat) != n * _DIM:
        raise ValueError(
            f"ragged or NULL-element embedding in Arrow batch: expected "
            f"{n}×{_DIM} doubles, got {len(flat)} values with "
            f"{flat.null_count} nulls"
        )
    # PER-ROW lengths, not just the total: compensating ragged rows
    # (one short, one long) keep len(flat) == n·_DIM while shifting
    # every vector between them — the reshape would silently misalign
    # (round-8 review finding 2)
    lengths = col.value_lengths().to_numpy(zero_copy_only=False)
    if (lengths != _DIM).any():
        bad = int((lengths != _DIM).argmax())
        raise ValueError(
            f"ragged embedding in Arrow batch: row {bad} has "
            f"{int(lengths[bad])} elements, expected {_DIM}"
        )
    return flat.to_numpy(zero_copy_only=True).reshape(n, _DIM)


def _pq_np_codebooks(anchors: dict[int, list[float]]):
    """(ascending cid array, per-subspace (K × SUB) float64 codebook
    matrices) — the driver-side model state every Arrow PQ kernel
    closes over (kilobytes; the same literal-slot discipline the
    expression form used)."""
    import numpy as np

    cids = sorted(anchors)
    cbs = [
        np.asarray(
            [anchors[c][m * _PQ_SUB : (m + 1) * _PQ_SUB] for c in cids],
            dtype=np.float64,
        )
        for m in range(_PQ_M)
    ]
    return np.asarray(cids, dtype=np.int64), cbs


def _pq_np_min(vec: "np.ndarray", cbs, cid_arr):
    """Per-subspace (codes, min-distances) of a (n × DIM) float64
    block against the codebook matrices — the ONE numpy kernel behind
    every PQ encode/distortion path, with the module's exactness
    discipline replicated bit-for-bit: per-candidate distances are
    the ASCENDING-i elementwise fold of (x_i − c_i)² (sq[...,0] then
    += sq[...,i] — each elementwise add is the same double op in the
    same order as the 0.0-seeded SQL fold, since 0.0 + t == t
    exactly); the argmin is numpy's FIRST minimum, which over the
    ascending cid array is exactly the (dist, cid) struct-min
    tiebreak; recon_err adds the M subspace minima in fixed order."""
    import numpy as np

    n = vec.shape[0]
    codes, recon = [], None
    for m in range(_PQ_M):
        sub = vec[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
        diff = sub[:, None, :] - cbs[m][None, :, :]
        sq = diff * diff
        acc = sq[:, :, 0].copy()
        for i in range(1, _PQ_SUB):
            acc += sq[:, :, i]
        idx = acc.argmin(axis=1)
        codes.append(cid_arr[idx])
        d = acc[np.arange(n), idx]
        recon = d if recon is None else recon + d
    return codes, recon


def _pq_encode(
    v: DataFrame, anchors: dict[int, list[float]], extra: tuple[str, ...] = ()
) -> DataFrame:
    """Encode (vec_id, vec) rows against a PQ codebook — the shared
    kernel of emb_pq_assign (encoding), ann_pq_adc_topk (which
    searches the codes) and PQ codebook training (which carries the
    raw vector through via ``extra=("vec",)`` so assignment + the
    posexploded residual means stay one narrow stage of one scan).
    ann_ivf_pq_topk uses the sibling _ivf_encode, which fuses the
    coarse-cell argmax INTO this kernel's math so cell assignment +
    encoding are likewise one scan.

    This is the repo's SECOND documented Arrow seam (after
    dedup_semantic's block-cosine), and like the first it is measured,
    not assumed: at the round-7 discriminative operating point (K=32
    centroids × 4 subspaces — Jégou 2011-realistic, vs the saturated
    K=4) every JVM expression form fails structurally.  (a) zip_with /
    transform / aggregate lambdas never enter whole-stage codegen, so
    the ~4k-step-per-row encode runs INTERPRETED: measured 5-8 s per
    500-row execution.  (b) Inlining the arithmetic as one parsed
    array_min(named_struct…) expression exceeds Janino's 64 KB method
    limit — WSCG cannot split a single expression operating on local
    variables — so Spark burns ~20 s attempting compilation, logs
    "Code grows beyond 64 KB", and falls back to the same interpreter.
    The Arrow kernel is one narrow mapInArrow stage (zero shuffles,
    exactly the expression form's plan shape — plan-checked), the
    codebook rides in the closure (M×K×SUB doubles, kilobytes), and
    the numpy math replicates the oracle's fold order bit-for-bit
    (_pq_np_min).  Measured: 5-8 s → <0.5 s per encode at sf0.01.
    """
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    cid_arr, cbs = _pq_np_codebooks(anchors)
    names = ["vec_id", *extra]
    in_fields = {f.name: f for f in v.schema.fields}
    out_schema = StructType(
        [in_fields["vec_id"]]
        + [in_fields[c] for c in extra]
        + [StructField(f"code_{m}", IntegerType()) for m in range(_PQ_M)]
        + [StructField("recon_err", DoubleType())]
    )

    def encode(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            vec = _vec_np_batch(
                b.column(b.schema.get_field_index("vec")), b.num_rows
            )
            codes, recon = _pq_np_min(vec, cbs, cid_arr)
            arrays = [
                b.column(b.schema.get_field_index(c)) for c in names
            ] + [pa.array(c.astype(np.int32)) for c in codes] + [pa.array(recon)]
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=[*names, *[f"code_{m}" for m in range(_PQ_M)], "recon_err"],
            )

    cols = list(dict.fromkeys([*names, "vec"]))  # extra may BE "vec"
    return v.select(*cols).mapInArrow(encode, out_schema)


def _pq_train_sums(
    spark: SparkSession, sf_dir: str, anchors: dict[int, list[float]]
) -> DataFrame:
    """The distributed half of PQ training: per-(subspace, centroid,
    dim) fixed-point means of the sub-vectors assigned to each anchor
    — assignment is the fused zero-shuffle _pq_encode projection, and
    the ONLY shuffle is this (m, cid, pos)-keyed partial+final
    aggregate (plan-checked,
    test_plans.py::test_pq_train_single_shuffle_no_join)."""
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    enc = _pq_encode(v, anchors, extra=("vec",))
    codes_arr = F.array(*[F.col(f"code_{m}") for m in range(_PQ_M)])
    pe = enc.select(
        codes_arr.alias("codes"), F.posexplode("vec").alias("pos0", "val")
    )
    m_col = F.floor(F.col("pos0") / _PQ_SUB).cast("int")
    return (
        pe.select(
            m_col.alias("m"),
            F.element_at("codes", m_col + 1).alias("cid"),
            (F.col("pos0") % _PQ_SUB).alias("pos"),
            "val",
        )
        .groupBy("m", "cid", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("val") * 1099511627776.0).cast("decimal(38,0)"))
                .cast("double")
                / (F.count("*").cast("double") * 1099511627776.0)
            ).alias("val")
        )
    )


def _pq_trained_codebooks(spark: SparkSession, sf_dir: str) -> dict[int, list[float]]:
    """TRAIN the PQ codebooks (Jégou et al. 2011 §III: per-subspace
    k-means) — one exact Lloyd iteration per subspace from the
    deterministic first-{K} anchor init, so every PQ consumer encodes
    against learned sub-centroids instead of raw anchor slices
    (round-4 verdict item 6).  Returns {{cid: full-dim vector}} — the
    M per-subspace centroids of each cid re-concatenated, so the
    codebook drops into the exact literal slot the anchor init used.

    Exactness (the emb_kmeans_assign discipline, per subspace):
    assignment distances are in-order 16-term folds tiebroken
    (dist, cid); means accumulate in the tie-free fixed point
    floor(x·2⁴⁰) summed as DECIMAL(38,0) with one double division at
    the boundary; a cell with no assigned sub-vectors keeps its
    anchor value (oracle: the cbt COALESCE).

    Scale shape: assignment is the fused zero-shuffle _pq_encode
    projection; the only shuffle is the (m, cid, pos)-keyed mean
    aggregate — M×K×{SUB} groups, partial+final; driver state is
    K×dim doubles (kilobytes at any corpus size), memoized per
    session+corpus like the Lloyd centroids.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _PQ_CB_MEMO.get(key)
    if memo is not None:
        return memo
    anchors = {k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _PQ_K}
    cb = {cid: list(cv) for cid, cv in anchors.items()}  # empty-cell fill
    sums = _pq_train_sums(spark, sf_dir, anchors)
    for r in sums.collect():  # bounded: ≤ M×K×SUB rows (2048 doubles at K=32)
        cb[int(r.cid)][int(r.m) * _PQ_SUB + int(r.pos)] = float(r.val)
    _PQ_CB_MEMO[key] = cb
    return cb


@register(
    "emb_pq_train",
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT CAST(m AS INT) AS m, CAST(cid AS INT) AS cid,
           CAST(pos AS INT) AS pos, val
    FROM cbt
    """,
    tags=("embedding", "pq", "training", "iterative"),
)
def emb_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained PQ codebooks as a table — (subspace m, centroid
    cid, dim pos within the subspace, value): {_PQ_M}×{_PQ_K}×{_PQ_SUB}
    rows.  This is the model every PQ query (emb_pq_assign,
    ann_pq_adc_topk, ann_ivf_pq_topk and both recall evals) now
    encodes against; the oracle recomputes the identical per-subspace
    Lloyd iteration in SQL (the cbt CTE), so the training itself is
    oracle-gated, not just its consumers.
    """
    cb = _pq_trained_codebooks(spark, sf_dir)
    rows = [
        (m, cid, pos, cb[cid][m * _PQ_SUB + pos])
        for cid in sorted(cb)
        for m in range(_PQ_M)
        for pos in range(_PQ_SUB)
    ]
    return spark.createDataFrame(rows, "m int, cid int, pos int, val double")


#: ADC query count (vec_ids _PQ_K .. _PQ_K+_PQ_NQ-1).  8, not 2: the
#: recall denominator is _PQ_NQ × _PQ_TOPK = 40, fine-grained enough
#: that the eval's operating point sits strictly inside (0,1) at both
#: test scales (round-6 verdict item 1).
_PQ_NQ = 8
#: 10, not 5: at k=5 half the per-query recall rows still read 0.0 at
#: sf0.01; at k=10 the per-query values are interior almost
#: everywhere (measured: one 0.0 in 16 rows across both scales) and
#: the mean sits at 0.188 / 0.200 — per-query discriminative, not
#: just in aggregate.
_PQ_TOPK = 10

#: true squared-L2 top-k over the full vectors — the ground-truth CTE
#: shared by ann_pq_recall's and ann_ivfpq_recall's oracles (assumes
#: the _PQ_CTES ``v`` and a ``q(qid, qvec)`` CTE are in scope).
_TRUE_L2_TOPK_CTE = f"""exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, v.vec_id,
               list_reduce(list_transform(range({_DIM}),
                 i -> (qvec[i+1]-vec[i+1])*(qvec[i+1]-vec[i+1])),
                 (a,b) -> a+b) AS tdist
        FROM q CROSS JOIN v WHERE v.vec_id <> q.qid)
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY tdist, vec_id)
              <= {_PQ_TOPK}
    )"""


@register(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_CTES}, q AS (
      SELECT vec_id AS qid, vec AS qvec FROM v
      WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K + _PQ_NQ}
    ), lut AS (
      SELECT q.qid, m.i AS m, cb.cid,
             list_reduce(list_transform(range({_PQ_SUB}),
               i -> (qvec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])
                    * (qvec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])),
               (a,b) -> a+b) AS ld
      FROM q CROSS JOIN range({_PQ_M}) m(i) CROSS JOIN cb
    ), scored AS (
      SELECT q.qid, p.vec_id,
             l0.ld + l1.ld + l2.ld + l3.ld AS adist
      FROM pq_codes p CROSS JOIN q
      JOIN lut l0 ON l0.qid = q.qid AND l0.m = 0 AND l0.cid = p.c0
                 AND p.vec_id <> q.qid
      JOIN lut l1 ON l1.qid = q.qid AND l1.m = 1 AND l1.cid = p.c1
      JOIN lut l2 ON l2.qid = q.qid AND l2.m = 2 AND l2.cid = p.c2
      JOIN lut l3 ON l3.qid = q.qid AND l3.m = 3 AND l3.cid = p.c3
    )
    SELECT CAST(qid AS BIGINT) AS query_id, vec_id, adist
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
            <= {_PQ_TOPK}
    """,
    tags=("embedding", "pq", "adc", "ann"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k search over PQ codes (Jégou et al. 2011 asymmetric
    distance computation — FAISS's IVFPQ query path): per query,
    precompute a per-subspace lookup table of distances to each
    codebook centroid (M×K doubles), then score every encoded vector
    as FOUR table lookups + adds instead of a 64-dim distance — the
    compressed-domain scan that makes billion-vector search cheap.

    Cross-engine exactness: LUT entries are the same in-order 16-term
    folds as encoding (Python's left-to-right accumulation ==
    list_reduce's, since 0.0 + x == x exactly); the approximate
    distance adds the M lookups in fixed expression order; top-k
    tiebreaks (adist, vec_id).

    Scale shape: codes live distributed; the LUT is M×K×|queries|
    doubles embedded as literals (broadcast) — scoring is a pure
    per-row projection over the codes table, then a per-query
    WindowGroupLimit top-k.  ZERO joins and zero full-vector reads at
    query time; the corpus scan touches only the code columns.
    """
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    # the shared memoized collect serves the queries; the codebook is
    # the trained one (kilobytes of memoized driver model state)
    small = _small_vecs(spark, sf_dir)
    anchors = _pq_trained_codebooks(spark, sf_dir)
    queries = {k: small[k] for k in range(_PQ_K, _PQ_K + _PQ_NQ) if k in small}
    ck = (spark.sparkContext.applicationId, sf_dir, "plain")
    codes = _CODES_MEMO.get(ck)
    if codes is None:
        raw = _pq_encode(v, anchors).select(
            "vec_id", "code_0", "code_1", "code_2", "code_3"
        )
        _CODES_PLAN[ck] = raw
        codes = raw.localCheckpoint(eager=False)
        _CODES_MEMO[ck] = codes

    return _adc_topk(codes, anchors, queries)


def _adc_topk(
    codes: DataFrame,
    anchors: dict[int, list[float]],
    queries: dict[int, list[float]],
    k: int = _PQ_TOPK,
) -> DataFrame:
    """ADC scoring + per-query top-k over a (vec_id, code_0..3) table
    against the GIVEN codebook — the scoring kernel of
    ann_pq_adc_topk, factored out so the negative-control test
    (tests/test_ann_recall_control.py) can grade a deliberately
    degraded codebook through the IDENTICAL path the deployed search
    uses (round-6 verdict item 1: the eval must detect a quantizer
    regression, so the regression probe must share the scorer)."""

    def lut_entry(qvec: list[float], cvec: list[float], m: int) -> float:
        acc = 0.0
        for i in range(m * _PQ_SUB, (m + 1) * _PQ_SUB):
            d = qvec[i] - cvec[i]
            acc += d * d
        return acc

    # one scan over the codes emits every query's LUT sum per row (a
    # per-query union would re-run the PQ encoding once per query)
    qstructs = []
    for qid, qvec in sorted(queries.items()):
        adist = None
        for m in range(_PQ_M):
            # one parsed literal per (query, subspace) — K doubles
            lut = _dlit_array(
                [
                    lut_entry(qvec, cvec, m)
                    for _cid, cvec in sorted(anchors.items())
                ]
            )
            term = F.element_at(lut, F.col(f"code_{m}") + 1)
            adist = term if adist is None else adist + term
        qstructs.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                adist.alias("adist"),
            )
        )
    scored = (
        codes.select("vec_id", F.explode(F.array(*qstructs)).alias("qs"))
        .select(F.col("qs.query_id").alias("query_id"), "vec_id",
                F.col("qs.adist").alias("adist"))
        # self-exclusion: the module-wide ANN convention (every other
        # search op joins on vec_id <> qid); without it the recall
        # evals sharing _true_l2_topk would compare mismatched
        # conventions and cap at (k-1)/k
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy("adist", "vec_id")
    )
    return scored.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


@register(
    "ann_pq_recall",
    oracle=f"""
    WITH {_PQ_CTES}, q AS (
      SELECT vec_id AS qid, vec AS qvec FROM v
      WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K + _PQ_NQ}
    ), lut AS (
      SELECT q.qid, m.i AS m, cb.cid,
             list_reduce(list_transform(range({_PQ_SUB}),
               i -> (qvec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])
                    * (qvec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])),
               (a,b) -> a+b) AS ld
      FROM q CROSS JOIN range({_PQ_M}) m(i) CROSS JOIN cb
    ), scored AS (
      SELECT q.qid, p.vec_id,
             l0.ld + l1.ld + l2.ld + l3.ld AS adist
      FROM pq_codes p CROSS JOIN q
      JOIN lut l0 ON l0.qid = q.qid AND l0.m = 0 AND l0.cid = p.c0
                 AND p.vec_id <> q.qid
      JOIN lut l1 ON l1.qid = q.qid AND l1.m = 1 AND l1.cid = p.c1
      JOIN lut l2 ON l2.qid = q.qid AND l2.m = 2 AND l2.cid = p.c2
      JOIN lut l3 ON l3.qid = q.qid AND l3.m = 3 AND l3.cid = p.c3
    ), adc AS (
      SELECT qid, vec_id FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
              <= {_PQ_TOPK}
    ), {_TRUE_L2_TOPK_CTE}
    SELECT CAST(f.qid AS BIGINT) AS query_id,
           CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
           CAST(count(t.vec_id) AS DOUBLE) / {_PQ_TOPK} AS recall_at_k
    FROM exact f
    LEFT JOIN adc t ON t.qid = f.qid AND t.vec_id = f.vec_id
    GROUP BY f.qid
    """,
    tags=("embedding", "pq", "adc", "ann", "eval"),
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{_PQ_TOPK} of the compressed-domain ADC search against
    the TRUE squared-L2 top-k over the full vectors — the eval that
    tells you how much retrieval quality the 64-float → {_PQ_M}-code
    compression costs before you commit a 100 TB corpus to it
    (completes the eval family: IVF, LSH, multiprobe and matryoshka
    each have theirs).

    Cross-engine exactness: the true distance is the same in-order
    per-element (q_i − v_i)² fold both engines use for the codebook
    distances (0.0-seeded left fold == DuckDB's list_reduce);
    both rankings tiebreak (distance ASC, vec_id ASC); recall is an
    integer count over {_PQ_TOPK}.

    Scale shape: the ADC side is ann_pq_adc_topk's zero-join LUT scan
    over the code columns; the exact side scans full vectors once per
    bounded query (that brute-force scan IS the ground truth — an
    eval over a sampled query set, not a production query path); the
    overlap join carries k rows per query.  Nothing corpus-sized is
    broadcast or collected (the {_PQ_NQ} query vectors are the only
    driver-side rows).
    """
    adc = ann_pq_adc_topk(spark, sf_dir).select(
        F.col("query_id").alias("lq"), F.col("vec_id").alias("lnb")
    )
    return _overlap_vs_exact(_true_l2_topk(spark, sf_dir), adc, k=_PQ_TOPK)


def _true_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact squared-L2 top-k per bounded query over the full vectors
    — the shared ground truth of ann_pq_recall and ann_ivfpq_recall
    (Spark twin of _TRUE_L2_TOPK_CTE; same in-order per-element fold,
    same (tdist, vec_id) tiebreak).  Memoized: k rows per bounded
    query, computed once per session+corpus."""
    tk = (spark.sparkContext.applicationId, sf_dir)
    memo = _L2_TRUTH_MEMO.get(tk)
    if memo is not None:
        return memo
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    queries = {
        k: cv for k, cv in _small_vecs(spark, sf_dir).items()
        if _PQ_K <= k < _PQ_K + _PQ_NQ
    }
    # one corpus scan emits every query's distance per row (a
    # per-query union would rescan the full vectors once per query)
    qstructs = []
    for qid, qvec in sorted(queries.items()):
        tdist = F.aggregate(
            F.zip_with(
                _dlit_array(qvec),
                F.col("vec"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        qstructs.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                tdist.alias("tdist"),
            )
        )
    scored = (
        v.select(
            F.col("vec_id").alias("neighbor_id"),
            F.explode(F.array(*qstructs)).alias("qs"),
        )
        .select(F.col("qs.query_id").alias("query_id"), "neighbor_id",
                F.col("qs.tdist").alias("tdist"))
        # self-exclusion (module-wide ANN convention): the truth must
        # use the same convention as every approximate side it grades,
        # or recall caps at (k-1)/k for corpus-vector queries
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = W.partitionBy("query_id").orderBy("tdist", "neighbor_id")
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _PQ_TOPK)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    _L2_TRUTH_MEMO[tk] = out
    return out


#: dot over the already-DOUBLE ``v.vec`` arrays (the _PQ_CTES cast) —
#: same ascending-i left fold as _DOT_SQL_T / _dot, no per-element cast.
_DOT_D_SQL_T = (
    "list_sum(list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i]))"
)

#: IVFPQ derivation through the per-candidate ADC scores — single copy
#: shared by ann_ivf_pq_topk and ann_ivfpq_recall (the exactness-
#: critical text moves both oracles together).
_IVFPQ_SCORED_CTES = f"""{_PQ_CTES}, cents AS (
      SELECT vec_id AS cell, vec AS cv FROM v WHERE vec_id < {_N_CELLS}
    ), sc AS (
      SELECT e.vec_id, c.cell,
             {_DOT_D_SQL_T.format(dim=_DIM, a='e.vec', b='c.cv')}
               / (sqrt({_DOT_D_SQL_T.format(dim=_DIM, a='e.vec', b='e.vec')})
                  * sqrt({_DOT_D_SQL_T.format(dim=_DIM, a='c.cv', b='c.cv')}))
               AS ccos
      FROM v e CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, cell FROM sc
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell) = 1
    ), qprobe AS (
      SELECT vec_id AS qid, cell FROM sc
      WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K + _PQ_NQ}
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cell) <= {_N_PROBE}
    ), q AS (
      SELECT vec_id AS qid, vec AS qvec FROM v
      WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K + _PQ_NQ}
    ), lut AS (
      SELECT q.qid, m.i AS m, cb.cid,
             list_reduce(list_transform(range({_PQ_SUB}),
               i -> (qvec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])
                    * (qvec[m.i*{_PQ_SUB}+i+1]-cvec[m.i*{_PQ_SUB}+i+1])),
               (a,b) -> a+b) AS ld
      FROM q CROSS JOIN range({_PQ_M}) m(i) CROSS JOIN cb
    ), scored AS (
      SELECT pr.qid, p.vec_id, a2.cell,
             l0.ld + l1.ld + l2.ld + l3.ld AS adist
      FROM pq_codes p
      JOIN assigned a2 ON a2.vec_id = p.vec_id
      JOIN qprobe pr ON pr.cell = a2.cell AND pr.qid <> p.vec_id
      JOIN lut l0 ON l0.qid = pr.qid AND l0.m = 0 AND l0.cid = p.c0
      JOIN lut l1 ON l1.qid = pr.qid AND l1.m = 1 AND l1.cid = p.c1
      JOIN lut l2 ON l2.qid = pr.qid AND l2.m = 2 AND l2.cid = p.c2
      JOIN lut l3 ON l3.qid = pr.qid AND l3.m = 3 AND l3.cid = p.c3
    )"""

#: trained-cell derivation as composable oracle CTEs: one exact
#: spherical-Lloyd half-step — cosine-assign to the anchor cells
#: (the ``assigned`` CTE), recompute per-(cell, dim) fixed-point
#: means, keep the anchor value for empty cells.  ``tcells`` ends
#: with (cid, pos, val); ``tc`` re-concatenates full-dim vectors.
_IVF_TRAIN_CTES = f"""tdim AS (
      SELECT a.cell AS cid, r.i AS pos,
             CAST(floor(v.vec[r.i+1] * 1099511627776.0) AS HUGEINT) AS val
      FROM assigned a JOIN v USING (vec_id) CROSS JOIN range({_DIM}) r(i)
    ), tmean AS (
      SELECT cid, pos,
             CAST(sum(val) AS DOUBLE) / (count(*) * 1099511627776.0) AS val
      FROM tdim GROUP BY cid, pos
    ), tcells AS (
      SELECT c.cell AS cid, r.i AS pos,
             coalesce(m.val, c.cv[r.i+1]) AS val
      FROM cents c CROSS JOIN range({_DIM}) r(i)
      LEFT JOIN tmean m ON m.cid = c.cell AND m.pos = r.i
    ), tc AS (
      SELECT cid, list(val ORDER BY pos) AS cv2 FROM tcells GROUP BY cid
    )"""

#: DEPLOYED IVFPQ derivation: the corpus re-keyed by the TRAINED
#: coarse quantizer (tc from _IVF_TRAIN_CTES) — trained-cell cosine
#: assignment (tassigned), trained probe selection (tqprobe) and the
#: ADC scores over the probed lists (tscored; reuses the q/lut CTEs
#: from _IVFPQ_SCORED_CTES).  Single copy shared by ann_ivf_pq_topk,
#: ann_ivfpq_recall, ann_ivf_list_stats, ann_ivf_balance_trained and
#: ann_ivfpq_recall_compare, so the exactness-critical text moves
#: every consumer together.
_IVF_DEPLOY_CTES = f"""sct AS (
      SELECT e.vec_id, t.cid,
             {_DOT_D_SQL_T.format(dim=_DIM, a='e.vec', b='t.cv2')}
               / (sqrt({_DOT_D_SQL_T.format(dim=_DIM, a='e.vec', b='e.vec')})
                  * sqrt({_DOT_D_SQL_T.format(dim=_DIM, a='t.cv2', b='t.cv2')}))
               AS ccos
      FROM v e CROSS JOIN tc t
    ), tassigned AS (
      SELECT vec_id, cid AS cell FROM sct
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cid) = 1
    ), tqprobe AS (
      SELECT vec_id AS qid, cid AS cell FROM sct
      WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K + _PQ_NQ}
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cid) <= {_N_PROBE}
    ), tscored AS (
      SELECT pr.qid, p.vec_id, a2.cell,
             l0.ld + l1.ld + l2.ld + l3.ld AS adist
      FROM pq_codes p
      JOIN tassigned a2 ON a2.vec_id = p.vec_id
      JOIN tqprobe pr ON pr.cell = a2.cell AND pr.qid <> p.vec_id
      JOIN lut l0 ON l0.qid = pr.qid AND l0.m = 0 AND l0.cid = p.c0
      JOIN lut l1 ON l1.qid = pr.qid AND l1.m = 1 AND l1.cid = p.c1
      JOIN lut l2 ON l2.qid = pr.qid AND l2.m = 2 AND l2.cid = p.c2
      JOIN lut l3 ON l3.qid = pr.qid AND l3.m = 3 AND l3.cid = p.c3
    )"""


def _pydot(a: list[float], b: list[float]) -> float:
    """Driver-side ascending-index dot — the SAME accumulation order
    as the distributed `_dot` fold, so driver-computed probe cosines
    and executor-computed assignment cosines agree bit-for-bit."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _ivf_cnorms(cells: dict[int, list[float]]) -> dict[int, float]:
    """Centroid L2 norms — ONE copy feeding both the distributed cell
    assignment (_ivf_cell_argmin) and the driver-side probe ranking
    (ann_ivf_pq_topk), so the two cosines cannot diverge."""
    import math

    return {cid: math.sqrt(_pydot(cv, cv)) for cid, cv in cells.items()}


def _ivf_cell_argmin(cells: dict[int, list[float]]):
    """Cell-assignment Column over a ``vec`` column: negated-cosine
    argmin over centroid literals with the (ccos DESC, cell) tiebreak
    — used by _ivf_train_sums (once per session+corpus: the trained
    cells are memoized) and kept as the JVM reference semantics the
    Arrow codes kernel (_ivf_codes_with) replicates bit-for-bit.
    Interpreted-HOF cost is acceptable HERE because training runs
    once; the per-consumer encode paths moved to the Arrow kernel
    (see _pq_encode for the measured codegen story)."""
    cnorms = _ivf_cnorms(cells)
    nrm = F.sqrt(_dot(F.col("vec"), F.col("vec")))
    structs = [
        F.struct(
            (
                -F.try_divide(
                    _dot(F.col("vec"), _dlit_array(cv)),
                    nrm * F.lit(cnorms[cid]),
                )
            ).alias("nc"),
            F.lit(cid).cast("long").alias("cell"),
        )
        for cid, cv in sorted(cells.items())
    ]
    return F.array_min(F.array(*structs)).getField("cell")


def _ivf_codes_with(
    spark: SparkSession,
    sf_dir: str,
    cells: dict[int, list[float]],
    tag: str,
) -> DataFrame:
    """A memoized cell-keyed PQ codes table (vec_id, cell, code_0..3)
    under the GIVEN coarse quantizer: cosine cell assignment + PQ
    encoding fused into ONE zero-shuffle projection of one scan,
    localCheckpointed per session+corpus+tag — so each quantizer's
    corpus is assigned and encoded exactly once."""
    from adt_spark.context import spread

    ck = (spark.sparkContext.applicationId, sf_dir, tag)
    codes = _CODES_MEMO.get(ck)
    if codes is None:
        v = spread(
            tables(spark, sf_dir)["embeddings"].select(
                "vec_id", _vec_double().alias("vec")
            )
        )
        anchors = _pq_trained_codebooks(spark, sf_dir)
        raw = _ivf_encode(v, cells, anchors).select(
            "vec_id", "cell", "code_0", "code_1", "code_2", "code_3"
        )
        _CODES_PLAN[ck] = raw
        codes = raw.localCheckpoint(eager=False)
        _CODES_MEMO[ck] = codes
    return codes


def _ivf_encode(
    v: DataFrame,
    cells: dict[int, list[float]],
    anchors: dict[int, list[float]],
) -> DataFrame:
    """Cosine cell assignment + PQ encoding fused in ONE Arrow stage
    (vec_id, cell, code_0..3, recon_err) — the kernel behind every
    memoized codes table.  Replicates _ivf_cell_argmin's JVM
    semantics bit-for-bit: the dot and norm chains fold
    ascending-index (elementwise numpy adds in the same order as the
    0.0-seeded _dot fold), centroid norms are the SAME driver floats
    (_ivf_cnorms) the expression form embeds, and numpy's
    first-maximum argmax over ascending cell ids is exactly the
    (ccos DESC, cell) struct-min tiebreak.  Corpus vectors are
    non-zero by construction (fixture + any real embedding corpus);
    a zero norm would propagate NaN where the JVM form yields NULL —
    the one documented divergence, unreachable on real inputs.  See
    _pq_encode for why these kernels are Arrow, not JVM expressions
    (measured: HOFs never codegen; inlined arithmetic exceeds
    Janino's 64 KB method limit)."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )
    import numpy as np

    cell_ids = sorted(cells)
    cmat = np.asarray([cells[c] for c in cell_ids], dtype=np.float64)
    cnorm_map = _ivf_cnorms(cells)
    cnorms = np.asarray([cnorm_map[c] for c in cell_ids], dtype=np.float64)
    cell_arr = np.asarray(cell_ids, dtype=np.int64)
    cid_arr, cbs = _pq_np_codebooks(anchors)
    in_fields = {f.name: f for f in v.schema.fields}
    out_schema = StructType(
        [in_fields["vec_id"], StructField("cell", LongType())]
        + [StructField(f"code_{m}", IntegerType()) for m in range(_PQ_M)]
        + [StructField("recon_err", DoubleType())]
    )

    def encode(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            vec = _vec_np_batch(b.column(b.schema.get_field_index("vec")), n)
            # ascending-index folds, elementwise — same order as _dot
            nrm = vec[:, 0] * vec[:, 0]
            dots = vec[:, 0:1] * cmat[None, :, 0]
            for i in range(1, _DIM):
                nrm = nrm + vec[:, i] * vec[:, i]
                dots = dots + vec[:, i : i + 1] * cmat[None, :, i]
            ccos = dots / (np.sqrt(nrm)[:, None] * cnorms[None, :])
            cell = cell_arr[ccos.argmax(axis=1)]
            codes, recon = _pq_np_min(vec, cbs, cid_arr)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("vec_id")),
                    pa.array(cell),
                ]
                + [pa.array(c.astype(np.int32)) for c in codes]
                + [pa.array(recon)],
                names=["vec_id", "cell",
                       *[f"code_{m}" for m in range(_PQ_M)], "recon_err"],
            )

    return v.select("vec_id", "vec").mapInArrow(encode, out_schema)


def _ivf_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEPLOYED codes table: keyed by the TRAINED coarse
    quantizer (_ivf_trained_cells — the re-keying step Jégou 2011's
    deployment contract prescribes and ann_ivf_balance_trained
    audits).  Shared by ann_ivf_pq_topk, ann_ivfpq_recall,
    ann_ivf_list_stats (cell column only) and the trained side of
    ann_ivf_balance_trained."""
    return _ivf_codes_with(
        spark, sf_dir, _ivf_trained_cells(spark, sf_dir), "cell"
    )


def _ivf_codes_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRE-training codes table (anchor coarse quantizer: the
    first {_N_CELLS} corpus vectors) — kept alongside the deployed
    table so ann_ivfpq_recall_compare and the anchor side of
    ann_ivf_balance_trained can quantify what training bought."""
    cells = {
        k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _N_CELLS
    }
    return _ivf_codes_with(spark, sf_dir, cells, "cell_anchor")


def _ivfpq_adc_topk(
    spark: SparkSession,
    sf_dir: str,
    codes: DataFrame,
    cells: dict[int, list[float]],
) -> DataFrame:
    """Shared IVFPQ ADC search over a GIVEN (codes table, coarse
    quantizer) pair — the single exactness-critical implementation
    behind the deployed trained search (ann_ivf_pq_topk) and the
    anchor variant ann_ivfpq_recall_compare measures against.

    Driver side: per-query probe-cell ranking by the same
    (-cosine, cell) total order the distributed assignment uses
    (cosines via _pydot/_ivf_cnorms — the shared folds).  Distributed
    side: ONE scan of the codes table; each code row emits its
    per-query (query_id, adist) ADC structs with probe-membership and
    self-exclusion folded into a null-producing when (a per-query
    union would re-execute the scan per query); the only shuffle is
    the final per-query WindowGroupLimit top-k."""
    import math

    small = _small_vecs(spark, sf_dir)
    anchors = _pq_trained_codebooks(spark, sf_dir)
    queries = {
        k: small[k] for k in range(_PQ_K, _PQ_K + _PQ_NQ) if k in small
    }
    cnorms = _ivf_cnorms(cells)  # shared with _ivf_cell_argmin

    def probe_cells(qvec: list[float]) -> list[int]:
        qn = math.sqrt(_pydot(qvec, qvec))
        ranked = sorted(
            (-(_pydot(qvec, cv) / (qn * cnorms[cid])), cid)
            for cid, cv in cells.items()
        )
        return [cid for _neg, cid in ranked[:_N_PROBE]]

    def lut_entry(qvec: list[float], cvec: list[float], m: int) -> float:
        acc = 0.0
        for i in range(m * _PQ_SUB, (m + 1) * _PQ_SUB):
            d = qvec[i] - cvec[i]
            acc += d * d
        return acc

    qstructs = []
    for qid, qvec in sorted(queries.items()):
        probed = probe_cells(qvec)
        adist = None
        for m in range(_PQ_M):
            lut = F.array(
                *[
                    F.lit(lut_entry(qvec, cvec, m))
                    for _cid, cvec in sorted(anchors.items())
                ]
            )
            term = F.element_at(lut, F.col(f"code_{m}") + 1)
            adist = term if adist is None else adist + term
        qstructs.append(
            F.when(
                F.col("cell").isin([int(c) for c in probed])
                & (F.col("vec_id") != qid),
                F.struct(
                    F.lit(qid).cast("long").alias("query_id"),
                    adist.alias("adist"),
                ),
            )
        )
    scored = (
        codes.select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.explode(
                F.filter(F.array(*qstructs), lambda s: s.isNotNull())
            ).alias("qs"),
        )
        .select(F.col("qs.query_id").alias("query_id"), "vec_id", "cell",
                F.col("qs.adist").alias("adist"))
    )
    rn = F.row_number().over(W.partitionBy("query_id").orderBy("adist", "vec_id"))
    return scored.withColumn("_rn", rn).filter(F.col("_rn") <= _PQ_TOPK).drop("_rn")


@register(
    "ann_ivf_pq_topk",
    oracle=f"""
    WITH {_IVFPQ_SCORED_CTES}, {_IVF_TRAIN_CTES}, {_IVF_DEPLOY_CTES}
    SELECT CAST(qid AS BIGINT) AS query_id, vec_id,
           CAST(cell AS INT) AS cell, adist
    FROM tscored
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
            <= {_PQ_TOPK}
    """,
    tags=("similarity", "ann", "ivf", "pq", "adc"),
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ search (Jégou et al. 2011 §V; FAISS ``IndexIVFPQ``) — the
    composition that actually runs at billion-vector scale: the
    TRAINED IVF coarse quantizer ({_N_CELLS} cosine cells from
    ann_ivf_train_cells — the deployed quantizer, per Jégou's
    train-then-re-key contract; ann_ivf_balance_trained audits what
    the re-keying bought) prunes the corpus to the query's {_N_PROBE}
    probed inverted lists, and candidates are scored in the
    compressed domain via the PQ ADC lookup tables instead of
    full-vector distances.  Completes the ANN family: ann_ivf_probe
    prunes but scores exact, ann_pq_adc_topk scores compressed but
    scans everything — this does both.

    Cross-engine exactness: trained-cell values are the oracle-gated
    fixed-point means (ann_ivf_train_cells); cell cosines divide the
    ascending-k dot fold by the PRODUCT of correctly-rounded sqrts
    (same grouping in Python, Spark and the oracle); assignment and
    probe rank (ccos DESC, cell) — a total order; LUT entries are the
    in-order 16-term folds shared with ann_pq_adc_topk; the final
    top-k tiebreaks (adist, vec_id).

    Scale shape — the whole point: cell assignment (argmin over
    {_N_CELLS} trained-centroid literals), PQ encoding ({_PQ_M}
    sub-argmins over codebook literals) and the probed-cell
    membership filter are ONE zero-shuffle projection of ONE corpus
    scan (the memoized deployed codes table); the probe set per query
    is a driver-side literal over the bounded centroid/query collect
    (at deployment the codes table is partitioned by cell, so the
    ``cell IN (...)`` literal IS partition pruning), and the only
    shuffle anywhere is the final per-query WindowGroupLimit top-k
    over the probed candidates.  The reference has no ANN surface
    (dedup/ANN family is the beyond-reference pipeline mandate).
    """
    codes = _ivf_codes(spark, sf_dir)
    return _ivfpq_adc_topk(
        spark, sf_dir, codes, _ivf_trained_cells(spark, sf_dir)
    )


@register(
    "ann_ivfpq_recall",
    oracle=f"""
    WITH {_IVFPQ_SCORED_CTES}, {_IVF_TRAIN_CTES}, {_IVF_DEPLOY_CTES},
    ivfpq AS (
      SELECT qid, vec_id FROM tscored
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
              <= {_PQ_TOPK}
    ), {_TRUE_L2_TOPK_CTE}
    SELECT CAST(f.qid AS BIGINT) AS query_id,
           CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
           CAST(count(t.vec_id) AS DOUBLE) / {_PQ_TOPK} AS recall_at_k
    FROM exact f
    LEFT JOIN ivfpq t ON t.qid = f.qid AND t.vec_id = f.vec_id
    GROUP BY f.qid
    """,
    tags=("similarity", "ann", "ivf", "pq", "eval"),
)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{_PQ_TOPK} of the composed IVFPQ search against the TRUE
    squared-L2 top-k — measures the COMBINED loss of cell pruning
    (ann_ivf_recall's quantity) and PQ compression (ann_pq_recall's)
    in one number, which is the figure a deployment actually tunes
    (FAISS benchmarks report exactly this for IndexIVFPQ).  With this,
    every index family AND the flagship composition have their eval.

    Exactness and scale shape are inherited wholesale: the approximate
    side is ann_ivf_pq_topk's zero-join scan, the truth side is the
    bounded-query brute-force scan shared with ann_pq_recall
    (_true_l2_topk), and the overlap join carries k rows per query.
    """
    approx = ann_ivf_pq_topk(spark, sf_dir).select(
        F.col("query_id").alias("lq"), F.col("vec_id").alias("lnb")
    )
    return _overlap_vs_exact(_true_l2_topk(spark, sf_dir), approx, k=_PQ_TOPK)


@register(
    "pipeline_cluster_quality_report",
    oracle=f"""
    WITH {_KM_CTES},
    q AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CASE WHEN len(string_split(text, ' ')) >= 20
                     AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' ')) > 0.3
                    THEN 1 ELSE 0 END AS passes
        FROM documents
    )
    SELECT km.cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(q.passes) AS BIGINT) AS n_pass,
           CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens
    FROM km_assign km JOIN q ON km.vec_id = q.doc_id
    GROUP BY km.cluster_id
    """,
    tags=("pipeline", "embedding", "quality"),
)
def pipeline_cluster_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality audit — the cross-modal report a
    curation pipeline runs before choosing per-cluster sampling rates:
    join every document's rule-based quality gate (text side) with its
    k-means cluster (embedding side) and aggregate pass-rates per
    cluster.  Clusters with low pass-rates are pruned or downsampled
    wholesale (the SemDeDup/DataComp-style curation loop).

    Scale shape: the k-means assignment is the zero-shuffle
    literal-centroid projection (emb_kmeans_assign); the text gate is
    a scan-speed projection; the join is doc_id = vec_id equi-join
    (co-partitionable at scale) followed by a |clusters|-row
    partial+final aggregate.  Exactness: counts and BIGINT sums only.
    """
    from pyspark.sql import functions as F

    km = emb_kmeans_assign(spark, sf_dir)
    docs = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    q = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.when((n_tokens >= 20) & (distinct_ratio > 0.3), 1).otherwise(0).alias("passes"),
    )
    return (
        km.join(q, km.vec_id == q.doc_id)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("passes").cast("bigint").alias("n_pass"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# ANN deployment audits: PQ training distortion + IVF list balance
# ---------------------------------------------------------------------------


@register(
    "emb_pq_distortion",
    oracle=f"""
    WITH {_PQ_CTES},
    anchor_per AS (
      SELECT vec_id, m, min(dist) AS md FROM pd GROUP BY vec_id, m
    ),
    anchor_err AS (
      SELECT vec_id,
             list_reduce(
               list_transform(
                 list_sort(list(struct_pack(m := m, d := md))),
                 x -> x.d),
               (a, b) -> a + b) AS err
      FROM anchor_per GROUP BY vec_id
    ),
    trained_err AS (
      SELECT vec_id, d0 + d1 + d2 + d3 AS err FROM pq_codes
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(sum(CAST(floor(a.err * 1099511627776.0) AS HUGEINT))
                  AS DOUBLE) / (count(*) * 1099511627776.0) AS mean_err_anchor,
             CAST(sum(CAST(floor(t.err * 1099511627776.0) AS HUGEINT))
                  AS DOUBLE) / (count(*) * 1099511627776.0) AS mean_err_trained
      FROM anchor_err a JOIN trained_err t USING (vec_id)
    )
    SELECT n_vectors, mean_err_anchor, mean_err_trained,
           CASE WHEN mean_err_trained = 0 THEN NULL
                ELSE mean_err_anchor / mean_err_trained END AS improvement
    FROM s
    """,
    tags=("embedding", "pq", "training", "eval"),
)
def emb_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did PQ training help?  Mean squared reconstruction error under
    the ANCHOR-init codebook vs the TRAINED codebook
    (_pq_trained_codebooks), plus their ratio — the quantization-
    distortion eval Jégou 2011 §III reports (lower distortion →
    tighter ADC distance estimates → higher recall); with this, the
    round-5 training step has its own one-number audit next to the
    recall evals.

    Cross-engine exactness: each per-vector error is the
    fixed-expression-order sum of the M per-subspace minima (the
    _pq_encode recon_err fold; the anchor side re-folds the same
    minima sorted by m); the two corpus means accumulate in the
    tie-free fixed point floor(x·2⁴⁰) as exact integers (no cross-row
    float sums — exactness rule 6), one double division each at the
    boundary; the ratio is one more correctly-rounded division,
    NULL-guarded (try_divide == DuckDB's CASE).

    Scale shape: ONE zero-shuffle Arrow stage computes BOTH errors
    (anchor + trained codebooks both ride the kernel closure, so the
    two quantizers share one corpus scan with zero joins —
    plan-checked, test_plans.py::test_pq_distortion_single_scan_no_joins;
    see _pq_encode for why the kernel is Arrow, not a JVM expression),
    then one 1-row aggregate.  Nothing corpus-sized is collected or
    broadcast.
    """
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    anchors = {k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _PQ_K}
    trained = _pq_trained_codebooks(spark, sf_dir)

    cid_a, cbs_a = _pq_np_codebooks(anchors)
    cid_t, cbs_t = _pq_np_codebooks(trained)

    def errs_fn(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            vec = _vec_np_batch(
                b.column(b.schema.get_field_index("vec")), b.num_rows
            )
            _, e0 = _pq_np_min(vec, cbs_a, cid_a)
            _, e1 = _pq_np_min(vec, cbs_t, cid_t)
            yield pa.RecordBatch.from_arrays(
                [pa.array(e0), pa.array(e1)], names=["err0", "err1"]
            )

    errs = v.select("vec").mapInArrow(errs_fn, "err0 double, err1 double")
    fp = 1099511627776.0  # 2^40

    def fx(c):
        return F.sum(F.floor(F.col(c) * fp).cast("decimal(38,0)")).cast(
            "double"
        ) / (F.count(F.lit(1)).cast("double") * fp)

    s = errs.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        fx("err0").alias("mean_err_anchor"),
        fx("err1").alias("mean_err_trained"),
    )
    return s.select(
        "n_vectors",
        "mean_err_anchor",
        "mean_err_trained",
        F.try_divide(F.col("mean_err_anchor"), F.col("mean_err_trained")).alias(
            "improvement"
        ),
    )


@register(
    "ann_ivf_list_stats",
    oracle=f"""
    WITH {_IVFPQ_SCORED_CTES}, {_IVF_TRAIN_CTES}, {_IVF_DEPLOY_CTES},
    ls AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors
      FROM tassigned GROUP BY cell
    )
    SELECT CAST(cell AS INT) AS cell, n_vectors,
           CAST(n_vectors AS DOUBLE)
             / CAST(sum(n_vectors) OVER () AS DOUBLE) AS share,
           CAST(n_vectors * {_N_CELLS} AS DOUBLE)
             / CAST(sum(n_vectors) OVER () AS DOUBLE) AS imbalance
    FROM ls
    """,
    tags=("similarity", "ann", "ivf", "eval"),
)
def ann_ivf_list_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list balance audit for the DEPLOYED (trained) IVF
    coarse quantizer — per cell: list size, corpus share, and the
    imbalance factor (size ÷ perfectly-uniform size).  This is the
    number FAISS tells you to check before deploying IVF at scale:
    probe cost and tail latency track the LARGEST probed list, so an
    imbalance factor ≫ 1 means a hot cell dominates query time and
    the quantizer needs retraining (or the cell splitting).  Reads
    the SAME deployed codes table ann_ivf_pq_topk probes, so it
    audits exactly the lists the search operators touch.

    Cross-engine exactness: assignment equality is inherited from the
    IVFPQ gate (trained-cell values are ann_ivf_train_cells'
    fixed-point means; same ccos folds, same (ccos DESC, cell)
    tiebreak); counts are exact; share/imbalance are single
    exact-int-ratio double divisions at the output boundary (rule 2).

    Scale shape: reads ONLY the cell column of the memoized deployed
    codes table (no recompute, no parquet rescan when the family
    already ran); the count is ONE two-phase aggregate to {_N_CELLS}
    rows; the windows run over that {_N_CELLS}-row aggregate only.
    """
    ls = (
        _ivf_codes(spark, sf_dir)
        .select("cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    w_all = W.partitionBy()
    total = F.sum("n_vectors").over(w_all).cast("double")
    return ls.select(
        F.col("cell").cast("int").alias("cell"),
        "n_vectors",
        (F.col("n_vectors").cast("double") / total).alias("share"),
        ((F.col("n_vectors") * _N_CELLS).cast("double") / total).alias("imbalance"),
    )


_CB_CAP = 40  # per-cluster document cap for cluster-balanced sampling


@register(
    "emb_cluster_balanced_sample",
    oracle=f"""
    WITH {_KM_CTES},
    keyed AS (
      SELECT vec_id, cluster_id,
             md5('cbal-' || CAST(vec_id AS VARCHAR)) AS k
      FROM km_assign
    )
    SELECT vec_id, cluster_id, CAST(rn AS BIGINT) AS rank_in_cluster
    FROM (
      SELECT vec_id, cluster_id, k,
             row_number() OVER (PARTITION BY cluster_id ORDER BY k, vec_id)
               AS rn
      FROM keyed
    )
    WHERE rn <= {_CB_CAP}
    """,
    tags=("embedding", "kmeans", "sampling", "curation"),
)
def emb_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subsampling — keep at most {_CB_CAP} documents
    per k-means cluster, chosen by a seeded hash order: the curation
    step after SemDeDup/clustering that stops dominant modes from
    swamping the training mix (the DataComp / SSL-curation
    "cluster-then-cap" recipe; same intent as q_per_source_cap but in
    EMBEDDING space, where the imbalance is semantic, not
    provenance).

    Cross-engine exactness: the cluster assignment is
    emb_kmeans_assign's hash-gate-proven Lloyd iteration; selection
    orders by (md5 hash, vec_id) — a deterministic total order — and
    keeps rank ≤ {_CB_CAP}, so the same rows survive on every engine
    and cluster size.

    Scale shape: assignment is the zero-shuffle literal-centroid
    projection; the cap is ONE per-cluster window — Spark plans it as
    WindowGroupLimit (rank pushdown), so each shuffle partition keeps
    only its top-{_CB_CAP} rows per cluster before the final window
    pass (plan-checked, test_plans.py::test_cluster_balanced_window_limit).
    The hash order means no data-dependent skew: every cluster's
    candidates hash-spread uniformly.
    """
    km = emb_kmeans_assign(spark, sf_dir)
    k = F.md5(F.concat(F.lit("cbal-"), F.col("vec_id").cast("string")))
    w = W.partitionBy("cluster_id").orderBy("k", "vec_id")
    return (
        km.select("vec_id", "cluster_id", k.alias("k"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CB_CAP)
        .select(
            "vec_id",
            "cluster_id",
            F.col("rn").cast("bigint").alias("rank_in_cluster"),
        )
    )


@register(
    "emb_kmeans_iter2",
    oracle=f"""
    WITH {_KM_CTES},
    dims2 AS (
      SELECT ka.cluster_id AS cid, r.i AS pos,
             CAST(floor(v.vec[r.i+1] * 1099511627776.0) AS HUGEINT) AS val
      FROM km_assign ka JOIN v USING (vec_id) CROSS JOIN range({_KM_DIM}) r(i)
    ), sums2 AS (
      SELECT cid, pos,
             CAST(sum(val) AS DOUBLE) / (count(*) * 1099511627776.0) AS m
      FROM dims2 GROUP BY cid, pos
    ), c2 AS (
      SELECT cid, list(m ORDER BY pos) AS cvec FROM sums2 GROUP BY cid
    ), d3 AS (
      SELECT v.vec_id, c2.cid,
             list_reduce(list_transform(range({_KM_DIM}),
               i -> (vec[i+1]-cvec[i+1])*(vec[i+1]-cvec[i+1])), (a,b) -> a+b)
               AS dist
      FROM v CROSS JOIN c2
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM d3
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
    """,
    tags=("embedding", "kmeans", "iterative"),
)
def emb_kmeans_iter2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO exact Lloyd iterations (assign → means → assign → means →
    assign) — the multi-round form of emb_kmeans_assign, proving the
    iterative exactness discipline COMPOSES: round 2's centroids
    derive from round 1's hash-gate-proven assignment, so every
    engine walks the identical centroid trajectory (the oracle
    unrolls both mean updates in SQL).  Real curation k-means runs
    this loop to convergence; each added round is the same bounded
    shape.

    Cross-engine exactness: by induction — assignment argmin
    tiebreaks (dist, cid) over in-order folds; each mean update is
    the tie-free fixed point floor(x·2⁴⁰)/DECIMAL(38,0) with one
    boundary division; k×dim doubles per round is the only driver
    state.

    Scale shape: per round, ONE zero-shuffle literal-centroid
    projection + ONE (cluster, dim)-keyed partial+final aggregate —
    rounds multiply wall-clock, never memory or shuffle width.
    """
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    cents = {k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _KM_K}
    for _round in range(2):
        cents = _km_mean_update(_km_assign(v, cents))
    return _km_assign(v, cents).select("vec_id", "cluster_id")


#: (applicationId, sf_dir) → trained IVF coarse-quantizer centroids
#: {cid: full-dim vec} — N_CELLS×dim doubles of memoized driver model
#: state (the _PQ_CB_MEMO twin for the coarse quantizer).
_IVF_CELLS_MEMO: dict[tuple[str, str], dict[int, list[float]]] = {}

def _ivf_trained_cells(spark: SparkSession, sf_dir: str) -> dict[int, list[float]]:
    """TRAIN the IVF coarse quantizer — one exact mean update from
    the anchor cells under the SAME cosine assignment the search
    operators use (_ivf_cell_argmin), closing ann_ivf_probe's 'swap
    in trained k-means centroids at deployment' promise: means in the
    tie-free floor(x·2⁴⁰) fixed point, empty cells keep their anchor,
    N_CELLS×dim doubles of memoized driver state."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _IVF_CELLS_MEMO.get(key)
    if memo is not None:
        return memo
    cells = {
        k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _N_CELLS
    }
    cb = {cid: list(cv) for cid, cv in cells.items()}  # empty-cell fill
    for r in _ivf_train_sums(spark, sf_dir, cells).collect():
        # bounded: N_CELLS×dim rows
        cb[int(r.cell)][int(r.pos)] = float(r.m)
    _IVF_CELLS_MEMO[key] = cb
    return cb


def _ivf_train_sums(
    spark: SparkSession, sf_dir: str, cells: dict[int, list[float]]
) -> DataFrame:
    """The distributed half of IVF cell training: per-(cell, dim)
    fixed-point means of the vectors cosine-assigned to each anchor
    cell — assignment is the zero-shuffle _ivf_cell_argmin
    projection, and the ONLY shuffle is this (cell, pos)-keyed
    partial+final aggregate (plan-checked,
    test_plans.py::test_ivf_train_single_shuffle_no_join)."""
    v = tables(spark, sf_dir)["embeddings"].select(
        "vec_id", _vec_double().alias("vec")
    )
    return (
        v.select(_ivf_cell_argmin(cells).alias("cell"), "vec")
        .select("cell", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("val") * 1099511627776.0).cast("decimal(38,0)"))
                .cast("double")
                / (F.count("*").cast("double") * 1099511627776.0)
            ).alias("m")
        )
    )


@register(
    "ann_ivf_train_cells",
    oracle=f"""
    WITH {_IVFPQ_SCORED_CTES}, {_IVF_TRAIN_CTES}
    SELECT CAST(cid AS INT) AS cid, CAST(pos AS INT) AS pos, val
    FROM tcells
    """,
    tags=("similarity", "ann", "ivf", "training", "iterative"),
)
def ann_ivf_train_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained IVF coarse-quantizer centroids as a table —
    (cell cid, dim pos, value): {_N_CELLS}×{_DIM} rows from one exact
    spherical-Lloyd half-step (cosine-assign to the anchor cells,
    recompute per-cell means), oracle-gated the way emb_pq_train
    gates the PQ codebooks — so IVF cell training is value-checked,
    not just its consumers.

    Cross-engine exactness: assignment equality is the IVFPQ gate's
    (same ccos folds, same (ccos DESC, cell) tiebreak); means are the
    tie-free floor(x·2⁴⁰)/DECIMAL(38,0) fixed point with one boundary
    division; empty cells COALESCE to their anchor value on both
    engines.

    Scale shape: assignment is the zero-shuffle literal-centroid
    argmin; the only shuffle is the (cell, dim)-keyed partial+final
    mean aggregate ({_N_CELLS}×{_DIM} groups); driver state is
    N_CELLS×dim doubles, memoized per session like the PQ codebooks.
    """
    cb = _ivf_trained_cells(spark, sf_dir)
    rows = [
        (cid, pos, cb[cid][pos])
        for cid in sorted(cb)
        for pos in range(_DIM)
    ]
    return spark.createDataFrame(rows, "cid int, pos int, val double")


@register(
    "ann_ivf_balance_trained",
    oracle=f"""
    WITH {_IVFPQ_SCORED_CTES}, {_IVF_TRAIN_CTES}, {_IVF_DEPLOY_CTES},
    s1 AS (
      SELECT max(n) AS m, sum(n) AS t FROM (
        SELECT cell, count(*) AS n FROM assigned GROUP BY cell)
    ), s2 AS (
      SELECT max(n) AS m, sum(n) AS t FROM (
        SELECT cell, count(*) AS n FROM tassigned GROUP BY cell)
    )
    SELECT CAST(s1.t AS BIGINT) AS n_vectors,
           CAST(s1.m * {_N_CELLS} AS DOUBLE) / CAST(s1.t AS DOUBLE)
             AS max_imbalance_anchor,
           CAST(s2.m * {_N_CELLS} AS DOUBLE) / CAST(s2.t AS DOUBLE)
             AS max_imbalance_trained,
           (CAST(s1.m * {_N_CELLS} AS DOUBLE) / CAST(s1.t AS DOUBLE))
             / (CAST(s2.m * {_N_CELLS} AS DOUBLE) / CAST(s2.t AS DOUBLE))
             AS improvement
    FROM s1 CROSS JOIN s2
    """,
    tags=("similarity", "ann", "ivf", "training", "eval"),
)
def ann_ivf_balance_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did IVF cell training help?  The WORST-cell imbalance factor
    (largest list ÷ uniform size — the tail-latency driver
    ann_ivf_list_stats reports per cell) under the anchor quantizer
    vs the trained one, plus their ratio: the one-number audit behind
    the deployment step the search family has now TAKEN — the
    deployed codes table (_ivf_codes) is keyed by the trained
    centroids precisely because this number says they flatten the
    inverted lists (ann_ivfpq_recall_compare reports the retrieval
    side of the same trade).

    Cross-engine exactness: both assignments are the proven cosine
    argmin (the trained side's centroids are fixed-point means the
    ann_ivf_train_cells gate value-checks; its cosine divides by
    freshly-sqrt'd norms in the same grouping on both engines);
    counts and maxima are exact integers; the three ratios are
    boundary-only double divisions (denominators are corpus/list
    counts — structurally nonzero when the table is nonempty).

    Scale shape: BOTH sides read only the cell column of a memoized
    codes table — the TRAINED side from the deployed table
    (_ivf_codes, already materialized for the IVFPQ search family)
    and the ANCHOR side from the pre-training table
    (_ivf_codes_anchor, shared with ann_ivfpq_recall_compare) — so
    neither assignment is ever recomputed; the union feeds
    bounded-key aggregation — (side, cell) counts, per-side max/sum,
    one conditional-agg row.  Zero joins and zero parquet rescans
    (plan-checked,
    test_plans.py::test_ivf_balance_trained_single_scan_no_join).
    (A fused both-argmins-in-one-projection variant measured SLOWER —
    32 cosine folds in one codegen unit — and was reverted.)
    """
    anchor_pairs = _ivf_codes_anchor(spark, sf_dir).select(
        F.lit("anchor").alias("side"), F.col("cell").cast("long").alias("cell")
    )
    trained_pairs = _ivf_codes(spark, sf_dir).select(
        F.lit("trained").alias("side"),
        F.col("cell").cast("long").alias("cell"),
    )
    pairs = anchor_pairs.unionByName(trained_pairs)
    per_side = (
        pairs.groupBy("side", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("side")
        .agg(F.max("n").alias("m"), F.sum("n").alias("t"))
    )
    one = per_side.agg(
        F.max(F.when(F.col("side") == "anchor", F.col("m"))).alias("m1"),
        F.max(F.when(F.col("side") == "anchor", F.col("t"))).alias("t1"),
        F.max(F.when(F.col("side") == "trained", F.col("m"))).alias("m2"),
        F.max(F.when(F.col("side") == "trained", F.col("t"))).alias("t2"),
    )
    imb1 = (F.col("m1") * _N_CELLS).cast("double") / F.col("t1").cast("double")
    imb2 = (F.col("m2") * _N_CELLS).cast("double") / F.col("t2").cast("double")
    return one.select(
        F.col("t1").alias("n_vectors"),
        imb1.alias("max_imbalance_anchor"),
        imb2.alias("max_imbalance_trained"),
        (imb1 / imb2).alias("improvement"),
    )


@register(
    "ann_ivfpq_recall_compare",
    oracle=f"""
    WITH {_IVFPQ_SCORED_CTES}, {_IVF_TRAIN_CTES}, {_IVF_DEPLOY_CTES},
    aapprox AS (
      SELECT qid, vec_id FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
              <= {_PQ_TOPK}
    ), tapprox AS (
      SELECT qid, vec_id FROM tscored
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
              <= {_PQ_TOPK}
    ), {_TRUE_L2_TOPK_CTE}
    SELECT CAST(count(a.vec_id) AS BIGINT) AS n_overlap_anchor,
           CAST(count(t2.vec_id) AS BIGINT) AS n_overlap_trained,
           CAST(count(a.vec_id) AS DOUBLE) / {_PQ_NQ * _PQ_TOPK}
             AS recall_anchor,
           CAST(count(t2.vec_id) AS DOUBLE) / {_PQ_NQ * _PQ_TOPK}
             AS recall_trained,
           CAST(count(t2.vec_id) - count(a.vec_id) AS DOUBLE)
             / {_PQ_NQ * _PQ_TOPK} AS recall_delta
    FROM exact f
    LEFT JOIN aapprox a ON a.qid = f.qid AND a.vec_id = f.vec_id
    LEFT JOIN tapprox t2 ON t2.qid = f.qid AND t2.vec_id = f.vec_id
    """,
    tags=("similarity", "ann", "ivf", "pq", "training", "eval"),
)
def ann_ivfpq_recall_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What did deploying the trained coarse quantizer cost or buy in
    RETRIEVAL terms?  One row: mean recall@{_PQ_TOPK} over the
    {_PQ_NQ}-query eval set of the IVFPQ search under the ANCHOR
    quantizer vs the TRAINED (deployed) one, plus the delta — the
    retrieval-side companion to ann_ivf_balance_trained's latency
    audit (training flattens the inverted lists; this checks the
    probed lists still cover the true neighbors).  FAISS deployments
    read exactly this pair before committing an index build.

    Cross-engine exactness: both searches are the shared
    _ivfpq_adc_topk derivation (the anchor side over the kept
    pre-training codes table, the trained side over the deployed
    one); the truth is the shared _true_l2_topk; overlap counts are
    exact integers and the three ratios/delta are single boundary
    divisions by the literal {_PQ_NQ * _PQ_TOPK}.

    Scale shape: two memoized codes-table scans (LUT-literal
    projections + WindowGroupLimit top-k each), one bounded
    brute-force truth scan (memoized), then k×{_PQ_NQ}-row overlap
    joins into a single-row aggregate.  Nothing corpus-sized moves.
    """
    anchor_cells = {
        k: cv for k, cv in _small_vecs(spark, sf_dir).items() if k < _N_CELLS
    }
    a_topk = _ivfpq_adc_topk(
        spark, sf_dir, _ivf_codes_anchor(spark, sf_dir), anchor_cells
    ).select(F.col("query_id").alias("aq"), F.col("vec_id").alias("av"))
    t_topk = _ivfpq_adc_topk(
        spark, sf_dir, _ivf_codes(spark, sf_dir),
        _ivf_trained_cells(spark, sf_dir),
    ).select(F.col("query_id").alias("tq"), F.col("vec_id").alias("tv"))
    truth = _true_l2_topk(spark, sf_dir)
    denom = float(_PQ_NQ * _PQ_TOPK)
    joined = (
        truth.join(
            a_topk,
            (F.col("aq") == F.col("query_id"))
            & (F.col("av") == F.col("neighbor_id")),
            "left",
        )
        .join(
            t_topk,
            (F.col("tq") == F.col("query_id"))
            & (F.col("tv") == F.col("neighbor_id")),
            "left",
        )
    )
    return joined.agg(
        F.count("av").alias("n_overlap_anchor"),
        F.count("tv").alias("n_overlap_trained"),
        (F.count("av").cast("double") / F.lit(denom)).alias("recall_anchor"),
        (F.count("tv").cast("double") / F.lit(denom)).alias("recall_trained"),
        (
            (F.count("tv") - F.count("av")).cast("double") / F.lit(denom)
        ).alias("recall_delta"),
    )


#: hard negatives per anchor
_HARDNEG_K = 3


@register(
    "ann_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, CAST(q.label AS INT) AS query_label,
               e.vec_id AS neighbor_id, CAST(e.label AS INT) AS neg_label,
               {_DOT_SQL_T.format(dim=_DIM, a='q.embedding', b='e.embedding')}
                 / ({_norm_sql('q')} * {_norm_sql('e')}) AS cosine
        FROM q JOIN embeddings e
          ON e.vec_id <> q.vec_id AND e.label <> q.label
    )
    SELECT query_id, query_label, neighbor_id, neg_label, cosine,
           CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {_HARDNEG_K}
    """,
    tags=("similarity", "ann", "training"),
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive/embedding training: per
    anchor, the top-k most-similar vectors whose LABEL DIFFERS — the
    negatives that sit closest to the decision boundary (the standard
    dense-retrieval recipe, e.g. ANCE/DPR-style mining).  Completes
    the training-pair family: text_contrastive_pairs builds the
    positives, this builds the negatives.

    Exactness: the cosine is the module's one ascending-k fold (the
    same _dot/_norm construction every ANN oracle shares) and the
    top-k tiebreaks on neighbor_id — bit-identical rows both engines.

    Scale shape: identical to ann_topk_bruteforce — anchors broadcast,
    corpus scan stays partition-parallel, the label filter drops
    same-class candidates BEFORE the per-anchor WindowGroupLimit
    top-k (k-row heaps per partition, one shuffle).  The IVF/LSH
    bucketed variants (ann_lsh_bucketed, ann_ivf_probe) are the
    documented production path when the anchor set itself scales.
    """
    from adt_spark.context import spread

    emb = spread(tables(spark, sf_dir)["embeddings"])
    v = _vec_double()
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").cast("int").alias("neg_label"),
        v.alias("v_n"),
        F.sqrt(_dot(v, v)).alias("norm_n"),
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("int").alias("query_label"),
        v.alias("v_q"),
        F.sqrt(_dot(v, v)).alias("norm_q"),
    )
    scored = corpus.join(
        F.broadcast(queries),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("neg_label") != F.col("query_label")),
    ).withColumn(
        "cosine",
        F.try_divide(
            _dot(F.col("v_q"), F.col("v_n")), F.col("norm_q") * F.col("norm_n")
        ),
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= _HARDNEG_K)
        .select(
            "query_id", "query_label", "neighbor_id", "neg_label",
            "cosine", "rn",
        )
    )
