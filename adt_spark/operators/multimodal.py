"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, plus decode / feature-extract plumbing
as Arrow-batched pandas UDFs over mapInPandas.

The driver tables carry no real media, so the binary payload is
derived deterministically from document text (utf-8 bytes) — the
Spark-side plumbing (binary schema, content addressing, mapInPandas
batch iteration, UDF signatures) is real and tested; the actual
codec call is stubbed behind ``NotImplementedError`` exactly where
an image/audio library would slot in (those libs are not in this
container).

Scale notes: binary payloads stay opaque to the JVM (no decode in
Catalyst); mapInPandas streams Arrow batches so a 100 TB media scan
is batch-at-a-time per partition with bounded memory, and
content-addressing (sha256) enables exact dedup of media blobs with
the same hash-groupBy shape as text dedup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.queries import register, tables


@register(
    "mm_binary_content_address",
    oracle="""
    SELECT doc_id,
           sha256(text) AS content_sha256,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN octet_length(encode(text)) > 256 THEN 1 ELSE 0 END AS INT)
             AS is_large
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def mm_binary_content_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary columns + content addressing: materialize an opaque
    binary payload, sha256-address it, size-classify it.

    Pure JVM projection (encode/sha2/length) — the blob never crosses
    into Python.  This is the ingest shape for media lakes: (blob,
    metadata struct, content hash) with the hash powering dedup and
    shard-stable partitioning (hash-partition on content_sha256 is
    uniform by construction).
    """
    docs = tables(spark, sf_dir)["documents"]
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.sha2(blob, 256).alias("content_sha256"),
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.when(F.octet_length(blob) > 256, 1).otherwise(0).cast("int").alias("is_large"),
    )


def decode_media(blob: bytes, media_type: str) -> dict:
    """Decode a media blob → features.  REAL decoding requires codec
    libraries (PIL/ffmpeg/torchaudio) absent from this container —
    the deterministic fake below derives pseudo-dimensions from the
    content hash so the pipeline shape is fully testable; swap this
    function for the real codec at deployment.
    """
    if media_type not in ("fake/deterministic",):
        raise NotImplementedError(
            f"real {media_type!r} decoding needs codec libs (PIL/ffmpeg); "
            "only the deterministic test codec is available in-container"
        )
    h = hashlib.md5(blob).hexdigest()
    return {
        "width": 1 + int(h[:2], 16),
        "height": 1 + int(h[2:4], 16),
        "n_frames": 1 + int(h[4:5], 16),
    }


@register(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(1 + instr('0123456789abcdef', substr(md5(text), 1, 1)) * 16
                  + instr('0123456789abcdef', substr(md5(text), 2, 1)) - 17 AS INT)
             AS width,
           CAST(1 + instr('0123456789abcdef', substr(md5(text), 3, 1)) * 16
                  + instr('0123456789abcdef', substr(md5(text), 4, 1)) - 17 AS INT)
             AS height,
           CAST(1 + instr('0123456789abcdef', substr(md5(text), 5, 1)) - 1 AS INT)
             AS n_frames
    FROM documents
    """,
    tags=("multimodal", "udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline: binary blobs → per-item features
    via the (stubbed) codec, Arrow batch at a time.

    This exercises the real multimodal plumbing: binary column into
    Python as zero-copy Arrow batches, per-batch vectorized decode,
    typed struct-ish output schema.  The oracle replicates the
    deterministic fake codec in SQL (md5-derived dimensions), proving
    the UDF path computes exactly what it claims.
    """
    from adt_spark.context import spread

    docs = tables(spark, sf_dir)["documents"]
    # spread: a single-split scan would hand ALL blobs to one Python
    # worker; decode is the per-row-heavy step, so fan out first.
    with_blob = spread(docs).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(b, "fake/deterministic") for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return with_blob.mapInPandas(
        decode_batches, schema="doc_id long, width int, height int, n_frames int"
    )


_FRAME_STRIDE = 2


def sample_frames(blob: bytes, media_type: str, stride: int) -> list[dict]:
    """Frame sampling: decode → take every ``stride``-th frame →
    per-frame content hash.  The real codec (ffmpeg frame extraction)
    slots in exactly here; the deterministic fake derives per-frame
    bytes from (blob, frame_idx) so the expansion shape, ordering and
    addressing are fully testable in-container.
    """
    meta = decode_media(blob, media_type)
    out = []
    for idx in range(0, meta["n_frames"], stride):
        frame_bytes = blob + f"-frame-{idx}".encode()
        out.append({"frame_idx": idx, "frame_md5": hashlib.md5(frame_bytes).hexdigest()})
    return out


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, text,
               instr('0123456789abcdef', substr(md5(text), 5, 1)) AS n_frames
        FROM documents
    )
    SELECT doc_id,
           CAST(u.i AS INT) AS frame_idx,
           md5(text || '-frame-' || CAST(u.i AS VARCHAR)) AS frame_md5
    FROM m, unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE})) AS u(i)
    """,
    tags=("multimodal", "udf", "frames"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: each media blob expands to its sampled
    frames (every 2nd frame), each content-addressed — the
    row-expanding mapInPandas shape every video pipeline needs
    (decode → N frames per input row → per-frame features).

    Scale: expansion happens inside the Arrow batch iterator, so
    memory is bounded by batch size × stride fraction regardless of
    corpus size; downstream per-frame dedup reuses the hash-groupBy
    shape on frame_md5.  (Fake codec, real plumbing — see
    ``decode_media``.)
    """
    from adt_spark.context import spread

    docs = tables(spark, sf_dir)["documents"]
    with_blob = spread(docs).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for fr in sample_frames(blob, "fake/deterministic", _FRAME_STRIDE):
                    ids.append(doc_id)
                    idxs.append(fr["frame_idx"])
                    hashes.append(fr["frame_md5"])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return with_blob.mapInPandas(
        expand, schema="doc_id long, frame_idx int, frame_md5 string"
    )
