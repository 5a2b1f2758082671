"""Spec-level property checks for the two newest text algorithms.

Both operators make a PAPER-level claim their oracle test cannot see
(the oracle only proves Spark == DuckDB on the same formula):

- dedup_cdc_chunks claims LBFS shift-resistance: because cut points
  depend only on the local 3-gram, an insertion near the front of a
  document must NOT change the chunk hashes past the next surviving
  boundary — the property that makes chunk dedup work across edited
  near-duplicates.
- text_winnowing_fingerprints claims the Schleimer 2003 guarantee:
  any run of ≥ w + k − 1 = 6 shared tokens yields at least one shared
  fingerprint hash, whatever the surrounding context.

These tests drive the factored kernels over CONSTRUCTED documents and
verify the claims against an independent pure-Python model.
"""

from __future__ import annotations

import hashlib


def _cdc_py(ts: list[str]) -> list[tuple[str, int]]:
    """Independent Python model of the CDC kernel: [(chunk_md5, len)].
    Mirrors _cdc_chunk_rows exactly — cut after 1-based position i
    (3 ≤ i ≤ n−1) iff md5 of the 3-gram ENDING at i starts '0'."""
    n = len(ts)
    cuts = []
    if n >= 4:
        for i in range(3, n):
            g = " ".join(ts[i - 3 : i])
            if hashlib.md5(g.encode()).hexdigest()[0] == "0":
                cuts.append(i)
    bpos = [0] + cuts + [n]
    out = []
    for j in range(len(bpos) - 1):
        chunk = ts[bpos[j] : bpos[j + 1]]
        out.append((hashlib.md5(" ".join(chunk).encode()).hexdigest(), len(chunk)))
    return out


def _mk_tokens(seed: int, n: int) -> list[str]:
    # deterministic pseudo-random token stream over a 97-word vocab
    return [f"w{(i * 7919 + seed * 104729) % 97}" for i in range(n)]


def test_cdc_kernel_matches_python_model(spark):
    from adt_spark.operators.dedup import _cdc_chunk_rows

    ts = _mk_tokens(1, 300)
    df = spark.createDataFrame([(1, " ".join(ts))], "doc_id long, text string")
    got = [
        (r["c"]["h"], r["c"]["l"])
        for r in _cdc_chunk_rows(df).collect()
    ]
    assert got == _cdc_py(ts)
    # sanity: the stream actually produced multiple chunks, so the
    # shift test below exercises real boundaries
    assert len(got) >= 5


def test_cdc_insertion_is_shift_resistant(spark):
    """Prepending a token must preserve every chunk of the original
    document except the first (all cut positions shift by one but
    their deciding grams — and hence the cut SET and the chunk
    contents after the first boundary — are identical)."""
    from adt_spark.operators.dedup import _cdc_chunk_rows

    for seed in (1, 2, 3):
        base = _mk_tokens(seed, 250)
        t1 = base
        t2 = ["zzz"] + base
        df = spark.createDataFrame(
            [(1, " ".join(t1)), (2, " ".join(t2))], "doc_id long, text string"
        )
        rows = _cdc_chunk_rows(df).collect()
        h1 = [r["c"]["h"] for r in rows if r["doc_id"] == 1]
        h2 = {r["c"]["h"] for r in rows if r["doc_id"] == 2}
        assert len(h1) >= 5  # non-degenerate
        # every chunk after the first survives the insertion
        missing = [h for h in h1[1:] if h not in h2]
        assert missing == []


def test_winnowing_guarantee_shared_run(spark):
    """Any shared run of w + k − 1 = 6 tokens must contribute at least
    one shared fingerprint hash, for every context alignment — and the
    shared hash must be one of the run's own 3-gram hashes."""
    from adt_spark.operators.text import _winnow_rows

    run = ["r1", "r2", "r3", "r4", "r5", "r6"]
    run_gram_hashes = {
        hashlib.md5(" ".join(run[i : i + 3]).encode()).hexdigest()
        for i in range(len(run) - 2)
    }
    for pre1 in range(0, 5):
        for pre2 in (0, 3):
            d1 = [f"a{i}" for i in range(pre1)] + run + ["x1", "x2"]
            d2 = [f"b{i}" for i in range(pre2)] + run + ["y1"]
            df = spark.createDataFrame(
                [(1, " ".join(d1)), (2, " ".join(d2))],
                "doc_id long, text string",
            )
            rows = _winnow_rows(df).collect()
            f1 = {r.fp for r in rows if r.doc_id == 1}
            f2 = {r.fp for r in rows if r.doc_id == 2}
            shared = f1 & f2
            assert shared, (pre1, pre2)
            assert shared & run_gram_hashes, (pre1, pre2)
