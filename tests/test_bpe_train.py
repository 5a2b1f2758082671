"""text_bpe_train_merges pinned EXACTLY to an independent pure-Python
BPE trainer (Sennrich 2016 §3.2) — the verification an oracle-less
iterative operator needs: same vocab, same </w> convention, same
(count DESC, left, right) argmax, same greedy left-to-right merge.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from adt_spark.queries import load_all


def _py_bpe(sf_dir: str, rounds: int) -> list[tuple[int, str, str, int]]:
    con = duckdb.connect()
    freq = Counter(
        w
        for (w,) in con.execute(
            "SELECT unnest(string_split(text, ' ')) FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    syms = {w: [*w, "</w>"] for w in freq}
    out = []
    for rank in range(1, rounds + 1):
        cnt: Counter = Counter()
        for w, f in freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        # max count, ties -> lexicographically smallest (l, r)
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, left, right, c))
        for w in syms:
            s = syms[w]
            merged = []
            for x in s:
                if merged and merged[-1] == left and x == right:
                    merged[-1] = left + right
                else:
                    merged.append(x)
            syms[w] = merged
    return out


def test_bpe_train_matches_python_reference(spark, sf_dir):
    got = [
        (r.rank, r.left, r.right, int(r.pair_count))
        for r in sorted(
            load_all()["text_bpe_train_merges"].spark_fn(spark, sf_dir).collect()
        )
    ]
    want = _py_bpe(sf_dir, 4)
    assert got == want
    assert len(got) == 4
    # ranks strictly ordered and counts non-increasing is NOT required
    # by BPE (later merges can beat earlier residual counts), but the
    # table must be rank-complete
    assert [r for r, *_ in got] == [1, 2, 3, 4]


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """text_bpe_encode == encoding every document with the Python
    reference's merge table (same greedy application, applied in rank
    order) — the train→apply loop closed end-to-end."""
    merges = [(l, r) for _rank, l, r, _c in _py_bpe(sf_dir, 4)]
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, string_split(text, ' ') FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    enc_cache: dict[str, int] = {}

    def n_sym(word: str) -> int:
        if word not in enc_cache:
            s = [*word, "</w>"]
            for left, right in merges:
                out = []
                for x in s:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                s = out
            enc_cache[word] = len(s)
        return enc_cache[word]

    want = {
        doc_id: (len(words), sum(n_sym(w) for w in words))
        for doc_id, words in rows
    }
    got = {
        r.doc_id: (int(r.n_words), int(r.n_bpe_tokens))
        for r in load_all()["text_bpe_encode"].spark_fn(spark, sf_dir).collect()
    }
    assert got == want
