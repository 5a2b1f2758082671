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
