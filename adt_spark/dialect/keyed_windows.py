"""Keyed-window compression: evaluate RANGE-frame windows over the
distinct (partition, order-key) grain instead of over every row.

Why (round-12 optimization; guide §2.5/§2.6 skew+stragglers, §8 decide
with small rows): a window ``PARTITION BY p ORDER BY k RANGE …`` has
frame membership that is a pure function of the KEY VALUES present —
every row of one ``(p, k)`` peer group sees the same frame row-set.
Spark evaluates such a window with one task per distinct ``p``; with a
low-cardinality ``p`` (the EXCLUDE family partitions lineitem by
``l_returnflag`` — 3 values) the window stage runs 3 tasks at ANY
cluster size and each task holds ~n/3 rows (round-11 verdict item 1:
8 cores beat 32 on the whole family).  Worse, a moving-start frame
ending at UNBOUNDED FOLLOWING goes through
UnboundedFollowingWindowFunctionFrame — O(n²) per partition (measured
round 12: q_window_exclude_minmax 201 s at sf0.1 vs 0.9 s compressed).

The rewrite, applied AFTER ``rewrite_window_frames`` (so it consumes
the mechanical EXCLUDE/UBF-free emission):

1. one parallel ``GROUP BY p, k`` computes per-key partials
   (sum/count/min/max of each aggregate argument),
2. the ORIGINAL window specs run unchanged over that compressed table
   (distinct keys ⇒ RANGE frames select the same key groups;
   cardinality(p × k) rows instead of n),
3. a null-safe LEFT JOIN (`<=>`) fans the results back onto the base
   rows — one row per (p, k) by construction, so the join preserves
   row count exactly; AQE broadcasts the compressed side at runtime.

Per-function equivalence (the pass refuses anything else):

- ``sum(e)``   → ``sum(per-key sum(e))``: sums ignore NULLs on both
  levels; an all-NULL key contributes a NULL partial which the outer
  sum ignores; an empty frame is NULL on both levels.  Integer sums
  keep their type exactly.  DECIMAL sums widen their declared
  precision a second time (p+10 → p+20, capped 38) — VALUES are
  identical unless the single-level sum would overflow to NULL where
  the two-level one still fits; same disclosure family as
  ``rewrite_window_frames``'s subtraction RuntimeWarning.
- ``count(e)`` / ``count(*)`` → ``COALESCE(sum(per-key count), 0)``:
  count over an empty frame is 0, sum over an empty frame is NULL —
  the COALESCE restores count's never-NULL contract.
- ``min/max(e)`` → ``min/max(per-key min/max(e))``: associative.
- ``first_value(e)`` / ``last_value(e)`` where ``e`` references ONLY
  the order key: e is constant within a peer group, so the first/last
  frame row's value is the first/last KEY's value; the per-key partial
  is ``min(e)`` (all group rows agree, NULL iff e(k) is NULL).
  Arguments referencing any other column are refused — under tied
  keys their first/last row would be tie-order-dependent.
- ``dense_rank()`` (the rewriter's injected peer-group index, form B
  below): dense_rank over rows ordered by k equals row-rank over the
  DISTINCT ks — recomputed on the compressed table with the identical
  spec.

NULL order keys: both levels group NULLs into one peer group and both
levels evaluate the same RANGE semantics over the same key multiset,
so NULL-key rows see identical frames (pinned by
tests/test_keyed_windows.py's null+ties matrix).

Accepted statement shapes (anything else returns None — a sound
passthrough, mirroring window_frames' refusal discipline):

- form A: ``SELECT <items> FROM <ident>`` — single plain-identifier
  source, no WHERE/GROUP/ORDER/JOIN/… tail;
- form B: form A whose source is ``rewrite_window_frames``'s
  dense-rank wrap ``(SELECT *, dense_rank() OVER (PARTITION BY p
  ORDER BY k NULLS LAST) AS __adt_drN FROM <ident>) <alias>`` with the
  injected column used ONLY inside OVER clauses.

Every window call must share one bare-column PARTITION BY and one
underlying ORDER BY column (bare, or ``CAST((k) AS <type>)`` as the
value-range split emits); frames must be RANGE-mode (or absent);
ROWS/GROUPS frames, IGNORE NULLS, FILTER, DISTINCT aggregates,
subqueries and nondeterministic arguments all refuse.

Scale note: the pass trades one extra (parallel, partial-aggregated)
shuffle + broadcast join for collapsing the window input from n rows
to the key-grain cardinality.  When the order key is near-unique the
compressed table is ~n rows and the trade is a small loss; the engine
applies it unconditionally because value-offset RANGE analytics are
banded by construction (coarse keys), and ``ADT_KEYED_WINDOWS=0``
switches it off per session.
"""
from __future__ import annotations

import os
import re

from adt_spark.dialect.window_frames import (
    _OVER_RE,
    _PRE_RE,
    _call_before_over,
    _mask_literals,
    _match_paren,
    _split_top_level,
)

#: frame-mode keyword at top level of an OVER body; bounds are NOT
#: parsed (the compressed emission reuses the body verbatim), so this
#: also accepts the rewriter's CAST(… AS DECIMAL(38,18)) value-split
#: bounds that window_frames' own _BOUND grammar predates
_MODE_RE = re.compile(r"\b(rows|range|groups)\b", re.IGNORECASE)

_SAFE_FNS = {"sum", "count", "min", "max", "first_value", "last_value"}

#: nondeterministic / row-identity functions whose presence in an
#: aggregate argument makes per-key partials unsound
_NONDET = {
    "rand", "randn", "random", "uuid", "shuffle",
    "monotonically_increasing_id", "current_timestamp", "now",
    "current_date", "current_timezone", "input_file_name",
    "spark_partition_id", "row_number",
}

#: keywords/type names allowed (besides the order column) in a
#: first_value/last_value argument
_FV_KEYWORDS = {
    "cast", "as", "null", "case", "when", "then", "else", "end", "is",
    "not", "and", "or", "coalesce", "nullif", "interval", "decimal",
    "bigint", "int", "integer", "double", "float", "date", "timestamp",
    "string", "smallint", "tinyint", "boolean", "day", "month", "year",
    "hour", "minute", "second", "true", "false",
}

_IDENT_ONLY = re.compile(r"^[A-Za-z_][A-Za-z_0-9]*$")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")
_CAST_KEY_RE = re.compile(
    r"^cast\s*\(\s*\(?\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)?\s+as\s+"
    r"[A-Za-z_0-9(),\s]+\)$",
    re.IGNORECASE,
)
_SELECT_RE = re.compile(r"^\s*select\s", re.IGNORECASE)
_FROM_RE = re.compile(r"\bfrom\b", re.IGNORECASE)
_ORD_TAIL_NULLS = re.compile(r"\bnulls\s+(first|last)\s*$", re.IGNORECASE)
_ORD_TAIL_DIR = re.compile(r"\b(asc|desc)\s*$", re.IGNORECASE)
_WRAP_RE = re.compile(
    r"^\(\s*select\s+\*\s*,\s*dense_rank\(\)\s+over\s*\("
    r"partition\s+by\s+([A-Za-z_][\w]*)\s+order\s+by\s+([A-Za-z_][\w]*)"
    r"\s+nulls\s+last\)\s+as\s+(__adt_dr\d+)\s+from\s+([A-Za-z_][\w]*)"
    r"\s*\)\s*[A-Za-z_][\w]*$",
    re.IGNORECASE,
)


def _depths(masked: str) -> list[int]:
    """Paren depth BEFORE each character of the masked string."""
    out = []
    d = 0
    for ch in masked:
        out.append(d)
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
    return out


def _order_parts(o_txt: str):
    """order-by text → its underlying column name (the bare
    identifier, or the column inside a ``CAST((k) AS <type>)``
    monotone recast), or None when the key shape is unsupported."""
    expr = o_txt.strip()
    m = _ORD_TAIL_NULLS.search(expr)
    if m:
        expr = expr[: m.start()].rstrip()
    m = _ORD_TAIL_DIR.search(expr)
    if m:
        expr = expr[: m.start()].rstrip()
    if _IDENT_ONLY.match(expr):
        return expr
    m = _CAST_KEY_RE.match(expr)
    if m:
        return m.group(1)
    return None


def compress_keyed_windows(sql: str) -> str | None:
    """The compressed statement, or None when any soundness gate
    refuses (callers fall back to the uncompressed text)."""
    if os.environ.get("ADT_KEYED_WINDOWS", "1").lower() in ("0", "false", "off"):
        return None
    if not _SELECT_RE.match(sql):
        return None
    masked = _mask_literals(sql)
    depths = _depths(masked)

    # --- split SELECT items / FROM source -------------------------------
    from_m = None
    for m in _FROM_RE.finditer(masked):
        if depths[m.start()] == 0:
            from_m = m
            break
    if from_m is None:
        return None
    sel_end = _SELECT_RE.match(sql).end()
    items = sql[sel_end : from_m.start()]
    source = sql[from_m.end() :].strip()

    dr_name = None
    if _IDENT_ONLY.match(source):
        base = source
        wrap_p = wrap_k = None
    else:
        wm = _WRAP_RE.match(re.sub(r"\s+", " ", source))
        if not wm:
            return None
        wrap_p, wrap_k, dr_name, base = wm.group(1), wm.group(2), wm.group(3), wm.group(4)

    # --- collect window calls in the items ------------------------------
    m_items = _mask_literals(items)
    calls = []  # (start, end, fn, args, p, o_txt, frame_txt, key_col)
    part_col = None
    key_col = None
    for om in _OVER_RE.finditer(m_items):
        cb = _call_before_over(m_items, items, om.start())
        if cb is None:
            return None
        fn_start, fn, args = cb
        if fn not in _SAFE_FNS:
            return None
        over_open = om.end() - 1
        over_close = _match_paren(m_items, over_open)
        body = items[over_open + 1 : over_close]
        m_body = _mask_literals(body)
        b_depths = _depths(m_body)
        fm = None
        for cand in _MODE_RE.finditer(m_body):
            if b_depths[cand.start()] == 0:
                fm = cand
                break
        frame_txt = None
        pre = body
        if fm:
            if fm.group(1).lower() != "range":
                return None
            frame_txt = body[fm.start() :].strip()
            pre = body[: fm.start()]
        pm = _PRE_RE.match(_mask_literals(pre))
        if not pm or not pm.group("p"):
            return None
        p_txt = pre[pm.start("p") : pm.end("p")].strip()
        if not _IDENT_ONLY.match(p_txt):
            return None
        if part_col is None:
            part_col = p_txt
        elif p_txt.lower() != part_col.lower():
            return None
        o_txt = None
        ucol = None
        if pm.group("o") is not None:
            o_txt = pre[pm.start("o") : pm.end("o")].strip()
            if len(_split_top_level(o_txt)) != 1:
                return None  # composite ORDER BY — grain is not one key
            ucol = _order_parts(o_txt)
            if ucol is None:
                return None
            if dr_name is not None and ucol.lower() == dr_name.lower():
                ucol = wrap_k  # the injected peer index derives from wrap_k
            if key_col is None:
                key_col = ucol
            elif ucol.lower() != key_col.lower():
                return None
        elif frame_txt is not None:
            return None  # frame without ORDER BY — let Spark refuse it

        # --- argument gates ---
        m_args = _mask_literals(args)
        low_args = m_args.lower()
        if re.search(r"\b(select|over|distinct)\b", low_args):
            return None
        idents = {t.lower() for t in _IDENT_RE.findall(m_args)}
        if idents & _NONDET:
            return None
        if fn in ("first_value", "last_value"):
            if o_txt is None:
                return None  # unordered first/last is tie-order-dependent
            allowed = set(_FV_KEYWORDS)
            if key_col is not None:
                allowed.add(key_col.lower())
            if dr_name is not None:
                allowed.add(dr_name.lower())
            if idents - allowed:
                return None
        if fn == "count" and args.strip() != "*" and not args.strip():
            return None
        calls.append((fn_start, over_close + 1, fn, args.strip(), o_txt, frame_txt, body))
    if not calls:
        return None
    if part_col is None:
        return None
    if key_col is None:
        # only whole-partition aggregates — a plain groupBy join would do,
        # but nothing in the engine emits that shape alone; refuse.
        return None
    if dr_name is not None:
        if wrap_p.lower() != part_col.lower() or key_col.lower() != wrap_k.lower():
            return None

    # --- partials (dedup by fn-kind + argument text) ---------------------
    partial_fn = {"sum": "sum", "count": "count", "min": "min",
                  "max": "max", "first_value": "min", "last_value": "min"}
    partials: dict[tuple, str] = {}
    partial_sql: list[str] = []

    def _partial(fn: str, args: str) -> str:
        pf = partial_fn[fn]
        key = (pf, re.sub(r"\s+", " ", args).lower())
        col = partials.get(key)
        if col is None:
            col = f"__kw_p{len(partials)}"
            partials[key] = col
            partial_sql.append(f"{pf}({args}) AS {col}")
        return col

    # --- window expressions over the compressed table + replacements ----
    win_cols: dict[str, str] = {}
    win_sql: list[str] = []
    repls = []  # (start, end, colname)
    for fn_start, end, fn, args, o_txt, frame_txt, body in calls:
        call_key = re.sub(r"\s+", " ", items[fn_start:end]).lower()
        col = win_cols.get(call_key)
        if col is None:
            pcol = _partial(fn, args)
            over = f"OVER ({body.strip()})"
            if fn == "sum":
                wexpr = f"sum({pcol}) {over}"
            elif fn == "count":
                wexpr = f"COALESCE(sum({pcol}) {over}, 0)"
            elif fn in ("min", "first_value"):
                wexpr = f"{'min' if fn == 'min' else 'first_value'}({pcol}) {over}"
            elif fn == "max":
                wexpr = f"max({pcol}) {over}"
            else:  # last_value
                wexpr = f"last_value({pcol}) {over}"
            col = f"__kw_w{len(win_cols)}"
            win_cols[call_key] = col
            win_sql.append(f"{wexpr} AS {col}")
        repls.append((fn_start, end, col))

    new_items = items
    for start, end, col in sorted(repls, reverse=True):
        new_items = new_items[:start] + col + new_items[end:]
    if dr_name is not None and re.search(
        rf"\b{re.escape(dr_name)}\b", _mask_literals(new_items), re.IGNORECASE
    ):
        return None  # injected index used outside OVER — not joined back

    grp = (
        f"SELECT {part_col}, {key_col}, {', '.join(partial_sql)} "
        f"FROM {base} GROUP BY {part_col}, {key_col}"
    )
    win_src = f"({grp}) __kw_g"
    if dr_name is not None:
        win_src = (
            f"(SELECT *, dense_rank() OVER (PARTITION BY {part_col} "
            f"ORDER BY {key_col} NULLS LAST) AS {dr_name} FROM ({grp})) __kw_g"
        )
    win = (
        f"SELECT {part_col} AS __kw_jp, {key_col} AS __kw_jk, "
        f"{', '.join(win_sql)} FROM {win_src}"
    )
    return (
        f"SELECT {new_items.strip()}\n"
        f"FROM {base} LEFT JOIN ({win}) __kw_w\n"
        f"  ON {base}.{part_col} <=> __kw_w.__kw_jp "
        f"AND {base}.{key_col} <=> __kw_w.__kw_jk"
    )
