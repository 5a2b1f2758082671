"""Global-window rewrite for raw SQL — dodging the single-partition
WindowExec cliff.

An unpartitioned ``… OVER (ORDER BY …)`` executes on ONE task in
Spark (the whole input is exchanged to a SinglePartition before
WindowExec) — the classic scale wall a ported adt script hits,
because DataFusion executes the same SQL with a parallel sort +
streaming evaluation (reference SQL pass-through:
``crates/cli/src/main.rs:116`` — any SQL the user types goes straight
to the engine, so global windows are common in adt scripts;
``datafusion-functions-window``, Cargo.lock:1818, is the inherited
function set).

This pass detects the sound shape and executes it through the
generalized two-phase constructions in
``adt_spark.operators.sampling`` (deterministic range pids → local
windows → bounded offset collects re-entered as ≤n_parts-row
broadcast joins; boundary-invariant output, oracled by the q_sql_*
family):

- ranks: row_number / rank / dense_rank / percent_rank / cume_dist /
  ntile(k) → ``attach_global_ranks``;
- running aggregates with the default peer-inclusive frame:
  sum / count / min / max / avg (+ the round-10 variance family) →
  ``attach_global_running_aggs``;
- bounded-frame aggregates (round-11): sum / count / min / max /
  avg over ``ROWS BETWEEN a PRECEDING AND b FOLLOWING`` (either
  bound may be CURRENT ROW; literal row counts) →
  ``attach_global_bounded_aggs``;
- offsets: lag / lead (literal j), including the round-11 3-arg
  default-value form → ``attach_global_offsets``;
- frame values with the default frame (round-10): first_value /
  last_value / nth_value(expr, literal n), plus round-11
  ``first_value/last_value(x) IGNORE NULLS`` →
  ``attach_global_first_last``.

Execution: the INNER BLOCK (everything below the projection —
FROM body, WHERE, GROUP BY, HAVING, plus any CTE prefix) runs as its
own statement; each supported unpartitioned window call becomes a
pre-computed column over that result; the remaining projection /
ORDER BY / LIMIT runs over the ranked temp view with the calls
substituted.  Window calls that stay native (partitioned, OVER(),
exotic frames — RANGE/GROUPS/non-literal ROWS bounds, bounded-frame
variance, nth_value IGNORE NULLS, lag/lead IGNORE NULLS,
non-literal offsets) are LEFT IN PLACE and evaluate over the view's
rows — the inner block's rows — unchanged.

Scope (round-10, widened past the round-9 single-relation rule):

- one top-level SELECT; the FROM body may be a relation, a
  ``fmt.`path``` URL table, a parenthesized derived table (GROUP
  BY / join / anything inside), or a top-level JOIN chain; a WITH
  prefix is carried verbatim onto the inner statement;
- a top-level GROUP BY [HAVING] is supported when every projection
  item is a bare column, an explicit ``expr AS alias``, or exactly
  one rewritable window call with an alias (window keys/args may
  then be aggregate expressions — they are computed inside the
  aggregated inner block);
- window ORDER BY keys are arbitrary expressions (plain columns
  stay qualifier-stripped); every call — RANKING included since
  round-11 (r10 verdict #4) — may use its own order: the executor
  builds one pid assignment per DISTINCT order;
- no top-level DISTINCT / set ops / ``*`` or ``alias.*`` projection
  items (a star would leak the injected ``_adt_g*`` columns —
  ADVICE r9 hardened this from "leading ``*``" to ANY top-level
  star item).

Anything else passes through UNTOUCHED, which stays correct, merely
on the cliff; resolution errors inside the rewrite (ambiguous
columns from a self-join FROM body, aliases as window keys, …) fall
back to the native path the same way.  Unlike the GROUPS/EXCLUDE
rewrites (which refuse loudly because Spark cannot run the original
at all), the unrewritten global window is semantically fine — so
the fallback here is pass-through, never an error.
"""

from __future__ import annotations

import itertools
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adt_spark.dialect.window_frames import _mask_literals, _match_paren

__all__ = ["maybe_rewrite_global_rank"]

_RANK_CALL_RE = re.compile(
    r"\b(?P<fn>row_number|rank|dense_rank|percent_rank|cume_dist)"
    r"\s*\(\s*\)\s+over\s*\("
    r"|\b(?P<ntile>ntile)\s*\(\s*(?P<k>\d+)\s*\)\s+over\s*\(",
    re.IGNORECASE,
)

#: running-aggregate window calls (the default-frame family the
#: two-phase running-agg construction covers); the lookbehind keeps
#: `checksum(`-style identifiers from matching `sum(`
_AGG_CALL_RE = re.compile(
    r"(?<![\w.$])(?P<afn>sum|count|min|max|avg"
    r"|var_pop|var_samp|variance|stddev|stddev_pop|stddev_samp)\s*\(",
    re.IGNORECASE,
)

#: offset window calls (lag/lead)
_OFF_CALL_RE = re.compile(
    r"(?<![\w.$])(?P<ofn>lag|lead)\s*\(",
    re.IGNORECASE,
)

#: frame-value window calls (round-10: first/last/nth)
_FLN_CALL_RE = re.compile(
    r"(?<![\w.$])(?P<ffn>first_value|last_value|nth_value)\s*\(",
    re.IGNORECASE,
)

#: one plain ORDER BY key: [qualifier.]column [ASC|DESC] [NULLS …]
_KEY_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
    r"(?:\s+(?P<dir>asc|desc))?"
    r"(?:\s+nulls\s+(?P<nulls>first|last))?\s*$",
    re.IGNORECASE,
)

#: trailing direction tokens of an EXPRESSION key
_KEY_TAIL_RE = re.compile(
    r"(?:\s+(?P<dir>asc|desc))?"
    r"(?:\s+nulls\s+(?P<nulls>first|last))?\s*$",
    re.IGNORECASE,
)

#: single relation: name / qualified name / fmt.`path`, optional alias
_REL_RE = re.compile(
    r"^\s*(?P<rel>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*(?:\.`[^`]*`)?)"
    r"(?:\s+(?:as\s+)?(?P<alias>[A-Za-z_]\w*))?\s*$",
    re.IGNORECASE,
)

#: parenthesized derived table with alias
_DERIVED_RE = re.compile(
    r"^\s*\(.*\)\s*(?:as\s+)?(?P<alias>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE | re.DOTALL,
)

#: top-level (depth-0) blockers inside the MAIN statement body
_BLOCKERS_TOP = re.compile(
    r"\b(union|intersect|except|distinct|recursive)\b", re.IGNORECASE
)

#: a projection item that is `*` or `alias.*` (ADVICE r9: reject ANY
#: top-level star, not just a leading one)
_STAR_ITEM_RE = re.compile(r"^\s*(?:[A-Za-z_]\w*\s*\.\s*)?\*\s*$")

#: explicit `expr AS alias` tail (GROUP-mode non-window items)
_AS_ALIAS_RE = re.compile(r"\s+as\s+(?P<alias>[A-Za-z_]\w*)\s*$", re.IGNORECASE)

_view_counter = itertools.count()

#: the one live GROUP-mode cached inner (see maybe_rewrite_global_rank:
#: released when the next rewrite caches its own; a previous query's
#: result DataFrame consumed after that recomputes — correct, uncached)
_cached_inner = None


def _split_top_comma_spans(s: str) -> list[tuple[int, int]]:
    """(start, end) spans of depth-0 comma-separated parts."""
    spans, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            spans.append((start, i))
            start = i + 1
    spans.append((start, len(s)))
    return spans


def _split_top_commas(s: str) -> list[str]:
    return [s[a:b] for a, b in _split_top_comma_spans(s)]


def _blank_parens(s: str) -> str:
    """Blank everything inside parentheses (positions preserved) so
    depth-0 keyword scans cannot see subquery / CTE-body innards."""
    out, depth = [], 0
    for ch in s:
        if ch == "(":
            depth += 1
            out.append("(")
        elif ch == ")":
            depth -= 1
            out.append(")")
        else:
            out.append(ch if depth == 0 else " ")
    return "".join(out)


def _parse_order_keys(masked_body: str, src_body: str):
    """ORDER BY body → list of key dicts or None when malformed.

    Each key: {"kind": "col"|"expr", "ident": dedup identity,
    "src": source expression text, "method": Column sort-method
    name}.  Plain (possibly qualified) column refs stay columns with
    the qualifier stripped; anything else is an expression key
    carried textually (masked twin checked for window/subquery
    tokens)."""
    keys = []
    for a, b in _split_top_comma_spans(masked_body):
        mpart, spart = masked_body[a:b], src_body[a:b]
        m = _KEY_RE.match(mpart)
        if m:
            direction = (m.group("dir") or "asc").lower()
            nulls = (m.group("nulls") or "").lower()
            method = direction + (f"_nulls_{nulls}" if nulls else "")
            col = m.group("col").split(".")[-1].lower()
            keys.append(
                {"kind": "col", "ident": col, "src": col, "method": method}
            )
            continue
        tm = _KEY_TAIL_RE.search(mpart)
        expr_m = mpart[: tm.start()]
        expr_s = spart[: tm.start()].strip()
        if not expr_s or re.search(r"\b(over|select)\b", expr_m, re.IGNORECASE):
            return None
        direction = (tm.group("dir") or "asc").lower()
        nulls = (tm.group("nulls") or "").lower()
        method = direction + (f"_nulls_{nulls}" if nulls else "")
        keys.append(
            {
                "kind": "expr",
                "ident": " ".join(expr_s.split()),
                "src": expr_s,
                "method": method,
            }
        )
    return keys


def _order_ident(keys) -> tuple:
    return tuple((k["ident"], k["method"]) for k in keys)


_DEFAULT_FRAME = "range between unbounded preceding and current row"

#: bounded ROWS frames the round-11 bounded-aggregate construction
#: covers (normalized text → (a_preceding, b_following))
_BOUNDED_ROWS_FRAMES = [
    (
        re.compile(r"^rows between (\d+) preceding and current row$"),
        lambda m: (int(m.group(1)), 0),
    ),
    (
        re.compile(r"^rows between current row and (\d+) following$"),
        lambda m: (0, int(m.group(1))),
    ),
    (
        re.compile(r"^rows between (\d+) preceding and (\d+) following$"),
        lambda m: (int(m.group(1)), int(m.group(2))),
    ),
    (
        re.compile(r"^rows between current row and current row$"),
        lambda m: (0, 0),
    ),
    # the abbreviated form: ROWS j PRECEDING = BETWEEN j PRECEDING
    # AND CURRENT ROW
    (re.compile(r"^rows (\d+) preceding$"), lambda m: (int(m.group(1)), 0)),
    # round-11 second wave: UNBOUNDED sides (None) — the
    # out-of-partition contribution becomes a prefix/suffix-folded
    # per-pid totals scalar instead of an edge array.  Note the
    # row-exclusive cumulative frame (UNBOUNDED PRECEDING .. CURRENT
    # ROW) differs from the default RANGE frame under tied keys, so
    # it must route through the ROW-space construction.
    (
        re.compile(r"^rows between unbounded preceding and current row$"),
        lambda m: (None, 0),
    ),
    (
        re.compile(
            r"^rows between unbounded preceding and (\d+) following$"
        ),
        lambda m: (None, int(m.group(1))),
    ),
    (
        re.compile(
            r"^rows between (\d+) preceding and unbounded following$"
        ),
        lambda m: (int(m.group(1)), None),
    ),
    (
        re.compile(
            r"^rows between current row and unbounded following$"
        ),
        lambda m: (0, None),
    ),
    (
        re.compile(
            r"^rows between unbounded preceding and unbounded following$"
        ),
        lambda m: (None, None),
    ),
    (
        re.compile(r"^rows unbounded preceding$"),
        lambda m: (None, 0),
    ),
    # round-11 third wave: NEGATIVE bounds (frames strictly before /
    # after the current row — including the reversed complements the
    # moving-start UBF pass emits).  Encoded as signed offsets; the
    # executor rewrites frame [lo, hi] with hi<0 as the [lo−hi, 0]
    # aggregate globally LAGGED by −hi (and lo>0 as a LEAD) — the
    # value of a shifted frame is the unshifted frame's value at the
    # shifted position.
    (
        re.compile(r"^rows between (\d+) preceding and (\d+) preceding$"),
        lambda m: (int(m.group(1)), -int(m.group(2))),
    ),
    (
        re.compile(
            r"^rows between unbounded preceding and (\d+) preceding$"
        ),
        lambda m: (None, -int(m.group(1))),
    ),
    (
        re.compile(r"^rows between (\d+) following and (\d+) following$"),
        lambda m: (-int(m.group(1)), int(m.group(2))),
    ),
    (
        re.compile(
            r"^rows between (\d+) following and unbounded following$"
        ),
        lambda m: (-int(m.group(1)), None),
    ),
]


def _parse_over_order(masked: str, sql: str, over_open: int):
    """OVER(...) body at ``over_open`` → (keys, spec_close, frame)
    when it is an unpartitioned ORDER BY with the default frame
    (frame None) or a supported literal-bounded ROWS frame (frame =
    (a, b) row counts); (None, close, None) when the call should stay
    native; raises ValueError on unbalanced parens (whole statement
    passes through)."""
    spec_close = _match_paren(masked, over_open)
    spec_m = masked[over_open + 1 : spec_close]
    spec_s = sql[over_open + 1 : spec_close]
    sm = re.match(r"^\s*order\s+by\s+", spec_m, re.IGNORECASE)
    if sm is None:
        return None, spec_close, None  # partitioned / OVER() — native
    body_m, body_s = spec_m[sm.end():], spec_s[sm.end():]
    fm = re.search(r"\b(range|rows|groups)\b", body_m, re.IGNORECASE)
    frame = None
    if fm:
        frame_s = " ".join(body_m[fm.start():].split()).lower()
        if frame_s != _DEFAULT_FRAME:
            for rex, mk in _BOUNDED_ROWS_FRAMES:
                m2 = rex.match(frame_s)
                if m2:
                    frame = mk(m2)
                    break
            else:
                return None, spec_close, None  # unsupported frame
        body_m, body_s = body_m[: fm.start()], body_s[: fm.start()]
    keys = _parse_order_keys(body_m, body_s)
    if keys is None:
        return None, spec_close, None  # unparseable keys — native path
    return keys, spec_close, frame


def _arg_guard(masked: str, open_pos: int, close_pos: int) -> bool:
    """True when a call's argument text is safe to re-evaluate (no
    nested window / subquery)."""
    return not re.search(
        r"\b(over|select)\b", masked[open_pos + 1 : close_pos], re.IGNORECASE
    )


def maybe_rewrite_global_rank(spark: SparkSession, sql: str) -> DataFrame | None:
    """Execute ``sql`` through the two-phase global-window
    constructions when it matches the sound shape (module docstring);
    None when it does not (caller falls back to plain ``spark.sql``)."""
    stripped = sql.rstrip()
    if stripped.endswith(";"):
        stripped = stripped[:-1]
    sql = stripped
    masked = _mask_literals(sql)
    if not re.search(r"\bover\b", masked, re.IGNORECASE):
        return None
    has_any = (
        _RANK_CALL_RE.search(masked)
        or _AGG_CALL_RE.search(masked)
        or _OFF_CALL_RE.search(masked)
        or _FLN_CALL_RE.search(masked)
    )
    if not has_any:
        return None

    # --- statement shape ---------------------------------------------
    blanked = _blank_parens(masked)
    cte_src = ""
    main_start = 0
    if re.match(r"\s*with\b", blanked, re.IGNORECASE):
        ms = re.search(r"\bselect\b", blanked, re.IGNORECASE)
        if ms is None:
            return None
        cte_src = sql[: ms.start()]
        main_start = ms.start()
    body_blanked = blanked[main_start:]
    if _BLOCKERS_TOP.search(body_blanked):
        return None
    if len(re.findall(r"\bselect\b", body_blanked, re.IGNORECASE)) != 1:
        return None
    sm = re.match(r"\s*select\s", body_blanked, re.IGNORECASE)
    if sm is None:
        return None
    fm = re.search(r"\bfrom\b", body_blanked, re.IGNORECASE)
    if fm is None or fm.start() < sm.end():
        return None
    sel_span = (main_start + sm.end(), main_start + fm.start())
    tail_start = main_start + fm.end()

    clause_pos = {}
    for kw, pat in (
        ("where", r"\bwhere\b"),
        ("group", r"\bgroup\s+by\b"),
        ("having", r"\bhaving\b"),
        ("order", r"\border\s+by\b"),
        ("limit", r"\blimit\b"),
    ):
        m = re.search(pat, blanked[tail_start:], re.IGNORECASE)
        if m:
            clause_pos[kw] = (tail_start + m.start(), tail_start + m.end())
    order_kws = [k for k in ("where", "group", "having", "order", "limit")
                 if k in clause_pos]
    starts = [clause_pos[k][0] for k in order_kws]
    if starts != sorted(starts):
        return None  # clauses out of canonical order — malformed
    if "having" in clause_pos and "group" not in clause_pos:
        return None
    bounds = starts + [len(sql)]
    from_body = sql[tail_start : bounds[0] if starts else len(sql)].strip()
    if not from_body:
        return None
    clause_src = {}
    for i, k in enumerate(order_kws):
        clause_src[k] = sql[clause_pos[k][1] : bounds[i + 1]].strip()
    where_src = clause_src.get("where")
    group_src = clause_src.get("group")
    having_src = clause_src.get("having")
    order_src = clause_src.get("order")
    limit_src = clause_src.get("limit")
    if limit_src is not None and not re.fullmatch(r"\d+", limit_src):
        return None  # LIMIT ALL / OFFSET forms — out of scope
    if order_src and re.search(
        r"\bover\b", _mask_literals(order_src), re.IGNORECASE
    ):
        return None

    # --- projection items (ANY top-level star is rejected) -----------
    sel_masked = masked[sel_span[0] : sel_span[1]]
    item_spans = [
        (sel_span[0] + a, sel_span[0] + b)
        for a, b in _split_top_comma_spans(sel_masked)
    ]
    for a, b in item_spans:
        if _STAR_ITEM_RE.match(masked[a:b]):
            return None  # would leak the injected _adt_g* columns

    # --- collect rewritable window calls ------------------------------
    # every entry: dict(start, end, family, fn, keys, arg_src, j, n)
    calls = []
    try:
        for m in _RANK_CALL_RE.finditer(masked):
            over_open = m.end() - 1
            keys, _close, frame = _parse_over_order(masked, sql, over_open)
            if keys is None or frame is not None:
                spec = " ".join(
                    sql[over_open + 1 : _match_paren(masked, over_open)].split()
                )
                if re.match(r"^order\s+by\s+", spec, re.IGNORECASE):
                    return None  # framed/odd-keyed ranking — whole stmt native
                continue  # partitioned ranking — native, stays put
            close = _match_paren(masked, over_open)
            fn = (m.group("fn") or m.group("ntile")).lower()
            if fn == "ntile":
                fn = f"ntile({int(m.group('k'))})"
            calls.append(
                dict(start=m.start(), end=close + 1, family="rank", fn=fn,
                     keys=keys, arg_src=None, j=None, n=None, frame=None,
                     ign=False, default_src=None)
            )
        for fam, call_re, group in (
            ("agg", _AGG_CALL_RE, "afn"),
            ("off", _OFF_CALL_RE, "ofn"),
            ("fln", _FLN_CALL_RE, "ffn"),
        ):
            for m in call_re.finditer(masked):
                open_pos = m.end() - 1
                arg_close = _match_paren(masked, open_pos)
                om = re.match(
                    r"\s+(?:(?P<nulls>ignore|respect)\s+nulls\s+)?over\s*\(",
                    masked[arg_close + 1 :],
                    re.IGNORECASE,
                )
                if om is None:
                    continue  # plain (non-window) call — native
                nulls_tok = (om.group("nulls") or "").lower()
                over_open = arg_close + 1 + om.end() - 1
                spec_close_g = _match_paren(masked, over_open)
                if (
                    fam == "agg"
                    and not masked[over_open + 1 : spec_close_g].strip()
                    and not nulls_tok
                ):
                    # empty OVER () — whole-input scalar aggregate
                    # (round-11 second wave): one parallel aggregation
                    # + typed literal, instead of Spark's
                    # SinglePartition whole-input window
                    fn = m.group(group).lower()
                    if fn not in ("sum", "count", "min", "max", "avg"):
                        continue  # variance OVER () — native
                    if not _arg_guard(masked, open_pos, arg_close):
                        return None
                    parts = _split_top_commas(sql[open_pos + 1 : arg_close])
                    if len(parts) != 1:
                        continue
                    calls.append(
                        dict(start=m.start(), end=spec_close_g + 1,
                             family="glob", fn=fn, keys=[],
                             arg_src=parts[0].strip(), j=None, n=None,
                             frame=None, ign=False, default_src=None)
                    )
                    continue
                keys, spec_close, frame = _parse_over_order(
                    masked, sql, over_open
                )
                if keys is None:
                    continue  # partitioned / exotic frame — native
                if not _arg_guard(masked, open_pos, arg_close):
                    return None  # nested window/subquery in the argument
                fn = m.group(group).lower()
                parts = _split_top_commas(sql[open_pos + 1 : arg_close])
                j = n = None
                ign = nulls_tok == "ignore"
                default_src = None
                if fam == "agg":
                    if len(parts) != 1 or ign:
                        continue  # DISTINCT / multi-arg / bad syntax
                    if frame is not None and fn not in (
                        "sum", "count", "min", "max", "avg"
                    ):
                        continue  # bounded-frame variance — native
                    if (
                        frame is not None
                        and frame[0] is not None
                        and frame[1] is not None
                        and frame[0] + frame[1] < 0
                    ):
                        continue  # lo > hi — invalid frame, Spark reports
                    arg_src = parts[0].strip()
                elif fam == "off":
                    if frame is not None or ign:
                        # explicit frames are ignored by offsets; the
                        # IGNORE NULLS offset form stays native
                        continue
                    arg_src = parts[0].strip()
                    j = 1
                    if len(parts) >= 2:
                        jm = re.match(r"^\s*(\d+)\s*$", parts[1])
                        if jm is None:
                            continue  # non-literal offset — native
                        j = int(jm.group(1))
                        if j < 1:
                            continue  # lag(x, 0) is the identity — native
                    if len(parts) == 3:
                        # 3-arg default-value form (round-11)
                        default_src = parts[2].strip()
                        if not default_src:
                            continue
                    elif len(parts) > 3:
                        continue
                else:  # fln
                    if frame is not None:
                        continue  # framed frame-value call — native
                    arg_src = parts[0].strip()
                    if fn == "nth_value":
                        if len(parts) != 2 or ign:
                            continue  # nth IGNORE NULLS stays native
                        nm = re.match(r"^\s*(\d+)\s*$", parts[1])
                        if nm is None or int(nm.group(1)) < 1:
                            continue  # non-literal / non-positive n — native
                        n = int(nm.group(1))
                    elif len(parts) != 1:
                        continue  # explicit ignoreNulls argument — native
                calls.append(
                    dict(start=m.start(), end=spec_close + 1, family=fam,
                         fn=fn, keys=keys, arg_src=arg_src, j=j, n=n,
                         frame=frame, ign=ign, default_src=default_src)
                )
    except (ValueError, NotImplementedError):
        # unbalanced parens somewhere (_match_paren raises
        # NotImplementedError; numeric parses raise ValueError) — the
        # rewrite contract is pass-through-never-error, so fall back
        # and let Spark's own parser report malformed SQL.
        return None
    if not calls:
        return None
    # (round-11, r10 verdict #4: the one-shared-ranking-order
    # restriction is lifted — the execution loop below already builds
    # one pid assignment per DISTINCT order, so two rank orders in one
    # statement each ride their own partitioning)
    # spans must not overlap (a rank call inside an agg argument would
    # double-substitute) and must sit inside the projection
    spans = sorted((c["start"], c["end"]) for c in calls)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        if s2 < e1:
            return None
    for c in calls:
        if c["start"] < sel_span[0] or c["end"] > sel_span[1]:
            return None  # window call outside the projection

    group_mode = group_src is not None

    # --- GROUP mode: validate items, plan the aggregated inner -------
    # (window keys/args may be aggregate expressions — they must be
    # computed INSIDE the aggregated block, aliased _adt_wk*/_adt_wa*)
    inner_extra: list[str] = []
    key_alias: dict[str, str] = {}
    arg_alias: dict[str, str] = {}
    if group_mode:
        covered = set()
        for a, b in item_spans:
            inside = [c for c in calls if a <= c["start"] and c["end"] <= b]
            item_m = masked[a:b]
            if inside:
                # a window item may be any expression around the
                # call(s) — CAST(rank() OVER … AS BIGINT), arithmetic —
                # but must carry an explicit AS alias (the substituted
                # text becomes the outer item; without a name the
                # injected _adt_gw* column name would leak).  Leftover
                # aggregate references in the remainder fail outer
                # analysis ("not in GROUP BY") and fall back native.
                if not _AS_ALIAS_RE.search(item_m):
                    return None
                covered.add((a, b))
            else:
                src_item = sql[a:b].strip()
                if not src_item:
                    return None
                if _KEY_RE.match(item_m) or _AS_ALIAS_RE.search(item_m):
                    continue  # bare column / explicit AS alias — fine
                return None  # implicit alias or bare expression
        def _call_arg_srcs(c) -> list[str]:
            out = []
            if c["arg_src"] is not None and c["arg_src"] != "*":
                out.append(c["arg_src"])
            if c["default_src"] is not None:
                out.append(c["default_src"])
            return out

        for c in calls:
            for k in c["keys"]:
                if k["ident"] not in key_alias:
                    key_alias[k["ident"]] = f"_adt_wk{len(key_alias)}"
            for s in _call_arg_srcs(c):
                aid = " ".join(s.split())
                if aid not in arg_alias:
                    arg_alias[aid] = f"_adt_wa{len(arg_alias)}"
        for k_ident, k_name in key_alias.items():
            src = next(
                k["src"] for c in calls for k in c["keys"]
                if k["ident"] == k_ident
            )
            inner_extra.append(f"{src} AS {k_name}")
        for a_ident, a_name in arg_alias.items():
            src = next(
                s for c in calls for s in _call_arg_srcs(c)
                if " ".join(s.split()) == a_ident
            )
            inner_extra.append(f"{src} AS {a_name}")

    # --- build the inner statement ------------------------------------
    if group_mode:
        keep_items = [
            sql[a:b].strip() for a, b in item_spans if (a, b) not in covered
        ]
        inner_sel = ", ".join(keep_items + inner_extra)
        if not inner_sel:
            return None
        inner = f"{cte_src}SELECT {inner_sel} FROM {from_body}"
        if where_src:
            inner += f" WHERE {where_src}"
        inner += f" GROUP BY {group_src}"
        if having_src:
            inner += f" HAVING {having_src}"
    else:
        inner = f"{cte_src}SELECT * FROM {from_body}"
        if where_src:
            inner += f" WHERE {where_src}"

    def _key_cols(keys) -> list:
        out = []
        for k in keys:
            if group_mode:
                out.append((F.col(key_alias[k["ident"]]), k["method"]))
            elif k["kind"] == "col":
                out.append((F.col(k["ident"]), k["method"]))
            else:
                out.append((F.expr(k["src"]), k["method"]))
        return out

    def _arg_col(arg_src: str):
        if group_mode:
            return F.col(arg_alias[" ".join(arg_src.split())])
        return F.expr(arg_src)

    # --- execute the two-phase constructions --------------------------
    from adt_spark.operators.sampling import (
        _assign_range_pids,
        _bounded_boundary_rows,
        _bounded_mark,
        _bounded_tot_exprs,
        _ranks_state_exprs,
        _resolve_rank_parts,
        _running_prims,
        _running_state_exprs,
        _sample_split_bounds,
        attach_global_bounded_aggs,
        attach_global_first_last,
        attach_global_offsets,
        attach_global_ranks,
        attach_global_running_aggs,
        attach_global_scalar_aggs,
    )

    names = {}
    for i, c in enumerate(sorted(calls, key=lambda c: c["start"])):
        names[c["start"]] = f"_adt_gw{i}"
    try:
        ranked = spark.sql(inner)
        injected = set(key_alias.values()) | set(arg_alias.values())
        if any(
            c.startswith("_adt_") and c not in injected
            for c in ranked.columns
        ):
            return None  # reserved-prefix collision with the injected
            # helper columns (_adt_pid/_adt_wk*/…) — native path
        if group_mode:
            # GROUP mode: the inner block is a corpus-wide AGGREGATE
            # whose output is group-grain; the constructions hit it
            # with several actions (count, bounds sample, offset
            # collects, the final output), and recomputing the
            # aggregation per action costs one corpus scan each.
            # Cache the aggregate OUTPUT (never the raw corpus —
            # row-mode inners stay uncached): MEMORY_AND_DISK spills,
            # and even a corpus-grain GROUP BY's output is no larger
            # than one of the scans it saves.  At most ONE cached
            # inner is alive — the previous query's is released here.
            global _cached_inner
            if _cached_inner is not None:
                try:
                    _cached_inner.unpersist()
                except Exception:
                    pass
            ranked = ranked.persist()
            _cached_inner = ranked
        # No count pass (round-11 optimization): the bounds sample is
        # a fixed-size hash top-k (_sample_split_bounds), so nothing
        # in the construction needs the inner row count any more —
        # one full pass per statement removed outright (guide §1.2).
        # ONE deterministic pid assignment per DISTINCT order, shared
        # by every family's construction over that order (round-10:
        # the assignment costs a key-pruned sampling scan — one per
        # order, not one per family); families chain on the
        # pid-carrying frame and earlier columns ride through.
        # STATE FROM THE INNER, not the chain (round-11 optimization,
        # guide §1.2/§2.4): every construction's driver-state action
        # (bounds sample, per-pid counts/totals/boundaries) runs
        # against a short-lineage twin of the INNER statement carrying
        # the same pid assignment (pid is a pure function of the key;
        # the chain is row-preserving, so state values are identical)
        # — previously each later construction's state actions
        # re-executed every earlier construction's windows and
        # broadcast joins just to aggregate columns the inner already
        # had (measured: the second order's bounds sample alone cost
        # 0.94 s vs 0.12 s for the first at sf0.1).
        inner_df = ranked
        # scalar OVER () totals need no order/pid machinery at all
        glob_group = [c for c in calls if c["family"] == "glob"]
        if glob_group:
            ranked = attach_global_scalar_aggs(
                ranked,
                [
                    (
                        c["fn"],
                        None if c["arg_src"] == "*" else _arg_col(c["arg_src"]),
                        names[c["start"]],
                    )
                    for c in glob_group
                ],
            )
        by_order: dict[tuple, list] = {}
        for c in calls:
            if c["family"] == "glob":
                continue
            by_order.setdefault(_order_ident(c["keys"]), []).append(c)
        orders = sorted(by_order)
        np_ = _resolve_rank_parts(spark, None)

        # ------- phase A+B (round-12, r11 verdict item 2): hoist the
        # per-order driver-state work out of the sequential attach
        # chain.  A: sample every distinct order's split bounds
        # concurrently (one top-k job each).  B: fuse each order's
        # FLAT per-pid state aggregates (rank counts + running totals
        # + bounded-frame totals) into composite groupBy collects and
        # run them — plus the bounded-frame edge-row collects —
        # concurrently across orders/families.  Each attach then
        # receives its slice via pre_state instead of running its own
        # serialized action; values are identical (same state twin,
        # same expressions — the _*_state_exprs helpers are the very
        # code the attaches run internally).  Families whose state the
        # helpers do not cover (offsets, first/last, dense_rank's
        # two-level pass) keep their internal state_src collect.
        def _spec_bnd(c, a, b, name):
            return (
                c["fn"],
                None if c["arg_src"] == "*" else _arg_col(c["arg_src"]),
                a,
                b,
                name,
            )

        plans = {}
        for order in orders:
            group_all = by_order[order]
            keys = _key_cols(group_all[0]["keys"])
            rank_group = [c for c in group_all if c["family"] == "rank"]
            agg_run = [
                c for c in group_all
                if c["family"] == "agg" and c["frame"] is None
            ]
            agg_bnd = [
                c for c in group_all
                if c["family"] == "agg" and c["frame"] is not None
            ]
            # negative bounds (third wave): frame [lo, hi] with
            # hi < 0 equals the [lo−hi, 0] aggregate at position
            # pos+hi — compute the shifted-to-current inner frame,
            # then globally LAG it by −hi (lo > 0 mirrors via
            # LEAD); past the global edge the frame is empty, so
            # the offset's NULL is exactly right (count coalesces
            # to its empty-frame 0)
            plain, shifted = [], []
            for c in agg_bnd:
                a, b = c["frame"]
                if b is not None and b < 0:
                    ia = None if a is None else a + b
                    shifted.append((c, ia, 0, "lag", -b))
                elif a is not None and a < 0:
                    ib = None if b is None else a + b
                    shifted.append((c, 0, ib, "lead", -a))
                else:
                    plain.append((c, a, b))
            tmp_names = {
                id(c): f"_adt_gws{k}"
                for k, (c, _ia, _ib, _d, _s) in enumerate(shifted)
            }
            plans[order] = {
                "keys": keys,
                "rank": rank_group,
                "rank_specs": [
                    (c["fn"], names[c["start"]]) for c in rank_group
                ],
                "run": agg_run,
                "run_specs": [
                    (
                        c["fn"],
                        None if c["arg_src"] == "*" else _arg_col(c["arg_src"]),
                        names[c["start"]],
                    )
                    for c in agg_run
                ],
                "plain_specs": [
                    _spec_bnd(c, a, b, names[c["start"]]) for c, a, b in plain
                ],
                "shift": shifted,
                "shift_specs": [
                    _spec_bnd(c, ia, ib, tmp_names[id(c)])
                    for c, ia, ib, _d, _s in shifted
                ],
                "tmp_names": tmp_names,
                "off": [c for c in group_all if c["family"] == "off"],
                "fln": [c for c in group_all if c["family"] == "fln"],
            }

        def _run_parallel(thunks: list):
            if len(thunks) <= 1:
                return [t() for t in thunks]
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(len(thunks), 8)) as ex:
                return [f.result() for f in [ex.submit(t) for t in thunks]]

        splits_list = _run_parallel(
            [
                (lambda o: lambda: _sample_split_bounds(
                    inner_df, plans[o]["keys"], np_
                ))(order)
                for order in orders
            ]
        )
        # state_src/pre_state ties contract (ADVICE r11): the twin's
        # per-pid aggregates are tie-insensitive (counts/totals), but
        # boundary-row and nth-value state reads row positions, which
        # equal the chain's only under the repo's total-order tiebreak
        # convention — the same convention those families already
        # require for determinism on EITHER engine (their docstrings),
        # so passing the twin adds no new requirement.
        state_jobs: list = []
        for order, splits in zip(orders, splits_list):
            p = plans[order]
            p["splits"] = splits
            p["state_base"] = _assign_range_pids(
                inner_df, p["keys"], n_parts=np_, splits=splits
            )
            comp_exprs = []
            rank_exprs = (
                _ranks_state_exprs(p["rank_specs"]) if p["rank"] else None
            )
            p["comp_serves_ranks"] = rank_exprs is not None
            if rank_exprs is not None:
                comp_exprs += rank_exprs
            if p["run"]:
                p["run_prims"] = _running_prims(inner_df, p["run_specs"])
                comp_exprs += _running_state_exprs(p["run_prims"])
            if comp_exprs:
                def _comp_job(pl=p, exprs=comp_exprs):
                    df_c = pl["state_base"].groupBy("_adt_pid").agg(*exprs)
                    types = {f.name: f.dataType for f in df_c.schema.fields}
                    return ("comp", pl, df_c.collect(), types)
                state_jobs.append(_comp_job)
            for kind, specs in (("plain", p["plain_specs"]),
                                ("shift", p["shift_specs"])):
                if not specs:
                    continue
                marked_sb = _bounded_mark(p["state_base"], p["keys"], specs)
                if any(a is not None and a > 0 or b is not None and b > 0
                       for _f, _c, a, b, _n in specs):
                    def _bnd_job(pl=p, k=kind, ms=marked_sb, sp=specs):
                        return (f"{k}_boundary", pl,
                                _bounded_boundary_rows(ms, sp), None)
                    state_jobs.append(_bnd_job)
                if any(a is None or b is None for _f, _c, a, b, _n in specs):
                    def _tot_job(pl=p, k=kind, ms=marked_sb, sp=specs):
                        return (f"{k}_totals", pl,
                                ms.groupBy("_adt_pid")
                                .agg(*_bounded_tot_exprs(sp)).collect(), None)
                    state_jobs.append(_tot_job)
        for tag, pl, rows, extra in _run_parallel(state_jobs):
            pl[tag] = (rows, extra) if extra is not None else rows

        # ------- phase C: the sequential attach chain, state injected
        for order in orders:
            p = plans[order]
            keys = p["keys"]
            state_base = p["state_base"]
            comp = p.get("comp")
            ranked = _assign_range_pids(
                ranked.drop("_adt_pid"), keys, n_parts=np_, splits=p["splits"]
            )
            if p["rank"]:
                ranked = attach_global_ranks(
                    ranked,
                    keys,
                    p["rank_specs"],
                    state_src=state_base,
                    pre_state=(
                        comp[0]
                        if comp is not None and p["comp_serves_ranks"]
                        else None
                    ),
                )
            if p["run"]:
                ranked = attach_global_running_aggs(
                    ranked,
                    keys,
                    p["run_specs"],
                    state_src=state_base,
                    pre_state=(comp[0], comp[1]) if comp is not None else None,
                )
            if p["plain_specs"]:
                ranked = attach_global_bounded_aggs(
                    ranked,
                    keys,
                    p["plain_specs"],
                    state_src=state_base,
                    pre_state=(
                        p.get("plain_boundary"), p.get("plain_totals")
                    ),
                )
            if p["shift_specs"]:
                shifted = p["shift"]
                tmp_names = p["tmp_names"]
                ranked = attach_global_bounded_aggs(
                    ranked,
                    keys,
                    p["shift_specs"],
                    state_src=state_base,
                    pre_state=(
                        p.get("shift_boundary"), p.get("shift_totals")
                    ),
                )
                # NOTE: this offsets call reads the _adt_gws* tmp
                # columns produced by the bounded-agg step above —
                # they exist only on the chain, so it cannot take
                # the short-lineage state_src (its boundary collect
                # stays on the chained frame; the shifted form is
                # the only family member with that dependency)
                ranked = attach_global_offsets(
                    ranked,
                    keys,
                    [
                        (d, F.col(tmp_names[id(c)]), s,
                         names[c["start"]], None)
                        for c, _ia, _ib, d, s in shifted
                    ]
                )
                for c, _ia, _ib, _d, _s in shifted:
                    if c["fn"] == "count":
                        nm = names[c["start"]]
                        ranked = ranked.withColumn(
                            nm,
                            F.coalesce(
                                F.col(nm), F.lit(0).cast("long")
                            ),
                        )
                ranked = ranked.drop(*tmp_names.values())
            if p["off"]:
                ranked = attach_global_offsets(
                    ranked,
                    keys,
                    [
                        (
                            c["fn"],
                            _arg_col(c["arg_src"]),
                            c["j"],
                            names[c["start"]],
                            None
                            if c["default_src"] is None
                            else _arg_col(c["default_src"]),
                        )
                        for c in p["off"]
                    ],
                    state_src=state_base,
                )
            if p["fln"]:
                ranked = attach_global_first_last(
                    ranked,
                    keys,
                    [
                        (c["fn"], _arg_col(c["arg_src"]), c["n"],
                         names[c["start"]], c["ign"])
                        for c in p["fln"]
                    ],
                    state_src=state_base,
                )
        ranked = ranked.drop("_adt_pid")
    except Exception:
        # a shape the textual scope check admitted but Spark cannot
        # evaluate in this position (ambiguous columns from a join FROM
        # body, aliases as keys, …) — fall back to the native path,
        # whose own analysis raises the real error
        if os.environ.get("ADT_DEBUG_GLOBAL_RANK"):
            raise  # debugging aid: surface the real construction error
        return None
    view = f"_adt_global_rank_{next(_view_counter)}"
    ranked.createOrReplaceTempView(view)

    # --- outer statement: substitute calls, keep the rest --------------
    def _subst_span(a: int, b: int) -> str:
        repl = sorted(
            (c["start"], c["end"], names[c["start"]])
            for c in calls
            if a <= c["start"] and c["end"] <= b
        )
        parts, cur = [], a
        for s, e, nm in repl:
            parts.append(sql[cur:s])
            parts.append(nm)
            cur = e
        parts.append(sql[cur:b])
        return "".join(parts)

    if group_mode:
        out_items = []
        for a, b in item_spans:
            if (a, b) in covered:
                out_items.append(_subst_span(a, b))
            else:
                item_m = masked[a:b]
                km = _KEY_RE.match(item_m)
                if km:
                    out_items.append(km.group("col").split(".")[-1])
                else:
                    out_items.append(
                        _AS_ALIAS_RE.search(item_m).group("alias")
                    )
        outer = f"SELECT {', '.join(out_items)} FROM {view}"
    else:
        outer = (
            f"SELECT {_subst_span(sel_span[0], sel_span[1])} FROM {view}"
        )
        relm = _REL_RE.match(from_body)
        derm = _DERIVED_RE.match(from_body) if relm is None else None
        alias = (relm and relm.group("alias")) or (
            derm and derm.group("alias")
        )
        if alias and alias.lower() not in (
            "where", "order", "limit", "group", "having",
        ):
            outer += f" AS {alias}"
    if order_src:
        outer += f" ORDER BY {order_src}"
    if limit_src:
        outer += f" LIMIT {limit_src}"
    try:
        return spark.sql(outer)
    except Exception:
        # outer-side resolution failure (qualified refs over a joined
        # FROM body, aggregate exprs in ORDER BY, …) — native path
        return None
