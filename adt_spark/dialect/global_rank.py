"""Global-ranking rewrite for raw SQL — dodging the single-partition
WindowExec cliff.

An unpartitioned ``row_number()/rank()/dense_rank()/percent_rank()/
cume_dist()/ntile(k) OVER (ORDER BY …)`` executes on ONE task in
Spark (the whole input is exchanged to a SinglePartition before
WindowExec) — the classic scale wall a ported adt script hits,
because DataFusion executes the same SQL with a parallel sort +
streaming rank (reference SQL pass-through:
``crates/cli/src/main.rs:116`` — any SQL the user types goes straight
to the engine, so global ranks are common in adt scripts).

This pass detects the sound shape and executes it through the
generalized two-phase construction
(``adt_spark.operators.sampling.attach_global_ranks``: range
repartition on the rank keys → per-partition local rank → bounded
per-partition count collect → offset add; boundary-invariant output,
oracled by q_global_rank_chars and q_sql_global_rank):

1. the inner relation (FROM + WHERE) runs as its own statement;
2. each unpartitioned ranking call becomes a pre-computed column,
   and (round-9 second wave) so does each default-frame RUNNING
   AGGREGATE — ``sum/count/min/max/avg(expr) OVER (ORDER BY …)`` via
   ``attach_global_running_aggs``; window calls that stay native
   (partitioned, OVER(), exotic frames) are LEFT IN PLACE and
   evaluate over the view's rows — the base rows — unchanged;
3. the remaining projection / ORDER BY / LIMIT runs over the ranked
   temp view with the calls substituted.

Scope (conservative — anything else passes through UNTOUCHED, which
stays correct, merely on the cliff): one top-level SELECT over a
single relation (optional alias, optional WHERE / trailing ORDER BY /
LIMIT), no GROUP BY / HAVING / DISTINCT / set ops / joins /
subqueries / CTEs / ``SELECT *``; every unpartitioned ranking call
shares one ORDER BY over plain (possibly qualified) column references
with optional ASC/DESC + NULLS placement.  Unlike the GROUPS/EXCLUDE
rewrites (which refuse loudly because Spark cannot run the original
at all), the unrewritten global rank is semantically fine — so the
fallback here is pass-through, never an error.
"""

from __future__ import annotations

import itertools
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
    r"(?<![\w.$])(?P<afn>sum|count|min|max|avg)\s*\(",
    re.IGNORECASE,
)

#: offset window calls (lag/lead — round-9 third wave)
_OFF_CALL_RE = re.compile(
    r"(?<![\w.$])(?P<ofn>lag|lead)\s*\(",
    re.IGNORECASE,
)

#: one ORDER BY key: [qualifier.]column [ASC|DESC] [NULLS FIRST|LAST]
_KEY_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
    r"(?:\s+(?P<dir>asc|desc))?"
    r"(?:\s+nulls\s+(?P<nulls>first|last))?\s*$",
    re.IGNORECASE,
)

#: single relation: name / qualified name / fmt.`path`, optional alias
_REL_RE = re.compile(
    r"^(?P<rel>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*(?:\.`[^`]*`)?)"
    r"(?:\s+(?:as\s+)?"
    r"(?!(?:where|order|limit|group|having|union|intersect|except|join)\b)"
    r"(?P<alias>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)

_BLOCKERS = re.compile(
    r"\b(group\s+by|having|union|intersect|except|join|with|distinct)\b",
    re.IGNORECASE,
)

_view_counter = itertools.count()


def _split_top_commas(s: str) -> list[str]:
    parts, depth, buf = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _parse_order_keys(order_text: str) -> list[tuple[str, str]] | None:
    """ORDER BY body → [(column, sort-method-name)] or None when any
    key is not a plain column reference."""
    keys = []
    for part in _split_top_commas(order_text):
        m = _KEY_RE.match(part)
        if not m:
            return None
        direction = (m.group("dir") or "asc").lower()
        nulls = (m.group("nulls") or "").lower()
        method = direction + (f"_nulls_{nulls}" if nulls else "")
        # strip the qualifier: the inner statement's output columns
        # are unqualified, and the single-relation scope guarantees
        # the bare name is unambiguous
        col = m.group("col").split(".")[-1]
        keys.append((col, method))
    return keys


def maybe_rewrite_global_rank(spark: SparkSession, sql: str) -> DataFrame | None:
    """Execute ``sql`` through the two-phase global-rank construction
    when it matches the sound shape (module docstring); None when it
    does not (caller falls back to plain ``spark.sql``)."""
    masked = _mask_literals(sql)
    has_rank = bool(_RANK_CALL_RE.search(masked))
    has_over = bool(re.search(r"\bover\b", masked, re.IGNORECASE))
    has_agg = bool(_AGG_CALL_RE.search(masked)) and has_over
    has_off = bool(_OFF_CALL_RE.search(masked)) and has_over
    if not has_rank and not has_agg and not has_off:
        return None

    # --- collect unpartitioned ranking calls ------------------------
    calls = []  # (start, end, fn) spans over the WHOLE call incl. OVER(...)
    order_texts = set()
    for m in _RANK_CALL_RE.finditer(masked):
        open_pos = m.end() - 1
        try:
            close_pos = _match_paren(masked, open_pos)
        except Exception:
            return None
        spec = " ".join(sql[open_pos + 1 : close_pos].split())
        sm = re.match(r"^order\s+by\s+(?P<keys>.+)$", spec, re.IGNORECASE)
        if sm is None:
            # partitioned (or framed) ranking — fine natively; but a
            # frame/partition mix in the same statement is out of
            # scope only if it is ALSO unpartitioned elsewhere; just
            # skip this call
            continue
        if re.search(r"\b(rows|range|groups)\b", sm.group("keys"), re.IGNORECASE):
            return None  # frames on ranking functions — out of scope
        parsed = _parse_order_keys(sm.group("keys").lower())
        if parsed is None:
            return None  # non-column order key — out of scope
        fn = (m.group("fn") or m.group("ntile")).lower()
        if fn == "ntile":
            fn = f"ntile({int(m.group('k'))})"
        calls.append((m.start(), close_pos + 1, fn))
        # qualifier-stripped normalized keys: `d.n_chars DESC` and
        # `n_chars DESC` are the same order under single-relation scope
        order_texts.add(tuple(parsed))
    if calls and len(order_texts) != 1:
        return None  # two different global orders: would need two
        # range partitionings — pass through
    keys = list(order_texts.pop()) if calls else None

    # --- collect unpartitioned RUNNING-AGGREGATE calls ---------------
    # (round-9: sum/count/min/max/avg OVER (ORDER BY …) with the
    # default peer-inclusive frame hit the same single-partition
    # cliff; they rewrite through attach_global_running_aggs.  Calls
    # that stay native — partitioned, OVER(), exotic frames — are
    # simply LEFT IN PLACE: they evaluate over the view's rows, which
    # are the base rows, so semantics are unchanged.)
    agg_calls = []  # (start, end, fn, arg_src)
    agg_orders = set()
    for m in _AGG_CALL_RE.finditer(masked):
        open_pos = m.end() - 1
        try:
            arg_close = _match_paren(masked, open_pos)
        except Exception:
            return None
        om = re.match(r"\s+over\s*\(", masked[arg_close + 1 :], re.IGNORECASE)
        if om is None:
            continue  # plain aggregate, not a window call
        over_open = arg_close + 1 + om.end() - 1
        try:
            spec_close = _match_paren(masked, over_open)
        except Exception:
            return None
        spec = " ".join(sql[over_open + 1 : spec_close].split())
        sm = re.match(r"^order\s+by\s+(?P<keys>.+)$", spec, re.IGNORECASE)
        if sm is None:
            continue  # partitioned / OVER() — native path, stays put
        keys_text = sm.group("keys")
        fm = re.search(r"\s+(range|rows|groups)\s+", keys_text, re.IGNORECASE)
        if fm:
            frame = " ".join(keys_text[fm.start() :].split()).lower()
            if frame != "range between unbounded preceding and current row":
                continue  # non-default frame — native path, stays put
            keys_text = keys_text[: fm.start()]
        parsed = _parse_order_keys(keys_text.lower())
        if parsed is None:
            continue  # non-column order key — native path, stays put
        arg_masked = masked[open_pos + 1 : arg_close]
        if re.search(r"\b(over|select)\b", arg_masked, re.IGNORECASE):
            return None  # nested window/subquery in the argument
        arg_src = sql[open_pos + 1 : arg_close].strip()
        agg_calls.append(
            (m.start(), spec_close + 1, m.group("afn").lower(), arg_src,
             tuple(parsed))
        )
        agg_orders.add(tuple(parsed))
    # --- collect unpartitioned OFFSET calls (lag/lead) ----------------
    # (round-9 third wave; same leave-native rule for unsupported
    # shapes: 3-arg default-value forms, partitioned specs)
    off_calls = []  # (start, end, fn, arg_src, j, order)
    for m in _OFF_CALL_RE.finditer(masked):
        open_pos = m.end() - 1
        try:
            arg_close = _match_paren(masked, open_pos)
        except Exception:
            return None
        om = re.match(r"\s+over\s*\(", masked[arg_close + 1 :], re.IGNORECASE)
        if om is None:
            continue
        over_open = arg_close + 1 + om.end() - 1
        try:
            spec_close = _match_paren(masked, over_open)
        except Exception:
            return None
        spec = " ".join(sql[over_open + 1 : spec_close].split())
        sm = re.match(r"^order\s+by\s+(?P<keys>.+)$", spec, re.IGNORECASE)
        if sm is None:
            continue  # partitioned — native path, stays put
        if re.search(r"\b(rows|range|groups)\b", sm.group("keys"), re.IGNORECASE):
            return None  # frames on offset functions are invalid SQL
        parsed = _parse_order_keys(sm.group("keys").lower())
        if parsed is None:
            continue
        arg_masked = masked[open_pos + 1 : arg_close]
        if re.search(r"\b(over|select)\b", arg_masked, re.IGNORECASE):
            return None
        parts = _split_top_commas(sql[open_pos + 1 : arg_close])
        j = 1
        if len(parts) == 2:
            jm = re.match(r"^\s*(\d+)\s*$", parts[1])
            if jm is None:
                continue  # non-literal offset — native path
            j = int(jm.group(1))
            if j < 1:
                continue  # lag(x, 0) is the identity — native path
        elif len(parts) != 1:
            continue  # 3-arg default-value form — native path
        off_calls.append(
            (m.start(), spec_close + 1, m.group("ofn").lower(),
             parts[0].strip(), j, tuple(parsed))
        )
    if not calls and not agg_calls and not off_calls:
        return None
    # replacement spans must not overlap (a rank call inside an agg
    # argument would double-substitute)
    spans = sorted(
        [(s, e) for s, e, _f in calls]
        + [(s, e) for s, e, _f, _a, _o in agg_calls]
        + [(s, e) for s, e, _f, _a, _j, _o in off_calls]
    )
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        if s2 < e1:
            return None

    # --- parse the statement shape ----------------------------------
    if _BLOCKERS.search(masked):
        return None
    if len(re.findall(r"\bselect\b", masked, re.IGNORECASE)) != 1:
        return None  # subqueries / CTE bodies
    stmt = re.match(
        r"^\s*select\s+(?P<sel>.+?)\s+from\s+(?P<from>.+?)\s*;?\s*$",
        masked,
        re.IGNORECASE | re.DOTALL,
    )
    if stmt is None:
        return None
    sel_span = (stmt.start("sel"), stmt.end("sel"))
    if re.match(r"\s*\*", sql[sel_span[0] : sel_span[1]]):
        return None  # SELECT * would leak the injected rank columns
    from_start = stmt.start("from")
    from_masked = masked[from_start : stmt.end("from")]
    relm = _REL_RE.match(from_masked)
    if relm is None:
        return None
    rel_src = sql[from_start + relm.start() : from_start + relm.end()]
    rest_masked = from_masked[relm.end() :]
    rest_src = sql[from_start + relm.end() : stmt.end("from")]
    # rest may only be [WHERE …] [ORDER BY …] [LIMIT n]
    where_src = order_src = limit_src = None
    r = re.match(
        r"^\s*(?:where\s+(?P<w>.*?))?"
        r"\s*(?:order\s+by\s+(?P<o>.*?))?"
        r"\s*(?:limit\s+(?P<l>\d+))?\s*$",
        rest_masked,
        re.IGNORECASE | re.DOTALL,
    )
    if r is None or (rest_masked.strip() and not any(r.groupdict().values())):
        return None
    for g, var in (("w", "where"), ("o", "order"), ("l", "limit")):
        if r.group(g) is not None:
            span = (r.start(g), r.end(g))
            text = rest_src[span[0] : span[1]]
            if var == "where":
                where_src = text
            elif var == "order":
                order_src = text
            else:
                limit_src = text
    # the trailing ORDER BY must not itself contain window syntax
    if order_src and re.search(
        r"\bover\b", _mask_literals(order_src), re.IGNORECASE
    ):
        return None

    # --- execute the two-phase construction -------------------------
    from adt_spark.operators.sampling import (
        attach_global_offsets,
        attach_global_ranks,
        attach_global_running_aggs,
    )

    inner = f"SELECT * FROM {rel_src}"
    if where_src:
        inner += f" WHERE {where_src}"
    rank_specs = [(fn, f"_adt_grnk{i}") for i, (_s, _e, fn) in enumerate(calls)]
    agg_specs = [
        (fn, None if arg == "*" else arg, f"_adt_gagg{i}", order)
        for i, (_s, _e, fn, arg, order) in enumerate(agg_calls)
    ]
    off_specs = [
        (fn, arg, j, f"_adt_goff{i}", order)
        for i, (_s, _e, fn, arg, j, order) in enumerate(off_calls)
    ]
    try:
        ranked = spark.sql(inner)
        if rank_specs:
            ranked = attach_global_ranks(
                ranked,
                [(F.col(c), method) for c, method in keys],
                rank_specs,
            )
        # each DISTINCT agg order gets its own construction, chained:
        # every attachment range-partitions independently and earlier
        # columns ride through (rank columns included)
        for order in sorted(set(o for _f, _a, _n, o in agg_specs)):
            ranked = attach_global_running_aggs(
                ranked,
                [(F.col(c), method) for c, method in order],
                [
                    (fn, None if arg is None else F.expr(arg), name)
                    for fn, arg, name, o in agg_specs
                    if o == order
                ],
            )
        for order in sorted(set(o for _f, _a, _j, _n, o in off_specs)):
            ranked = attach_global_offsets(
                ranked,
                [(F.col(c), method) for c, method in order],
                [
                    (fn, F.expr(arg), j, name)
                    for fn, arg, j, name, o in off_specs
                    if o == order
                ],
            )
    except Exception:
        # an argument/key the textual scope check admitted but Spark
        # cannot evaluate in this position — fall back to the native
        # path, whose own analysis raises the real error
        return None
    view = f"_adt_global_rank_{next(_view_counter)}"
    ranked.createOrReplaceTempView(view)

    repl = sorted(
        [(s, e, name) for (s, e, _f), (_f2, name) in zip(calls, rank_specs)]
        + [
            (s, e, name)
            for (s, e, _f, _a, _o), (_f3, _a2, name, _o2) in zip(
                agg_calls, agg_specs
            )
        ]
        + [
            (s, e, name)
            for (s, e, _f, _a, _j, _o), (_f3, _a2, _j2, name, _o2) in zip(
                off_calls, off_specs
            )
        ]
    )
    out_sel, cursor = [], sel_span[0]
    for start, end, name in repl:
        if start < sel_span[0] or end > sel_span[1]:
            return None  # window call outside the projection
        out_sel.append(sql[cursor:start])
        out_sel.append(name)
        cursor = end
    out_sel.append(sql[cursor : sel_span[1]])
    alias = relm.group("alias")
    outer = f"SELECT {''.join(out_sel)} FROM {view}"
    if alias:
        outer += f" AS {alias}"
    if order_src:
        outer += f" ORDER BY {order_src}"
    if limit_src:
        outer += f" LIMIT {limit_src}"
    return spark.sql(outer)
