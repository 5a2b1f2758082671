"""Textual SQL rewrites for PostgreSQL-dialect constructs Spark SQL
does not parse (reference dialect: crates/core/src/context.rs:29).

Deliberately light: Spark 4 natively parses almost the whole surface
(``::`` casts, ``ILIKE``, ``IS DISTINCT FROM``, lateral joins …), so
only the PostgreSQL regex-match operators need translation.  The
rewrites are token-aware enough to skip string literals so a ``~``
inside a literal is untouched.
"""

from __future__ import annotations

import re

# expr ~ 'pat'   → expr RLIKE 'pat'
# expr !~ 'pat'  → NOT (expr RLIKE 'pat')
# expr ~* 'pat'  → expr RLIKE '(?i)pat'     (case-insensitive)
_TILDE = re.compile(r"[ \t]*(?P<neg>!)?~(?P<ci>\*)?[ \t]*")


def _split_on_literals(sql: str) -> list[tuple[str, bool]]:
    """Split SQL into (chunk, is_string_literal) segments."""
    parts: list[tuple[str, bool]] = []
    buf: list[str] = []
    in_str = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            if in_str and i + 1 < len(sql) and sql[i + 1] == "'":
                buf.append("''")
                i += 2
                continue
            buf.append(ch)
            parts.append(("".join(buf), in_str))
            buf = []
            in_str = not in_str
            i += 1
            continue
        buf.append(ch)
        i += 1
    if buf:
        parts.append(("".join(buf), in_str))
    return parts


def _rewrite_regex_ops(sql: str) -> str:
    segments = _split_on_literals(sql)
    out: list[str] = []
    for idx, (chunk, is_lit) in enumerate(segments):
        if is_lit:
            out.append(chunk)
            continue
        # Only rewrite a tilde directly followed (next segment) by a
        # string literal — the PostgreSQL regex-match shape.
        def repl(m: re.Match[str]) -> str:
            op = " NOT RLIKE " if m.group("neg") else " RLIKE "
            if m.group("ci"):
                # mark for (?i) injection into the following literal
                return op + "\x00CI\x00"
            return op

        rewritten = _TILDE.sub(repl, chunk)
        if "\x00CI\x00" in rewritten and idx + 1 < len(segments):
            nxt, nxt_lit = segments[idx + 1]
            # the opening quote sits at the end of THIS chunk; the
            # literal segment holds the body + closing quote.
            if nxt_lit:
                segments[idx + 1] = ("(?i)" + nxt, nxt_lit)
            rewritten = rewritten.replace("\x00CI\x00", "")
        out.append(rewritten)
    return "".join(out)


# expr SIMILAR TO 'pat' → expr RLIKE '^(?:pat')$' with SQL wildcards
# (% → .*, _ → .) converted; full-string anchoring per the standard.
_SIMILAR = re.compile(r"[ \t]*\b(?P<neg>NOT\s+)?SIMILAR\s+TO[ \t]*", re.IGNORECASE)
_ST_MARK = "\x00ST\x00"


def _convert_similar_pattern(body: str) -> str:
    """SQL-regex body → Java-regex body: translate unescaped SQL
    wildcards, preserve the POSIX-ish regex syntax SIMILAR TO shares
    with Java regex (classes, alternation, quantifiers)."""
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            out.append(body[i : i + 2])
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _rewrite_similar_to(sql: str) -> str:
    segments = _split_on_literals(sql)
    out: list[str] = []
    for idx, (chunk, is_lit) in enumerate(segments):
        if is_lit:
            out.append(chunk)
            continue
        rewritten = _SIMILAR.sub(
            lambda m: (" NOT RLIKE " if m.group("neg") else " RLIKE ") + _ST_MARK, chunk
        )
        if _ST_MARK in rewritten and idx + 1 < len(segments):
            nxt, nxt_lit = segments[idx + 1]
            if nxt_lit:
                # literal segment = body + closing quote
                body, quote = nxt[:-1], nxt[-1]
                segments[idx + 1] = ("^(?:" + _convert_similar_pattern(body) + ")$" + quote, nxt_lit)
            rewritten = rewritten.replace(_ST_MARK, "")
        out.append(rewritten)
    return "".join(out)


# Pure function renames: DataFusion/Postgres name → Spark builtin with
# identical argument order and semantics (SURVEY.md §2.B mapping table).
_NAME_REWRITES = {
    "approx_distinct": "approx_count_distinct",
    "arrow_typeof": "typeof",
    "array_has": "array_contains",
    "array_has_any": "arrays_overlap",
    "array_to_string": "array_join",
    "string_to_array": "split",
    "make_array": "array",
    "array_element": "element_at",
    "array_length": "cardinality",
    "regexp_match": "regexp_extract_all",
    "today": "current_date",
    "random": "rand",
    "power": "pow",
    "starts_with": "startswith",
    "ends_with": "endswith",
    "substr_index": "substring_index",
    "to_timestamp_seconds": "timestamp_seconds",
    "to_timestamp_millis": "timestamp_millis",
    "to_timestamp_micros": "timestamp_micros",
    "array_concat": "concat",
    "array_reverse": "reverse",
    # DataFusion generate_series(start, stop[, step]) is
    # inclusive-of-stop — exactly Spark's sequence().
    "generate_series": "sequence",
}
_NAME_RE = re.compile(
    r"\b(" + "|".join(sorted(_NAME_REWRITES, key=len, reverse=True)) + r")\s*\(",
    re.IGNORECASE,
)


def _rewrite_names(sql: str) -> str:
    segments = _split_on_literals(sql)
    out = []
    for chunk, is_lit in segments:
        if is_lit:
            out.append(chunk)
        else:
            out.append(_NAME_RE.sub(lambda m: _NAME_REWRITES[m.group(1).lower()] + "(", chunk))
    return "".join(out)


def translate_sql(sql: str) -> str:
    """Translate a PostgreSQL/DataFusion-flavored statement to Spark SQL."""
    if "~" in sql:
        sql = _rewrite_regex_ops(sql)
    if _SIMILAR.search(sql):
        sql = _rewrite_similar_to(sql)
    if _NAME_RE.search(sql):
        sql = _rewrite_names(sql)
    return sql
