"""Property-based tests (hypothesis) for the pure-Python layers:
the roaring-bitmap codec, the Z85 codec, the dialect translator's
literal preservation, and the script statement splitter."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from adt_spark.dialect.translate import _split_on_literals, translate_sql
from adt_spark.script import split_statements
from adt_spark.sources._roaring import (
    decode_bitmap_array,
    encode_bitmap_array,
    z85_decode,
    z85_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=1 << 22), unique=True))
@settings(max_examples=200, deadline=None)
def test_roaring_roundtrip(positions):
    """encode → decode is the identity on sorted position sets (covers
    array and bitmap container encodings across 2^16 chunk borders)."""
    assert decode_bitmap_array(encode_bitmap_array(sorted(positions))) == sorted(positions)


@given(st.binary(min_size=0, max_size=200).filter(lambda b: len(b) % 4 == 0))
@settings(max_examples=200, deadline=None)
def test_z85_roundtrip(data):
    assert z85_decode(z85_encode(data)) == data


_sql_fragment = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "Zs"), whitelist_characters="_,.()=<>*"),
    max_size=30,
)


@given(st.lists(st.tuples(_sql_fragment, st.booleans()), max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_on_literals_reassembles(chunks):
    """Splitting any SQL into (chunk, is_literal) segments loses no
    text: concatenation reproduces the input exactly."""
    sql = "".join(
        ("'" + frag.replace("'", "''") + "'") if is_lit else frag
        for frag, is_lit in chunks
    )
    assert "".join(chunk for chunk, _ in _split_on_literals(sql)) == sql


@given(_sql_fragment)
@settings(max_examples=200, deadline=None)
def test_translate_preserves_literal_bodies(body):
    """String literals pass through every dialect rewrite untouched —
    even when they contain rewrite triggers."""
    lit = "'" + (body + " x ~ y SIMILAR TO z random(").replace("'", "''") + "'"
    sql = f"select {lit} as v"
    assert lit in translate_sql(sql)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters=";\n\r", blacklist_categories=("Cs",)),
            max_size=20,
        ).filter(lambda s: not s.lstrip().startswith("--")),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_statements_recovers_statements(stmts):
    """Joining statements with ';' terminators and re-splitting yields
    the same statements (modulo surrounding whitespace), with --
    comment lines dropped — the reference's main.rs:103-137 contract."""
    stmts = [s for s in stmts if s.strip()]
    lines = []
    for s in stmts:
        lines.append("-- a comment line")
        lines.append(s + ";")
    got = list(split_statements(lines))
    assert [g.strip() for g in got] == [s.strip() for s in stmts]


# --- CREATE EXTERNAL TABLE parser + hive path escaping --------------------

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,20}", fullmatch=True)
_path = st.from_regex(r"/[A-Za-z0-9_/.\-]{1,40}", fullmatch=True)


@given(
    name=_ident,
    fmt=st.sampled_from(["parquet", "csv", "json", "ndjson", "arrow", "delta"]),
    path=_path,
    parts=st.lists(_ident, max_size=3, unique=True),
    ine=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_ddl_parser_roundtrips_generated_statements(name, fmt, path, parts, ine):
    """Any well-formed CREATE EXTERNAL TABLE statement parses back to
    exactly its components (the reference CLI templates these strings
    mechanically, so the parser must never misread a field)."""
    from adt_spark.dialect.ddl import parse_create_external_table

    part_spec = f"partitioned by ({', '.join(parts)})" if parts else ""
    ddl = (
        f"create external table {'if not exists ' if ine else ''}{name}\n"
        f"stored as {fmt}\n{part_spec}\nlocation '{path}'"
    )
    spec = parse_create_external_table(ddl)
    assert spec["name"] == name
    assert spec["fmt"] == fmt
    assert spec["location"] == path
    assert spec["if_not_exists"] == ine
    assert spec["partition_cols"] == (parts if parts else None)


@given(st.text(min_size=0, max_size=60).filter(lambda s: "\x00" not in s))
@settings(max_examples=300, deadline=None)
def test_hive_escape_roundtrip(value):
    """Partition-value hive escaping is invertible and produces names
    free of path-hostile characters (Delta add.path must match the
    on-disk dir byte-for-byte; partitionValues carry the raw value)."""
    from adt_spark.sources.delta_native_write import _hive_escape, _hive_unescape

    escaped = _hive_escape(value)
    assert _hive_unescape(escaped) == value
    assert "/" not in escaped and "=" not in escaped and "\n" not in escaped


_ops = st.sampled_from(["=", "<", "<=", ">", ">="])
_vals = st.integers(min_value=-1000, max_value=1000)


def _op_holds(op: str, x: int, v: int) -> bool:
    return {
        "=": x == v,
        "<": x < v,
        "<=": x <= v,
        ">": x > v,
        ">=": x >= v,
    }[op]


@given(
    rows=st.lists(_vals, min_size=1, max_size=30),
    constraints=st.lists(st.tuples(st.just("c"), _ops, _vals), min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_file_skipping_never_loses_rows(rows, constraints):
    """Soundness property of the Delta skipping oracle: whenever ANY
    row in a file satisfies every constraint, _file_may_match must
    keep the file.  (Completeness — skipping as much as possible — is
    an optimization; soundness is correctness.)"""
    import json

    from adt_spark.sources.delta_native import _file_may_match

    stats = json.dumps(
        {
            "numRecords": len(rows),
            "minValues": {"c": min(rows)},
            "maxValues": {"c": max(rows)},
            "nullCount": {"c": 0},
        }
    )
    any_match = any(
        all(_op_holds(op, x, v) for _col, op, v in constraints) for x in rows
    )
    kept = _file_may_match(stats, constraints)
    if any_match:
        assert kept, (rows, constraints)


_avro_scalar = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=40),
    st.booleans(),
    st.floats(allow_nan=False, width=64),
)


@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {
                "a": st.integers(min_value=-(2**62), max_value=2**62),
                "b": st.one_of(st.none(), st.text(max_size=40)),
                "c": st.floats(allow_nan=False, width=64),
                "d": st.lists(st.integers(min_value=-1000, max_value=1000), max_size=8),
                "e": st.dictionaries(st.text(min_size=1, max_size=8), st.booleans(), max_size=4),
            }
        ),
        max_size=25,
    ),
    codec=st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=150, deadline=None)
def test_avro_container_roundtrip_property(rows, codec):
    """Spec-level property: ANY record set under a mixed schema
    (nullable union, array, map, both codecs) round-trips through the
    pure-Python Avro container writer+reader byte-exactly."""
    from adt_spark.sources.avro_native import parse_container, write_container

    schema = {
        "type": "record", "name": "p",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
            {"name": "d", "type": {"type": "array", "items": "long"}},
            {"name": "e", "type": {"type": "map", "values": "boolean"}},
        ],
    }
    _s, c, recs = parse_container(write_container(schema, rows, codec=codec))
    assert c == codec
    assert recs == rows
