"""SURVEY.md §2.B scalar-function inventory audit.

One executable case per DataFusion 48 function name from the survey's
family lists (string / regex / math / datetime / conditional / crypto /
encoding / struct / array / map / introspection), run through the
dialect layer (``translate_sql`` + the SQL-UDF shims) exactly as the
CLI's SQL entry point would.  This is the line-by-line answer to "does
the engine accept the reference's function surface?" — each case uses
the *DataFusion* spelling, not Spark's.

Known, documented exceptions (SURVEY.md §7 "moderate" notes) are at
the bottom as xfail-style assertions so the gap list stays honest.
"""

from __future__ import annotations

import datetime

import pytest

from adt_spark.dialect.functions import register_dialect_functions
from adt_spark.dialect.translate import translate_sql


@pytest.fixture(scope="module")
def dspark(spark):
    register_dialect_functions(spark)
    return spark


def _run(spark, expr: str):
    return spark.sql(translate_sql(f"SELECT {expr} AS v")).collect()[0][0]


STRING = [
    ("ascii('A')", 65),
    ("btrim('  x  ')", "x"),
    ("chr(65)", "A"),
    ("char_length('ab')", 2),
    ("character_length('ab')", 2),
    ("length('ab')", 2),
    ("concat('a', 'b')", "ab"),
    ("concat_ws('-', 'a', 'b')", "a-b"),
    ("contains('abc', 'b')", True),
    ("starts_with('abc', 'a')", True),
    ("ends_with('abc', 'c')", True),
    ("find_in_set('b', 'a,b,c')", 2),
    ("initcap('ab cd')", "Ab Cd"),
    ("instr('abc', 'b')", 2),
    ("strpos('hello', 'll')", 3),
    ("position('b' IN 'abc')", 2),
    ("left('abc', 2)", "ab"),
    ("right('abc', 2)", "bc"),
    ("levenshtein('kitten', 'sitting')", 3),
    ("lower('AB')", "ab"),
    ("upper('ab')", "AB"),
    ("lpad('a', 3, 'x')", "xxa"),
    ("rpad('a', 3, 'x')", "axx"),
    ("ltrim('  a')", "a"),
    ("rtrim('a  ')", "a"),
    ("trim('  a  ')", "a"),
    ("octet_length('ab')", 2),
    ("repeat('ab', 2)", "abab"),
    ("replace('abc', 'b', 'x')", "axc"),
    ("reverse('abc')", "cba"),
    ("split_part('a,b,c', ',', 2)", "b"),
    ("substr('abcd', 2, 2)", "bc"),
    ("substring('abcd', 2, 2)", "bc"),
    ("substr_index('a.b.c', '.', 2)", "a.b"),
    ("translate('abc', 'ab', 'xy')", "xyc"),
    ("overlay('hello' PLACING 'xx' FROM 2)", "hxxlo"),
]

REGEX = [
    ("regexp_like('abc', 'b')", True),
    ("'abc' ~ 'b'", True),
    ("'abc' !~ 'z'", True),
    ("'ABC' ~* 'abc'", True),
    ("regexp_match('a1b2', '([0-9])')", ["1", "2"]),  # → regexp_extract_all
    ("regexp_replace('abc', 'b', 'x')", "axc"),
    ("regexp_count('abab', 'a')", 2),
    ("'ab' SIMILAR TO 'a_'", True),
]

MATH = [
    ("abs(-2)", 2),
    ("ceil(1.2)", 2),
    ("floor(1.8)", 1),
    ("round(1.25d, 1)", 1.3),
    ("sign(-3)", -1.0),
    ("signum(-3)", -1.0),
    ("sqrt(4.0)", 2.0),
    ("cbrt(27.0)", 3.0),
    ("exp(0.0)", 1.0),
    ("ln(1.0)", 0.0),
    ("log(2.0, 8.0)", 3.0),
    ("log2(8.0)", 3.0),
    ("log10(100.0)", 2.0),
    ("power(2, 10)", 1024.0),
    ("pow(2, 10)", 1024.0),
    ("pi()", 3.141592653589793),
    ("degrees(pi())", 180.0),
    ("radians(180.0)", 3.141592653589793),
    ("sin(0.0)", 0.0),
    ("cos(0.0)", 1.0),
    ("tan(0.0)", 0.0),
    ("asin(0.0)", 0.0),
    ("acos(1.0)", 0.0),
    ("atan(0.0)", 0.0),
    ("atan2(0.0, 1.0)", 0.0),
    ("sinh(0.0)", 0.0),
    ("cosh(0.0)", 1.0),
    ("tanh(0.0)", 0.0),
    ("factorial(5)", 120),
    ("gcd(12, 8)", 4),
    ("gcd(0, 5)", 5),
    ("lcm(4, 6)", 12),
    ("isnan(0.0)", False),
    ("iszero(0.0)", True),
    ("nanvl(0.0, 1.0)", 0.0),
]

DATETIME = [
    ("date_trunc('hour', timestamp'2020-01-02 03:04:05')",
     datetime.datetime(2020, 1, 2, 3, 0)),
    ("date_part('year', timestamp'2020-01-02 03:04:05')", 2020),
    ("extract(year FROM timestamp'2020-01-02 03:04:05')", 2020),
    ("to_date('2020-01-02')", datetime.date(2020, 1, 2)),
    ("to_timestamp('2020-01-02 03:04:05')",
     datetime.datetime(2020, 1, 2, 3, 4, 5)),
    ("to_timestamp_seconds(1)", datetime.datetime(1970, 1, 1, 0, 0, 1)),
    ("to_timestamp_millis(1)",
     datetime.datetime(1970, 1, 1, 0, 0, 0, 1000)),
    ("to_timestamp_micros(1)", datetime.datetime(1970, 1, 1, 0, 0, 0, 1)),
    ("from_unixtime(0)", "1970-01-01 00:00:00"),
    ("to_unixtime(timestamp'1970-01-01 00:00:01')", 1.0),
    ("make_date(2020, 1, 2)", datetime.date(2020, 1, 2)),
    # date_bin (gap G7): seconds-stride shim.
    ("date_bin_seconds(3600, timestamp'2020-01-02 03:44:05',"
     " timestamp'2020-01-01 00:00:00')",
     datetime.datetime(2020, 1, 2, 3, 0)),
]

CONDITIONAL = [
    ("coalesce(NULL, 2)", 2),
    ("nullif(2, 2)", None),
    ("nvl(NULL, 2)", 2),
    ("nvl2(NULL, 1, 2)", 2),
    ("ifnull(NULL, 2)", 2),
    ("greatest(1, 3, 2)", 3),
    ("least(1, 3, 2)", 1),
]

CRYPTO_ENCODING = [
    ("md5('x')", "9dd4e461268c8034f5c8564e155c67a6"),
    ("sha224('x')", None),  # value checked as sha2(x,224) below
    ("sha256('x')", None),
    ("sha384('x')", None),
    ("sha512('x')", None),
    ("digest('x', 'sha256')", None),
    ("hex('ab')", "6162"),
    ("unhex('6162')", b"ab"),
    ("base64('ab')", "YWI="),
    ("unbase64('YWI=')", b"ab"),
]

ARRAY = [
    ("make_array(1, 2)", [1, 2]),
    ("array(1, 2)", [1, 2]),
    ("array_append(array(1), 2)", [1, 2]),
    ("array_concat(array(1), array(2))", [1, 2]),
    ("array_contains(array(1, 2), 2)", True),
    ("array_has(array(1, 2), 2)", True),
    ("array_has_all(array('a','b','c'), array('a','c'))", True),
    ("array_has_any(array(1, 2), array(2, 9))", True),
    ("array_distinct(array(1, 1, 2))", [1, 2]),
    ("array_element(array(7, 8), 1)", 7),  # 1-based, matching
    ("array_length(array(1, 2, 3))", 3),
    ("cardinality(array(1, 2, 3))", 3),
    ("array_dims(array('a','b'))", [2]),
    ("array_ndims(array('a'))", 1),
    ("array_empty(array())", True),
    ("array_position(array('a','b'), 'b')", 2),
    ("array_remove(array(1, 2, 1), 2)", [1, 1]),
    ("array_repeat('x', 2)", ["x", "x"]),
    ("array_reverse(array(1, 2))", [2, 1]),
    ("array_resize(array('a'), 3, 'z')", ["a", "z", "z"]),
    ("array_sort(array(2, 1))", [1, 2]),
    ("array_pop_front(array('a','b','c'))", ["b", "c"]),
    ("array_pop_back(array('a','b','c'))", ["a", "b"]),
    ("array_any_value(array(NULL, 'x'))", "x"),
    ("array_to_string(array('a','b'), ',')", "a,b"),
    ("string_to_array('a,b', ',')", ["a", "b"]),
    ("array_union(array(1), array(2))", [1, 2]),
    ("array_intersect(array(1, 2), array(2))", [2]),
    ("array_except(array(1, 2), array(2))", [1]),
    ("flatten(array(array(1), array(2)))", [1, 2]),
    ("generate_series(1, 3)", [1, 2, 3]),
]

MAP_STRUCT = [
    ("struct(1, 2).col1", 1),
    ("named_struct('a', 1).a", 1),
    ("map('a', 1)['a']", 1),
    ("map_keys(map('a', 1))", ["a"]),
    ("map_values(map('a', 1))", [1]),
    ("element_at(map('a', 1), 'a')", 1),
]

INTROSPECTION = [
    ("arrow_typeof(1)", "int"),  # → typeof
    ("typeof('s')", "string"),
]

ALL_CASES = (
    STRING + REGEX + MATH + DATETIME + CONDITIONAL + CRYPTO_ENCODING
    + ARRAY + MAP_STRUCT + INTROSPECTION
)


@pytest.mark.parametrize(
    ("expr", "expected"), ALL_CASES, ids=[c[0][:48] for c in ALL_CASES]
)
def test_datafusion_spelling_runs(dspark, expr, expected):
    got = _run(dspark, expr)
    if expected is None and "sha" in expr or "digest" in expr:
        assert isinstance(got, str) and len(got) >= 56  # hex digest
    elif isinstance(expected, float):
        assert got == pytest.approx(expected, abs=1e-12)
    else:
        assert got == expected


def test_sha_widths_match_sha2(dspark):
    for bits in (224, 256, 384, 512):
        assert _run(dspark, f"sha{bits}('x')") == _run(dspark, f"sha2('x', {bits})")
    assert _run(dspark, "digest('x', 'sha512')") == _run(dspark, "sha2('x', 512)")


def test_nondeterministic_surface_runs(dspark):
    assert len(_run(dspark, "uuid()")) == 36
    assert isinstance(_run(dspark, "now()"), datetime.datetime)
    assert isinstance(_run(dspark, "current_date"), datetime.date)
    assert 0.0 <= _run(dspark, "random()") < 1.0  # → rand
    assert isinstance(_run(dspark, "version()"), str)


def test_call_rewrites_close_former_gaps(dspark):
    """Argument-aware call rewrites (translate._rewrite_calls) close
    the former SURVEY §7 deviations: numeric trunc, hex/base64
    encode/decode, array_slice inclusive-end, array_prepend
    element-first."""
    assert _run(dspark, "trunc(3.7)") == 3.0
    assert _run(dspark, "trunc(-3.7)") == -3.0
    assert _run(dspark, "trunc(3.14159, 2)") == 3.14
    assert _run(dspark, "trunc(-3.14159, 2)") == -3.14
    # Spark's own date trunc — quoted second arg — is untouched
    assert _run(dspark, "trunc(DATE'2024-03-15', 'MM')") == datetime.date(2024, 3, 1)
    assert _run(dspark, "encode('abc', 'hex')") == "616263"
    assert bytes(_run(dspark, "decode('616263', 'hex')")) == b"abc"
    assert _run(dspark, "encode('abc', 'base64')") == "YWJj"
    assert bytes(_run(dspark, "decode('YWJj', 'base64')")) == b"abc"
    # charset conversion (Spark's encode/decode) still passes through
    assert _run(dspark, "decode(encode('abc', 'utf-8'), 'utf-8')") == "abc"
    assert _run(dspark, "array_slice(array(1,2,3), 1, 2)") == [1, 2]
    assert _run(dspark, "array_prepend(0, array(1,2))") == [0, 1, 2]
    # nested calls rewrite inside-out
    assert _run(dspark, "array_slice(array_prepend(0, array(1,2)), 2, 3)") == [1, 2]


def test_documented_gaps_stay_gaps(dspark):
    """Remaining known deviation (kept visible): range() as a scalar
    (end-exclusive list) — a textual rewrite cannot distinguish it
    from Spark's FROM-position range TVF; use generate_series
    (inclusive, already mapped to sequence) or the TVF."""
    with pytest.raises(Exception):
        _run(dspark, "range(1, 5)")
