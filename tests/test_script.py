"""Statement-splitter tests — semantics of the reference's execute
loop (crates/cli/src/main.rs:103-137)."""

from adt_spark.script import split_statements


def test_comments_skipped():
    out = list(split_statements(["-- a comment", "select 1;"]))
    assert out == ["select 1"]


def test_multiline_statement_terminated_by_semicolon():
    out = list(split_statements(["select 1", "from t;", "select 2;"]))
    assert out == ["select 1\nfrom t", "select 2"]


def test_trailing_unterminated_statement_runs():
    out = list(split_statements(["select 1;", "select 2"]))
    assert out == ["select 1", "select 2"]


def test_comment_between_lines():
    out = list(split_statements(["select 1", "-- note", ", 2;"]))
    assert out == ["select 1\n, 2"]


def test_empty_statements_dropped():
    assert list(split_statements([";", "  ;", ""])) == []
