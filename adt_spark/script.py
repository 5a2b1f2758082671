"""SQL-script statement splitter — behavior-for-behavior port of the
reference's ``execute`` loop (crates/cli/src/main.rs:103-137):

- lines whose trimmed form starts with ``--`` are skipped
  (main.rs:109-111);
- statements accumulate line-by-line and a trailing ``;`` terminates
  one (main.rs:112-123);
- a final unterminated statement still runs (main.rs:130-136).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator


def split_statements(lines: Iterable[str]) -> Iterator[str]:
    buf: list[str] = []
    for raw in lines:
        line = raw.rstrip("\n")
        # reference checks the RAW line (main.rs:112): an INDENTED
        # "--" line is appended as statement text (harmless SQL
        # comment) and its trailing ';' still terminates the statement
        if line.startswith("--"):
            continue
        buf.append(line)
        if line.rstrip().endswith(";"):
            stmt = "\n".join(buf).strip()
            buf = []
            if stmt.rstrip(";").strip():
                yield stmt.rstrip().rstrip(";")
    leftover = "\n".join(buf).strip()
    if leftover:
        yield leftover.rstrip(";")
