"""CLI — the reference's three subcommands re-expressed over Spark
(crates/cli/src/main.rs, arg surface crates/cli/src/cli.rs):

- ``view <uri> [-f fmt] [-q sql] [-l limit] [-p cols]``
  (main.rs:46-75): register the location as table ``tbl``, run the
  query with an appended LIMIT, pretty-print.  Defaults mirror the
  reference exactly: query ``select * from tbl`` (cli.rs:61), limit
  50 (cli.rs:63), format DELTA (cli.rs:59 — round 10: the earlier
  parquet deviation's rationale went stale once the jar-free native
  Delta reader landed; ``sources/delta_native.py`` reads delta in
  this container with no delta-spark present).
- ``schema <uri> [-f fmt] [-p cols]`` (main.rs:76-102; format
  default delta, cli.rs:75): register, then DESCRIBE (reference uses
  SHOW COLUMNS via information_schema).
- ``execute <file.sql>`` (main.rs:103-137): run a SQL script with the
  reference's comment/terminator semantics (adt_spark.script).
- top-level ``-l/--log-level {off,info,debug}`` (cli.rs:47-52):
  off (default) quiets the JVM logger to ERROR (the reference's Off
  disables its env_logger; engine errors still surface), info/debug
  map to Spark's INFO/DEBUG.

Usage: ``python -m adt_spark.cli view /path/data.parquet -f parquet``
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="adt-spark", description=__doc__)
    # reference: top-level -l/--log-level, default Off (cli.rs:47-52);
    # the subcommand -l (limit) lives in its own scope, like clap's
    parser.add_argument(
        "-l", "--log-level", choices=["off", "info", "debug"], default="off"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    view = sub.add_parser("view", help="preview a table (reference: adt view)")
    view.add_argument("uri")
    view.add_argument("-f", "--format", default="delta")
    view.add_argument("-q", "--query", default="select * from tbl")
    view.add_argument("-l", "--limit", type=int, default=50)
    view.add_argument("-p", "--partition-cols", default=None,
                      help="comma-separated partition columns")
    # the reference declares but comments out this export path
    # (cli.rs:67-68, main.rs:52 dead code) — completed here: write the
    # query result (WITHOUT the preview LIMIT) through the COPY sink
    # machinery; format by extension, parquet default.
    view.add_argument("-o", "--output-path", default=None,
                      help="also export the full query result to this path")

    schema = sub.add_parser("schema", help="show a table's schema")
    schema.add_argument("uri")
    schema.add_argument("-f", "--format", default="delta")
    schema.add_argument("-p", "--partition-cols", default=None)

    execute = sub.add_parser("execute", help="run a .sql script")
    execute.add_argument("file")

    queries = sub.add_parser(
        "queries",
        help="list the registered operator/query inventory (beyond the "
        "reference's three subcommands — discovery for the pipeline "
        "operator surface)",
    )
    queries.add_argument(
        "-t", "--tag", default=None, help="filter by tag substring"
    )
    return parser


def main(argv: list[str] | None = None, ctx=None) -> int:
    args = _build_parser().parse_args(argv)
    if args.command == "queries":
        # registry metadata only — no SparkSession is started
        from adt_spark.queries import load_all

        reg = load_all()
        shown = 0
        for name in sorted(reg):
            q = reg[name]
            if args.tag and not any(args.tag in t for t in q.tags):
                continue
            first = (q.doc.splitlines() or [""])[0].strip()
            mark = "oracle" if q.oracle else "rows-only"
            print(f"{name}\t[{mark}] {first}")
            shown += 1
        print(f"{shown} of {len(reg)} registered queries")
        return 0
    owns_ctx = ctx is None
    if owns_ctx:
        from adt_spark import ADTContext

        ctx = ADTContext(app_name=f"adt-spark-{args.command}")
    if owns_ctx or args.log_level != "off":
        # skip the default-off set on a borrowed session (tests share
        # one session; don't mutate its logger behind its back)
        level = {"off": "ERROR", "info": "INFO", "debug": "DEBUG"}[
            args.log_level
        ]
        ctx.spark.sparkContext.setLogLevel(level)
    try:
        if args.command == "view":
            _register(ctx, args)
            # reference appends LIMIT to the user query (main.rs:72)
            ctx.sql(f"{args.query} limit {args.limit}").show(args.limit, truncate=False)
            if args.output_path:
                if "'" in args.output_path:
                    raise SystemExit(
                        f"output path may not contain a single quote: "
                        f"{args.output_path!r}"
                    )
                n = ctx.sql(
                    f"COPY ({args.query.rstrip().rstrip(';')}) TO '{args.output_path}'"
                ).first()["count"]
                print(f"exported {n} rows to {args.output_path}")
        elif args.command == "schema":
            _register(ctx, args)
            ctx.sql("describe tbl").show(1000, truncate=False)
        elif args.command == "execute":
            from adt_spark.script import split_statements

            with open(args.file) as fh:
                for stmt in split_statements(fh):
                    df = ctx.sql(stmt)
                    # reference collects and prints ALL rows
                    # (main.rs:16-29) — no silent truncation.  persist
                    # + count + show computes the plan ONCE and renders
                    # a consistent snapshot entirely JVM-side (a bare
                    # count()+show() runs the plan twice and the two
                    # passes can disagree for non-deterministic
                    # queries; collect()-and-rebuild would pickle the
                    # whole result through Python twice).
                    df.persist()
                    try:
                        df.show(max(df.count(), 1), truncate=False)
                    finally:
                        df.unpersist()
    finally:
        if owns_ctx:
            ctx.spark.stop()
    return 0


def _register(ctx, args) -> None:
    """Template the reference's DDL string byte-for-byte
    (main.rs:54-67) and run it through the SQL entry point, so the
    CLI exercises the same CREATE EXTERNAL TABLE path an adt script
    would."""
    part_spec = (
        f"partitioned by ({args.partition_cols})" if args.partition_cols else ""
    )
    ddl = (
        "\ncreate external table tbl\n"
        f"stored as {args.format}\n"
        f"{part_spec}\n"
        f"location '{args.uri}'\n"
    )
    ctx.sql(ddl)


if __name__ == "__main__":
    sys.exit(main())
