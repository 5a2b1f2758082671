"""CLI black-box tests (reference behaviors: limit appending
main.rs:72, schema output main.rs:99, script execution main.rs:103-137)."""

from __future__ import annotations

import os

from adt_spark.cli import main


class _Ctx:
    """Adapter handing the shared test session to the CLI."""

    def __init__(self, spark):
        self.spark = spark

    def sql(self, q):
        from adt_spark.dialect.translate import translate_sql

        return self.spark.sql(translate_sql(q))

    def register_table(self, name, location, fmt="parquet", **kw):
        from adt_spark.sources import register_table

        return register_table(self.spark, name, location, fmt, **kw)


def test_view_appends_limit(spark, sf_dir, capsys):
    rc = main(
        ["view", os.path.join(sf_dir, "customer.parquet"), "-f", "parquet", "-l", "7"],
        ctx=_Ctx(spark),
    )
    assert rc == 0
    out = capsys.readouterr().out
    # default query `select * from tbl` with appended limit 7
    assert out.count("\n") > 5
    assert "c_custkey" in out
    assert "only showing top 7 rows" in out or out.count("|") >= 7


def test_view_custom_query(spark, sf_dir, capsys):
    rc = main(
        [
            "view",
            os.path.join(sf_dir, "region.parquet"),
            "-f",
            "parquet",
            "-q",
            "select r_name from tbl where r_regionkey ~ '^[12]$'",
            "-l",
            "10",
        ],
        ctx=_Ctx(spark),
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "AMERICA" in out and "ASIA" in out and "AFRICA" not in out


def test_schema_describe(spark, sf_dir, capsys):
    rc = main(["schema", os.path.join(sf_dir, "region.parquet")], ctx=_Ctx(spark))
    assert rc == 0
    out = capsys.readouterr().out
    assert "r_regionkey" in out and "r_name" in out


def test_execute_script(spark, sf_dir, tmp_path, capsys):
    script = tmp_path / "s.sql"
    script.write_text(
        "-- comment line\n"
        f"create or replace temporary view t_exec as\n"
        f"select * from parquet.`{os.path.join(sf_dir, 'region.parquet')}`;\n"
        "select count(*) as n\n"
        "from t_exec"
    )
    rc = main(["execute", str(script)], ctx=_Ctx(spark))
    assert rc == 0
    out = capsys.readouterr().out
    assert "| 5" in out.replace("|5", "| 5") or "5" in out


def test_view_output_path_export(spark, sf_dir, tmp_path, capsys):
    """-o exports the FULL query result (no preview LIMIT) through the
    COPY sink — the reference's declared-but-dead export surface
    (cli.rs:67-68), completed."""
    from adt_spark import ADTContext

    out = str(tmp_path / "export_out")
    rc = main(
        [
            "view",
            os.path.join(sf_dir, "customer.parquet"),
            "-f", "parquet",
            "-q", "select c_custkey, c_name from tbl where c_custkey < 100",
            "-l", "5",
            "-o", out,
        ],
        ctx=ADTContext(spark=spark),
    )
    assert rc == 0
    assert "exported 100 rows" in capsys.readouterr().out
    back = spark.read.parquet(out)
    assert back.count() == 100  # full result, not the 5-row preview
    assert set(back.columns) == {"c_custkey", "c_name"}
