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


# -- CREATE EXTERNAL TABLE DDL (reference main.rs:54-67) ---------------

import os

import pytest

from adt_spark.dialect.ddl import (
    DECLARED_ORDERS,
    is_create_external_table,
    parse_create_external_table,
)
from tests.conftest import SF_DIR


def test_parse_reference_templated_ddl():
    # byte-for-byte the CLI's render! template (main.rs:54-67)
    ddl = """
            create external table tbl
            stored as parquet

            location '/data/x.parquet'
            """
    assert is_create_external_table(ddl)
    spec = parse_create_external_table(ddl)
    assert spec["name"] == "tbl"
    assert spec["fmt"] == "parquet"
    assert spec["location"] == "/data/x.parquet"
    assert spec["partition_cols"] is None


def test_parse_partitioned_and_options():
    spec = parse_create_external_table(
        "CREATE EXTERNAL TABLE IF NOT EXISTS logs (id BIGINT, msg VARCHAR) "
        "STORED AS csv WITH HEADER ROW DELIMITER '|' "
        "PARTITIONED BY (dt) OPTIONS ('nullValue' 'NA') LOCATION '/data/logs/'"
    )
    assert spec["if_not_exists"]
    assert spec["schema"] == "id BIGINT, msg STRING"
    assert spec["partition_cols"] == ["dt"]
    assert spec["options"] == {"header": "true", "sep": "|", "nullValue": "NA"}


def test_parse_with_order():
    spec = parse_create_external_table(
        "CREATE EXTERNAL TABLE t (a INT, b INT) STORED AS parquet "
        "WITH ORDER (a ASC, b DESC) LOCATION '/data/t/'"
    )
    assert spec["order"] == [("a", True), ("b", False)]


def test_parse_quoted_vs_qualified_names():
    """A QUOTED identifier containing a dot is one verbatim name;
    only UNQUOTED dotted names are catalog-qualified and truncate to
    the last component at registration."""
    quoted = parse_create_external_table(
        'CREATE EXTERNAL TABLE "a.b" STORED AS parquet LOCATION \'/d/\''
    )
    assert quoted["name"] == "a.b" and quoted["name_quoted"]
    ticked = parse_create_external_table(
        "CREATE EXTERNAL TABLE `a.b` STORED AS parquet LOCATION '/d/'"
    )
    assert ticked["name"] == "a.b" and ticked["name_quoted"]
    plain = parse_create_external_table(
        "CREATE EXTERNAL TABLE datafusion.public.t STORED AS parquet LOCATION '/d/'"
    )
    assert plain["name"] == "datafusion.public.t" and not plain["name_quoted"]


def test_not_ddl_passthrough():
    assert not is_create_external_table("SELECT * FROM create_external_table")
    assert parse_create_external_table("select 1") is None


def test_execute_script_with_reference_ddl_end_to_end(spark, tmp_path):
    """An adt `execute` script: templated DDL + SELECT, end-to-end
    through ADTContext.sql via the statement splitter."""
    from adt_spark import ADTContext
    from adt_spark.script import split_statements

    ctx = ADTContext(spark=spark)
    script = f"""-- adt script
create external table ext_nation
stored as parquet
location '{os.path.join(SF_DIR, "nation.parquet")}';
select count(*) as n from ext_nation"""
    results = [ctx.sql(stmt) for stmt in split_statements(script.splitlines())]
    assert results[0].count() == 0  # DDL result: empty batch
    assert results[1].collect()[0]["n"] == 25


def test_execute_script_groups_exclude_frames(spark):
    """An adt script using DataFusion 48's full window-frame grammar —
    a GROUPS frame and an EXCLUDE frame (context.rs:32-33 surface,
    reached via the CLI's raw pass-through main.rs:116) — end-to-end
    through the splitter + ADTContext.sql, matching the DuckDB oracle
    (native EXCLUDE; dense_rank construction for GROUPS, which DuckDB
    itself does not implement)."""
    import duckdb

    from adt_spark import ADTContext
    from adt_spark.script import split_statements

    ctx = ADTContext(spark=spark)
    li = os.path.join(SF_DIR, "lineitem.parquet")
    script = f"""-- window-frame grammar script
create external table wf_lineitem
stored as parquet
location '{li}';
SELECT l_orderkey, l_linenumber,
       sum(CAST(l_quantity AS BIGINT)) OVER (
         PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
         GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS grp_sum
FROM wf_lineitem;
SELECT l_orderkey, l_linenumber,
       sum(CAST(l_quantity AS BIGINT)) OVER (
         PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
         RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING
         EXCLUDE CURRENT ROW) AS excl_sum
FROM wf_lineitem"""
    results = [ctx.sql(stmt) for stmt in split_statements(script.splitlines())]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW wf_lineitem AS SELECT * FROM read_parquet('{li}')"
    )
    groups_oracle = con.execute(
        """
        WITH r AS (
          SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
                 dense_rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY CAST(l_quantity AS BIGINT)) AS dr,
                 l_returnflag
          FROM wf_lineitem)
        SELECT l_orderkey, l_linenumber,
               sum(qty) OVER (PARTITION BY l_returnflag ORDER BY dr
                              RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS grp_sum
        FROM r
        """
    ).fetchall()
    exclude_oracle = con.execute(
        """
        SELECT l_orderkey, l_linenumber,
               sum(CAST(l_quantity AS BIGINT)) OVER (
                 PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
                 RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING
                 EXCLUDE CURRENT ROW) AS excl_sum
        FROM wf_lineitem
        """
    ).fetchall()
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(results[1].collect()) == key(groups_oracle)
    assert key(results[2].collect()) == key(exclude_oracle)


def test_ddl_with_order_registers_contract(spark):
    from adt_spark import ADTContext

    ctx = ADTContext(spark=spark)
    path = os.path.join(SF_DIR, "orders.parquet")
    ctx.sql(
        f"create external table ext_orders_sorted stored as parquet "
        f"with order (o_orderkey asc) location '{path}'"
    )
    assert DECLARED_ORDERS["ext_orders_sorted"] == [("o_orderkey", True)]
    assert spark.table("ext_orders_sorted").count() > 0
    with pytest.raises(Exception, match="not in schema"):
        ctx.sql(
            f"create external table ext_bad stored as parquet "
            f"with order (nope) location '{path}'"
        )


def test_execute_script_delta_lifecycle_end_to_end(spark, tmp_path):
    """A maintenance script an adt user would actually run — CTAS-ish
    COPY into Delta, DML, OPTIMIZE, DESCRIBE HISTORY, time travel,
    RESTORE — every statement through the splitter + ADTContext.sql."""
    from adt_spark import ADTContext
    from adt_spark.script import split_statements

    ctx = ADTContext(spark=spark)
    loc = str(tmp_path / "script_delta")
    script = f"""-- delta lifecycle script
COPY (SELECT n_nationkey AS id, n_name AS name
      FROM parquet.`{os.path.join(SF_DIR, "nation.parquet")}`) TO '{loc}' STORED AS DELTA;
DELETE FROM delta.`{loc}` WHERE id >= 20;
OPTIMIZE delta.`{loc}`;
DESCRIBE HISTORY delta.`{loc}`;
SELECT count(*) AS n FROM delta.`{loc}`;
SELECT count(*) AS n0 FROM delta.`{loc}` VERSION AS OF 0;
RESTORE TABLE delta.`{loc}` TO VERSION AS OF 0;
SELECT count(*) AS n FROM delta.`{loc}`"""
    results = [ctx.sql(stmt) for stmt in split_statements(script.splitlines())]
    hist_ops = [r.operation for r in results[3].collect()]
    assert hist_ops[1:3] == ["DELETE", "OPTIMIZE"]
    assert results[4].first().n == 20     # after DELETE (+OPTIMIZE no-change)
    assert results[5].first().n0 == 25    # time travel to v0
    assert results[7].first().n == 25     # restored


def test_execute_script_delta_session3_features_end_to_end(spark, tmp_path):
    """One `execute` script driving every session-3 Delta statement:
    CONVERT, SET TBLPROPERTIES (enabling DVs), DV DELETE, constraint
    ADD/enforce/DROP, SHALLOW CLONE, DESCRIBE DETAIL, and SHOW
    TBLPROPERTIES — the SQL surface a migrating adt user script hits."""
    from adt_spark import ADTContext
    from adt_spark.script import split_statements

    ctx = ADTContext(spark=spark)
    src = tmp_path / "plain_pq"
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(str(src))
    clone = tmp_path / "clone"
    script = f"""
-- migrate the parquet directory in place
CONVERT TO DELTA parquet.`{src}`;
ALTER TABLE delta.`{src}` ADD CONSTRAINT v_even CHECK (v % 2 = 0);
ALTER TABLE delta.`{src}` SET TBLPROPERTIES ('delta.enableDeletionVectors'='true');
DELETE FROM delta.`{src}` WHERE id >= 8;
SELECT count(*) AS n FROM delta.`{src}`;
CREATE TABLE delta.`{clone}` SHALLOW CLONE delta.`{src}`;
DESCRIBE DETAIL delta.`{clone}`;
SHOW TBLPROPERTIES delta.`{src}`;
ALTER TABLE delta.`{src}` DROP CONSTRAINT v_even;
"""
    results = [ctx.sql(stmt) for stmt in split_statements(script.splitlines())]
    n = results[4].first()["n"]
    assert n == 8  # DV delete removed ids 8, 9
    detail = results[6].first()
    assert detail.format == "delta" and detail.numFiles >= 1
    props = {(r.key, r.value) for r in results[7].collect()}
    assert ("delta.enableDeletionVectors", "true") in props
    assert ("delta.constraints.v_even", "v % 2 = 0") in props
    # the clone reads the DV-masked state and carries the constraint
    from adt_spark.sources.delta_native import read_delta_native
    from adt_spark.sources.delta_native_write import (
        DeltaWriteError,
        write_delta_native,
    )

    assert read_delta_native(spark, str(clone)).count() == 8
    import pytest as _pytest

    with _pytest.raises(DeltaWriteError, match="v_even"):
        write_delta_native(
            spark.createDataFrame([(100, 3)], "id bigint, v bigint"),
            str(clone),
            mode="append",
        )
