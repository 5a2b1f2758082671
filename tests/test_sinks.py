"""Sink-surface tests — COPY TO / INSERT INTO / CTAS (SURVEY.md §2.B
"Sinks"; reference evidence: permissive SQLOptions context.rs:94 over
DataFusion 48's COPY/INSERT/CTAS support)."""

from __future__ import annotations

import os

import pytest

from adt_spark.sources.sinks import parse_copy


@pytest.fixture(scope="module")
def ctx(spark):
    from adt_spark import ADTContext

    return ADTContext(spark=spark)


# -- parser unit tests -------------------------------------------------------


def test_parse_copy_query_form():
    spec = parse_copy(
        "COPY (SELECT a, b FROM t WHERE a > (1 + 2)) TO '/tmp/out' "
        "STORED AS CSV PARTITIONED BY (b) OPTIONS (delimiter '|', compression 'gzip')"
    )
    assert spec["query"] == "SELECT a, b FROM t WHERE a > (1 + 2)"
    assert spec["path"] == "/tmp/out"
    assert spec["fmt"] == "csv"
    assert spec["partition_by"] == ["b"]
    assert spec["options"] == {"delimiter": "|", "compression": "gzip"}


def test_parse_copy_table_form_extension_inference():
    spec = parse_copy("COPY mytable TO '/tmp/out.json'")
    assert spec["query"] == "SELECT * FROM mytable"
    assert spec["fmt"] == "json"
    assert spec["partition_by"] == []


def test_parse_copy_defaults_to_parquet():
    assert parse_copy("COPY t TO '/tmp/dir'")["fmt"] == "parquet"


def test_parse_copy_rejects_unknown_format():
    with pytest.raises(ValueError):
        parse_copy("COPY t TO '/tmp/x' STORED AS xlsx")


# -- end-to-end COPY ---------------------------------------------------------


def test_copy_parquet_roundtrip(ctx, spark, sf_dir, tmp_path):
    ctx.register_table("sink_nation", os.path.join(sf_dir, "nation.parquet"))
    out = str(tmp_path / "nation_out")
    res = ctx.sql(f"COPY (SELECT * FROM sink_nation WHERE n_nationkey < 10) TO '{out}'")
    assert res.columns == ["count"]
    assert res.first()["count"] == 10
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert set(back.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_copy_csv_with_options_roundtrip(ctx, spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_csv")
    ctx.register_table("sink_region", os.path.join(sf_dir, "region.parquet"))
    ctx.sql(f"COPY sink_region TO '{out}' STORED AS CSV OPTIONS (delimiter '|')")
    back = (
        spark.read.option("header", "true")
        .option("delimiter", "|")
        .option("inferSchema", "true")
        .csv(out)
    )
    assert back.count() == 5
    assert back.filter("r_name = 'ASIA'").count() == 1


def test_copy_partitioned_hive_layout(ctx, spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_by_region")
    ctx.sql(
        f"COPY (SELECT n_nationkey, n_name, n_regionkey FROM sink_nation) "
        f"TO '{out}' PARTITIONED BY (n_regionkey)"
    )
    # hive layout on disk → partition discovery on read (listing.rs analog)
    subdirs = {d for d in os.listdir(out) if d.startswith("n_regionkey=")}
    assert len(subdirs) == 5
    back = spark.read.parquet(out)
    assert back.count() == 25
    assert back.filter("n_regionkey = 2").count() == 5


# -- INSERT INTO / CTAS (native Spark SQL, via the same entry point) ---------


def test_ctas_and_insert_into(ctx, spark, sf_dir, tmp_path):
    loc = str(tmp_path / "ctas_tbl")
    ctx.sql("DROP TABLE IF EXISTS ctas_nations")
    ctx.sql(
        f"CREATE TABLE ctas_nations USING parquet LOCATION '{loc}' AS "
        "SELECT n_nationkey, n_name FROM sink_nation WHERE n_nationkey < 3"
    )
    assert ctx.sql("SELECT count(*) AS c FROM ctas_nations").first()["c"] == 3
    ctx.sql(
        "INSERT INTO ctas_nations "
        "SELECT n_nationkey, n_name FROM sink_nation WHERE n_nationkey BETWEEN 3 AND 5"
    )
    assert ctx.sql("SELECT count(*) AS c FROM ctas_nations").first()["c"] == 6
    # data lives at the external location, readable without the catalog
    assert spark.read.parquet(loc).count() == 6
    ctx.sql("DROP TABLE ctas_nations")


def test_copy_arrow_ipc_roundtrip(ctx, spark, sf_dir, tmp_path):
    from adt_spark.sources.arrow_ipc import read_arrow_ipc, read_arrow_ipc_distributed

    ctx.register_table("sink_nation2", os.path.join(sf_dir, "nation.parquet"))
    out = str(tmp_path / "nation_arrow")
    res = ctx.sql(
        f"COPY (SELECT n_nationkey, n_name FROM sink_nation2) TO '{out}' STORED AS ARROW"
    )
    assert res.first()["count"] == 25
    files = [f for f in os.listdir(out) if f.endswith(".arrow")]
    assert files, "no IPC part files written"
    back = read_arrow_ipc(spark, out)
    assert back.count() == 25
    assert set(back.columns) == {"n_nationkey", "n_name"}
    dist = read_arrow_ipc_distributed(spark, out)
    assert dist.count() == 25


def test_bucketed_join_eliminates_shuffle(ctx, spark, sf_dir, tmp_path):
    """orders ⋈ lineitem bucketed on the join key: the join plan must
    contain NO shuffle exchange — the bucket layout satisfies the
    join's distribution requirement on both sides (the co-located-join
    contract that makes repeated fact⋈fact joins affordable at 100 TB)."""
    from adt_spark.sources.sinks import write_bucketed

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(orders, "bkt_orders", ["o_orderkey"], 8)
    write_bucketed(lineitem, "bkt_lineitem", ["l_orderkey"], 8)
    # at test scale the planner would broadcast instead (and skip the
    # bucketed scan entirely); force the shuffle-join class the lever
    # exists for — fact⋈fact sizes where broadcast is impossible.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_orders").join(
            spark.table("bkt_lineitem"),
            spark.table("bkt_orders").o_orderkey
            == spark.table("bkt_lineitem").l_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        # correctness: same row count as the shuffled join
        assert joined.count() == orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bkt_orders", "bkt_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_files(ctx, spark, sf_dir, tmp_path):
    """64 tiny input files compact to 1 size-targeted output file with
    identical rows — the small-files maintenance op for streaming
    ingest directories."""
    from adt_spark.sources.sinks import compact_files

    src = str(tmp_path / "many_small")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.repartition(64).write.parquet(src)
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in == 64
    dst = str(tmp_path / "compacted")
    n_out = compact_files(spark, src, dst, target_mb=128)
    assert n_out == 1
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)


def test_bucketed_sorted_join_eliminates_sort(ctx, spark, sf_dir, tmp_path):
    """The READ-side sort contract (reference WITH ORDER,
    listing.rs:127-149: declared file order lets the engine elide
    sorts).  Bucketed+sorted tables with one file per bucket report
    their sort order from the scan, so a sort-merge join plans with
    NO Sort and NO Exchange on either side."""
    from adt_spark.sources.sinks import write_bucketed

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bs_orders", "bs_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the in-memory catalog forgets managed tables across sessions
        # but their warehouse dirs persist; clear leftovers
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    # coalesce(1): one file per bucket — Spark only exposes the
    # declared sort order to the planner in that layout (SPARK-24528);
    # at scale, compaction to one file per bucket is the same move.
    write_bucketed(
        orders.coalesce(1), "bs_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem.coalesce(1), "bs_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    prev_smj = spark.conf.get("spark.sql.join.preferSortMergeJoin")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    # Spark stopped reporting scan output ordering by default because
    # multi-file buckets interleave (SPARK-28595); with one file per
    # bucket the order is real, and this conf re-enables using it.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = spark.table("bs_orders").join(
            spark.table("bs_lineitem"),
            spark.table("bs_orders").o_orderkey
            == spark.table("bs_lineitem").l_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Sort [" not in plan, plan  # sort nodes print as `Sort [expr`
        assert joined.count() == orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", prev_smj)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
