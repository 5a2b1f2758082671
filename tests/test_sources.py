"""Source/registration layer tests — the format matrix from
SURVEY.md §5 (reference factories context.rs:37-42, listing.rs)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.ipc
import pytest

from adt_spark.sources import ensure_scheme, path_sql_name, register_table
from adt_spark.sources.delta import DeltaUnavailableError, read_delta
from adt_spark.sources.registry import UnsupportedFormatError


@pytest.fixture(scope="module")
def region_rows(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
        .orderBy("r_regionkey")
        .collect()
    )


def test_ensure_scheme_local_and_passthrough(tmp_path):
    # port of the reference's URL-normalization unit test
    # (deltatable.rs:620-630): dirs gain a trailing slash, schemes pass.
    d = tmp_path / "t"
    d.mkdir()
    assert ensure_scheme(str(d)) == f"file://{d}/"
    assert ensure_scheme("s3://bucket/key") == "s3://bucket/key"
    f = tmp_path / "x.parquet"
    f.write_bytes(b"")
    assert ensure_scheme(str(f)) == f"file://{f}"


def test_register_parquet(spark, sf_dir, region_rows):
    df = register_table(spark, "src_region", os.path.join(sf_dir, "region.parquet"))
    assert df.orderBy("r_regionkey").collect() == region_rows
    assert spark.sql("select count(*) from src_region").first()[0] == len(region_rows)


def test_register_csv_with_inference(spark, tmp_path, region_rows):
    path = str(tmp_path / "region_csv")
    rows = [(r.r_regionkey, r.r_name) for r in region_rows]
    spark.createDataFrame(rows, "r_regionkey int, r_name string").write.option(
        "header", "true"
    ).csv(path)
    df = register_table(spark, "src_region_csv", path, "csv")
    got = [(r.r_regionkey, r.r_name) for r in df.orderBy("r_regionkey").collect()]
    assert got == rows


def test_register_ndjson_and_multiline_json(spark, tmp_path, region_rows):
    nd = str(tmp_path / "region_nd")
    rows = [(r.r_regionkey, r.r_name) for r in region_rows]
    df_src = spark.createDataFrame(rows, "r_regionkey int, r_name string")
    df_src.write.json(nd)  # NDJSON: one object per line (Spark default)
    df = register_table(spark, "src_region_nd", nd, "ndjson")
    got = [(int(r.r_regionkey), r.r_name) for r in df.orderBy("r_regionkey").collect()]
    assert got == rows


def test_register_partitioned_directory(spark, tmp_path, sf_dir):
    # hive-layout discovery: partition col typed + appended after data
    # cols (reference listing.rs:67-120, deltatable.rs:136-152).
    path = str(tmp_path / "nation_parted")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).write.partitionBy(
        "n_regionkey"
    ).parquet(path)
    df = register_table(spark, "src_nation_p", path, "parquet", partition_cols=["n_regionkey"])
    assert "n_regionkey" in df.columns
    assert df.columns[-1] == "n_regionkey"  # appended after data columns
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    assert df.count() == n
    # partition pruning works through the discovered layout
    assert df.filter("n_regionkey = 1").count() == (
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .filter("n_regionkey = 1")
        .count()
    )


def test_register_partitioned_missing_col_raises(spark, tmp_path, sf_dir):
    path = str(tmp_path / "nation_flat")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).write.parquet(path)
    with pytest.raises(ValueError, match="partition columns"):
        register_table(spark, "bad", path, "parquet", partition_cols=["nope"])


def test_arrow_ipc_roundtrip(spark, tmp_path, region_rows):
    table = pa.table(
        {
            "r_regionkey": [r.r_regionkey for r in region_rows],
            "r_name": [r.r_name for r in region_rows],
        }
    )
    path = str(tmp_path / "region.arrow")
    with pa.ipc.new_file(path, table.schema) as writer:
        writer.write_table(table)
    df = register_table(spark, "src_region_arrow", path, "arrow")
    got = [(r.r_regionkey, r.r_name) for r in df.orderBy("r_regionkey").collect()]
    assert got == [(r.r_regionkey, r.r_name) for r in region_rows]

    from adt_spark.sources.arrow_ipc import read_arrow_ipc_distributed

    df2 = read_arrow_ipc_distributed(spark, path)
    assert sorted(tuple(r) for r in df2.collect()) == got


def test_unknown_format_raises(spark):
    with pytest.raises(UnsupportedFormatError):
        register_table(spark, "x", "/nowhere", "orc2")


def test_delta_gated(spark):
    # Without delta-spark jars the native log-replay reader handles the
    # read; a location with no _delta_log is a clear, typed error.
    with pytest.raises((DeltaUnavailableError, FileNotFoundError), match="Delta"):
        read_delta(spark, "/nowhere")


def test_url_table_sugar(spark, sf_dir):
    name = path_sql_name(os.path.join(sf_dir, "region.parquet"), "parquet")
    assert spark.sql(f"select count(*) from {name}").first()[0] == 5
