"""Native Delta read + write against a LIVE S3-compatible store.

Rounds 4-7 carried "live object-store verification" as an
environmental gap (BASELINE.md notes; reference wires S3 from env,
``context.rs:62-79``).  This round the container carries boto3 and
moto, so these tests run the jar-free ``s3://`` gateway
(``adt_spark/sources/s3_store.py``) against moto's ThreadedMotoServer
— a real S3 HTTP API on localhost (real ListObjectsV2 pagination,
real ETags, real ``If-None-Match`` 412 semantics), not a monkeypatched
client.  Spark's own ``s3a://`` path still needs the hadoop-aws jars
(absent here); the scheme split is documented in s3_store.

Covered end-to-end over real S3 HTTP: table create, append
(conditional-put commit), a LOST COMMIT RACE (the 412 path),
partitioned write, snapshot replay, data scan, time travel,
checkpoint write + checkpoint-based replay, copy-on-write DELETE,
and the driver-materialization byte-budget guard.
"""

from __future__ import annotations

import json
import os

import pytest

from adt_spark.sources import s3_store
from adt_spark.sources.delta_native import read_delta_native, replay_snapshot
from adt_spark.sources.delta_native_write import (
    DeltaWriteError,
    delete_where,
    write_delta_native,
    write_checkpoint,
)

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")


@pytest.fixture(scope="module")
def moto_server():
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    yield f"http://127.0.0.1:{port}"
    srv.stop()


@pytest.fixture()
def s3(moto_server, monkeypatch, tmp_path, request):
    """Point the gateway's env contract at the live server, isolate
    the materialization cache per test, and hand back a boto3 client
    plus a fresh bucket."""
    monkeypatch.setenv("AWS_ENDPOINT_URL", moto_server)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "adt-test-key")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "adt-test-secret")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    monkeypatch.setenv("ADT_S3_CACHE_DIR", str(tmp_path / "s3cache"))
    s3_store.clear_client_cache()
    bucket = f"adt-{abs(hash(request.node.name)) % 10**8}"
    client = boto3.client(
        "s3",
        endpoint_url=moto_server,
        aws_access_key_id="adt-test-key",
        aws_secret_access_key="adt-test-secret",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket=bucket)
    yield client, bucket
    s3_store.clear_client_cache()


def test_s3_roundtrip_create_append_timetravel(spark, s3):
    _client, bucket = s3
    loc = f"s3://{bucket}/t1"
    v0 = write_delta_native(spark.range(0, 5).selectExpr("id", "id * 2 AS x"), loc)
    assert v0 == 0
    v1 = write_delta_native(spark.range(5, 8).selectExpr("id", "id * 2 AS x"), loc)
    assert v1 == 1

    df = read_delta_native(spark, loc)
    assert sorted(r.id for r in df.collect()) == list(range(8))
    snap = replay_snapshot(spark, loc)
    assert snap.version == 1 and len(snap.files) >= 2
    assert snap.file_stats, "s3 write must record footer statistics"

    t0 = read_delta_native(spark, loc, version=0)
    assert sorted(r.id for r in t0.collect()) == list(range(5))


def test_s3_commit_race_loses_with_412(spark, s3):
    """The atomicity claim, against REAL conditional-put semantics.
    Two layers: (a) a writer whose replay already SEES a rival commit
    serializes AFTER it (optimistic concurrency — lands version 2,
    rival's bytes untouched); (b) a commit racing INTO an
    already-taken version (the window between replay and put) gets
    the server's 412 and surfaces it as a concurrent-commit
    DeltaWriteError — no lock table involved."""
    from adt_spark.sources.delta_native_write import _atomic_write, _log_path

    client, bucket = s3
    loc = f"s3://{bucket}/race"
    write_delta_native(spark.range(0, 3).selectExpr("id"), loc)
    # a rival writer publishes version 1 directly over the S3 API
    rival = json.dumps({"commitInfo": {"operation": "RIVAL"}}) + "\n"
    client.put_object(
        Bucket=bucket,
        Key="race/_delta_log/" + f"{1:020d}.json",
        Body=rival.encode(),
        IfNoneMatch="*",
    )
    # (a) replay sees the rival -> serialize after it as version 2
    v = write_delta_native(spark.range(3, 6).selectExpr("id"), loc)
    assert v == 2
    # (b) the true race window: a put at an already-taken version
    with pytest.raises(DeltaWriteError, match="concurrent commit"):
        _atomic_write(
            _log_path(loc, 2), [{"commitInfo": {"operation": "LOSER"}}]
        )
    got = (
        client.get_object(Bucket=bucket, Key="race/_delta_log/" + f"{1:020d}.json")[
            "Body"
        ]
        .read()
        .decode()
    )
    assert got == rival  # the winner's bytes survived both writes


def test_s3_partitioned_write_and_pruning(spark, s3):
    _client, bucket = s3
    loc = f"s3://{bucket}/part"
    df = spark.range(0, 20).selectExpr("id", "CAST(id % 2 AS STRING) AS p")
    write_delta_native(df, loc, partition_by=["p"])
    got = read_delta_native(spark, loc)
    assert got.count() == 20
    assert sorted(got.select("p").distinct().toPandas()["p"]) == ["0", "1"]
    snap = replay_snapshot(spark, loc)
    assert all("p=" in path for path in snap.files)


def test_s3_checkpoint_write_and_replay(spark, s3):
    client, bucket = s3
    loc = f"s3://{bucket}/cp"
    for lo in (0, 4, 8):
        write_delta_native(
            spark.range(lo, lo + 4).selectExpr("id"), loc, mode="append"
        )
    v = write_checkpoint(spark, loc)
    assert v == 2
    keys = [
        o["Key"]
        for o in client.list_objects_v2(Bucket=bucket, Prefix="cp/_delta_log/")[
            "Contents"
        ]
    ]
    assert f"cp/_delta_log/{2:020d}.checkpoint.parquet" in keys
    assert "cp/_delta_log/_last_checkpoint" in keys
    # replay THROUGH the checkpoint: drop the pre-checkpoint commits
    # (log cleanup) — the snapshot must rebuild from the parquet alone
    for n in (0, 1):
        client.delete_object(Bucket=bucket, Key=f"cp/_delta_log/{n:020d}.json")
    df = read_delta_native(spark, loc)
    assert sorted(r.id for r in df.collect()) == list(range(12))


def test_s3_copy_on_write_delete(spark, s3):
    _client, bucket = s3
    loc = f"s3://{bucket}/dml"
    write_delta_native(spark.range(0, 10).selectExpr("id", "id * 3 AS x"), loc)
    version, n = delete_where(spark, loc, "id >= 7")
    assert (version, n) == (1, 3)
    df = read_delta_native(spark, loc)
    assert sorted(r.id for r in df.collect()) == list(range(7))


def test_s3_materialization_budget_guard(spark, s3, monkeypatch):
    """The driver-gateway scale guard: a read whose data files exceed
    ADT_S3_MATERIALIZE_LIMIT must refuse loudly (full-corpus scans
    belong on s3a:// executor IO), not silently stream the table
    through one node."""
    _client, bucket = s3
    loc = f"s3://{bucket}/big"
    write_delta_native(spark.range(0, 1000).selectExpr("id"), loc)
    monkeypatch.setattr(s3_store, "_MATERIALIZE_LIMIT", 10)
    # ETag cache would satisfy the read without a download; force a
    # fresh cache dir so the budget is actually consulted
    monkeypatch.setenv("ADT_S3_CACHE_DIR", str(_fresh_dir()))
    with pytest.raises(s3_store.S3StoreError, match="MATERIALIZE_LIMIT"):
        read_delta_native(spark, loc).collect()


def _fresh_dir():
    import tempfile

    return tempfile.mkdtemp(prefix="adt-s3-budget-")


def test_s3_etag_cache_hits(spark, s3, tmp_path):
    """Unchanged objects are served from the ETag-keyed cache: a
    second read adds no new cache entries; an appended table adds
    only the NEW file."""
    _client, bucket = s3
    loc = f"s3://{bucket}/cache"
    write_delta_native(spark.range(0, 5).selectExpr("id"), loc)
    cache = tmp_path / "s3cache"

    def n_cached():
        return sum(len(files) for _r, _d, files in os.walk(cache))

    read_delta_native(spark, loc).collect()
    first = n_cached()
    assert first >= 1
    read_delta_native(spark, loc).collect()
    assert n_cached() == first  # pure cache hit
    write_delta_native(spark.range(5, 7).selectExpr("id"), loc, mode="append")
    read_delta_native(spark, loc).collect()
    assert n_cached() > first  # only the appended file downloads


def test_s3_listing_factory_parquet_hive(spark, s3, tmp_path):
    """The listing factory over the object store (A1-A3 at s3://):
    a hive-partitioned parquet prefix registers jar-free — the mirror
    tree preserves the layout, so Spark discovers the partition
    column and its values exactly as against the store."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from adt_spark.sources.registry import register_table

    client, bucket = s3
    for p in (0, 1):
        local = tmp_path / f"part{p}.parquet"
        pq_.write_table(
            pa.table({"id": pa.array(range(p * 5, p * 5 + 5), pa.int64())}),
            str(local),
        )
        client.upload_file(str(local), bucket, f"tbl/p={p}/data.parquet")
    df = register_table(spark, "s3_hive_t", f"s3://{bucket}/tbl", "parquet")
    assert sorted(r.id for r in df.collect()) == list(range(10))
    assert sorted(df.select("p").distinct().toPandas()["p"]) == [0, 1]
    # unchanged prefix: second registration resolves to the same tree
    df2 = register_table(spark, "s3_hive_t2", f"s3://{bucket}/tbl", "parquet")
    assert df2.count() == 10


def test_s3_listing_factory_csv(spark, s3):
    from adt_spark.sources.registry import register_table

    client, bucket = s3
    client.put_object(
        Bucket=bucket, Key="c/data.csv", Body=b"a,b\n1,x\n2,y\n"
    )
    df = register_table(
        spark, "s3_csv_t", f"s3://{bucket}/c", "csv", options={"header": "true"}
    )
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_s3_vacuum_deletes_objects(spark, s3):
    """VACUUM over s3://: tombstoned files past the horizon are
    deleted from the BUCKET (real DeleteObject calls), live files and
    the log survive."""
    client, bucket = s3
    loc = f"s3://{bucket}/vac"
    write_delta_native(spark.range(0, 6).selectExpr("id"), loc)
    delete_where(spark, loc, "id < 3")
    from adt_spark.sources.delta_native_write import vacuum

    gone = vacuum(spark, loc, retain_hours=0.0)
    assert gone  # every tombstoned (rewritten) part file reclaimed
    keys = [
        o["Key"]
        for o in client.list_objects_v2(Bucket=bucket, Prefix="vac/")["Contents"]
    ]
    assert not any(k.endswith(g) for g in gone for k in keys)
    assert sorted(r.id for r in read_delta_native(spark, loc).collect()) == [3, 4, 5]


def test_s3_shallow_clone_to_local_reads_through_gateway(spark, s3, tmp_path):
    """Cross-store shallow clone: a LOCAL clone whose add actions
    reference ABSOLUTE s3:// data files must read through the
    per-path gateway materialization (the clone's own location is
    local, so a location-keyed switch would pass the s3 URIs to
    Spark's Hadoop reader and die on 'No FileSystem for scheme s3')."""
    from adt_spark.sources.delta_native_write import shallow_clone

    _client, bucket = s3
    src_loc = f"s3://{bucket}/src"
    write_delta_native(spark.range(0, 6).selectExpr("id", "id * 7 AS x"), src_loc)
    clone_loc = str(tmp_path / "clone")
    shallow_clone(spark, src_loc, clone_loc)
    got = read_delta_native(spark, clone_loc)
    assert sorted(r.id for r in got.collect()) == list(range(6))


def test_s3_copy_to_sink_roundtrip(spark, s3):
    """COPY-style sinks at s3:// (the reference writes any format to
    its object store): parquet and csv write jar-free through the
    gateway (local stage + tree upload), register back through the
    listing factory, and the mode semantics map to object-store
    operations — error probes the prefix, overwrite deletes it,
    append adds fresh part names."""
    from adt_spark.sources.registry import register_table
    from adt_spark.sources.sinks import write_dataframe

    _client, bucket = s3
    target = f"s3://{bucket}/out"
    df = spark.range(0, 10).selectExpr("id", "CAST(id % 2 AS STRING) AS p")
    write_dataframe(df, target, fmt="parquet", partition_by=["p"])
    back = register_table(spark, "s3_sink_t", target, "parquet")
    assert back.count() == 10
    # hive partition inference types p as int
    assert sorted(back.select("p").distinct().toPandas()["p"]) == [0, 1]

    with pytest.raises(ValueError, match="already exists"):
        write_dataframe(df, target, fmt="parquet", mode="error")
    # append doubles the rows; overwrite restores
    write_dataframe(df, target, fmt="parquet", mode="append", partition_by=["p"])
    assert register_table(spark, "s3_sink_t2", target, "parquet").count() == 20
    write_dataframe(
        spark.range(0, 3).selectExpr("id", "'0' AS p"),
        target,
        fmt="parquet",
        mode="overwrite",
    )
    assert register_table(spark, "s3_sink_t3", target, "parquet").count() == 3

    csv_t = f"s3://{bucket}/outcsv"
    write_dataframe(
        spark.range(0, 4).selectExpr("id"), csv_t, fmt="csv",
        options={"header": "true"},
    )
    got = register_table(
        spark, "s3_sink_csv", csv_t, "csv", options={"header": "true"}
    )
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3]


def test_s3_delta_sink_routes_native(spark, s3):
    """A delta-format sink at s3:// routes to the native writer (its
    own gateway) with object-store existence semantics for
    error/ignore modes."""
    from adt_spark.sources.sinks import write_dataframe

    _client, bucket = s3
    loc = f"s3://{bucket}/dsink"
    write_dataframe(spark.range(0, 5).selectExpr("id"), loc, fmt="delta")
    assert read_delta_native(spark, loc).count() == 5
    with pytest.raises(ValueError, match="already exists"):
        write_dataframe(
            spark.range(5, 9).selectExpr("id"), loc, fmt="delta", mode="error"
        )
    write_dataframe(
        spark.range(5, 9).selectExpr("id"), loc, fmt="delta", mode="append"
    )
    assert read_delta_native(spark, loc).count() == 9


def test_s3_refresh_table_sees_store_changes(spark, s3):
    """Non-Delta s3:// registrations are point-in-time mirrors (the
    reference's listing factory reads the store live on every scan —
    listing.rs); ``refresh_table`` re-resolves against current store
    state, re-keying the ETag-snapshot tree."""
    from adt_spark.sources.registry import refresh_table, register_table

    client, bucket = s3
    client.put_object(Bucket=bucket, Key="r/a.csv", Body=b"a\n1\n2\n")
    df = register_table(
        spark, "s3_refresh_t", f"s3://{bucket}/r", "csv",
        options={"header": "true"},
    )
    assert df.count() == 2
    # a later store write is invisible to the registered snapshot...
    client.put_object(Bucket=bucket, Key="r/b.csv", Body=b"a\n3\n")
    assert spark.table("s3_refresh_t").count() == 2
    # ...until refresh re-resolves the mirror
    df2 = refresh_table(spark, "s3_refresh_t")
    assert df2.count() == 3
    assert spark.table("s3_refresh_t").count() == 3
    with pytest.raises(KeyError):
        refresh_table(spark, "never_registered_t")


def test_s3_gateway_refuses_nonlocal_master(spark, s3, monkeypatch):
    """Materialized paths live on the DRIVER's filesystem — under a
    non-local master the gateway must fail fast (executors cannot see
    ADT_S3_CACHE_DIR) unless ADT_S3_ALLOW_NONLOCAL declares the cache
    dir shared."""
    import pyspark.sql as pysql

    client, bucket = s3
    client.put_object(Bucket=bucket, Key="g/o.bin", Body=b"xyz")
    url = f"s3://{bucket}/g/o.bin"

    class _FakeConf:
        def get(self, k, default=None):
            return "spark://cluster:7077" if k == "spark.master" else default

    class _FakeSession:
        conf = _FakeConf()

    monkeypatch.setattr(
        pysql.SparkSession, "getActiveSession", classmethod(lambda cls: _FakeSession())
    )
    with pytest.raises(s3_store.S3StoreError, match="s3a://"):
        s3_store.materialize(url)
    # shared-FS escape hatch
    monkeypatch.setenv("ADT_S3_ALLOW_NONLOCAL", "1")
    local = s3_store.materialize(url)
    assert open(local, "rb").read() == b"xyz"


def test_s3_executor_upload_parquet(spark, s3):
    """Plain unpartitioned parquet sinks upload from the EXECUTORS
    (round-9: the genuinely distributed jar-free write path): one
    object per non-empty task, PUT by boto3 inside mapInArrow with
    the driver's env contract shipped in the closure — no driver
    staging, no ADT_S3_UPLOAD_LIMIT exposure."""
    from adt_spark.sources.registry import register_table
    from adt_spark.sources.sinks import write_dataframe

    client, bucket = s3
    target = f"s3://{bucket}/exec_up"
    df = spark.range(0, 1000).repartition(4).selectExpr("id", "id * 3 AS y")
    write_dataframe(df, target, fmt="parquet")
    objs = s3_store.list_prefix(target)
    assert 1 <= len(objs) <= 4
    assert all("/part-" in u and u.endswith(".parquet") for u, _s in objs)
    back = register_table(spark, "s3_exec_up_t", target, "parquet")
    assert back.count() == 1000
    assert back.selectExpr("sum(y) AS s").collect()[0].s == sum(3 * i for i in range(1000))
    # direct API: empty partitions write nothing
    n = s3_store.upload_dataframe_parquet(
        spark.range(0, 2).repartition(8), f"s3://{bucket}/exec_up2"
    )
    assert 1 <= n <= 2
    assert len(s3_store.list_prefix(f"s3://{bucket}/exec_up2")) == n


def test_s3_upload_budget_guard(spark, s3, monkeypatch):
    """The write-side twin of the materialization budget (round-8
    verdict item 3): driver-STAGED uploads (non-parquet sinks, Delta
    DML staging) share a per-write byte budget and refuse loudly past
    ADT_S3_UPLOAD_LIMIT; the executor-side parquet path has no driver
    bottleneck and stays un-budgeted."""
    from adt_spark.sources.sinks import write_dataframe

    _client, bucket = s3
    monkeypatch.setattr(s3_store, "_UPLOAD_LIMIT", 10)
    with pytest.raises(s3_store.S3StoreError, match="UPLOAD_LIMIT"):
        write_dataframe(
            spark.range(0, 500).selectExpr("id"),
            f"s3://{bucket}/big_csv",
            fmt="csv",
        )
    with pytest.raises(s3_store.S3StoreError, match="UPLOAD_LIMIT"):
        write_delta_native(
            spark.range(0, 500).selectExpr("id"), f"s3://{bucket}/big_delta"
        )
    # executor-side parquet is unaffected by the driver budget
    write_dataframe(
        spark.range(0, 500).selectExpr("id"), f"s3://{bucket}/ok_parquet",
        fmt="parquet",
    )
    assert len(s3_store.list_prefix(f"s3://{bucket}/ok_parquet")) >= 1


def test_s3_executor_upload_partitioned_hive(spark, s3):
    """Hive-partitioned parquet sinks also upload executor-side
    (round-9): one object per (task, partition-value) group under
    col=value/ dirs, partition columns dropped from the data files,
    NULL as the hive default-partition token — read-back through the
    listing factory discovers and types the partition column exactly
    as for a Spark-written layout."""
    from adt_spark.sources.registry import register_table
    from adt_spark.sources.sinks import write_dataframe

    _client, bucket = s3
    target = f"s3://{bucket}/exec_hive"
    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 3 AS INT) AS p"
    ).repartition(2)
    write_dataframe(df, target, fmt="parquet", partition_by=["p"])
    objs = s3_store.list_prefix(target)
    assert all("/p=" in u for u, _s in objs)
    back = register_table(spark, "s3_exec_hive_t", target, "parquet")
    assert back.count() == 100
    assert sorted(back.select("p").distinct().toPandas()["p"]) == [0, 1, 2]
    assert back.filter("p = 1").selectExpr("sum(id) AS s").collect()[0].s == sum(
        i for i in range(100) if i % 3 == 1
    )
    # NULL partition value lands in the hive default partition
    ndf = spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (2, CAST(NULL AS STRING)) AS t(id, p)"
    )
    write_dataframe(ndf, f"s3://{bucket}/exec_hive_null", fmt="parquet",
                    partition_by=["p"])
    urls = [u for u, _ in s3_store.list_prefix(f"s3://{bucket}/exec_hive_null")]
    assert any("__HIVE_DEFAULT_PARTITION__" in u for u in urls)


def test_s3_executor_upload_commit_protocol(spark, s3):
    """Round-10 (ADVICE r9): executor uploads stage under a per-job
    _adt_staging-<job>/ prefix with TASK-PARTITION-ID-derived names
    (a retried/speculative task overwrites its own object instead of
    duplicating rows) and the driver PROMOTES to final
    part-<pid>-<job>.parquet names after the job succeeds — so final
    names are deterministic per task, no staging objects survive a
    successful write, and two appends coexist under distinct job
    ids."""
    import re as _re

    from adt_spark.sources.registry import register_table
    from adt_spark.sources.sinks import write_dataframe

    _client, bucket = s3
    target = f"s3://{bucket}/exec_commit"
    df = spark.range(0, 400).repartition(4).selectExpr("id")
    n = s3_store.upload_dataframe_parquet(df, target)
    objs = s3_store.list_prefix(target)
    assert len(objs) == n
    # promoted names: part-<pid 5 digits>-<job 12 hex>.parquet, and
    # nothing left under the staging prefix
    name_re = _re.compile(r"/part-(\d{5})-([0-9a-f]{12})\.parquet$")
    pids, jobs = set(), set()
    for u, _sz in objs:
        m = name_re.search(u)
        assert m, u
        assert "_adt_staging" not in u
        pids.add(m.group(1))
        jobs.add(m.group(2))
    assert len(pids) == n  # one object per task, pid-derived
    assert len(jobs) == 1  # one job id per write
    # a second write (append semantics at the store level) gets a NEW
    # job id and never clobbers the first write's objects
    s3_store.upload_dataframe_parquet(
        spark.range(400, 500).repartition(2).selectExpr("id"), target
    )
    objs2 = s3_store.list_prefix(target)
    assert len(objs2) > len(objs)
    jobs2 = {name_re.search(u).group(2) for u, _sz in objs2}
    assert len(jobs2) == 2
    back = register_table(spark, "s3_exec_commit_t", target, "parquet")
    assert back.count() == 500
    assert back.selectExpr("sum(id) AS s").collect()[0].s == sum(range(500))
    # hive layout promotes within col=value/ dirs the same way
    hive_target = f"s3://{bucket}/exec_commit_hive"
    write_dataframe(
        spark.range(0, 60).selectExpr("id", "CAST(id % 2 AS INT) AS p"),
        hive_target, fmt="parquet", partition_by=["p"],
    )
    hobjs = s3_store.list_prefix(hive_target)
    assert all("/p=" in u and name_re.search(u) for u, _sz in hobjs)
    assert not any("_adt_staging" in u for u, _sz in hobjs)


def test_s3_promotion_preserves_dotparquet_partition_value(spark, s3):
    """ADVICE r10: promotion renames only the object BASENAME — a
    hive partition VALUE containing '.parquet' must survive the
    -<job> suffixing unchanged (a first-occurrence replace corrupted
    the directory name, silently changing the value on read-back)."""
    from adt_spark.sources.registry import register_table

    _client, bucket = s3
    target = f"s3://{bucket}/exec_dotparquet"
    df = spark.sql(
        "SELECT * FROM VALUES (1, 'a.parquet'), (2, 'a.parquet'), (3, 'b') "
        "AS t(id, fname)"
    ).repartition(1)
    s3_store.upload_dataframe_parquet(df, target, partition_by=["fname"])
    urls = [u for u, _ in s3_store.list_prefix(target)]
    assert any("/fname=a.parquet/part-" in u for u in urls), urls
    assert not any("_adt_staging" in u for u in urls)
    back = register_table(spark, "s3_dotparquet_t", target, "parquet")
    assert back.filter("fname = 'a.parquet'").count() == 2
    assert back.count() == 3
