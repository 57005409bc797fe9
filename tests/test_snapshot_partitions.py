"""Partition columns on snapshot tables (VERDICT r5 missing item 2).

Hive-style layout (``data/c=v/...``) where — unlike Spark's own
``partitionBy`` — the partition column STAYS inside every data file
(a staging-only shadow feeds the directory split). Partition pruning is
therefore exact min==max stats pruning with zero extra machinery, the
spec is sticky across appends/DML/compact, and every reader face works
unchanged.
"""

from __future__ import annotations

import glob
import os

import pytest

# every test in this module runs under BOTH data-plane backends
# (posix hard-link / object-store copy emulation) — VERDICT r6 item 1
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

import dask_awkward_spark.sources.snapshot as snap
from dask_awkward_spark.sources.snapshot import (
    SnapshotConflictError,
    snapshot_changes,
    snapshot_compact,
    snapshot_delete,
    snapshot_merge,
    snapshot_read,
    snapshot_restore,
    snapshot_update,
    snapshot_vacuum,
    snapshot_write,
)


def _days(spark, lo, hi, n_days=5):
    return (
        spark.range(lo, hi)
        .withColumn("day", (F.col("id") % n_days).cast("int"))
        .withColumn("v", F.col("id") * 2)
    )


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 100), p, partition_by=["day"])
    m = snap._read_manifest(p, 1)
    assert m["partition_by"] == ["day"]
    # hive dirs on disk, every manifest relpath routed through them
    assert sorted(os.listdir(f"{p}/data")) == [f"day={d}" for d in range(5)]
    assert all(f.startswith("data/day=") for f in m["files"])
    # partition pruning IS stats pruning: day=3 keeps only that dir's files
    kept, skipped = snap._prune_files(m, [("day", "=", 3)], None)
    assert skipped > 0 and all("day=3/" in f for f in kept)
    got = snapshot_read(spark, p, where=[("day", "=", 3)])
    assert sorted(r.id for r in got.collect()) == [i for i in range(100) if i % 5 == 3]
    # the partition column is INSIDE the files: a plain pyarrow read of
    # one file sees it (self-contained files, unlike Spark partitionBy)
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(p, kept[0]))
    assert "day" in t.column_names and set(t["day"].to_pylist()) == {3}


def test_partition_spec_is_sticky_and_append_cannot_change_it(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 50), p, partition_by=["day"])
    snapshot_write(_days(spark, 50, 70), p, mode="append")  # inherits
    m = snap._read_manifest(p, 2)
    assert m["partition_by"] == ["day"]
    assert all(f.startswith("data/day=") for f in m["files"])
    with pytest.raises(ValueError, match="only overwrite may repartition"):
        snapshot_write(_days(spark, 70, 80), p, mode="append", partition_by=["v"])
    # overwrite also inherits when omitted; explicit [] un-partitions
    snapshot_write(_days(spark, 0, 20), p, mode="overwrite")
    assert snap._read_manifest(p, 3)["partition_by"] == ["day"]
    snapshot_write(_days(spark, 0, 20), p, mode="overwrite", partition_by=[])
    m = snap._read_manifest(p, 4)
    assert m["partition_by"] is None
    assert all("/" not in f[len("data/") :] for f in m["files"])


def test_partition_by_validation(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = _days(spark, 0, 10).withColumn("f", F.col("id") * 0.5)
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_write(df, p, partition_by=["nope"])
    with pytest.raises(ValueError, match="round-trip exactly"):
        snapshot_write(df, p, partition_by=["f"])  # float: refused
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_write(df, p, partition_by=["day", "day"])
    with pytest.raises(ValueError, match="reserved"):
        snapshot_write(df.withColumn("__dakp_x", F.lit(1)), p)


def test_dml_preserves_partition_layout(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 100), p, partition_by=["day"])
    snapshot_delete(spark, p, [("day", "=", 1)])
    snapshot_update(spark, p, [("day", "=", 2)], {"v": F.lit(0).cast("bigint")})
    src = (
        spark.range(200, 210)
        .withColumn("day", F.lit(0).cast("int"))
        .withColumn("v", F.lit(1).cast("bigint"))
    )
    snapshot_merge(spark, p, src, on=["id"])
    m = snap._read_manifest(p, snap._versions(p)[-1])
    assert m["partition_by"] == ["day"]
    assert all(f.startswith("data/day=") for f in m["files"])
    got = snapshot_read(spark, p)
    assert got.filter(F.col("day") == 1).count() == 0
    assert got.filter((F.col("day") == 2) & (F.col("v") != 0)).count() == 0
    assert got.filter(F.col("id") >= 200).count() == 10
    # change feed survives partitioned DML
    ch = snapshot_changes(spark, p, since=1, row_level=True)
    assert ch.filter(F.col("_change_type") == "delete").count() == 20


def test_compact_partitioned_one_file_per_value(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 50), p, partition_by=["day"])
    snapshot_write(_days(spark, 50, 100), p, mode="append")
    before = len(snap._read_manifest(p, 2)["files"])
    v = snapshot_compact(spark, p)
    m = snap._read_manifest(p, v)
    assert m["partition_by"] == ["day"]
    assert all(f.startswith("data/day=") for f in m["files"])
    assert len(m["files"]) == 5 < before  # one per partition value
    assert snapshot_read(spark, p).count() == 100
    # z-order within partitions keeps the layout too
    v = snapshot_compact(spark, p, zorder_by=["v"])
    m = snap._read_manifest(p, v)
    assert all(f.startswith("data/day=") for f in m["files"])
    assert snapshot_read(spark, p).count() == 100


def test_vacuum_gcs_emptied_partition_dirs(spark, tmp_path, snapshot_storage_backend):
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 50), p, partition_by=["day"])
    snapshot_write(
        _days(spark, 0, 10, n_days=2), p, mode="overwrite", partition_by=["day"]
    )
    stats = snapshot_vacuum(p, keep_last=1, retain_seconds=0)
    assert stats["removed_files"] > 0
    if snapshot_storage_backend == "posix":
        # POSIX housekeeping removes the emptied hive dirs outright
        assert sorted(os.listdir(f"{p}/data")) == ["day=0", "day=1"]
    else:
        # object stores have no directories to prune — the emulation
        # leaves empty local dirs, but no data OBJECT may survive
        # outside the live partitions
        live = {"day=0", "day=1"}
        for root, _dirs, names in os.walk(f"{p}/data"):
            for n in names:
                rel = os.path.relpath(os.path.join(root, n), f"{p}/data")
                assert rel.split(os.sep)[0] in live, rel
    assert snapshot_read(spark, p).count() == 10


def test_restore_across_repartitioning_overwrite(spark, tmp_path):
    """Time travel and RESTORE across a layout change: v1 flat, v2
    hive — both must read, and restore brings the old layout's files
    (and its recorded spec) back."""
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 30), p)  # flat
    snapshot_write(_days(spark, 0, 100), p, mode="overwrite", partition_by=["day"])
    assert snapshot_read(spark, p, version=1).count() == 30
    assert snapshot_read(spark, p, version=2).count() == 100
    snapshot_restore(p, 1)
    m = snap._read_manifest(p, 3)
    assert m["partition_by"] is None
    assert snapshot_read(spark, p).count() == 30
    # appends after the restore follow the restored (flat) spec
    snapshot_write(_days(spark, 30, 40), p, mode="append")
    assert all("/" not in f[len("data/") :] for f in snap._read_manifest(p, 4)["files"])


def test_partitioned_null_and_string_values(spark, tmp_path):
    """NULL partition values land in the hive default dir and read back
    as NULL; string values with URL-escaped characters round-trip."""
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "us east"), (2, None), (3, "a/b:c"), (4, "us east")],
        "id int, region string",
    )
    snapshot_write(df, p, partition_by=["region"])
    got = {(r.id, r.region) for r in snapshot_read(spark, p).collect()}
    assert got == {(1, "us east"), (2, None), (3, "a/b:c"), (4, "us east")}
    # pruning on the string partition keeps only that dir (+ no stats
    # files) and never loses the NULL row from full reads
    kept, skipped = snap._prune_files(
        snap._read_manifest(p, 1), [("region", "=", "us east")], None
    )
    assert skipped >= 1
    assert snapshot_read(spark, p, where=[("region", "=", "us east")]).count() == 2


def test_partitioned_stream_and_cdf_faces(spark, tmp_path):
    """The exactly-once batch feed and row-level CDF read partitioned
    commits like flat ones (basename-keyed DVs, subdir relpaths)."""
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 40), p, partition_by=["day"])
    snapshot_write(_days(spark, 40, 60), p, mode="append")
    delta = snapshot_changes(spark, p, since=1)
    assert sorted(r.id for r in delta.collect()) == list(range(40, 60))
    # merge-on-read delete: DV anti-join against partitioned files
    snapshot_delete(spark, p, [("day", "=", 0)], strategy="merge-on-read")
    m = snap._read_manifest(p, 3)
    assert m.get("deletes")
    got = snapshot_read(spark, p)
    assert got.filter(F.col("day") == 0).count() == 0
    assert got.count() == 48


def test_partitioned_dist_prune_agrees(spark, tmp_path, monkeypatch):
    """The executor-side prune path sees partition bounds through the
    checkpoint stats parquet exactly like the driver loop."""
    monkeypatch.setattr(snap, "_CKPT_EVERY", 1)
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 100), p, partition_by=["day"])
    head = snap._versions(p)[-1]
    m = snap._read_manifest(p, head)
    for where in ([("day", "=", 3)], [("day", ">=", 4)], [("day", "in", [0, 2])]):
        driver, _ = snap._prune_files(m, where, None)
        dist = snap._dist_prune_files(spark, p, head, m, where)
        assert dist == driver and len(driver) < len(m["files"])


def test_streaming_ingest_into_partitioned_table(spark, tmp_path):
    """stream_to_snapshot appends inherit the table's sticky partition
    spec: every micro-batch lands hive-laid-out and pruning stays exact
    over the streamed rows."""
    from dask_awkward_spark.sources.snapshot import (
        stream_from_snapshot,
        stream_to_snapshot,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_write(_days(spark, 0, 30), src)
    snapshot_write(_days(spark, 30, 60), src, mode="append")
    # create dst partitioned, then chain the tables via streaming
    snapshot_write(_days(spark, 0, 0), dst, partition_by=["day"])
    st = stream_from_snapshot(spark, src)
    stream_to_snapshot(st, dst, checkpoint_dir=str(tmp_path / "ckpt"))
    m = snap._read_manifest(dst, snap._versions(dst)[-1])
    assert m["partition_by"] == ["day"]
    assert all("/day=" in f for f in m["files"])
    kept, skipped = snap._prune_files(m, [("day", "=", 2)], None)
    assert skipped > 0 and all("day=2/" in f for f in kept)
    got = snapshot_read(spark, dst, where=[("day", "=", 2)])
    assert sorted(r.id for r in got.collect()) == [i for i in range(60) if i % 5 == 2]


def test_partition_aligned_delete_is_metadata_only(spark, tmp_path):
    """Deleting a whole partition value drops its files without reading
    or rewriting them (stats prove every row matches: min==max inside
    the predicate, zero nulls) — Delta's partition-aligned delete."""
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 100), p, partition_by=["day"])
    before = snap._read_manifest(p, 1)["files"]
    res = snapshot_delete(spark, p, [("day", "=", 3)], change_feed=False)
    assert res["rewritten_files"] == 0 and res["dropped_files"] >= 1
    assert res["removed_rows"] == sum(1 for i in range(100) if i % 5 == 3)
    m = snap._read_manifest(p, res["version"])
    # surviving files are EXACTLY the untouched ones, byte-identical
    assert set(m["files"]) == {f for f in before if "day=3/" not in f}
    got = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert got == [i for i in range(100) if i % 5 != 3]
    # time travel still sees the dropped partition
    assert snapshot_read(spark, p, version=1).count() == 100


def test_whole_file_drop_records_change_feed(spark, tmp_path):
    """change_feed=True on a whole-file drop still records every
    deleted row (a read-only scan of the dropped files)."""
    from dask_awkward_spark.sources.snapshot import snapshot_changes

    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 50), p, partition_by=["day"])
    res = snapshot_delete(spark, p, [("day", "=", 1)])
    assert res["dropped_files"] >= 1 and res["rewritten_files"] == 0
    feed = snapshot_changes(spark, p, since=1, row_level=True)
    dels = feed.filter(feed._change_type == "delete")
    assert sorted(r.id for r in dels.collect()) == [
        i for i in range(50) if i % 5 == 1
    ]


def test_whole_file_drop_refused_on_nulls_and_dvs(spark, tmp_path):
    """No fast path when the predicate column has NULLs (they must be
    KEPT: a NULL never matches) or when the file carries a deletion
    vector (stats overcount its visible rows)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "tbl")
    df = spark.range(20).select(
        "id", F.when(F.col("id") % 2 == 0, F.lit(7)).cast("int").alias("g")
    )
    snapshot_write(df.coalesce(1), p)
    # one file, g is 7-or-NULL: min==max==7 but nulls>0 -> row path
    res = snapshot_delete(spark, p, [("g", "=", 7)])
    assert res["dropped_files"] == 0 and res["rewritten_files"] == 1
    assert res["removed_rows"] == 10
    assert sorted(r.id for r in snapshot_read(spark, p).collect()) == [
        i for i in range(20) if i % 2 == 1
    ]
    # DV'd file: MOR-delete one row, then a full-match predicate must
    # go through the row path so the already-deleted row isn't recounted
    p2 = str(tmp_path / "tbl2")
    snapshot_write(
        spark.range(10).select("id", F.lit(1).alias("g")).coalesce(1), p2
    )
    snapshot_delete(spark, p2, [("id", "=", 4)], strategy="merge-on-read")
    res2 = snapshot_delete(spark, p2, [("g", "=", 1)])
    assert res2["dropped_files"] == 0
    assert res2["removed_rows"] == 9  # not 10: the DV'd row was already gone
    assert snapshot_read(spark, p2).count() == 0


def test_scoped_compact_rewrites_only_the_scope(spark, tmp_path):
    """snapshot_compact(where=...) — OPTIMIZE WHERE: only the scoped
    partition's files rewrite; everything else (including its deletion
    vectors) carries verbatim; content is unchanged."""
    from dask_awkward_spark.sources.snapshot import snapshot_delete

    p = str(tmp_path / "tbl")
    # 3 appends -> 3 small files per day partition
    snapshot_write(_days(spark, 0, 30), p, partition_by=["day"])
    snapshot_write(_days(spark, 30, 60), p, mode="append")
    snapshot_write(_days(spark, 60, 90), p, mode="append")
    # a MOR delete OUTSIDE the scope: its DV must survive the compact
    snapshot_delete(spark, p, [("id", "=", 63)], strategy="merge-on-read")
    m0 = snap._read_manifest(p, snap._versions(p)[-1])
    day2_before = [f for f in m0["files"] if "day=2/" in f]
    others_before = [f for f in m0["files"] if "day=2/" not in f]
    assert len(day2_before) > 1 and m0.get("deletes")
    v = snapshot_compact(spark, p, where=[("day", "=", 2)])
    m1 = snap._read_manifest(p, v)
    day2_after = [f for f in m1["files"] if "day=2/" in f]
    assert len(day2_after) < len(day2_before)  # many small files -> few
    assert set(f for f in m1["files"] if "day=2/" not in f) == set(others_before)
    assert m1.get("deletes") == m0.get("deletes")  # carried DV survives
    got = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert got == [i for i in range(90) if i != 63]
    # scoping to nothing is a no-op WITHOUT a commit
    assert snapshot_compact(spark, p, where=[("day", "=", 99)]) == v
    # a scoped compact COVERING the DV'd file applies AND purges the
    # now-dead vector file (no unbounded DV accumulation)
    day3 = (63 % 5)
    v2 = snapshot_compact(spark, p, where=[("day", "=", day3)])
    m2 = snap._read_manifest(p, v2)
    assert not m2.get("deletes")
    got2 = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert got2 == [i for i in range(90) if i != 63]  # row stays gone


def test_scoped_compact_is_cdf_transparent(spark, tmp_path):
    """A scoped compact is row-preserving, so the ROW-LEVEL change feed
    and CDF stream cross it contributing nothing (Delta's OPTIMIZE is
    CDF-invisible); the file-delta faces still refuse it."""
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 30), p, partition_by=["day"])
    snapshot_write(_days(spark, 30, 60), p, mode="append")
    snapshot_compact(spark, p, where=[("day", "=", 2)])          # v3
    snapshot_delete(spark, p, [("id", "=", 5)])                  # v4
    feed = snapshot_changes(spark, p, since=2, row_level=True)
    rows = feed.collect()
    assert {r._commit_version for r in rows} == {4}  # v3 contributed nothing
    assert sorted(r.id for r in rows) == [5]
    # file-delta faces refuse the compact in-span, as before
    with pytest.raises(ValueError, match="not appends"):
        snapshot_changes(spark, p, since=2, until=3)
    # the CDF STREAM also crosses it (shared walk)
    from dask_awkward_spark.sources.snapshot import stream_from_snapshot

    out = str(tmp_path / "out")
    q = (
        stream_from_snapshot(spark, p, row_level=True)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.filter(F.col("_commit_version") == 3).count() == 0
    assert got.filter(F.col("_change_type") == "delete").count() == 1


def test_scoped_compact_zorder_and_watermark_carry(spark, tmp_path):
    """Z-ordered scoped compact keeps the stream watermark and the
    partition spec; only the scope rewrites."""
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 40), p, partition_by=["day"], stream_batch_id=7)
    snapshot_write(_days(spark, 40, 80), p, mode="append", stream_batch_id=8)
    v = snapshot_compact(spark, p, where=[("day", "=", 1)], zorder_by=["v"])
    m = snap._read_manifest(p, v)
    assert m["stream_batch_id"] == 8 and m["partition_by"] == ["day"]
    got = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert got == list(range(80))


def test_snapshot_count_metadata_only(spark, tmp_path, monkeypatch):
    """snapshot_count equals read().count() everywhere, and for
    aligned/no-predicate cases it never touches a data file."""
    from dask_awkward_spark.sources.snapshot import snapshot_count, snapshot_delete

    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 100), p, partition_by=["day"])
    snapshot_delete(spark, p, [("id", "=", 7)], strategy="merge-on-read")

    def boom(*a, **k):
        raise AssertionError("metadata-only count must not scan files")

    # no predicate and partition-aligned predicate: zero file reads,
    # exact even across the deletion vector
    monkeypatch.setattr(snap, "_visible_df", boom)
    assert snapshot_count(spark, p) == 99
    assert snapshot_count(spark, p, where=[("day", "=", 2)]) == 19  # 7 deleted
    assert snapshot_count(spark, p, where=[("day", "=", 3)]) == 20
    assert snapshot_count(spark, p, where=[("day", ">", 4)]) == 0
    monkeypatch.undo()
    # boundary predicate: falls back to scanning only straddling files
    n = snapshot_count(spark, p, where=[("id", "<", 37), ("day", "=", 1)])
    want = snapshot_read(spark, p, where=[("id", "<", 37), ("day", "=", 1)]).count()
    assert n == want == sum(1 for i in range(37) if i % 5 == 1 and i != 7)
    # time travel: v1 still counts the later-deleted row
    assert snapshot_count(spark, p, version=1) == 100


def test_round6_capstone_composition(spark, tmp_path):
    """End-to-end composition of the round-6 surface: a partitioned
    table fed by streaming ingest, maintained by scoped compaction and
    a partition-aligned metadata-only delete, consumed by a watermarked
    CDF stream — with a narrow late producer widening through — must
    agree with the plain batch computation at every step."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_count,
        stream_from_snapshot,
        stream_to_snapshot,
    )

    src, tbl = str(tmp_path / "src"), str(tmp_path / "tbl")
    # producer commits land in an unpartitioned staging table...
    snapshot_write(_days(spark, 0, 40), src)
    snapshot_write(_days(spark, 40, 80), src, mode="append")
    # ...and stream exactly-once into the partitioned serving table
    snapshot_write(_days(spark, 0, 0), tbl, partition_by=["day"])
    stream_to_snapshot(
        stream_from_snapshot(spark, src), tbl, checkpoint_dir=str(tmp_path / "ck1")
    )
    # a late producer appends at a NARROWER width (v int, not bigint)
    late = (
        spark.range(80, 90)
        .withColumn("day", (F.col("id") % 5).cast("int"))
        .withColumn("v", (F.col("id") * 2).cast("int"))
    )
    snapshot_write(late, tbl, mode="append", merge_schema=True)
    # nightly maintenance: OPTIMIZE yesterday's partition, retire day 4
    v_opt = snapshot_compact(spark, tbl, where=[("day", "=", 3)], zorder_by=["v"])
    res = snapshot_delete(spark, tbl, [("day", "=", 4)])
    assert res["rewritten_files"] == 0 and res["dropped_files"] > 0
    # metadata-exact accounting after the whole pipeline
    keep = [i for i in range(90) if i % 5 != 4]
    assert snapshot_count(spark, tbl) == len(keep)
    assert snapshot_count(spark, tbl, where=[("day", "=", 3)]) == sum(
        1 for i in range(90) if i % 5 == 3
    )
    got = sorted(r.id for r in snapshot_read(spark, tbl).collect())
    assert got == keep
    # the row-level CDF stream crosses the compact transparently and a
    # windowed consumer sees exactly the delete's rows at its version
    feed = snapshot_changes(spark, tbl, since=v_opt - 1, row_level=True)
    by_ver = {
        (r._commit_version, r._change_type) for r in feed.collect()
    }
    assert all(ct == "delete" for _, ct in by_ver)
    assert snapshot_changes(
        spark, tbl, since=v_opt - 1, row_level=True
    ).count() == sum(1 for i in range(90) if i % 5 == 4)


def test_bloom_by_sticky_and_rewritten(spark, tmp_path):
    """bloom_by writes parquet bloom filters into every data file, the
    spec is sticky through appends and DML rewrites (files measurably
    larger than a bloom-less twin), and bad columns are refused."""
    import os as _os

    def table_bytes(p):
        m = snap._read_manifest(p, snap._versions(p)[-1])
        return sum(_os.path.getsize(_os.path.join(p, f)) for f in m["files"])

    df = spark.range(100_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    p0, p1 = str(tmp_path / "plain"), str(tmp_path / "bloom")
    snapshot_write(df.coalesce(1), p0)
    snapshot_write(df.coalesce(1), p1, bloom_by={"k": 100_000})
    assert table_bytes(p1) > table_bytes(p0) * 1.1  # the bloom bytes landed
    m = snap._read_manifest(p1, 1)
    assert m["bloom_ndv"] == {"k": 100_000}
    # sticky through append and a COW delete rewrite
    snapshot_write(
        spark.range(100_000, 200_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).coalesce(1),
        p1,
        mode="append",
    )
    before = table_bytes(p1)
    snapshot_delete(spark, p1, [("k", "=", 5)])
    m2 = snap._read_manifest(p1, snap._versions(p1)[-1])
    assert m2["bloom_ndv"] == {"k": 100_000}
    # the rewritten file still carries a bloom: the table did not
    # shrink by anywhere near a bloom's worth for a one-row delete
    assert table_bytes(p1) > before * 0.9
    got = snapshot_read(spark, p1, where=[("k", "=", 77)])
    assert [r.v for r in got.collect()] == [231]
    with pytest.raises(ValueError, match="bloom_by columns"):
        snapshot_write(df, str(tmp_path / "bad"), bloom_by={"nope": 10})


def test_scoped_compact_redoes_after_concurrent_append(spark, tmp_path, monkeypatch):
    """An append landing mid-scoped-compact is never lost: the COW-style
    commit loses the version race and the compact restarts from the new
    head, re-pruning its scope against it."""
    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 50), p, partition_by=["day"])

    real_stage = snap._stage_files
    appended = {"done": False}

    def stage_then_append(*a, **k):
        out = real_stage(*a, **k)
        if not appended["done"]:
            appended["done"] = True
            snapshot_write(_days(spark, 50, 60), p, mode="append")
        return out

    monkeypatch.setattr(snap, "_stage_files", stage_then_append)
    v = snapshot_compact(spark, p, where=[("day", "=", 2)])
    monkeypatch.undo()
    # v1 write, v2 concurrent append, v3 the compact (restarted once)
    assert v == 3
    m = snap._read_manifest(p, 3)
    assert m["op"] == "compact"
    got = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert got == list(range(60))  # appended rows survive the rewrite


def test_snapshot_history(spark, tmp_path):
    """DESCRIBE HISTORY face: one row per version, signed deltas, exact
    visible-row totals across MOR deletes — zero data files read."""
    from dask_awkward_spark.sources.snapshot import snapshot_history

    p = str(tmp_path / "tbl")
    snapshot_write(_days(spark, 0, 50), p, partition_by=["day"])
    snapshot_write(_days(spark, 50, 80), p, mode="append")
    snapshot_delete(spark, p, [("id", "=", 3)], strategy="merge-on-read")
    snapshot_compact(spark, p, where=[("day", "=", 1)])
    h = {r.version: r for r in snapshot_history(spark, p).collect()}
    assert [h[v].op for v in sorted(h)] == ["overwrite", "append", "delete", "compact"]
    assert h[1].total_rows == 50 and h[2].rows_delta == 30
    assert h[3].total_rows == 79 and h[3].rows_delta == -1  # MOR delete
    assert h[3].delete_vector_files == 1 and h[3].files_delta == 0  # DV only
    assert h[4].rows_delta == 0  # compact preserves rows
    assert h[4].total_files < h[3].total_files
    assert h[4].partition_by == ["day"]


def test_snapshot_maintain_policy(spark, tmp_path):
    """snapshot_maintain: metadata-only detection, scoped compaction of
    ONLY the fat partitions, tight second pass is a no-op; the
    unpartitioned fallback uses the whole-table file count."""
    from dask_awkward_spark.sources.snapshot import snapshot_maintain

    p = str(tmp_path / "tbl")
    # 6 small ingests into 2 partitions -> every partition goes fat
    for i in range(6):
        snapshot_write(
            _days(spark, i * 10, (i + 1) * 10, n_days=2),
            p,
            mode="append",
            partition_by=["day"] if i == 0 else None,
        )
    before = snapshot_read(spark, p).count()
    out = snapshot_maintain(spark, p, max_files_per_partition=3)
    assert out["compacted_partitions"] == [("day=0",), ("day=1",)]
    m = snap._read_manifest(p, out["version"])
    per = {}
    for f in m["files"]:
        per.setdefault(f.split("/")[1], []).append(f)
    assert all(len(v) <= 3 for v in per.values())
    assert snapshot_read(spark, p).count() == before
    out2 = snapshot_maintain(spark, p, max_files_per_partition=3)
    assert out2["compacted_partitions"] == [] and out2["version"] == out["version"]
    # unpartitioned fallback: full compact over the file-count budget
    q = str(tmp_path / "flat")
    for i in range(5):
        snapshot_write(spark.range(i * 10, (i + 1) * 10).repartition(2), q, mode="append")
    outf = snapshot_maintain(spark, q, max_files_per_partition=4)
    assert outf["compacted_partitions"] == [()]
    assert snapshot_read(spark, q).count() == 50


def test_snapshot_maintain_multicol_and_renamed(spark, tmp_path):
    """Multi-column specs compact per fat tuple; a RENAMED partition
    column still groups correctly (dirs carry the physical name)."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_maintain,
        snapshot_rename_column,
    )
    from pyspark.sql import functions as F

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 2, "x" if i % 4 < 2 else "y", float(i)) for i in range(40)],
        "id bigint, a int, b string, v double",
    )
    snapshot_write(df.coalesce(1), p, partition_by=["a", "b"])
    for _ in range(4):
        snapshot_write(
            df.filter((F.col("a") == 0) & (F.col("b") == "x"))
            .limit(5)
            .coalesce(1),
            p,
            mode="append",
        )
    snapshot_rename_column(p, "a", "bucket")
    out = snapshot_maintain(spark, p, max_files_per_partition=4)
    assert out["compacted_partitions"] == [("a=0", "b=x")]  # physical dirs
    assert snapshot_read(spark, p).count() == 60
    assert (
        snapshot_read(spark, p, where=[("bucket", "=", 0), ("b", "=", "x")]).count()
        == 30
    )


def test_snapshot_maintain_null_partition_is_reported_not_faked(spark, tmp_path):
    """A fat NULL partition can't be named by the scope vocabulary: it
    must come back in skipped_partitions, NEVER in compacted_partitions
    (a false report would hide a partition that stays fat forever)."""
    from dask_awkward_spark.sources.snapshot import snapshot_maintain

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, None if i % 2 else "x", float(i)) for i in range(20)],
        "id bigint, part string, v double",
    )
    snapshot_write(df.coalesce(1), p, partition_by=["part"])
    for _ in range(4):  # fatten ONLY the NULL partition
        snapshot_write(
            df.filter(F.col("part").isNull()).limit(3).coalesce(1),
            p,
            mode="append",
        )
    out = snapshot_maintain(spark, p, max_files_per_partition=3)
    assert out["compacted_partitions"] == []
    assert out["skipped_partitions"] == [("part=__HIVE_DEFAULT_PARTITION__",)]
    assert snapshot_read(spark, p).count() == 32


def test_crashed_ckpt_tmp_is_vacuumed(spark, tmp_path):
    """A hard crash mid-checkpoint-write leaves .tmp-ckpt-* in the
    manifest dir; vacuum's manifest-dir sweep GCs it once stale."""
    import time as _time

    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(10), p)
    md = snap._manifest_dir(p)
    orphan = os.path.join(md, ".tmp-ckpt-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"torn")
    old = _time.time() - 10
    os.utime(orphan, (old, old))
    snapshot_vacuum(p, keep_last=1, retain_seconds=1)
    assert not os.path.exists(orphan)
    assert snapshot_read(spark, p).count() == 10
