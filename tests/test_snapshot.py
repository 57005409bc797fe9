"""Snapshot tables (sources/snapshot.py): atomic commits, time travel,
append isolation, compaction without disturbing readers, vacuum GC."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    _commit_manifest,
    snapshot_compact,
    snapshot_read,
    snapshot_versions,
    snapshot_vacuum,
    snapshot_write,
)


def test_write_read_overwrite_append_time_travel(spark, tmp_path):
    p = str(tmp_path / "tbl")
    v1 = snapshot_write(spark.range(10), p)
    v2 = snapshot_write(spark.range(10, 15), p, mode="append")
    v3 = snapshot_write(spark.range(100, 103), p, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert sorted(r.id for r in snapshot_read(spark, p).collect()) == [100, 101, 102]
    assert sorted(r.id for r in snapshot_read(spark, p, version=2).collect()) == list(range(15))
    assert sorted(r.id for r in snapshot_read(spark, p, version=1).collect()) == list(range(10))
    log = snapshot_versions(p)
    assert [m["op"] for m in log] == ["overwrite", "append", "overwrite"]
    assert log[1]["parent"] == 1


def test_commit_race_retries_to_next_version(spark, tmp_path):
    """A competing writer claiming the next version forces a retry —
    nobody's commit is lost or overwritten."""
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(5), p)
    # simulate a concurrent winner for v2
    assert _commit_manifest(p, 2, {"version": 2, "parent": 1, "op": "overwrite",
                                   "files": [], "schema_ddl": "struct<id:bigint>",
                                   "committed_at": 0})
    v = snapshot_write(spark.range(7), p, mode="overwrite")
    assert v == 3  # retried past the claimed version
    assert snapshot_read(spark, p).count() == 7
    assert snapshot_read(spark, p, version=2).count() == 0  # the rival's empty commit


def test_append_does_not_rewrite_old_files(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(10), p)
    before = set(glob.glob(f"{p}/data/*.parquet"))
    snapshot_write(spark.range(10, 20), p, mode="append")
    after = set(glob.glob(f"{p}/data/*.parquet"))
    assert before < after  # old files untouched, new ones added
    assert snapshot_read(spark, p).count() == 20


def test_compact_new_version_old_reader_unaffected(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(1000).repartition(16), p)
    pinned = snapshot_read(spark, p, version=1)  # reader pinned to v1
    v = snapshot_compact(spark, p, target_file_bytes=1 << 30)
    assert v == 2
    assert snapshot_read(spark, p).count() == 1000
    assert pinned.count() == 1000  # v1's files are immutable and still there
    m = snapshot_versions(p)
    assert len(m[-1]["files"]) < len(m[0]["files"])


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(100).repartition(4), p)
    snapshot_write(spark.range(50), p, mode="overwrite")
    n_before = len(glob.glob(f"{p}/data/*.parquet"))
    stats = snapshot_vacuum(p, keep_last=1)
    assert stats["removed_manifests"] == 1
    assert stats["removed_files"] > 0
    assert len(glob.glob(f"{p}/data/*.parquet")) == n_before - stats["removed_files"]
    assert snapshot_read(spark, p).count() == 50  # head intact
    with pytest.raises(ValueError):
        snapshot_read(spark, p, version=1)  # history gone by request


def test_crashed_staging_leaves_no_visible_data(spark, tmp_path, monkeypatch):
    """A crash before commit leaves only unreferenced files — readers of
    the table see nothing new, and vacuum reclaims the garbage."""
    import dask_awkward_spark.sources.snapshot as snap

    p = str(tmp_path / "tbl")
    snapshot_write(spark.range(5), p)

    def boom(*a, **k):
        raise RuntimeError("crash between stage and commit")

    monkeypatch.setattr(snap, "_commit_manifest", boom)
    with pytest.raises(RuntimeError):
        snapshot_write(spark.range(99), p, mode="overwrite")
    monkeypatch.undo()
    assert snapshot_read(spark, p).count() == 5  # still v1
    stats = snapshot_vacuum(p, keep_last=1)
    assert stats["removed_files"] > 0  # the orphaned staged files
    assert snapshot_read(spark, p).count() == 5


def test_schema_recorded_and_empty_version_readable(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.range(3).withColumn("v", F.col("id") * 2.0)
    snapshot_write(df, p)
    m = snapshot_versions(p)[-1]
    assert m["schema_ddl"] == df.schema.simpleString()
