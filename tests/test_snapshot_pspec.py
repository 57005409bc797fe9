"""Partition-spec EVOLUTION (round 9 continuation — Iceberg's
ALTER ... PARTITION FIELD analog): metadata-only spec changes, mixed
directory layouts that read and prune exactly, migrate-by-rewrite."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    SnapshotConflictError,
    snapshot_changes,
    snapshot_compact,
    snapshot_read,
    snapshot_scan_report,
    snapshot_set_partition_spec,
    snapshot_write,
    _read_manifest,
    _versions,
)
from dask_awkward_spark.sources.sqlface import snapshot_sql


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
        (F.col("id") % 2).cast("int").alias("h"),
    )


def test_evolve_spec_metadata_only_mixed_layout(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 60).repartition(2), p, partition_by=["g"])
    files_before = list(_read_manifest(p, 1)["files"])
    v = snapshot_set_partition_spec(p, ["h"])
    assert v == 2
    m = _read_manifest(p, 2)
    assert m["partition_by"] == ["h"] and m["files"] == files_before
    # appends inherit the NEW spec; old files keep their old dirs
    snapshot_write(_rows(spark, 60, 120).repartition(2), p, mode="append")
    m3 = _read_manifest(p, 3)
    new_files = [f for f in m3["files"] if f not in set(files_before)]
    assert new_files and all("h=" in f for f in new_files)
    assert all("g=" in f for f in files_before)
    # the mixed-layout table reads exactly
    assert snapshot_read(spark, p).count() == 120
    # ... and PRUNES on both columns (skipping is stats, not dirs)
    assert snapshot_scan_report(p, [("g", "=", 1)])["skipped"] >= 1
    assert snapshot_scan_report(p, [("h", "=", 0)])["skipped"] >= 1
    assert snapshot_read(spark, p, where=[("h", "=", 1)]).count() == 60
    # no-op spec set commits nothing
    assert snapshot_set_partition_spec(p, ["h"]) == 3


def test_migrate_by_rewrite_and_unpartition(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 60).repartition(2), p, partition_by=["g"])
    snapshot_set_partition_spec(p, ["h"])
    snapshot_compact(spark, p)  # rewrites under the CURRENT spec
    m = _read_manifest(p, _versions(p)[-1])
    assert all("h=" in f for f in m["files"])
    assert snapshot_read(spark, p).count() == 60
    # [] un-partitions future writes
    snapshot_set_partition_spec(p, [])
    snapshot_write(_rows(spark, 60, 70), p, mode="append")
    m2 = _read_manifest(p, _versions(p)[-1])
    flat = [f for f in m2["files"] if "h=" not in f and "g=" not in f]
    assert flat, m2["files"]


def test_evolve_spec_refusals_and_feeds(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 30), p)
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_set_partition_spec(p, ["nope"])
    with pytest.raises(SnapshotConflictError):
        snapshot_set_partition_spec(p, ["g"], expect_head=99)
    snapshot_set_partition_spec(p, ["g"])
    snapshot_write(_rows(spark, 30, 40), p, mode="append")
    # both feed shapes cross the metadata-only spec commit
    assert snapshot_changes(spark, p, since=1).count() == 10
    assert (
        snapshot_changes(spark, p, since=1, row_level=True)
        .filter("_change_type = 'insert'")
        .count()
        == 10
    )


def test_evolve_spec_sql_form(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_rows(spark, 0, 30), p)
    v = snapshot_sql(spark, "ALTER TABLE t SET PARTITION SPEC (g, h)", {"t": p})
    assert _read_manifest(p, v)["partition_by"] == ["g", "h"]
    v = snapshot_sql(spark, "ALTER TABLE t SET PARTITION SPEC ()", {"t": p})
    assert _read_manifest(p, v)["partition_by"] is None
    stmt = snapshot_sql(spark, "SHOW CREATE TABLE t", {"t": p}).first().createtab_stmt
    assert "PARTITIONED BY" not in stmt  # reflects the CURRENT spec
