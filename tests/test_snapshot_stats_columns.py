"""stats_columns table property (VERDICT r9 item 4, Delta's
dataSkippingStatsColumns analog): an explicit prunable-leaf spec that
overrides the schema-order width-cap prefix, persisted in the manifest
as PHYSICAL paths (rename-proof), honored by the footer-stats
collector, the checkpoint sidecar, and every DML rewrite."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

import dask_awkward_spark.sources.snapshot as snap
from dask_awkward_spark.sources.snapshot import (
    snapshot_compact,
    snapshot_delete,
    snapshot_read,
    snapshot_rename_column,
    snapshot_scan_report,
    snapshot_set_stats_columns,
    snapshot_write,
)


def _wide(spark, n_cols=12, rows=100):
    """id plus n_cols filler columns, then `hot` LAST — past any small
    cap, exactly the wide-document-schema shape that cannot reorder."""
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        *[(F.col("id") * 0 + i).alias(f"f{i:03d}") for i in range(n_cols)],
        F.col("id").alias("hot"),
    )
    return df.repartitionByRange(4, "hot")


def test_late_leaf_prunes_without_reorder(spark, tmp_path):
    """The VERDICT r9 item-4 done criterion, literally: a 200-leaf table
    whose hot filter column sits past the DEFAULT 64-column cap records
    no stats for it; the spec makes it prune — no schema reorder."""
    p0, p1 = str(tmp_path / "dflt"), str(tmp_path / "spec")
    snapshot_write(_wide(spark, n_cols=200), p0)
    snapshot_write(_wide(spark, n_cols=200), p1, stats_columns=["hot"])
    where = [("hot", "<", 25)]
    assert snapshot_scan_report(p0, where)["skipped"] == 0
    rep = snapshot_scan_report(p1, where)
    assert rep["skipped"] >= 2, rep
    # the spec replaces the prefix: the default-recorded early columns
    # no longer record (exactly-these semantics)
    m = snap._read_manifest(p1, 1)
    assert m["stats_columns"] == ["hot"]
    some = next(iter(m["stats"].values()))
    assert set(some["minmax"]) == {"hot"}
    # rows read back identically either way
    assert snapshot_read(spark, p1).count() == 100


def test_setter_is_metadata_only_and_compact_backfills(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "4")
    p = str(tmp_path / "t")
    snapshot_write(_wide(spark), p)
    where = [("hot", "<", 25)]
    assert snapshot_scan_report(p, where)["skipped"] == 0
    v = snapshot_set_stats_columns(p, ["hot"])
    m1, m2 = snap._read_manifest(p, v - 1), snap._read_manifest(p, v)
    assert m1["files"] == m2["files"], "setter must be metadata-only"
    assert m2["op"] == "set_stats_columns"
    # old files keep their old stats: still no prune (sound, not stale)
    assert snapshot_scan_report(p, where)["skipped"] == 0
    # compact rewrites under the current spec -> backfilled (zorder_by
    # re-clusters on hot, so the fresh stats actually separate ranges)
    v2 = snapshot_compact(spark, p, target_file_bytes=1 << 12, zorder_by=["hot"])
    mc = snap._read_manifest(p, v2)
    assert all("hot" in st["minmax"] for st in mc["stats"].values())
    assert snapshot_scan_report(p, where)["skipped"] >= 1
    # setter with the same spec is a no-op (no new version)
    assert snapshot_set_stats_columns(p, ["hot"]) == snap._versions(p)[-1]
    # None drops back to the prefix default
    v3 = snapshot_set_stats_columns(p, None)
    assert snap._read_manifest(p, v3)["stats_columns"] is None


def test_spec_survives_rename_and_nested_paths(spark, tmp_path, monkeypatch):
    """Nested spec leaf + a rename of its head: the stored PHYSICAL path
    keeps matching the footer keys, and predicates under the NEW logical
    name still prune."""
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "2")
    p = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("a"),
        F.col("id").alias("b"),
        F.col("id").alias("c"),
        F.struct(F.col("id").alias("ts")).alias("meta"),
    ).repartitionByRange(4, "id")
    snapshot_write(df, p, stats_columns=["meta.ts"])
    assert snapshot_scan_report(p, [("meta.ts", "<", 25)])["skipped"] >= 2
    snapshot_rename_column(p, "meta", "info")
    assert snap._read_manifest(
        p, snap._versions(p)[-1]
    )["stats_columns"] == ["meta.ts"], "spec stays physical across renames"
    # new writes under the new logical name still record the leaf
    snapshot_write(
        df.select("a", "b", "c", F.col("meta").alias("info")), p, mode="append"
    )
    rep = snapshot_scan_report(p, [("info.ts", "<", 25)])
    assert rep["skipped"] >= 4, rep


def test_partition_columns_always_included(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "2")
    p = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("pk"),
        F.col("id").alias("hot"),
    )
    snapshot_write(df, p, partition_by=["pk"], stats_columns=["hot"])
    m = snap._read_manifest(p, 1)
    assert m["stats_columns"] == ["pk", "hot"]
    assert snapshot_scan_report(p, [("pk", "=", 1)])["skipped"] >= 3


def test_spec_sticky_through_dml(spark, tmp_path, monkeypatch):
    """Every DML rewrite re-collects stats under the spec — including
    the whole-file DELETE fast path on a spec-only column."""
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "4")
    p = str(tmp_path / "t")
    snapshot_write(_wide(spark), p, stats_columns=["hot", "k"])
    snapshot_write(_wide(spark).withColumn("hot", F.col("hot") + 100), p, mode="append")
    m = snap._read_manifest(p, 2)
    assert m["stats_columns"] == ["hot", "k"]
    for st in m["stats"].values():
        assert set(st["minmax"]) <= {"hot", "k"}
    # range-aligned delete on the spec column: whole files drop unread
    stats = snapshot_delete(spark, p, [("hot", ">=", 100)])
    assert stats["rewritten_files"] == 0 and stats["removed_rows"] == 100
    assert snapshot_read(spark, p).count() == 100


def test_spec_refusals(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.col("id").cast("boolean").alias("flag"),
        F.array(F.col("id")).alias("xs"),
        F.struct(F.col("id").alias("ts")).alias("meta"),
    )
    with pytest.raises(ValueError, match="stats-recordable"):
        snapshot_write(df, p, stats_columns=["nope"])
    with pytest.raises(ValueError, match="stats-recordable"):
        snapshot_write(df, p, stats_columns=["flag"])  # bool: no stats
    with pytest.raises(ValueError, match="stats-recordable"):
        snapshot_write(df, p, stats_columns=["xs"])  # list: repeated leaf
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_write(df, p, stats_columns=["k", "k"])
    snapshot_write(df, p, stats_columns=["meta.ts"])
    with pytest.raises(ValueError, match="may not change"):
        snapshot_write(df, p, mode="append", stats_columns=["k"])
    with pytest.raises(ValueError, match="may not change"):
        snapshot_write(df, p, mode="append", stats_columns=[])
    # inheriting append is fine
    snapshot_write(df, p, mode="append")
    assert snap._read_manifest(p, 2)["stats_columns"] == ["meta.ts"]


def test_set_stats_columns_is_cdf_and_stream_transparent(spark, tmp_path):
    """Review r9 finding: the setter's commit is row-preserving — the
    change feed (both shapes) must cross it, not reject it."""
    from dask_awkward_spark.sources.snapshot import snapshot_changes

    p = str(tmp_path / "t")
    df = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("hot"))
    snapshot_write(df, p)  # v1
    snapshot_set_stats_columns(p, ["hot"])  # v2, metadata-only
    snapshot_write(df.withColumn("k", F.col("k") + 10), p, mode="append")  # v3
    got = sorted(r.k for r in snapshot_changes(spark, p, since=1).collect())
    assert got == list(range(10, 15))
    row = sorted(
        r.k for r in snapshot_changes(spark, p, 1, row_level=True).collect()
    )
    assert row == list(range(10, 15))


def test_inherited_spec_never_goes_all_dead(spark, tmp_path, monkeypatch):
    """Review r9 findings: an inherited spec crossing an overwrite is
    translated physical→logical through the PRE-overwrite mapping and
    re-resolved (rename-proof across the mapping reset, second review
    cycle); entries whose column is genuinely gone drop; an all-dead
    spec falls back to the prefix default — never the record-nothing
    state."""
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "4")
    p = str(tmp_path / "t")
    snapshot_write(_wide(spark), p, stats_columns=["hot", "k"])
    snapshot_rename_column(p, "hot", "warm")
    # overwrite after the rename: mapping resets — the spec entry for
    # physical 'hot' follows its logical name to the new physical 'warm'
    df2 = spark.range(50).select(
        F.col("id").alias("k"), F.col("id").alias("warm")
    ).repartitionByRange(4, "warm")
    snapshot_write(df2, p)
    m = snap._read_manifest(p, snap._versions(p)[-1])
    assert m["stats_columns"] == ["warm", "k"], m["stats_columns"]
    some = next(iter(m["stats"].values()))
    assert "warm" in some["minmax"], "renamed spec column must keep recording"
    # fully-dead spec: overwrite with a schema sharing NO spec leaf
    p2 = str(tmp_path / "t2")
    snapshot_write(_wide(spark), p2, stats_columns=["hot"])
    df3 = spark.range(50).select(F.col("id").alias("zzz"))
    snapshot_write(df3, p2)
    m2 = snap._read_manifest(p2, snap._versions(p2)[-1])
    assert m2["stats_columns"] is None  # back to the prefix default
    assert next(iter(m2["stats"].values()))["minmax"]


def test_append_retry_follows_concurrent_spec_change(spark, tmp_path, monkeypatch):
    """Review r9 finding: an append losing its CAS to a concurrent
    snapshot_set_stats_columns must adopt the NEW spec in its manifest,
    not silently revert it."""
    p = str(tmp_path / "t")
    df = spark.range(20).select(F.col("id").alias("k"), F.col("id").alias("hot"))
    snapshot_write(df, p)
    real = snap._commit_manifest
    state = {"n": 0}

    def hook(path_, version, manifest, parent_m=None):
        state["n"] += 1
        if state["n"] == 1:
            snapshot_set_stats_columns(p, ["hot"])  # steal the version
        return real(path_, version, manifest, parent_m)

    monkeypatch.setattr(snap, "_commit_manifest", hook)
    snapshot_write(df, p, mode="append")
    monkeypatch.undo()
    m = snap._read_manifest(p, snap._versions(p)[-1])
    assert m["op"] == "append"
    assert m["stats_columns"] == ["hot"], "retry must not revert the spec"


def test_narrow_merge_schema_append_keeps_spec(spark, tmp_path, monkeypatch):
    """Second review cycle: a legal merge_schema append that OMITS a
    spec column (null-filled on read) must inherit the spec verbatim —
    filtering it against the narrow frame would silently erase it."""
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "4")
    p = str(tmp_path / "t")
    snapshot_write(_wide(spark), p, stats_columns=["hot"])
    narrow = spark.range(10).select(F.col("id").alias("k"))
    snapshot_write(narrow, p, mode="append", merge_schema=True)
    m = snap._read_manifest(p, snap._versions(p)[-1])
    assert m["stats_columns"] == ["hot"], "narrow append must not erase the spec"
    # a later full-width append still records the spec column
    snapshot_write(
        _wide(spark).withColumn("hot", F.col("hot") + 1000), p, mode="append"
    )
    m2 = snap._read_manifest(p, snap._versions(p)[-1])
    assert any(
        "hot" in st.get("minmax", {}) for st in m2["stats"].values()
    )
