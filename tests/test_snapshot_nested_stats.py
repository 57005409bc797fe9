"""Nested-column file skipping (sources/snapshot.py _file_stats dotted
paths): struct-leaf predicates prune files driver- AND executor-side,
the whole-file all-match proof works through struct leaves, column
mapping keeps nested stats valid across a parent rename, and list/map
elements are never recorded (their min/max answers a different
question). Mirrors the reference's nested-buffer necessary-columns
pruning (lib/optimize.py:86-223) at the storage layer."""

from __future__ import annotations

import math

import pytest

# every test runs under BOTH data-plane backends (posix / object-copy)
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    _dist_prune_files,
    _file_all_match,
    _file_may_match,
    _prune_files,
    _read_manifest,
    _versions,
    _where_phys,
    snapshot_delete,
    snapshot_read,
    snapshot_rename_column,
    snapshot_scan_report,
    snapshot_write,
)


def _nested_df(spark, n=1000, files=8):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.struct(
                (F.col("id") * 2).alias("ts"),
                (F.col("id") % 7).alias("k"),
                F.struct(
                    F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias(
                        "tag"
                    ),
                    (F.col("id").cast("double") / 2).alias("score"),
                ).alias("deep"),
            ).alias("meta"),
            F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        )
        .repartitionByRange(files, "id")
    )


def test_struct_leaves_recorded_list_elements_not(spark, tmp_path):
    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark), p)
    m = _read_manifest(p, _versions(p)[-1])
    s = m["stats"][m["files"][0]]
    assert "meta.ts" in s["minmax"] and "meta.deep.tag" in s["minmax"]
    assert "meta.ts" in s["nulls"]
    # list element leaf (arr.list.element) must NOT appear under any name
    assert not any(k.startswith("arr") for k in s["minmax"])
    assert not any(k.startswith("arr") for k in s["nulls"])


def test_nested_prune_matches_full_scan(spark, tmp_path):
    """Struct-leaf predicates skip files AND return exactly what an
    unpruned filter would — at every depth."""
    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark), p)
    for where, col in [
        ([("meta.ts", ">=", 1500)], F.col("meta.ts") >= 1500),
        ([("meta.deep.score", "<", 60.0)], F.col("meta.deep.score") < 60.0),
    ]:
        rep = snapshot_scan_report(p, where)
        assert rep["total"] == 8 and rep["skipped"] >= 5, (where, rep)
        pruned = sorted(r.id for r in snapshot_read(spark, p, where=where).collect())
        full = sorted(
            r.id for r in snapshot_read(spark, p).filter(col).collect()
        )
        assert pruned == full


def test_null_parent_struct_is_sql_null_for_pruning(spark, tmp_path):
    """A NULL parent struct makes every leaf SQL-NULL: comparison
    predicates never match those rows, so min/max pruning (which
    excludes nulls) stays exact — and the all-match proof must refuse
    (leaf null_count > 0 covers the null parent too)."""
    p = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"),
        F.when(
            F.col("id") % 10 != 0, F.struct((F.col("id") * 2).alias("ts"))
        ).alias("meta"),  # every 10th row: meta IS NULL
    )
    snapshot_write(df.coalesce(1), p)
    m = _read_manifest(p, _versions(p)[-1])
    s = m["stats"][m["files"][0]]
    assert s["nulls"]["meta.ts"] == 10
    assert _file_all_match(s, [("meta.ts", ">=", 0)]) is False
    out = snapshot_read(spark, p, where=[("meta.ts", "<", 20)]).collect()
    assert sorted(r.id for r in out) == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_nested_all_match_drops_whole_files(spark, tmp_path):
    """A leaf predicate aligned with file ranges deletes files
    metadata-only (copy-on-write path: dropped, zero rewritten)."""
    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark), p)  # meta.ts = 2*id, range-files on id
    stats = snapshot_delete(spark, p, [("meta.ts", "<", 250)])
    assert stats["dropped_files"] >= 1
    assert snapshot_read(spark, p).count() == 1000 - stats["removed_rows"]
    assert snapshot_read(spark, p).agg(F.min("meta.ts")).first()[0] >= 250


def test_nested_float_leaf_all_match_refused(spark, tmp_path):
    """The float refusal (NaN invisible to null_count) applies to nested
    leaves exactly as to top-level doubles."""
    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark), p)
    m = _read_manifest(p, _versions(p)[-1])
    s = m["stats"][m["files"][0]]
    assert _file_all_match(s, [("meta.deep.score", ">=", 0.0)]) is False
    assert _file_may_match(s, "meta.deep.score", ">=", 0.0) is True
    assert _file_may_match(s, "meta.deep.score", "=", float("nan")) is True


def test_nested_dist_prune_matches_driver_loop(spark, tmp_path):
    """The checkpoint-sidecar (executor-side) prune keeps exactly the
    files the driver loop keeps, for dotted predicates too — including
    the unknown-column and in-list edges."""
    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark), p)
    v = _versions(p)[-1]
    m = _read_manifest(p, v)
    for where in [
        [("meta.ts", "=", 100)],
        [("meta.deep.tag", "in", ["s1", None])],
        [("meta.deep.score", ">", 400.0)],
        [("meta.nope", "=", 1)],  # unknown leaf: keep everything
        [("meta.ts", ">=", 500), ("id", "<", 400)],
    ]:
        pw = _where_phys(m, where)
        dist = _dist_prune_files(spark, p, v, m, pw)
        drv, _ = _prune_files(m, pw, None)
        assert dist == drv, where


def test_nested_prune_survives_parent_rename(spark, tmp_path):
    """Rename of the parent struct is metadata-only; stats stay keyed on
    the stable physical head, so leaf predicates under the NEW name
    prune — driver loop and sidecar alike (the checkpoint predates the
    rename)."""
    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark), p)
    snapshot_rename_column(p, "meta", "info")
    rep = snapshot_scan_report(p, [("info.ts", "=", 100)])
    assert rep["skipped"] >= 6, rep
    out = snapshot_read(spark, p, where=[("info.ts", "=", 100)]).collect()
    assert [r.id for r in out] == [50]
    v = _versions(p)[-1]
    m = _read_manifest(p, v)
    pw = _where_phys(m, [("info.ts", "=", 100)])
    dist = _dist_prune_files(spark, p, v, m, pw)
    drv, _ = _prune_files(m, pw, None)
    assert dist == drv and len(drv) == rep["scanned"]


def test_dotted_top_level_name_refused(spark, tmp_path):
    """A literal dot in a top-level column name would collide with the
    struct-path predicate grammar — refused at table creation."""
    p = str(tmp_path / "t")
    df = spark.range(3).select(F.col("id").alias("a.b"))
    with pytest.raises(ValueError, match="may not contain"):
        snapshot_write(df, p)


def test_rename_to_dotted_name_refused(spark, tmp_path):
    """Rename must not create the ambiguous dotted name creation
    refuses (review finding: the rename path bypassed the check and
    could wedge the table)."""
    p = str(tmp_path / "t")
    snapshot_write(spark.range(5).select(F.col("id"), F.lit(1).alias("v")), p)
    with pytest.raises(ValueError, match="may not contain"):
        snapshot_rename_column(p, "v", "a.b")
    with pytest.raises(ValueError, match="may not contain"):
        snapshot_rename_column(p, "v", "a`b")


def test_nested_leaf_check_constraint(spark, tmp_path):
    """CHECK constraints speak the same triple grammar — a struct-leaf
    constraint validates existing data and rejects violating appends."""
    from dask_awkward_spark.sources.snapshot import (
        SnapshotConstraintViolation,
        snapshot_add_constraint,
    )

    p = str(tmp_path / "t")
    snapshot_write(_nested_df(spark, n=100, files=2), p)
    snapshot_add_constraint(spark, p, "ts_nonneg", [("meta.ts", ">=", 0)])
    bad = spark.range(1).select(
        F.col("id"),
        F.struct(
            F.lit(-5).cast("bigint").alias("ts"),
            F.lit(0).cast("bigint").alias("k"),
            F.struct(F.lit("s0").alias("tag"), F.lit(0.0).alias("score")).alias("deep"),
        ).alias("meta"),
        F.array(F.col("id")).alias("arr"),
    )
    with pytest.raises(SnapshotConstraintViolation):
        snapshot_write(bad, p, mode="append")
    ok = snapshot_read(spark, p).count()
    assert ok == 100  # the violating append never landed


def test_stats_width_cap(spark, tmp_path, monkeypatch):
    """The stats envelope records at most DAK_SNAPSHOT_STATS_MAX_COLS
    leaves (schema-order prefix, Delta's dataSkippingNumIndexedCols
    analog) — manifest size must not scale with a 500-leaf document
    schema. Beyond-cap predicates are safe no-ops: may-match keeps,
    all-match refuses, results identical to a full scan."""
    monkeypatch.setenv("DAK_SNAPSHOT_STATS_MAX_COLS", "3")
    p = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"),
        F.struct(
            (F.col("id") * 2).alias("a"),
            (F.col("id") * 3).alias("b"),
            (F.col("id") * 5).alias("c"),
        ).alias("meta"),
    ).repartitionByRange(4, "id")
    snapshot_write(df, p)
    m = _read_manifest(p, _versions(p)[-1])
    s = m["stats"][m["files"][0]]
    assert sorted(s["minmax"]) == ["id", "meta.a", "meta.b"]  # prefix of 3
    # beyond-cap predicate: zero skipping, full-scan-identical rows
    rep = snapshot_scan_report(p, [("meta.c", "<", 100)])
    assert rep["skipped"] == 0
    got = sorted(
        r.id for r in snapshot_read(spark, p, where=[("meta.c", "<", 100)]).collect()
    )
    assert got == list(range(20))
    assert _file_all_match(s, [("meta.c", ">=", 0)]) is False
    # in-cap predicates still prune
    assert snapshot_scan_report(p, [("meta.a", "<", 50)])["skipped"] >= 2
