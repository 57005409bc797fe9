"""Column mapping (VERDICT r6 item 4): stable column ids + physical
names in the manifest make RENAME and DROP metadata-only commits —
files are never rewritten, old files read correctly under the new
name, a re-added name can never resolve a dropped column's bytes, and
every face (read, SQL view, DataSource, CDF, stream, DML, pruning,
constraints) resolves through the mapping."""

from __future__ import annotations

import os

import pytest

# every test in this module runs under BOTH data-plane backends
# (posix hard-link / object-store copy emulation) — VERDICT r6 item 1
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources import snapshot as snap
from dask_awkward_spark.sources.snapshot import (
    SnapshotConflictError,
    snapshot_changes,
    snapshot_count,
    snapshot_delete,
    snapshot_drop_column,
    snapshot_read,
    snapshot_rename_column,
    snapshot_restore,
    snapshot_scan_report,
    snapshot_update,
    snapshot_write,
)


def _tbl(spark, tmp_path, n=20):
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(n)],
        "id bigint, user string, bal double",
    )
    snapshot_write(df.repartitionByRange(4, "id"), p)
    return p


def test_rename_is_metadata_only_and_old_files_read(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    v = snapshot_rename_column(p, "user", "username")
    assert v == 2
    m1, m2 = snap._read_manifest(p, 1), snap._read_manifest(p, 2)
    assert m2["files"] == m1["files"]  # zero data files touched
    assert m2["op"] == "rename_column"
    got = snapshot_read(spark, p).orderBy("id")
    assert got.columns == ["id", "username", "bal"]
    assert got.first().username == "u0"  # old file bytes, new name
    # time travel still shows the old name
    assert snapshot_read(spark, p, version=1).columns == ["id", "user", "bal"]
    # the mapping records the stable physical name
    cm = m2["column_mapping"]
    assert cm["physical"]["username"] == "user"


def test_rename_validations(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_rename_column(p, "ghost", "x")
    with pytest.raises(ValueError, match="already exists"):
        snapshot_rename_column(p, "user", "BAL")  # case-insensitive clash
    with pytest.raises(ValueError, match="identical"):
        snapshot_rename_column(p, "user", "user")
    with pytest.raises(ValueError, match="reserved"):
        snapshot_rename_column(p, "user", "__dak_x")
    with pytest.raises(SnapshotConflictError):
        snapshot_rename_column(p, "user", "u2", expect_head=99)
    # constraint-referenced column refuses
    from dask_awkward_spark.sources.snapshot import snapshot_add_constraint

    snapshot_add_constraint(spark, p, "pos_bal", [("bal", ">=", 0.0)])
    with pytest.raises(ValueError, match="constraint"):
        snapshot_rename_column(p, "bal", "balance")


def test_appends_and_dml_after_rename(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    snapshot_rename_column(p, "user", "username")
    snapshot_write(
        spark.createDataFrame(
            [(100, "u100", 1.0)], "id bigint, username string, bal double"
        ),
        p,
        mode="append",
    )
    # the appended file stores the PHYSICAL name, like every other file
    import pyarrow.parquet as pq

    newf = [
        f
        for f in snap._read_manifest(p, 3)["files"]
        if f not in snap._read_manifest(p, 2)["files"]
    ]
    assert pq.read_schema(os.path.join(p, newf[0])).names == ["id", "user", "bal"]
    # predicate pruning + filters on the renamed column
    rep = snapshot_scan_report(p, [("username", "=", "u100")])
    assert rep["skipped"] > 0
    got = snapshot_read(spark, p, where=[("username", "=", "u100")]).collect()
    assert len(got) == 1 and got[0].bal == 1.0
    assert snapshot_count(spark, p, where=[("username", "=", "u100")]) == 1
    # UPDATE / MOR DELETE keyed on the renamed column
    snapshot_update(spark, p, [("username", "=", "u100")], {"bal": F.lit(9.0)})
    assert (
        snapshot_read(spark, p).filter(F.col("id") == 100).first().bal == 9.0
    )
    stats = snapshot_delete(
        spark, p, [("username", "=", "u3")], strategy="merge-on-read"
    )
    assert stats["removed_rows"] == 1 and stats["rewritten_files"] == 0
    assert snapshot_read(spark, p).filter(F.col("username") == "u3").count() == 0


def test_drop_then_readd_never_leaks_old_bytes(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    snapshot_drop_column(p, "bal")
    assert snapshot_read(spark, p).columns == ["id", "user"]
    # time travel pre-drop still has it
    assert snapshot_read(spark, p, version=1).columns == ["id", "user", "bal"]
    # re-add the same logical name at a DIFFERENT type: fresh physical
    snapshot_write(
        spark.createDataFrame([(200, "u200", "fresh")], "id bigint, user string, bal string"),
        p,
        mode="append",
        merge_schema=True,
    )
    rows = {r.id: r.bal for r in snapshot_read(spark, p).collect()}
    assert rows[200] == "fresh"
    assert rows[0] is None  # dropped column's doubles NOT resurrected
    cm = snap._read_manifest(p, 3)["column_mapping"]
    assert cm["physical"]["bal"] != "bal" and "bal" in cm["retired"]


def test_drop_validations(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(1, "a", 1.0)], "id bigint, part string, bal double"),
        p,
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition column"):
        snapshot_drop_column(p, "part")
    from dask_awkward_spark.sources.snapshot import snapshot_add_constraint

    snapshot_add_constraint(spark, p, "pos", [("bal", ">=", 0.0)])
    with pytest.raises(ValueError, match="constraint"):
        snapshot_drop_column(p, "bal")
    one = str(tmp_path / "one")
    snapshot_write(spark.range(3), one)
    with pytest.raises(ValueError, match="only column"):
        snapshot_drop_column(one, "id")


def test_feeds_and_views_cross_rename(spark, tmp_path):
    import tempfile

    from dask_awkward_spark.sources.snapshot import (
        from_snapshot,
        snapshot_view,
        stream_from_snapshot,
    )

    p = _tbl(spark, tmp_path, n=6)
    snapshot_rename_column(p, "user", "username")  # v2
    snapshot_write(
        spark.createDataFrame([(50, "u50", 5.0)], "id bigint, username string, bal double"),
        p,
        mode="append",
    )  # v3
    snapshot_delete(spark, p, [("username", "=", "u1")], strategy="merge-on-read")  # v4
    # plain file-delta feed crosses the rename (metadata-only)
    pl = snapshot_changes(spark, p, since=1, until=3).collect()
    assert [(r.id, r.username) for r in pl] == [(50, "u50")]
    # batch CDF: pre-rename files synthesize inserts under the NEW name
    cdf = snapshot_changes(spark, p, since=1, until=4, row_level=True).collect()
    kinds = sorted((r.username, r._change_type) for r in cdf)
    assert kinds == [("u1", "delete"), ("u50", "insert")]
    # streaming CDF from version 0 reads pre-rename files correctly
    out = stream_from_snapshot(spark, p, row_level=True)
    name = f"cmap_stream_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT username, _change_type FROM {name}").collect()
    assert ("u0", "insert") in {(r.username, r._change_type) for r in rows}
    # DataSource batch face resolves physical names + pushes filters
    ds = from_snapshot(spark, p).filter(F.col("username") == "u50")
    assert [(r.id, r.bal) for r in ds.collect()] == [(50, 5.0)]
    # SQL face
    v = f"cmap_view_{os.getpid()}"
    snapshot_view(spark, p, v)
    assert spark.sql(f"SELECT count(*) AS n FROM {v}").first().n == 6
    spark.catalog.dropTempView(v)


def test_rename_partition_column_and_compact(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(40)],
        "id bigint, part string, v double",
    )
    snapshot_write(df, p, partition_by=["part"])
    snapshot_rename_column(p, "part", "bucket")
    m = snap._read_manifest(p, 2)
    assert m["partition_by"] == ["bucket"]
    # partition pruning still exact on the renamed column
    rep = snapshot_scan_report(p, [("bucket", "=", "a")])
    assert rep["skipped"] > 0
    assert snapshot_read(spark, p, where=[("bucket", "=", "a")]).count() == 20
    # appends under the sticky (renamed) spec lay out under the
    # PHYSICAL dir name, indistinguishable from the original files
    snapshot_write(
        spark.createDataFrame([(100, "a", 1.0)], "id bigint, bucket string, v double"),
        p,
        mode="append",
    )
    newf = [
        f
        for f in snap._read_manifest(p, 3)["files"]
        if f not in m["files"]
    ]
    assert all("part=a/" in f for f in newf)
    # scoped compact keeps physical naming; reads stay correct
    from dask_awkward_spark.sources.snapshot import snapshot_compact

    snapshot_compact(spark, p, where=[("bucket", "=", "a")])
    assert snapshot_read(spark, p).count() == 41
    assert snapshot_read(spark, p, where=[("bucket", "=", "a")]).count() == 21


def test_restore_and_constraints_across_mapping(spark, tmp_path):
    from dask_awkward_spark.sources.snapshot import (
        SnapshotConstraintViolation,
        snapshot_add_constraint,
    )

    p = _tbl(spark, tmp_path, n=5)
    snapshot_rename_column(p, "bal", "balance")  # v2
    # constraints registered AGAINST the new name enforce on appends
    # (the staged files store the physical name — the check must alias)
    snapshot_add_constraint(spark, p, "pos", [("balance", ">=", 0.0)])  # v3
    with pytest.raises(SnapshotConstraintViolation):
        snapshot_write(
            spark.createDataFrame(
                [(9, "u9", -1.0)], "id bigint, user string, balance double"
            ),
            p,
            mode="append",
        )
    # restore to v1 brings the old name (and drops the mapping) back
    snapshot_restore(p, 1)
    assert snapshot_read(spark, p).columns == ["id", "user", "bal"]


def test_overwrite_resets_mapping(spark, tmp_path):
    p = _tbl(spark, tmp_path, n=5)
    snapshot_rename_column(p, "user", "username")
    snapshot_write(
        spark.createDataFrame([(1, "x")], "k bigint, name string"), p
    )  # plain overwrite: table replaced
    m = snap._read_manifest(p, snap._versions(p)[-1])
    assert m.get("column_mapping") is None
    assert snapshot_read(spark, p).columns == ["k", "name"]
    # old version still resolves through ITS mapping
    assert snapshot_read(spark, p, version=2).columns == ["id", "username", "bal"]


def test_concurrent_rename_conflicts_staged_append(spark, tmp_path, monkeypatch):
    """An append staged before a rename lands must refuse to commit:
    its files carry the OLD mapping's physical names for any column the
    rename re-keyed, and committing blind could mis-resolve bytes."""
    p = _tbl(spark, tmp_path, n=5)
    real = snap._versions
    calls = []

    def hook(path):
        # call 1 = the pre-loop spec read, call 2 = the CAS loop's head
        # read AFTER staging: sneak the rename in exactly there — the
        # lost-update window between staging and commit
        calls.append(1)
        if len(calls) == 2:
            snapshot_rename_column(p, "user", "username")
        return real(path)

    monkeypatch.setattr(snap, "_versions", hook)
    with pytest.raises(SnapshotConflictError, match="renamed"):
        snapshot_write(
            spark.createDataFrame(
                [(99, "u99", 9.0)], "id bigint, user string, bal double"
            ),
            p,
            mode="append",
        )


def test_apply_changes_across_rename_guides_the_fix(spark, tmp_path):
    """Replication across a rename: the consumer fails FAST with the
    exact remedy (apply the same rename to dst), and succeeds once
    applied — schema changes don't replicate silently."""
    from dask_awkward_spark.sources.snapshot import snapshot_apply_changes

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, name string")
    snapshot_write(df, src)
    snapshot_write(df, dst)  # bootstrapped replica
    snapshot_rename_column(src, "name", "label")  # v2
    snapshot_write(
        spark.createDataFrame([(3, "c")], "k bigint, label string"),
        src,
        mode="append",
    )  # v3
    with pytest.raises(ValueError, match="snapshot_rename_column"):
        snapshot_apply_changes(spark, src, dst, on=["k"], since=1)
    snapshot_rename_column(dst, "name", "label")
    out = snapshot_apply_changes(spark, src, dst, on=["k"], since=1)
    assert out["upserted"] == 1 and out["deleted"] == 0
    got = sorted((r.k, r.label) for r in snapshot_read(spark, dst).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_apply_changes_into_projected_replica(spark, tmp_path):
    """A derived dst that PROJECTS src (fewer columns) replicates fine —
    the guard only requires dst's own columns in the feed (round-7
    second-review finding); a src-side DROP of a column dst still
    carries raises the guided error."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_apply_changes,
        snapshot_drop_column,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k bigint, name string, extra double"
    )
    snapshot_write(df, src)
    snapshot_write(df.select("k", "name"), dst)  # projection replica
    snapshot_write(
        spark.createDataFrame([(3, "c", 3.0)], "k bigint, name string, extra double"),
        src,
        mode="append",
    )
    out = snapshot_apply_changes(spark, src, dst, on=["k"], since=1)
    assert out["upserted"] == 1
    assert sorted((r.k, r.name) for r in snapshot_read(spark, dst).collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # src drops a column dst still carries: guided error, not a deep one
    snapshot_drop_column(src, "extra")
    full = str(tmp_path / "full")
    snapshot_write(df, full)  # replica that still has `extra`
    snapshot_write(
        spark.createDataFrame([(9, "z")], "k bigint, name string"),
        src,
        mode="append",
    )
    with pytest.raises(ValueError, match="snapshot_drop_column"):
        snapshot_apply_changes(spark, src, full, on=["k"], since=1)
