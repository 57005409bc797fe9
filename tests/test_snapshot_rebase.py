"""DML-vs-append conflict RESOLUTION (VERDICT r7 item 5): a CAS loss
against a blind append whose files provably contain no matching row
rebases the staged DML manifest onto the new head (staged files reused
byte-identical, appended files carried) instead of restarting the whole
staging loop; a possibly-matching append still restarts, preserving
serialized-after semantics (Delta's ConcurrentAppendException rule,
resolved instead of raised)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

import dask_awkward_spark.sources.snapshot as snap
from dask_awkward_spark.sources.snapshot import (
    snapshot_delete,
    snapshot_read,
    snapshot_update,
    snapshot_versions,
    snapshot_write,
)


def _mk(spark, p, n=1000, files=8):
    snapshot_write(spark.range(n).repartitionByRange(files, "id"), p)


def _stage_counter(monkeypatch, spark, p, append_df, fire_on_call=1):
    """Wrap _stage_files so the Nth DML staging call first lands a
    concurrent append — deterministic conflict injection. Returns the
    counter dict ({'n': dml staging calls})."""
    real = snap._stage_files
    state = {"n": 0, "inner": False}

    def hook(*a, **k):
        if not state["inner"]:
            state["n"] += 1
            if state["n"] == fire_on_call:
                state["inner"] = True
                try:
                    snapshot_write(append_df, p, mode="append")
                finally:
                    state["inner"] = False
        return real(*a, **k)

    monkeypatch.setattr(snap, "_stage_files", hook)
    return state


def test_delete_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    """Append of provably-non-matching keys mid-delete: the delete
    commits by REBASE — staged exactly once, and the final table is the
    serialized equivalent (append then delete)."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    state = _stage_counter(
        monkeypatch, spark, p, spark.range(5000, 5010).repartition(1)
    )
    # 260 is mid-file, so the boundary file REWRITES (stages) — the
    # aligned files still drop whole
    stats = snapshot_delete(spark, p, [("id", "<", 260)], change_feed=False)
    monkeypatch.undo()
    assert state["n"] == 1, "a disjoint append must not force a restage"
    assert stats["removed_rows"] == 260
    rows = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert rows == list(range(260, 1000)) + list(range(5000, 5010))
    # the rebase consumed the conflict: delete committed AFTER the append
    assert [v["version"] for v in snapshot_versions(p)][-3:] == [1, 2, 3]
    # bookkeeping reconciles with the committed manifest: the rebased
    # commit carries the appended file, and the stats say so
    m3 = snap._read_manifest(p, 3)
    assert stats["carried_files"] + stats["rewritten_files"] == len(m3["files"])


def test_delete_restarts_when_append_may_match(spark, tmp_path, monkeypatch):
    """Append of keys INSIDE the delete range: rebase is refused (the
    serialized-after delete must remove them too) — the loop restarts,
    stages twice, and the appended matching rows are gone."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    state = _stage_counter(
        monkeypatch, spark, p, spark.range(0, 5).repartition(1)
    )
    stats = snapshot_delete(spark, p, [("id", "<", 260)], change_feed=False)
    monkeypatch.undo()
    assert state["n"] == 2, "a possibly-matching append must restart"
    assert stats["removed_rows"] == 265  # 260 original + 5 appended
    assert snapshot_read(spark, p).count() == 740


def test_mor_delete_rebases(spark, tmp_path, monkeypatch):
    """Merge-on-read deletes rebase too (the DV references old files,
    which a blind append never touches)."""
    p = str(tmp_path / "t")
    _mk(spark, p)
    state = _stage_counter(
        monkeypatch, spark, p, spark.range(7000, 7004).repartition(1)
    )
    stats = snapshot_delete(
        spark, p, [("id", "<", 100)], strategy="merge-on-read", change_feed=False
    )
    monkeypatch.undo()
    assert state["n"] == 1 and stats["removed_rows"] == 100
    rows = sorted(r.id for r in snapshot_read(spark, p).collect())
    assert rows == list(range(100, 1000)) + list(range(7000, 7004))


def test_update_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "t")
    snapshot_write(
        spark.range(1000)
        .select("id", F.lit(1.0).alias("v"))
        .repartitionByRange(8, "id"),
        p,
    )
    state = _stage_counter(
        monkeypatch,
        spark,
        p,
        spark.range(9000, 9010).select("id", F.lit(1.0).alias("v")).repartition(1),
    )
    stats = snapshot_update(
        spark, p, [("id", "<", 250)], {"v": F.col("v") + 1}, change_feed=False
    )
    monkeypatch.undo()
    assert state["n"] == 1 and stats["updated_rows"] == 250
    got = snapshot_read(spark, p)
    assert got.filter(F.col("v") == 2.0).count() == 250
    assert got.count() == 1010  # the appended rows carried through


def test_rebase_refused_on_definition_change(spark, tmp_path, monkeypatch):
    """A concurrent RENAME (mapping change) mid-delete must restart, not
    rebase — the staged manifest carries the old mapping."""
    from dask_awkward_spark.sources.snapshot import snapshot_rename_column

    p = str(tmp_path / "t")
    snapshot_write(
        spark.range(1000)
        .select("id", F.lit(1.0).alias("v"))
        .repartitionByRange(8, "id"),
        p,
    )
    real = snap._stage_files
    state = {"n": 0}

    def hook(*a, **k):
        state["n"] += 1
        if state["n"] == 1:
            snapshot_rename_column(p, "v", "w")
        return real(*a, **k)

    monkeypatch.setattr(snap, "_stage_files", hook)
    stats = snapshot_delete(spark, p, [("id", "<", 260)], change_feed=False)
    monkeypatch.undo()
    assert state["n"] == 2  # restarted
    assert stats["removed_rows"] == 260
    assert snapshot_read(spark, p).columns == ["id", "w"]


def test_threaded_appends_and_delete_serialize(spark, tmp_path):
    """Real concurrency: 3 appenders of disjoint high keys race one
    delete of the low range — every commit lands, and the final table
    is exactly (all appends) minus (the delete's range)."""
    p = str(tmp_path / "t")
    _mk(spark, p)

    def append(k):
        df = spark.range(10_000 * (k + 1), 10_000 * (k + 1) + 20).repartition(1)
        return snapshot_write(df, p, mode="append")

    def delete():
        return snapshot_delete(spark, p, [("id", "<", 500)], change_feed=False)[
            "version"
        ]

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(append, k) for k in range(3)] + [ex.submit(delete)]
        versions = sorted(f.result() for f in futs)
    assert versions == [2, 3, 4, 5]  # four commits, no version lost
    rows = sorted(r.id for r in snapshot_read(spark, p).collect())
    want = list(range(500, 1000)) + [
        x for k in range(3) for x in range(10_000 * (k + 1), 10_000 * (k + 1) + 20)
    ]
    assert rows == sorted(want)
