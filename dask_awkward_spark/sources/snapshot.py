"""Snapshot tables: versioned, atomically-committed parquet datasets.

A minimal log-structured table layer (the public Delta/Iceberg pattern,
re-implemented on plain parquet + JSON manifests — no extra packages):

- data files are IMMUTABLE, written once under ``<path>/data/`` with
  unique names and never modified;
- a commit is ONE atomically-created manifest ``_manifests/v<N>.json``
  listing exactly the files that make up version N (O_EXCL create —
  two concurrent writers cannot both claim a version; the loser re-reads
  the log and retries against the new head, i.e. optimistic concurrency);
- readers list the manifest log, pick a version (latest by default),
  and scan ONLY its files — a reader never sees a half-written dataset,
  and time travel is "read an older manifest".

Why this matters at 100 TB: plain ``mode=overwrite`` deletes the old
data before the new write finishes (readers crash or see partial data),
and ``append`` gives no isolation at all. Snapshots give atomic
replace/append, time travel for reproducing a training run, compaction
that does not disturb concurrent readers, and vacuum as the explicit
GC step. Capability uplift; no reference counterpart
(dask-awkward's to_parquet is fire-and-forget: lib/io/parquet.py:515).

Local filesystem notes (documented contract): atomic commit uses
``os.link`` create-if-absent semantics, which holds on POSIX and on
HDFS-style stores via their atomic rename; on S3 proper, a real
deployment swaps the commit primitive for a conditional PUT — the
call site is isolated in :func:`_commit_manifest`.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, _MANIFESTS)


def _versions(path: str) -> "list[int]":
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version:08d}.json")) as f:
        return json.load(f)


def _commit_manifest(path: str, version: int, manifest: dict) -> bool:
    """Atomically claim ``version``; False if another writer won the race."""
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    final = os.path.join(d, f"v{version:08d}.json")
    try:
        os.link(tmp, final)  # create-if-absent: fails iff version exists
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _stage_files(df: DataFrame, path: str, compression: str) -> "list[str]":
    """Write df's partitions as immutable uniquely-named files under data/.

    Spark writes into a fresh staging dir; the part files are then
    hard-linked into ``data/`` under uuid names (link, not rename, so a
    crash mid-stage leaves only unreferenced garbage for vacuum — never
    a torn file visible to any manifest)."""
    data_dir = os.path.join(path, _DATA)
    os.makedirs(data_dir, exist_ok=True)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").option("compression", compression).parquet(staging)
    files = []
    try:
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            out = f"{uuid.uuid4().hex}.parquet"
            os.link(os.path.join(staging, name), os.path.join(data_dir, out))
            files.append(f"{_DATA}/{out}")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return files


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> int:
    """Commit ``df`` as a new version of the snapshot table at ``path``.

    ``overwrite`` replaces the visible file set; ``append`` adds to it.
    Returns the committed version number. Retries on commit races
    (optimistic concurrency) — an ``append`` loser re-reads the new head
    so no concurrently-appended files are lost."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(path, exist_ok=True)
    new_files = _stage_files(df, path, compression)
    while True:
        versions = _versions(path)
        head = versions[-1] if versions else 0
        if mode == "append" and versions:
            files = _read_manifest(path, head)["files"] + new_files
        else:
            files = list(new_files)
        manifest = {
            "version": head + 1,
            "parent": head or None,
            "op": mode,
            "files": files,
            "schema_ddl": df.schema.simpleString(),
            "committed_at": time.time(),
        }
        if _commit_manifest(path, head + 1, manifest):
            return head + 1
        # another writer claimed head+1: re-read the log and retry


def snapshot_read(spark: SparkSession, path: str, version: "int | None" = None) -> DataFrame:
    """Read one version (latest by default) — scans ONLY that manifest's
    files, so concurrent writes/compactions never tear a read."""
    versions = _versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot manifests under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    m = _read_manifest(path, v)
    files = [os.path.join(path, f) for f in m["files"]]
    if not files:
        return spark.createDataFrame([], m["schema_ddl"])
    return spark.read.parquet(*files)


def snapshot_versions(path: str) -> "list[dict]":
    """The manifest log, oldest first (time travel index)."""
    return [_read_manifest(path, v) for v in _versions(path)]


def snapshot_compact(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Rewrite the head version's small files into ~target-size files and
    commit the result as a NEW version — readers of older versions are
    untouched (their files are immutable); reclaim with vacuum."""
    df = snapshot_read(spark, path)
    head = _versions(path)[-1]
    m = _read_manifest(path, head)
    total = sum(os.path.getsize(os.path.join(path, f)) for f in m["files"])
    n_out = max(1, math.ceil(total / max(target_file_bytes, 1)))
    return snapshot_write(df.repartition(n_out), path, mode="overwrite")


def snapshot_vacuum(path: str, keep_last: int = 1) -> "dict[str, int]":
    """GC: drop all but the last ``keep_last`` manifests and delete data
    files no retained manifest references. The only destructive op in
    the layer, and it only touches already-unreferenced history."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _versions(path)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    referenced = set()
    for v in keep:
        referenced.update(_read_manifest(path, v)["files"])
    removed_files = 0
    data_dir = os.path.join(path, _DATA)
    for name in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
        rel = f"{_DATA}/{name}"
        if name.endswith(".parquet") and rel not in referenced:
            os.unlink(os.path.join(data_dir, name))
            removed_files += 1
    for v in drop:
        os.unlink(os.path.join(_manifest_dir(path), f"v{v:08d}.json"))
    return {"removed_manifests": len(drop), "removed_files": removed_files}
