"""Measured evidence for the snapshot log-delta layout at many-file scale
(VERDICT r5 missing item 1: "measured evidence (10k-100k synthetic
files) of commit/read latency").

Synthesizes a snapshot table whose head manifest references N files
(one real parquet hard-linked N times, disjoint fabricated id ranges —
prune behavior is identical to N real files, without N real writes),
then measures:

  - append commit latency: delta-log commit (O(changed)) vs forced
    full-manifest commit (O(files)) — the round-5 design rewrote the
    full file list + stats JSON on EVERY commit;
  - read-planning latency for a selective predicate: driver-side Python
    prune loop (O(files) interpreted) vs executor-side prune over the
    checkpoint stats parquet (a Spark filter; flat in N driver-side).

Usage: python tools/manifest_scale_bench.py [N ...]   (default 10000 100000)
Prints one JSON line per N; paste the table into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dask_awkward_spark.sources.snapshot as snap
from dask_awkward_spark.session import get_spark


def build_synthetic(spark, path: str, n_files: int) -> None:
    """A table whose v2 is a full checkpoint manifest with n_files
    entries, each covering ids [i*100, i*100+99]."""
    snapshot_v1 = snap.snapshot_write(spark.range(100).coalesce(1), path)
    assert snapshot_v1 == 1
    m1 = snap._read_manifest(path, 1)
    real = os.path.join(path, m1["files"][0])
    files, stats = [], {}
    master = real
    for i in range(n_files):
        rel = f"{snap._DATA}/syn-{i:07d}.parquet"
        dst = os.path.join(path, rel)
        if i % 50_000 == 0:  # ext4 caps ~65k links per inode
            shutil.copy(real, dst)
            master = dst
        else:
            os.link(master, dst)
        files.append(rel)
        stats[rel] = {"rows": 100, "minmax": {"id": [i * 100, i * 100 + 99]}}
    manifest = {
        "version": 2,
        "parent": 1,
        "op": "overwrite",
        "files": files,
        "stats": stats,
        "schema_ddl": m1["schema_ddl"],
        "schema_json": m1["schema_json"],
        "committed_at": time.time(),
    }
    assert snap._commit_manifest(path, 2, manifest)  # full -> writes ckpt
    assert os.path.exists(snap._ckpt_file(path, 2))


def bench_one(spark, n_files: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"dak-manifest-bench-{os.getpid()}-")
    path = os.path.join(root, "tbl")
    try:
        t0 = time.perf_counter()
        build_synthetic(spark, path, n_files)
        build_s = time.perf_counter() - t0

        small = spark.range(10**9, 10**9 + 10).coalesce(1)

        # delta-log append (the new default path)
        t0 = time.perf_counter()
        v = snap.snapshot_write(small, path, mode="append")
        delta_commit_s = time.perf_counter() - t0
        assert "delta_of" in snap._read_manifest_raw(path, v)
        delta_bytes = os.path.getsize(snap._manifest_file(path, v))

        # forced full-manifest append (the round-5 behavior, every commit)
        old = snap._CKPT_EVERY
        snap._CKPT_EVERY = 1
        try:
            t0 = time.perf_counter()
            v = snap.snapshot_write(small, path, mode="append")
            full_commit_s = time.perf_counter() - t0
        finally:
            snap._CKPT_EVERY = old
        assert "delta_of" not in snap._read_manifest_raw(path, v)
        full_bytes = os.path.getsize(snap._manifest_file(path, v))

        # staged transaction (round 11): three appends collapse to ONE
        # published CAS commit — staging, the forensic traces, and the
        # publish must all stay O(delta) however many files the table
        # already references
        t0 = time.perf_counter()
        with snap.snapshot_txn():
            for k in range(3):
                snap.snapshot_write(
                    spark.range(2 * 10**9 + 10 * k, 2 * 10**9 + 10 * k + 10)
                    .coalesce(1),
                    path,
                    mode="append",
                )
        txn_commit_s = time.perf_counter() - t0
        vtx = snap._versions(path)[-1]
        assert "delta_of" in snap._read_manifest_raw(path, vtx)
        txn_bytes = os.path.getsize(snap._manifest_file(path, vtx))

        # read planning: selective predicate keeps ~1% of files
        where = [("id", "<", n_files)]
        m = snap._read_manifest(path, v)
        tz = spark.conf.get("spark.sql.session.timeZone")
        # 2 reps, keep the warm one: rep 1 pays Spark session/job init
        # (and, driver-side, the OS page cache) that a live service with
        # a running session does not re-pay per read
        for _ in range(2):
            t0 = time.perf_counter()
            kept_driver, _ = snap._prune_files(m, where, tz)
            driver_prune_s = time.perf_counter() - t0
        for _ in range(2):
            t0 = time.perf_counter()
            kept_dist = snap._dist_prune_files(spark, path, v, m, where)
            dist_prune_s = time.perf_counter() - t0
        assert kept_dist == kept_driver
        # the cold path also re-parses the manifest JSON driver-side:
        # measure a cold resolve (cache dropped) for the full picture
        snap._MANIFEST_CACHE.clear(); snap._RAW_CACHE.clear()
        t0 = time.perf_counter()
        snap._read_manifest(path, v)
        cold_resolve_s = time.perf_counter() - t0
        # end-to-end PLAN cost of the public read face (no action):
        # at >= _DIST_PRUNE_MIN_FILES this takes the executor-side
        # prune automatically — the number a live 1M-file service pays
        # per query before Spark even sees the plan
        for _ in range(2):
            t0 = time.perf_counter()
            snap.snapshot_read(spark, path, where=where)
            read_plan_s = time.perf_counter() - t0
        return {
            "n_files": n_files,
            "delta_commit_s": round(delta_commit_s, 3),
            "full_commit_s": round(full_commit_s, 3),
            "delta_manifest_bytes": delta_bytes,
            "full_manifest_bytes": full_bytes,
            "txn_commit_s": round(txn_commit_s, 3),
            "txn_manifest_bytes": txn_bytes,
            "driver_prune_s": round(driver_prune_s, 3),
            "dist_prune_s": round(dist_prune_s, 3),
            "cold_resolve_s": round(cold_resolve_s, 3),
            "read_plan_s": round(read_plan_s, 3),
            "dist_path_auto": n_files >= snap._DIST_PRUNE_MIN_FILES,
            "files_kept": len(kept_driver),
            "build_s": round(build_s, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_spark("manifest-scale-bench", cpus=8)
    for n in sizes:
        print(json.dumps(bench_one(spark, n)), flush=True)


if __name__ == "__main__":
    main()
