"""A/B a named query's wall time against a pinned library checkout.

Usage:  python tools/ab_drift.py <lib_dir> <query> [<query> ...]

Spins one local Spark session, warms the table family, then times each
query N reps (noop sink) and prints ONE JSON line:
    {"lib": ..., "queries": {name: {"reps": [...], "best": ...}}}

Judge round-6 item: settle the recorded q3_top_orders 1.64x /
op_sum_axis1 1.37x drifts on untouched bodies — run this against HEAD
and the r4 worktree (e96b50a) in ABBA order under pinned machine state.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

REPS = 5


def main() -> None:
    lib_dir, names = sys.argv[1], sys.argv[2:]
    sys.path.insert(0, lib_dir)
    import dask_awkward_spark  # noqa: F401  (resolves from lib_dir)

    assert dask_awkward_spark.__file__.startswith(lib_dir.rstrip("/") + "/"), (
        dask_awkward_spark.__file__
    )
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_drift")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dask_awkward_spark.queries import all_queries

    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up: one rep of each target query (JVM, codegen, parquet footers)
    for n in names:
        run(n)
    out = {}
    for n in names:
        gc.collect()
        reps = [round(run(n), 3) for _ in range(REPS)]
        out[n] = {"reps": reps, "best": min(reps)}
    print(json.dumps({"lib": lib_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
