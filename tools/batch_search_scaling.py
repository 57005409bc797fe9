"""Batch-ANN scaling evidence (VERDICT r9 item 1 done-criterion): time
the distributed two-tier ivf_search at 1k vs 10k query rows over the
same quantized index and report the PER-QUERY cost — the batch path's
whole point is that cost-per-query stays flat when the query side grows
10x (candidates per query are fixed by the index geometry; planning is
a column, not a driver loop).

Usage: python tools/batch_search_scaling.py [Q1] [Q2]   (default 1000 10000)
Prints one JSON line:
  {"corpus": N, "q1": ..., "t1": s, "q2": ..., "t2": s,
   "ms_per_query_1": ..., "ms_per_query_2": ..., "per_query_ratio": ...}
per_query_ratio ~ 1.0 = flat; >> 1 would mean the plan has a hidden
super-linear term (driver loop, BNLJ, global sort).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_awkward_spark.session import get_spark  # noqa: E402
from dask_awkward_spark.functions.simindex import (  # noqa: E402
    ivf_index_add,
    ivf_search,
)

DIM = 32
N_CELLS = 64
CORPUS = 20_000


def _centroids():
    out = []
    for j in range(N_CELLS):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"s{j}_{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        out.append(row)
    return out


def _vecs(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("e"),
    )


def main() -> None:
    q1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000
    q2 = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("batch_search_scaling")
    cents = _centroids()
    path = f"/tmp/dakspark_bsscale_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    try:
        ivf_index_add(path, _vecs(spark, 0, CORPUS), cents, quantized=True)

        def run(n: int) -> float:
            # query ids offset past the corpus so exclude_self never hits
            qs = _vecs(spark, 1_000_000, 1_000_000 + n)
            t0 = time.time()
            ivf_search(spark, path, qs, cents, k=10, nprobe=2).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.time() - t0

        run(min(q1, 1000))  # warm: JVM, codegen, parquet footers
        t1 = min(run(q1), run(q1))
        t2 = min(run(q2), run(q2))
        out = {
            "corpus": CORPUS,
            "q1": q1,
            "t1": round(t1, 2),
            "q2": q2,
            "t2": round(t2, 2),
            "ms_per_query_1": round(1000 * t1 / q1, 3),
            "ms_per_query_2": round(1000 * t2 / q2, 3),
            "per_query_ratio": round((t2 / q2) / (t1 / q1), 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
