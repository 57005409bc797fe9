"""Measure the residual-encoding recall win (round-10, VERDICT r9 next
item 1): build TWO IVF-PQ indexes over the same real testdata
embeddings — one with the raw-vector codebook (format 1, round-9
behavior), one RESIDUAL-encoded (true IVFADC: codes quantize
``x - centroid(cell)``) — and sweep recall@k at the DEFAULT rescore_k
(the path where ADC ranking quality actually shows; at full rescore
both are exact by construction). Residuals concentrate the quantizer's
dynamic range around zero, so the same m bytes should buy visibly
better recall.

Coarse centroids are the per-label means of the embeddings table — a
realistic trained quantizer (the labels ARE the cluster structure),
fully deterministic.

Usage: python tools/pq_recall_compare.py [sf_dir] [m] [ksub]
Prints one JSON line; paste the curves into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_awkward_spark.functions.pq import pq_train  # noqa: E402
from dask_awkward_spark.functions.simindex import (  # noqa: E402
    ivf_index_add,
    ivf_recall,
)
from dask_awkward_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ksub = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("pq-recall-compare", cpus=8)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    # coarse quantizer: per-label mean vectors (deterministic, trained)
    cents_rows = (
        emb.groupBy("label")
        .agg(F.array(*[
            F.avg(F.col("e")[i]).alias(f"c{i}")
            for i in range(len(emb.select("e").first()[0]))
        ]).alias("c"))
        .orderBy("label")
        .collect()
    )
    cents = [[float(v) for v in r.c] for r in cents_rows]
    cb_raw = pq_train(emb, m=m, ksub=ksub, order_col="vec_id", iters=8)
    cb_res = pq_train(
        emb, m=m, ksub=ksub, order_col="vec_id", iters=8,
        residual_centroids=cents,
    )
    queries = emb.filter(F.col("vec_id") < 64)
    out = {"sf_dir": sf_dir, "m": m, "ksub": ksub, "n_cells": len(cents),
           "k": 10, "rescore_k": "default (max(4k,32)=40)"}
    for tag, cb in (("raw", cb_raw), ("residual", cb_res)):
        path = f"/tmp/pq_recall_{tag}"
        shutil.rmtree(path, ignore_errors=True)
        ivf_index_add(path, emb, cents, pq_codebook=cb)
        out[tag] = ivf_recall(
            spark, path, queries, cents, k=10, nprobes=(2, 4, 10),
        )
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
