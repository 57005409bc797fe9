"""Record the IVF-PQ storage/probe-I/O trade (round-9 continuation):
build flat, int8-SQ, and PQ indexes over the same synthetic embeddings
and compare total index bytes and the RANKING-SCAN bytes each tier
actually reads — (vec_id, cell, e) flat vs (vec_id, cell, q) SQ vs
(vec_id, cell, pqc, norm) PQ. PQ stores m BYTES per vector regardless
of dimension, so its win GROWS with dim where SQ's is fixed at ~8x.

Usage: python tools/pq_bytes.py [n_vecs] [dim] [m] [ksub]
Prints one human-readable block; paste the numbers into COVERAGE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_awkward_spark.functions.pq import pq_train  # noqa: E402
from dask_awkward_spark.functions.simindex import ivf_index_add  # noqa: E402
from dask_awkward_spark.session import get_spark  # noqa: E402
from quantized_bytes import col_bytes, table_bytes  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    ksub = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    spark = get_spark("pq-bytes", cpus=8)
    import hashlib
    import shutil

    cents = [
        [
            1.0 if hashlib.md5(f"c{j}_{d}".encode()).hexdigest()[0] in "89abcdef" else -1.0
            for d in range(dim)
        ]
        for j in range(8)
    ]
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("e"),
    )
    cb = pq_train(vecs, m=m, ksub=ksub, order_col="vec_id", iters=6)
    p_flat, p_q, p_pq = "/tmp/pqb_flat", "/tmp/pqb_sq", "/tmp/pqb_pq"
    for p in (p_flat, p_q, p_pq):
        shutil.rmtree(p, ignore_errors=True)
    ivf_index_add(p_flat, vecs, cents)
    ivf_index_add(p_q, vecs, cents, quantized=True)
    ivf_index_add(p_pq, vecs, cents, pq_codebook=cb)

    t_flat, t_sq, t_pq = (table_bytes(p) for p in (p_flat, p_q, p_pq))
    pr_flat = col_bytes(p_flat, ("vec_id", "cell", "e"))
    pr_sq = col_bytes(p_q, ("vec_id", "cell", "q"))
    pr_pq = col_bytes(p_pq, ("vec_id", "cell", "pqc", "norm"))
    print(f"n={n} dim={dim} m={m} ksub={ksub}")
    print(
        f"index bytes  flat={t_flat/1e6:.1f}MB  sq={t_sq/1e6:.1f}MB "
        f"({t_sq/t_flat:.2f}x)  pq={t_pq/1e6:.1f}MB ({t_pq/t_flat:.2f}x)"
    )
    print(
        f"ranking-scan bytes  flat(e)={pr_flat/1e6:.2f}MB  "
        f"sq(q)={pr_sq/1e6:.2f}MB ({pr_flat/max(pr_sq,1):.1f}x smaller)  "
        f"pq(pqc+norm)={pr_pq/1e6:.2f}MB ({pr_flat/max(pr_pq,1):.1f}x smaller)"
    )
    for p in (p_flat, p_q, p_pq):
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
