"""Record the quantized-IVF storage/probe-I/O trade (VERDICT r7 item 3):
build a flat and a quantized index over the same synthetic embeddings,
then compare total index bytes and — the number that matters at 100 TB —
the PROBE bytes: compressed parquet column-chunk sizes a ranking scan
actually reads ((vec_id, cell, q) vs (vec_id, cell, e)).

Usage: python tools/quantized_bytes.py [n_vecs] [dim]
Prints one human-readable block; paste the numbers into COVERAGE.md.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_awkward_spark.functions.simindex import ivf_index_add  # noqa: E402
from dask_awkward_spark.session import get_spark  # noqa: E402


def col_bytes(path: str, prefixes: "tuple[str, ...]") -> int:
    """Total compressed column-chunk bytes for leaves whose dotted path
    starts with one of the prefixes, across every data file."""
    total = 0
    for f in glob.glob(os.path.join(path, "data", "**", "*.parquet"), recursive=True):
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if any(
                    c.path_in_schema == p or c.path_in_schema.startswith(p + ".")
                    for p in prefixes
                ):
                    total += c.total_compressed_size
    return total


def table_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "data", "**", "*.parquet"), recursive=True)
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark("quantized-bytes", cpus=8)
    import hashlib
    import shutil

    cents = []
    for j in range(8):
        cents.append(
            [
                1.0 if hashlib.md5(f"c{j}_{d}".encode()).hexdigest()[0] in "89abcdef" else -1.0
                for d in range(dim)
            ]
        )
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("e"),
    )
    p_flat, p_q = "/tmp/qb_flat", "/tmp/qb_quant"
    for p in (p_flat, p_q):
        shutil.rmtree(p, ignore_errors=True)
    ivf_index_add(p_flat, vecs, cents)
    ivf_index_add(p_q, vecs, cents, quantized=True)

    flat_total = table_bytes(p_flat)
    q_total = table_bytes(p_q)
    flat_probe = col_bytes(p_flat, ("vec_id", "cell", "e"))
    q_probe = col_bytes(p_q, ("vec_id", "cell", "q"))
    print(f"n={n} dim={dim}")
    print(f"index bytes  flat={flat_total/1e6:.1f}MB  quantized={q_total/1e6:.1f}MB  ({q_total/flat_total:.2f}x)")
    print(f"probe bytes  flat(e)={flat_probe/1e6:.1f}MB  quantized(q)={q_probe/1e6:.1f}MB  ({flat_probe/max(q_probe,1):.1f}x smaller scans)")
    spark.stop()


if __name__ == "__main__":
    main()
