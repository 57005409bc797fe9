"""Reproducible scale-up measurement: blow up the sf0.1 tables N-fold
(with key remapping so cardinalities grow too, not just row counts) and
time representative queries at 1x vs Nx. This is the evidence behind the
README's "Measured scaling" section — a query whose runtime grows much
faster than N has a plan that won't survive a real cluster scale-up.

Usage: python tools/bench_scaling.py [REP] [query ...]
Writes replicas to /tmp/dakspark_scale_<REP>x (reused if present) and
prints one JSON line {"rep": N, "queries": {name: {"t1": s, "tN": s}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_awkward_spark.session import get_spark  # noqa: E402
from dask_awkward_spark.queries import all_queries  # noqa: E402

SRC = "/root/testdata/sf0.1"

DEFAULT_QUERIES = [
    "q1_pricing_summary",          # scan + hash agg
    "q9_profit_by_nation_year",    # 4-way broadcast join
    "op_sum_axis1",                # nested build + per-list reduce
    "dedup_ngram_jaccard",         # LSH-gated candidate joins
    "ev_interval_pairs",           # bucket-confined self-join
    "ev_funnel",                   # min-cascade conditional aggs
    "text_pack_sequences",         # per-source window cumsum
    "sim_kmeans",                  # iterative, driver-held centroids
    "dedup_fuzzy_reps",            # exact-dup gate (near-dup-heavy corpora)
    "sketch_cms_heavy_hitters",    # bounded sketch state
    "text_contamination",          # broadcast benchmark side
    "io_snapshot_merge",           # MERGE upsert: stat-pruned file rewrites
    "io_snapshot_sync",            # 3-family sync MERGE (r9): region-gated rewrites
    "sim_pq",                      # IVF-PQ: ADC ranking + exact re-score
    "io_snapshot_ddl",             # SQL DDL lifecycle by catalog name
]

# per-table (key column -> per-replica offset) so joins/groups see N x
# the key cardinality, not N copies of the same keys
KEYED = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
COPY = ["part", "supplier", "nation", "region"]  # dims stay as-is


def materialize(spark, rep: int) -> str:
    out = f"/tmp/dakspark_scale_{rep}x"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    for name, offsets in KEYED.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for r in range(rep):
            df = src
            for col, off in offsets.items():
                df = df.withColumn(col, F.col(col) + F.lit(r * off))
            parts.append(df)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    for name in COPY:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{name}.parquet")
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("bench_scaling")
    qs = all_queries()
    big_dir = materialize(spark, rep)

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out = {}
    for name in names:
        run(name, SRC)  # warm
        t1 = min(run(name, SRC), run(name, SRC))
        tn = min(run(name, big_dir), run(name, big_dir))
        out[name] = {"t1": t1, "tN": tn, "ratio": round(tn / max(t1, 1e-9), 1)}
    print(json.dumps({"rep": rep, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
