"""Sketch-based approximate analytics queries (capability uplift — the
reference has no sketch surface, SURVEY §2.6's reducers are all exact).

Two oracle disciplines, mirroring functions/sketches.py:

- ``sketch_kmv_distinct``: the sketch itself is DETERMINISTIC (seeded-md5
  k-minimum-values), so the DuckDB oracle replicates the construction
  bit-for-bit — same cross-engine-md5 discipline as the MinHash family.
- ``sketch_cms_heavy_hitters``: the count-min sketch only gates the
  candidate set (CMS never under-counts); the output is exact, so the
  oracle is plain exact SQL. The sketch changes the 100 TB cost profile
  (bounded depth*width aggregation state + broadcast semi-join instead of
  an unbounded-cardinality exact groupBy), never the answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import textstats as tx
from ..functions.sketches import heavy_hitters_exact_via_cms, kmv_distinct
from ..sources.tables import load_table

KMV_K = 256
HH_THRESHOLD = 100
CMS_DEPTH = 3
CMS_WIDTH = 64


def sketch_kmv_distinct(spark, sf_dir):
    """KMV distinct-count of lineitem.l_orderkey next to the exact count.
    Everything (k-th hash, the estimate, the exact) is deterministic, so
    the whole row is value-hash-checked against the oracle.

    One scan, one shuffle: the deduped-key frame (the shared prefix of
    both the exact count and the sketch) is persisted and both consumers
    aggregate it — vs the naive two-full-scan plan (separate
    countDistinct + hash/distinct/top-k). At 100 TB the raw scan
    dominates; sharing it halves IO. Cache lifetime is pinned to the
    result frame (core.pin_cache_to_result)."""
    from pyspark import StorageLevel

    from ..core import pin_cache_to_result

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        li.select("l_orderkey").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    )
    kmv = kmv_distinct(keys, "l_orderkey", k=KMV_K)
    exact = keys.agg(F.count(F.lit(1)).alias("exact_distinct"))
    out = kmv.crossJoin(exact).select(
        F.col("n_seen").cast("bigint").alias("n_seen"),
        F.round(F.col("kth_hash") * 1e6).cast("bigint").alias("kth_hash_micro"),
        F.round(F.col("est") * 1e6).cast("bigint").alias("est_micro"),
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
    )
    return pin_cache_to_result(keys, out)


# DuckDB twin of uniform_hash: CAST('0x'||substr(md5(v),1,15) AS BIGINT)
# / 16.0^15 — verified to parse identically to Spark's conv(...,16,10).
SKETCH_KMV_SQL = f"""
WITH mins AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
         / (16.0 ^ 15) AS h
  FROM lineitem ORDER BY h LIMIT {KMV_K}
), s AS (
  SELECT count(*) AS n_seen, max(h) AS kth_hash,
         CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
              ELSE {KMV_K - 1}.0 / max(h) END AS est
  FROM mins
)
SELECT CAST(n_seen AS BIGINT) AS n_seen,
       CAST(round(kth_hash * 1e6) AS BIGINT) AS kth_hash_micro,
       CAST(round(est * 1e6) AS BIGINT) AS est_micro,
       (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS exact_distinct
FROM s
"""


def sketch_cms_heavy_hitters(spark, sf_dir):
    """Tokens with exact count >= threshold, found via a CMS gate (exact
    output — see module docstring). Token stream matches the dedup
    family's trim+lower+whitespace tokenization."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("tk"))
    return heavy_hitters_exact_via_cms(
        toks, "tk", HH_THRESHOLD, depth=CMS_DEPTH, width=CMS_WIDTH
    ).select(F.col("key"), F.col("n").cast("bigint").alias("n"))


SKETCH_CMS_HH_SQL = rf"""
WITH t AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                            t -> t != '')) AS tk
  FROM documents
)
SELECT tk AS key, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY tk HAVING count(*) >= {HH_THRESHOLD}
"""


def sketch_hll_accuracy(spark, sf_dir):
    """Native JVM HyperLogLog (Datasketches ``hll_sketch_agg`` — mergeable
    map-side partials, 2^lg_k registers of state regardless of
    cardinality). The sketch value itself is engine-specific, so the
    checked output is the EXACT count plus a Spark-side accuracy
    assertion: the HLL estimate must land within 5% of exact (standard
    error at lg_k=12 is ~1.6%, so 5% is a stable margin, not a flaky
    tolerance). One scan: exact and sketch aggregate together."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("exact_distinct"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", F.lit(12))).alias("est"),
    )
    return agg.select(
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            < 0.05
        ).alias("within_5pct"),
    )


SKETCH_HLL_SQL = """
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
       true AS within_5pct
FROM lineitem
"""


def sketch_quantile_accuracy(spark, sf_dir):
    """Approximate quantiles (Spark's GK/KLL-style ``percentile_approx``
    — bounded sketch state, map-side mergeable, vs the exact
    ``percentile`` which buffers values per group). Same discipline as
    the HLL query: the checked output is the EXACT interpolated median
    (both engines use the linear-interpolation definition, compared in
    cents) plus Spark-side assertions that the approx answers land
    within 1% relative error at accuracy=10000. Exact and approx
    aggregate in one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap_med"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("ap_p95"),
    )
    ok = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e) < 0.01)  # noqa: E731
    return agg.select(
        F.round(F.col("exact_med") * 100).cast("bigint").alias("exact_med_c"),
        F.round(F.col("exact_p95") * 100).cast("bigint").alias("exact_p95_c"),
        ok("ap_med", "exact_med").alias("med_within_1pct"),
        ok("ap_p95", "exact_p95").alias("p95_within_1pct"),
    )


SKETCH_QUANTILE_SQL = """
SELECT CAST(round(quantile_cont(l_extendedprice, 0.5) * 100) AS BIGINT) AS exact_med_c,
       CAST(round(quantile_cont(l_extendedprice, 0.95) * 100) AS BIGINT) AS exact_p95_c,
       true AS med_within_1pct,
       true AS p95_within_1pct
FROM lineitem
"""


QUERIES = {
    "sketch_kmv_distinct": sketch_kmv_distinct,
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
    "sketch_hll_accuracy": sketch_hll_accuracy,
    "sketch_quantile_accuracy": sketch_quantile_accuracy,
}

ORACLES = {
    "sketch_kmv_distinct": SKETCH_KMV_SQL,
    "sketch_cms_heavy_hitters": SKETCH_CMS_HH_SQL,
    "sketch_hll_accuracy": SKETCH_HLL_SQL,
    "sketch_quantile_accuracy": SKETCH_QUANTILE_SQL,
}
