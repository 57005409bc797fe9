"""Sketch algorithms for approximate analytics at scale.

Capability uplift over the reference (dask-awkward has no sketch surface;
its users fall back to exact reductions — lib/reducers.py). Three tiers:

- **Deterministic, oracle-exact sketches** (KMV distinct count, count-min
  sketch): built from seeded md5 hashes, so a DuckDB oracle can replicate
  the construction bit-for-bit — same discipline as the MinHash-LSH dedup
  family (queries/dedup.py).
- **Approximate-gate / exact-verify composition** (CMS heavy hitters):
  the sketch only *bounds the candidate set* (CMS never under-counts);
  the final answer is exact, so the oracle is plain exact SQL. This is
  the scale pattern: the exact vocabulary aggregation keeps per-key state
  for the FULL key universe, while the CMS pass keeps depth x width
  counters regardless of cardinality — at 100 TB the gate turns an
  unbounded-state groupBy into a bounded-state one plus a broadcast
  semi-join for the (small) candidate set.
- **Native JVM sketches** (HyperLogLog via ``hll_sketch_agg``): Spark's
  own Datasketches-backed aggregates — mergeable across partitions,
  the right tool when cross-engine determinism is not required.

All hash math stays in whole-stage codegen (md5/conv/pmod are JVM
expressions); nothing here touches Python row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits — fits a signed 64-bit integer exactly, and both
# Spark's conv(x, 16, 10) and DuckDB's CAST('0x' || x AS BIGINT) parse it
# identically (verified: 57446577476672362 for md5('a')[:15] in both).
_HASH_SPAN = float(16 ** 15)


def uniform_hash(col: Column, seed: int | None = None) -> Column:
    """Deterministic uniform draw in [0, 1) from a value (+ optional seed).

    DuckDB twin: ``CAST(('0x' || substr(md5(<expr>), 1, 15)) AS BIGINT)
    / 16.0^15``.
    """
    s = F.col(col) if isinstance(col, str) else col
    keyed = s if seed is None else F.concat(F.lit(f"{seed}|"), s)
    return (
        F.conv(F.substring(F.md5(keyed.cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(_HASH_SPAN)
    )


def bucket_hash(col: Column, width: int, seed: int) -> Column:
    """Deterministic bucket id in [0, width) — one CMS row's hash."""
    s = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|"), s.cast("string")).cast("binary")), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def kmv_distinct(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002).

    Keep the k smallest *distinct* uniform hashes; if fewer than k distinct
    values exist the count is exact, otherwise estimate (k-1) / h_(k), the
    k-th smallest hash. Returns one row:
    ``(n_seen bigint, kth_hash double, est double)``.

    Scale shape: hash is a row-local expression; the distinct is one hash
    shuffle whose output feeds TakeOrdered(k) (Spark rewrites
    ``orderBy(...).limit(k)`` into per-partition top-k + driver merge — no
    global sort). State beyond the shuffle is k doubles. The sketch is
    mergeable: union the k-minima of two frames and re-take k.
    """
    return kmv_estimate_from(kmv_minima(df, col, k), k)


def kmv_minima(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """The raw sketch state: the k smallest distinct uniform hashes as a
    1-column frame ``h``. This is the mergeable representation —
    :func:`kmv_union` combines two of them; :func:`kmv_estimate_from`
    turns one into the estimate row."""
    h = uniform_hash(col)
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_union(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union of two KMV sketches (the sketch of the union of the inputs):
    pool both minima sets, dedup, re-take the k smallest. Associative and
    commutative, so partial sketches built per partition/day/source merge
    into a corpus-wide estimate without re-reading the raw data."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate_from(minima: DataFrame, k: int = 256) -> DataFrame:
    """Estimate row ``(n_seen, kth_hash, est)`` from a k-minima frame."""
    return minima.agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth_hash"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.max("h"))
        .alias("est"),
    )


def cms_table(
    df: DataFrame, col: str | Column, depth: int = 3, width: int = 64
) -> DataFrame:
    """Count-min sketch as a (seed, bucket, cnt) table of depth*width rows.

    One explode of ``depth`` (seed, bucket) structs per input row, then a
    single hash aggregate — state is bounded by depth*width counters no
    matter the key cardinality (the point of the sketch at 100 TB).
    Equivalent in spirit to Spark's native ``count_min_sketch()`` aggregate
    but kept as a transparent table so estimates stay whole-stage-codegen
    joins instead of driver-side binary decoding.
    """
    s = F.col(col) if isinstance(col, str) else col
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("seed"), bucket_hash(s, width, d).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("sb"))
        .groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    keys: DataFrame,
    key_col: str,
    cms: DataFrame,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """CMS point estimates for each row of ``keys``: min over the sketch's
    rows of the hashed bucket's counter. The sketch table (depth*width
    rows) is broadcast; the probe is ``depth`` broadcast-join lookups fused
    into one by exploding the key's (seed, bucket) pairs. Estimates are
    always >= the true count (CMS never under-counts) — the property the
    heavy-hitter gate relies on."""
    s = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("seed"), bucket_hash(s, width, d).alias("bucket"))
            for d in range(depth)
        ]
    )
    probed = keys.select(key_col, F.explode(pairs).alias("sb")).join(
        F.broadcast(cms),
        (F.col("sb.seed") == F.col("seed")) & (F.col("sb.bucket") == F.col("bucket")),
        "left",
    )
    return probed.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


def heavy_hitters_exact_via_cms(
    df: DataFrame,
    col: str | Column,
    threshold: int,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Exact keys-with-count>=threshold, computed with a CMS gate.

    Pass 1 builds the bounded-state sketch; candidate keys are those whose
    CMS estimate clears the threshold (a superset of the truth, since CMS
    over-counts). Pass 2 re-counts ONLY rows whose key is in the candidate
    set (broadcast semi-join) and applies the exact threshold. Output is
    exactly the true heavy hitters — the sketch affects cost, never the
    answer. Returns ``(key, n)``.
    """
    from pyspark import StorageLevel

    from ..core import pin_cache_to_result

    s = (F.col(col) if isinstance(col, str) else col).alias("key")
    # three consumers (sketch build, candidate estimate, exact recount) —
    # persist the key stream once so an expensive upstream (e.g. a
    # tokenizing explode) isn't recomputed per pass; lifetime is scoped to
    # the result frame (core.pin_cache_to_result), no module state
    vals = df.select(s).persist(StorageLevel.MEMORY_AND_DISK)
    cms = cms_table(vals, "key", depth, width)
    cand = (
        cms_estimates(vals.distinct(), "key", cms, depth, width)
        .filter(F.col("cms_est") >= threshold)
        .select("key")
    )
    out = (
        vals.join(F.broadcast(cand), "key", "semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )
    return pin_cache_to_result(vals, out)


def hll_distinct(df: DataFrame, col: str | Column, lg_k: int = 12) -> DataFrame:
    """Native Datasketches HLL estimate: one row ``(est bigint)``.

    The JVM sketch is mergeable across partitions (partial aggregation
    map-side); use this over KMV when cross-engine reproducibility is not
    needed. ``lg_k`` trades memory (2^lg_k registers) for accuracy."""
    s = F.col(col) if isinstance(col, str) else col
    return df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(s, F.lit(lg_k))).alias("est")
    )
