"""Skew- and scale-management helpers for the 100 TB path.

AQE handles moderate skew (``spark.sql.adaptive.skewJoin``); these helpers
cover the patterns AQE can't fix by itself:

- ``salted_join``: explode a hot build-side key into ``salt`` replicas so a
  single pathological key spreads across tasks (classic salting).
- ``salted_groupby_sum``: two-phase aggregation through an explicit salt
  column — Spark already does partial aggregation, but when ONE key
  dominates, the final-stage task for that key still bottlenecks; salting
  splits the final merge too.
- ``topk``: global top-k without a full sort-shuffle — Spark's
  TakeOrderedAndProject does per-partition partial top-k then merges on
  the driver; this helper just guarantees a deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: ``big`` gets a random salt
    in [0, salt); ``small`` is exploded ``salt``× so every salted key finds
    its match. Correct for 1:N joins keyed on ``key``."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports inner/left joins only: the exploded small "
            "side would emit spurious unmatched replicas under right/full outer"
        )
    b = big.withColumn("__salt__", (F.rand(seed=7) * salt).cast("int"))
    s = small.withColumn("__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = b.join(s, [key, "__salt__"], how)
    return out.drop("__salt__")


def salted_groupby_sum(
    df: DataFrame, key: str, value: str, salt: int = 16
) -> DataFrame:
    """sum(value) group by key with an intermediate salted partial: the
    shuffle key is (key, salt) so a dominant key fans out, then a second
    tiny aggregation merges the salt buckets."""
    partial = (
        df.withColumn("__salt__", (F.rand(seed=7) * salt).cast("int"))
        .groupBy(key, "__salt__")
        .agg(F.sum(value).alias("__psum__"))
    )
    return partial.groupBy(key).agg(F.sum("__psum__").alias(f"sum_{value}"))


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Deterministic global top-k: per-partition partial top-k + driver
    merge (Spark's TakeOrderedAndProject), with the caller providing a
    total order (include a unique key as the last column!)."""
    return df.orderBy(*order).limit(k)
