"""Type-system edge mappings (SURVEY §1.2 / §7.4): the awkward layout
nodes Spark has no first-class type for.

- **uint64** → `DecimalType(20, 0)` (Spark's LongType overflows above
  2^63-1; decimal holds the full unsigned range).
- **UnionArray** (tagged heterogeneous union) → tagged struct
  ``struct<tag: int, v0: T0, v1: T1, ...>`` with exactly one non-null
  variant. `union_encode` builds it from a tag + variant columns;
  `union_map` applies per-variant expressions; `union_tag`/`union_project`
  inspect it. (The reference enumerates UnionArray handling in
  lib/unproject_layout.py:290-311.)
- **categorical** (`__array__: "categorical"`, lib/str.py:867-879) →
  dictionary table + integer codes: `categorical_encode` returns
  (codes_df, dictionary_df); `categorical_decode` joins codes back.
  At scale the dictionary is broadcast — the classic dictionary-encoding
  join.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .session import local_frame


def uint64_to_decimal(col: Column) -> Column:
    """Lossless uint64 carrier (LongType would overflow past 2^63-1)."""
    return col.cast("decimal(20,0)")


# ---------------- tagged unions ----------------

def union_encode(tag: Column, variants: Sequence[Column]) -> Column:
    """Build struct<tag, v0..vk-1>: variant i is populated where tag==i."""
    fields = [tag.cast("int").alias("tag")]
    for i, v in enumerate(variants):
        fields.append(F.when(tag == i, v).alias(f"v{i}"))
    return F.struct(*fields)


def union_tag(u: Column) -> Column:
    return u["tag"]


def union_project(u: Column, i: int) -> Column:
    """Variant i's value (null where the tag differs)."""
    return u[f"v{i}"]


def union_map(u: Column, fns: Sequence[Callable[[Column], Column]]) -> Column:
    """Apply fns[i] to variant i, merging to one output column — the
    restricted-ops story for unions: results must share a common type."""
    out = None
    for i, fn in enumerate(fns):
        branch = fn(u[f"v{i}"])
        out = F.when(u["tag"] == i, branch) if out is None else out.when(u["tag"] == i, branch)
    return out


# ---------------- categorical (dictionary encoding) ----------------

def categorical_encode(df: DataFrame, col: str) -> tuple[DataFrame, DataFrame]:
    """Returns (df with ``{col}_code`` int column, dictionary DataFrame
    ``[code, value]``). Codes are assigned deterministically by value
    order so encode is reproducible across runs/partitionings.

    Code assignment is scale-safe for high-cardinality dictionaries: a
    global ``row_number`` window would sort the whole dictionary in ONE
    partition, so instead the distinct values are range-partitioned
    (boundaries follow the global value order), ranked *within* each
    partition in parallel, and shifted by per-partition offsets — the
    prefix sum of partition sizes, computed from a bounded driver-side
    collect of one count per shuffle partition (same contract as the
    divisions probe in compat.py). code = offset[pid] + local_rank - 1
    is exactly the global dense rank.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    values = (
        df.select(F.col(col).alias("value"))
        .filter(F.col(col).isNotNull())  # nulls stay null-coded, not a category
        .distinct()
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # PIN the layout (localCheckpoint) before stamping pids: the count job
    # below and every later consumer of `coded`/`dictionary` must see the
    # SAME partition boundaries, and a re-executed range shuffle can
    # re-sample different bounds (a mere persist can be evicted or be
    # dropped with one of the two returned frames, desyncing codes from
    # the collected offsets)
    from .core import pin_layout

    ranged = pin_layout(
        values.repartitionByRange(n_parts, F.col("value").asc())
    ).withColumn("__pid__", F.spark_partition_id())
    counts = {
        r["__pid__"]: r["n"]
        for r in ranged.groupBy("__pid__").agg(F.count(F.lit(1)).alias("n")).collect()
    }  # bounded: <= n_parts rows
    offs, acc = [], 0
    for pid in range(n_parts):
        offs.append((pid, acc))
        acc += counts.get(pid, 0)
    off = F.broadcast(local_frame(spark, offs, "__pid__ int, __off__ bigint"))
    local_rank = F.row_number().over(Window.partitionBy("__pid__").orderBy("value"))
    dictionary = (
        ranged.withColumn("__rk__", local_rank)
        .join(off, "__pid__")
        .select((F.col("__off__") + F.col("__rk__") - 1).cast("int").alias("code"), "value")
    )
    # join through renamed internal columns so caller columns named
    # 'value'/'code' survive
    d2 = dictionary.select(
        F.col("code").alias("__cat_code__"), F.col("value").alias("__cat_value__")
    )
    coded = (
        df.join(F.broadcast(d2), df[col] == d2.__cat_value__, "left")
        .drop("__cat_value__")
        .withColumnRenamed("__cat_code__", f"{col}_code")
    )
    return coded, dictionary


def categorical_decode(coded: DataFrame, dictionary: DataFrame, code_col: str, out_col: str) -> DataFrame:
    """Inverse of encode: broadcast-join codes back to values."""
    d2 = dictionary.select(
        F.col("code").alias("__cat_code__"), F.col("value").alias("__cat_value__")
    )
    return (
        coded.join(F.broadcast(d2), coded[code_col] == d2.__cat_code__, "left")
        .withColumnRenamed("__cat_value__", out_col)
        .drop("__cat_code__")
    )
