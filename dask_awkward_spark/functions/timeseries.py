"""General time-series operators: as-of join, bounded range join,
hypertable-style cascading rollups.

Capability uplift over the reference (dask-awkward has no temporal join
surface at all); the shapes here generalize the oracle-checked event
queries (queries/timeseries.py) into a reusable library API. All three
are compositions of built-in DataFrame ops — no UDFs, no range-join
BroadcastNestedLoopJoin:

- :func:`asof_join` — tagged union + one running ``last(ignorenulls)``
  window per by-key: ONE shuffle on the by-keys, never a range join.
- :func:`range_join` — time-bucket equi-join probing two adjacent
  buckets; quadratic work is confined to (by-key, bucket) cells.
- :func:`rollup_cascade` — aggregate the finest granularity from raw
  data ONCE, then re-aggregate each coarser level from the previous
  level (sums of sums); at 100 TB every level after the first reads
  rollup-sized input instead of re-scanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import local_frame


def _epoch_us(col: Column) -> Column:
    """Microsecond epoch of a timestamp column (NTZ normalized through an
    instant cast — wall-clock-preserving under a UTC session zone, which
    the events loader pins)."""
    return F.unix_micros(col.cast("timestamp"))


def time_bucket_sec(col: Column, width_seconds: int) -> Column:
    """Bucket start (epoch seconds, bigint) for a timestamp column —
    integer math throughout, so microsecond-aligned inputs can never
    straddle a double-rounding edge. DuckDB twin:
    ``(epoch_us(ts) // (width*1000000)) * width``."""
    w_us = int(width_seconds) * 1_000_000
    # bigint div keeps the math exact; a double division could flip the
    # floor at exact bucket boundaries
    return (_epoch_us(col) - F.pmod(_epoch_us(col), F.lit(w_us))) / F.lit(1_000_000)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: "str | list[str] | None" = None,
    direction: str = "backward",
    tolerance: "float | None" = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """LEFT as-of join: for each left row, the temporally closest right
    row at-or-before (``backward``) / at-or-after (``forward``) its
    ``on`` timestamp, optionally within ``tolerance`` seconds.

    ``on`` may be any orderable column type; ``tolerance`` (a seconds
    delta) additionally requires ``on`` to be a timestamp.

    Scale shape: union the two sides with a tag, then ONE running
    ``last(ignorenulls)`` window partitioned by ``by`` — a single shuffle
    on the by-keys regardless of corpus size; never a range join. This is
    the same plan the oracle-checked ``ev_asof_join`` query uses
    (queries/timeseries.py), generalized to arbitrary schemas.

    Matched right columns are carried as ONE struct through the window
    (two independent windows would desync on nulls) and re-emitted with
    ``right_prefix``. When several right rows share the as-of instant,
    the struct's natural ordering breaks the tie deterministically
    (field-order lexicographic — the max struct wins in both directions).

    With ``by=None`` there is no key to partition the window on, and a
    naive ``Window.partitionBy()`` would move BOTH frames through ONE
    partition. Instead the keyless path range-partitions the tagged
    union on the scan order, runs the running-``last`` window *per range
    partition* (fully parallel), and patches the carry across partition
    boundaries: the per-partition final right value (one row per shuffle
    partition — a bounded driver-side collect, same contract as the
    divisions probe in ``compat.py``) is prefix-scanned on the driver
    and broadcast-joined back so rows whose partition saw no earlier
    right row inherit the previous partition's last value. Identical
    semantics to one global window, no single-partition stage.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    rcols = [c for c in right.columns if c != on and c not in by_cols]
    lcols = [c for c in left.columns]

    rv = F.struct(F.col(on).alias("__asof_on__"), *[F.col(c) for c in rcols])
    tagged_r = right.select(
        *by_cols,
        F.col(on).alias("__t__"),
        F.lit(0).alias("__side__"),
        rv.alias("__rv__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}__") for c in lcols],
    )
    tagged_l = left.select(
        *by_cols,
        F.col(on).alias("__t__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(tagged_r.schema["__rv__"].dataType).alias("__rv__"),
        *[F.col(c).alias(f"__l_{c}__") for c in lcols],
    )
    from pyspark.sql import Window

    if direction == "backward":
        # rights sort before lefts at the same instant (inclusive >=);
        # among same-instant rights, ascending struct -> last() = max
        sort_exprs = [F.col("__t__").asc(), F.col("__side__").asc(), F.col("__rv__").asc()]
    else:
        # scan from the future backwards; rights still precede lefts at
        # the same instant so ts <= ts' stays inclusive
        sort_exprs = [F.col("__t__").desc(), F.col("__side__").asc(), F.col("__rv__").asc()]
    union = tagged_r.unionByName(tagged_l)

    if by_cols:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(*sort_exprs)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = union.select("*", F.last("__rv__", ignorenulls=True).over(w).alias("__m__"))
    else:
        merged = _keyless_running_last(union, sort_exprs, direction)
    out = merged.filter(F.col("__side__") == 1)

    matched = F.col("__m__")
    if tolerance is not None:
        tol_us = int(float(tolerance) * 1_000_000)
        delta = _epoch_us(F.col("__t__")) - _epoch_us(matched["__asof_on__"])
        if direction == "forward":
            delta = -delta
        matched = F.when(delta <= tol_us, F.col("__m__"))

    return out.select(
        *[F.col(f"__l_{c}__").alias(c) for c in lcols],
        matched["__asof_on__"].alias(f"{right_prefix}{on}"),
        *[matched[c].alias(f"{right_prefix}{c}") for c in rcols],
    )


def _keyless_running_last(union: DataFrame, sort_exprs: list, direction: str) -> DataFrame:
    """Global running ``last(__rv__, ignorenulls)`` in ``sort_exprs`` order
    WITHOUT a single-partition window.

    1. ``repartitionByRange`` on the scan order: partition boundaries
       follow the global sort, so global order == (pid, within-pid order).
       The layout is PINNED with ``pin_layout`` (localCheckpoint) before
       pids are stamped — the carry collect below and every later job
       must see the same partition boundaries, and a cached-or-recomputed
       shuffle plan can re-sample different range bounds per execution.
    2. The running last *within* each range partition is a window
       partitioned by ``spark_partition_id()`` — every partition works in
       parallel.
    3. The carry across partition boundaries: each partition's final
       running-last value (taken at its last row in scan order via
       ``max_by`` on the within-partition row number — no assumptions
       about the ``on`` column's type) is ONE row per shuffle partition;
       collect that bounded frame to the driver (same contract as the
       divisions probe in compat.py), prefix-scan it, and broadcast-join
       the carry-in back by pid.

    Equal sort keys always land in one range partition, so the within-pid
    tie-break matches the global window's semantics exactly.
    """
    from pyspark.sql import Window

    from ..core import pin_layout

    spark = union.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = pin_layout(union.repartitionByRange(n_parts, *sort_exprs)).withColumn(
        "__pid__", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid__")
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "*",
        F.last("__rv__", ignorenulls=True).over(w).alias("__lm__"),
        F.row_number().over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias(
            "__rn__"
        ),
    )
    # per-pid final carry = the last scan-order row's running last —
    # direction- and type-agnostic (works for timestamp, bigint, any
    # orderable `on`), unlike a cast-to-epoch key
    per_pid = local.groupBy("__pid__").agg(F.max_by("__lm__", "__rn__").alias("__last__"))
    rows = sorted(per_pid.collect(), key=lambda r: r["__pid__"])  # bounded: <= n_parts rows
    carry_rows, prev = [], None
    last_by_pid = {r["__pid__"]: r["__last__"] for r in rows if r["__last__"] is not None}
    for pid in range(n_parts):
        if prev is not None:
            carry_rows.append((pid, prev))
        if pid in last_by_pid:
            prev = last_by_pid[pid]
    rv_type = union.schema["__rv__"].dataType
    from pyspark.sql import types as T

    carry_schema = T.StructType(
        [T.StructField("__pid__", T.IntegerType()), T.StructField("__carry__", rv_type)]
    )
    if carry_rows:
        carry = F.broadcast(local_frame(spark, carry_rows, carry_schema))
        patched = local.join(carry, "__pid__", "left")
    else:
        patched = local.withColumn("__carry__", F.lit(None).cast(rv_type))
    return patched.select(
        *[c for c in union.columns],
        F.coalesce(F.col("__lm__"), F.col("__carry__")).alias("__m__"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: "str | list[str]",
    on: str = "ts",
    lower: float = 0.0,
    upper: float = 60.0,
) -> DataFrame:
    """Pairs (l, r) with by-key equality and ``r.on - l.on`` in
    ``[lower, upper]`` seconds — as an EQUI-join, never a
    BroadcastNestedLoopJoin range join.

    Each left row's admissible window spans at most 2 buckets of width
    ``upper - lower``, so the left side explodes into <=2 bucket keys, the
    join is ``(by, bucket)`` hash equality, and the exact range predicate
    filters inside matched cells. Quadratic work is confined to one
    (by-key, bucket) cell — the generalization of the oracle-checked
    ``ev_interval_pairs`` burst detector. Right columns are suffixed
    ``_r`` on name collisions.
    """
    if not upper > lower:
        raise ValueError(f"need upper > lower, got [{lower}, {upper}]")
    by_cols = [by] if isinstance(by, str) else list(by)
    w_us = max(int((upper - lower) * 1_000_000), 1)
    lo_us = int(lower * 1_000_000)
    up_us = int(upper * 1_000_000)

    lsec = _epoch_us(F.col(on))
    lbuckets = F.array_distinct(
        F.array(
            (((lsec + lo_us) - F.pmod(lsec + lo_us, F.lit(w_us))) / F.lit(w_us)).cast("bigint"),
            (((lsec + up_us) - F.pmod(lsec + up_us, F.lit(w_us))) / F.lit(w_us)).cast("bigint"),
        )
    )
    # by-keys keep their names (equi-join dedups them); other right
    # columns get a _r suffix on collision
    rname = {
        c: (c if c in by_cols or c not in left.columns else f"{c}_r")
        for c in right.columns
    }
    l_t = left.select(
        "*",
        lsec.alias("__lus__"),
        F.explode(lbuckets).alias("__bk__"),
    )
    rsec = _epoch_us(F.col(on))
    r_t = right.select(
        *[F.col(c).alias(rname[c]) for c in right.columns],
        rsec.alias("__rus__"),
        ((rsec - F.pmod(rsec, F.lit(w_us))) / F.lit(w_us)).cast("bigint").alias("__bk__"),
    )
    joined = l_t.join(r_t, [*by_cols, "__bk__"])
    delta = F.col("__rus__") - F.col("__lus__")
    return joined.filter((delta >= lo_us) & (delta <= up_us)).drop(
        "__bk__", "__lus__", "__rus__"
    )


def rollup_cascade(
    df: DataFrame,
    ts: str,
    metrics: "list[tuple[str, str, str]]",
    levels: "list[int]",
) -> DataFrame:
    """Multi-granularity rollup: aggregate the finest level from raw rows
    once, then derive every coarser level from the level below it —
    the hypertable continuous-aggregate pattern. ``metrics`` is
    ``(out_name, column, op)`` with re-aggregable ops ``sum|count|min|max``
    (count re-aggregates as sum). ``levels`` are bucket widths in seconds,
    ascending; each must divide the next so coarser buckets are exact
    unions of finer ones. Returns the union of all levels:
    ``(gran bigint, bucket bigint, <metrics...>)`` with ``bucket`` the
    bucket start in epoch seconds.
    """
    ok = {"sum", "count", "min", "max"}
    bad = [m for m in metrics if m[2] not in ok]
    if bad:
        raise ValueError(f"re-aggregable ops only ({sorted(ok)}), got {bad}")
    for a, b in zip(levels, levels[1:]):
        if b % a != 0:
            raise ValueError(f"each level must divide the next: {a} !| {b}")

    g0 = levels[0]
    base_aggs = []
    for name, col, op in metrics:
        if op == "count":
            base_aggs.append(F.count(col).alias(name))
        else:
            base_aggs.append(getattr(F, op)(col).alias(name))
    cur = (
        df.select(time_bucket_sec(F.col(ts), g0).cast("bigint").alias("bucket"), *(
            [F.col(c) for c in dict.fromkeys(m[1] for m in metrics)]
        ))
        .groupBy("bucket")
        .agg(*base_aggs)
    )
    # materialize the finest level ONCE: every union branch embeds this
    # subtree, and without the persist each level's branch re-scans the
    # raw corpus (AQE stage reuse is runtime-best-effort, not guaranteed
    # — the static plan showed 3 raw scans for 3 levels). The persisted
    # frame is rollup-sized, tiny next to raw; its lifetime is scoped to
    # the result via pin_cache_to_result.
    from pyspark import StorageLevel

    cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
    pinned = cur
    out = cur.select(F.lit(g0).cast("bigint").alias("gran"), "*")
    for g in levels[1:]:
        re_aggs = [
            (F.sum(name) if op in ("sum", "count") else getattr(F, op)(name))
            .cast("bigint" if op == "count" else cur.schema[name].dataType.simpleString())
            .alias(name)
            for name, _c, op in metrics
        ]
        cur = (
            cur.groupBy(
                ((F.col("bucket") - F.pmod(F.col("bucket"), F.lit(g)))).alias("bucket")
            )
            .agg(*re_aggs)
        )
        out = out.unionByName(cur.select(F.lit(g).cast("bigint").alias("gran"), "*"))
    from ..core import pin_cache_to_result

    return pin_cache_to_result(pinned, out)


def sessionize(
    df: DataFrame,
    by: "str | list[str]",
    on: str = "ts",
    gap: float = 1800.0,
    tie_break: "list[str] | None" = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: rows of the same ``by`` key whose ``on``
    timestamps are within ``gap`` seconds of the previous row share a
    session; a longer silence opens the next one. Adds ``out_col``
    (1-based session index per key) — the batch twin of Spark's
    streaming ``session_window`` and the generalization of the
    oracle-checked ``ev_sessionize`` query (queries/events.py).

    Scale shape: ONE window partitioned by the ``by`` keys (lag + running
    sum ride the same shuffle). ``by`` is REQUIRED non-empty: keyless
    sessionization is inherently sequential (every row's session index
    depends on all earlier rows), and a keyless window would funnel the
    corpus through one partition — pass a coarse logical key (tenant,
    day) if global sessions are really wanted. ``tie_break`` columns
    break ordering ties deterministically (e.g. an event id).

    Comparisons run at microsecond precision (``unix_micros``) —
    whole-second truncation disagrees with exact engines at the gap
    boundary.
    """
    from pyspark.sql import Window

    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError(
            "sessionize requires non-empty `by` keys: keyless sessionization is "
            "sequential and would funnel all rows through one partition; "
            "use a coarse logical key instead"
        )
    w = Window.partitionBy(*by_cols).orderBy(on, *(tie_break or []))
    gap_us = int(float(gap) * 1_000_000)
    prev = F.lag(on).over(w)
    new_sess = F.when(
        prev.isNull() | (_epoch_us(F.col(on)) - _epoch_us(prev) > gap_us), 1
    ).otherwise(0)
    return df.withColumn(out_col, F.sum(new_sess).over(w))
