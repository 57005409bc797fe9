"""Structural operators — the nested-data "relational algebra".

Spark-native re-expression of the reference's structure module
(dask_awkward lib/structure.py, ~45 ops). Every op here compiles to pure
Column expressions (higher-order functions: transform/filter/aggregate/
zip_with/flatten/slice/sort_array) so Catalyst keeps pruning/pushdown and
whole-stage codegen — nothing drops to Python.

Axis convention matches awkward: axis=1 is the outermost list level,
negative counts from the innermost.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import VALUE_COL, NestedArray, Scalar, align_many, pin_layout
from ..session import local_frame
from ..schema import apply_at_depth, apply_at_depth2, bind, broadcast_binop, normalize_axis


def _col_at_axis(arr: NestedArray, axis: int) -> tuple[Column, int]:
    """Resolve axis to a wrapper depth: ops at axis k act on the list that
    sits below k-1 transform() levels."""
    ax = normalize_axis(axis, arr.depth)
    if ax < 1:
        raise ValueError("axis must address a list level (>=1) for this op")
    return arr._col, ax - 1


# ---------------- lengths / flattening ----------------

def num(arr: NestedArray, axis: int = 1) -> NestedArray | Scalar:
    """List lengths at axis (reference lib/structure.py:626-669);
    axis=0 → total row count."""
    if normalize_axis(axis, arr.depth) == 0:
        return Scalar(arr._df.agg(F.count(F.lit(1)).alias(VALUE_COL)))
    col, d = _col_at_axis(arr, axis)
    return arr._wrap(apply_at_depth(col, d, F.size))


def flatten(arr: NestedArray, axis: int | None = 1) -> NestedArray:
    """Remove one list level (reference lib/structure.py:436-451).

    axis=1 merges the outer list into rows → ``explode`` (row count
    changes); axis>=2 merges inner levels → ``F.flatten`` (row-local).
    axis=None ravels completely to a flat collection of leaves.
    """
    if axis is None:
        out = arr
        while out.depth >= 2:
            out = flatten(out, axis=2)
        if out.depth == 1:
            out = flatten(out, axis=1)
        return out
    ax = normalize_axis(axis, arr.depth)
    if ax == 1:
        df = arr.to_df().select(F.explode(F.col(VALUE_COL)).alias(VALUE_COL))
        return NestedArray(df)
    col = arr._col
    # flatten the list at level ax into the list at level ax-1; null
    # sublists act as empty (F.flatten alone would null the whole result)
    return arr._wrap(
        apply_at_depth(
            col, ax - 2, lambda c: F.flatten(F.filter(c, lambda x: x.isNotNull()))
        )
    )


def ravel(arr: NestedArray) -> NestedArray:
    """Flatten all levels (reference lib/structure.py:753-772)."""
    return flatten(arr, axis=None)


def unflatten(arr: NestedArray, counts: NestedArray | int, axis: int = 0) -> NestedArray:
    """Regroup flat elements into lists of given counts — inverse of explode
    (reference lib/structure.py:898-922). Order-sensitive: uses the explicit
    row index (SURVEY §7.4(2)).

    axis=0: ``counts`` is a flat int collection over its own rows; the total
    must equal len(arr). Scale shape: per-partition cumulative offsets (same
    eager two-pass as ``with_row_index`` — no unpartitioned window), then
    the (lo, hi) bounds are EXPLODED into (grp, row_id) pairs via
    ``F.sequence`` and equi-joined to the data (hash join — never a
    BroadcastNestedLoopJoin range join). Output order is restored with a
    range repartition + within-partition sort on grp (parallel, no
    single-task global sort).

    axis>=1 with int ``counts``: subdivide the lists at that axis into
    fixed-size chunks — the chunking lambda is applied ``axis-1`` levels
    deep via nested ``transform()``, so ANY depth is a pure row-local
    expression (no shuffle). axis=0 with int ``counts`` chunks the rows
    themselves: grp = row_id // k, then the same grouped reassembly as the
    NestedArray-counts path. NestedArray ``counts`` is supported at axis
    0 and 1 (deeper jagged-counts broadcasting is not).
    """
    if isinstance(counts, int) and counts <= 0:
        # without this, size/0 -> NULL (non-ANSI division) and every
        # row silently becomes []; ak.unflatten raises too
        raise ValueError(f"unflatten counts must be positive, got {counts}")
    if axis == 0 and isinstance(counts, int):
        idxed = arr.with_row_index()
        out = (
            idxed._df.select(
                (F.col("__row_id__") / counts).cast("bigint").alias("grp"),
                F.struct(F.col("__row_id__").alias("i"), idxed._col.alias("x")).alias("s"),
            )
            .groupBy("grp")
            .agg(F.transform(F.array_sort(F.collect_list("s")), lambda s: s["x"]).alias(VALUE_COL))
            .repartitionByRange("grp")
            .sortWithinPartitions("grp")
            .select(VALUE_COL)
        )
        return NestedArray(out)
    if axis >= 1:
        if isinstance(counts, int):
            _col_at_axis(arr, axis)  # validates the axis addresses a list level
            k = F.lit(counts)

            def chunk(c: Column) -> Column:
                nchunk = F.ceil(F.size(c) / k).cast("int")
                # guard c.isNotNull(): a None list stays None (option-type
                # parity, same as the stepped-slice branch in core.py)
                return F.when(
                    c.isNotNull(),
                    F.transform(
                        F.when(nchunk > 0, F.sequence(F.lit(0), nchunk - 1)).otherwise(
                            F.array().cast("array<int>")
                        ),
                        lambda i: F.slice(c, i * k + 1, counts),
                    ),
                )

            return arr._wrap(apply_at_depth(arr._col, axis - 1, chunk))
        if axis != 1:
            raise NotImplementedError("NestedArray counts supported at axis 0 and 1 only")
        arr, counts = align_many([arr, counts])
        col, _ = _col_at_axis(arr, 1)
        cnts = counts._col
        # offsets[i] = sum(cnts[:i]) — expression-level cumulative sum
        offs = F.aggregate(
            cnts,
            F.array(F.lit(0).cast("bigint")),
            lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x.cast("bigint"))),
        )
        idx = F.when(F.size(cnts) > 0, F.sequence(F.lit(0), F.size(cnts) - 1)).otherwise(
            F.array().cast("array<int>")
        )
        # per-list bounds, distributed (ak.unflatten ValueError analogue):
        # counts must be non-negative and sum to the inner-list length
        guard = F.assert_true(
            F.when(
                cnts.isNotNull() & col.isNotNull(),
                (F.element_at(offs, -1) == F.size(col))
                & F.coalesce(F.array_min(cnts) >= 0, F.lit(True)),
            ).otherwise(F.lit(True)),
            F.lit(
                "unflatten: counts must be non-negative and sum to the "
                "list length at axis=1"
            ),
        )
        # bind offs ONCE as a lambda variable: it is an O(n) aggregate
        # expression, and referencing it inside the per-chunk lambda would
        # re-evaluate the whole cumulative sum per chunk (no CSE inside
        # HOF lambdas — same pitfall as rolling_hashes). col/cnts are
        # plain column references, cheap to re-reference.
        def _chunks(o: Column) -> Column:
            return F.transform(
                idx,
                lambda i: F.slice(
                    col, F.get(o, i).cast("int") + 1, F.get(cnts, i).cast("int")
                ),
            )

        return arr._wrap(
            F.when(guard.isNull(), F.get(F.transform(F.array(offs), _chunks), 0))
        )
    assert isinstance(counts, NestedArray)
    data = arr.with_row_index()
    if "__row_id__" in counts._df.columns:
        # row index already materialized -> only the cumulative sum is left
        cdf = counts._df.select(F.col("__row_id__").alias("grp"), counts._col.alias("cnt"))
        # cdf is a straight projection of with_row_index output -> already
        # contiguous in partition-id order; skip the defensive range shuffle
        bounds, total, cmin = _cumulative_offsets(cdf, "grp", "cnt", assume_contiguous=True)
    else:
        # fused single eager pass: per-partition (count, sum) collected
        # together give both the row index (grp) and the exclusive
        # cumulative offsets (lo/hi) — one Spark job instead of the two
        # that with_row_index + _cumulative_offsets would pay
        bounds, total, cmin = _row_index_and_offsets(counts._df, counts._col)
    # ak.unflatten raises ValueError on negative counts and on
    # sum(counts) != len(arr) (reference lib/structure.py:898-922, awkward
    # operations/ak_unflatten). Both facts fall out of passes we already
    # pay: min/total ride the eager per-partition offsets collect, and
    # len(arr) was stashed by with_row_index's divisions pass (one narrow
    # count job as a fallback for pre-indexed inputs).
    if cmin is not None and cmin < 0:
        raise ValueError(f"unflatten counts must be non-negative (found {cmin})")
    n_data = getattr(data._df, "_dak_len", None)
    if n_data is None:
        n_data = data._df.count()
    if total != n_data:
        raise ValueError(
            f"unflatten counts must sum to the collection length: "
            f"sum(counts)={total} != len(arr)={n_data}"
        )
    # explode bounds into one (grp, row id) pair per element; explode_outer
    # keeps zero-count groups as a null pair so they survive as empty lists
    pairs = bounds.select(
        "grp",
        F.explode_outer(
            F.when(F.col("cnt") > 0, F.sequence(F.col("lo"), F.col("hi") - 1))
        ).alias("__tgt__"),
    )
    joined = pairs.join(data._df, pairs["__tgt__"] == data._df["__row_id__"], "left")
    out = (
        joined.groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__row_id__").isNotNull(),
                            F.struct(F.col("__row_id__").alias("i"), data._col.alias("x")),
                        )
                    )
                ),
                lambda s: s["x"],
            ).alias(VALUE_COL)
        )
        .repartitionByRange("grp")
        .sortWithinPartitions("grp")
        .select(VALUE_COL)
    )
    return NestedArray(out)


def _row_index_and_offsets(df, val_col):
    """Global row index (``grp``) AND exclusive cumulative sum (``lo``/``hi``)
    of ``val_col`` in row order, paying ONE eager per-partition pass: the
    (count, sum) pair per partition is collected in a single job, then both
    offsets are applied with partition-local windows. Same scale shape as
    ``with_row_index`` + ``_cumulative_offsets`` (narrow aggregate, broadcast
    offsets back, no unpartitioned window) at half the job count."""
    from pyspark.sql import Window

    # pin the physical layout before partition-relative ids — a shuffle-fed
    # input can AQE-coalesce differently between the eager stats job and
    # the window job, desyncing offsets (same fix as with_row_index);
    # scan-only plans skip the checkpoint (pin_layout)
    w_df = pin_layout(df.select(val_col.alias("cnt"))).withColumn(
        "__mono__", F.monotonically_increasing_id()
    ).withColumn("__pid__", F.spark_partition_id())
    stats = {
        r["__pid__"]: (r["n"], r["s"], r["m"])
        for r in w_df.groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("s"), F.min("cnt").alias("m"))
        .collect()
    }
    rows, racc, vacc, vmin = [], 0, 0, None
    for pid in sorted(stats):
        rows.append((pid, racc, vacc))
        n, s, m = stats[pid]
        racc += n
        vacc += s or 0
        if m is not None and (vmin is None or m < vmin):
            vmin = m
    off_df = local_frame(
        w_df.sparkSession, rows or [(0, 0, 0)], "__pid__ int, __ro__ long, __vo__ long"
    )
    w = Window.partitionBy("__pid__").orderBy("__mono__")
    bounds = (
        w_df.withColumn("__local__", F.row_number().over(w) - 1)
        .withColumn("__run__", F.sum("cnt").over(w))
        .join(F.broadcast(off_df), "__pid__", "left")
        .withColumn("grp", F.col("__local__") + F.coalesce("__ro__", F.lit(0)))
        .withColumn("hi", F.col("__run__") + F.coalesce("__vo__", F.lit(0)))
        .withColumn("lo", F.col("hi") - F.col("cnt"))
        .select("grp", "cnt", "lo", "hi")
    )
    return bounds, vacc, vmin


def _cumulative_offsets(df, order_col: str, val_col: str, assume_contiguous: bool = False):
    """Cumulative sum of ``val_col`` in ``order_col`` order without an
    unpartitioned window: partition-local running sums + an eager
    per-partition total pass (broadcast back) — the same deliberate
    laziness break as ``with_row_index``. The required precondition —
    ``order_col`` values contiguous within partitions in partition-id
    order — is ENFORCED here with a range repartition (RangePartitioning
    assigns ranges in partition-id order), because inputs that came through
    a hash join (e.g. align_many output) interleave values across
    partitions and would silently get wrong offsets otherwise. The extra
    shuffle is on the narrow (order, count) frame only; callers that KNOW
    their input is a straight projection of with_row_index output pass
    ``assume_contiguous=True`` to skip it."""
    from pyspark.sql import Window

    if not assume_contiguous:
        df = df.repartitionByRange(order_col).sortWithinPartitions(order_col)
    # pin the layout (see _row_index_and_offsets): the range shuffle above
    # and any shuffle-fed caller input must not re-coalesce between the
    # eager totals job and the window job; scan-only plans skip the
    # checkpoint (pin_layout)
    with_pid = pin_layout(df).withColumn("__pid__", F.spark_partition_id())
    totals = {
        r["__pid__"]: (r["s"], r["m"])
        for r in with_pid.groupBy("__pid__")
        .agg(F.sum(val_col).alias("s"), F.min(val_col).alias("m"))
        .collect()
    }
    offsets, acc, vmin = {}, 0, None
    for pid in sorted(totals):
        offsets[pid] = acc
        s, m = totals[pid]
        acc += s or 0
        if m is not None and (vmin is None or m < vmin):
            vmin = m
    spark = df.sparkSession
    off_df = local_frame(
        spark,
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "__pid__ int, __off__ long",
    )
    w = Window.partitionBy("__pid__").orderBy(order_col)
    bounds = (
        with_pid.withColumn("__run__", F.sum(val_col).over(w))
        .join(F.broadcast(off_df), "__pid__", "left")
        .withColumn("hi", F.col("__run__") + F.coalesce("__off__", F.lit(0)))
        .withColumn("lo", F.col("hi") - F.col(val_col))
        .drop("__pid__", "__run__", "__off__")
    )
    return bounds, acc, vmin


# ---------------- zip / unzip / records ----------------

def zip(arrays, depth_limit: int | None = None) -> NestedArray:
    """Build a struct column from congruent arrays, broadcasting shallower
    operands into deeper lists (reference lib/structure.py:1275-1346).
    Operands from different base DataFrames are aligned first via a
    row-index equi-join (reference partition_compatibility MAYBE path).
    A list/tuple input produces tuple-record fields "0", "1", ... like
    ak.zip (reference tests test_zip_list_input/test_zip_tuple_input)."""
    if isinstance(arrays, (list, tuple)):
        arrays = {str(i): a for i, a in enumerate(arrays)}
    items = list(arrays.items())
    aligned = align_many([a for _, a in items])
    items = [(n, aligned[i]) for i, (n, _) in enumerate(items)]
    base = items[0][1]
    maxd = max(a.depth for _, a in items)
    if depth_limit is not None:
        maxd = min(maxd, depth_limit - 1)

    def build(cols: list[tuple[str, Column, int]], d: int) -> Column:
        """cols: (name, column-at-this-level, remaining list depth)."""
        if d == 0 or all(cd < 1 for _, _, cd in cols):
            return F.struct(*[c.alias(n) for n, c, _ in cols])
        deep_ix = [i for i, (_, _, cd) in enumerate(cols) if cd >= 1]
        if len(deep_ix) == 1:
            i0 = deep_ix[0]
            return F.transform(
                cols[i0][1],
                lambda x: build(
                    [
                        (n, x if i == i0 else c, cd - 1 if i == i0 else cd)
                        for i, (n, c, cd) in enumerate(cols)
                    ],
                    d - 1,
                ),
            )
        # fold all deep columns into one array of tuple-structs, then recurse
        acc = cols[deep_ix[0]][1]
        for k, i in enumerate(deep_ix[1:], start=1):
            c = cols[i][1]
            if k == 1:
                acc = F.zip_with(acc, c, lambda a, b: F.struct(a.alias("_0"), b.alias("_1")))
            else:
                acc = F.zip_with(
                    acc, c,
                    lambda a, b, k=k: F.struct(
                        *[a[f"_{j}"].alias(f"_{j}") for j in range(k)], b.alias(f"_{k}")
                    ),
                )

        def unpack(s: Column) -> Column:
            inner = []
            pos = {ix: j for j, ix in enumerate(deep_ix)}
            for i, (n, c, cd) in enumerate(cols):
                if i in pos:
                    inner.append((n, s[f"_{pos[i]}"], cd - 1))
                else:
                    inner.append((n, c, cd))
            return build(inner, d - 1)

        return F.transform(acc, unpack)

    col = build([(n, a._col, a.depth) for n, a in items], maxd)
    return NestedArray(base._df, col)


def unzip(arr: NestedArray) -> tuple[NestedArray, ...]:
    """Struct → tuple of field arrays (reference lib/structure.py:939-954).
    A non-record array unzips to a 1-tuple of itself (ak.unzip semantics,
    reference test_structure.py test_unzip_not_record)."""
    fields = arr.fields
    if not fields:
        return (arr,)
    return tuple(arr[f] for f in fields)  # type: ignore[misc]


# ---------------- option handling ----------------

def is_none(arr: NestedArray, axis: int = 0) -> NestedArray:
    """Null test at depth (reference lib/structure.py:548-557)."""
    ax = normalize_axis(axis, arr.depth)
    return arr._wrap(apply_at_depth(arr._col, ax, lambda c: c.isNull()))


def fill_none(arr: NestedArray, value: Any, axis: int | None = None) -> NestedArray:
    """Replace nulls (reference lib/structure.py:359-374). axis=None fills
    at every level."""
    lit = value._col if isinstance(value, NestedArray) else F.lit(value)
    if axis is None:
        # fill null LEAVES at every depth. A missing *list* filled with a
        # scalar would need a union type (list|scalar) — unrepresentable
        # in Spark, so missing lists are left as null (documented
        # divergence from awkward's union-producing behavior).
        def rec(c: Column, d: int) -> Column:
            if d == 0:
                return F.coalesce(c, lit)
            return F.transform(c, lambda x: rec(x, d - 1))

        return arr._wrap(rec(arr._col, arr.depth))
    ax = normalize_axis(axis, arr.depth)
    return arr._wrap(apply_at_depth(arr._col, ax, lambda c: F.coalesce(c, lit)))


def drop_none(arr: NestedArray, axis: int | None = None) -> NestedArray:
    """Remove nulls from lists (reference lib/structure.py:385-397).
    axis=None drops nulls at EVERY level: null rows, null sublists, and
    null leaves."""
    if axis is None:
        col = arr._col
        for lvl in range(arr.depth, 0, -1):
            col = apply_at_depth(
                col, lvl - 1, lambda c: F.filter(c, lambda x: x.isNotNull())
            )
        out = arr._wrap(col)
        return NestedArray(out.to_df().filter(F.col(VALUE_COL).isNotNull()))
    ax = normalize_axis(axis, arr.depth)
    if ax == 0:
        return NestedArray(arr.to_df().filter(F.col(VALUE_COL).isNotNull()))
    return arr._wrap(
        apply_at_depth(arr._col, ax - 1, lambda c: F.filter(c, lambda x: x.isNotNull()))
    )


def mask(arr: NestedArray, mask_arr: NestedArray, valid_when: bool = True) -> NestedArray:
    """Keep shape, null-out where mask invalid (reference lib/structure.py:582-597)."""
    arr, mask_arr = align_many([arr, mask_arr])
    cond = (lambda m: m) if valid_when else (lambda m: ~m)
    return arr._wrap(
        broadcast_binop(
            arr._col, mask_arr._col, arr.depth, mask_arr.depth,
            lambda x, m: F.when(cond(m), x),
        )
    )


def singletons(arr: NestedArray, axis: int = 0) -> NestedArray:
    """Option → length-0/1 lists (reference lib/structure.py:810-825)."""
    ax = normalize_axis(axis, arr.depth)
    return arr._wrap(
        apply_at_depth(
            arr._col, ax,
            lambda c: F.when(c.isNull(), F.array().cast(T.ArrayType(_leaf_type(arr, ax)))).otherwise(F.array(c)),
        )
    )


def _leaf_type(arr: NestedArray, levels: int) -> T.DataType:
    dt = arr.dtype
    for _ in range(levels):
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
    return dt


def firsts(arr: NestedArray, axis: int = 1) -> NestedArray:
    """First element of each list, null if empty — inverse of singletons
    (reference lib/structure.py:408-425)."""
    col, d = _col_at_axis(arr, axis)
    return arr._wrap(apply_at_depth(col, d, lambda c: F.get(c, 0)))


def pad_none(arr: NestedArray, target: int, axis: int = 1, clip: bool = False) -> NestedArray:
    """Pad lists with nulls to at least ``target`` (reference lib/structure.py:730-750)."""
    col, d = _col_at_axis(arr, axis)
    elem = _leaf_type(arr, d + 1)

    def pad(c: Column) -> Column:
        nulls = F.array_repeat(F.lit(None).cast(elem), F.greatest(F.lit(0), F.lit(target) - F.size(c)))
        padded = F.concat(c, nulls)
        return F.slice(padded, 1, target) if clip else padded

    return arr._wrap(apply_at_depth(col, d, pad))


# ---------------- element-wise conditionals ----------------

def where(cond: NestedArray, x: Any, y: Any) -> NestedArray:
    """Element-wise conditional (reference lib/structure.py:1004-1034)."""
    xa = x if isinstance(x, NestedArray) else None
    ya = y if isinstance(y, NestedArray) else None

    def leaf(c: Column, xv: Column, yv: Column) -> Column:
        return F.when(c, xv).otherwise(yv)

    if xa is not None and ya is not None:
        cond, xa, ya = align_many([cond, xa, ya])
        d = cond.depth
        def rec(c, xv, yv, d):
            if d == 0:
                return leaf(c, xv, yv)
            z = F.zip_with(c, xv, lambda cc, xx: F.struct(cc.alias("c"), xx.alias("x")))
            return F.zip_with(z, yv, lambda s, yy: rec(s["c"], s["x"], yy, d - 1))
        return cond._wrap(rec(cond._col, xa._col, ya._col, d))
    if xa is not None:
        cond, xa = align_many([cond, xa])
        yv = F.lit(y)
        return cond._wrap(apply_at_depth2(cond._col, xa._col, cond.depth, lambda c, xx: F.when(c, xx).otherwise(yv)))
    if ya is not None:
        cond, ya = align_many([cond, ya])
        xv = F.lit(x)
        return cond._wrap(apply_at_depth2(cond._col, ya._col, cond.depth, lambda c, yy: F.when(c, xv).otherwise(yy)))
    xv, yv = F.lit(x), F.lit(y)
    return cond._wrap(apply_at_depth(cond._col, cond.depth, lambda c: F.when(c, xv).otherwise(yv)))


def isclose(a: NestedArray, b: NestedArray, rtol: float = 1e-5, atol: float = 1e-8) -> NestedArray:
    """Approximate equality (reference lib/structure.py:508-537)."""
    a, b = align_many([a, b])
    return a._wrap(
        broadcast_binop(a._col, b._col, a.depth, b.depth,
                        lambda x, y: F.abs(x - y) <= (atol + rtol * F.abs(y)))
    )


def nan_to_num(arr: NestedArray, nan: float = 0.0) -> NestedArray:
    """Replace NaN (reference lib/structure.py:600-616)."""
    return arr._wrap(
        apply_at_depth(arr._col, arr.depth,
                       lambda c: F.when(F.isnan(c), F.lit(nan)).otherwise(c))
    )


def values_astype(arr: NestedArray, to: str | T.DataType) -> NestedArray:
    """Leaf dtype cast (reference lib/structure.py:957-976)."""
    return arr._wrap(apply_at_depth(arr._col, arr.depth, lambda c: c.cast(to)))


def full_like(arr: NestedArray, value: Any) -> NestedArray:
    """Same-shape constant (reference lib/structure.py:479-505)."""
    return arr._wrap(apply_at_depth(arr._col, arr.depth, lambda c: F.when(c.isNull(), None).otherwise(F.lit(value))))


def zeros_like(arr: NestedArray) -> NestedArray:
    return full_like(arr, 0)


def ones_like(arr: NestedArray) -> NestedArray:
    return full_like(arr, 1)


# ---------------- indices / sorting ----------------

def local_index(arr: NestedArray, axis: int = 1) -> NestedArray:
    """Per-list element indices (reference lib/structure.py:560-579)."""
    col, d = _col_at_axis(arr, axis)
    return arr._wrap(
        apply_at_depth(
            col, d,
            lambda c: F.when(F.size(c) > 0, F.sequence(F.lit(0), F.size(c) - 1))
                       .otherwise(F.array().cast("array<int>")),
        )
    )


def sort(arr: NestedArray, axis: int = -1, ascending: bool = True) -> NestedArray:
    """Sort within inner lists (reference lib/structure.py:836-857; axis=0
    is NotImplemented there — we provide global sort as uplift via sort0)."""
    col, d = _col_at_axis(arr, axis)
    return arr._wrap(apply_at_depth(col, d, lambda c: F.sort_array(c, asc=ascending)))


def sort0(arr: NestedArray, ascending: bool = True) -> NestedArray:
    """Global (axis=0) sort — capability uplift (free in Spark: orderBy)."""
    df = arr.to_df()
    return NestedArray(df.orderBy(F.col(VALUE_COL).asc() if ascending else F.col(VALUE_COL).desc()))


def argsort(arr: NestedArray, axis: int = -1, ascending: bool = True) -> NestedArray:
    """Per-list sort indices (reference lib/structure.py:187-204).

    Compiled as: zip values with local indices, array_sort by value with an
    explicit comparator, project the indices.
    """
    col, d = _col_at_axis(arr, axis)

    def ix(c: Column) -> Column:
        zipped = F.zip_with(
            c,
            F.when(F.size(c) > 0, F.sequence(F.lit(0), F.size(c) - 1)).otherwise(F.array().cast("array<int>")),
            lambda v, i: F.struct(v.alias("v"), i.alias("i")),
        )
        lt, gt = (-1, 1) if ascending else (1, -1)
        # ties broken by original index -> deterministic (stable) output
        cmp = lambda a, b: (
            F.when(a["v"].isNull() & b["v"].isNull(), a["i"] - b["i"])
            .when(a["v"].isNull(), 1)
            .when(b["v"].isNull(), -1)
            .when(a["v"] < b["v"], lt)
            .when(a["v"] > b["v"], gt)
            .otherwise(a["i"] - b["i"])
        )
        return F.transform(F.array_sort(zipped, cmp), lambda s: s["i"])

    return arr._wrap(apply_at_depth(col, d, ix))


# ---------------- combinatorics ----------------

def cartesian(arrays: list[NestedArray], axis: int = 1) -> NestedArray:
    """Per-row cross product of inner lists → list of struct tuples
    (reference lib/structure.py:254-282). Arbitrary arity at axis=1 via
    generated nested transforms (expression tree grows linearly with k,
    output quadratically+ — the user's row-width tradeoff, same as the
    reference)."""
    arrays = align_many(arrays)
    a = arrays[0]
    col, d = _col_at_axis(a, axis)
    cols = [x._col for x in arrays]
    names = [str(i) for i in range(len(arrays))]

    def prod(*lists: Column) -> Column:
        def go(i: int, elems: list[Column]) -> Column:
            if i == len(lists):
                return F.struct(*[e.alias(names[j]) for j, e in enumerate(elems)])
            return F.transform(lists[i], lambda x: go(i + 1, elems + [x]))

        nested = go(0, [])
        for _ in range(len(lists) - 1):
            nested = F.flatten(nested)
        return nested

    if d == 0:
        return a._wrap(prod(*cols))
    if len(arrays) == 2:
        return a._wrap(apply_at_depth2(cols[0], cols[1], d, prod))
    raise NotImplementedError("cartesian of >2 arrays supported at axis=1 only")


def argcartesian(arrays: list[NestedArray], axis: int = 1) -> NestedArray:
    """Index-pair variant (reference lib/structure.py:92-122)."""
    idx = [local_index(a, axis=axis) for a in arrays]
    return cartesian(idx, axis=axis)


def combinations(arr: NestedArray, n: int = 2, axis: int = 1, fields: list[str] | None = None) -> NestedArray:
    """Per-row n-choose-k combinations of one list (reference
    lib/structure.py:295-332). Arbitrary ``n`` via generated expressions:
    ``n`` nested index transforms with strictly-increasing indices
    (i0 < i1 < ... < i_{n-1}), flattened n-1 times. The expression tree
    grows linearly with n; row width grows as C(len, n) — the same
    output-size tradeoff the reference has."""
    if n < 2:
        raise ValueError("combinations requires n >= 2")
    names = fields or [str(i) for i in range(n)]
    col, d = _col_at_axis(arr, axis)

    def idx_after(c: Column, i: Column) -> Column:
        # indices strictly greater than i
        return F.when(
            F.size(c) - i - 1 > 0, F.sequence(i + 1, F.size(c) - 1)
        ).otherwise(F.array().cast("array<int>"))

    def comb(c: Column) -> Column:
        first = F.when(F.size(c) > 0, F.sequence(F.lit(0), F.size(c) - 1)).otherwise(
            F.array().cast("array<int>")
        )

        def go(level: int, prev: Column | None, chosen: list[Column]) -> Column:
            if level == n:
                return F.struct(*[F.get(c, ix).alias(names[j]) for j, ix in enumerate(chosen)])
            rng = first if level == 0 else idx_after(c, prev)
            return F.transform(rng, lambda i: go(level + 1, i, chosen + [i]))

        nested = go(0, None, [])
        for _ in range(n - 1):
            nested = F.flatten(nested)
        return nested

    return arr._wrap(apply_at_depth(col, d, comb))


def argcombinations(arr: NestedArray, n: int = 2, axis: int = 1, fields: list[str] | None = None) -> NestedArray:
    """Index variant (reference lib/structure.py:135-176)."""
    return combinations(local_index(arr, axis=axis), n=n, axis=axis, fields=fields)


def run_lengths(arr: NestedArray, axis: int = -1) -> NestedArray:
    """Lengths of runs of equal adjacent values per list (reference
    lib/structure.py:775-798).

    Pure-expression approach: mark run starts (i==0 or v != prev), collect
    start indices, diff against the next start (or list end).
    """
    col, d = _col_at_axis(arr, axis)

    def rl(c: Column) -> Column:
        n = F.size(c)
        idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))
        # bind the run-start index array ONCE: referencing the O(n) filter
        # expression inside the per-run lambda would re-evaluate it per
        # run (no CSE inside HOF lambdas — schema.bind)
        return bind(
            F.filter(
                idx,
                lambda i: (i == 0) | ~F.get(c, i).eqNullSafe(F.get(c, i - 1)),
            ),
            lambda starts: F.transform(
                F.when(F.size(starts) > 0, F.sequence(F.lit(0), F.size(starts) - 1))
                .otherwise(F.array().cast("array<int>")),
                lambda j: F.when(
                    j < F.size(starts) - 1, F.get(starts, j + 1) - F.get(starts, j)
                ).otherwise(n - F.get(starts, j)),
            ),
        )

    return arr._wrap(apply_at_depth(col, d, rl))


# ---------------- concatenate ----------------

def concatenate(arrays: list[NestedArray], axis: int = 0) -> NestedArray:
    """axis=0: ordered union-all (reference lib/operations.py:50-130);
    axis>0: per-row list concatenation (lib/operations.py:132-137)."""
    if axis == 0:
        dfs = [a.to_df() for a in arrays]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return NestedArray(out)
    # different base DataFrames align on row index first (the reference's
    # partition-compatibility MAYBE path), same-base inputs pass through
    arrays = align_many(arrays)
    base = arrays[0]
    col, d = _col_at_axis(base, axis)
    cols = [a._col for a in arrays]
    if d == 0:
        return base._wrap(F.concat(*cols))
    # concat is associative: fold arrays pairwise at depth d
    acc = cols[0]
    for c in cols[1:]:
        acc = apply_at_depth2(acc, c, d, lambda x, y: F.concat(x, y))
    return base._wrap(acc)


def broadcast_arrays(*arrays: NestedArray) -> list[NestedArray]:
    """Broadcast scalars/lists to a common shape (reference
    lib/structure.py:216-242): shallower operands are expanded into the
    deepest operand's list structure."""
    arrays = align_many(list(arrays))
    maxd = max(a.depth for a in arrays)
    out = []
    for a in arrays:
        if a.depth == maxd:
            out.append(a)
            continue
        deep = next(x for x in arrays if x.depth == maxd)
        out.append(
            a._wrap(
                broadcast_binop(deep._col, a._col, maxd, a.depth, lambda _, y: y)
            )
        )
    return out


def with_name(arr: NestedArray, name: str) -> NestedArray:
    """Record-name tagging (reference lib/structure.py:1145-1161). Returns
    a NEW array (the input stays untagged, as in the reference); the tag
    propagates through derived ops via NestedArray._wrap."""
    out = NestedArray(arr._df, arr._col)
    out._name = name  # type: ignore[attr-defined]
    if getattr(arr, "_parameters", None):
        out._parameters = dict(arr._parameters)  # type: ignore[attr-defined]
    return out


def with_parameter(arr: NestedArray, key: str, value: Any) -> NestedArray:
    """Layout-parameter metadata (reference lib/structure.py:1187-1231) —
    stored driver-side; returns a new array."""
    out = arr._wrap(arr._col)
    params = dict(getattr(arr, "_parameters", {}) or {})
    params[key] = value
    out._parameters = params  # type: ignore[attr-defined]
    return out


def without_parameters(arr: NestedArray) -> NestedArray:
    out = arr._wrap(arr._col)
    out._parameters = {}  # type: ignore[attr-defined]
    return out


def enforce_type(arr: NestedArray, dtype: str | T.DataType) -> NestedArray:
    """Cast to a target schema (reference lib/structure.py:1349-1368).

    Union targets have no Spark type: ingest encodes awkward/Arrow
    unions as a TAGGED STRUCT instead (``struct<tag: tinyint, f0, f1,
    ...>`` with exactly one live field — see
    :func:`~dask_awkward_spark.sources.memory._devolve_unions`), and a
    per-variant dispatch is one ``F.when(col.tag == i, ...)`` chain, so
    a ``union[...]`` string here is refused with that pointer rather
    than failing inside Spark's cast parser."""
    import re as _re

    if isinstance(dtype, str) and _re.search(r"\bunion\s*\[", dtype.lower()):
        raise TypeError(
            "Spark has no union type; unions are encoded as a tagged "
            "struct (struct<tag: tinyint, <variant fields>> with exactly "
            "one non-null variant per row) — from_awkward/from_arrow "
            "ingest Arrow unions in that encoding automatically, and "
            "F.when(col.tag == i, ...) dispatches per variant"
        )
    return arr._wrap(arr._col.cast(dtype))


def to_packed(arr: NestedArray) -> NestedArray:
    """Buffer re-packing is a storage-layout concern the reference exposes
    (lib/structure.py:702-712); Tungsten rows are always packed — no-op."""
    return arr


def copy(arr: NestedArray) -> NestedArray:
    """reference lib/structure.py:335-347 — plans are immutable here."""
    return NestedArray(arr._df, arr._col)


def to_regular(arr: NestedArray, axis: int = 1) -> NestedArray:
    """Var→regular list conversion is metadata-only in Spark (ArrayType has
    no fixed-size variant); no-op kept for API parity
    (reference lib/structure.py:871-895)."""
    return arr


def from_regular(arr: NestedArray, axis: int = 1) -> NestedArray:
    """Regular→var (reference lib/structure.py:454-476) — no-op in Spark."""
    return arr
