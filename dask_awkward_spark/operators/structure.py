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

from ..core import VALUE_COL, NestedArray, Scalar
from ..schema import apply_at_depth, apply_at_depth2, broadcast_binop, normalize_axis


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


def unflatten(arr: NestedArray, counts: NestedArray, axis: int = 0) -> NestedArray:
    """Regroup flat elements into lists of given counts — inverse of explode
    (reference lib/structure.py:898-922). Order-sensitive: uses the explicit
    row index (SURVEY §7.4(2)).

    ``counts`` must be a flat int collection over its own rows; the total
    must equal len(arr).
    """
    if axis != 0:
        raise NotImplementedError("unflatten currently supports axis=0")
    from pyspark.sql import Window

    data = arr.with_row_index()
    cdf = counts.with_row_index()._df.select(
        F.col("__row_id__").alias("grp"), counts._col.alias("cnt")
    )
    w = Window.orderBy("grp")
    bounds = cdf.withColumn("hi", F.sum("cnt").over(w)).withColumn(
        "lo", F.col("hi") - F.col("cnt")
    )
    # left join from bounds so zero-count groups survive as empty lists
    joined = bounds.join(
        data._df,
        (F.col("__row_id__") >= F.col("lo")) & (F.col("__row_id__") < F.col("hi")),
        "left",
    )
    out = (
        joined.groupBy("grp")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        # NULL (skipped by collect_list) for unmatched rows of
                        # empty groups, keeping them as [] not [null]
                        F.when(
                            F.col("__row_id__").isNotNull(),
                            F.struct(F.col("__row_id__").alias("i"), data._col.alias("x")),
                        )
                    )
                ),
                lambda s: s["x"],
            ).alias(VALUE_COL)
        )
        .orderBy("grp")
        .select(VALUE_COL)
    )
    return NestedArray(out)


# ---------------- zip / unzip / records ----------------

def zip(arrays: dict[str, NestedArray], depth_limit: int | None = None) -> NestedArray:
    """Build a struct column from congruent arrays, broadcasting shallower
    operands into deeper lists (reference lib/structure.py:1275-1346)."""
    items = list(arrays.items())
    base = items[0][1]
    for _, a in items[1:]:
        base._check_base(a)
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
    """Struct → tuple of field arrays (reference lib/structure.py:939-954)."""
    return tuple(arr[f] for f in arr.fields)  # type: ignore[misc]


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
    arr._check_base(mask_arr)
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
    base = cond

    def leaf(c: Column, xv: Column, yv: Column) -> Column:
        return F.when(c, xv).otherwise(yv)

    if xa is not None and ya is not None:
        base._check_base(xa); base._check_base(ya)
        d = cond.depth
        def rec(c, xv, yv, d):
            if d == 0:
                return leaf(c, xv, yv)
            z = F.zip_with(c, xv, lambda cc, xx: F.struct(cc.alias("c"), xx.alias("x")))
            return F.zip_with(z, yv, lambda s, yy: rec(s["c"], s["x"], yy, d - 1))
        return cond._wrap(rec(cond._col, xa._col, ya._col, d))
    xv = xa._col if xa is not None else F.lit(x)
    yv = ya._col if ya is not None else F.lit(y)
    if xa is not None:
        base._check_base(xa)
        return cond._wrap(apply_at_depth2(cond._col, xa._col, cond.depth, lambda c, xx: F.when(c, xx).otherwise(yv)))
    if ya is not None:
        base._check_base(ya)
        return cond._wrap(apply_at_depth2(cond._col, ya._col, cond.depth, lambda c, yy: F.when(c, xv).otherwise(yy)))
    return cond._wrap(apply_at_depth(cond._col, cond.depth, lambda c: F.when(c, xv).otherwise(yv)))


def isclose(a: NestedArray, b: NestedArray, rtol: float = 1e-5, atol: float = 1e-8) -> NestedArray:
    """Approximate equality (reference lib/structure.py:508-537)."""
    a._check_base(b)
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
    """Per-row cross product of inner lists → list of struct pairs
    (reference lib/structure.py:254-282). n=2 supported natively."""
    if len(arrays) != 2:
        raise NotImplementedError("cartesian supports exactly 2 arrays (as commonly used)")
    a, b = arrays
    a._check_base(b)
    col, d = _col_at_axis(a, axis)
    bcol = b._col

    def prod(x: Column, y: Column) -> Column:
        return F.flatten(F.transform(x, lambda xe: F.transform(y, lambda ye: F.struct(xe.alias("0"), ye.alias("1")))))

    if d == 0:
        return a._wrap(prod(a._col, bcol))
    return a._wrap(apply_at_depth2(a._col, bcol, d, prod))


def argcartesian(arrays: list[NestedArray], axis: int = 1) -> NestedArray:
    """Index-pair variant (reference lib/structure.py:92-122)."""
    idx = [local_index(a, axis=axis) for a in arrays]
    return cartesian(idx, axis=axis)


def combinations(arr: NestedArray, n: int = 2, axis: int = 1, fields: list[str] | None = None) -> NestedArray:
    """Per-row n-choose-k combinations of one list (reference
    lib/structure.py:295-332). n=2 and n=3 via generated expressions
    (nested index transforms with i<j<k); larger n would blow up the
    expression tree — use the Arrow-UDF tier for those."""
    if n not in (2, 3):
        raise NotImplementedError("combinations supports n in {2, 3}")
    names = fields or [str(i) for i in range(n)]
    col, d = _col_at_axis(arr, axis)

    def idx_after(c: Column, i: Column) -> Column:
        # indices strictly greater than i
        return F.when(
            F.size(c) - i - 1 > 0, F.sequence(i + 1, F.size(c) - 1)
        ).otherwise(F.array().cast("array<int>"))

    def comb2(c: Column) -> Column:
        idx = F.when(F.size(c) > 0, F.sequence(F.lit(0), F.size(c) - 1)).otherwise(F.array().cast("array<int>"))
        return F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    idx_after(c, i),
                    lambda j: F.struct(F.get(c, i).alias(names[0]), F.get(c, j).alias(names[1])),
                ),
            )
        )

    def comb3(c: Column) -> Column:
        idx = F.when(F.size(c) > 0, F.sequence(F.lit(0), F.size(c) - 1)).otherwise(F.array().cast("array<int>"))
        return F.flatten(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        idx_after(c, i),
                        lambda j: F.transform(
                            idx_after(c, j),
                            lambda k: F.struct(
                                F.get(c, i).alias(names[0]),
                                F.get(c, j).alias(names[1]),
                                F.get(c, k).alias(names[2]),
                            ),
                        ),
                    ),
                )
            )
        )

    return arr._wrap(apply_at_depth(col, d, comb2 if n == 2 else comb3))


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
        starts = F.filter(
            idx,
            lambda i: (i == 0) | ~F.get(c, i).eqNullSafe(F.get(c, i - 1)),
        )
        ns = F.size(starts)
        return F.transform(
            F.when(ns > 0, F.sequence(F.lit(0), ns - 1)).otherwise(F.array().cast("array<int>")),
            lambda j: F.when(j < ns - 1, F.get(starts, j + 1) - F.get(starts, j))
                       .otherwise(n - F.get(starts, j)),
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
    base = arrays[0]
    for a in arrays[1:]:
        base._check_base(a)
    col, d = _col_at_axis(base, axis)
    cols = [a._col for a in arrays]

    def cat(*cs: Column) -> Column:
        return F.concat(*cs)

    if d == 0:
        return base._wrap(F.concat(*cols))
    # zip all arrays down to depth d then concat — supported for 2 arrays deep
    if len(arrays) == 2:
        return base._wrap(apply_at_depth2(cols[0], cols[1], d, lambda x, y: F.concat(x, y)))
    raise NotImplementedError("deep concatenate supports 2 arrays at axis>1")


def broadcast_arrays(*arrays: NestedArray) -> list[NestedArray]:
    """Broadcast scalars/lists to a common shape (reference
    lib/structure.py:216-242): shallower operands are expanded into the
    deepest operand's list structure."""
    maxd = max(a.depth for a in arrays)
    base = arrays[0]
    for a in arrays[1:]:
        base._check_base(a)
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
    """Cast to a target schema (reference lib/structure.py:1349-1368)."""
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
