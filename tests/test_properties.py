"""Property-based differential tests: random jagged/nullable data, engine
result vs eager Python evaluation — the reference's assert_eq discipline
(lib/testutils.py:29-99) with generated inputs instead of fixtures.

One Spark job per property (data batched into a single DataFrame) keeps
runtime sane.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

import dask_awkward_spark as das

# rows: jagged lists of (nullable) small ints, including empty lists
inner = st_.lists(st_.one_of(st_.integers(-50, 50), st_.none()), max_size=6)
rows = st_.lists(inner, min_size=1, max_size=8)

import os

SETTINGS = dict(
    # soak mode: DAKSPARK_HYPO_EXAMPLES=200 python -m pytest tests/test_properties.py
    max_examples=int(os.environ.get("DAKSPARK_HYPO_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _arr(spark, data):
    return das.from_lists(spark, data, "array<bigint>")


@given(data=rows)
@settings(**SETTINGS)
def test_sum_matches_python(spark, data):
    got = das.sum(_arr(spark, data), axis=1).compute()
    exp = [sum(x for x in row if x is not None) for row in data]
    assert got == exp


@given(data=rows)
@settings(**SETTINGS)
def test_count_min_max(spark, data):
    arr = _arr(spark, data)
    assert das.count(arr, axis=1).compute() == [
        len([x for x in row if x is not None]) for row in data
    ]
    exp_min = [min((x for x in row if x is not None), default=None) for row in data]
    exp_max = [max((x for x in row if x is not None), default=None) for row in data]
    assert das.min(arr, axis=1).compute() == exp_min
    assert das.max(arr, axis=1).compute() == exp_max


@given(data=rows)
@settings(**SETTINGS)
def test_sort_drop_none(spark, data):
    arr = _arr(spark, data)
    got = das.sort(das.drop_none(arr), axis=1).compute()
    exp = [sorted(x for x in row if x is not None) for row in data]
    assert got == exp


@given(data=rows)
@settings(**SETTINGS)
def test_flatten_num(spark, data):
    arr = _arr(spark, data)
    assert das.num(arr, axis=1).compute() == [len(row) for row in data]
    assert das.flatten(arr, axis=1).compute() == [x for row in data for x in row]


@given(data=rows)
@settings(**SETTINGS)
def test_filter_arith_roundtrip(spark, data):
    arr = _arr(spark, data)
    kept = arr[arr > 0]
    exp = [[x for x in row if x is not None and x > 0] for row in data]
    assert kept.compute() == exp
    doubled = das.drop_none(arr) * 2
    assert doubled.compute() == [[x * 2 for x in row if x is not None] for row in data]


@given(data=rows)
@settings(**SETTINGS)
def test_pad_fill_inverse(spark, data):
    arr = _arr(spark, data)
    clean = das.drop_none(arr)
    padded = das.pad_none(clean, 4, clip=True)
    got = padded.compute()
    for row, g in zip(data, got):
        vals = [x for x in row if x is not None][:4]
        assert g == vals + [None] * (4 - len(vals))


@given(data=rows)
@settings(**SETTINGS)
def test_combinations_count(spark, data):
    arr = das.drop_none(_arr(spark, data))
    got = das.combinations(arr, 2).compute()
    for row, pairs in zip(data, got):
        n = len([x for x in row if x is not None])
        assert len(pairs) == n * (n - 1) // 2


@given(data=rows)
@settings(**SETTINGS)
def test_unflatten_inverts_flatten(spark, data):
    """flatten(axis=1) + num(axis=1) counts -> unflatten reproduces the
    original lists (None ELEMENTS survive the round trip; reference
    lib/structure.py:898-922 inverse contract)."""
    arr = _arr(spark, data)
    flat = das.flatten(arr, axis=1)
    counts = das.num(arr, axis=1)
    back = das.unflatten(flat, counts).compute()
    assert back == data


@given(data=rows)
@settings(**SETTINGS)
def test_sum_axis0_matches_python(spark, data):
    """Positional sum across jagged rows == Python transpose-and-sum
    (Nones skipped; positions past a row's length don't participate)."""
    arr = _arr(spark, data)
    got = das.sum(arr, axis=0).compute()
    width = max((len(r) for r in data), default=0)
    want = []
    for p in range(width):
        vals = [r[p] for r in data if len(r) > p and r[p] is not None]
        want.append(sum(vals) if vals else None)
    # trailing all-None positions: engine emits one row per position of
    # the longest list, value NULL when nothing participates
    assert got == want


# arbitrary slice parameters incl. negatives and negative step
_bound = st_.one_of(st_.none(), st_.integers(-10, 10))
_step = st_.one_of(st_.none(), st_.integers(-4, 4).filter(lambda s: s != 0))


@given(data=rows, start=_bound, stop=_bound, step=_step)
@settings(**SETTINGS)
def test_inner_slice_matches_python(spark, data, start, stop, step):
    """arr[:, start:stop:step] == per-row Python list slicing, any sign."""
    arr = _arr(spark, data)
    got = arr[:, slice(start, stop, step)].compute()
    assert got == [row[start:stop:step] for row in data]


@given(data=rows, start=_bound, stop=_bound, step=_step)
@settings(**SETTINGS)
def test_row_slice_matches_python(spark, data, start, stop, step):
    """arr[start:stop:step] == Python row slicing, any sign (order
    preserved, including reversal for negative step)."""
    arr = _arr(spark, data)
    got = arr[slice(start, stop, step)].compute()
    assert got == data[start:stop:step]


@given(data=rows)
@settings(**SETTINGS)
def test_unflatten_bad_counts_always_raise(spark, data):
    """Corrupting the counts by +1 must raise, never silently misalign
    (reference lib/structure.py:898-922 ValueError contract)."""
    import pytest

    arr = _arr(spark, data)
    flat = das.flatten(arr, axis=1)
    bad = das.num(arr, axis=1) + 1  # sums to len(flat) + n_rows
    with pytest.raises(ValueError, match="sum"):
        das.unflatten(flat, bad)


def test_connected_components_matches_union_find(spark):
    """Seeded random graph vs a driver-side union-find oracle."""
    import random

    from dask_awkward_spark.functions.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(30))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {n for e in edges for n in e}
    want = {}
    for n in nodes:
        root = find(n)
        want[n] = min(m for m in nodes if find(m) == root)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want


# random unicode incl. CJK, digits, titlecase char, whitespace
_UNI = st_.text(
    alphabet=st_.sampled_from(list("aAbZ.19 世界ǅ\t")), max_size=8
)


@given(vals=st_.lists(_UNI, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_string_case_predicates_match_python(spark, vals):
    """is_lower/is_upper/is_title vs Python str semantics on random
    Unicode (the Arrow kernels the reference wraps follow Python here)."""
    from dask_awkward_spark.functions import strings as S

    w = das.from_lists(spark, vals, "string")
    assert S.is_lower(w).compute() == [v.islower() for v in vals]
    assert S.is_upper(w).compute() == [v.isupper() for v in vals]
    assert S.is_title(w).compute() == [v.istitle() for v in vals]


@given(vals=st_.lists(_UNI, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_string_class_predicates_match_python(spark, vals):
    from dask_awkward_spark.functions import strings as S

    w = das.from_lists(spark, vals, "string")
    assert S.is_alpha(w).compute() == [v.isalpha() for v in vals]
    assert S.is_space(w).compute() == [bool(v) and v.isspace() for v in vals]
    assert S.is_decimal(w).compute() == [v.isdecimal() for v in vals]


@given(data=rows, i=st_.integers(-7, 7))
@settings(**SETTINGS)
def test_inner_int_pick_matches_python(spark, data, i):
    """arr[:, i] == per-row element pick; negative wraps; out-of-range
    yields None (documented divergence: awkward raises, Spark expressions
    are total)."""
    arr = _arr(spark, data)
    got = arr[:, i].compute()
    want = [row[i] if -len(row) <= i < len(row) else None for row in data]
    assert got == want


@given(data=rows, i=st_.integers(-8, 7))
@settings(**SETTINGS)
def test_outer_int_returns_row(spark, data, i):
    """arr[i] == data[i] for in-range i (a list row comes back as the
    collection of its elements); negative wraps like Python."""
    import pytest

    arr = _arr(spark, data)
    if -len(data) <= i < len(data):
        assert arr[i].compute() == data[i]
    elif i < 0:
        with pytest.raises(IndexError):
            arr[i]


# ---- histogram fills vs numpy (functions/hist.py) ----

_floats = st_.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


@given(vals=st_.lists(_floats, min_size=1, max_size=60))
@settings(**SETTINGS)
def test_hist1d_matches_numpy(spark, vals):
    """Interior cells agree with np.histogram over [lo, hi) (numpy closes
    its LAST bin, so values == hi are excluded from the comparison and
    counted in our overflow instead); flow bins absorb exactly the rest."""
    import numpy as np

    from dask_awkward_spark.functions import hist as H

    bins, lo, hi = 7, -25.0, 25.0
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {r["bin"]: r["n"] for r in H.hist1d(df, "x", bins, lo, hi).collect()}

    inside = [v for v in vals if lo <= v < hi]
    np_n, _ = np.histogram(inside, bins=bins, range=(lo, hi))
    for i, n in enumerate(np_n):
        assert got.get(i + 1, 0) == n, (i, vals)
    assert got.get(0, 0) == sum(1 for v in vals if v < lo)
    assert got.get(bins + 1, 0) == sum(1 for v in vals if v >= hi)
    assert sum(got.values()) == len(vals)
