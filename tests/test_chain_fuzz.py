"""Composition fuzzing: random CHAINS of nested ops applied both to the
engine and to a pure-Python list model. Single-op differential tests
(test_properties.py) can't catch bugs that only appear when ops compose —
e.g. a getitem after a mask changing null placement, or a flatten after
pad_none. Seeded, so failures replay exactly.
"""

from __future__ import annotations

import random

import dask_awkward_spark as das

# ---- the Python model: each op is (engine_fn, model_fn) over jagged
# lists of nullable ints ----


def _op_inner_filter_pos(arr, data):
    return arr[arr > 0], [[x for x in row if x is not None and x > 0] for row in data]


def _op_add1(arr, data):
    return arr + 1, [[None if x is None else x + 1 for x in row] for row in data]


def _op_sort(arr, data):
    def key(row):
        # Spark sorts nulls last within each list (ascending)
        vals = sorted(x for x in row if x is not None)
        return vals + [None] * (len(row) - len(vals))

    return das.sort(arr, axis=1), [key(row) for row in data]


def _op_inner_slice(arr, data):
    return arr[:, 1:], [row[1:] for row in data]


def _op_inner_rev(arr, data):
    return arr[:, ::-1], [row[::-1] for row in data]


def _op_pad3(arr, data):
    return das.pad_none(arr, 3, axis=1, clip=True), [
        (row + [None] * 3)[:3] for row in data
    ]


def _op_drop_none(arr, data):
    return das.drop_none(arr, axis=1), [
        [x for x in row if x is not None] for row in data
    ]


def _op_row_filter_nonempty(arr, data):
    keep = das.num(arr, axis=1) > 0
    return arr[keep], [row for row in data if len(row) > 0]


def _op_local_index(arr, data):
    return das.local_index(arr, axis=1), [list(range(len(row))) for row in data]


def _op_run_lengths(arr, data):
    def rl(row):
        # engine semantics: null-safe equality, so consecutive Nones form
        # one run (operators/structure.py run_lengths uses eqNullSafe)
        runs = []
        i = 0
        while i < len(row):
            j = i
            while j < len(row) and row[j] == row[i]:
                j += 1
            runs.append(j - i)
            i = j
        return runs

    return das.run_lengths(arr), [rl(row) for row in data]


CHAIN_OPS = [
    _op_inner_filter_pos,
    _op_add1,
    _op_sort,
    _op_inner_slice,
    _op_inner_rev,
    _op_pad3,
    _op_drop_none,
    _op_row_filter_nonempty,
    _op_local_index,
]

TERMINAL_OPS = {
    "sum_axis1": (
        lambda arr: das.sum(arr, axis=1).compute(),
        lambda data: [sum(x for x in row if x is not None) for row in data],
    ),
    "num_axis1": (
        lambda arr: das.num(arr, axis=1).compute(),
        lambda data: [len(row) for row in data],
    ),
    "flatten": (
        lambda arr: das.flatten(arr, axis=1).compute(),
        lambda data: [x for row in data for x in row],
    ),
    "identity": (lambda arr: arr.compute(), lambda data: data),
}


def _rand_data(rng: random.Random):
    return [
        [rng.choice([None] + list(range(-9, 10))) for _ in range(rng.randint(0, 5))]
        for _ in range(rng.randint(1, 6))
    ]


def test_random_op_chains(spark):
    rng = random.Random(2024)
    for trial in range(40):
        data = _rand_data(rng)
        arr = das.from_lists(spark, data, "array<bigint>")
        model = [list(r) for r in data]
        ops = [rng.choice(CHAIN_OPS) for _ in range(rng.randint(1, 4))]
        names = [f.__name__ for f in ops]
        for f in ops:
            arr, model = f(arr, model)
        term_name, (tfn, mfn) = rng.choice(list(TERMINAL_OPS.items()))
        got, want = tfn(arr), mfn(model)
        assert got == want, (trial, names, term_name, data, got, want)


def test_run_lengths_model(spark):
    rng = random.Random(5)
    for _ in range(10):
        data = [
            [rng.choice([1, 1, 2, None]) for _ in range(rng.randint(0, 6))]
            for _ in range(rng.randint(1, 5))
        ]
        arr = das.from_lists(spark, data, "array<bigint>")
        _, want = _op_run_lengths(arr, data)
        got = das.run_lengths(arr).compute()
        assert got == want, (data, got, want)
