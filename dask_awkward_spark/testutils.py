"""Testing helpers — the analogue of the reference's public
``dask_awkward.lib.testutils`` (assert_eq and fixture factories,
testutils.py:29-160). Downstream users write their suites against
``assert_eq``; it accepts any mix of engine collections and plain Python
values and compares computed results.
"""

from __future__ import annotations

import math
from typing import Any

from .core import NestedArray, Record, Scalar


def _concretize(x: Any) -> Any:
    if isinstance(x, (NestedArray, Record, Scalar)):
        return x.compute()
    return x


def _eq(a: Any, b: Any, rtol: float) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=rtol, abs_tol=rtol)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y, rtol) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k], rtol) for k in a)
    return a == b


def assert_eq(a: Any, b: Any, rtol: float = 1e-9) -> None:
    """Compare two collections/records/scalars (engine or plain Python)
    by value, with float tolerance and NaN==NaN (reference assert_eq
    semantics, testutils.py:29-99). Raises AssertionError with both
    concretized values on mismatch."""
    ca, cb = _concretize(a), _concretize(b)
    assert _eq(ca, cb, rtol), f"collections differ:\n  left:  {ca!r}\n  right: {cb!r}"


# fixture factories (reference testutils.py:125-160)

def make_xy_point(x: int = 1, y: int = 2) -> dict[str, int]:
    return {"x": x, "y": y}


def list_of_xy_points(n: int) -> list[dict[str, int]]:
    return [make_xy_point(i, i + 1) for i in range(n)]


def xy_points_rows(lengths: tuple[int, ...] = (3, 0, 2, 1, 3)) -> list:
    """Jagged rows of {x, y} points with the given list lengths — the
    shape of the reference's ``awkward_xy_points`` fixture."""
    out, k = [], 0
    for n in lengths:
        out.append([make_xy_point(k + i, k + i + 1) for i in range(n)])
        k += n
    return out
