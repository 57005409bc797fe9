"""Query registry: every entry pairs a Spark DataFrame query with a DuckDB
oracle SQL string over the same parquet tables.

Float-determinism discipline (so value hashes match the oracle bit-for-bit):

- Sums of whole-number-valued doubles (l_quantity) are exact in IEEE double
  (< 2^53) — safe unrounded, any aggregation order.
- Sums of cent-valued doubles (prices) differ in the last ulp between
  engines/partition orders → wrap in ``round(sum(x), 2)``: the true value
  sits ~0.005 from the nearest rounding boundary while the error is ~1e-6,
  so both engines round to the same double.
- Averages/ratios: derive from exact or rounded components
  (``round(sum,2) / count``) so both engines do the same IEEE division.
- Top-k: always order by (metric, unique key) so the selected SET is
  deterministic; the driver's hash is row-order-insensitive.
"""

from __future__ import annotations

from . import coverage, dedup, events, nested, pipeline, similarity, text, tpch, tpch2

_MODULES = [tpch, tpch2, nested, text, dedup, similarity, events, pipeline, coverage]


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
