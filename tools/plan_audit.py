"""Scale red-flag audit over every registered query's physical plan.

Greps each batch query's executed plan (AQE-final where available) for
operators that do not survive a 100x scale-up:

- ``CartesianProduct``           — unbounded all-pairs product;
- ``BroadcastNestedLoopJoin``    — non-equi join materializing one side
                                   per task (acceptable ONLY against a
                                   deliberately tiny frame — whitelisted
                                   per query with a reason);
- ``BatchEvalPython``            — row-at-a-time Python UDF in the plan
                                   (the Arrow-batched tiers ArrowEvalPython
                                   / MapInPandas / FlatMapGroupsInPandas*
                                   are the sanctioned escape hatches);
- unpartitioned ``Window``       — ``Window.partitionBy()`` absent moves
                                   ALL rows through ONE partition (Spark
                                   logs "No Partition Defined for Window
                                   operation"); acceptable only over a
                                   provably tiny frame — whitelisted per
                                   query with a reason.

Streaming queries (stream_*) are skipped: their returned frame is a
drained memory-sink table, not the streaming plan itself.

Usage: python tools/plan_audit.py [name_filter ...]   (exit 1 on findings)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

# query -> reason the BroadcastNestedLoopJoin there is scale-safe
BNLJ_WHITELIST = {
    "op_zip_cross_df": "crossJoin against a 1-row global-agg frame",
    "sketch_kmv_distinct": "crossJoin of two 1-row aggregate frames",
    "sim_knn_per_query": "query side is a broadcast <=25-row frame",
    "sim_topk_bruteforce": "query side is a broadcast <=5-row frame",
    "op_arith_broadcast": "1-row scalar frame broadcast into expressions",
    "text_contamination": "test-side n-gram set is a broadcast small frame",
    "sim_ivf_topk": "crossJoin against the broadcast 1-row query-vector frame",
    "q22_idle_balance": "scalar subquery: broadcast 1-row global-avg frame",
    "q11_important_balances": "scalar subquery: broadcast 1-row global-sum frame",
}

FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

# query -> reason the unpartitioned Window there is scale-safe
WINDOW_WHITELIST: dict[str, str] = {}


def _top_level_groups(s: str) -> list[str]:
    """Top-level ``[...]`` bracket groups of a physical-plan line."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1 : i])
    return groups


def unpartitioned_windows(plan: str) -> list[str]:
    """Plan lines whose WindowExec has an empty partition spec.

    ``Window [exprs], [part], [order]`` (3 groups) and
    ``Window [exprs], [part]`` (2 groups, no sort direction) are
    partitioned; ``Window [exprs], [col ASC NULLS FIRST]`` (2 groups,
    second is an ordering) and ``Window [exprs]`` are the
    single-partition shape this audit exists to catch.
    """
    bad = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-*: ")
        # Pandas-UDF windows (ArrowWindowPython in Spark 4, WindowInPandas
        # before) funnel through one partition exactly like WindowExec
        # when the spec is keyless
        if not (
            stripped.startswith("Window ")
            or stripped.startswith("ArrowWindowPython ")
            or stripped.startswith("WindowInPandas ")
        ):
            continue
        groups = _top_level_groups(stripped)
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not (" ASC" in groups[1] or " DESC" in groups[1]):
            continue
        bad.append(stripped[:120])
    return bad


def audit(names: list[str] | None = None) -> int:
    from dask_awkward_spark.queries import all_queries
    from dask_awkward_spark.session import get_spark

    spark = get_spark("plan_audit", cpus=8)
    qs = all_queries()
    findings: list[tuple[str, str]] = []
    n_audited = 0
    for name, fn in qs.items():
        if name.startswith("stream_"):
            continue
        if names and not any(s in name for s in names):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            findings.append((name, f"PLAN ERROR: {type(e).__name__}: {e}"[:200]))
            continue
        n_audited += 1
        for flag in FLAGS:
            if flag in plan:
                if flag == "BroadcastNestedLoopJoin" and name in BNLJ_WHITELIST:
                    continue
                findings.append((name, flag))
        if name not in WINDOW_WHITELIST:
            for line in unpartitioned_windows(plan):
                findings.append((name, f"unpartitioned Window: {line}"))
    print(f"audited {n_audited} query plans")
    for name, what in findings:
        print(f"FLAG {name}: {what}")
    if not findings:
        print("no scale red flags")
    spark.stop()
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1:] or None))
