"""Plan introspection — the Spark-native analogue of the reference's
``report_necessary_columns`` / ``report_necessary_buffers``
(lib/inspect.py:21-219): instead of replaying a typetracer graph, read the
optimized physical plan and extract what Catalyst actually pushed into the
scans. Used by tests to assert that nested-schema pruning and predicate
pushdown fire (SURVEY §4.1)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def necessary_columns(df: DataFrame) -> dict[str, list[str]]:
    """Per-scan ReadSchema actually used after optimization — one entry per
    parquet scan in the plan, mapping location → projected column names."""
    txt = explain_str(df, "formatted")
    out: dict[str, list[str]] = {}
    scans = re.split(r"\(\d+\) Scan parquet", txt)[1:]
    for s in scans:
        loc = re.search(r"Location:.*?\[(.*?)\]", s)
        rs = re.search(r"ReadSchema: struct<(.*?)>\n", s, re.S)
        if rs:
            cols = [c.split(":")[0].strip() for c in _split_top(rs.group(1))]
            key = loc.group(1) if loc else f"scan{len(out)}"
            # self-joins scan the same file twice — keep every scan
            while key in out:
                key += "#"
            out[key] = cols
    return out


def _split_top(s: str) -> list[str]:
    """Split a struct<...> field list at depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters reaching the parquet scans (predicate pushdown proof)."""
    txt = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", txt):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out
