"""The plan auditor's unpartitioned-window detector (tools/plan_audit.py):
the operator class that moves ALL rows through ONE partition must be
flagged, and partitioned windows must not false-positive."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from plan_audit import _top_level_groups, unpartitioned_windows  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flags_keyless_ordered_window(spark):
    df = spark.range(10).withColumn("r", F.row_number().over(Window.orderBy("id")))
    hits = unpartitioned_windows(_plan(df))
    assert len(hits) == 1 and hits[0].startswith("Window ")


def test_partitioned_window_is_clean(spark):
    base = spark.range(10).withColumn("g", F.col("id") % 2)
    ordered = base.withColumn("r", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    assert unpartitioned_windows(_plan(ordered)) == []
    # partition spec without an ORDER BY: 2 bracket groups, but the second
    # is a partition spec, not an ordering — must not false-positive
    unordered = base.withColumn("s", F.sum("id").over(Window.partitionBy("g")))
    assert unpartitioned_windows(_plan(unordered)) == []


def test_bracket_parser_handles_nested_groups():
    line = "Window [sum(a#1[0]) windowspecdefinition(b#2, specifiedwindowframe(...))], [b#2]"
    groups = _top_level_groups(line)
    assert len(groups) == 2
    assert groups[1] == "b#2"


def test_flags_keyless_window_in_pandas(spark):
    """Pandas-UDF windows funnel identically when keyless; the detector
    must catch ArrowWindowPython/WindowInPandas nodes too."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def pmean(v):
        return float(v.mean())

    df = spark.range(10).withColumn("v", F.col("id").cast("double"))
    keyless = df.withColumn("m", pmean("v").over(Window.orderBy("id").rowsBetween(-2, 0)))
    hits = unpartitioned_windows(_plan(keyless))
    assert len(hits) == 1 and hits[0].split(" ")[0] in ("ArrowWindowPython", "WindowInPandas")
    keyed = df.withColumn("g", F.col("id") % 2).withColumn(
        "m", pmean("v").over(Window.partitionBy("g").orderBy("id").rowsBetween(-2, 0))
    )
    assert unpartitioned_windows(_plan(keyed)) == []
