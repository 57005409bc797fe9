"""Generic time-series API (functions/timeseries.py): as-of join both
directions + tolerance, bucketed range join, cascading rollup — checked
against DuckDB theta/ASOF joins on the real events table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.functions.timeseries import (
    asof_join,
    range_join,
    rollup_cascade,
    time_bucket_sec,
)
from dask_awkward_spark.queries.events import _ev

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


def _sides(spark):
    ev = _ev(spark, SF)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # unique (user_id, ts) on the right so ties can't differ across engines
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return clicks, views


_DUCK_ASOF = """
WITH views AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, v.ts AS r_ts, v.view_value AS r_view_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts {op} v.ts
"""


def _spark_asof_set(spark, direction, tolerance=None):
    clicks, views = _sides(spark)
    out = asof_join(
        clicks, views, on="ts", by="user_id", direction=direction, tolerance=tolerance
    )
    return {
        (r["event_id"], r["r_ts"], r["r_view_value"])
        for r in out.collect()
    }


def test_asof_backward_matches_duckdb(spark):
    got = _spark_asof_set(spark, "backward")
    con = _duck()
    want = {
        (eid, ts, vv) for eid, ts, vv in con.sql(_DUCK_ASOF.format(op=">=")).fetchall()
    }
    assert got == want and len(got) > 0
    assert any(ts is not None for _, ts, _ in got)


def test_asof_forward_matches_duckdb(spark):
    got = _spark_asof_set(spark, "forward")
    con = _duck()
    want = {
        (eid, ts, vv) for eid, ts, vv in con.sql(_DUCK_ASOF.format(op="<=")).fetchall()
    }
    assert got == want and len(got) > 0


def test_asof_tolerance_nulls_stale_matches(spark):
    base = _spark_asof_set(spark, "backward")
    tight = _spark_asof_set(spark, "backward", tolerance=600)
    # tolerance only nulls out matches, never changes them
    kept = {(e, t, v) for e, t, v in tight if t is not None}
    assert kept <= base
    assert len(tight) == len(base)
    assert len(kept) < len([1 for _, t, _ in base if t is not None])


def test_asof_forward_rejects_bad_direction(spark):
    clicks, views = _sides(spark)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(clicks, views, direction="nearest")


def test_range_join_matches_duckdb_theta(spark):
    ev = _ev(spark, SF).select("event_id", "user_id", "ts")
    out = range_join(
        ev,
        ev.withColumnRenamed("event_id", "eid_b"),
        by="user_id",
        on="ts",
        lower=0.0,
        upper=60.0,
    ).filter(F.col("event_id") != F.col("eid_b"))
    got = {(r["event_id"], r["eid_b"]) for r in out.collect()}
    con = _duck()
    want = {
        (a, b)
        for a, b in con
        .sql(
            """
            SELECT a.event_id, b.event_id FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 60000000
             AND a.event_id != b.event_id
            """
        )
        .fetchall()
    }
    assert got == want and len(got) > 0


def test_rollup_cascade_levels_agree_with_direct(spark):
    ev = _ev(spark, SF).select("ts", F.round(F.col("value") * 100).cast("bigint").alias("v_c"))
    out = rollup_cascade(
        ev, "ts", [("n", "v_c", "count"), ("s", "v_c", "sum"), ("mx", "v_c", "max")],
        [3600, 86400],
    )
    daily = {
        (r["bucket"], r["n"], r["s"], r["mx"])
        for r in out.filter(F.col("gran") == 86400).collect()
    }
    direct = {
        (r["bucket"], r["n"], r["s"], r["mx"])
        for r in ev.groupBy(
            time_bucket_sec(F.col("ts"), 86400).cast("bigint").alias("bucket")
        )
        .agg(F.count("v_c").alias("n"), F.sum("v_c").alias("s"), F.max("v_c").alias("mx"))
        .collect()
    }
    assert daily == direct and len(daily) > 0


def test_rollup_cascade_validation(spark):
    ev = _ev(spark, SF).select("ts", "value")
    with pytest.raises(ValueError, match="divide"):
        rollup_cascade(ev, "ts", [("n", "value", "count")], [3600, 5000])
    with pytest.raises(ValueError, match="re-aggregable"):
        rollup_cascade(ev, "ts", [("a", "value", "avg")], [3600])


# ---- property check vs pandas merge_asof (canonical asof semantics) ----

import datetime as _dt

import numpy as np
import pandas as pd


def _random_frames(seed):
    rng = np.random.default_rng(seed)
    base = _dt.datetime(2024, 3, 1)
    # unique right timestamps per key so tie-break rules can't differ
    lrows = [
        (int(k), base + _dt.timedelta(seconds=int(s)), int(i))
        for i, (k, s) in enumerate(zip(rng.integers(0, 5, 200), rng.integers(0, 50_000, 200)))
    ]
    rsec = {(int(k), int(s)) for k, s in zip(rng.integers(0, 5, 120), rng.integers(0, 50_000, 120))}
    rrows = [
        (k, base + _dt.timedelta(seconds=s), float(k * 100_000 + s))
        for k, s in sorted(rsec)
    ]
    lpdf = pd.DataFrame(lrows, columns=["uid", "ts", "lid"])
    rpdf = pd.DataFrame(rrows, columns=["uid", "ts", "val"])
    return lpdf, rpdf


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("direction,tol", [("backward", None), ("forward", None), ("backward", 3600)])
def test_asof_matches_pandas_merge_asof(spark, seed, direction, tol):
    lpdf, rpdf = _random_frames(seed)
    ldf = spark.createDataFrame(lpdf).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(rpdf).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["lid"], r["r_ts"], r["r_val"])
        for r in asof_join(
            ldf, rdf, on="ts", by="uid", direction=direction, tolerance=tol
        ).collect()
    }
    want_pdf = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="uid",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol else None,
        suffixes=("", "_r"),
    )
    want = set()
    for _, r in want_pdf.iterrows():
        if pd.isna(r["val"]):
            want.add((int(r["lid"]), None, None))
        else:
            # pandas keeps only the value; recover the matched ts from the
            # unique (uid, val) right rows
            m = rpdf[(rpdf["uid"] == r["uid"]) & (rpdf["val"] == r["val"])]
            want.add((int(r["lid"]), m.iloc[0]["ts"].to_pydatetime(), float(r["val"])))
    assert got == want


# ---- keyless as-of: scale-safe path (range partition + boundary carry) ----


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "direction,tol", [("backward", None), ("forward", None), ("backward", 3600)]
)
def test_asof_keyless_matches_pandas(spark, seed, direction, tol):
    """by=None must produce exactly the global merge_asof answer."""
    lpdf, rpdf = _random_frames(seed)
    # drop the key: global as-of over unique right timestamps
    rpdf = rpdf.drop_duplicates(subset=["ts"]).drop(columns=["uid"])
    lpdf = lpdf.drop(columns=["uid"])
    ldf = spark.createDataFrame(lpdf).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(rpdf).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["lid"], r["r_ts"], r["r_val"])
        for r in asof_join(ldf, rdf, on="ts", direction=direction, tolerance=tol).collect()
    }
    want_pdf = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol else None,
        suffixes=("", "_r"),
    )
    want = set()
    for _, r in want_pdf.iterrows():
        if pd.isna(r["val"]):
            want.add((int(r["lid"]), None, None))
        else:
            m = rpdf[rpdf["val"] == r["val"]]
            want.add((int(r["lid"]), m.iloc[0]["ts"].to_pydatetime(), float(r["val"])))
    assert got == want


def test_asof_keyless_plan_has_no_unpartitioned_window(spark):
    """The by=None path must never move all rows through one partition
    (the round-4 audit finding): every WindowExec in the physical plan
    carries a partition spec."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import unpartitioned_windows

    lpdf, rpdf = _random_frames(3)
    ldf = spark.createDataFrame(lpdf.drop(columns=["uid"]))
    rdf = spark.createDataFrame(rpdf.drop(columns=["uid"]).drop_duplicates(subset=["ts"]))
    out = asof_join(ldf, rdf, on="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_windows(plan) == []
    assert "Window" in plan  # the parallel per-pid window is still there


def test_asof_keyless_bigint_on_column(spark):
    """The keyless carry must not assume a timestamp `on`: with a bigint
    epoch-micros column the per-partition boundary value is taken at the
    last scan-order row (row-number max_by), not via a saturating
    timestamp cast."""
    import random

    rng = random.Random(7)
    lrows = [(i, rng.randrange(0, 1_000_000)) for i in range(200)]
    rrows = [(j, t, float(t)) for j, t in enumerate(sorted(rng.sample(range(1_000_000), 80)))]
    ldf = spark.createDataFrame(lrows, "lid bigint, ts bigint")
    rdf = spark.createDataFrame(rrows, "rid bigint, ts bigint, val double")
    out = {r["lid"]: r["r_val"] for r in asof_join(ldf, rdf, on="ts").collect()}
    rts = sorted(t for _j, t, _v in rrows)
    import bisect

    for lid, t in lrows:
        i = bisect.bisect_right(rts, t) - 1
        want = float(rts[i]) if i >= 0 else None
        assert out[lid] == want, (lid, t)


def test_sessionize_matches_bruteforce(spark):
    """Public sessionize: per-key 1-based session indices match a python
    reference at the exact gap boundary (microsecond precision)."""
    from dask_awkward_spark.functions.timeseries import sessionize

    base = _dt.datetime(2024, 5, 1)
    rows = []
    rng = np.random.default_rng(11)
    for uid in range(4):
        t = 0.0
        for i in range(40):
            t += float(rng.choice([5, 100, 1800, 1800.000001, 4000]))
            rows.append((uid, i, base + _dt.timedelta(seconds=t)))
    df = spark.createDataFrame(rows, "uid int, eid int, ts timestamp_ntz")
    got = {
        (r.uid, r.eid): r.session_id
        for r in sessionize(df, by="uid", on="ts", gap=1800, tie_break=["eid"]).collect()
    }
    by_uid = {}
    for uid, eid, ts in rows:
        by_uid.setdefault(uid, []).append((ts, eid))
    for uid, evs in by_uid.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sid += 1
            prev = ts
            assert got[(uid, eid)] == sid, (uid, eid)


def test_sessionize_refuses_keyless(spark):
    from dask_awkward_spark.functions.timeseries import sessionize

    df = spark.createDataFrame([(1, _dt.datetime(2024, 1, 1))], "id int, ts timestamp")
    with pytest.raises(ValueError, match="non-empty"):
        sessionize(df, by=[], on="ts")


def test_sessionize_plan_is_partitioned(spark):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import unpartitioned_windows

    from dask_awkward_spark.functions.timeseries import sessionize

    df = spark.createDataFrame([(1, _dt.datetime(2024, 1, 1))], "uid int, ts timestamp")
    plan = sessionize(df, by="uid")._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_windows(plan) == []
