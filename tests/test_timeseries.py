"""Unit tests for the time-series suite (as-of join, hopping windows,
interval pairs) on handcrafted data with known answers — the oracle
harness covers the real corpus; these pin the semantics in isolation."""

from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture(scope="module")
def ts_dir(spark, tmp_path_factory):
    """A tiny events.parquet with hand-checkable timestamps."""
    d = tmp_path_factory.mktemp("tsdata")

    def t(m, s=0, us=0):
        return dt.datetime(2024, 1, 1, 0, m, s, us)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t(0), 7, "view", 10.0, "{}"),
        (2, t(5), 7, "click", 1.0, "{}"),   # -> view@0
        (3, t(6), 7, "view", 20.0, "{}"),
        (4, t(6), 7, "click", 2.0, "{}"),   # same instant -> view@6
        (5, t(9), 7, "click", 3.0, "{}"),   # -> view@6
        (6, t(1), 8, "click", 4.0, "{}"),   # no prior view -> sentinel
        (7, t(2), 8, "view", 30.0, "{}"),
        (8, t(2), 8, "view", 40.0, "{}"),   # duplicate ts: max(value)=40
        (9, t(3), 8, "click", 5.0, "{}"),   # -> view@2 value 40
        # user 9: most recent view has a NULL value — view_ts and
        # view_value must stay in sync (single-struct carry), so the
        # click sees ts@2 with the -1.0 sentinel, NOT the older 50.0
        (10, t(1), 9, "view", 50.0, "{}"),
        (11, t(2), 9, "view", None, "{}"),
        (12, t(3), 9, "click", 6.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_asof_join_semantics(spark, ts_dir):
    from dask_awkward_spark.queries.timeseries import ev_asof_join

    got = {
        r["event_id"]: (r["view_ts"], r["view_value"])
        for r in ev_asof_join(spark, ts_dir).collect()
    }
    assert got[2] == ("2024-01-01 00:00:00", 10.0)
    assert got[4] == ("2024-01-01 00:06:00", 20.0)  # same-instant view visible
    assert got[5] == ("2024-01-01 00:06:00", 20.0)
    assert got[6] == (None, -1.0)  # no prior view -> sentinel
    assert got[9] == ("2024-01-01 00:02:00", 40.0)  # duplicate-ts max(value)
    # null-valued latest view: ts advances to @2, value -> sentinel (the
    # two-window formulation would desync and report 50.0 from @1)
    assert got[12] == ("2024-01-01 00:02:00", -1.0)


def test_interval_pairs_semantics(spark, ts_dir):
    from dask_awkward_spark.queries.timeseries import ev_interval_pairs

    got = {r["user_id"]: r["n_pairs"] for r in ev_interval_pairs(spark, ts_dir).collect()}
    # user 7 events at minutes 0,5,6,6,9: pairs within 60s:
    # (5,6),(5,6),(6,6),(6,9)x2 -> wait: 5->6 twice (ids 3,4), 6->6 once
    # (ids 3<4), 6->9 twice (ids 3->5, 4->5) ... minutes apart: 5 to 6 is
    # 60s exactly (inclusive), 6 to 9 is 180s (out). So: (2,3),(2,4),(3,4).
    assert got[7] == 3
    # user 8 at minutes 1,2,2,3: (6,7),(6,8),(7,8),(7,9),(8,9),(6->3? 120s no)
    assert got[8] == 5
    # user 9 at minutes 1,2,3: (10,11),(11,12); 1->3 is 120s, out
    assert got[9] == 2


def test_hopping_window_double_counts(spark, ts_dir):
    from dask_awkward_spark.queries.timeseries import ev_hopping_window

    out = ev_hopping_window(spark, ts_dir)
    # every event is in exactly 2 overlapping 10-min windows
    total = sum(r["n"] for r in out.collect())
    assert total == 2 * 12
