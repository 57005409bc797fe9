"""Time-series operators the reference lacks entirely (capability uplift,
in the spirit of SURVEY §2.6's streaming note): as-of join, hopping
(sliding) windows, and bounded interval self-joins — the event-analytics
shapes a training-data/telemetry pipeline needs at 100 TB.

Scale designs:
- as-of join: NO range join — union the two streams tagged, one shuffle
  on user_id, and a running last-non-null window carries the reference
  side forward. Same cost as any per-key window.
- hopping windows: each event expands to exactly window/slide buckets
  row-locally, then one hash aggregate. Spark's F.window does this
  natively; the oracle unnests the same bucket list.
- interval self-join: time is bucketed at the interval width, the later
  event probes its own and the previous bucket (two keys, row-local
  explode) and joins the earlier side's single bucket key — an equi-join
  whose quadratic work is confined to 60-second buckets per user, never
  an unbounded theta-join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.events import epoch_seconds
from .events import _ev


def ev_asof_join(spark, sf_dir):
    """For each click, the most recent view at-or-before it per user
    (LEFT ASOF semantics). Views are pre-aggregated to one row per
    (user, ts) — max(value) — so tie-breaks are engine-independent."""
    # SINGLE scan + single user_id shuffle: no view pre-aggregation pass.
    # The old shape (filter->groupBy(user,ts)->max ∪ filter) scanned events
    # twice and paid an extra (user_id, ts) shuffle; ordering same-ts views
    # by ascending value makes last() pick the max-value view, which is
    # exactly what the pre-agg max computed. Ordering among same-ts clicks
    # is irrelevant: last() only captures view structs, and views sort
    # before clicks at identical ts (is_click tiebreak), so a same-instant
    # view is visible to the click — matching ASOF's ts >= ts'.
    merged = (
        _ev(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "view", F.col("value")).alias("view_value"),
            (F.col("event_type") == "click").cast("int").alias("is_click"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "view_value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry (ts, value) as ONE struct through a single ignorenulls last():
    # two independent windows would desync when the most recent view's
    # value is NULL (ts advances, value skips back to an older view)
    merged = merged.select(
        "user_id",
        "ts",
        "event_id",
        "is_click",
        F.last(
            F.when(
                F.col("is_click") == 0,
                F.struct(F.col("ts").alias("vts"), F.col("view_value").alias("vv")),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("v"),
    )
    return merged.filter(F.col("is_click") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("click_ts"),
        F.col("v.vts").cast("string").alias("view_ts"),
        # no-prior-view / null-valued-view sentinel (values are
        # non-negative); a NULL double would hash as NaN through the
        # oracle's pandas path
        F.coalesce(F.col("v.vv"), F.lit(-1.0)).alias("view_value"),
    )


EV_ASOF_SQL = """
WITH views AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
       CAST(c.ts AS VARCHAR) AS click_ts,
       CAST(v.ts AS VARCHAR) AS view_ts,
       coalesce(v.view_value, -1.0) AS view_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def ev_hopping_window(spark, sf_dir):
    """10-minute windows hopping every 5 — each event lands in exactly 2
    overlapping windows (row-local expansion inside F.window, then one
    hash aggregate)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
        .select(
            F.col("w.start").cast("string").alias("w_start"),
            "event_type",
            "n",
            "value_c",
        )
    )


EV_HOPPING_SQL = """
WITH b AS (
  SELECT event_type, value, time_bucket(INTERVAL '5 minutes', ts) AS b0 FROM events
), expanded AS (
  SELECT event_type, value,
         unnest([b0, b0 - INTERVAL '5 minutes']) AS w_start
  FROM b
)
SELECT CAST(w_start AS VARCHAR) AS w_start, event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM expanded GROUP BY 1, 2
"""


def ev_interval_pairs(spark, sf_dir):
    """Per-user count of event pairs within 60 seconds of each other
    (burst detection). Pairs are ordered (earlier, later) with an id
    tiebreak at equal timestamps so each pair counts once."""
    ev = _ev(spark, sf_dir)
    e = ev.select(
        "event_id",
        "user_id",
        epoch_seconds(F.col("ts")).alias("sec"),
        F.floor(epoch_seconds(F.col("ts")) / 60).alias("b"),
    )
    earlier = e.select(
        F.col("user_id"),
        F.col("event_id").alias("id_a"),
        F.col("sec").alias("sec_a"),
        F.col("b").alias("key"),
    )
    later = e.select(
        "user_id",
        F.col("event_id").alias("id_b"),
        F.col("sec").alias("sec_b"),
        F.explode(F.array(F.col("b"), F.col("b") - 1)).alias("key"),
    )
    pairs = earlier.join(later, ["user_id", "key"]).filter(
        (F.col("sec_b") >= F.col("sec_a"))
        & (F.col("sec_b") - F.col("sec_a") <= 60)
        & (
            (F.col("sec_a") < F.col("sec_b"))
            | ((F.col("sec_a") == F.col("sec_b")) & (F.col("id_a") < F.col("id_b")))
        )
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


EV_INTERVAL_SQL = """
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch(b.ts) >= epoch(a.ts)
 AND epoch(b.ts) - epoch(a.ts) <= 60
 AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
GROUP BY 1
"""


def ev_rolling_user_stats(spark, sf_dir):
    """Per-event rolling 1-hour aggregates per user (RANGE frame on epoch
    seconds): event count and cent-sum over the trailing hour. The RANGE
    frame includes timestamp peers identically in both engines. Scale
    shape: one shuffle on user_id + in-partition sort — identical cost to
    any per-key window at any corpus size."""
    ev = _ev(spark, sf_dir)
    sec = epoch_seconds(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).over(w).alias("sum_c_1h"),
    )


EV_ROLLING_SQL = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_c_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def stream_hopping(spark, sf_dir):
    """Streaming twin of ev_hopping_window (complete mode over the bounded
    source == the batch aggregation, so the same oracle holds)."""
    from ..streaming import stream_tumbling_counts

    return stream_tumbling_counts(
        spark, sf_dir, window="10 minutes", slide="5 minutes"
    )


def stream_interval_pairs(spark, sf_dir):
    """Stream-stream interval self-join (watermarked symmetric hash join,
    bounded state) — same pairing semantics as the batch ev_interval_pairs,
    so the same oracle holds."""
    from ..streaming.windows import stream_interval_pairs as _sip

    return _sip(spark, sf_dir)


QUERIES = {
    "ev_asof_join": ev_asof_join,
    "ev_hopping_window": ev_hopping_window,
    "ev_interval_pairs": ev_interval_pairs,
    "ev_rolling_user_stats": ev_rolling_user_stats,
    "stream_hopping": stream_hopping,
    "stream_interval_pairs": stream_interval_pairs,
}

ORACLES = {
    "ev_asof_join": EV_ASOF_SQL,
    "ev_hopping_window": EV_HOPPING_SQL,
    "ev_interval_pairs": EV_INTERVAL_SQL,
    "ev_rolling_user_stats": EV_ROLLING_SQL,
    "stream_hopping": EV_HOPPING_SQL,
    "stream_interval_pairs": EV_INTERVAL_SQL,
}


# ---- funnel analysis (ordered event-sequence matching) ----

def ev_funnel(spark, sf_dir):
    """Strict-order funnel view → click → purchase: a user converts at
    step k if there exist events e1 < e2 < ... <= ek of the right types in
    timestamp order. Computed with per-user MIN-over-filtered-prefix
    cascades: first view, first click AFTER that view, first purchase
    AFTER that click — one hash aggregation per step over a single
    user_id shuffle (conditional aggs, no self-joins, no window buffers).
    Ties broken by event_id so the cascade is deterministic."""
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_type", epoch_seconds(F.col("ts")).alias("sec"), "event_id"
    )
    # step 1: first view per user (ts, id) — min struct orders by (sec, id)
    k = F.struct(F.col("sec"), F.col("event_id"))
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(k).alias("v")
    )
    e2 = ev.filter(F.col("event_type") == "click").join(s1, "user_id")
    s2 = (
        e2.filter(
            (F.col("sec") > F.col("v.sec"))
            | ((F.col("sec") == F.col("v.sec")) & (F.col("event_id") > F.col("v.event_id")))
        )
        .groupBy("user_id")
        .agg(F.min(k).alias("c"))
    )
    e3 = ev.filter(F.col("event_type") == "purchase").join(s2, "user_id")
    s3 = (
        e3.filter(
            (F.col("sec") > F.col("c.sec"))
            | ((F.col("sec") == F.col("c.sec")) & (F.col("event_id") > F.col("c.event_id")))
        )
        .groupBy("user_id")
        .agg(F.min(k).alias("p"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_view"),
            F.count(F.col("c.sec")).alias("n_view_click"),
            F.count(F.col("p.sec")).alias("n_view_click_purchase"),
        )
    )


EV_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch(ts) AS sec, event_id FROM events
), s1 AS (
  SELECT user_id, min(ROW(sec, event_id)) AS v FROM e WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(ROW(sec, event_id)) AS c
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE event_type = 'click' AND ROW(sec, event_id) > v
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(ROW(sec, event_id)) AS p
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE event_type = 'purchase' AND ROW(sec, event_id) > c
  GROUP BY e.user_id
)
SELECT count(*) AS n_view,
       count(c) AS n_view_click,
       count(p) AS n_view_click_purchase
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


QUERIES.update({"ev_funnel": ev_funnel})
ORACLES.update({"ev_funnel": EV_FUNNEL_SQL})


# ---- hypertable-style cascading rollup (functions/timeseries.py) ----

def ev_rollup_cascade(spark, sf_dir):
    """Hour -> day -> week continuous-aggregate cascade: the hourly level
    aggregates raw events ONCE; day and week re-aggregate the level below
    (sums of sums, min of mins) — at 100 TB only the first level reads the
    corpus. Buckets are epoch-second bigints (integer math, engine-neutral).
    The oracle aggregates each level directly from raw rows — equal
    because the re-aggregation is exact for sum/count/min/max."""
    from ..functions.timeseries import rollup_cascade
    from .tpch import cents

    ev = _ev(spark, sf_dir).select("ts", cents(F.col("value")).alias("v_c"))
    return rollup_cascade(
        ev,
        "ts",
        [("n", "v_c", "count"), ("value_c", "v_c", "sum"), ("vmax_c", "v_c", "max")],
        [3600, 86400, 604800],
    )


EV_ROLLUP_SQL = """
WITH raw AS (
  SELECT (epoch_us(ts) // 1000000) AS sec, CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
)
SELECT 3600 AS gran, (sec // 3600) * 3600 AS bucket,
       count(*) AS n, CAST(sum(v_c) AS BIGINT) AS value_c, max(v_c) AS vmax_c
FROM raw GROUP BY 2
UNION ALL
SELECT 86400, (sec // 86400) * 86400, count(*), CAST(sum(v_c) AS BIGINT), max(v_c)
FROM raw GROUP BY 2
UNION ALL
SELECT 604800, (sec // 604800) * 604800, count(*), CAST(sum(v_c) AS BIGINT), max(v_c)
FROM raw GROUP BY 2
"""


QUERIES.update({"ev_rollup_cascade": ev_rollup_cascade})
ORACLES.update({"ev_rollup_cascade": EV_ROLLUP_SQL})
