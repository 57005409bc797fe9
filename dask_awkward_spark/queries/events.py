r"""Event-stream query suite (batch semantics over the ``events`` table;
the streaming module reuses the same windowed-aggregation shapes with
watermarks — SURVEY §2.6 notes streaming is pure uplift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.events import load_events
from .tpch import cents


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive events read (ts encoding has changed across driver rounds —
    nanos-as-long vs plain micros/TIMESTAMP_NTZ); see sources/events.py."""
    return load_events(spark, sf_dir)


def ev_hourly(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("hour", "ts").cast("string").alias("hour_ts"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("value"))).alias("value_c"))
    )


EV_HOURLY_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts,
       count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1
"""


def ev_tumbling_window(spark, sf_dir):
    """5-minute tumbling windows via F.window — identical operator to the
    streaming path (readStream + withWatermark reuses this expression)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("w_start"), "event_type", "n")
    )


EV_TUMBLING_SQL = """
SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR) AS w_start,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""


def ev_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    session counter per user — the batch twin of session_window()."""
    from ..functions.timeseries import sessionize

    ev = _ev(spark, sf_dir)
    sess = sessionize(
        ev, by="user_id", on="ts", gap=1800, tie_break=["event_id"], out_col="sess_id"
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.max("sess_id").cast("bigint").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_sess_len"),
        )
    )


EV_SESSION_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM gapped
), per_sess AS (
  SELECT user_id, sess_id, count(*) AS n_events FROM sess GROUP BY 1, 2
)
SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events, max(n_events) AS max_sess_len
FROM per_sess GROUP BY user_id
"""


def ev_json_props(spark, sf_dir):
    """Extract a typed field from the JSON props column, aggregate."""
    ev = _ev(spark, sf_dir)
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("bigint")
    return (
        ev.select((k % 10).alias("k_mod"), "value")
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("value"))).alias("v_c"))
    )


EV_JSON_SQL = """
SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 AS k_mod,
       count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_c
FROM events GROUP BY 1
"""


def ev_type_stats(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("total_c"),
        F.min("ts").cast("string").alias("first_ts"),
        F.max("ts").cast("string").alias("last_ts"),
        F.countDistinct("user_id").alias("n_users"),
    )


EV_TYPE_SQL = """
SELECT event_type, count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c,
       CAST(min(ts) AS VARCHAR) AS first_ts, CAST(max(ts) AS VARCHAR) AS last_ts,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


QUERIES = {
    "ev_hourly": ev_hourly,
    "ev_tumbling_window": ev_tumbling_window,
    "ev_sessionize": ev_sessionize,
    "ev_json_props": ev_json_props,
    "ev_type_stats": ev_type_stats,
}

ORACLES = {
    "ev_hourly": EV_HOURLY_SQL,
    "ev_tumbling_window": EV_TUMBLING_SQL,
    "ev_sessionize": EV_SESSION_SQL,
    "ev_json_props": EV_JSON_SQL,
    "ev_type_stats": EV_TYPE_SQL,
}
