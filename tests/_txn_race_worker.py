"""Subprocess bodies for the MULTI-TABLE transaction race soak
(tests/test_snapshot_race.py::test_multi_table_txn_race_with_reader,
round 12 — VERDICT r11 item 6): a real second process exercises the
journaled two-phase publish under fire. Roles:

- ``txnwriter``: N transactions, each appending the SAME marker batch
  to BOTH tables inside one ``snapshot_txn`` — the journal publish
  races the rival's commits and retries on conflict.
- ``reader``: a rival READER hammering both tables throughout the
  writer's publish windows — every read must succeed (the recovery
  path runs under fire) and each table's observed head rows must be
  MONOTONE (a reader can never see a committed row disappear).
- ``appender``: a rival WRITER appending its own key space to one of
  the tables — its commits land in the txn's pending windows, where
  ``_txn_block_or_help`` must either abort an undecided journal or
  complete a committed one; no update on either side may be lost.

Not a pytest module (no ``test_`` prefix)."""

from __future__ import annotations

import json
import sys


def main() -> None:
    role, ta, tb, n, out_file = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
        sys.argv[5],
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"txn-race-{role}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    from dask_awkward_spark.sources.snapshot import (
        SnapshotConflictError,
        snapshot_read,
        snapshot_txn,
        snapshot_write,
    )

    report: dict = {"role": role}
    if role == "txnwriter":
        done = []
        for i in range(n):
            df = spark.createDataFrame([(i,)], "marker bigint")
            while True:
                try:
                    with snapshot_txn():
                        snapshot_write(df, ta, mode="append")
                        snapshot_write(df, tb, mode="append")
                    break
                except SnapshotConflictError:
                    continue  # a rival moved a head: restage
            done.append(i)
        report["committed"] = done
    elif role == "reader":
        seen_a: "set[int]" = set()
        seen_b: "set[int]" = set()
        anomalies = []
        for _ in range(n):
            rows_a = {
                r.marker
                for r in snapshot_read(spark, ta).collect()
                if r.marker is not None and r.marker < 100_000
            }
            rows_b = {
                r.marker
                for r in snapshot_read(spark, tb).collect()
                if r.marker is not None and r.marker < 100_000
            }
            if not seen_a <= rows_a:
                anomalies.append(
                    f"A regressed: lost {sorted(seen_a - rows_a)[:5]}"
                )
            if not seen_b <= rows_b:
                anomalies.append(
                    f"B regressed: lost {sorted(seen_b - rows_b)[:5]}"
                )
            seen_a, seen_b = rows_a, rows_b
        report["anomalies"] = anomalies
        report["last_a"] = sorted(seen_a)
        report["last_b"] = sorted(seen_b)
    elif role == "appender":
        mine = []
        for i in range(n):
            df = spark.createDataFrame(
                [(100_000 + i,)], "marker bigint"
            )
            snapshot_write(df, tb, mode="append")
            mine.append(100_000 + i)
        report["mine"] = mine
    else:
        raise SystemExit(f"unknown role {role!r}")
    with open(out_file, "w") as f:
        json.dump(report, f)
    spark.stop()


if __name__ == "__main__":
    main()
