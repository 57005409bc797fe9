"""Subprocess body for the TWO-PROCESS commit race soak
(tests/test_snapshot_race.py): a real second writer — own interpreter,
own JVM/SparkSession — hammering the same snapshot table with appends
and copy-on-write deletes over ITS OWN key space. Not a pytest module
(no ``test_`` prefix). The worker records the row-set after each of
its serial ops; the parent checks every surviving table version's
projection onto this worker's key space equals one of those states,
in monotone order — the linearizability claim the CAS/rebase
machinery makes."""

from __future__ import annotations

import json
import sys


def main() -> None:
    table, wid, n_ops, out_file = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"race-worker-{wid}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    from dask_awkward_spark.sources.snapshot import (
        SnapshotConflictError,
        snapshot_delete,
        snapshot_write,
    )
    from dask_awkward_spark.sources.sqlface import snapshot_sql_script

    base = 100_000 * wid
    mine: "set[int]" = set()
    states = [sorted(mine)]
    for i in range(n_ops):
        if i % 4 == 3 and mine:
            # an ATOMIC two-statement script racing real rival commits:
            # the staged-txn publish CAS loses whenever the rival moved
            # the head mid-script — retry re-stages against the new
            # head; the net effect lands as ONE commit or not at all
            ins = list(range(base + i * 10, base + i * 10 + 10))
            lo, hi = base + (i - 3) * 10, base + (i - 3) * 10 + 5
            vals = ", ".join(f"({x})" for x in ins)
            script = (
                f"INSERT INTO t VALUES {vals};"
                f"DELETE FROM t WHERE id >= {lo} AND id < {hi};"
            )
            while True:
                try:
                    snapshot_sql_script(
                        spark, script, {"t": table}, on_error="atomic"
                    )
                    break
                except SnapshotConflictError:
                    continue  # rival won the publish CAS: re-stage
            mine = {
                x for x in (mine | set(ins)) if not (lo <= x < hi)
            }
        elif i % 3 == 2 and mine:
            lo = base + (i - 2) * 10
            hi = lo + 5
            snapshot_delete(
                spark, table, [("id", ">=", lo), ("id", "<", hi)]
            )
            mine = {x for x in mine if not (lo <= x < hi)}
        else:
            rows = list(range(base + i * 10, base + i * 10 + 10))
            df = spark.createDataFrame([(x,) for x in rows], "id bigint")
            snapshot_write(df.coalesce(1), table, mode="append")
            mine |= set(rows)
        states.append(sorted(mine))
    with open(out_file, "w") as f:
        json.dump({"worker": wid, "states": states}, f)
    spark.stop()


if __name__ == "__main__":
    main()
