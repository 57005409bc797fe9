"""Engine tunables — the analogue of the reference's ``dask_awkward.config``
(awkward.yaml, loaded in its __init__.py:4-8). Each reference knob maps to
the Spark mechanism that subsumes it; ``get``/``set`` are thin wrappers
over the session conf for the runtime-settable ones.

| reference knob (awkward.yaml)            | here                                      |
|------------------------------------------|-------------------------------------------|
| ``aggregation.split-every`` (=8)         | Spark partial+final hash agg; AQE picks   |
|                                          | fan-in at runtime (`adaptive.enabled`)    |
| ``optimization.enabled`` / ``which``     | Catalyst — always on, not user-toggled    |
| ``optimization.columns-opt-formats``     | nested-schema pruning conf (below)        |
| ``optimization.on-fail``                 | n/a — analysis errors raise at plan time  |
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: runtime-settable knobs this engine actually honors, with the Spark conf
#: each one aliases. Scan-split sizing is the 100 TB lever: raise it on a
#: real cluster so tasks stay coarse; lower it to parallelize small files.
KNOBS = {
    "columns-opt": "spark.sql.optimizer.nestedSchemaPruning.enabled",
    "scan-split-bytes": "spark.sql.files.maxPartitionBytes",
    "shuffle-partitions": "spark.sql.shuffle.partitions",
    "adaptive": "spark.sql.adaptive.enabled",
}


def get(spark: SparkSession, knob: str) -> str:
    return spark.conf.get(KNOBS[knob])


def set(spark: SparkSession, knob: str, value) -> None:  # noqa: A001
    spark.conf.set(KNOBS[knob], str(value))
