"""Custom stateful streaming operator via applyInPandasWithState —
the Structured-Streaming analogue of the reference's map_partitions
escape hatch for operators Spark lacks natively.

Example operator: per-user running statistics (event count + value sum,
carried across micro-batches in GroupState). The same shape implements
streaming dedup (state = seen-hash set) or rate limiting.
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import _stream_events

OUTPUT_SCHEMA = "user_id long, n_events long, value_c long"
# cents in state: integer accumulation is exact and order-independent,
# so the operator is oracle-checkable
STATE_SCHEMA = "n long, c long"


def _update_user_stats(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # half-AWAY-from-zero cents, matching F.round / the DuckDB oracle;
        # pandas .round() is half-to-even and diverges on exact .5 cents
        import numpy as np

        v = pdf["value"].dropna().to_numpy() * 100
        c += int(np.sum(np.sign(v) * np.floor(np.abs(v) + 0.5)))
    state.update((n, c))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "value_c": [c]})


def running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-user accumulator over the bounded events stream;
    returns the final update per user after draining the source."""
    ev = _stream_events(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_state_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends every update row; keep the last
    # emission per user (single micro-batch source -> exactly one row each,
    # but stay robust to multi-batch sources)
    tbl = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        tbl.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "value_c")
    )
