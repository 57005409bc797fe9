"""SparkSession factory tuned for the nested-data engine.

Local-mode defaults mirror what we would set on a real cluster:

- AQE on (runtime coalesce, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong somewhere; AQE fixes it per-stage.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  becomes ~2-3x total executor cores and AQE coalesces down.
- Nested-schema pruning on — the Spark-native analogue of the reference's
  necessary-columns optimization (dask_awkward lib/optimize.py:86-223): struct
  subfields used by the query are pushed into the Parquet scan.
- Arrow enabled for every Python<->JVM exchange (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "dask_awkward_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # scan split size: 32m default keeps single-digit-MB bench files
        # parallel across local cores while staying a sane task size for a
        # cluster (raise to 128m+ via env for large deployments)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "32m"),
        )
        .config("spark.sql.files.openCostInBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        # local[k] has exactly one locality domain (every task is
        # process-local), so the delay-scheduling wait can only ADD
        # latency — a coalesce over parallelized partitions stalls the
        # full 3s default. On a real cluster keep/raise the default via
        # this env (delay scheduling earns its keep there).
        .config(
            "spark.locality.wait",
            os.environ.get("SPARK_GRAFT_LOCALITY_WAIT", "0s"),
        )
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert explicitly (sources/events loader)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dderby.stream.error.file=/tmp/derby.log")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_hot(spark: SparkSession, path: str) -> "DataFrame":
    """Parquet read that guarantees scan parallelism for CPU-heavy consumers.

    Parquet splits on row-group boundaries; a single-row-group file (the
    testdata's ``documents.parquet`` is exactly that) is unsplittable, so
    every downstream per-row expression — md5 shingles, MinHash signatures,
    token stats — runs on ONE core no matter how many the session has.
    One cheap round-robin shuffle of the raw rows engages them all; at
    real scale (many files / many row groups) the guard never fires
    because the scan already yields >= parallelism splits.
    """
    from .sources.tables import scan_partitions_estimate

    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    est = scan_partitions_estimate(
        spark, path, fallback=lambda: df.rdd.getNumPartitions()
    )
    if est < max(2, target // 2):
        df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict:
    """Read every benchmark table in ``sf_dir`` and register temp views.

    Returns {name: DataFrame}. Scans are lazy — registering all ten costs
    only footer reads. Each table goes through the adaptive loader
    (sources/tables.py), so a re-encoded file is normalized back to the
    canonical schema (or fails loudly) for external callers too, not
    just the internal queries.
    """
    from .sources.tables import load_table

    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
