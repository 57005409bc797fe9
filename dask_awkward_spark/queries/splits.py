"""Dataset-management ops for training pipelines: deterministic splits,
reproducible global shuffle, and per-source token-budget capping.

All three follow the hash-gate discipline of ``quota_sampling``
(queries/text.py): randomness is the md5 of a stable key, so results are
engine-deterministic, stable under re-partitioning and re-runs, and
exactly reproducible by the DuckDB oracle — the properties a 100 TB
curation run needs for auditable train/test hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.curation import assign_split, cap_running_budget, hash_key
from .text import _docs


# the md5 hash gate now lives in the public API (functions/curation.py)
_hkey = hash_key


def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/valid/test assignment by doc_id hash — membership is a
    pure function of the id, so later pipeline stages (dedup, filtering,
    re-sharding) can never migrate a document across splits. Row-local
    gate + one tiny groupBy."""
    df = assign_split(
        _docs(spark, sf_dir), F.col("doc_id"), {"train": 0.90, "valid": 0.05, "test": 0.05}
    )
    return (
        df.select("split", "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


SPLIT_SQL = """
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'f3333333' THEN 'valid'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents
GROUP BY 1
"""


def shuffle_head(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Reproducible global shuffle: training order is the sort order of
    md5(doc_id) — every re-run and every engine derives the same
    permutation. Taking the head compiles to TakeOrderedAndProject
    (per-partition top-k + driver merge, NO shuffle); materializing the
    full shuffled corpus would be one range-partitioned sort, the cheapest
    distributed permutation there is."""
    df = _docs(spark, sf_dir)
    return (
        df.select("doc_id", _hkey(F.col("doc_id")).alias("skey"), "source")
        .orderBy("skey", "doc_id")
        .limit(k)
    )


SHUFFLE_HEAD_SQL = """
SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS skey, source
FROM documents
ORDER BY skey, doc_id
LIMIT 20
"""


def budget_cap_per_source(spark: SparkSession, sf_dir: str, budget: int = 20000) -> DataFrame:
    """Per-domain data budget: walk each source's documents in shuffled
    (hash) order and keep them until the running char total reaches the
    budget — the mixing-weights enforcement step of a corpus build. ONE
    window per source partition (sources shard independently), then a tiny
    per-source aggregate; no global window."""
    df = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    kept = cap_running_budget(df, "source", F.col("doc_id"), "n_chars", budget)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


BUDGET_CAP_SQL = """
WITH run AS (
  SELECT doc_id, source, n_chars,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS start
  FROM documents
)
SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM run WHERE start < 20000
GROUP BY source
"""


QUERIES = {
    "split_train_valid_test": split_train_valid_test,
    "shuffle_head": shuffle_head,
    "budget_cap_per_source": budget_cap_per_source,
}

ORACLES = {
    "split_train_valid_test": SPLIT_SQL,
    "shuffle_head": SHUFFLE_HEAD_SQL,
    "budget_cap_per_source": BUDGET_CAP_SQL,
}
