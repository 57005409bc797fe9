r"""Coverage suite: the remaining SURVEY §2 inventory rows — IO round
trips through the engine's sinks, the last reducers (prod/var/std),
field mutation, NaN handling, regex string kernels, correlation uplift,
and dedup application (keep-list anti-join).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import NestedArray
from ..functions import strings as S
from ..operators import reducers as red
from ..operators import structure as st
from ..sources.tables import load_table
from ._canon import arr_str, sql_arr_str
from .nested import NESTED_CTE, _nested
from .tpch import cents

_TMP = tempfile.gettempdir()

def _teardown(spark, base, *views):
    """Shared lifecycle-query cleanup: drop the temp views that exist,
    then the scratch dir — one place to change teardown semantics for
    every snapshot lifecycle oracle."""
    import shutil

    for v in views:
        if spark.catalog.tableExists(v):
            spark.catalog.dropTempView(v)
    shutil.rmtree(base, ignore_errors=True)



# ---- IO round trips (scan + sink together in one checked query) ----

def io_parquet_roundtrip(spark, sf_dir):
    """to_parquet → from_parquet round trip preserves content exactly
    (reference lib/io/parquet.py write/read pair)."""
    from ..sources.parquet import from_parquet, to_parquet

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_rt_{sf_tag}_{os.getpid()}.parquet"
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    to_parquet(li, path, compression="zstd")
    back = from_parquet(spark, path)
    df = back.to_df("r")
    return df.select("r.*").groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("l_extendedprice"))).alias("price_c")
    )


IO_PARQUET_RT_SQL = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_returnflag
"""


def io_json_roundtrip(spark, sf_dir):
    """to_json → from_json (line-delimited) round trip (reference
    lib/io/json.py)."""
    from ..sources.json import from_json, to_json

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_rt_{sf_tag}_{os.getpid()}.json"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    to_json(docs, path)
    back = from_json(spark, path).to_df("r")
    return back.select("r.*").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    )


IO_JSON_RT_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang
"""


def io_datasource_scan(spark, sf_dir):
    """Custom Python Data Source scan (the reference's pluggable IO
    protocol, layers/layers.py:68-155, re-expressed on the Spark 4 Python
    Data Source API): a pyarrow row-group reader behind the ``python_io``
    format — one InputPartition per row group (declared parallelism), the
    ``lang = 'en'`` predicate pushed into ``read()`` via pushFilters so
    filtered rows never cross the Python->JVM boundary, then a JVM-side
    hash aggregation. The testdata file has a single row group; a 100 TB
    lake file fans out to one executor task per row group."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from ..sources.datasource import from_datasource

    path = f"{sf_dir}/documents.parquet"
    # footer-only metadata pass; `path` may be a single file or a
    # directory of part files (a written dataset) — either way the
    # descriptor is (file, row_group)
    descriptors = [
        (f, rg)
        for f in pds.dataset(path, format="parquet").files
        for rg in range(pq.ParquetFile(f).num_row_groups)
    ]

    def read_rg(desc):
        import pyarrow.parquet as _pq

        f, rg = desc
        tbl = _pq.ParquetFile(f).read_row_group(
            rg, columns=["doc_id", "lang", "source", "n_chars"]
        )
        yield from tbl.to_pylist()

    df = from_datasource(
        spark,
        read_rg,
        descriptors,
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    return (
        df.filter(F.col("lang") == "en")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
    )


IO_DATASOURCE_SQL = """
SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents WHERE lang = 'en' GROUP BY source
"""


def io_datasource_sink_roundtrip(spark, sf_dir):
    """Full custom-sink transaction loop: documents go out through the
    function sink (write_fn per partition -> jsonl file + descriptor,
    commit_fn writes the manifest exactly once), then come back in
    through the custom source using the MANIFEST's descriptors as the
    partition list — the committed-set contract end to end. Aggregation
    proves content fidelity against the direct-SQL oracle."""
    import json as _json
    import os

    from ..sources.datasource import from_datasource, to_datasource

    import shutil

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"{_TMP}/dakspark_sink_{sf_tag}_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)  # stale parts from prior runs
    os.makedirs(out, exist_ok=True)

    def write_part(rows, _out=out):
        import json
        import os
        import uuid

        p = os.path.join(_out, f"part-{uuid.uuid4().hex[:8]}.jsonl")
        n = 0
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps({"doc_id": r.doc_id, "lang": r.lang, "n_chars": r.n_chars}) + "\n")
                n += 1
        return {"file": p, "rows": n}

    def commit(descs, _out=out):
        import json
        import os

        with open(os.path.join(_out, "_MANIFEST.json"), "w") as fh:
            json.dump(descs, fh)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    to_datasource(docs, write_part, commit)

    manifest = _json.load(open(os.path.join(out, "_MANIFEST.json")))

    def read_part(desc):
        import json

        with open(desc["file"]) as fh:
            for line in fh:
                yield json.loads(line)

    back = from_datasource(
        spark, read_part, manifest, "doc_id bigint, lang string, n_chars bigint"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
        F.min("doc_id").alias("first_doc"),
    )


IO_DATASOURCE_SINK_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM documents GROUP BY lang
"""


# ---- remaining reducers ----

def op_prod_axis1(spark, sf_dir):
    """prod over small exact ints (reference lib/reducers.py:418-449).
    Quantities are 1..50; cap list length effect by using qty mod 3 + 1
    so products stay well inside 2^63."""
    df = _nested(spark, sf_dir)
    small = NestedArray(df, F.transform(F.col("qs"), lambda x: (x.cast("bigint") % 3) + 1))
    return df.select("l_orderkey", red.prod(small, axis=1).col.alias("prod_small"))


OP_PROD_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(coalesce(list_aggregate(list_transform(qs, x -> CAST(x AS BIGINT) % 3 + 1), 'product'), 1) AS BIGINT) AS prod_small
FROM nested
"""


def op_var_std_axis1(spark, sf_dir):
    """var/std per list: (ss - s^2/n)/n from exact whole-number sums →
    identical IEEE arithmetic in both engines (reference
    lib/reducers.py:559-589, :484-514)."""
    df = _nested(spark, sf_dir)
    qs = NestedArray(df, "qs")
    return df.select(
        "l_orderkey",
        red.var(qs, axis=1).col.alias("qty_var"),
        red.std(qs, axis=1).col.alias("qty_std"),
    )


OP_VAR_STD_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CASE WHEN len(qs) > 0 THEN
         (list_aggregate(list_transform(qs, x -> x * x), 'sum')
          - list_aggregate(qs, 'sum') * list_aggregate(qs, 'sum') / len(qs)) / len(qs)
       END AS qty_var,
       CASE WHEN len(qs) > 0 THEN
         sqrt((list_aggregate(list_transform(qs, x -> x * x), 'sum')
               - list_aggregate(qs, 'sum') * list_aggregate(qs, 'sum') / len(qs)) / len(qs))
       END AS qty_std
FROM nested
"""


# ---- field mutation / shape constants / nan ----

def op_with_field(spark, sf_dir):
    """zip → with_field → project round trip (reference with_field,
    lib/structure.py:1056-1087)."""
    df = _nested(spark, sf_dir)
    qs, ps = NestedArray(df, "qs"), NestedArray(df, "ps")
    recs = st.zip({"q": qs, "p": ps})
    recs2 = recs.with_field("v", recs["q"] * recs["p"])
    vsum = red.sum(recs2["v"], axis=1)
    dropped = recs2.without_field("p")
    return df.select(
        "l_orderkey",
        vsum.col.alias("v_sum"),
        F.size(dropped.col).cast("bigint").alias("n_recs"),
    )


OP_WITH_FIELD_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(coalesce(list_aggregate(list_transform(range(len(qs)), i -> qs[i+1] * ps[i+1]), 'sum'), 0) AS DOUBLE) AS v_sum,
       CAST(len(qs) AS BIGINT) AS n_recs
FROM nested
"""


def op_full_like(spark, sf_dir):
    """full_like/ones_like/zeros_like shape-preserving constants
    (reference lib/structure.py:479-505, 672-690, 1234-1252)."""
    df = _nested(spark, sf_dir)
    qs = NestedArray(df, "qs")
    return df.select(
        "l_orderkey",
        arr_str(st.values_astype(st.ones_like(qs), "bigint").col).alias("ones"),
        red.sum(st.values_astype(st.full_like(qs, 7), "bigint"), axis=1).col.alias("sevens_sum"),
    )


OP_FULL_LIKE_SQL = NESTED_CTE + f"""
SELECT l_orderkey,
       {sql_arr_str("list_transform(qs, x -> CAST(1 AS BIGINT))")} AS ones,
       CAST(7 * len(qs) AS BIGINT) AS sevens_sum
FROM nested
"""


def op_nan_to_num(spark, sf_dir):
    """NaN construction + nan_to_num (reference lib/structure.py:600-616).
    sqrt(-1) is NaN in both engines' double math."""
    df = _nested(spark, sf_dir)
    with_nan = NestedArray(
        df, F.transform(F.col("qs"), lambda x: F.sqrt(x - 30.0))
    )  # NaN where q < 30
    fixed = st.nan_to_num(with_nan, nan=-1.0)
    n_nan = red.count_nonzero(
        NestedArray(df, F.transform(fixed.col, lambda x: (x == -1.0).cast("int"))), axis=1
    )
    return df.select("l_orderkey", n_nan.col.cast("bigint").alias("n_nan"))


# sqrt(q-30) is NaN exactly when q < 30 — the oracle states the condition
# directly (DuckDB's sqrt errors on negatives instead of yielding NaN)
OP_NAN_SQL = NESTED_CTE + """
SELECT l_orderkey,
       CAST(len(list_filter(qs, x -> x < 30.0)) AS BIGINT) AS n_nan
FROM nested
"""


# ---- regex string kernels ----

def str_regex2(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    t = NestedArray(df, "text")
    return df.select(
        "doc_id",
        S.count_substring_regex(t, "[ao]").col.cast("bigint").alias("n_ao"),
        S.find_substring_regex(t, "v[a-z]+e").col.cast("bigint").alias("pos_ve"),
        S.replace_slice(t, 2, 6, "#").col.alias("spliced"),
        F.size(S.split_pattern(t, "data").col).cast("bigint").alias("n_parts"),
    )


STR_REGEX2_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '[ao]')) - 1 AS BIGINT) AS n_ao,
       CAST(CASE WHEN regexp_matches(text, 'v[a-z]+e')
                 THEN length(regexp_replace(text, 'v[a-z]+e.*', '', 's'))
                 ELSE -1 END AS BIGINT) AS pos_ve,
       substring(text, 1, 2) || '#' || substring(text, 7) AS spliced,
       CAST(len(string_split(text, 'data')) AS BIGINT) AS n_parts
FROM documents
"""


# ---- correlation / covariance uplift (NotImplemented in the reference,
#      lib/reducers.py:257-282) ----

def q_corr_covar(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_qd"),
    )


Q_CORR_SQL = """
SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       round(covar_pop(l_quantity, l_discount), 6) AS covar_qd
FROM lineitem
"""


# ---- dedup application: materialize the survivor set ----

def dedup_apply(spark, sf_dir):
    """Apply exact dedup: keep the min-doc_id representative of each
    md5(text) group; anti-join drops the rest. The standard 'build
    keep-list, subtract' pipeline shape."""
    docs = load_table(spark, sf_dir, "documents")
    keep = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("keep_id"))
    survivors = docs.alias("d").join(
        keep.alias("k"),
        (F.md5(F.col("d.text")) == F.col("k.h")) & (F.col("d.doc_id") == F.col("k.keep_id")),
        "left_semi",
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )


DEDUP_APPLY_SQL = """
WITH keep AS (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM documents GROUP BY 1)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
WHERE EXISTS (SELECT 1 FROM keep WHERE keep.h = md5(text) AND keep.keep_id = doc_id)
GROUP BY lang
"""


def op_argcartesian(spark, sf_dir):
    """Index-pair cartesian (reference lib/structure.py:92-122)."""
    df = _nested(spark, sf_dir)
    qs, ps = NestedArray(df, "qs"), NestedArray(df, "ps")
    prod = st.argcartesian([qs, ps])
    ex = df.select("l_orderkey", F.explode(prod.col).alias("pr"))
    return ex.select(
        "l_orderkey",
        F.col("pr.0").cast("bigint").alias("i"),
        F.col("pr.1").cast("bigint").alias("j"),
    )


OP_ARGCARTESIAN_SQL = NESTED_CTE + """
SELECT l_orderkey, pr.i AS i, pr.j AS j FROM (
  SELECT l_orderkey,
         unnest(flatten(list_transform(range(len(qs)),
           a -> list_transform(range(len(ps)),
             b -> {'i': CAST(a AS BIGINT), 'j': CAST(b AS BIGINT)})))) AS pr
  FROM nested
)
"""


def op_ravel(spark, sf_dir):
    """ravel / flatten(axis=None): depth-2 → flat leaves
    (reference lib/structure.py:753-772)."""
    from .nested import _nested2

    df = _nested2(spark, sf_dir)
    a = NestedArray(df, "qss")
    flat = st.ravel(a)
    return flat.to_df("q")


OP_RAVEL_SQL = "SELECT l_quantity AS q FROM lineitem"


def io_snapshot_roundtrip(spark, sf_dir):
    """Snapshot-table lifecycle under an oracle: commit v1 (overwrite,
    range-clustered on l_orderkey), v2 (append), v3 (an overwrite
    decoy), then TIME-TRAVEL back to v2 with a data-skipping predicate.
    The decoy proves version isolation; the pruned+filtered read must
    equal plain SQL over the source rows — files are dropped from the
    scan only when their footer min/max provably excludes the
    predicate, so skipping can never change the answer."""
    import shutil

    from ..sources.snapshot import snapshot_read, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    # pid-scoped: a concurrent run (bench vs oracle harness) must never
    # rmtree the manifests this process is mid-read on
    path = f"{_TMP}/dakspark_snap_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)  # stale manifests from prior runs
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    try:
        snapshot_write(
            li.filter(F.col("l_orderkey") < 500).repartitionByRange(4, "l_orderkey"),
            path,
        )
        snapshot_write(
            li.filter((F.col("l_orderkey") >= 500) & (F.col("l_orderkey") < 1000))
            .repartitionByRange(4, "l_orderkey"),
            path,
            mode="append",
        )
        snapshot_write(li.filter(F.col("l_orderkey") >= 1000).limit(100), path)  # decoy head
        back = snapshot_read(spark, path, version=2, where=[("l_orderkey", "<", 750)])
        # materialize BEFORE dropping the table the lazy plan reads from
        return back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("l_extendedprice"))).alias("price_c"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_RT_SQL = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM lineitem WHERE l_orderkey < 750 GROUP BY l_returnflag
"""


def io_snapshot_merge(spark, sf_dir):
    """Snapshot MERGE + UPDATE lifecycle under an oracle: commit the low
    two-thirds of customers as v1 (range-clustered on the key), MERGE a
    source covering the middle third (updates, bal+1000) plus the top
    third (inserts) in one atomic upsert, then copy-on-write UPDATE the
    BUILDING segment (bal doubled, RHS over the merged value). The read
    back of the head must equal plain SQL describing the final state —
    proving clause routing (update vs insert), file pruning, and
    update-after-merge composition all preserve content exactly."""
    import shutil

    from ..sources.snapshot import (
        snapshot_merge,
        snapshot_read,
        snapshot_update,
        snapshot_write,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    # pid-scoped: concurrent runs must not stomp each other's manifests
    path = f"{_TMP}/dakspark_snapmrg_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    hi = cust.agg(F.max("c_custkey")).first()[0]
    lo_cut, hi_cut = hi // 3, 2 * hi // 3
    try:
        snapshot_write(
            cust.filter(F.col("c_custkey") <= hi_cut).repartitionByRange(4, "c_custkey"),
            path,
        )
        src = cust.filter(F.col("c_custkey") > lo_cut).withColumn(
            "bal", F.col("bal") + 1000
        )
        snapshot_merge(spark, path, src, on=["c_custkey"])
        snapshot_update(spark, path, [("seg", "=", "BUILDING")], {"bal": F.col("bal") * 2})
        # materialize BEFORE dropping the table the lazy plan reads from
        return (
            snapshot_read(spark, path)
            .select("c_custkey", "seg", cents(F.col("bal")).alias("bal_c"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def io_snapshot_mor_delete(spark, sf_dir):
    """Merge-on-read DELETE under an oracle: two stacked deletion
    vectors (one predicate per commit, no data file rewritten) must
    make reads equal plain SQL over the surviving rows — proving the
    position-level anti-join, DV composition across versions, and the
    prune/skip interplay preserve content exactly."""
    import shutil

    from ..sources.snapshot import snapshot_delete, snapshot_read, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapmor_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    try:
        snapshot_write(docs.repartitionByRange(4, "doc_id"), path)
        s1 = snapshot_delete(spark, path, [("lang", "=", "en")], strategy="merge-on-read")
        s2 = snapshot_delete(spark, path, [("doc_id", "<", 100)], strategy="merge-on-read")
        assert s1["rewritten_files"] == 0 and s2["rewritten_files"] == 0
        return (
            snapshot_read(spark, path)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_MOR_SQL = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents WHERE (lang <> 'en' OR lang IS NULL) AND doc_id >= 100 GROUP BY lang
"""


def io_snapshot_cdf(spark, sf_dir):
    """Row-level change feed under an oracle: a copy-on-write DELETE
    (v2) then UPDATE (v3) must produce exactly the delete rows plus
    update pre/post images, each stamped with its commit version — the
    oracle reconstructs the same records from the raw table with plain
    SQL, proving the commit-time change recording is lossless."""
    import shutil

    from ..sources.snapshot import (
        snapshot_changes,
        snapshot_delete,
        snapshot_update,
        snapshot_write,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapcdf_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    try:
        snapshot_write(docs.repartitionByRange(4, "doc_id"), path)            # v1
        snapshot_delete(spark, path, [("lang", "=", "en")])                   # v2
        snapshot_update(
            spark, path, [("doc_id", "<", 200)], {"n_chars": F.col("n_chars") + 1000}
        )                                                                     # v3
        return (
            snapshot_changes(spark, path, since=1, row_level=True)
            .select("doc_id", "n_chars", "_change_type", "_commit_version")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_CDF_SQL = """
SELECT doc_id, n_chars, 'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
FROM documents WHERE lang = 'en'
UNION ALL
SELECT doc_id, n_chars, 'update_preimage', CAST(3 AS BIGINT)
FROM documents WHERE (lang <> 'en' OR lang IS NULL) AND doc_id < 200
UNION ALL
SELECT doc_id, n_chars + 1000, 'update_postimage', CAST(3 AS BIGINT)
FROM documents WHERE (lang <> 'en' OR lang IS NULL) AND doc_id < 200
"""


def io_snapshot_partitioned(spark, sf_dir):
    """Hive-partitioned snapshot lifecycle under an oracle: write orders
    partitioned by o_orderstatus (v1, two-thirds of keys), append the
    rest under the STICKY spec (v2, no partition_by argument), then
    copy-on-write DELETE the URGENT rows (v3 — the rewrite must respect
    the partition layout). A head read with a partition predicate must
    (a) provably skip every other partition's files — asserted on the
    manifest before returning — and (b) equal plain SQL over the
    surviving rows, proving partition pruning never changes answers."""
    import shutil

    from ..sources import snapshot as snap
    from ..sources.snapshot import snapshot_delete, snapshot_read, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snappart_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    cut = 2 * hi // 3
    try:
        snapshot_write(
            orders.filter(F.col("o_orderkey") <= cut),
            path,
            partition_by=["o_orderstatus"],
        )
        snapshot_write(orders.filter(F.col("o_orderkey") > cut), path, mode="append")
        snapshot_delete(spark, path, [("o_orderpriority", "=", "1-URGENT")])
        m = snap._read_manifest(path, snap._versions(path)[-1])
        where = [("o_orderstatus", "=", "F")]
        kept, skipped = snap._prune_files(m, where, None)
        assert skipped > 0 and all("o_orderstatus=F/" in f for f in kept), (
            "partition pruning must confine the scan to the F partition"
        )
        return (
            snapshot_read(spark, path, where=where)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("o_totalprice"))).alias("price_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_PART_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority <> '1-URGENT'
GROUP BY o_orderpriority
"""


def io_snapshot_widen(spark, sf_dir):
    """Type-widening lifecycle under an oracle: v1 commits the low keys
    at NARROW types (int key, float balance), a merge_schema append
    lands the high keys WIDE (bigint, double) — the recorded schema
    widens losslessly — and a narrow third-producer append then upcasts
    into the wide table. Reading the mixed-width lineage back must equal
    plain SQL over all source rows at the wide types, proving both
    reader faces upcast old files exactly (Delta type-widening
    semantics)."""
    import shutil

    from ..sources.snapshot import snapshot_read, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapwide_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    hi = cust.agg(F.max("c_custkey")).first()[0]
    lo_cut, hi_cut = hi // 3, 2 * hi // 3
    try:
        snapshot_write(  # narrow generation: int key, float balance
            cust.filter(F.col("c_custkey") <= lo_cut).select(
                F.col("c_custkey").cast("int").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.col("c_acctbal").cast("float").alias("bal"),
            ),
            path,
        )
        snapshot_write(  # wide generation: widens the recorded schema
            cust.filter(
                (F.col("c_custkey") > lo_cut) & (F.col("c_custkey") <= hi_cut)
            ).select(
                F.col("c_custkey").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.col("c_acctbal").alias("bal"),
            ),
            path,
            mode="append",
            merge_schema=True,
        )
        snapshot_write(  # late narrow producer upcasts into the wide table
            cust.filter(F.col("c_custkey") > hi_cut).select(
                F.col("c_custkey").cast("int").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.col("c_acctbal").cast("float").alias("bal"),
            ),
            path,
            mode="append",
            merge_schema=True,
        )
        # group by segment; balances summed as exact cents. The narrow
        # generations round-tripped through float32, so the oracle casts
        # the same rows through REAL to hit identical values.
        return (
            snapshot_read(spark, path)
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("bal"))).alias("bal_c"),
                F.max("k").alias("max_k"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_WIDEN_SQL = """
WITH mx AS (SELECT max(c_custkey) AS hi FROM customer),
lineage AS (
  SELECT c_custkey AS k, c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS REAL) AS DOUBLE) AS bal
  FROM customer, mx WHERE c_custkey <= hi // 3 OR c_custkey > 2 * hi // 3
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal
  FROM customer, mx WHERE c_custkey > hi // 3 AND c_custkey <= 2 * hi // 3
)
SELECT seg, count(*) AS n,
       CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c,
       max(k) AS max_k
FROM lineage GROUP BY seg
"""


def io_snapshot_optimize(spark, sf_dir):
    """Maintenance-path lifecycle under an oracle: a returnflag-
    partitioned table built from two appends gets (a) a SCOPED compact
    (OPTIMIZE WHERE returnflag='A' — only that partition's files
    rewrite, asserted), then (b) a partition-aligned DELETE of the 'N'
    partition that must drop whole files METADATA-ONLY (zero rewrites,
    asserted) with exact row accounting via snapshot_count. The final
    read must equal plain SQL over the surviving rows — proving neither
    maintenance op can change answers."""
    import shutil

    from ..sources import snapshot as snap
    from ..sources.snapshot import (
        snapshot_compact,
        snapshot_count,
        snapshot_delete,
        snapshot_read,
        snapshot_write,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapopt_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    hi = li.agg(F.max("l_orderkey")).first()[0]
    try:
        snapshot_write(
            li.filter(F.col("l_orderkey") <= hi // 2),
            path,
            partition_by=["l_returnflag"],
        )
        snapshot_write(li.filter(F.col("l_orderkey") > hi // 2), path, mode="append")
        before = snap._read_manifest(path, 2)["files"]
        v = snapshot_compact(spark, path, where=[("l_returnflag", "=", "A")])
        m = snap._read_manifest(path, v)
        a_before = [f for f in before if "l_returnflag=A/" in f]
        a_after = [f for f in m["files"] if "l_returnflag=A/" in f]
        assert len(a_after) < len(a_before), "scoped compact must merge A's files"
        assert set(m["files"]) - set(a_after) == set(before) - set(a_before), (
            "scoped compact must carry every other partition verbatim"
        )
        res = snapshot_delete(spark, path, [("l_returnflag", "=", "N")])
        assert res["rewritten_files"] == 0 and res["dropped_files"] > 0, (
            "partition-aligned delete must be metadata-only"
        )
        assert snapshot_count(spark, path) == snapshot_count(
            spark, path, version=v
        ) - res["removed_rows"]
        return (
            snapshot_read(spark, path)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
                F.sum(cents(F.col("l_extendedprice"))).alias("price_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_OPT_SQL = """
SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM lineitem WHERE l_returnflag <> 'N' GROUP BY l_returnflag
"""


IO_SNAPSHOT_MERGE_SQL = """
WITH mx AS (SELECT max(c_custkey) AS hi FROM customer),
merged AS (
  SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal
  FROM customer, mx WHERE c_custkey <= hi // 3
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal + 1000
  FROM customer, mx WHERE c_custkey > hi // 3
)
SELECT c_custkey, seg,
       CAST(round((CASE WHEN seg = 'BUILDING' THEN bal * 2 ELSE bal END) * 100) AS BIGINT) AS bal_c
FROM merged
"""


def q_sql_snapshot(spark, sf_dir):
    """SQL face under an oracle: a snapshot lifecycle (hive-partitioned
    write, MOR delete via deletion vectors) consumed ONLY through
    ``spark.sql`` over a :func:`snapshot_view` pinned at the DML
    version. A decoy append lands AFTER registration — the pinned view
    must not see it (VERSION AS OF semantics), and the deletion vectors
    + partition layout must carry through the SQL face transparently.
    Both properties are load-bearing for the hash match; the MOR shape
    is additionally asserted in-query (zero rewritten files)."""
    import shutil

    from ..sources.snapshot import snapshot_delete, snapshot_view, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapsql_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    view = f"dak_sql_snapshot_{os.getpid()}"
    try:
        snapshot_write(  # v1: hive layout on the flag column
            li.filter(F.col("l_orderkey") < 1500),
            path,
            partition_by=["l_returnflag"],
        )
        stats = snapshot_delete(  # v2: DVs, no rewrite
            spark, path, [("l_quantity", "<", 10)], strategy="merge-on-read"
        )
        assert stats["rewritten_files"] == 0 and stats["removed_rows"] > 0, (
            "the lifecycle must exercise deletion vectors, not copy-on-write"
        )
        snapshot_view(spark, path, view, version=2)  # pin BEFORE the decoy
        snapshot_write(  # v3 decoy: must be invisible to the pinned view
            li.filter(F.col("l_orderkey") >= 1500).limit(200), path, mode="append"
        )
        return spark.sql(
            f"""
            SELECT l_returnflag,
                   count(*) AS n,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
            FROM {view}
            GROUP BY l_returnflag
            """
        ).localCheckpoint(eager=True)
    finally:
        _teardown(spark, path, view)


Q_SQL_SNAPSHOT_SQL = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM lineitem WHERE l_orderkey < 1500 AND l_quantity >= 10
GROUP BY l_returnflag
"""


def io_snapshot_rename(spark, sf_dir):
    """Column-mapping lifecycle under an oracle: commit the low
    customers (v1), RENAME c_acctbal -> balance metadata-only (v2 — the
    file set is asserted byte-identical in-query), append the high
    customers under the NEW name (v3: new files store the stable
    physical name beside old files), then merge-on-read DELETE the
    negative balances via the renamed column (v4, zero rewrites,
    asserted). Reading the mixed-lineage head back must equal plain SQL
    over the source rows — old files' bytes resolve under the new
    logical name, new files' bytes under the same physical name, and
    DVs apply across both."""
    import shutil

    from ..sources import snapshot as snap
    from ..sources.snapshot import (
        snapshot_delete,
        snapshot_read,
        snapshot_rename_column,
        snapshot_write,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapren_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    hi = cust.agg(F.max("c_custkey")).first()[0]
    cut = hi // 2
    try:
        snapshot_write(
            cust.filter(F.col("c_custkey") <= cut).repartitionByRange(4, "c_custkey"),
            path,
        )
        snapshot_rename_column(path, "c_acctbal", "balance")
        assert (
            snap._read_manifest(path, 2)["files"]
            == snap._read_manifest(path, 1)["files"]
        ), "rename must be metadata-only (zero files rewritten)"
        snapshot_write(
            cust.filter(F.col("c_custkey") > cut).select(
                "c_custkey", "c_mktsegment", F.col("c_acctbal").alias("balance")
            ),
            path,
            mode="append",
        )
        stats = snapshot_delete(
            spark, path, [("balance", "<", 0.0)], strategy="merge-on-read"
        )
        assert stats["rewritten_files"] == 0, "MOR delete must not rewrite"
        return (
            snapshot_read(spark, path)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("balance"))).alias("bal_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_RENAME_SQL = """
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
FROM customer WHERE c_acctbal >= 0
GROUP BY c_mktsegment
"""


def io_snapshot_cmerge(spark, sf_dir):
    """Conditional-MERGE lifecycle under an oracle (Delta's WHEN MATCHED
    AND cond grammar): commit customers (v1), merge a CDC-shaped source
    (every 2nd key, candidate balance = -c_acctbal) with TWO ordered
    clauses — update bal when the candidate is higher, else delete the
    row (unconditional second clause) — first-match-wins decides every
    matched row. Unmatched rows must persist unchanged and both clause
    kinds must fire (asserted in-query). The read-back equals a DuckDB
    CASE-based twin of the same clause logic."""
    import shutil

    from ..sources.snapshot import snapshot_merge, snapshot_read, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapcm_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        "c_mktsegment",
        F.col("c_acctbal").alias("bal"),
    )
    try:
        snapshot_write(cust.repartitionByRange(4, "k"), path)
        src = cust.filter(F.col("k") % 2 == 0).select(
            "k", (-F.col("bal")).alias("newbal")
        )
        stats = snapshot_merge(
            spark,
            path,
            src,
            on=["k"],
            when_matched=[
                ("s.newbal > t.bal", "update", {"bal": "s.newbal"}),
                (None, "delete", None),
            ],
            when_not_matched=None,
        )
        assert stats["updated_rows"] > 0 and stats["deleted_rows"] > 0, (
            "both clauses must fire for the lifecycle to mean anything"
        )
        return (
            snapshot_read(spark, path)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("bal"))).alias("bal_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_CMERGE_SQL = """
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(round((CASE WHEN c_custkey % 2 = 0 AND -c_acctbal > c_acctbal
                                 THEN -c_acctbal ELSE c_acctbal END) * 100) AS BIGINT)) AS BIGINT) AS bal_c
FROM customer
WHERE NOT (c_custkey % 2 = 0 AND NOT (-c_acctbal > c_acctbal))
GROUP BY c_mktsegment
"""


def io_snapshot_convert(spark, sf_dir):
    """CONVERT + TAG lifecycle under an oracle: a plain parquet
    directory (written by Spark, no manifest) is adopted IN PLACE as v1
    — asserted zero-copy in-query (the adopted file set is byte-
    identical) — tagged, then buried under a decoy overwrite and a
    zero-retention vacuum. The tag must hold v1 through the vacuum
    (reproducibility pin), and reading it back through the SQL-face
    view must equal plain SQL over the source rows."""
    import shutil

    from ..sources import snapshot as snap
    from ..sources.snapshot import (
        snapshot_convert,
        snapshot_tag,
        snapshot_vacuum,
        snapshot_view,
        snapshot_write,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapconv_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    view = f"dak_conv_{os.getpid()}"
    try:
        li.filter(F.col("l_orderkey") < 2000).repartitionByRange(
            4, "l_orderkey"
        ).write.parquet(path)
        pre = {
            rel for rel, _ in snap._fs().walk_files(path) if rel.endswith(".parquet")
        }
        snapshot_convert(spark, path)
        m1 = snap._read_manifest(path, 1)
        assert set(m1["files"]) == pre and m1["op"] == "convert", (
            "convert must adopt the existing files in place, zero-copy"
        )
        snapshot_tag(path, "pin")  # reproducibility pin at v1
        snapshot_write(  # decoy head: the pin must not follow it
            li.filter(F.col("l_orderkey") >= 2000).limit(50), path
        )
        snapshot_vacuum(path, keep_last=1, retain_seconds=0)
        assert 1 in snap._versions(path), (
            "the tag must hold v1 through a zero-retention vacuum"
        )
        snapshot_view(spark, path, view, tag="pin")
        return spark.sql(
            f"""
            SELECT l_returnflag, count(*) AS n,
                   CAST(sum(l_quantity) AS DOUBLE) AS qty
            FROM {view}
            GROUP BY l_returnflag
            """
        ).localCheckpoint(eager=True)
    finally:
        _teardown(spark, path, view)


IO_SNAPSHOT_CONVERT_SQL = """
SELECT l_returnflag, count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS qty
FROM lineitem WHERE l_orderkey < 2000
GROUP BY l_returnflag
"""


QUERIES = {
    "io_snapshot_roundtrip": io_snapshot_roundtrip,
    "op_argcartesian": op_argcartesian,
    "op_ravel": op_ravel,
    "io_parquet_roundtrip": io_parquet_roundtrip,
    "io_json_roundtrip": io_json_roundtrip,
    "io_datasource_scan": io_datasource_scan,
    "io_datasource_sink_roundtrip": io_datasource_sink_roundtrip,
    "op_prod_axis1": op_prod_axis1,
    "op_var_std_axis1": op_var_std_axis1,
    "op_with_field": op_with_field,
    "op_full_like": op_full_like,
    "op_nan_to_num": op_nan_to_num,
    "str_regex2": str_regex2,
    "q_corr_covar": q_corr_covar,
    "dedup_apply": dedup_apply,
    "io_snapshot_merge": io_snapshot_merge,
    "io_snapshot_mor_delete": io_snapshot_mor_delete,
    "io_snapshot_cdf": io_snapshot_cdf,
    "io_snapshot_partitioned": io_snapshot_partitioned,
    "io_snapshot_widen": io_snapshot_widen,
    "io_snapshot_optimize": io_snapshot_optimize,
    "q_sql_snapshot": q_sql_snapshot,
    "io_snapshot_rename": io_snapshot_rename,
    "io_snapshot_cmerge": io_snapshot_cmerge,
    "io_snapshot_convert": io_snapshot_convert,
}

ORACLES = {
    "io_snapshot_roundtrip": IO_SNAPSHOT_RT_SQL,
    "op_argcartesian": OP_ARGCARTESIAN_SQL,
    "op_ravel": OP_RAVEL_SQL,
    "io_parquet_roundtrip": IO_PARQUET_RT_SQL,
    "io_json_roundtrip": IO_JSON_RT_SQL,
    "io_datasource_scan": IO_DATASOURCE_SQL,
    "io_datasource_sink_roundtrip": IO_DATASOURCE_SINK_SQL,
    "op_prod_axis1": OP_PROD_SQL,
    "op_var_std_axis1": OP_VAR_STD_SQL,
    "op_with_field": OP_WITH_FIELD_SQL,
    "op_full_like": OP_FULL_LIKE_SQL,
    "op_nan_to_num": OP_NAN_SQL,
    "str_regex2": STR_REGEX2_SQL,
    "q_corr_covar": Q_CORR_SQL,
    "dedup_apply": DEDUP_APPLY_SQL,
    "io_snapshot_merge": IO_SNAPSHOT_MERGE_SQL,
    "io_snapshot_mor_delete": IO_SNAPSHOT_MOR_SQL,
    "io_snapshot_cdf": IO_SNAPSHOT_CDF_SQL,
    "io_snapshot_partitioned": IO_SNAPSHOT_PART_SQL,
    "io_snapshot_widen": IO_SNAPSHOT_WIDEN_SQL,
    "io_snapshot_optimize": IO_SNAPSHOT_OPT_SQL,
    "q_sql_snapshot": Q_SQL_SNAPSHOT_SQL,
    "io_snapshot_rename": IO_SNAPSHOT_RENAME_SQL,
    "io_snapshot_cmerge": IO_SNAPSHOT_CMERGE_SQL,
    "io_snapshot_convert": IO_SNAPSHOT_CONVERT_SQL,
}


# ---- type-edge surfaces ----

def op_categorical(spark, sf_dir):
    """Deterministic dictionary encoding (types.categorical_encode):
    codes assigned by value order, so the oracle can re-derive them."""
    from ..types import categorical_encode

    docs = load_table(spark, sf_dir, "documents")
    coded, dictionary = categorical_encode(docs, "source")
    # drop null-coded rows to mirror the oracle's inner join (nulls are
    # not a category; categorical_encode leaves them null-coded)
    return (
        coded.filter(F.col("source_code").isNotNull())
        .groupBy("source_code")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_doc"))
    )


OP_CATEGORICAL_SQL = """
WITH dict AS (
  SELECT value, row_number() OVER (ORDER BY value) - 1 AS code
  FROM (SELECT DISTINCT source AS value FROM documents WHERE source IS NOT NULL)
)
SELECT code AS source_code, count(*) AS n, min(doc_id) AS min_doc
FROM documents JOIN dict ON source = value
GROUP BY code
"""


def op_union_map(spark, sf_dir):
    """Tagged-union round trip (types.union_encode/union_map): orders
    carry a long payload when open, a string payload otherwise."""
    from ..types import union_encode, union_map, union_tag

    orders = load_table(spark, sf_dir, "orders")
    tag = F.when(F.col("o_orderstatus") == "O", 0).otherwise(1)
    u = union_encode(tag, [F.col("o_custkey"), F.col("o_orderpriority")])
    mapped = union_map(u, [lambda c: (c % 100).cast("string"), lambda c: F.substring(c, 1, 1)])
    return orders.select("o_orderkey", union_tag(u).alias("tag"), mapped.alias("m"))


OP_UNION_MAP_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN 0 ELSE 1 END AS tag,
       CASE WHEN o_orderstatus = 'O' THEN CAST(o_custkey % 100 AS VARCHAR)
            ELSE substring(o_orderpriority, 1, 1) END AS m
FROM orders
"""


def q_sql_api(spark, sf_dir):
    """Same engine through the SQL surface: temp views + spark.sql —
    Catalyst produces the identical plan either way."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sql")
    return spark.sql(
        """
        SELECT l_returnflag,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_e4,
               count(*) AS n
        FROM li_sql
        WHERE l_quantity BETWEEN 10 AND 40
        GROUP BY l_returnflag
        """
    )


Q_SQL_API_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_e4,
       count(*) AS n
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 40
GROUP BY l_returnflag
"""


QUERIES.update(
    {
        "op_categorical": op_categorical,
        "op_union_map": op_union_map,
        "q_sql_api": q_sql_api,
    }
)
ORACLES.update(
    {
        "op_categorical": OP_CATEGORICAL_SQL,
        "op_union_map": OP_UNION_MAP_SQL,
        "q_sql_api": Q_SQL_API_SQL,
    }
)


def op_combinations3(spark, sf_dir):
    """n=3 combinations per list (bounded subset), exploded flat."""
    df = _nested(spark, sf_dir)
    small = df.filter(F.col("l_orderkey") < 3000)
    qs = NestedArray(small, "qs")
    trips = st.combinations(qs, 3, fields=["q0", "q1", "q2"])
    ex = small.select("l_orderkey", F.explode(trips.col).alias("t"))
    return ex.select("l_orderkey", F.col("t.q0").alias("q0"), F.col("t.q1").alias("q1"), F.col("t.q2").alias("q2"))


OP_COMBINATIONS3_SQL = """
WITH nested AS (
  SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs
  FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_orderkey
)
SELECT l_orderkey, tr.q0 AS q0, tr.q1 AS q1, tr.q2 AS q2 FROM (
  SELECT l_orderkey,
         unnest(flatten(flatten(list_transform(range(len(qs)),
           i -> list_transform(range(i + 1, len(qs)),
             j -> list_transform(range(j + 1, len(qs)),
               k -> {'q0': qs[i+1], 'q1': qs[j+1], 'q2': qs[k+1]})))))) AS tr
  FROM nested
)
"""

QUERIES["op_combinations3"] = op_combinations3
ORACLES["op_combinations3"] = OP_COMBINATIONS3_SQL


def io_snapshot_nested_prune(spark, sf_dir):
    """Nested-column file-skipping lifecycle: the reference's core value
    proposition — pruning work by NESTED buffers (lib/optimize.py:86-223's
    necessary-columns pass) — applied to the storage layer's stats
    envelope. Commit orders as a nested shape (okey, meta{cust, price,
    deep{odate, prio}}) range-clustered on the STRUCT LEAF ``meta.cust``
    (v1), assert a leaf predicate actually skips files, copy-on-write
    DELETE the low-cust quarter via the leaf — the aligned files must be
    DROPPED whole by the stats proof, not rewritten (v2, asserted) —
    rename the parent struct metadata-only (v3: nested stats key on the
    stable physical head, so skipping survives), merge-on-read DELETE
    urgent orders via a depth-2 leaf (v4), then read the head back under
    a leaf predicate that is itself asserted to prune. The mixed-lineage
    result must equal plain SQL over the source rows."""
    import shutil

    from ..sources.snapshot import (
        snapshot_delete,
        snapshot_read,
        snapshot_rename_column,
        snapshot_scan_report,
        snapshot_write,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapnest_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_totalprice").alias("price"),
            F.struct(
                F.col("o_orderdate").alias("odate"),
                F.col("o_orderpriority").alias("prio"),
            ).alias("deep"),
        ).alias("meta"),
    )
    hic = ords.agg(F.max("meta.cust")).first()[0]
    try:
        snapshot_write(ords.repartitionByRange(8, F.col("meta.cust")), path)
        rep = snapshot_scan_report(path, [("meta.cust", ">", 3 * hic // 4)])
        assert rep["skipped"] >= 4, f"struct-leaf pruning inert: {rep}"
        stats = snapshot_delete(spark, path, [("meta.cust", "<", hic // 4)])
        assert stats["dropped_files"] >= 1, (
            f"nested all-match must drop aligned files whole: {stats}"
        )
        snapshot_rename_column(path, "meta", "info")
        mor = snapshot_delete(
            spark,
            path,
            [("info.deep.prio", "=", "1-URGENT")],
            strategy="merge-on-read",
        )
        assert mor["rewritten_files"] == 0, "MOR delete must not rewrite"
        where = [("info.cust", "<=", hic // 2)]
        rep2 = snapshot_scan_report(path, where)
        assert rep2["skipped"] >= 1, f"post-rename leaf pruning inert: {rep2}"
        return (
            snapshot_read(spark, path, where=where)
            .groupBy(F.year(F.col("info.deep.odate")).cast("int").alias("yr"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("info.price"))).alias("price_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_NESTED_PRUNE_SQL = """
WITH mx AS (SELECT max(o_custkey) AS hic FROM orders)
SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM orders, mx
WHERE o_custkey >= hic // 4 AND o_custkey <= hic // 2
  AND o_orderpriority <> '1-URGENT'
GROUP BY 1
"""

QUERIES["io_snapshot_nested_prune"] = io_snapshot_nested_prune
ORACLES["io_snapshot_nested_prune"] = IO_SNAPSHOT_NESTED_PRUNE_SQL


def io_snapshot_sql_dml(spark, sf_dir):
    """SQL write path + catalog lifecycle (VERDICT r7 items 4/6): after
    v1, EVERY mutation is a SQL string routed through snapshot_sql with
    the table name resolved by the persistent catalog — INSERT INTO ...
    SELECT appends the high customers, UPDATE doubles the BUILDING
    segment's balances (RHS is a full Spark SQL expression over the old
    row), DELETE drops the negatives via the same triple grammar the
    prune paths speak. The read-back (through a catalog-registered
    view, also by name) must equal plain SQL over the source rows."""
    import shutil

    from ..sources.catalog import (
        snapshot_catalog_register,
        snapshot_catalog_tables,
        snapshot_catalog_views,
    )
    from ..sources.snapshot import snapshot_write
    from ..sources.sqlface import snapshot_sql

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_sqldml_{sf_tag}_{os.getpid()}"
    path, cat = f"{base}/tbl", f"{base}/catalog"
    shutil.rmtree(base, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    hi = cust.agg(F.max("k")).first()[0]
    cut = hi // 2
    view = f"sqldml_hi_{os.getpid()}"
    try:
        snapshot_write(
            cust.filter(F.col("k") <= cut).repartitionByRange(4, "k"), path
        )
        snapshot_catalog_register(spark, cat, "cust", path)
        tables = snapshot_catalog_tables(spark, cat)
        cust.filter(F.col("k") > cut).createOrReplaceTempView(view)
        snapshot_sql(spark, f"INSERT INTO cust SELECT k, seg, bal FROM {view}", tables)
        st = snapshot_sql(
            spark, "UPDATE cust SET bal = bal * 2 WHERE seg = 'BUILDING'", tables
        )
        assert st["updated_rows"] > 0, "the UPDATE must fire"
        st = snapshot_sql(spark, "DELETE FROM cust WHERE bal < 0.0", tables)
        assert st["removed_rows"] > 0, "the DELETE must fire"
        snapshot_catalog_views(spark, cat)  # read side: by name too
        return spark.sql(
            """
            SELECT seg, count(*) AS n,
                   CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
            FROM cust GROUP BY seg
            """
        ).localCheckpoint(eager=True)
    finally:
        _teardown(spark, base, view, "cust")


IO_SNAPSHOT_SQL_DML_SQL = """
WITH src AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal * 2
              ELSE c_acctbal END AS bal
  FROM customer
)
SELECT seg, count(*) AS n,
       CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
FROM src WHERE bal >= 0 GROUP BY seg
"""

QUERIES["io_snapshot_sql_dml"] = io_snapshot_sql_dml
ORACLES["io_snapshot_sql_dml"] = IO_SNAPSHOT_SQL_DML_SQL


def io_snapshot_sql_merge(spark, sf_dir):
    """The MERGE string form under an oracle (round-8 sqlface): the
    exact conditional-merge lifecycle of io_snapshot_cmerge, but the
    MERGE arrives as ONE SQL string — two ordered WHEN MATCHED clauses
    (update when the candidate balance is higher, else delete),
    first-match-wins — parsed structurally by snapshot_sql and executed
    through snapshot_merge's clause grammar. Shares io_snapshot_cmerge's
    DuckDB CASE twin: the string form must be answer-identical to the
    Python call it fronts."""
    import shutil

    from ..sources.snapshot import snapshot_read, snapshot_write
    from ..sources.sqlface import snapshot_sql

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_sqlmerge_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        "c_mktsegment",
        F.col("c_acctbal").alias("bal"),
    )
    view = f"sqlmerge_src_{os.getpid()}"
    try:
        snapshot_write(cust.repartitionByRange(4, "k"), path)
        cust.filter(F.col("k") % 2 == 0).select(
            "k", (-F.col("bal")).alias("newbal")
        ).createOrReplaceTempView(view)
        stats = snapshot_sql(
            spark,
            f"""
            MERGE INTO cust USING {view} s ON t.k = s.k
            WHEN MATCHED AND s.newbal > t.bal THEN UPDATE SET bal = s.newbal
            WHEN MATCHED THEN DELETE
            """,
            {"cust": path},
        )
        assert stats["updated_rows"] > 0 and stats["deleted_rows"] > 0, (
            "both clauses must fire through the string form"
        )
        return (
            snapshot_read(spark, path)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("bal"))).alias("bal_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _teardown(spark, path, view)


QUERIES["io_snapshot_sql_merge"] = io_snapshot_sql_merge
ORACLES["io_snapshot_sql_merge"] = IO_SNAPSHOT_CMERGE_SQL


def io_snapshot_sync(spark, sf_dir):
    """Sync-replication MERGE lifecycle (VERDICT r9 item 3): ONE atomic
    commit runs all three Delta clause families PLUS a conditional
    insert — matched rows update (bal + 100 for the lower key half),
    source-only rows insert gated on s.bal > 0 (shifted ids), and
    target rows above a threshold, provably not matched by source,
    DELETE via WHEN NOT MATCHED BY SOURCE. A second third-family merge
    whose condition hits nothing must rewrite ZERO files (the inverted
    pruning proof's carry direction, asserted in-query). The read-back
    equals a DuckDB twin computing the same four row populations."""
    import shutil

    from ..sources.snapshot import snapshot_merge, snapshot_read, snapshot_write

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_snapsync_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        "c_mktsegment",
        F.col("c_acctbal").alias("bal"),
    )
    hi = cust.agg(F.max("k")).first()[0]
    cut, thr = hi // 2, (7 * hi) // 8
    try:
        snapshot_write(cust.repartitionByRange(4, "k"), path)
        low = cust.filter(F.col("k") <= cut)
        src = low.select("k", "c_mktsegment", (F.col("bal") + 100).alias("bal"))
        src = src.unionByName(
            low.select(
                (F.col("k") + 2 * hi).alias("k"), "c_mktsegment", "bal"
            )
        )
        stats = snapshot_merge(
            spark, path, src, on=["k"],
            when_matched="update",
            when_not_matched=("insert", "s.bal > 0"),
            when_not_matched_by_source=[(f"t.k > {thr}", "delete", None)],
        )
        assert stats["updated_rows"] > 0, "matched family must fire"
        assert stats["deleted_rows"] > 0, "third family must fire"
        assert 0 < stats["inserted_rows"], "insert family must fire"
        n_low = low.count()
        assert stats["inserted_rows"] < n_low, (
            "the insert condition must actually gate rows out"
        )
        # carry direction: a third-family merge whose condition hits
        # nothing rewrites NOTHING (outside files carry verbatim)
        noop = snapshot_merge(
            spark, path, src, on=["k"],
            when_matched=None, when_not_matched=None,
            when_not_matched_by_source=[("t.bal < -1e18", "delete", None)],
        )
        assert noop["rewritten_files"] == 0 and noop["version"] == stats["version"]
        return (
            snapshot_read(spark, path)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("bal"))).alias("bal_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# four populations: updated lower half (+100), untouched middle, the
# k > thr slice deleted by WHEN NOT MATCHED BY SOURCE, and the shifted
# re-inserts gated on bal > 0
IO_SNAPSHOT_SYNC_SQL = """
WITH b AS (
  SELECT max(c_custkey) AS hi,
         max(c_custkey) // 2 AS cut,
         (7 * max(c_custkey)) // 8 AS thr
  FROM customer
), rows_out AS (
  SELECT c_custkey AS k, c_mktsegment,
         CASE WHEN c_custkey <= (SELECT cut FROM b)
              THEN c_acctbal + 100 ELSE c_acctbal END AS bal
  FROM customer
  WHERE c_custkey <= (SELECT thr FROM b)
  UNION ALL
  SELECT c_custkey + 2 * (SELECT hi FROM b), c_mktsegment, c_acctbal
  FROM customer
  WHERE c_custkey <= (SELECT cut FROM b) AND c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
FROM rows_out GROUP BY c_mktsegment
"""

QUERIES["io_snapshot_sync"] = io_snapshot_sync
ORACLES["io_snapshot_sync"] = IO_SNAPSHOT_SYNC_SQL


def io_snapshot_ddl(spark, sf_dir):
    """SQL DDL face lifecycle (round 9 continuation): EVERY statement —
    table creation included — is a SQL string against one catalog path.
    CREATE TABLE declares the schema and the stats-column property,
    INSERT INTO fills it from a view, ALTER COLUMN TYPE widens the
    declared int key to bigint metadata-only (round 10 — zero files
    rewritten, proven; later DML rewrites at the wide width, so the
    final read mixes file widths), ALTER TABLE ADD COLUMNS widens it
    metadata-only (old rows read NULL), UPDATE computes the new column
    for one segment, RENAME COLUMN proves the mapping survives SQL DML
    (top-level AND — round 12 — a NESTED field via the physical-path
    map, with the final read crossing files at both spellings),
    ADD CONSTRAINT + DELETE exercise enforcement and pruning, and the
    read-back is a SQL SELECT by catalog name. The DuckDB twin computes
    the same final populations from the source rows."""
    import shutil

    from ..sources.snapshot import snapshot_scan_report
    from ..sources.sqlface import snapshot_sql

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_ddl_{sf_tag}_{os.getpid()}"
    loc, cat = f"{base}/t", f"{base}/cat"
    shutil.rmtree(base, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    view = f"ddl_src_{os.getpid()}"
    try:
        v = snapshot_sql(
            spark,
            f"CREATE TABLE t (k int, seg string, bal double, "
            f"flags array<int>, mt struct<v:bigint>) "
            f"TBLPROPERTIES ('stats_columns' = 'k,bal') LOCATION '{loc}'",
            cat,
        )
        assert v == 1, f"CREATE must commit v1, got {v}"
        cust.orderBy("k").repartitionByRange(6, "k").createOrReplaceTempView(view)
        snapshot_sql(
            spark,
            f"INSERT INTO t SELECT CAST(k AS INT) AS k, seg, bal, "
            f"array(CAST(k % 100 AS INT)) AS flags, "
            f"named_struct('v', CAST(k % 100 AS BIGINT)) AS mt FROM {view}",
            cat,
        )
        rep = snapshot_scan_report(loc, [("k", "<", 2)])
        assert rep["skipped"] >= 1, f"declared stats_columns must prune: {rep}"
        # round-10 widen: metadata-only — later DML rewrites at bigint,
        # so the final read crosses int-width AND bigint-width files
        from ..sources.snapshot import _read_manifest, _versions

        pre_files = list(_read_manifest(loc, _versions(loc)[-1])["files"])
        snapshot_sql(spark, "ALTER TABLE t ALTER COLUMN k TYPE bigint", cat)
        # ... and through a CONTAINER element (round 11): the list's
        # element widens metadata-only too; later DML rewrites store
        # array<bigint>, so the final read also mixes element widths
        snapshot_sql(
            spark, "ALTER TABLE t ALTER COLUMN flags.element TYPE bigint", cat
        )
        m_w = _read_manifest(loc, _versions(loc)[-1])
        assert m_w["files"] == pre_files, "widening must rewrite ZERO files"
        assert "k:bigint" in m_w["schema_ddl"], m_w["schema_ddl"]
        assert "flags:array<bigint>" in m_w["schema_ddl"], m_w["schema_ddl"]
        snapshot_sql(spark, "ALTER TABLE t ADD COLUMNS (bonus double)", cat)
        # round-11 nested DROP: a scratch struct gains a field, loses a
        # NESTED field metadata-only (zero rewrites, proven), then goes
        # away entirely — the lifecycle's final answer is unchanged, so
        # the oracle needs no new terms while the driver still grades
        # the whole grammar round trip
        snapshot_sql(
            spark,
            "ALTER TABLE t ADD COLUMNS (scratch struct<a:double,b:double>)",
            cat,
        )
        pre_files2 = list(_read_manifest(loc, _versions(loc)[-1])["files"])
        snapshot_sql(spark, "ALTER TABLE t DROP COLUMN scratch.b", cat)
        m_d = _read_manifest(loc, _versions(loc)[-1])
        assert m_d["files"] == pre_files2, "nested drop must rewrite ZERO files"
        assert "scratch:struct<a:double>" in m_d["schema_ddl"], m_d["schema_ddl"]
        snapshot_sql(spark, "ALTER TABLE t DROP COLUMN scratch", cat)
        # round-12 nested RENAME: metadata-only via the stored
        # physical-path map (zero rewrites, proven) — files written
        # BEFORE it keep storing 'v' while the DML below rewrites some
        # files under the new spelling, so the final read-back crosses
        # BOTH spellings and its mv_sum term proves old-file resolution
        pre_files3 = list(_read_manifest(loc, _versions(loc)[-1])["files"])
        snapshot_sql(spark, "ALTER TABLE t RENAME COLUMN mt.v TO val", cat)
        m_r = _read_manifest(loc, _versions(loc)[-1])
        assert m_r["files"] == pre_files3, "nested rename must rewrite ZERO files"
        assert "mt:struct<val:bigint>" in m_r["schema_ddl"], m_r["schema_ddl"]
        st = snapshot_sql(
            spark, "UPDATE t SET bonus = bal * 0.1 WHERE seg = 'BUILDING'", cat
        )
        assert st["updated_rows"] > 0, "the UPDATE must fire"
        snapshot_sql(spark, "ALTER TABLE t RENAME COLUMN bal TO balance", cat)
        snapshot_sql(
            spark, "ALTER TABLE t ADD CONSTRAINT key_range CHECK (k >= 0)", cat
        )
        st = snapshot_sql(spark, "DELETE FROM t WHERE balance < 0.0", cat)
        assert st["removed_rows"] > 0, "the DELETE must fire"
        return snapshot_sql(
            spark,
            """
            SELECT seg, count(*) AS n,
                   CAST(sum(CAST(round(balance * 100) AS BIGINT)) AS BIGINT)
                     AS bal_c,
                   CAST(coalesce(sum(CAST(round(bonus * 100) AS BIGINT)), 0)
                        AS BIGINT) AS bonus_c,
                   CAST(sum(flags[0]) AS BIGINT) AS f_sum,
                   CAST(sum(mt.val) AS BIGINT) AS mv_sum
            FROM t GROUP BY seg
            """,
            cat,
        ).localCheckpoint(eager=True)
    finally:
        _teardown(spark, base, view, "t")


# bonus exists only on BUILDING rows (added column, UPDATE-scoped):
# both sides coalesce the all-NULL groups to 0 (a NULL BIGINT turns
# float64 through the driver's pandas canonicalization)
IO_SNAPSHOT_DDL_SQL = """
WITH src AS (
  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
         CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal * 0.1 END AS bonus
  FROM customer
)
SELECT seg, count(*) AS n,
       CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c,
       CAST(coalesce(sum(CAST(round(bonus * 100) AS BIGINT)), 0) AS BIGINT)
         AS bonus_c,
       CAST(sum(k % 100) AS BIGINT) AS f_sum,
       CAST(sum(k % 100) AS BIGINT) AS mv_sum
FROM src WHERE bal >= 0 GROUP BY seg
"""

QUERIES["io_snapshot_ddl"] = io_snapshot_ddl
ORACLES["io_snapshot_ddl"] = IO_SNAPSHOT_DDL_SQL


def io_snapshot_pspec(spark, sf_dir):
    """Partition-spec evolution under an oracle (round 9 continuation):
    orders load partitioned by priority, the spec then EVOLVES to the
    order-year (metadata-only — zero files rewritten, proven), an
    append lands under the new layout, a DELETE cuts across BOTH
    layouts, and an OPTIMIZE migrates every survivor to the new layout.
    The mixed-layout read-back must equal plain SQL over the source
    rows — layout is invisible in the answer, pruning still fires on
    both partition columns."""
    import shutil

    from ..sources.snapshot import (
        snapshot_compact,
        snapshot_delete,
        snapshot_read,
        snapshot_scan_report,
        snapshot_set_partition_spec,
        snapshot_write,
        _read_manifest,
        _versions,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_pspec_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("prio"),
        F.year(F.col("o_orderdate")).cast("int").alias("yr"),
        F.col("o_totalprice").alias("price"),
    )
    hi = ords.agg(F.max("okey")).first()[0]
    cut = hi // 2
    try:
        snapshot_write(ords.filter(F.col("okey") <= cut), path, partition_by=["prio"])
        files_v1 = list(_read_manifest(path, 1)["files"])
        v = snapshot_set_partition_spec(path, ["yr"])
        assert _read_manifest(path, v)["files"] == files_v1, (
            "spec evolution must rewrite ZERO files"
        )
        snapshot_write(ords.filter(F.col("okey") > cut), path, mode="append")
        v1_set = set(files_v1)
        newest = [f for f in _read_manifest(path, v + 1)["files"] if f not in v1_set]
        assert newest and all("yr=" in f for f in newest), newest
        # pruning fires on BOTH partition columns across the mixed layout
        assert snapshot_scan_report(path, [("prio", "=", "1-URGENT")])["skipped"] >= 1
        assert snapshot_scan_report(path, [("yr", "=", 1995)])["skipped"] >= 1
        st = snapshot_delete(spark, path, [("prio", "=", "5-LOW")])
        assert st["removed_rows"] > 0
        snapshot_compact(spark, path)  # migrate-by-rewrite under yr
        assert all("yr=" in f for f in _read_manifest(path, _versions(path)[-1])["files"])
        return (
            snapshot_read(spark, path)
            .groupBy("yr")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("price"))).alias("price_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_PSPEC_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM orders WHERE o_orderpriority <> '5-LOW'
GROUP BY 1
"""

QUERIES["io_snapshot_pspec"] = io_snapshot_pspec
ORACLES["io_snapshot_pspec"] = IO_SNAPSHOT_PSPEC_SQL


def io_snapshot_transform(spark, sf_dir):
    """Partition TRANSFORMS under an oracle (round 10 — Iceberg hidden
    partitioning): events load partitioned by ``days(ts)`` +
    ``bucket(4, user_id)``; the transform value lives only in the
    directory name (the raw columns stay in every file), and pruning is
    asserted by the INVERSE-IMAGE rule — a predicate on RAW ``ts``
    must skip other days' files, a RAW ``user_id`` equality must skip
    other buckets' files (footer min/max on a spread key cannot do
    that). The spec then EVOLVES to ``truncate(2000, event_id)``
    (metadata-only, zero files rewritten — proven), an append lands
    under the new layout, and a DELETE with a raw-ts predicate cuts
    across BOTH layouts (whole-day files drop by the all-match proof —
    the dir value records nulls=0 for the virtual column). The final
    mixed-layout read-back must equal plain SQL over the source rows:
    layout and transforms are invisible in the answer."""
    import datetime
    import shutil
    import zlib

    from ..sources.events import load_events
    from ..sources.snapshot import (
        snapshot_delete,
        snapshot_read,
        snapshot_scan_report,
        snapshot_set_partition_spec,
        snapshot_write,
        _read_manifest,
        _versions,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"{_TMP}/dakspark_ptrans_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    hi = ev.agg(F.max("event_id")).first()[0]
    cut = hi // 2
    try:
        snapshot_write(
            ev.filter(F.col("event_id") <= cut), path,
            partition_by=["days(ts)", "bucket(4, user_id)"],
        )
        m1 = _read_manifest(path, 1)
        assert m1["partition_by"] == ["days(ts)", "bucket(4, user_id)"]
        assert all(
            "ts_day=" in f and "user_id_bucket_4=" in f for f in m1["files"]
        ), "transform dirs missing"
        # inverse-image pruning on the RAW columns (the data spans
        # 2024-01: a one-week slice must skip most days' files; a
        # user_id equality must skip the other 3 buckets' files)
        rep = snapshot_scan_report(
            path, [("ts", ">=", datetime.datetime(2024, 1, 24))]
        )
        assert rep["skipped"] >= rep["total"] // 2, f"days() did not prune: {rep}"
        uid = ev.agg(F.min("user_id")).first()[0]
        rep2 = snapshot_scan_report(path, [("user_id", "=", uid)])
        assert rep2["skipped"] >= rep2["total"] // 2, f"bucket() did not prune: {rep2}"
        # the bucket dir value is the crc32 inverse image, provably
        bdir = f"user_id_bucket_4={zlib.crc32(str(uid).encode()) % 4}"
        assert any(bdir in f for f in m1["files"]), bdir
        # spec EVOLUTION to an int-truncate transform: metadata-only
        v = snapshot_set_partition_spec(path, ["truncate(2000, event_id)"])
        assert _read_manifest(path, v)["files"] == m1["files"], (
            "spec evolution must rewrite ZERO files"
        )
        snapshot_write(ev.filter(F.col("event_id") > cut), path, mode="append")
        v1_set = set(m1["files"])
        newest = [
            f for f in _read_manifest(path, v + 1)["files"] if f not in v1_set
        ]
        assert newest and all("event_id_truncate_2000=" in f for f in newest)
        # DELETE with a raw-ts predicate cuts across BOTH layouts
        st = snapshot_delete(
            spark, path, [("ts", "<", datetime.datetime(2024, 1, 8))]
        )
        assert st["removed_rows"] > 0
        # mixed-layout pruning still fires after the DELETE
        rep3 = snapshot_scan_report(
            path, [("event_id", "<=", min(2000, cut))],
            version=_versions(path)[-1],
        )
        assert rep3["skipped"] >= 1, rep3
        return (
            snapshot_read(spark, path)
            .groupBy(F.dayofmonth("ts").cast("int").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("value"))).alias("value_c"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


IO_SNAPSHOT_TRANSFORM_SQL = """
SELECT CAST(day(ts) AS INT) AS day, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
GROUP BY 1
"""

QUERIES["io_snapshot_transform"] = io_snapshot_transform
ORACLES["io_snapshot_transform"] = IO_SNAPSHOT_TRANSFORM_SQL


def io_snapshot_script(spark, sf_dir):
    """Multi-statement SQL script with COMPENSATING ROLLBACK under an
    oracle (round 10): a provisioning script CREATEs a table from the
    supplier view, a second script mutates it and then FAILS — with
    ``on_error="rollback"`` the mutation is RESTOREd (an O(1) metadata
    commit; the failed statements stay time-travelable) and the
    created-table state survives exactly. A third, fixed script then
    applies the real mutation. The final read-back must equal DuckDB
    over the source rows with only the GOOD mutation applied — the
    rolled-back DELETE must be invisible."""
    import shutil

    from ..sources.snapshot import _versions, snapshot_scan_report
    from ..sources.sqlface import snapshot_sql, snapshot_sql_script

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_script_{sf_tag}_{os.getpid()}"
    loc, cat = f"{base}/t", f"{base}/cat"
    shutil.rmtree(base, ignore_errors=True)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_nationkey").alias("nk"),
        F.col("s_acctbal").alias("bal"),
    )
    view = f"script_src_{os.getpid()}"
    try:
        supp.createOrReplaceTempView(view)
        snapshot_sql_script(
            spark,
            f"""
            CREATE TABLE t (k bigint, nk bigint, bal double)
              TBLPROPERTIES ('owner' = 'pipeline') LOCATION '{loc}';
            INSERT INTO t SELECT k, nk, bal FROM {view};
            """,
            cat,
            on_error="rollback",
        )
        v_good = _versions(loc)[-1]
        # the BAD script: a destructive DELETE lands, then a broken
        # statement fails the script — rollback must RESTORE the table
        try:
            snapshot_sql_script(
                spark,
                "DELETE FROM t WHERE bal >= 0.0; THIS IS NOT SQL;",
                cat,
                on_error="rollback",
            )
            raise AssertionError("the bad script must raise")
        except ValueError as e:
            assert "rollback: restored t" in str(e), e
        assert _versions(loc)[-1] > v_good, "rollback commits a restore"
        n_now = snapshot_sql(spark, "SELECT count(*) AS n FROM t", cat).first().n
        n_src = supp.count()
        assert n_now == n_src, f"rolled-back DELETE visible: {n_now} != {n_src}"
        # the FIXED script applies the real mutation
        snapshot_sql_script(
            spark,
            "DELETE FROM t WHERE bal < 0.0; "
            "ALTER TABLE t SET TBLPROPERTIES ('stage' = 'clean');",
            cat,
            on_error="rollback",
        )
        props = {
            r.key: r.value
            for r in snapshot_sql(spark, "SHOW TBLPROPERTIES t", cat).collect()
        }
        assert props.get("owner") == "pipeline" and props.get("stage") == "clean"
        assert snapshot_scan_report(loc, [("k", "<", 0)])["scanned"] == 0
        return snapshot_sql(
            spark,
            """
            SELECT nk, count(*) AS n,
                   CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT)
                     AS bal_c
            FROM t GROUP BY nk
            """,
            cat,
        ).localCheckpoint(eager=True)
    finally:
        _teardown(spark, base, view, "t")


IO_SNAPSHOT_SCRIPT_SQL = """
SELECT s_nationkey AS nk, count(*) AS n,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
FROM supplier WHERE s_acctbal >= 0
GROUP BY s_nationkey
"""

QUERIES["io_snapshot_script"] = io_snapshot_script
ORACLES["io_snapshot_script"] = IO_SNAPSHOT_SCRIPT_SQL


def io_snapshot_ann_sql(spark, sf_dir):
    """Vector search through the SQL face (VERDICT r10 item 4): the
    index builds with one Python ingest (``ivf_index_add`` — the
    centroids persist as the version-pinned ``ivf_centroids`` table
    property in the SAME commit), then the search itself is ONE SQL
    string — ``ANN SEARCH idx QUERY (...) TOP 10 NPROBE 2 EXCLUDE 0``
    — against the catalog name: quantizer, probe pruning, and exact
    re-scoring all come from the self-describing index. Hash-matches
    the same DuckDB batch-IVF twin as ``sim_ivf_topk``, so the SQL
    spelling is proven equivalent to the Python face's plan.

    Reference: no counterpart (dask-awkward has no SQL face and no
    similarity search); the statement form is the TVF-style spelling
    Delta/pgvector users expect."""
    import shutil

    from ..functions.simindex import ivf_index_add
    from ..sources.sqlface import snapshot_sql
    from .similarity import _centroids, _emb

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_annsql_{sf_tag}_{os.getpid()}"
    path = f"{base}/idx"
    shutil.rmtree(base, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    try:
        ivf_index_add(path, emb.select("vec_id", "e"), _centroids())
        qe = emb.filter(F.col("vec_id") == 0).select("e").first().e
        vlit = ", ".join(repr(float(x)) for x in qe)
        return snapshot_sql(
            spark,
            f"ANN SEARCH idx QUERY ({vlit}) TOP 10 NPROBE 2 EXCLUDE 0",
            {"idx": path},
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _ann_sql_oracle() -> str:
    from .similarity import _ivf_sql

    return _ivf_sql()


QUERIES["io_snapshot_ann_sql"] = io_snapshot_ann_sql
ORACLES["io_snapshot_ann_sql"] = _ann_sql_oracle()


def io_snapshot_ann_sql_batch(spark, sf_dir):
    """The BATCH form of the ANN statement (round 11): the 10,500-row
    heterogeneous query side of ``sim_batch_search`` — 20x past the
    collected-path gate, over the same QUANTIZED index — issued as one
    SQL string, ``ANN SEARCH idx QUERY (SELECT vec_id, e FROM qs) TOP
    3 NPROBE 2 RESCORE 1000000``. The query side itself is a snapshot
    table resolved by catalog name inside the subquery, so a SQL-only
    consumer can run the realistic distributed re-ranking job end to
    end. Hash-matches the same DuckDB single-pass batch-IVF twin
    (quantization, distribution, AND the SQL front all invisible in
    the result)."""
    import shutil

    from ..functions.simindex import ivf_index_add
    from ..sources.snapshot import snapshot_write
    from ..sources.sqlface import snapshot_sql
    from .similarity import (
        CORPUS_CAP,
        N_REPS_BATCH,
        QUERY_CAP,
        _centroids,
        _emb,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_annsqlb_{sf_tag}_{os.getpid()}"
    idx, qtbl = f"{base}/idx", f"{base}/qs"
    shutil.rmtree(base, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    try:
        ivf_index_add(
            idx, emb.filter(F.col("vec_id") < CORPUS_CAP), _centroids(),
            e_col="e", quantized=True,
        )
        qs = emb.filter(F.col("vec_id") < QUERY_CAP).select(
            "vec_id", "e",
            F.explode(
                F.sequence(F.lit(1), F.lit(N_REPS_BATCH))
            ).alias("rep"),
        ).select(
            # disjoint from corpus ids, so no exclusion clause needed
            (F.lit(1_000_000) + F.col("vec_id") * 100 + F.col("rep"))
            .alias("vec_id"),
            F.transform(
                "e", lambda x: x + F.col("rep") * F.lit(0.001)
            ).alias("e"),
        )
        snapshot_write(qs, qtbl)
        return snapshot_sql(
            spark,
            "ANN SEARCH idx QUERY (SELECT vec_id, e FROM qs) "
            "TOP 3 NPROBE 2 RESCORE 1000000",
            {"idx": idx, "qs": qtbl},
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _ann_sql_batch_oracle() -> str:
    from .similarity import _batch_search_sql

    return _batch_search_sql()


QUERIES["io_snapshot_ann_sql_batch"] = io_snapshot_ann_sql_batch
ORACLES["io_snapshot_ann_sql_batch"] = _ann_sql_batch_oracle()


def io_snapshot_txn(spark, sf_dir):
    """Atomic multi-statement scripts under an oracle (round 11,
    VERDICT r10 item 5): a provisioning script CREATEs and fills a
    table in ONE staged transaction; a failing mutation script with
    ``on_error="atomic"`` publishes NOTHING (asserted: the version log
    did not move at all — stronger than rollback's restore commit);
    the fixed script then publishes its three statements as ONE
    collapsed commit. The read-back must equal DuckDB over the source
    rows with only the good mutations applied — and the version log
    proves no intermediate state ever existed."""
    import shutil

    from ..sources.snapshot import _versions
    from ..sources.sqlface import snapshot_sql, snapshot_sql_script

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_txn_{sf_tag}_{os.getpid()}"
    loc, cat = f"{base}/t", f"{base}/cat"
    shutil.rmtree(base, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("bal"),
    )
    view = f"txn_src_{os.getpid()}"
    try:
        cust.createOrReplaceTempView(view)
        # CREATE + INSERT collapse to table creation in one commit
        snapshot_sql_script(
            spark,
            f"""
            CREATE TABLE t (k bigint, nk bigint, bal double)
              LOCATION '{loc}';
            INSERT INTO t SELECT k, nk, bal FROM {view};
            """,
            cat,
            on_error="atomic",
        )
        assert _versions(loc) == [1], "creation script must be ONE commit"
        # failing script: NOTHING publishes — not even restored-away
        # intermediates (the log is byte-identical before and after)
        try:
            snapshot_sql_script(
                spark,
                "DELETE FROM t WHERE bal >= 0.0;"
                "UPDATE t SET bal = 0.0 WHERE bal < 0.0;"
                "THIS IS NOT SQL;",
                cat,
                on_error="atomic",
            )
            raise AssertionError("the bad script must raise")
        except ValueError as e:
            assert "nothing was published" in str(e), e
        assert _versions(loc) == [1], "atomic failure must not move the log"
        n_now = snapshot_sql(spark, "SELECT count(*) AS n FROM t", cat).first().n
        assert n_now == cust.count()
        # the fixed script: three statements, ONE collapsed commit
        snapshot_sql_script(
            spark,
            "DELETE FROM t WHERE bal < 0.0;"
            "UPDATE t SET bal = bal + 10.0 WHERE nk < 5;"
            "INSERT INTO t SELECT k + 1000000 AS k, nk, bal "
            f"FROM {view} WHERE bal >= 9000;",
            cat,
            on_error="atomic",
        )
        assert _versions(loc) == [1, 2], "good script must be ONE commit"
        return snapshot_sql(
            spark,
            """
            SELECT nk, count(*) AS n,
                   CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT)
                     AS bal_c
            FROM t GROUP BY nk
            """,
            cat,
        ).localCheckpoint(eager=True)
    finally:
        _teardown(spark, base, view, "t")


IO_SNAPSHOT_TXN_SQL = """
WITH kept AS (
  SELECT c_custkey AS k, c_nationkey AS nk,
         CASE WHEN c_nationkey < 5 THEN c_acctbal + 10.0
              ELSE c_acctbal END AS bal
  FROM customer WHERE c_acctbal >= 0
  UNION ALL
  SELECT c_custkey + 1000000, c_nationkey, c_acctbal
  FROM customer WHERE c_acctbal >= 9000
)
SELECT nk, count(*) AS n,
       CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
FROM kept GROUP BY nk
"""

QUERIES["io_snapshot_txn"] = io_snapshot_txn
ORACLES["io_snapshot_txn"] = IO_SNAPSHOT_TXN_SQL


def io_snapshot_ann_where(spark, sf_dir):
    """Hybrid FILTERED vector search through the SQL face (round 12,
    VERDICT r11 item 2): the index ingests with ``meta_cols=["label"]``
    — payload metadata riding the same cell-partitioned files — and the
    search is ONE SQL string whose ``WHERE label IN (...)`` applies
    INSIDE the cell-pruned candidate scan, BEFORE the quantized ranking
    tier, so ``TOP 10`` is exactly the top 10 among rows passing the
    filter (never an over-fetch-and-post-filter that under-fills k).
    RESCORE past the corpus makes the exact tier total, so the result
    hash-matches the DuckDB batch-IVF twin with the same predicate
    ANDed into its candidate set — the only line the two twins differ
    by IS the filter."""
    import shutil

    from ..functions.simindex import ivf_index_add
    from ..sources.sqlface import snapshot_sql
    from .similarity import _centroids, _emb

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_annwhere_{sf_tag}_{os.getpid()}"
    path = f"{base}/idx"
    shutil.rmtree(base, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    try:
        ivf_index_add(
            path, emb.select("vec_id", "e", "label"), _centroids(),
            quantized=True, meta_cols=["label"],
        )
        qe = emb.filter(F.col("vec_id") == 0).select("e").first().e
        vlit = ", ".join(repr(float(x)) for x in qe)
        return snapshot_sql(
            spark,
            f"ANN SEARCH idx QUERY ({vlit}) TOP 10 NPROBE 2 "
            f"RESCORE 1000000 EXCLUDE 0 WHERE label IN (1, 4, 7)",
            {"idx": path},
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _ann_where_oracle() -> str:
    from .similarity import _ivf_sql

    return _ivf_sql(extra_pred="AND a.label IN (1, 4, 7)")


QUERIES["io_snapshot_ann_where"] = io_snapshot_ann_where
ORACLES["io_snapshot_ann_where"] = _ann_where_oracle()


def io_snapshot_ann_create(spark, sf_dir):
    """SQL-only index LIFECYCLE (round 12): until now a SQL consumer
    could SEARCH an index but never BUILD one — here the corpus lands
    as a snapshot table, ``CREATE VECTOR INDEX ... WITH ('centroids' =
    '<json>') AS SELECT vec_id, e FROM src`` builds and registers the
    index, and ``ANN SEARCH`` probes it, ALL through SQL strings
    against one table mapping. The explicit-centroids spelling is the
    reproducible-pin form (the k-means-trained ``'n_cells'`` form is
    pytest-covered by determinism + parity tests); with the same
    quantizer the result hash-matches the same DuckDB batch-IVF twin
    as ``io_snapshot_ann_sql`` — proving the CREATE built exactly the
    index the Python face would."""
    import json as _json
    import shutil

    from ..sources.snapshot import snapshot_write
    from ..sources.sqlface import snapshot_sql
    from .similarity import _centroids, _emb

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{_TMP}/dakspark_anncreate_{sf_tag}_{os.getpid()}"
    src, idx = f"{base}/src", f"{base}/idx"
    shutil.rmtree(base, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    t = {"src": src}
    try:
        snapshot_write(emb.select("vec_id", "e"), src)
        cents = _json.dumps(_centroids())
        snapshot_sql(
            spark,
            f"CREATE VECTOR INDEX idx LOCATION '{idx}' "
            f"WITH ('centroids' = '{cents}') "
            f"AS SELECT vec_id, e FROM src",
            t,
        )
        qe = emb.filter(F.col("vec_id") == 0).select("e").first().e
        vlit = ", ".join(repr(float(x)) for x in qe)
        return snapshot_sql(
            spark,
            f"ANN SEARCH idx QUERY ({vlit}) TOP 10 NPROBE 2 EXCLUDE 0",
            t,
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _ann_create_oracle() -> str:
    from .similarity import _ivf_sql

    return _ivf_sql()


QUERIES["io_snapshot_ann_create"] = io_snapshot_ann_create
ORACLES["io_snapshot_ann_create"] = _ann_create_oracle()
