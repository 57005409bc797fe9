"""Pipeline suite: multimodal binary-column plumbing, streaming windows,
and assorted engine surfaces (repartition, global sort+head, sampling,
per-list distinct, elementwise join) that round out SURVEY §2 coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import NestedArray
from ..functions import multimodal as mm
from ..functions import strings as S
from ..operators import structure as st
from ._canon import arr_micro, sql_arr_micro


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---- multimodal ----

def mm_binary_meta(spark, sf_dir):
    """Typed binary media column + metadata struct — pure expressions."""
    media = mm.attach_binary(_docs(spark, sf_dir))
    return media.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


MM_BINARY_SQL = """
SELECT doc_id, 'application/octet-stream' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


def mm_decode_features(spark, sf_dir):
    """Arrow-batched decode-stub over the binary column (mapInPandas).
    The stub decoder is deterministic md5 math (functions/multimodal.py
    _decode_stub), so even this Python-side path gets a full value-hash
    oracle: the SQL twin recomputes width/height from the digest bytes."""
    media = mm.attach_binary(_docs(spark, sf_dir))
    feats = mm.extract_features(media)
    return feats.select(
        "doc_id", "n_bytes", "width", "height", F.size("feature").alias("feat_dim")
    )


def stream_datasource_agg(spark, sf_dir):
    """Streaming aggregation over the CUSTOM Python data source: events
    row groups become the descriptor log of sources/datasource.py's
    stream reader (one micro-batch per trigger window, fn running on
    executors), drained through a complete-mode memory sink. Composes
    the custom-IO protocol's streaming face with a stateful agg — the
    pattern for streaming a bespoke format (API cursor, sidecar log)
    Spark has no native reader for."""
    import tempfile
    import uuid

    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from ..sources.datasource import stream_from_datasource

    descs = [
        (f, rg)
        for f in pds.dataset(f"{sf_dir}/events.parquet", format="parquet").files
        for rg in range(pq.ParquetFile(f).num_row_groups)
    ]

    def read_rg(desc):
        import pyarrow.parquet as _pq

        f, rg = desc
        tbl = _pq.ParquetFile(f).read_row_group(
            rg, columns=["event_id", "event_type", "value"]
        )
        yield from tbl.to_pylist()

    st = stream_from_datasource(
        spark,
        read_rg,
        descs,
        "event_id bigint, event_type string, value double",
        batch_size=2,
    )
    agg = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"sds_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


STREAM_DATASOURCE_SQL = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
"""


def mm_frame_sample(spark, sf_dir):
    """Frame sampling over the binary media column (every 4th 256-byte
    frame), one row per sampled frame, with a 4-byte digest feature per
    frame — all JVM expressions (functions/multimodal.py sample_frames).
    The corpus text is ASCII, so byte slicing == character slicing and
    the DuckDB oracle replicates the frames with plain substring+md5."""
    media = mm.attach_binary(_docs(spark, sf_dir))
    fr = mm.sample_frames(media, frame_bytes=256, every_n=4)
    b = lambda k: (  # noqa: E731 — k-th digest byte as an int feature
        F.conv(F.substring("frame_md5", 2 * k + 1, 2), 16, 10).cast("int").alias(f"b{k}")
    )
    return fr.select("doc_id", "n_frames", "frame_idx", b(0), b(1), b(2), b(3))


MM_FRAME_SQL = """
SELECT d.doc_id,
       CAST(ceil(length(d.text) / 256.0) AS INT) AS n_frames,
       CAST(u.frame_idx AS INT) AS frame_idx,
       CAST(('0x' || substr(md5(substring(d.text, u.frame_idx * 256 + 1, 256)), 1, 2)) AS INT) AS b0,
       CAST(('0x' || substr(md5(substring(d.text, u.frame_idx * 256 + 1, 256)), 3, 2)) AS INT) AS b1,
       CAST(('0x' || substr(md5(substring(d.text, u.frame_idx * 256 + 1, 256)), 5, 2)) AS INT) AS b2,
       CAST(('0x' || substr(md5(substring(d.text, u.frame_idx * 256 + 1, 256)), 7, 2)) AS INT) AS b3
FROM documents d,
     LATERAL (SELECT unnest(range(0, CAST(ceil(length(d.text) / 256.0) AS INT), 4)) AS frame_idx) u
"""


# ---- streaming ----

def stream_tumbling(spark, sf_dir):
    """Structured Streaming tumbling-window counts over the bounded events
    source (complete mode == batch aggregation, so the batch oracle holds)."""
    from ..streaming import stream_tumbling_counts

    return stream_tumbling_counts(spark, sf_dir)


STREAM_TUMBLING_SQL = """
SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR) AS w_start,
       event_type, count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2
"""


def stream_sessions(spark, sf_dir):
    """Streaming session windows (gap-based, 30-min inactivity). The
    merged result is deterministic — a session is the maximal run of
    events whose gaps are < the timeout — so the lag-based batch
    sessionization reproduces it exactly: session start = first event's
    ts, n_events = run length."""
    from ..streaming import sessionized_counts

    return sessionized_counts(spark, sf_dir)


STREAM_SESSIONS_SQL = """
WITH gapped AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM gapped
)
SELECT user_id, CAST(min(ts) AS VARCHAR) AS sess_start,
       count(*) AS n_events
FROM sess GROUP BY user_id, sess_id
"""


def stream_dedup(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark — bounded
    state) + per-type counts; equals batch COUNT(DISTINCT user_id)."""
    from ..streaming import stream_dedup_counts

    return stream_dedup_counts(spark, sf_dir)


STREAM_DEDUP_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def stream_static_enrich_q(spark, sf_dir):
    """Stream-static broadcast enrichment (events x nation dim) — no join
    state, dim re-read per micro-batch; per-nation counts + cent sums."""
    from ..streaming import stream_static_enrich

    return stream_static_enrich(spark, sf_dir)


STREAM_ENRICH_SQL = """
SELECT n.n_name, count(*) AS n,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name
"""


def stream_stateful_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, cent-sum) carried in GroupState — integer state makes it
    exactly oracle-checkable despite the Python hop."""
    from ..streaming.stateful import running_user_stats

    return running_user_stats(spark, sf_dir)


STREAM_STATEFUL_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY user_id
"""


# ---- engine surfaces ----

def op_repartition_stable(spark, sf_dir):
    """repartition(n) is a pure reshuffle: multiset of rows unchanged
    (reference repartition, lib/structure.py:1371-1464)."""
    li = load_table(spark, sf_dir, "lineitem")
    re = li.repartition(64, "l_orderkey")
    return re.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


OP_REPARTITION_SQL = """
SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY l_returnflag
"""


def op_sample_deterministic(spark, sf_dir):
    """every-Nth sampling through the ENGINE's ``sample(factor=)``
    (reference lib/inspect.py:241-273) — the base frame is ordered by the
    unique o_orderkey first, so the engine's row index equals the global
    sorted position and DuckDB can reproduce the kept set with
    row_number()."""
    od = load_table(spark, sf_dir, "orders").orderBy("o_orderkey")
    kept = NestedArray(od, "o_totalprice").sample(factor=7).to_df("p")
    return kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("p") * 100).cast("bigint")).alias("price_c"),
    )


OP_SAMPLE_SQL = """
SELECT count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM (SELECT o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
      FROM orders) t
WHERE rid % 7 = 0
"""


def op_distinct_inner(spark, sf_dir):
    """Per-list distinct (sorted for cross-engine list-order stability)."""
    from .nested import _nested

    df = _nested(spark, sf_dir)
    return df.select(
        "l_orderkey",
        arr_micro(F.sort_array(F.array_distinct("qs"))).alias("uniq_sorted"),
    )


OP_DISTINCT_INNER_SQL = f"""
WITH nested AS (
  SELECT l_orderkey, list(l_quantity) AS qs FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, {sql_arr_micro("list_sort(list_distinct(qs))")} AS uniq_sorted FROM nested
"""


def str_join_elementwise(spark, sf_dir):
    """concat_ws across columns (reference join_element_wise, lib/str.py:415)."""
    df = _docs(spark, sf_dir)
    out = S.join_element_wise([NestedArray(df, "lang"), NestedArray(df, "source")], "/")
    return df.select("doc_id", out.col.alias("tagged"))


STR_JOIN_EW_SQL = "SELECT doc_id, concat_ws('/', lang, source) AS tagged FROM documents"


def str_capitalize_title(spark, sf_dir):
    df = _docs(spark, sf_dir)
    s = NestedArray(df, "source")
    return df.select(
        "doc_id",
        S.capitalize(s).col.alias("cap"),
        S.is_title(S.capitalize(s)).col.alias("titled"),
    )


STR_CAPITALIZE_SQL = r"""
WITH capped AS (
  SELECT doc_id, upper(substring(source, 1, 1)) || lower(substring(source, 2)) AS cap
  FROM documents
)
SELECT doc_id, cap,
       regexp_matches(cap, '^[^\p{Ll}\p{Lu}\p{Lt}]*[\p{Lu}\p{Lt}][\p{Ll}]*(?:[^\p{Ll}\p{Lu}\p{Lt}]+[\p{Lu}\p{Lt}][\p{Ll}]*)*[^\p{Ll}\p{Lu}\p{Lt}]*$') AS titled
FROM capped
"""


def str_index_in(spark, sf_dir):
    df = _docs(spark, sf_dir)
    lg = NestedArray(df, "lang")
    return df.select(
        "doc_id",
        S.is_in(lg, ["en", "de"]).col.alias("known"),
        S.index_in(lg, ["en", "de", "fr"]).col.cast("int").alias("lang_idx"),
    )


STR_INDEX_IN_SQL = """
SELECT doc_id, lang IN ('en', 'de') AS known,
       CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'fr' THEN 2 ELSE -1 END AS lang_idx
FROM documents
"""


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_decode_features": mm_decode_features,
    "mm_frame_sample": mm_frame_sample,
    "stream_datasource_agg": stream_datasource_agg,
    "stream_tumbling": stream_tumbling,
    "stream_sessions": stream_sessions,
    "stream_dedup": stream_dedup,
    "stream_static_enrich": stream_static_enrich_q,
    "stream_stateful_user_stats": stream_stateful_user_stats,
    "op_repartition_stable": op_repartition_stable,
    "op_sample_deterministic": op_sample_deterministic,
    "op_distinct_inner": op_distinct_inner,
    "str_join_elementwise": str_join_elementwise,
    "str_capitalize_title": str_capitalize_title,
    "str_index_in": str_index_in,
}

# DuckDB twin of _decode_stub: digest byte i == hex pair i of md5;
# empty payloads take the decoder's corrupt-data branch (-1, -1, []).
MM_DECODE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN octet_length(encode(text)) = 0 THEN -1
            ELSE 16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 END AS width,
       CASE WHEN octet_length(encode(text)) = 0 THEN -1
            ELSE 16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 END AS height,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE 8 END AS feat_dim
FROM documents
"""

ORACLES = {
    "mm_binary_meta": MM_BINARY_SQL,
    "mm_decode_features": MM_DECODE_SQL,
    "mm_frame_sample": MM_FRAME_SQL,
    "stream_datasource_agg": STREAM_DATASOURCE_SQL,
    "stream_tumbling": STREAM_TUMBLING_SQL,
    "stream_dedup": STREAM_DEDUP_SQL,
    "stream_static_enrich": STREAM_ENRICH_SQL,
    "stream_sessions": STREAM_SESSIONS_SQL,
    "stream_stateful_user_stats": STREAM_STATEFUL_SQL,
    "op_repartition_stable": OP_REPARTITION_SQL,
    "op_sample_deterministic": OP_SAMPLE_SQL,
    "op_distinct_inner": OP_DISTINCT_INNER_SQL,
    "str_join_elementwise": STR_JOIN_EW_SQL,
    "str_capitalize_title": STR_CAPITALIZE_SQL,
    "str_index_in": STR_INDEX_IN_SQL,
}


def pipeline_e2e(spark, sf_dir):
    """The full training-data curation flow composed into ONE lazy plan:
    quality filter → language filter → exact-dedup survivors → per-source
    token statistics. Every stage is an expression or hash-shuffle; at
    100 TB this runs as scan → two shuffles (dedup groupBy + final agg)."""
    from ..functions import textstats as tx

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        tx.quality_score(F.col("text")).alias("q"),
        tx.langid_en(F.col("text")).alias("lang_pred"),
        tx.token_count(F.col("text")).alias("n_tok"),
        F.md5("text").alias("h"),
    ).filter((F.col("q") >= 0.5) & (F.col("lang_pred") == "en"))
    # exact-dedup survivors = min doc_id per content hash. A window-min
    # over the hash partition does it in ONE shuffle on h; the earlier
    # groupBy + left_semi shape paid the agg shuffle AND a join shuffle of
    # the full scored frame. Hash groups are duplicate sets (tiny), so
    # WindowExec's per-group buffering is safe at any corpus size.
    from pyspark.sql import Window

    survivors = scored.withColumn(
        "__keep__", F.min("doc_id").over(Window.partitionBy("h"))
    ).filter(F.col("doc_id") == F.col("__keep__"))
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


from ..functions.textstats import EN_STOPWORDS as _EN_SW
from ..sources.tables import load_table

_SW_LIST = "', '".join(_EN_SW)
PIPELINE_E2E_SQL = rf"""
WITH tok AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != '') AS toks,
         list_filter(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != ''),
                     t -> t IN ('{_SW_LIST}')) AS sws
  FROM documents
), scored AS (
  SELECT doc_id, source, md5(text) AS h, CAST(len(toks) AS BIGINT) AS n_tok,
         (CASE WHEN len(toks) > 0 THEN CAST(len(sws) AS DOUBLE) / len(toks) ELSE 0.0 END
          + CASE WHEN length(text) >= 100 AND length(text) <= 10000 THEN 1.0 ELSE 0.5 END
          + CASE WHEN len(toks) > 0 AND CAST(length(text) AS DOUBLE) / len(toks) >= 3.0
                      AND CAST(length(text) AS DOUBLE) / len(toks) <= 12.0 THEN 1.0 ELSE 0.5 END) / 3 AS q,
         CASE WHEN len(toks) > 0 AND CAST(len(sws) AS DOUBLE) / len(toks) >= 0.05
              THEN 'en' ELSE 'unk' END AS lang_pred
  FROM tok
), filtered AS (
  SELECT * FROM scored WHERE q >= 0.5 AND lang_pred = 'en'
), keep AS (
  SELECT h, min(doc_id) AS keep_id FROM filtered GROUP BY h
)
SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc
FROM filtered
WHERE EXISTS (SELECT 1 FROM keep WHERE keep.h = filtered.h AND keep.keep_id = filtered.doc_id)
GROUP BY source
"""

QUERIES["pipeline_e2e"] = pipeline_e2e
ORACLES["pipeline_e2e"] = PIPELINE_E2E_SQL
