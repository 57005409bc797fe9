r"""Deduplication suite — first-class training-data-pipeline operators:
exact hash dedup, MinHash+LSH banding, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Scale design: everything is expressed as explode → hash-aggregate →
(optionally) candidate-join. No all-pairs products except inside LSH
buckets / bounded candidate sets; at 100 TB the band-bucket join replaces
the quadratic comparison, which is the whole point of LSH.

Cross-engine determinism: the only hash used is md5 (identical in Spark
and DuckDB); minhash minima are lexicographic minima over fixed-length hex
strings, so numeric vs string ordering agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textstats as tx
from ..sources.tables import load_table, load_table_hot

from ..functions.incremental import N_BANDS, N_HASHES  # single source of truth

SIMHASH_BITS = 16

TOK_CTE = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != '')) AS tk
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallelism-guarded read for the shingle pipeline only. Building
    the packed shingle frame (1 md5 per k-gram + 2 seeded md5 + chunk
    mins per shingle) is CPU-bound enough that an unsplittable
    single-row-group scan serializes it (A/B at sf0.1: ngram Jaccard
    ~3s -> ~1.3s); the lighter dedup queries (exact/simhash/minhash)
    LOSE ~0.3s to the extra shuffle stage and keep the plain scan."""
    return load_table_hot(spark, sf_dir, "documents")


def _tokens(spark, sf_dir) -> DataFrame:
    """Distinct (doc_id, token) pairs — the substrate of the set-based
    dedup family."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.array_distinct(tx.tokens(F.lower(F.col("text"))))).alias("tk"))
    )


# ---- exact dedup ----

def dedup_exact(spark, sf_dir):
    """Hash-groupBy exact dedup: one shuffle on md5(text); keeps min id."""
    df = _docs(spark, sf_dir)
    return (
        df.groupBy(F.md5("text").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS h, count(*) AS n_copies,
       min(doc_id) AS keep_id, max(doc_id) AS max_id
FROM documents GROUP BY 1
"""


# ---- MinHash + LSH banding ----

def _sig_bands(tok: DataFrame, elem_col: str = "tk") -> DataFrame:
    """The shared MinHash → LSH-band construction (N_HASHES min-signatures
    per doc, N_BANDS keys of 2 rows each): (doc_id, band, bkey). Single
    source of truth for every banding consumer — change N_HASHES/N_BANDS/
    the band hash HERE and in ``_sql_sig_bands`` only.

    Hash economy: instead of N_HASHES seeded md5 calls per element, each
    of 2 seeded md5s yields 4 independent 8-hex-char signature chunks —
    md5 cost per element drops 4x (it dominates the signature stage; the
    chunks of one md5 are independent uniform draws for minhash purposes).
    Spark's hash-aggregate codegen CSEs the repeated md5 across the four
    min() aggregates of a seed group."""
    sig = tok.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i // 4}|"), F.col(elem_col))),
                    8 * (i % 4) + 1,
                    8,
                )
            ).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.md5(F.concat(F.col(f"h{2 * j}"), F.col(f"h{2 * j + 1}"))).alias("bkey"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))


def _sql_sig_bands(src_cte: str = "tok", elem: str = "tk") -> str:
    """DuckDB twin of ``_sig_bands``: the ``sig`` + ``bands`` CTE bodies."""
    hcols = ",\n         ".join(
        f"min(substr(md5('{i // 4}|' || {elem}), {8 * (i % 4) + 1}, 8)) AS h{i}"
        for i in range(N_HASHES)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {j} AS band, md5(h{2 * j} || h{2 * j + 1}) AS band_key FROM sig"
        for j in range(N_BANDS)
    )
    return f""", sig AS (
  SELECT doc_id,
         {hcols}
  FROM {src_cte} GROUP BY doc_id
), bands AS (
{band_selects}
)"""


# the packed row-local banding construction is shared with the public
# incremental-dedup API — single source of truth lives there
from ..functions.incremental import _N_SEEDS  # noqa: F401 (re-export)
from ..functions.incremental import packed_band_structs as _packed_band_structs


def dedup_incremental(spark, sf_dir):
    """INCREMENTAL dedup vs a batch-SQL oracle: the corpus arrives as two
    id-ordered chunks, each probed against the persistent snapshot-table
    band index (functions/incremental) with the other chunk unseen; the
    oracle computes the single-pass batch verdicts in pure SQL. They must
    match EXACTLY — including chained duplicates — because every probed
    doc's buckets enter the index. This is the O(delta)-per-ingest path a
    100 TB corpus needs instead of O(corpus) daily reruns."""
    import shutil
    import tempfile

    from ..functions.incremental import incremental_dedup

    import os

    # measured and REJECTED (round 13): routing the delta probes through
    # the parallelism-guarded read (_docs_par) cuts the bands-checkpoint
    # stage 0.35-0.54s -> 0.09-0.14s per chunk in isolation, but the
    # 32-way spread it injects widens every downstream stage (index
    # appends, probe joins, the final verdicts evaluation) and the FULL
    # query measures ~1s SLOWER in-session (hot 3.3-3.7s vs plain
    # 2.4-2.8s best-of-3 alternating) — the same trade the shingle-vs-
    # light-dedup note on _docs_par records. The plain scan stays.
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    # pid-scoped path: a fixed name would let a concurrent run (bench vs
    # oracle harness) rmtree the index this process is mid-probe on
    path = f"{tempfile.gettempdir()}/dakspark_dedup_idx_{sf_tag}_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)  # stale index from prior runs
    mid = docs.agg(F.max("doc_id")).first()[0] // 2
    elems = F.array_distinct(tx.tokens(F.lower(F.col("text"))))
    try:
        v1 = incremental_dedup(spark, path, docs.filter(F.col("doc_id") <= mid), elems)
        v2 = incremental_dedup(spark, path, docs.filter(F.col("doc_id") > mid), elems)
        # kept docs get dup_of = -1 (a NULL bigint round-trips as NaN
        # through the oracle harness's pandas conversion); materialize
        # BEFORE dropping the scratch index the lazy plan reads from
        out = v1.unionByName(v2).select(
            "doc_id", F.coalesce("dup_of", F.lit(-1)).alias("dup_of")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)  # pid-scoped: don't leak /tmp
    return out


def _incremental_sql() -> str:
    return (
        TOK_CTE
        + _sql_sig_bands()
        + """
, bmin AS (
  SELECT band, band_key, min(doc_id) AS keep FROM bands GROUP BY 1, 2
), best AS (
  SELECT b.doc_id AS doc_id, min(m.keep) AS best
  FROM bands b JOIN bmin m USING (band, band_key) GROUP BY 1
)
SELECT doc_id, COALESCE(CASE WHEN best < doc_id THEN best END, -1) AS dup_of FROM best
"""
    )


def dedup_minhash_lsh(spark, sf_dir):
    """MinHash signatures (8 hashes via seeded md5, min over token set) →
    4 bands of 2 → band-key groupBy. Groups with >1 doc are near-dup
    candidates. This is the linear-scale path: candidates come from a
    hash shuffle, never an all-pairs join."""
    bands = _sig_bands(_tokens(spark, sf_dir))
    return (
        bands.groupBy(F.col("band"), F.col("bkey").alias("band_key"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"), F.max("doc_id").alias("max_id"))
        .filter(F.col("n_docs") > 1)
    )


def _minhash_sql() -> str:
    return (
        TOK_CTE
        + _sql_sig_bands()
        + """
SELECT band, band_key, count(*) AS n_docs, min(doc_id) AS keep_id, max(doc_id) AS max_id
FROM bands GROUP BY 1, 2 HAVING count(*) > 1
"""
    )


def stream_dedup_minhash(spark, sf_dir):
    """STREAMING MinHash-LSH candidate generation: documents arrive as a
    bounded file stream; signatures are computed ROW-LOCALLY (packed
    distinct-token array + the 2-md5/4-chunk hash economy — structured
    streaming forbids chained stateful aggregations, so the per-doc
    groupBy-min of the batch path is replaced by an equivalent
    array_min over the same set), band keys explode row-locally, and the
    ONE streaming aggregation is the band-bucket count. Complete mode
    over the bounded source == the batch result, so the batch oracle
    holds exactly."""
    import tempfile
    import uuid

    from ..sources.tables import stream_table

    # drift-adaptive streaming read: ingests with the file's ACTUAL
    # footer schema, then normalizes to canonical (round-3 bug class)
    docs = stream_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tx.tokens(F.lower(F.col("text"))))
    bands = (
        docs.select(
            "doc_id",
            F.explode(_packed_band_structs(toks, key_alias="band_key")).alias("b"),
        )
        .select("doc_id", "b.band", "b.band_key")
        # empty/null-text docs have NULL keys — the batch path drops them
        # at the token explode; keeping them would fabricate a duplicate
        # bucket of all empty docs
        .filter(F.col("band_key").isNotNull())
    )
    agg = (
        bands.groupBy("band", "band_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.max("doc_id").alias("max_id"),
        )
        .filter(F.col("n_docs") > 1)
    )
    name = f"stream_mh_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dakspark_mh_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


# ---- duplicate clusters + canonical election ----

def _cluster_edges(spark, sf_dir) -> DataFrame:
    """Candidate STAR edges: every band-bucket member points at the bucket
    minimum (window-min over the band-bucket hash partition — linear in
    bucket size, never the quadratic clique pair list)."""
    from pyspark.sql import Window

    bands = _sig_bands(_tokens(spark, sf_dir))
    w = Window.partitionBy("band", "bkey")
    return (
        bands.withColumn("m", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("m"))
        .select(F.col("doc_id").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def dedup_cluster_canonical(spark, sf_dir):
    """The step AFTER candidate generation: group LSH candidates into
    duplicate clusters (connected components) and elect the minimum
    doc_id as each cluster's canonical document.

    Scale shape: per-bucket STAR edges (``_cluster_edges``) feed
    Pregel-style min-label propagation (functions/graph.py): one join +
    one groupBy shuffle per round, rounds = component diameter (tiny for
    LSH bucket graphs). Output: every document with its canonical id and
    a dup flag."""
    from ..functions.graph import connected_components

    comp = connected_components(_cluster_edges(spark, sf_dir))
    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).cast("bigint").alias("canonical"),
        (F.coalesce(F.col("comp"), F.col("doc_id")) != F.col("doc_id")).alias("is_dup"),
    )


def _cluster_sql() -> str:
    # WITH RECURSIVE applies to the whole CTE list; reach is transitive
    # closure over the symmetric star edges, comp = min reachable node
    return (
        TOK_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
        + _sql_sig_bands()
        + """, star AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY band, band_key) AS m FROM bands
), edges AS (
  SELECT DISTINCT doc_id AS src, m AS dst FROM star WHERE doc_id != m
), sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), reach(a, b) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
), comp AS (
  SELECT a AS node, min(b) AS comp FROM reach GROUP BY a
)
SELECT d.doc_id,
       CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS canonical,
       coalesce(c.comp, d.doc_id) != d.doc_id AS is_dup
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""
    )


# ---- SimHash ----

def dedup_simhash(spark, sf_dir):
    """16-bit SimHash over the token set: bit j votes by the j-th hex digit
    of md5(token); majority sign sets the bit."""
    tok = _tokens(spark, sf_dir)
    hi = list("89abcdef")
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring(F.md5("tk"), j + 1, 1).isin(hi), 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = votes.select(
        "doc_id",
        sum(
            [F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0)) for j in range(SIMHASH_BITS)],
            F.lit(0),
        ).cast("bigint").alias("simhash"),
    )
    return sim


def _simhash_sql() -> str:
    hi = "','".join("89abcdef")
    vote_cols = ",\n         ".join(
        f"sum(CASE WHEN substr(md5(tk), {j + 1}, 1) IN ('{hi}') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(f"CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(SIMHASH_BITS))
    return (
        TOK_CTE
        + f""", votes AS (
  SELECT doc_id,
         {vote_cols}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes
"""
    )


# ---- n-gram (shingle) Jaccard ----


def _pin_to_result(persisted, result):
    """See core.pin_cache_to_result (moved there so library operators —
    e.g. functions/timeseries.rollup_cascade — share the lifecycle)."""
    from ..core import pin_cache_to_result

    return pin_cache_to_result(persisted, result)


def dedup_ngram_jaccard(spark, sf_dir):
    """3-token shingle Jaccard with LSH-gated candidates over the WHOLE
    corpus (no doc_id bound): MinHash signatures over the shingle sets →
    band buckets → candidate pairs from equi-self-joins inside buckets →
    exact |A∩B| / |A∪B| computed only for candidates.

    Scale shape (packed-array design): shingles stay as one DISTINCT
    array per doc, so MinHash signatures are row-local ``array_min`` /
    ``transform`` expressions — NO (doc, shingle) explode and no doc_id
    shuffle to build signatures. The only shuffles are the band-bucket
    self-join (small (doc, band, key) frame — the LSH guarantee confines
    the quadratic blow-up to buckets) and the two candidate equi-joins
    against the packed shingle frame; the exact intersection is a
    row-local ``array_intersect`` on candidate pairs only. Matches the
    exploded-form oracle exactly: array_min over the distinct array ==
    groupBy-min over the exploded set, and |A|+|B|-|A∩B| == |A∪B|."""
    from pyspark import StorageLevel

    docs = _docs_par(spark, sf_dir)
    # packed per-doc shingle sets feed three consumers (signatures + both
    # sides of the candidate join); persist once, lifetime scoped to the
    # returned plan via _pin_to_result. MEMORY_AND_DISK spills gracefully
    # when shingles outgrow executors.
    sh = docs.select(
        "doc_id",
        F.array_distinct(tx.rolling_hashes(F.col("text"), k=3)).alias("sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # row-local signatures + banding via the shared packed helper (one
    # seeded-md5 pass per shingle, chunk-min signatures; see
    # _packed_band_structs for the no-CSE-inside-HOF-lambdas binding)
    bands = (
        sh.select("doc_id", F.explode(_packed_band_structs(F.col("sh"))).alias("b"))
        .select("doc_id", "b.band", "b.bkey")
        .filter(F.col("bkey").isNotNull())
    )
    cand = (
        bands.alias("ba")
        .join(
            bands.alias("bb"),
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bkey") == F.col("bb.bkey"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )
    out = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("c"),
            F.size("sa").alias("na"),
            F.size("sb").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
    return _pin_to_result(sh, out)


def _jaccard_sql() -> str:
    return rf"""
WITH tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(0, len(toks) - 2), i -> md5(array_to_string(toks[i+1:i+3], ' ')))
         ELSE [] END) AS s
  FROM tokl
){_sql_sig_bands('sh', 's')}, cand AS (
  SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM bands ba JOIN bands bb
    ON ba.band = bb.band AND ba.band_key = bb.band_key AND ba.doc_id < bb.doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS c
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
)
SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jaccard
FROM inter
JOIN sizes na ON inter.doc_a = na.doc_id
JOIN sizes nb ON inter.doc_b = nb.doc_id
WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.2
"""


# ---- embedding cosine near-dup ----

def dedup_embedding_cosine(spark, sf_dir):
    """Near-duplicate pairs by embedding cosine, LSH-gated over the WHOLE
    corpus (no vec_id bound): each vector gets an 8-bit random-hyperplane
    bucket id (pure per-row expression, shared with sim_lsh_buckets), and
    exact cosine is computed only for same-bucket pairs — an EQUI-join on
    the bucket id, never an all-pairs theta-join. Quadratic work is
    confined to buckets (corpus/256 on average)."""
    from .similarity import _dot as dot
    from .similarity import bucket_expr

    emb = load_table(spark, sf_dir, "embeddings")
    # n2 computes ONCE per vector before the self-join (the array folds
    # are CodegenFallback and re-run per pair when inline) — same
    # expression, same doubles, one fold per pair instead of three
    v = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    ).withColumn("bucket", bucket_expr(F.col("e"))).withColumn(
        "n2", dot(F.col("e"), F.col("e"))
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = dot(F.col("a.e"), F.col("b.e")) / (
        F.sqrt(F.col("a.n2")) * F.sqrt(F.col("b.n2"))
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= 0.25)
    )


def _emb_cosine_sql() -> str:
    from .similarity import bucket_sql_expr

    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), vb AS (
  SELECT vec_id, e, {bucket_sql_expr()} AS bucket FROM v
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_aggregate(list_transform(range(len(a.e)), i -> a.e[i+1] * b.e[i+1]), 'sum')
               / (sqrt(list_aggregate(list_transform(a.e, x -> x * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(b.e, x -> x * x), 'sum'))), 6) AS cos
  FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.25
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_incremental": dedup_incremental,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_cluster_canonical": dedup_cluster_canonical,
    "stream_dedup_minhash": stream_dedup_minhash,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_incremental": _incremental_sql(),
    "dedup_simhash": _simhash_sql(),
    "dedup_ngram_jaccard": _jaccard_sql(),
    "dedup_embedding_cosine": _emb_cosine_sql(),
    "dedup_cluster_canonical": _cluster_sql(),
    # bounded stream in complete mode == the batch LSH banding
    "stream_dedup_minhash": _minhash_sql(),
}


# ---- fuzzy dedup: LSH candidates + Levenshtein gate ----

def _fuzzy_pairs(docs, extra=(), persist_docs=False):
    """Shared LSH-gated Levenshtein pair pipeline over a
    ``(doc_id, text[, extras])`` frame — the single implementation behind
    both fuzzy queries (plain pairs and exact-dup-gated representatives),
    so band hashing / candidate generation / scoring can never drift
    between them. ``extra`` is ``((src_col, out_stem), ...)``: each listed
    column is carried through as ``{stem}_a`` / ``{stem}_b``.

    ``persist_docs``: the docs frame feeds THREE consumers (the shingle
    pass and both sides of the pair join). A raw scan re-reads cheaply,
    but a computed frame (the reps aggregate) would re-run its shuffle
    per consumer — pass True to materialize it once (lifetime scoped to
    the result like the band frame).

    Candidates come from MinHash banding over 3-gram SHINGLE sets (the
    ngram-Jaccard path — order-sensitive, so near-identical word
    SEQUENCES collide, not merely similar vocabularies). The
    quadratic-cost Levenshtein runs ONLY on candidate pairs, JVM-side.
    Output keeps pairs whose edit distance is <= 50% of the longer text."""
    from pyspark import StorageLevel

    pinned_docs = None
    if persist_docs:
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
        pinned_docs = docs
    sh = docs.select(
        "doc_id", F.array_distinct(tx.rolling_hashes(F.col("text"), k=3)).alias("sh")
    )
    # the band frame feeds BOTH sides of the candidate self-join — persist
    # it so the CPU-bound md5-shingle pass runs once, not twice (lifetime
    # scoped to the result frame, same pattern as the ngram-Jaccard path)
    bands = (
        sh.select("doc_id", F.explode(_packed_band_structs(F.col("sh"))).alias("b"))
        .select("doc_id", "b.band", "b.bkey")
        .filter(F.col("bkey").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    def side(suffix):
        return docs.select(
            F.col("doc_id").alias(f"doc_{suffix}"),
            F.col("text").alias(f"t{suffix}"),
            *[F.col(c).alias(f"{s}_{suffix}") for c, s in extra],
        )

    ex_cols = [f"{s}_a" for _c, s in extra] + [f"{s}_b" for _c, s in extra]
    # The candidate-pair frame is BYTE-tiny but CPU-heavy (O(len^2)
    # Levenshtein per pair; the keep filter pushes into the text join's
    # condition, so scoring runs in the stage that reads the
    # candidate-distinct shuffle). AQE's byte-based coalescing collapses
    # that stage to 1-2 tasks and serializes it — measured 319 s at the
    # 10x replica sweep on 32 cores. The explicit pair-key repartition
    # pins the parallelism: it collapses into the distinct's exchange
    # (the INITIAL formatted plan shows no extra node — same
    # hashpartitioning either way) but AQE's re-optimization carries
    # the user REPARTITION_BY_NUM intent, which coalescing must honor.
    # Stage probe at 10x/32 cores: final stage 32 tasks / 4.4 s wall
    # WITH the repartition vs 2 tasks / 39.8 s without. It must sit
    # AFTER the text-side joins: placed before them, the join
    # re-shuffles by its own key and the scoring stage inherits the
    # join's byte-coalesced layout again (measured: 40.9 s before-joins
    # vs 4.7 s after-joins for the same 294,800-pair scoring pass).
    par = docs.sparkSession.sparkContext.defaultParallelism
    paired = (
        cand.join(side("a"), "doc_a")
        .join(side("b"), "doc_b")
        .repartition(par, "doc_a", "doc_b")
        .select(
            "doc_a",
            "doc_b",
            *ex_cols,
            "ta",
            "tb",
            F.greatest(F.length("ta"), F.length("tb")).alias("mx"),
        )
        # sound pre-gate: levenshtein(a, b) >= |len(a) - len(b)|, and
        # round(x * 1e6 / mx) is monotone in x — a pair whose LENGTH
        # difference already rounds past the keep bound can never pass
        # the exact filter below, so its O(len^2) distance is
        # thrown-away work (guide §1.2). NULL/zero-length edge cases
        # keep flowing (coalesce TRUE) for the exact filter to decide.
        .filter(
            F.coalesce(
                F.round(
                    F.abs(F.length("ta") - F.length("tb")) * 1e6 / F.col("mx")
                )
                <= 500000,
                F.lit(True),
            )
        )
        .select(
            "doc_a",
            "doc_b",
            *ex_cols,
            # identical texts short-circuit the O(len^2) distance to an
            # O(len) equality check — levenshtein(x, x) = 0 exactly; on
            # near-dup-heavy corpora (the scale case) most candidate
            # pairs are exact copies
            F.when(F.col("ta") == F.col("tb"), F.lit(0))
            .otherwise(F.levenshtein("ta", "tb"))
            .cast("bigint")
            .alias("lev"),
            "mx",
        )
    )
    out = paired.select(
        "doc_a",
        "doc_b",
        *ex_cols,
        "lev",
        F.round(F.col("lev") * 1e6 / F.col("mx")).cast("bigint").alias("rel_micro"),
    ).filter(F.col("rel_micro") <= 500000)
    out = _pin_to_result(bands, out)
    if pinned_docs is not None:
        out = _pin_to_result(pinned_docs, out)
    return out


def dedup_fuzzy_levenshtein(spark, sf_dir):
    """Edit-distance near-dup pairs over the raw corpus (every doc is its
    own row, so exact copies pair up too — see dedup_fuzzy_reps for the
    near-dup-heavy-corpus scale path). Pipeline: _fuzzy_pairs."""
    # _docs_par: the md5-shingle pass is CPU-bound — see its docstring
    return _fuzzy_pairs(_docs_par(spark, sf_dir).select("doc_id", "text"))


def _fuzzy_pair_sql(src: str, prefix: str = "", extra=()) -> str:
    """Oracle twin of :func:`_fuzzy_pairs`, parameterized the same way:
    ``src`` is the relation providing (doc_id, text[, extras]) — a table
    or a CTE declared in ``prefix`` — and ``extra`` mirrors the Spark
    helper's carried columns."""
    ex_paired = "".join(f" ra.{c} AS {s}_a, rb.{c} AS {s}_b," for c, s in extra)
    ex_final = "".join(f" {s}_a, {s}_b," for _c, s in extra)
    return (
        "WITH "
        + (prefix + ",\n" if prefix else "")
        + rf"""tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != '') AS toks
  FROM {src}
), sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(0, len(toks) - 2), i -> md5(array_to_string(toks[i+1:i+3], ' ')))
         ELSE [] END) AS s
  FROM tokl
)"""
        + _sql_sig_bands("sh", "s")
        + f"""
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), paired AS (
  SELECT c.doc_a, c.doc_b,{ex_paired}
         CAST(levenshtein(ra.text, rb.text) AS BIGINT) AS lev,
         greatest(length(ra.text), length(rb.text)) AS mx
  FROM cand c
  JOIN {src} ra ON ra.doc_id = c.doc_a
  JOIN {src} rb ON rb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,{ex_final} lev,
       CAST(round(lev * 1e6 / mx) AS BIGINT) AS rel_micro
FROM paired WHERE CAST(round(lev * 1e6 / mx) AS BIGINT) <= 500000
"""
    )


QUERIES.update({"dedup_fuzzy_levenshtein": dedup_fuzzy_levenshtein})
ORACLES.update({"dedup_fuzzy_levenshtein": _fuzzy_pair_sql("documents")})


def dedup_fuzzy_reps(spark, sf_dir):
    """Fuzzy dedup with an exact-duplicate gate — the scale path for
    near-dup-heavy corpora (web crawls commonly carry many byte-identical
    copies per page).

    The plain pair query's candidate join is quadratic in copies-per-
    bucket: the 10x replica sweep measured 126x wall time at 10x data,
    almost all of it pair-output cardinality (each doc gained ~10 exact
    copies, so the PAIR SET itself grows ~100x — no plan can beat its
    own output size). The fix is semantic: collapse byte-identical texts
    to one representative FIRST (one hash aggregate, linear), run the
    shared _fuzzy_pairs pipeline over representatives only, and carry the
    copy counts. Exact copies never pay Levenshtein, and candidate
    buckets stay bounded by DISTINCT-text density, not raw row count.
    Measured: 1.1x at the same 10x replica blow-up."""
    docs = _docs_par(spark, sf_dir).select("doc_id", "text")
    reps = docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return _fuzzy_pairs(reps, extra=(("n_copies", "copies"),), persist_docs=True)


_REPS_CTE = """reps AS (
  SELECT min(doc_id) AS doc_id, text, count(*) AS n_copies
  FROM documents GROUP BY text
)"""

QUERIES.update({"dedup_fuzzy_reps": dedup_fuzzy_reps})
ORACLES.update({"dedup_fuzzy_reps": _fuzzy_pair_sql("reps", prefix=_REPS_CTE, extra=(("n_copies", "copies"),))})
