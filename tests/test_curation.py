"""Public curation API (functions/curation.py): parameterized versions of
the oracle-checked splits/quota/packing/contamination queries."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dask_awkward_spark.functions.curation import (
    assign_split,
    cap_running_budget,
    contamination,
    deterministic_shuffle,
    hash_key,
    pack_sequences,
    quota_sample,
)


def _md5_8(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(1000).withColumn("w", (F.col("id") % 7 + 1).cast("bigint"))


def test_hash_key_matches_md5(spark):
    got = spark.range(5).select(hash_key(F.col("id")).alias("h")).collect()
    assert [r.h for r in got] == [_md5_8(str(i)) for i in range(5)]


def test_assign_split_fractions_and_determinism(spark, ids):
    out = assign_split(ids, F.col("id"), {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert 700 < counts["train"] < 900  # ~800 of 1000
    # pure function of the key: a repartitioned re-run assigns identically
    again = assign_split(ids.repartition(13), F.col("id"), {"train": 0.8, "valid": 0.1, "test": 0.1})
    assert out.select("id", "split").exceptAll(again.select("id", "split")).count() == 0
    # python-side replication of the gate
    lbl = {r["id"]: r["split"] for r in out.collect()}
    for i in (0, 17, 999):
        h = int(_md5_8(str(i)), 16)
        want = "train" if h < 0.8 * 2**32 else ("valid" if h < 0.9 * 2**32 else "test")
        assert lbl[i] == want


def test_assign_split_validation(spark, ids):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(ids, F.col("id"), {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="two split labels"):
        assign_split(ids, F.col("id"), {"a": 1.0})


def test_quota_sample_float_and_column_rates_agree(spark, ids):
    flat = quota_sample(ids, F.col("id"), 0.3)
    col = quota_sample(ids, F.col("id"), F.lit(0.3))
    assert sorted(r.id for r in flat.collect()) == sorted(r.id for r in col.collect())
    n = flat.count()
    assert 230 < n < 370  # ~300


def test_deterministic_shuffle_is_stable(spark, ids):
    a = [r.id for r in deterministic_shuffle(ids, F.col("id")).limit(50).collect()]
    b = [r.id for r in deterministic_shuffle(ids.repartition(7), F.col("id")).limit(50).collect()]
    assert a == b
    assert a != sorted(a)  # actually permuted


def test_cap_running_budget_per_shard(spark, ids):
    df = ids.withColumn("shard", (F.col("id") % 3).cast("int"))
    kept = cap_running_budget(df, "shard", F.col("id"), "w", budget=100)
    # every shard's kept set: walking in hash order, start offsets < 100
    rows = kept.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    full = df.collect()
    for shard in (0, 1, 2):
        ordered = sorted(
            (r for r in full if r["shard"] == shard),
            key=lambda r: (_md5_8(str(r["id"])), r["id"]),
        )
        want, acc = set(), 0
        for r in ordered:
            if acc < 100:
                want.add(r["id"])
            acc += r["w"]
        assert {r["id"] for r in by_shard[shard]} == want


def test_pack_sequences_budget_boundaries(spark, ids):
    df = ids.withColumn("shard", F.lit("s"))
    packed = pack_sequences(df, "shard", F.col("id"), "w", budget=50)
    rows = sorted(packed.collect(), key=lambda r: r["id"])
    acc = 0
    for r in rows:
        assert r["pack_id"] == acc // 50
        acc += r["w"]
    # pack totals never exceed budget by more than one row's weight
    sizes = {}
    for r in rows:
        sizes[r["pack_id"]] = sizes.get(r["pack_id"], 0) + r["w"]
    assert all(s < 50 + 7 for s in sizes.values())


def test_contamination_matches_bruteforce(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat today"),
            (2, "completely different words entirely here now"),
            (3, "the cat sat on a log"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, "the cat sat on the mat")], "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["n_sh"], r["n_shared"])
        for r in contamination(corpus, bench, k=3, include_clean=True).collect()
    }

    def sh(text):
        toks = text.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bset = sh("the cat sat on the mat")
    for doc_id, text in [(1, "the cat sat on the mat today"), (3, "the cat sat on a log")]:
        s = sh(text)
        overlap = len(s & bset)
        if overlap:
            assert out[doc_id] == (len(s), overlap)
    # include_clean=True returns the FULL population: the clean doc
    # surfaces with zero overlap instead of dropping out
    assert out[2][1] == 0 and out[2][0] > 0
    frac0 = {
        r["doc_id"]: r["frac"]
        for r in contamination(corpus, bench, k=3, include_clean=True).collect()
    }
    assert frac0[2] == 0.0
    # the DEFAULT (dirty-only, historical semantics) drops the clean doc
    dirty = {r["doc_id"] for r in contamination(corpus, bench, k=3).collect()}
    assert 2 not in dirty and 1 in dirty
    # a doc too short for any 3-gram shingle still returns (n_sh=0, frac=0)
    tiny = corpus.union(
        spark.createDataFrame([(4, "hi")], "doc_id bigint, text string")
    )
    all_rows = {
        r["doc_id"]: (r["n_sh"], r["n_shared"], r["frac"])
        for r in contamination(tiny, bench, k=3, include_clean=True).collect()
    }
    assert all_rows[4] == (0, 0, 0.0)
    # threshold knob: positive min_overlap keeps the inner-join shape
    hi = contamination(corpus, bench, k=3, min_overlap=0.9).collect()
    assert all(r["frac"] >= 0.9 for r in hi)
    assert all(r["doc_id"] != 2 for r in hi)
    # contradictory ask refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="include_clean"):
        contamination(corpus, bench, k=3, min_overlap=0.5, include_clean=True)


def test_contamination_plan_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    bench = spark.createDataFrame([(2, "a b c")], "doc_id bigint, text string")
    plan = contamination(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quota_sample_composes_with_streaming(spark, tmp_path):
    """Hash-gate curation ops are row-local expressions, so they run
    unchanged on a stream — and select exactly the rows the batch path
    selects (determinism across execution modes)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_awkward_spark.sources.tables import load_table, stream_table

    t = pa.table(
        {
            "doc_id": pa.array(list(range(500)), pa.int64()),
            "text": pa.array(["x"] * 500),
            "lang": pa.array(["en"] * 500),
            "source": pa.array(["s"] * 500),
            "n_chars": pa.array([1] * 500, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    batch_ids = sorted(
        r.doc_id
        for r in quota_sample(load_table(spark, str(tmp_path), "documents"), F.col("doc_id"), 0.3)
        .select("doc_id")
        .collect()
    )
    st = quota_sample(stream_table(spark, str(tmp_path), "documents"), F.col("doc_id"), 0.3)
    name = "cur_" + uuid.uuid4().hex[:6]
    q = st.select("doc_id").writeStream.format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    stream_ids = sorted(r.doc_id for r in spark.table(name).collect())
    assert stream_ids == batch_ids
    assert 100 < len(batch_ids) < 200  # ~150


# ---- temperature mixing (round 10 — XLM-R language sampling) ----------


def test_temperature_mix_flattens_head(spark):
    """The point of T>1: the dominant group's kept SHARE shrinks versus
    its natural share, rare groups' shares grow; total ~= target."""
    from dask_awkward_spark.functions.curation import temperature_mix

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 700, "en")
        .when(F.col("id") < 900, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    out = temperature_mix(df, "lang", F.col("doc_id"), total_rows=500)
    kept = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(kept.values())
    assert abs(total - 500) <= 3  # floor rounding per group
    # natural en share 0.70; sqrt-weights: en share = sqrt(700)/Z ~ 0.48
    assert kept["en"] / total < 0.55
    assert kept["fr"] / total > 0.10  # natural 0.10 -> boosted
    # deterministic: identical output on a re-run over a reshuffle
    again = temperature_mix(
        df.repartition(7), "lang", F.col("doc_id"), total_rows=500
    )
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out.select("doc_id", "lang").collect()
    )


def test_temperature_mix_refusals_and_t1(spark):
    from dask_awkward_spark.functions.curation import temperature_mix

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    with pytest.raises(ValueError, match="total_rows"):
        temperature_mix(df, "lang", F.col("doc_id"), -1)
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, "lang", F.col("doc_id"), 10, temperature=0)
    # T=1: natural proportions (single group keeps exactly the target)
    out = temperature_mix(
        df, "lang", F.col("doc_id"), 40, temperature=1.0
    )
    assert out.count() == 40


def test_temperature_mix_null_group_and_saturation(spark):
    """Round-10 review regressions: a NULL group key samples like any
    other group (null-safe join, None-first quota ordering), and a
    group smaller than its quota contributes everything it has (the
    target is an upper bound — no silent crash, no empty result)."""
    from dask_awkward_spark.functions.curation import temperature_mix

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, "en")
        .when(F.col("id") < 290, None)
        .otherwise("fr")
        .alias("lang"),
    )
    out = temperature_mix(df, "lang", F.col("doc_id"), total_rows=150)
    kept = {
        r.lang: r.cnt
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert None in kept and kept[None] > 0
    assert kept.get("fr", 0) <= 10  # saturation caps at the group size
    assert sum(kept.values()) <= 150
    # all-NULL group column still samples (not an empty frame)
    allnull = df.withColumn("lang", F.lit(None).cast("string"))
    got = temperature_mix(allnull, "lang", F.col("doc_id"), total_rows=50)
    assert got.count() == 50
    # unset= as a bare string is refused loudly on the properties face
    from dask_awkward_spark.sources.snapshot import snapshot_set_properties

    with pytest.raises(ValueError, match="LIST of keys"):
        snapshot_set_properties("/tmp/nowhere", unset="owner")


def test_show_create_quote_escape_roundtrip(spark, tmp_path):
    """SHOW CREATE TABLE output with a quoted property value replays
    through the DDL parser (doubled-quote escape both ways)."""
    from dask_awkward_spark.sources.snapshot import (
        snapshot_set_properties,
        snapshot_write,
        _read_manifest,
        _versions,
    )
    from dask_awkward_spark.sources.sqlface import snapshot_sql

    p = str(tmp_path / "t")
    snapshot_write(spark.createDataFrame([(1,)], "k bigint"), p)
    snapshot_set_properties(p, {"owner": "O'Brien"})
    stmt = snapshot_sql(spark, "SHOW CREATE TABLE t", {"t": p}).first()[0]
    assert "'O''Brien'" in stmt
    # replay the CREATE at a new location: the parser accepts its own
    # renderer's output and the property survives the round trip
    p2 = str(tmp_path / "t2")
    replay = stmt.split(";")[0].replace(f"'{p}'", f"'{p2}'").replace(
        "CREATE TABLE t ", "CREATE TABLE t2 "
    )
    snapshot_sql(spark, replay, {"t2": p2})
    assert _read_manifest(p2, _versions(p2)[-1])["properties"] == {
        "owner": "O'Brien"
    }
    # UNSET with the escaped spelling, and reserved-key refusals
    snapshot_sql(spark, "ALTER TABLE t UNSET TBLPROPERTIES ('owner')", {"t": p})
    assert _read_manifest(p, _versions(p)[-1])["properties"] is None
    with pytest.raises(ValueError, match="engine-reserved"):
        snapshot_sql(
            spark, "ALTER TABLE t UNSET TBLPROPERTIES ('stats_columns')",
            {"t": p},
        )
    with pytest.raises(ValueError, match="split into two"):
        snapshot_sql(
            spark,
            "ALTER TABLE t SET TBLPROPERTIES ('stats_columns'='k', 'o'='1')",
            {"t": p},
        )


def test_write_properties_inherit_replace_clear(spark, tmp_path):
    """snapshot_write's properties tri-state (ADVICE r10): omitted
    inherits, an explicit dict REPLACES the whole set, an explicit {}
    clears — the one data-write spelling that can."""
    from dask_awkward_spark.sources.snapshot import (
        _read_manifest,
        _versions,
        snapshot_read,
        snapshot_write,
    )

    p = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame([(1,)], "k bigint"), p,
        properties={"owner": "a", "tier": "gold"},
    )
    props = lambda: _read_manifest(p, _versions(p)[-1])["properties"]  # noqa: E731
    assert props() == {"owner": "a", "tier": "gold"}
    # omitted -> inherit
    snapshot_write(spark.createDataFrame([(2,)], "k bigint"), p, mode="append")
    assert props() == {"owner": "a", "tier": "gold"}
    # explicit dict -> REPLACE (tier gone, not merged)
    snapshot_write(
        spark.createDataFrame([(3,)], "k bigint"), p, properties={"owner": "b"}
    )
    assert props() == {"owner": "b"}
    # explicit {} -> CLEAR
    snapshot_write(spark.createDataFrame([(4,)], "k bigint"), p, properties={})
    assert props() is None
    # and rows were never disturbed by the property commits
    assert snapshot_read(spark, p).count() == 1
