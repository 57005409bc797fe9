"""String min/max truncation in manifest stats (sources/snapshot.py
_truncate_stats — Delta's dataSkipping string-truncation analog):
long string values enter manifests as <=32-char bounds (min = prefix,
max = incremented prefix), keeping per-file stats entries bounded no
matter the column's value length, while range predicates keep pruning
(truncated bounds are merely wider) and the whole-file all-match
proof — which equality on a prefix can no longer support — refuses
truncated columns explicitly. VERDICT r10 next-round item 1."""

from __future__ import annotations

import json

import pytest

# every test runs under BOTH data-plane backends (posix / object-copy)
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    _STATS_STR_MAX,
    _file_all_match,
    _prune_files,
    _read_manifest,
    _trunc_str_max,
    _truncate_stats,
    _versions,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)


# ---- pure-function unit coverage --------------------------------------


def test_trunc_str_max_is_a_sound_strict_upper_bound():
    s = "m" * 100
    hi = _trunc_str_max(s, 32)
    assert hi is not None and len(hi) <= 32
    assert hi > s  # bounds EVERY extension of the prefix, not just s
    assert hi > s + "z" * 1000


def test_trunc_str_max_carries_past_unbumpable_chars():
    # last prefix char is U+10FFFF (nothing above it): the bump must
    # carry leftward, not overflow
    s = "ab" + chr(0x10FFFF) * 40
    hi = _trunc_str_max(s, 32)
    assert hi == "ac"
    assert hi > s


def test_trunc_str_max_skips_the_surrogate_gap():
    # bumping U+D7FF lands in the lone-surrogate range, which JSON can
    # carry but UTF-8 parquet cannot — the bound must jump to U+E000
    s = "x" * 31 + chr(0xD7FF) + "y" * 50
    hi = _trunc_str_max(s, 32)
    assert hi == "x" * 31 + chr(0xE000)
    assert hi > s
    hi.encode("utf-8")  # must stay encodable


def test_trunc_str_max_no_bound_possible():
    assert _trunc_str_max(chr(0x10FFFF) * 64, 32) is None


def test_truncate_stats_marks_and_widens():
    long_lo = "a" * 100
    long_hi = "b" * 100
    mm = {
        "text": [long_lo, long_hi],
        "short": ["x", "y"],
        "n": [1, 9],
        "hopeless": ["a", chr(0x10FFFF) * 64],
    }
    trunc = _truncate_stats(mm)
    assert trunc == ["text"]
    lo, hi = mm["text"]
    assert lo == "a" * 32 and len(hi) <= 32
    assert lo <= long_lo and hi > long_hi
    assert mm["short"] == ["x", "y"]  # short values stay verbatim
    assert mm["n"] == [1, 9]  # non-strings untouched
    assert "hopeless" not in mm  # unbumpable max: entry dropped whole


def test_all_match_refuses_truncated_columns():
    v = "a" * 32
    stats = {
        "rows": 5,
        "minmax": {"text": [v, "b"]},
        "nulls": {"text": 0},
        "trunc": ["text"],
    }
    # without the marker this would "prove" nothing anyway (lo != hi),
    # but the refusal must hold even for inequality shapes
    assert not _file_all_match(stats, [("text", "<", "zzz")])
    untrunc = {k: v2 for k, v2 in stats.items() if k != "trunc"}
    assert _file_all_match(untrunc, [("text", "<", "zzz")])


# ---- end-to-end through a snapshot table -------------------------------


def _long_text_df(spark, prefix: str, n=200):
    # every value ~2 KB, all sharing a 1-char-distinguished head so the
    # two files' ranges separate cleanly
    return spark.range(n).select(
        F.col("id"),
        F.concat(
            F.lit(prefix),
            F.lpad(F.col("id").cast("string"), 6, "0"),
            F.lit("x" * 2000),
        ).alias("text"),
    )


def test_manifest_bytes_stay_bounded_on_long_strings(spark, tmp_path):
    """The regression the feature exists for: a 2 KB-value column must
    not carry two 2 KB bounds per file per manifest entry."""
    p = str(tmp_path / "tbl")
    snapshot_write(_long_text_df(spark, "a").repartition(4), p)
    m = _read_manifest(p, _versions(p)[-1])
    for f in m["files"]:
        s = m["stats"][f]
        mm = s["minmax"]["text"]
        assert len(mm[0]) <= _STATS_STR_MAX and len(mm[1]) <= _STATS_STR_MAX
        assert "text" in s.get("trunc", ())
        # the whole per-file stats entry is bounded, not just one field
        assert len(json.dumps(s)) < 1000


def test_truncated_bounds_still_prune_ranges(spark, tmp_path):
    p = str(tmp_path / "tbl")
    snapshot_write(_long_text_df(spark, "a").coalesce(1), p)
    snapshot_write(_long_text_df(spark, "z").coalesce(1), p, mode="append")
    m = _read_manifest(p, _versions(p)[-1])
    assert len(m["files"]) == 2
    kept, skipped = _prune_files(m, [("text", "<", "m")])
    assert skipped == 1 and len(kept) == 1  # the z-file pruned
    kept, skipped = _prune_files(m, [("text", ">", "m")])
    assert skipped == 1  # the a-file pruned
    # and the values actually read back correctly under the predicate
    got = snapshot_read(spark, p, where=[("text", "<", "m")]).count()
    assert got == 200


def test_delete_on_truncated_column_never_misdrops(spark, tmp_path):
    """The correctness trap (VERDICT r10 item 1): a file whose rows
    share a long prefix but differ past the cap must NOT be whole-file
    dropped by an equality on one of its values."""
    p = str(tmp_path / "tbl")
    # one file, all rows share the first 32 chars, tails differ
    snapshot_write(_long_text_df(spark, "a" * 40).coalesce(1), p)
    victim = (
        snapshot_read(spark, p).where(F.col("id") == 7).collect()[0].text
    )
    res = snapshot_delete(spark, p, [("text", "=", victim)])
    assert snapshot_read(spark, p).count() == 199
    assert (
        snapshot_read(spark, p).where(F.col("id") == 7).count() == 0
    )


def test_delete_whole_file_fast_path_still_fires_on_short_strings(
    spark, tmp_path
):
    """Short (untruncated) string stats keep the metadata-only DELETE
    proof — truncation must not regress the aligned-delete headline."""
    p = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id"), F.lit("hot").alias("tier")
    )
    snapshot_write(df.coalesce(1), p)
    snapshot_write(
        spark.range(100, 200).select(
            F.col("id"), F.lit("cold").alias("tier")
        ).coalesce(1),
        p,
        mode="append",
    )
    res = snapshot_delete(spark, p, [("tier", "=", "cold")])
    assert res.get("files_rewritten", 0) == 0  # metadata-only drop
    assert snapshot_read(spark, p).count() == 100


def test_dist_prune_agrees_on_truncated_strings(spark, tmp_path):
    """The executor-side sidecar prune carries the TRUNCATED bounds and
    must keep exactly the files the driver loop keeps — the
    two-prune-paths-agree discipline extended to the widened-bounds
    case (both paths are may-match only; the trunc marker gates only
    the all-match fast path, which is driver-side)."""
    from dask_awkward_spark.sources.snapshot import (
        _dist_prune_files,
        _where_phys,
    )

    p = str(tmp_path / "tbl")
    snapshot_write(_long_text_df(spark, "a").coalesce(1), p)
    snapshot_write(_long_text_df(spark, "m").coalesce(1), p, mode="append")
    snapshot_write(
        _long_text_df(spark, "z").coalesce(1), p, mode="overwrite"
    )
    snapshot_write(_long_text_df(spark, "a").coalesce(1), p, mode="append")
    snapshot_write(_long_text_df(spark, "m").coalesce(1), p, mode="append")
    v = _versions(p)[-1]
    m = _read_manifest(p, v)
    assert len(m["files"]) == 3
    for where in [
        [("text", "<", "m")],
        [("text", ">", "m")],
        [("text", "=", "a" * 40)],
        [("text", ">=", "z"), ("id", "<", 100)],
        [("text", "in", ["a", "zz"])],
    ]:
        pw = _where_phys(m, where)
        dist = _dist_prune_files(spark, p, v, m, pw)
        drv, _ = _prune_files(m, pw, None)
        assert dist == drv, where


def test_trunc_str_max_property_fuzz():
    """Property: for ANY string, the truncated max is <= cap chars,
    strictly greater than the original AND every extension of it,
    UTF-8-encodable, and JSON-round-trippable — or None only when every
    prefix char is U+10FFFF."""
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=300, deadline=None)
    @given(
        st_.text(
            alphabet=st_.characters(
                codec="utf-8", min_codepoint=1
            ),
            min_size=33,
            max_size=200,
        )
    )
    def prop(s):
        hi = _trunc_str_max(s, 32)
        if hi is None:
            assert all(ord(c) >= 0x10FFFF for c in s[:32])
            return
        assert len(hi) <= 32
        assert hi > s
        assert hi > s + "\U0010FFFF" * 4  # bounds every extension
        hi.encode("utf-8")
        assert json.loads(json.dumps(hi)) == hi

    prop()


def test_truncate_stats_property_fuzz():
    """Property over full min/max pairs: after truncation the bounds
    still bracket the originals ([lo', hi'] wider), both fit the cap,
    and sorting by the bounds never misorders vs the originals."""
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    text = st_.text(
        alphabet=st_.characters(codec="utf-8", min_codepoint=1),
        min_size=0,
        max_size=120,
    )

    @settings(max_examples=300, deadline=None)
    @given(text, text)
    def prop(a, b):
        lo, hi = sorted([a, b])
        mm = {"c": [lo, hi]}
        marked = _truncate_stats(mm)
        if "c" not in mm:
            return  # dropped whole (unbumpable): always safe
        nlo, nhi = mm["c"]
        assert len(nlo) <= _STATS_STR_MAX and len(nhi) <= _STATS_STR_MAX
        assert nlo <= lo and nhi >= hi  # only ever WIDER
        if marked:
            assert marked == ["c"]
        else:
            assert (nlo, nhi) == (lo, hi)  # untouched when short

    prop()
