"""Property fuzz for NESTED DDL (round 12): random sequences of nested
RENAME / ADD / DROP / append / full compact over a struct column,
checked against a pure-Python model keyed by stable field UIDs — the
identity the physical-path machinery must preserve. Catches exactly
the resolution bugs the design guards against: a rename resolving the
wrong bytes, a re-add resurrecting dropped bytes, a post-compact
spelling leak.

Soak mode: ``DAKSPARK_HYPO_EXAMPLES=40 python -m pytest
tests/test_snapshot_nested_fuzz.py``."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st_
from pyspark.sql import functions as F

from dask_awkward_spark.sources.snapshot import (
    snapshot_add_columns,
    snapshot_compact,
    snapshot_drop_column,
    snapshot_read,
    snapshot_rename_column,
    snapshot_write,
)

pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")

SETTINGS = dict(
    max_examples=int(os.environ.get("DAKSPARK_HYPO_EXAMPLES", "8")),
    deadline=None,
)

#: the small closed name pool keeps collisions/tombstone-reuse LIKELY
_NAMES = ("alpha", "beta", "gamma", "delta")

_op = st_.one_of(
    st_.tuples(st_.just("append"), st_.integers(1, 4)),
    st_.tuples(
        st_.just("rename"), st_.sampled_from(_NAMES), st_.sampled_from(_NAMES)
    ),
    st_.tuples(st_.just("add"), st_.sampled_from(_NAMES)),
    st_.tuples(st_.just("drop"), st_.sampled_from(_NAMES)),
    st_.tuples(st_.just("compact")),
)


def _row_df(spark, ks: "list[int]", fields: "list[tuple[int, str]]"):
    """One append frame: every live field valued f(uid, k)."""
    df = spark.createDataFrame([(k,) for k in ks], "k bigint")
    return df.select(
        "k",
        F.struct(
            *[
                (F.col("k") * 1000 + F.lit(uid)).cast("bigint").alias(name)
                for uid, name in fields
            ]
        ).alias("meta"),
    )


@given(ops=st_.lists(_op, min_size=3, max_size=8))
@settings(**SETTINGS)
def test_nested_ddl_sequences_match_uid_model(spark, tmp_path_factory, ops):
    p = str(tmp_path_factory.mktemp("nestfuzz") / "tbl")
    # model state -----------------------------------------------------
    # fields: ordered (uid, logical_name); phys[uid] = stored spelling
    # (creation spelling, survives renames, resets on full compact);
    # tombs: case-folded physical spellings whose bytes are dead;
    # rows: per appended row, {uid: value} for the fields live then
    fields: "list[tuple[int, str]]" = [(1, "alpha"), (2, "beta")]
    phys = {1: "alpha", 2: "beta"}
    tombs: "set[str]" = set()
    rows: "list[tuple[int, dict]]" = []
    next_uid = 3
    next_k = 0

    def live(name: str) -> "tuple[int, str] | None":
        for uid, n in fields:
            if n.lower() == name.lower():
                return (uid, n)
        return None

    ks = list(range(next_k, next_k + 2))
    next_k += 2
    snapshot_write(_row_df(spark, ks, fields), p)
    for k in ks:
        rows.append((k, {uid: k * 1000 + uid for uid, _ in fields}))

    for op in ops:
        if op[0] == "append":
            ks = list(range(next_k, next_k + op[1]))
            next_k += op[1]
            snapshot_write(_row_df(spark, ks, fields), p, mode="append")
            for k in ks:
                rows.append((k, {uid: k * 1000 + uid for uid, _ in fields}))
        elif op[0] == "rename":
            _kind, old, new = op
            src = live(old)
            # model the refusals exactly: missing source, sibling
            # collision, tombstoned target spelling (an exact-spelling
            # self-rename is an idempotent NO-OP, not a refusal)
            tgt = live(new)
            expect_ok = (
                src is not None
                and (tgt is None or tgt[0] == src[0])
                and f"meta.{new.lower()}" not in tombs
            )
            try:
                snapshot_rename_column(p, f"meta.{old}", new)
                assert expect_ok, f"rename {old}->{new} should refuse"
                if src[1] != new:
                    fields = [
                        (uid, new if uid == src[0] else n)
                        for uid, n in fields
                    ]
            except ValueError:
                assert not expect_ok, f"rename {old}->{new} should pass"
        elif op[0] == "add":
            name = op[1]
            taken_phys = {
                phys[uid].lower() for uid, n in fields if phys[uid] != n
            }
            expect_ok = (
                live(name) is None
                and f"meta.{name.lower()}" not in tombs
                and name.lower() not in taken_phys
            )
            try:
                snapshot_add_columns(p, f"meta.{name} bigint")
                assert expect_ok, f"add {name} should refuse"
                fields.append((next_uid, name))
                phys[next_uid] = name
                next_uid += 1
            except ValueError:
                assert not expect_ok, f"add {name} should pass"
        elif op[0] == "drop":
            name = op[1]
            src = live(name)
            expect_ok = src is not None and len(fields) > 1
            try:
                snapshot_drop_column(p, f"meta.{name}")
                assert expect_ok, f"drop {name} should refuse"
                tombs.add(f"meta.{phys[src[0]].lower()}")
                fields = [(uid, n) for uid, n in fields if uid != src[0]]
            except ValueError:
                assert not expect_ok, f"drop {name} should pass"
        else:  # full compact: every file rewritten — tombstones AND
            # physical respellings reset to the current logical names
            snapshot_compact(spark, p)
            tombs = set()
            phys = {uid: n for uid, n in fields}
        # invariant after EVERY op: read back equals the uid model
        got = {
            r["k"]: r["meta"].asDict()
            for r in snapshot_read(spark, p).collect()
        }
        assert set(got) == {k for k, _ in rows}
        assert (
            list(got[rows[0][0]].keys()) == [n for _uid, n in fields]
        ), "schema spelling drifted"
        for k, vals in rows:
            for uid, name in fields:
                assert got[k][name] == vals.get(uid), (
                    f"k={k} field {name} (uid {uid}): got {got[k][name]}, "
                    f"want {vals.get(uid)} — wrong bytes resolved"
                )
