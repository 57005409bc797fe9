"""Property fuzzer for the snapshot table layer: random op sequences
(overwrite / append / compact / zorder-compact / vacuum) executed against
both the real implementation and a trivial in-memory model; every
surviving version must read back exactly the model's rows, and change
feeds over append-only spans must equal the model's delta."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

from dask_awkward_spark.sources.snapshot import (
    snapshot_changes,
    snapshot_delete,
    snapshot_compact,
    snapshot_merge,
    snapshot_read,
    snapshot_update,
    snapshot_vacuum,
    snapshot_write,
)

# the model fuzzer runs under BOTH data-plane backends (posix /
# object-store copy emulation) — VERDICT r6 item 1
pytestmark = pytest.mark.usefixtures("snapshot_storage_backend")

# the fuzzer also runs the append fast path's carried-stats diff
# EXHAUSTIVELY (not the 64-sample spot check) so a mutator that edits a
# carried file's stats entry in place — breaking the copy-dict-never-
# entries convention — fails here deterministically (ADVICE r10)
@pytest.fixture(autouse=True)
def _exact_delta_diff(monkeypatch):
    monkeypatch.setenv("DAK_SNAPSHOT_EXACT_DELTA_DIFF", "1")

SETTINGS = dict(
    # soak mode: DAKSPARK_HYPO_EXAMPLES=50 python -m pytest tests/test_snapshot_fuzz.py
    max_examples=int(os.environ.get("DAKSPARK_HYPO_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# an op is one of:
#   ("overwrite", lo, n) — replace with rows lo..lo+n
#   ("append", lo, n)    — add rows lo..lo+n
#   ("compact", z)       — rewrite head (z: zorder on id or plain)
#   ("vacuum", keep)     — trim history to keep_last=keep, retention 0
#   ("delete", lo, n)    — copy-on-write delete of rows in [lo, lo+n)
#   ("update", lo, n)    — copy-on-write UPDATE: id += 17 where id in [lo, lo+n)
#   ("merge", lo, n)     — upsert ids lo..lo+n (matched rows keep their
#                          one-column value, unmatched ids insert)
#   ("merge_del", lo, n) — merge with when_matched=delete (drop matched ids)
#   ("narrow_append", lo, n) — append the rows at INT width through
#                          merge_schema (upcasts into the bigint table:
#                          the type-widening read path under fuzz)
#   ("rename",)          — metadata-only column rename (id <-> rid via
#                          column mapping): every later op uses the NEW
#                          name, every earlier version keeps its own
#   ("racy_delete", lo, n) — copy-on-write delete racing a concurrent
#                          blind append of disjoint high keys injected
#                          mid-staging: exercises the rebase-vs-restart
#                          commit path under the model (VERDICT r7
#                          item 5)
#   ("set_stats", flag)  — metadata-only stats-spec flip (VERDICT r9
#                          item 4): row-preserving, every read and both
#                          change-feed shapes must cross it unchanged
#   ("merge_sync", lo, n) — full sync replication in ONE commit: upsert
#                          ids lo..lo+n AND delete every target row the
#                          source does not key (WHEN NOT MATCHED BY
#                          SOURCE, VERDICT r9 item 3); duplicate target
#                          keys each keep one updated row
#   ("add_col",)         — metadata-only ADD COLUMNS (round-9 DDL face):
#                          widens the schema with a NULL double; every
#                          later writer carries it, every earlier
#                          version keeps its own narrower schema, and
#                          both feed shapes must cross the commit
#   ("set_pspec", 0|1|2) — partition-spec EVOLUTION (round-9
#                          continuation): metadata-only flip between
#                          flat (0), identity-partitioned (1), and
#                          TRANSFORM-partitioned (2, round 10 —
#                          truncate/bucket derived directory values);
#                          later writers follow the current spec, mixed
#                          layouts must read the model exactly and
#                          feeds must cross
#   ("sql_delete"|"sql_update"|"sql_insert", lo, n) — the SAME mutation
#                          as delete/update/append but routed through
#                          the snapshot_sql STRING face: the fuzz model
#                          must hold identically whichever front issued
#                          the commit (the SQL face is a front, not a
#                          reimplementation — this is the proof)
#   ("sql_script", lo, n, fail) — atomic two-statement script (round
#                          11): INSERT+DELETE publish as ONE commit, or
#                          (fail=True) a broken tail aborts and the
#                          version log must be byte-identical
#   ("txn", lo, n, abort) — Python-face snapshot_txn: append + update
#                          staged and published as ONE net version, or
#                          aborted mid-body with zero observable state
_op = st_.one_of(
    st_.tuples(st_.just("overwrite"), st_.integers(0, 50), st_.integers(1, 20)),
    st_.tuples(st_.just("append"), st_.integers(0, 50), st_.integers(1, 20)),
    st_.tuples(st_.just("narrow_append"), st_.integers(0, 50), st_.integers(1, 20)),
    st_.tuples(st_.just("compact"), st_.booleans()),
    st_.tuples(st_.just("vacuum"), st_.integers(1, 3)),
    st_.tuples(st_.just("delete"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("mor_delete"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("update"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("merge"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("merge_del"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("rename")),
    st_.tuples(st_.just("racy_delete"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("merge_sync"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("set_stats"), st_.booleans()),
    st_.tuples(st_.just("add_col")),
    st_.tuples(st_.just("sql_delete"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("sql_update"), st_.integers(0, 60), st_.integers(1, 25)),
    st_.tuples(st_.just("sql_insert"), st_.integers(0, 50), st_.integers(1, 10)),
    st_.tuples(st_.just("set_pspec"), st_.integers(0, 2)),
    st_.tuples(
        st_.just("sql_script"), st_.integers(0, 50), st_.integers(2, 10),
        st_.booleans(),
    ),
    st_.tuples(
        st_.just("txn"), st_.integers(0, 50), st_.integers(2, 12),
        st_.booleans(),
    ),
)
_seq = st_.lists(_op, min_size=2, max_size=7)


@given(ops=_seq, part=st_.booleans())
@settings(**SETTINGS)
def test_snapshot_random_op_sequences_match_model(
    spark, tmp_path_factory, ops, part
):
    """``part=True`` runs the same op sequence against a table
    hive-partitioned on ``pk = id % 3`` — every DML path must respect
    the sticky layout and read back identically."""
    from pyspark.sql import functions as F

    p = str(tmp_path_factory.mktemp("snapfuzz") / "tbl")
    # model: version -> (op_kind, rows list, column name AT that version)
    model: "dict[int, tuple[str, list[int], str]]" = {}
    head_rows: "list[int]" = []
    head_v = 0
    cur = "id"  # the data column's CURRENT logical name (renames flip it)
    extras: "list[str]" = []  # add_col-added columns (NULL everywhere)
    n_added = 0

    def with_pk(df):
        return df.withColumn("pk", (F.col(cur) % 3).cast("int")) if part else df

    def with_extras(df):
        # every writer after an add_col carries the widened schema
        # (appends/merges require an exact schema match by design)
        for e in extras:
            df = df.withColumn(e, F.lit(None).cast("double"))
        return df

    def write(rows, mode, narrow=False):
        nonlocal head_v, extras
        if mode == "overwrite":
            extras = []  # table replacement: the frame's schema wins
        df = spark.createDataFrame(
            [(i,) for i in rows], f"{cur} {'int' if narrow else 'bigint'}"
        )
        v = snapshot_write(
            with_extras(with_pk(df)).repartition(2),
            p,
            mode=mode,
            merge_schema=narrow,
            partition_by=["pk"] if (part and mode == "overwrite") else None,
        )
        head_v = v
        return v

    first = True
    for op in ops:
        if op[0] == "overwrite" or (first and op[0] in ("append", "narrow_append")):
            _, lo, n = op  # a first-ever append is just the creating write
            head_rows = list(range(lo, lo + n))
            v = write(head_rows, "overwrite")
            model[v] = ("overwrite", list(head_rows), cur)
        elif op[0] in ("append", "narrow_append"):
            _, lo, n = op
            head_rows = head_rows + list(range(lo, lo + n))
            v = write(
                list(range(lo, lo + n)), "append", narrow=op[0] == "narrow_append"
            )
            model[v] = ("append", list(head_rows), cur)
        elif op[0] == "compact":
            if first:
                continue  # nothing to compact yet
            v = snapshot_compact(
                spark, p, target_file_bytes=1 << 12,
                zorder_by=[cur] if op[1] else None,
            )
            head_v = v
            model[v] = ("compact", list(head_rows), cur)
        elif op[0] == "vacuum":
            if first:
                continue
            snapshot_vacuum(p, keep_last=op[1], retain_seconds=0)
            live = sorted(model)[-op[1]:]
            for v in list(model):
                if v not in live:
                    del model[v]
        elif op[0] == "rename":
            if first:
                continue
            old_name, cur = cur, ("rid" if cur == "id" else "id")
            from dask_awkward_spark.sources.snapshot import snapshot_rename_column

            head_v = snapshot_rename_column(p, old_name, cur)
            model[head_v] = ("rename", list(head_rows), cur)
        elif op[0] == "racy_delete":
            if first:
                continue
            _, lo, n = op
            import dask_awkward_spark.sources.snapshot as snap_mod

            hi = [1000 + lo + k for k in range(3)]  # disjoint from any range
            real_stage = snap_mod._stage_files
            state = {"fired": False, "inner": False, "v": None}

            def hook(*a, _rs=real_stage, _hi=hi, _st=state, **k):
                if not _st["inner"] and not _st["fired"]:
                    _st["fired"] = True
                    _st["inner"] = True
                    try:
                        df = with_extras(
                            with_pk(
                                spark.createDataFrame(
                                    [(i,) for i in _hi], f"{cur} bigint"
                                )
                            )
                        )
                        _st["v"] = snapshot_write(
                            df.repartition(1), p, mode="append"
                        )
                    finally:
                        _st["inner"] = False
                return _rs(*a, **k)

            snap_mod._stage_files = hook
            try:
                res = snapshot_delete(
                    spark, p, [(cur, ">=", lo), (cur, "<", lo + n)]
                )
            finally:
                snap_mod._stage_files = real_stage
            if state["fired"]:  # the race happened: model the append too
                head_rows = head_rows + hi
                model[state["v"]] = ("append", list(head_rows), cur)
                head_v = state["v"]
            survivors = [x for x in head_rows if not (lo <= x < lo + n)]
            assert res["removed_rows"] == len(head_rows) - len(survivors)
            head_rows = survivors
            if res["version"] != head_v:
                head_v = res["version"]
                model[head_v] = ("racy_delete", list(head_rows), cur)
        elif op[0] == "sql_insert":
            if first:
                continue
            _, lo, n = op
            from dask_awkward_spark.sources.sqlface import snapshot_sql

            # VALUES literals are positional: [cur] + [pk if part] + extras
            def lit_row(i):
                vals = [str(i)] + ([str(i % 3)] if part else [])
                vals += ["CAST(NULL AS DOUBLE)"] * len(extras)
                return "(" + ", ".join(vals) + ")"
            v = snapshot_sql(
                spark,
                "INSERT INTO tf VALUES "
                + ", ".join(lit_row(i) for i in range(lo, lo + n)),
                {"tf": p},
            )
            head_rows = head_rows + list(range(lo, lo + n))
            head_v = v
            model[v] = ("append", list(head_rows), cur)
        elif op[0] == "sql_script":
            # atomic multi-statement script (round 11): INSERT + DELETE
            # stage in a snapshot_txn and publish as ONE commit; with
            # fail=True a broken tail statement aborts and the model
            # must be COMPLETELY untouched (no intermediate versions)
            if first:
                continue
            _, lo, n, fail = op
            from dask_awkward_spark.sources.snapshot import _versions
            from dask_awkward_spark.sources.sqlface import snapshot_sql_script

            def script_row(i):
                vals = [str(i)] + ([str(i % 3)] if part else [])
                vals += ["CAST(NULL AS DOUBLE)"] * len(extras)
                return "(" + ", ".join(vals) + ")"

            cut_lo = lo + n // 2
            script = (
                "INSERT INTO tf VALUES "
                + ", ".join(script_row(i) for i in range(lo, lo + n))
                + f"; DELETE FROM tf WHERE {cur} >= {cut_lo} "
                + f"AND {cur} < {lo + n};"
            )
            if fail:
                script += " TOTALLY NOT SQL;"
                try:
                    snapshot_sql_script(
                        spark, script, {"tf": p}, on_error="atomic"
                    )
                    raise AssertionError("broken script must raise")
                except ValueError:
                    pass
                # all-or-nothing: no version moved, no rows changed
                assert (_versions(p)[-1] if _versions(p) else 0) == head_v
            else:
                snapshot_sql_script(
                    spark, script, {"tf": p}, on_error="atomic"
                )
                head_rows = [
                    x
                    for x in head_rows + list(range(lo, lo + n))
                    if not (cut_lo <= x < lo + n)
                ]
                head_v = _versions(p)[-1]
                model[head_v] = ("txn", list(head_rows), cur)
        elif op[0] == "txn":
            # Python-face staged transaction: append + update commit as
            # ONE version, or abort leaves the table byte-identical
            if first:
                continue
            _, lo, n, abort = op
            from dask_awkward_spark.sources.snapshot import (
                _versions,
                snapshot_txn,
            )
            from pyspark.sql import functions as F

            cut = lo + n // 2
            pre_vs = _versions(p)

            def txn_body():
                df = with_extras(
                    with_pk(
                        spark.createDataFrame(
                            [(i,) for i in range(lo, lo + n)],
                            f"{cur} bigint",
                        )
                    )
                )
                snapshot_write(df.repartition(1), p, mode="append")
                snapshot_update(
                    spark, p, [(cur, ">=", lo), (cur, "<", cut)],
                    {cur: F.col(cur) + 17},
                )

            if abort:
                try:
                    with snapshot_txn():
                        txn_body()
                        raise RuntimeError("fuzz abort")
                except RuntimeError:
                    pass
                assert _versions(p) == pre_vs  # nothing published
            else:
                with snapshot_txn():
                    txn_body()
                grown = head_rows + list(range(lo, lo + n))
                head_rows = [
                    x + 17 if lo <= x < cut else x for x in grown
                ]
                assert _versions(p) == pre_vs + [pre_vs[-1] + 1]
                head_v = _versions(p)[-1]
                model[head_v] = ("txn", list(head_rows), cur)
        elif op[0] in ("delete", "mor_delete", "sql_delete"):
            if first:
                continue
            _, lo, n = op
            if op[0] == "sql_delete":
                from dask_awkward_spark.sources.sqlface import snapshot_sql

                res = snapshot_sql(
                    spark,
                    f"DELETE FROM tf WHERE {cur} >= {lo} AND {cur} < {lo + n}",
                    {"tf": p},
                )
            else:
                res = snapshot_delete(
                    spark, p, [(cur, ">=", lo), (cur, "<", lo + n)],
                    strategy="merge-on-read" if op[0] == "mor_delete" else "copy-on-write",
                )
            survivors = [x for x in head_rows if not (lo <= x < lo + n)]
            assert res["removed_rows"] == len(head_rows) - len(survivors)
            head_rows = survivors
            if res["version"] != head_v:  # no-op deletes commit nothing
                head_v = res["version"]
                model[head_v] = ("delete", list(head_rows), cur)
        elif op[0] in ("update", "sql_update"):
            if first:
                continue
            _, lo, n = op
            from pyspark.sql import functions as F

            if op[0] == "sql_update":
                from dask_awkward_spark.sources.sqlface import snapshot_sql

                res = snapshot_sql(
                    spark,
                    f"UPDATE tf SET {cur} = {cur} + 17 "
                    f"WHERE {cur} >= {lo} AND {cur} < {lo + n}",
                    {"tf": p},
                )
            else:
                res = snapshot_update(
                    spark, p, [(cur, ">=", lo), (cur, "<", lo + n)],
                    {cur: F.col(cur) + 17},
                )
            changed = [x + 17 if lo <= x < lo + n else x for x in head_rows]
            assert res["updated_rows"] == sum(
                1 for x in head_rows if lo <= x < lo + n
            )
            head_rows = changed
            if res["version"] != head_v:
                head_v = res["version"]
                model[head_v] = ("update", list(head_rows), cur)
        elif op[0] in ("merge", "merge_del"):
            if first:
                continue
            _, lo, n = op
            src = with_extras(
                with_pk(
                    spark.createDataFrame(
                        [(i,) for i in range(lo, lo + n)], f"{cur} bigint"
                    )
                )
            )
            if op[0] == "merge":
                res = snapshot_merge(spark, p, src, on=[cur])
                present = set(head_rows)
                inserts = [x for x in range(lo, lo + n) if x not in present]
                assert res["inserted_rows"] == len(inserts)
                # matched rows each take the source row's (identical) value
                assert res["updated_rows"] == sum(
                    1 for x in head_rows if lo <= x < lo + n
                )
                head_rows = head_rows + inserts
            else:
                res = snapshot_merge(
                    spark, p, src, on=[cur],
                    when_matched="delete", when_not_matched=None,
                )
                survivors = [x for x in head_rows if not (lo <= x < lo + n)]
                assert res["deleted_rows"] == len(head_rows) - len(survivors)
                head_rows = survivors
            if res["version"] != head_v:
                head_v = res["version"]
                model[head_v] = (op[0], list(head_rows), cur)
        elif op[0] == "set_stats":
            if first:
                continue
            from dask_awkward_spark.sources.snapshot import (
                snapshot_set_stats_columns,
            )

            v = snapshot_set_stats_columns(p, [cur] if op[1] else None)
            if v != head_v:
                head_v = v
                model[head_v] = ("set_stats", list(head_rows), cur)
        elif op[0] == "set_pspec":
            # partition-spec EVOLUTION mid-sequence: metadata-only, the
            # mixed layout must read back the model exactly and every
            # later writer lays out under the current spec
            if first:
                continue
            from dask_awkward_spark.sources.snapshot import (
                snapshot_set_partition_spec,
            )

            if op[1] == 0:
                spec = []
            elif op[1] == 1:
                spec = ["pk"] if part else [cur]
            else:
                # round-10 partition TRANSFORM: evolve to a derived
                # directory value (truncate/bucket); mixed layouts and
                # every later DML must stay invisible in the model
                spec = (
                    ["pk", f"bucket(3, {cur})"] if part
                    else [f"truncate(7, {cur})"]
                )
            v = snapshot_set_partition_spec(p, spec)
            if v != head_v:
                head_v = v
                model[head_v] = ("set_pspec", list(head_rows), cur)
        elif op[0] == "add_col":
            if first:
                continue
            from dask_awkward_spark.sources.snapshot import snapshot_add_columns

            nm = f"x{n_added}"
            n_added += 1
            head_v = snapshot_add_columns(p, f"{nm} double")
            extras.append(nm)
            model[head_v] = ("add_col", list(head_rows), cur)
        elif op[0] == "merge_sync":
            if first:
                continue
            _, lo, n = op
            src = with_extras(
                with_pk(
                    spark.createDataFrame(
                        [(i,) for i in range(lo, lo + n)], f"{cur} bigint"
                    )
                )
            )
            res = snapshot_merge(
                spark, p, src, on=[cur],
                when_matched="update", when_not_matched="insert",
                when_not_matched_by_source="delete",
            )
            present = set(head_rows)
            kept = [x for x in head_rows if lo <= x < lo + n]
            inserts = [x for x in range(lo, lo + n) if x not in present]
            assert res["deleted_rows"] == len(head_rows) - len(kept)
            assert res["updated_rows"] == len(kept)
            assert res["inserted_rows"] == len(inserts)
            head_rows = kept + inserts
            if res["version"] != head_v:
                head_v = res["version"]
                model[head_v] = ("merge_sync", list(head_rows), cur)
        first = False

    if not model:
        return
    # every surviving version reads back exactly the model's rows,
    # under the column name THAT version recorded (renames included)
    for v, (_, rows, name) in model.items():
        got = sorted(
            r[name] for r in snapshot_read(spark, p, version=v).collect()
        )
        assert got == sorted(rows), f"v{v}"
    # change feed over any append-only span (renames are metadata-only
    # and cross transparently) equals the model delta, surfaced under
    # the UNTIL version's column name
    vs = sorted(model)
    for a, b in zip(vs, vs[1:]):
        kinds = [model[v][0] for v in vs if a < v <= b]
        if all(
            k in ("append", "rename", "set_stats", "add_col", "set_pspec")
            for k in kinds
        ):
            name_b = model[b][2]
            delta = sorted(
                r[name_b]
                for r in snapshot_changes(spark, p, since=a, until=b).collect()
            )
            want = sorted(_multiset_diff(model[b][1], model[a][1]))
            assert delta == want, f"changes {a}->{b}"


def _multiset_diff(big: "list[int]", small: "list[int]") -> "list[int]":
    out = list(big)
    for x in small:
        out.remove(x)
    return out


# random DML sequences replicated through the CDF must converge:
#   ("append", lo, n) / ("delete"|"mor_delete", lo, n) /
#   ("update", lo, n) id+=17 / ("merge", lo, n) upsert
_dml = st_.one_of(
    st_.tuples(st_.just("append"), st_.integers(0, 50), st_.integers(1, 15)),
    st_.tuples(st_.just("delete"), st_.integers(0, 70), st_.integers(1, 20)),
    st_.tuples(st_.just("mor_delete"), st_.integers(0, 70), st_.integers(1, 20)),
    st_.tuples(st_.just("update"), st_.integers(0, 70), st_.integers(1, 20)),
    st_.tuples(st_.just("merge"), st_.integers(0, 70), st_.integers(1, 20)),
)


@given(ops=st_.lists(_dml, min_size=1, max_size=6), cut=st_.integers(0, 5))
@settings(**SETTINGS)
def test_cdf_replication_converges(spark, tmp_path_factory, ops, cut):
    """Apply random DML to src; replicate into dst in TWO apply_changes
    calls split at a random version; dst must equal src's head exactly.
    The engine-level catch: every combination of CDF records the DML ops
    emit must round-trip through the net-effect window + keyed merges."""
    base = tmp_path_factory.mktemp("cdfrepl")
    src, dst = str(base / "src"), str(base / "dst")
    rows = {i: i * 10 for i in range(20)}  # id -> v (unique keys)
    spark.createDataFrame  # touch
    snapshot_write(
        spark.createDataFrame([(k, v) for k, v in rows.items()], "id bigint, v bigint"),
        src,
    )
    from dask_awkward_spark.sources.snapshot import snapshot_apply_changes

    snapshot_write(snapshot_read(spark, src), dst)
    from pyspark.sql import functions as F

    for op, lo, n in ops:
        span = range(lo, lo + n)
        if op == "append":
            fresh = [i for i in span if i not in rows]
            if not fresh:
                continue
            for i in fresh:
                rows[i] = i * 10
            snapshot_write(
                spark.createDataFrame([(i, i * 10) for i in fresh], "id bigint, v bigint"),
                src, mode="append",
            )
        elif op in ("delete", "mor_delete"):
            snapshot_delete(
                spark, src, [("id", ">=", lo), ("id", "<", lo + n)],
                strategy="merge-on-read" if op == "mor_delete" else "copy-on-write",
            )
            for i in list(rows):
                if lo <= i < lo + n:
                    del rows[i]
        elif op == "update":
            snapshot_update(
                spark, src, [("id", ">=", lo), ("id", "<", lo + n)],
                {"v": F.col("v") + 17},
            )
            for i in rows:
                if lo <= i < lo + n:
                    rows[i] += 17
        elif op == "merge":
            srcdf = spark.createDataFrame(
                [(i, i * 1000) for i in span], "id bigint, v bigint"
            )
            snapshot_merge(spark, src, srcdf, on=["id"])
            for i in span:
                rows[i] = i * 1000
    from dask_awkward_spark.sources.snapshot import snapshot_versions

    versions = [m["version"] for m in snapshot_versions(src)]
    # replicate in TWO chunks split at a random version — the second
    # call must pick up exactly where the first watermark stopped
    mid = versions[min(1 + cut, len(versions) - 1)]
    r1 = snapshot_apply_changes(spark, src, dst, on=["id"], since=1, until=mid)
    assert r1["until"] == mid
    r2 = snapshot_apply_changes(spark, src, dst, on=["id"], since=r1["until"])
    assert r2["until"] == versions[-1]
    got = sorted((x.id, x.v) for x in snapshot_read(spark, dst).collect())
    assert got == sorted(rows.items()), "dst diverged from src head"
    # idempotent catch-up from the final watermark
    r3 = snapshot_apply_changes(spark, src, dst, on=["id"], since=r2["until"])
    assert r3 == {"until": r2["until"], "upserted": 0, "deleted": 0}
