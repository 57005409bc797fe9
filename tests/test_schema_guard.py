"""Round-start insurance: re-encoded testdata must be LOUD, not silent.

The driver has regenerated /root/testdata with changed parquet encodings
twice (events.ts TIMESTAMP(NANOS) -> timestamp[us]). These tests feed the
adaptive loader and the footer guard deliberately re-encoded tables and
assert (a) normalizable drift is transparently fixed, (b) non-normalizable
drift raises / exits non-zero instead of flowing wrong values downstream.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import schema_guard  # noqa: E402

from dask_awkward_spark.sources.tables import CANONICAL, load_table, normalize_table  # noqa: E402

EPOCH = datetime.datetime(1995, 6, 17, 12, 30, 0)
EPOCH_US = int(EPOCH.timestamp() * 1_000_000)  # treated as wall clock / UTC


def _write_lineitem(path, shipdate_arr):
    """Minimal 2-row lineitem with a parameterized l_shipdate encoding."""
    cols = {
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([10, 20], pa.int64()),
        "l_suppkey": pa.array([5, 6], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([17.0, 36.0], pa.float64()),
        "l_extendedprice": pa.array([17954.55, 73638.0], pa.float64()),
        "l_discount": pa.array([0.04, 0.09], pa.float64()),
        "l_tax": pa.array([0.02, 0.06], pa.float64()),
        "l_returnflag": pa.array(["N", "R"]),
        "l_linestatus": pa.array(["O", "F"]),
        "l_shipdate": shipdate_arr,
    }
    pq.write_table(pa.table(cols), path)


@pytest.mark.parametrize(
    "encoding",
    ["nanos_long", "instant_us", "ntz_us", "iso_string", "date32"],
)
def test_load_table_normalizes_timestamp_reencodings(spark, tmp_path, encoding):
    """Every historical (and plausible future) ts re-encoding of a table
    column lands as the canonical TIMESTAMP_NTZ with identical wall clock."""
    arr = {
        "nanos_long": pa.array([EPOCH_US * 1000] * 2, pa.int64()),
        "instant_us": pa.array([EPOCH_US] * 2, pa.timestamp("us", tz="UTC")),
        "ntz_us": pa.array([EPOCH_US] * 2, pa.timestamp("us")),
        "iso_string": pa.array(["1995-06-17 12:30:00"] * 2),
        "date32": pa.array([EPOCH.date()] * 2, pa.date32()),
    }[encoding]
    _write_lineitem(str(tmp_path / "lineitem.parquet"), arr)
    df = load_table(spark, str(tmp_path), "lineitem")
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == list(
        CANONICAL["lineitem"]
    )
    got = [r["l_shipdate"] for r in df.select("l_shipdate").collect()]
    expect = EPOCH if encoding != "date32" else datetime.datetime(1995, 6, 17)
    assert got == [expect] * 2


def test_load_table_exact_schema_is_untouched_scan(spark):
    """No drift -> load_table returns the raw scan (pushdown preserved)."""
    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Project" not in plan  # bare relation, no normalization projection


def test_load_table_numeric_and_list_drift(spark, tmp_path):
    """int32 keys and double embeddings normalize to canonical widths."""
    t = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int32()),
            "embedding": pa.array([[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float64())),
            "label": pa.array([0, 1], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    df = load_table(spark, str(tmp_path), "embeddings")
    assert df.schema["vec_id"].dataType.simpleString() == "bigint"
    assert df.schema["embedding"].dataType.simpleString() == "array<float>"
    assert df.schema["label"].dataType.simpleString() == "int"
    assert df.count() == 2


def test_load_table_missing_column_raises(spark, tmp_path):
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"])})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    with pytest.raises(TypeError, match="missing columns"):
        load_table(spark, str(tmp_path), "documents")


def test_normalize_table_rejects_unsafe_drift(spark):
    """string where a number is expected has no safe interpretation."""
    df = spark.createDataFrame([("1", "a", "b", "c", "2")], CANONICAL_DOC_COLS)
    with pytest.raises(TypeError, match="cannot normalize"):
        normalize_table(df, "documents")


CANONICAL_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


# ---- footer-level guard (tools/schema_guard.py) ----


def test_classify_matrix():
    c = schema_guard.classify
    assert c("timestamp[us]", "timestamp[us]") == "ok"
    assert c("string", "large_string") == "ok"
    # the exact round-3 incident: NANOS shipped as int64-compatible footer
    assert c("timestamp[us]", "timestamp[ns]") == "adapted"
    assert c("timestamp[us]", "int64") == "adapted"
    assert c("timestamp[us]", "timestamp[us, tz=UTC]") == "adapted"
    assert c("int64", "int32") == "adapted"
    assert c("list<element: float>", "list<element: double>") == "adapted"
    assert c("double", "string") == "drift"
    assert c("timestamp[us]", "bool") == "drift"


def test_guard_end_to_end_flags_reencoding(tmp_path, monkeypatch):
    """Full tool run: a re-encoded file -> ADAPTED (rc 0); an incompatible
    one -> DRIFT (rc 1); a clean tree -> all ok (rc 0)."""
    sf = tmp_path / "sf9"
    sf.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([EPOCH_US], pa.timestamp("us")), "v": pa.array([1.0])}),
        str(sf / "mini.parquet"),
    )
    exp = tmp_path / "exp.json"
    monkeypatch.setattr(schema_guard, "TESTDATA", str(tmp_path))
    monkeypatch.setattr(schema_guard, "EXPECTATIONS", str(exp))

    assert schema_guard.main(["--update"]) == 0
    assert schema_guard.main([]) == 0  # clean

    # re-encode: ts us -> ns-as-int64 (the historical incident) => adapted
    pq.write_table(
        pa.table({"ts": pa.array([EPOCH_US * 1000], pa.int64()), "v": pa.array([1.0])}),
        str(sf / "mini.parquet"),
    )
    assert schema_guard.main([]) == 0

    # incompatible: v double -> string => drift, rc 1
    pq.write_table(
        pa.table({"ts": pa.array([EPOCH_US], pa.timestamp("us")), "v": pa.array(["x"])}),
        str(sf / "mini.parquet"),
    )
    assert schema_guard.main([]) == 1

    # column dropped => drift, rc 1
    pq.write_table(pa.table({"ts": pa.array([EPOCH_US], pa.timestamp("us"))}), str(sf / "mini.parquet"))
    assert schema_guard.main([]) == 1


def test_committed_expectations_match_live_testdata():
    """The pinned expectations file tracks the actual driver testdata."""
    with open(os.path.join(os.path.dirname(__file__), "..", "tools", "schema_expectations.json")) as f:
        exp = json.load(f)
    assert set(exp) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for key, schema in schema_guard.scan().items():
        table = key.split("/", 1)[1]
        for col, typ in exp[table].items():
            assert schema_guard.classify(typ, schema[col]) in ("ok", "adapted")


def test_stream_table_normalizes_drifted_file(spark, tmp_path):
    """Streaming reads ingest with the file's ACTUAL schema and normalize
    — handing readStream the canonical schema would misread re-encoded
    bytes (the round-3 silent-corruption class, streaming flavor)."""
    import uuid

    from dask_awkward_spark.sources.tables import stream_table

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int32()),  # drifted width
            "text": pa.array(["a", "b"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([1, 1], pa.int32()),  # drifted width
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    st = stream_table(spark, str(tmp_path), "documents")
    assert st.isStreaming
    assert st.schema["doc_id"].dataType.simpleString() == "bigint"
    name = "st_" + uuid.uuid4().hex[:6]
    q = st.writeStream.format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    rows = spark.table(name).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]
