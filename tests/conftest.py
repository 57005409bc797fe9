from __future__ import annotations

import pytest

from dask_awkward_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture
def track_mkdtemp(monkeypatch):
    """Record every tempfile.mkdtemp dir created during the test — for
    asserting a helper cleaned up the exact dirs IT made (a /tmp glob
    diff would race with any other test process on the machine)."""
    import tempfile

    created: "list[str]" = []
    real = tempfile.mkdtemp

    def recording(*a, **k):
        p = real(*a, **k)
        created.append(p)
        return p

    monkeypatch.setattr(tempfile, "mkdtemp", recording)
    return created


# F1 points fixture (FIXTURES.md): 5 rows, list lengths (3,0,2,1,3)
POINTS = [
    [{"x": 1, "y": 2}, {"x": 3, "y": 4}, {"x": 5, "y": 6}],
    [],
    [{"x": 7, "y": 8}, {"x": 9, "y": 10}],
    [{"x": 11, "y": 12}],
    [{"x": 13, "y": 14}, {"x": 15, "y": 16}, {"x": 17, "y": 18}],
]

# F2/L4: row 1 is a missing list (null), not an empty one
L4 = [
    [{"x": 1.0, "y": 1.1}, {"x": 2.0, "y": 2.2}, {"x": 3.0, "y": 3.3}],
    None,
    [{"x": 4.0, "y": 4.4}, {"x": 5.0, "y": 5.5}],
    [{"x": 6.0, "y": 6.6}],
    [{"x": 7.0, "y": 7.7}, {"x": 8.0, "y": 8.8}, {"x": 9.0, "y": 9.9}],
]

# F5: plain jagged numeric lists
LISTS = [[1, 2, 3], [4, 5], [], [0, 0, 0]]


@pytest.fixture(scope="session")
def points(spark):
    from dask_awkward_spark import from_lists

    return from_lists(spark, POINTS, "array<struct<x:bigint,y:bigint>>")


@pytest.fixture(scope="session")
def l4(spark):
    from dask_awkward_spark import from_lists

    return from_lists(spark, L4, "array<struct<x:double,y:double>>")


@pytest.fixture(scope="session")
def jagged(spark):
    from dask_awkward_spark import from_lists

    return from_lists(spark, LISTS, "array<bigint>")


@pytest.fixture(params=["posix", "object-copy"], ids=["posix", "objstore"])
def snapshot_storage_backend(request):
    """Run a test under BOTH snapshot data-plane backends: the POSIX
    hard-link plane and the no-hardlink object-store emulation. Every
    test_snapshot*.py module opts in via pytestmark, proving the whole
    DML surface never relies on a POSIX capability an object store
    lacks (VERDICT r6 item 1)."""
    from dask_awkward_spark.sources.storage import set_storage_backend

    prev = set_storage_backend(request.param)
    yield request.param
    set_storage_backend(prev)
