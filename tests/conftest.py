import os

import pytest

from locustdb_spark import LocustDB, get_spark

DATA = os.path.join(os.path.dirname(__file__), "data")
TESTDATA_SF = os.environ.get("LOCUSTDB_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="locustdb-spark-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def db_tiny(spark, tmp_path_factory):
    """tiny.csv people fixture as table `default` (reference test_query
    harness, tests/query_tests.rs:9-29; allow_nulls off)."""
    db = LocustDB(db_path=str(tmp_path_factory.mktemp("tiny")), spark=spark)
    db.load_csv(os.path.join(DATA, "tiny.csv"), "default")
    return db


@pytest.fixture(scope="session")
def db_ec(spark, tmp_path_factory):
    """edge_cases.csv fixture as table `default` (reference test_query_ec
    harness, tests/query_tests.rs:31-81; allow_nulls on)."""
    db = LocustDB(db_path=str(tmp_path_factory.mktemp("ec")), spark=spark)
    db.load_csv(os.path.join(DATA, "edge_cases.csv"), "default", allow_nulls=True)
    return db


@pytest.fixture(scope="session")
def tpch(spark):
    """Driver-provided TPC-H-ish parquet tables at sf0.001."""
    db = LocustDB(spark=spark)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        db.register_parquet(t, f"{TESTDATA_SF}/{t}.parquet")
    return db


def rows(db, query):
    return db.run_query(query)["rows"]


def approx_rows(actual, expected, rel=1e-9):
    assert len(actual) == len(expected), f"{actual} != {expected}"
    for a, e in zip(actual, expected):
        assert len(a) == len(e), f"{a} != {e}"
        for av, ev in zip(a, e):
            if isinstance(ev, float) and av is not None:
                assert av == pytest.approx(ev, rel=rel), f"{a} != {e}"
            else:
                assert av == ev, f"{a} != {e}"
