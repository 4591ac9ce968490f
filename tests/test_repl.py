"""REPL command tests (reference src/bin/repl/main.rs command surface)."""

import io

import pytest

from locustdb_spark.engine import LocustDB
from locustdb_spark.repl import format_table, run_command


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    d = LocustDB(spark=spark, db_path=str(tmp_path_factory.mktemp("repl")))
    d.ingest("t", [{"a": 1, "b": "x"}, {"a": 2, "b": "y"},
                   {"a": 2, "b": "z"}])
    return d


def run(db, line):
    out = io.StringIO()
    cont = run_command(db, line, out=out)
    return cont, out.getvalue()


def test_query(db):
    cont, text = run(db, "SELECT a, count(0) FROM t")
    assert cont
    assert "a | count(0)" in text.replace("  ", " ")
    assert "rows returned" in text


def test_extended_sql_command(db):
    """:x routes to full Spark SQL — a self-join the dialect rejects."""
    cont, text = run(
        db, ":x SELECT l.a, count(*) AS c FROM t l JOIN t r ON l.a = r.a "
            "GROUP BY l.a ORDER BY l.a")
    assert cont
    assert "rows returned" in text
    # a=2 appears twice -> 2x2=4 join rows
    assert "4" in text


def test_exit_variants(db):
    for cmd in (":exit", ":quit", "exit", "quit"):
        assert run(db, cmd)[0] is False
    assert run(db, "")[0] is True


def test_tables(db):
    _, text = run(db, ":tables")
    assert "t:" in text and "rows" in text


def test_explain(db):
    _, text = run(db, ":explain SELECT a FROM t")
    assert "Physical Plan" in text or "Scan" in text


def test_query_error_surface(db):
    _, text = run(db, "SELECT a FROM missing_table")
    assert "Query error" in text
    _, text = run(db, "SELECT DISTINCT a FROM t")
    assert "Not implemented" in text


def test_load_csv(db, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("c1,c2\n1,foo\n2,bar\n")
    _, text = run(db, f':load fromcsv "" {p}')
    assert "Loaded 1 file(s)" in text
    _, text = run(db, "SELECT c1, c2 FROM fromcsv")
    assert "foo" in text and "bar" in text


def test_format_table_nulls_and_floats():
    s = format_table(["x", "y"], [(None, 1.25), ("ab", None)])
    lines = s.splitlines()
    assert lines[0].split(" | ")[0].strip() == "x"
    assert "1.25" in s and "ab" in s
