"""Ports of the reference's end-to-end SQL tests over the tiny.csv people
fixture (reference tests/query_tests.rs, test_query harness :9-29).
Expected rows are the reference's golden values verbatim."""

from conftest import rows


def test_select_string(db_tiny):
    assert rows(db_tiny, "select first_name from default order by first_name limit 2;") == [
        ("Adam",), ("Adam",)]


def test_select_twice(db_tiny):
    assert rows(
        db_tiny,
        "select first_name, first_name from default order by first_name limit 2;",
    ) == [("Adam", "Adam"), ("Adam", "Adam")]


def test_select_integer(db_tiny):
    assert rows(db_tiny, "select num from default order by num limit 2;") == [(0,), (0,)]


def test_sort_string_desc(db_tiny):
    assert rows(
        db_tiny, "select first_name from default order by first_name desc limit 2;"
    ) == [("Willie",), ("William",)]


def test_group_by_integer_filter_integer_lt(db_tiny):
    assert rows(db_tiny, "select num, count(1) from default where num < 8;") == [
        (0, 8), (1, 49), (2, 24), (3, 11), (4, 5), (5, 2)]


def test_group_by_string_filter_string_eq(db_tiny):
    assert rows(
        db_tiny, "select first_name, count(1) from default where first_name = 'Adam';"
    ) == [("Adam", 2)]


def test_and_or(db_tiny):
    assert rows(
        db_tiny,
        "select first_name, last_name from default where ((first_name = 'Adam') "
        "OR (first_name = 'Catherine')) AND (num = 3);",
    ) == [("Adam", "Crawford")]


def test_sum(db_tiny):
    assert rows(
        db_tiny, "select tld, sum(num) from default where (tld = 'name');"
    ) == [("name", 26)]


def test_multiple_group_by(db_tiny):
    assert rows(
        db_tiny, "select first_name, num, count(1) from default where num = 5;"
    ) == [("Christina", 5, 1), ("Joshua", 5, 1)]


def test_division(db_tiny):
    assert rows(db_tiny, "select num / 10, count(1) from default;") == [(0, 100)]


def test_regex(db_tiny):
    assert rows(
        db_tiny, "SELECT first_name FROM default WHERE regex(first_name, '^C.+h.a');"
    ) == [("Cynthia",)]


def test_not_regex(db_tiny):
    assert rows(
        db_tiny,
        "SELECT first_name FROM default WHERE not(regex(first_name, '^C.*h.a')) "
        "ORDER BY ts LIMIT 1;",
    ) == [("Charles",)]


def test_like(db_tiny):
    assert rows(
        db_tiny, "SELECT first_name FROM default WHERE first_name LIKE 'C%h_a';"
    ) == [("Cynthia",)]


def test_not_like(db_tiny):
    assert rows(
        db_tiny,
        "SELECT first_name FROM default WHERE first_name NOT LIKE 'C%h_a' "
        "ORDER BY ts LIMIT 1;",
    ) == [("Charles",)]


def test_like_mismatch(db_tiny):
    assert rows(
        db_tiny, "SELECT first_name FROM default WHERE first_name LIKE '%hu';"
    ) == []


def test_not_equals(db_tiny):
    expected = [(1, 49), (2, 24), (3, 11), (4, 5), (5, 2), (8, 1)]
    assert rows(db_tiny, "select num, count(1) from default where num <> 0;") == expected
    assert rows(db_tiny, "select num, count(1) from default where not(num = 0);") == expected


def test_select_star(db_tiny):
    out = db_tiny.run_query("select * from default limit 1;")
    # SELECT * expands to all columns sorted by name (query_task.rs:101-111).
    assert out["colnames"] == sorted(
        ["ts", "guid", "first_name", "last_name", "hash", "version", "tld",
         "num", "opaque_json"]
    )


def test_meta_tables(db_tiny):
    assert ("default",) in rows(db_tiny, "select name from _meta_tables;")
    # reference registers the _meta_columns_<t> registry itself as a table
    # (inner_locustdb.rs:252-255) with a creation timestamp column
    assert ("_meta_columns_default",) in rows(
        db_tiny, "select name from _meta_tables;")
    assert rows(db_tiny,
                "select name from _meta_tables where timestamp is null;") == []
    cols = rows(db_tiny, "select column_name from _meta_columns_default;")
    assert ("first_name",) in cols


def test_meta_column_names_sorted(db_tiny):
    # test_meta_column_names (query_tests.rs:1999): _meta_columns_<t>
    # lists every column, one per row, queryable with ORDER BY
    cols = rows(
        db_tiny,
        "SELECT column_name FROM _meta_columns_default ORDER BY column_name;")
    assert cols == [(c,) for c in sorted(
        ["ts", "guid", "first_name", "last_name", "hash", "version", "tld",
         "num", "opaque_json"])]


def test_meta_tables_colnames(db_tiny):
    # test_colnames (query_tests.rs:1844-1847)
    out = db_tiny.run_query(
        "SELECT name, COUNT(1) AS c, timestamp FROM _meta_tables;")
    assert out["colnames"] == ["name", "c", "timestamp"]


def test_search_column_names(db_tiny):
    assert db_tiny.search_column_names("default", "name$") == [
        "first_name", "last_name"]
