"""Ports of the reference's edge_cases.csv golden tests
(reference tests/query_tests.rs, test_query_ec harness :31-81).

Where the reference's behavior is explicitly marked as a bug with a TODO
(count of all-null groups, empty-input global aggregates) we assert the
*intended* behavior, which Spark/DuckDB produce natively; each such spot
is commented."""

import pytest

from conftest import approx_rows, rows


def test_select_nullable_integer(db_ec):
    assert rows(db_ec, "SELECT nullable_int FROM default ORDER BY id DESC;") == [
        (13,), (None,), (20,), (None,), (None,), (10,), (None,), (None,), (-40,), (-1,)]


def test_limit_offset(db_ec):
    assert rows(db_ec, "SELECT nullable_int FROM default ORDER BY id DESC LIMIT 5;") == [
        (13,), (None,), (20,), (None,), (None,)]
    assert rows(
        db_ec,
        "SELECT nullable_int FROM default ORDER BY id DESC LIMIT 4 OFFSET 5 ROWS;",
    ) == [(10,), (None,), (None,), (-40,)]


def test_select_nullable_string(db_ec):
    assert rows(db_ec, "SELECT country FROM default ORDER BY id DESC;") == [
        ("Germany",), (None,), (None,), ("Turkey",), (None,), ("France",), (None,),
        ("France",), ("USA",), ("Germany",)]


def test_lt_filter_on_offset_encoded_column(db_ec):
    assert rows(
        db_ec, "select u8_offset_encoded from default where u8_offset_encoded < 257;"
    ) == [(256,)]


def test_group_by_limit(db_ec):
    assert rows(db_ec, "select enum, enum, count(0) from default limit 2;") == [
        ("aa", "aa", 5), ("bb", "bb", 3)]


def test_group_by_col_and_aliasing_const_cols(db_ec):
    assert rows(
        db_ec, "select enum, constant0, constant0_2, count(0) from default;"
    ) == [("aa", 0, 0, 5), ("bb", 0, 0, 3), ("cc", 0, 0, 2)]


def test_string_packed_column(db_ec):
    assert rows(
        db_ec, "select string_packed from default where string_packed = 'xyz';"
    ) == [("xyz",)]


def test_sum_grouped_float(db_ec):
    approx_rows(
        rows(db_ec, "select enum, sum(float) from default;"),
        [("aa", -123.87628600000001), ("bb", 1.234e29), ("cc", -1.0)],
    )


def test_sum_2(db_ec):
    assert rows(
        db_ec, "select non_dense_ints, sum(u8_offset_encoded) from default;"
    ) == [(0, 756), (1, 689), (2, 1112), (3, 759), (4, 275)]


def test_multiple_group_by_2(db_ec):
    assert rows(db_ec, "select enum, non_dense_ints, count(1) from default;") == [
        ("aa", 0, 2), ("aa", 1, 1), ("aa", 2, 1), ("aa", 3, 1),
        ("bb", 1, 1), ("bb", 3, 1), ("bb", 4, 1), ("cc", 2, 2)]


def test_order_by_float(db_ec):
    approx_rows(
        rows(db_ec,
             "SELECT string_packed, float FROM default ORDER BY float DESC LIMIT 5;"),
        [("azy", 1.234e29), ("😈", 1234124.51325), ("AXY", 3.15159),
         ("xyz", 0.123412), ("abc", 0.0003)],
    )
    approx_rows(
        rows(db_ec,
             "SELECT string_packed, float FROM default ORDER BY float ASC LIMIT 3;"),
        [("axz", -124.0), ("t", -1.0), ("asd", 0.0)],
    )


def test_average(db_ec):
    # AVG == SUM/COUNT over non-null products (parser.rs:319-336).
    assert rows(db_ec, "select avg(nullable_int * nullable_int2) from default;") == [
        (624,)]


def test_min_max_grouped_float(db_ec):
    approx_rows(
        rows(db_ec, "select enum, max(float), min(float) from default;"),
        [("aa", 0.123412, -124.0), ("bb", 1.234e29, 3.15159), ("cc", 0.0, -1.0)],
    )


def test_max_of_unencoded_int(db_ec):
    assert rows(db_ec, "SELECT MAX(largenum), MIN(largenum) FROM default;") == [
        (9223372036854775806, -9223372036854775808)]


def test_max_of_nonexistant(db_ec):
    assert rows(db_ec, "SELECT MAX(nonexistant_column), MIN(largenum) FROM default;") == [
        (None, -9223372036854775808)]


def test_addition(db_ec):
    assert rows(
        db_ec, "SELECT u8_offset_encoded + negative FROM default ORDER BY id LIMIT 5;"
    ) == [(57,), (297,), (159,), (291,), (4306,)]
    assert rows(
        db_ec, "SELECT -2 + non_dense_ints FROM default ORDER BY id LIMIT 5;"
    ) == [(-2,), (0,), (1,), (-1,), (2,)]


def test_numeric_operators(db_ec):
    # Truncating integer / and Rust-sign % (query_plan.rs:826-839).
    assert rows(
        db_ec,
        "SELECT (non_dense_ints * negative / (id + 1) - u8_offset_encoded) % (id + 1) "
        "FROM default ORDER BY id;",
    ) == [(0,), (-1,), (-2,), (-1,), (4,), (-2,), (-2,), (-7,), (2,), (-2,)]


def test_comparison_operators(db_ec):
    assert rows(
        db_ec,
        "SELECT u8_offset_encoded, negative FROM default "
        "WHERE u8_offset_encoded < negative ORDER BY id;",
    ) == [(275, 4031), (511, 4010)]
    assert rows(
        db_ec,
        "SELECT non_dense_ints FROM default WHERE non_dense_ints = id ORDER BY id;",
    ) == [(0,), (4,)]
    assert rows(
        db_ec,
        'SELECT non_dense_ints FROM default WHERE non_dense_ints = id ORDER BY "id";',
    ) == [(0,), (4,)]
    assert rows(
        db_ec, "SELECT id FROM default WHERE id <> id / 8 + id ORDER BY id;"
    ) == [(8,), (9,)]
    assert rows(
        db_ec,
        "SELECT id FROM default WHERE id <= 4 AND non_dense_ints >= 3 "
        "AND enum > string_packed;",
    ) == [(4,)]


def test_group_by_negative_expression(db_ec):
    assert rows(db_ec, "SELECT count(1), negative/100 FROM default;") == [
        (4, -1), (4, 0), (2, 40)]


def test_order_by_expression(db_ec):
    assert rows(
        db_ec, "SELECT negative FROM default ORDER BY negative/100, string_packed;"
    ) == [(-120,), (-130,), (-100,), (-199,), (32,), (34,), (39,), (-40,),
          (4031,), (4010,)]


def test_order_by_multiple(db_ec):
    assert rows(
        db_ec,
        "SELECT enum, string_packed FROM default ORDER BY enum DESC, string_packed;",
    ) == [("cc", "asd"), ("cc", "t"), ("bb", "AXY"), ("bb", "azy"), ("bb", "😈"),
          ("aa", "$sss"), ("aa", "_f"), ("aa", "abc"), ("aa", "axz"), ("aa", "xyz")]


def test_null_aggregators1(db_ec):
    assert rows(
        db_ec,
        "SELECT id/5, SUM(nullable_int), COUNT(nullable_int2), MIN(nullable_int), "
        "MAX(nullable_int2) FROM default ORDER BY id/5;",
    ) == [(0, -31, 3, -40, 9), (1, 33, 3, 13, 14)]


def test_null_sum(db_ec):
    assert rows(
        db_ec, "SELECT id/5, SUM(nullable_int) FROM default ORDER BY id/5;"
    ) == [(0, -31), (1, 33)]


def test_null_aggregators2(db_ec):
    # Reference returns COUNT=Null for all-null groups but marks it TODO
    # ("count of all nulls should be 0"); we assert the intended behavior
    # (query_tests.rs test_null_aggregators2_correct).
    assert rows(
        db_ec,
        "SELECT id/2, SUM(nullable_int), COUNT(nullable_int2), MIN(nullable_int), "
        "MAX(nullable_int2) FROM default ORDER BY id/2;",
    ) == [
        (0, -41, 1, -40, -40),
        (1, None, 1, None, 0),
        (2, 10, 2, 10, 9),
        (3, 20, 0, 20, None),
        (4, 13, 2, 13, 14),
    ]


def test_empty_grouped_aggregate(db_ec):
    # Missing column in WHERE -> no rows -> no groups (query_tests.rs
    # test_multiply_null_by_constant / test_divide_multiply_null).
    assert rows(
        db_ec,
        "SELECT MIN(_step), MAX(_step), MIN(value_loss), MAX(value_loss), "
        "COUNT(value_loss), SUM(value_loss), _step * 493 / 20004864 FROM default "
        "WHERE _step IS NOT NULL AND value_loss IS NOT NULL",
    ) == []
    assert rows(
        db_ec,
        "SELECT MIN(_step), _step * 12.321, 493 * _step, _step / 10 FROM default "
        "WHERE _step IS NOT NULL AND value_loss IS NOT NULL",
    ) == []


def test_multiply_nullable_float(db_ec):
    approx_rows(
        rows(db_ec, "SELECT float * nullable_float FROM default ORDER BY id;"),
        [(None,), (None,), (-49.6,), (None,), (None,), (None,), (0.0,), (None,),
         (None,), (1.386074859819393e36,)],
    )


def test_aggregate_mixed_int_float_null(db_ec):
    # mixed int/float/null column promotes to nullable float
    # (raw_col.rs:58-106).
    approx_rows(
        rows(db_ec,
             "SELECT SUM(mixed_float_int_null), COUNT(mixed_float_int_null), "
             "MIN(mixed_float_int_null), MAX(mixed_float_int_null), id / 5 "
             "FROM default"),
        [(14.33, 5, 0.12, 10.0, 0), (0.7, 3, 0.1, 0.5, 1)],
    )


def test_sort_by_nullable1(db_ec):
    # NULLs sort as the largest value: ASC last, DESC first (types.rs:6-10).
    assert rows(
        db_ec,
        "SELECT nullable_int, nullable_int2, country FROM default "
        "ORDER BY nullable_int, nullable_int2 DESC, country;",
    ) == [
        (-40, -40, "USA"),
        (-1, None, "Germany"),
        (10, 9, "France"),
        (13, 14, "Germany"),
        (20, None, None),
        (None, None, "France"),
        (None, None, "Turkey"),
        (None, 6, None),
        (None, 1, None),
        (None, 0, None),
    ]


def test_sort_by_nullable2(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2, country FROM default "
        "ORDER BY nullable_int2, country DESC;",
    ) == [
        (-40, "USA"), (0, None), (1, None), (6, None), (9, "France"),
        (14, "Germany"), (None, None), (None, "Turkey"), (None, "Germany"),
        (None, "France"),
    ]


def test_sort_by_nullable3(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2, country FROM default "
        "ORDER BY nullable_int2 DESC, country DESC LIMIT 3;",
    ) == [(None, None), (None, "Turkey"), (None, "Germany")]


def test_sort_by_nonexistant(db_ec):
    assert rows(
        db_ec,
        "SELECT column_does_not_exist FROM default ORDER BY column_does_not_exist;",
    ) == [(None,)] * 10


def test_sum_overflow(db_ec):
    # Overflow-checked SUM (query_plan.rs:691-707; query_tests.rs:1314)
    # surfaces as an ANSI-mode arithmetic error.
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC_OVERFLOW"):
        db_ec.run_query("SELECT SUM(largenum) FROM default;")
