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


def test_is_null(db_ec):
    assert rows(
        db_ec,
        "SELECT id FROM default WHERE nullable_int IS NULL ORDER BY id;",
    ) == [(2,), (3,), (5,), (6,), (8,)]
    assert rows(
        db_ec,
        "SELECT id FROM default WHERE nullable_int IS NOT NULL ORDER BY id;",
    ) == [(0,), (1,), (4,), (7,), (9,)]


def test_floor1(db_ec):
    assert rows(
        db_ec, "SELECT MAX(id), MIN(id), FLOOR(float01 * 10) FROM default"
    ) == [
        (1, 1, -4), (9, 9, -2), (4, 4, 1), (7, 5, 2), (0, 0, 3),
        (2, 2, 4), (6, 6, 5), (8, 8, 7), (3, 3, 9),
    ]


def test_floor2(db_ec):
    assert rows(
        db_ec, "SELECT MIN(id), MAX(id), FLOOR(id * 0.23) FROM default"
    ) == [(0, 4, 0), (5, 8, 1), (9, 9, 2)]


def test_floor3(db_ec):
    assert rows(
        db_ec,
        "SELECT MIN(id), MAX(id), FLOOR(nullable_float * 1e-30) FROM default",
    ) == [(2, 6, 0), (9, 9, 1), (0, 8, None)]


def test_group_by_float(db_ec):
    approx_rows(
        rows(db_ec,
             "SELECT count(0), float FROM default ORDER BY float ASC LIMIT 5;"),
        [(1, -124.0), (1, -1.0), (1, 0.0), (2, 1e-6), (1, 0.0003)],
    )


def test_group_by_nullable1(db_ec):
    assert rows(db_ec, "SELECT country, COUNT(0) FROM default;") == [
        ("France", 2), ("Germany", 2), ("Turkey", 1), ("USA", 1), (None, 4)]


def test_group_by_nullable2(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int, COUNT(0) FROM default ORDER BY nullable_int;",
    ) == [(-40, 1), (-1, 1), (10, 1), (13, 1), (20, 1), (None, 5)]


def test_group_by_nullable3(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2, country, COUNT(0) FROM default "
        "ORDER BY nullable_int2, country;",
    ) == [
        (-40, "USA", 1), (0, None, 1), (1, None, 1), (6, None, 1),
        (9, "France", 1), (14, "Germany", 1), (None, "France", 1),
        (None, "Germany", 1), (None, "Turkey", 1), (None, None, 1),
    ]


def test_group_by_nullable4(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int, string_packed, COUNT(0) FROM default "
        "ORDER BY string_packed, nullable_int;",
    ) == [
        (None, "$sss", 1), (None, "AXY", 1), (20, "_f", 1), (-40, "abc", 1),
        (None, "asd", 1), (None, "axz", 1), (10, "azy", 1), (None, "t", 1),
        (-1, "xyz", 1), (13, "😈", 1),
    ]


def test_null_operators(db_ec):
    q = ("SELECT id, nullable_int, nullable_int2 FROM default WHERE %s "
         "ORDER BY id;")
    assert rows(db_ec, q % "nullable_int < nullable_int2") == [(9, 13, 14)]
    assert rows(db_ec, q % "nullable_int = nullable_int2") == [(1, -40, -40)]
    assert rows(
        db_ec,
        q % "nullable_int <> nullable_int2 AND nullable_int >= nullable_int2",
    ) == [(4, 10, 9)]
    assert rows(
        db_ec,
        q % "nullable_int <= nullable_int2 OR nullable_int > nullable_int2",
    ) == [(1, -40, -40), (4, 10, 9), (9, 13, 14)]


def test_null_count(db_ec):
    # Reference returns NULL for COUNT(missing column) (query_tests.rs
    # test_null_count) — a marked quirk of its all-null count path; the
    # intended/SQL answer for a count over an all-NULL column is 0.
    assert rows(
        db_ec,
        "SELECT id/5, COUNT(this_is_not_a_column) FROM default ORDER BY id/5;",
    ) == [(0, 0), (1, 0)]


def test_or_nullcheck_and_filter(db_ec):
    approx_rows(
        rows(db_ec,
             "SELECT nullable_int2, float FROM default "
             "WHERE nullable_int2 IS NOT NULL OR float IS NOT NULL "
             "ORDER BY id LIMIT 100000;"),
        [(None, 0.123412), (-40, 0.0003), (None, -124.0), (0, 3.15159),
         (9, 1.234e29), (6, 1e-6), (None, 0.0), (None, 1e-6), (1, -1.0),
         (14, 1234124.51325)],
    )
    assert rows(
        db_ec,
        "SELECT id FROM default WHERE id IS NULL OR float IS NULL "
        "ORDER BY id LIMIT 100000;",
    ) == []


def test_overflow_add(db_ec):
    # (query_tests.rs test_overflow1/test_overflow2)
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        db_ec.run_query("SELECT largenum + non_dense_ints FROM default;")
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        db_ec.run_query("SELECT largenum + nullable_int FROM default;")


def test_overflow_divide(db_ec):
    # i64::MIN / -1 overflows (query_tests.rs test_overflow3)
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        db_ec.run_query(
            "SELECT largenum / nullable_int FROM default ORDER BY id;")


def test_overflow_divide_ok(db_ec):
    # same numerator, shifted denominator: plain truncating i64 division
    # with null propagation (query_tests.rs test_overflow4)
    assert rows(
        db_ec,
        "SELECT largenum / (nullable_int - 1) FROM default ORDER BY id;",
    ) == [
        (4611686018427387904,), (-224960293581823800,), (None,), (None,),
        (-1024819115206086200,), (None,), (None,), (485440633518672410,),
        (None,), (768614336404564650,),
    ]


def test_select_0_of_everything(db_ec):
    assert rows(db_ec, "SELECT * FROM default LIMIT 0;") == []


def test_select_where_nullable_gt_constant(db_ec):
    assert rows(
        db_ec, "SELECT id FROM default WHERE nullable_float > 0.1;"
    ) == [(2,), (9,)]


def test_sort_by_multiple_nullable_null(db_ec):
    approx_rows(
        rows(db_ec,
             "SELECT nullable_float, nullable_float2 FROM default "
             "ORDER BY nullable_float, nullable_float2 DESC;"),
        [(1e-32, None), (0.4, None), (1.123124e30, None)]
        + [(None, None)] * 7,
    )


def test_sort_by_nullable4(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2 FROM default ORDER BY nullable_int2 DESC LIMIT 2;",
    ) == [(None,), (None,)]


def test_sort_by_nullable_float(db_ec):
    asc = rows(db_ec,
               "SELECT nullable_float FROM default ORDER BY nullable_float;")
    approx_rows(asc, [(1e-32,), (0.4,), (1.123124e30,)] + [(None,)] * 7)
    desc = rows(
        db_ec,
        "SELECT nullable_float FROM default ORDER BY nullable_float DESC;")
    approx_rows(desc, [(None,)] * 7 + [(1.123124e30,), (0.4,), (1e-32,)])
    lim = rows(
        db_ec,
        "SELECT nullable_float FROM default ORDER BY nullable_float LIMIT 4;")
    approx_rows(lim, [(1e-32,), (0.4,), (1.123124e30,), (None,)])


def test_top_n_of_null(db_ec):
    assert rows(
        db_ec,
        "SELECT id, nonexistant, ne2 FROM default "
        "WHERE nonexistant IS NOT NULL AND ne2 IS NOT NULL "
        "ORDER BY id LIMIT 4;",
    ) == []


def test_sum_where_nullable(db_ec):
    assert rows(
        db_ec,
        "SELECT SUM(id) FROM default WHERE nullable_float >= 0.1 AND id > 5;",
    ) == [(9,)]
    assert rows(
        db_ec, "SELECT SUM(id) FROM default WHERE nullable_float >= 0.1;"
    ) == [(11,)]


def test_negative_constant(db_ec):
    assert rows(
        db_ec, "SELECT id FROM default WHERE id - 3 <= -1.15 ORDER BY id;"
    ) == [(0,), (1,)]


def test_merge_keep_null_column(db_ec):
    assert rows(
        db_ec,
        "SELECT id, nonexistant_column FROM default ORDER BY id LIMIT 2;",
    ) == [(0, None), (1, None)]


def test_missing_count(db_ec):
    # meta-table query with a quoted identifier (query_tests.rs
    # test_missing_count)
    assert rows(
        db_ec,
        "SELECT COUNT(0) AS count FROM _meta_tables "
        "WHERE \"name\" = 'geistesblitz_dashboard'",
    ) == [(0,)]


def test_max_of_string(db_ec):
    # Reference returns no rows here (its aggregator set has no string
    # MIN/MAX — aggregator.rs:3-11); the intended SQL behavior is one
    # row: NULL for the missing column's MAX, lexicographic min string.
    assert rows(
        db_ec,
        "SELECT MAX(nonexistant_column), MIN(string_packed) FROM default;",
    ) == [(None, "$sss")]


# --- round-1 continuation: remaining reference corpus ports ---


def test_not_equals_2(db_tiny):
    # query_tests.rs test_not_equals_2
    assert rows(db_tiny,
                "select num, count(1) from default where not(num = 0);") == [
        (1, 49), (2, 24), (3, 11), (4, 5), (5, 2), (8, 1)]


def test_sort_by_nullable_float1(db_ec):
    # nulls sort LAST ascending (fused-sentinel parity, types.rs:6-10)
    assert rows(db_ec,
                "SELECT nullable_float FROM default ORDER BY nullable_float;"
                ) == [(1e-32,), (0.4,), (1.123124e30,)] + [(None,)] * 7


def test_sort_by_nullable_float2(db_ec):
    # nulls sort FIRST descending
    assert rows(
        db_ec,
        "SELECT nullable_float FROM default ORDER BY nullable_float DESC;"
    ) == [(None,)] * 7 + [(1.123124e30,), (0.4,), (1e-32,)]


def test_sort_by_nullable_float3(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_float FROM default ORDER BY nullable_float LIMIT 4;"
    ) == [(1e-32,), (0.4,), (1.123124e30,), (None,)]


def test_or_nullcheck_and_filter1(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2, float FROM default WHERE nullable_int2 IS "
        "NOT NULL OR float IS NOT NULL ORDER BY id LIMIT 100000;") == [
        (None, 0.123412), (-40, 0.0003), (None, -124.0), (0, 3.15159),
        (9, 1.234e29), (6, 1e-6), (None, 0.0), (None, 1e-6), (1, -1.0),
        (14, 1234124.51325)]


def test_or_nullcheck_and_filter2(db_ec):
    assert rows(
        db_ec,
        "SELECT id FROM default WHERE id IS NULL OR float IS NULL "
        "ORDER BY id LIMIT 100000;") == []


def test_or_nullcheck_and_filter3(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2, nullable_float FROM default WHERE "
        "nullable_int2 IS NOT NULL AND (nullable_float IS NOT NULL) "
        "ORDER BY id LIMIT 100000;") == [(14, 1.123124e30)]


def test_or_nullcheck_and_filter4(db_ec):
    assert rows(
        db_ec,
        "SELECT nullable_int2, nullable_float FROM default WHERE "
        "nullable_int2 IS NOT NULL AND (nullable_float IS NOT NULL) "
        "LIMIT 100000;") == [(14, 1.123124e30)]


def test_filter_nonexistant_columns(db_ec):
    # missing columns read as all-NULL (query_plan.rs:1166-1181); row
    # order without ORDER BY is storage order — compare as multiset
    got = rows(
        db_ec,
        "SELECT nullable_int2, lolololol, also_doesnt_exist FROM default "
        "WHERE nullable_int2 IS NOT NULL;")
    assert sorted(got) == sorted([
        (-40, None, None), (0, None, None), (9, None, None),
        (6, None, None), (1, None, None), (14, None, None)])


def test_int_less_than(db_ec):
    assert rows(
        db_ec,
        "SELECT id, non_dense_ints FROM default WHERE non_dense_ints < 3 "
        "ORDER BY id LIMIT 2;") == [(0, 0), (1, 2)]


def test_float_less_than(db_ec):
    assert rows(
        db_ec,
        "SELECT id, float FROM default WHERE float < 0.0001 "
        "ORDER BY id LIMIT 2;") == [(2, -124.0), (5, 1e-6)]


def test_float_greater_than(db_ec):
    assert rows(
        db_ec,
        "SELECT id, float FROM default WHERE float > 0.0001 "
        "ORDER BY id LIMIT 2;") == [(0, 0.123412), (1, 0.0003)]


def test_float_greater_than_int(db_ec):
    # int literal against float column (type promotion in comparison)
    assert rows(
        db_ec,
        "SELECT id, float FROM default WHERE float > 0 "
        "ORDER BY id LIMIT 2;") == [(0, 0.123412), (1, 0.0003)]


def test_sum_where_nullable_gte_constant(db_ec):
    assert rows(db_ec,
                "SELECT SUM(id) FROM default WHERE nullable_float >= 0.1;"
                ) == [(11,)]


def test_sum_where_nullable_and_bool(db_ec):
    assert rows(
        db_ec,
        "SELECT SUM(id) FROM default WHERE nullable_float >= 0.1 AND "
        "id > 5;") == [(9,)]


def test_gt_float_filter_offset_encoded_int(db_ec):
    # float literal against int column (comparison in float space)
    got = rows(db_ec,
               "SELECT id FROM default WHERE u8_offset_encoded >= 499.123;")
    assert sorted(got) == [(5,), (8,), (9,)]


def test_gt_float_filter_offset_encoded_nullable_int(db_ec):
    got = rows(db_ec,
               "SELECT id FROM default WHERE nullable_int2 <= 0.123;")
    assert sorted(got) == [(1,), (3,)]


def test_partition_alias_mismatch(spark, tmp_path):
    """Schema drift across ingested batches (query_tests.rs
    test_partition_alias_mismatch): batch 1 has only f1, batch 2 only
    f2/f3; selecting f1,f2,f3,f4 must null-fill per batch (f4 never
    exists anywhere -> all NULL). Values are distributionally (not
    bit-) identical to the reference's RNG, so we assert structure."""
    from locustdb_spark import LocustDB
    from locustdb_spark.sources.colgen import gen_table_df, nullable_ints

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    g = nullable_ints([None, 1], [0.1, 0.9])
    db.ingest_df("t", gen_table_df(spark, [("f1", g)], 1, 5))
    db.force_flush("t")
    db.ingest_df("t", gen_table_df(spark, [("f2", g), ("f3", g)], 1, 5))
    got = rows(db, "SELECT f1, f2, f3, f4 FROM t LIMIT 10;")
    assert len(got) == 10
    assert all(r[3] is None for r in got)          # f4 never existed
    batch1 = [r for r in got if r[1] is None and r[2] is None]
    batch2 = [r for r in got if r[0] is None and (r[1] is not None
                                                  or r[2] is not None)]
    assert len(batch1) >= 5                        # batch-1 rows: no f2/f3
    assert all(r[0] is None for r in got if r[1] is not None)


def test_group_by_string_nonexistant(db_ec):
    # grouping by a missing column yields a NULL key (query_tests.rs
    # test_group_by_string_nonexistant, adapted to the ec fixture)
    assert rows(
        db_ec,
        "SELECT enum, notacolumn, count(1) FROM default "
        "ORDER BY count(1) DESC LIMIT 3;") == [
        ("aa", None, 5), ("bb", None, 3), ("cc", None, 2)]


def test_group_by_string_string(db_ec):
    # the same column twice as two group keys
    assert rows(
        db_ec,
        "SELECT enum, enum, count(1) AS c FROM default "
        "ORDER BY c DESC, enum LIMIT 2;") == [
        ("aa", "aa", 5), ("bb", "bb", 3)]


def test_null_operators_comparisons(db_ec):
    # query_tests.rs test_null_operators (:1181-1243): comparisons between
    # two nullable columns use three-valued logic — rows where either side
    # is NULL never pass the filter
    assert rows(
        db_ec,
        "SELECT id, nullable_int, nullable_int2 FROM default "
        "WHERE nullable_int < nullable_int2 ORDER BY id;") == [(9, 13, 14)]
    assert rows(
        db_ec,
        "SELECT id, nullable_int, nullable_int2 FROM default "
        "WHERE nullable_int = nullable_int2 ORDER BY id;") == [(1, -40, -40)]
    assert rows(
        db_ec,
        "SELECT id, nullable_int, nullable_int2 FROM default "
        "WHERE nullable_int <> nullable_int2 AND nullable_int >= nullable_int2 "
        "ORDER BY id;") == [(4, 10, 9)]
    assert rows(
        db_ec,
        "SELECT id, nullable_int, nullable_int2 FROM default "
        "WHERE nullable_int <= nullable_int2 OR nullable_int > nullable_int2 "
        "ORDER BY id;") == [(1, -40, -40), (4, 10, 9), (9, 13, 14)]


def test_null_operators_not_equals_string(db_ec):
    # NULL <> 'Germany' is NULL, not true (query_tests.rs :1214-1225)
    assert rows(
        db_ec,
        "SELECT country FROM default WHERE country <> 'Germany' ORDER BY id;"
    ) == [("USA",), ("France",), ("France",), ("Turkey",)]


def test_null_operators_arithmetic(db_ec):
    # null propagation through + - * / % chains (query_tests.rs :1226-1242);
    # / and % are integer ops here
    assert rows(
        db_ec,
        "SELECT (nullable_int - nullable_int2 / (id + 1)) "
        "+ (nullable_int - 2 * nullable_int2) % (id + 1) "
        "FROM default ORDER BY id;") == [
        (None,), (-20,), (None,), (None,), (6,), (None,), (None,), (None,),
        (None,), (7,)]


def test_null_aggregators1(db_ec):
    # query_tests.rs :802-812
    assert rows(
        db_ec,
        "SELECT id/5, SUM(nullable_int), COUNT(nullable_int2), "
        "MIN(nullable_int), MAX(nullable_int2) FROM default ORDER BY id/5;"
    ) == [(0, -31, 3, -40, 9), (1, 33, 3, 13, 14)]


def test_null_aggregators2_correct(db_ec):
    # query_tests.rs :843-856 (the reference's own TODO-marked "correct"
    # variant: COUNT over an all-null group is 0, not NULL — Spark/DuckDB
    # produce this natively)
    assert rows(
        db_ec,
        "SELECT id/2, SUM(nullable_int), COUNT(nullable_int2), "
        "MIN(nullable_int), MAX(nullable_int2) FROM default ORDER BY id/2;"
    ) == [
        (0, -41, 1, -40, -40),
        (1, None, 1, None, 0),
        (2, 10, 2, 10, 9),
        (3, 20, 0, 20, None),
        (4, 13, 2, 13, 14)]


def test_null_aggregators3_missing_column(db_ec):
    # query_tests.rs :860-864: global aggregate over a nonexistent column
    # with an IS NOT NULL filter. The reference returns zero rows and marks
    # the intended behavior with a TODO ("should return single row of
    # null/0s?") — we assert the intended single-row form.
    assert rows(
        db_ec,
        "SELECT MIN(_step) AS min, MAX(_step) AS max, COUNT(_step) AS count "
        "FROM default WHERE _step IS NOT NULL") == [(None, None, 0)]


def test_aggregate_mixed_int_float_null(db_ec):
    # query_tests.rs :913-921: mixed int/float/null column promotes to
    # float (raw_col.rs:70-105 batch-time promotion)
    approx_rows(
        rows(db_ec,
             "SELECT SUM(mixed_float_int_null), COUNT(mixed_float_int_null), "
             "MIN(mixed_float_int_null), MAX(mixed_float_int_null), id / 5 "
             "FROM default"),
        [(14.33, 5, 0.12, 10.0, 0), (0.7, 3, 0.1, 0.5, 1)])


def test_filter_nonexistant_columns(db_ec):
    # query_tests.rs :1739-1751: selecting nonexistent columns yields NULL
    # vectors; the filter applies to the real column only
    got = rows(
        db_ec,
        "SELECT nullable_int2, lolololol, also_doesnt_exist FROM default "
        "WHERE nullable_int2 IS NOT NULL;")
    assert sorted(got) == sorted([
        (-40, None, None), (0, None, None), (9, None, None),
        (6, None, None), (1, None, None), (14, None, None)])


def test_sort_by_multiple_nullable_null_with_country(db_ec):
    # query_tests.rs :1089-1105: three-key sort where key2 is entirely
    # NULL — nulls sort last on ASC keys, first on DESC keys (fused
    # sentinels, types.rs:6-10)
    approx_rows(
        rows(db_ec,
             "SELECT nullable_float, nullable_float2, country FROM default "
             "ORDER BY nullable_float, nullable_float2 DESC, country;"),
        [(1e-32, None, "Turkey"),
         (0.4, None, "France"),
         (1.123124e30, None, "Germany"),
         (None, None, "France"),
         (None, None, "Germany"),
         (None, None, "USA"),
         (None, None, None),
         (None, None, None),
         (None, None, None),
         (None, None, None)])


def test_quoted_identifiers(db_ec):
    # query_tests.rs test_colnames :1839-1842: double-quoted column and
    # table identifiers parse like bare ones
    assert rows(
        db_ec,
        'SELECT "u8_offset_encoded" FROM "default" '
        'WHERE "u8_offset_encoded" = 256;') == [(256,)]


def test_null_count_missing_column(db_ec):
    # query_tests.rs test_null_count :869-874 (reference TODO-marked bug:
    # it returns NULL counts; intended behavior is COUNT = 0)
    assert rows(
        db_ec,
        "SELECT id/5, COUNT(this_is_not_a_column) FROM default ORDER BY id/5;"
    ) == [(0, 0), (1, 0)]


def test_multiply_null_by_constant(db_ec):
    # query_tests.rs :877-883: grouping by an expression over a
    # nonexistent column with an all-false filter yields zero groups
    assert rows(
        db_ec,
        "SELECT MIN(_step), MAX(_step), MIN(value_loss), MAX(value_loss), "
        "COUNT(value_loss), SUM(value_loss), _step * 493 / 20004864 "
        "FROM default WHERE _step IS NOT NULL AND value_loss IS NOT NULL"
    ) == []


def test_divide_multiply_null(db_ec):
    # query_tests.rs :885-891
    assert rows(
        db_ec,
        "SELECT MIN(_step), _step * 12.321, 493 * _step, _step / 10 "
        "FROM default WHERE _step IS NOT NULL AND value_loss IS NOT NULL"
    ) == []
