"""Parser unit tests: grammar coverage + rejected constructs
(reference src/syntax/parser.rs:92-105 NotImplemented surface and the
inline parser tests at parser.rs:457-481)."""

import pytest

from locustdb_spark.dialect import ast
from locustdb_spark.dialect.parser import (
    NotImplementedQueryError,
    ParseError,
    parse,
)


def test_basic_select():
    q = parse("select a, b from t where c = 1 order by a desc limit 10 offset 5")
    assert [s.expr for s in q.select] == [ast.ColName("a"), ast.ColName("b")]
    assert q.table == "t"
    assert q.filter == ast.BinOp("=", ast.ColName("c"), ast.Lit(1))
    assert q.order_by[0].descending
    assert q.limit == 10 and q.offset == 5


def test_no_limit_is_unlimited():
    # reference get_limit: None -> u64::MAX (parser.rs:191-203)
    assert parse("select a from t").limit is None


def test_precedence():
    q = parse("select a + b * 2, (a + b) * 2 from t")
    assert q.select[0].expr == ast.BinOp(
        "+", ast.ColName("a"), ast.BinOp("*", ast.ColName("b"), ast.Lit(2)))
    assert q.select[1].expr == ast.BinOp(
        "*", ast.BinOp("+", ast.ColName("a"), ast.ColName("b")), ast.Lit(2))


def test_bool_precedence():
    q = parse("select 1 from t where a = 1 or b = 2 and c = 3")
    f = q.filter
    assert isinstance(f, ast.BinOp) and f.op == "or"


def test_neg_literal_folds():
    # unary minus on literal folds (query_plan.rs:1400-1404)
    assert parse("select -5 from t").select[0].expr == ast.Lit(-5)


def test_is_null():
    q = parse("select a from t where a is not null and b is null")
    f = q.filter
    assert f.left == ast.UnaryOp("isnotnull", ast.ColName("a"))
    assert f.right == ast.UnaryOp("isnull", ast.ColName("b"))


def test_string_escape():
    assert parse("select 'it''s' from t").select[0].expr == ast.Lit("it's")


def test_count_star():
    assert parse("select count(*) from t").select[0].expr == ast.Call(
        "count", (ast.Lit(1),))


def test_aliases():
    q = parse("select sum(x) as total, y yy from t")
    assert q.select[0].alias == "total"
    assert q.select[1].alias == "yy"


def test_select_star_expansion_flag():
    assert parse("select * from t").select_star


@pytest.mark.parametrize(
    "sql,msg",
    [
        ("select a from t group by a", "GROUP BY"),
        ("select a from t having a > 1", "HAVING"),
        ("select distinct a from t", "DISTINCT"),
        ("select a from t join u on a = b", "JOIN"),
        ("select a from t, u", "multiple tables"),
    ],
)
def test_rejected_constructs(sql, msg):
    # Parity with reference NotImplemented errors (parser.rs:92-105).
    with pytest.raises(NotImplementedQueryError, match=msg):
        parse(sql)


def test_trailing_garbage():
    with pytest.raises(ParseError):
        parse("select a from t extra")


def test_semicolon_ok():
    assert parse("select a from t;").table == "t"


def test_like_not_like():
    q = parse("select a from t where a like 'x%' and b not like '_y'")
    assert q.filter.left == ast.BinOp("like", ast.ColName("a"), ast.Lit("x%"))
    assert q.filter.right == ast.BinOp("notlike", ast.ColName("b"), ast.Lit("_y"))


def test_functions_module_surface(spark):
    """The public scalar-function library matches dialect semantics."""
    from pyspark.sql import functions as F

    from locustdb_spark.functions import (
        int_div,
        length_bytes,
        like_pattern_to_regex,
        regex_match,
        to_year,
    )

    df = spark.range(1).select(
        to_year(F.lit(1262304000)).alias("y"),       # 2010-01-01 UTC
        length_bytes(F.lit("héllo")).alias("lb"),    # 6 bytes, 5 chars
        int_div(F.lit(-7), F.lit(2)).alias("d"),     # Rust -7/2 = -3
        regex_match(F.lit("abc123"), r"\d+$").alias("m"),
    )
    row = df.head()
    assert (row.y, row.lb, row.d, row.m) == (2010, 6, -3, True)

    import re

    pat = like_pattern_to_regex("a%b_c.")
    assert re.match(pat, "aXYZbQc.")
    assert not re.match(pat, "aXYZbQcZ")
