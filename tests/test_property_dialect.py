"""Property-based dialect testing: hypothesis generates random queries
from a small grammar (filters, implicit group-by, aggregates) and every
one must agree with DuckDB running the ANSI-SQL equivalent over the
same edge-cases fixture.

This goes beyond the reference's fixed golden-row corpus (reference
tests/query_tests.rs — 119 hand-written cases): the grammar explores
the cross product of nullable columns x comparison ops x boolean
connectives x aggregates, which is exactly where null-propagation and
type-promotion bugs hide.
"""

import math
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DATA = os.path.join(os.path.dirname(__file__), "data")
CSV = os.path.join(DATA, "edge_cases.csv")

# columns we draw from (name -> is_float)
INT_COLS = ["non_dense_ints", "negative", "id", "nullable_int",
            "nullable_int2", "u8_offset_encoded"]
FLOAT_COLS = ["float", "float01", "nullable_float"]
STR_COLS = ["enum", "country", "string_packed"]
CMP = ["=", "<>", "<", "<=", ">", ">="]


@pytest.fixture(scope="module")
def pdb(spark, tmp_path_factory):
    from locustdb_spark import LocustDB

    db = LocustDB(db_path=str(tmp_path_factory.mktemp("prop")), spark=spark)
    db.load_csv(CSV, "t", allow_nulls=True)
    return db


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_csv_auto('{CSV}', header=true)")
    return con


@st.composite
def predicates(draw, depth: int = 2):
    kind = draw(st.sampled_from(
        ["int_cmp", "null_check", "and", "or", "not"]
        if depth > 0 else ["int_cmp", "null_check"]))
    if kind == "int_cmp":
        col = draw(st.sampled_from(INT_COLS))
        op = draw(st.sampled_from(CMP))
        lit = draw(st.integers(min_value=-300, max_value=300))
        return f"({col} {op} {lit})"
    if kind == "null_check":
        col = draw(st.sampled_from(INT_COLS + FLOAT_COLS + STR_COLS))
        neg = draw(st.booleans())
        return f"({col} IS {'NOT ' if neg else ''}NULL)"
    if kind == "not":
        return f"(NOT {draw(predicates(depth=depth - 1))})"
    a = draw(predicates(depth=depth - 1))
    b = draw(predicates(depth=depth - 1))
    return f"({a} {'AND' if kind == 'and' else 'OR'} {b})"


def _norm(rows, ncols):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None:
                vals.append(None)
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(round(v, 6))
            else:
                vals.append(int(v) if isinstance(v, bool) else v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), x) for x in t))


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_filter_agg_matches_duckdb(pdb, duck, data):
    """Random implicit-group-by aggregate + filter == DuckDB."""
    key = data.draw(st.sampled_from(STR_COLS + ["non_dense_ints"]))
    agg = data.draw(st.sampled_from(["count", "sum", "min", "max"]))
    val = data.draw(st.sampled_from(INT_COLS))
    pred = data.draw(predicates())
    ours = pdb.run_query(
        f"SELECT {key}, {agg}({val}) FROM t WHERE {pred}")["rows"]
    theirs = duck.execute(
        f"SELECT {key}, {agg}({val}) FROM t WHERE {pred} "
        f"GROUP BY {key}").fetchall()
    assert _norm(ours, 2) == _norm(theirs, 2), (key, agg, val, pred)


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_filter_projection_matches_duckdb(pdb, duck, data):
    """Random filtered projection == DuckDB (row multiset)."""
    cols = data.draw(st.lists(
        st.sampled_from(INT_COLS + STR_COLS), min_size=1, max_size=3,
        unique=True))
    pred = data.draw(predicates())
    sel = ", ".join(cols)
    ours = pdb.run_query(f"SELECT {sel} FROM t WHERE {pred}")["rows"]
    theirs = duck.execute(f"SELECT {sel} FROM t WHERE {pred}").fetchall()
    assert _norm(ours, len(cols)) == _norm(theirs, len(cols)), (sel, pred)


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_global_agg_matches_duckdb(pdb, duck, data):
    """Ungrouped aggregates (COUNT null-skipping, SUM/MIN/MAX
    promotion) == DuckDB."""
    agg = data.draw(st.sampled_from(["count", "sum", "min", "max"]))
    val = data.draw(st.sampled_from(INT_COLS + FLOAT_COLS))
    pred = data.draw(predicates())
    ours = pdb.run_query(f"SELECT {agg}({val}) FROM t WHERE {pred}")["rows"]
    theirs = duck.execute(
        f"SELECT {agg}({val}) FROM t WHERE {pred}").fetchall()
    assert _norm(ours, 1) == _norm(theirs, 1), (agg, val, pred)


@st.composite
def int_exprs(draw):
    """Random integer arithmetic over columns: (our dialect, duckdb).
    Our `/` is truncating integer division — DuckDB's `//` matches
    (both truncate toward zero, verified on negatives)."""
    kind = draw(st.sampled_from(["div", "mod", "add", "mul_sub", "col"]))
    a = draw(st.sampled_from(INT_COLS))
    b = draw(st.sampled_from(INT_COLS))
    k = draw(st.integers(min_value=1, max_value=50))
    if kind == "div":
        return f"({a} / {k})", f"({a} // {k})"
    if kind == "mod":
        return f"({a} % {k})", f"({a} % {k})"
    if kind == "add":
        return f"({a} + {b})", f"({a} + {b})"
    if kind == "mul_sub":
        return f"({a} * 2 - {b})", f"({a} * 2 - {b})"
    return a, a


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_expression_group_agg_matches_duckdb(pdb, duck, data):
    """Arithmetic expressions as group key AND aggregate argument ==
    DuckDB (int division/modulo truncation, null propagation through
    expression chains)."""
    key_ours, key_duck = data.draw(int_exprs())
    val_ours, val_duck = data.draw(int_exprs())
    agg = data.draw(st.sampled_from(["count", "sum", "min", "max"]))
    pred = data.draw(predicates())
    ours = pdb.run_query(
        f"SELECT {key_ours}, {agg}({val_ours}) FROM t WHERE {pred}")["rows"]
    theirs = duck.execute(
        f"SELECT {key_duck}, {agg}({val_duck}) FROM t WHERE {pred} "
        f"GROUP BY 1").fetchall()
    assert _norm(ours, 2) == _norm(theirs, 2), (key_ours, agg, val_ours, pred)


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_order_by_limit_matches_duckdb(pdb, duck, data):
    """ORDER BY + LIMIT with the dialect's null placement (nulls last
    ASC, nulls first DESC — fused sentinels, reference types.rs:6-10).
    Selecting only the sort key keeps the cut deterministic under ties."""
    col = data.draw(st.sampled_from(INT_COLS + FLOAT_COLS + STR_COLS))
    desc = data.draw(st.booleans())
    n = data.draw(st.integers(min_value=1, max_value=12))
    pred = data.draw(predicates())
    direction = "DESC" if desc else "ASC"
    nulls = "NULLS FIRST" if desc else "NULLS LAST"
    ours = pdb.run_query(
        f"SELECT {col} FROM t WHERE {pred} "
        f"ORDER BY {col} {direction} LIMIT {n}")["rows"]
    theirs = duck.execute(
        f"SELECT {col} FROM t WHERE {pred} "
        f"ORDER BY {col} {direction} {nulls} LIMIT {n}").fetchall()
    assert _norm(ours, 1) == _norm(theirs, 1), (col, direction, n, pred)


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_like_pattern_matches_duckdb(pdb, duck, data):
    """Random LIKE / NOT LIKE patterns (with regex metacharacters as
    literals) == DuckDB — exercises the dialect's LIKE-to-regex
    translation and its escaping (reference query_plan.rs:1236-1294)."""
    col = data.draw(st.sampled_from(STR_COLS))
    tokens = data.draw(st.lists(
        st.sampled_from(["%", "_", "a", "b", "x", "y", "z", "A", ".",
                         "(", "[", "*", "G", "e"]),
        min_size=1, max_size=6))
    pat = "".join(tokens)
    neg = data.draw(st.booleans())
    op = "NOT LIKE" if neg else "LIKE"
    ours = pdb.run_query(f"SELECT {col} FROM t WHERE {col} {op} '{pat}'")["rows"]
    theirs = duck.execute(f"SELECT {col} FROM t WHERE {col} {op} '{pat}'").fetchall()
    assert _norm(ours, 1) == _norm(theirs, 1), (col, op, pat)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_multi_key_order_by_matches_duckdb(pdb, duck, data):
    """Random multi-key ORDER BY with mixed ASC/DESC and the dialect's
    null placement, full result (no LIMIT, so ties cannot change the
    multiset) — compared positionally against DuckDB with explicit
    NULLS FIRST/LAST."""
    ncols = data.draw(st.integers(min_value=2, max_value=3))
    cols = data.draw(st.lists(
        st.sampled_from(INT_COLS + STR_COLS + FLOAT_COLS),
        min_size=ncols, max_size=ncols, unique=True))
    dirs = [data.draw(st.booleans()) for _ in cols]
    our_order = ", ".join(
        f"{c} {'DESC' if d else 'ASC'}" for c, d in zip(cols, dirs))
    duck_order = ", ".join(
        f"{c} {'DESC NULLS FIRST' if d else 'ASC NULLS LAST'}"
        for c, d in zip(cols, dirs))
    sel = ", ".join(cols)
    ours = pdb.run_query(
        f"SELECT {sel} FROM t ORDER BY {our_order}")["rows"]
    theirs = duck.execute(
        f"SELECT {sel} FROM t ORDER BY {duck_order}").fetchall()
    # positional comparison — the ordering itself is under test
    a = [_norm([r], len(cols))[0] for r in ours]
    b = [_norm([r], len(cols))[0] for r in theirs]
    assert a == b, (sel, our_order)


@st.composite
def scalar_func_exprs(draw):
    """Random scalar-function expressions: (ours, duckdb). Covers the
    dialect's function surface (to_year / length-in-bytes / floor,
    reference operators/functions.rs) composed with arithmetic."""
    kind = draw(st.sampled_from(["to_year", "length", "floor", "neg"]))
    if kind == "to_year":
        col = draw(st.sampled_from(INT_COLS))
        # any int is a valid unix-seconds input; DuckDB's to_timestamp
        # yields TIMESTAMPTZ, so the view connection pins UTC
        return f"to_year({col})", f"year(to_timestamp({col}))"
    if kind == "length":
        col = draw(st.sampled_from(STR_COLS))
        # ours is BYTE length (reference functions.rs:45-50) = strlen
        return f"length({col})", f"strlen({col})"
    if kind == "floor":
        # float01 only: `float`/`nullable_float` contain ~1e30 values
        # whose i64 floor overflows — our ANSI mode raises there (by
        # design, overflow parity) while DuckDB's CAST also errors, so
        # neither side produces a comparable row.
        col = "float01"
        k = draw(st.integers(min_value=1, max_value=9))
        return (f"floor({col} * {k})",
                f"CAST(floor({col} * {k}) AS BIGINT)")
    col = draw(st.sampled_from(INT_COLS))
    return f"-{col}", f"-{col}"


@settings(max_examples=30, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_scalar_funcs_match_duckdb(pdb, duck_utc, data):
    """Random scalar-function projections (with a filter) == DuckDB."""
    expr_ours, expr_duck = data.draw(scalar_func_exprs())
    pred = data.draw(predicates())
    ours = pdb.run_query(
        f"SELECT {expr_ours} FROM t WHERE {pred}")["rows"]
    theirs = duck_utc.execute(
        f"SELECT {expr_duck} FROM t WHERE {pred}").fetchall()
    assert _norm(ours, 1) == _norm(theirs, 1), (expr_ours, pred)


@pytest.fixture(scope="module")
def duck_utc():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_csv_auto('{CSV}', header=true)")
    return con


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_expr_over_aggregates_matches_duckdb(pdb, duck, data):
    """Expressions over aggregates (the dialect's two-phase final pass,
    reference query.rs:509-553): sum(x)/count(0)+k and friends ==
    DuckDB with truncating integer division."""
    key = data.draw(st.sampled_from(STR_COLS + ["non_dense_ints"]))
    val = data.draw(st.sampled_from(INT_COLS))
    k = data.draw(st.integers(min_value=1, max_value=20))
    shape = data.draw(st.sampled_from(["ratio", "plus", "scaled"]))
    if shape == "ratio":
        ours_e = f"sum({val}) / count(0) + {k}"
        duck_e = f"sum({val}) // count(*) + {k}"
    elif shape == "plus":
        ours_e = f"sum({val}) + count({val})"
        duck_e = f"sum({val}) + count({val})"
    else:
        ours_e = f"max({val}) * {k} - min({val})"
        duck_e = f"max({val}) * {k} - min({val})"
    pred = data.draw(predicates())
    ours = pdb.run_query(
        f"SELECT {key}, {ours_e} FROM t WHERE {pred}")["rows"]
    theirs = duck.execute(
        f"SELECT {key}, {duck_e} FROM t WHERE {pred} GROUP BY {key}"
    ).fetchall()
    assert _norm(ours, 2) == _norm(theirs, 2), (key, ours_e, pred)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_order_by_aggregate_alias_matches_duckdb(pdb, duck, data):
    """ORDER BY an aggregate's alias with LIMIT (the reference marks
    this area TODO at query_tests.rs:1612-1617 — we implement the
    intended behavior): deterministic under ties via a group-key
    tiebreak, dialect null placement made explicit on the DuckDB
    side."""
    key = data.draw(st.sampled_from(STR_COLS + ["non_dense_ints"]))
    agg = data.draw(st.sampled_from(["count", "sum", "min", "max"]))
    val = data.draw(st.sampled_from(INT_COLS))
    desc = data.draw(st.booleans())
    n = data.draw(st.integers(min_value=1, max_value=8))
    pred = data.draw(predicates())
    d = "DESC" if desc else "ASC"
    nulls = "NULLS FIRST" if desc else "NULLS LAST"
    ours = pdb.run_query(
        f"SELECT {key}, {agg}({val}) AS a FROM t WHERE {pred} "
        f"ORDER BY a {d}, {key} LIMIT {n}")["rows"]
    theirs = duck.execute(
        f"SELECT {key}, {agg}({val}) AS a FROM t WHERE {pred} "
        f"GROUP BY {key} "
        f"ORDER BY a {d} {nulls}, {key} NULLS LAST LIMIT {n}").fetchall()
    a = [_norm([r], 2)[0] for r in ours]
    b = [_norm([r], 2)[0] for r in theirs]
    assert a == b, (key, agg, val, d, n, pred)


# ---- second fixture: driver-provided lineitem (6k rows at sf0.001) ----
# The ec fixture has 10 rows; real aggregation/merge paths (partial +
# final over many partitions) only get exercised with thousands of rows.

LI_INT = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
LI_STR = ["l_returnflag", "l_linestatus"]


@pytest.fixture(scope="module")
def li_db(spark):
    from conftest import TESTDATA_SF
    from locustdb_spark import LocustDB

    db = LocustDB(spark=spark)
    db.register_parquet("t", f"{TESTDATA_SF}/lineitem.parquet")
    return db


@pytest.fixture(scope="module")
def li_duck():
    from conftest import TESTDATA_SF

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{TESTDATA_SF}/lineitem.parquet')")
    return con


@st.composite
def li_predicates(draw, depth: int = 2):
    kind = draw(st.sampled_from(
        ["cmp", "str_eq", "and", "or", "not"] if depth > 0
        else ["cmp", "str_eq"]))
    if kind == "cmp":
        col = draw(st.sampled_from(LI_INT))
        op = draw(st.sampled_from(CMP))
        lit = draw(st.integers(min_value=0, max_value=6000))
        return f"({col} {op} {lit})"
    if kind == "str_eq":
        col = draw(st.sampled_from(["l_returnflag", "l_linestatus"]))
        v = draw(st.sampled_from(["A", "N", "R", "O", "F"]))
        return f"({col} = '{v}')"
    if kind == "not":
        return f"(NOT {draw(li_predicates(depth=depth - 1))})"
    a = draw(li_predicates(depth=depth - 1))
    b = draw(li_predicates(depth=depth - 1))
    return f"({a} {'AND' if kind == 'and' else 'OR'} {b})"


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_lineitem_filter_agg_matches_duckdb(li_db, li_duck, data):
    """Random grouped aggregates over the 6k-row lineitem table —
    exercises multi-partition partial+final aggregation paths the
    10-row fixture cannot."""
    key = data.draw(st.sampled_from(LI_STR + ["l_linenumber"]))
    agg = data.draw(st.sampled_from(["count", "sum", "min", "max"]))
    val = data.draw(st.sampled_from(LI_INT))
    pred = data.draw(li_predicates())
    ours = li_db.run_query(
        f"SELECT {key}, {agg}({val}) FROM t WHERE {pred}")["rows"]
    theirs = li_duck.execute(
        f"SELECT {key}, {agg}({val}) FROM t WHERE {pred} "
        f"GROUP BY {key}").fetchall()
    assert _norm(ours, 2) == _norm(theirs, 2), (key, agg, val, pred)


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_lineitem_topn_matches_duckdb(li_db, li_duck, data):
    """Random ORDER BY expr DESC/ASC LIMIT n over lineitem — the
    TakeOrderedAndProject path under filters, at enough rows that
    per-partition heaps actually merge."""
    col = data.draw(st.sampled_from(LI_INT))
    k = data.draw(st.integers(min_value=1, max_value=30))
    desc = data.draw(st.booleans())
    pred = data.draw(li_predicates())
    d = "DESC" if desc else "ASC"
    ours = li_db.run_query(
        f"SELECT {col} FROM t WHERE {pred} ORDER BY {col} {d} LIMIT {k}"
    )["rows"]
    theirs = li_duck.execute(
        f"SELECT {col} FROM t WHERE {pred} ORDER BY {col} {d} LIMIT {k}"
    ).fetchall()
    assert _norm(ours, 1) == _norm(theirs, 1), (col, d, k, pred)
