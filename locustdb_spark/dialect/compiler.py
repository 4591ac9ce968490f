"""Compile the LocustDB dialect AST into PySpark DataFrame plans.

Semantics reproduced from the reference engine:
- implicit GROUP BY: every non-aggregate select expression is a group key
  (reference: src/engine/planning/query.rs:472-567).
- aggregates inside expressions -> two-phase plan: aggregate pass + final
  projection pass (query.rs:509-553).
- AVG(x) is parsed as SUM(x)/COUNT(0) with integer-division semantics on
  integer inputs (src/syntax/parser.rs:319-336).
- COUNT(const) counts rows, COUNT(col) counts non-null
  (query_plan.rs:661-690).
- integer `/` and `%` are truncating (Rust i64 semantics,
  query_plan.rs:826-839) -> Spark `div` / `%`.
- `length()` is byte length (src/engine/operators/functions.rs:45-50)
  -> octet_length.
- `to_year(ts)` takes unix seconds (functions.rs:8-13).
- NULLs sort as the largest value for every type (fused sentinels,
  src/engine/data_types/types.rs:6-10): ASC -> nulls last,
  DESC -> nulls first.
- a column missing from the table reads as all-NULL
  (query_plan.rs:1166-1181).
- grouped results are returned ordered by group key (order-preserving
  merge, query.rs:364-402).

Everything here is query *construction*; execution is pure Catalyst —
whole-stage codegen, partial/final hash aggregation, TakeOrderedAndProject
for ORDER BY+LIMIT all come for free and match the reference's physical
tricks (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import (
    floor_int,
    int_div,
    length_bytes,
    regex_match,
    to_year,
)
from .ast import (
    BinOp,
    Call,
    ColName,
    Expr,
    Lit,
    OrderByItem,
    Query,
    SelectItem,
    UnaryOp,
    contains_aggregate,
    walk,
)
from .parser import NotImplementedQueryError, QueryError

# ---------------------------------------------------------------------------
# type inference (needed only to pick int-vs-float division semantics)
# ---------------------------------------------------------------------------

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def _classify(dt: T.DataType) -> str:
    if isinstance(dt, _INT_TYPES):
        return "int"
    if isinstance(dt, _FLOAT_TYPES):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "ts"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.NullType):
        return "null"
    return "other"


def infer_type(e: Expr, schema: dict[str, str]) -> str:
    """Return 'int' | 'float' | 'str' | 'bool' | 'ts' | 'null' | 'other'."""
    if isinstance(e, ColName):
        return schema.get(e.name, "null")
    if isinstance(e, Lit):
        if e.value is None:
            return "null"
        if isinstance(e.value, bool):
            return "bool"
        if isinstance(e.value, int):
            return "int"
        if isinstance(e.value, float):
            return "float"
        return "str"
    if isinstance(e, UnaryOp):
        if e.op in ("isnull", "isnotnull", "not"):
            return "bool"
        return infer_type(e.expr, schema)
    if isinstance(e, BinOp):
        if e.op in ("and", "or", "like", "notlike", "=", "<>", "<", "<=", ">", ">="):
            return "bool"
        lt, rt = infer_type(e.left, schema), infer_type(e.right, schema)
        if "float" in (lt, rt):
            return "float"
        if lt == "null":
            return rt
        if rt == "null":
            return lt
        return lt
    if isinstance(e, Call):
        if e.func == "count":
            return "int"
        if e.func in ("sum", "min", "max", "avg"):
            return infer_type(e.args[0], schema)
        if e.func in ("to_year", "length", "floor"):
            return "int"
        if e.func == "regex":
            return "bool"
    return "other"


# ---------------------------------------------------------------------------
# expression naming (LocustDB result colnames echo the expression text)
# ---------------------------------------------------------------------------


def expr_name(e: Expr) -> str:
    if isinstance(e, ColName):
        return e.name
    if isinstance(e, Lit):
        if e.value is None:
            return "null"
        if isinstance(e.value, str):
            return f"'{e.value}'"
        return str(e.value)
    if isinstance(e, UnaryOp):
        if e.op == "isnull":
            return f"{expr_name(e.expr)} is null"
        if e.op == "isnotnull":
            return f"{expr_name(e.expr)} is not null"
        if e.op == "not":
            return f"not {expr_name(e.expr)}"
        return f"-{expr_name(e.expr)}"
    if isinstance(e, BinOp):
        # sqlparser-rs Display form: spaces around every binary operator,
        # AND/OR/LIKE keywords uppercase (reference parser.rs:143 derives
        # colnames via format!("{}", ast_node))
        op = {"and": "AND", "or": "OR", "like": "LIKE",
              "notlike": "NOT LIKE"}.get(e.op, e.op)
        return f"{expr_name(e.left)} {op} {expr_name(e.right)}"
    if isinstance(e, Call):
        fname = e.src_name if getattr(e, "src_name", None) else e.func
        return f"{fname}({', '.join(expr_name(a) for a in e.args)})"
    raise QueryError(f"cannot name {e!r}")


# ---------------------------------------------------------------------------
# scalar compilation
# ---------------------------------------------------------------------------


class Compiler:
    """Compiles expressions against a concrete input schema."""

    def __init__(self, df: DataFrame):
        self.df = df
        self.schema = {f.name: _classify(f.dataType) for f in df.schema.fields}

    def col(self, name: str) -> Column:
        if name in self.schema:
            return F.col(name)
        # Missing column reads as all-NULL (reference query_plan.rs:1166-1181).
        return F.lit(None)

    def compile(self, e: Expr) -> Column:
        if isinstance(e, ColName):
            return self.col(e.name)
        if isinstance(e, Lit):
            return F.lit(e.value)
        if isinstance(e, UnaryOp):
            inner = self.compile(e.expr)
            if e.op == "-":
                return -inner
            if e.op == "not":
                return ~inner
            if e.op == "isnull":
                return inner.isNull()
            if e.op == "isnotnull":
                return inner.isNotNull()
        if isinstance(e, BinOp):
            return self._binop(e)
        if isinstance(e, Call):
            return self._call(e)
        raise QueryError(f"cannot compile {e!r}")

    def _binop(self, e: BinOp) -> Column:
        l, r = self.compile(e.left), self.compile(e.right)
        op = e.op
        if op == "and":
            return l & r
        if op == "or":
            return l | r
        if op == "=":
            return l == r
        if op == "<>":
            return l != r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "like":
            return l.like(_as_str_lit(e.right))
        if op == "notlike":
            return ~l.like(_as_str_lit(e.right))
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "%":
            return l % r
        if op == "/":
            lt = infer_type(e.left, self.schema)
            rt = infer_type(e.right, self.schema)
            if "float" not in (lt, rt):
                # Truncating integer division (Rust i64 `/`,
                # reference query_plan.rs:826-839).
                return int_div(l, r)
            return l / r
        raise QueryError(f"unknown operator {op}")

    def _call(self, e: Call) -> Column:
        f = e.func
        if f == "to_year":
            arg = e.args[0]
            is_ts = infer_type(arg, self.schema) == "ts"
            return to_year(self.compile(arg), is_timestamp=is_ts)
        if f == "length":
            return length_bytes(self.compile(e.args[0]))
        if f == "floor":
            return floor_int(self.compile(e.args[0]))
        if f == "regex":
            return regex_match(self.compile(e.args[0]), _as_str_lit(e.args[1]))
        if f == "not":
            return ~self.compile(e.args[0])
        if e.is_aggregate:
            raise QueryError(
                f"aggregate {f}() must be handled by the planner, not Compiler"
            )
        raise NotImplementedQueryError(f"function {f}()")

    def aggregate(self, e: Call) -> Column:
        """Compile a bare aggregate call (arg is a scalar expression)."""
        arg = e.args[0]
        if e.func == "count":
            if isinstance(arg, Lit) and arg.value is not None:
                return F.count(F.lit(1))
            return F.count(self.compile(arg))
        c = self.compile(arg)
        if e.func == "sum":
            return F.sum(c)
        if e.func == "min":
            return F.min(c)
        if e.func == "max":
            return F.max(c)
        raise QueryError(f"unknown aggregate {e.func}")


def _as_str_lit(e: Expr) -> str:
    if isinstance(e, Lit) and isinstance(e.value, str):
        return e.value
    raise NotImplementedQueryError("non-literal pattern in LIKE/regex")


# ---------------------------------------------------------------------------
# query planning
# ---------------------------------------------------------------------------


def _rewrite_avg(e: Expr) -> Expr:
    """AVG(x) -> SUM(x) / COUNT(x)  (non-null count; reference
    parser.rs:319-336 emits Divide(Sum(arg), Count(arg)))."""
    if isinstance(e, Call):
        args = tuple(_rewrite_avg(a) for a in e.args)
        if e.func == "avg":
            return BinOp("/", Call("sum", args), Call("count", args))
        return Call(e.func, args)
    if isinstance(e, BinOp):
        return BinOp(e.op, _rewrite_avg(e.left), _rewrite_avg(e.right))
    if isinstance(e, UnaryOp):
        return UnaryOp(e.op, _rewrite_avg(e.expr))
    return e


def _sort_col(c: Column, descending: bool) -> Column:
    # NULLs are the largest value in every type (fused sentinels,
    # types.rs:6-10): ASC -> nulls last, DESC -> nulls first.
    return c.desc_nulls_first() if descending else c.asc_nulls_last()


@dataclass
class CompiledQuery:
    df: DataFrame
    colnames: list[str]


def compile_query(q: Query, source: DataFrame) -> CompiledQuery:
    comp = Compiler(source)

    select = list(q.select)
    if q.select_star:
        # SELECT * expands to all columns sorted by name
        # (reference query_task.rs:101-111).
        star = [SelectItem(ColName(n)) for n in sorted(source.columns)]
        select = star + select

    # Name outputs from the *original* expression text (so `avg(x)` is not
    # displayed as its sum/count rewrite), then rewrite.
    for s in select:
        if s.alias is None:
            s.alias = expr_name(s.expr)
    select = [SelectItem(_rewrite_avg(s.expr), s.alias) for s in select]
    order_by = [OrderByItem(_rewrite_avg(o.expr), o.descending) for o in q.order_by]

    if q.filter is not None:
        if contains_aggregate(q.filter):
            raise NotImplementedQueryError("Aggregate function in WHERE clause")
        source = source.filter(comp.compile(q.filter).cast("boolean"))
        comp = Compiler(source)

    has_aggs = any(contains_aggregate(s.expr) for s in select) or any(
        contains_aggregate(o.expr) for o in order_by
    )

    if not has_aggs:
        return _compile_projection(q, select, order_by, source, comp)
    return _compile_grouped(q, select, order_by, source, comp)


def _output_names(select: list[SelectItem]) -> list[str]:
    names = []
    for s in select:
        names.append(s.alias if s.alias else expr_name(s.expr))
    return names


def _apply_limit(df: DataFrame, q: Query) -> DataFrame:
    if q.offset:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df


def _compile_projection(
    q: Query,
    select: list[SelectItem],
    order_by: list[OrderByItem],
    source: DataFrame,
    comp: Compiler,
) -> CompiledQuery:
    names = _output_names(select)
    out_cols = [comp.compile(s.expr).alias(f"_c{i}") for i, s in enumerate(select)]

    sort_cols: list[Column] = []
    hidden: list[Column] = []
    for j, o in enumerate(order_by):
        # Reuse the output column when the sort expr matches a select item.
        match = next((i for i, s in enumerate(select) if s.expr == o.expr), None)
        if match is None:
            match = next(
                (i for i, s in enumerate(select)
                 if s.alias and o.expr == ColName(s.alias)),
                None,
            )
        if match is not None:
            sort_cols.append(_sort_col(F.col(f"_c{match}"), o.descending))
        else:
            hidden.append(comp.compile(o.expr).alias(f"_s{j}"))
            sort_cols.append(_sort_col(F.col(f"_s{j}"), o.descending))

    df = source.select(*out_cols, *hidden)
    if sort_cols:
        df = df.orderBy(*sort_cols)
    if hidden:
        df = df.select(*[f"_c{i}" for i in range(len(select))])
    df = _apply_limit(df, q)
    df = df.toDF(*_dedupe(names))
    return CompiledQuery(df, names)


def _compile_grouped(
    q: Query,
    select: list[SelectItem],
    order_by: list[OrderByItem],
    source: DataFrame,
    comp: Compiler,
) -> CompiledQuery:
    # Split select into group keys (no aggregate anywhere in the expr) and
    # aggregate-bearing expressions (implicit GROUP BY, query.rs:472-567).
    keys: list[tuple[int, Expr]] = []
    for i, s in enumerate(select):
        if not contains_aggregate(s.expr):
            keys.append((i, s.expr))

    # Collect distinct aggregate subtrees across select + order_by.
    aggs: list[Call] = []
    def register(e: Expr):
        for n in walk(e):
            if isinstance(n, Call) and n.is_aggregate and n not in aggs:
                if contains_aggregate(n.args[0]):
                    raise NotImplementedQueryError("nested aggregate functions")
                aggs.append(n)

    for s in select:
        register(s.expr)
    for o in order_by:
        register(o.expr)

    key_cols = [comp.compile(e).alias(f"_k{j}") for j, (_, e) in enumerate(keys)]
    agg_cols = [comp.aggregate(a).alias(f"_a{j}") for j, a in enumerate(aggs)]

    if key_cols:
        grouped = source.groupBy(*key_cols).agg(*agg_cols)
    else:
        grouped = source.agg(*agg_cols)

    # Final pass: replace aggregate subtrees with their computed columns and
    # group-key exprs with their key columns (query.rs:509-553 final_pass).
    agg_schema = {
        f"_a{j}": infer_type(Call(a.func, a.args), comp.schema)
        if a.func != "count" else "int"
        for j, a in enumerate(aggs)
    }
    key_schema = {f"_k{j}": infer_type(e, comp.schema) for j, (_, e) in enumerate(keys)}
    final_comp = Compiler(grouped)
    final_comp.schema.update(agg_schema)
    final_comp.schema.update(key_schema)

    def substitute(e: Expr) -> Expr:
        for j, a in enumerate(aggs):
            if e == a:
                return ColName(f"_a{j}")
        for j, (_, ke) in enumerate(keys):
            if e == ke:
                return ColName(f"_k{j}")
        if isinstance(e, BinOp):
            return BinOp(e.op, substitute(e.left), substitute(e.right))
        if isinstance(e, UnaryOp):
            return UnaryOp(e.op, substitute(e.expr))
        if isinstance(e, Call):
            return Call(e.func, tuple(substitute(a) for a in e.args))
        if isinstance(e, ColName) and e.name not in grouped.columns:
            raise QueryError(
                f"Cannot select `{e.name}`: not part of the (implicit) GROUP BY"
            )
        return e

    out_cols = [
        final_comp.compile(substitute(s.expr)).alias(f"_c{i}")
        for i, s in enumerate(select)
    ]

    sort_cols: list[Column] = []
    explicit_sort = bool(order_by)
    for o in order_by:
        match = next((i for i, s in enumerate(select) if s.expr == o.expr), None)
        if match is None:
            match = next(
                (i for i, s in enumerate(select)
                 if s.alias and o.expr == ColName(s.alias)),
                None,
            )
        if match is not None:
            sort_cols.append(_sort_col(F.col(f"_c{match}"), o.descending))
        else:
            sort_cols.append(
                _sort_col(final_comp.compile(substitute(o.expr)), o.descending)
            )
    if not explicit_sort:
        # Grouped results come back ordered by group key (order-preserving
        # merges in the reference, query.rs:364-402).
        sort_cols = [
            _sort_col(F.col(f"_c{i}"), False) for i, _ in keys
        ]

    df = grouped.select(*out_cols)
    if sort_cols:
        df = df.orderBy(*sort_cols)
    df = _apply_limit(df, q)
    names = _output_names(select)
    df = df.toDF(*_dedupe(names))
    return CompiledQuery(df, names)


def _dedupe(names: list[str]) -> list[str]:
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out
