"""Expression AST for the LocustDB SQL dialect.

Mirrors the *surface* of the reference grammar (reference:
src/syntax/expression.rs:7-13 — ColName / Const / Func1 / Func2 / Aggregate),
but is our own design: a small tagged-union tree that the planner walks to
split implicit group-by queries into (keys, aggregates, final-pass exprs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

Literal = Union[int, float, str, None]

AGGREGATE_FUNCS = {"count", "sum", "min", "max", "avg"}
SCALAR_FUNCS = {"to_year", "regex", "length", "floor", "not"}


@dataclass(frozen=True)
class ColName:
    name: str


@dataclass(frozen=True)
class Lit:
    value: Literal


@dataclass(frozen=True)
class UnaryOp:
    op: str  # '-', 'not', 'isnull', 'isnotnull'
    expr: "Expr"


@dataclass(frozen=True)
class BinOp:
    op: str  # + - * / % = <> < <= > >= and or like notlike
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Call:
    func: str  # lower-cased function name
    args: tuple["Expr", ...]
    # function name as written in the source (case preserved) — only used
    # when echoing the expression back as a result column name, so it is
    # excluded from equality/hashing (two-phase planning dedups aggregate
    # calls by value)
    src_name: Optional[str] = field(default=None, compare=False)

    @property
    def is_aggregate(self) -> bool:
        return self.func in AGGREGATE_FUNCS


Expr = Union[ColName, Lit, UnaryOp, BinOp, Call]


@dataclass
class SelectItem:
    expr: Expr
    alias: Optional[str] = None


@dataclass
class OrderByItem:
    expr: Expr
    descending: bool = False


@dataclass
class Query:
    """Parsed single-table query (reference: src/syntax/parser.rs Query)."""

    select: list[SelectItem] = field(default_factory=list)
    table: str = ""
    filter: Optional[Expr] = None
    order_by: list[OrderByItem] = field(default_factory=list)
    limit: Optional[int] = None  # None == unlimited (reference: u64::MAX)
    offset: int = 0
    select_star: bool = False


def walk(e: Expr):
    """Pre-order traversal of an expression tree."""
    yield e
    if isinstance(e, UnaryOp):
        yield from walk(e.expr)
    elif isinstance(e, BinOp):
        yield from walk(e.left)
        yield from walk(e.right)
    elif isinstance(e, Call):
        for a in e.args:
            yield from walk(a)


def contains_aggregate(e: Expr) -> bool:
    return any(isinstance(n, Call) and n.is_aggregate for n in walk(e))


def referenced_columns(e: Expr) -> set[str]:
    return {n.name for n in walk(e) if isinstance(n, ColName)}
