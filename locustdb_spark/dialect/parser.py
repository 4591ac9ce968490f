"""Recursive-descent / Pratt parser for the LocustDB SQL dialect.

Grammar parity with the reference (src/syntax/parser.rs:15-57):
single-table ``SELECT <exprs> FROM <t> [WHERE e] [ORDER BY ...]
[LIMIT n [OFFSET m]]``.  Explicitly *rejected* constructs raise
``NotImplementedError`` with messages shaped like the reference's
``QueryError::NotImplemented`` (parser.rs:92-105): explicit GROUP BY
(grouping is implicit), HAVING, DISTINCT, JOIN, multiple tables.

This is a fresh implementation (the reference delegates to sqlparser-rs);
we hand-roll because the dialect is tiny and we need the expression tree
for the implicit-group-by rewrite anyway.
"""

from __future__ import annotations

import re

from .ast import (
    AGGREGATE_FUNCS,
    BinOp,
    Call,
    ColName,
    Expr,
    Lit,
    OrderByItem,
    Query,
    SelectItem,
    UnaryOp,
)


class QueryError(Exception):
    pass


class NotImplementedQueryError(QueryError):
    pass


class ParseError(QueryError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<qident>"[^"]+"|`[^`]+`)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.$]*)
  | (?P<op><>|!=|<=|>=|=|<|>|\+|-|\*|/|%|\(|\)|,|;)
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "select", "from", "where", "order", "by", "asc", "desc", "limit",
    "offset", "as", "and", "or", "not", "like", "is", "null", "group",
    "having", "distinct", "join", "inner", "left", "right", "outer", "on",
    "union", "intersect", "except",
}


class _Tok:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value):
        self.kind = kind  # kw | ident | int | float | string | op | eof
        self.value = value

    def __repr__(self):
        return f"{self.kind}:{self.value!r}"


def _tokenize(sql: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ParseError(f"Unexpected character {sql[pos]!r} at position {pos}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "float":
            toks.append(_Tok("float", float(text)))
        elif kind == "int":
            toks.append(_Tok("int", int(text)))
        elif kind == "string":
            toks.append(_Tok("string", text[1:-1].replace("''", "'")))
        elif kind == "qident":
            toks.append(_Tok("ident", text[1:-1]))
        elif kind == "ident":
            low = text.lower()
            if low in KEYWORDS:
                toks.append(_Tok("kw", low))
            else:
                toks.append(_Tok("ident", text))
        elif kind == "op":
            if text == ";":
                continue
            toks.append(_Tok("op", text))
    toks.append(_Tok("eof", None))
    return toks


# Binary operator precedence (higher binds tighter).
_PRECEDENCE = {
    "or": 1,
    "and": 2,
    "=": 4, "<>": 4, "<": 4, "<=": 4, ">": 4, ">=": 4,
    "like": 4, "notlike": 4,
    "+": 5, "-": 5,
    "*": 6, "/": 6, "%": 6,
}


class Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    # -- token helpers -------------------------------------------------
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, value=None) -> bool:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            self.i += 1
            return True
        return False

    def expect(self, kind: str, value=None) -> _Tok:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(f"Expected {value or kind}, got {t!r}")
        return t

    # -- entry ---------------------------------------------------------
    def parse(self) -> Query:
        self.expect("kw", "select")
        q = Query()
        q.select = self._select_list(q)
        self.expect("kw", "from")
        q.table = self._table_name()
        if self.accept("op", ","):
            raise NotImplementedQueryError("Selecting from multiple tables")
        if self.peek().kind == "kw" and self.peek().value in (
            "join", "inner", "left", "right", "outer",
        ):
            raise NotImplementedQueryError("JOIN")
        if self.accept("kw", "where"):
            q.filter = self._expr()
        if self.peek().kind == "kw" and self.peek().value == "group":
            raise NotImplementedQueryError(
                "Explicit GROUP BY. Every non-aggregate expression in the "
                "select clause is implicitly used for grouping."
            )
        if self.peek().kind == "kw" and self.peek().value == "having":
            raise NotImplementedQueryError("HAVING")
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            q.order_by = self._order_by_list()
        if self.accept("kw", "limit"):
            t = self.expect("int")
            q.limit = t.value
            if self.accept("kw", "offset"):
                q.offset = self.expect("int").value
                self._accept_rows_kw()
        elif self.accept("kw", "offset"):
            q.offset = self.expect("int").value
            self._accept_rows_kw()
        t = self.peek()
        if t.kind != "eof":
            if t.kind == "kw" and t.value in ("union", "intersect", "except"):
                raise NotImplementedQueryError(t.value.upper())
            raise ParseError(f"Unexpected trailing token {t!r}")
        return q

    def _accept_rows_kw(self) -> None:
        t = self.peek()
        if t.kind == "ident" and str(t.value).lower() in ("row", "rows"):
            self.next()

    # -- clauses -------------------------------------------------------
    def _select_list(self, q: Query) -> list[SelectItem]:
        if self.accept("kw", "distinct"):
            raise NotImplementedQueryError("DISTINCT")
        items: list[SelectItem] = []
        while True:
            if self.accept("op", "*"):
                q.select_star = True
            else:
                e = self._expr()
                alias = None
                if self.accept("kw", "as"):
                    t = self.next()
                    if t.kind not in ("ident", "string"):
                        raise ParseError(f"Bad alias {t!r}")
                    alias = t.value
                elif self.peek().kind == "ident":
                    alias = self.next().value
                items.append(SelectItem(e, alias))
            if not self.accept("op", ","):
                return items

    def _table_name(self) -> str:
        t = self.next()
        if t.kind == "ident":
            return t.value
        if t.kind == "string":
            return t.value
        raise ParseError(f"Expected table name, got {t!r}")

    def _order_by_list(self) -> list[OrderByItem]:
        items = []
        while True:
            e = self._expr()
            desc = False
            if self.accept("kw", "desc"):
                desc = True
            else:
                self.accept("kw", "asc")
            items.append(OrderByItem(e, desc))
            if not self.accept("op", ","):
                return items

    # -- expressions (Pratt) -------------------------------------------
    def _expr(self, min_prec: int = 0) -> Expr:
        left = self._unary()
        while True:
            t = self.peek()
            op = None
            if t.kind == "op" and t.value in _PRECEDENCE:
                op = "<>" if t.value == "!=" else t.value
            elif t.kind == "kw" and t.value in ("and", "or", "like"):
                op = t.value
            elif t.kind == "kw" and t.value == "is":
                # IS [NOT] NULL — postfix, binds tighter than AND/OR.
                if _PRECEDENCE["="] <= min_prec:
                    return left
                self.next()
                negate = self.accept("kw", "not")
                self.expect("kw", "null")
                left = UnaryOp("isnotnull" if negate else "isnull", left)
                continue
            elif t.kind == "kw" and t.value == "not":
                # NOT LIKE
                nxt = self.toks[self.i + 1]
                if nxt.kind == "kw" and nxt.value == "like":
                    op = "notlike"
                else:
                    return left
            if op is None:
                return left
            prec = _PRECEDENCE[op]
            if prec <= min_prec:
                return left
            self.next()
            if op == "notlike":
                self.next()  # consume LIKE
            right = self._expr(prec)
            left = BinOp(op, left, right)

    def _unary(self) -> Expr:
        t = self.peek()
        if t.kind == "op" and t.value == "-":
            self.next()
            inner = self._unary()
            if isinstance(inner, Lit) and isinstance(inner.value, (int, float)):
                return Lit(-inner.value)  # fold (reference query_plan.rs:1400-1404)
            return UnaryOp("-", inner)
        if t.kind == "kw" and t.value == "not":
            self.next()
            return UnaryOp("not", self._expr(_PRECEDENCE["and"]))
        return self._primary()

    def _primary(self) -> Expr:
        t = self.next()
        if t.kind == "int" or t.kind == "float":
            return Lit(t.value)
        if t.kind == "string":
            return Lit(t.value)
        if t.kind == "kw" and t.value == "null":
            return Lit(None)
        if t.kind == "op" and t.value == "(":
            e = self._expr()
            self.expect("op", ")")
            return e
        if t.kind == "ident":
            if self.peek().kind == "op" and self.peek().value == "(":
                return self._call(t.value)
            return ColName(t.value)
        raise ParseError(f"Unexpected token {t!r} in expression")

    def _call(self, name: str) -> Expr:
        func = name.lower()
        self.expect("op", "(")
        args: list[Expr] = []
        if not self.accept("op", ")"):
            while True:
                if self.accept("op", "*"):
                    # COUNT(*) == COUNT(1)
                    args.append(Lit(1))
                else:
                    args.append(self._expr())
                if self.accept("op", ")"):
                    break
                self.expect("op", ",")
        if func in AGGREGATE_FUNCS and len(args) != 1:
            raise NotImplementedQueryError(
                f"{func.upper()} with {len(args)} arguments"
            )
        return Call(func, tuple(args), src_name=name)


def parse(sql: str) -> Query:
    return Parser(sql).parse()
