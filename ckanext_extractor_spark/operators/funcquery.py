"""Solr function queries (value sources) compiled to Catalyst columns.

The reference exposes its index through Solr, where ``bf=``/``boost=``/
``{!func}`` accept a small expression language over stored fields
(Lucene ValueSource / FunctionValues; Solr "Function Queries" doc):
``recip(ms(NOW,created),3.16e-11,1,1)``-style freshness decay,
``product(popularity,2)`` boosts, ``if(exists(f),a,b)`` defaults.

This module is the Spark-native equivalent: a recursive-descent parser
for the function-call grammar (NO infix operators — Solr's language is
pure calls, so hyphenated field names like ``n-chars`` are unambiguous
identifiers) and a compiler to ONE Catalyst ``Column`` over caller-
resolved field columns. The whole boost stays inside whole-stage
codegen; nothing is evaluated per-row in Python.

Semantics pinned to Solr/Lucene:
  * a bare identifier is a field reference; missing / non-numeric
    values read as 0.0 (Lucene's FunctionValues default),
  * ``exists(f)`` is the boolean presence test,
  * ``if(test, a, b)`` treats a numeric test as ``!= 0``,
  * ``recip(x,m,a,b) = a/(m*x+b)``; division by zero yields 0.0 —
    a PINNED divergence from Lucene's DivFloatFunction (IEEE
    +-Infinity): Spark ANSI mode rejects divide-by-zero outright, an
    infinite boost is never a useful ranking signal, and 0.0 keeps the
    value SQL-oracle-portable (``CASE WHEN d = 0 THEN 0 ELSE n/d END``),
  * ``log`` is base 10 (Solr), ``ln`` natural.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


class FuncQuerySyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Lit:
    value: float


@dataclass(frozen=True)
class FieldRef:
    name: str


@dataclass(frozen=True)
class Call:
    fn: str
    args: tuple


_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<num>-?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.-]*)"
    r"|(?P<lpar>\()"
    r"|(?P<rpar>\))"
    r"|(?P<comma>,)"
    r")"
)

# (min_args, max_args); None = unbounded
_ARITIES: dict[str, tuple[int, int | None]] = {
    "sum": (2, None),
    "sub": (2, 2),
    "product": (2, None),
    "div": (2, 2),
    "min": (2, None),
    "max": (2, None),
    "abs": (1, 1),
    "log": (1, 1),
    "ln": (1, 1),
    "sqrt": (1, 1),
    "pow": (2, 2),
    "recip": (4, 4),
    "if": (3, 3),
    "exists": (1, 1),
    "field": (1, 1),
}


def _lex(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise FuncQuerySyntaxError(
                f"cannot lex function query at: {rest[:25]!r}"
            )
        pos = m.end()
        for kind in ("num", "ident", "lpar", "rpar", "comma"):
            tok = m.group(kind)
            if tok is not None:
                out.append((kind, tok))
                break
    return out


def parse_funcquery(text: str):
    """Parse a Solr function-query expression to an AST (Lit / FieldRef
    / Call). Unknown functions and wrong arities fail loudly at parse
    time — a typo'd boost must not silently score 0."""
    if not isinstance(text, str) or not text.strip():
        raise FuncQuerySyntaxError("empty function query")
    toks = _lex(text)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else ("eof", "")

    def take(kind: str) -> str:
        nonlocal pos
        k, v = peek()
        if k != kind:
            raise FuncQuerySyntaxError(
                f"expected {kind}, got {v!r} at token {pos}"
            )
        pos += 1
        return v

    def expr():
        nonlocal pos
        k, v = peek()
        if k == "num":
            pos += 1
            return Lit(float(v))
        if k == "ident":
            pos += 1
            if peek()[0] == "lpar":
                name = v.lower()
                if name not in _ARITIES:
                    raise FuncQuerySyntaxError(
                        f"unknown function {v!r} (supported: "
                        f"{', '.join(sorted(_ARITIES))})"
                    )
                take("lpar")
                args = [expr()]
                while peek()[0] == "comma":
                    take("comma")
                    args.append(expr())
                take("rpar")
                lo, hi = _ARITIES[name]
                if len(args) < lo or (hi is not None and len(args) > hi):
                    want = str(lo) if hi == lo else (
                        f"{lo}+" if hi is None else f"{lo}..{hi}"
                    )
                    raise FuncQuerySyntaxError(
                        f"{name}() takes {want} args, got {len(args)}"
                    )
                if name in ("exists", "field"):
                    if not isinstance(args[0], FieldRef):
                        raise FuncQuerySyntaxError(
                            f"{name}() takes a field name"
                        )
                return Call(name, tuple(args))
            return FieldRef(v)
        raise FuncQuerySyntaxError(f"unexpected token {v!r}")

    ast = expr()
    if pos != len(toks):
        raise FuncQuerySyntaxError(
            f"trailing input after expression: {toks[pos][1]!r}"
        )
    return ast


def referenced_fields(ast) -> set[str]:
    """Field names the expression reads — callers resolve exactly these
    (the metadata pivot stays as narrow as the expression)."""
    if isinstance(ast, FieldRef):
        return {ast.name}
    if isinstance(ast, Call):
        out: set[str] = set()
        for a in ast.args:
            out |= referenced_fields(a)
        return out
    return set()


def compile_funcquery(
    ast, field_col: Callable[[str], Column]
) -> Column:
    """Compile the AST to one Catalyst Column. ``field_col(name)``
    returns the (nullable double) column for a field; missing values
    read as 0.0 except under ``exists``."""

    def num(node) -> Column:
        if isinstance(node, Lit):
            return F.lit(node.value).cast("double")
        if isinstance(node, FieldRef):
            return F.coalesce(
                field_col(node.name).cast("double"), F.lit(0.0)
            )
        assert isinstance(node, Call)
        fn, args = node.fn, node.args
        if fn == "field":
            return F.coalesce(
                field_col(args[0].name).cast("double"), F.lit(0.0)
            )
        if fn == "exists":
            # numeric context: Solr's exists() is 1/0 when consumed
            # as a value
            return F.when(
                field_col(args[0].name).isNotNull(), F.lit(1.0)
            ).otherwise(F.lit(0.0))
        if fn == "if":
            return F.when(boolean(args[0]), num(args[1])).otherwise(
                num(args[2])
            )
        cols = [num(a) for a in args]
        if fn == "sum":
            out = cols[0]
            for c in cols[1:]:
                out = out + c
            return out
        if fn == "sub":
            return cols[0] - cols[1]
        if fn == "product":
            out = cols[0]
            for c in cols[1:]:
                out = out * c
            return out
        if fn == "div":
            return F.coalesce(F.try_divide(cols[0], cols[1]), F.lit(0.0))
        if fn == "min":
            return F.least(*cols)
        if fn == "max":
            return F.greatest(*cols)
        if fn == "abs":
            return F.abs(cols[0])
        if fn == "log":
            return F.log10(cols[0])
        if fn == "ln":
            return F.log(cols[0])
        if fn == "sqrt":
            return F.sqrt(cols[0])
        if fn == "pow":
            return F.pow(cols[0], cols[1])
        if fn == "recip":
            x, m, a, b = cols
            return F.coalesce(F.try_divide(a, m * x + b), F.lit(0.0))
        raise AssertionError(fn)

    def boolean(node) -> Column:
        if isinstance(node, Call) and node.fn == "exists":
            return field_col(node.args[0].name).isNotNull()
        return num(node) != F.lit(0.0)

    return num(ast)
