"""Solr streaming expressions compiled to Spark DataFrame plans.

The reference's Solr exposes /stream: a functional dataflow language
(``search``/``select``/``innerJoin``/``rollup``/``top``/...) that Solr
executes as a pipelined tuple-stream graph across the cluster. That
model IS Spark's model — so here each expression parses to an AST and
compiles 1:1 to a *lazy* DataFrame plan: Catalyst sees the whole
dataflow (joins reorder, filters push down, aggregates go two-phase)
instead of an opaque tuple iterator chain. Nothing materializes until
the caller acts on the returned DataFrame.

Supported decorators (Solr stream/decorator reference):
  * ``search(col, q=, fl=, sort=, rows=)`` — delegated to the engine
    via a provider callback (collection name is accepted and ignored;
    this engine is the collection),
  * ``select(s, "a", "b as c", ...)`` — projection/rename,
  * ``innerJoin / leftOuterJoin / hashJoin(s1, s2|hashed=s2, on=)`` —
    equi-joins; ``hashJoin`` broadcasts the hashed side (Solr holds it
    in memory — same intent),
  * ``rollup(s, over=, sum(f)/avg(f)/min(f)/max(f)/count(*))`` — group
    aggregate; output fields keep Solr's literal names (``sum(f)``),
  * ``sort(s, by=)``, ``top(s, n=, sort=)`` — global sort / top-k
    (top compiles to sort+limit = TakeOrderedAndProject),
  * ``unique(s, over=)`` — one row per key; PINNED divergence: Solr
    emits the first tuple of its sorted input, this engine emits the
    per-key MIN of every other column (deterministic without a sort
    contract),
  * ``merge(s1, s2, on=)`` — union + sort on the merge key,
  * ``intersect(s1, s2, on=)`` / ``complement(s1, s2, on=)`` — left
    semi / anti join on the key,
  * ``having(s, eq/gt/lt/gteq/lteq(field, val) | and/or/not(...))`` —
    filter over (possibly aggregate-named) fields,
  * ``fetch(col, s, fl=, on=)`` — enrich a stream with extra stored
    fields through the provider.

Numeric coercion is pinned: aggregate/comparison operands try_cast to
double at use (stream tuples carry metadata values as raw strings).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamExprError(ValueError):
    """Bad streaming expression (syntax or unsupported decorator)."""


@dataclass(frozen=True)
class Str:
    value: str


@dataclass(frozen=True)
class Num:
    value: float


@dataclass
class Node:
    name: str
    args: list = dc_field(default_factory=list)      # Node | Str | Num
    params: dict = dc_field(default_factory=dict)    # str -> Str|Num|Node


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<ident>[A-Za-z_][A-Za-z0-9_.\-]*) |
        (?P<str>"(?:[^"\\]|\\.)*") |
        (?P<num>-?[0-9]+(?:\.[0-9]+)?) |
        (?P<star>\*) |
        (?P<punct>[(),=])
    )""",
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise StreamExprError(f"cannot lex expression at: {s[i:i+30]!r}")
        i = m.end()
        for kind in ("ident", "str", "num", "star", "punct"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None):
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise StreamExprError(
                f"expected {value or kind}, got {v!r}"
            )
        return v

    def parse_expr(self) -> Node:
        k, name = self.next()
        if k != "ident":
            raise StreamExprError(f"expected expression name, got {name!r}")
        self.expect("punct", "(")
        node = Node(name)
        if self.peek() != ("punct", ")"):
            while True:
                node_arg = self.parse_arg()
                if isinstance(node_arg, tuple):
                    key, val = node_arg
                    if key in node.params:
                        raise StreamExprError(
                            f"duplicate parameter {key!r} in {name}()"
                        )
                    node.params[key] = val
                else:
                    node.args.append(node_arg)
                k, v = self.peek()
                if (k, v) == ("punct", ","):
                    self.next()
                    continue
                break
        self.expect("punct", ")")
        return node

    def parse_arg(self):
        k, v = self.peek()
        if k == "str":
            self.next()
            return Str(_unquote(v))
        if k == "num":
            self.next()
            return Num(float(v))
        if k == "star":
            self.next()
            return Str("*")
        if k == "ident":
            nk, nv = self.toks[self.i + 1]
            if (nk, nv) == ("punct", "="):
                self.next()
                self.next()
                ak, av = self.next()
                if ak == "str":
                    return (v, Str(_unquote(av)))
                if ak == "num":
                    return (v, Num(float(av)))
                if ak == "ident":
                    if self.peek() == ("punct", "("):
                        self.i -= 1
                        return (v, self.parse_expr())
                    return (v, Str(av))
                raise StreamExprError(
                    f"bad value for parameter {v!r}: {av!r}"
                )
            if (nk, nv) == ("punct", "("):
                return self.parse_expr()
            self.next()
            return Str(v)
        raise StreamExprError(f"unexpected token {v!r}")


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def parse_stream_expr(expr: str) -> Node:
    if not isinstance(expr, str) or not expr.strip():
        raise StreamExprError("expression must be a non-empty string")
    p = _Parser(_lex(expr))
    node = p.parse_expr()
    if p.peek()[0] != "eof":
        raise StreamExprError(
            f"trailing input after expression: {p.peek()[1]!r}"
        )
    return node


# -- compiler -----------------------------------------------------------------

_AGG_FNS = ("sum", "avg", "min", "max", "count")


def _want_str(node: Node, key: str, default: str | None = None) -> str:
    v = node.params.get(key)
    if v is None:
        if default is not None:
            return default
        raise StreamExprError(f"{node.name}() needs {key}=")
    if isinstance(v, Str):
        return v.value
    if isinstance(v, Num):
        return str(int(v.value) if v.value == int(v.value) else v.value)
    raise StreamExprError(f"{node.name}(): {key}= must be a string")


def _sort_cols(spec: str) -> list:
    cols = []
    for part in spec.split(","):
        bits = part.split()
        if not bits or len(bits) > 2:
            raise StreamExprError(f"bad sort spec {spec!r}")
        name = bits[0]
        direction = bits[1].lower() if len(bits) == 2 else "asc"
        if direction not in ("asc", "desc"):
            raise StreamExprError(f"bad sort direction in {spec!r}")
        c = F.col(name)
        cols.append(c.desc() if direction == "desc" else c.asc())
    return cols


def _on_pairs(spec: str) -> list[tuple[str, str]]:
    pairs = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            raise StreamExprError(f"bad on= spec {spec!r}")
        left, eq, right = part.partition("=")
        pairs.append((left.strip(), right.strip() if eq else left.strip()))
    return pairs


def _join(left: DataFrame, right: DataFrame, on: str, how: str,
          broadcast_right: bool = False) -> DataFrame:
    pairs = _on_pairs(on)
    if broadcast_right:
        right = F.broadcast(right)
    if all(l == r for l, r in pairs):
        return left.join(right, [l for l, _ in pairs], how)
    lt, rt = left.alias("_l"), right.alias("_r")
    cond = None
    for l, r in pairs:
        c = F.col(f"_l.{l}") == F.col(f"_r.{r}")
        cond = c if cond is None else (cond & c)
    out = lt.join(rt, cond, how)
    # drop the right-side join keys (Solr emits one field per name)
    for _, r in pairs:
        out = out.drop(F.col(f"_r.{r}"))
    return out


def _agg_col(node: Node):
    if node.name not in _AGG_FNS:
        raise StreamExprError(
            f"rollup(): unsupported aggregate {node.name}()"
        )
    if len(node.args) != 1 or node.params:
        raise StreamExprError(f"{node.name}() takes exactly one field")
    arg = node.args[0]
    if not isinstance(arg, Str):
        raise StreamExprError(f"{node.name}(): bad field argument")
    fname = arg.value
    label = f"{node.name}({fname})"
    if node.name == "count":
        if fname != "*":
            raise StreamExprError("count() supports only count(*)")
        return F.count(F.lit(1)).alias(label)
    col = F.col(fname).try_cast("double")
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[node.name]
    return fn(col).alias(label)


_CMP = {"eq": "==", "gt": ">", "lt": "<", "gteq": ">=", "lteq": "<="}


def _having_cond(node: Node):
    if node.name in ("and", "or"):
        if len(node.args) < 2:
            raise StreamExprError(f"{node.name}() needs two conditions")
        conds = [_having_cond(a) for a in node.args]
        out = conds[0]
        for c in conds[1:]:
            out = (out & c) if node.name == "and" else (out | c)
        return out
    if node.name == "not":
        if len(node.args) != 1:
            raise StreamExprError("not() takes one condition")
        return ~_having_cond(node.args[0])
    if node.name not in _CMP:
        raise StreamExprError(
            f"having(): unsupported condition {node.name}()"
        )
    if len(node.args) != 2:
        raise StreamExprError(f"{node.name}() takes (field, value)")
    fld, val = node.args
    if isinstance(fld, Node) and fld.name in _AGG_FNS:
        # allow eq(sum(size), 5) naming the rollup output field
        fa = fld.args[0].value if fld.args else ""
        fld = Str(f"{fld.name}({fa})")
    if not isinstance(fld, Str):
        raise StreamExprError(f"{node.name}(): bad field")
    if isinstance(val, Num):
        left = F.col(fld.value).try_cast("double")
        rv = F.lit(val.value)
    elif isinstance(val, Str):
        left = F.col(fld.value)
        rv = F.lit(val.value)
    else:
        raise StreamExprError(f"{node.name}(): bad value")
    op = _CMP[node.name]
    if op == "==":
        return left == rv
    if op == ">":
        return left > rv
    if op == "<":
        return left < rv
    if op == ">=":
        return left >= rv
    return left <= rv


def compile_stream(
    node: Node,
    search_provider: Callable[[Node], DataFrame],
) -> DataFrame:
    """Compile a parsed streaming expression to a lazy DataFrame.
    ``search_provider`` resolves ``search(...)`` / ``fetch`` field
    lookups against the engine's index."""

    def comp(n) -> DataFrame:
        if not isinstance(n, Node):
            raise StreamExprError(f"expected a stream, got {n!r}")
        name = n.name
        if name == "search":
            return search_provider(n)
        if name == "select":
            src = comp(n.args[0] if n.args else None)
            if len(n.args) < 2:
                raise StreamExprError("select() needs field arguments")
            cols = []
            for a in n.args[1:]:
                if not isinstance(a, Str):
                    raise StreamExprError("select(): bad field argument")
                m = re.fullmatch(
                    r"(\S+)(?:\s+as\s+(\S+))?", a.value.strip(),
                    re.IGNORECASE,
                )
                if not m:
                    raise StreamExprError(
                        f"select(): bad field spec {a.value!r}"
                    )
                src_name, alias = m.group(1), m.group(2)
                c = F.col(src_name)
                cols.append(c.alias(alias) if alias else c)
            return src.select(*cols)
        if name in ("innerJoin", "leftOuterJoin", "hashJoin"):
            how = "left_outer" if name == "leftOuterJoin" else "inner"
            if name == "hashJoin":
                if len(n.args) != 1 or "hashed" not in n.params:
                    raise StreamExprError(
                        "hashJoin(stream, hashed=stream, on=...)"
                    )
                left, right = comp(n.args[0]), comp(n.params["hashed"])
                bc = True
            else:
                if len(n.args) != 2:
                    raise StreamExprError(f"{name}() takes two streams")
                left, right = comp(n.args[0]), comp(n.args[1])
                bc = False
            return _join(left, right, _want_str(n, "on"), how,
                         broadcast_right=bc)
        if name == "rollup":
            src = comp(n.args[0] if n.args else None)
            over = [s.strip() for s in _want_str(n, "over").split(",")]
            aggs = [_agg_col(a) for a in n.args[1:]
                    if isinstance(a, Node)]
            if not aggs:
                raise StreamExprError("rollup() needs aggregates")
            return src.groupBy(*over).agg(*aggs)
        if name == "sort":
            src = comp(n.args[0] if n.args else None)
            return src.orderBy(*_sort_cols(_want_str(n, "by")))
        if name == "top":
            src = comp(n.args[0] if n.args else None)
            nv = n.params.get("n")
            if not isinstance(nv, Num) or nv.value <= 0 or \
                    nv.value != int(nv.value):
                raise StreamExprError("top() needs a positive integer n=")
            return src.orderBy(
                *_sort_cols(_want_str(n, "sort"))
            ).limit(int(nv.value))
        if name == "unique":
            src = comp(n.args[0] if n.args else None)
            over = [s.strip() for s in _want_str(n, "over").split(",")]
            others = [c for c in src.columns if c not in over]
            if not others:
                return src.distinct()
            return src.groupBy(*over).agg(
                *[F.min(c).alias(c) for c in others]
            ).select(*src.columns)
        if name == "merge":
            if len(n.args) != 2:
                raise StreamExprError("merge() takes two streams")
            left, right = comp(n.args[0]), comp(n.args[1])
            return left.unionByName(right).orderBy(
                *_sort_cols(_want_str(n, "on"))
            )
        if name in ("intersect", "complement"):
            if len(n.args) != 2:
                raise StreamExprError(f"{name}() takes two streams")
            left, right = comp(n.args[0]), comp(n.args[1])
            how = "left_semi" if name == "intersect" else "left_anti"
            return _join(left, right, _want_str(n, "on"), how)
        if name == "having":
            src = comp(n.args[0] if n.args else None)
            if len(n.args) != 2 or not isinstance(n.args[1], Node):
                raise StreamExprError("having(stream, condition)")
            return src.where(_having_cond(n.args[1]))
        if name == "fetch":
            # fetch(collection, stream, fl=..., on=key) — provider
            # builds the stored-fields frame, we join it on the key
            if len(n.args) != 2:
                raise StreamExprError("fetch(collection, stream, ...)")
            src = comp(n.args[1])
            lookup = search_provider(
                Node("_fetch", [], dict(n.params))
            )
            return _join(src, lookup, _want_str(n, "on"), "left_outer")
        raise StreamExprError(f"unsupported stream decorator {name}()")

    return comp(node)
