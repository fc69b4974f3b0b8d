"""Solr JSON Facet API — nested buckets + per-bucket aggregations.

The reference exposes its index through Solr, whose JSON Facet API
(``json.facet={...}``) supersedes flat ``facet.field``/``facet.pivot``
with a recursive spec: *terms*/*range*/*query* bucket facets carrying
per-bucket statistics (``"avg_len": "avg(n-chars)"``) and arbitrarily
nested sub-facets, with buckets sortable by any sibling statistic
(``"sort": {"avg_len": "desc"}``).

This module is the spec side: validation/parsing into a small AST and
the stat-expression compiler (one Catalyst aggregate ``Column`` per
statistic). The engine side (``ExtractorEngine.json_facets``) walks the
AST and runs ONE distributed aggregate job per bucket node — the same
deepest-level-window-prune shape as ``pivot_facets`` — so the driver
only ever materializes bucket rows (≤ the product of the limits along a
path), never match sets.

Pinned semantics vs Solr:
  * buckets are over the COLLAPSED metadata value: this engine joins
    array-valued metadata to one ', '-separated scalar at extract time
    (reference tasks.py:89-95 does the same before posting to Solr), so
    a doc with ``Lang: [python, java]`` lands in ONE bucket
    ``"python, java"`` — not one per value as a Solr multiValued field
    would,
  * numeric statistics read the field's (collapsed) value via
    ``try_cast(double)`` — non-numeric reads null and drops out of the
    aggregate,
  * ``percentile`` is the exact linearly-interpolated quantile
    (Spark ``percentile`` == DuckDB ``quantile_cont``; Solr's is a
    t-digest approximation),
  * buckets sorted by a statistic put null-stat buckets last.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column
from pyspark.sql import functions as F


class JsonFacetError(ValueError):
    """Invalid json.facet spec (bad shape, unknown type/function)."""


_STAT_RE = re.compile(
    r"^\s*(sum|avg|min|max|unique|percentile)\s*\(\s*"
    r"([A-Za-z0-9_.-]+)\s*(?:,\s*([0-9]+(?:\.[0-9]+)?)\s*)?\)\s*$"
)

_FIELD_RE = re.compile(r"^[A-Za-z0-9_.-]+$")


@dataclass(frozen=True)
class StatAgg:
    fn: str               # sum | avg | min | max | unique | percentile
    field: str
    p: float | None = None  # percentile fraction in (0, 1]


@dataclass(frozen=True)
class QueryFacet:
    q: str


@dataclass
class BucketFacet:
    kind: str             # terms | range
    field: str
    limit: int = 10       # terms only; -1 = unlimited
    mincount: int = 1     # terms default 1, range default 0
    sort_key: str = "count"   # count | index | <sibling stat name>
    sort_dir: str = "desc"
    start: float | None = None  # range only
    end: float | None = None
    gap: float | None = None
    stats: dict[str, StatAgg] = dc_field(default_factory=dict)
    queries: dict[str, QueryFacet] = dc_field(default_factory=dict)
    buckets: dict[str, "BucketFacet"] = dc_field(default_factory=dict)


@dataclass
class FacetSet:
    stats: dict[str, StatAgg] = dc_field(default_factory=dict)
    queries: dict[str, QueryFacet] = dc_field(default_factory=dict)
    buckets: dict[str, BucketFacet] = dc_field(default_factory=dict)


def parse_stat(expr: str) -> StatAgg:
    m = _STAT_RE.match(expr)
    if not m:
        raise JsonFacetError(
            f"bad statistic {expr!r}: expected "
            "sum|avg|min|max|unique(<field>) or percentile(<field>, <pct>)"
        )
    fn, fld, arg = m.group(1), m.group(2), m.group(3)
    if fn == "percentile":
        if arg is None:
            raise JsonFacetError(
                f"percentile needs a percent argument: {expr!r}"
            )
        pct = float(arg)
        if not 0.0 < pct <= 100.0:
            raise JsonFacetError(
                f"percentile percent must be in (0, 100], got {pct}"
            )
        return StatAgg("percentile", fld, pct / 100.0)
    if arg is not None:
        raise JsonFacetError(f"{fn} takes exactly one argument: {expr!r}")
    return StatAgg(fn, fld)


def _require_name(name: object) -> str:
    if not isinstance(name, str) or not name.strip():
        raise JsonFacetError(f"facet names must be non-empty strings,"
                             f" got {name!r}")
    if name == "count" or name == "val" or name == "buckets":
        raise JsonFacetError(
            f"facet name {name!r} collides with a reserved response key"
        )
    return name


def _parse_node(name: str, node: object, depth: int) -> object:
    if isinstance(node, str):
        return parse_stat(node)
    if not isinstance(node, dict):
        raise JsonFacetError(
            f"facet {name!r} must be a statistic string or an object,"
            f" got {type(node).__name__}"
        )
    kind = node.get("type")
    if kind == "query":
        q = node.get("q")
        if not isinstance(q, str) or not q.strip():
            raise JsonFacetError(f"query facet {name!r} needs a"
                                 f" non-empty 'q' string")
        extra = set(node) - {"type", "q"}
        if extra:
            raise JsonFacetError(
                f"query facet {name!r} has unsupported keys {sorted(extra)}"
            )
        return QueryFacet(q)
    if kind not in ("terms", "range"):
        raise JsonFacetError(
            f"facet {name!r}: type must be terms|range|query, got {kind!r}"
        )
    if depth > 4:
        raise JsonFacetError("facet nesting deeper than 4 levels")
    fld = node.get("field")
    if not isinstance(fld, str) or not _FIELD_RE.match(fld):
        raise JsonFacetError(f"facet {name!r} needs a valid 'field',"
                             f" got {fld!r}")
    out = BucketFacet(kind=kind, field=fld)
    allowed = {"type", "field", "mincount", "facet"}
    if kind == "terms":
        allowed |= {"limit", "sort"}
        limit = node.get("limit", 10)
        if isinstance(limit, bool) or not isinstance(limit, int) or (
            limit <= 0 and limit != -1
        ):
            raise JsonFacetError(
                f"facet {name!r}: limit must be a positive int or -1,"
                f" got {limit!r}"
            )
        out.limit = limit
        out.mincount = node.get("mincount", 1)
    else:
        for key in ("start", "end", "gap"):
            v = node.get(key)
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise JsonFacetError(
                    f"range facet {name!r} needs numeric '{key}'"
                )
            setattr(out, key, float(v))
        if out.gap <= 0 or out.end <= out.start:
            raise JsonFacetError(
                f"range facet {name!r}: need gap > 0 and end > start"
            )
        n_buckets = int((out.end - out.start) // out.gap) + 1
        if n_buckets > 10_000:
            raise JsonFacetError(
                f"range facet {name!r}: {n_buckets} buckets exceeds the"
                " 10000 bucket cap"
            )
        allowed |= {"start", "end", "gap"}
        out.mincount = node.get("mincount", 0)
    mc = out.mincount
    if isinstance(mc, bool) or not isinstance(mc, int) or mc < 0:
        raise JsonFacetError(
            f"facet {name!r}: mincount must be a non-negative int,"
            f" got {mc!r}"
        )
    extra = set(node) - allowed
    if extra:
        raise JsonFacetError(
            f"facet {name!r} has unsupported keys {sorted(extra)}"
        )
    sub = node.get("facet", {})
    if not isinstance(sub, dict):
        raise JsonFacetError(f"facet {name!r}: 'facet' must be an object")
    for sname, snode in sub.items():
        _require_name(sname)
        parsed = _parse_node(sname, snode, depth + 1)
        if isinstance(parsed, StatAgg):
            out.stats[sname] = parsed
        elif isinstance(parsed, QueryFacet):
            out.queries[sname] = parsed
        else:
            out.buckets[sname] = parsed
    sort = node.get("sort", "count")
    if kind == "terms":
        if isinstance(sort, str):
            if sort not in ("count", "index"):
                raise JsonFacetError(
                    f"facet {name!r}: string sort must be 'count' or"
                    f" 'index', got {sort!r}"
                )
            out.sort_key = sort
            out.sort_dir = "desc" if sort == "count" else "asc"
        elif isinstance(sort, dict) and len(sort) == 1:
            (key, direction), = sort.items()
            if direction not in ("asc", "desc"):
                raise JsonFacetError(
                    f"facet {name!r}: sort direction must be asc|desc,"
                    f" got {direction!r}"
                )
            if key not in ("count", "index") and key not in out.stats:
                raise JsonFacetError(
                    f"facet {name!r}: sort key {key!r} is not a sibling"
                    " statistic"
                )
            out.sort_key = key
            out.sort_dir = direction
        else:
            raise JsonFacetError(
                f"facet {name!r}: sort must be 'count'|'index' or"
                " {stat: asc|desc}"
            )
    return out


def parse_facet_spec(spec: object) -> FacetSet:
    """Validate + parse a json.facet spec dict into a :class:`FacetSet`.

    Raises :class:`JsonFacetError` on any malformed shape; nothing
    touches Spark here."""
    if not isinstance(spec, dict) or not spec:
        raise JsonFacetError(
            f"json.facet spec must be a non-empty object, got {spec!r}"
        )
    out = FacetSet()
    for name, node in spec.items():
        _require_name(name)
        parsed = _parse_node(name, node, 1)
        if isinstance(parsed, StatAgg):
            out.stats[name] = parsed
        elif isinstance(parsed, QueryFacet):
            out.queries[name] = parsed
        else:
            out.buckets[name] = parsed
    return out


def referenced_stat_fields(fs: FacetSet) -> tuple[set[str], set[str]]:
    """(numeric fields, string fields) any statistic (at any depth)
    reads — the narrowing sets for the metadata pivot. Numeric:
    sum/avg/min/max/percentile stats and range-facet bucket fields
    (read as try_cast double). String: ``unique`` counts distinct RAW
    values, so a string field like ``lang`` works."""
    num: set[str] = set()
    raw: set[str] = set()

    def walk_stats(stats: dict[str, StatAgg]) -> None:
        for s in stats.values():
            (raw if s.fn == "unique" else num).add(s.field)

    def walk_bucket(b: BucketFacet) -> None:
        walk_stats(b.stats)
        if b.kind == "range":
            num.add(b.field)
        for sb in b.buckets.values():
            walk_bucket(sb)

    walk_stats(fs.stats)
    for b in fs.buckets.values():
        walk_bucket(b)
    return num, raw


def referenced_queries(fs: FacetSet) -> list[str]:
    """Every distinct query-facet q (any depth), in first-seen order —
    each becomes ONE match-flag column on the wide frame."""
    seen: dict[str, None] = {}

    def walk(queries: dict[str, QueryFacet],
             buckets: dict[str, BucketFacet]) -> None:
        for qf in queries.values():
            seen.setdefault(qf.q)
        for b in buckets.values():
            walk(b.queries, b.buckets)

    walk(fs.queries, fs.buckets)
    return list(seen)


def stat_column(s: StatAgg, col: Column) -> Column:
    """Compile one statistic to a Catalyst aggregate Column over the
    (already numeric) per-doc field column."""
    if s.fn == "sum":
        return F.sum(col)
    if s.fn == "avg":
        return F.avg(col)
    if s.fn == "min":
        return F.min(col)
    if s.fn == "max":
        return F.max(col)
    if s.fn == "unique":
        return F.count_distinct(col)
    if s.fn == "percentile":
        return F.percentile(col, F.lit(s.p))
    raise AssertionError(s.fn)
