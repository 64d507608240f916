"""Tags-filter expression DSL compiled to Catalyst Column predicates.

Grammar (reference /root/reference/src/util.cpp:115-200,
man/osmium-tags-filter.md:61-131):

  expression := [TYPES '/'] matcher
  TYPES      := subset of 'n','w','r','a'  (default: nwr)
  matcher    := key | key '=' value | key '!=' value
  string     := '*'            (always true)
              | 'a,b,c'        (list, exact members)
              | 'pre*'         (prefix)
              | '*sub' | '*sub*'  (substring)
              | 'text'         (equal)

Key and value are independently matched strings. ``key!=value`` keeps
objects that HAVE a tag whose key matches but whose value does NOT
(osmium::TagMatcher invert semantics).

The 'a' pseudo-type matches *area-like* objects: closed ways with >= 4 nodes
(command_tags_filter.cpp:207-212 via matches_way) and relations with
type=multipolygon or type=boundary (:216-231).

Everything compiles to built-in higher-order map/array functions —
JVM-side, whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import NODE, RELATION, WAY


def _strip(s: str) -> str:
    return s.strip(" ")


@dataclass(frozen=True)
class StringMatcher:
    kind: str  # always | equal | list | prefix | substring
    arg: tuple

    @classmethod
    def parse(cls, s: str) -> "StringMatcher":
        s = _strip(s)
        if s == "*":
            return cls("always", ())
        if not s or (not s.endswith("*") and not s.startswith("*")):
            if "," not in s:
                return cls("equal", (s,))
            return cls("list", tuple(_strip(p) for p in s.split(",")))
        if s.endswith("*") and not s.startswith("*"):
            return cls("prefix", (s[:-1],))
        body = s[1:]
        if body.endswith("*"):
            body = body[:-1]
        return cls("substring", (body,))

    def col(self, c: Column) -> Column:
        if self.kind == "always":
            return F.lit(True)
        if self.kind == "equal":
            return c == F.lit(self.arg[0])
        if self.kind == "list":
            return c.isin(list(self.arg))
        if self.kind == "prefix":
            return c.startswith(self.arg[0])
        return c.contains(self.arg[0])

    def matches_str(self, s: str) -> bool:
        """Driver-side (Python) evaluation — used to resolve key matchers
        against a *column-backed* tag schema at plan time."""
        if self.kind == "always":
            return True
        if self.kind == "equal":
            return s == self.arg[0]
        if self.kind == "list":
            return s in self.arg
        if self.kind == "prefix":
            return s.startswith(self.arg[0])
        return self.arg[0] in s


@dataclass(frozen=True)
class TagMatcher:
    key: StringMatcher
    value: StringMatcher | None
    invert: bool  # key!=value

    @classmethod
    def parse(cls, expr: str) -> "TagMatcher":
        pos = expr.find("=")
        if pos == -1:
            return cls(StringMatcher.parse(expr), None, False)
        key = expr[:pos]
        value = expr[pos + 1 :]
        invert = False
        if key.endswith("!"):
            key = key[:-1]
            invert = True
        return cls(StringMatcher.parse(key), StringMatcher.parse(value), invert)

    def col(self, tags: Column) -> Column:
        """True iff any tag (k,v) matches."""
        if self.value is None:
            if self.key.kind == "equal":
                # fast path: map lookup, no lambda
                return tags.getItem(self.key.arg[0]).isNotNull()
            return F.exists(F.map_keys(tags), lambda k: self.key.col(k))
        if self.invert:
            # object must HAVE a matching key whose value does NOT match
            pred = lambda k, v: self.key.col(k) & ~self.value.col(v)  # noqa: E731
        else:
            pred = lambda k, v: self.key.col(k) & self.value.col(v)  # noqa: E731
        entries = F.map_filter(tags, pred)
        return F.size(F.map_keys(entries)) > 0


def parse_types(prefix: str) -> set[str]:
    types = set()
    for ch in prefix:
        if ch not in "nwra":
            raise ValueError(f"Unknown object type '{ch}' (allowed are 'n', 'w', 'r', and 'a').")
        types.add(ch)
    return types


@dataclass(frozen=True)
class FilterExpression:
    types: frozenset  # of 'n','w','r','a'
    matcher: TagMatcher

    @classmethod
    def parse(cls, expr: str) -> "FilterExpression":
        pos = expr.find("/")
        if pos == -1:
            return cls(frozenset("nwr"), TagMatcher.parse(expr))
        if pos == 0:
            return cls(frozenset("nwr"), TagMatcher.parse(expr[1:]))
        return cls(frozenset(parse_types(expr[:pos])), TagMatcher.parse(expr[pos + 1 :]))


def area_way_col(refs: Column) -> Column:
    """Closed way with >= 4 nodes (tags-filter 'a' rule for ways)."""
    return (F.size(refs) >= 4) & (refs.getItem(0) == F.element_at(refs, -1))


def area_relation_col(tags: Column) -> Column:
    """type=multipolygon or type=boundary (tags-filter 'a' rule for rels)."""
    return tags.getItem("type").isin("multipolygon", "boundary")


class CompiledFilter:
    """Per-entity-type disjunctive filter banks compiled from expressions.

    Mirrors CommandTagsFilter::add_filter / matches_* in
    /root/reference/src/command_tags_filter.cpp:46-64,203-245.
    """

    def __init__(self, expressions: list[str]):
        self.expressions = [FilterExpression.parse(e) for e in expressions]
        self.banks: dict[str, list[TagMatcher]] = {"n": [], "w": [], "r": [], "a": []}
        for fe in self.expressions:
            for t in fe.types:
                self.banks[t].append(fe.matcher)

    def _any(self, matchers: list[TagMatcher], tags: Column) -> Column:
        if not matchers:
            return F.lit(False)
        col = matchers[0].col(tags)
        for m in matchers[1:]:
            col = col | m.col(tags)
        return col

    def matches_node(self, tags: Column) -> Column:
        return self._any(self.banks["n"], tags)

    def matches_node_columns(self, colmap: dict[str, Column]) -> Column:
        """Compile the node bank against a COLUMN-BACKED tag schema.

        When tags are virtual (each tag key is a physical column, as on the
        image table where 'fmt'/'caption' ARE columns), compiling the
        predicate against the columns instead of a materialized map lets
        Catalyst push it into the scan (PushedFilters) and skips the
        per-row map construction entirely — the hot-path form of
        tags-filter for the image graft. Key matchers resolve against the
        known key set at PLAN time (driver-side)."""
        out = None
        for m in self.banks["n"]:
            keys = [k for k in colmap if m.key.matches_str(k)]
            for k in keys:
                c = colmap[k]
                if m.value is None:
                    cond = c.isNotNull()
                elif m.invert:
                    cond = c.isNotNull() & ~m.value.col(c)
                else:
                    # isNotNull keeps map semantics: `key=*` still requires
                    # the tag to EXIST (a NULL column = absent tag)
                    cond = c.isNotNull() & m.value.col(c)
                out = cond if out is None else (out | cond)
        return out if out is not None else F.lit(False)

    def matches_way(self, tags: Column, refs: Column) -> Column:
        c = self._any(self.banks["w"], tags)
        if self.banks["a"]:
            c = c | (area_way_col(refs) & self._any(self.banks["a"], tags))
        return c

    def matches_relation(self, tags: Column) -> Column:
        c = self._any(self.banks["r"], tags)
        if self.banks["a"]:
            c = c | (area_relation_col(tags) & self._any(self.banks["a"], tags))
        return c

    def matches_entity(self, type_col: Column, tags: Column, refs: Column) -> Column:
        return (
            F.when(type_col == NODE, self.matches_node(tags))
            .when(type_col == WAY, self.matches_way(tags, refs))
            .when(type_col == RELATION, self.matches_relation(tags))
            .otherwise(F.lit(False))
        )

    @property
    def has_way_or_area(self) -> bool:
        return bool(self.banks["w"] or self.banks["a"])

    @property
    def has_relation_or_area(self) -> bool:
        return bool(self.banks["r"] or self.banks["a"])
