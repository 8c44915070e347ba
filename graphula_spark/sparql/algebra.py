"""SPARQL algebra nodes (the IR between parser and DataFrame compiler).

The reference delegates everything above BGPs to Jena ARQ's algebra
(sparql/.../Sparql.scala:41-52); these dataclasses are our own minimal
equivalent of ARQ's Op tree, covering the surface inventoried in
SURVEY.md §2.2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from graphula_spark.plans.bgp import TriplePattern


# ---- expressions -----------------------------------------------------
@dataclass
class EVar:
    name: str


@dataclass
class ELit:
    value: Any  # python str / int / float / bool
    lang: str | None = None
    datatype: str | None = None


@dataclass
class EIri:
    iri: str


@dataclass
class ECall:
    func: str  # uppercase function name or operator symbol
    args: list


@dataclass
class EExists:
    group: "GroupGraphPattern"
    negated: bool = False


@dataclass
class EAggregate:
    func: str  # COUNT/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT
    expr: Any | None  # None for COUNT(*)
    distinct: bool = False
    separator: str = " "
    #: GROUP_CONCAT(e; ORDER BY k [ASC|DESC]; ...) — ARQ-style ordered
    #: concatenation (SPARQL 1.1 leaves group order undefined);
    #: (key_expr, ascending) or None
    order: Any | None = None


# ---- graph patterns --------------------------------------------------
@dataclass
class Bgp:
    patterns: list[TriplePattern] = field(default_factory=list)


@dataclass
class PathPattern:
    """Property path `s <path> o` — extension beyond the reference
    (which throws on paths, Sparql.scala:130-134). `path` is a tree of
    PIri / PSeq / PAlt / PMod / PInv nodes."""

    s: Any  # str | Var
    path: Any
    o: Any  # str | Var


@dataclass
class PIri:
    iri: str


@dataclass
class PSeq:
    a: Any
    b: Any


@dataclass
class PAlt:
    a: Any
    b: Any


@dataclass
class PMod:
    path: Any
    mod: str  # '+', '*' or '?'


@dataclass
class PInv:
    path: Any


@dataclass
class PNeg:
    """Negated property set `!(p1|...|^q1|...)` — fwd holds forward IRIs,
    inv holds the `^`-reversed ones (SPARQL 1.1 §9.1)."""

    fwd: list
    inv: list


@dataclass
class PRange:
    """Quantified path `p{lo,hi}`; hi=None means unbounded `{lo,}`."""

    path: Any
    lo: int
    hi: Any  # int | None


@dataclass
class Filter:
    expr: Any


@dataclass
class Optional_:
    group: "GroupGraphPattern"


@dataclass
class Minus:
    group: "GroupGraphPattern"


@dataclass
class GraphGraphPattern:
    """GRAPH <iri> { ... } / GRAPH ?g { ... } — SPARQL 1.1 §13.3.
    `term` is a Var (graph variable) or a str IRI. Extension beyond the
    reference (triples-only store, no dataset support)."""

    term: object  # Var | str
    group: "GroupGraphPattern"


@dataclass
class ServicePattern:
    """SERVICE [SILENT] <iri> { ... } — SPARQL 1.1 Federated Query
    (§13.2 of the federation spec). In-process federation only: the
    IRI resolves against `sparql.service`'s registry of loaded
    Graphs/Datasets (the way the reference's ARQ inheritance would
    federate against a second local dataset). Remote HTTP endpoints
    are out of scope by design — a distributed engine federates at
    the storage layer, not per-query round-trips."""

    iri: str
    group: "GroupGraphPattern"
    silent: bool = False
    #: raw `SELECT * WHERE { ... }` text of the group (prologue
    #: prefixes prepended), captured at parse time for transports
    remote_query: str | None = None


@dataclass
class Union:
    groups: list["GroupGraphPattern"]


@dataclass
class Bind:
    expr: Any
    var: str


@dataclass
class InlineValues:
    vars: list[str]
    rows: list[list]  # entries: ELit / EIri / None (UNDEF)


@dataclass
class SubGroup:
    group: "GroupGraphPattern"


@dataclass
class SubSelect:
    """Nested SELECT inside a group (SPARQL 1.1 subquery)."""

    query: "SelectQuery"


@dataclass
class GroupGraphPattern:
    elements: list = field(default_factory=list)


# ---- query -----------------------------------------------------------
@dataclass
class SelectQuery:
    variables: list  # list[(target_name, expr)] — expr EVar or computed
    where: GroupGraphPattern
    distinct: bool = False
    group_by: list | None = None  # list of exprs
    having: Any | None = None
    order_by: list | None = None  # list[(expr, ascending: bool)]
    limit: int | None = None
    offset: int | None = None
    select_star: bool = False
    #: FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2); None =
    #: no dataset clause, use the store's own dataset
    from_graphs: list | None = None
    from_named: list | None = None
    #: trailing VALUES clause (§18.2.4.2: joined after HAVING, before
    #: projection) — InlineValues or None
    values_clause: Any | None = None


@dataclass
class AskQuery:
    where: GroupGraphPattern
    from_graphs: list | None = None
    from_named: list | None = None


@dataclass
class ConstructQuery:
    template: list  # list[TriplePattern] (vars + constant terms)
    where: GroupGraphPattern
    limit: int | None = None
    offset: int | None = None


@dataclass
class DescribeQuery:
    terms: list  # list[str | Var-name] — IRIs or projected vars
    where: GroupGraphPattern | None
    limit: int | None = None
    offset: int | None = None
