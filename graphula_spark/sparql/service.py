"""In-process SPARQL SERVICE registry.

SPARQL 1.1 Federated Query resolves a SERVICE IRI to another SPARQL
dataset. The reference inherits full ARQ federation through its
StageGenerator registration (sparql/src/main/scala/com/graphula/
sparql/Sparql.scala:41-52, build.sbt:25-26); queries ported from a
Jena deployment therefore may carry SERVICE clauses. This module
covers the in-process case — the SERVICE IRI names another *loaded*
Graph or Dataset registered here — which is both the common migration
shape and the only one that makes sense for a distributed engine:
joining against per-row HTTP round-trips from 1000 executors is a
denial-of-service generator, so remote endpoints stay explicitly
unsupported. Load the remote data into a Graph and register it.

Federation is a MATERIALIZATION boundary: the service solution comes
back with term strings, not dictionary ids (two independently loaded
graphs need not share collision-exception tables, and real federation
transfers strings too). The compiler then joins it like any
value-materialized solution.
"""

from __future__ import annotations

_REGISTRY: dict[str, object] = {}


def register_service(iri: str, target) -> None:
    """Register a loaded ``Graph`` or ``Dataset`` as the resolution of
    ``SERVICE <iri>``. ``iri`` is the canonical (expanded) IRI string
    without angle brackets."""
    _REGISTRY[iri] = target


def unregister_service(iri: str) -> None:
    _REGISTRY.pop(iri, None)


def resolve_service(iri: str):
    """The registered Graph/Dataset for ``iri``, or None."""
    return _REGISTRY.get(iri)


def clear_services() -> None:
    _REGISTRY.clear()
