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

**Injectable transport** (round 5): the no-network policy stays, but a
caller can register a TRANSPORT — a callable
``fetch(endpoint_iri, query_text) -> list[dict[var, term]]`` — either
for a specific IRI (``register_service(iri, fetch)``) or as the
fallback for every otherwise-unresolved endpoint
(``set_default_transport(fetch)``). The compiler hands it the SERVICE
group as verbatim SPARQL text (``SELECT * WHERE { ... }`` with the
query's prefixes prepended) and joins the returned solutions.
Returned term strings use the repo's storage convention: bracket-less
IRIs, N-Triples lexical forms for literals — the same strings
``Graph.decode`` yields.

**HTTP federation** (round 6): ``graphula_spark.sparql.http`` ships
the real transport — ``http_transport()`` POSTs the SERVICE group via
the SPARQL 1.1 Protocol and parses SPARQL JSON results; register it
per-IRI or as the default transport for open federation. This module
still never owns a socket itself.
"""

from __future__ import annotations

_REGISTRY: dict[str, object] = {}
_DEFAULT_TRANSPORT = None


def register_service(iri: str, target) -> None:
    """Register the resolution of ``SERVICE <iri>``: a loaded
    ``Graph`` or ``Dataset``, or a transport callable
    ``fetch(endpoint_iri, query_text) -> list[dict]``. ``iri`` is the
    canonical (expanded) IRI string without angle brackets."""
    _REGISTRY[iri] = target


def set_default_transport(fetch) -> None:
    """Install ``fetch`` as the resolution for EVERY service IRI that
    has no specific registration — the hook a deployment with network
    access uses for open federation. Pass None to remove."""
    global _DEFAULT_TRANSPORT
    _DEFAULT_TRANSPORT = fetch


def unregister_service(iri: str) -> None:
    _REGISTRY.pop(iri, None)


def resolve_service(iri: str):
    """The registered Graph/Dataset/transport for ``iri``, falling
    back to the default transport; None if neither exists."""
    return _REGISTRY.get(iri, _DEFAULT_TRANSPORT)


def clear_services() -> None:
    global _DEFAULT_TRANSPORT
    _REGISTRY.clear()
    _DEFAULT_TRANSPORT = None
