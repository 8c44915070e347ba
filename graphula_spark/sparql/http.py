"""HTTP transport for SPARQL ``SERVICE``: real remote federation.

The reference inherits remote SERVICE from Jena ARQ's HTTP engine
(sparql/src/main/scala/com/graphula/sparql/Sparql.scala:41-52,
build.sbt:25-26). This module is the equivalent last mile over the
round-5 injectable-transport seam (`sparql/service.py`): a callable
``fetch(endpoint_iri, query_text) -> list[dict[var, term]]`` that
POSTs the SERVICE group's verbatim query to the endpoint with the
SPARQL 1.1 Protocol (form-encoded ``query=``), asks for the SPARQL
Query Results JSON format, and converts each binding back to the
repo's storage convention (bracket-less IRIs, verbatim N-Triples
lexical forms for literals, ``_:label`` blank nodes — the same
strings ``Graph.decode`` yields, see sources/ntriples.py:9-17).

Execution shape is inherited from the seam: the compiler performs ONE
driver-side call per SERVICE clause — never per row — so a
1000-executor cluster never multiplies HTTP traffic
(`compiler._service_via_transport`). SILENT swallows transport
failures into the unit solution per spec; without SILENT the HTTP
error propagates.

Usage::

    from graphula_spark.sparql.http import http_transport
    from graphula_spark.sparql.service import (
        register_service, set_default_transport,
    )

    # federate one IRI over HTTP
    register_service("https://example.org/sparql", http_transport())
    # or open federation for every unregistered endpoint
    set_default_transport(http_transport(timeout=60))

Network access is environment policy, not engine policy: nothing here
opens a socket until a query actually reaches a SERVICE clause whose
IRI resolves to this transport.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

#: N-Triples string-literal escapes (W3C N-Triples §2.3 ECHAR)
_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _escape_literal(lex: str) -> str:
    out = []
    for ch in lex:
        out.append(_ESCAPES.get(ch, ch))
    return "".join(out)


def term_to_storage(term: dict) -> str:
    """One SPARQL-results-JSON RDF term -> the repo's storage string.

    * ``uri`` -> the IRI without angle brackets
    * ``bnode`` -> ``_:label`` (labels scoped per response, like a
      per-load-session blank-node namespace)
    * ``literal`` (and legacy ``typed-literal``) -> N-Triples lexical
      form with quotes, ``@lang`` / ``^^<datatype>`` suffix. A bare
      ``xsd:string`` datatype is dropped: RDF 1.1 makes simple
      literals and xsd:string-typed literals the same term, and the
      local .nt loader stores the simple form.
    """
    t = term.get("type")
    v = term.get("value", "")
    if t == "uri":
        return v
    if t == "bnode":
        return f"_:{v}"
    if t in ("literal", "typed-literal"):
        lex = f'"{_escape_literal(v)}"'
        lang = term.get("xml:lang")
        if lang:
            return f"{lex}@{lang}"
        dt = term.get("datatype")
        if dt and dt != XSD_STRING:
            return f"{lex}^^<{dt}>"
        return lex
    raise ValueError(f"unknown RDF term type in SPARQL JSON results: {t!r}")


def parse_sparql_json(payload: bytes | str) -> list[dict[str, str]]:
    """SPARQL 1.1 Query Results JSON -> solution dicts in storage
    convention. Vars a binding leaves unbound are simply absent from
    its dict (the compiler joins them as nulls)."""
    doc = json.loads(payload)
    if "boolean" in doc:  # ASK response — SERVICE groups are SELECTs
        raise ValueError(
            "endpoint returned an ASK (boolean) result for a SERVICE "
            "group; expected SELECT bindings"
        )
    bindings = doc.get("results", {}).get("bindings", [])
    return [
        {var: term_to_storage(term) for var, term in b.items()}
        for b in bindings
    ]


class ServiceResponseTooLarge(ValueError):
    """A SERVICE endpoint's response breached the transport's
    ``max_bytes``/``max_rows`` guard. Under ``SERVICE SILENT`` the
    compiler swallows this into the unit solution like any other
    transport failure; without SILENT it propagates."""


def http_transport(
    timeout: float = 30.0,
    endpoint: str | None = None,
    user_agent: str = "graphula-spark-federation/1.0",
    max_bytes: int = 64 * 1024 * 1024,
    max_rows: int = 1_000_000,
):
    """Build a SERVICE transport that POSTs to a SPARQL 1.1 Protocol
    endpoint and parses JSON results.

    ``endpoint`` overrides the SERVICE IRI as the HTTP target — the
    common deployment where the logical dataset IRI differs from the
    query endpoint URL; default is to POST to the SERVICE IRI itself.
    The POST body is form-encoded (``query=...``), the most widely
    implemented of the protocol's three request shapes and safe for
    arbitrarily long queries (a GET would hit URL length caps).

    ``max_bytes`` / ``max_rows`` bound what a misbehaving endpoint can
    materialize ON THE DRIVER (the transport reads the whole response
    there by design — one HTTP call per SERVICE clause, never per
    row): the body is read in chunks and abandoned the moment it
    crosses ``max_bytes``, and the parsed binding count is checked
    against ``max_rows`` before the rows are handed to the compiler.
    Breach raises :class:`ServiceResponseTooLarge` (VERDICT r6 #3);
    pass ``None`` for either to disable that guard.

    ``max_bytes`` is the REAL driver-memory guard: it aborts the read
    mid-body. ``max_rows`` is checked only after the JSON parse has
    materialized every binding, so it bounds what reaches the
    compiler, not peak parse memory — with ``max_bytes=None`` an
    unbounded response is still fully parsed before the row cap fires
    (ADVICE r7). Keep ``max_bytes`` set unless the endpoint is
    trusted."""

    def fetch(iri: str, query: str) -> list[dict[str, str]]:
        url = endpoint or iri
        req = urllib.request.Request(
            url,
            data=urllib.parse.urlencode({"query": query}).encode("utf-8"),
            headers={
                "Accept": "application/sparql-results+json",
                "Content-Type": (
                    "application/x-www-form-urlencoded; charset=UTF-8"
                ),
                "User-Agent": user_agent,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if max_bytes is None:
                body = resp.read()
            else:
                chunks, size = [], 0
                while True:
                    chunk = resp.read(min(1 << 20, max_bytes - size + 1))
                    if not chunk:
                        break
                    size += len(chunk)
                    if size > max_bytes:
                        raise ServiceResponseTooLarge(
                            f"SERVICE <{iri}> response exceeds max_bytes="
                            f"{max_bytes} (raise the cap on http_transport "
                            "or narrow the SERVICE group)"
                        )
                    chunks.append(chunk)
                body = b"".join(chunks)
        rows = parse_sparql_json(body)
        if max_rows is not None and len(rows) > max_rows:
            raise ServiceResponseTooLarge(
                f"SERVICE <{iri}> returned {len(rows)} bindings, over "
                f"max_rows={max_rows} (raise the cap on http_transport "
                "or narrow the SERVICE group)"
            )
        return rows

    return fetch
