"""SPARQL 1.1 query results serialization (W3C formats).

The reference exposes results only as Jena bindings through its server
stub (sparql/.../server/Server.scala); any interoperating client
expects the standard serializations, so this is the missing interop
layer: `application/sparql-results+json` (SPARQL 1.1 Query Results
JSON Format) and `text/csv` (SPARQL 1.1 Query Results CSV Format).

Terms arrive in this engine's canonical string form (IRIs bare,
literals in N-Triples lexical syntax, blanks `_:label`) and are mapped
to the typed JSON term objects the spec requires. Serialization is a
driver-side step over an already-computed (usually LIMITed) result —
the distributed work happened in the query; for bulk export use the
parquet/N-Triples sinks instead.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def _term_to_json(term) -> dict | None:
    if term is None:
        return None
    s = str(term)
    if s.startswith("_:"):
        return {"type": "bnode", "value": s[2:]}
    if s.startswith('"'):
        # N-Triples literal: "lex"(@lang | ^^<dt>)?
        end = s.rfind('"')
        lex = s[1:end]
        rest = s[end + 1 :]
        out: dict = {"type": "literal", "value": lex}
        if rest.startswith("@"):
            out["xml:lang"] = rest[1:]
        elif rest.startswith("^^<") and rest.endswith(">"):
            out["datatype"] = rest[3:-1]
        return out
    return {"type": "uri", "value": s}


def to_sparql_json(df: DataFrame, limit: int | None = None) -> str:
    """Serialize a SELECT result to the SPARQL 1.1 JSON results format."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    cols = df.columns
    bindings = []
    for r in rows:
        b = {}
        for c in cols:
            t = _term_to_json(r[c])
            if t is not None:
                b[c] = t
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": cols}, "results": {"bindings": bindings}}
    )


def to_sparql_csv(df: DataFrame, limit: int | None = None) -> str:
    """Serialize a SELECT result to the SPARQL 1.1 CSV results format:
    header row of variable names; literals as their lexical form (no
    quotes/tags), IRIs bare, blanks `_:label`; RFC 4180 quoting."""
    import csv
    import io

    rows = df.limit(limit).collect() if limit is not None else df.collect()
    cols = df.columns
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n")
    w.writerow(cols)
    for r in rows:
        out = []
        for c in cols:
            v = r[c]
            if v is None:
                out.append("")
                continue
            s = str(v)
            if s.startswith('"'):
                end = s.rfind('"')
                s = s[1:end]
            out.append(s)
        w.writerow(out)
    return buf.getvalue()


def ask_to_json(result: bool) -> str:
    return json.dumps({"head": {}, "boolean": bool(result)})
