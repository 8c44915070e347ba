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


_NT_UNESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _hex_cp(h: str) -> int | None:
    """Parse a \\u/\\U hex payload to a code point, or None if it is
    not valid hex, beyond U+10FFFF, a lone surrogate (chr() accepts
    surrogates but utf-8 encoding of the serialized output would then
    crash downstream), or zero (the JVM-side value view in
    `compiler.rdf_value` cannot decode \\u0000 — NUL collides with its
    backslash sentinel — so this path leaves it undecoded too, keeping
    variable- and constant-side values in agreement; ADVICE r13)."""
    try:
        cp = int(h, 16)
    except ValueError:
        return None
    if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return None
    return cp


def nt_unescape(lex: str) -> str:
    """Decode N-Triples string escapes to raw characters — the storage
    convention keeps literals in escaped lexical form (O25 verbatim
    identity), but the JSON/XML/CSV results formats carry the ACTUAL
    value text (each applies its own encoding at write time). Single
    left-to-right pass, so `\\\\n` correctly yields backslash+n, not a
    newline; handles ECHAR plus \\uXXXX / \\UXXXXXXXX."""
    if "\\" not in lex:
        return lex
    out: list[str] = []
    i = 0
    while i < len(lex):
        ch = lex[i]
        if ch == "\\" and i + 1 < len(lex):
            nxt = lex[i + 1]
            if nxt in _NT_UNESCAPES:
                out.append(_NT_UNESCAPES[nxt])
                i += 2
                continue
            # malformed hex (user-built graphs can carry any term text)
            # falls through to emitting the characters verbatim rather
            # than crashing serialization of the whole result set
            if nxt == "u" and i + 6 <= len(lex):
                cp = _hex_cp(lex[i + 2 : i + 6])
                if cp is not None:
                    out.append(chr(cp))
                    i += 6
                    continue
            if nxt == "U" and i + 10 <= len(lex):
                cp = _hex_cp(lex[i + 2 : i + 10])
                if cp is not None:
                    out.append(chr(cp))
                    i += 10
                    continue
        out.append(ch)
        i += 1
    return "".join(out)


def _term_to_json(term) -> dict | None:
    if term is None:
        return None
    s = str(term)
    if s.startswith("_:"):
        return {"type": "bnode", "value": s[2:]}
    if s.startswith('"'):
        # N-Triples literal: "lex"(@lang | ^^<dt>)? — the stored lex
        # is escaped; the results value is the raw text (round 12, a
        # manifest case caught CSV emitting literal backslash-n)
        end = s.rfind('"')
        lex = nt_unescape(s[1:end])
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
                s = nt_unescape(s[1:end])
            out.append(s)
        w.writerow(out)
    return buf.getvalue()


def ask_to_json(result: bool) -> str:
    return json.dumps({"head": {}, "boolean": bool(result)})


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _term_to_xml(term) -> str | None:
    """One `<binding>` child element in the XML results vocabulary."""
    t = _term_to_json(term)
    if t is None:
        return None
    if t["type"] == "uri":
        return f"<uri>{_xml_escape(t['value'])}</uri>"
    if t["type"] == "bnode":
        return f"<bnode>{_xml_escape(t['value'])}</bnode>"
    lex = _xml_escape(t["value"])
    if "xml:lang" in t:
        return f'<literal xml:lang="{_xml_escape(t["xml:lang"])}">{lex}</literal>'
    if "datatype" in t:
        return f'<literal datatype="{_xml_escape(t["datatype"])}">{lex}</literal>'
    return f"<literal>{lex}</literal>"


def to_sparql_xml(df: DataFrame, limit: int | None = None) -> str:
    """Serialize a SELECT result to the SPARQL Query Results XML Format
    (`application/sparql-results+xml`)."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    cols = df.columns
    out = ['<?xml version="1.0"?>']
    out.append('<sparql xmlns="http://www.w3.org/2005/sparql-results#">')
    out.append("<head>")
    for c in cols:
        out.append(f'<variable name="{_xml_escape(c)}"/>')
    out.append("</head>")
    out.append("<results>")
    for r in rows:
        out.append("<result>")
        for c in cols:
            x = _term_to_xml(r[c])
            if x is not None:
                out.append(f'<binding name="{_xml_escape(c)}">{x}</binding>')
        out.append("</result>")
    out.append("</results>")
    out.append("</sparql>")
    return "".join(out)


def ask_to_xml(result: bool) -> str:
    return (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        "<head/>"
        f"<boolean>{'true' if result else 'false'}</boolean>"
        "</sparql>"
    )


def _term_to_tsv(term) -> str:
    """TSV cells keep full SPARQL/Turtle term syntax (unlike CSV, which
    strips to lexical forms): IRIs in angle brackets, literals quoted
    with tags, blanks as `_:label`; unbound is empty. Literals are
    stored in N-Triples lexical form already — escapes (\\", \\n, \\\\)
    are present in the stored string, so the cell is emitted verbatim;
    re-escaping would corrupt every literal containing one."""
    if term is None:
        return ""
    s = str(term)
    if s.startswith("_:") or s.startswith('"'):
        return s
    return f"<{s}>"


def to_sparql_tsv(df: DataFrame, limit: int | None = None) -> str:
    """Serialize a SELECT result to the SPARQL 1.1 TSV results format
    (`text/tab-separated-values`): header of `?var` names, one term per
    cell in full Turtle syntax."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    cols = df.columns
    lines = ["\t".join("?" + c for c in cols)]
    for r in rows:
        lines.append("\t".join(_term_to_tsv(r[c]) for c in cols))
    return "\n".join(lines) + "\n"


#: MIME type -> serializer, the content-negotiation surface a SPARQL
#: endpoint fronts with
FORMATS = {
    "json": to_sparql_json,
    "xml": to_sparql_xml,
    "csv": to_sparql_csv,
    "tsv": to_sparql_tsv,
}


def serialize_results(
    df: DataFrame, fmt: str = "json", limit: int | None = None
) -> str:
    """Serialize a SELECT result in any W3C results format
    ('json' | 'xml' | 'csv' | 'tsv')."""
    try:
        return FORMATS[fmt](df, limit=limit)
    except KeyError:
        raise ValueError(
            f"unknown results format {fmt!r}; choose one of {sorted(FORMATS)}"
        ) from None
