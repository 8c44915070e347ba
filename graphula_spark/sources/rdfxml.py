"""RDF/XML source: parse .rdf/.owl files into a (s, p, o) DataFrame.

The reference loads N-Triples only (NxParser, Sparql.scala:78-113);
RDF/XML is the format most legacy ontologies and the raw LUBM
generator output ship in, so this completes the input matrix
(.nt/.nq/.ttl/.trig/.rdf). Parsing is stdlib xml.etree — no external
dependency.

Supported subset (RDF/XML Syntax spec, the constructs real data uses):
- `rdf:RDF` root or a bare node element
- node elements: `rdf:Description` with `rdf:about` / `rdf:ID` /
  `rdf:nodeID`, typed node elements (element name becomes `rdf:type`)
- property elements with `rdf:resource`, `rdf:nodeID`, nested node
  elements, or literal text content (+ `xml:lang`, `rdf:datatype`)
- property attributes on node elements (literal shorthand)
- containers via `rdf:li` (numbered to `rdf:_1`, `rdf:_2`, ...)
- `rdf:parseType="Resource"` (implicit blank node)
- relative IRI resolution against `xml:base` / the `base` argument

`rdf:parseType="Collection"` expands to rdf:first/rest chains (§7.2.19).
Raises NotImplementedError on
`rdf:parseType="Literal"` (XML literals) — expand those to N-Triples
with a full toolchain instead.

Distribution model: one Python parse task per FILE (same as the
Turtle/TriG readers — XML is document-scoped, so a file is the natural
parallel unit; a large corpus is many files). Blank-node labels are
prefixed with a hash of the file path so generated ids never collide
across files in one load.

Terms follow the same verbatim policy as `sources/ntriples.py`: IRIs
bare, literals in N-Triples lexical form, blanks `_:label`.
"""

from __future__ import annotations

import hashlib
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_SPO_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
    ]
)

# ElementTree exposes namespaced attributes as "{uri}local"
_QRDF = "{" + RDF_NS + "}"
_QXML = "{" + XML_NS + "}"

# rdf-namespace attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    _QRDF + a
    for a in ("about", "ID", "nodeID", "resource", "datatype", "parseType")
}


def _nt_escape(lex: str) -> str:
    return (
        lex.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _literal(lex: str, lang: str | None, dtype: str | None) -> str:
    out = f'"{_nt_escape(lex)}"'
    if lang:
        return out + "@" + lang
    if dtype:
        return out + "^^<" + dtype + ">"
    return out


def _split_qname(tag: str) -> tuple[str, str]:
    if tag.startswith("{"):
        uri, local = tag[1:].split("}", 1)
        return uri, local
    return "", tag


class _DocParser:
    def __init__(self, base: str | None, blank_prefix: str):
        self.base = base
        self.blank_prefix = blank_prefix
        self.genid = 0
        self.out: list[tuple[str, str, str]] = []

    def fresh_blank(self) -> str:
        self.genid += 1
        return f"_:{self.blank_prefix}g{self.genid}"

    def resolve(self, iri: str, base: str | None) -> str:
        # RFC 3986: a relative reference cannot start with scheme ':',
        # so any leading scheme marks the IRI absolute (covers urn:,
        # tag:, doi:, data:, tel:, ... — not just '://' forms)
        import re as _re

        if _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return iri
        b = base or self.base
        if b is None:
            return iri
        if iri.startswith("#") or not iri:
            return b.split("#")[0] + iri
        # minimal relative resolution: append to the base's directory
        return b.rsplit("/", 1)[0] + "/" + iri

    def node_subject(self, el: ET.Element, base: str | None) -> str:
        about = el.get(_QRDF + "about")
        if about is not None:
            return self.resolve(about, base)
        rid = el.get(_QRDF + "ID")
        if rid is not None:
            return self.resolve("#" + rid, base)
        nid = el.get(_QRDF + "nodeID")
        if nid is not None:
            return f"_:{self.blank_prefix}{nid}"
        return self.fresh_blank()

    def parse_node(self, el: ET.Element, base: str | None) -> str:
        """Parse a node element; returns its subject term."""
        base = el.get(_QXML + "base", base)
        subj = self.node_subject(el, base)
        uri, local = _split_qname(el.tag)
        if uri + local != RDF_NS + "Description":
            self.out.append((subj, RDF_NS + "type", uri + local))
        # property attributes (literal shorthand)
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith(_QXML):
                continue
            auri, alocal = _split_qname(k)
            if auri == RDF_NS and alocal == "type":
                self.out.append((subj, RDF_NS + "type", self.resolve(v, base)))
            elif auri:  # non-namespaced attrs (e.g. plain xmlns relics) skipped
                self.out.append((subj, auri + alocal, _literal(v, None, None)))
        li_counter = 0
        for prop in el:
            li_counter = self.parse_property(subj, prop, base, li_counter)
        return subj

    def parse_property(
        self, subj: str, prop: ET.Element, base: str | None, li_counter: int
    ) -> int:
        base = prop.get(_QXML + "base", base)
        uri, local = _split_qname(prop.tag)
        if uri == RDF_NS and local == "li":
            li_counter += 1
            pred = f"{RDF_NS}_{li_counter}"
        else:
            pred = uri + local
        ptype = prop.get(_QRDF + "parseType")
        if ptype == "Resource":
            b = self.fresh_blank()
            self.out.append((subj, pred, b))
            inner_li = 0
            for child in prop:
                inner_li = self.parse_property(b, child, base, inner_li)
            return li_counter
        if ptype == "Collection":
            # RDF/XML §7.2.19: the child node elements form an
            # rdf:first/rdf:rest chain ending in rdf:nil
            items = [self.parse_node(child, base) for child in prop]
            if not items:
                self.out.append((subj, pred, RDF_NS + "nil"))
                return li_counter
            cells = [self.fresh_blank() for _ in items]
            self.out.append((subj, pred, cells[0]))
            for i, (cell, item) in enumerate(zip(cells, items)):
                self.out.append((cell, RDF_NS + "first", item))
                rest = cells[i + 1] if i + 1 < len(cells) else RDF_NS + "nil"
                self.out.append((cell, RDF_NS + "rest", rest))
            return li_counter
        if ptype == "Literal":
            raise NotImplementedError(
                'rdf:parseType="Literal" (XML literals) is outside the '
                "supported RDF/XML subset — expand to N-Triples with a "
                "full toolchain"
            )
        res = prop.get(_QRDF + "resource")
        if res is not None:
            self.out.append((subj, pred, self.resolve(res, base)))
            return li_counter
        nid = prop.get(_QRDF + "nodeID")
        if nid is not None:
            self.out.append((subj, pred, f"_:{self.blank_prefix}{nid}"))
            return li_counter
        children = list(prop)
        if children:
            if len(children) != 1:
                raise SyntaxError(
                    "property element with multiple child node elements"
                )
            obj = self.parse_node(children[0], base)
            self.out.append((subj, pred, obj))
            return li_counter
        lex = prop.text or ""
        lang = prop.get(_QXML + "lang")
        dtype = prop.get(_QRDF + "datatype")
        self.out.append((subj, pred, _literal(lex, lang, dtype)))
        return li_counter


def parse_rdfxml_text(
    text: str, base: str | None = None, blank_prefix: str = ""
) -> list[tuple[str, str, str]]:
    root = ET.fromstring(text)
    dp = _DocParser(base, blank_prefix)
    base = root.get(_QXML + "base", base)
    dp.base = base
    ruri, rlocal = _split_qname(root.tag)
    if ruri + rlocal == RDF_NS + "RDF":
        for el in root:
            dp.parse_node(el, base)
    else:  # bare node element document
        dp.parse_node(root, base)
    return dp.out


def read_rdfxml(
    spark: SparkSession, paths: str | list[str], base: str | None = None
) -> DataFrame:
    """Parse RDF/XML file(s) -> DataFrame(s, p, o) — one parse task per
    file; feed the result to `Graph.from_string_triples`."""
    if isinstance(paths, str):
        paths = [paths]
    from graphula_spark.sources.files import per_file_rdd

    files = per_file_rdd(spark, paths)

    def parse_file(kv):
        path, content = kv
        prefix = hashlib.md5(path.encode()).hexdigest()[:8]
        return parse_rdfxml_text(
            bytes(content).decode("utf-8"), base=base, blank_prefix=prefix
        )

    return spark.createDataFrame(files.flatMap(parse_file), _SPO_SCHEMA)
