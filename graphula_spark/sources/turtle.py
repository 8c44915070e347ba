"""Turtle source: parse .ttl files into a (s, p, o) string DataFrame.

The reference loads N-Triples only (NxParser, Sparql.scala:78-113);
Turtle is the format real RDF corpora actually ship in, so this is a
usability extension. Supported: @prefix/@base (and SPARQL-style
PREFIX/BASE), `a`, predicate lists `;`, object lists `,`, IRIs,
prefixed names, blank-node labels, literals with language tags or
datatypes, anonymous blank nodes `[ ... ]` (fresh file-scoped ids),
and collections `( ... )` (expanded to rdf:first/rdf:rest chains).

Distribution model: EXACTLY one Python parse task per FILE
(`sources/files.py::per_file_rdd` — a parallelized path list, since
binaryFiles under-parallelizes many small files). Turtle is stateful
(prefixes scope over the rest of the document), so a file is the
natural parallel unit — exactly how multi-file corpora are laid out;
a 100 TB Turtle corpus is many files, not one. For single giant files
convert to N-Triples/N-Quads (line-parallel formats) instead.

Terms are canonicalized to the same verbatim policy as
`sources/ntriples.py`: IRIs bare, literals in N-Triples lexical form,
blank labels as `_:label`. Generated anonymous-node labels are
prefixed with a hash of the file path so multi-file loads never
collide.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_SPO_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
    ]
)

_QUAD_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
        StructField("g", StringType(), True),
    ]
)


def _normalize_directives(text: str) -> str:
    """Rewrite Turtle-only directive spellings to the SPARQL forms the
    shared tokenizer knows: "@prefix p: <iri> ." -> "PREFIX p: <iri>"."""

    def _directive(m: "re.Match[str]") -> str:
        body = m.group(2).rstrip()
        if body.endswith("."):
            body = body[:-1]
        return ("PREFIX " if m.group(1).lower() == "prefix" else "BASE ") + body

    return re.sub(
        r"@(prefix|base)\s+([^\n]*)", _directive, text, flags=re.IGNORECASE
    )


class _TurtleStatements:
    """Statement parser shared by the Turtle and TriG readers, built on
    the SPARQL tokenizer (Turtle's term grammar is a subset). Emits
    (s, p, o, g) tuples via `self.emit`."""

    def __init__(self, parser, blank_prefix: str = ""):
        self.p = parser
        self.blank_prefix = blank_prefix
        self.genid = 0
        self.out: list[tuple[str, str, str, str | None]] = []

    def fresh_blank(self) -> str:
        self.genid += 1
        return f"_:{self.blank_prefix}anon{self.genid}"

    def term_str(self, t) -> str:
        from graphula_spark.sparql.parser import Var

        if isinstance(t, Var):
            raise SyntaxError("variables are not valid in Turtle/TriG data")
        return t

    def parse_predicate(self) -> str:
        nxt = self.p.peek()
        if nxt.kind == "KW" and nxt.text == "a":
            self.p.next()
            return RDF_NS + "type"
        return self.term_str(self.p.parse_term())

    def parse_object(self, g: str | None) -> str:
        t = self.p.peek()
        if t.kind == "OP" and t.text == "[":
            self.p.next()
            node = self.fresh_blank()
            if not (self.p.peek().kind == "OP" and self.p.peek().text == "]"):
                self.predicate_object_list(node, g)
            self.p.expect_op("]")
            return node
        if t.kind == "OP" and t.text == "(":
            self.p.next()
            items = []
            while not (self.p.peek().kind == "OP" and self.p.peek().text == ")"):
                items.append(self.parse_object(g))
            self.p.next()  # ')'
            if not items:
                return RDF_NS + "nil"
            head = self.fresh_blank()
            node = head
            for i, item in enumerate(items):
                self.out.append((node, RDF_NS + "first", item, g))
                if i == len(items) - 1:
                    self.out.append((node, RDF_NS + "rest", RDF_NS + "nil", g))
                else:
                    nxt = self.fresh_blank()
                    self.out.append((node, RDF_NS + "rest", nxt, g))
                    node = nxt
            return head
        return self.term_str(self.p.parse_term())

    def predicate_object_list(self, subj: str, g: str | None) -> None:
        while True:
            pred = self.parse_predicate()
            while True:
                self.out.append((subj, pred, self.parse_object(g), g))
                if not self.p.eat_op(","):
                    break
            if not self.p.eat_op(";"):
                break
            # allow trailing ';' before '.' / '}' / ']'
            nxt = self.p.peek()
            if nxt.kind == "OP" and nxt.text in (".", "}", "]"):
                break
            if nxt.kind == "EOF":
                break

    def parse_subject(self, g: str | None) -> tuple[str, bool]:
        """Returns (subject, was_anon): only an anonymous '[ ... ]'
        subject may legally stand alone without a predicate list."""
        t = self.p.peek()
        if t.kind == "OP" and t.text == "[":
            # anonymous subject: '[ ... ] pred obj .' or '[ p o ] .'
            return self.parse_object(g), True
        if t.kind == "OP" and t.text == "(":
            return self.parse_object(g), False
        return self.term_str(self.p.parse_term()), False

    def statement(self, g: str | None) -> None:
        subj, was_anon = self.parse_subject(g)
        # '[ p o ] .' is a legal statement all by itself — but a bare
        # 'ex:s .' (no predicate list) is invalid Turtle and must raise
        if (
            was_anon
            and self.p.peek().kind == "OP"
            and self.p.peek().text == "."
        ):
            return
        self.predicate_object_list(subj, g)


def _parse_turtle_text(
    text: str, blank_prefix: str = ""
) -> list[tuple[str, str, str]]:
    """Parse one Turtle document to (s, p, o) term tuples."""
    from graphula_spark.sparql.parser import Parser

    p = Parser(_normalize_directives(text))
    p.parse_prologue()
    st = _TurtleStatements(p, blank_prefix)
    while p.peek().kind != "EOF":
        if p.kw() in ("PREFIX", "BASE"):  # mid-document directive
            p.parse_prologue()
            continue
        st.statement(None)
        p.expect_op(".")
    return [(s, pr, o) for s, pr, o, _ in st.out]


def read_turtle(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse Turtle file(s) -> DataFrame(s, p, o) — one parse task per
    file; feed the result to `Graph.from_string_triples`."""
    if isinstance(paths, str):
        paths = [paths]
    from graphula_spark.sources.files import per_file_rdd

    files = per_file_rdd(spark, paths)

    def parse_file(kv):
        path, content = kv
        prefix = hashlib.md5(path.encode()).hexdigest()[:8]
        return _parse_turtle_text(
            bytes(content).decode("utf-8"), blank_prefix=prefix
        )

    rows = files.flatMap(parse_file)
    return spark.createDataFrame(rows, _SPO_SCHEMA)


def _parse_trig_text(
    text: str, blank_prefix: str = ""
) -> list[tuple[str, str, str, str | None]]:
    """Parse one TriG document to (s, p, o, g) tuples: Turtle statements
    at the top level land in the default graph (g=None); `<g> { ... }`
    / `GRAPH <g> { ... }` blocks carry their graph IRI."""
    from graphula_spark.sparql.parser import Parser

    p = Parser(_normalize_directives(text))
    p.parse_prologue()
    st = _TurtleStatements(p, blank_prefix)

    def block(graph_name: str | None) -> None:
        while True:
            t = p.peek()
            if t.kind == "EOF":
                raise SyntaxError("unterminated graph block")
            if t.kind == "OP" and t.text == "}":
                p.next()
                return
            st.statement(graph_name)
            p.eat_op(".")

    while p.peek().kind != "EOF":
        if p.kw() in ("PREFIX", "BASE"):
            p.parse_prologue()
            continue
        if p.kw() == "GRAPH":
            p.next()
            gname = st.term_str(p.parse_term())
            p.expect_op("{")
            block(gname)
            p.eat_op(".")
            continue
        # `<g> { ... }` block or a plain default-graph statement: decide
        # by the token after the first term
        if (
            p.peek().kind in ("IRI", "PNAME")
            and p.peek(1).kind == "OP"
            and p.peek(1).text == "{"
        ):
            gname = st.term_str(p.parse_term())
            p.expect_op("{")
            block(gname)
            p.eat_op(".")
            continue
        if p.peek().kind == "OP" and p.peek().text == "{":
            p.next()  # anonymous default-graph block
            block(None)
            p.eat_op(".")
            continue
        st.statement(None)
        p.expect_op(".")
    return st.out


def read_trig(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse TriG file(s) -> DataFrame(s, p, o, g) — one parse task per
    file; feed the result to `Dataset.from_string_quads`."""
    if isinstance(paths, str):
        paths = [paths]
    from graphula_spark.sources.files import per_file_rdd

    files = per_file_rdd(spark, paths)

    def parse_file(kv):
        path, content = kv
        prefix = hashlib.md5(path.encode()).hexdigest()[:8]
        return _parse_trig_text(
            bytes(content).decode("utf-8"), blank_prefix=prefix
        )

    return spark.createDataFrame(files.flatMap(parse_file), _QUAD_SCHEMA)
