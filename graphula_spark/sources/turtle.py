"""Turtle source: parse .ttl files into a (s, p, o) string DataFrame.

The reference loads N-Triples only (NxParser, Sparql.scala:78-113);
Turtle is the format real RDF corpora actually ship in, so this is a
usability extension. Supported subset: @prefix/@base (and SPARQL-style
PREFIX/BASE), `a`, predicate lists `;`, object lists `,`, IRIs,
prefixed names, blank-node labels, and literals with language tags or
datatypes. Not supported (raise): anonymous blank nodes `[]`,
collections `( ... )` — the constructs that need fresh-node allocation.

Distribution model: one Python parse task per FILE
(`wholeTextFiles`-style binaryFiles scan). Turtle is stateful
(prefixes scope over the rest of the document), so a file is the
natural parallel unit — exactly how multi-file corpora are laid out;
a 100 TB Turtle corpus is many files, not one. For single giant files
convert to N-Triples/N-Quads (line-parallel formats) instead.

Terms are canonicalized to the same verbatim policy as
`sources/ntriples.py`: IRIs bare, literals in N-Triples lexical form,
blank labels as `_:label`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_SPO_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
    ]
)


def _parse_turtle_text(text: str) -> list[tuple[str, str, str]]:
    """Parse one Turtle document to (s, p, o) term tuples, reusing the
    SPARQL tokenizer/term grammar (Turtle's term syntax is a subset)."""
    from graphula_spark.sparql.parser import Parser, Var

    # normalize Turtle-only directive spellings to the SPARQL forms the
    # tokenizer knows: "@prefix p: <iri> ." -> "PREFIX p: <iri>"
    import re

    def _directive(m: "re.Match[str]") -> str:
        body = m.group(2).rstrip()
        if body.endswith("."):
            body = body[:-1]
        return ("PREFIX " if m.group(1).lower() == "prefix" else "BASE ") + body

    text = re.sub(
        r"@(prefix|base)\s+([^\n]*)", _directive, text, flags=re.IGNORECASE
    )
    p = Parser(text)
    p.parse_prologue()
    out: list[tuple[str, str, str]] = []

    def term_str(t) -> str:
        if isinstance(t, Var):
            raise SyntaxError("variables are not valid in Turtle data")
        return t

    while p.peek().kind != "EOF":
        if p.kw() in ("PREFIX", "BASE"):  # mid-document directive
            p.parse_prologue()
            continue
        if p.peek().kind == "OP" and p.peek().text in ("[", "("):
            raise NotImplementedError(
                "anonymous blank nodes / collections are outside the "
                "supported Turtle subset — expand them or use N-Triples"
            )
        subj = term_str(p.parse_term())
        while True:
            nxt = p.peek()
            if nxt.kind == "KW" and nxt.text == "a":
                p.next()
                pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            else:
                pred = term_str(p.parse_term())
            while True:
                out.append((subj, pred, term_str(p.parse_term())))
                if not p.eat_op(","):
                    break
            if not p.eat_op(";"):
                break
            # allow trailing ';' before '.'
            if p.peek().kind == "OP" and p.peek().text == ".":
                break
        p.expect_op(".")
    return out


def read_turtle(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse Turtle file(s) -> DataFrame(s, p, o) — one parse task per
    file; feed the result to `Graph.from_string_triples`."""
    if isinstance(paths, str):
        paths = [paths]
    files = spark.sparkContext.binaryFiles(",".join(paths))

    def parse_file(kv):
        _, content = kv
        return _parse_turtle_text(bytes(content).decode("utf-8"))

    rows = files.flatMap(parse_file)
    return spark.createDataFrame(rows, _SPO_SCHEMA)


def _parse_trig_text(text: str) -> list[tuple[str, str, str, str | None]]:
    """Parse one TriG document to (s, p, o, g) tuples: Turtle statements
    at the top level land in the default graph (g=None); `<g> { ... }`
    / `GRAPH <g> { ... }` blocks carry their graph IRI. Same supported
    subset as `_parse_turtle_text` inside blocks."""
    import re

    from graphula_spark.sparql.parser import Parser, Var

    def _directive(m: "re.Match[str]") -> str:
        body = m.group(2).rstrip()
        if body.endswith("."):
            body = body[:-1]
        return ("PREFIX " if m.group(1).lower() == "prefix" else "BASE ") + body

    text = re.sub(
        r"@(prefix|base)\s+([^\n]*)", _directive, text, flags=re.IGNORECASE
    )
    p = Parser(text)
    p.parse_prologue()
    out: list[tuple[str, str, str, str | None]] = []

    def term_str(t) -> str:
        if isinstance(t, Var):
            raise SyntaxError("variables are not valid in TriG data")
        return t

    def statements(graph_name: str | None, end_op: str | None) -> None:
        while True:
            t = p.peek()
            if t.kind == "EOF":
                if end_op is not None:
                    raise SyntaxError("unterminated graph block")
                return
            if end_op is not None and t.kind == "OP" and t.text == end_op:
                p.next()
                return
            if t.kind == "OP" and t.text in ("[", "("):
                raise NotImplementedError(
                    "anonymous blank nodes / collections are outside the "
                    "supported TriG subset"
                )
            subj = term_str(p.parse_term())
            while True:
                nxt = p.peek()
                if nxt.kind == "KW" and nxt.text == "a":
                    p.next()
                    pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
                else:
                    pred = term_str(p.parse_term())
                while True:
                    out.append((subj, pred, term_str(p.parse_term()), graph_name))
                    if not p.eat_op(","):
                        break
                if not p.eat_op(";"):
                    break
                if p.peek().kind == "OP" and p.peek().text == ".":
                    break
            p.eat_op(".")

    while p.peek().kind != "EOF":
        if p.kw() in ("PREFIX", "BASE"):
            p.parse_prologue()
            continue
        if p.kw() == "GRAPH":
            p.next()
            gname = term_str(p.parse_term())
            p.expect_op("{")
            statements(gname, "}")
            p.eat_op(".")
            continue
        # `<g> { ... }` block or a plain default-graph statement: decide
        # by the token after the first term
        if p.peek().kind in ("IRI", "PNAME") and p.peek(1).kind == "OP" and p.peek(1).text == "{":
            gname = term_str(p.parse_term())
            p.expect_op("{")
            statements(gname, "}")
            p.eat_op(".")
            continue
        if p.peek().kind == "OP" and p.peek().text == "{":
            p.next()  # anonymous default-graph block
            statements(None, "}")
            p.eat_op(".")
            continue
        # single default-graph statement: reuse the block parser for one
        # subject by parsing until its terminating '.'
        if p.peek().kind == "OP" and p.peek().text in ("[", "("):
            raise NotImplementedError(
                "anonymous blank nodes / collections are outside the "
                "supported TriG subset"
            )
        subj = term_str(p.parse_term())
        while True:
            nxt = p.peek()
            if nxt.kind == "KW" and nxt.text == "a":
                p.next()
                pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            else:
                pred = term_str(p.parse_term())
            while True:
                out.append((subj, pred, term_str(p.parse_term()), None))
                if not p.eat_op(","):
                    break
            if not p.eat_op(";"):
                break
            if p.peek().kind == "OP" and p.peek().text == ".":
                break
        p.expect_op(".")
    return out


def read_trig(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse TriG file(s) -> DataFrame(s, p, o, g) — one parse task per
    file; feed the result to `Dataset.from_string_quads`."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("s", StringType(), False),
            StructField("p", StringType(), False),
            StructField("o", StringType(), False),
            StructField("g", StringType(), True),
        ]
    )
    if isinstance(paths, str):
        paths = [paths]
    files = spark.sparkContext.binaryFiles(",".join(paths))

    def parse_file(kv):
        _, content = kv
        return _parse_trig_text(bytes(content).decode("utf-8"))

    return spark.createDataFrame(files.flatMap(parse_file), schema)
