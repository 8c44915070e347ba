"""Recursive-descent SPARQL parser for the SELECT/ASK/CONSTRUCT/
DESCRIBE + Update surface.

Covers (and exceeds) the surface the reference effectively supports
through Jena ARQ (SURVEY.md §2.2): BGPs, FILTER, OPTIONAL, UNION,
MINUS, BIND, VALUES, DISTINCT/REDUCED, GROUP BY + aggregates, HAVING,
ORDER BY, LIMIT/OFFSET, ASK, subqueries, EXISTS expressions, named
graphs (GRAPH / FROM / FROM NAMED), SERVICE, plus prefixed names, 'a'
for rdf:type, and ';'/',' triple abbreviations. Property paths
(`/ | ? ^ + * {n,m} !(...)`) parse to `PathPattern` (round 11 —
the reference throws on every path at runtime,
sparql/.../Sparql.scala:130-134; we execute them); the one place
paths are rejected is CONSTRUCT templates, where the grammar itself
disallows them.

Terms are canonicalized exactly like the N-Triples source: URIs without
angle brackets; literals in verbatim N-Triples lexical syntax
('"abc"', '"abc"@en', '"5"^^http://...integer' is stored as
'"5"^^<http://...integer>'); plain numbers in FILTER expressions stay
numeric python values.
"""

from __future__ import annotations

import re

from graphula_spark.plans.bgp import TriplePattern, Var
from graphula_spark.sparql.algebra import (
    AskQuery,
    Bgp,
    Bind,
    EAggregate,
    ECall,
    EExists,
    EIri,
    ELit,
    EVar,
    Filter,
    GroupGraphPattern,
    InlineValues,
    Minus,
    Optional_,
    SelectQuery,
    SubGroup,
    Union,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRI><[^<>\s]*>)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DTYPE>\^\^)
  | (?P<NUM>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_.-]*)?:(?P<PLOCAL>[A-Za-z0-9_.-]*)
  | (?P<KW>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>&&|\|\||!=|<=|>=|[{}()\[\].;,=<>!+\-*/|?^])
    """,
    re.VERBOSE,
)


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind, text, pos):
        self.kind, self.text, self.pos = kind, text, pos

    def __repr__(self):  # pragma: no cover
        return f"{self.kind}({self.text!r})"


def tokenize(s: str) -> list[Token]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise SyntaxError(f"SPARQL tokenize error at {i}: {s[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        if kind == "PLOCAL":
            prefix = m.group("PNAME") or ""
            out.append(Token("PNAME", f"{prefix}:{m.group('PLOCAL')}", m.start()))
            continue
        out.append(Token(kind, m.group(0), m.start()))
    out.append(Token("EOF", "", len(s)))
    return out


_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT"}
_BUILTINS = {
    "REGEX", "BOUND", "STR", "LANG", "DATATYPE", "CONTAINS", "STRSTARTS",
    "STRENDS", "STRLEN", "UCASE", "LCASE", "ABS", "CEIL", "FLOOR", "ROUND",
    "COALESCE", "IF", "ISIRI", "ISURI", "ISLITERAL", "ISBLANK", "ISNUMERIC",
    "CONCAT", "SUBSTR", "REPLACE", "YEAR", "MONTH", "DAY",
    "STRBEFORE", "STRAFTER", "MD5", "SHA1", "SHA256", "ENCODE_FOR_URI",
    "LANGMATCHES", "SAMETERM", "IRI", "URI", "BNODE", "NOW", "UUID",
    "STRUUID", "HOURS", "MINUTES", "SECONDS", "TIMEZONE", "TZ",
    "SHA384", "SHA512", "RAND", "STRDT", "STRLANG",
}


def _in_scope_vars(elements) -> set[str]:
    """Variables in scope after the given group elements (SPARQL 1.1
    §18.2.1's in-scope table): triple/path patterns, earlier BINDs,
    VALUES, sub-groups/UNION/OPTIONAL/GRAPH groups, and a subquery's
    projection — but NOT a MINUS body (its vars do not escape) and NOT
    FILTER expressions (they bind nothing)."""
    from graphula_spark.sparql.algebra import (
        GraphGraphPattern,
        PathPattern,
        ServicePattern,
        SubSelect,
    )

    out: set[str] = set()
    for el in elements:
        if isinstance(el, Bgp):
            for pat in el.patterns:
                out |= {v for _, v in pat.vars()}
        elif isinstance(el, Bind):
            out.add(el.var)
        elif isinstance(el, InlineValues):
            out |= set(el.vars)
        elif isinstance(el, (SubGroup, Optional_)):
            out |= _in_scope_vars(el.group.elements)
        elif isinstance(el, Union):
            for b in el.groups:
                out |= _in_scope_vars(b.elements)
        elif isinstance(el, GraphGraphPattern):
            if isinstance(el.term, Var):
                out.add(el.term.name)
            out |= _in_scope_vars(el.group.elements)
        elif isinstance(el, ServicePattern):
            out |= _in_scope_vars(el.group.elements)
        elif isinstance(el, PathPattern):
            for t in (el.s, el.o):
                if isinstance(t, Var):
                    out.add(t.name)
        elif isinstance(el, SubSelect):
            out |= {name for name, _ in el.query.variables}
    return out


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        # set while parsing any SERVICE clause (incl. nested groups /
        # subqueries); stamped onto the returned query object so the
        # plan cache can key on it structurally instead of word-matching
        self.has_service = False

    # -- token helpers --------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self) -> str:
        """Uppercased text if current token is a keyword-like."""
        t = self.peek()
        return t.text.upper() if t.kind == "KW" else ""

    def eat_kw(self, word: str) -> bool:
        if self.kw() == word:
            self.next()
            return True
        return False

    def expect_kw(self, word: str):
        if not self.eat_kw(word):
            raise SyntaxError(f"expected {word}, got {self.peek()}")

    def eat_op(self, op: str) -> bool:
        t = self.peek()
        if t.kind == "OP" and t.text == op:
            self.next()
            return True
        return False

    def expect_op(self, op: str):
        if not self.eat_op(op):
            raise SyntaxError(f"expected {op!r}, got {self.peek()}")

    # -- entry ----------------------------------------------------------
    def parse(self):
        q = self._parse_query_form()
        t = self.peek()
        if t.kind != "EOF":
            raise SyntaxError(
                f"unexpected trailing input after query: {t.text!r}"
            )
        return q

    def _parse_query_form(self):
        self.parse_prologue()
        w = self.kw()
        if w == "SELECT":
            return self.parse_select()
        if w == "ASK":
            self.next()
            fg, fn = self.parse_dataset_clauses()
            self.eat_kw("WHERE")
            return AskQuery(self.parse_group(), from_graphs=fg, from_named=fn)
        if w == "CONSTRUCT":
            from graphula_spark.sparql.algebra import ConstructQuery

            self.next()
            if self.kw() == "WHERE":
                # CONSTRUCT WHERE shorthand (§10.2.2): the WHERE group
                # doubles as the template — triples only, no FILTER /
                # OPTIONAL / paths (round 11)
                self.next()
                self.expect_op("{")
                template, paths = self.parse_triples_block()
                if paths:
                    raise SyntaxError(
                        "CONSTRUCT WHERE allows only plain triple "
                        "patterns (§10.2.2)"
                    )
                self.eat_op(".")
                if not (self.peek().kind == "OP" and self.peek().text == "}"):
                    raise SyntaxError(
                        "CONSTRUCT WHERE allows only plain triple "
                        "patterns (§10.2.2)"
                    )
                self.expect_op("}")
                limit, offset = self.parse_limit_offset()
                grp = GroupGraphPattern([Bgp(template)])
                return ConstructQuery(
                    template, grp, limit=limit, offset=offset
                )
            self.expect_op("{")
            template, paths = self.parse_triples_block()
            if paths:
                raise SyntaxError("property paths not allowed in CONSTRUCT template")
            self.eat_op(".")
            self.expect_op("}")
            self.eat_kw("WHERE")
            grp = self.parse_group()
            limit, offset = self.parse_limit_offset()
            return ConstructQuery(template, grp, limit=limit, offset=offset)
        if w == "DESCRIBE":
            from graphula_spark.sparql.algebra import DescribeQuery

            self.next()
            terms = []
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    terms.append(Var(self.next().text[1:]))
                elif t.kind in ("IRI", "PNAME"):
                    terms.append(self.parse_term())
                else:
                    break
            where = None
            if self.kw() == "WHERE" or (
                self.peek().kind == "OP" and self.peek().text == "{"
            ):
                self.eat_kw("WHERE")
                where = self.parse_group()
            limit, offset = self.parse_limit_offset()
            return DescribeQuery(terms, where, limit=limit, offset=offset)
        raise SyntaxError(
            f"only SELECT/ASK/CONSTRUCT/DESCRIBE supported, got {self.peek()}"
        )


    def _prefix(self, pfx: str) -> str:
        try:
            return self.prefixes[pfx]
        except KeyError:
            raise SyntaxError(f"undeclared prefix '{pfx}:'") from None

    def parse_prologue(self):
        while True:
            if self.eat_kw("PREFIX"):
                name = self.next()
                if name.kind != "PNAME" or not name.text.endswith(":"):
                    # PNAME token is "pfx:" with empty local
                    if name.kind != "PNAME":
                        raise SyntaxError(f"bad PREFIX name {name}")
                pfx = name.text[:-1] if name.text.endswith(":") else name.text.split(":")[0]
                iri = self.next()
                if iri.kind != "IRI":
                    raise SyntaxError(f"bad PREFIX iri {iri}")
                self.prefixes[pfx] = iri.text[1:-1]
            elif self.eat_kw("BASE"):
                self.next()
            else:
                return

    # -- SELECT ---------------------------------------------------------
    def parse_select(self):
        self.expect_kw("SELECT")
        distinct = self.eat_kw("DISTINCT") or (self.eat_kw("REDUCED") and False)
        variables, star = [], False
        if self.eat_op("*"):
            star = True
        else:
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    variables.append((t.text[1:], EVar(t.text[1:])))
                elif t.kind == "OP" and t.text == "(":
                    self.next()
                    expr = self.parse_expr()
                    self.expect_kw("AS")
                    v = self.next()
                    if v.kind != "VAR":
                        raise SyntaxError(f"expected var after AS, got {v}")
                    self.expect_op(")")
                    variables.append((v.text[1:], expr))
                else:
                    break
        from_graphs, from_named = self.parse_dataset_clauses()
        self.eat_kw("WHERE")
        where = self.parse_group()
        group_by = having = order_by = None
        limit = offset = None
        values_clause = None
        while True:
            w = self.kw()
            if w == "GROUP":
                self.next()
                self.expect_kw("BY")
                group_by = []
                while True:
                    t = self.peek()
                    if t.kind == "VAR":
                        self.next()
                        group_by.append(EVar(t.text[1:]))
                    elif t.kind == "OP" and t.text == "(":
                        self.next()
                        e = self.parse_expr()
                        if self.eat_kw("AS"):
                            v = self.next()
                            e = ("as", e, v.text[1:])
                        self.expect_op(")")
                        group_by.append(e)
                    else:
                        break
            elif w == "HAVING":
                # HavingClause ::= 'HAVING' HavingCondition+ — multiple
                # constraints conjoin (all must hold)
                self.next()
                having = None
                while self.peek().kind == "OP" and self.peek().text == "(":
                    self.next()
                    cond = self.parse_expr()
                    self.expect_op(")")
                    having = (
                        cond if having is None else ECall("&&", [having, cond])
                    )
                if having is None:
                    raise SyntaxError("HAVING requires at least one condition")
            elif w == "ORDER":
                self.next()
                self.expect_kw("BY")
                order_by = []
                while True:
                    if self.eat_kw("ASC"):
                        self.expect_op("(")
                        order_by.append((self.parse_expr(), True))
                        self.expect_op(")")
                    elif self.eat_kw("DESC"):
                        self.expect_op("(")
                        order_by.append((self.parse_expr(), False))
                        self.expect_op(")")
                    elif self.peek().kind == "VAR":
                        order_by.append((EVar(self.next().text[1:]), True))
                    elif self.peek().kind == "OP" and self.peek().text == "(":
                        self.next()
                        order_by.append((self.parse_expr(), True))
                        self.expect_op(")")
                    elif (
                        self.peek().kind in ("KW", "IRI", "PNAME")
                        and self.peek(1).kind == "OP"
                        and self.peek(1).text == "("
                        # a clause-starting keyword followed by "(" is
                        # the NEXT solution modifier, not an ordering
                        # key — e.g. a trailing multi-var
                        # VALUES (?x ?y) { ... } (round 11,
                        # advisor-reported)
                        and self.peek().text.upper()
                        not in ("VALUES", "LIMIT", "OFFSET", "GROUP",
                                "HAVING", "ORDER")
                    ):
                        # bare Constraint key: BuiltInCall / FunctionCall
                        # without ASC/DESC or brackets (§18.2.5.1
                        # OrderCondition) — round 10
                        order_by.append((self.parse_expr(), True))
                    else:
                        break
                if not order_by:
                    raise SyntaxError(
                        "ORDER BY requires at least one ordering key"
                    )
            elif w == "LIMIT":
                self.next()
                limit = int(self.next().text)
            elif w == "OFFSET":
                self.next()
                offset = int(self.next().text)
            elif w == "VALUES":
                # trailing VALUES (§18.2.4.2) — joined by the engine
                self.next()
                values_clause = self.parse_values()
            else:
                break
        return SelectQuery(
            variables, where, distinct, group_by, having, order_by, limit, offset, star,
            from_graphs=from_graphs, from_named=from_named,
            values_clause=values_clause,
        )

    def parse_limit_offset(self) -> tuple[int | None, int | None]:
        limit = offset = None
        while True:
            if self.eat_kw("LIMIT"):
                limit = int(self.next().text)
            elif self.eat_kw("OFFSET"):
                offset = int(self.next().text)
            else:
                return limit, offset

    def parse_dataset_clauses(self) -> tuple[list | None, list | None]:
        """FROM <g> / FROM NAMED <g> (SPARQL 1.1 §13.2). Returns
        (None, None) when absent so the engine can distinguish 'no
        dataset clause' from 'empty dataset'."""
        fg: list | None = None
        fn: list | None = None
        while self.kw() == "FROM":
            self.next()
            if self.eat_kw("NAMED"):
                fn = (fn or [])
                fn.append(self.parse_term())
            else:
                fg = (fg or [])
                fg.append(self.parse_term())
        return fg, fn

    # -- group graph pattern -------------------------------------------
    def parse_group(self) -> GroupGraphPattern:
        self.expect_op("{")
        g = GroupGraphPattern()
        while not self.eat_op("}"):
            w = self.kw()
            t = self.peek()
            if w == "FILTER":
                self.next()
                if self.kw() == "EXISTS":
                    self.next()
                    g.elements.append(Filter(EExists(self.parse_group())))
                elif self.kw() == "NOT":
                    self.next()
                    self.expect_kw("EXISTS")
                    g.elements.append(Filter(EExists(self.parse_group(), negated=True)))
                else:
                    self.expect_op("(")
                    g.elements.append(Filter(self.parse_expr()))
                    self.expect_op(")")
            elif w == "OPTIONAL":
                self.next()
                g.elements.append(Optional_(self.parse_group()))
            elif w == "MINUS":
                self.next()
                g.elements.append(Minus(self.parse_group()))
            elif w == "GRAPH":
                from graphula_spark.sparql.algebra import GraphGraphPattern

                self.next()
                term = self.parse_term()
                if isinstance(term, str) and term.startswith('"'):
                    raise SyntaxError("GRAPH name must be an IRI or variable")
                g.elements.append(GraphGraphPattern(term, self.parse_group()))
            elif w == "SERVICE":
                from graphula_spark.sparql.algebra import ServicePattern

                self.has_service = True
                self.next()
                silent = False
                if self.kw() == "SILENT":
                    self.next()
                    silent = True
                term = self.parse_term()
                if isinstance(term, Var):
                    # SERVICE ?endpoint needs per-row endpoint dispatch
                    raise NotImplementedError(
                        "SERVICE with a variable endpoint is not supported; "
                        "use a fixed IRI registered via "
                        "graphula_spark.sparql.service.register_service"
                    )
                if not isinstance(term, str) or term.startswith('"'):
                    raise SyntaxError("SERVICE endpoint must be an IRI")
                # capture the group's RAW source span so an injectable
                # transport (sparql/service.py) can forward the query
                # text verbatim to a real endpoint — re-serializing the
                # algebra would be a second, lossier grammar
                start = self.peek().pos
                group = self.parse_group()
                end_tok = self.toks[self.i - 1]  # the closing '}'
                raw = self.text[start : end_tok.pos + len(end_tok.text)]
                remote = "".join(
                    f"PREFIX {p}: <{iri}>\n"
                    for p, iri in self.prefixes.items()
                ) + "SELECT * WHERE " + raw
                g.elements.append(
                    ServicePattern(term, group, silent, remote_query=remote)
                )
            elif w == "BIND":
                self.next()
                self.expect_op("(")
                e = self.parse_expr()
                self.expect_kw("AS")
                v = self.next()
                self.expect_op(")")
                var = v.text[1:]
                # §19.8 grammar note: the BINDed variable must not be
                # already in scope at this point of the group
                if var in _in_scope_vars(g.elements):
                    raise SyntaxError(
                        f"BIND(... AS ?{var}): ?{var} is already in "
                        "scope in this group (SPARQL 1.1 §19.8)"
                    )
                g.elements.append(Bind(e, var))
            elif w == "VALUES":
                self.next()
                g.elements.append(self.parse_values())
            elif (
                t.kind == "OP"
                and t.text == "{"
                and self.peek(1).kind == "KW"
                and self.peek(1).text.upper() == "SELECT"
            ):
                from graphula_spark.sparql.algebra import SubSelect

                self.next()  # consume '{'
                sub = self.parse_select()
                self.expect_op("}")
                g.elements.append(SubSelect(sub))
            elif w == "SELECT":
                # SPARQL 1.1 grammar: GroupGraphPattern ::=
                # '{' ( SubSelect | GroupGraphPatternSub ) '}' — the
                # subquery may sit directly inside the braces
                from graphula_spark.sparql.algebra import SubSelect

                g.elements.append(SubSelect(self.parse_select()))
            elif t.kind == "OP" and t.text == "{":
                first = self.parse_group()
                groups = [first]
                while self.kw() == "UNION":
                    self.next()
                    groups.append(self.parse_group())
                if len(groups) > 1:
                    g.elements.append(Union(groups))
                else:
                    g.elements.append(SubGroup(first))
            else:
                patterns, paths = self.parse_triples_block()
                if patterns:
                    g.elements.append(Bgp(patterns))
                g.elements.extend(paths)
            self.eat_op(".")
        return g

    def parse_values(self) -> InlineValues:
        vars_, rows = [], []
        if self.eat_op("("):
            while self.peek().kind == "VAR":
                vars_.append(self.next().text[1:])
            self.expect_op(")")
            self.expect_op("{")
            while self.eat_op("("):
                row = []
                while not self.eat_op(")"):
                    row.append(self.parse_values_term())
                if len(row) != len(vars_):
                    raise SyntaxError(
                        f"VALUES row has {len(row)} terms for "
                        f"{len(vars_)} variables"
                    )
                rows.append(row)
            self.expect_op("}")
        else:
            v = self.next()
            vars_.append(v.text[1:])
            self.expect_op("{")
            while not self.eat_op("}"):
                rows.append([self.parse_values_term()])
        return InlineValues(vars_, rows)

    def parse_values_term(self):
        t = self.peek()
        if t.kind == "KW" and t.text.upper() == "UNDEF":
            self.next()
            return None
        term = self.parse_term()
        if isinstance(term, Var):
            raise SyntaxError("variable not allowed in VALUES data")
        return term

    # -- triples block --------------------------------------------------
    def parse_triples_block(self) -> tuple[list[TriplePattern], list]:
        from graphula_spark.sparql.algebra import PathPattern

        patterns: list[TriplePattern] = []
        paths: list = []
        while True:
            subj = self.parse_term()
            while True:
                pred = self.parse_verb_or_path()
                while True:
                    obj = self.parse_term()
                    if isinstance(pred, (str, Var)):
                        patterns.append(TriplePattern(subj, pred, obj))
                    else:
                        paths.append(PathPattern(subj, pred, obj))
                    if not self.eat_op(","):
                        break
                if not self.eat_op(";"):
                    break
                if self.peek().kind == "OP" and self.peek().text in "}.":
                    break
            # continue block if a new subject follows after '.'
            if self.peek().kind == "OP" and self.peek().text == ".":
                nxt = self.peek(1)
                if nxt.kind in ("IRI", "VAR", "PNAME", "NUM", "STRING") or (
                    nxt.kind == "KW" and nxt.text == "a"
                ):
                    self.next()  # consume '.'
                    continue
            break
        return patterns, paths

    def parse_verb(self):
        t = self.peek()
        if t.kind == "KW" and t.text == "a":
            self.next()
            return RDF_TYPE
        v = self.parse_term()
        return v

    def parse_verb_or_path(self):
        """Predicate position: plain verb (str IRI or Var), or a property
        path tree when path syntax (/ | ^ + * ? parens) is present."""
        from graphula_spark.sparql.algebra import PIri

        if self.peek().kind == "VAR":
            return self.parse_verb()
        path = self.parse_path()
        if isinstance(path, PIri):
            return path.iri  # plain predicate
        return path

    def parse_path(self):
        from graphula_spark.sparql.algebra import PAlt

        e = self.parse_path_seq()
        while self.eat_op("|"):
            e = PAlt(e, self.parse_path_seq())
        return e

    def parse_path_seq(self):
        from graphula_spark.sparql.algebra import PSeq

        e = self.parse_path_elt()
        while self.eat_op("/"):
            e = PSeq(e, self.parse_path_elt())
        return e

    def _parse_path_iri(self) -> str:
        """A bare predicate IRI inside a path ('a' | <iri> | pname)."""
        t = self.next()
        if t.kind == "KW" and t.text == "a":
            return RDF_TYPE
        if t.kind == "IRI":
            return t.text[1:-1]
        if t.kind == "PNAME":
            pfx, local = t.text.split(":", 1)
            return self._prefix(pfx) + local
        raise SyntaxError(f"bad path primary {t}")

    def parse_path_elt(self):
        from graphula_spark.sparql.algebra import (
            PInv, PIri, PMod, PNeg, PRange,
        )

        if self.eat_op("!"):
            # negated property set: !iri | !^iri | !(iri|^iri|...)
            fwd: list[str] = []
            inv_set: list[str] = []

            def one():
                (inv_set if self.eat_op("^") else fwd).append(
                    self._parse_path_iri()
                )

            if self.eat_op("("):
                one()
                while self.eat_op("|"):
                    one()
                self.expect_op(")")
            else:
                one()
            p = PNeg(fwd, inv_set)
        else:
            inv = self.eat_op("^")
            if self.eat_op("("):
                p = self.parse_path()
                self.expect_op(")")
            else:
                p = PIri(self._parse_path_iri())
            if inv:
                p = PInv(p)
        if self.eat_op("+"):
            p = PMod(p, "+")
        elif self.eat_op("*"):
            p = PMod(p, "*")
        elif self.eat_op("?"):
            p = PMod(p, "?")
        elif self.eat_op("{"):
            lo_t = self.next()
            if lo_t.kind != "NUM":
                raise SyntaxError(f"bad path quantifier {lo_t}")
            lo = int(lo_t.text)
            if self.eat_op(","):
                if self.peek().kind == "NUM":
                    hi = int(self.next().text)
                else:
                    hi = None
            else:
                hi = lo
            self.expect_op("}")
            if hi is not None and hi < lo:
                raise SyntaxError(f"bad path quantifier {{{lo},{hi}}}")
            p = PRange(p, lo, hi)
        return p

    def parse_term(self):
        """Term in pattern position → str (canonical term) or Var."""
        t = self.next()
        if t.kind == "VAR":
            return Var(t.text[1:])
        if t.kind == "IRI":
            return t.text[1:-1]
        if t.kind == "PNAME":
            pfx, local = t.text.split(":", 1)
            if pfx == "_":  # blank node label
                return t.text
            return self._prefix(pfx) + local
        if t.kind == "STRING":
            lex = t.text[1:-1]
            base = f'"{lex}"'
            nxt = self.peek()
            if nxt.kind == "LANGTAG":
                self.next()
                return base + nxt.text
            if nxt.kind == "DTYPE":
                self.next()
                dt = self.next()
                if dt.kind == "IRI":
                    return f"{base}^^{dt.text}"
                if dt.kind == "PNAME":
                    pfx, local = dt.text.split(":", 1)
                    return f"{base}^^<{self._prefix(pfx)}{local}>"
                raise SyntaxError(f"bad datatype {dt}")
            return base
        if t.kind == "NUM":
            # numeric literal in data position is SPARQL shorthand for a
            # typed literal ("5" is "5"^^xsd:integer) — canonicalize to
            # the typed N-Triples form the .nt loader stores, keeping the
            # lexical form verbatim. Graph._const_ids additionally probes
            # the bare lexical form for triple-ized relational data.
            import re as _re

            if _re.fullmatch(r"[+-]?\d+", t.text):
                dt = "integer"
            elif _re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+)", t.text):
                dt = "decimal"
            else:
                dt = "double"
            return f'"{t.text}"^^<http://www.w3.org/2001/XMLSchema#{dt}>'
        if t.kind == "KW" and t.text.upper() in ("TRUE", "FALSE"):
            return (
                f'"{t.text.lower()}"'
                "^^<http://www.w3.org/2001/XMLSchema#boolean>"
            )
        raise SyntaxError(f"unexpected term {t}")

    # -- expressions ----------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        e = self.parse_and()
        while self.eat_op("||"):
            e = ECall("||", [e, self.parse_and()])
        return e

    def parse_and(self):
        e = self.parse_rel()
        while self.eat_op("&&"):
            e = ECall("&&", [e, self.parse_rel()])
        return e

    def parse_rel(self):
        e = self.parse_add()
        for op in ("<=", ">=", "!=", "=", "<", ">"):
            if self.eat_op(op):
                return ECall(op, [e, self.parse_add()])
        if self.kw() == "IN" or (self.kw() == "NOT" and self.peek(1).text.upper() == "IN"):
            neg = self.eat_kw("NOT")
            self.expect_kw("IN")
            self.expect_op("(")
            items = []
            if not self.eat_op(")"):
                items.append(self.parse_expr())
                while self.eat_op(","):
                    items.append(self.parse_expr())
                self.expect_op(")")
            e = ECall("IN", [e] + items)
            if neg:
                e = ECall("!", [e])
        return e

    def parse_add(self):
        e = self.parse_mul()
        while True:
            if self.eat_op("+"):
                e = ECall("+", [e, self.parse_mul()])
            elif self.eat_op("-"):
                e = ECall("-", [e, self.parse_mul()])
            else:
                return e

    def parse_mul(self):
        e = self.parse_unary()
        while True:
            if self.eat_op("*"):
                e = ECall("*", [e, self.parse_unary()])
            elif self.eat_op("/"):
                e = ECall("/", [e, self.parse_unary()])
            else:
                return e

    def parse_unary(self):
        if self.eat_op("!"):
            return ECall("!", [self.parse_unary()])
        if self.eat_op("-"):
            return ECall("neg", [self.parse_unary()])
        if self.eat_op("+"):
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "VAR":
            self.next()
            return EVar(t.text[1:])
        if t.kind == "NUM":
            self.next()
            txt = t.text
            return ELit(float(txt) if ("." in txt or "e" in txt or "E" in txt) else int(txt))
        if t.kind == "STRING":
            self.next()
            lex = t.text[1:-1]
            nxt = self.peek()
            # typed / language-tagged literal in EXPRESSION position
            # (SPARQL grammar RDFLiteral inside BrackettedExpression):
            # desugar to the STRDT / STRLANG builtins, which already
            # implement the spec's split between value comparison (=)
            # and term identity (SAMETERM)
            if nxt.kind == "DTYPE":
                self.next()
                dt_tok = self.next()
                if dt_tok.kind == "IRI":
                    dt = dt_tok.text[1:-1]
                elif dt_tok.kind == "PNAME":
                    pfx, local = dt_tok.text.split(":", 1)
                    dt = self._prefix(pfx) + local
                else:
                    raise SyntaxError(
                        f"expected datatype IRI after ^^, got {dt_tok}"
                    )
                return ECall("STRDT", [ELit(lex), EIri(dt)])
            if nxt.kind == "LANGTAG":
                self.next()
                return ECall("STRLANG", [ELit(lex), ELit(nxt.text[1:])])
            return ELit(lex)
        if t.kind == "IRI":
            self.next()
            return self._iri_or_call(t.text[1:-1])
        if t.kind == "PNAME":
            self.next()
            pfx, local = t.text.split(":", 1)
            return self._iri_or_call(self._prefix(pfx) + local)
        if t.kind == "KW":
            w = t.text.upper()
            if w in ("TRUE", "FALSE"):
                self.next()
                return ELit(w == "TRUE")
            if w == "EXISTS":
                self.next()
                return EExists(self.parse_group())
            if w == "NOT" and self.peek(1).text.upper() == "EXISTS":
                self.next()
                self.next()
                return EExists(self.parse_group(), negated=True)
            if w in _AGG_FUNCS:
                return self.parse_aggregate()
            if w in _BUILTINS:
                self.next()
                self.expect_op("(")
                args = []
                if not self.eat_op(")"):
                    args.append(self.parse_expr())
                    while self.eat_op(","):
                        args.append(self.parse_expr())
                    self.expect_op(")")
                return ECall(w, args)
        raise SyntaxError(f"unexpected expression token {t}")

    def _iri_or_call(self, iri: str):
        """An IRI in expression position followed by '(' is a function
        call (SPARQL `iriOrFunction`): XSD constructor casts
        (xsd:integer(?x), §17.5) and custom function IRIs — the surface
        ARQ gives the reference via Jena (build.sbt:25-26)."""
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            args = []
            if not self.eat_op(")"):
                args.append(self.parse_expr())
                while self.eat_op(","):
                    args.append(self.parse_expr())
                self.expect_op(")")
            return ECall(iri, args)
        return EIri(iri)

    def parse_aggregate(self):
        func = self.next().text.upper()
        self.expect_op("(")
        distinct = self.eat_kw("DISTINCT")
        if self.eat_op("*"):
            expr = None
        else:
            expr = self.parse_expr()
        sep = " "
        order = None
        # `;`-separated modifiers: SEPARATOR= (spec) and ORDER BY
        # (ARQ-style extension — the reference inherits it from Jena;
        # spec group order is undefined, so an explicit key is the
        # only portable way to an ordered GROUP_CONCAT)
        while self.eat_op(";"):
            if self.eat_kw("ORDER"):
                self.expect_kw("BY")
                asc = True
                if self.eat_kw("DESC"):
                    asc = False
                else:
                    self.eat_kw("ASC")
                bracketed = self.eat_op("(")
                key = self.parse_expr()
                if bracketed:
                    self.expect_op(")")
                order = (key, asc)
            else:
                self.expect_kw("SEPARATOR")
                self.expect_op("=")
                sep = self.next().text[1:-1]
        self.expect_op(")")
        return EAggregate(func, expr, distinct, sep, order)


def parse_sparql(text: str):
    p = Parser(text)
    q = p.parse()
    # structural SERVICE marker (set even for SERVICE nested in
    # subqueries/OPTIONAL): Graph.sparql keys its plan cache on it —
    # SERVICE resolves through a mutable registry, so those plans must
    # never be memoized, while a query merely CONTAINING the word
    # "service" in a literal stays cacheable
    q.has_service = p.has_service
    return q
