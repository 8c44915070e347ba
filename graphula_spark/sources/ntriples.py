"""N-Triples source: parse .nt files into a (s, p, o) string DataFrame.

Reference parity: ``Sparql.loadNtriples`` streams the file through
NxParser and dictionary-encodes each term inside one LMDB write
transaction (sparql/.../Sparql.scala:78-113). Spark-first: the file is
a distributed text scan; parsing is JVM-side regexp (no Python in the
hot path); encoding is a later bulk join (see Graph.from_ntriples).

Term canonicalization matches the reference's verbatim-string policy
(sparql/.../jena/Transformations.scala:17-91):
- URIs are stored *without* angle brackets
- literals keep their N-Triples lexical syntax verbatim, including the
  surrounding quotes and any ``@lang`` / ``^^<type>`` suffix
- blank nodes keep their ``_:label`` form (per-file labels are assumed
  globally scoped per load call, like the reference's per-load-session
  BlankNodeNamespace, core/.../BlankNodeNamespace.scala:12-22)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One triple line:  <s> <p> <o> .   with s ∈ {IRI, blank}, o ∈ {IRI, blank, literal}
_SUBJ = r"(<[^>]*>|_:\S+)"
_PRED = r"(<[^>]*>)"
_OBJ = r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9-]*)?)'
_LINE = rf"^\s*{_SUBJ}\s+{_PRED}\s+{_OBJ}\s*\.\s*$"


def read_ntriples(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse N-Triples file(s) -> DataFrame(s: string, p: string, o: string).

    Malformed / comment / blank lines are dropped (NxParser is similarly
    lenient). Distributed: one task per input split.
    """
    # one anchored-regex match per line (rlike) + one group-extracting
    # replace, instead of three regexp_extract passes each re-running
    # the full line regex (round 14 — the parse is the CPU of a load,
    # and the anchored match means the replace rewrites the whole line
    # or nothing, so split on a control-char separator reconstructs
    # all three groups from a single pass). \x1f cannot appear inside
    # a matched term (control chars are not in the term grammar), so
    # the 3-way split is unambiguous for every line the guard admits.
    text = spark.read.text(paths).where(F.col("value").rlike(_LINE))
    parts = F.split(
        F.regexp_replace("value", _LINE, "$1\x1f$2\x1f$3"), "\x1f"
    )

    def norm(col):
        return F.when(
            col.startswith("<"),
            col.substr(F.lit(2), F.length(col) - 2),
        ).otherwise(col)

    def term(i: int):
        # per-row fallback: a (spec-invalid but previously tolerated)
        # term containing a literal \x1f makes the split ambiguous —
        # those rows alone re-run the per-group extract; every clean
        # row takes the single-pass split (when() short-circuits)
        return F.when(
            F.size(parts) == 3, parts[i]
        ).otherwise(F.regexp_extract("value", _LINE, i + 1))

    return text.select(
        norm(term(0)).alias("s"),
        norm(term(1)).alias("p"),
        norm(term(2)).alias("o"),
    )


# N-Quads: same terms plus an optional graph label (IRI or blank node)
# before the terminating dot. NxParser (the reference's parser,
# Sparql.scala:78-113) accepts both syntaxes; so do we.
_GRAPH = r"(<[^>]*>|_:\S+)?"
_QLINE = rf"^\s*{_SUBJ}\s+{_PRED}\s+{_OBJ}(?:\s+{_GRAPH})?\s*\.\s*$"


def read_nquads(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse N-Quads file(s) -> DataFrame(s, p, o, g: string).

    `g` is null for triple-syntax lines (the default graph), so a plain
    .nt file parses identically to `read_ntriples` plus a null graph
    column. The store itself is triple-shaped (the reference has no
    named-graph support either); callers that want a union-of-graphs
    view feed `df.select("s","p","o")` to Graph construction, and the
    graph label stays available for per-graph filtering before load.
    """
    text = spark.read.text(paths)
    parsed = text.select(
        F.regexp_extract("value", _QLINE, 1).alias("s_raw"),
        F.regexp_extract("value", _QLINE, 2).alias("p_raw"),
        F.regexp_extract("value", _QLINE, 3).alias("o_raw"),
        F.regexp_extract("value", _QLINE, 4).alias("g_raw"),
    ).where((F.col("s_raw") != "") & (F.col("p_raw") != "") & (F.col("o_raw") != ""))

    def norm(c: str):
        col = F.col(c)
        return F.when(
            col.startswith("<"),
            F.expr(f"substring({c}, 2, length({c}) - 2)"),
        ).otherwise(col)

    return parsed.select(
        norm("s_raw").alias("s"),
        norm("p_raw").alias("p"),
        norm("o_raw").alias("o"),
        F.when(F.col("g_raw") == "", F.lit(None).cast("string"))
        .otherwise(norm("g_raw"))
        .alias("g"),
    )


def _nt_term(c: str, subject_position: bool = False):
    """Column expression serializing a verbatim term back to N-Triples/
    N-Quads syntax: blanks and literals pass through, IRIs get angle
    brackets. Shared by the .nt and .nq sinks so the policy cannot
    diverge."""
    col = F.col(c)
    keep = col.startswith("_:") if subject_position else (
        col.startswith("_:") | col.startswith('"')
    )
    return F.when(keep, col).otherwise(F.concat(F.lit("<"), col, F.lit(">")))


def format_ntriples(df: DataFrame) -> DataFrame:
    """Serialize a (s, p, o) string DataFrame back to N-Triples lines —
    the export sink matching `read_ntriples`'s verbatim-term policy:
    IRIs get re-wrapped in angle brackets, blank nodes (`_:...`) and
    literals (leading `"`) are already in N-Triples syntax. Returns a
    single-column (`value`) DataFrame ready for `write.text` — a
    distributed text sink, one file per partition.
    """
    term = _nt_term
    return df.select(
        F.concat(
            term("s", subject_position=True),
            F.lit(" "),
            F.concat(F.lit("<"), F.col("p"), F.lit(">")),
            F.lit(" "),
            term("o"),
            F.lit(" ."),
        ).alias("value")
    )


def write_ntriples(graph, path: str) -> None:
    """Export a Graph's triples as N-Triples text files (decoded via
    the late-materialization path, then serialized distributed). The
    reference has no export path at all; round-trips through
    `read_ntriples` exactly."""
    decoded = graph.decode(graph.triples, ["s", "p", "o"])
    format_ntriples(decoded.select("s", "p", "o")).write.mode(
        "overwrite"
    ).text(path)


def write_nquads(dataset, path: str) -> None:
    """Export a Dataset's quads as N-Quads text files: default-graph
    rows serialize as plain triples (valid N-Quads), named-graph rows
    carry their graph IRI as the fourth term. Round-trips through
    `read_nquads` exactly."""
    d = dataset.dictionary
    decoded = dataset.quads
    for c in ("s", "p", "o"):
        decoded = d.decode_col(decoded, c)
    # g is nullable (default graph) — decode only bound ids
    named = d.decode_col(decoded.where(F.col("g").isNotNull()), "g")
    dflt = decoded.where(F.col("g").isNull()).select("s", "p", "o")

    named_lines = named.select(
        F.concat(
            _nt_term("s", subject_position=True),
            F.lit(" "),
            F.concat(F.lit("<"), F.col("p"), F.lit(">")),
            F.lit(" "),
            _nt_term("o"),
            F.lit(" "),
            # graph labels may be blank nodes (read_nquads accepts them)
            _nt_term("g", subject_position=True),
            F.lit(" ."),
        ).alias("value")
    )
    dflt_lines = format_ntriples(dflt)
    named_lines.unionByName(dflt_lines).write.mode("overwrite").text(path)
