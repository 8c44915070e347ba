"""Driver-built literal DataFrames as pure Catalyst plans.

``spark.createDataFrame(python_list)`` routes through RDD parallelize:
every slice is a pickled partition that needs a PYTHON WORKER task to
deserialize. For the driver-sized relations this engine embeds in
query plans (VALUES blocks, ASK results, broadcast model tables,
schema closures, domain lists), that is pure overhead — profiling the
RDFS closure showed each such task costing seconds of worker startup
and recurring as the straggler of every stage it appeared in (see
operators/rdfs.py round-6 notes).

``literal_df`` builds the same relation as an ``inline`` of an
array-of-structs LITERAL over a one-row range: the plan never leaves
the JVM, constant-folds, and is one partition by construction — the
right shape for something that exists to be broadcast. Above
``MAX_LITERAL_ROWS`` the literal plan's analysis cost stops being a
win and it falls back to a single-partition parallelized DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: above this many rows, fall back to a parallelized DataFrame. The
#: SQL-string literal's parse/analysis cost grows with row count;
#: measured per-query cost on a broadcast-join consumer: 0.26s at 256
#: rows and 0.33s at 1024 (beats warm parallelize ~0.4s) but 1.3s at
#: 8192 (loses). Cold sessions tilt further toward the literal — a
#: parallelize task can cost seconds of Python-worker startup.
MAX_LITERAL_ROWS = 1024

#: cap on TOTAL scalar elements (rows × flattened array width), not
#: just rows: an array-typed column embeds one CAST term per element,
#: so 1024 centroid rows of dim-512 doubles would build a ~50 MB SQL
#: string parsed single-threaded on the driver — far slower than the
#: createDataFrame it replaced (ADVICE r7, medium). The crossover by
#: element count matches the row measurements above (scalar rows ≈ a
#: few elements each; 8192 rows lost).
MAX_LITERAL_ELEMS = 8192


def _n_elems(rows) -> int:
    """Flattened scalar-element count of the literal relation (arrays
    count their length, recursively; scalars count 1; empty arrays
    count 1 for their CAST term)."""

    def n(v) -> int:
        if isinstance(v, (list, tuple)):
            return sum(n(x) for x in v) or 1
        return 1

    return sum(n(v) for row in rows for v in row)


def _split_top_level(schema: str) -> list[str]:
    """Split a schema string on TOP-LEVEL commas only: parameterized
    and nested types (`decimal(10,2)`, `array<struct<a int, b int>>`,
    `map<string,int>`) carry commas inside `()`/`<>` that a naive
    split would shred into garbage column specs (ADVICE r6)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(schema[start:i])
            start = i + 1
    parts.append(schema[start:])
    return parts


def _parse_schema(schema) -> list[tuple[str, str]]:
    if isinstance(schema, str):
        out = []
        for part in _split_top_level(schema):
            name, typ = part.strip().split(None, 1)
            out.append((name, typ.strip()))
        return out
    return [(n, t) for n, t in schema]


def _sql_value(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        # repr() gives 'nan'/'inf', which CAST does not parse (and ANSI
        # mode errors); Spark accepts these spellings
        word = "NaN" if v != v else ("Infinity" if v > 0 else "-Infinity")
        return f"CAST('{word}' AS {typ})"
    if isinstance(v, (int, float)):
        return f"CAST({v!r} AS {typ})"
    if isinstance(v, str):
        esc = (
            v.replace("\\", "\\\\")
            .replace("'", "\\'")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )
        return f"CAST('{esc}' AS {typ})"
    if isinstance(v, (list, tuple)):
        t = typ.strip()
        if not (t.lower().startswith("array<") and t.endswith(">")):
            raise TypeError(
                f"sequence literal {v!r} needs an array<...> column "
                f"type, got {typ!r}"
            )
        elem = t[6:-1].strip()
        items = ", ".join(_sql_value(x, elem) for x in v)
        # empty arrays need the cast for a typed element slot
        return f"CAST(array({items}) AS {t})" if not v else f"array({items})"
    raise TypeError(f"unsupported literal value {v!r} for literal_df")


def _escaped_string_literals(spark: SparkSession) -> bool:
    """True when the session runs Hive-1.x-compat string parsing, in
    which the SQL-literal path's escaping would be wrong. One py4j
    conf read (~ms) per literal build — noise next to the F.expr
    parse it guards."""
    return (
        spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        == "true"
    )


def literal_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``rows``: list of tuples of plain Python values (None allowed);
    ``schema``: ``"name type, name type"`` or ``[(name, type), ...]``
    with Spark SQL type names. Returns a one-partition DataFrame whose
    plan is a JVM-side literal (no Python-worker parallelize task).

    The plan is built as ONE ``F.expr`` string — building it from
    ``F.struct(F.lit(...).cast(...))`` calls costs a py4j round-trip
    per expression node (~ms each), which at a few hundred rows
    dominated the queries embedding the literal (measured ~7ms/row per
    query); a single SQL string parses JVM-side in microseconds."""
    cols = _parse_schema(schema)
    if not rows:
        return empty_df(spark, cols)
    if (
        len(rows) > MAX_LITERAL_ROWS
        or _n_elems(rows) > MAX_LITERAL_ELEMS
        or _escaped_string_literals(spark)
    ):
        # >MAX rows (or >MAX flattened ELEMENTS — array columns embed
        # one CAST term per element): the SQL literal's parse cost
        # stops winning.
        # escapedStringLiterals=true (Hive 1.x compat): _sql_value's
        # \\, \', \n escapes would pass through UN-interpreted and
        # silently corrupt every string (N-Triples lexical forms
        # routinely contain backslashes) — parameterize via
        # createDataFrame instead (ADVICE r6, medium).
        schema_str = ", ".join(f"{n} {t}" for n, t in cols)
        # one partition on BOTH paths: this relation exists to be
        # broadcast, and createDataFrame otherwise slices by
        # defaultParallelism into near-empty tasks (ADVICE r6)
        return spark.createDataFrame(rows, schema_str).coalesce(1)
    structs = ", ".join(
        "named_struct("
        + ", ".join(
            f"'{n}', {_sql_value(v, t)}" for v, (n, t) in zip(row, cols)
        )
        + ")"
        for row in rows
    )
    return spark.range(0, 1, 1, 1).select(
        F.expr(f"inline(array({structs}))")
    )


def empty_df(spark: SparkSession, schema) -> DataFrame:
    """Zero-row DataFrame with the given schema, as a JVM-side plan
    (one empty partition; no RDD parallelize)."""
    cols = _parse_schema(schema)
    return spark.range(0, 0, 1, 1).select(
        *[F.lit(None).cast(t).alias(n) for n, t in cols]
    )
