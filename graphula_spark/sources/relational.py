"""Relational → triples bridge: triple-ize tabular data into a Graph.

Deterministic mapping so DuckDB oracles can reproduce results over the
original tables:

    subject   = '<table>:' || <key column value>
    predicate = column name
    object    = value rendered as a bare string
                (ints verbatim, doubles via CAST AS STRING,
                 timestamps as 'yyyy-MM-dd HH:mm:ss')

NULL values produce no triple (RDF absent-property semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, TimestampType

from graphula_spark.graph import Graph


def _render(df: DataFrame, col: str):
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return F.date_format(F.col(col), "yyyy-MM-dd HH:mm:ss")
    return F.col(col).cast("string")


def table_to_triples(df: DataFrame, table: str, key_col: str) -> DataFrame:
    """Single-scan unpivot: explode an array of (p, o) structs instead of
    a union of one scan per column — at 100 TB this reads the table once,
    not len(columns) times."""
    subject = F.concat(F.lit(f"{table}:"), F.col(key_col).cast("string"))
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("p"), _render(df, c).alias("o"))
            for c in df.columns
        ]
    )
    return (
        df.select(subject.alias("s"), F.explode(pairs).alias("po"))
        .select("s", F.col("po.p").alias("p"), F.col("po.o").alias("o"))
        .where(F.col("o").isNotNull())
    )


# table -> key column (subject identity)
TPCH_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": None,  # composite key, see below
}


def lineitem_to_triples(df: DataFrame) -> DataFrame:
    """The synthetic lineitem's (orderkey, linenumber) is NOT unique, so
    subjects are synthesized as a 128-bit full-row hash (two xxhash64
    seeds — cross-seed collision odds are negligible at any realistic
    row count) plus a row_number over the duplicate group to keep
    byte-identical rows distinct.

    Scale notes: the only shuffle is the window partitioned by the FULL
    row, whose partitions are duplicate groups (almost always size 1) —
    hash-distributed and parallel, unlike the round-1 unpartitioned
    row_number() global sort that serialized the load through one task.
    Real deployments would use the table's actual key."""
    from pyspark.sql.window import Window

    cols = [F.col(c) for c in df.columns]
    w = Window.partitionBy(*cols).orderBy(F.lit(1))
    keyed = df.withColumn(
        "__key",
        F.concat_ws(
            "-",
            F.xxhash64(*cols).cast("string"),
            F.xxhash64(F.lit("\x01"), *cols).cast("string"),
            F.row_number().over(w).cast("string"),
        ),
    )
    # materialize the keyed rows once: every consumer of the
    # triple-ized frame scans it at least twice (dictionary term pass
    # + encode pass), and the full-row window shuffle is the expensive
    # part of this lineage — one narrow-table materialization beats
    # two window shuffles (round 14, guide §1.2 step 1). It is the
    # source table + one string column; it spills rather than
    # recomputes at scale. LAZY persist + scratch.track (ADVICE r14):
    # plan-only callers no longer trigger a build job at construction
    # time, and scratch_scope callers can release the blocks.
    from pyspark import StorageLevel

    from graphula_spark.scratch import track

    keyed = track(keyed.persist(StorageLevel.MEMORY_AND_DISK))
    return table_to_triples(keyed, "lineitem", "__key").where(F.col("p") != "__key")

DEFAULT_GRAPH_TABLES = ("region", "nation", "customer", "supplier", "orders")


#: tables whose subject key column is a verified-unique primary key
#: (lineitem is NOT here: its natural key is composite and the repo's
#: synthetic lineitem violates per-column uniqueness)
_UNIQUE_KEY_TABLES = frozenset(
    t for t, k in TPCH_KEYS.items() if k is not None
)


def load_tpch_graph(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = DEFAULT_GRAPH_TABLES,
    cache: bool = True,
    assume_distinct: bool | None = None,
) -> Graph:
    """Triple-ize the TPC-H-ish testdata tables into one Graph.

    For the primary-keyed tables the triple set is distinct BY
    CONSTRUCTION — every table's subject key is unique, each row emits
    one triple per non-null column, and table prefixes keep subjects
    disjoint across tables — so the build skips the global (s, p, o)
    dedup exchange (round 14, `from_string_triples(assume_distinct=
    True)`). ``assume_distinct=None`` (default) applies that skip only
    when every requested table is in the verified-unique-key set
    (ADVICE r14: a caller-supplied table with duplicate key rows must
    not silently break the store's set-semantics invariant); pass True
    explicitly to override with caller-verified distinctness."""
    if assume_distinct is None:
        assume_distinct = all(t in _UNIQUE_KEY_TABLES for t in tables)
    all_triples: DataFrame | None = None
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        tr = table_to_triples(df, t, TPCH_KEYS[t])
        all_triples = tr if all_triples is None else all_triples.unionByName(tr)
    return Graph.from_string_triples(
        spark, all_triples, cache=cache, assume_distinct=assume_distinct
    )
