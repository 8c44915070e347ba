"""Deterministic train/validation/test splitting with leakage control.

The step every training-data pipeline runs LAST and gets wrong most
often: a plain random split puts near-duplicate documents on both
sides of the train/eval boundary, and the eval set silently measures
memorization. The fix is to assign whole DUPLICATE CLUSTERS (or any
other leakage unit — canonical URL, apex domain, source document of
chunks) to one side.

Everything here is the portable-hash discipline of
`relational.sample_by_weight`: a row's split is a pure function of
(seed, split key) via the SQL-portable 60-bit md5 hash — one map-side
expression, no shuffle, no sampling state, reproducible across runs,
engines, cluster shapes AND corpus growth (a new document never moves
an old one between splits; an eval set stays an eval set as the
corpus grows — the property resampling-based splitters lack).

Reference scope note: the reference engine has no corpus surface;
this module is part of the driver-mandated LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60

__all__ = ["split_column", "split_by_key", "leakage_safe_split"]

#: resolution of the split boundaries (1e6 ≈ ±0.0001 fraction error)
_M = 1_000_000


def split_column(
    key: Column, fractions: dict[str, float], seed: str = "split"
) -> Column:
    """Split-name column for a key expression: the unit interval is
    cut at the cumulative fractions (sorted by split name for
    determinism) and `hash60(seed || key) % 1e6` picks the bin.
    Fractions must sum to ~1 (strict — a silent remainder would drop
    documents from every split)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative")
    u = hash60(F.concat(F.lit(seed), key.cast("string"))) % F.lit(_M)
    expr = None
    acc = 0.0
    names = sorted(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        bound = int(round(acc * _M))
        expr = (
            F.when(u < bound, F.lit(name))
            if expr is None
            else expr.when(u < bound, F.lit(name))
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def split_by_key(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add `out_col` assigning each row a split by hashing `key_col`.
    Rows SHARING a key always land in the same split — pass the
    leakage unit as the key (doc id for plain splits; cluster id,
    canonical URL, or apex domain for leakage-safe ones)."""
    return df.withColumn(
        out_col, split_column(F.col(key_col), fractions, seed)
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fractions: dict[str, float],
    pairs: DataFrame | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Split so no two (near-)duplicate documents straddle a split
    boundary.

    The leakage unit is the duplicate CLUSTER: exact duplicates group
    by their normalized-text hash for free (one column expression);
    near-duplicate `pairs` (id_a, id_b — e.g. `minhash_lsh_pairs`
    output) additionally merge via distributed connected components,
    and every member hashes the CLUSTER representative, not itself.

    100 TB shape: without `pairs` this is a pure map (zero shuffle);
    with `pairs`, components run over the PAIR set (dup-pair-sized,
    not corpus-sized) and attach with one left join — documents
    outside any pair never shuffle.
    """
    exact_key = hash60(F.col(text_col)).cast("string")
    if pairs is None:
        return df.withColumn(
            out_col, split_column(exact_key, fractions, seed)
        )
    from graphula_spark.operators.cluster import connected_components

    a, b = pairs.columns[0], pairs.columns[1]
    comp = connected_components(
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    ).select(F.col("node").alias(id_col), F.col("cluster").alias("__cl"))
    joined = df.join(comp, id_col, "left")
    # cluster members key on the representative id; singletons on
    # their exact-text hash (so byte-identical docs still co-locate)
    key = F.coalesce(F.col("__cl").cast("string"), exact_key)
    return joined.withColumn(
        out_col, split_column(key, fractions, seed)
    ).drop("__cl")
