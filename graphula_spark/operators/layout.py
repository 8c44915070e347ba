"""Multi-dimensional data layout: Z-order (Morton) clustering.

A table sorted on one column gives parquet row-group min/max pruning on
that column only; queries filtering on a *different* column scan
everything. Z-ordering interleaves the bits of several columns'
quantized ranks so rows close in the multi-dimensional space land in
the same row groups — the technique behind Delta Lake's OPTIMIZE
ZORDER, implemented here as plain Spark expressions:

  1. per column: approx-quantile boundaries (driver-side, ≤2^bits
     values) quantize the column to a `bits`-bit rank via a broadcast
     range lookup — skew-proof, because equal-frequency buckets don't
     care about value distribution;
  2. bit-interleave the ranks JVM-side into one long key;
  3. repartitionByRange + sortWithinPartitions on the key, so file AND
     row-group boundaries tile the space.

At 100 TB this is a one-time (or compaction-time) layout pass that
turns multi-predicate scans from full-table into a small fraction of
row groups; the quantile sketch is the only driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_boundaries(
    df: DataFrame, cols: list[str], bits: int = 8
) -> dict[str, list[float]]:
    """Equal-frequency boundaries for every column in ONE scan —
    DataFrame.approxQuantile takes a column list and shares the pass,
    so clustering on k columns does not cost k full reads."""
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    # approxQuantile needs numeric columns; timestamps cast to epoch
    casted = df.select(
        *[F.col(c).cast("double").alias(f"__zq_{c}") for c in cols]
    )
    all_bounds = casted.approxQuantile([f"__zq_{c}" for c in cols], qs, 0.001)
    out: dict[str, list[float]] = {}
    for c, bounds in zip(cols, all_bounds):
        uniq: list[float] = []  # strictly increasing (dups collapse buckets)
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        out[c] = uniq
    return out


def _rank_column(col: str, bounds: list[float], bits: int | None = None) -> Column:
    val = F.col(col).cast("double")
    rank = F.lit(0)
    for b in bounds:
        rank = rank + F.when(val > F.lit(b), 1).otherwise(0)
    rank = rank.cast("long")
    # scale the rank to FILL the bit space: a low-cardinality column
    # (say 37 distinct values in 8 bits) otherwise leaves its high bits
    # ~always-zero and each lower bit skewed, so the interleaved curve
    # degenerates toward a 1-D sort on the other columns. Spreading the
    # ranks over 0..2^bits-1 keeps every bit level ~50/50.
    if bits is not None and bounds and len(bounds) < (1 << bits) - 1:
        scaled = rank * F.lit((1 << bits) - 1) / F.lit(len(bounds))
        rank = F.floor(scaled).cast("long")
    return rank


def quantize_rank(df: DataFrame, col: str, bits: int = 8) -> Column:
    """0..2^bits-1 equal-frequency rank of ``col`` via approx-quantile
    boundaries. Returns a Column usable on ``df``."""
    return _rank_column(col, _rank_boundaries(df, [col], bits)[col])


def zorder_key(ranks: list[Column], bits: int | list[int] = 8) -> Column:
    """Interleave the low bits of each rank column into one long Morton
    key — a pure bitwise JVM expression, no UDFs. ``bits`` may be a
    single width or one per column: columns whose rank domain is
    smaller than the default width (e.g. a low-cardinality dimension)
    should declare fewer bits, otherwise their permanently-zero high
    bits consume the key's most significant positions and the curve
    degenerates toward a 1-D sort on the deeper column.

    Bits are interleaved LSB-aligned (level j packs bit j of every
    column that has one), so for equal widths column i contributes bit
    position j*ncols+i — and for unequal widths the deeper columns'
    surplus high bits land on top, splitting coarse tiles only on the
    dimensions that actually have that much resolution.

    The total bit count must stay within the 63 value bits of a signed
    long: bit 63 is the sign bit, and Spark's ``shiftleft`` wraps shift
    counts at 64, so exceeding it would silently alias high-order bits
    into low positions and break the ordering."""
    widths = [bits] * len(ranks) if isinstance(bits, int) else list(bits)
    if len(widths) != len(ranks):
        raise ValueError("zorder_key: one bit width per rank column")
    if sum(widths) > 63:
        raise ValueError(
            f"zorder_key: {sum(widths)} total rank bits exceeds the 63 "
            "value bits of a signed long; reduce bits (or cluster on "
            "fewer columns)"
        )
    key = F.lit(0).cast("long")
    pos = 0
    for j in range(max(widths)):
        for i, r in enumerate(ranks):
            if widths[i] > j:
                bit = F.shiftrightunsigned(r.cast("long"), j).bitwiseAND(
                    F.lit(1)
                )
                key = key.bitwiseOR(F.shiftleft(bit, pos))
                pos += 1
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    by: list[str],
    bits: int = 8,
    num_files: int | None = None,
    row_group_bytes: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of the
    ``by`` columns. Row groups then carry tight min/max envelopes on
    EVERY ``by`` column, so engine-side row-group pruning works for
    any of them (and conjunctions). ``row_group_bytes`` shrinks parquet
    row groups below the 128MB default when finer pruning granularity
    is worth the metadata (tests use it; at scale the default is right).

    ``bits`` is clamped so the interleaved key fits a signed long's 63
    value bits (e.g. 8 columns => 7 bits each); extra rank resolution
    beyond that would wrap into the sign bit and corrupt the curve.
    Low-cardinality columns have their ranks SCALED to fill the bit
    space (see _rank_column): 37 distinct values left as ranks 0..36
    would park near-constant high bits in the key's most significant
    positions and degrade the curve toward a 1-D sort on the other
    columns."""
    bits = max(1, min(bits, 63 // len(by)))
    bounds = _rank_boundaries(df, by, bits)
    ranks = [_rank_column(c, bounds[c], bits) for c in by]
    keyed = df.withColumn("__zkey", zorder_key(ranks, bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    writer = (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if row_group_bytes:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(path)


def rowgroups_touched(
    path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(row groups whose min/max envelope intersects ALL predicate
    ranges, total row groups) for a parquet directory — the fraction an
    engine with row-group pruning must actually read. Driver-side
    metadata walk via pyarrow; used to *measure* layout quality, not in
    any query path."""
    import glob as _glob

    import pyarrow.parquet as pq

    touched = 0
    total = 0
    for f in _glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in predicates.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or st.min is None:
                    continue
                mn, mx = st.min, st.max
                if hasattr(mn, "timestamp"):
                    mn, mx = mn.timestamp(), mx.timestamp()
                if mx < lo or mn > hi:
                    hit = False
                    break
            if hit:
                touched += 1
    return touched, total
