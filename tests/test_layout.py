"""Z-order layout: row-group pruning on EVERY clustered column."""

import pytest
from pyspark.sql import functions as F

from graphula_spark.operators.layout import (
    quantize_rank,
    rowgroups_touched,
    zorder_key,
    zorder_write,
)


@pytest.fixture(scope="module")
def grid(spark):
    # a 2-D uniform grid: the adversarial case for 1-D sorting
    return (
        spark.range(200_000)
        .select(
            F.col("id"),
            (F.col("id") % 1000).cast("double").alias("x"),
            (F.col("id") / 1000).cast("double").alias("y"),
        )
        # scramble so the input order carries no accidental locality
        .orderBy(F.xxhash64("id"))
    )


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], ["a", "b"])
    out = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=3).alias("z")
    ).collect()
    # a contributes even bit positions, b odd: z(3,5) with a=0b011,b=0b101
    # -> bits (j*2) from a: 1,1,0 ; bits (j*2+1) from b: 1,0,1
    # z = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5 = 1+2+4+0+0+32 = 39
    assert [r["z"] for r in out] == [0, 1, 2, 39]


def test_quantize_rank_is_equal_frequency(spark, grid):
    ranked = grid.select(quantize_rank(grid, "x", bits=2).alias("r"))
    counts = {r["r"]: r["n"] for r in ranked.groupBy("r").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    lo, hi = min(counts.values()), max(counts.values())
    assert hi <= lo * 1.3  # approx-quantile slack


def test_zorder_prunes_on_both_columns(spark, grid, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(grid, zpath, by=["x", "y"], bits=6, num_files=4, row_group_bytes=64 * 1024)
    (
        grid.repartitionByRange(4, "x")
        .sortWithinPartitions("x")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(lpath)
    )
    # a small 2-D box: 5% of the x range x 5% of the y range
    box = {"x": (100.0, 150.0), "y": (20.0, 30.0)}
    zt, ztot = rowgroups_touched(zpath, box)
    lt, ltot = rowgroups_touched(lpath, box)
    assert ztot > 16 and ltot > 16  # multiple row groups to prune
    # on a box that constrains x, the x-sorted layout also prunes well
    # — z-order must be in the same class. Parquet's writer flushes row
    # groups at nondeterministic byte boundaries, so counts jitter by
    # ±1 run-to-run: compare with one row group of slack, never exactly.
    assert zt <= lt + 1
    assert zt / ztot < 0.15

    # the case 1-D sorting cannot serve: a predicate on the OTHER
    # column only. x-sorted row groups each span all of y (near-zero
    # pruning); z-order still prunes. Same slack rationale: the control
    # layout's edge groups may exclude a sliver of y, so assert "reads
    # almost everything", not an exact count.
    ybox = {"y": (20.0, 30.0)}
    zy, _ = rowgroups_touched(zpath, ybox)
    ly, _ = rowgroups_touched(lpath, ybox)
    assert ly / ltot > 0.9  # linear layout reads ~everything
    assert zy / ztot < 0.5

    # correctness: the z-ordered copy returns the same rows
    zdf = spark.read.parquet(zpath)
    got = (
        zdf.where(
            (F.col("x").between(*box["x"])) & (F.col("y").between(*box["y"]))
        ).count()
    )
    want = (
        grid.where(
            (F.col("x").between(*box["x"])) & (F.col("y").between(*box["y"]))
        ).count()
    )
    assert got == want > 0


def test_zorder_ops_store_option(spark, tmp_path):
    """Graph.save(ops_layout='zorder'): the OPS twin clusters on the
    (p, o) Z-order curve, so ONE copy serves p-bound, o-bound and
    (p,o)-bound scans via row-group pruning — and the planner still
    routes o-bound patterns to it and returns identical results."""
    from graphula_spark.graph import Graph
    from graphula_spark.plans.bgp import TriplePattern, Var

    rows = [
        (f"s{i}", f"p{i % 37}", f"o{i % 211}")
        for i in range(60_000)
    ]
    g = Graph.from_string_triples(
        spark, spark.createDataFrame(rows, ["s", "p", "o"])
    )
    store = str(tmp_path / "zstore")
    g.save(store, ops_layout="zorder", ops_row_group_bytes=64 * 1024)
    loaded = Graph.load(spark, store)
    assert "p_bucket" not in loaded.triples_ops.columns

    # o-bound pattern: planner routes to the z-ordered twin; results
    # must match the in-memory graph exactly
    pat = [TriplePattern(Var("s"), Var("p"), "o7")]
    got = {
        (r["s"], r["p"])
        for r in loaded.execute_bgp_decoded(pat).collect()
    }
    want = {
        (r["s"], r["p"]) for r in g.execute_bgp_decoded(pat).collect()
    }
    assert got == want and len(got) > 0

    # row-group pruning holds on BOTH curve dimensions: point ranges
    # on o alone and p alone each touch a fraction of the row groups
    o_id = loaded.dictionary.lookup_terms(["o7"])["o7"]
    p_id = loaded.dictionary.lookup_terms(["p3"])["p3"]
    zt_o, ztot = rowgroups_touched(
        f"{store}/triples_ops", {"o": (o_id - 1, o_id + 1)}
    )
    zt_p, _ = rowgroups_touched(
        f"{store}/triples_ops", {"p": (p_id - 1, p_id + 1)}
    )
    assert ztot > 8  # enough row groups for pruning to mean anything
    assert zt_o / ztot < 0.5
    assert zt_p / ztot < 0.5
