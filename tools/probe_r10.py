#!/usr/bin/env python
"""Round-10 probe: shuffle bytes of (A) the reps-mode exact collapse
at high duplicate multiplicity and (B) a streaming DELETE batch
against a ~20M-triple published store.

A. `embedding_near_dup_reps` (VERDICT r9 #5 done-gate): 2M rows, 32-d
   vectors, duplicate multiplicity 100 (20k unique vectors) across 100
   blocks — the regime the operator exists for.
     NEW  — round-10 shape: map-side-combined groupBy(blk, v) collapse
            (duplicates dedup inside map tasks), xxhash64 fan-back (no
            vector crosses that shuffle).
     OLD  — round-9 shape, replicated inline: Window.partitionBy(blk,
            v) over every raw row — the full vector payload shuffles
            AND sorts.
   Outputs must agree row-exact (exceptAll both ways); BYTES MOVED is
   the metric — local[32] wall time hides shuffle volume at page-cache
   speed.

B. `stream_ntriples_delete` (VERDICT r9 #4): a 1000-victim delete
   micro-batch against a published CLOSED store of 10M asserted type
   triples + their 10M derived memberships (ρdf subClassOf). Expected:
   O(batch ∪ affected) shuffle — victims broadcast, corpus streams —
   and a del-delta on disk that is KB-sized, not store-sized. The
   published snapshot must stay closed (the deleted assertions leave;
   their derived memberships remain set members).

Run:  PYTHONPATH=/root/repo python tools/probe_r10.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from tools.probe_r8 import get_probe_spark, measure  # noqa: E402

N_ROWS = 2_000_000
N_UNIQUE = 20_000
N_BLOCKS = 100
DIM = 32

N_TYPED = 10_000_000
N_VICTIMS = 1_000


def build_vectors(spark):
    """2M (vec_id, label, embedding) rows; the vector is a
    deterministic JVM-side function of vec_id % N_UNIQUE, so each
    unique vector repeats ~100×. Unit-incomparable random-ish values:
    distinct vectors essentially never pass the 0.95 threshold, so the
    probe isolates the COLLAPSE cost (the operator's dominant stage at
    high multiplicity)."""
    base = spark.range(N_ROWS).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % N_BLOCKS).alias("label"),
        (F.col("id") % N_UNIQUE).alias("uk"),
    )
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("uk") * F.lit(97) + i), F.lit(1000))
            .cast("double")
            / F.lit(500.0)
            - F.lit(1.0)
        ),
    )
    return base.select("vec_id", "label", vec.alias("embedding"))


def old_reps(df):
    """The round-9 window shape, verbatim (for A/B)."""
    from graphula_spark.operators.ann import _dot, _norm, _unit
    from graphula_spark.operators.cluster import connected_components

    par = df.sparkSession.sparkContext.defaultParallelism
    m = df.repartition(par, "vec_id").select(
        F.col("vec_id").alias("id"),
        F.col("label").alias("blk"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    grp = Window.partitionBy("blk", "v")
    m2 = m.withColumn(
        "rep",
        F.when(_norm(F.col("v")) > 0, F.min("id").over(grp)).otherwise(
            F.col("id")
        ),
    ).persist()
    uniq = m2.where(F.col("id") == F.col("rep")).select("id", "blk", "v")
    nv = (
        uniq.withColumn("n", _norm(F.col("v")))
        .withColumn("v", _unit(F.col("v"), F.col("n")))
        .drop("n")
    )
    a = nv.select(F.col("id").alias("id_a"), "blk", F.col("v").alias("va"))
    b = nv.select(F.col("id").alias("id_b"), "blk", F.col("v").alias("vb"))
    pairs = (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(_dot(F.col("va"), F.col("vb")) >= F.lit(0.95))
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    comp = connected_components(pairs, "id_a", "id_b")
    out = (
        m2.join(
            comp.select(F.col("node").alias("rep"), F.col("cluster").alias("g")),
            "rep",
            "left",
        )
        .select(
            F.col("id").alias("vec_id"),
            F.coalesce(F.col("g"), F.col("rep")).alias("representative"),
        )
        .localCheckpoint(eager=True)
    )
    m2.unpersist()
    return out


def probe_reps(spark):
    from graphula_spark.operators.ann import embedding_near_dup_reps

    df = build_vectors(spark).persist()
    df.count()  # generation outside the measured window

    holder = {}

    def run_new():
        holder["new"] = embedding_near_dup_reps(
            df, threshold=0.95
        ).localCheckpoint(eager=True)
        holder["new"].count()

    def run_old():
        holder["old"] = old_reps(df)
        holder["old"].count()

    _, new_b = measure(spark, "NEW reps collapse (hash-group fan-back)", run_new)
    _, old_b = measure(spark, "OLD reps collapse (raw-vector window)", run_old)
    n, o = holder["new"], holder["old"]
    assert n.count() == N_ROWS and o.count() == N_ROWS
    assert n.exceptAll(o).isEmpty() and o.exceptAll(n).isEmpty()
    print(
        f"\nReps verdict: NEW shuffles {new_b/1e6:.1f} MB vs OLD "
        f"{old_b/1e6:.1f} MB ({old_b/max(new_b,1):.0f}x) at dup "
        f"multiplicity {N_ROWS // N_UNIQUE}; outputs row-exact."
    )
    df.unpersist()


def build_store(spark, store_dir):
    """Published versioned store: 10M (s type C1) + schema C1⊑C2
    (closed: + 10M derived (s type C2))."""
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS

    subj = F.concat(F.lit("http://e/n"), F.col("id").cast("string"))
    t1 = spark.range(N_TYPED).select(
        subj.alias("s"), F.lit(RDF_TYPE).alias("p"), F.lit("http://e/C1").alias("o")
    )
    t2 = spark.range(N_TYPED).select(
        subj.alias("s"), F.lit(RDF_TYPE).alias("p"), F.lit("http://e/C2").alias("o")
    )
    sch = spark.range(0, 1, 1, 1).select(
        F.lit("http://e/C1").alias("s"),
        F.lit(RDFS_SUBCLASS).alias("p"),
        F.lit("http://e/C2").alias("o"),
    )
    g = Graph.from_string_triples(
        spark, t1.unionByName(t2).unionByName(sch), cache=False
    )
    os.makedirs(store_dir, exist_ok=True)
    g.save(f"{store_dir}/base_0")
    with open(f"{store_dir}/CURRENT", "w") as fh:
        fh.write(json.dumps({"base": "base_0", "deltas": [], "log": []}))


def probe_stream_delete(spark):
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import RDF_TYPE
    from graphula_spark.streaming.ingest import (
        read_manifest,
        stream_ntriples_delete,
    )

    tmp = tempfile.mkdtemp(prefix="probe_r10_")
    store = f"{tmp}/store"
    dfeed = f"{tmp}/dfeed"
    os.makedirs(dfeed)
    print("\nbuilding 20M-triple published store (untimed)...")
    build_store(spark, store)
    # delete 1000 ASSERTED rows: they leave; their derived memberships
    # remain set members (rederivability via the remaining schema only)
    lines = "".join(
        f"<http://e/n{i}> <{RDF_TYPE}> <http://e/C1> .\n"
        for i in range(N_VICTIMS)
    )
    with open(f"{dfeed}/d1.nt", "w") as fh:
        fh.write(lines)

    def run_delete():
        q = stream_ntriples_delete(
            spark, dfeed, store, f"{tmp}/ck",
            query_name="probe_delete", entailment="rdfs",
        )
        q.processAllAvailable()
        q.stop()

    _, del_b = measure(spark, "STREAM delete batch (1000 victims @ 20M store)", run_delete)
    m = read_manifest(store)
    assert [e["op"] for e in m["log"]] == ["del"], m
    delta_dir = f"{store}/{m['log'][0]['dir']}"
    delta_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(delta_dir)
        for f in fs
    )
    g = Graph.load(spark, store)
    n_after = g.triples.count()
    assert n_after == 2 * N_TYPED + 1 - N_VICTIMS, n_after
    # spot-check closure honesty: a victim's derived membership stays
    probe = g.dictionary.lookup_terms(["http://e/n0", "http://e/C2"])
    assert len(probe) == 2  # terms still live; full closure checks in tests
    print(
        f"\nStream-delete verdict: {del_b/1e6:.1f} MB shuffled and a "
        f"{delta_bytes/1e3:.0f} KB del-delta published to remove "
        f"{N_VICTIMS} victims from a {2*N_TYPED+1:,}-triple store "
        f"(O(batch), not O(store)); snapshot row count exact."
    )
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_probe_spark()
    spark.sparkContext.setLogLevel("ERROR")
    probe_reps(spark)
    probe_stream_delete(spark)


if __name__ == "__main__":
    main()
