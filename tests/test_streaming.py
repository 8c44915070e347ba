"""Structured Streaming tests: windowed agg parity, watermark late-data
drop across real micro-batches, stateful operator."""

from datetime import datetime

import time

import pytest
from pyspark.sql import functions as F


def ts(s):
    return datetime.fromisoformat(s)


def test_stream_batch_parity(spark, tmp_path):
    """The same transform over readStream equals the batch run."""
    from graphula_spark.streaming.windows import (
        run_stream_over_parquet,
        tumbling_window_agg,
    )

    rows = [
        (1, ts("2024-01-01T10:05:00"), 7, "click", 1.0, "{}"),
        (2, ts("2024-01-01T10:55:00"), 7, "click", 2.0, "{}"),
        (3, ts("2024-01-01T11:05:00"), 8, "view", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events_parquet")
    df.write.parquet(path)
    got = run_stream_over_parquet(
        spark, path, tumbling_window_agg, "parity_test"
    )
    batch = tumbling_window_agg(spark.read.parquet(path))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_watermark_drops_late_data(spark, tmp_path):
    from graphula_spark.streaming.windows import tumbling_window_agg

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]).coalesce(1).write.parquet(str(src / name))

    # batch 1: one 10:00-window event + an 11:30 event that advances the
    # watermark (10min delay) past the 10:00 window's end
    write_batch("b1", [
        (1, ts("2024-01-01T10:05:00"), 1, "click", 1.0, "{}"),
        (2, ts("2024-01-01T11:30:00"), 1, "click", 1.0, "{}"),
    ])
    schema = spark.read.parquet(str(src / "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")  # append emits only watermark-closed windows
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2: a late event for the already-closed 10:00 window
    write_batch("b2", [
        (3, ts("2024-01-01T10:06:00"), 1, "click", 1.0, "{}"),
        (4, ts("2024-01-01T13:00:00"), 1, "click", 1.0, "{}"),
    ])
    q.processAllAvailable()
    q.stop()
    out = {
        (r["ws"], r["n"]) for r in spark.table("late_test").collect()
    }
    # the 10:00 window was finalized with n=1; the late event (id=3) was
    # dropped, not re-emitted as n=2
    assert (ts("2024-01-01T10:00:00"), 1) in out
    assert (ts("2024-01-01T10:00:00"), 2) not in out


def test_stateful_running_totals_batch_equivalence(spark, tmp_path):
    from graphula_spark.streaming.stateful import run_stateful_over_parquet

    rows = [
        (1, ts("2024-01-01T10:00:00"), 1, "click", 1.5, "{}"),
        (2, ts("2024-01-01T10:01:00"), 1, "view", 2.5, "{}"),
        (3, ts("2024-01-01T10:02:00"), 2, "click", 10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    got = {
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in run_stateful_over_parquet(spark, path, "stateful_unit").collect()
    }
    assert got == {(1, 2, 4.0), (2, 1, 10.0)}


def test_streaming_ntriples_ingest(spark, tmp_path):
    """Two micro-batches of .nt files accumulate into one queryable,
    persisted graph with set semantics across batches."""
    from graphula_spark.graph import Graph
    from graphula_spark.plans.bgp import TriplePattern, Var
    from graphula_spark.streaming.ingest import stream_ntriples_ingest

    src = tmp_path / "feed"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    (src / "b1.nt").write_text(
        "<http://e/a> <http://e/knows> <http://e/b> .\n"
        "<http://e/b> <http://e/knows> <http://e/c> .\n"
    )
    q = stream_ntriples_ingest(spark, str(src), store, ckpt)
    q.processAllAvailable()

    g1 = Graph.load(spark, store)
    X, Y = Var("X"), Var("Y")
    assert g1.count_bgp([TriplePattern(X, "http://e/knows", Y)]) == 2

    # batch 2: one new triple + one duplicate (idempotent)
    (src / "b2.nt").write_text(
        "<http://e/c> <http://e/knows> <http://e/d> .\n"
        "<http://e/a> <http://e/knows> <http://e/b> .\n"
    )
    q.processAllAvailable()
    q.stop()

    g2 = Graph.load(spark, store)
    got = {
        (r["X"], r["Y"])
        for r in g2.execute_bgp_decoded(
            [TriplePattern(X, "http://e/knows", Y)]
        ).collect()
    }
    assert got == {
        ("http://e/a", "http://e/b"),
        ("http://e/b", "http://e/c"),
        ("http://e/c", "http://e/d"),
    }
    # batch 2 wrote a DELTA (O(batch) write amplification), not a rewrite
    from graphula_spark.streaming.ingest import read_manifest

    m = read_manifest(store)
    assert m["base"].startswith("base_") and len(m["deltas"]) == 1


def test_streaming_ingest_compaction(spark, tmp_path):
    """With compact_every=2 the second delta triggers compaction into a
    fresh base; data survives and old dirs are GC'd down to the bounded
    keep-set."""
    import os

    from graphula_spark.graph import Graph
    from graphula_spark.plans.bgp import TriplePattern, Var
    from graphula_spark.streaming.ingest import (
        read_manifest,
        stream_ntriples_ingest,
    )

    src = tmp_path / "feed"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    q = None
    try:
        (src / "b1.nt").write_text("<http://e/a> <http://e/p> <http://e/b> .\n")
        q = stream_ntriples_ingest(
            spark, str(src), store, ckpt, query_name="ingest_compact",
            compact_every=2,
        )
        q.processAllAvailable()
        (src / "b2.nt").write_text("<http://e/b> <http://e/p> <http://e/c> .\n")
        q.processAllAvailable()
        (src / "b3.nt").write_text("<http://e/c> <http://e/p> <http://e/d> .\n")
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()

    m = read_manifest(store)
    # b2 made delta #1, b3 made delta #2 -> compacted into a new base
    assert m["deltas"] == [] and m["base"] == "base_2"
    X, Y = Var("X"), Var("Y")
    g = Graph.load(spark, store)
    got = {
        (r["X"], r["Y"])
        for r in g.execute_bgp_decoded([TriplePattern(X, "http://e/p", Y)]).collect()
    }
    assert got == {
        ("http://e/a", "http://e/b"),
        ("http://e/b", "http://e/c"),
        ("http://e/c", "http://e/d"),
    }
    # GC bounded: only dirs referenced by current or previous manifest remain
    dirs = {d for d in os.listdir(store) if os.path.isdir(f"{store}/{d}")}
    assert "base_2" in dirs and len(dirs) <= 4


def test_streaming_dedup_drops_replays(spark, tmp_path):
    """streaming_dedup over a replayed event feed: duplicates of the
    same event_id survive exactly once; batch dropDuplicates agrees on
    the surviving key set."""
    import datetime

    from pyspark.sql import functions as F

    from graphula_spark.sources.events import open_event_stream
    from graphula_spark.streaming.windows import streaming_dedup

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(20):
        ts = base + datetime.timedelta(minutes=i)
        rows.append((i % 8, ts, 1.0 * i))  # ids 0..7 replayed 2-3x
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    path = str(tmp_path / "replays.parquet")
    df.write.parquet(path)

    stream = open_event_stream(spark, path)
    out = streaming_dedup(stream, ["event_id"], "ts", "1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream").select("event_id")
    assert got.count() == 8
    assert {r["event_id"] for r in got.collect()} == set(range(8))


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermark-bounded stream-stream join equals the batch run of the
    same interval join (view -> purchase attribution within 30 min)."""
    from graphula_spark.streaming.joins import (
        interval_join,
        run_interval_join_stream,
    )

    rows = [
        # user 7: view at 10:00, purchases at 10:10 (in) and 11:00 (out)
        (1, ts("2024-01-01T10:00:00"), 7, "view", 1.0, "{}"),
        (2, ts("2024-01-01T10:10:00"), 7, "purchase", 9.0, "{}"),
        (3, ts("2024-01-01T11:00:00"), 7, "purchase", 5.0, "{}"),
        # user 8: purchase BEFORE the view — must not match
        (4, ts("2024-01-01T09:50:00"), 8, "purchase", 2.0, "{}"),
        (5, ts("2024-01-01T10:00:00"), 8, "view", 1.0, "{}"),
        # user 9: two views, one purchase in both windows -> two matches
        (6, ts("2024-01-01T10:00:00"), 9, "view", 1.0, "{}"),
        (7, ts("2024-01-01T10:05:00"), 9, "view", 1.0, "{}"),
        (8, ts("2024-01-01T10:20:00"), 9, "purchase", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "ssj_events")
    df.write.parquet(path)

    got = run_interval_join_stream(
        spark, path, "view", "purchase", query_name="ssj_test"
    )
    pairs = sorted(
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in got.collect()
    )
    assert pairs == [(7, 1, 2), (9, 6, 8), (9, 7, 8)]

    # batch run of the identical operator matches the streaming result
    ev = spark.read.parquet(path)
    batch = interval_join(
        ev.where("event_type = 'view'"),
        ev.where("event_type = 'purchase'"),
        "user_id",
    )
    bpairs = sorted(
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in batch.collect()
    )
    assert bpairs == pairs


def test_interval_join_left_outer(spark, tmp_path):
    from graphula_spark.streaming.joins import interval_join

    rows = [
        (1, ts("2024-01-01T10:00:00"), 7, "view", 1.0, "{}"),
        (2, ts("2024-01-01T10:10:00"), 7, "purchase", 9.0, "{}"),
        (3, ts("2024-01-01T10:00:00"), 8, "view", 1.0, "{}"),  # no purchase
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = interval_join(
        ev.where("event_type = 'view'"),
        ev.where("event_type = 'purchase'"),
        "user_id",
        how="left_outer",
    )
    got = sorted((r["user_id"], r["l_event_id"], r["r_event_id"])
                 for r in out.collect())
    assert got == [(7, 1, 2), (8, 3, None)]


def test_streaming_ingest_with_incremental_entailment(spark, tmp_path):
    """entailment='rdfs' keeps every published snapshot CLOSED: batch 1
    (schema + data) closes into the base; a data-only batch 2 lands
    batch ∪ its closure additions as an O(batch) DELTA; a schema-
    bearing batch 3 triggers the full re-close into a fresh base.
    Every snapshot equals materialize() of all strings seen so far."""
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS
    from graphula_spark.streaming.ingest import (
        read_manifest,
        stream_ntriples_ingest,
    )

    SC = RDFS_SUBCLASS
    T = RDF_TYPE
    src = tmp_path / "feed"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def snap(g):
        return {
            tuple(r)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    def full(lines):
        df = spark.createDataFrame(
            [tuple(ln.split(" ")[:3]) for ln in lines], ["s", "p", "o"]
        )
        return snap(
            Graph.from_string_triples(
                spark,
                df.select(
                    *[
                        F.regexp_replace(c, "[<>]", "").alias(c)
                        for c in ("s", "p", "o")
                    ]
                ),
            ).materialize_rdfs()
        )

    b1 = [
        f"<http://e/Prof> <{SC}> <http://e/Person> .",
        f"<http://e/ann> <{T}> <http://e/Prof> .",
    ]
    (src / "b1.nt").write_text("\n".join(b1) + "\n")
    q = stream_ntriples_ingest(
        spark, str(src), store, ckpt,
        query_name="ingest_entail", entailment="rdfs",
    )
    q.processAllAvailable()
    assert snap(Graph.load(spark, store)) == full(b1)  # base is closed

    # data-only batch: delta carries the batch AND its closure rows
    b2 = [f"<http://e/bob> <{T}> <http://e/Prof> ."]
    (src / "b2.nt").write_text("\n".join(b2) + "\n")
    q.processAllAvailable()
    g2 = Graph.load(spark, store)
    assert snap(g2) == full(b1 + b2)
    got2 = snap(g2)
    assert ("http://e/bob", T, "http://e/Person") in got2  # derived
    m = read_manifest(store)
    assert len(m["deltas"]) == 1  # O(batch) delta, no base rewrite

    # schema-bearing batch: full re-close into a fresh base — corpus
    # individuals climb the NEW edge
    b3 = [f"<http://e/Person> <{SC}> <http://e/Agent> ."]
    (src / "b3.nt").write_text("\n".join(b3) + "\n")
    q.processAllAvailable()
    q.stop()
    g3 = Graph.load(spark, store)
    got3 = snap(g3)
    assert got3 == full(b1 + b2 + b3)
    assert ("http://e/ann", T, "http://e/Agent") in got3
    assert ("http://e/bob", T, "http://e/Agent") in got3
    m3 = read_manifest(store)
    assert m3["deltas"] == []  # compacted into a fresh closed base


def test_streaming_delete_feed_ordered_log(spark, tmp_path):
    """Streaming DELETE feed (round 10): del micro-batches publish
    `del_<id>` entries in the manifest's ORDERED log, readers fold
    base → adds → dels in order, and a delete-then-reinsert survives
    (the case unordered adds∖dels set algebra gets wrong)."""
    from graphula_spark.graph import Graph
    from graphula_spark.streaming.ingest import (
        read_manifest,
        stream_ntriples_delete,
        stream_ntriples_ingest,
    )

    src = tmp_path / "feed"
    src.mkdir()
    dsrc = tmp_path / "dfeed"
    dsrc.mkdir()
    store = str(tmp_path / "store")

    def snap():
        g = Graph.load(spark, store)
        return {
            tuple(r)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    t = lambda s, p, o: (f"http://e/{s}", f"http://e/{p}", f"http://e/{o}")  # noqa: E731
    line = lambda tr: f"<{tr[0]}> <{tr[1]}> <{tr[2]}> ."  # noqa: E731

    base = [t("a", "p", "b"), t("b", "p", "c"), t("c", "p", "d")]
    (src / "b1.nt").write_text("\n".join(line(x) for x in base) + "\n")
    q = stream_ntriples_ingest(
        spark, str(src), store, str(tmp_path / "ck1"), query_name="ing1"
    )
    q.processAllAvailable()
    q.stop()
    assert snap() == set(base)

    # delete one triple; also one NON-asserted victim (ignored)
    (dsrc / "d1.nt").write_text(
        line(t("b", "p", "c")) + "\n" + line(t("x", "p", "y")) + "\n"
    )
    dq = stream_ntriples_delete(
        spark, str(dsrc), store, str(tmp_path / "ck2"), query_name="del1",
        compact_every=10,
    )
    dq.processAllAvailable()
    dq.stop()
    assert snap() == set(base) - {t("b", "p", "c")}
    m = read_manifest(store)
    assert [e["op"] for e in m["log"]] == ["del"]

    # REINSERT the deleted triple via a fresh ingest stream — the
    # ordered log must let it survive (add lands AFTER the del)
    (src / "b2.nt").write_text(line(t("b", "p", "c")) + "\n")
    q2 = stream_ntriples_ingest(
        spark, str(src), store, str(tmp_path / "ck3"), query_name="ing2"
    )
    q2.processAllAvailable()
    q2.stop()
    assert snap() == set(base)
    m2 = read_manifest(store)
    assert [e["op"] for e in m2["log"]] == ["del", "add"]

    # another delete batch triggers compaction (compact_every=3): the
    # folded view lands in a fresh base, log resets, rows exact.
    # NOTE: same checkpoint as del1 — a fresh one would re-process
    # d1.nt (streaming-source semantics), re-deleting the reinserted
    # triple
    (dsrc / "d2.nt").write_text(line(t("a", "p", "b")) + "\n")
    dq2 = stream_ntriples_delete(
        spark, str(dsrc), store, str(tmp_path / "ck2"), query_name="del2",
        compact_every=3,
    )
    dq2.processAllAvailable()
    dq2.stop()
    assert snap() == {t("b", "p", "c"), t("c", "p", "d")}
    m3 = read_manifest(store)
    assert m3["log"] == [] and m3["deltas"] == []


def test_streaming_delete_with_entailment(spark, tmp_path):
    """VERDICT r9 #4: a delete feed against a published CLOSED
    snapshot, composed with decremental maintenance — 3 micro-batches,
    each published snapshot row-exact vs REMATERIALIZE-FROM-SCRATCH of
    (previous snapshot ∖ victims), and closed after every batch:
      d1 deletes a DERIVED row that rederives (no-op on the closure);
      d2 deletes its derivation SOURCE (source leaves, derived row
         stays a set member);
      d3 bulk-deletes another individual's assertion AND its derived
         memberships (all leave)."""
    from graphula_spark.graph import Graph
    from graphula_spark.operators.rdfs import RDF_TYPE, RDFS_SUBCLASS
    from graphula_spark.streaming.ingest import (
        stream_ntriples_delete,
        stream_ntriples_ingest,
    )

    SC, T = RDFS_SUBCLASS, RDF_TYPE
    src = tmp_path / "feed"
    src.mkdir()
    dsrc = tmp_path / "dfeed"
    dsrc.mkdir()
    store = str(tmp_path / "store")

    def snap():
        g = Graph.load(spark, store)
        return {
            tuple(r)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    def rematerialize(strings: set) -> set:
        g = Graph.from_string_triples(
            spark, spark.createDataFrame(sorted(strings), ["s", "p", "o"])
        ).materialize_rdfs()
        return {
            tuple(r)
            for r in g.decode(
                g.triples.select("s", "p", "o"), ["s", "p", "o"]
            ).collect()
        }

    b1 = [
        f"<http://e/Prof> <{SC}> <http://e/Person> .",
        f"<http://e/ann> <{T}> <http://e/Prof> .",
        f"<http://e/bob> <{T}> <http://e/Prof> .",
    ]
    (src / "b1.nt").write_text("\n".join(b1) + "\n")
    q = stream_ntriples_ingest(
        spark, str(src), store, str(tmp_path / "cki"),
        query_name="ing_e", entailment="rdfs",
    )
    q.processAllAvailable()
    q.stop()
    state = snap()  # closed base
    assert ("http://e/ann", T, "http://e/Person") in state

    dq = stream_ntriples_delete(
        spark, str(dsrc), store, str(tmp_path / "ckd"),
        query_name="del_e", entailment="rdfs", compact_every=10,
    )

    # d1: derived & rederivable — the published closure is UNCHANGED
    (dsrc / "d1.nt").write_text(
        f"<http://e/ann> <{T}> <http://e/Person> .\n"
    )
    dq.processAllAvailable()
    v1 = {("http://e/ann", T, "http://e/Person")}
    assert snap() == rematerialize(state - v1) == state

    # d2: the derivation source — it leaves, the derived row stays
    (dsrc / "d2.nt").write_text(f"<http://e/ann> <{T}> <http://e/Prof> .\n")
    dq.processAllAvailable()
    v2 = {("http://e/ann", T, "http://e/Prof")}
    state2 = snap()
    assert state2 == rematerialize(state - v2)
    assert ("http://e/ann", T, "http://e/Prof") not in state2
    assert ("http://e/ann", T, "http://e/Person") in state2

    # d3: bulk delete of bob's assertion AND derived membership
    (dsrc / "d3.nt").write_text(
        f"<http://e/bob> <{T}> <http://e/Prof> .\n"
        f"<http://e/bob> <{T}> <http://e/Person> .\n"
    )
    dq.processAllAvailable()
    dq.stop()
    v3 = {
        ("http://e/bob", T, "http://e/Prof"),
        ("http://e/bob", T, "http://e/Person"),
    }
    state3 = snap()
    assert state3 == rematerialize(state2 - v3)
    assert not any(s == "http://e/bob" for s, _p, _o in state3)
    # closure invariant after every batch: materialize is a fixpoint
    g3 = Graph.load(spark, store)
    from graphula_spark.operators.rdfs import materialize

    assert materialize(g3).triples.count() == g3.triples.count()


def test_store_lock_serializes_concurrent_publishes(tmp_path):
    """Round 11 (advisor-reported): concurrent ingest and delete
    streams each did an unlocked read-modify-write of CURRENT, so one
    log entry could be silently lost. `_store_lock` must serialize the
    whole read→modify→publish section across threads."""
    import json
    import threading

    from graphula_spark.streaming.ingest import (
        _publish,
        _store_lock,
        read_manifest,
    )

    store = str(tmp_path / "store")
    with _store_lock(store):
        # read_manifest validates the base dir exists
        (tmp_path / "store" / "base_0").mkdir()
        _publish(store, {"base": "base_0", "deltas": [], "log": []}, None)

    n_writers, n_appends = 8, 10
    barrier = threading.Barrier(n_writers)

    def writer(wid: int):
        barrier.wait()
        for i in range(n_appends):
            with _store_lock(store):
                cur = read_manifest(store)
                log = [*cur["log"], {"dir": f"w{wid}_{i}", "op": "add"}]
                _publish(
                    store,
                    {"base": cur["base"], "deltas": cur["deltas"],
                     "log": log},
                    cur,
                )

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    final = read_manifest(store)
    # every append survived: no lost updates
    assert len(final["log"]) == n_writers * n_appends
    dirs = [e["dir"] for e in final["log"]]
    assert len(set(dirs)) == n_writers * n_appends
    # per-writer order preserved (each writer appended under the lock)
    for w in range(n_writers):
        mine = [d for d in dirs if d.startswith(f"w{w}_")]
        assert mine == [f"w{w}_{i}" for i in range(n_appends)]


def test_concurrent_ingest_and_delete_streams(spark, tmp_path):
    """Round 11 (advisor-reported race, end-to-end): an ingest stream
    and a delete stream run CONCURRENTLY against one store — both
    alive at once, batches interleaving — and the per-store lock must
    keep every log entry (the unlocked read-modify-write silently
    dropped one side's publish). Final state must equal the serial
    fold regardless of interleaving: all inserted triples minus the
    deleted ones (the delete feed only removes triples from the
    initial base, so any batch interleaving yields the same set)."""
    from graphula_spark.graph import Graph
    from graphula_spark.streaming.ingest import (
        read_manifest,
        stream_ntriples_delete,
        stream_ntriples_ingest,
    )

    src = tmp_path / "feed"
    src.mkdir()
    dsrc = tmp_path / "dfeed"
    dsrc.mkdir()
    store = str(tmp_path / "store")

    t = lambda s, p, o: (f"http://e/{s}", f"http://e/{p}", f"http://e/{o}")  # noqa: E731
    line = lambda tr: f"<{tr[0]}> <{tr[1]}> <{tr[2]}> ."  # noqa: E731

    base = [t(f"b{i}", "p", f"c{i}") for i in range(6)]
    (src / "b0.nt").write_text("\n".join(line(x) for x in base) + "\n")
    q = stream_ntriples_ingest(
        spark, str(src), store, str(tmp_path / "cki"),
        query_name="conc_ing", compact_every=100,
    )
    q.processAllAvailable()

    # both streams now LIVE concurrently; feed 4 add batches and 3
    # delete batches (deletes target the initial base only)
    dq = stream_ntriples_delete(
        spark, str(dsrc), store, str(tmp_path / "ckd"),
        query_name="conc_del", compact_every=100,
    )
    adds = []
    for k in range(4):
        extra = [t(f"n{k}_{j}", "q", f"m{k}_{j}") for j in range(3)]
        adds += extra
        (src / f"a{k}.nt").write_text(
            "\n".join(line(x) for x in extra) + "\n"
        )
    dels = base[:3]
    for k, v in enumerate(dels):
        (dsrc / f"d{k}.nt").write_text(line(v) + "\n")
    # drain both; order of drain is irrelevant — the streams race on
    # the store while each processes its backlog
    import threading

    th = threading.Thread(target=dq.processAllAvailable)
    th.start()
    q.processAllAvailable()
    th.join()
    # a second drain round in case one side published while the other
    # was finishing its last batch
    q.processAllAvailable()
    dq.processAllAvailable()
    q.stop()
    dq.stop()

    g = Graph.load(spark, store)
    got = {
        tuple(r)
        for r in g.decode(
            g.triples.select("s", "p", "o"), ["s", "p", "o"]
        ).collect()
    }
    assert got == (set(base) | set(adds)) - set(dels)
    # neither side's publish was lost: both op kinds survive in the
    # ordered log (each stream may fold its whole backlog into one
    # micro-batch, so entry COUNTS per side are 1..n; the 8-writer
    # lost-update unit test pins exact counts)
    m = read_manifest(store)
    ops = [e["op"] for e in m["log"]]
    assert set(ops) == {"add", "del"}, ops
