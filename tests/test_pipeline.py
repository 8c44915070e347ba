"""End-to-end pipeline composition: raw docs → training shards."""

import pytest
from pyspark.sql import functions as F

from graphula_spark.pipeline import PipelineConfig, run_pipeline


@pytest.fixture()
def corpus(spark):
    good = "the quick brown fox jumps over the lazy dog in a sunny field today"
    rows = [
        (1, good),
        (2, good),  # exact dup of 1 -> dropped
        (3, good + " tonight"),  # near dup of 1 -> dropped
        (4, "a completely different and reasonably long document about "
            "the engines and the pipelines that we keep on building here"),
        (5, "!!! ??? ... !!! ??? ,,, ;;; :::"),  # punctuation junk -> quality
        (6, "short"),  # too few tokens -> quality
        (7, "contact me at jane.doe@example.com for all of the details "
            "about the new and rather exciting data processing project"),
        # shares an 8-token span with doc 4 -> span removed, doc survives
        (8, "unrelated preamble text here the engines and the pipelines "
            "that we keep on building here and some closing words follow "
            "with enough remaining length to clear the quality bar easily"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pipeline_end_to_end(spark, corpus):
    cfg = PipelineConfig(minhash_threshold=0.5, substr_min_len=8)
    res = run_pipeline(corpus, cfg)
    docs = {r["doc_id"]: r.asDict() for r in res.documents.collect()}
    # dups gone, junk filtered, good docs survive
    assert 1 in docs and 4 in docs and 7 in docs and 8 in docs
    assert 2 not in docs and 3 not in docs
    assert 5 not in docs and 6 not in docs
    # the shared 8-token span was removed from the later doc only
    assert "the engines and the pipelines that we keep" in docs[4]["text"]
    assert "the engines and the pipelines that we keep" not in docs[8]["text"]
    # PII scrubbed
    assert "jane.doe@example.com" not in docs[7]["text"]
    # report tracks survivor counts per stage, monotonically non-increasing
    stages = [r["stage"] for r in res.report]
    assert stages[0] == "input"
    counts = [r["docs"] for r in res.report]
    assert counts[0] == 8
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # shards exist and carry token counts
    sh = res.shards.agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("tok")
    ).first()
    assert sh["n"] == len(docs) and sh["tok"] > 0


def test_pipeline_shard_budget(spark):
    docs = spark.createDataFrame(
        [(j, "the fox and the dog with a word list of exactly this many tokens")
         for j in range(40)],
        ["doc_id", "text"],
    )
    cfg = PipelineConfig(
        stages=("quality", "pack"),
        min_tokens=5,
        min_stopword_ratio=0.0,
        shard_token_budget=40,
        scrub_pii=False,
    )
    res = run_pipeline(docs, cfg)
    per_shard = (
        res.shards.groupBy("pack_bucket", "shard")
        .agg(F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert per_shard
    for r in per_shard:
        # streaming-pack contract: budget + at most one row's overshoot
        assert r["tok"] <= 40 + r["mx"]


def test_pipeline_line_dedup_stage(spark):
    banner = "SITE NAVIGATION | HOME | ABOUT"
    docs = spark.createDataFrame(
        [
            (1, banner + "\nunique body one with plenty of the words here"),
            (2, banner + "\nunique body two with plenty of the words here"),
            (3, banner + "\nunique body three with plenty of the words too"),
        ],
        ["doc_id", "text"],
    )
    cfg = PipelineConfig(
        stages=("normalize", "quality"),
        line_dedup_min_docs=2,
        min_tokens=3,
        min_stopword_ratio=0.0,
        scrub_pii=False,
    )
    res = run_pipeline(docs, cfg)
    out = {r["doc_id"]: r["text"] for r in res.documents.collect()}
    assert len(out) == 3
    for v in out.values():
        assert "SITE NAVIGATION" not in v


def test_pipeline_checkpoint_resume(spark, tmp_path):
    """With checkpoint_dir set, a rerun resumes from the last COMMITTED
    stage (Hadoop _SUCCESS marker) instead of recomputing the chain; a
    half-written stage directory (no marker) is not trusted."""
    import shutil

    from graphula_spark.pipeline import PipelineConfig, run_pipeline

    docs = spark.createDataFrame(
        [
            (n, "some reasonably long document text for the pipeline " * 3
             + f"unique tail {n}")
            for n in range(20)
        ] + [(100, "some reasonably long document text for the pipeline " * 3
              + "unique tail 0")],  # near/exact-dup fodder
        ["doc_id", "text"],
    )
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(stages=("normalize", "exact_dedup", "quality", "pack"))
    first = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    n_shards = first.shards.count()
    stages1 = {r["stage"]: r["docs"] for r in first.report}
    assert (tmp_path / "ckpt" / "exact_dedup" / "_SUCCESS").exists()

    # rerun: resumes from the deepest committed stage
    second = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    assert second.report[0] == {
        "stage": "quality",
        "docs": stages1["quality"],
        "resumed": True,
    }
    assert second.shards.count() == n_shards

    # simulate a crash mid-write: quality's marker gone -> resume from
    # exact_dedup and RE-RUN quality
    (tmp_path / "ckpt" / "quality" / "_SUCCESS").unlink()
    third = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    assert third.report[0] == {
        "stage": "exact_dedup",
        "docs": stages1["exact_dedup"],
        "resumed": True,
    }
    assert {r["stage"] for r in third.report if not r.get("resumed")} == {
        "quality"
    }
    assert third.shards.count() == n_shards

    # a fresh dir runs everything
    shutil.rmtree(ckpt)
    fresh = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    assert fresh.report[0]["stage"] == "input"
    assert fresh.shards.count() == n_shards


def test_pipeline_url_front_gate(spark):
    """url_col enables the web front gate: blocked domains never reach
    the content stages, URL aliases collapse to the freshest capture."""
    good = "the quick brown fox jumps over the lazy dog in a sunny field today"
    other = ("a completely different and reasonably long document about "
             "the engines and the pipelines that we keep on building here")
    rows = [
        (1, good, "https://spam.example.com/page", "2024-01-01"),
        (2, good, "https://ok.org/a?utm_source=x", "2024-01-01"),
        (3, good + " x", "https://OK.org/a/", "2024-02-01"),  # same canonical, fresher
        (4, other, "https://ok.org/b", "2024-01-01"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "url", "fetch_date"])
    cfg = PipelineConfig(
        url_col="url",
        url_prefer_col="fetch_date",
        domain_blocklist=["example.com"],
        stages=("normalize", "quality", "pack"),
        min_tokens=5,
    )
    res = run_pipeline(docs, cfg)
    kept = sorted(r.doc_id for r in res.documents.collect())
    assert kept == [3, 4]  # 1 blocked by domain, 2 lost the alias group to 3
    assert res.report[0]["stage"] == "input" and res.report[0]["docs"] == 4
    assert [r for r in res.report if r["stage"] == "url_dedup"][0]["docs"] == 2


def test_pipeline_bpe_token_budgets(spark):
    """bpe_merges switches n_tokens and shard budgets to the trained
    tokenizer's true counts."""
    from graphula_spark.operators.bpe import encode_bpe, train_bpe

    rows = [
        (i, "the quick brown fox document number %d keeps jumping around today" % i)
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(docs, "text", n_merges=8)
    cfg = PipelineConfig(
        stages=("normalize", "pack"),
        bpe_merges=merges,
        shard_token_budget=100,
        min_tokens=1,
    )
    res = run_pipeline(docs, cfg)
    got = {r.doc_id: r.n_tokens for r in res.documents.collect()}
    want = {r.id: r.n_tokens for r in encode_bpe(docs, "doc_id", "text", merges).collect()}
    assert got == want
    assert "shard" in res.shards.columns


def test_pipeline_importance_selection(spark):
    """importance_target + importance_keep adds a DSIR selection stage
    after the quality gate: target-like docs dominate the kept set and
    selection is deterministic."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "def fn%d ( x ) : return the value of x plus %d" % (i, i)))
        else:
            rows.append((i, "the quick brown fox %d jumps over the lazy dog today" % i))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = PipelineConfig(
        stages=("normalize", "quality", "pack"),
        min_tokens=5,
        importance_target=F.col("doc_id") % 2 == 1,  # prose-like docs
        importance_keep=10,
    )
    res = run_pipeline(docs, cfg)
    kept = sorted(r.doc_id for r in res.documents.collect())
    assert len(kept) == 10
    assert sum(1 for d in kept if d % 2 == 1) >= 8  # target-like dominate
    assert [r["stage"] for r in res.report][-1] == "importance"
    again = run_pipeline(docs, cfg)
    assert sorted(r.doc_id for r in again.documents.collect()) == kept


def test_pipeline_importance_stage_resumes(spark, tmp_path):
    """The importance stage participates in the resume contract like
    every other stage: a committed 'importance' checkpoint restores
    directly (DSIR weighting is NOT re-run), and a missing marker
    falls back to 'quality' and re-runs only importance."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "def fn%d ( x ) : return the value of x plus %d" % (i, i)))
        else:
            rows.append((i, "the quick brown fox %d jumps over the lazy dog today" % i))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(
        stages=("normalize", "quality", "pack"),
        min_tokens=5,
        importance_target=F.col("doc_id") % 2 == 1,
        importance_keep=10,
    )
    first = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    kept = sorted(r.doc_id for r in first.documents.collect())
    assert (tmp_path / "ckpt" / "importance" / "_SUCCESS").exists()

    second = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    assert second.report[0]["stage"] == "importance"
    assert second.report[0]["resumed"] is True
    # no stage re-ran
    assert all(r.get("resumed") for r in second.report)
    assert sorted(r.doc_id for r in second.documents.collect()) == kept

    (tmp_path / "ckpt" / "importance" / "_SUCCESS").unlink()
    third = run_pipeline(docs, cfg, checkpoint_dir=ckpt)
    assert third.report[0] == {
        "stage": "quality",
        "docs": third.report[0]["docs"],
        "resumed": True,
    }
    assert {r["stage"] for r in third.report if not r.get("resumed")} == {
        "importance"
    }
    assert sorted(r.doc_id for r in third.documents.collect()) == kept


def test_pipeline_split_fractions(spark):
    docs = spark.createDataFrame(
        [(i, "a reasonably long document body %d with plenty of words here" % i)
         for i in range(80)],
        ["doc_id", "text"],
    )
    cfg = PipelineConfig(
        stages=("normalize", "quality", "pack"),
        min_tokens=5,
        split_fractions={"train": 0.8, "val": 0.2},
    )
    res = run_pipeline(docs, cfg)
    rows = res.documents.collect()
    assert set(r.split for r in rows) == {"train", "val"}
    # deterministic across reruns
    again = run_pipeline(docs, cfg)
    assert {(r.doc_id, r.split) for r in again.documents.collect()} == {
        (r.doc_id, r.split) for r in rows
    }
