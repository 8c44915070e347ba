"""WARC ingestion + HTML text extraction (sources/warc.py)."""

import pytest

from graphula_spark.sources.warc import (
    html_to_text,
    parse_warc_bytes,
    read_warc,
    warc_to_documents,
    write_warc,
)

HTML = b"""<html><head><title>My Page</title>
<style>body { color: red }</style>
<script>var x = "<p>not text</p>";</script></head>
<body><h1>Header&nbsp;One</h1>
<p>First paragraph with <b>bold</b> text.</p>
<div>Second   block</div>
<noscript>enable js</noscript>
</body></html>"""

RECORDS = [
    {
        "warc_type": "warcinfo",
        "payload": b"software: graphula-test\r\n",
        "content_type": "application/warc-fields",
    },
    {
        "warc_type": "response",
        "target_uri": "http://example.org/a",
        "warc_date": "2026-02-03T04:05:06Z",
        "http_status": 200,
        "content_type": "text/html; charset=utf-8",
        "payload": HTML,
    },
    {
        "warc_type": "response",
        "target_uri": "http://example.org/missing",
        "warc_date": "2026-02-03T04:05:07Z",
        "http_status": 404,
        "content_type": "text/html",
        "payload": b"<html>not found</html>",
    },
    {
        "warc_type": "response",
        "target_uri": "http://example.org/img",
        "warc_date": "2026-02-03T04:05:08Z",
        "http_status": 200,
        "content_type": "image/png",
        "payload": b"\x89PNGfake",
    },
]


class TestHtmlToText:
    def test_extraction(self):
        text = html_to_text(HTML.decode())
        assert "My Page" in text
        assert "Header One" in text  # &nbsp; decoded, line broken
        assert "First paragraph with bold text." in text
        assert "Second block" in text  # whitespace collapsed
        # script/style/noscript content gone
        assert "color: red" not in text
        assert "not text" not in text
        assert "enable js" not in text

    def test_tag_soup_tolerated(self):
        assert "hello" in html_to_text("<p>hello<div><b>world")
        assert html_to_text("") == ""


class TestWarcRoundTrip:
    @pytest.mark.parametrize("gz", [False, True])
    def test_parse_roundtrip(self, gz):
        data = write_warc(RECORDS, gzip_members=gz)
        recs = list(parse_warc_bytes(data, "mem"))
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "response", "response",
        ]
        resp = recs[1]
        assert resp["target_uri"] == "http://example.org/a"
        assert resp["http_status"] == 200
        assert resp["content_type"].startswith("text/html")
        assert resp["payload"] == HTML  # HTTP headers stripped
        assert recs[2]["http_status"] == 404

    def test_truncated_tail_keeps_good_records(self):
        data = write_warc(RECORDS)
        recs = list(parse_warc_bytes(data[: len(data) - 40], "mem"))
        # the final record is truncated and dropped; earlier ones survive
        assert len(recs) == len(RECORDS) - 1


class TestWarcSpark:
    @pytest.mark.parametrize("gz", [False, True])
    def test_read_warc_to_documents(self, spark, tmp_path, gz):
        ext = "warc.gz" if gz else "warc"
        for i in range(3):  # several files -> several parse tasks
            (tmp_path / f"crawl-{i}.{ext}").write_bytes(
                write_warc(RECORDS, gzip_members=gz)
            )
        df = read_warc(spark, str(tmp_path / f"*.{ext}"))
        assert df.count() == 3 * len(RECORDS)
        docs = warc_to_documents(df).collect()
        # only the 200 text/html response survives, per file
        assert len(docs) == 3
        assert {d["url"] for d in docs} == {"http://example.org/a"}
        assert all("First paragraph with bold text." in d["text"] for d in docs)
        # idempotent doc ids: same URL+date -> same id across files
        assert len({d["doc_id"] for d in docs}) == 1


class TestStreamWarcIngest:
    def test_crawl_stream_dedups_on_ingest(self, spark, tmp_path):
        """End-to-end: WARC files land in a directory; the stream
        parses them, extracts text, and near-dedups against the
        persisted MinHash index — later crawls of near-identical pages
        are rejected, novel pages accepted."""
        from graphula_spark.operators.dedup import MinHashIndex
        from graphula_spark.streaming.windows import stream_warc_ingest

        def page(body):
            return f"<html><body><p>{body}</p></body></html>".encode()

        base = "the quick brown fox jumps over the lazy dog again today"
        seed = spark.createDataFrame([("seed", base)], ["doc_id", "text"])
        idx_path = str(tmp_path / "idx")
        MinHashIndex.build(seed, "doc_id", "text", idx_path)

        crawl = tmp_path / "crawl"
        crawl.mkdir()
        from graphula_spark.sources.warc import write_warc

        def resp(uri, body, date):
            return {
                "warc_type": "response",
                "target_uri": uri,
                "warc_date": date,
                "http_status": 200,
                "content_type": "text/html; charset=utf-8",
                "payload": page(body),
            }

        (crawl / "a.warc.gz").write_bytes(
            write_warc(
                [
                    # near-dup of the seeded corpus doc -> rejected
                    resp(
                        "http://x/1",
                        "the quick brown fox jumps over the lazy dog again tonight",
                        "2026-01-01T00:00:00Z",
                    ),
                    # novel -> accepted
                    resp(
                        "http://x/2",
                        "entirely novel page content with nothing shared at all",
                        "2026-01-01T00:00:01Z",
                    ),
                ],
                gzip_members=True,
            )
        )
        q = stream_warc_ingest(
            spark,
            str(crawl),
            idx_path,
            jaccard_threshold=0.3,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

        accepted = spark.read.parquet(f"{idx_path}/accepted")
        urls = {r["url"] for r in accepted.collect()}
        assert urls == {"http://x/2"}

        # a later file with a near-dup of the accepted page is caught
        (crawl / "b.warc").write_bytes(
            write_warc(
                [
                    resp(
                        "http://y/1",
                        "entirely novel page content with nothing shared at most",
                        "2026-01-02T00:00:00Z",
                    ),
                ]
            )
        )
        q2 = stream_warc_ingest(
            spark,
            str(crawl),
            idx_path,
            jaccard_threshold=0.3,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q2.awaitTermination()
        urls = {
            r["url"] for r in spark.read.parquet(f"{idx_path}/accepted").collect()
        }
        assert urls == {"http://x/2"}  # near-dup of accepted page rejected


def test_warc_feeds_run_pipeline(spark, tmp_path):
    """The WARC reader's output plugs straight into the training-data
    pipeline (crawl -> documents -> normalize/dedup/quality/pack)."""
    from graphula_spark.pipeline import PipelineConfig, run_pipeline
    from graphula_spark.sources.warc import read_warc, warc_to_documents, write_warc

    def resp(uri, body, date="2026-01-01T00:00:00Z"):
        return {
            "warc_type": "response",
            "target_uri": uri,
            "warc_date": date,
            "http_status": 200,
            "content_type": "text/html",
            "payload": f"<html><body><p>{body}</p></body></html>".encode(),
        }

    body = "some reasonably long page content for the pipeline to keep " * 3
    (tmp_path / "c.warc").write_bytes(
        write_warc(
            [
                resp("http://x/1", body),
                resp("http://x/2", body),  # exact dup after extraction
                resp("http://x/3", "other page entirely " * 10),
            ]
        )
    )
    docs = warc_to_documents(read_warc(spark, str(tmp_path / "c.warc")))
    res = run_pipeline(
        docs, PipelineConfig(id_col="doc_id", text_col="text")
    )
    stages = {r["stage"]: r["docs"] for r in res.report}
    assert stages["input"] == 3
    assert stages["exact_dedup"] == 2  # the duplicated page collapsed


class TestStreamWarcUrlGate:
    def test_blocklist_and_url_dedup_in_stream(self, spark, tmp_path):
        """The URL front gate runs inside the streaming crawl ingest:
        blocked domains never reach the content index, and within-batch
        URL aliases collapse before near-dedup."""
        from graphula_spark.operators.dedup import MinHashIndex
        from graphula_spark.sources.warc import write_warc
        from graphula_spark.streaming.windows import stream_warc_ingest

        def resp(uri, body, date):
            return {
                "warc_type": "response",
                "target_uri": uri,
                "warc_date": date,
                "http_status": 200,
                "content_type": "text/html; charset=utf-8",
                "payload": f"<html><body><p>{body}</p></body></html>".encode(),
            }

        seed = spark.createDataFrame(
            [("seed", "totally unrelated seed corpus text right here")],
            ["doc_id", "text"],
        )
        idx_path = str(tmp_path / "idx")
        MinHashIndex.build(seed, "doc_id", "text", idx_path)

        crawl = tmp_path / "crawl"
        crawl.mkdir()
        (crawl / "a.warc").write_bytes(
            write_warc(
                [
                    resp("http://spam.bad.com/x",
                         "spam page that would otherwise be novel and accepted",
                         "2026-01-01T00:00:00Z"),
                    resp("http://ok.org/page?utm_source=f&id=1",
                         "a perfectly novel page body nothing shares",
                         "2026-01-01T00:00:01Z"),
                    # same canonical URL, fresher capture, different body
                    resp("http://OK.org/page/?id=1",
                         "a RE-crawled page body nothing else shares either",
                         "2026-02-01T00:00:00Z"),
                ]
            )
        )
        q = stream_warc_ingest(
            spark,
            str(crawl),
            idx_path,
            jaccard_threshold=0.3,
            checkpoint=str(tmp_path / "ckpt"),
            domain_blocklist=["bad.com"],
            url_dedup_batch=True,
        )
        q.awaitTermination()
        rows = spark.read.parquet(f"{idx_path}/accepted").collect()
        assert {r["url"] for r in rows} == {"http://OK.org/page/?id=1"}
        assert len(rows) == 1  # alias collapsed to the freshest capture
