"""WARC source: web-crawl archives → a documents table.

A 100 TB training corpus usually STARTS as WARC files (the Common
Crawl interchange format, ISO 28500): length-prefixed records of HTTP
requests/responses plus crawl metadata. This module turns a directory
of .warc / .warc.gz files into the `documents`-shaped DataFrame the
text pipeline (dedup → quality → scrub → pack, pipeline.py) consumes:

- `read_warc` — EXACTLY one parse task per FILE (sources/files.py
  parallelizes the globbed path list; sc.binaryFiles measurably
  under-parallelizes many-small-file corpora): WARC is a stateful
  record stream and crawl corpora are laid out as many ~1 GB files,
  so a file is the natural parallel unit. Handles both plain WARC and
  the per-record-gzip-member .warc.gz layout Common Crawl ships
  (a single zlib stream loop decodes concatenated members).
- `warc_to_documents` — Arrow-batched HTML→text extraction
  (stdlib html.parser state machine: script/style/noscript dropped,
  block elements break lines, character references decoded) with
  charset sniffing from the HTTP Content-Type.
- `write_warc` — a record writer used by tests and as an export sink.

Everything is stdlib: no warcio/bs4 in this environment, and none
needed — the formats are simple enough that owning them removes a
dependency from the 100 TB ingest path.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("src_file", StringType(), True),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


def _try_parse_record(data, pos: int, src_file: str):
    """Attempt to parse one record at ``pos``. Returns
    (record_or_None, new_pos, incomplete) — ``incomplete`` means more
    bytes could complete the record (gzip streaming continues); a
    non-incomplete None means clean end-of-stream / trailing garbage."""
    n = len(data)
    while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n"):
        pos += 2 if data[pos : pos + 2] == b"\r\n" else 1
    if pos >= n:
        return None, pos, False
    if n - pos < 5:
        return None, pos, True
    if not data[pos : pos + 5] == b"WARC/":
        return None, pos, False  # trailing garbage: stop cleanly
    hdr_end = data.find(b"\r\n\r\n", pos)
    if hdr_end < 0:
        return None, pos, True
    headers: dict[str, str] = {}
    for line in bytes(data[pos:hdr_end]).split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = (
            v.strip().decode("latin-1")
        )
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None, pos, False
    body_start = hdr_end + 4
    if body_start + length > n:
        return None, pos, True  # record not fully buffered yet
    block = bytes(data[body_start : body_start + length])

    rec = {
        "record_id": headers.get("warc-record-id"),
        "warc_type": headers.get("warc-type"),
        "target_uri": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date"),
        "http_status": None,
        "content_type": headers.get("content-type"),
        "payload": block,
        "src_file": src_file,
    }
    if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
        http_end = block.find(b"\r\n\r\n")
        if http_end >= 0:
            lines = block[:http_end].split(b"\r\n")
            m = re.match(rb"HTTP/\S+\s+(\d{3})", lines[0])
            if m:
                rec["http_status"] = int(m.group(1))
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    rec["content_type"] = v.strip().decode("latin-1")
            rec["payload"] = block[http_end + 4 :]
    return rec, body_start + length, False


def parse_warc_bytes(data: bytes, src_file: str = ""):
    """Yield WARC record dicts from raw file bytes (plain or gzip).

    For ``response`` records carrying an HTTP message, the HTTP status
    and Content-Type are parsed out and ``payload`` is the HTTP BODY;
    other records carry their block verbatim. Malformed trailing bytes
    terminate the stream rather than raising — a truncated tail must
    not kill a 1 GB file's worth of good records.

    Gzip input decompresses INCREMENTALLY, member by member (the
    .warc.gz layout is one gzip member per record), draining completed
    records as the buffer fills — peak memory is O(largest record),
    not O(decompressed file); a 1 GB crawl file must not cost a 4 GB
    buffer per executor task.
    """
    if data[:2] != _GZIP_MAGIC:
        pos = 0
        while True:
            rec, pos, _inc = _try_parse_record(data, pos, src_file)
            if rec is None:
                return
            yield rec
    buf = bytearray()
    stream_pos = 0
    n = len(data)
    while stream_pos < n:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        try:
            buf += d.decompress(data[stream_pos:])
        except zlib.error as e:
            raise ValueError(f"bad gzip stream in {src_file}: {e}") from None
        # drain every complete record before inflating the next member
        pos = 0
        while True:
            rec, pos, incomplete = _try_parse_record(buf, pos, src_file)
            if rec is None:
                if not incomplete and pos < len(buf):
                    return  # garbage between members: stop cleanly
                break
            yield rec
        del buf[:pos]
        if not d.unused_data:
            break
        stream_pos = n - len(d.unused_data)


def read_warc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """WARC records as a DataFrame, one Python parse task per file."""
    from graphula_spark.sources.files import per_file_rdd

    files = per_file_rdd(spark, paths)

    def parse(kv):
        path, data = kv
        for rec in parse_warc_bytes(bytes(data), path):
            yield (
                rec["record_id"],
                rec["warc_type"],
                rec["target_uri"],
                rec["warc_date"],
                rec["http_status"],
                rec["content_type"],
                rec["payload"],
                rec["src_file"],
            )

    return spark.createDataFrame(files.flatMap(parse), WARC_SCHEMA)


# ---------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------

_DROP_TAGS = {"script", "style", "noscript", "template", "svg"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "section", "article", "header", "footer",
    "blockquote", "pre", "title",
}


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        elif tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS and self._drop_depth:
            self._drop_depth -= 1
        elif tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_data(self, data):
        if not self._drop_depth and data:
            self.chunks.append(data)

    def text(self) -> str:
        raw = "".join(self.chunks)
        lines = [re.sub(r"[ \t\xa0]+", " ", ln).strip() for ln in raw.split("\n")]
        out: list[str] = []
        for ln in lines:
            if ln:
                out.append(ln)
            elif out and out[-1] != "":
                out.append("")
        while out and out[-1] == "":
            out.pop()
        return "\n".join(out)


def html_to_text(html: str) -> str:
    """Visible text of an HTML document: script/style/noscript dropped,
    block tags break lines, whitespace collapsed, entities decoded.
    stdlib html.parser is tolerant of real-web tag soup by design."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tag soup beyond the parser: keep what was extracted
    return p.text()


_CHARSET_RE = re.compile(r"charset=[\"']?([\w.-]+)", re.I)


def _decode_payload(payload: bytes, content_type: str | None) -> str:
    enc = "utf-8"
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            enc = m.group(1)
    try:
        return payload.decode(enc, errors="replace")
    except LookupError:
        return payload.decode("utf-8", errors="replace")


DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("url", StringType(), True),
        StructField("fetch_date", StringType(), True),
        StructField("text", StringType(), True),
    ]
)


def _record_to_doc(rec: dict, min_chars: int):
    """(doc_id, url, fetch_date, text) for a 200 text/html response
    record, else None."""
    if (
        rec["warc_type"] != "response"
        or (rec["http_status"] or 0) != 200
        or not rec["content_type"]
        or "html" not in rec["content_type"].lower()
        or rec["payload"] is None
    ):
        return None
    text = html_to_text(
        _decode_payload(bytes(rec["payload"]), rec["content_type"])
    )
    if len(text) < min_chars:
        return None
    key = f"{rec['target_uri']}\x00{rec['warc_date']}".encode()
    return (
        hashlib.md5(key).hexdigest(),
        rec["target_uri"],
        rec["warc_date"],
        text,
    )


def binary_files_to_documents(df: DataFrame, min_chars: int = 1) -> DataFrame:
    """Documents from a ``binaryFile``-shaped DataFrame (path, content)
    — the streaming counterpart of `read_warc` + `warc_to_documents`:
    `spark.readStream.format("binaryFile")` delivers newly-landed WARC
    files and this transform parses + extracts text per file, Arrow-
    batched. Works identically on a batch binaryFile read."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), path):
                    doc = _record_to_doc(rec, min_chars)
                    if doc is not None:
                        rows.append(doc)
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "fetch_date", "text"]
            )

    return df.select("path", "content").mapInPandas(run, schema=DOC_SCHEMA)


def warc_to_documents(df: DataFrame, min_chars: int = 1) -> DataFrame:
    """HTML response records → (doc_id, url, fetch_date, text) rows,
    ready for the text pipeline. Arrow-batched mapInPandas; doc_id is
    the xxhash-style stable hash of the URL + date so re-ingesting the
    same crawl is idempotent. Non-HTML and non-200 responses drop."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # pandas renders SQL NULLs as NaN; normalize to None so
                # the shared record filter sees real nulls
                rec = {
                    k: None
                    if not isinstance(v, (bytes, bytearray)) and pd.isna(v)
                    else v
                    for k, v in r.items()
                }
                doc = _record_to_doc(rec, min_chars)
                if doc is not None:
                    rows.append(doc)
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "fetch_date", "text"]
            )

    return df.mapInPandas(run, schema=DOC_SCHEMA)


# ---------------------------------------------------------------------
# writer (tests + export sink)
# ---------------------------------------------------------------------


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records (dicts with warc_type/target_uri/payload and
    optional record_id/warc_date/content_type/http_status keys) to WARC
    bytes. ``gzip_members=True`` emits the Common Crawl .warc.gz layout
    (one gzip member per record)."""
    import gzip as _gzip

    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        if rec.get("warc_type") == "response" and "http_status" in rec:
            http = (
                f"HTTP/1.1 {rec['http_status']} OK\r\n"
                f"Content-Type: {rec.get('content_type', 'text/html')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            payload = http + payload
        headers = [
            ("WARC-Type", rec.get("warc_type", "resource")),
            ("WARC-Record-ID", rec.get("record_id", f"<urn:uuid:rec-{i}>")),
            ("WARC-Date", rec.get("warc_date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if rec.get("warc_type") == "response":
            headers.append(
                ("Content-Type", "application/http; msgtype=response")
            )
        elif rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        block = (
            b"WARC/1.0\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in headers).encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        out += _gzip.compress(block) if gzip_members else block
    return bytes(out)
