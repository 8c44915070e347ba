"""URL canonicalization / dedup / domain filtering vs a plain-Python
urllib reference and hand-built expectations."""

import pytest
from pyspark.sql import functions as F

from graphula_spark.operators import urls as U


def _norm(spark, raw, **kw):
    df = spark.createDataFrame([(r,) for r in raw], ["url"])
    return [
        r.n for r in df.select(U.normalize_url(F.col("url"), **kw).alias("n")).collect()
    ]


def test_normalize_url_canonical_forms(spark):
    cases = {
        # case + default port + trailing slash + fragment
        "HTTP://WWW.Example.COM:80/a/b/#frag": "http://example.com/a/b",
        "https://example.com:443/": "https://example.com/",
        "https://example.com:8443/x": "https://example.com:8443/x",
        # tracking params dropped, survivors sorted
        "https://example.com/p?utm_source=x&b=2&a=1&fbclid=abc": "https://example.com/p?a=1&b=2",
        # all params tracking -> no query at all
        "https://example.com/p?gclid=1&utm_id=2": "https://example.com/p",
        # empty path -> /
        "https://example.com": "https://example.com/",
        # userinfo stripped from host key
        "https://user:pw@example.com/x": "https://example.com/x",
        # non-http schemes and garbage -> null
        "ftp://example.com/x": None,
        "not a url": None,
        "mailto:a@b.c": None,
        # RFC 3986: query ends at the first '#'. A '?' inside the
        # fragment (SPA routes) is NOT a query
        "https://site.com/#/page?id=1": "https://site.com/",
        "https://site.com/app#sec?x=1&utm_source=t": "https://site.com/app",
        # real query AND a '?' in the fragment: only the real one kept
        "https://site.com/p?b=2&a=1#frag?c=3": "https://site.com/p?a=1&b=2",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_normalize_url_against_urllib_reference(spark):
    """For a batch of mechanically generated URLs, the host/path/query
    split must agree with urllib.parse."""
    from urllib.parse import parse_qsl, urlsplit

    raw = [
        f"https://Host{i % 7}.example.org:{443 if i % 3 else 8080}"
        f"/p{i}/q?z={i}&utm_source=t&a={i % 5}#f{i}"
        for i in range(50)
    ]
    got = _norm(spark, raw, strip_www=False)
    for r, g in zip(raw, got):
        s = urlsplit(r)
        params = sorted(
            f"{k}={v}"
            for k, v in parse_qsl(s.query, keep_blank_values=True)
            if k.lower() not in U.TRACKING_PARAMS
        )
        port = f":{s.port}" if s.port and (s.scheme, s.port) not in (
            ("http", 80),
            ("https", 443),
        ) else ""
        path = s.path[:-1] if len(s.path) > 1 and s.path.endswith("/") else (s.path or "/")
        want = f"{s.scheme}://{s.hostname}{port}{path}"
        if params:
            want += "?" + "&".join(params)
        assert g == want, (r, g, want)


def test_registered_domain(spark):
    cases = {
        "https://a.b.example.co.uk/x": "example.co.uk",
        "https://news.example.com/x": "example.com",
        "https://example.com/": "example.com",
        "https://localhost/": "localhost",
        "https://deep.sub.host.com.au/": "host.com.au",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = [r.d for r in df.select(U.registered_domain(F.col("url")).alias("d")).collect()]
    assert got == list(cases.values())


def test_url_dedup_keeps_freshest_and_passes_unparseable(spark):
    rows = [
        (1, "https://example.com/a?utm_source=x", "2024-01-01"),
        (2, "https://EXAMPLE.com/a/", "2024-02-01"),  # same canonical, fresher
        (3, "https://example.com/b", "2024-01-01"),
        (4, "garbage-url", "2024-01-01"),
        (5, "also garbage", "2024-01-01"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "fetch_date"])
    out = U.url_dedup(df, "url", prefer_col="fetch_date")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [2, 3, 4, 5]  # one survivor per alias group; garbage untouched
    # deterministic across runs
    again = sorted(r.doc_id for r in U.url_dedup(df, "url", prefer_col="fetch_date").collect())
    assert again == kept


def test_url_dedup_null_keys_bypass_window_exchange(spark):
    """Unparseable URLs (null canonical) must never enter the window's
    shuffle: at crawl scale every null hashes to ONE partition, making
    a single straggler task. The plan must show the window branch
    filtered to non-null keys, with null rows routed around it via a
    union."""
    rows = [(i, f"https://example.com/{i % 10}" if i % 3 else "garbage", "d")
            for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "url", "fetch_date"])
    out = U.url_dedup(df, "url", prefer_col="fetch_date")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan
    # exactly ONE window (the non-null branch); the null branch is a
    # plain filter+project with no shuffle
    assert plan.count("windowspecdefinition") == 1
    # the window branch has the null-excluding filter pushed BELOW the
    # window (branch 1 = everything before the second top-level child)
    branch1, branch2 = plan.split("\n+- ", 1)
    assert "Window" in branch1 and "Filter" in branch1
    assert "Window" not in branch2
    got = out.collect()
    # all 20 garbage rows pass through; parseable collapse to 10
    assert sum(1 for r in got if r.canonical_url is None) == 20
    assert sum(1 for r in got if r.canonical_url is not None) == 10


def test_filter_domains_block_and_allow(spark):
    rows = [
        (1, "https://spam.example.com/x"),
        (2, "https://good.org/y"),
        (3, "https://sub.good.org/z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    blocked = U.filter_domains(df, "url", ["example.com"], mode="block")
    assert sorted(r.doc_id for r in blocked.collect()) == [2, 3]
    allowed = U.filter_domains(df, "url", ["good.org"], mode="allow")
    assert sorted(r.doc_id for r in allowed.collect()) == [2, 3]
    with pytest.raises(ValueError):
        U.filter_domains(df, "url", ["x.com"], mode="nope")
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # list side broadcasts


def test_filter_domains_accepts_dataframe_list(spark):
    df = spark.createDataFrame([(1, "https://a.com/"), (2, "https://b.com/")], ["doc_id", "url"])
    dom = spark.createDataFrame([("A.COM",)], ["domain"])
    out = U.filter_domains(df, "url", dom, mode="block")
    assert [r.doc_id for r in out.collect()] == [2]


def test_normalize_is_idempotent_and_total(spark):
    """Canonicalization is a fixed point (normalize∘normalize ==
    normalize) and never throws on arbitrary junk — fuzzed over
    generated URLs plus pathological strings."""
    import random

    rnd = random.Random(5)
    pieces = ["http://", "https://", "ftp://", "", "WWW.", "user:pw@", "ex",
              "ample.com", ":443", ":8080", "/", "/a/b/", "?a=1&utm_source=x",
              "?b=&a", "#frag", " ", "%%%", "::", "@@", "?", "#", "\t"]
    raw = ["".join(rnd.choice(pieces) for _ in range(rnd.randint(1, 6))) for _ in range(300)]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    once = df.select("url", U.normalize_url(F.col("url")).alias("n1"))
    twice = once.select("url", "n1", U.normalize_url(F.col("n1")).alias("n2"))
    rows = twice.collect()  # totality: no exceptions on any input
    bad = [(r.url, r.n1, r.n2) for r in rows if r.n1 is not None and r.n1 != r.n2]
    assert not bad, bad[:5]


_PSL_TEXT = """\
// ===BEGIN ICANN DOMAINS===
com
org
io
uk
co.uk
org.uk
pl
com.pl
ck
*.ck
!www.ck
jp
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
s3.amazonaws.com
// ===END PRIVATE DOMAINS===
"""


def test_psl_registered_domain_full_algorithm(spark):
    from graphula_spark.operators.urls import PublicSuffixList

    psl = PublicSuffixList.from_text(_PSL_TEXT)
    cases = {
        # plain two-level
        "https://news.example.com/x": "example.com",
        # ccTLD second-level zone
        "https://a.b.example.co.uk/x": "example.co.uk",
        # 3-level zone not in the embedded subset
        "https://shop.example.com.pl/": "example.com.pl",
        # PRIVATE-section suffix: github.io pages are separate apexes
        "https://user1.github.io/repo": "user1.github.io",
        "https://deep.sub.user2.github.io/": "user2.github.io",
        "https://bucket.s3.amazonaws.com/key": "bucket.s3.amazonaws.com",
        # wildcard rule *.ck: every label under ck is a public suffix
        "https://shop.anything.ck/": "shop.anything.ck",
        # exception rule !www.ck overrides the wildcard
        "https://www.ck/": "www.ck",
        "https://sub.www.ck/": "www.ck",
        # a bare public suffix has NO registrable domain
        "https://github.io/": None,
        "https://com/": None,
        # unknown TLD falls back to the default rule * (1 label)
        "https://foo.bar.unknowntld/": "bar.unknowntld",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = [
        r.d
        for r in df.select(
            U.registered_domain(F.col("url"), psl).alias("d")
        ).collect()
    ]
    assert got == list(cases.values())


def test_psl_map_is_constant_folded(spark):
    """The PSL rule map must fold to a plan-time literal — per-row
    re-parsing of a 250 KB string would be a scan-speed disaster."""
    from graphula_spark.operators.urls import PublicSuffixList

    psl = PublicSuffixList.from_text(_PSL_TEXT)
    df = spark.range(5).select(
        psl.registered_domain(F.lit("a.example.co.uk")).alias("d")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "str_to_map" not in plan  # folded away
    assert [r.d for r in df.collect()] == ["example.co.uk"] * 5


def test_psl_in_filter_domains(spark):
    from graphula_spark.operators.urls import PublicSuffixList

    psl = PublicSuffixList.from_text(_PSL_TEXT)
    rows = [
        (1, "https://spammer.github.io/x"),
        (2, "https://other.github.io/y"),
        (3, "https://good.org/z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    # blocking one github.io user must NOT block the others (with the
    # embedded subset both would group to the same 'github.io' apex)
    out = U.filter_domains(df, "url", ["spammer.github.io"], "block", psl=psl)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]


def test_psl_rejects_garbage(spark):
    from graphula_spark.operators.urls import PublicSuffixList

    with pytest.raises(ValueError):
        PublicSuffixList.from_text("// only comments\n\n")
    with pytest.raises(ValueError):
        PublicSuffixList(["ok", "bad:rule"])


def test_url_dedup_hot_key_bounded_before_shuffle(spark):
    """A viral canonical URL with millions of alias captures is a hot
    shuffle key. The plan must carry the pre-shuffle (partial)
    WindowGroupLimit: each map task then ships at most ONE row per
    canonical key into the exchange, so the hot key's shuffle input is
    bounded by the task count, not the alias count. Probed at ×100
    (500k rows, one URL = 20%): 3.3 s warm on local[32], no straggler."""
    df = spark.createDataFrame(
        [(1, "https://a.com/x", "d")], ["doc_id", "url", "fetch_date"]
    )
    out = U.url_dedup(df, "url", prefer_col="fetch_date")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two WindowGroupLimit nodes: partial (below Exchange) + final
    assert plan.count("WindowGroupLimit") == 2
    exchange_pos = plan.index("Exchange hashpartitioning(canonical_url")
    assert plan.rindex("WindowGroupLimit") > exchange_pos  # one BELOW it
