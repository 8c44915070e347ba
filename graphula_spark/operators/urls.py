"""URL operators for web-corpus pipelines: parse, canonicalize,
dedup-by-URL, and domain-list filtering.

A crawl corpus (sources/warc.py emits `(doc_id, url, fetch_date,
text)`) carries millions of URL aliases for the same page — tracking
parameters, fragments, default ports, case-variant hosts, http/https
twins. Canonicalizing BEFORE content dedup removes the cheapest
duplicate class without touching document text, and domain filtering
is the first quality gate of every published web pipeline (CCNet,
RefinedWeb, Gopher).

Everything here is JVM-side column expressions (regexp + array HOFs):
no Python touches a URL, so these run at scan throughput ahead of the
heavier text stages. The only shuffles are the per-URL window in
`url_dedup` and the broadcast semi/anti join in `filter_domains`
(the domain list is KBs forever — broadcast at any corpus size).

Reference scope note: the reference engine has no web/corpus surface;
this module is part of the driver-mandated LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_url",
    "normalize_url",
    "registered_domain",
    "url_dedup",
    "filter_domains",
    "PublicSuffixList",
]

#: query parameters that never change page content — the common
#: tracking families (Google/Facebook/Microsoft/Mailchimp analytics)
TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_term utm_content utm_id "
    "gclid gbraid wbraid fbclid msclkid dclid twclid igshid mc_cid "
    "mc_eid ref_src ref_url _ga _gl"
).split()

#: two-label public suffixes common enough to matter for apex-domain
#: grouping. The full Public Suffix List is a moving external artifact;
#: this embedded subset covers the dominant ccTLD second-level zones —
#: swap in the full PSL as a broadcast table where exactness matters.
_TWO_LEVEL_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk co.jp or.jp ne.jp ac.jp go.jp com.au "
    "net.au org.au edu.au gov.au com.br net.br org.br gov.br com.cn "
    "net.cn org.cn gov.cn co.in net.in org.in gov.in co.kr or.kr go.kr "
    "com.mx org.mx gob.mx co.za org.za gov.za com.tw org.tw gov.tw "
    "com.sg edu.sg gov.sg co.nz org.nz govt.nz com.ar org.ar gov.ar"
).split()


def parse_url(url: Column) -> Column:
    """`struct(scheme, host, port, path, query, fragment)` — one
    regexp pass per component, null where the component is absent."""
    scheme = F.lower(F.nullif(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1), F.lit("")))
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    # userinfo ends at the LAST @ (greedy), and a host contains neither
    # '@' nor ':' — 'user:pw@@@' must not yield host '@@'
    host = F.lower(F.nullif(F.regexp_extract(authority, r"^(?:.*@)?([^:@]*)", 1), F.lit("")))
    port = F.nullif(F.regexp_extract(authority, r":(\d+)$", 1), F.lit("")).cast("int")
    path = F.nullif(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), F.lit(""))
    # RFC 3986: the query ends at the first '#'; anchor the match to the
    # pre-fragment portion so a '?' inside the fragment (SPA routes like
    # https://site.com/#/page?id=1) is NOT treated as a query
    query = F.nullif(F.regexp_extract(url, r"^[^#]*\?([^#]*)", 1), F.lit(""))
    fragment = F.nullif(F.regexp_extract(url, r"#(.*)$", 1), F.lit(""))
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
        fragment.alias("fragment"),
    )


def normalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical URL: lowercase scheme+host, default ports dropped,
    fragment dropped, tracking parameters removed, remaining query
    parameters SORTED (param order is presentation, not identity),
    trailing slash trimmed from non-root paths, optional leading
    `www.` stripped. Null for strings that don't parse as http(s)."""
    u = parse_url(url)
    scheme, host, port = u["scheme"], u["host"], u["port"]
    host = F.when(
        F.lit(strip_www) & host.startswith("www."),
        host.substr(F.lit(5), F.length(host)),
    ).otherwise(host)
    # 'www.' alone strips to the empty string — an empty host is not a
    # URL (the idempotence fuzz found 'http://WWW.:8080' normalizing to
    # a hostless string whose re-normalization was null)
    host = F.nullif(host, F.lit(""))
    default_port = ((scheme == "http") & (port == 80)) | (
        (scheme == "https") & (port == 443)
    )
    port_part = F.when(
        port.isNotNull() & ~default_port, F.concat(F.lit(":"), port.cast("string"))
    ).otherwise(F.lit(""))
    path = F.coalesce(u["path"], F.lit("/"))
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    params = F.filter(
        F.split(F.coalesce(u["query"], F.lit("")), "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(F.split(p, "=")[0]).isin(TRACKING_PARAMS),
    )
    query_part = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.when(
        scheme.isin("http", "https") & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part),
    )


class PublicSuffixList:
    """Parsed Public Suffix List (publicsuffix.org/list/ format) for
    exact eTLD+1 grouping — covers private suffixes (github.io),
    3-level zones, wildcard rules (`*.ck`) and exceptions (`!www.ck`)
    that the embedded two-level subset cannot.

    100 TB shape: the whole rule set (~15k entries, ~250 KB) is
    embedded as ONE string literal inside a `str_to_map` expression.
    The expression is foldable, so Catalyst's ConstantFolding
    evaluates it ONCE at plan time into a literal map — per-row
    matching is then K constant-time map probes (K = max rule depth),
    pure JVM column expressions: no broadcast join, no shuffle, no
    Python. The list is a moving external artifact, so it is loaded
    from caller-supplied text/file, never vendored here.
    """

    #: pair / key-value delimiters for the embedded map literal —
    #: neither can appear in a PSL rule (lowercase hostnames, '.',
    #: '*', '!')
    _PAIR_SEP, _KV_SEP = ",", ":"

    def __init__(self, rules: list[str]):
        cleaned = []
        for r in rules:
            r = r.strip().lower()
            if not r or r.startswith("//"):
                continue
            cleaned.append(r)
        if not cleaned:
            raise ValueError("empty public suffix list")
        bad = [r for r in cleaned if self._PAIR_SEP in r or self._KV_SEP in r]
        if bad:
            raise ValueError(f"rule contains a reserved delimiter: {bad[:3]}")
        self.rules = cleaned
        self.max_labels = max(r.count(".") + 1 for r in cleaned)
        payload = self._PAIR_SEP.join(
            f"{r}{self._KV_SEP}1" for r in sorted(set(cleaned))
        )
        self._map = F.str_to_map(
            F.lit(payload), F.lit(self._PAIR_SEP), F.lit(self._KV_SEP)
        )

    @classmethod
    def from_text(cls, text: str) -> "PublicSuffixList":
        """Parse the public_suffix_list.dat format: one rule per line,
        `//` comments and blank lines ignored (both ICANN and PRIVATE
        sections are included — private suffixes like github.io are
        exactly what apex grouping needs)."""
        return cls(text.splitlines())

    @classmethod
    def from_file(cls, path: str) -> "PublicSuffixList":
        with open(path, encoding="utf-8") as f:
            return cls.from_text(f.read())

    def _has(self, key: Column) -> Column:
        return F.element_at(self._map, key).isNotNull()

    def suffix_length(self, host: Column) -> Column:
        """Label count of the host's public suffix under the full PSL
        algorithm: exception rules prevail (suffix = rule minus its
        leftmost label), else the longest matching exact or wildcard
        rule, else the implicit default rule `*` (1 label)."""
        labels = F.split(host, r"\.")
        n = F.size(labels)

        def tail(k: int) -> Column:
            return F.array_join(F.slice(labels, n - k + 1, F.lit(k)), ".")

        exc, matches = [], [F.lit(1)]
        for k in range(1, self.max_labels + 1):
            guard = n >= k
            exc.append(
                F.when(
                    guard & self._has(F.concat(F.lit("!"), tail(k))),
                    F.lit(k - 1),
                )
            )
            matches.append(F.when(guard & self._has(tail(k)), F.lit(k)))
            if k >= 2:
                matches.append(
                    F.when(
                        guard
                        & self._has(F.concat(F.lit("*."), tail(k - 1))),
                        F.lit(k),
                    )
                )
        longest_exc = exc[0] if len(exc) == 1 else F.greatest(*exc)
        return F.coalesce(longest_exc, F.greatest(*matches))

    def registered_domain(self, host: Column) -> Column:
        """eTLD+1 of a bare host column: public suffix plus one label;
        null when the host IS a public suffix (per the PSL algorithm —
        such a host has no registrable domain)."""
        labels = F.split(host, r"\.")
        n = F.size(labels)
        ps = self.suffix_length(host)
        return F.when(
            host.isNotNull() & (n > ps),
            F.array_join(F.slice(labels, n - ps, ps + F.lit(1)), "."),
        )


def registered_domain(url: Column, psl: PublicSuffixList | None = None) -> Column:
    """Apex domain (eTLD+1) of the URL's host. With a
    `PublicSuffixList` the full PSL algorithm applies (wildcards,
    exceptions, private suffixes); without one, the embedded
    two-level-suffix subset approximates it: the last two labels, or
    three when the two-label tail is a known second-level public
    suffix (see _TWO_LEVEL_SUFFIXES)."""
    host = parse_url(url)["host"]
    if psl is not None:
        return psl.registered_domain(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(_TWO_LEVEL_SUFFIXES), last3).otherwise(last2)
    )


def url_dedup(
    df: DataFrame,
    url_col: str,
    prefer_col: str | None = None,
    keep_col: str = "canonical_url",
) -> DataFrame:
    """One row per canonical URL. Within an alias group the survivor
    is the highest `prefer_col` (e.g. fetch_date → keep the freshest
    capture), tie-broken deterministically on the raw URL string so
    reruns pick the same row. Adds `keep_col` with the canonical form;
    rows whose URL doesn't parse as http(s) pass through untouched
    (null canonical key would otherwise collapse them into one)."""
    out = df.withColumn(keep_col, normalize_url(F.col(url_col)))
    order = (
        [F.desc(prefer_col)] if prefer_col else []
    ) + [F.asc(url_col)]
    # Null canonical keys (non-http(s) / unparseable URLs) are routed
    # AROUND the window, not merely excused from its rank: partitionBy
    # hashes every null to ONE shuffle partition, so a crawl with a few
    # percent garbage URLs would otherwise funnel all of it through a
    # single straggler task. The split keeps the window's exchange
    # null-free; the pass-through branch is a pure filter (no shuffle).
    parseable = out.where(F.col(keep_col).isNotNull())
    unparseable = out.where(F.col(keep_col).isNull())
    w = Window.partitionBy(keep_col).orderBy(*order)
    ranked = parseable.withColumn("__rn", F.row_number().over(w))
    return ranked.where(F.col("__rn") == 1).drop("__rn").unionByName(unparseable)


def filter_domains(
    df: DataFrame,
    url_col: str,
    domains: DataFrame | list[str],
    mode: str = "block",
    psl: PublicSuffixList | None = None,
) -> DataFrame:
    """Drop (mode='block') or keep (mode='allow') rows whose apex
    domain appears in `domains` (a list or a 1-column DataFrame).
    The list side broadcasts — it is a curated blocklist/allowlist,
    KBs at any corpus scale — so this is a map-side semi/anti join.
    Pass a `PublicSuffixList` for exact apex grouping."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    spark = df.sparkSession
    if isinstance(domains, list):
        from graphula_spark.literal import literal_df

        dom = literal_df(
            spark, [(d.lower(),) for d in domains], "__domain string"
        )
    else:
        c = domains.columns[0]
        dom = domains.select(F.lower(F.col(c)).alias("__domain"))
    keyed = df.withColumn("__apex", registered_domain(F.col(url_col), psl))
    how = "left_anti" if mode == "block" else "left_semi"
    return keyed.join(
        F.broadcast(dom), keyed["__apex"] == dom["__domain"], how
    ).drop("__apex")
