"""Web-crawl curation operators (E3/web family, round 5 late): HTML →
text extraction, link extraction, and URL canonicalization — the steps
between a WARC archive (sources/warc_source.py) and the ``documents``
shape every E1/E3 operator consumes.

Scale notes: HTML extraction and link extraction are 1→1 / 1→N
Arrow-batched kernels over the record rows — zero shuffle, pure scan
parallelism. URL canonicalization is a PURE COLUMN EXPRESSION (no
Python), so it runs inside whole-stage codegen and is usable as a join
key normalizer at any scale (URL-level dedup shuffles canonical keys,
never pages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Query parameters that never change page content (tracking only).
#: A name ending in "_" drops every param with that prefix (utm_*);
#: any other name drops exactly that param (matched as "name=").
#: canonicalize_url builds its filter predicate from this tuple, and
#: the entry oracle renders the same tuple into SQL — one source of
#: truth (ADVICE r05: the three hand-copied lists could drift).
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")


def _is_tracking_param(p: Column) -> Column:
    """True when a 'k=v' query param is tracking-only per
    TRACKING_PARAM_PREFIXES."""
    cond = F.lit(False)
    for name in TRACKING_PARAM_PREFIXES:
        probe = name if name.endswith("_") else name + "="
        cond = cond | p.startswith(probe)
    return cond


def html_to_text_df(
    records: DataFrame,
    body_col: str = "body",
    content_type_col: str = "content_type",
) -> DataFrame:
    """Decode + boilerplate-strip HTML record bodies into (all input
    columns minus body) + (title, text, n_links). Arrow-batched 1→1."""
    import pandas as pd

    from drugbankner_spark.functions import html_text as H

    keep = [c for c in records.columns if c != body_col]
    out_schema = T.StructType(
        [records.schema[c] for c in keep]
        + [
            T.StructField("title", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_links", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            texts, titles, nlinks = [], [], []
            for body, ctype in zip(pdf[body_col], pdf[content_type_col]):
                html = H.decode_html(bytes(body), ctype)
                texts.append(H.html_to_text(html))
                titles.append(H.html_title(html))
                nlinks.append(len(H.html_links(html)))
            out = pdf[keep].copy()
            out["title"] = titles
            out["text"] = texts
            out["n_links"] = nlinks
            yield out

    return records.mapInPandas(run, out_schema)


def extract_links_df(
    records: DataFrame,
    body_col: str = "body",
    content_type_col: str = "content_type",
    uri_col: str = "target_uri",
    resolve: bool = True,
) -> DataFrame:
    """1→N link fan-out: (page_uri, href, anchor_text) per <a href> —
    the edge list for URL-graph curation (domain counts, link-based
    quality signals). With ``resolve=True`` (default) relative hrefs
    resolve against the page URI via stdlib urljoin — a real crawl's
    links are mostly relative, and an unresolved edge list would credit
    the wrong (empty) host."""
    import pandas as pd

    from drugbankner_spark.functions import html_text as H

    out_schema = T.StructType([
        T.StructField("page_uri", T.StringType()),
        T.StructField("href", T.StringType()),
        T.StructField("anchor_text", T.StringType()),
    ])

    def run(batches):
        from urllib.parse import urljoin

        for pdf in batches:
            rows = []
            for uri, body, ctype in zip(
                pdf[uri_col], pdf[body_col], pdf[content_type_col]
            ):
                html = H.decode_html(bytes(body), ctype)
                for href, anchor in H.html_links(html):
                    if resolve:
                        try:
                            href = urljoin(uri or "", href)
                        except ValueError:
                            pass  # unparsable href: keep it raw
                    rows.append((uri, href, anchor))
            yield pd.DataFrame(
                rows, columns=["page_uri", "href", "anchor_text"]
            )

    return records.mapInPandas(run, out_schema)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a pure column expression (codegen-friendly, no
    UDF): lowercase scheme+host, default :80/:443 ports stripped,
    fragment dropped, tracking query params removed (empty query drops
    its '?'), empty path → '/', non-root trailing slash trimmed. The
    join-key normalizer for URL-level dedup and blocklist joins."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(u, "#", 1)
    base = F.substring_index(no_frag, "?", 1)
    query = F.when(
        no_frag.contains("?"), F.substring_index(no_frag, "?", -1)
    ).otherwise(F.lit(""))
    scheme = F.lower(F.substring_index(base, "://", 1))
    after = F.substring(base, F.length(scheme) + 4, F.lit(1 << 30))
    seg = F.substring_index(after, "/", 1)  # authority incl. userinfo
    # userinfo (user:pass@) never participates in the canonical form
    hostport = F.lower(F.substring_index(seg, "@", -1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    # the path offset counts the ORIGINAL authority segment
    path = F.substring(
        after, F.length(seg) + 1, F.lit(1 << 30)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking_param(p),
    )
    kept = F.array_join(params, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (userinfo and port stripped) — the
    blocklist/grouping key."""
    u = F.col(url) if isinstance(url, str) else url
    base = F.substring_index(F.substring_index(u, "#", 1), "?", 1)
    scheme = F.lower(F.substring_index(base, "://", 1))
    after = F.substring(base, F.length(scheme) + 4, F.lit(1 << 30))
    seg = F.substring_index(F.lower(F.substring_index(after, "/", 1)),
                            "@", -1)
    return F.substring_index(seg, ":", 1)


def filter_blocked_hosts(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "target_uri"
) -> DataFrame:
    """Drop pages whose canonical host is on the blocklist — a
    broadcast LEFT ANTI join on the host key (the blocklist dim is
    tiny; the crawl side never shuffles)."""
    keyed = pages.withColumn("_host", url_host(url_col))
    return keyed.join(
        F.broadcast(blocklist.select(F.col("host").alias("_host"))),
        "_host",
        "left_anti",
    ).drop("_host")


def parse_sitemap(xml_text: str) -> list[dict]:
    """Entries of a sitemap.xml (``<urlset>``) or sitemap index
    (``<sitemapindex>``): [{loc, lastmod, priority, is_index}] — the
    crawl-frontier seed list. Stdlib ElementTree, namespace-agnostic
    (matches on local tag names), malformed input → []."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    is_index = local(root.tag) == "sitemapindex"
    if local(root.tag) not in ("urlset", "sitemapindex"):
        return []
    out = []
    for node in root:
        if local(node.tag) not in ("url", "sitemap"):
            continue
        entry = {"loc": None, "lastmod": None, "priority": None,
                 "is_index": is_index}
        for child in node:
            name = local(child.tag)
            if name in ("loc", "lastmod"):
                entry[name] = (child.text or "").strip() or None
            elif name == "priority":
                try:
                    entry["priority"] = float((child.text or "").strip())
                except ValueError:
                    pass
        if entry["loc"]:
            out.append(entry)
    return out


def decode_sitemap(payload: bytes) -> str:
    """Sitemap payload → XML text: gunzips ``sitemap.xml.gz`` (the
    standard compressed form) by magic sniff, then UTF-8-decodes with
    replacement — feed the result to ``parse_sitemap``."""
    import zlib

    if payload[:2] == b"\x1f\x8b":
        try:
            payload = zlib.decompress(payload, wbits=zlib.MAX_WBITS | 16)
        except zlib.error:
            return ""
    return payload.decode("utf-8", errors="replace")


def sitemaps_from_robots(robots: DataFrame) -> DataFrame:
    """Sitemap discovery: ``Sitemap:`` lines of each robots.txt →
    (host, sitemap_url) — the inputs ``sitemap_frontier`` fetches next,
    closing the robots → sitemaps → frontier loop. Pure JVM path: one
    split + explode + filter, no Python."""
    lines = robots.select(
        "host",
        F.explode(F.split(F.col("robots_txt"), "\r?\n")).alias("_line"),
    )
    return (
        lines.filter(F.lower(F.col("_line")).startswith("sitemap:"))
        .select(
            "host",
            F.trim(F.expr("substring(_line, 9, 1 << 30)"))
            .alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
    )


def sitemap_frontier(sitemaps: DataFrame) -> DataFrame:
    """1→N frontier fan-out over (host, sitemap_xml) rows: one output
    row per sitemap entry with its CANONICAL url — dedupe the frontier
    by joining/grouping on ``url`` before fetching. Index entries
    (``is_index=True``) point at child sitemaps to fetch next."""
    import pandas as pd

    out_schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("is_index", T.BooleanType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for host, xml_text in zip(pdf["host"], pdf["sitemap_xml"]):
                for e in parse_sitemap(xml_text or ""):
                    rows.append((
                        host, e["loc"], e["lastmod"], e["priority"],
                        e["is_index"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=["host", "loc", "lastmod", "priority", "is_index"],
            )

    return (
        sitemaps.select("host", "sitemap_xml")
        .mapInPandas(run, out_schema)
        .withColumn("url", canonicalize_url("loc"))
    )


def filter_robots_disallowed(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "target_uri",
    agent: str = "*",
) -> DataFrame:
    """Drop pages a site's robots.txt disallows for ``agent`` — the
    compliance gate of a crawl pipeline. ``robots`` is a (host,
    robots_txt) dim; it broadcasts onto the crawl side (robots files
    are per-host, ≪ pages), and the stdlib ``urllib.robotparser``
    evaluates inside an Arrow-batched kernel with one parsed
    RobotFileParser per distinct host per batch (memoized). Pages on
    hosts without a robots row pass (the crawl-standard default)."""
    import pandas as pd

    keyed = pages.withColumn("_host", url_host(url_col))
    joined = keyed.join(
        F.broadcast(
            robots.select(
                F.col("host").alias("_host"),
                F.col("robots_txt").alias("_robots"),
            )
        ),
        "_host",
        "left",
    )
    out_schema = T.StructType(
        [joined.schema[c] for c in joined.columns]
        + [T.StructField("_allowed", T.BooleanType())]
    )

    def run(batches):
        from urllib.robotparser import RobotFileParser

        parsers: dict[str, RobotFileParser] = {}

        def parser_for(txt: str) -> RobotFileParser:
            p = parsers.get(txt)
            if p is None:
                p = RobotFileParser()
                p.parse(txt.splitlines())
                parsers[txt] = p
            return p

        for pdf in batches:
            allowed = []
            for url, txt in zip(pdf[url_col], pdf["_robots"]):
                if txt is None or not isinstance(txt, str):
                    allowed.append(True)
                else:
                    allowed.append(parser_for(txt).can_fetch(agent, url))
            out = pdf.copy()
            out["_allowed"] = allowed
            yield out

    return (
        joined.mapInPandas(run, out_schema)
        .filter(F.col("_allowed"))
        .drop("_host", "_robots", "_allowed")
    )


def web_ingest(archives: DataFrame) -> DataFrame:
    """WARC archives → documents-shaped rows: successful (HTTP 200)
    HTML responses, boilerplate-stripped, keyed by canonical URL —
    ready for the E1 dedup / E3 quality families. Zero shuffle: scan →
    record fan-out → per-row extraction → projection."""
    from drugbankner_spark.sources.warc_source import warc_records

    recs = warc_records(archives).filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.lower(F.col("content_type")).contains("text/html")
    )
    return html_to_text_df(recs).select(
        canonicalize_url("target_uri").alias("url"),
        url_host("target_uri").alias("host"),
        "title",
        "text",
        "n_links",
        F.col("warc_date").alias("fetched_at"),
    )
