"""Web ingestion: WARC source, HTML extraction, URL canonicalization
(sources/warc_source.py, functions/html_text.py, operators/web.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drugbankner_spark.functions import html_text as H  # noqa: E402
from drugbankner_spark.operators import web as W  # noqa: E402
from drugbankner_spark.sources import warc_source as WS  # noqa: E402

PAGE = b"""<html><head><title>My  Page</title>
<style>body { color: red }</style>
<script>var x = "SCRIPT NOISE";</script></head>
<body><h1>Heading</h1>
<p>First paragraph with <b>bold</b> text.</p>
<div>Second   block</div>
<a href="https://example.com/next">next page</a>
<noscript>no js</noscript>
</body></html>"""


# ------------------------------------------------------------- html_text

def test_html_to_text_strips_boilerplate():
    text = H.html_to_text(PAGE.decode())
    assert "SCRIPT NOISE" not in text and "color: red" not in text
    assert "no js" not in text
    lines = text.split("\n")
    assert "Heading" in lines
    assert "First paragraph with bold text." in lines
    assert "Second block" in lines  # whitespace collapsed


def test_html_title_and_links():
    assert H.html_title(PAGE.decode()) == "My Page"
    assert H.html_links(PAGE.decode()) == [
        ("https://example.com/next", "next page")
    ]


def test_html_entities_unescape():
    assert H.html_to_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_html_table_cells_keep_separation():
    html = ("<table><tr><td>alpha</td><td>beta</td></tr>"
            "<tr><th>g</th><th>d</th></tr></table>")
    lines = H.html_to_text(html).split("\n")
    assert "alpha beta" in lines  # cells don't fuse into 'alphabeta'
    assert "g d" in lines


def test_charset_sniffing():
    assert H.sniff_charset(b"", "text/html; charset=ISO-8859-1") == \
        "iso-8859-1"
    assert H.sniff_charset(
        b'<html><meta charset="windows-1252"></html>', None
    ) == "windows-1252"
    assert H.sniff_charset(b"<html></html>", None) == "utf-8"
    # latin-1 body decodes via the HTTP header charset
    body = "caf\xe9".encode("latin-1")
    assert H.decode_html(body, "text/html; charset=latin-1") == "café"


# ------------------------------------------------------------------ WARC

def _fixture_archive(gz: bool = False) -> bytes:
    recs = [
        WS.encode_warc_record("warcinfo", payload=b"software: test\r\n"),
        WS.encode_warc_record(
            "response", "https://example.com/a",
            WS.encode_http_response(PAGE),
        ),
        WS.encode_warc_record(
            "response", "https://example.com/miss",
            WS.encode_http_response(b"gone", status=404,
                                    content_type="text/plain"),
        ),
        WS.encode_warc_record(
            "request", "https://example.com/a", b"GET /a HTTP/1.1\r\n",
        ),
    ]
    return WS.encode_warc(recs, gzip_members=gz)


def test_parse_warc_roundtrip():
    recs = WS.parse_warc(_fixture_archive())
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "response", "response", "request"
    ]
    status, headers, body = WS.split_http_response(recs[1]["payload"])
    assert status == 200 and body == PAGE
    assert headers["content-type"].startswith("text/html")


def test_parse_warc_gzip_members_and_truncation():
    gz = _fixture_archive(gz=True)
    assert [r["headers"]["warc-type"] for r in WS.parse_warc(gz)] == [
        "warcinfo", "response", "response", "request"
    ]
    cut = WS.parse_warc(_fixture_archive()[:-60])  # truncated tail
    assert len(cut) == 3  # last record dropped, earlier ones intact


def test_http_chunked_and_compressed_bodies():
    import zlib

    # chunked framing removed
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    status, _, body = WS.split_http_response(chunked)
    assert status == 200 and body == b"hello world"
    # gzip content-encoding decompressed
    comp = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    gz = comp.compress(b"payload text") + comp.flush()
    gzipped = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz
    )
    _, _, body = WS.split_http_response(gzipped)
    assert body == b"payload text"
    # deflate (zlib-wrapped) too
    dz = zlib.compress(b"deflated body")
    _, _, body = WS.split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + dz
    )
    assert body == b"deflated body"
    # corrupt gzip keeps the raw bytes instead of dying
    _, _, body = WS.split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip"
    )
    assert body == b"not-gzip"


def test_warc_records_fanout(spark):
    archives = spark.createDataFrame(
        [("mem://a.warc", bytearray(_fixture_archive()))],
        "path string, content binary",
    )
    rows = WS.warc_records(archives).collect()
    assert len(rows) == 4
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert {r["http_status"] for r in resp} == {200, 404}
    assert resp[0]["target_uri"] == "https://example.com/a"
    assert bytes(resp[0]["body"]) == PAGE


# ---------------------------------------------------------- URL handling

def test_canonicalize_url_cases(spark):
    cases = [
        ("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=7#frag",
         "https://www.example.com/Path?id=7"),
        ("http://host:80/", "http://host/"),
        ("http://host:8080/a/", "http://host:8080/a"),
        ("https://h.com", "https://h.com/"),
        ("https://h.com/p?fbclid=z&gclid=q", "https://h.com/p"),
        ("https://h.com/p?a=1&b=2", "https://h.com/p?a=1&b=2"),
        ("https://User:Pw@H.com:443/x", "https://h.com/x"),  # userinfo
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in
           df.select(W.canonicalize_url("url")).collect()]
    assert got == [want for _, want in cases]
    hosts = [r[0] for r in df.select(W.url_host("url")).collect()]
    assert hosts == ["www.example.com", "host", "host", "h.com",
                     "h.com", "h.com", "h.com"]


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>HTTPS://S.com/a/?utm_source=x</loc>
       <lastmod>2024-02-01</lastmod><priority>0.8</priority></url>
  <url><loc>https://s.com/b</loc></url>
  <url><priority>0.1</priority></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://s.com/sitemap-1.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_and_index():
    entries = W.parse_sitemap(SITEMAP)
    assert [e["loc"] for e in entries] == [
        "HTTPS://S.com/a/?utm_source=x", "https://s.com/b"
    ]  # loc-less entry dropped
    assert entries[0]["lastmod"] == "2024-02-01"
    assert entries[0]["priority"] == 0.8
    assert not entries[0]["is_index"]
    idx = W.parse_sitemap(SITEMAP_INDEX)
    assert idx == [{"loc": "https://s.com/sitemap-1.xml",
                    "lastmod": None, "priority": None, "is_index": True}]
    assert W.parse_sitemap("not xml <<<") == []
    assert W.parse_sitemap("<html></html>") == []


def test_sitemaps_from_robots(spark):
    robots = spark.createDataFrame(
        [("s.com",
          "User-agent: *\nDisallow: /tmp\n"
          "Sitemap: https://s.com/sitemap.xml\r\n"
          "sitemap:   https://s.com/sitemap-news.xml\n"),
         ("bare.org", "User-agent: *\nAllow: /\n")],
        ["host", "robots_txt"],
    )
    got = sorted(
        (r["host"], r["sitemap_url"])
        for r in W.sitemaps_from_robots(robots).collect()
    )
    assert got == [
        ("s.com", "https://s.com/sitemap-news.xml"),
        ("s.com", "https://s.com/sitemap.xml"),
    ]


def test_decode_sitemap_gzip():
    import zlib

    comp = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    gz = comp.compress(SITEMAP.encode()) + comp.flush()
    entries = W.parse_sitemap(W.decode_sitemap(gz))
    assert len(entries) == 2
    assert W.decode_sitemap(SITEMAP.encode()) == SITEMAP
    assert W.decode_sitemap(b"\x1f\x8bnot-really-gzip") == ""


def test_sitemap_frontier_canonicalizes(spark):
    df = spark.createDataFrame(
        [("s.com", SITEMAP), ("s.com", SITEMAP_INDEX)],
        ["host", "sitemap_xml"],
    )
    rows = W.sitemap_frontier(df).collect()
    urls = {r["url"] for r in rows if not r["is_index"]}
    assert urls == {"https://s.com/a", "https://s.com/b"}  # canonical
    assert any(r["is_index"] for r in rows)


def test_robots_disallow_filter(spark):
    robots_txt = (
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
        "\nUser-agent: specialbot\nDisallow: /\n"
    )
    pages = spark.createDataFrame(
        [
            ("https://s.com/public/page",),
            ("https://s.com/private/secret",),
            ("https://s.com/tmp",),
            ("https://other.org/anything",),   # no robots row → allowed
        ],
        ["target_uri"],
    )
    robots = spark.createDataFrame(
        [("s.com", robots_txt)], ["host", "robots_txt"]
    )
    kept = {r["target_uri"]
            for r in W.filter_robots_disallowed(pages, robots).collect()}
    assert kept == {"https://s.com/public/page",
                    "https://other.org/anything"}
    # a stricter per-agent section applies when that agent crawls
    special = {r["target_uri"] for r in W.filter_robots_disallowed(
        pages, robots, agent="specialbot").collect()}
    assert special == {"https://other.org/anything"}


def test_canonicalize_url_fuzz_idempotent(spark):
    # 300 structured-random URLs in ONE DataFrame pass: canonicalize is
    # a fixed point and host extraction agrees with a python reference
    import random

    rng = random.Random(11)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["Example.COM", "sub.Host.org", "x.net:8080", "y.io:443",
             "z.dev:80"]
    paths = ["", "/", "/A/b", "/A/b/", "/p%20q"]
    queries = ["", "?a=1", "?utm_source=t&a=1", "?fbclid=x",
               "?a=1&utm_medium=m&b=2"]
    frags = ["", "#f", "#sec-2"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url",
        W.canonicalize_url("url").alias("c1"),
        W.canonicalize_url(W.canonicalize_url("url")).alias("c2"),
        W.url_host("url").alias("h"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], r
        host = r["url"].split("://", 1)[1]
        host = host.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
        assert r["h"] == host.split(":", 1)[0].lower(), r
        assert "utm_" not in r["c1"] and "fbclid" not in r["c1"]
        assert "#" not in r["c1"]


def test_canonicalize_url_idempotent(spark):
    # canonical output is a fixed point: running the normalizer on its
    # own output changes nothing (the property that makes it safe as a
    # join key at any pipeline stage)
    urls = [
        "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=7#frag",
        "http://host:80/", "http://host:8080/a/", "https://h.com",
        "https://h.com/p?fbclid=z&a=1&gclid=q", "https://h.com/a/b/c/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(W.canonicalize_url("url").alias("c1"))
    twice = once.select(
        "c1", W.canonicalize_url("c1").alias("c2")
    ).collect()
    for r in twice:
        assert r["c1"] == r["c2"], r


def test_blocklist_filter(spark):
    pages = spark.createDataFrame(
        [("https://spam.example/x",), ("https://good.org/y",)],
        ["target_uri"],
    )
    blocked = spark.createDataFrame([("spam.example",)], ["host"])
    out = W.filter_blocked_hosts(pages, blocked).collect()
    assert [r["target_uri"] for r in out] == ["https://good.org/y"]


# ------------------------------------------------------------ end-to-end

def test_web_ingest_end_to_end(spark):
    archives = spark.createDataFrame(
        [("mem://a.warc.gz", bytearray(_fixture_archive(gz=True)))],
        "path string, content binary",
    )
    docs = W.web_ingest(archives).collect()
    # only the 200 text/html response survives
    assert len(docs) == 1
    d = docs[0]
    assert d["url"] == "https://example.com/a"
    assert d["host"] == "example.com"
    assert d["title"] == "My Page"
    assert "First paragraph with bold text." in d["text"]
    assert "SCRIPT NOISE" not in d["text"]
    assert d["n_links"] == 1


def test_web_to_corpus_composition(spark, tmp_path):
    # the full crawl-to-corpus story: WARC archives → web_ingest →
    # url-keyed docs → continuous-ingest admission (exact dedup +
    # near-dup band probe + quality rules). Two pages carry identical
    # body text — only the first admitted survives.
    from drugbankner_spark.operators.corpus import ingest_clean_batch

    prose = " ".join(
        f"the stage{i} shuffles and stage{i}b broadcasts" for i in range(12)
    )
    body = (
        "<html><head><title>T</title></head><body><p>"
        + prose + "</p></body></html>"
    ).encode()
    def page(uri, payload):
        return WS.encode_warc_record(
            "response", uri, WS.encode_http_response(payload)
        )
    archive = WS.encode_warc([
        page("https://a.com/one", body),
        page("https://b.org/copy", body),               # exact dup
        page("https://c.net/short", b"<html><p>tiny</p></html>"),  # low quality
    ])
    archives = spark.createDataFrame(
        [("mem://c.warc", bytearray(archive))], "path string, content binary"
    )
    docs = W.web_ingest(archives).select(
        F.xxhash64("url").alias("doc_id"), F.col("text"),
    )
    admitted = ingest_clean_batch(
        spark, docs, str(tmp_path / "state"), min_tokens=20,
    )
    assert admitted.count() == 1  # dup collapsed, tiny page rejected


def test_extract_links_edge_list(spark):
    archives = spark.createDataFrame(
        [("mem://a.warc", bytearray(_fixture_archive()))],
        "path string, content binary",
    )
    recs = WS.warc_records(archives).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    links = W.extract_links_df(recs).collect()
    assert [(r["page_uri"], r["href"], r["anchor_text"])
            for r in links] == [
        ("https://example.com/a", "https://example.com/next", "next page")
    ]


def test_extract_links_resolves_relative(spark):
    html = (b'<html><body><a href="/abs/path">a</a>'
            b'<a href="sibling.html">b</a>'
            b'<a href="https://other.org/x">c</a></body></html>')
    rec = WS.encode_warc_record(
        "response", "https://site.com/dir/page.html",
        WS.encode_http_response(html),
    )
    archives = spark.createDataFrame(
        [("mem://r.warc", bytearray(WS.encode_warc([rec])))],
        "path string, content binary",
    )
    recs = WS.warc_records(archives).filter(
        F.col("warc_type") == "response"
    )
    resolved = [r["href"] for r in W.extract_links_df(recs).collect()]
    assert resolved == [
        "https://site.com/abs/path",
        "https://site.com/dir/sibling.html",
        "https://other.org/x",
    ]
    raw = [r["href"]
           for r in W.extract_links_df(recs, resolve=False).collect()]
    assert raw == ["/abs/path", "sibling.html", "https://other.org/x"]


def test_tracking_filter_derives_from_constant(spark):
    # ADVICE r05: the filter predicate is BUILT from
    # TRACKING_PARAM_PREFIXES — every listed name must drop, prefix
    # names ('utm_') by prefix, exact names by 'name=' (so a distinct
    # param that merely shares the spelling prefix survives).
    params = []
    for name in W.TRACKING_PARAM_PREFIXES:
        params.append(f"{name}x=1" if name.endswith("_") else f"{name}=1")
    url = "https://h.com/p?" + "&".join(params + ["mc_eidx=keep", "a=2"])
    df = spark.createDataFrame([(url,)], ["url"])
    got = df.select(W.canonicalize_url("url")).first()[0]
    assert got == "https://h.com/p?mc_eidx=keep&a=2"
