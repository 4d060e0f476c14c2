"""Pure-stdlib HTML → text extraction — the boilerplate-stripping front
of a web-crawl ingestion pipeline (E3/web family).

``html.parser``-based (no lxml/bs4 in this environment, none needed):
script/style/template/noscript subtrees drop entirely, block-level
elements contribute newlines so paragraph structure survives, entities
unescape, whitespace collapses per line. Also extracts the title and
outgoing links (href + anchor text) for the URL-level curation
operators in operators/web.py.

Executor-side usage: called from Arrow-batched ``mapInPandas`` /
pandas UDFs — embarrassingly parallel, shuffles nothing.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP_SUBTREES = {"script", "style", "noscript", "template", "svg"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "h1", "h2",
    "h3", "h4", "h5", "h6", "section", "article", "header", "footer",
    "blockquote", "pre", "hr", "nav", "aside", "form",
}
#: Inline-boundary tags: adjacent cells must not fuse ("<td>a</td>
#: <td>b</td>" → "a b", not "ab"), but they stay on one line.
_CELL = {"td", "th"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.links: list[tuple[str, str]] = []
        self.title_parts: list[str] = []
        self._drop_depth = 0
        self._in_title = False
        self._href: str | None = None
        self._anchor_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREES:
            self._drop_depth += 1
            return
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK:
            self.parts.append("\n")
        elif tag in _CELL:
            self.parts.append(" ")
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self._href = href
                self._anchor_parts = []

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREES:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self.parts.append("\n")
        if tag == "a" and self._href is not None:
            self.links.append(
                (self._href, " ".join("".join(self._anchor_parts).split()))
            )
            self._href = None

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        self.parts.append(data)
        if self._href is not None:
            self._anchor_parts.append(data)


def html_to_text(html: str) -> str:
    """Visible text with block structure as newlines; scripts, styles
    and head content removed; per-line whitespace collapsed; ≥2 blank
    lines squeeze to one."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    raw = "".join(p.parts)
    lines = [" ".join(ln.split()) for ln in raw.split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln:
            out.append(ln)
        elif out and out[-1] != "":
            out.append("")
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


def html_title(html: str) -> str:
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return " ".join("".join(p.title_parts).split())


def html_links(html: str) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs in document order."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.links


_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_:.-]+)""", re.I
)


def sniff_charset(body: bytes, http_content_type: str | None) -> str:
    """Charset from the HTTP Content-Type, else a <meta charset> probe
    in the first 4 KiB, else utf-8."""
    if http_content_type:
        m = re.search(r"charset=([A-Za-z0-9_:.-]+)", http_content_type, re.I)
        if m:
            return m.group(1).lower()
    m = _META_CHARSET.search(body[:4096])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return "utf-8"


def decode_html(body: bytes, http_content_type: str | None = None) -> str:
    cs = sniff_charset(body, http_content_type)
    try:
        return body.decode(cs, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")
