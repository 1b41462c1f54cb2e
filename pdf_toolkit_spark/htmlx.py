"""HTML main-content extraction: DOM parse + boilerplate heuristics.

The north rule names "HTML boilerplate strip ... DOM heuristics" as
part of the extraction surface; this module is the serial kernel (the
distributed twin lives in spark/html_job.py). Everything here is
public-knowledge readability/boilerpipe-style heuristics:

- parse HTML into a lightweight DOM (stdlib html.parser — no deps);
- drop non-content subtrees by TAG (script/style/nav/footer/...) and
  by id/class BOILERPLATE pattern (sidebar, menu, related, ad, ...);
- classify text blocks by LINK DENSITY (linked chars / total chars)
  and normalized text length — the two classic boilerpipe features;
- emit the surviving blocks as the engine's interleaved span tuple
  (kind, text, media_ref, offset) in document order; <img> elements
  inside content become image spans.

Per-document heuristics cannot catch site-level boilerplate that
LOOKS like content (a long, link-free footer slogan repeated on every
page of a site). That is stripped corpus-wide by the distributed job:
spans whose (site, norm_text) occurs in >= BOILER_MIN_DOCS distinct
documents of one site are boilerplate — the same repeated-span
frequency rule the PDF pipeline applies across pages
(spark/job.py strip_boilerplate), lifted from pages to a corpus.

A deterministic generator (html_from_text) wraps the testdata
``documents`` rows into fixture pages with nav/sidebar/related/footer
chrome around the real text, so ground truth is exactly derivable —
the DuckDB oracle recomputes expected span counts from the raw table
(ops/html_queries.py) and tests pin the DOM behavior block by block.
"""

from __future__ import annotations

import html as html_mod
import re
from html.parser import HTMLParser

#: Generator/extractor contract constants — mirrored literally into
#: the DuckDB oracle SQL (ops/html_queries.py), keep in lockstep.
N_SITES = 13              # site = int(doc_id) % N_SITES
PARA_WORDS = 30           # words per generated paragraph
HEAD_WORDS = 6            # words in the generated <h1>
IMG_EVERY = 4             # an <img> precedes paragraph i when i % IMG_EVERY == IMG_PHASE
IMG_PHASE = 2
MIN_CONTENT_NORM = 25     # min normalized-text length for a content block
MAX_LINK_DENSITY = 0.33   # blocks above this are navigation, not content
BOILER_MIN_DOCS = 3       # corpus strip: norm_text in >= this many docs of a site

#: Per-site footer slogans: long, link-free, content-looking — only
#: the corpus-level frequency rule can strip them. Deterministic and
#: > MIN_CONTENT_NORM normalized chars each (the oracle embeds these
#: same strings).
SLOGANS = [
    f"Site {s} brings carefully curated long form writing to readers "
    f"around the world every single day of the year"
    for s in range(N_SITES)
]

_STRIP_TAGS = {
    "script", "style", "noscript", "template", "head", "svg", "iframe",
    "form", "button", "select", "object", "embed",
}
_BOILER_TAGS = {"nav", "header", "footer", "aside"}
_BOILER_ATTR_RE = re.compile(
    r"(^|[\s_-])(nav|menu|footer|header|sidebar|side-bar|comment|banner|"
    r"breadcrumb|share|social|related|promo|sponsor|advert|ads?)([\s_-]|$)",
    re.I,
)
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "td", "li", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "figcaption", "dd", "dt",
}
_VOID_TAGS = {
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "source", "track", "wbr",
}

_NORM_RE = re.compile(r"[^a-z0-9]+")


def norm_text(s: str) -> str:
    """The engine's canonical normalization (ops/common.py norm_text /
    SQL_NORM): lowercase, non-alphanumerics collapsed to one space."""

    return _NORM_RE.sub(" ", s.lower()).strip()


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str
        self.parent = parent


class _DomBuilder(HTMLParser):
    """Lenient tree builder: unknown/unbalanced close tags pop to the
    nearest matching open element or are ignored (browser-style)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self._cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self._cur)
        self._cur.children.append(node)
        if tag not in _VOID_TAGS:
            self._cur = node

    def handle_startendtag(self, tag, attrs):
        self._cur.children.append(_Node(tag, dict(attrs), self._cur))

    def handle_endtag(self, tag):
        n = self._cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self._cur = n.parent

    def handle_data(self, data):
        if data:
            self._cur.children.append(data)


def parse_dom(html: str) -> _Node:
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


def _is_boiler_subtree(node: _Node) -> bool:
    if node.tag in _STRIP_TAGS or node.tag in _BOILER_TAGS:
        return True
    blob = f"{node.attrs.get('id', '')} {node.attrs.get('class', '')}"
    return bool(_BOILER_ATTR_RE.search(blob))


def _collect_text(node: _Node) -> tuple[str, int]:
    """(whitespace-normalized text, linked-char count) of a subtree."""

    parts: list[str] = []
    link_chars = 0

    def walk(n: _Node, in_link: bool) -> None:
        nonlocal link_chars
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
                if in_link:
                    link_chars += len(" ".join(c.split()))
            else:
                walk(c, in_link or c.tag == "a")

    walk(node, node.tag == "a")
    text = " ".join("".join(parts).split())
    return text, link_chars


def _has_block_child(node: _Node) -> bool:
    return any(
        isinstance(c, _Node) and (c.tag in _BLOCK_TAGS or _has_block_child(c))
        for c in node.children
    )


def extract_html_blocks(html: str) -> list[dict]:
    """Per-document DOM extraction: ordered candidate spans BEFORE the
    corpus-level frequency strip. Each dict: {kind, text, norm_text,
    media_ref}. kind='text' blocks passed the link-density + length
    heuristics; kind='image' entries are <img src> inside content."""

    root = parse_dom(html)
    out: list[dict] = []

    def walk(node: _Node) -> None:
        for c in node.children:
            if not isinstance(c, _Node):
                continue
            if _is_boiler_subtree(c):
                continue
            if c.tag == "img":
                src = c.attrs.get("src") or ""
                if src:
                    out.append(
                        {"kind": "image", "text": None, "norm_text": None,
                         "media_ref": src}
                    )
                continue
            if c.tag in _BLOCK_TAGS and not _has_block_child(c):
                # Leaf block: classify by the boilerpipe features.
                text, link_chars = _collect_text(c)
                nt = norm_text(text)
                if not nt:
                    walk(c)  # still descend for <img> children
                    continue
                density = link_chars / max(len(text), 1)
                is_heading = c.tag in ("h1", "h2", "h3", "h4", "h5", "h6")
                keep = (
                    (is_heading and density == 0.0)
                    or (len(nt) >= MIN_CONTENT_NORM and density <= MAX_LINK_DENSITY)
                )
                # Emit any <img> nested inside the block in order too.
                if keep:
                    _emit_block(c, text, nt)
                continue
            walk(c)

    def _emit_block(node: _Node, text: str, nt: str) -> None:
        # Images nested before/inside the block's text come first in
        # document order only if they precede all text; the generator
        # never nests imgs inside <p>, so a single text span suffices —
        # but handle nested imgs generically: imgs first in DOM order.
        for c in node.children:
            if isinstance(c, _Node) and c.tag == "img":
                src = c.attrs.get("src") or ""
                if src:
                    out.append(
                        {"kind": "image", "text": None, "norm_text": None,
                         "media_ref": src}
                    )
        out.append(
            {"kind": "text", "text": text, "norm_text": nt, "media_ref": None}
        )

    walk(root)
    return out


# ---------------------------------------------------------------------------
# Deterministic fixture generator (testdata documents -> HTML pages)
# ---------------------------------------------------------------------------

def site_of(doc_id: int) -> int:
    return doc_id % N_SITES


def html_from_text(doc_id: int, text: str) -> str:
    """Wrap a documents-table row into a deterministic fixture page:
    real content (heading + PARA_WORDS-word paragraphs + periodic
    images) surrounded by site chrome (nav, sidebar, related links,
    footer, per-site slogan). Ground truth is derivable from (doc_id,
    text) alone — the DuckDB oracle does exactly that."""

    site = site_of(doc_id)
    words = text.split()
    esc = html_mod.escape
    n_paras = max(1, -(-len(words) // PARA_WORDS))
    heading = " ".join(words[:HEAD_WORDS])

    nav = "".join(
        f'<a href="/s{site}/cat{i}">Category {i}</a> ' for i in range(8)
    )
    sidebar = "".join(
        f'<li><a href="/s{site}/top{i}">Top story number {i} headline</a></li>'
        for i in range(6)
    )
    body: list[str] = []
    body.append(f"<h1>{esc(heading)}</h1>" if heading else "<h1></h1>")
    for i in range(n_paras):
        chunk = " ".join(words[i * PARA_WORDS:(i + 1) * PARA_WORDS])
        if i % IMG_EVERY == IMG_PHASE:
            body.append(f'<img src="img/site{site}/p{i:04d}.png" alt="figure">')
        body.append(f"<p>{esc(chunk)}</p>")
    related = "".join(
        f'<li><a href="/s{site}/rel{i}">You may also like this related article {i}</a></li>'
        for i in range(5)
    )
    return (
        "<!DOCTYPE html><html><head><title>"
        f"{esc(heading)}</title>"
        "<style>body{font-family:serif}</style>"
        "<script>var analytics_id=42;</script>"
        "</head><body>"
        f'<nav class="topnav">{nav}</nav>'
        f'<div class="sidebar"><ul>{sidebar}</ul></div>'
        f"<article>{''.join(body)}"
        f'<p class="slogan-free">{esc(SLOGANS[site])}</p>'
        "</article>"
        f'<div class="related"><ul>{related}</ul></div>'
        f'<footer><p>&copy; 2026 Site {site}. All rights reserved.</p></footer>'
        "</body></html>"
    )


def extract_html_document(doc_id: int, text: str) -> list[dict]:
    """Serial oracle for one document: generate + extract (per-doc
    stage only; the corpus-level frequency strip needs the corpus)."""

    return extract_html_blocks(html_from_text(doc_id, text))
