"""Deterministic HTML → article text extraction, multi-domain.

Per-domain container contracts (parity with the reference's four
scrapers; a CC-style pages table has heterogeneous layouts):

* Reuters (``newsfeed/reuters.py:59-77``): every ``<span
  id="article-text">``, text of each ``<p>`` descendant.
* Washington Post (``newsfeed/washingtonpost.py``): ``<article
  itemprop="articleBody">``, only ``<p>`` tags WITHOUT a class attr.
* Fox (``newsfeed/foxnews.py``): ``<div class="article-body">``, every
  ``<p>`` descendant.
* NYT (``newsfeed/nytimes.py``): no container — the paragraphs
  themselves carry ``class="story-body-text story-content"``.
* Generic fallback: every ``<article>`` container's ``<p>`` descendants
  (covers the long tail of layouts).

Paragraph texts are joined with ``'\\n'`` (all four reference scrapers
do exactly this), and the result must be **byte-identical per url**
against the ``text`` column of the pages table (BASELINE.json
input_hint).  ``extract_text`` runs the rules as a deterministic
cascade — first rule that yields any paragraphs wins — so no
domain-routing metadata is needed at 10^12-page scale.

Implemented on the stdlib ``html.parser`` (BeautifulSoup is not
available in this environment, and a 100 TB pipeline wants a
single-pass parser anyway).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Callable, List, Optional, Tuple, Union


class _ParagraphCollector(HTMLParser):
    """One-pass paragraph collector.

    ``container_pred(tag, attrs)`` selects container elements (None means
    "the whole document"); ``p_pred(attrs)`` filters which ``<p>``
    descendants count.
    """

    def __init__(self,
                 container_pred: Optional[Callable[[str, dict], bool]],
                 p_pred: Callable[[dict], bool] = lambda attrs: True):
        super().__init__(convert_charrefs=True)
        self.container_pred = container_pred
        self.container_tag: Optional[str] = None
        self.p_pred = p_pred
        self.depth = 0          # inside container?
        self.container_stack = 0
        self.in_p = 0
        self.collecting = False
        self.paragraphs: List[str] = []
        self.buf: List[str] = []

    def handle_starttag(self, tag, attrs):
        attrs_d = dict(attrs)
        if self.container_pred is None or self.depth > 0:
            if self.container_pred is not None:
                self.container_stack += 1
            if tag == "p":
                self.in_p += 1
                if self.in_p == 1:
                    self.collecting = self.p_pred(attrs_d)
                    self.buf = []
        elif self.container_pred(tag, attrs_d):
            self.depth = 1
            self.container_tag = tag
            self.container_stack = 0

    def handle_endtag(self, tag):
        if self.container_pred is None or self.depth > 0:
            if tag == "p" and self.in_p > 0:
                self.in_p -= 1
                if self.in_p == 0:
                    if self.collecting:
                        self.paragraphs.append("".join(self.buf))
                    self.collecting = False
                    self.buf = []
            if self.container_pred is not None:
                if self.container_stack == 0 and tag == self.container_tag:
                    self.depth = 0
                else:
                    self.container_stack = max(0, self.container_stack - 1)

    def handle_data(self, data):
        if self.in_p > 0 and self.collecting:
            self.buf.append(data)


def _classes(attrs: dict) -> set:
    return set((attrs.get("class") or "").split())


# (name, container_pred, p_pred) — cascade order matters: specific
# container contracts before the generic <article> fallback.
_RULES: List[Tuple[str, Optional[Callable], Callable]] = [
    ("reuters",
     lambda tag, a: tag == "span" and a.get("id") == "article-text",
     lambda a: True),
    ("washingtonpost",
     lambda tag, a: tag == "article" and a.get("itemprop") == "articleBody",
     lambda a: "class" not in a),
    ("foxnews",
     lambda tag, a: tag == "div" and "article-body" in _classes(a),
     lambda a: True),
    ("nytimes",
     None,
     lambda a: {"story-body-text", "story-content"} <= _classes(a)),
    ("generic",
     lambda tag, a: tag == "article",
     lambda a: True),
]


class _MultiExtractor(HTMLParser):
    """ALL rules evaluated in ONE parse pass (a cascade of separate parses
    costs ~2.5 full HTML parses per page on a mixed-layout corpus and
    halved 6-CPU flagship throughput).  Per-rule state mirrors
    :class:`_ParagraphCollector` exactly."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        n = len(_RULES)
        self.depth = [0] * n
        self.cstack = [0] * n
        self.ctag = [None] * n
        self.collecting = [False] * n
        self.paragraphs: List[List[str]] = [[] for _ in range(n)]
        self.bufs: List[List[str]] = [[] for _ in range(n)]
        self.in_p = 0

    def handle_starttag(self, tag, attrs):
        attrs_d = dict(attrs)
        is_p = tag == "p"
        if is_p:
            self.in_p += 1
        for i, (_name, cpred, ppred) in enumerate(_RULES):
            if cpred is None:
                if is_p and self.in_p == 1:
                    self.collecting[i] = ppred(attrs_d)
                    self.bufs[i] = []
                continue
            if self.depth[i] > 0:
                self.cstack[i] += 1
                if is_p and self.in_p == 1:
                    self.collecting[i] = ppred(attrs_d)
                    self.bufs[i] = []
            elif cpred(tag, attrs_d):
                self.depth[i] = 1
                self.ctag[i] = tag
                self.cstack[i] = 0

    def handle_endtag(self, tag):
        is_p = tag == "p" and self.in_p > 0
        if is_p:
            self.in_p -= 1
        for i, (_name, cpred, _ppred) in enumerate(_RULES):
            if cpred is None:
                if is_p and self.in_p == 0:
                    if self.collecting[i]:
                        self.paragraphs[i].append("".join(self.bufs[i]))
                    self.collecting[i] = False
                    self.bufs[i] = []
                continue
            if self.depth[i] > 0:
                if is_p and self.in_p == 0:
                    if self.collecting[i]:
                        self.paragraphs[i].append("".join(self.bufs[i]))
                    self.collecting[i] = False
                    self.bufs[i] = []
                if self.cstack[i] == 0 and tag == self.ctag[i]:
                    self.depth[i] = 0
                else:
                    self.cstack[i] = max(0, self.cstack[i] - 1)

    def handle_data(self, data):
        if self.in_p <= 0:
            return
        for i in range(len(_RULES)):
            if self.collecting[i]:
                self.bufs[i].append(data)


def _extract_text_full(html: str) -> str:
    """The general path: every rule evaluated in one HTMLParser pass."""
    p = _MultiExtractor()
    p.feed(html)
    p.close()
    for i in range(len(_RULES)):
        if p.paragraphs[i]:
            return "\n".join(p.paragraphs[i])
    return ""


# -- fast path ---------------------------------------------------------------
#
# The dominant layouts wrap plain ``<p>text</p>`` runs in one container.
# When a page structurally matches that simple shape (verified by a strict
# regex over the container region — no nested tags, no character
# references, single container, and no higher-priority marker present),
# the paragraphs can be pulled with C-speed regex instead of the
# ~340 µs/page HTMLParser walk.  ANY verification failure falls back to
# the full parser, so the fast path can only ever reproduce — never
# change — the cascade's output (fuzz-tested in tests/test_pipeline.py).

import re  # noqa: E402

_SIMPLE_PS = re.compile(r'(?:<p(?: class="[^"<&]*")?>[^<&]*</p>)*\Z')
_P_RE = re.compile(r'<p(?: class="([^"<&]*)")?>([^<&]*)</p>')
_NYT_P = re.compile(r'<p class="story-body-text story-content">([^<&]*)</p>')

# (detect marker, container open tag, end tag, nesting probe, p must lack
# class) in cascade priority.  detect != container for the generic rule:
# '<article' detects the rule, but only the attribute-less '<article>'
# form is fast-extractable.
_FAST_RULES = [
    ('<span id="article-text">', '<span id="article-text">',
     "</span>", "<span", False),
    ('<article itemprop="articleBody">', '<article itemprop="articleBody">',
     "</article>", "<article", True),
    ("<article", "<article>", "</article>", "<article", False),
]
_ALL_MARKERS = ('<span id="article-text">', '<article itemprop="articleBody">',
                "article-body", "story-body-text", "<article")


def _fast_extract(html: str) -> Optional[str]:
    present = [m for m in _ALL_MARKERS if m in html]
    if not present:
        return ""          # no rule can fire — empty output, proven cheaply
    first = present[0]
    for detect, container, endtag, probe, skip_classed in _FAST_RULES:
        if first != detect:
            continue
        pos = html.find(container)
        if pos < 0 or html.find(container, pos + 1) >= 0:
            return None                 # absent simple form / multiple
        start = pos + len(container)
        end = html.find(endtag, start)
        if end < 0:
            return None
        region = html[start:end]
        if probe in region or not _SIMPLE_PS.match(region):
            return None
        out = [m.group(2) for m in _P_RE.finditer(region)
               if not (skip_classed and m.group(1) is not None)]
        return "\n".join(out) if out else None
    if first == "article-body":
        # Fox: <div class="...article-body..."> container.  Fast only for
        # a single occurrence inside a simple attribute-terminated tag.
        if html.count("article-body") != 1:
            return None
        pos = html.find("article-body")
        s = html.rfind('<div class="', 0, pos)
        if s < 0:
            return None
        m = re.match(r'<div class="([^"<&]*)">', html[s:pos + 200])
        if not m or "article-body" not in m.group(1).split():
            return None
        start = s + m.end()
        end = html.find("</div>", start)
        if end < 0:
            return None
        region = html[start:end]
        if "<div" in region or not _SIMPLE_PS.match(region):
            return None
        out = [mm.group(2) for mm in _P_RE.finditer(region)]
        return "\n".join(out) if out else None
    if first == "story-body-text":
        # NYT: paragraphs carry the classes directly.  Equivalence holds
        # iff every marker occurrence is the exact simple form.
        ps = _NYT_P.findall(html)
        if len(ps) == html.count("story-body-text") and ps:
            return "\n".join(ps)
        return None
    return None          # fox / generic / mixed layouts → full parser


_META_CHARSET = re.compile(
    br"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""", re.I)
_XML_ENC = re.compile(br"""<\?xml[^>]+encoding=["']([A-Za-z0-9_.:-]+)""",
                      re.I)


def sniff_decode(html: bytes) -> str:
    """Decode page bytes the way a browser would (real CC HTML is not
    all UTF-8): BOM first, then a declared ``<meta charset>`` /
    ``http-equiv`` / XML-prolog encoding in the first 4 KiB, then
    strict UTF-8, then latin-1 (the byte-preserving fallback — every
    byte decodes, so broken encodings degrade deterministically
    instead of raising)."""
    if html[:3] == b"\xef\xbb\xbf":
        return html[3:].decode("utf-8", errors="replace")
    if html[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return html.decode("utf-16", errors="replace")
    head = html[:4096]
    m = _META_CHARSET.search(head) or _XML_ENC.search(head)
    if m:
        name = m.group(1).decode("ascii", "ignore").strip().lower()
        # html5 spec quirk browsers honor; then try the declared codec
        if name in ("latin-1", "iso-8859-1", "us-ascii", "ascii",
                    "windows-1252", "cp1252"):
            return html.decode("cp1252", errors="replace")
        try:
            return html.decode(name, errors="replace")
        except LookupError:
            pass
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


def extract_text(html: Union[bytes, str]) -> str:
    """Extract article text from page HTML (see module docstring).

    Accepts raw or gzip-compressed bytes (CC-style archives often store
    payloads gzipped; the 1f-8b magic check costs nothing on raw pages).
    Non-UTF-8 pages decode via ``sniff_decode``.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html)
        if html[:2] == b"\x1f\x8b":
            import gzip
            try:
                html = gzip.decompress(html)
            except (OSError, EOFError):
                # corrupt/truncated gzip member (real crawl archives have
                # them): treat the payload as raw bytes rather than
                # killing the extraction task — the page then flows to
                # the ordinary empty-text quarantine if undecodable
                pass
        html = sniff_decode(html)
    fast = _fast_extract(html)
    if fast is not None:
        return fast
    return _extract_text_full(html)
