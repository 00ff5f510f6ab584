"""Deterministic HTML → article text extraction.

Contract (parity: ``src/python/marbles/newsfeed/reuters.py:59-77``): find all
``<span id="article-text">`` containers, collect the text of every ``<p>``
descendant, join with ``'\\n'``.  The extraction must be **byte-identical per
url** against the ``text`` column of the pages table (BASELINE.json
input_hint) — boilerplate outside the container is dropped.

Implemented on the stdlib ``html.parser`` (BeautifulSoup is not available in
this environment, and a 100 TB pipeline wants a single-pass parser anyway).
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser
from typing import List, Optional, Union


class _ArticleExtractor(HTMLParser):
    def __init__(self, container_tag: str = "span",
                 container_id: str = "article-text"):
        super().__init__(convert_charrefs=True)
        self.container_tag = container_tag
        self.container_id = container_id
        self.depth = 0          # inside container?
        self.container_stack = 0
        self.in_p = 0
        self.paragraphs: List[str] = []
        self.buf: List[str] = []

    def handle_starttag(self, tag, attrs):
        if self.depth > 0:
            self.container_stack += 1
            if tag == "p":
                self.in_p += 1
                if self.in_p == 1:
                    self.buf = []
        elif tag == self.container_tag and dict(attrs).get("id") == self.container_id:
            self.depth = 1
            self.container_stack = 0

    def handle_endtag(self, tag):
        if self.depth > 0:
            if tag == "p" and self.in_p > 0:
                self.in_p -= 1
                if self.in_p == 0:
                    self.paragraphs.append("".join(self.buf))
                    self.buf = []
            if self.container_stack == 0 and tag == self.container_tag:
                self.depth = 0
            else:
                self.container_stack = max(0, self.container_stack - 1)

    def handle_data(self, data):
        if self.depth > 0 and self.in_p > 0:
            self.buf.append(data)


def extract_text(html: Union[bytes, str]) -> str:
    """Extract article text from page HTML (see module docstring)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _ArticleExtractor()
    p.feed(html)
    p.close()
    return "\n".join(p.paragraphs)
