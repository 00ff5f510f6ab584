"""The regex fast path in extract_text must be byte-equivalent to the
full HTMLParser cascade on every input — verified by construction
(structural checks) and by fuzz here."""

import random

from ie_ray.sources.html import _extract_text_full, _fast_extract, extract_text
from ie_ray.sources.pages import _page_html


def test_fast_path_hits_fixture_layouts():
    """All four fixture layouts either fast-extract identically or fall
    back; reuters/wapo/nyt/generic must actually take the fast path."""
    for layout in ("reuters", "washingtonpost", "nytimes", "foxnews"):
        html = _page_html("T", ["Alpha beta.", "Gamma delta."], layout)
        assert extract_text(html) == _extract_text_full(html), layout
    for layout in ("reuters", "washingtonpost", "nytimes"):
        html = _page_html("T", ["Alpha beta.", "Gamma delta."], layout)
        assert _fast_extract(html) is not None and \
            _fast_extract(html) == _extract_text_full(html), layout


def test_fast_path_fuzz_equivalence():
    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "<b>x</b>", "&amp;", "a & b",
             "nested <span id=\"article-text\">t</span>", "plain"]
    layouts = ["reuters", "washingtonpost", "nytimes", "foxnews"]
    for i in range(400):
        paras = [" ".join(rng.choices(words, k=rng.randint(1, 6)))
                 for _ in range(rng.randint(0, 4))]
        layout = rng.choice(layouts)
        html = _page_html("T%d" % i, paras, layout)
        if rng.random() < 0.3:   # splice extra chrome / second container
            html = html.replace("<footer>", rng.choice(
                ['<article><p>stray</p></article><footer>',
                 '<span id="article-text"><p>second</p></span><footer>',
                 '<p class="story-body-text story-content">tail</p><footer>',
                 '<footer>']))
        assert extract_text(html) == _extract_text_full(html), (i, layout)


def test_fast_path_edge_cases():
    cases = [
        "",                                           # empty
        "<html><body><p>no container</p></body></html>",
        '<span id="article-text"></span>',            # empty container
        '<article itemprop="articleBody"><p class="">x</p></article>',
        '<article itemprop="articleBody"><p class="a">x</p><p>y</p></article>',
        '<article><p>g</p></article>',
        '<article data-x="1"><p>g</p></article>',     # attrs → slow path
        '<span id="article-text"><p>a</p><div>z</div><p>b</p></span>',
        '<span id="article-text"><p>a &amp; b</p></span>',   # entity → slow
    ]
    for html in cases:
        assert extract_text(html) == _extract_text_full(html), html


def test_gzip_payload_extraction_identity():
    """CC-style gzipped html payloads decompress transparently and
    extract byte-identically to the raw form."""
    import gzip
    from ie_ray.sources.html import extract_text
    from ie_ray.sources.pages import synthesize_pages
    for r in synthesize_pages(24):
        assert extract_text(gzip.compress(r["html"])) == r["text"]
        assert extract_text(r["html"]) == r["text"]
