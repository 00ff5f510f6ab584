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


def test_charset_sniff_decode_identity():
    """Real CC HTML is not all UTF-8 (VERDICT r2 item 9): declared
    charsets, BOMs and broken encodings must decode deterministically
    and extract byte-identically to the unicode form."""
    from ie_ray.sources.html import extract_text, sniff_decode
    from ie_ray.sources.pages import _page_html

    body = ["Café déjà-vu — naïve touché.", "Ångström & Ærø øre."]
    html = _page_html("Tïtle", body, "reuters")  # str with non-ascii
    want = extract_text(html)
    assert "Café" in want and "Ångström" in want

    # utf-8 with meta charset declared
    declared = html.replace(
        "<html>", '<html><meta charset="utf-8">', 1)
    assert extract_text(declared.encode("utf-8")) == \
        extract_text(declared)
    # utf-8 BOM
    assert extract_text(b"\xef\xbb\xbf" + html.encode("utf-8")) == want
    # latin-1 page with declared charset (all chars in latin-1 here
    # except Ærø's fine; drop non-latin1 chars first)
    l1 = html.replace("—", "-")
    l1d = l1.replace("<html>",
                     '<html><meta charset="iso-8859-1">', 1)
    assert extract_text(l1d.encode("latin-1")) == extract_text(l1d)
    # http-equiv style declaration
    he = l1.replace(
        "<html>",
        '<html><meta http-equiv="Content-Type" '
        'content="text/html; charset=windows-1252">', 1)
    assert extract_text(he.encode("cp1252")) == extract_text(he)
    # undeclared latin-1 (invalid as utf-8) falls back byte-preserving
    assert extract_text(l1.encode("latin-1")) == extract_text(l1)
    # broken encoding: utf-8 bytes truncated mid-codepoint must not raise
    broken = html.encode("utf-8")[:-1] + b"\xc3"
    out = extract_text(broken)
    assert isinstance(out, str) and len(out) > 0
    # bogus declared codec name falls through to utf-8
    bogus = html.replace("<html>",
                         '<html><meta charset="not-a-codec">', 1)
    assert extract_text(bogus.encode("utf-8")) == extract_text(bogus)
    # utf-16 BOM
    assert sniff_decode(html.encode("utf-16")) == html


def test_extract_text_never_raises_on_junk():
    """Real crawl archives contain truncated gzip members, binary junk
    and mangled markup — the extractor must quarantine (empty/short
    text), never crash the task."""
    import numpy as np

    from ie_ray.sources.html import extract_text

    rng = np.random.RandomState(0)
    for i in range(300):
        n = int(rng.randint(0, 3000))
        junk = bytes(rng.randint(0, 256, size=n, dtype=np.uint8))
        if i % 5 == 0:
            junk = b"\x1f\x8b" + junk          # corrupt gzip magic
        if i % 7 == 0:
            junk = b"<html><article>" + junk   # half-valid markup
        out = extract_text(junk)
        assert isinstance(out, str)
