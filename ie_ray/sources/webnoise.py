"""Deterministic web-noise perturbations for parser robustness testing.

The reference's reason for a learned parsing model is messy web text
(beam/nbest knobs, ``CcgServiceHandler.java:59-74``); our held-out
corpora are clean prose, so this module supplies the missing
measurement axis (VERDICT r4 next-round #1): given a clean sentence, it
produces the web-garbage variants a Common-Crawl page actually
contains — URLs and emails in-sentence, emoji, ALL-CAPS headlines,
broken quoting, list fragments, non-ASCII names, HTML entity remnants.

Every perturbation is a pure function of (sentence, index), so fixture
pools are reproducible across processes and rounds.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

_URLS = [
    "https://example.com/news?id=%d&ref=rss",
    "http://t.co/Ab%dXq",
    "www.example.org/story-%d.html",
]
_EMOJI = ["🎉", "🔥", "😂", "👍", "😍", "🚀"]
_NAMES = ["José", "Müller", "Björk", "François", "Zürich", "Nguyên"]


def _strip_final(s: str) -> Tuple[str, str]:
    s = s.strip()
    if s and s[-1] in ".!?":
        return s[:-1].rstrip(), s[-1]
    return s, "."


def url_tail(s: str, i: int) -> str:
    body, fin = _strip_final(s)
    return "%s, according to %s%s" % (body, _URLS[i % len(_URLS)] % i, fin)


def url_mid(s: str, i: int) -> str:
    body, fin = _strip_final(s)
    return "%s (see %s)%s" % (body, _URLS[(i + 1) % len(_URLS)] % i, fin)


def email_attrib(s: str, i: int) -> str:
    body, fin = _strip_final(s)
    return "%s, said a spokesman (press%d@example.com)%s" % (body, i, fin)


def emoji_tail(s: str, i: int) -> str:
    body, fin = _strip_final(s)
    return "%s %s%s%s" % (body, _EMOJI[i % len(_EMOJI)],
                          _EMOJI[(i + 2) % len(_EMOJI)], fin)


def all_caps(s: str, i: int) -> str:
    return s.upper()


def caps_prefix(s: str, i: int) -> str:
    return "BREAKING: " + s


def broken_quote(s: str, i: int) -> str:
    # opening double quote never closed — the classic truncated-scrape
    return '"' + s


def curly_quote(s: str, i: int) -> str:
    words = s.split()
    if len(words) < 3:
        return "“" + s
    k = 1 + (i % (len(words) - 1))
    return " ".join(words[:k]) + " “" + " ".join(words[k:])


def list_dash(s: str, i: int) -> str:
    body, _ = _strip_final(s)
    return "- " + body


def list_bullet(s: str, i: int) -> str:
    return "• " + s


def list_number(s: str, i: int) -> str:
    return "%d. %s" % (1 + i % 9, s)


def nonascii_name(s: str, i: int) -> str:
    """Replace the first mid-sentence capitalized word with an accented
    name (returns s unchanged when there is none)."""
    words = s.split()
    for j in range(1, len(words)):
        w = words[j]
        if w[:1].isupper() and w.strip(".,!?;:\"'").isalpha():
            words[j] = _NAMES[i % len(_NAMES)] + w[len(w.rstrip('.,!?;:"\'')):]
            return " ".join(words)
    return s


def html_amp(s: str, i: int) -> str:
    if " and " in s:
        return s.replace(" and ", " &amp; ", 1)
    body, fin = _strip_final(s)
    return "%s&nbsp;%s" % (body, fin)


def html_br(s: str, i: int) -> str:
    words = s.split()
    if len(words) < 4:
        return s + "<br>"
    k = len(words) // 2
    return " ".join(words[:k]) + " <br> " + " ".join(words[k:])


PERTURBATIONS: Dict[str, Callable[[str, int], str]] = {
    "url_tail": url_tail,
    "url_mid": url_mid,
    "email_attrib": email_attrib,
    "emoji_tail": emoji_tail,
    "all_caps": all_caps,
    "caps_prefix": caps_prefix,
    "broken_quote": broken_quote,
    "curly_quote": curly_quote,
    "list_dash": list_dash,
    "list_bullet": list_bullet,
    "list_number": list_number,
    "nonascii_name": nonascii_name,
    "html_amp": html_amp,
    "html_br": html_br,
}

# standalone web fragments with no clean base sentence — boilerplate a
# crawler inevitably scrapes; the parser must quarantine-or-parse, not
# crash, and the pipeline counts them in the quarantine budget
WEB_FRAGMENTS: List[str] = [
    "Click here to read more >>",
    "Share this article: Facebook Twitter LinkedIn",
    "Advertisement",
    "Photo: Getty Images",
    "Related: 10 things you missed this week",
    "Sign up for our newsletter to get the latest updates.",
    "Copyright 2024 Example Media. All rights reserved.",
    "Comments (42) | Posted by admin | Tags: news, politics",
    "Read more >> http://example.com/full-story",
    "*** UPDATED 10:45 AM ***",
]


def adversarial_pool(sentences: List[str]) -> List[Tuple[str, str]]:
    """(perturbation_name, noisy_sentence) for every clean base sentence,
    cycling perturbations deterministically so each kind gets an even
    share of the pool."""
    kinds = list(PERTURBATIONS)
    out: List[Tuple[str, str]] = []
    for i, s in enumerate(sentences):
        for off in range(3):          # 3 distinct noise kinds per base
            kind = kinds[(i * 3 + off) % len(kinds)]
            if kind == "all_caps" and len(s.split()) > 12:
                kind = "caps_prefix"  # headlines are short by nature
            out.append((kind, PERTURBATIONS[kind](s, i)))
    out.extend(("fragment", f) for f in WEB_FRAGMENTS)
    return out
