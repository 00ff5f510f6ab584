"""Deterministic text normalization and sentence segmentation.

``preprocess_sentence`` reproduces the reference's normalization contract
(``src/python/marbles/ie/utils/text.py:17-43``): unicode→ascii quote
substitutions, padding around punctuation, clitic splitting (``'s/'ll/n't``),
currency spacing, whitespace collapse, and the ``wo n't → won't`` fix-ups.
Rule ORDER matters and is part of the contract.

Sentence segmentation replaces the reference's NLTK ``sent_tokenize``
(``src/python/marbles/aws/__init__.py:277-284``) with a deterministic
rule-based splitter (abbreviation-aware end-of-sentence detection).
"""

from __future__ import annotations

import re

# unicode prime quotes ′…‵ → '…'
_USQUOTE = re.compile("′([^′‵]+)‵")
# unicode double quotes → padded ascii "
_UDQUOTE = re.compile("[\"″‴‶‷“”]")
# punctuation that gets space-padded
_UPUNCT = re.compile("([(),:;¡§¶·¿])")
# clitics after a letter: 'll 's 've 'nt 'm 're 'd   (split off with a space)
_SQL1 = re.compile(r"(?<=[a-z])('(?:ll|s|ve|nt|m|re|d))(?=\s|.?$)", re.IGNORECASE)
# 's after a period (e.g. "U.S.'s")
_SQL2 = re.compile(r"(?<=[.])('s)(?=\s|.?$)", re.IGNORECASE)
# other apostrophes: treat as right quote
_SQR = re.compile(r"(')(?!(?:ll|s|ve|nt|m|re|d)(?:\s|.?$))", re.IGNORECASE)
# plural possessive: boys' → boys '
_SQ = re.compile(r"(?<=s)('\s|.?$)", re.IGNORECASE)
# strip sentence-final period after a word (kept attached per reference _FS)
_FS = re.compile(r"(\s+(?:[^\W.]+|'s|s'))(\.)$", re.IGNORECASE)
_SP = re.compile(r"\s\s+")
_CURRENCY = re.compile(
    "([$¢-¥₠-₾﹩＄￠￡￥￦ￜ])"
    r"(\d|[\d.][\d.,]*\d)")


# any character that can fire one of the substitution rules below — plain
# sentences (no quotes/commas/clitics/currency) skip 8 regex scans on the
# fast path, byte-identically (the flagship's hottest kernel after
# extraction; see tests/test_text.py::test_fast_path_identical)
_TRIGGER = re.compile("[′‵″‴‶‷“”\"(),:;¡§¶·¿'’$¢-¥₠-₾﹩＄￠￡￥￦ￜ]")

# web-text tokens that the punctuation rules must never shred: URLs and
# emails survive preprocessing as single opaque spans (stashed behind
# \x01<i>\x01 placeholders, restored after the rule chain).  The final
# char class keeps trailing sentence punctuation OUT of the span so the
# ``.``/``)`` still reaches the rules.  Shared with ccg.parser.tokenize.
URLISH = re.compile(
    r"(?:https?://|www\.)[^\s<>\"]*[^\s<>\".,;:!?)'’]"
    r"|[\w.+-]+@[\w-]+(?:\.[\w-]+)+")


def preprocess_sentence(text: str) -> str:
    """Normalize a sentence for parsing (see module docstring).

    Web-text hardening (round 5): HTML entity remnants are decoded
    before the rule chain (``&amp;``'s ``;`` would otherwise get padded
    into ``&amp ;``), and URL/email spans are stashed so the
    punctuation rules can't shred ``https://…`` into ``https : //…``.
    Both guards trigger only when their marker substrings are present —
    plain prose takes the byte-identical fast path.
    """
    if "&" in text and ";" in text:
        import html as _html
        text = _html.unescape(text).replace("\xa0", " ")
    if "://" in text or "www." in text or "@" in text:
        urls: list = []

        def _stash(m):
            urls.append(m.group(0))
            return "\x01%d\x01" % (len(urls) - 1)

        stashed = URLISH.sub(_stash, text)
        if urls:
            out = _preprocess_plain(stashed)
            for i, u in enumerate(urls):
                out = out.replace("\x01%d\x01" % i, u)
            return out
    return _preprocess_plain(text)


def _preprocess_plain(text: str) -> str:
    if _TRIGGER.search(text) is None:
        # only rules whose patterns can fire without a trigger char:
        # _SQ's `.?$` alternative (final-period padding after -s words),
        # then final-period strip and whitespace collapse — same order as
        # the full chain
        text = _SQ.sub(r" \1", text)
        text = _FS.sub(r"\1", text)
        return _SP.sub(" ", text)
    text = _USQUOTE.sub(r"'\1'", text).replace("’", "'")
    text = _UDQUOTE.sub(' " ', text)
    text = _UPUNCT.sub(r" \1 ", text)
    text = _SQL1.sub(r" \1", text)
    text = _SQL2.sub(r" \1", text)
    text = _SQR.sub(r"\1 ", text)
    text = _SQ.sub(r" \1", text)
    text = _FS.sub(r"\1", text)
    text = _SP.sub(" ", text)
    text = _CURRENCY.sub(r"\1 \2", text)
    # wa, ca, sha are not part of the vocab
    text = text.replace("wo n't", "won't")
    text = text.replace("ca n't", "can't")
    text = text.replace("sha n't", "shan't")
    return text


_ABBREV = {
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc", "inc",
    "ltd", "co", "corp", "gov", "sen", "rep", "gen", "col", "capt", "lt",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept", "oct",
    "nov", "dec", "mon", "tue", "wed", "thu", "fri", "sat", "sun",
    "u.s", "u.k", "u.n", "a.m", "p.m", "no", "vol", "fig", "dept", "est",
}

_SENT_END = re.compile(r"([.!?]+)(\s+)(?=[\"'“]?[A-Z0-9])")


def split_paragraphs(text: str):
    """Paragraphs = text.split('\\n') with empties dropped
    (parity: aws/__init__.py:277-279)."""
    return [p.strip() for p in text.split("\n") if p.strip()]


def split_sentences(paragraph: str):
    """Deterministic sentence segmentation of one paragraph."""
    sents = []
    start = 0
    for m in _SENT_END.finditer(paragraph):
        end = m.end(1)
        # don't split after known abbreviations or single initials
        prev = paragraph[start:end].rstrip(".!?")
        last = prev.rsplit(None, 1)[-1].lower() if prev.split() else ""
        if last in _ABBREV or (len(last) == 1 and last.isalpha()):
            continue
        sents.append(paragraph[start:end].strip())
        start = m.end()
    tail = paragraph[start:].strip()
    if tail:
        sents.append(tail)
    return [s for s in sents if s]
