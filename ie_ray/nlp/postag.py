"""Rule-based POS tagger for the CKY parse path (T1).

Public-knowledge design: a closed-class lexicon + suffix heuristics +
capitalization, with a few context repair passes — the classic
Brill-style baseline.  It does NOT try to be a learned tagger; ambiguity
that matters for parsing (finite verb vs participle, noun vs verb) is
left to the supertagger/CKY, which carries per-category weights and picks
the combination that actually parses.

Tags follow the Penn treebank set used by the CCGBANK leaves the
composer already consumes (``ie_ray/semantics/lexicon.py`` keys off
NNP/VB*/NN*/JJ/PRP/...; parity with the reference's EasySRL leaf tags,
``ext/easysrl/.../ParsePrinter.java`` CCGBANK output).
"""

from __future__ import annotations

import re
from typing import List

_CLOSED = {
    # determiners
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "these": "DT",
    "those": "DT", "each": "DT", "every": "DT", "some": "DT", "any": "DT",
    "no": "DT", "all": "DT", "both": "DT", "another": "DT",
    # possessive pronouns act as determiners in NP/N position
    "his": "PRP$", "her": "PRP$", "its": "PRP$", "their": "PRP$",
    "my": "PRP$", "our": "PRP$", "your": "PRP$",
    # pronouns
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP", "we": "PRP",
    "i": "PRP", "you": "PRP", "him": "PRP", "them": "PRP", "us": "PRP",
    "me": "PRP", "himself": "PRP", "herself": "PRP", "itself": "PRP",
    "themselves": "PRP", "myself": "PRP", "yourself": "PRP",
    "ourselves": "PRP",
    # indefinite pronouns (the -ing/-s suffix rules misread these)
    "something": "NN", "anything": "NN", "nothing": "NN",
    "everything": "NN", "someone": "NN", "anyone": "NN", "everyone": "NN",
    "somebody": "NN", "anybody": "NN", "nobody": "NN", "everybody": "NN",
    "who": "WP", "whom": "WP", "whose": "WP$",
    "which": "WDT", "what": "WP", "there": "EX",
    # conjunctions
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC", "&": "CC",
    # prepositions / subordinators
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN",
    "with": "IN", "for": "IN", "from": "IN", "against": "IN",
    "until": "IN", "into": "IN", "onto": "IN", "over": "IN",
    "under": "IN", "after": "IN", "before": "IN", "during": "IN",
    "between": "IN", "through": "IN", "since": "IN", "without": "IN",
    "despite": "IN", "near": "IN", "around": "IN", "about": "IN",
    "within": "IN", "among": "IN", "amongst": "IN", "amid": "IN",
    "across": "IN", "toward": "IN", "towards": "IN", "beyond": "IN",
    "behind": "IN", "below": "IN", "above": "IN", "outside": "IN",
    "inside": "IN", "alongside": "IN", "per": "IN", "via": "IN",
    "upon": "IN", "throughout": "IN",
    "as": "IN", "like": "IN", "than": "IN", "because": "IN",
    "while": "IN", "if": "IN", "although": "IN", "though": "IN",
    "when": "WRB", "where": "WRB", "why": "WRB", "how": "WRB",
    "that": "IN",   # repaired to DT/WDT in context
    "to": "TO",
    # auxiliaries / modals
    "will": "MD", "would": "MD", "can": "MD", "could": "MD", "may": "MD",
    "might": "MD", "must": "MD", "should": "MD", "shall": "MD",
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "am": "VBP",
    "be": "VB", "been": "VBN", "being": "VBG",
    "has": "VBZ", "have": "VBP", "had": "VBD", "having": "VBG",
    "do": "VBP", "does": "VBZ", "did": "VBD",
    "not": "RB", "n't": "RB", "never": "RB", "also": "RB", "now": "RB",
    "still": "RB", "often": "RB", "already": "RB", "again": "RB",
    "then": "RB", "here": "RB", "too": "RB", "very": "RB", "so": "RB",
    "just": "RB", "only": "RB", "however": "RB", "instead": "RB",
    "even": "RB", "eventually": "RB", "finally": "RB", "once": "IN",
    "unless": "IN", "whenever": "WRB", "wherever": "WRB",
    "whoever": "WP", "whatever": "WDT",
    "more": "RBR", "most": "RBS", "much": "RB",
    # verb particles (Penn RP): the supertagger gives these the
    # VP-postmodifier reading so "ended up", "gave up", "set off" parse
    "up": "RP", "out": "RP", "off": "RP", "down": "RP", "away": "RP",
    "back": "RP",
    "'s": "POS", "'re": "VBP", "'m": "VBP", "'ve": "VBP", "'ll": "MD",
    "'d": "MD",
}

_PUNCT = {".": ".", ",": ",", ";": ";", ":": ":", "?": ".", "!": ".",
          "(": "LRB", ")": "RRB", "“": "LQU", "”": "RQU",
          "'": "POS", '"': "LQU"}

_NUM_RE = re.compile(r"^\d[\d,.]*(st|nd|rd|th|%)?$")

_NOUN_SUFFIX = ("tion", "sion", "ment", "ness", "ity", "ance", "ence",
                "ship", "ism", "ist", "er", "or", "age", "ary", "ery")
_ADJ_SUFFIX = ("ous", "ful", "ive", "able", "ible", "al", "ic", "ish",
               "less", "ial", "ant", "ent")

_HAVE = {"has", "have", "had", "having"}
_BE = {"is", "are", "was", "were", "am", "be", "been", "being"}

# common irregular past/participle forms the suffix rules can't see
# (shared with the lemmatizer's table — same public irregular inventory)
def _irregular_forms():
    from ..semantics.lexicon import _IRREGULAR_VERBS
    skip = {"is", "are", "was", "were", "am", "been", "being", "has", "had",
            "having", "does", "did", "'s", "'re", "'m", "'ve", "goes",
            "doing", "saw", "felt", "left", "lay"}
    return {w for w in _IRREGULAR_VERBS if w not in skip}


_IRREGULAR_PAST = _irregular_forms() | {"died", "met", "won", "ran", "sat",
                                        "let", "put", "set", "cut", "hit",
                                        "cost", "quit", "rid", "shut",
                                        "left", "felt"}


# irregular participles that are ONLY participles (never finite past):
# the suffix rules misread most of these as nouns ("stolen" → NN)
_VBN_ONLY = {"stolen", "seen", "fallen", "eaten", "beaten", "chosen",
             "frozen", "hidden", "ridden", "risen", "shaken", "woken",
             "sworn", "torn", "worn", "drawn", "flown", "blown", "shown",
             "gone", "done", "born", "borne", "lain", "sewn", "gotten",
             "proven", "driven", "forgotten", "forbidden", "mistaken",
             "overtaken", "undertaken", "arisen", "awoken", "bitten",
             "stricken", "swollen", "sunken", "shrunken"}

_MONTH_WORDS = {"may", "march", "august", "january", "february", "april",
                "june", "july", "september", "october", "november",
                "december"}

_ADJ_WORDS = {"next", "last", "first", "second", "third", "own", "former",
              "current", "late", "top", "chief", "senior", "new", "other",
              "few", "several", "many", "such", "same", "main", "key",
              "able", "due", "likely", "ready", "keen"}


def _lex_tag(word: str, lower: str, sent_initial: bool) -> str:
    if word in _PUNCT:
        return _PUNCT[word]
    # capitalized month names beat their function-word homographs
    # ("in May 2016" — not the modal)
    if word[0].isupper() and not sent_initial and lower in _MONTH_WORDS:
        return "NNP"
    if lower in _ADJ_WORDS:
        return "JJ"
    if lower in _CLOSED:
        return _CLOSED[lower]
    if _NUM_RE.match(word):
        return "CD"
    if word[0].isupper() and not sent_initial:
        return "NNP"
    if lower in _VBN_ONLY:
        return "VBN"
    if lower in _IRREGULAR_PAST:
        return "VBD"   # repaired to VBN after have/be
    if lower.endswith("ly") and len(lower) > 4:
        return "RB"
    # hyphenated compounds in participial/ordinal shape are prenominal
    # adjectives, not verbs: "hot-tempered", "long-standing",
    # "eleven-year-old" (Penn convention; appos_test.py fixtures)
    if "-" in lower[1:-1] and lower.endswith(("ed", "ing", "old")):
        return "JJ"
    if lower.endswith("ing") and len(lower) > 5:
        return "VBG"
    if lower.endswith("ed") and len(lower) > 3:
        return "VBD"   # repaired to VBN after have/be
    if lower.endswith(_NOUN_SUFFIX) and len(lower) > 4:
        return "NN"
    if lower.endswith(_ADJ_SUFFIX) and len(lower) > 5:
        return "JJ"
    if lower.endswith("s") and not lower.endswith(("ss", "us", "is")) \
            and len(lower) > 3:
        return "NNS"   # repaired to VBZ in verb slots
    if sent_initial and word[0].isupper():
        return "NNP"
    return "NN"


def tag(words: List[str]) -> List[str]:
    """One best Penn tag per token (the supertagger widens ambiguity where
    parsing needs it)."""
    tags = []
    for i, w in enumerate(words):
        tags.append(_lex_tag(w, w.lower(), i == 0))
    # context repair passes
    for i, w in enumerate(words):
        lower = w.lower()
        prev = words[i - 1].lower() if i else ""
        prev_tag = tags[i - 1] if i else ""
        # participle after have/be
        if tags[i] == "VBD" and (prev in _HAVE or prev in _BE
                                 or prev_tag == "RB" and i >= 2
                                 and words[i - 2].lower() in (_HAVE | _BE)):
            tags[i] = "VBN"
        # base verb after to/modal/do
        if prev_tag in ("TO", "MD") or prev in ("do", "does", "did"):
            if tags[i] in ("NN", "NNS", "VBZ", "VBD", "NNP"):
                tags[i] = "VB"
        # do-support question: "Do you think …" — the verb after the
        # inverted subject is base form
        if tags[i] in ("VBP", "NN") and i >= 2 and prev_tag == "PRP" \
                and words[i - 2].lower() in ("do", "does", "did"):
            tags[i] = "VB"
        # "that" as determiner/relativizer
        if lower == "that":
            nxt = tags[i + 1] if i + 1 < len(words) else ""
            if nxt in ("NN", "NNS") and prev_tag not in ("NN", "NNS", "NNP"):
                tags[i] = "DT"
            elif prev_tag in ("NN", "NNS", "NNP", ","):
                tags[i] = "WDT"
        # plural-noun tag in an obvious verb slot: NP … NNS → VBZ
        if tags[i] == "NNS" and prev_tag in ("NNP", "NN", "NNS", "PRP") \
                and i + 1 < len(words) and tags[i + 1] in (
                    "DT", "PRP$", "TO", "IN", "WDT", "NNP", "PRP", "CD",
                    "RP", "WP", "WRB", "POS"):
            tags[i] = "VBZ"
        # get-passive: "gets caught", "got hit"
        if tags[i] == "VBD" and prev in ("get", "gets", "got", "getting",
                                         "gotten"):
            tags[i] = "VBN"
        # modal homograph as head noun: "a trash can", "his will" — only
        # when nothing verb-like follows ("The committee will review …"
        # must stay MD)
        if tags[i] == "MD" and prev_tag in ("DT", "JJ", "NN", "PRP$",
                                            "POS") \
                and (i + 1 == len(words) or tags[i + 1] in (
                    ".", ",", ";", ":", "RRB", "RQU", "IN", "CC")):
            tags[i] = "NN"
        # participle between a determiner and a nominal is attributive:
        # "my left ear", "the stolen passes", "a broken arm"
        if tags[i] in ("VBD", "VBN") and prev_tag in ("DT", "PRP$", "POS") \
                and i + 1 < len(words) and tags[i + 1] in (
                    "NN", "NNS", "NNP", "NNPS"):
            tags[i] = "JJ"
        # noun tag right after a relativizer is the relative clause's verb
        # ("ways that make …", "the person who speaks …")
        if prev_tag in ("WDT", "WP"):
            if tags[i] == "NN":
                tags[i] = "VBP"
            elif tags[i] == "NNS":
                tags[i] = "VBZ"
        # bare-noun tag right after a subject pronoun is a present verb
        # ("we come", "they go", "you swim")
        if tags[i] == "NN" and prev in ("i", "you", "we", "they", "he",
                                        "she", "it"):
            tags[i] = "VBP" if prev not in ("he", "she", "it") else "VBZ"
        # suffix-guessed adjective directly after a determiner that is NOT
        # followed by a nominal is actually the head noun ("the proposal in")
        if tags[i] == "JJ" and lower not in _ADJ_WORDS \
                and prev_tag in ("DT", "PRP$", "POS") \
                and (i + 1 == len(words) or tags[i + 1] not in
                     ("NN", "NNS", "NNP", "NNPS", "JJ", "CD")):
            tags[i] = "NN"
        # sentence-initial capitalized word that is a known closed/common
        # word keeps its lowercase reading (handled in _lex_tag already)
    return tags
