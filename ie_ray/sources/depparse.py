"""Deterministic Google-NLP-style dependency parses for the golden pool.

The clause path (SURVEY.md C15/T8) consumes dependency parses; in the
reference these come from spaCy or the Google NLP API.  For fixtures we
synthesize parses for the pool's sentence families directly — their
structure is known by construction — in the exact token schema of
``data/clausefinder_test.json`` (text.content, dependencyEdge
{headTokenIndex,label}, partOfSpeech.tag, lemma).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def _tok(content: str, head: int, label: str, tag: str, lemma: str = None):
    return {
        "text": {"content": content, "beginOffset": -1},
        "dependencyEdge": {"headTokenIndex": head, "label": label},
        "partOfSpeech": {"tag": tag},
        "lemma": lemma or content.lower(),
    }


def parse_simple_sentence(sentence: str) -> Optional[Tuple[List[dict], list]]:
    """Build the dependency parse for the golden-pool families.

    Recognized shapes (see sources/pages.py golden_sentences):
      The [adj] N1 V the N2 .     |  Name… V the N .
      The N1 V prep the N2 .      |  A and B V the N .
    Returns (tokens, expected_clauses) or None when unrecognized.
    """
    words = sentence.rstrip(".").split()
    if not words:
        return None
    # find the finite verb: first word ending in 's' that follows a noun and
    # precedes 'the'/'a'/prep — for fixtures the families are deterministic,
    # so locate by the det 'the' after position 1
    toks: List[dict] = []
    expected = []
    lower = [w.lower() for w in words]
    # pattern: subject part ... VERB ['to' V2] [prep] 'the' obj...
    try:
        vi = next(i for i in range(1, len(words))
                  if i + 1 < len(words)
                  and lower[i + 1] in ("the", "against", "with", "to")
                  and lower[i] not in ("the", "a", "an", "and")
                  and words[i].isalpha()
                  and not words[i][0].isupper())
    except StopIteration:
        return None
    subj_words = words[:vi]
    verb = words[vi]
    rest = words[vi + 1:]
    # subject head = last subject word
    sh = vi - 1
    for i, w in enumerate(subj_words):
        if i == sh:
            toks.append(_tok(w, vi, "NSUBJ", "NOUN" if not w[0].isupper() or True else "NOUN"))
        elif w.lower() in ("the", "a", "an"):
            toks.append(_tok(w, sh, "DET", "DET"))
        elif w.lower() == "and":
            toks.append(_tok(w, sh, "CC", "CONJ"))
        elif w.lower() == "'s":
            toks.append(_tok(w, sh, "POS", "PRT"))
        else:
            toks.append(_tok(w, sh, "NN", "NOUN"))
    toks.append(_tok(verb, vi, "ROOT", "VERB"))
    i = vi + 1
    if rest and rest[0].lower() in ("against", "with"):
        prep_i = i
        toks.append(_tok(rest[0], vi, "PREP", "ADP"))
        # the N
        toks.append(_tok(rest[1], i + 2, "DET", "DET"))
        toks.append(_tok(rest[2], prep_i, "POBJ", "NOUN"))
        expected.append(("%s" % " ".join(subj_words), verb,
                         [" ".join(rest[:3])]))
    elif rest and rest[0].lower() == "to":
        # control: V to V2 the N2
        toks.append(_tok(rest[0], i + 1, "AUX", "PRT"))
        toks.append(_tok(rest[1], vi, "XCOMP", "VERB"))
        toks.append(_tok(rest[2], i + 3, "DET", "DET"))
        toks.append(_tok(rest[3], i + 1, "DOBJ", "NOUN"))
        expected.append((" ".join(subj_words), verb, []))
        expected.append((" ".join(subj_words), "to %s" % rest[1],
                         ["the %s" % rest[3]]))
    elif rest and rest[0].lower() in ("the", "a", "an"):
        toks.append(_tok(rest[0], i + 1, "DET", "DET"))
        toks.append(_tok(rest[1], vi, "DOBJ", "NOUN"))
        expected.append((" ".join(subj_words), verb, [" ".join(rest[:2])]))
    else:
        expected.append((" ".join(subj_words), verb, []))
    return toks, expected
