"""Clause extraction: (subject) (verb) (objects…) tuples from a dependency
parse — the engine's second, independent SVO path.

Parity: ``src/python/marbles/ie/nlp/clause.py`` (ClauseFinder :265-860,
ParsedClause :193-263) over the Google-NLP token schema
(``data/clausefinder_test.json``: ``text.content, dependencyEdge
{headTokenIndex, label}, partOfSpeech.tag, lemma``); expected outputs in
``data/clausefinder_test.txt`` (``# EXPECTED: (subj) (verb) (objs…)``).

This is a fresh, compact recursive extractor: verbs anchor clauses; the
subject is the NSUBJ/NSUBJPASS subtree; objects are DOBJ/IOBJ/ATTR/ACOMP
subtrees and PREP(+POBJ) phrases; conjoined verbs inherit the governing
subject.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

SUBJ_LABELS = {"NSUBJ", "NSUBJPASS", "CSUBJ"}
OBJ_LABELS = {"DOBJ", "IOBJ", "DATIVE", "ATTR", "ACOMP", "OPRD"}
CLAUSE_LABELS = {"CCOMP", "XCOMP", "ADVCL", "RCMOD", "RELCL", "ACL"}
SKIP_IN_SPAN = {"P", "PUNCT"}


@dataclass
class DepToken:
    idx: int
    word: str
    head: int
    label: str
    tag: str
    lemma: str


@dataclass
class Clause:
    ctype: str
    subject: str
    verb: str
    objects: List[str]

    def render(self) -> str:
        parts = ["(%s)" % self.subject, "(%s)" % self.verb]
        parts += ["(%s)" % o for o in self.objects]
        return " ".join(p for p in parts if p != "()")


def parse_google_tokens(tokens: List[dict], offset: int = 0) -> List[DepToken]:
    out = []
    for i, t in enumerate(tokens):
        out.append(DepToken(
            idx=i,
            word=t["text"]["content"],
            head=t["dependencyEdge"]["headTokenIndex"] - offset,
            label=t["dependencyEdge"]["label"].upper(),
            tag=t["partOfSpeech"]["tag"].upper(),
            lemma=t.get("lemma", t["text"]["content"]),
        ))
    return out


class ClauseFinder:
    """Extract clauses from one sentence of DepTokens."""

    def __init__(self, tokens: List[DepToken]):
        self.tokens = tokens
        self.children: List[List[DepToken]] = [[] for _ in tokens]
        for t in tokens:
            if 0 <= t.head < len(tokens) and t.head != t.idx:
                self.children[t.head].append(t)

    # -- spans --------------------------------------------------------------

    def subtree(self, tok: DepToken, stop_labels=frozenset()) -> List[DepToken]:
        out = [tok]
        for c in self.children[tok.idx]:
            if c.label in stop_labels or c.label in SKIP_IN_SPAN:
                continue
            out.extend(self.subtree(c, stop_labels))
        return sorted(out, key=lambda t: t.idx)

    def span_text(self, toks: List[DepToken]) -> str:
        return " ".join(t.word for t in toks)

    def phrase(self, tok: DepToken, stop_labels=frozenset(),
               keep_conj: bool = False) -> str:
        """NP-ish span.  ``keep_conj`` keeps coordinated continuations —
        object spans want the whole "electronic , computer and building
        products" (parity: SubtreeSpan, ie/nlp/clause.py:193-263)."""
        stops = set(stop_labels) | set(CLAUSE_LABELS) | {"APPOS"}
        if not keep_conj:
            stops |= {"CONJ", "CC"}
        return self.span_text(self.subtree(tok, frozenset(stops)))

    # -- extraction ---------------------------------------------------------

    def find_clauses(self) -> List[Clause]:
        clauses = []
        for t in self.tokens:
            if t.tag != "VERB":
                continue
            if t.label in ("AUX", "AUXPASS"):
                continue
            # skip auxiliary-like governors of an open-complement verb chain?
            clause = self._clause_for_verb(t)
            if clause is not None:
                clauses.append(clause)
        clauses.extend(self._isa_clauses())
        return clauses

    def _isa_clauses(self) -> List[Clause]:
        """Synthetic is-a clauses from appositives on subjects (parity:
        _dispatch_case_appos/_close_isa_case, ie/nlp/clause.py:603-666):
        "Bell, a telecom company, ..." → (Bell) (is) (a telecom company);
        conjoined appositives each yield their own ISA clause."""
        out = []
        for t in self.tokens:
            if t.label != "APPOS":
                continue
            head = self.tokens[t.head]
            if head.label not in SUBJ_LABELS and head.label != "ROOT":
                continue
            subj = self.phrase(head)
            items = [t]
            # walk the conj chain under the appositive
            stack = [t]
            while stack:
                cur = stack.pop()
                for c in self.children[cur.idx]:
                    if c.label == "CONJ":
                        items.append(c)
                        stack.append(c)
            for item in items:
                out.append(Clause("ISA", subj, "is", [self.phrase(item)]))
        return out

    def _subject_for(self, verb: DepToken) -> Optional[DepToken]:
        for c in self.children[verb.idx]:
            if c.label in SUBJ_LABELS:
                return c
        # conjoined or complement verbs inherit the governor's subject
        g = verb
        seen = set()
        while g.head != g.idx and g.idx not in seen:
            seen.add(g.idx)
            if g.label in ("CONJ", "XCOMP", "CCOMP"):
                g = self.tokens[g.head]
                for c in self.children[g.idx]:
                    if c.label in SUBJ_LABELS:
                        return c
            else:
                break
        return None

    def _clause_for_verb(self, verb: DepToken) -> Optional[Clause]:
        subj = self._subject_for(verb)
        objects = []
        verb_toks = [verb]
        for c in self.children[verb.idx]:
            if c.label in ("AUX", "AUXPASS", "NEG"):
                verb_toks.append(c)
            elif c.label in OBJ_LABELS:
                objects.append(self.phrase(c, keep_conj=True))
            elif c.label == "PREP":
                objects.append(self.span_text(self.subtree(
                    c, frozenset(CLAUSE_LABELS))))
            elif c.label == "XCOMP" and c.tag == "VERB":
                pass  # emitted as its own clause with inherited subject
            elif c.label == "PRT":
                verb_toks.append(c)
        verb_text = self.span_text(sorted(verb_toks, key=lambda t: t.idx))
        subj_text = self.phrase(subj) if subj is not None else ""
        if not objects and subj is None and verb.label not in ("ROOT",):
            return None
        ctype = "SV" + ("O" * len(objects) if objects else "")
        return Clause(ctype, subj_text, verb_text, objects)


def extract_clauses_google(doc: dict) -> List[List[Clause]]:
    """Split a Google-NLP document parse into sentences and extract clauses
    per sentence."""
    tokens = doc["tokens"]
    sent_offsets = [s["text"]["beginOffset"] for s in doc.get("sentences", [])]
    # assign tokens to sentences by beginOffset
    groups: List[List[dict]] = [[] for _ in sent_offsets] or [[]]
    bounds = sent_offsets + [float("inf")]
    for t in tokens:
        off = t["text"]["beginOffset"]
        for si in range(len(sent_offsets)):
            if bounds[si] <= off < bounds[si + 1]:
                groups[si].append(t)
                break
    out = []
    base = 0
    for g in groups:
        toks = parse_google_tokens(g, offset=base)
        base += len(g)
        out.append(ClauseFinder(toks).find_clauses())
    return out
