"""SymSpell-style spelling correction (T7 in SURVEY.md §2.3).

Delete-distance indexing: every dictionary word is indexed under all of its
single-character deletions; a query word's deletions are probed against the
index and candidates ranked by (edit distance, -frequency).  Parity:
``src/python/marbles/ie/kb/spell.py`` (609 LoC, dictionary from big.txt —
not shipped here; the index builds from any word-frequency iterable, e.g.
the corpus vocabulary).

Like the reference, this is per-worker state: build once in an actor's
``__init__`` and correct per batch.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, Optional, Tuple


def _deletes(word: str):
    return {word[:i] + word[i + 1:] for i in range(len(word))}


class SpellChecker:
    def __init__(self, vocabulary: Iterable[Tuple[str, int]]):
        """vocabulary: iterable of (word, frequency)."""
        self.freq: Dict[str, int] = {}
        self.index: Dict[str, set] = defaultdict(set)
        for w, f in vocabulary:
            w = w.lower()
            self.freq[w] = self.freq.get(w, 0) + f
            self.index[w].add(w)
            for d in _deletes(w):
                self.index[d].add(w)

    def correct(self, word: str) -> Optional[str]:
        """Best dictionary word within edit distance 1 (None if no match)."""
        w = word.lower()
        if w in self.freq:
            return w
        candidates = set(self.index.get(w, ()))
        for d in _deletes(w):
            candidates |= self.index.get(d, set())
        if not candidates:
            return None
        return max(candidates, key=lambda c: (self.freq.get(c, 0), c))

    @classmethod
    def from_texts(cls, texts: Iterable[str]) -> "SpellChecker":
        counts: Dict[str, int] = {}
        for t in texts:
            for w in t.split():
                w = "".join(ch for ch in w.lower() if ch.isalpha())
                if w:
                    counts[w] = counts.get(w, 0) + 1
        return cls(counts.items())
