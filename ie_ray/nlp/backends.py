"""Pluggable dependency-parser backends for the clause path (C15/T8).

The reference ships three interchangeable dependency front-ends —
its own CCG bridge, spaCy (``ie/nlp/spacynlp/__init__.py``) and Google
Cloud NL (``ie/nlp/googlenlp/__init__.py``) — all normalizing to the
token schema ``ClauseFinder`` consumes.  This module makes that seam
explicit: a backend is any callable ``sentence → List[DepToken] | None``
registered under a name, so an actor-pool stage can be constructed with
``fn_constructor_kwargs={"backend": "cky"}`` and swapped cluster-wide
without touching pipeline code.

Built-ins:

* ``cky`` (default, always available) — the in-process CKY parser →
  CCG-dependency bridge (``ie_ray/nlp/ccgdep.py``).
* ``spacy`` — registered only when the spacy package imports (absent in
  this sandbox); converts spaCy token.dep_/head to ``DepToken`` with
  the same label conventions ``parse_google_tokens`` produces.
* pre-parsed Google-NL JSON rows don't need a backend — feed them
  through :func:`ie_ray.nlp.clause.parse_google_tokens` directly
  (``ie_ray/stages/clauses.py``).

Scale note: a backend instance is built once per actor (``__init__``)
and must be self-contained — model weights load there, never per batch.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from .clause import DepToken

_REGISTRY: Dict[str, Callable[[], Callable]] = {}


def register_backend(name: str, factory: Callable[[], Callable]) -> None:
    """``factory() → (sentence → List[DepToken] | None)``.  The factory
    runs once per actor/process; the returned callable runs per sentence."""
    _REGISTRY[name] = factory


def available_backends() -> List[str]:
    return sorted(_REGISTRY)


def get_backend(name: str = "cky") -> Callable[[str], Optional[List[DepToken]]]:
    """Instantiate a registered backend; raises KeyError with the
    available set so misconfiguration fails loudly at actor start."""
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise KeyError("unknown dep-parser backend %r; available: %s"
                       % (name, available_backends())) from None
    return factory()


# --------------------------------------------------------------------------
# built-in: CKY → CCG-dependency bridge (always available)
# --------------------------------------------------------------------------

def _cky_factory() -> Callable:
    from ie_ray.ccg.parser import CkyParser
    from .ccgdep import deps_from_ccgbank
    parser = CkyParser()

    def parse(sentence: str) -> Optional[List[DepToken]]:
        drv = parser.parse(sentence)
        return None if drv is None else deps_from_ccgbank(drv)

    return parse


register_backend("cky", _cky_factory)


# --------------------------------------------------------------------------
# optional: spaCy (reference: ie/nlp/spacynlp/__init__.py) — registered
# only when the package is installed; the label map mirrors
# parse_google_tokens' conventions so ClauseFinder needs no changes
# --------------------------------------------------------------------------

_SPACY_LABEL = {"nsubj": "NSUBJ", "nsubjpass": "NSUBJPASS", "dobj": "DOBJ",
                "obj": "DOBJ", "iobj": "IOBJ", "attr": "ATTR",
                "acomp": "ACOMP", "xcomp": "XCOMP", "ccomp": "CCOMP",
                "prep": "PREP", "pobj": "POBJ", "conj": "CONJ",
                "cc": "CC", "advcl": "ADVCL", "relcl": "RCMOD",
                "ROOT": "ROOT"}


def _spacy_factory() -> Callable:
    import spacy
    nlp = spacy.load("en_core_web_sm")

    def parse(sentence: str) -> Optional[List[DepToken]]:
        doc = nlp(sentence)
        out = []
        for t in doc:
            out.append(DepToken(
                idx=t.i, word=t.text,
                head=t.head.i if t.head is not t else t.i,
                label=_SPACY_LABEL.get(t.dep_, t.dep_.upper()),
                tag=t.pos_, lemma=t.lemma_.lower()))
        return out

    return parse


try:                                   # pragma: no cover - sandbox has no spacy
    import spacy  # noqa: F401
    register_backend("spacy", _spacy_factory)
except ImportError:
    pass
