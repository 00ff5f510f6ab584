"""CCG category signatures.

A category is either an atom (``N``, ``NP``, ``S[dcl]``, ``PP``, ``conj``,
punctuation atoms) or a functor ``result/arg`` | ``result\\arg``.  Atoms and
parenthesised sub-categories may carry pred-arg tags ``_<idx>`` (used by the
template machinery to express variable sharing, e.g. subject control in
``(S[dcl]\\NP_109)/(S[to]_110\\NP_109)``).

Parity notes: the reference models this in
``src/python/marbles/ie/ccg/__init__.py:291-1083`` (class Category, interning
cache at :343, unification at :873-983).  This is an independent, compact
re-implementation.
"""

from __future__ import annotations

import re
from functools import lru_cache

_TAG_RE = re.compile(r"_(\d+)")


class Category:
    """Immutable parsed CCG category."""

    __slots__ = ("_sig", "_result", "_arg", "_slash", "_base", "_features",
                 "_tag", "_combo")

    def __init__(self, sig, result=None, arg=None, slash=None, base=None,
                 features=(), tag=None):
        self._combo = None         # parser combination memo (parser.py)
        self._sig = sig            # canonical clean signature (no predarg tags)
        self._result = result      # Category | None
        self._arg = arg            # Category | None
        self._slash = slash        # '/' or '\\' or None
        self._base = base          # atom base name, e.g. 'S', 'NP'
        self._features = features  # tuple of feature strings, e.g. ('dcl',)
        self._tag = tag            # predarg tag (str) or None

    # -- construction -------------------------------------------------------

    @staticmethod
    @lru_cache(maxsize=65536)
    def parse(signature: str) -> "Category":
        """Parse a category signature (predarg tags allowed) into a Category.

        EasySRL emits dependency markers ``:B`` / ``:U`` after tags (e.g.
        ``(S[to]\\NP_20)/(S[b]_21\\NP_20:B)_21``) — stripped before parsing.
        """
        s = re.sub(r":[A-Z]", "", signature.strip())
        cat, pos = _parse_expr(s, 0)
        if pos != len(s):
            raise ValueError("trailing input in category %r" % signature)
        return cat

    # -- basic structure ----------------------------------------------------

    @property
    def signature(self) -> str:
        return self._sig

    @property
    def isfunctor(self) -> bool:
        return self._slash is not None

    @property
    def isatom(self) -> bool:
        return self._slash is None

    @property
    def slash(self):
        return self._slash

    @property
    def result(self) -> "Category":
        return self._result

    @property
    def arg(self) -> "Category":
        return self._arg

    @property
    def base(self):
        return self._base

    @property
    def features(self):
        return self._features

    @property
    def tag(self):
        return self._tag

    @property
    def isarg_right(self) -> bool:
        return self._slash == "/"

    @property
    def isarg_left(self) -> bool:
        return self._slash == "\\"

    @property
    def ismodifier(self) -> bool:
        """True for ``X/X`` and ``X\\X`` (exact match including features —
        ``(S[dcl]\\NP)/(S[to]\\NP)`` is NOT a modifier)."""
        return (self.isfunctor
                and self._result.signature == self._arg.signature)

    @property
    def isconj(self) -> bool:
        return self.isatom and self._base == "conj"

    @property
    def ispunct(self) -> bool:
        return self.isatom and self._base in _PUNCT_ATOMS

    @property
    def is_sy(self) -> bool:
        """An S-flavoured atom that denotes an event variable (S but not S[adj])."""
        return self.isatom and self._base == "S" and "adj" not in self._features

    @property
    def isnp(self) -> bool:
        return self.isatom and self._base == "NP"

    @property
    def isn(self) -> bool:
        return self.isatom and self._base == "N"

    # -- derived views ------------------------------------------------------

    def strip_features(self) -> str:
        """Signature with features removed (structure + slashes only)."""
        if self.isatom:
            return self._base
        r, a = self._result.strip_features(), self._arg.strip_features()
        if self._result.isfunctor:
            r = "(%s)" % r
        if self._arg.isfunctor:
            a = "(%s)" % a
        return r + self._slash + a

    def arity(self) -> int:
        n, c = 0, self
        while c.isfunctor:
            n += 1
            c = c.result
        return n

    def final_atom(self) -> "Category":
        c = self
        while c.isfunctor:
            c = c.result
        return c

    def atoms(self):
        """All atoms left-to-right with functor structure flattened:
        result atoms first, then argument atoms (recursively)."""
        if self.isatom:
            return [self]
        return self._result.atoms() + self._arg.atoms()

    def can_unify(self, other: "Category") -> bool:
        """Shape-equal up to features (``S`` unifies with ``S[dcl]`` etc.)."""
        if self.isatom and other.isatom:
            if self._base != other._base:
                # N and NP unify in several reference rules (NP → N coercion)
                return {self._base, other._base} == {"N", "NP"}
            if not self._features or not other._features:
                return True
            return bool(set(self._features) & set(other._features)) or \
                "X" in self._features or "X" in other._features
        if self.isfunctor and other.isfunctor:
            return (self._slash == other._slash
                    and self._result.can_unify(other._result)
                    and self._arg.can_unify(other._arg))
        return False

    def __eq__(self, other):
        return isinstance(other, Category) and self._sig == other._sig

    def __hash__(self):
        return hash(self._sig)

    def __repr__(self):
        return "Category(%s)" % self._sig

    def __str__(self):
        return self._sig


_PUNCT_ATOMS = {".", ",", ";", ":", "LRB", "RRB", "LQU", "RQU"}

_ATOM_RE = re.compile(r"([A-Za-z.;:,]+|LRB|RRB)((?:\[[A-Za-z,]+\])*)(_\d+)?")


def _mk_atom(base, feats, tag):
    sig = base + ("[%s]" % ",".join(feats) if feats else "")
    return Category(sig, base=base, features=tuple(feats), tag=tag)


def _mk_functor(result, slash, arg, tag=None):
    r = result.signature
    a = arg.signature
    if result.isfunctor:
        r = "(%s)" % r
    if arg.isfunctor:
        a = "(%s)" % a
    return Category(r + slash + a, result=result, arg=arg, slash=slash, tag=tag)


def _parse_primary(s, pos):
    if pos < len(s) and s[pos] == "(":
        cat, pos = _parse_expr(s, pos + 1)
        if pos >= len(s) or s[pos] != ")":
            raise ValueError("unbalanced parens in %r" % s)
        pos += 1
        # optional tag on the group
        m = _TAG_RE.match(s, pos) if pos < len(s) and s[pos] == "_" else None
        if m:
            cat = Category(cat.signature, result=cat.result, arg=cat.arg,
                           slash=cat.slash, base=cat.base,
                           features=cat.features, tag=m.group(1))
            pos = m.end()
        return cat, pos
    m = _ATOM_RE.match(s, pos)
    if not m:
        raise ValueError("bad category at %d in %r" % (pos, s))
    base = m.group(1)
    # multiple feature groups occur ("S[dcl][conj]") — merge them
    feats = re.findall(r"\[([A-Za-z,]+)\]", m.group(2)) if m.group(2) else []
    feats = [f for grp in feats for f in grp.split(",")]
    tag = m.group(3)[1:] if m.group(3) else None
    return _mk_atom(base, feats, tag), m.end()


def _parse_expr(s, pos):
    left, pos = _parse_primary(s, pos)
    while pos < len(s) and s[pos] in "/\\":
        slash = s[pos]
        right, pos = _parse_primary(s, pos + 1)
        left = _mk_functor(left, slash, right)
    return left, pos


# Common categories used around the engine.
CAT_N = Category.parse("N")
CAT_NP = Category.parse("NP")
CAT_PP = Category.parse("PP")
CAT_CONJ = Category.parse("conj")
CAT_NP_N = Category.parse("NP/N")
CAT_Sdcl = Category.parse("S[dcl]")
