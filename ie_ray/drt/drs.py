"""Minimal Discourse Representation Structures over union-find variables.

The reference implements a full DRS algebra with α-conversion and merges
(``src/python/marbles/ie/drt/drs.py``, 2396 LoC).  This engine replaces
explicit variable renaming with union-find ``Ref`` cells: unifying two
referents is a single ``union``; every condition that mentioned either cell
automatically sees the merged representative.  The observable output — the
linear DRS string, e.g.::

    [X1,E2,E3,X4| boy(X1),want(E2),_EVENT(E2),_ARG0(E2,X1),...]

— matches the reference's ``show(SHOW_LINEAR)`` format
(``src/python/marbles/ie/drt/common.py:16``, asserted in
``src/python/marbles/ie/test/compose_test.py:119``).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple


class Ref:
    """A union-find variable cell.

    ``kind`` is ``'e'`` for event variables (S-flavoured atoms) and ``'x'``
    for entities; ``bound`` marks refs introduced into a DRS universe (nouns,
    events, pronouns) as opposed to free slot variables.
    """

    __slots__ = ("_parent", "kind", "bound", "_rank", "bound_idx", "binder",
                 "name")

    def __init__(self, kind: str = "x", bound: bool = False):
        self._parent = self
        self.kind = kind
        self.bound = bound
        self._rank = 0
        self.bound_idx = None   # word index of the binding lexeme
        self.binder = None      # the binding Token (labels for triples)
        self.name = None        # explicit surface name (PDRS set notation)

    def find(self) -> "Ref":
        r = self
        while r._parent is not r:
            r._parent = r._parent._parent
            r = r._parent
        return r

    def union(self, other: "Ref") -> "Ref":
        a, b = self.find(), other.find()
        if a is b:
            return a
        if a._rank < b._rank:
            a, b = b, a
        b._parent = a
        if a._rank == b._rank:
            a._rank += 1
        # merged cell keeps the strongest properties
        a.kind = "e" if ("e" in (a.kind, b.kind)) else "x"
        a.bound = a.bound or b.bound
        if a.bound_idx is None or (b.bound_idx is not None and b.bound_idx < a.bound_idx):
            a.bound_idx = b.bound_idx
        if a.binder is None or (b.binder is not None and b.binder.idx < a.binder.idx):
            a.binder = b.binder
        return a

    def __repr__(self):
        r = self.find()
        return "<Ref %s %s>" % (r.kind, "bound" if r.bound else "free")


class Rel:
    """An n-ary relation condition ``pred(r1, …, rn)``."""

    __slots__ = ("pred", "refs", "src")

    def __init__(self, pred: str, refs: Iterable[Ref]):
        self.pred = pred
        self.refs = list(refs)
        self.src = None  # emitting Token (set by the engine; labels triples)

    def resolved(self) -> Tuple[str, Tuple[Ref, ...]]:
        return self.pred, tuple(r.find() for r in self.refs)

    def __repr__(self):
        return "%s(%s)" % (self.pred, ",".join(map(repr, self.refs)))


class Neg:
    """Negated sub-DRS condition ``!(...)`` (parity: drt/drs.py:1486)."""

    __slots__ = ("drs", "src")

    def __init__(self, drs: "DRS"):
        self.drs = drs
        self.src = None

    @property
    def refs(self):
        return [r for c in self.drs.conditions for r in c.refs]

    def resolved(self):
        return ("!", tuple(c.resolved() for c in self.drs.conditions))


class Imp:
    """Implication ``A -> B`` (parity: drt/drs.py:1626; used for VerbNet
    class implications in the reference)."""

    __slots__ = ("ante", "cons", "src")

    def __init__(self, ante: "DRS", cons: "DRS"):
        self.ante = ante
        self.cons = cons
        self.src = None

    @property
    def refs(self):
        return [r for c in self.ante.conditions + self.cons.conditions
                for r in c.refs]

    def resolved(self):
        return ("->", tuple(c.resolved() for c in self.ante.conditions),
                tuple(c.resolved() for c in self.cons.conditions))


class Or:
    """Disjunction ``A or B`` (parity: drt/drs.py:1796)."""

    __slots__ = ("left", "right", "src")

    def __init__(self, left: "DRS", right: "DRS"):
        self.left = left
        self.right = right
        self.src = None

    @property
    def refs(self):
        return [r for c in self.left.conditions + self.right.conditions
                for r in c.refs]

    def resolved(self):
        return ("|", tuple(c.resolved() for c in self.left.conditions),
                tuple(c.resolved() for c in self.right.conditions))


class Prop:
    """Proposition condition ``x: <drs>`` — a referent naming a sub-DRS
    (parity: drt/drs.py:1958-2050)."""

    __slots__ = ("ref", "drs", "src")

    def __init__(self, ref: Ref, drs: "DRS"):
        self.ref = ref
        self.drs = drs
        self.src = None

    @property
    def refs(self):
        return [self.ref] + [r for c in self.drs.conditions for r in c.refs]

    def resolved(self):
        return (":", self.ref.find(),
                tuple(c.resolved() for c in self.drs.conditions))


class Diamond:
    """Possibility ``◇<drs>`` (parity: drt/drs.py:2117-2140)."""

    __slots__ = ("drs", "src")

    def __init__(self, drs: "DRS"):
        self.drs = drs
        self.src = None

    @property
    def refs(self):
        return [r for c in self.drs.conditions for r in c.refs]

    def resolved(self):
        return ("<>", tuple(c.resolved() for c in self.drs.conditions))


class Box:
    """Necessity ``◻<drs>`` (parity: drt/drs.py:2258-2281)."""

    __slots__ = ("drs", "src")

    def __init__(self, drs: "DRS"):
        self.drs = drs
        self.src = None

    @property
    def refs(self):
        return [r for c in self.drs.conditions for r in c.refs]

    def resolved(self):
        return ("[]", tuple(c.resolved() for c in self.drs.conditions))


class DRS:
    """An ordered list of conditions plus a derived universe.

    Condition order is the order of contribution (word order of the emitting
    lexemes), which is what makes the linear rendering deterministic.
    """

    def __init__(self, conditions: Optional[List[Rel]] = None):
        self.conditions: List[Rel] = list(conditions or [])

    def names(self, by_word_index: bool = False) -> Dict[Ref, str]:
        """Assign canonical names X1/E2/… to variables.

        Bound refs are numbered first, ordered by the word index of their
        binding lexeme; free refs continue the numbering in order of first
        occurrence — mirroring the reference's ``final_rename`` (universe
        first, then free referents;
        ``src/python/marbles/ie/semantics/ccg.py:1535-1601``; ordering
        evidenced by compose_test.py:432's ``[...,E5,X6| ..._ARG1(E4,X6),
        review(E5)...]``).

        ``by_word_index=True`` is the CO_VARNAMES_MATCH_WORD_INDEX mode:
        a bound ref is numbered 1 + the word index of its binding lexeme
        (collisions take the next free integer), free refs continue past
        the maximum.
        """
        seen: List[Ref] = []
        for c in self.conditions:
            for r in c.refs:
                rr = r.find()
                if rr not in seen:
                    seen.append(rr)
        bound = [r for r in seen if r.bound]
        bound.sort(key=lambda r: (r.bound_idx if r.bound_idx is not None else 1 << 30))
        ordered = bound + [r for r in seen if not r.bound]
        names: Dict[Ref, str] = {}
        if by_word_index:
            used = set()
            free_start = 1
            for r in bound:
                i = (r.bound_idx + 1) if r.bound_idx is not None else 1
                while i in used:
                    i += 1
                used.add(i)
                free_start = max(free_start, i + 1)
                names[r] = ("E%d" if r.kind == "e" else "X%d") % i
            i = free_start
            for r in (x for x in ordered if not x.bound):
                while i in used:
                    i += 1
                used.add(i)
                names[r] = ("E%d" if r.kind == "e" else "X%d") % i
            return names
        for i, r in enumerate(ordered, start=1):
            names[r] = ("E%d" if r.kind == "e" else "X%d") % i
        return names

    def remove_unary_props(self) -> "DRS":
        """CO_REMOVE_UNARY_PROPS: a proposition ``x: <sub>`` whose
        subordinate DRS binds a single referent is inlined — the sub-DRS
        conditions are lifted into this DRS with the prop referent
        union()ed onto the sub's referent (parity:
        ``ie/drt/drs.py`` remove_proposition path)."""
        out: List = []
        for c in self.conditions:
            if isinstance(c, Prop):
                sub_bound = [r for r in {rr.find() for cc in c.drs.conditions
                                         for rr in cc.refs} if r.bound]
                if len(sub_bound) <= 1:
                    if sub_bound:
                        c.ref.find().union(sub_bound[0])
                    out.extend(c.drs.conditions)
                    continue
            out.append(c)
        return DRS(out)

    def dedup(self) -> "DRS":
        """Drop duplicate conditions, preserving first-occurrence order
        (parity: get_drs(nodups=True), ccg.py:1518-1533)."""
        seen = set()
        out = []
        for c in self.conditions:
            key = c.resolved()
            if key not in seen:
                seen.add(key)
                out.append(c)
        return DRS(out)

    def show(self, by_word_index: bool = False) -> str:
        return show_linear(self, by_word_index)


def _render(c, names, fol: bool = False) -> str:
    if isinstance(c, Rel):
        return "%s(%s)" % (c.pred, ",".join(names[r.find()] for r in c.refs))
    if isinstance(c, Neg):
        inner = ",".join(_render(x, names, fol) for x in c.drs.conditions)
        return ("~(%s)" if fol else "!(%s)") % inner
    if isinstance(c, Imp):
        a = ",".join(_render(x, names, fol) for x in c.ante.conditions)
        b = ",".join(_render(x, names, fol) for x in c.cons.conditions)
        return "(%s) -> (%s)" % (a, b)
    if isinstance(c, Or):
        a = ",".join(_render(x, names, fol) for x in c.left.conditions)
        b = ",".join(_render(x, names, fol) for x in c.right.conditions)
        return ("(%s) | (%s)" if fol else "(%s) or (%s)") % (a, b)
    if isinstance(c, Prop):
        inner = ",".join(_render(x, names, fol) for x in c.drs.conditions)
        return "%s: (%s)" % (names[c.ref.find()], inner)
    if isinstance(c, Diamond):
        inner = ",".join(_render(x, names, fol) for x in c.drs.conditions)
        return "◇(%s)" % inner
    if isinstance(c, Box):
        inner = ",".join(_render(x, names, fol) for x in c.drs.conditions)
        return "◻(%s)" % inner
    raise TypeError(type(c))


def show_set(drs: DRS) -> str:
    """Set notation ``<{X1,E2},{boy(X1),...}>`` (parity: SHOW_SET,
    src/python/marbles/ie/drt/common.py:13-22)."""
    names = drs.names()
    universe = [names[r] for r in sorted((r for r in names if r.bound),
                                         key=lambda r: int(names[r][1:]))]
    conds = [_render(c, names) for c in drs.conditions]
    return "<{%s},{%s}>" % (",".join(universe), ",".join(conds))


def show_fol(drs: DRS) -> str:
    """First-order rendering: existential closure over the universe, free
    variables left free (parity: to_fol / to_mfol, drt/drs.py:413-443 and
    drt/fol.py — without the pysmt/z3 backend, which is not in this
    environment; the formula string is the interchange format)."""
    names = drs.names()
    universe = [names[r] for r in sorted((r for r in names if r.bound),
                                         key=lambda r: int(names[r][1:]))]
    conds = [_render(c, names, fol=True) for c in drs.conditions]
    body = " & ".join(conds) if conds else "true"
    for v in reversed(universe):
        body = "exists %s.(%s)" % (v, body)
    return body


def show_linear(drs: DRS, by_word_index: bool = False) -> str:
    names = drs.names(by_word_index)
    universe = [names[r] for r in sorted(
        (r for r in names if r.bound),
        key=lambda r: int(names[r][1:]))]
    conds = [_render(c, names) for c in drs.conditions]
    return "[%s| %s]" % (",".join(universe), ",".join(conds))


# ---------------------------------------------------------------------------
# DRS algebra (C14 surface, re-expressed under union-find semantics)
#
# The reference manipulates explicit variable names, so merge needs
# α-conversion to avoid capture (drt/drs.py:660-780) and purify rewrites
# colliding bound variables.  Here variables are union-find cells: two DRSs
# never collide unless their cells were deliberately union()ed, so merge is
# condition concatenation, and α-conversion is a structural copy onto fresh
# (or caller-supplied) cells.
# ---------------------------------------------------------------------------

def get_freerefs(drs: DRS) -> List[Ref]:
    """Referents used by conditions but not bound in the universe, in
    first-occurrence order (parity: drsFreeRefs, drt/drs.py:1003-1024)."""
    seen, out = set(), []
    for c in drs.conditions:
        for r in c.refs:
            rr = r.find()
            if not rr.bound and id(rr) not in seen:
                seen.add(id(rr))
                out.append(rr)
    return out


def merge(d1: DRS, d2: DRS) -> DRS:
    """Assertive merge ``d1 ⊕ d2``: union of universes and conditions —
    capture-free by construction under union-find cells (parity:
    drs_merge, drt/drs.py:660-720)."""
    return DRS(list(d1.conditions) + list(d2.conditions))


def alpha_convert(drs: DRS, mapping: Optional[Dict[Ref, Ref]] = None) -> DRS:
    """Structural copy with renamed variables.

    ``mapping`` maps representative cells to replacement cells; unmapped
    cells get fresh cells with the same kind/bound flags.  Sharing inside
    the DRS is preserved; the copy is disconnected from the original's
    union-find forest, so later unions on either side don't leak (parity:
    alphaConvert, drt/drs.py:822-870)."""
    env: Dict[int, Ref] = {}
    mapping = mapping or {}

    def sub(r: Ref) -> Ref:
        rr = r.find()
        if rr in mapping:
            return mapping[rr]
        got = env.get(id(rr))
        if got is None:
            got = Ref(rr.kind, rr.bound)
            got.bound_idx = rr.bound_idx
            got.binder = rr.binder
            env[id(rr)] = got
        return got

    def copy_cond(c):
        if isinstance(c, Rel):
            out = Rel(c.pred, [sub(r) for r in c.refs])
        elif isinstance(c, Neg):
            out = Neg(DRS([copy_cond(x) for x in c.drs.conditions]))
        elif isinstance(c, Imp):
            out = Imp(DRS([copy_cond(x) for x in c.ante.conditions]),
                      DRS([copy_cond(x) for x in c.cons.conditions]))
        elif isinstance(c, Or):
            out = Or(DRS([copy_cond(x) for x in c.left.conditions]),
                     DRS([copy_cond(x) for x in c.right.conditions]))
        elif isinstance(c, Prop):
            out = Prop(sub(c.ref),
                       DRS([copy_cond(x) for x in c.drs.conditions]))
        elif isinstance(c, (Diamond, Box)):
            out = type(c)(DRS([copy_cond(x) for x in c.drs.conditions]))
        else:
            raise TypeError(type(c))
        out.src = c.src
        return out

    return DRS([copy_cond(c) for c in drs.conditions])


def purify(drs: DRS) -> DRS:
    """Duplicate-free, frozen form: dedup conditions then α-convert onto a
    private cell forest so the result is immune to later unions elsewhere
    (the union-find equivalent of the reference's purify + clean renaming,
    drt/drs.py:905-960)."""
    return alpha_convert(drs.dedup())
