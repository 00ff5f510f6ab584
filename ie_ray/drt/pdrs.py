"""Projective DRS (PDRT) — labeled contexts with projection pointers.

Compact re-expression of the reference's ``ie/drt/pdrs.py`` (2144 LoC,
after Venhuizen et al.'s PDRT-SANDBOX): a PDRS is a labeled DRS whose
referents and conditions each carry a *pointer* to the context they
project into.  A pointer equal to the local label is ordinary content; a
pointer to an accessible outer context is a presupposition (proper
names, definites); a pointer to no known context is *free* (unresolved
presupposition).

Implemented surface:

* :class:`PDRS` with ``label``, ``maps`` (accessibility edges
  ``(outer, inner)``), pointed referents and pointed conditions;
* ``free_pointers()`` — pointers that resolve to no context label
  (parity: pdrsFreePRefs/pdrsFreePVars);
* ``merge`` (assertive ⊕) with automatic label α-conversion of
  colliding context labels (parity: pdrsAMerge);
* ``to_drs()`` — resolve projections and flatten to a plain
  :class:`~ie_ray.drt.drs.DRS`: projected material lands in front
  (presuppositions take widest scope), local content keeps order
  (parity: pdrsToDrs / stripPVars).

The composition engine itself stays union-find based (SURVEY §4) — PDRS
is provided as the analysis/interchange layer it is in the reference.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from .drs import DRS, Ref, Rel


class PRef:
    """A referent projected from context ``pointer``."""

    __slots__ = ("pointer", "ref")

    def __init__(self, pointer: int, ref: Ref):
        self.pointer = pointer
        self.ref = ref

    def __repr__(self):
        return "<%d> %r" % (self.pointer, self.ref)


class PCond:
    """A condition asserted in context ``pointer``."""

    __slots__ = ("pointer", "cond")

    def __init__(self, pointer: int, cond):
        self.pointer = pointer
        self.cond = cond


class PDRS:
    def __init__(self, label: int, maps: Iterable[Tuple[int, int]] = (),
                 refs: Iterable[PRef] = (), conds: Iterable[PCond] = ()):
        self.label = label
        self.maps = list(maps)
        self.refs = list(refs)
        self.conds = list(conds)

    # -- structure ---------------------------------------------------------

    def labels(self) -> List[int]:
        out = [self.label]
        for a, b in self.maps:
            for x in (a, b):
                if x not in out:
                    out.append(x)
        return out

    def free_pointers(self) -> List[int]:
        """Pointers that name no context of this PDRS — unresolved
        presuppositions (parity: pdrsFreePVars)."""
        known = set(self.labels())
        out = []
        for item in list(self.refs) + list(self.conds):
            if item.pointer not in known and item.pointer not in out:
                out.append(item.pointer)
        return out

    # -- label α-conversion ------------------------------------------------

    def alpha_labels(self, mapping: Dict[int, int]) -> "PDRS":
        """Rename context labels (pointers follow; parity:
        pdrsAlphaConvert)."""
        sub = lambda p: mapping.get(p, p)
        return PDRS(sub(self.label),
                    [(sub(a), sub(b)) for a, b in self.maps],
                    [PRef(sub(r.pointer), r.ref) for r in self.refs],
                    [PCond(sub(c.pointer), c.cond) for c in self.conds])

    # -- merges ------------------------------------------------------------

    def merge(self, other: "PDRS") -> "PDRS":
        """Assertive merge ⊕: the result is ``other``'s context extended
        with ``self``'s content; colliding labels in ``other`` are
        α-converted away first (parity: pdrsAMerge)."""
        mine = set(self.labels())
        clash = [l for l in other.labels() if l in mine]
        if clash:
            nxt = max(mine | set(other.labels())) + 1
            ren = {}
            for l in clash:
                ren[l] = nxt
                nxt += 1
            other = other.alpha_labels(ren)
        merged = PDRS(other.label,
                      self.maps + other.maps + [(other.label, self.label)],
                      self.refs + other.refs,
                      self.conds + other.conds)
        # self's local content now belongs to the merged (outer) context
        ren = {self.label: other.label}
        return merged.alpha_labels(ren)

    # -- translation -------------------------------------------------------

    def to_drs(self) -> DRS:
        """Flatten to a plain DRS: projected conditions (pointer ≠ any
        inner label, i.e. presuppositions targeting the outermost
        context) come first — widest scope — then local content in
        assertion order.  All referents of known contexts become bound
        (parity: pdrsToDrs + stripPVars)."""
        for r in self.refs:
            r.ref.bound = True
        projected = [c.cond for c in self.conds if c.pointer != self.label]
        local = [c.cond for c in self.conds if c.pointer == self.label]
        return DRS(projected + local)

    def show(self) -> str:
        """Linear form with the label and pointer prefixes:
        ``<1:[...| <1> boy(x), ...]>``."""
        d = self.to_drs()
        names = d.names()

        def one(c: PCond) -> str:
            from .drs import _render
            return "<%d> %s" % (c.pointer, _render(c.cond, names))

        universe = []
        for r in self.refs:
            rr = r.ref.find()
            if rr in names and names[rr] not in universe:
                universe.append("<%d> %s" % (r.pointer, names[rr]))
        return "<%d:[%s| %s]>" % (self.label, ",".join(universe),
                                  ",".join(one(c) for c in self.conds))


def presupposed_name(label_inner: int, label_outer: int, name: str,
                     ref: Optional[Ref] = None) -> PDRS:
    """Helper mirroring the reference's treatment of proper names: the
    naming condition projects to the outer (global) context."""
    r = ref or Ref("x", bound=True)
    return PDRS(label_inner, [(label_outer, label_inner)],
                [PRef(label_outer, r)],
                [PCond(label_outer, Rel(name, [r]))])
