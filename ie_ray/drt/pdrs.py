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


# ---------------------------------------------------------------------------
# projective implication + accessibility + set notation
# (parity: ie/drt/pdrs.py accessibility/PVar algebra subset and the
# set-notation grammar ie/parse.py:136-388, goldens drt/test/pdrs_test.py)
# ---------------------------------------------------------------------------

class PImp:
    """Projective implication: antecedent PDRS → consequent PDRS."""

    __slots__ = ("antecedent", "consequent")

    def __init__(self, antecedent: "PDRS", consequent: "PDRS"):
        self.antecedent = antecedent
        self.consequent = consequent


def _sub_pdrss(pdrs: "PDRS") -> List["PDRS"]:
    """All PDRSs embedded under ``pdrs`` (itself first; parity:
    has_subdrs walks)."""
    out = [pdrs]
    for c in pdrs.conds:
        if isinstance(c.cond, PImp):
            out.extend(_sub_pdrss(c.cond.antecedent))
            out.extend(_sub_pdrss(c.cond.consequent))
    return out


def accessible_labels(root: "PDRS", label: int) -> List[int]:
    """Context labels accessible FROM ``label``: itself, every label an
    explicit ``maps`` edge (outer, inner) makes visible transitively,
    and — for implication subcontexts — the embedding chain (DRT:
    antecedent is accessible from consequent, outer from both).
    Parity: pdrs accessibility relation (ie/drt/pdrs.py)."""
    # explicit map edges: inner sees outer
    up: Dict[int, List[int]] = {}
    for sub in _sub_pdrss(root):
        for outer, inner in sub.maps:
            up.setdefault(inner, []).append(outer)
    # structural edges from implication nesting
    def walk(p: "PDRS", outer: Optional[int]):
        if outer is not None:
            up.setdefault(p.label, []).append(outer)
        for c in p.conds:
            if isinstance(c.cond, PImp):
                ant, cons = c.cond.antecedent, c.cond.consequent
                walk(ant, p.label)
                # consequent sees the antecedent (and through it, p)
                walk(cons, ant.label)
    walk(root, None)
    seen: List[int] = []
    stack = [label]
    while stack:
        x = stack.pop()
        if x in seen:
            continue
        seen.append(x)
        stack.extend(up.get(x, []))
    return seen


def accessible_universe(root: "PDRS", label: int) -> List[Ref]:
    """Referents visible from context ``label`` — refs introduced in any
    accessible context (parity: accessible_universe)."""
    acc = set(accessible_labels(root, label))
    out: List[Ref] = []
    for sub in _sub_pdrss(root):
        if sub.label in acc:
            for r in sub.refs:
                if r.ref not in out:
                    out.append(r.ref)
    return out


def _ref_name(r: Ref) -> str:
    rr = r.find()
    return rr.name or rr.kind


def show_set(p: "PDRS") -> str:
    """Reference SHOW_SET form: ``<label,{universe},{(ptr,cond),…},
    {maps}>`` (golden: ``<1,{x},{(1,man(x)),(1,happy(x))},{}>``).
    Universe refs render bare when local (pointer == label), pointed
    when projected — the reference's canonical form."""
    uni = ",".join(_ref_name(r.ref) if r.pointer == p.label
                   else "(%d,%s)" % (r.pointer, _ref_name(r.ref))
                   for r in p.refs)
    conds = ",".join(_show_pcond(c) for c in p.conds)
    maps = ",".join("(%d,%d)" % (a, b) for a, b in p.maps)
    return "<%d,{%s},{%s},{%s}>" % (p.label, uni, conds, maps)


def show_linear(p: "PDRS") -> str:
    """Reference SHOW_LINEAR form: ``label:[universe|conds|maps]``
    (golden: ``1:[x|(1,man(x)),(1,happy(x))|]``)."""
    uni = ",".join(_ref_name(r.ref) for r in p.refs)
    conds = ",".join(_show_pcond(c) for c in p.conds)
    maps = ",".join("(%d,%d)" % (a, b) for a, b in p.maps)
    return "%d:[%s|%s|%s]" % (p.label, uni, conds, maps)


def _show_pcond(c: PCond) -> str:
    if isinstance(c.cond, PImp):
        return "(%d,%s -> %s)" % (c.pointer, show_set(c.cond.antecedent),
                                  show_set(c.cond.consequent))
    return "(%d,%s(%s))" % (c.pointer, c.cond.pred,
                            ",".join(_ref_name(r) for r in c.cond.refs))


def parse_pdrs(text: str) -> "PDRS":
    """Parse the reference's PDRS set notation (ie/parse.py:136-388
    subset): ``<label,{refs},{(ptr,cond)…},{maps}>`` where a cond is
    ``name(args…)`` or ``<…> -> <…>`` and refs may be bare names or
    ``(ptr,name)`` pairs.  Round-trips with :func:`show_set`."""
    pos = [0]
    s = text.replace(" ", "")

    def expect(ch):
        if s[pos[0]] != ch:
            raise ValueError("expected %r at %d in %r" % (ch, pos[0], s))
        pos[0] += 1

    def peek():
        return s[pos[0]] if pos[0] < len(s) else ""

    def read_int():
        j = pos[0]
        while j < len(s) and (s[j].isdigit() or s[j] == "-"):
            j += 1
        v = int(s[pos[0]:j])
        pos[0] = j
        return v

    def read_name():
        j = pos[0]
        while j < len(s) and (s[j].isalnum() or s[j] == "_"):
            j += 1
        v = s[pos[0]:j]
        pos[0] = j
        return v

    refs_env: Dict[str, Ref] = {}

    def get_ref(name: str) -> Ref:
        if name not in refs_env:
            r = Ref(name[0])
            r.name = name
            refs_env[name] = r
        return refs_env[name]

    def parse_p() -> PDRS:
        expect("<")
        label = read_int()
        expect(",")
        # universe
        expect("{")
        refs = []
        while peek() != "}":
            if peek() == "(":
                expect("(")
                ptr = read_int()
                expect(",")
                refs.append(PRef(ptr, get_ref(read_name())))
                expect(")")
            else:
                refs.append(PRef(label, get_ref(read_name())))
            if peek() == ",":
                pos[0] += 1
        expect("}")
        expect(",")
        # conditions
        expect("{")
        conds = []
        while peek() != "}":
            expect("(")
            ptr = read_int()
            expect(",")
            if peek() == "<":
                ant = parse_p()
                if s[pos[0]:pos[0] + 2] != "->":
                    raise ValueError("expected -> at %d" % pos[0])
                pos[0] += 2
                cons = parse_p()
                conds.append(PCond(ptr, PImp(ant, cons)))
            else:
                pred = read_name()
                expect("(")
                args = []
                while peek() != ")":
                    args.append(get_ref(read_name()))
                    if peek() == ",":
                        pos[0] += 1
                expect(")")
                conds.append(PCond(ptr, Rel(pred, args)))
            expect(")")
            if peek() == ",":
                pos[0] += 1
        expect("}")
        maps = []
        if peek() == ",":
            pos[0] += 1
            expect("{")
            while peek() != "}":
                expect("(")
                a = read_int()
                expect(",")
                b = read_int()
                expect(")")
                maps.append((a, b))
                if peek() == ",":
                    pos[0] += 1
            expect("}")
        expect(">")
        return PDRS(label, maps, refs, conds)

    out = parse_p()
    return out


# ---------------------------------------------------------------------------
# PDRT merge algebra + purity predicates + modal-FOL discharge
# (parity: ie/drt/pdrs.py amerge/pmerge/purify/ispure/isproper and the
# behaviors pinned by ie/drt/test/pdrs_test.py test1-test3)
# ---------------------------------------------------------------------------

def _fresh_label(*pdrss: "PDRS") -> int:
    mx = 0
    for p in pdrss:
        for sub in _sub_pdrss(p):
            mx = max(mx, sub.label,
                     *[x for ab in sub.maps for x in ab] or [0])
    return mx + 1


def amerge(d1: "PDRS", d2: "PDRS") -> "PDRS":
    """Assertive merge: both arguments speak in the SAME outer context —
    d2's outer label α-converts onto d1's and content unions (golden:
    amerge(man, happy) == <1,{x},{(1,man(x)),(1,happy(x))},{}>,
    pdrs_test.py test3_MergeHappyMan)."""
    inner1 = {s.label for s in _sub_pdrss(d1)} - {d1.label}
    ren = {d2.label: d1.label}
    nxt = _fresh_label(d1, d2)
    for sub in _sub_pdrss(d2):
        if sub.label != d2.label and sub.label in inner1:
            ren[sub.label] = nxt
            nxt += 1
    d2r = d2.alpha_labels(ren)
    return PDRS(d1.label, d1.maps + d2r.maps, d1.refs + d2r.refs,
                d1.conds + d2r.conds)


def pmerge(d1: "PDRS", d2: "PDRS") -> "PDRS":
    """Projective merge: d1 becomes PRESUPPOSED content — its outer label
    moves to a fresh context weakly subordinated to the assertive outer
    label via a MAP edge (golden: pmerge(man, happy) ==
    <1,{(2,x)},{(2,man(x)),(1,happy(x))},{(1,2)}>,
    pdrs_test.py test3_MergeHappyMan)."""
    new = _fresh_label(d1, d2)
    d1r = d1.alpha_labels({d1.label: new})
    return PDRS(d2.label, d1r.maps + d2.maps + [(d2.label, new)],
                d1r.refs + d2.refs, d1r.conds + d2.conds)


def has_bound(root: "PDRS", label: int, name: str) -> bool:
    """True iff a referent named ``name`` used in context ``label`` is
    bound: some context accessible from ``label`` introduces it
    (parity: PRef.has_bound, pdrs_test.py test2_NLTKRegressions)."""
    return name in [_ref_name(r) for r in accessible_universe(root, label)]


def ispure(root: "PDRS") -> bool:
    """No referent is introduced twice across contexts (parity:
    AbstractPDRS.ispure)."""
    seen = set()
    for sub in _sub_pdrss(root):
        for r in sub.refs:
            n = _ref_name(r.ref)
            if n in seen:
                return False
            seen.add(n)
    return True


def isproper(root: "PDRS") -> bool:
    """No free referents anywhere (parity: isproper)."""
    return not get_freerefs(root)


def isplain(root: "PDRS") -> bool:
    """Every pointer equals its local label — no projections (parity:
    isplain)."""
    for sub in _sub_pdrss(root):
        for item in list(sub.refs) + list(sub.conds):
            if item.pointer != sub.label:
                return False
    return True


def ispresup(root: "PDRS") -> bool:
    """At least one projected (non-local) pointer — the structure carries
    a presupposition (parity: ispresup)."""
    return not isplain(root)


def isresolved(root: "PDRS") -> bool:
    """All pointers name known contexts and no referent is free
    (parity: isresolved)."""
    return not root.free_pointers() and isproper(root)


def purify(root: "PDRS") -> "PDRS":
    """Capture-avoiding rename of duplicate/clashing introductions: a
    bound introduction whose name collides with a FREE referent (or with
    an earlier introduction) is renamed to the first unused ``name<i>``,
    and every use bound BY that introduction follows; free occurrences
    keep their name (golden: universes {x,y,z1} with freerefs {c,z,a}
    unchanged, pdrs_test.py test2_NLTKRegressions)."""
    free = {_ref_name(r) for r in get_freerefs(root)}
    taken = set(free) | {_ref_name(r) for r in get_universes(root)}
    seen_intro = set()
    out = root

    def rename_in(p_label: int, old: Ref, new: Ref, p: "PDRS"):
        """Swap ``old``→``new`` in every context from which the
        introducing context ``p_label`` is accessible."""
        for sub in _sub_pdrss(p):
            if p_label not in accessible_labels(p, sub.label):
                continue
            sub.refs = [PRef(r.pointer, new) if r.ref is old else r
                        for r in sub.refs]
            for c in sub.conds:
                if not isinstance(c.cond, PImp):
                    c.cond.refs = [new if a is old else a
                                   for a in c.cond.refs]

    # work on a parsed copy so shared Ref identities can be split safely
    out = parse_pdrs(show_set(root))
    for sub in _sub_pdrss(out):
        for pref in list(sub.refs):
            n = _ref_name(pref.ref)
            clash = n in free or n in seen_intro
            seen_intro.add(n)
            if not clash:
                continue
            i = 1
            while "%s%d" % (n, i) in taken:
                i += 1
            nn = "%s%d" % (n, i)
            taken.add(nn)
            new_ref = Ref(nn[0], bound=True)
            new_ref.name = nn
            rename_in(sub.label, pref.ref, new_ref, out)
    return out


def to_fol_str(root: "PDRS", world: str = "w") -> str:
    """Modal-FOL rendering with an explicit world argument (parity:
    pdrs.to_fol; goldens '∃x(man(w,x) ∧ happy(w,x))' and '⊤' from
    pdrs_test.py test0/test1)."""
    def body(p: "PDRS") -> str:
        parts = []
        for c in p.conds:
            if isinstance(c.cond, PImp):
                ant, cons = c.cond.antecedent, c.cond.consequent
                avars = [_ref_name(r.ref) for r in ant.refs]
                inner = "%s → %s" % (body_only(ant), fol_p(cons))
                for v in reversed(avars):
                    inner = "∀%s(%s)" % (v, inner)
                parts.append(inner)
            else:
                parts.append("%s(%s)" % (c.cond.pred, ",".join(
                    [world] + [_ref_name(a) for a in c.cond.refs])))
        return " ∧ ".join(parts)

    def body_only(p: "PDRS") -> str:
        b = body(p)
        return b if b else "⊤"

    def fol_p(p: "PDRS") -> str:
        b = body_only(p)
        for r in reversed(p.refs):
            b = "∃%s(%s)" % (_ref_name(r.ref), b)
        return b

    return fol_p(root)


def get_universes(root: "PDRS") -> List[Ref]:
    """Referents introduced anywhere in the structure (parity:
    get_universes)."""
    out: List[Ref] = []
    for sub in _sub_pdrss(root):
        for r in sub.refs:
            if r.ref not in out:
                out.append(r.ref)
    return out


def get_freerefs(root: "PDRS") -> List[Ref]:
    """Referents USED in some context without being introduced in any
    context accessible from it (parity: pdrs get_freerefs — unresolved
    presupposition triggers)."""
    out: List[Ref] = []

    def visible(label: int) -> set:
        return {id(r.find()) for r in accessible_universe(root, label)}

    def walk(p: "PDRS"):
        vis = visible(p.label)
        for c in p.conds:
            if isinstance(c.cond, PImp):
                walk(c.cond.antecedent)
                walk(c.cond.consequent)
            else:
                for r in c.cond.refs:
                    if id(r.find()) not in vis and r not in out:
                        out.append(r)
    walk(root)
    return out
