"""DRS → (modal) first-order logic discharge.

Parity: ``ie/drt/fol.py`` (266 LoC) and ``to_mfol``
(``ie/drt/drs.py:413-443``), which hand formulas to pysmt/z3 for
satisfiability.  No SMT solver ships in this sandbox, so the discharge
is completed with a **finite-model evaluator** instead: translation is
the same standard DRT mapping (universe → ∃, Imp → ∀…→∃, Neg → ¬,
modal ◇/◻ over an accessibility relation with an explicit world
argument — golden rendering ``∃x(man(w,x) ∧ happy(w,x))``,
``drt/test/pdrs_test.py:44-47``), and model checking over an explicit
finite interpretation is sound and decidable where SMT would be used
for validity queries.

Public surface:

* AST: :class:`Pred`, :class:`And`, :class:`FOr`, :class:`Not`,
  :class:`FImp`, :class:`Exists`, :class:`ForAll`, :class:`Possibly`,
  :class:`Necessarily`, :data:`TOP`;
* :func:`drs_to_mfol` — DRS → modal FOL with world argument ``w``;
* :func:`show_mfol` — reference set-notation rendering (∃/∧/⊤ …);
* :class:`Model` + :func:`evaluate` — finite Kripke model checking.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Set, Tuple

from .drs import DRS, Box, Diamond, Imp, Neg, Or, Prop, Ref, Rel


class Pred:
    __slots__ = ("name", "args")

    def __init__(self, name: str, args):
        self.name = name
        self.args = list(args)   # world var string first, then Refs


class And:
    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = [p for p in parts if p is not TOP]


class FOr:
    __slots__ = ("left", "right")

    def __init__(self, left, right):
        self.left = left
        self.right = right


class Not:
    __slots__ = ("body",)

    def __init__(self, body):
        self.body = body


class FImp:
    __slots__ = ("left", "right")

    def __init__(self, left, right):
        self.left = left
        self.right = right


class Exists:
    __slots__ = ("var", "body")

    def __init__(self, var, body):
        self.var = var
        self.body = body


class ForAll:
    __slots__ = ("var", "body")

    def __init__(self, var, body):
        self.var = var
        self.body = body


class Possibly:
    """∃w′ (R(w,w′) ∧ body[w′])."""
    __slots__ = ("world", "body")

    def __init__(self, world, body):
        self.world = world
        self.body = body


class Necessarily:
    """∀w′ (R(w,w′) → body[w′])."""
    __slots__ = ("world", "body")

    def __init__(self, world, body):
        self.world = world
        self.body = body


class _Top:
    __slots__ = ()


TOP = _Top()


# ---------------------------------------------------------------------------
# translation
# ---------------------------------------------------------------------------

def _universe(drs: DRS) -> List[Ref]:
    """Bound refs introduced by THIS box (first-contribution order):
    only refs of directly-asserted relations count — a ref bound inside
    a nested box (Imp antecedent, Neg body …) belongs to that box."""
    seen: List[Ref] = []
    for c in drs.conditions:
        if isinstance(c, Rel):
            for r in c.refs:
                rr = r.find()
                if rr.bound and rr not in seen:
                    seen.append(rr)
        elif isinstance(c, Prop):
            rr = c.ref.find()
            if rr.bound and rr not in seen:
                seen.append(rr)
    return seen


def drs_to_mfol(drs: DRS, world: str = "w",
                outer: Optional[Set[Ref]] = None):
    """Standard DRT → FOL: ``([x…],[C…])`` becomes ``∃x…(C ∧ …)``;
    ``Imp`` universally closes its antecedent universe; modal
    conditions shift the world argument (to_mfol parity)."""
    outer = outer or set()
    uni = [r for r in _universe(drs) if r not in outer]
    body = _conds_to_fol(drs.conditions, world, outer | set(uni))
    out = body
    for r in reversed(uni):
        out = Exists(r, out)
    return out


_WORLD_N = [0]


def _fresh_world() -> str:
    _WORLD_N[0] += 1
    return "w%d" % _WORLD_N[0]


def _conds_to_fol(conds, world: str, bound: Set[Ref]):
    parts = []
    for c in conds:
        if isinstance(c, Rel):
            parts.append(Pred(c.pred, [world] + [r.find() for r in c.refs]))
        elif isinstance(c, Neg):
            parts.append(Not(drs_to_mfol(c.drs, world, bound)))
        elif isinstance(c, Imp):
            ante_uni = [r for r in _universe(c.ante) if r not in bound]
            inner = bound | set(ante_uni)
            ante = _conds_to_fol(c.ante.conditions, world, inner)
            cons = drs_to_mfol(c.cons, world, inner)
            f = FImp(ante, cons)
            for r in reversed(ante_uni):
                f = ForAll(r, f)
            parts.append(f)
        elif isinstance(c, Or):
            parts.append(FOr(drs_to_mfol(c.left, world, bound),
                             drs_to_mfol(c.right, world, bound)))
        elif isinstance(c, Prop):
            # proposition content asserted at the current world
            parts.append(drs_to_mfol(c.drs, world, bound))
        elif isinstance(c, Diamond):
            w2 = _fresh_world()
            parts.append(Possibly(w2, drs_to_mfol(c.drs, w2, bound)))
        elif isinstance(c, Box):
            w2 = _fresh_world()
            parts.append(Necessarily(w2, drs_to_mfol(c.drs, w2, bound)))
        else:
            raise TypeError("cannot discharge %r" % (c,))
    if not parts:
        return TOP
    if len(parts) == 1:
        return parts[0]
    return And(parts)


# ---------------------------------------------------------------------------
# rendering (reference set-notation golden: ∃x(man(w,x) ∧ happy(w,x)))
# ---------------------------------------------------------------------------

def show_mfol(f, names: Optional[Dict[Ref, str]] = None) -> str:
    names = names if names is not None else {}

    def nm(v) -> str:
        if isinstance(v, str):
            return v
        vv = v.find()
        if vv not in names:
            names[vv] = vv.name or "%s%d" % (vv.kind, len(names) + 1)
        return names[vv]

    def go(g) -> str:
        if g is TOP:
            return "⊤"
        if isinstance(g, Pred):
            return "%s(%s)" % (g.name, ",".join(nm(a) for a in g.args))
        if isinstance(g, And):
            return "(%s)" % " ∧ ".join(go(p) for p in g.parts)
        if isinstance(g, FOr):
            return "(%s ∨ %s)" % (go(g.left), go(g.right))
        if isinstance(g, Not):
            return "¬%s" % go(g.body)
        if isinstance(g, FImp):
            return "(%s → %s)" % (go(g.left), go(g.right))
        if isinstance(g, Exists):
            return "∃%s%s" % (nm(g.var), go(g.body))
        if isinstance(g, ForAll):
            return "∀%s%s" % (nm(g.var), go(g.body))
        if isinstance(g, Possibly):
            return "◇%s.%s" % (g.world, go(g.body))
        if isinstance(g, Necessarily):
            return "◻%s.%s" % (g.world, go(g.body))
        raise TypeError(repr(g))

    out = go(f)
    # the reference drops the outermost conjunction parens: ∃x(A ∧ B)
    return out


# ---------------------------------------------------------------------------
# finite-model evaluation (the sandbox's z3 substitute)
# ---------------------------------------------------------------------------

class Model:
    """Finite Kripke model: individual ``domain``, ``worlds``,
    accessibility pairs, and ``facts`` = {(pred, world, args…), …}."""

    def __init__(self, domain: Iterable, facts: Iterable[Tuple],
                 worlds: Iterable[str] = ("w",),
                 access: Iterable[Tuple[str, str]] = ()):
        self.domain = list(domain)
        self.worlds = list(worlds)
        self.access = set(access)
        self.facts = set(facts)


def evaluate(f, model: Model, env: Optional[Dict] = None,
             world: str = "w") -> bool:
    """Model-check a closed formula (sound, decidable — the discharge
    path the reference delegates to z3 for)."""
    env = env or {}

    def val(v):
        if isinstance(v, str):   # world var
            return env.get(v, v)
        return env[v.find()]

    def go(g, env) -> bool:
        if g is TOP:
            return True
        if isinstance(g, Pred):
            args = []
            for a in g.args:
                if isinstance(a, str):
                    args.append(env.get(a, a))
                else:
                    args.append(env[a.find()])
            return (g.name, *args) in model.facts
        if isinstance(g, And):
            return all(go(p, env) for p in g.parts)
        if isinstance(g, FOr):
            return go(g.left, env) or go(g.right, env)
        if isinstance(g, Not):
            return not go(g.body, env)
        if isinstance(g, FImp):
            return (not go(g.left, env)) or go(g.right, env)
        if isinstance(g, Exists):
            return any(go(g.body, {**env, g.var.find(): d})
                       for d in model.domain)
        if isinstance(g, ForAll):
            return all(go(g.body, {**env, g.var.find(): d})
                       for d in model.domain)
        if isinstance(g, Possibly):
            here = env.get("__w", "w")
            return any(go(g.body, {**env, g.world: w2, "__w": w2})
                       for (a, w2) in model.access if a == here)
        if isinstance(g, Necessarily):
            here = env.get("__w", "w")
            return all(go(g.body, {**env, g.world: w2, "__w": w2})
                       for (a, w2) in model.access if a == here)
        raise TypeError(repr(g))

    return go(f, {**env, "__w": world})
