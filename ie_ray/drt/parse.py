"""DRS text-notation parsers (test-fixture loaders).

Accepts the reference's set notation ``<{X1,E2},{boy(X1),_ARG0(E2,X1)}>``
and NLTK notation ``([X1,E2],[boy(X1),...])`` (parity:
``src/python/marbles/ie/parse.py:136-388`` — used there only to load DRS
fixtures, same role here).  Produces a ``DRS`` whose refs are bound iff they
appear in the universe; round-trips with ``show_set``/``show_linear``.
"""

from __future__ import annotations

import re
from typing import Dict

from .drs import DRS, Ref, Rel

_COND_RE = re.compile(r"(_?[A-Za-z0-9$€£\-'’.]+)\(([^)]*)\)")
_VAR_RE = re.compile(r"^([EXex])(\d+)$")


def parse_drs(text: str) -> DRS:
    text = text.strip()
    if text.startswith("<"):
        m = re.match(r"^<\{(.*?)\},\{(.*)\}>$", text)
    else:
        m = re.match(r"^\(\[(.*?)\],\[(.*)\]\)$", text)
    if not m:
        raise ValueError("not a DRS literal: %r" % text[:60])
    uni_txt, conds_txt = m.group(1), m.group(2)
    universe = [v.strip() for v in uni_txt.split(",") if v.strip()]

    refs: Dict[str, Ref] = {}

    def ref_for(name: str, order: int) -> Ref:
        r = refs.get(name)
        if r is None:
            vm = _VAR_RE.match(name)
            kind = "e" if (vm and vm.group(1).upper() == "E") else "x"
            r = Ref(kind)
            if name in universe:
                r.bound = True
                r.bound_idx = universe.index(name)
            refs[name] = r
        return r

    conds = []
    for i, cm in enumerate(_COND_RE.finditer(conds_txt)):
        pred = cm.group(1)
        args = [a.strip() for a in cm.group(2).split(",") if a.strip()]
        conds.append(Rel(pred, [ref_for(a, i) for a in args]))
    return DRS(conds)
