"""VerbNet class database (T4) and lexeme class implications (J3).

Data source: SemLink's PropBank→VerbNet mapping (``vnpbMappings`` XML,
``data/semlink/1.2.2c/vn-pb/`` in the reference checkout).  The
reference parses the full VerbNet class XML instead
(``ie/kb/verbnet.py:12-41`` via BeautifulSoup); SemLink encodes exactly
the lemma → vn-class (+ PropBank-arg → thematic-role) index this engine
needs, with stdlib XML parsing and no scraped per-class frames.

When a DB is installed via :func:`ie_ray.semantics.lexicon.set_verbnet_db`,
verb leaves additionally emit the reference's class implication
(``ie/semantics/lexeme.py:620-648``): one class → ``stem(E) ⇒ _vn_<cls>(E)``;
several → an Or-chain over the classes, paired left-to-right exactly as
the reference builds it.  The default mode stays CO_NO_VERBNET (goldens).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

DEFAULT_PATHS = [
    os.environ.get("IE_RAY_VNPB_PATH", ""),
    "/root/reference/data/semlink/1.2.2c/vn-pb/vnpbMappings",
]


class VerbnetDB:
    """lemma → sorted distinct vn-class ids (+ per-class pb→theta roles)."""

    def __init__(self, path: str):
        self.name_index: Dict[str, List[str]] = {}
        self.role_index: Dict[str, Dict[str, Dict[str, str]]] = {}
        root = ET.parse(path).getroot()
        for pred in root:
            lemma = pred.get("lemma")
            if not lemma:
                continue
            classes = self.name_index.setdefault(lemma, [])
            roles = self.role_index.setdefault(lemma, {})
            for am in pred.findall("argmap"):
                vc = am.get("vn-class")
                if vc and vc not in classes:
                    classes.append(vc)
                if vc:
                    rmap = roles.setdefault(vc, {})
                    for role in am.findall("role"):
                        pb, theta = role.get("pb-arg"), role.get("vn-theta")
                        if pb is not None and theta:
                            rmap[pb] = theta
        for v in self.name_index.values():
            v.sort()

    def classes(self, stem: str) -> List[str]:
        return self.name_index.get(stem, [])

    def thematic_roles(self, stem: str, vn_class: str) -> Dict[str, str]:
        return self.role_index.get(stem, {}).get(vn_class, {})


_CACHED: Optional[VerbnetDB] = None
_TRIED = False


def load_default() -> Optional[VerbnetDB]:
    """The SemLink DB from the first existing default path; None when the
    data isn't present (the engine then stays in CO_NO_VERBNET mode)."""
    global _CACHED, _TRIED
    if not _TRIED:
        _TRIED = True
        for p in DEFAULT_PATHS:
            if p and os.path.exists(p):
                _CACHED = VerbnetDB(p)
                break
    return _CACHED
