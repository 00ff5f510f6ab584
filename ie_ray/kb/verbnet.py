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

# The reference's full VerbNet class XML (one file per top-level class,
# ie/kb/data/vnxml) — its MEMBER lists carry ~13 % more verb lemmas than
# SemLink's mapping (554 of 4409 members have no vn-pb entry, measured
# round 4); merged in as class membership WITHOUT role maps so both the
# class-implication emitter and the supertagger's verb-lemma evidence
# see the complete public inventory.
DEFAULT_VNXML_DIRS = [
    os.environ.get("IE_RAY_VNXML_DIR", ""),
    "/root/reference/src/python/marbles/ie/kb/data/vnxml",
]


class VerbnetDB:
    """lemma → sorted distinct vn-class ids (+ per-class pb→theta roles)."""

    def __init__(self, path: str, vnxml_dir: Optional[str] = None):
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
        if vnxml_dir and os.path.isdir(vnxml_dir):
            self._merge_vnxml(vnxml_dir)
        for v in self.name_index.values():
            v.sort()

    def _merge_vnxml(self, d: str) -> None:
        """Fold vnxml MEMBER lists into ``name_index``.  Class ids use
        SemLink's numeric form ("confront-98" → "98") so lookups stay
        uniform; existing SemLink entries keep their role maps."""
        for f in os.listdir(d):
            if not f.endswith(".xml"):
                continue
            try:
                root = ET.parse(os.path.join(d, f)).getroot()
            except ET.ParseError:
                continue
            for vc in root.iter():
                if vc.tag not in ("VNCLASS", "VNSUBCLASS"):
                    continue
                cid = (vc.get("ID") or "").split("-", 1)[-1]
                if not cid:
                    continue
                mem = vc.find("MEMBERS")
                if mem is None:
                    continue
                for m in mem.findall("MEMBER"):
                    lemma = (m.get("name") or "").replace("_", " ")
                    if not lemma:
                        continue
                    classes = self.name_index.setdefault(lemma, [])
                    if cid not in classes:
                        classes.append(cid)

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
        vnxml = next((d for d in DEFAULT_VNXML_DIRS
                      if d and os.path.isdir(d)), None)
        for p in DEFAULT_PATHS:
            if p and os.path.exists(p):
                _CACHED = VerbnetDB(p, vnxml_dir=vnxml)
                break
    return _CACHED
