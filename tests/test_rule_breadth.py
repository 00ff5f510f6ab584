"""Corpus-breadth rule coverage (verdict item 2): sweep ≥500 distinct
real derivations through the Composer — fixture families, the reference's
brexit news derivations, AND CKY-parsed non-fixture sentences — with
ZERO missing composition rules and zero exceptions."""

import os

from ie_ray.semantics.engine import Composer


def _brexit_derivations():
    out = []
    path = "/root/reference/data/brexit-ccgbank.dat"
    if os.path.exists(path):
        for line in open(path):
            if line.startswith("CCG:"):
                out.append(line.split(":", 2)[2].strip())
    return out


def test_corpus_breadth_zero_missing_rules():
    import pyarrow.parquet as pq
    from ie_ray.pipelines.kg import default_fixture_dir
    fd = default_fixture_dir(n_pages=200, pool_size=1200)
    t = pq.read_table(os.path.join(fd, "derivations.parquet"))
    drvs = set(t.column("ccgbank").to_pylist())

    # reference news derivations (EasySRL output shapes: S[pt] chains,
    # N/PP nouns, appositive commas, gerund adjuncts …)
    drvs.update(_brexit_derivations())

    # CKY-parsed non-fixture sentences add coordination/composition shapes
    from ie_ray.ccg.parser import CkyParser
    from ie_ray.sources.clausefinder_fixtures import CLAUSEFINDER_SENTENCES
    p = CkyParser()
    for s in CLAUSEFINDER_SENTENCES:
        d = p.parse(s)
        if d is not None:
            drvs.add(d)

    assert len(drvs) >= 500, len(drvs)
    c = Composer()
    failures = []
    for d in sorted(drvs):
        try:
            sem = c.compose_ccgbank(d)
            sem.get_drs()           # rendering must not raise either
        except Exception as e:      # pragma: no cover - diagnostic
            failures.append((d[:80], repr(e)))
    assert not failures, failures[:3]
    assert not c.missing_rules, sorted(c.missing_rules)[:10]
