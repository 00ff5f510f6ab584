"""Property-based gates for round-5 kernels.

* KeyLookup: the dense-gather and hash-probe paths must agree with a
  plain Python dict on ANY key/probe distribution — the path choice is
  an optimization, never a semantic.
* tokenize: the web-noise path must be a no-op on plain ASCII prose
  (the replay dict and every derivation fixture key on exact token
  sequences), and deterministic on arbitrary unicode garbage.
* preprocess_sentence: URL/email spans must survive the punctuation
  rule chain verbatim.
"""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ie_ray.ccg.parser import tokenize
from ie_ray.nlp.text import preprocess_sentence
from ie_ray.stages.relational import KeyLookup


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=2**40),
                  unique=True, min_size=0, max_size=40),
    probes=st.lists(st.integers(min_value=-2**40, max_value=2**40),
                    min_size=0, max_size=60),
)
def test_keylookup_matches_dict(keys, probes):
    vals = [k * 3 + 1 for k in keys]
    ref = dict(zip(keys, vals))
    kl = KeyLookup(np.array(keys, dtype=np.int64),
                   np.array(vals, dtype=np.int64), default=-1)
    got = kl.take(np.array(probes, dtype=np.int64)) if probes else []
    for p, g in zip(probes, got):
        assert int(g) == ref.get(p, -1)


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=500),
                  unique=True, min_size=1, max_size=40),
    probes=st.lists(st.integers(min_value=-600, max_value=600),
                    min_size=1, max_size=60),
)
def test_keylookup_dense_path_matches_dict(keys, probes):
    # small key range → dense gather path engages
    vals = [k * 7 + 2 for k in keys]
    ref = dict(zip(keys, vals))
    kl = KeyLookup(np.array(keys, dtype=np.int64),
                   np.array(vals, dtype=np.int64), default=-1)
    for p, g in zip(probes, kl.take(np.array(probes, dtype=np.int64))):
        assert int(g) == ref.get(p, -1)


_PLAIN = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ ,.!?;:'\"()-")),
    min_size=0, max_size=120)


@settings(max_examples=100, deadline=None)
@given(_PLAIN)
def test_tokenize_deterministic_and_weburl_free_on_plain_ascii(s):
    import re
    a = tokenize(s)
    b = tokenize(s)
    assert a == b
    if re.search(r"[A-Z]{2,}(?:\s+[A-Z]{2,}){2}", s) or \
            re.match(r"\s*[A-Z]{2,}.{0,40}:", s) or \
            re.match(r"\s*[-*]", s):
        return  # headline/kicker/list handling legitimately rewrites
    # plain prose must produce only tokens drawn from the input
    # (no normalization artifacts) — every alpha token appears in s
    for t in a:
        if t.isalpha():
            assert t in s


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=120))
def test_tokenize_never_crashes_on_unicode_garbage(s):
    a = tokenize(s)
    assert tokenize(s) == a
    assert all(isinstance(t, str) and t for t in a)


@settings(max_examples=60, deadline=None)
@given(st.sampled_from([
    "https://example.com/a?b=1&c=2",
    "http://t.co/Xy9",
    "www.example.org/story-1.html",
    "press@example.com",
]), _PLAIN)
def test_preprocess_preserves_url_spans(url, prose):
    prose = prose.replace('"', "").strip() or "He said hello"
    out = preprocess_sentence("%s %s ok." % (prose, url))
    assert url in out
