"""Sentence explosion: one page row → N sentence rows.

Parity: M1 paragraph/sentence split (``aws/__init__.py:277-284``) + M2
``preprocess_sentence`` (``ie/utils/text.py:17-43``).  Runs as a flat
``map_batches`` so the downstream parser actor's unit of work is one
sentence (skew control §4 of SURVEY.md).
"""

from __future__ import annotations

import pyarrow as pa

from ..nlp.text import preprocess_sentence, split_paragraphs, split_sentences

MAX_SENT_WORDS = 250  # parser cap, parity: CcgServiceHandler.java:57

# worker-process segmentation cache: web corpora repeat paragraphs
# (boilerplate, syndication) and segmentation+normalization is deterministic
_PARA_CACHE: dict = {}
_PARA_CACHE_MAX = 200_000


def _segment_para(para: str):
    hit = _PARA_CACHE.get(para)
    if hit is None:
        hit = [preprocess_sentence(s) for s in split_sentences(para)]
        if len(_PARA_CACHE) >= _PARA_CACHE_MAX:
            _PARA_CACHE.clear()
        _PARA_CACHE[para] = hit
    return hit


def segment_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    out_url, out_para, out_sent, out_text = [], [], [], []
    for url, text in zip(urls, texts):
        for pi, para in enumerate(split_paragraphs(text)):
            for si, sent in enumerate(_segment_para(para)):
                out_url.append(url)
                out_para.append(pi)
                out_sent.append(si)
                out_text.append(sent)
    return pa.table({
        "url": pa.array(out_url, type=pa.string()),
        "para_idx": pa.array(out_para, type=pa.int32()),
        "sent_idx": pa.array(out_sent, type=pa.int32()),
        "sentence": pa.array(out_text, type=pa.string()),
    })
