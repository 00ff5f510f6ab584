"""Perceptual-hash image dedup (stages/multimodal.py::phash64 /
phash_pairs): determinism, the measured robustness/discrimination
contract on high-entropy images (pHash's published domain), the
distributed band-blocked join vs the O(n²) brute-force popcount twin,
and honest degradation on undecodable payloads."""

import numpy as np
import pyarrow as pa

from ie_ray.stages.multimodal import (MediaPhashActor, decode_bmp,
                                      decode_jpeg, decode_png, decode_ppm,
                                      phash64, phash_pairs,
                                      synthesize_media,
                                      synthesize_media_with_neardups)

_DISPATCH = {"image/x-portable-pixmap": decode_ppm, "image/bmp": decode_bmp,
             "image/png": decode_png, "image/jpeg": decode_jpeg}


def _hashes(t: pa.Table):
    hs, mm = {}, {}
    for i in range(t.num_rows):
        m = t.column("mime")[i].as_py()
        mid = t.column("media_id")[i].as_py()
        if m in _DISPATCH:
            try:
                hs[mid] = phash64(_DISPATCH[m](
                    t.column("payload")[i].as_py()))
                mm[mid] = m
            except ValueError:
                pass
    return hs, mm


def test_phash_deterministic():
    img = np.arange(3 * 20 * 15, dtype=np.uint8).reshape(15, 20, 3)
    assert phash64(img) == phash64(img.copy())
    # the base fixture repeats its gradient every 60 ids → true dups
    t = synthesize_media(64)
    hs, _ = _hashes(t)
    assert hs[0] == hs[60]


def test_phash_high_entropy_contract():
    """Measured domain contract: noisy copies of high-entropy images
    within Hamming 8; distinct high-entropy images ≥ 22 apart.
    (Synthetic separable gradients are OUTSIDE the domain — their DCT
    block is 49/64 zeros and the median threshold degenerates; see the
    phash64 docstring.)"""
    t = synthesize_media_with_neardups(64)
    hs, mm = _hashes(t)
    noise = [k for k in hs if k < 10000
             and mm[k] in ("image/png", "image/bmp")]
    assert len(noise) >= 6
    for a in noise:
        if a + 10000 in hs:
            assert bin(hs[a] ^ hs[a + 10000]).count("1") <= 8, a
    ns = sorted(noise)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            assert bin(hs[a] ^ hs[b]).count("1") >= 22, (a, b)


def test_phash_pairs_matches_bruteforce(ray_session):
    import ray.data
    t = synthesize_media_with_neardups(64)
    hs, _ = _hashes(t)
    want = sorted((a, b, bin(hs[a] ^ hs[b]).count("1"))
                  for i, a in enumerate(sorted(hs))
                  for b in sorted(hs)[i + 1:]
                  if bin(hs[a] ^ hs[b]).count("1") <= 8)
    got = sorted((r["media_a"], r["media_b"], r["hamming"])
                 for r in phash_pairs(ray.data.from_arrow(t)).take_all())
    assert got == want
    assert len(want) > 10  # planted dups + fixture's repeated gradients


def test_undecodable_payloads_flagged_not_fatal(ray_session):
    import ray.data
    t = pa.table({
        "media_id": pa.array([1, 2, 3], type=pa.int64()),
        "kind": pa.array(["image"] * 3, type=pa.string()),
        "payload": pa.array(
            [b"\x89PNG\r\n\x1a\ntruncated", b"not an image",
             bytes(24)], type=pa.binary()),
        "mime": pa.array(["image/png", "video/mp4", "image/bmp"],
                         type=pa.string()),
        "width": pa.array([-1] * 3, type=pa.int32()),
        "height": pa.array([-1] * 3, type=pa.int32())})
    out = ray.data.from_arrow(t).map_batches(
        MediaPhashActor, concurrency=1,
        batch_format="pyarrow").take_all()
    assert [r["hashed"] for r in out] == [False, False, False]
    assert phash_pairs(ray.data.from_arrow(t)).count() == 0
