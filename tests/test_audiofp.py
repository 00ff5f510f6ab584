"""Audio fingerprint dedup (stages/multimodal.py::afp64 /
audio_fp_pairs): robustness/discrimination contract on the WAV tone
fixtures, brute-force parity of the banded join, and honest
degradation on short/non-audio payloads."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.multimodal import (MediaAudioFpActor, afp64,
                                      audio_fp_pairs, decode_wav,
                                      synthesize_media_with_neardups)


def _audio_hashes(t: pa.Table):
    hs = {}
    for i in range(t.num_rows):
        if t.column("mime")[i].as_py() == "audio/wav":
            s, _ = decode_wav(t.column("payload")[i].as_py())
            hs[t.column("media_id")[i].as_py()] = afp64(s)
    return hs


def test_afp_contract():
    """Planted noisy/re-gained copies within Hamming 2; tones of
    DIFFERENT frequency ≥ 8 apart.  (Same-frequency tones of different
    length legitimately collide — same spectral shape IS the same
    content to a fingerprint.)"""
    t = synthesize_media_with_neardups(64)
    hs = _audio_hashes(t)
    base = sorted(k for k in hs if k < 20000)
    assert len(base) >= 12
    for a in base:
        assert a + 20000 in hs
        assert bin(hs[a] ^ hs[a + 20000]).count("1") <= 2, a
    for i, a in enumerate(base):
        for b in base[i + 1:]:
            if a % 5 != b % 5:  # different fixture tone frequency
                assert bin(hs[a] ^ hs[b]).count("1") >= 8, (a, b)


def test_afp_deterministic():
    rng = np.random.RandomState(0)
    s = (np.sin(np.arange(1000) * 0.07) * 9000
         + rng.randn(1000) * 50).astype(np.int16)
    assert afp64(s) == afp64(s.copy())


def test_afp_too_short_raises():
    with pytest.raises(ValueError):
        afp64(np.zeros(100, dtype=np.int16))


def test_audio_fp_pairs_matches_bruteforce(ray_session):
    import ray.data
    t = synthesize_media_with_neardups(64)
    hs = _audio_hashes(t)
    want = sorted((a, b, bin(hs[a] ^ hs[b]).count("1"))
                  for i, a in enumerate(sorted(hs))
                  for b in sorted(hs)[i + 1:]
                  if bin(hs[a] ^ hs[b]).count("1") <= 4)
    got = sorted((r["media_a"], r["media_b"], r["hamming"])
                 for r in audio_fp_pairs(
                     ray.data.from_arrow(t)).take_all())
    assert got == want
    assert len(want) >= 16  # the planted copies all pair up


def test_non_audio_and_short_clips_flagged(ray_session):
    import ray.data
    from ie_ray.stages.multimodal import encode_wav
    t = pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "kind": pa.array(["audio", "image"], type=pa.string()),
        "payload": pa.array(
            [encode_wav(np.zeros(64, dtype=np.int16)),  # < one frame
             b"not audio"], type=pa.binary()),
        "mime": pa.array(["audio/wav", "image/png"], type=pa.string()),
        "width": pa.array([-1, -1], type=pa.int32()),
        "height": pa.array([-1, -1], type=pa.int32())})
    out = ray.data.from_arrow(t).map_batches(
        MediaAudioFpActor, concurrency=1,
        batch_format="pyarrow").take_all()
    assert [r["hashed"] for r in out] == [False, False]


def test_media_dedup_keep_matches_unionfind_twin(ray_session):
    """The cross-modality keep-list equals a driver-side union-find
    over the brute-force pHash + afp64 pair sets."""
    import __ray_entry__ as e
    from ie_ray.stages.multimodal import (phash64, decode_ppm, decode_bmp,
                                          decode_png, decode_jpeg)
    t = synthesize_media_with_neardups(64)
    img_disp = {"image/x-portable-pixmap": decode_ppm,
                "image/bmp": decode_bmp, "image/png": decode_png,
                "image/jpeg": decode_jpeg}
    ph, af = {}, {}
    for i in range(t.num_rows):
        m = t.column("mime")[i].as_py()
        mid = t.column("media_id")[i].as_py()
        p = t.column("payload")[i].as_py()
        if m in img_disp:
            try:
                ph[mid] = phash64(img_disp[m](p))
            except ValueError:
                pass
        elif m == "audio/wav":
            af[mid] = afp64(decode_wav(p)[0])
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for hs, thr in ((ph, 8), (af, 4)):
        ks = sorted(hs)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                if bin(hs[a] ^ hs[b]).count("1") <= thr:
                    union(a, b)
    all_ids = set(t.column("media_id").to_pylist())
    want = sorted(i for i in all_ids
                  if i not in parent or find(i) == i)
    got = sorted(r["media_id"]
                 for r in e.queries()["media_dedup_keep"]("sf0.001")
                 .take_all())
    assert got == want
    assert len(want) < len(all_ids)  # the planted dups actually collapsed
