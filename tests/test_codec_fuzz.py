"""Property-based round-trips for the pure-Python media codecs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ie_ray.stages.multimodal import (decode_bmp, decode_gif, decode_png,
                                      decode_ppm, decode_wav, encode_bmp,
                                      encode_gif, encode_png, encode_ppm,
                                      encode_wav)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24),
                  st.integers(0, 2**31 - 1))


@settings(max_examples=25, deadline=None)
@given(_dims)
def test_png_bmp_ppm_roundtrip(dims):
    h, w, seed = dims
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3),
                                              dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2**31 - 1))
def test_wav_roundtrip(n, seed):
    s = np.random.RandomState(seed).randint(-32768, 32768, n) \
        .astype(np.int16)
    got, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000 and np.array_equal(got, s)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(1, 5),
       st.integers(0, 2**31 - 1))
def test_gif_roundtrip(h, w, n_frames, seed):
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    back = decode_gif(encode_gif(frames))
    assert len(back) == n_frames
    for b, f in zip(back, frames):
        gray = (f.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        assert np.array_equal(b[:, :, 0], gray)
