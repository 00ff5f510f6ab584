"""Real media decode kernels: PPM/BMP/WAV round-trips and the
actor-pool featurize stage (stub path only for video)."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.multimodal import (FEAT_DIM, MediaDecodeActor,
                                      decode_bmp, decode_ppm, decode_wav,
                                      encode_bmp, encode_ppm, encode_wav,
                                      synthesize_media)


def test_ppm_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_bmp_roundtrip_with_padding():
    # w=3 → stride padding exercised; bottom-up row order exercised
    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    s = (np.sin(np.linspace(0, 20, 500)) * 10000).astype(np.int16)
    got, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert np.array_equal(got, s)


def test_known_image_features():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [255, 255, 255]
    actor = MediaDecodeActor()
    f = actor.dispatch["image/x-portable-pixmap"](encode_ppm(img))
    assert f[0] == 2 and f[1] == 2                 # w, h
    assert abs(f[2] - 255 / 4) < 1e-4              # mean R
    assert f[6:14].sum() == pytest.approx(1.0)     # histogram mass


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_decodes_real_payloads():
    import ray.data
    ds = ray.data.from_arrow(synthesize_media(32))
    rows = ds.map_batches(MediaDecodeActor, batch_size=8,
                          concurrency=(1, 2), num_cpus=1,
                          batch_format="pyarrow").take_all()
    assert len(rows) == 32
    by_kind = {}
    for r in rows:
        assert len(r["features"]) == FEAT_DIM
        by_kind.setdefault(r["kind"], []).append(r)
    # every image and audio row really decoded; video mixes real
    # animated-GIF decode with the honest mp4 stub
    assert all(r["decoded"] for r in by_kind["image"])
    assert all(r["decoded"] for r in by_kind["audio"])
    assert any(r["decoded"] for r in by_kind["video"])
    assert any(not r["decoded"] for r in by_kind["video"])
    # image features carry true dimensions (match the table metadata)
    meta = {r["media_id"]: r
            for b in [synthesize_media(32)] for r in b.to_pylist()}
    for r in by_kind["image"]:
        assert r["features"][0] == meta[r["media_id"]]["width"]
        assert r["features"][1] == meta[r["media_id"]]["height"]
    # audio rms of a pure tone ≈ amplitude/√2
    for r in by_kind["audio"]:
        assert abs(r["features"][2] - (12000 / 32768) / np.sqrt(2)) < 0.01


def test_gif_roundtrip_and_features():
    from ie_ray.stages.multimodal import (_video_features, decode_gif,
                                          encode_gif)
    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
              for _ in range(5)]
    back = decode_gif(encode_gif(frames))
    assert len(back) == 5 and back[0].shape == (6, 8, 3)
    # grayscale palette: every decoded frame equals the gray of the input
    for b, f in zip(back, frames):
        gray = (f.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        assert np.array_equal(b[:, :, 0], gray)
        assert np.array_equal(b[:, :, 1], b[:, :, 2])
    feats = _video_features(back)
    assert feats[0] == 5 and feats[1] == 8 and feats[2] == 6


@pytest.mark.usefixtures("ray_session")
def test_video_gif_rows_decode_for_real():
    import ray.data
    ds = ray.data.from_arrow(synthesize_media(32))
    rows = ds.map_batches(MediaDecodeActor, batch_size=8,
                          concurrency=(1, 2), num_cpus=1,
                          batch_format="pyarrow").take_all()
    vids = [r for r in rows if r["kind"] == "video"]
    assert any(r["decoded"] for r in vids)       # animated GIFs: real
    assert any(not r["decoded"] for r in vids)   # mp4: honest stub
    for r in vids:
        if r["decoded"]:
            assert r["features"][0] >= 3         # n_frames


def test_png_roundtrip_all_shapes():
    from ie_ray.stages.multimodal import decode_png, encode_png
    rng = np.random.RandomState(4)
    for shape in [(1, 1, 3), (5, 17, 3), (32, 8, 3)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


# ---------------------------------------------------------------------------
# JPEG baseline (round 5)
# ---------------------------------------------------------------------------

def _gradient(h, w):
    import numpy as np
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 / max(w - 1, 1)),
                     (yy * 255 / max(h - 1, 1)),
                     ((xx + yy) * 255 / max(w + h - 2, 1))],
                    axis=2).astype(np.uint8)


def test_jpeg_roundtrip_444_near_lossless():
    import numpy as np
    from ie_ray.stages.multimodal import decode_jpeg, encode_jpeg
    img = _gradient(24, 40)
    dec = decode_jpeg(encode_jpeg(img, quant=1))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_roundtrip_420_subsampled():
    import numpy as np
    from ie_ray.stages.multimodal import decode_jpeg, encode_jpeg
    img = _gradient(32, 48)
    dec = decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
    assert dec.shape == img.shape
    # chroma is 2x2-averaged — luma-dominated error stays small
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 12


def test_jpeg_restart_intervals():
    import numpy as np
    from ie_ray.stages.multimodal import decode_jpeg, encode_jpeg
    img = _gradient(32, 48)
    dec = decode_jpeg(encode_jpeg(img, quant=1, restart=3))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2
    dec = decode_jpeg(encode_jpeg(img, quant=1, subsample=True,
                                  restart=2))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 12


def test_jpeg_odd_dimensions_and_grayscale():
    import numpy as np
    from ie_ray.stages.multimodal import decode_jpeg, encode_jpeg
    img = _gradient(19, 29)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (19, 29, 3)
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2
    g = _gradient(16, 16)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g))
    assert int(np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max()) <= 1


def test_jpeg_progressive_rejected_and_flagged():
    import numpy as np
    import pyarrow as pa
    from ie_ray.stages.multimodal import (MediaDecodeActor, decode_jpeg,
                                          encode_jpeg)
    import pytest
    enc = encode_jpeg(_gradient(16, 16))
    bad = enc[:2] + b"\xff\xc2\x00\x05aaa" + enc[2:]
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    # actor path: progressive → honest decoded=false, good → true
    actor = MediaDecodeActor()
    out = actor(pa.table({
        "media_id": pa.array([1, 2], type=pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([enc, bad], type=pa.binary()),
        "mime": pa.array(["image/jpeg", "image/jpeg"]),
    }))
    assert out.column("decoded").to_pylist() == [True, False]


def test_jpeg_quantization_quality_tradeoff():
    import numpy as np
    from ie_ray.stages.multimodal import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    e1 = np.abs(decode_jpeg(encode_jpeg(img, quant=1)).astype(int)
                - img.astype(int)).mean()
    e8 = np.abs(decode_jpeg(encode_jpeg(img, quant=8)).astype(int)
                - img.astype(int)).mean()
    assert e1 < e8          # heavier quantization → more error
    assert e1 <= 1.5


def test_resize_bilinear_identity_and_uniform():
    from ie_ray.stages.multimodal import resize_bilinear
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(resize_bilinear(img, 4, 6), img)
    # uniform image stays uniform at ANY size (bilinear is interpolating)
    uni = np.full((5, 7, 3), 173, dtype=np.uint8)
    out = resize_bilinear(uni, 16, 3)
    assert out.shape == (16, 3, 3)
    assert (out == 173).all()


def test_resize_bilinear_gradient_golden():
    from ie_ray.stages.multimodal import resize_bilinear
    # horizontal ramp 0..255 over 256 px → downscale to 8 px: each
    # output pixel must equal the ramp value at its half-pixel center
    ramp = np.tile(np.arange(256, dtype=np.uint8)[None, :, None],
                   (4, 1, 3))
    out = resize_bilinear(ramp, 4, 8)
    centers = (np.arange(8) + 0.5) * (256 / 8) - 0.5
    assert np.abs(out[2, :, 0].astype(int) - np.round(centers)).max() <= 1


def test_resize_actor_stage(ray_session):
    import ray.data
    from ie_ray.stages.multimodal import MediaResizeActor, decode_ppm, \
        synthesize_media
    ds = ray.data.from_arrow(synthesize_media(24))
    out = ds.map_batches(MediaResizeActor, batch_size=8,
                         concurrency=(1, 2), num_cpus=1,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 24
    done = out[out.resized]
    assert len(done) > 0
    # every resized thumbnail decodes back at exactly thumb size
    for p in done.thumb_ppm:
        img = decode_ppm(p)
        assert img.shape[:2] == (32, 32)
    # non-image mimes (wav/gif video path) honestly flagged
    skipped = out[~out.resized]
    assert (skipped.thumb_ppm.str.len() == 0).all()


def test_frame_sample_actor(ray_session):
    import ray.data
    from ie_ray.stages.multimodal import (MediaFrameSampleActor,
                                          decode_ppm, synthesize_media)
    ds = ray.data.from_arrow(synthesize_media(24))
    out = ds.map_batches(MediaFrameSampleActor, batch_size=8,
                         concurrency=(1, 2), num_cpus=1,
                         batch_format="pyarrow").to_pandas()
    good = out[out.decoded]
    assert len(good) > 0                       # GIFs produced frame rows
    # stride-2 sampling: frame indices are even and capped
    assert (good.frame_idx % 2 == 0).all()
    g = good.groupby("media_id")
    assert (g.frame_idx.count() <= 8).all()
    for p in good.frame_ppm.head(4):
        img = decode_ppm(p)
        assert img.ndim == 3 and img.shape[2] == 3
    # mp4 (unknown codec): exactly one honest decoded=false row each
    bad = out[~out.decoded]
    assert (bad.frame_idx == -1).all() and (bad.n_frames == 0).all()
    assert len(bad) == 3                        # 3 mp4 rows in 24 media


def test_corrupt_payloads_flag_not_crash(ray_session):
    """Truncated/corrupt payloads raise struct.error / zlib.error from
    the codecs — every media stage must degrade to its honest flagged
    row, never kill the Ray task (code-review finding, round 5)."""
    import ray.data
    from ie_ray.stages.multimodal import (MediaDecodeActor,
                                          MediaFrameSampleActor,
                                          MediaResizeActor, encode_png,
                                          synthesize_media)
    good_png = encode_png(np.zeros((8, 8, 3), dtype=np.uint8))
    t = pa.table({
        "media_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "kind": ["image", "image", "video", "image"],
        "payload": pa.array([good_png[: len(good_png) // 2],  # truncated
                             b"\x89PNG\r\n",                  # header only
                             b"GIF89a",                       # 6-byte gif
                             good_png], type=pa.binary()),
        "mime": pa.array(["image/png", "image/png", "image/gif",
                          None], type=pa.string()),
        "width": pa.array([8] * 4, type=pa.int32()),
        "height": pa.array([8] * 4, type=pa.int32()),
    })
    ds = ray.data.from_arrow(t)
    dec = ds.map_batches(MediaDecodeActor, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    assert dec.decoded.tolist() == [False, False, False, False]
    rs = ds.map_batches(MediaResizeActor, concurrency=1,
                        batch_format="pyarrow").to_pandas()
    assert rs.resized.tolist() == [False, False, False, False]
    fr = ds.map_batches(MediaFrameSampleActor, concurrency=1,
                        batch_format="pyarrow").to_pandas()
    # only the gif row produces a (flagged) frame row; null mime skipped
    assert len(fr) == 1 and not fr.decoded[0]


def test_resize_large_image_memory_shape():
    # the float intermediate must be thumbnail-sized, not image-sized:
    # just exercise a big-ish image for correctness of the gather form
    from ie_ray.stages.multimodal import resize_bilinear
    img = np.random.default_rng(5).integers(
        0, 256, size=(1024, 2048, 3), dtype=np.uint8).astype(np.uint8)
    out = resize_bilinear(img, 32, 32)
    assert out.shape == (32, 32, 3)
    # spot-check one output pixel against the direct bilinear formula
    ys = (16 + 0.5) * (1024 / 32) - 0.5
    xs = (16 + 0.5) * (2048 / 32) - 0.5
    y0, x0 = int(ys), int(xs)
    wy, wx = ys - y0, xs - x0
    ref = ((1 - wy) * ((1 - wx) * img[y0, x0].astype(float)
                       + wx * img[y0, x0 + 1])
           + wy * ((1 - wx) * img[y0 + 1, x0]
                   + wx * img[y0 + 1, x0 + 1]))
    assert np.abs(out[16, 16].astype(float) - np.round(ref)).max() <= 1
