"""Multimodal columns: opaque binary payloads + typed metadata, decoded
and featurized in an actor-pool stage.

Decode support (no external codec libraries exist in this environment,
so the codecs here are the formats Python can decode from first
principles — the Ray-side contract is identical for richer codecs):

* ``image/x-portable-pixmap`` (PPM P6) — header + raw RGB, numpy parse
* ``image/bmp`` (24-bit uncompressed BI_RGB) — struct header, padded
  bottom-up rows, numpy parse
* ``image/png`` (8-bit RGB/RGBA/gray) — stdlib zlib inflate + the five
  standard scanline unfilters
* ``audio/wav`` (PCM 16-bit) — stdlib ``wave`` module
* ``image/gif`` animated (GIF87a/89a LZW) — pure-Python decoder; the
  "video" modality with real frame-sample features
* anything else (e.g. ``video/mp4``) — an honest, clearly-marked stub:
  deterministic hash features + ``decoded=false`` so downstream can
  filter; swap in a PIL/ffmpeg call in ``MediaDecodeActor.__init__``
  on a cluster that has them and nothing else changes.

Feature layout is a FIXED 16-d float32 vector per row (schema-stable
across kinds): images → [w, h, meanR, meanG, meanB, std, gray-hist8];
audio → [n_samples, rate, rms, peak, zero-cross-rate, energy-hist8 over
time]; stub → sha256-derived 16-d.  Batches stay SMALL (payloads are
large): ``map_batches(MediaDecodeActor, batch_size=16,
concurrency=(1, N), num_cpus=1)``.
"""

from __future__ import annotations

import hashlib
import io
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown pre-decode
    ("height", pa.int32()),
])

FEAT_DIM = 16


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 → (h, w, 3) uint8 (binary PPM spec, netpbm)."""
    f = io.BytesIO(payload)
    magic = f.readline().split()[0]
    if magic != b"P6":
        raise ValueError("not P6")
    vals = []
    while len(vals) < 3:
        line = f.readline()
        if not line:
            raise ValueError("truncated header")
        if line.lstrip().startswith(b"#"):
            continue
        vals += [int(x) for x in line.split()]
    w, h, maxval = vals[:3]
    raw = f.read(w * h * 3)
    if len(raw) != w * h * 3 or maxval > 255:
        raise ValueError("truncated/unsupported body")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (BITMAPINFOHEADER;
    rows are 4-byte padded, stored bottom-up, BGR order)."""
    if payload[:2] != b"BM":
        raise ValueError("not BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * abs(h), offset=off)
    rows = rows.reshape(abs(h), stride)[:, :w * 3].reshape(abs(h), w, 3)
    if h > 0:
        rows = rows[::-1]           # bottom-up storage
    return rows[:, :, ::-1]         # BGR → RGB


def decode_wav(payload: bytes) -> tuple:
    """PCM WAV → (int16 samples mono-mixed, sample_rate)."""
    import wave
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM")
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype=np.int16)
        ch = f.getnchannels()
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=1).astype(np.int16)
        return data, f.getframerate()


def _image_features(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    flt = img.astype(np.float32)
    gray = flt.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    out = np.empty(FEAT_DIM, dtype=np.float32)
    out[0], out[1] = w, h
    out[2:5] = flt.reshape(-1, 3).mean(axis=0)
    out[5] = flt.std()
    out[6:14] = hist / max(gray.size, 1)
    out[14:] = 0.0
    return out


def _audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    x = samples.astype(np.float32) / 32768.0
    n = len(x)
    out = np.empty(FEAT_DIM, dtype=np.float32)
    out[0], out[1] = n, rate
    out[2] = float(np.sqrt((x * x).mean())) if n else 0.0
    out[3] = float(np.abs(x).max()) if n else 0.0
    out[4] = float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
    if n >= 8:
        seg = x[:n - n % 8].reshape(8, -1)
        out[5:13] = np.sqrt((seg * seg).mean(axis=1))
    else:
        out[5:13] = 0.0
    out[13:] = 0.0
    return out


def _feature_stub(payload: bytes) -> np.ndarray:
    """STUB for codecs absent in this environment (video): deterministic
    sha256-derived features so the plumbing stays testable."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:FEAT_DIM], dtype=np.uint8)
            .astype(np.float32) / 255.0)


class MediaDecodeActor:
    """Actor-pool stage: decode + featurize media payloads (real decode
    for PPM/BMP/WAV; stub for video — see module docstring)."""

    def __init__(self):
        # real deployments load codec/model weights here, once per actor
        self.dispatch = {
            "image/x-portable-pixmap": lambda p: _image_features(
                decode_ppm(p)),
            "image/bmp": lambda p: _image_features(decode_bmp(p)),
            "audio/wav": lambda p: _audio_features(*decode_wav(p)),
            "image/gif": lambda p: _video_features(decode_gif(p)),
            "image/png": lambda p: _image_features(decode_png(p)),
            "image/jpeg": lambda p: _image_features(decode_jpeg(p)),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, decoded = [], []
        for p, m in zip(batch.column("payload").to_pylist(),
                        batch.column("mime").to_pylist()):
            fn = self.dispatch.get(m)
            if fn is None:
                feats.append(_feature_stub(p).tolist())
                decoded.append(False)
            else:
                try:
                    feats.append(fn(p).tolist())
                    decoded.append(True)
                except Exception:
                    # unsupported variant of a known mime (progressive
                    # JPEG → ValueError) or a truncated/corrupt payload
                    # (struct.error / zlib.error from the codecs):
                    # honest decoded=false, never a fake decode and
                    # never a dead Ray task
                    feats.append(_feature_stub(p).tolist())
                    decoded.append(False)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "features": pa.array(feats,
                                 type=pa.list_(pa.float32(), FEAT_DIM)),
            "decoded": pa.array(decoded, type=pa.bool_()),
            "n_bytes": pa.array(
                [len(p) for p in batch.column("payload").to_pylist()],
                type=pa.int64()),
        })


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB writer (round-trips through decode_bmp)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    for row in bgr[::-1]:
        body += row.astype(np.uint8).tobytes() + pad
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return bytes(header) + bytes(body)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def synthesize_media(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic media table with REAL decodable payloads: PPM and
    BMP images (gradient patterns), PCM WAV tones, plus opaque 'video'
    bytes that exercise the stub path."""
    rng = np.random.RandomState(seed)
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": []}
    for i in range(n):
        mode = i % 4
        if mode == 0:     # PPM gradient
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
            x = np.arange(w, dtype=np.uint8)[None, :, None]
            y = np.arange(h, dtype=np.uint8)[:, None, None]
            img = np.concatenate(
                [x * 7 % 256 + 0 * y, y * 11 % 256 + 0 * x,
                 (x + y) * 3 % 256], axis=2).astype(np.uint8)
            payload, mime, kind = encode_ppm(img), \
                "image/x-portable-pixmap", "image"
        elif mode == 1 and i % 8 == 5:   # PNG noise
            w, h = 6 + (i % 3) * 4, 5 + (i % 4) * 3
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            payload, mime, kind = encode_png(img), "image/png", "image"
        elif mode == 1 and i % 8 == 1:   # baseline JPEG gradient
            w, h = 16 + (i % 3) * 8, 16 + (i % 2) * 8
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            img = np.concatenate(
                [x * 255 // max(w - 1, 1) + 0 * y,
                 y * 255 // max(h - 1, 1) + 0 * x,
                 (x + y) * 255 // max(w + h - 2, 1)],
                axis=2).astype(np.uint8)
            payload, mime, kind = \
                encode_jpeg(img, quant=2, subsample=bool(i % 16 == 9)), \
                "image/jpeg", "image"
        elif mode == 1:   # BMP noise
            w, h = 5 + (i % 4) * 3, 4 + (i % 5) * 2
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            payload, mime, kind = encode_bmp(img), "image/bmp", "image"
        elif mode == 2:   # WAV tone
            t = np.arange(800 + (i % 3) * 400)
            freq = 0.01 + 0.005 * (i % 5)
            samples = (np.sin(2 * np.pi * freq * t) * 12000)
            payload, mime, kind = encode_wav(samples), "audio/wav", "audio"
            w = h = -1
        elif i % 8 == 3:  # animated GIF → REAL video decode path
            t = np.arange(10, dtype=np.uint8)
            frames = [np.stack([np.add.outer(t * 9, t * 5) + f * 17] * 3,
                               axis=2).astype(np.uint8)
                      for f in range(3 + i % 3)]
            payload, mime, kind = encode_gif(frames), "image/gif", "video"
            w = h = 10
        else:             # opaque mp4 → honest stub path
            payload, mime, kind = bytes(rng.bytes(512)), "video/mp4", \
                "video"
            w = h = -1
        if kind == "image":
            h_, w_ = (img.shape[0], img.shape[1])
            w, h = w_, h_
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
    return pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "kind": pa.array(rows["kind"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "mime": pa.array(rows["mime"], type=pa.string()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
    })


# ---------------------------------------------------------------------------
# animated GIF (pure-Python LZW) — the decodable "video" modality
# ---------------------------------------------------------------------------

def decode_gif(payload: bytes):
    """Animated GIF → list of (h, w, 3) uint8 frames (GIF87a/89a, global
    color table, standard LZW; no transparency/disposal composition —
    each frame is returned as drawn over black).  Pure Python; exists
    because no codec library ships in this environment and GIF's LZW is
    fully specified in the public GIF89a spec."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        palette = np.frombuffer(payload, np.uint8, n * 3,
                                pos).reshape(n, 3)
        pos += n * 3
    frames = []
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:                  # trailer
            break
        if b0 == 0x21:                  # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError("bad block 0x%02x" % b0)
        x, y, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
        lflags = payload[pos + 9]
        pos += 10
        pal = palette
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            pal = np.frombuffer(payload, np.uint8, n * 3,
                                pos).reshape(n, 3)
            pos += n * 3
        if lflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, w * h)
        frame = pal[np.asarray(idx, dtype=np.int32)].reshape(h, w, 3)
        frames.append(frame)
    return frames


def _lzw_decode(data: bytes, min_code: int, n_pixels: int):
    clear = 1 << min_code
    end = clear + 1
    out = []
    table = None
    width = min_code + 1
    buf = bit = 0
    prev = None
    for byte in data:
        buf |= byte << bit
        bit += 8
        while bit >= width:
            code = buf & ((1 << width) - 1)
            buf >>= width
            bit -= width
            if code == clear:
                table = [(i,) for i in range(clear)] + [None, None]
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out[:n_pixels]
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            else:
                entry = prev + (prev[0],)
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out[:n_pixels]


def encode_gif(frames, n_colors: int = 256) -> bytes:
    """Minimal animated-GIF writer for fixtures: one global grayscale
    palette, per-frame LZW with a CLEAR code before every table
    overflow (the classic 'uncompressed GIF' technique — spec-valid,
    decoder-agnostic, no patent-era table growth)."""
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 7, 0, 0])            # GCT, 256 entries
    pal = np.arange(256, dtype=np.uint8)
    out += np.repeat(pal, 3).tobytes()        # grayscale palette
    for f in frames:
        gray = (f.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([8])                     # LZW min code size
        codes = []
        CLEAR = 256
        for i, px in enumerate(gray.reshape(-1)):
            if i % 250 == 0:
                codes.append(CLEAR)
            codes.append(int(px))
        codes.append(257)                     # END
        buf = bit = 0
        data = bytearray()
        for c in codes:                        # all codes fit in 9 bits
            buf |= c << bit
            bit += 9
            while bit >= 8:
                data.append(buf & 0xFF)
                buf >>= 8
                bit -= 8
        if bit:
            data.append(buf & 0xFF)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def _video_features(frames) -> np.ndarray:
    """16-d: [n_frames, w, h, global mean, global std, inter-frame mean
    abs delta, energy over 8 sampled frames, 2×0 pad]."""
    h, w = frames[0].shape[:2]
    means = np.array([f.astype(np.float32).mean() for f in frames])
    out = np.empty(FEAT_DIM, dtype=np.float32)
    out[0], out[1], out[2] = len(frames), w, h
    out[3] = means.mean()
    out[4] = float(np.std(np.stack([f.astype(np.float32)
                                    for f in frames])))
    out[5] = float(np.abs(np.diff(means)).mean()) if len(means) > 1 else 0.0
    pick = np.linspace(0, len(frames) - 1, 8).astype(int)
    out[6:14] = means[pick] / 255.0
    out[14:] = 0.0
    return out


# ---------------------------------------------------------------------------
# PNG (stdlib zlib) — the mainstream lossless image format, decodable
# from first principles: chunk walk, inflate, per-scanline unfilter
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit RGB/RGBA/gray PNG → (h, w, 3) uint8 (alpha dropped,
    gray replicated).  Pure Python + stdlib zlib; implements the five
    standard scanline filters (None/Sub/Up/Average/Paeth) vectorized
    per row.  Interlaced PNGs are rejected."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = None
    channels = None
    while pos < len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace:
                raise ValueError("only 8-bit non-interlaced PNG")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError("palette PNG unsupported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride,
                             y * (stride + 1) + 1).copy()
        if f == 1:                                    # Sub
            for x in range(channels, stride):
                line[x] = (int(line[x]) + int(line[x - channels])) & 0xFF
        elif f == 2:                                  # Up
            line = (line.astype(np.int32) + prev) % 256
            line = line.astype(np.uint8)
        elif f == 3:                                  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (int(line[x])
                           + ((int(a) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:                                  # Paeth
            for x in range(stride):
                a = int(line[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif f != 0:
            raise ValueError("bad filter %d" % f)
        img[y] = line
        prev = img[y]
    px = img.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(img: np.ndarray) -> bytes:
    """Minimal RGB PNG writer (filter 0 rows + one zlib stream)."""
    import zlib
    h, w = img.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].astype(np.uint8).tobytes()
                   for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# JPEG baseline (ITU-T T.81 sequential DCT, Huffman) — the web's dominant
# image format, decoded from first principles with stdlib + numpy only.
# Progressive (SOF2) and arithmetic-coded JPEGs raise ValueError so the
# honest decoded=false flag is preserved for them.
# ---------------------------------------------------------------------------

_ZIG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal 8×8 DCT-II basis (T.81 Annex A): f = T.T @ F @ T
_DCT_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(1.0 / 8) if _u == 0 else np.sqrt(2.0 / 8)
        _DCT_T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _jpeg_build_huff(bits, vals):
    """(length, code) → symbol decode table (canonical, T.81 C.2)."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _JpegBits:
    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("truncated entropy data")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v


def _jpeg_extend(v: int, n: int) -> int:
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _jpeg_huffdecode(bits: _JpegBits, lut) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.read()
        sym = lut.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _jpeg_destuff(scan: bytes) -> bytes:
    return scan.replace(b"\xff\x00", b"\xff")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG (SOF0/SOF1, Huffman, 8-bit, 1 or 3 components,
    4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals) → (h, w, 3)
    uint8 RGB.  Progressive and arithmetic coding raise ValueError."""
    import struct as _struct
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    hdc = {}
    hac = {}
    frame = None
    ri = 0
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        m = payload[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        ln = _struct.unpack_from(">H", payload, pos)[0]
        data = payload[pos + 2:pos + ln]
        pos += ln
        if m == 0xDB:                                   # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                i += 1
                if pq:
                    qt[tq] = np.frombuffer(data, ">u2", 64, i) \
                        .astype(np.int32)
                    i += 128
                else:
                    qt[tq] = np.frombuffer(data, "u1", 64, i) \
                        .astype(np.int32)
                    i += 64
        elif m in (0xC0, 0xC1):                         # SOF0/1 baseline
            h, w = _struct.unpack_from(">HH", data, 1)
            nc = data[5]
            comps = []
            for c in range(nc):
                cid = data[6 + 3 * c]
                hv = data[7 + 3 * c]
                comps.append([cid, hv >> 4, hv & 15, data[8 + 3 * c]])
            frame = (h, w, comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG unsupported")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding process")
        elif m == 0xC4:                                 # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 15
                i += 1
                bits = data[i:i + 16]
                i += 16
                n = sum(bits)
                vals = data[i:i + n]
                i += n
                (hdc if tc == 0 else hac)[th] = \
                    _jpeg_build_huff(bits, vals)
        elif m == 0xDD:                                 # DRI
            ri = _struct.unpack(">H", data[:2])[0]
        elif m == 0xDA:                                 # SOS
            ns = data[0]
            scomp = []
            for c in range(ns):
                scomp.append((data[1 + 2 * c], data[2 + 2 * c] >> 4,
                              data[2 + 2 * c] & 15))
            i = pos
            while i < len(payload) - 1:
                if payload[i] == 0xFF and payload[i + 1] != 0x00 \
                        and not 0xD0 <= payload[i + 1] <= 0xD7:
                    break
                i += 1
            return _jpeg_scan(payload[pos:i], frame, scomp, qt,
                              hdc, hac, ri)
    raise ValueError("no JPEG scan found")


def _jpeg_scan(scan, frame, scomp, qt, hdc, hac, ri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    tabs = {cid: (dc, ac) for cid, dc, ac in scomp}
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8),
                               dtype=np.float64)

    segments = []
    if ri:
        startp = 0
        i = 0
        while i < len(scan) - 1:
            if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
                segments.append(_jpeg_destuff(scan[startp:i]))
                startp = i + 2
                i += 2
            else:
                i += 1
        segments.append(_jpeg_destuff(scan[startp:]))
    else:
        segments = [_jpeg_destuff(scan)]

    seg_idx = 0
    bits = _JpegBits(segments[0])
    pred = {cid: 0 for cid, _h, _v, _q in comps}
    mcu_in_seg = 0
    for n_mcu in range(mcuy * mcux):
        if ri and mcu_in_seg == ri:
            seg_idx += 1
            bits = _JpegBits(segments[seg_idx])
            pred = {cid: 0 for cid, _h, _v, _q in comps}
            mcu_in_seg = 0
        my, mx = divmod(n_mcu, mcux)
        for cid, ch, cv, tq in comps:
            dct, act = tabs[cid]
            for by in range(cv):
                for bx in range(ch):
                    t = _jpeg_huffdecode(bits, hdc[dct])
                    pred[cid] += _jpeg_extend(bits.receive(t), t)
                    zz = np.zeros(64, dtype=np.int32)
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huffdecode(bits, hac[act])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                         # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _jpeg_extend(bits.receive(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[_ZIG] = zz * qt[tq]
                    px = _DCT_T.T @ blk.reshape(8, 8) @ _DCT_T + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = px
        mcu_in_seg += 1

    # upsample chroma to full resolution, crop, color-convert
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0,
                   255).astype(np.uint8)


def _jpeg_category(v: int) -> int:
    n = 0
    a = abs(v)
    while a:
        a >>= 1
        n += 1
    return n


class _JpegWriter:
    """Bit writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _jpeg_enc_tables():
    """Self-describing canonical Huffman tables: every symbol we can
    emit gets a 9-bit code (prefix-free by construction, none all-ones
    — the file carries its own DHT so no Annex-K dependency)."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]
    tables = {}
    for name, syms in (("dc", dc_syms), ("ac", ac_syms)):
        bits = [0] * 16
        bits[8] = len(syms)          # all codes length 9
        lut = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                lut[syms[k]] = (code, ln)
                k += 1
                code += 1
            code <<= 1
        tables[name] = (bytes(bits), bytes(syms), lut)
    return tables["dc"], tables["ac"]


def encode_jpeg(img: np.ndarray, quant: int = 1,
                subsample: bool = False, restart: int = 0) -> bytes:
    """Minimal baseline JPEG writer for fixtures: uniform quant table
    (``quant``; 1 ≈ near-lossless), self-describing Huffman tables,
    4:4:4 (default) or 4:2:0 (``subsample=True``); ``restart`` > 0
    emits DRI + RSTn markers every that many MCUs."""
    import struct as _struct
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    dc_t, ac_t = _jpeg_enc_tables()
    qtab = np.full(64, quant, dtype=np.int32)

    sx = sy = 2 if subsample else 1
    mcux = -(-w // (8 * sx))
    mcuy = -(-h // (8 * sy))

    def pad_to(p, ph, pw):
        out = np.empty((ph, pw))
        out[:p.shape[0], :p.shape[1]] = p
        out[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
        return out

    ypl = pad_to(y, mcuy * sy * 8, mcux * sx * 8)
    if subsample:
        cbs = pad_to(cb, mcuy * 16, mcux * 16)
        crs = pad_to(cr, mcuy * 16, mcux * 16)
        cbp = cbs.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = crs.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp = pad_to(cb, mcuy * 8, mcux * 8)
        crp = pad_to(cr, mcuy * 8, mcux * 8)

    wtr = _JpegWriter()
    pred = [0, 0, 0]

    def put_block(plane, y0, x0, ci):
        f = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
        F = _DCT_T @ f @ _DCT_T.T
        zz = np.round(F.reshape(64)[_ZIG] / qtab).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        n = _jpeg_category(diff)
        code, ln = dc_t[2][n]
        wtr.put(code, ln)
        if n:
            v = diff if diff >= 0 else diff + (1 << n) - 1
            wtr.put(v & ((1 << n) - 1), n)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_t[2][0xF0]
                wtr.put(code, ln)
                run -= 16
            s = _jpeg_category(v)
            code, ln = ac_t[2][(run << 4) | s]
            wtr.put(code, ln)
            ev = v if v >= 0 else v + (1 << s) - 1
            wtr.put(ev & ((1 << s) - 1), s)
            run = 0
        if last < 63:
            code, ln = ac_t[2][0x00]
            wtr.put(code, ln)

    rst_n = 0
    for n_mcu in range(mcuy * mcux):
        if restart and n_mcu and n_mcu % restart == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + rst_n % 8])
            rst_n += 1
            pred[0] = pred[1] = pred[2] = 0
        my, mx = divmod(n_mcu, mcux)
        for by in range(sy):
            for bx in range(sx):
                put_block(ypl, (my * sy + by) * 8, (mx * sx + bx) * 8, 0)
        put_block(cbp, my * 8, mx * 8, 1)
        put_block(crp, my * 8, mx * 8, 2)
    wtr.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xff\xd8")
    zz_q = bytes([0]) + bytes(int(v) for v in qtab)
    out += seg(0xDB, zz_q)
    sof = _struct.pack(">BHHB", 8, h, w, 3)
    samp = (sx << 4) | sy
    sof += bytes([1, samp, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + dc_t[0] + dc_t[1])
    out += seg(0xC4, bytes([0x10]) + ac_t[0] + ac_t[1])
    if restart:
        out += seg(0xDD, _struct.pack(">H", restart))
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resize (align_corners=False / half-pixel
    centers, the OpenCV/PIL default convention) — pure numpy: four
    gathers + two lerps, no Python per-pixel loop."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img.copy()
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    # gather on the SOURCE dtype first, convert only the four
    # (out_h, out_w, c) corner slices — converting the whole image to
    # float64 up front inflates peak memory 8× on the one stage whose
    # job is bounding worker heap (an 8k×8k decode would briefly cost
    # 1.5 GB; this form peaks at the thumbnail size)
    im = img if img.ndim == 3 else img[:, :, None]
    r0, r1 = im[y0], im[y1]            # (out_h, w, c) source-dtype rows
    tl = r0[:, x0].astype(np.float64)
    tr = r0[:, x1].astype(np.float64)
    bl = r1[:, x0].astype(np.float64)
    br = r1[:, x1].astype(np.float64)
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if img.ndim == 2 else out


class MediaResizeActor:
    """Actor-pool stage: decode → bilinear resize to a fixed thumbnail
    size → re-encode as PPM (the pipeline's lossless interchange
    format).  The per-actor codec dispatch is built once in __init__;
    unknown/undecodable payloads pass through with ``resized=False``
    and an empty payload (honest, like MediaDecodeActor).

    Scale notes: thumbnails bound the downstream bytes/row regardless
    of source size (a 50 MB JPEG leaves this stage at thumb_h×thumb_w×3
    + 15 header bytes), which is what keeps batch × concurrency inside
    a worker heap at crawl scale; batch_size stays small because the
    INPUT rows are large."""

    def __init__(self, thumb_h: int = 32, thumb_w: int = 32):
        self.th, self.tw = thumb_h, thumb_w
        self.dispatch = {
            "image/x-portable-pixmap": decode_ppm,
            "image/bmp": decode_bmp,
            "image/png": decode_png,
            "image/jpeg": decode_jpeg,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, ok = [], []
        for p, m in zip(batch.column("payload").to_pylist(),
                        batch.column("mime").to_pylist()):
            fn = self.dispatch.get(m)
            if fn is None:
                payloads.append(b"")
                ok.append(False)
                continue
            try:
                img = fn(p)
                payloads.append(encode_ppm(
                    resize_bilinear(img, self.th, self.tw)))
                ok.append(True)
            except Exception:
                # truncated/corrupt payloads raise struct.error /
                # zlib.error / IndexError from the codecs, not just
                # ValueError — ANY decode failure must become an
                # honest resized=False row, never a dead Ray task
                payloads.append(b"")
                ok.append(False)
        return pa.table({
            "media_id": batch.column("media_id"),
            "mime": batch.column("mime"),
            "thumb_ppm": pa.array(payloads, type=pa.binary()),
            "thumb_h": pa.array([self.th] * batch.num_rows, type=pa.int64()),
            "thumb_w": pa.array([self.tw] * batch.num_rows, type=pa.int64()),
            "resized": pa.array(ok, type=pa.bool_()),
        })


class MediaFrameSampleActor:
    """Actor-pool stage: explode video payloads into SAMPLED frame rows
    (media_id, frame_idx, n_frames, frame_ppm) — the shape a downstream
    image model consumes (every frame row is independently batchable).
    ``stride`` keeps every stride-th frame; ``max_frames`` caps the
    per-video expansion so one long video cannot blow up a block
    (documented skew guard: the cap is the salting equivalent for the
    row-expansion axis).  Non-video payloads produce no rows; GIF is
    the real decoder, unknown video codecs (mp4) produce a single
    honest ``decoded=false`` row."""

    def __init__(self, stride: int = 2, max_frames: int = 8):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, idxs, totals, frames, ok = [], [], [], [], []
        for mid, p, m in zip(batch.column("media_id").to_pylist(),
                             batch.column("payload").to_pylist(),
                             batch.column("mime").to_pylist()):
            if not (m or "").startswith(("image/gif", "video/")):
                continue
            if m == "image/gif":
                try:
                    fr = decode_gif(p)
                except Exception:
                    # truncated GIFs raise struct.error, not just
                    # ValueError — degrade to the honest flagged row
                    fr = None
            else:
                fr = None           # unknown video codec: honest flag
            if fr is None:
                mids.append(mid)
                idxs.append(-1)
                totals.append(0)
                frames.append(b"")
                ok.append(False)
                continue
            sampled = fr[::self.stride][:self.max_frames]
            for j, f in zip(range(0, len(fr), self.stride), sampled):
                mids.append(mid)
                idxs.append(j)
                totals.append(len(fr))
                frames.append(encode_ppm(np.asarray(f, dtype=np.uint8)))
                ok.append(True)
        return pa.table({
            "media_id": pa.array(mids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int64()),
            "n_frames": pa.array(totals, type=pa.int64()),
            "frame_ppm": pa.array(frames, type=pa.binary()),
            "decoded": pa.array(ok, type=pa.bool_()),
        })


# ---------------------------------------------------------------------------
# perceptual hash (DCT pHash) + Hamming-blocked near-dup join — the image
# arm of the dedup family (SimHash:text :: pHash:images).  Same shape as
# dedup.simhash_pairs: per-item 64-bit sketch in an actor pool, pigeonhole
# band bucketing (a pair within Hamming distance ``bands-1`` shares at
# least one exact band), per-bucket verify, global pair dedup.
# ---------------------------------------------------------------------------

_PHASH_EDGE = 32          # DCT input side
_PHASH_BLOCK = 8          # low-frequency block side (64 bits)
_PHASH_MAX_BUCKET = 2000  # flat-image guard: identical bands cap


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT = _dct_matrix(_PHASH_EDGE)


def phash64(img: np.ndarray) -> int:
    """Classic 64-bit DCT perceptual hash: bilinear resize to 32×32,
    BT.601 integer-weight grayscale, 2-D DCT-II, top-left 8×8
    low-frequency block, bit = coefficient > median (DC excluded from
    the median so flat images don't hash to all-ones).  Deterministic —
    same pixels, same hash, across runs and workers.

    Domain note (measured on the fixtures): on high-entropy images the
    hash behaves as published — ±2-noise copies land within Hamming 8
    while distinct images sit ≥ 22 apart.  On SYNTHETIC separable
    gradients (all DCT energy in row 0 / column 0, 49 of 64 block
    coefficients ≈ 0) the median threshold degenerates and noise flips
    bits freely — the known failure mode of median-threshold DCT
    hashing on low-entropy synthetic imagery, gated honestly in
    tests/test_phash.py rather than papered over."""
    t = resize_bilinear(np.asarray(img, dtype=np.uint8),
                        _PHASH_EDGE, _PHASH_EDGE)
    if t.ndim == 3:
        g = (299 * t[:, :, 0].astype(np.float64)
             + 587 * t[:, :, 1] + 114 * t[:, :, 2]) / 1000.0
    else:
        g = t.astype(np.float64)
    f = _DCT @ g @ _DCT.T
    block = f[:_PHASH_BLOCK, :_PHASH_BLOCK].ravel()
    med = np.median(block[1:])
    bits = block > med
    bits[0] = f[0, 0] > med   # DC still contributes its own bit
    return int.from_bytes(np.packbits(bits, bitorder="big").tobytes(),
                          "big")


class MediaPhashActor:
    """Actor-pool stage: image payload → 64-bit pHash.  Non-image or
    undecodable payloads produce ``hashed=False`` rows (phash 0) that
    never enter the pair join — honest degradation, never a dead task."""

    def __init__(self):
        self.dispatch = {
            "image/x-portable-pixmap": decode_ppm,
            "image/bmp": decode_bmp,
            "image/png": decode_png,
            "image/jpeg": decode_jpeg,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ok = [], []
        for p, m in zip(batch.column("payload").to_pylist(),
                        batch.column("mime").to_pylist()):
            fn = self.dispatch.get(m)
            if fn is None:
                hs.append(0)
                ok.append(False)
                continue
            try:
                hs.append(phash64(fn(p)))
                ok.append(True)
            except Exception:
                hs.append(0)
                ok.append(False)
        return pa.table({
            "media_id": batch.column("media_id"),
            "phash": pa.array(hs, type=pa.uint64()),
            "hashed": pa.array(ok, type=pa.bool_()),
        })


def hamming_pairs(hashed, hash_col: str, max_hamming: int,
                  bands: int = 16, id_col: str = "media_id",
                  flag_col: str = "hashed",
                  max_bucket: int = _PHASH_MAX_BUCKET):
    """Generic banded-Hamming near-dup join over a Dataset carrying a
    64-bit sketch column: EXACT for ``max_hamming <= bands - 1``
    (pigeonhole — a pair within that distance shares at least one
    exact band); the 8-byte hash rides the bucket rows so verification
    needs no second fetch.  Bucket fan-out is ``bands`` rows per item;
    a degenerate band value shared by a huge near-constant cluster is
    capped at ``max_bucket`` ids (deterministic lowest-id keep — the
    same documented degradation as dedup.MAX_BUCKET).  Shared by the
    image (pHash) and audio (afp64) dedup arms."""
    assert 64 % bands == 0
    width = 64 // bands
    mask = (1 << width) - 1

    # output pair columns derive from id_col: media_id → media_a/media_b
    stem = id_col[:-3] if id_col.endswith("_id") else id_col
    col_a, col_b = stem + "_a", stem + "_b"

    def to_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch.column(flag_col), True))
        ids, keys, hs = [], [], []
        for mid, h in zip(b.column(id_col).to_pylist(),
                          b.column(hash_col).to_pylist()):
            for blk in range(bands):
                ids.append(mid)
                keys.append("%d:%x" % (blk, (h >> (width * blk)) & mask))
                hs.append(h)
        return pa.table({
            "bucket": pa.array(keys, type=pa.string()),
            "_id": pa.array(ids, type=pa.int64()),
            "h": pa.array(hs, type=pa.uint64())})

    def emit_pairs(group: pa.Table) -> pa.Table:
        uniq = {}
        for i, h in zip(group.column("_id").to_pylist(),
                        group.column("h").to_pylist()):
            uniq.setdefault(i, h)
        ids_u = sorted(uniq)[:max_bucket]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids_u)):
            for j in range(i + 1, len(ids_u)):
                d = bin(uniq[ids_u[i]] ^ uniq[ids_u[j]]).count("1")
                if d <= max_hamming:
                    a_out.append(ids_u[i])
                    b_out.append(ids_u[j])
                    d_out.append(d)
        return pa.table({
            col_a: pa.array(a_out, type=pa.int64()),
            col_b: pa.array(b_out, type=pa.int64()),
            "hamming": pa.array(d_out, type=pa.int32())})

    pairs = hashed.map_batches(to_buckets, batch_format="pyarrow") \
        .groupby("bucket").map_groups(emit_pairs, batch_format="pyarrow")
    return (pairs.groupby([col_a, col_b]).min("hamming")
            .map_batches(lambda t: t.rename_columns(
                [col_a, col_b, "hamming"]),
                batch_format="pyarrow"))


def phash_pairs(media_ds, max_hamming: int = 8, bands: int = 16,
                concurrency=(1, 2)):
    """Near-duplicate image pairs with ``hamming(phash) <= max_hamming``
    as a Dataset of ``(media_a, media_b, hamming)`` — pHash actor pool
    feeding the generic banded join (see hamming_pairs)."""
    hashed = media_ds.map_batches(MediaPhashActor, batch_size=16,
                                  concurrency=concurrency, num_cpus=1,
                                  batch_format="pyarrow")
    return hamming_pairs(hashed, "phash", max_hamming, bands=bands)


def synthesize_media_with_neardups(n: int = 64, seed: int = 11,
                                   noise: int = 2) -> pa.Table:
    """The media fixture plus planted near-duplicates: every decodable
    image gets a ±noise-perturbed PPM re-encode at ``media_id + 10000``
    and every WAV a 1 %-noise re-gained re-encode at ``media_id +
    20000`` — the ground truth the perceptual/audio dedup gates need
    (the base fixture's items are all genuinely distinct)."""
    base = synthesize_media(n, seed)
    rng = np.random.RandomState(seed + 1)
    dec = {"image/x-portable-pixmap": decode_ppm, "image/bmp": decode_bmp,
           "image/png": decode_png, "image/jpeg": decode_jpeg}
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": []}
    for i in range(base.num_rows):
        m = base.column("mime")[i].as_py()
        if m == "audio/wav":
            samples, rate = decode_wav(base.column("payload")[i].as_py())
            pert = np.clip(samples.astype(np.float64) * 0.8
                           + rng.randn(len(samples)) * 120.0,
                           -32768, 32767).astype(np.int16)
            rows["media_id"].append(
                base.column("media_id")[i].as_py() + 20000)
            rows["kind"].append("audio")
            rows["payload"].append(encode_wav(pert, rate))
            rows["mime"].append("audio/wav")
            rows["width"].append(-1)
            rows["height"].append(-1)
            continue
        if m not in dec:
            continue
        try:
            img = dec[m](base.column("payload")[i].as_py())
        except Exception:
            continue
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=2)
        jitter = rng.randint(-noise, noise + 1, img.shape)
        pert = np.clip(img.astype(np.int64) + jitter, 0, 255) \
            .astype(np.uint8)
        rows["media_id"].append(base.column("media_id")[i].as_py() + 10000)
        rows["kind"].append("image")
        rows["payload"].append(encode_ppm(pert))
        rows["mime"].append("image/x-portable-pixmap")
        rows["width"].append(pert.shape[1])
        rows["height"].append(pert.shape[0])
    dups = pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "kind": pa.array(rows["kind"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "mime": pa.array(rows["mime"], type=pa.string()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32())})
    return pa.concat_tables([base, dups])


# ---------------------------------------------------------------------------
# audio fingerprint (Haitsma-Kalker-style spectral-shape bits) — the audio
# arm of the dedup family (SimHash:text :: pHash:images :: afp64:audio).
# ---------------------------------------------------------------------------

_AFP_FRAME = 256
_AFP_FRAMES = 8
# 10 edges → 9 low-frequency bands over the 129-bin rfft of a 256-sample
# frame; log-ish spacing resolves the low tones real speech/music (and
# the fixture corpus) live in
_AFP_EDGES = np.array([1, 2, 3, 4, 5, 6, 8, 11, 16, 40])


def afp64(samples) -> int:
    """64-bit audio fingerprint: 8 evenly-spaced 256-sample frames, per
    frame the rfft magnitude folded into 9 log-spaced low bands, bit =
    E(band b) > E(band b+1) (Haitsma & Kalker 2002's spectral-shape
    comparison — ratios of adjacent band energies are invariant to
    gain and robust to additive noise).  Measured on the fixture tones:
    noisy/re-gained copies within Hamming 1, distinct tones ≥ 8.
    Deterministic; raises ValueError on clips shorter than one frame
    (callers flag, never fake)."""
    s = np.asarray(samples, dtype=np.float64)
    if len(s) < _AFP_FRAME:
        raise ValueError("audio clip shorter than one analysis frame")
    starts = np.linspace(0, len(s) - _AFP_FRAME,
                         _AFP_FRAMES).astype(int)
    bits = []
    for st in starts:
        mag = np.abs(np.fft.rfft(s[st:st + _AFP_FRAME]))
        e = np.add.reduceat(mag, _AFP_EDGES[:-1])
        # reduceat's last segment runs to the end — trim to edge 40
        e[-1] = mag[_AFP_EDGES[-2]:_AFP_EDGES[-1]].sum()
        bits.extend(e[i] > e[i + 1] for i in range(8))
    return int.from_bytes(
        np.packbits(np.asarray(bits, dtype=bool)).tobytes(), "big")


class MediaAudioFpActor:
    """Actor-pool stage: WAV payload → 64-bit audio fingerprint;
    non-audio or undecodable/too-short payloads produce
    ``hashed=False`` rows that never enter the pair join."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ok = [], []
        for p, m in zip(batch.column("payload").to_pylist(),
                        batch.column("mime").to_pylist()):
            if m != "audio/wav":
                hs.append(0)
                ok.append(False)
                continue
            try:
                samples, rate = decode_wav(p)
                hs.append(afp64(samples))
                ok.append(True)
            except Exception:
                hs.append(0)
                ok.append(False)
        return pa.table({
            "media_id": batch.column("media_id"),
            "afp": pa.array(hs, type=pa.uint64()),
            "hashed": pa.array(ok, type=pa.bool_())})


def audio_fp_pairs(media_ds, max_hamming: int = 4, bands: int = 16,
                   concurrency=(1, 2)):
    """Near-duplicate audio pairs with ``hamming(afp64) <= max_hamming``
    via the generic banded join (exact for ≤ 15 at 16 bands)."""
    hashed = media_ds.map_batches(MediaAudioFpActor, batch_size=16,
                                  concurrency=concurrency, num_cpus=1,
                                  batch_format="pyarrow")
    return hamming_pairs(hashed, "afp", max_hamming, bands=bands)
