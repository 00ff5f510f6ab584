"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode kernels (image/audio/video) are STUBS — the codec libraries are
not in this environment — but the Ray-side plumbing is real and tested:
schema contract, small-batch actor-pool stages, deterministic fake features
for pipeline testing, and the output layout a real decoder would fill in.

Swap ``_decode_stub`` for a PIL/ffmpeg call in ``MediaDecodeActor.__init__``
on a real cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib

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


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake feature vector (16-d) derived from the payload.

    A real deployment replaces this with actual decode + model features;
    raising NotImplementedError here would be correct too, but a
    deterministic fake keeps the downstream plumbing testable.
    """
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32)
            / 255.0)


class MediaDecodeActor:
    """Actor-pool stage: decode + featurize media payloads.

    Use SMALL batch sizes (payloads are large): ``map_batches(
    MediaDecodeActor, batch_size=16, concurrency=(1, N), num_cpus=1)``.
    """

    def __init__(self):
        # real impl: load codec / model weights here, once per actor
        self.decode = _decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode(p, k).tolist()
                 for p, k in zip(batch.column("payload").to_pylist(),
                                 batch.column("kind").to_pylist())]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "features": pa.array(feats, type=pa.list_(pa.float32())),
            "n_bytes": pa.array(
                [len(p) for p in batch.column("payload").to_pylist()],
                type=pa.int64()),
        })


def synthesize_media(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": []}
    for i in range(n):
        k = kinds[i % 3]
        payload = rng.bytes(256 + (i % 7) * 128)
        rows["media_id"].append(i)
        rows["kind"].append(k)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[k])
        rows["width"].append(-1)
        rows["height"].append(-1)
    return pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "kind": pa.array(rows["kind"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "mime": pa.array(rows["mime"], type=pa.string()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
    })
