"""Bloom-prefiltered membership: "which rows are NEW vs a seen set" at
corpus scale.

The naive anti-join exchanges every probe row.  At continuous-crawl
scale (10^12 seen URLs/hashes, small daily overlap) that all-to-all is
the bottleneck, so the classic fix: build a constant-size Bloom filter
over the seen keys, broadcast it once (``ray.put``), and let every
probe block drop its definite-new rows locally — only the bloom-POSITIVE
rows (true hits + the ~(1-e^{-kn/m})^k false-positive sliver) enter the
exact anti-join exchange.  The result is EXACT: the bloom only
prefilters; membership for positives is decided by the real key join
(``relational.anti_join``).

Scale contract: the filter is O(m) bits regardless of corpus size —
per-block partial blooms are OR-reduced (the reduction moves
blocks × m/8 bytes, never keys); probe-side exchange volume is
O(overlap + FP), not O(corpus).

Keys are int64 (the md5-prefix idiom shared with the dedup stages); the
position mix is splitmix64, fixed so build and probe agree forever.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .relational import anti_join

_M_BITS_DEFAULT = 1 << 20          # 128 KiB — ~0.1% FP at 50k keys, k=4
_K_DEFAULT = 4


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via splitmix64 rounds."""
    x = keys.astype(np.uint64)
    out = np.empty((len(keys), k), dtype=np.uint64)
    golden = np.uint64(0x9E3779B97F4A7C15)
    for i in range(k):
        x = x + golden
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        out[:, i] = z % np.uint64(m_bits)
    return out


def build_bloom(ds, key_col: str, m_bits: int = _M_BITS_DEFAULT,
                k: int = _K_DEFAULT) -> np.ndarray:
    """OR-reduced Bloom filter (packed uint8 array) over ``key_col``."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy().astype(np.int64)
        bits = np.zeros(m_bits, dtype=bool)
        if len(keys):
            bits[_positions(keys, m_bits, k).ravel()] = True
        return pa.table({"bloom": pa.array([np.packbits(bits).tobytes()],
                                           type=pa.binary())})

    packed = np.zeros(m_bits // 8, dtype=np.uint8)
    # one constant-size row per block; the OR-reduce moves blocks × m/8
    # bytes through the driver — independent of key count
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        packed |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return packed


def bloom_new_rows(probe_ds, seen_ds, key_col: str,
                   m_bits: int = _M_BITS_DEFAULT, k: int = _K_DEFAULT):
    """Rows of ``probe_ds`` whose key does NOT occur in ``seen_ds``.

    Exact (the bloom is only a prefilter); bloom-negative rows never
    enter the verify exchange.
    """
    packed = build_bloom(seen_ds, key_col, m_bits, k)
    bloom_ref = ray.put(packed)

    def split(positive: bool):
        def fn(t: pa.Table) -> pa.Table:
            bits = np.unpackbits(ray.get(bloom_ref)).view(bool)
            keys = t.column(key_col).to_numpy().astype(np.int64)
            if not len(keys):
                return t
            pos = bits[_positions(keys, m_bits, k)].all(axis=1)
            return t.filter(pa.array(pos if positive else ~pos))
        return fn

    definite_new = probe_ds.map_batches(split(False),
                                        batch_format="pyarrow")
    candidates = probe_ds.map_batches(split(True), batch_format="pyarrow")
    verified_new = anti_join(candidates, seen_ds, key_col, key_col)
    return definite_new.union(verified_new)
