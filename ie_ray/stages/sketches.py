"""Mergeable cardinality sketches: HyperLogLog approximate distinct.

Exact ``distinct_count`` (relational.py) moves one row per distinct
(group, value) pair through an exchange — at 10^12 events with 10^9
distinct users that exchange is the job.  The HLL sketch replaces it
with a CONSTANT 2^p-byte register array per (block × group): registers
merge by elementwise max (associative + commutative, the same contract
the combine-style aggregates in this repo exploit), so the wide step
moves blocks × groups × 2^p bytes — independent of row count and of
cardinality.

Estimator: standard HLL (Flajolet et al. 2007) with the linear-counting
small-range correction; 64-bit splitmix hashing means no large-range
correction is needed.  Relative error ≈ 1.04/sqrt(2^p) (±0.8 % at
p=14); the pytest gate pins ±3 % on planted cardinalities.

Deterministic: the hash is fixed, so the same input always yields the
same estimate (safe for the driver's repeated-run comparisons).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(keys: np.ndarray) -> np.ndarray:
    x = keys.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _registers(keys: np.ndarray, p: int) -> np.ndarray:
    """2^p max-rank registers for a key batch."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(keys):
        return regs
    h = _hash64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of the remaining bits + 1, via the classic
    # binary clz (6 vectorized compare/shift rounds)
    rank = np.ones(len(h), dtype=np.uint8)
    probe = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = probe < (np.uint64(1) << np.uint64(64 - shift))
        rank = np.where(mask, rank + np.uint8(shift), rank)
        probe = np.where(mask, probe << np.uint64(shift), probe)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    est = (0.7213 / (1 + 1.079 / m)) * m * m \
        / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return est


def hll_distinct(ds, value_col: str, group_col: str = None, p: int = 14):
    """Approximate count(DISTINCT value) [GROUP BY group].

    Values must be integer-castable (hash strings upstream — the
    md5-prefix idiom).  Returns a Dataset: ``(group, approx_distinct)``
    or a single-row ``(approx_distinct)``.
    """
    m = 1 << p

    if group_col is None:
        def partial(t: pa.Table) -> pa.Table:
            keys = t.column(value_col).to_numpy().astype(np.int64)
            return pa.table({"regs": pa.array(
                [_registers(keys, p).tobytes()], type=pa.binary())})

        merged = np.zeros(m, dtype=np.uint8)
        # one constant-size row per block — driver reduce is O(blocks×2^p)
        import ray.data
        for row in ds.map_batches(partial,
                                  batch_format="pyarrow").take_all():
            np.maximum(merged, np.frombuffer(row["regs"], dtype=np.uint8),
                       out=merged)
        return ray.data.from_arrow(pa.table(
            {"approx_distinct": pa.array([int(round(_estimate(merged)))],
                                         type=pa.int64())}))

    def partial_grouped(t: pa.Table) -> pa.Table:
        groups, regs = [], []
        tbl = t.select([group_col, value_col])
        keys_all = tbl.column(value_col).to_numpy().astype(np.int64)
        gvals = tbl.column(group_col).to_pylist()
        by: dict = {}
        for g, k in zip(gvals, keys_all):
            by.setdefault(g, []).append(k)
        for g in sorted(by):
            groups.append(g)
            regs.append(_registers(np.asarray(by[g], dtype=np.int64),
                                   p).tobytes())
        return pa.table({group_col: pa.array(groups),
                         "regs": pa.array(regs, type=pa.binary())})

    def finish(g: pa.Table) -> pa.Table:
        merged = np.zeros(m, dtype=np.uint8)
        for b in g.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(b, dtype=np.uint8),
                       out=merged)
        return pa.table({
            group_col: g.slice(0, 1).column(group_col),
            "approx_distinct": pa.array([int(round(_estimate(merged)))],
                                        type=pa.int64()),
        })

    return (ds.map_batches(partial_grouped, batch_format="pyarrow")
            .groupby(group_col).map_groups(finish, batch_format="pyarrow"))
