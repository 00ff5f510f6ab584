"""Exact distributed order statistics by iterative range narrowing.

The cent-grid histogram trick (events_value_mad) gives exact medians
only when the value domain is BOUNDED; arbitrary int64 columns
(latencies in µs, byte sizes, ids) need real distributed selection.
The classic answer (the Blum/Floyd–Rivest family adapted to
shared-nothing scans): repeatedly histogram the candidate range into
2¹⁶ equal bins with one counting pass over the data, descend into the
bin containing the target rank, and stop once the range is narrow
enough to pull its members exactly (a bounded collect).  A 64-bit
range needs ≤ 4 passes; each pass is one lowcard tree-combine (2¹⁶
bounded keys), so nothing rows-sized ever shuffles.

Callers selecting from a DERIVED stream should ``materialize()`` it
first — each pass re-scans the input, and re-executing an expensive
lineage 3–4× is the wrong trade (the object store spills if needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BINS = 1 << 16
_COLLECT_MAX = 1 << 18   # pull the survivors once the range is small


def _scalar_pass(ds, partial, combine):
    from ie_ray.stages.relational import lowcard_combine
    return lowcard_combine(ds, partial, final_fn=combine,
                           combine_fn=combine).take_all()


def _count_below(ds, col: str, lo: int) -> int:
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((v < lo).sum())],
                                       type=pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [pc.sum(t.column("n")).as_py() or 0], type=pa.int64())})

    rows = _scalar_pass(ds, partial, combine)
    return int(rows[0]["n"]) if rows else 0


def _histogram(ds, col: str, lo: int, hi: int):
    """Per-bin counts over [lo, hi] (bin -1 = below-range count)."""
    span = hi - lo + 1
    width = max(1, -(-span // _BINS))

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        below = int((v < lo).sum())
        inr = v[(v >= lo) & (v <= hi)]
        b = ((inr - lo) // width).astype(np.int64)
        cnt = np.bincount(b, minlength=1).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "bin": pa.array(np.concatenate([[-1], nz])),
            "n": pa.array(np.concatenate([[below], cnt[nz]]))})

    def combine(t: pa.Table) -> pa.Table:
        return t.group_by("bin").aggregate([("n", "sum")]) \
            .rename_columns(["bin", "n"])

    rows = _scalar_pass(ds, partial, combine)
    counts = {r["bin"]: r["n"] for r in rows}
    below = counts.pop(-1, 0)
    return below, counts, width


def exact_kth_int64(ds, col: str, ks, lo: int = None,
                    hi: int = None) -> dict:
    """Exact values at 0-based ranks ``ks`` (ascending order) of the
    int64 column; multi-pass histogram descent, {k: value}.
    ``lo``/``hi`` bound the search (one min/max pass if omitted)."""
    ks = sorted(set(int(k) for k in ks))
    if lo is None or hi is None:
        def mm(t: pa.Table) -> pa.Table:
            v = t.column(col).cast(pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            if len(v) == 0:
                return pa.table({"lo": pa.array([], type=pa.int64()),
                                 "hi": pa.array([], type=pa.int64())})
            return pa.table({"lo": pa.array([int(v.min())]),
                             "hi": pa.array([int(v.max())])})

        def mmc(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            return pa.table({
                "lo": pa.array([pc.min(t.column("lo")).as_py()],
                               type=pa.int64()),
                "hi": pa.array([pc.max(t.column("hi")).as_py()],
                               type=pa.int64())})

        rows = _scalar_pass(ds, mm, mmc)
        if not rows:
            return {}
        lo, hi = int(rows[0]["lo"]), int(rows[0]["hi"])

    out = {}
    for k in ks:
        klo, khi = lo, hi
        while khi - klo + 1 > _COLLECT_MAX:
            below, counts, width = _histogram(ds, col, klo, khi)
            rank_in = k - below
            run, target = 0, None
            for b in sorted(counts):
                if run + counts[b] > rank_in:
                    target = b
                    break
                run += counts[b]
            if target is None:   # rank at/after max: clamp to top bin
                target = max(counts)
            new_lo = klo + target * width
            khi = min(khi, new_lo + width - 1)
            klo = new_lo

        def collect(t: pa.Table, _lo=klo, _hi=khi) -> pa.Table:
            v = t.column(col).cast(pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            keep = v[(v >= _lo) & (v <= _hi)]
            return pa.table({"v": pa.array(np.sort(keep))})

        def ccomb(t: pa.Table) -> pa.Table:
            return pa.table({"v": pa.array(
                np.sort(np.asarray(t.column("v"), dtype=np.int64)))})

        offset = _count_below(ds, col, klo)
        vals = _scalar_pass(ds, collect, ccomb)
        arr = np.asarray([r["v"] for r in vals], dtype=np.int64)
        out[k] = int(arr[k - offset])
    return out


def exact_quantile_int64(ds, col: str, q: float, n: int = None):
    """Continuous-interpolation quantile (DuckDB quantile_cont /
    median semantics) of an int64 column via :func:`exact_kth_int64`;
    returns float (None on empty input)."""
    if n is None:
        def cp(t: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([t.num_rows],
                                           type=pa.int64())})

        def cc(t: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array(
                [pc.sum(t.column("n")).as_py() or 0],
                type=pa.int64())})

        rows = _scalar_pass(ds, cp, cc)
        n = int(rows[0]["n"]) if rows else 0
    if n == 0:
        return None
    h = (n - 1) * q
    lo_k, hi_k = int(np.floor(h)), int(np.ceil(h))
    got = exact_kth_int64(ds, col, [lo_k, hi_k])
    vlo, vhi = got[lo_k], got[hi_k]
    return vlo + (h - np.floor(h)) * (vhi - vlo)
