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


def heavy_hitters(docs, phi: float = 0.01, k: int = 256,
                  text_col: str = "text"):
    """EXACT frequent words (count ≥ phi × total tokens) WITHOUT a
    vocabulary-wide exchange — the Misra-Gries two-pass recipe
    (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
    Summaries", PODS 2012):

    pass 1: every block reduces its tokens to a k-counter MG summary
    (k rows max, regardless of vocabulary size); summaries merge by
    summing counts and subtracting the (k+1)-th largest (the standard
    mergeable-summary rule), which provably retains every item with
    true count ≥ N/(k+1) — choose k ≥ 1/phi and no true heavy hitter
    can be lost.  The merged candidate set is ≤ k items.

    pass 2: one streaming pass counts the candidates EXACTLY (candidate
    set broadcast in the closure; per-block partial counts, tiny
    groupby), then filters to count ≥ phi × N.

    The exchange volume is O(k × blocks) + O(k) — a 10^9-word
    vocabulary never moves.  Output: (word, n) sorted by (n desc, word).
    Tokenization: single-space split (== string_split oracle contract).
    """
    from collections import Counter

    def mg_summary(t: pa.Table) -> pa.Table:
        counts = Counter()
        total = 0
        for text in t.column(text_col).to_pylist():
            w = text.split(" ")
            total += len(w)
            counts.update(w)
        top = counts.most_common(k + 1)
        # MG reduction: keep k counters, decrement by the (k+1)-th
        cut = top[k][1] if len(top) > k else 0
        rows = [(w, c - cut) for w, c in top[:k] if c - cut > 0]
        rows.append(("\x00total\x00", total))
        return pa.table({
            "word": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64())})

    merged = {}
    total = 0
    for r in (docs.map_batches(mg_summary, batch_format="pyarrow")
              .groupby("word").sum("n").iter_rows()):
        if r["word"] == "\x00total\x00":
            total = r["sum(n)"]
        else:
            merged[r["word"]] = r["sum(n)"]
    # second MG reduction across the merged summaries (≤ k × blocks
    # candidates reached the driver; keep the k largest)
    cand = sorted(merged, key=lambda w: (-merged[w], w))[:k]
    cand_set = set(cand)
    threshold = phi * total

    def exact_counts(t: pa.Table) -> pa.Table:
        counts = Counter()
        for text in t.column(text_col).to_pylist():
            counts.update(w for w in text.split(" ") if w in cand_set)
        keys = sorted(counts)
        return pa.table({
            "word": pa.array(keys, type=pa.string()),
            "n": pa.array([counts[x] for x in keys], type=pa.int64())})

    import pyarrow.compute as pc
    exact = (docs.map_batches(exact_counts, batch_format="pyarrow")
             .groupby("word").sum("n")
             .map_batches(lambda t: t.rename_columns(["word", "n"]),
                          batch_format="pyarrow"))
    out = exact.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"),
                                            pa.scalar(threshold))),
        batch_format="pyarrow")
    return out.sort(["n", "word"], descending=[True, False])


def heavy_hitters_oracle_sql(phi: float = 0.01) -> str:
    """Exact DuckDB equivalent on ``documents``."""
    return (
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word "
        "FROM documents), tot AS (SELECT count(*) AS t FROM tok) "
        "SELECT word, count(*) AS n FROM tok CROSS JOIN tot "
        "GROUP BY word, tot.t HAVING count(*) >= %s * tot.t "
        "ORDER BY n DESC, word" % phi)


# ---------------------------------------------------------------------------
# mergeable quantile digest (t-digest-style equi-weight summary)
# ---------------------------------------------------------------------------

def _compress(vals: np.ndarray, weights: np.ndarray, k: int):
    """Compress sorted weighted points to ≤k equi-weight centroids via
    cumulative-weight interpolation (the merge step of a q-digest /
    t-digest family summary; Dunning & Ertl's t-digest is the public
    reference — this uses the uniform scale function, error O(1/k) in
    rank, which the pytest gate pins)."""
    W = weights.sum()
    if len(vals) <= k:
        return vals, weights
    cum = np.cumsum(weights) - weights / 2.0
    grid = (np.arange(k) + 0.5) * (W / k)
    means = np.interp(grid, cum, vals)
    return means, np.full(k, W / k)


def quantile_digest(ds, value_col: str, group_col: str, qs,
                    k: int = 128):
    """Approximate per-group quantiles with a MERGEABLE fixed-size
    summary — the unbounded-cardinality path where the exact per-group
    sort (events_value_quantiles) or histogram-refinement selection
    (global_quantiles) would need one pass per group.

    Every block reduces each group it contains to ≤k (value, weight)
    centroids; the exchange moves blocks × groups × k × 16 bytes —
    independent of row count — and the per-group merge re-compresses
    once and interpolates the requested quantiles.  Deterministic.
    Returns (group, q_<q> … ) with values rounded to 4 dp.
    """
    qs = sorted(qs)

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(t.select([group_col, value_col]))
        groups, blobs = [], []
        for (g,), sub in df.group_by(group_col, maintain_order=False):
            v = np.sort(sub[value_col].to_numpy().astype(np.float64))
            m, w = _compress(v, np.ones(len(v)), k)
            groups.append(g)
            blobs.append(np.concatenate([m, w]).tobytes())
        order = np.argsort(np.asarray(groups, dtype=object))
        return pa.table({
            group_col: pa.array([groups[i] for i in order]),
            "digest": pa.array([blobs[i] for i in order],
                               type=pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        ms, ws = [], []
        for blob in g.column("digest").to_pylist():
            a = np.frombuffer(blob, dtype=np.float64)
            ms.append(a[:len(a) // 2])
            ws.append(a[len(a) // 2:])
        vals = np.concatenate(ms)
        weights = np.concatenate(ws)
        order = np.argsort(vals, kind="stable")
        vals, weights = vals[order], weights[order]
        vals, weights = _compress(vals, weights, k)
        W = weights.sum()
        cum = (np.cumsum(weights) - weights / 2.0) / W
        cols = {group_col: g.slice(0, 1).column(group_col)}
        for q in qs:
            est = float(np.interp(q, cum, vals))
            cols["q_%g" % q] = pa.array([round(est, 4)],
                                        type=pa.float64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(merge, batch_format="pyarrow"))


def kmv_overlap(ds, value_col: str, group_col: str, k: int = 256):
    """KMV (k-minimum-values, Bar-Yossef et al. 2002) sketches per
    group with SET-INTERSECTION estimation between every group pair —
    the capability HLL lacks: per group keep the k smallest 64-bit
    hashes of the distinct values; sketches merge by union+truncate
    (associative/idempotent), distinct cardinality ≈ (k−1)/t_k on the
    unit-normalized kth minimum, and for a pair the k smallest of the
    UNION form a uniform sample of X∪Y, so |X∩Y|/|X∪Y| ≈ the fraction
    of that sample present in BOTH sketches (Jaccard), and the
    intersection size is J·U.

    Scale shape: each block emits ≤ groups × k hash rows; the bounded
    (group, hash) domain tree-combines (union+truncate per group);
    the final task holds |groups| × k values.  Estimates are
    deterministic (fixed splitmix hash) — accuracy is pytest-gated,
    no SQL oracle (sketch-defined).

    Returns one row per unordered group pair:
    (g1, g2, jaccard_est, union_est, overlap_est) rounded to 4 dp.
    """
    from ie_ray.stages.relational import lowcard_combine

    def partial(t: pa.Table) -> pa.Table:
        keys = _hash64(t.column(value_col).cast(pa.int64())
                       .combine_chunks().to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        return combine(pa.table({
            "g": t.column(group_col),
            "h": pa.array(keys.view(np.int64))}))

    # Hashes are uint64 but ride as int64 bit patterns; "k smallest"
    # must use the UNSIGNED order, so the truncate converts views
    # explicitly everywhere it sorts.

    def combine(t: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(pa.table({
            "g": t.column("g"), "h": t.column("h")})).unique(["g", "h"])
        out = []
        for g_name, sub in df.group_by("g"):
            h = sub.get_column("h").to_numpy().astype(np.int64) \
                .view(np.uint64)
            h = np.sort(h)[:k]
            out.append(pl.DataFrame({
                "g": [g_name[0] if isinstance(g_name, tuple)
                      else g_name] * len(h),
                "h": h.view(np.int64)}))
        return pl.concat(out).to_arrow() if out else \
            pa.table({"g": pa.array([], type=pa.string()),
                      "h": pa.array([], type=pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        t = combine(t)
        groups = sorted(set(t.column("g").to_pylist()))
        sk = {}
        garr = np.asarray(t.column("g").to_pylist(), dtype=object)
        harr = np.asarray(t.column("h"), dtype=np.int64).view(np.uint64)
        for g in groups:
            sk[g] = np.sort(harr[garr == g])[:k]
        rows = []
        denom = float(2 ** 64)
        for i, g1 in enumerate(groups):
            for g2 in groups[i + 1:]:
                a, b = sk[g1], sk[g2]
                full_uni = np.unique(np.concatenate([a, b]))
                uni = full_uni[:k]
                ku = len(uni)
                if ku == 0:
                    continue
                if len(a) < k and len(b) < k:
                    # neither sketch truncated -> both are COMPLETE
                    # sets; the exact answer is free (review finding
                    # r5s4: the (k-1)/t_k estimator is pure noise on
                    # small audiences)
                    u_est = float(len(full_uni))
                    inter_n = len(np.intersect1d(
                        a, b, assume_unique=True))
                    j_est = inter_n / len(full_uni)
                    rows.append((g1, g2, j_est, u_est,
                                 float(inter_n)))
                    continue
                # union cardinality from the kth minimum of the union
                t_k = uni[-1] / denom
                u_est = (ku - 1) / t_k if t_k > 0 else 0.0
                inter = np.intersect1d(uni, a, assume_unique=True)
                inter = np.intersect1d(inter, b, assume_unique=True)
                j_est = len(inter) / ku
                rows.append((g1, g2, j_est, u_est, j_est * u_est))
        return pa.table({
            "g1": pa.array([r[0] for r in rows], type=pa.string()),
            "g2": pa.array([r[1] for r in rows], type=pa.string()),
            "jaccard_est": pa.array(
                [round(r[2], 4) for r in rows], type=pa.float64()),
            "union_est": pa.array(
                [round(r[3], 4) for r in rows], type=pa.float64()),
            "overlap_est": pa.array(
                [round(r[4], 4) for r in rows], type=pa.float64())})

    return lowcard_combine(ds.select_columns([group_col, value_col]),
                           partial, final_fn=final, combine_fn=combine)
