"""Online exact-dedup via a sharded hash-index actor pool.

This mirrors the reference's dedup semantics directly: an INDEX probed per
article (hash cache + S3 listing, ``aws/__init__.py:115-136``; T10/A5 in
SURVEY.md) rather than a batch groupby.  N index actors each own a slice of
the hash space and hold a set of seen hashes; the map stage splits each
batch's hashes by shard, asks all owners concurrently, and keeps only rows
whose hash is new.

Scale notes (100 TB): membership state shards linearly with the actor count
(place them across nodes); at 10^12 pages a production deployment swaps the
in-memory set for a Bloom filter or RocksDB per shard — the interface stays
the same.  First-seen wins, so WHICH of two identical pages survives depends
on arrival order; content (and therefore all downstream semantics except the
surviving url) is deterministic.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa


def _make_shard_cls():
    import ray

    # num_cpus=0: a shard is a memory service doing set lookups — reserving
    # CPU for it only creates scheduling deadlocks on small clusters.  On a
    # real cluster spread shards with scheduling strategies, not CPU slots.
    @ray.remote(num_cpus=0)
    class DedupShard:
        """hash → owning url.  Keeping the OWNER (not just membership) makes
        the filter idempotent: re-executions of the same lazy plan (Ray
        Datasets re-run their lineage per consumption) keep exactly the same
        winning rows instead of dropping everything as 'already seen'."""

        def __init__(self):
            self.owner = {}

        def check_and_add(self, keys: List[str], owners: List[str]) -> List[bool]:
            out = []
            table = self.owner
            for k, o in zip(keys, owners):
                out.append(table.setdefault(k, o) == o)
            return out

        def size(self) -> int:
            return len(self.owner)

    return DedupShard


def create_dedup_index(num_shards: int = 8):
    """Spawn the shard actors; returns their handles (pass to DedupFilter)."""
    cls = _make_shard_cls()
    return [cls.remote() for _ in range(num_shards)]


class DedupFilter:
    """map_batches callable: keep the owning row per ``key_col`` value."""

    def __init__(self, shards, key_col: str = "page_hash",
                 owner_col: str = "url"):
        self.shards = shards
        self.key_col = key_col
        self.owner_col = owner_col
        self.n = len(shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        keys = batch.column(self.key_col).to_pylist()
        owners = batch.column(self.owner_col).to_pylist()
        by_shard: dict = {}
        for i, (k, o) in enumerate(zip(keys, owners)):
            by_shard.setdefault(int(k[:4], 16) % self.n, []).append((i, k, o))
        futures, order = [], []
        for s, triples_ in by_shard.items():
            futures.append(self.shards[s].check_and_add.remote(
                [k for _, k, _ in triples_], [o for _, _, o in triples_]))
            order.append([i for i, _, _ in triples_])
        keep = [False] * len(keys)
        for fresh, idxs in zip(ray.get(futures), order):
            for f, i in zip(fresh, idxs):
                keep[i] = f
        return batch.filter(pa.array(keep))
