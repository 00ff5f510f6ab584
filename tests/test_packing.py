"""pack_sequences: distributed prefix sum vs a NumPy twin."""
import numpy as np
import pyarrow as pa
import pytest


def test_pack_sequences_matches_numpy_twin(ray_session):
    import ray.data
    from ie_ray.stages.packing import pack_sequences
    rng = np.random.RandomState(7)
    n = 1000
    texts = [" ".join(["w"] * int(k)) if k else ""
             for k in rng.randint(0, 50, n)]
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    # small bucket size forces many buckets + cross-bucket bases
    out = pack_sequences(ds, seq_len=64, bucket_size=37).take_all()
    got = {r["doc_id"]: (r["n_tokens"], r["tok_offset"], r["chunk_id"])
           for r in out}
    counts = np.array([len(t.split()) for t in texts], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    assert len(got) == n
    for i in range(n):
        assert got[i] == (counts[i], offsets[i], offsets[i] // 64), i
