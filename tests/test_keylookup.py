"""KeyLookup: sparse-key-safe broadcast dimension decoration.

VERDICT r4 what's-wrong #3: the TPC-H decorations sized dense arrays by
``max(key)`` — correct for dense surrogate keys, an OOM on a sparse
64-bit key space.  KeyLookup switches to a hash probe (``pc.index_in``)
when ``max(key)`` outgrows the table size.
"""
import numpy as np

from ie_ray.stages.relational import KeyLookup


def test_dense_path_gather():
    kl = KeyLookup([1, 2, 3], [10, 20, 30], default=-1)
    assert kl._dense is not None
    assert kl.take([3, 1, 99, 0]).tolist() == [30, 10, -1, -1]


def test_bool_flags_default_false():
    kl = KeyLookup([2, 5], [True, True], default=False)
    out = kl.take([2, 3, 5, 1000])
    assert out.tolist() == [True, False, True, False]


def test_sparse_64bit_keys_no_dense_allocation():
    # 2^40-sparse surrogate keys: the dense path would allocate ~1 TB;
    # the hash path must engage and still answer exactly.
    keys = np.array([2**40, 2**40 + 7, 2**39 + 3], dtype=np.int64)
    kl = KeyLookup(keys, np.array(["a", "b", "c"], dtype=object),
                   default="")
    assert kl._dense is None
    out = kl.take([2**40 + 7, 123, 2**39 + 3, 2**40])
    assert out.tolist() == ["b", "", "c", "a"]


def test_negative_probe_on_dense_path_is_default():
    # key 0 holds a real value; a negative probe must NOT clip onto it
    kl = KeyLookup([0, 1, 2], [10, 20, 30], default=-1)
    assert kl._dense is not None
    assert kl.take([-1, 0, -2**40, 2]).tolist() == [-1, 10, -1, 30]


def test_negative_keys_use_hash_path():
    kl = KeyLookup([-5, 3], [1.0, 2.0], default=0.0)
    assert kl._dense is None
    assert kl.take([-5, 3, 7]).tolist() == [1.0, 2.0, 0.0]


def test_empty_build_side():
    kl = KeyLookup([], [], default=False)
    assert not kl.take([1, 2]).any()


def test_density_cap_boundary():
    # max+2 just over 8*n (and over the 1024 floor) → hash path
    n = 200
    keys = np.arange(n) * 9
    kl = KeyLookup(keys, keys * 2, default=-1)
    assert kl._dense is None
    assert kl.take([9, 18, 5]).tolist() == [18, 36, -1]
    # dense int keys stay on the gather path
    kl2 = KeyLookup(np.arange(n), np.arange(n) * 2, default=-1)
    assert kl2._dense is not None
