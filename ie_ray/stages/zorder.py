"""Z-order (Morton) clustering for multi-dimensional data layout.

The scale problem: partitioned Parquet pruned by ONE key (day, host,
user-range) serves range queries on that key only; a query filtering on
a second dimension scans everything.  The classic answer (Morton 1966;
the layout behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) is to sort rows
by the bit-interleaving of several keys: any aligned range of the
interleaved key covers a bounded hyper-rectangle of the original keys,
so per-file min/max statistics prune on EVERY interleaved dimension at
once.

Shapes here:

* ``morton2`` / ``morton2_decode`` — vectorized 21-bit × 2 bit
  interleave into int64 via the parallel-prefix spread (the magic-mask
  ladder), and its exact inverse.  Pure numpy, no per-row Python.
* ``cluster_by_zorder`` — append the interleaved key and range-sort
  the Dataset by it (one exchange; downstream ``write_parquet`` then
  lays files out z-clustered, and each file's (x, y) min/max footprint
  is a bounded rectangle instead of a full-width stripe).

The aligned-range theorem this buys (tested): for level m, key range
[q·4^m, (q+1)·4^m) contains exactly one 2^m × 2^m axis-aligned square
of the key grid — which is why file-level min/max prune both columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MASK21 = np.int64((1 << 21) - 1)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value into the even bit
    positions (parallel-prefix magic masks)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_part1by1` (gather the even bits)."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return x


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two non-negative 21-bit int columns into one int64
    key (x takes the even bits, y the odd).  Values are masked to 21
    bits — the caller owns any needed pre-scaling/offsetting."""
    xm = np.asarray(x, dtype=np.int64) & _MASK21
    ym = np.asarray(y, dtype=np.int64) & _MASK21
    z = _part1by1(xm) | (_part1by1(ym) << np.uint64(1))
    return z.astype(np.int64)


def morton2_decode(z: np.ndarray) -> tuple:
    """Exact inverse of :func:`morton2` on 42-bit keys → (x, y)."""
    zz = np.asarray(z, dtype=np.int64).astype(np.uint64)
    return (_compact1by1(zz).astype(np.int64),
            _compact1by1(zz >> np.uint64(1)).astype(np.int64))


def morton2_sql(x_expr: str, y_expr: str, bits: int = 21) -> str:
    """The identical interleave as portable SQL (bitwise BIGINT ops) —
    lets a DuckDB oracle reproduce the key bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append("((({x} >> {i}) & 1) << {s})".format(
            x=x_expr, i=i, s=2 * i))
        terms.append("((({y} >> {i}) & 1) << {s})".format(
            y=y_expr, i=i, s=2 * i + 1))
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(ds, x_col: str, y_col: str,
                      key_col: str = "zkey"):
    """Append the Morton key of (x_col, y_col) and range-sort by it —
    ONE exchange; a following ``write_parquet`` lays blocks out
    z-clustered so every file's (x, y) min/max footprint is a bounded
    rectangle and readers prune on either column."""

    def add_key(t: pa.Table) -> pa.Table:
        z = morton2(
            t.column(x_col).cast(pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False),
            t.column(y_col).cast(pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False))
        return t.append_column(key_col, pa.array(z, type=pa.int64()))

    return ds.map_batches(add_key, batch_format="pyarrow").sort(key_col)
