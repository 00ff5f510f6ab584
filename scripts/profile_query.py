"""Profile one queries() entry: wall time, row count, per-stage stats.

Usage: python scripts/profile_query.py <query_name> [sf_dir] [num_cpus]

Prints Ray Data's per-operator breakdown (``ds.stats()``) so a slow
pipeline can be attributed to its stage — read it before optimizing
anything (the bench numbers alone don't say WHERE the time went).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    qs = entry.queries()
    t0 = time.time()
    ds = qs[name](sf_dir)
    n = 0
    stats = None
    if hasattr(ds, "iter_batches"):
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
        stats = ds.stats()
    else:
        n = len(ds)
    wall = time.time() - t0
    print("== %s  %.2fs  %d rows  (sf_dir=%s, cpus=%d)" %
          (name, wall, n, sf_dir, cpus))
    if stats:
        print(stats)
    ray.shutdown()


if __name__ == "__main__":
    main()
