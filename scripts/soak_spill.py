"""Object-store/spill evidence run (VERDICT r2 item 10).

Streams a multi-million-page fixture through the flagship pipeline and
reports peak object-store usage + spill counters from Ray's memory
summary, so BASELINE.md can document spill behavior at soak scale.

Usage: python scripts/soak_spill.py [n_pages] [num_cpus]
"""

import json
import sys
import time


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from bench import flagship_stats

    t0 = time.time()
    stats = flagship_stats("/root/testdata/sf0.1", n_pages=n_pages)
    stats["wall_s"] = round(stats["wall_s"], 1)
    wall = time.time() - t0

    from ray._private.internal_api import memory_summary
    summary = memory_summary(stats_only=True)
    spill_lines = [ln.strip() for ln in summary.splitlines()
                   if "pill" in ln or "Plasma" in ln or "usage" in ln]
    out = {
        "n_pages": n_pages,
        "num_cpus": cpus,
        "wall_s": round(wall, 1),
        "docs_per_s": round(n_pages / wall, 1),
        "stats": stats,
        "object_store": spill_lines,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
