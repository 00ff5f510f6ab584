"""Object-store/spill evidence run (VERDICT r2 item 10).

Streams a multi-million-page fixture through the flagship pipeline and
reports peak object-store usage + spill counters from Ray's memory
summary, so BASELINE.md can document spill behavior at soak scale.

Usage: python scripts/soak_spill.py [n_pages] [num_cpus] [store_gb]

The optional ``store_gb`` caps the object store far below the working
set, to demonstrate the OTHER half of the spill story: the run must
COMPLETE (with spill lines) under a constrained store, not only stay
spill-free under the default one.
"""

import json
import sys
import time


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    store_gb = float(sys.argv[3]) if len(sys.argv) > 3 else None

    import ray
    if not ray.is_initialized():
        kw = {}
        if store_gb:
            kw["object_store_memory"] = int(store_gb * (1 << 30))
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR", **kw)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from bench import flagship_stats

    t0 = time.time()
    stats = flagship_stats("/root/testdata/sf0.1", n_pages=n_pages)
    stats["wall_s"] = round(stats["wall_s"], 1)
    wall = time.time() - t0

    # grpc (and thus ray's memory_summary RPC) is absent in this sandbox;
    # spill/object-store evidence comes from the session's raylet logs
    # ("Spilled N MiB, M objects" heartbeat lines) + the object-store
    # config line.
    import glob
    import os
    import re
    sess = os.path.realpath("/tmp/ray/session_latest")
    spill_lines = []
    store_mb = None
    for path in glob.glob(os.path.join(sess, "logs", "raylet*.out")):
        for ln in open(path, errors="ignore"):
            if "Spilled" in ln or "Restored" in ln:
                m = re.search(r"(Spilled|Restored).*", ln)
                if m:
                    spill_lines.append(m.group(0).strip()[:160])
            elif "Object store current usage" in ln:
                spill_lines.append(ln.strip()[-120:])
            elif store_mb is None and "object_store_memory" in ln.lower():
                store_mb = ln.strip()[-120:]
    spill_lines = spill_lines[-8:] or ["no spill lines in raylet logs "
                                       "(run fit in the object store)"]
    if store_mb:
        spill_lines.append(store_mb)
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
