"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf, run the matching oracle_sql() through DuckDB on the
same parquet tables, compare row-count + schema + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # astype(str) utf-8-DECODES bytes (pandas ensure_string_array)
            # and crashes on binary payload columns (PPM thumbnails,
            # WARC html) — canonicalize bytes as hex instead
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                else str(v))
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(4)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                    % (t, sf_dir, t))

    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print("%-24s ERROR running query: %r" % (name, e))
            failures.append(name)
            continue
        if name not in oracles:
            print("%-24s rows-only: %d rows, cols=%s" %
                  (name, len(mine), list(mine.columns)))
            continue
        try:
            gold = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print("%-24s ERROR oracle: %r" % (name, e))
            failures.append(name)
            continue
        if list(mine.columns) != list(gold.columns):
            print("%-24s SCHEMA MISMATCH mine=%s gold=%s" %
                  (name, list(mine.columns), list(gold.columns)))
            failures.append(name)
        elif len(mine) != len(gold):
            print("%-24s ROWCOUNT MISMATCH mine=%d gold=%d" %
                  (name, len(mine), len(gold)))
            failures.append(name)
        elif not mine.equals(gold):
            neq = (mine != gold).any(axis=1)
            print("%-24s VALUE MISMATCH (%d rows differ)" % (name, neq.sum()))
            print("  mine:", mine[neq].head(3).to_dict("records"))
            print("  gold:", gold[neq].head(3).to_dict("records"))
            failures.append(name)
        else:
            print("%-24s OK (%d rows)" % (name, len(mine)))
    print("\n%d failures: %s" % (len(failures), failures))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
