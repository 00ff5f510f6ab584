"""`python -m ie_ray run` — the ray-job-submit surface (north_rule).

Runs the full flagship (pages → triples → canonical graph parquet +
manifests) in a subprocess with its own Ray session, then checks the
one-line JSON summary and the written partitions."""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run_end_to_end(tmp_path):
    out = str(tmp_path / "kg")
    proc = subprocess.run(
        [sys.executable, "-m", "ie_ray", "run",
         "--n-pages", "60", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res.get("nodes", 0) > 0 and res.get("edges", 0) > 0
    assert res.get("wall_s", 0) > 0
    assert res.get("node_partitions", 0) >= 1
    # graph parquet partitions + lineage manifests landed
    found_parquet = found_manifest = False
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                found_parquet = True
            if "manifest" in f.lower() or f.endswith(".json"):
                found_manifest = True
    assert found_parquet, "no parquet written under --out"
    assert found_manifest, "no manifest written under --out"
