"""Transient-failure resilience: a stage whose tasks crash once still
completes with exact output when retry_exceptions is enabled — the
single-node stand-in for the multi-node lost-worker story (Ray retries
the task; Dataset lineage re-materializes the lost block).

Complements tests/test_resume.py, which covers the durable side
(partition manifests + skip-finished-partitions on a driver restart).
"""

import os
import tempfile

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_flaky_stage_retries_to_exact_output():
    import ray.data
    marker_dir = tempfile.mkdtemp(prefix="flaky_")

    def flaky_once(t: pa.Table) -> pa.Table:
        """Fails the FIRST batch each worker process sees, succeeds
        after — the shape of an OOM-killed or preempted worker task."""
        marker = os.path.join(marker_dir, "pid-%d" % os.getpid())
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected transient failure")
        import pyarrow.compute as pc
        return pa.table({"doubled": pc.multiply(t.column("x"), 2)})

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(range(1000), type=pa.int64())})
    ).repartition(4)
    out = ds.map_batches(
        flaky_once, batch_format="pyarrow",
        retry_exceptions=True, max_retries=3,
    ).take_all()
    assert sorted(r["doubled"] for r in out) == [2 * i for i in range(1000)]
    # at least one failure was actually injected (and retried)
    assert len(os.listdir(marker_dir)) >= 1
