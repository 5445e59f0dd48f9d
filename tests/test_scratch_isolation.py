"""Process isolation of the scratch root (VERDICT r7 "What's wrong" #1).

The failure mode this pins: two engine processes sharing one machine
(pytest + an oracle sweep) raced on the fixed ``.scratch/stream_foreach_sink``
sink/checkpoint dirs — one crashed, the other produced a silently WRONG
digest (2038 vs 1981 rows). After the fix the scratch root itself carries a
pid+start-time token, so every ``scratch_dir()`` caller is isolated by
construction. The concurrency test here actually runs TWO engine processes
executing the stateful foreachBatch op at the same time and requires BOTH
to produce the exact oracle answer.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
from datapipelines_python_spark.session import get_spark
from datapipelines_python_spark.streaming.ops import stream_foreach_sink
spark = get_spark(app_name="scratch-iso-{tag}", shuffle_partitions=4)
n = stream_foreach_sink(spark, {sf!r}).count()
print("ROWS=%d" % n)
spark.stop()
"""


def test_scratch_root_is_per_process():
    from datapipelines_python_spark.operators import scans

    assert f"p{os.getpid()}_" in os.path.basename(scans._SCRATCH)
    assert scans._SCRATCH.startswith(scans._SCRATCH_BASE)


def test_stale_scratch_sweep_removes_dead_pid_dirs(tmp_path):
    from datapipelines_python_spark.operators import scans

    # a pid that is certainly dead: spawn-and-wait a trivial child
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    stale = os.path.join(scans._SCRATCH_BASE, f"proc_p{dead.pid}_t0")
    live = scans._SCRATCH
    os.makedirs(stale, exist_ok=True)
    os.makedirs(live, exist_ok=True)
    scans._sweep_stale_scratch()
    assert not os.path.exists(stale), "dead-pid scratch root must be GC'd"
    assert os.path.exists(live), "own scratch root must survive the sweep"


def test_two_processes_run_foreach_sink_concurrently():
    """Both concurrent engine processes must return the EXACT oracle count —
    under the old shared-root design one died on a half-deleted checkpoint
    and the other silently double-counted appended batches."""
    expected = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=REPO, sf=SF, tag=i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        assert f"ROWS={expected}" in out, f"wrong rows: {out!r}\n{err[-2000:]}"
