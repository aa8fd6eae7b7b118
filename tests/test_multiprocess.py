"""Multi-process (multi-host) path: the REAL jax.distributed branch.

Everything multi-host in this framework funnels through three pieces
(SURVEY.md §5.8): ``initialize_distributed`` (cluster setup),
``host_frame_shard`` (which sampled frames a host decodes), and
``gather_host_matchings`` (the all-gather of per-host result records,
parallel/mesh.py:100-128) — plus the process-0-only DB write guard in
``pipeline.sync``. Single-process tests cover the pc=1 short-circuits;
this test launches TWO actual jax.distributed-initialized CPU processes
(localhost coordinator) so the ``multihost_utils.process_allgather``
branch executes for real: each process holds a different row shard,
both must come back with the identical merged timeline, and only
process 0 may write the DB.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = r"""
import json, os, sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert jax.process_index() == pid

from slideo_tpu.parallel.mesh import gather_host_matchings, host_frame_shard

frames = list(range(0, 1500, 150))  # 10 sampled frame indices
my = host_frame_shard(frames)
# Distinct per-host shard sizes would also be fine; host_frame_shard gives
# contiguous blocks: [0..4] to process 0, [5..9] to process 1.
rows = [(i, i * 5000 // 150, i // 450) for i in my]
merged = gather_host_matchings(rows)

# Only process 0 owns the cache write (mirrors pipeline.sync's
# jax.process_index() == 0 guard around finalize_video_matchings).
if jax.process_index() == 0:
    from slideo_tpu.app.db import Db

    db = Db(os.path.join(outdir, "multihost.db"))
    db.create_or_reset_video("v" * 64, ["p" * 64])
    db.finalize_video_matchings(
        "v" * 64, [(ms, "p" * 64, pg) for _, ms, pg in merged]
    )

with open(os.path.join(outdir, f"merged-{pid}.json"), "w") as f:
    json.dump(merged, f)
"""


def test_two_process_gather_and_primary_write(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
    # One CPU device per worker process — the parent conftest's 8-device
    # XLA flag must not leak in (each process is one "host").
    env["XLA_FLAGS"] = ""
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)

    merged = []
    for pid in (0, 1):
        with open(tmp_path / f"merged-{pid}.json") as f:
            merged.append([tuple(r) for r in json.load(f)])
    # Both hosts return the identical merged timeline = the union of shards.
    assert merged[0] == merged[1]
    expected = [(i, i * 5000 // 150, i // 450) for i in range(0, 1500, 150)]
    assert sorted(merged[0]) == sorted(expected)

    # Only process 0 wrote the DB, and it holds the full merged timeline.
    from slideo_tpu.app.db import Db

    db = Db(tmp_path / "multihost.db")
    rows = db.conn.execute(
        "SELECT video_ms, page FROM videos_mapping ORDER BY video_ms"
    ).fetchall()
    assert len(rows) == len(expected)
    assert rows[0] == (0, 0)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
