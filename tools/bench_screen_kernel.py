"""Microbench: stage-1 screening kernel (int8 transposed, max-only).

8 kernel calls per dispatch on distinct query sets — amortizes the ~35 ms
dispatch floor so the per-call time is trustworthy (±2%).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python3 tools/bench_screen_kernel.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.ops.pallas_table import match_table_scores_pallas

S, K, D, Q = 500, 512, 128, 256
REPS, ITERS = 128, 3
rng = np.random.RandomState(0)
desc_t = jnp.asarray(
    rng.choice([-1, 1], (S, D, K)).astype(np.int8)
)
bias = jnp.zeros((S * K,), jnp.float32)
qsets = [
    jnp.asarray(rng.choice([-1, 1], (REPS, Q, D)).astype(np.int8))
    for _ in range(ITERS + 1)
]


@jax.jit
def run(qs, dt, bi):
    # dt/bi are jit ARGUMENTS — closing over device arrays embeds them as
    # executable constants (hangs/re-uploads on the remote runtime).
    def one(q):
        best, _ = match_table_scores_pallas(
            q, dt, bi, S, K, with_arg=False, dtype=jnp.int8,
            transposed=True,
        )
        return best.sum()
    return jax.lax.map(one, qs)


ref = np.asarray(run(qsets[0], desc_t, bias))
times = []
for i in range(1, ITERS + 1):
    t0 = time.time()
    np.asarray(run(qsets[i], desc_t, bias))
    times.append(time.time() - t0)
print(f"screen kernel [Q{Q} x D{D}] vs [{S} x {K}]: "
      f"{min(times)/REPS*1000:7.3f} ms/call  check={ref[0]:.0f}", flush=True)
