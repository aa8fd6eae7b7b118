"""Microbench: FAST Pallas kernel band sizes on the atlas shape (TPU).

8 kernel calls per dispatch (amortizes the ~40 ms floor).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.ops.pallas_fast import fast_scores_pallas

H, W = 2916, 1920  # 1080p pyramid atlas
REPS, ITERS = 8, 3
rng = np.random.RandomState(0)
imgs = [
    rng.randint(0, 255, (REPS, H, W)).astype(np.float32) for _ in range(ITERS + 1)
]

for band in (8, 16, 32, 64):
    fn = jax.jit(
        lambda x, b=band: jax.lax.map(
            lambda im: jnp.sum(fast_scores_pallas(im, 20, band=b)), x
        )
    )
    try:
        ref = np.asarray(fn(jnp.asarray(imgs[0])))
        times = []
        for i in range(1, ITERS + 1):
            t0 = time.time()
            np.asarray(fn(jnp.asarray(imgs[i])))
            times.append(time.time() - t0)
        print(f"band={band:3d}  {min(times)/REPS*1000:7.2f} ms/atlas  "
              f"check={ref[0]:.0f}", flush=True)
    except Exception as e:
        print(f"band={band}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
