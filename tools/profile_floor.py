"""Measure the per-batch dispatch + transfer floor on the axon TPU.

Times a trivial reduction over the same [B, H, W] inputs the stage profiles
use, in uint8 and float32, plus a device-resident variant (input produced on
device from a tiny seed) to isolate tunnel transfer from device compute.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

B, H, W, ITERS = 8, 1080, 1920, 3
rng = np.random.RandomState(0)
frames_u8 = rng.randint(0, 255, (B * (ITERS + 1), H, W), dtype=np.uint8)


def time_fn(name, fn, inputs):
    jfn = jax.jit(fn)
    t0 = time.time()
    np.asarray(jfn(inputs[0]))
    tc = time.time() - t0
    times = []
    for i in range(1, ITERS + 1):
        t0 = time.time()
        np.asarray(jfn(inputs[i]))
        times.append(time.time() - t0)
    print(f"{name:28s} {min(times)*1000:8.1f} ms/batch  (compile {tc:.1f}s)",
          flush=True)


batches_u8 = [jnp.asarray(frames_u8[i * B : (i + 1) * B]) for i in range(ITERS + 1)]
# materialize on device first? jnp.asarray is lazy-ish; block:
batches_u8 = [jax.block_until_ready(b) for b in batches_u8]
time_fn("sum(resident u8)", lambda x: jnp.sum(x, dtype=jnp.int32), batches_u8)

time_fn(
    "sum(host u8 -> device)",
    lambda x: jnp.sum(x, dtype=jnp.int32),
    [frames_u8[i * B : (i + 1) * B] for i in range(ITERS + 1)],
)
time_fn(
    "sum(host f32 -> device)",
    lambda x: jnp.sum(x),
    [frames_u8[i * B : (i + 1) * B].astype(np.float32) for i in range(ITERS + 1)],
)

# Device-generated input: isolates pure device compute.
from slideo_tpu.ops import features as F
from slideo_tpu.config import DEFAULT_CONFIG

cfg = DEFAULT_CONFIG.orb


def pyr(seed):
    x = jax.random.uniform(jax.random.key(seed), (B, H, W)) * 255.0

    def one(img):
        return jnp.sum(F.build_pyramid(img, cfg))

    return jax.lax.map(one, x)


time_fn("pyramid(device-gen input)", pyr, list(np.arange(ITERS + 1, dtype=np.int32)))


def pyr_sum_only(seed):
    x = jax.random.uniform(jax.random.key(seed), (B, H, W)) * 255.0
    return jnp.sum(x, axis=(1, 2))


time_fn("gen+sum (no pyramid)", pyr_sum_only, list(np.arange(ITERS + 1, dtype=np.int32)))
