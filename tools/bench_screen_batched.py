"""Hardware smoke + timing for the batched full-K screening sweep.

Validates hamming.screen_slides_batched on the TPU against its own
interpret-mode execution (same code path, Mosaic vs interpreter) and times
the sweep at bench scale.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python3 tools/bench_screen_batched.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import hamming

S, K, B, QS = 500, 2048, 64, 256
rng = np.random.RandomState(0)
mcfg = DEFAULT_CONFIG.match

desc = rng.choice(np.array([-1, 1], np.int8), size=(S, K, 256))
valid = rng.rand(S, K) > 0.03
desc = np.where(valid[..., None], desc, 0).astype(np.int8)

t0 = time.time()
index = jax.jit(hamming.build_index)(jnp.asarray(desc), jnp.asarray(valid))
jax.block_until_ready(index.screen_desc)
print(f"index (incl. screen_desc) built in {time.time()-t0:.1f}s; "
      f"screen_desc {index.screen_desc.shape} on {jax.devices()[0]}",
      flush=True)

qsets = [
    jnp.asarray(rng.choice(np.array([-1, 1], np.int8), size=(B, QS, 256)))
    for _ in range(4)
]

jf = jax.jit(lambda q, di: hamming.screen_slides_batched(
    q, di, S, K, mcfg, interpret=False))
t0 = time.time()
got = np.asarray(jf(qsets[0], index))
print(f"compile+first {time.time()-t0:.1f}s", flush=True)

# hardware-vs-interpret parity on a small slice (interpret on CPU arrays)
small = 4
with jax.default_device(jax.devices("cpu")[0]):
    idx_cpu = jax.device_put(jax.tree.map(np.asarray, index))
    want = np.asarray(hamming.screen_slides_batched(
        jnp.asarray(np.asarray(qsets[0])[:small]), idx_cpu, S, K, mcfg,
        interpret=True))
agree = all(set(got[i].tolist()) == set(want[i].tolist()) for i in range(small))
print(f"hardware-vs-interpret candidate sets agree: {agree}", flush=True)

times = []
for i in range(1, 4):
    t0 = time.time()
    np.asarray(jf(qsets[i], index))
    times.append(time.time() - t0)
print(f"batched screening sweep B={B}: {min(times)*1000:.1f} ms "
      f"({min(times)*1000/B:.3f} ms/frame)", flush=True)
