"""Probe 2: which device layouts fetch slowly over the axon tunnel.

probe_fetch.py found desc_bits (500,2048,32) u8 at 0.2 MB/s vs u8
(500,259,461) at 16 MB/s; the reshape+thread fix then made the real build's
fetch SLOWER (79 -> 175 s). This measures every candidate shape/dtype
back-to-back in one process to separate layout effects from rig variance.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.ops import hamming
from slideo_tpu.utils.compile_cache import enable_compilation_cache


def t(name, arr):
    arr = jax.block_until_ready(arr)
    t0 = time.time()
    h = np.asarray(arr)
    dt = time.time() - t0
    print(f"{name:38s} {h.nbytes/1e6:7.1f} MB  {dt:7.2f} s  {h.nbytes/1e6/dt:7.1f} MB/s",
          flush=True)
    return h


def main():
    enable_compilation_cache()
    s, k = 500, 2048
    rng = np.random.RandomState(0)
    desc = jnp.asarray(rng.randint(0, 2, (s, k, 256)).astype(np.int8))
    valid = jnp.asarray(rng.rand(s, k) < 0.9)
    packed, vbits = jax.jit(hamming.pack_descriptor_bits, static_argnums=(2, 3))(
        desc, valid, s, k
    )
    smalls = jnp.asarray(rng.rand(s, 259, 461).astype(np.float32) * 255)
    smalls16 = jax.jit(lambda a: a.astype(jnp.float16))(smalls)
    pts = jnp.asarray(rng.rand(s, k, 2).astype(np.float32) * 1000)

    # control: fresh u8 of the reshaped shape, made on device from scratch
    ctrl = jax.jit(lambda a: (a * 255).astype(jnp.uint8))(
        jnp.asarray(rng.rand(s, k * 32).astype(np.float32))
    )

    t("ctrl u8 (500,65536) fresh", ctrl)
    t("packed u8 (500,2048,32) direct", packed)
    t("packed u8 reshaped (500,65536)", jax.jit(lambda p: p.reshape(s, k * 32))(packed))
    t("packed i32 bitcast (500,2048,8)", jax.jit(
        lambda p: jax.lax.bitcast_convert_type(p.reshape(s, k, 8, 4), jnp.int32))(packed))
    t("packed u8 reshape (1024000,32)->pad?", jax.jit(
        lambda p: p.reshape(s * k, 32))(packed))
    t("smalls f16 (500,259,461)", smalls16)
    t("smalls u16 bitcast", jax.jit(
        lambda a: jax.lax.bitcast_convert_type(a, jnp.uint16))(smalls16))
    t("pts f32 (500,2048,2) direct", pts)
    t("pts f32 reshaped (500,4096)", jax.jit(lambda p: p.reshape(s, k * 2))(pts))
    t("pts i32 bitcast (500,2048,2)", jax.jit(
        lambda p: jax.lax.bitcast_convert_type(p, jnp.int32))(pts))
    # repeat the control to gauge drift within the run
    t("ctrl u8 again (distinct)", jax.jit(lambda a: a + 1)(ctrl))


if __name__ == "__main__":
    main()
