"""Probe: does Mosaic lower an int4 MXU contraction on this chip?

v5e runs int4 matmuls at 2x the int8 rate; the screening sweep's +-1
descriptors fit int4 exactly. This probe checks (a) compilation, (b)
exactness vs an int32 reference, (c) rate vs the same shape in int8.

The shape mimics one screening grid step per iteration: [256, 192] queries
x [192, 2048] slide block, looped over a grid so the timing is MXU-bound
rather than dominated by this rig's ~45 ms dispatch floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python3 tools/probe_int4.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slideo_tpu.utils.compile_cache import enable_compilation_cache

M, K, N = 256, 192, 2048
STEPS = 512  # grid steps per call: 512 * 256x192x2048 = 51.5 GMAC


def _kernel(q_ref, d_ref, out_ref, acc, *, dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        q_ref[:].astype(dtype), d_ref[:].astype(dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def make(dtype, store_dtype):
    f = pl.pallas_call(
        partial(_kernel, dtype=dtype),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.int32)],
    )
    return jax.jit(lambda a, b: f(a.astype(store_dtype), b.astype(store_dtype)))


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    qs = [
        jnp.asarray(rng.choice([-1, 1], size=(STEPS, M, K)).astype(np.int8))
        for _ in range(3)
    ]
    ds = [
        jnp.asarray(rng.choice([-1, 1], size=(STEPS, K, N)).astype(np.int8))
        for _ in range(3)
    ]
    want = sum(
        np.asarray(qs[0][i], np.int32) @ np.asarray(ds[0][i], np.int32)
        for i in range(STEPS)
    )

    for dt, name in ((jnp.int8, "int8"), (jnp.int4, "int4")):
        try:
            jf = make(dt, dt)
            t0 = time.time()
            got = np.asarray(jf(qs[0], ds[0]))
            comp = time.time() - t0
            exact = np.array_equal(got, want)
            ts = []
            for i in (1, 2, 1, 2):
                t0 = time.time()
                np.asarray(jf(qs[i], ds[i]))
                ts.append(time.time() - t0)
            best = min(ts)
            gmacs = STEPS * M * K * N / 1e9
            print(f"{name}: exact={exact} first_call {comp:.1f}s "
                  f"steady {best*1000:.1f} ms = {gmacs/best:.0f} GMAC/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
