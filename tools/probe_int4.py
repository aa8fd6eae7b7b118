"""Probe: does Mosaic lower an int4 MXU contraction on this chip?

v5e runs int4 matmuls at 2x the int8 rate; the screening sweep's +-1
descriptors fit int4 exactly. This probe checks (a) compilation, (b)
exactness vs an int32 reference, (c) rate vs the same shape in int8.

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


def _kernel(q_ref, d_ref, out_ref, *, dtype):
    out_ref[:] = jax.lax.dot_general(
        q_ref[:].astype(dtype), d_ref[:].astype(dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def run(dtype, q, d):
    m, k = q.shape
    _, n = d.shape
    f = pl.pallas_call(
        partial(_kernel, dtype=dtype),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
    )
    return jax.jit(lambda a, b: f(a, b))(q, d)


def main():
    rng = np.random.RandomState(0)
    m, k, n = 256, 192, 2048
    qs = [rng.choice([-1, 1], size=(m, k)).astype(np.int8) for _ in range(4)]
    ds = [rng.choice([-1, 1], size=(k, n)).astype(np.int8) for _ in range(4)]
    want = np.asarray(qs[0], np.int32) @ np.asarray(ds[0], np.int32)

    for dt, name in ((jnp.int8, "int8"), (jnp.int4, "int4")):
        try:
            outs = []
            t0 = time.time()
            got = np.asarray(run(dt, jnp.asarray(qs[0], dt),
                                 jnp.asarray(ds[0], dt)))
            comp = time.time() - t0
            exact = np.array_equal(got, want)
            # rate: loop grid over a bigger problem
            ts = []
            for i in range(1, 4):
                t0 = time.time()
                np.asarray(run(dt, jnp.asarray(qs[i], dt),
                               jnp.asarray(ds[i], dt)))
                ts.append(time.time() - t0)
            print(f"{name}: exact={exact} compile {comp:.1f}s "
                  f"call {min(ts)*1000:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
