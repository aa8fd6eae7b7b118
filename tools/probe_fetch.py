"""Probe: device->host fetch cost over the axon tunnel (r5 cold-build work).

The r5 cold-build breakdown shows save_fetch_s ~79 s for ~160 MB of packed
index arrays; this isolates (a) the pack-program jit compile, (b) per-array
download bandwidth, (c) whether concurrent fetch threads overlap on the
tunnel — to decide whether the fix is fewer bytes, parallel fetch, or
overlap-with-build.
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.ops import hamming
from slideo_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    s, k = 500, 2048
    rng = np.random.RandomState(0)
    desc = jnp.asarray(rng.randint(0, 2, (s, k, 256)).astype(np.int8))
    valid = jnp.asarray(rng.rand(s, k) < 0.9)
    smalls = jnp.asarray(rng.rand(s, 259, 461).astype(np.float32) * 255)

    t0 = time.time()
    packed, vbits = jax.jit(hamming.pack_descriptor_bits, static_argnums=(2, 3))(
        desc, valid, s, k
    )
    smalls16 = jax.jit(lambda a: a.astype(jnp.float16))(smalls)
    jax.block_until_ready((packed, vbits, smalls16))
    print(f"pack compile+exec: {time.time()-t0:.2f} s", flush=True)

    for name, arr in (("desc_bits 33MB", packed), ("smalls_f16 119MB", smalls16)):
        t0 = time.time()
        h = np.asarray(arr)
        dt = time.time() - t0
        print(f"fetch {name}: {dt:.2f} s  ({h.nbytes/1e6/dt:.1f} MB/s)", flush=True)

    # second fetch of the same array (runtime-side caching?)
    t0 = time.time()
    np.asarray(smalls16)
    print(f"refetch smalls_f16: {time.time()-t0:.2f} s", flush=True)

    # concurrent fetch: do 2 threads overlap on the tunnel?
    a1 = jax.jit(lambda a: a * 1)(smalls16)
    a2 = jax.jit(lambda a: a * 2)(smalls16)
    jax.block_until_ready((a1, a2))
    t0 = time.time()
    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(np.asarray, a1)
        f2 = ex.submit(np.asarray, a2)
        n = f1.result().nbytes + f2.result().nbytes
    dt = time.time() - t0
    print(f"concurrent fetch 2x119MB: {dt:.2f} s ({n/1e6/dt:.1f} MB/s agg)", flush=True)

    # chunked fetch of one big array via device slices (many small results
    # vs one big one — which way does the tunnel prefer?)
    sl = jax.jit(lambda a, i: jax.lax.dynamic_slice_in_dim(a, i, 100, 0))
    parts = [sl(smalls16, i) for i in range(0, 500, 100)]
    jax.block_until_ready(parts)
    t0 = time.time()
    for p in parts:
        np.asarray(p)
    dt = time.time() - t0
    print(f"chunked fetch 5x24MB: {dt:.2f} s", flush=True)

    # uint8 thumbnails (would halve bytes vs f16)
    u8 = jax.jit(lambda a: jnp.clip(jnp.round(a), 0, 255).astype(jnp.uint8))(smalls)
    jax.block_until_ready(u8)
    t0 = time.time()
    h = np.asarray(u8)
    dt = time.time() - t0
    print(f"fetch smalls_u8 60MB: {dt:.2f} s ({h.nbytes/1e6/dt:.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
