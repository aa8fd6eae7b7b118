"""Microbench: fused match-table kernel dtype variants on the real chip.

Times the [Q, 256] x [S*K, 256] best-per-slide reduction for the production
shapes (Q in {768, 2048}, S=500, K=2048) across MXU input dtypes.
Distinct inputs per iteration (the remote runtime caches identical
executions; see CLAUDE.md).

Usage: python tools/bench_table_kernel.py [--slides 500] [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from slideo_tpu.ops.pallas_table import match_table_scores_pallas

    s, k, d = args.slides, args.k, 256
    rng = np.random.RandomState(0)
    n_sets = args.iters + 1
    descs = [
        (rng.randint(0, 2, (s * k, d)).astype(np.int8) * 2 - 1)
        for _ in range(2)
    ]
    bias = np.zeros((s * k,), np.float32)

    reps = 8  # kernel calls per dispatch (amortizes the ~45 ms floor)
    for q_n in (768, 2048):
        queries = [
            (rng.randint(0, 2, (reps, q_n, d)).astype(np.int8) * 2 - 1)
            for _ in range(n_sets)
        ]
        # (desc storage dtype, MXU compute dtype, with_arg, transposed)
        variants = (
            (jnp.int8, jnp.bfloat16, True, False),
            (jnp.int8, jnp.bfloat16, True, True),
            (jnp.int8, jnp.bfloat16, False, True),
            (jnp.int8, jnp.float32, True, True),
            (jnp.int8, jnp.float32, False, True),
            (jnp.int8, jnp.int8, False, True),
        )
        for store, dtype, with_arg, tr in variants:

            def run(qs, dd, bb, dt=dtype, wa=with_arg, tr=tr):
                def one(qq):
                    best, arg = match_table_scores_pallas(
                        qq, dd, bb, s, k, dtype=dt, with_arg=wa, transposed=tr
                    )
                    return best.sum() + (arg.sum() if wa else 0)

                return jax.lax.map(one, qs)

            fn = jax.jit(run)
            try:
                dd = jnp.asarray(descs[0]).astype(store)
                if tr:
                    dd = jnp.swapaxes(dd.reshape(s, k, d), 1, 2)
                bb = jnp.asarray(bias)
                ref = np.asarray(fn(jnp.asarray(queries[0]), dd, bb))
                times = []
                for i in range(1, n_sets):
                    qq = jnp.asarray(queries[i])
                    t0 = time.time()
                    np.asarray(fn(qq, dd, bb))
                    times.append(time.time() - t0)
                best = min(times) / reps
                gmacs = q_n * d * s * k / 1e9
                print(
                    f"Q={q_n} store={jnp.dtype(store).name:9s} "
                    f"mxu={jnp.dtype(dtype).name:9s} arg={int(with_arg)} "
                    f"t={int(tr)} "
                    f"{best*1000:8.2f} ms/call  {gmacs/best/1000:7.1f} TMAC/s  "
                    f"check={ref[0]:.0f}",
                    flush=True,
                )
            except Exception as e:
                print(f"Q={q_n} store={jnp.dtype(store).name} "
                      f"mxu={jnp.dtype(dtype).name} arg={int(with_arg)} "
                      f"t={int(tr)}: "
                      f"FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
