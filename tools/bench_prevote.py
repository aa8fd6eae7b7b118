"""Microbench: hierarchical stage-1 screening shapes (pre-vote design probe).

Times the production batched stage-1 sweep against candidate two-stage
decompositions, at production shapes (500 slides, K=2048, D=160, batch 64
x 256 queries):

  shipped   one full-K sweep of the whole deck          [16384,160]x[500,160,2048]
  d320      same but D padded 160->320 (granularity probe: if the int8 MXU
            contracts in >=320-deep chunks, time should NOT rise ~2x)
  prevote   strided quarter-K sweep of the whole deck   [16384,160]x[500,160,512]
  pv_q128   quarter-K sweep with 128 queries/frame      [8192,160]x[500,160,512]
  stage1b   per-frame full-K sweep of P=64 gathered slides (lax.map over B)
  hier      pv_q128 + gather + stage1b composed (the real candidate path)

Usage: python3 tools/bench_prevote.py [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.ops.pallas_table import match_table_scores_pallas

S, K, D, B, QS = 500, 2048, 160, 64, 256
P = 64  # pre-vote survivors


def timed(fn, args_sets, iters):
    ref = jax.tree.map(np.asarray, fn(*args_sets[0]))
    times = []
    for i in range(1, iters + 1):
        t0 = time.time()
        jax.tree.map(np.asarray, fn(*args_sets[i]))
        times.append(time.time() - t0)
    return min(times), ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    desc_t = jnp.asarray(rng.choice([-1, 1], (S, D, K)).astype(np.int8))
    desc_pre = desc_t[:, :, ::4]  # [S, D, K/4] strided quarter-K
    desc_320 = jnp.pad(desc_t, ((0, 0), (0, 320 - D), (0, 0)))
    bias = jnp.zeros((S * K,), jnp.float32)
    bias_pre = jnp.zeros((S * (K // 4),), jnp.float32)
    qsets = [
        jnp.asarray(rng.choice([-1, 1], (B * QS, D)).astype(np.int8))
        for _ in range(args.iters + 1)
    ]
    q320 = [jnp.pad(q, ((0, 0), (0, 320 - D))) for q in qsets]
    cands = [
        jnp.asarray(
            np.stack([
                rng.choice(S, P, replace=False) for _ in range(B)
            ]).astype(np.int32)
        )
        for _ in range(args.iters + 1)
    ]

    def sweep(q, dt, bi, s, k, d=None):
        best, _ = match_table_scores_pallas(
            q, dt, bi, s, k, dtype=jnp.int8, with_arg=False,
            transposed=True, skip_bias=True,
        )
        return best.sum()

    @jax.jit
    def shipped(q, dt, bi):
        return sweep(q, dt, bi, S, K)

    @jax.jit
    def d320f(q, dt, bi):
        return sweep(q, dt, bi, S, K)

    @jax.jit
    def prevote(q, dt, bi):
        return sweep(q, dt, bi, S, K // 4)

    @jax.jit
    def pv_q128(q, dt, bi):
        return sweep(q.reshape(B, QS, D)[:, :128].reshape(B * 128, D), dt,
                     bi, S, K // 4)

    @jax.jit
    def stage1b(q, cand, dt, bi):
        qf = q.reshape(B, QS, D)

        def one(args):
            qi, ci = args

            def slice_slide(c):
                return jax.lax.dynamic_slice(dt, (c, 0, 0), (1, D, K))[0]

            sub = jax.lax.map(slice_slide, ci)            # [P, D, K]
            best, _ = match_table_scores_pallas(
                qi, sub, bi[: P * K], P, K, dtype=jnp.int8,
                with_arg=False, transposed=True, skip_bias=True,
            )
            return best.sum()

        return jax.lax.map(one, (qf, cand))

    @jax.jit
    def hier(q, dt_pre, dt, bi):
        qf = q.reshape(B, QS, D)
        qpre = qf[:, :128].reshape(B * 128, D)
        best, _ = match_table_scores_pallas(
            qpre, dt_pre, bi[: S * (K // 4)], S, K // 4, dtype=jnp.int8,
            with_arg=False, transposed=True, skip_bias=True,
        )
        best = best.reshape(B, 128, S)
        dist = (128.0 - best.astype(jnp.float32)) * 0.5
        bestd = jnp.min(dist, axis=2, keepdims=True)
        votes = jnp.sum(dist <= bestd * 1.05 + 1.0, axis=1)
        _, cand = jax.lax.top_k(votes.astype(jnp.float32), P)

        def one(args):
            qi, ci = args

            def slice_slide(c):
                return jax.lax.dynamic_slice(dt, (c, 0, 0), (1, D, K))[0]

            sub = jax.lax.map(slice_slide, ci.astype(jnp.int32))
            best, _ = match_table_scores_pallas(
                qi, sub, bi[: P * K], P, K, dtype=jnp.int8,
                with_arg=False, transposed=True, skip_bias=True,
            )
            b2 = best.reshape(QS, P)
            d2 = (128.0 - b2.astype(jnp.float32)) * 0.5
            bd = jnp.min(d2, axis=1, keepdims=True)
            v2 = jnp.sum(d2 <= bd * 1.05 + 1.0, axis=0)
            _, top = jax.lax.top_k(v2.astype(jnp.float32), 16)
            return jnp.take(ci, top)

        return jax.lax.map(one, (qf, cand))

    runs = [
        ("shipped ", shipped, [(q, desc_t, bias) for q in qsets]),
        ("d320    ", d320f, [(q, desc_320, bias) for q in q320]),
        ("prevote ", prevote, [(q, desc_pre, bias_pre) for q in qsets]),
        ("pv_q128 ", pv_q128, [(q, desc_pre, bias_pre) for q in qsets]),
        ("stage1b ", stage1b,
         [(q, c, desc_t, bias) for q, c in zip(qsets, cands)]),
        ("hier    ", hier,
         [(q, desc_pre, desc_t, bias) for q in qsets]),
    ]
    for name, fn, argsets in runs:
        t, _ = timed(fn, argsets, args.iters)
        print(f"{name} {t * 1000:8.2f} ms/batch-{B}  "
              f"{t / B * 1000:6.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
