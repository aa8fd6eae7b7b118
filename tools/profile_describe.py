"""Slope-timed decomposition of the production describe stage (TPU).

Stages (each timed at two batch sizes; slope = marginal ms/frame):
  pass1      — window DMA + rolls + moments + bin (and the aligned-window
               HBM write), i.e. pallas_orb's first kernel
  pass1+glue — plus the bin-sort / scatter bookkeeping between the passes
  full       — the complete production orb_descriptors_pallas

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python3 tools/profile_describe.py
"""

from __future__ import annotations

import argparse
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

from bench import synthesize
from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import features as F
from slideo_tpu.ops import pallas_orb as po
from slideo_tpu.ops.orb import HALF_PATCH, PATCH
from slideo_tpu.utils.compile_cache import enable_compilation_cache


def describe_staged(atlas, ys, xs, y_lo, y_hi, x_hi, x_lo, stage: str):
    """Copy of orb_descriptors_pallas's wrapper with early exits."""
    KB, WIN_H, WIN_W = po.KB, po.WIN_H, po.WIN_W
    ha, w_atlas = atlas.shape
    k = ys.shape[0]
    kp_pad = (-k) % KB
    if kp_pad:
        z = lambda arr: jnp.pad(arr, ((0, kp_pad),))
        ys, xs, x_lo = z(ys), z(xs), z(x_lo)
        y_lo = z(y_lo)
        y_hi = jnp.pad(y_hi, ((0, kp_pad),), constant_values=PATCH)
        x_hi = jnp.pad(x_hi, ((0, kp_pad),), constant_values=PATCH)
    kp = k + kp_pad

    y0 = jnp.clip(ys - HALF_PATCH, y_lo, jnp.maximum(y_hi - PATCH, y_lo))
    x0 = jnp.clip(xs - HALF_PATCH, x_lo, jnp.maximum(x_hi - PATCH, x_lo))
    yb = jnp.maximum(y0 - po._ROW0, 0) // 8
    r0 = y0 - yb * 8
    rr = (po._ROW0 - r0) % WIN_H
    xb = x0 // 128
    cc = (WIN_W - (x0 - xb * 128)) % WIN_W

    ha_pad = -(-(ha + WIN_H) // 8) * 8
    max_xb = max((w_atlas - PATCH) // 128, 0)
    w_pad = max(max_xb * 128 + WIN_W, w_atlas)
    atlas_p = jnp.pad(
        atlas.astype(jnp.bfloat16),
        ((0, ha_pad - ha), (0, w_pad - w_atlas)),
    )

    a_np, d_np = po._bin_tables(256, 0x51DE0, 7, 2.0)
    a_tab = jnp.asarray(a_np, jnp.bfloat16)
    d_tab = jnp.asarray(d_np, jnp.bfloat16)
    mx, my = po._moment_masks()
    yb, xb = yb.astype(jnp.int32), xb.astype(jnp.int32)
    rr, cc = rr.astype(jnp.int32), cc.astype(jnp.int32)

    nblk = kp // KB
    bins_f, aligned = pl.pallas_call(
        po._kernel_bins,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, WIN_H - 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, KB, WIN_H, WIN_W), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((kp, WIN_H - 8, 128), jnp.bfloat16),
        ],
    )(yb, xb, rr, cc, atlas_p, jnp.asarray(mx), jnp.asarray(my))
    bins = bins_f[:, 0, :KB].reshape(kp).astype(jnp.int32)
    if stage == "pass1":
        return bins.sum() + aligned[::64, ::8, ::32].astype(jnp.float32).sum()

    order = jnp.argsort(bins, stable=True)
    bins_sorted = jnp.take(bins, order)
    counts = jnp.zeros((po.ANGLE_BINS,), jnp.int32).at[bins].add(1)
    padded = -(-counts // KB) * KB
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    bin_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(kp, dtype=jnp.int32) - jnp.take(bin_starts, bins_sorted)
    pos_sorted = jnp.take(offs, bins_sorted) + rank
    kpp = kp + po.ANGLE_BINS * KB

    def scat(arr):
        out = jnp.zeros((kpp,), arr.dtype)
        return out.at[pos_sorted].set(jnp.take(arr, order))

    src = scat(jnp.arange(kp, dtype=jnp.int32))
    ends = jnp.cumsum(padded)
    blk_starts = jnp.arange(kpp // KB, dtype=jnp.int32) * KB
    block_bins = jnp.minimum(
        jnp.searchsorted(ends, blk_starts, side="right").astype(jnp.int32),
        po.ANGLE_BINS - 1,
    )
    if stage == "glue":
        return (src.sum() + block_bins.sum()
                + aligned[::64, ::8, ::32].astype(jnp.float32).sum())

    bits_p = pl.pallas_call(
        po._kernel_desc,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(kpp // KB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((KB, 256), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, KB, WIN_H - 8, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kpp, 256), jnp.float32),
    )(block_bins, src, aligned, a_tab, d_tab)
    inv = jnp.zeros((kp,), jnp.int32).at[order].set(pos_sorted)
    bits = jnp.take(bits_p, inv, axis=0)
    return bits[:k].astype(jnp.int8).astype(jnp.float32).sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b1", type=int, default=16)
    ap.add_argument("--b2", type=int, default=48)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    b1, b2 = args.b1, args.b2
    _, frames = synthesize(4, hw, hw, (b1 + b2) * 4)
    meta = F.pyramid_meta(*hw, cfg.orb)
    print(f"device={jax.devices()[0]}", flush=True)

    offsets = np.asarray(meta.offsets, np.int32)
    xoffsets = np.asarray(meta.xoffsets, np.int32)
    heights = np.asarray([s[0] for s in meta.sizes], np.int32)
    widths = np.asarray([s[1] for s in meta.sizes], np.int32)

    pyr_j = jax.jit(lambda fr: jax.lax.map(
        lambda im: F.build_pyramid(im, cfg.orb), fr))
    det_j = jax.jit(lambda atl: jax.lax.map(
        lambda a: F.detect_pyramid(a, meta, cfg.orb), atl))

    def prep(lo, b):
        a = pyr_j(jnp.asarray(frames[lo:lo + b]))
        ktup = det_j(a)
        jax.block_until_ready(ktup)
        return a, ktup

    ins1 = [prep((2 * i) * b1, b1) for i in range(2)]
    ins2 = [prep(2 * b1 + (2 * i) * b2, b2) for i in range(2)]

    def timed(fn, inputs, n=4):
        outs = fn(inputs[0])
        np.asarray(outs)
        ts = []
        for i in range(1, n + 1):
            t0 = time.time()
            outs = fn(inputs[i % len(inputs)])
            np.asarray(outs)
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    for stage in ("pass1", "glue", "full"):
        def run(inp, stage=stage):
            a, kp = inp
            def one(ak):
                atl, kt = ak
                kps = F.Keypoints(*kt)
                y_lo = jnp.take(jnp.asarray(offsets), kps.level)
                y_abs = kps.y + y_lo
                y_hi = y_lo + jnp.take(jnp.asarray(heights), kps.level)
                x_lo = jnp.take(jnp.asarray(xoffsets), kps.level)
                x_abs = kps.x + x_lo
                x_hi = x_lo + jnp.take(jnp.asarray(widths), kps.level)
                return describe_staged(
                    atl, y_abs, x_abs, y_lo, y_hi, x_hi, x_lo, stage)
            return jax.lax.map(one, (a, tuple(kp))).sum()
        jf = jax.jit(run)
        t1 = timed(jf, ins1)
        t2 = timed(jf, ins2)
        m = (t2 - t1) / (b2 - b1)
        print(f"{stage:8s} {m*1000:7.3f} ms/frame "
              f"(b{b1} {t1*1000:.1f} ms, b{b2} {t2*1000:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
