"""Ablation microbench for the fused ORB descriptor kernel (TPU).

Variants isolate the kernel's cost components on the real pipeline shapes
(Q=2048 keypoints over a 1080p atlas):
  full      — the production kernel
  nodesc    — DMA + rolls + moments + bin (skip the sampling matmul)
  noroll    — DMA + moments on the unrolled window (skip dynamic rolls)
  dmaonly   — DMA + plain window reduce (skip everything else)
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

from bench import synthesize
from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import features as F
from slideo_tpu.ops import pallas_orb as po
from slideo_tpu.utils.compile_cache import enable_compilation_cache


def _kernel_var(yb, xb, rr, cc, atlas_hbm, a_tab, d_tab, mx, my, out_ref,
                wins, sems, *, mode):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    KB, WIN_H, WIN_W = po.KB, po.WIN_H, po.WIN_W

    def start(slot, blk):
        for k in range(KB):
            idx = blk * KB + k
            pltpu.make_async_copy(
                atlas_hbm.at[pl.ds(yb[idx] * 8, WIN_H), pl.ds(xb[idx] * 128, WIN_W)],
                wins.at[slot, k], sems.at[slot, k]).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start((i + 1) % 2, i + 1)

    vals_cols = []
    for k in range(KB):
        idx = i * KB + k
        pltpu.make_async_copy(
            atlas_hbm.at[pl.ds(yb[idx] * 8, WIN_H), pl.ds(xb[idx] * 128, WIN_W)],
            wins.at[i % 2, k], sems.at[i % 2, k]).wait()
        w = wins[i % 2, k].astype(jnp.float32)
        if mode == "dmaonly":
            vals_cols.append(jnp.sum(w[: WIN_H - 8, :128], axis=1,
                                     keepdims=True)[:512 - (WIN_H - 8):, :]
                             if False else
                             jnp.full((512, 1), jnp.sum(w), jnp.float32))
            continue
        if mode == "packroll":
            # Lane roll on the sublane-packed i32 view (2x fewer vregs, no
            # f32 upcast), slice to the 128 needed lanes, THEN the row roll
            # on [80, 128] f32 (half the lanes of the baseline's [80, 256]).
            # Needed output never wraps: lane roll reads lanes
            # offset..offset+127 <= 254; row roll reads rows t..71+t <= 78.
            wq = pltpu.bitcast(wins[i % 2, k], jnp.int32)   # [40, 256]
            wq = pltpu.roll(wq, cc[idx], 1)
            w = pltpu.bitcast(wq, jnp.bfloat16)             # [80, 256]
            w = w[:, :128].astype(jnp.float32)              # [80, 128]
            w = pltpu.roll(w, rr[idx], 0)
        elif mode != "noroll":
            w = pltpu.roll(w, rr[idx], 0)
            w = pltpu.roll(w, cc[idx], 1)
        w1 = w[: WIN_H - 8, :128]
        m10 = jnp.sum(w1 * mx[:])
        m01 = jnp.sum(w1 * my[:])
        bin_ = po._sector32(m10, m01)
        if mode == "nodesc":
            vals_cols.append(jnp.full((512, 1), m10 + m01 + bin_.astype(jnp.float32),
                                      jnp.float32))
            continue
        a = a_tab[bin_]
        d = d_tab[bin_]
        g = jax.lax.dot_general(
            a, w1.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vals_cols.append(jnp.sum(g * d.astype(jnp.float32), axis=1, keepdims=True))
    vals = jnp.concatenate(vals_cols, axis=1)
    vt = vals.T
    n_bits = vt.shape[1] // 2
    out_ref[:] = jnp.where(vt[:, n_bits:] > vt[:, :n_bits], 1.0, -1.0)


def _kernel_dual(yb, xb, sel, rr, cc, atlas_hbm, a_tab, d_tab, mx, my,
                 out_ref, wins, sems, *, mode):
    """Dual-shifted-atlas pass: atlas_hbm is [2, Ha, W2] (copy 1 = copy 0
    shifted left 64 lanes), so the per-keypoint window is [WIN_H, 128]
    instead of [WIN_H, 256] — the lane-alignment residual drops to <=63,
    halving both the DMA bytes and the roll/cast vector work."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    KB, WIN_H = po.KB, po.WIN_H

    def start(slot, blk):
        for k in range(KB):
            idx = blk * KB + k
            pltpu.make_async_copy(
                atlas_hbm.at[sel[idx], pl.ds(yb[idx] * 8, WIN_H),
                             pl.ds(xb[idx] * 128, 128)],
                wins.at[slot, k], sems.at[slot, k]).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start((i + 1) % 2, i + 1)

    vals_cols = []
    for k in range(KB):
        idx = i * KB + k
        pltpu.make_async_copy(
            atlas_hbm.at[sel[idx], pl.ds(yb[idx] * 8, WIN_H),
                         pl.ds(xb[idx] * 128, 128)],
            wins.at[i % 2, k], sems.at[i % 2, k]).wait()
        if mode == "dualpack":
            # Lane roll on the sublane-packed i32 view (2x fewer vregs, no
            # f32 upcast). Patch never wraps: lanes 0..62 <- o..o+125.
            wq = pltpu.bitcast(wins[i % 2, k], jnp.int32)   # [40, 128]
            wq = pltpu.roll(wq, cc[idx], 1)
            w = pltpu.bitcast(wq, jnp.bfloat16).astype(jnp.float32)
            w = pltpu.roll(w, rr[idx], 0)
        else:
            w = wins[i % 2, k].astype(jnp.float32)          # [80, 128]
            w = pltpu.roll(w, cc[idx], 1)
            w = pltpu.roll(w, rr[idx], 0)
        w1 = w[: WIN_H - 8, :128]
        m10 = jnp.sum(w1 * mx[:])
        m01 = jnp.sum(w1 * my[:])
        bin_ = po._sector32(m10, m01)
        a = a_tab[bin_]
        d = d_tab[bin_]
        g = jax.lax.dot_general(
            a, w1.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vals_cols.append(jnp.sum(g * d.astype(jnp.float32), axis=1,
                                 keepdims=True))
    vals = jnp.concatenate(vals_cols, axis=1)
    vt = vals.T
    n_bits = vt.shape[1] // 2
    out_ref[:] = jnp.where(vt[:, n_bits:] > vt[:, :n_bits], 1.0, -1.0)


def descriptors_dual(atlas, ys, xs, y_lo, y_hi, x_hi, mode):
    from slideo_tpu.ops.orb import HALF_PATCH, PATCH
    KB, WIN_H = po.KB, po.WIN_H
    ha, w_atlas = atlas.shape
    k = ys.shape[0]
    x_lo = jnp.zeros_like(xs)
    y0 = jnp.clip(ys - HALF_PATCH, y_lo, jnp.maximum(y_hi - PATCH, y_lo))
    x0 = jnp.clip(xs - HALF_PATCH, x_lo, jnp.maximum(x_hi - PATCH, x_lo))
    yb = jnp.maximum(y0 - po._ROW0, 0) // 8
    r0 = y0 - yb * 8
    rr = (po._ROW0 - r0) % WIN_H
    sel = (x0 // 64) % 2
    xb = x0 // 128
    cc = (128 - (x0 % 64)) % 128
    ha_pad = -(-(ha + WIN_H) // 8) * 8
    max_xb = max((w_atlas - PATCH) // 128, 0)
    w2 = max_xb * 128 + 128
    big = jnp.pad(atlas.astype(jnp.bfloat16),
                  ((0, ha_pad - ha), (0, max(0, w2 + 64 - w_atlas))))
    atlas2 = jnp.stack([big[:, :w2], big[:, 64:64 + w2]])
    a_np, d_np = po._bin_tables(256, 0x51DE0, 7, 2.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(k // KB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((KB, 256), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, KB, WIN_H, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, KB)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel_dual, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 256), jnp.float32),
    )(yb.astype(jnp.int32), xb.astype(jnp.int32), sel.astype(jnp.int32),
      rr.astype(jnp.int32), cc.astype(jnp.int32), atlas2,
      jnp.asarray(a_np, jnp.bfloat16), jnp.asarray(d_np, jnp.bfloat16),
      jnp.asarray(po._moment_masks()[0]), jnp.asarray(po._moment_masks()[1]))


def descriptors_var(atlas, ys, xs, y_lo, y_hi, x_hi, mode):
    if mode in ("dual", "dualpack"):
        return descriptors_dual(atlas, ys, xs, y_lo, y_hi, x_hi, mode)
    from slideo_tpu.ops.orb import HALF_PATCH, PATCH
    KB, WIN_H, WIN_W = po.KB, po.WIN_H, po.WIN_W
    ha, w_atlas = atlas.shape
    k = ys.shape[0]
    x_lo = jnp.zeros_like(xs)
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
    atlas_p = jnp.pad(atlas.astype(jnp.bfloat16),
                      ((0, ha_pad - ha), (0, w_pad - w_atlas)))
    a_np, d_np = po._bin_tables(256, 0x51DE0, 7, 2.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(k // KB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((KB, 256), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, KB, WIN_H, WIN_W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, KB)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel_var, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 256), jnp.float32),
    )(yb.astype(jnp.int32), xb.astype(jnp.int32), rr.astype(jnp.int32),
      cc.astype(jnp.int32), atlas_p,
      jnp.asarray(a_np, jnp.bfloat16), jnp.asarray(d_np, jnp.bfloat16),
      jnp.asarray(po._moment_masks()[0]), jnp.asarray(po._moment_masks()[1]))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset to run (default: all)")
    cli = ap.parse_args()
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    _, frames = synthesize(4, hw, hw, B * (ITERS + 1))
    meta = F.pyramid_meta(*hw, cfg.orb)

    def mk(mode):
        def run(fr):
            def one(f):
                atlas = F.build_pyramid(f, cfg.orb)
                kps = F.detect_pyramid(atlas, meta, cfg.orb)
                import numpy as _np
                offsets = _np.asarray(meta.offsets, _np.int32)
                xoffsets = _np.asarray(meta.xoffsets, _np.int32)
                heights = _np.asarray([s[0] for s in meta.sizes], _np.int32)
                widths = _np.asarray([s[1] for s in meta.sizes], _np.int32)
                y_lo = jnp.take(jnp.asarray(offsets), kps.level)
                y_abs = kps.y + y_lo
                y_hi = y_lo + jnp.take(jnp.asarray(heights), kps.level)
                x_lo = jnp.take(jnp.asarray(xoffsets), kps.level)
                x_abs = kps.x + x_lo
                x_hi = x_lo + jnp.take(jnp.asarray(widths), kps.level)
                bits = descriptors_var(atlas, y_abs, x_abs, y_lo, y_hi, x_hi, mode)
                return bits.sum()
            return jax.lax.map(one, fr)
        return run

    def detect_only(fr):
        def one(f):
            atlas = F.build_pyramid(f, cfg.orb)
            kps = F.detect_pyramid(atlas, meta, cfg.orb)
            return kps.score.sum()
        return jax.lax.map(one, fr)

    def mk_prod(pass2="lanes"):
        # The PRODUCTION two-pass kernel (pallas_orb.orb_descriptors_pallas).
        def run(fr):
            def one(f):
                atlas = F.build_pyramid(f, cfg.orb)
                kps = F.detect_pyramid(atlas, meta, cfg.orb)
                import numpy as _np
                offsets = _np.asarray(meta.offsets, _np.int32)
                xoffsets = _np.asarray(meta.xoffsets, _np.int32)
                heights = _np.asarray([s[0] for s in meta.sizes], _np.int32)
                widths = _np.asarray([s[1] for s in meta.sizes], _np.int32)
                y_lo = jnp.take(jnp.asarray(offsets), kps.level)
                y_abs = kps.y + y_lo
                y_hi = y_lo + jnp.take(jnp.asarray(heights), kps.level)
                x_lo = jnp.take(jnp.asarray(xoffsets), kps.level)
                x_abs = kps.x + x_lo
                x_hi = x_lo + jnp.take(jnp.asarray(widths), kps.level)
                bits = po.orb_descriptors_pallas(
                    atlas, y_abs, x_abs, y_lo, y_hi, x_hi, x_lo=x_lo,
                    pass2=pass2)
                return bits.astype(jnp.int32).sum()
            return jax.lax.map(one, fr)
        return run

    variants = [("detect", detect_only)] + [
        (m, mk(m)) for m in ("dmaonly", "noroll", "nodesc", "full", "packroll",
                             "dual", "dualpack")
    ] + [("prod", mk_prod()), ("prodt", mk_prod("sublanes")),
         ("prodtl", mk_prod("sublanes_loop"))]
    if cli.variants:
        want = set(cli.variants.split(","))
        variants = [(n, f) for n, f in variants if n in want]
    for name, fn in variants:
        try:
            jf = jax.jit(fn)
            batches = [jnp.asarray(frames[i * B:(i + 1) * B]) for i in range(ITERS + 1)]
            t0 = time.time(); np.asarray(jf(batches[0])); comp = time.time() - t0
            ts = []
            for i in range(1, ITERS + 1):
                t0 = time.time(); np.asarray(jf(batches[i])); ts.append(time.time() - t0)
            print(f"{name:8s} {min(ts)*1000/B:7.2f} ms/frame (batch {min(ts)*1000:.0f} ms, "
                  f"compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
