"""Microbench: FAST kernel variants on the real atlas shape (TPU).

Times a batch of 8 frames' atlases through variant kernels via lax.map, with
distinct uint8 1080p frames upstream (build_pyramid included) so numbers are
comparable to the pipeline's detect stage. Variants:
  copyonly   — DMA bands in, write them out (grid/DMA floor)
  current    — ops/pallas_fast.fast_scores_pallas as-is
  f32inc     — float32 planes, incremental seg_reduce
  f32log     — float32 planes, log-cascade seg_reduce
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
from slideo_tpu.ops.fast import CIRCLE_OFFSETS
from slideo_tpu.ops.pallas_fast import HALO, fast_scores_pallas
from slideo_tpu.utils.compile_cache import enable_compilation_cache


def _kernel_var(
    x_hbm, out_ref, scratch, sem, *,
    threshold, band, width, height, true_width, mode, cdtype,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(slot, b):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * band, band + 2 * HALO), :],
            scratch.at[slot], sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    x = scratch[i % 2]
    h = band + 2 * HALO
    w = width + 2 * HALO

    if mode == "copyonly":
        out_ref[:] = jax.lax.slice(x, (HALO, HALO), (HALO + band, HALO + width))
        return

    ch, cw = h - 6, w - 6
    center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

    def tap(dy, dx):
        return jax.lax.slice(x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw))

    diffs = [(tap(dy, dx) - center).astype(cdtype) for (dy, dx) in CIRCLE_OFFSETS]

    if mode == "log":
        def seg_reduce(op, outer):
            w2 = [op(diffs[s], diffs[(s + 1) % 16]) for s in range(16)]
            w4 = [op(w2[s], w2[(s + 2) % 16]) for s in range(16)]
            w8 = [op(w4[s], w4[(s + 4) % 16]) for s in range(16)]
            w9 = [op(w8[s], diffs[(s + 8) % 16]) for s in range(16)]
            acc = w9[0]
            for s in range(1, 16):
                acc = outer(acc, w9[s])
            return acc
    else:
        def seg_reduce(op, outer):
            acc = None
            for s0 in range(16):
                m = diffs[s0]
                for j in range(1, 9):
                    m = op(m, diffs[(s0 + j) % 16])
                acc = m if acc is None else outer(acc, m)
            return acc

    bright = seg_reduce(jnp.minimum, jnp.maximum)
    dark = -seg_reduce(jnp.maximum, jnp.minimum)
    score = jnp.maximum(bright, dark).astype(jnp.float32)
    score = jnp.where(score > threshold, score, 0.0)

    band_start = pl.program_id(0) * band
    gy = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + band_start - 1
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) - 1
    ring_ok = (gy >= 3) & (gy < height - 3) & (gx >= 3) & (gx < true_width - 3)
    score = jnp.where(ring_ok, score, 0.0)

    def nbr(dy, dx):
        return jax.lax.slice(score, (1 + dy, 1 + dx), (1 + dy + band, 1 + dx + width))

    s0 = nbr(0, 0)
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = nbr(dy, dx)
            neigh = nb if neigh is None else jnp.maximum(neigh, nb)
    out_ref[:] = jnp.where(s0 >= neigh, s0, 0.0)


def variant_scores(img, threshold, band, mode, cdtype):
    h, w = img.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % 128)
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    x = jnp.pad(img.astype(jnp.float32), ((HALO, HALO + pad_h), (HALO, w_in - w - HALO)))
    n_bands = (h + pad_h) // band
    out = pl.pallas_call(
        partial(_kernel_var, threshold=float(threshold), band=band, width=w_out,
                height=h, true_width=w, mode=mode, cdtype=cdtype),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, w_out), jnp.float32),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, w_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x)
    return out[:h, :w]


def main():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    _, frames = synthesize(4, hw, hw, B * (ITERS + 1))

    variants = [
        ("copyonly b16", lambda a: variant_scores(a, 20, 16, "copyonly", jnp.float32)),
        ("current  b16", lambda a: fast_scores_pallas(a, 20)),
        ("f32inc   b16", lambda a: variant_scores(a, 20, 16, "inc", jnp.float32)),
        ("f32log   b8 ", lambda a: variant_scores(a, 20, 8, "log", jnp.float32)),
        ("f32inc   b32", lambda a: variant_scores(a, 20, 32, "inc", jnp.float32)),
        ("bf16inc  b16", lambda a: variant_scores(a, 20, 16, "inc", jnp.bfloat16)),
    ]
    for name, fn in variants:
        def run(fr, f=fn):
            def one(im):
                atlas = F.build_pyramid(im, cfg.orb)
                return jnp.sum(f(atlas))
            return jax.lax.map(one, fr)
        try:
            jf = jax.jit(run)
            batches = [jnp.asarray(frames[i * B:(i + 1) * B]) for i in range(ITERS + 1)]
            t0 = time.time(); ref = np.asarray(jf(batches[0])); comp = time.time() - t0
            ts = []
            for i in range(1, ITERS + 1):
                t0 = time.time(); np.asarray(jf(batches[i])); ts.append(time.time() - t0)
            print(f"{name}  {min(ts)*1000/B:7.2f} ms/frame (batch {min(ts)*1000:.0f} ms, "
                  f"compile {comp:.0f}s, check {ref[0]:.0f})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] == "v1"):
    main()


# ---- BlockSpec-pipelined variant: halo via 3 shifted input views ----

def _kernel_bs(xp_ref, xc_ref, xn_ref, out_ref, *,
               threshold, band, width, height, true_width, mode, cdtype):
    i = pl.program_id(0)
    x = jnp.concatenate(
        [xp_ref[band - HALO:], xc_ref[:], xn_ref[:HALO]], axis=0
    )  # [band + 2*HALO, w]
    h = band + 2 * HALO
    w = width + 2 * HALO
    ch, cw = h - 6, w - 6
    center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

    def tap(dy, dx):
        return jax.lax.slice(x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw))

    diffs = [(tap(dy, dx) - center).astype(cdtype) for (dy, dx) in CIRCLE_OFFSETS]

    if mode == "log":
        def seg_reduce(op, outer):
            w2 = [op(diffs[s], diffs[(s + 1) % 16]) for s in range(16)]
            w4 = [op(w2[s], w2[(s + 2) % 16]) for s in range(16)]
            w8 = [op(w4[s], w4[(s + 4) % 16]) for s in range(16)]
            w9 = [op(w8[s], diffs[(s + 8) % 16]) for s in range(16)]
            acc = w9[0]
            for s in range(1, 16):
                acc = outer(acc, w9[s])
            return acc
    else:
        def seg_reduce(op, outer):
            acc = None
            for s0 in range(16):
                m = diffs[s0]
                for j in range(1, 9):
                    m = op(m, diffs[(s0 + j) % 16])
                acc = m if acc is None else outer(acc, m)
            return acc

    bright = seg_reduce(jnp.minimum, jnp.maximum)
    dark = -seg_reduce(jnp.maximum, jnp.minimum)
    score = jnp.maximum(bright, dark).astype(jnp.float32)
    score = jnp.where(score > threshold, score, 0.0)

    band_start = i * band
    gy = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + band_start - 1
    gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1) - 1
    ring_ok = (gy >= 3) & (gy < height - 3) & (gx >= 3) & (gx < true_width - 3)
    score = jnp.where(ring_ok, score, 0.0)

    def nbr(dy, dx):
        return jax.lax.slice(score, (1 + dy, 1 + dx), (1 + dy + band, 1 + dx + width))

    s0 = nbr(0, 0)
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = nbr(dy, dx)
            neigh = nb if neigh is None else jnp.maximum(neigh, nb)
    out_ref[:] = jnp.where(s0 >= neigh, s0, 0.0)


def variant_scores_bs(img, threshold, band, mode, cdtype):
    h, w = img.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % 128)
    x = jnp.pad(img.astype(jnp.float32), ((0, pad_h), (HALO, w_out - w - HALO)))
    hp = h + pad_h
    n_bands = hp // band
    spec = lambda off: pl.BlockSpec(
        (band, w_out + 2 * HALO - ((w_out + 2 * HALO) % 128 and 0)), None)
    w_in = x.shape[1]
    def mk(offsets):
        return pl.BlockSpec((band, w_in),
                            lambda i, o=offsets: (jnp.clip(i + o, 0, n_bands - 1), 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel_bs, threshold=float(threshold), band=band,
                width=w_in - 2 * HALO, height=h, true_width=w, mode=mode,
                cdtype=cdtype),
        out_shape=jax.ShapeDtypeStruct((hp, w_in - 2 * HALO), jnp.float32),
        grid=(n_bands,),
        in_specs=[mk(-1), mk(0), mk(1)],
        out_specs=pl.BlockSpec((band, w_in - 2 * HALO), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, x, x)
    return out[:h, :w]


def main2():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    _, frames = synthesize(4, hw, hw, B * (ITERS + 1))
    from slideo_tpu.ops import fast as fast_ops

    variants = [
        ("bs bf16log b32", lambda a: variant_scores_bs(a, 20, 32, "log", jnp.bfloat16)),
        ("bs bf16inc b64", lambda a: variant_scores_bs(a, 20, 64, "inc", jnp.bfloat16)),
        ("bs bf16inc b128", lambda a: variant_scores_bs(a, 20, 128, "inc", jnp.bfloat16)),
        ("xla nms(fast) ", lambda a: fast_ops.nms3x3(fast_ops.fast_scores(a, 20))),
    ]
    for name, fn in variants:
        def run(fr, f=fn):
            def one(im):
                atlas = F.build_pyramid(im, cfg.orb)
                return jnp.sum(f(atlas))
            return jax.lax.map(one, fr)
        try:
            jf = jax.jit(run)
            batches = [jnp.asarray(frames[i * B:(i + 1) * B]) for i in range(ITERS + 1)]
            t0 = time.time(); ref = np.asarray(jf(batches[0])); comp = time.time() - t0
            ts = []
            for i in range(1, ITERS + 1):
                t0 = time.time(); np.asarray(jf(batches[i])); ts.append(time.time() - t0)
            print(f"{name}  {min(ts)*1000/B:7.2f} ms/frame (batch {min(ts)*1000:.0f} ms, "
                  f"compile {comp:.0f}s, check {ref[0]:.0f})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


# ---- Two-phase variant: compass score bound + per-chunk cascade skip ----
#
# Exact pruning: any 9-window of the 16-circle contains two CONSECUTIVE
# compass points (spacing 4), so
#   bright = max_s min_{w9(s)} d  <=  max_c min(d_c, d_{c+4}),  c in {0,4,8,12}
#   dark   = -min_s max_{w9(s)} d <= -min_c max(d_c, d_{c+4})
# If both bounds are <= threshold the pixel's score thresholds to 0 and the
# full cascade can be skipped. Skipping is per lane-chunk (pl.when).

def _kernel_skip(x_hbm, out_ref, scratch, sem, *,
                 threshold, band, width, height, true_width, chunk_w, cdtype):
    noskip = chunk_w < 0
    chunk_w = abs(chunk_w)
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(slot, b):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * band, band + 2 * HALO), :],
            scratch.at[slot], sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    xb = scratch[i % 2]
    band_start = i * band

    n_chunks = width // chunk_w
    for ci in range(n_chunks):
        # chunk columns [ci*chunk_w, ci*chunk_w + chunk_w) of the OUTPUT;
        # input needs the 2*HALO halo.
        x = jax.lax.slice(
            xb, (0, ci * chunk_w), (band + 2 * HALO, ci * chunk_w + chunk_w + 2 * HALO)
        )
        h = band + 2 * HALO
        ch, cw = h - 6, chunk_w + 2 * HALO - 6
        center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

        def tap(dy, dx):
            return jax.lax.slice(x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw))

        d0 = (tap(-3, 0) - center).astype(cdtype)
        d4 = (tap(0, 3) - center).astype(cdtype)
        d8 = (tap(3, 0) - center).astype(cdtype)
        d12 = (tap(0, -3) - center).astype(cdtype)
        bb = jnp.maximum(
            jnp.maximum(jnp.minimum(d0, d4), jnp.minimum(d4, d8)),
            jnp.maximum(jnp.minimum(d8, d12), jnp.minimum(d12, d0)),
        )
        db = -jnp.minimum(
            jnp.minimum(jnp.maximum(d0, d4), jnp.maximum(d4, d8)),
            jnp.minimum(jnp.maximum(d8, d12), jnp.maximum(d12, d0)),
        )
        # Scalar any() over an i1 vector trips a Mosaic relayout bug; a
        # float max-reduce compiles fine.
        if noskip:  # no-skip mode: always compute
            cand = None
        else:
            cand = jnp.max(jnp.maximum(bb, db).astype(jnp.float32)) > threshold

        if cand is not None:
            out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = jnp.zeros(
                (band, chunk_w), jnp.float32)

        def _body(x=x, ch=ch, cw=cw, center=center, tap=tap, ci=ci,
                  d0=d0, d4=d4, d8=d8, d12=d12):
            diffs = []
            for (dy, dx) in CIRCLE_OFFSETS:
                if (dy, dx) == (-3, 0):
                    diffs.append(d0)
                elif (dy, dx) == (0, 3):
                    diffs.append(d4)
                elif (dy, dx) == (3, 0):
                    diffs.append(d8)
                elif (dy, dx) == (0, -3):
                    diffs.append(d12)
                else:
                    diffs.append((tap(dy, dx) - center).astype(cdtype))

            def seg_reduce(op, outer):
                suf = list(diffs)
                for blk in (0, 8):
                    for s in range(blk + 6, blk - 1, -1):
                        suf[s] = op(diffs[s], suf[s + 1])
                pre = list(diffs)
                for blk in (0, 8):
                    for j in range(blk + 1, blk + 8):
                        pre[j] = op(pre[j - 1], diffs[j])
                acc = None
                for s in range(16):
                    w9 = op(suf[s], pre[(s + 8) % 16])
                    acc = w9 if acc is None else outer(acc, w9)
                return acc

            bright = seg_reduce(jnp.minimum, jnp.maximum)
            dark = -seg_reduce(jnp.maximum, jnp.minimum)
            score = jnp.maximum(bright, dark).astype(jnp.float32)
            score = jnp.where(score > threshold, score, 0.0)

            gy = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + band_start - 1
            gx = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
                  + ci * chunk_w - 1)
            ring_ok = ((gy >= 3) & (gy < height - 3)
                       & (gx >= 3) & (gx < true_width - 3))
            score = jnp.where(ring_ok, score, 0.0)

            def nbr(dy, dx):
                return jax.lax.slice(
                    score, (1 + dy, 1 + dx), (1 + dy + band, 1 + dx + chunk_w))

            s0 = nbr(0, 0)
            neigh = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    nb = nbr(dy, dx)
                    neigh = nb if neigh is None else jnp.maximum(neigh, nb)
            out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = jnp.where(
                s0 >= neigh, s0, 0.0)

        if cand is None:
            _body()
        else:
            pl.when(cand)(_body)


def variant_scores_skip(img, threshold, band, chunk_w, cdtype):
    h, w = img.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % abs(chunk_w))
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    x = jnp.pad(img.astype(jnp.float32),
                ((HALO, HALO + pad_h), (HALO, w_in - w - HALO)))
    n_bands = (h + pad_h) // band
    out = pl.pallas_call(
        partial(_kernel_skip, threshold=float(threshold), band=band,
                width=w_out, height=h, true_width=w, chunk_w=chunk_w,
                cdtype=cdtype),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, w_out), jnp.float32),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, w_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x)
    return out[:h, :w]


def main3():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    _, frames = synthesize(4, hw, hw, B * (ITERS + 1))

    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    variants = [
        ("vanherk  b16", lambda a: fast_scores_pallas(a, 20, band=16)),
        ("vanherk  b32", lambda a: fast_scores_pallas(a, 20, band=32)),
        ("vanherk  b64", lambda a: fast_scores_pallas(a, 20, band=64)),
        ("skip b16 c512", lambda a: variant_scores_skip(a, 20, 16, 512, jnp.bfloat16)),
        ("skip b16 c256", lambda a: variant_scores_skip(a, 20, 16, 256, jnp.bfloat16)),
        ("skip b32 c512", lambda a: variant_scores_skip(a, 20, 32, 512, jnp.bfloat16)),
        ("nosk b32 c512", lambda a: variant_scores_skip(a, 20, 32, -512, jnp.bfloat16)),
        ("nosk b64 c512", lambda a: variant_scores_skip(a, 20, 64, -512, jnp.bfloat16)),
        ("nosk b128 c512", lambda a: variant_scores_skip(a, 20, 128, -512, jnp.bfloat16)),
        ("nosk b64 c512 f32", lambda a: variant_scores_skip(a, 20, 64, -512, jnp.float32)),
        ("nosk b64 c1024", lambda a: variant_scores_skip(a, 20, 64, -1024, jnp.bfloat16)),
    ]
    if which != "all":
        variants = [v for v in variants if which in v[0].replace(" ", "")]
    ref_val = None
    for name, fn in variants:
        def run(fr, f=fn):
            def one(im):
                atlas = F.build_pyramid(im, cfg.orb)
                return jnp.sum(f(atlas))
            return jax.lax.map(one, fr)
        try:
            jf = jax.jit(run)
            batches = [jnp.asarray(frames[i * B:(i + 1) * B]) for i in range(ITERS + 1)]
            t0 = time.time(); ref = np.asarray(jf(batches[0])); comp = time.time() - t0
            ts = []
            for i in range(1, ITERS + 1):
                t0 = time.time(); np.asarray(jf(batches[i])); ts.append(time.time() - t0)
            if ref_val is None:
                ref_val = ref[0]
            agree = "OK" if abs(ref[0] - ref_val) < 1 else f"MISMATCH({ref[0]:.0f} vs {ref_val:.0f})"
            print(f"{name}  {min(ts)*1000/B:7.2f} ms/frame (batch {min(ts)*1000:.0f} ms, "
                  f"compile {comp:.0f}s, {agree})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


# ---- Round-3 variants: polarity scheduling in the van Herk cascade ----
#
# "fused": one pass computing bright and dark chains together (each diffs
#   plane read once per chain step instead of twice).
# "split": two sequential polarity passes per chunk (halves the live plane
#   set per pass — aimed at vector-register spill pressure).

def _kernel_pol(x_hbm, out_ref, scratch, sem, *,
                threshold, band, width, height, true_width, chunk_w, mode):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(slot, b):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * band, band + 2 * HALO), :],
            scratch.at[slot], sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    xb = scratch[i % 2]
    band_start = i * band
    h = band + 2 * HALO

    for ci in range(width // chunk_w):
        x = jax.lax.slice(
            xb, (0, ci * chunk_w), (h, ci * chunk_w + chunk_w + 2 * HALO))
        ch, cw = h - 6, chunk_w + 2 * HALO - 6
        center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

        def tap(dy, dx):
            return jax.lax.slice(x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw))

        diffs = [(tap(dy, dx) - center).astype(jnp.bfloat16)
                 for (dy, dx) in CIRCLE_OFFSETS]

        def seg_reduce(op, outer):
            suf = list(diffs)
            for blk in (0, 8):
                for s in range(blk + 6, blk - 1, -1):
                    suf[s] = op(diffs[s], suf[s + 1])
            pre = list(diffs)
            for blk in (0, 8):
                for j in range(blk + 1, blk + 8):
                    pre[j] = op(pre[j - 1], diffs[j])
            acc = None
            for s in range(16):
                w9 = op(suf[s], pre[(s + 8) % 16])
                acc = w9 if acc is None else outer(acc, w9)
            return acc

        if mode == "fused":
            sufn, sufx = list(diffs), list(diffs)
            for blk in (0, 8):
                for s in range(blk + 6, blk - 1, -1):
                    d = diffs[s]
                    sufn[s] = jnp.minimum(d, sufn[s + 1])
                    sufx[s] = jnp.maximum(d, sufx[s + 1])
            pren, prex = list(diffs), list(diffs)
            for blk in (0, 8):
                for j in range(blk + 1, blk + 8):
                    d = diffs[j]
                    pren[j] = jnp.minimum(pren[j - 1], d)
                    prex[j] = jnp.maximum(prex[j - 1], d)
            bright = dark = None
            for s in range(16):
                w9n = jnp.minimum(sufn[s], pren[(s + 8) % 16])
                w9x = jnp.maximum(sufx[s], prex[(s + 8) % 16])
                bright = w9n if bright is None else jnp.maximum(bright, w9n)
                dark = w9x if dark is None else jnp.minimum(dark, w9x)
            dark = -dark
        else:  # split
            bright = seg_reduce(jnp.minimum, jnp.maximum)
            dark = -seg_reduce(jnp.maximum, jnp.minimum)
        score = jnp.maximum(bright, dark).astype(jnp.float32)
        score = jnp.where(score > threshold, score, 0.0)

        gy = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + band_start - 1
        gx = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
              + ci * chunk_w - 1)
        ring_ok = ((gy >= 3) & (gy < height - 3)
                   & (gx >= 3) & (gx < true_width - 3))
        score = jnp.where(ring_ok, score, 0.0)

        def nbr(dy, dx):
            return jax.lax.slice(
                score, (1 + dy, 1 + dx), (1 + dy + band, 1 + dx + chunk_w))

        s0 = nbr(0, 0)
        neigh = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nb = nbr(dy, dx)
                neigh = nb if neigh is None else jnp.maximum(neigh, nb)
        out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = jnp.where(
            s0 >= neigh, s0, 0.0)


def variant_scores_pol(img, threshold, band, chunk_w, mode):
    h, w = img.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % chunk_w)
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    x = jnp.pad(img.astype(dt),
                ((HALO, HALO + pad_h), (HALO, w_in - w - HALO)))
    n_bands = (h + pad_h) // band
    out = pl.pallas_call(
        partial(_kernel_pol, threshold=float(threshold), band=band,
                width=w_out, height=h, true_width=w, chunk_w=chunk_w,
                mode=mode),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, w_out), jnp.float32),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, w_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x)
    return out[:h, :w]


def main4():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    _, frames = synthesize(4, hw, hw, B * (ITERS + 1))

    variants = [
        ("current b64 c512 ", lambda a: fast_scores_pallas(a, 20)),
        ("fused   b64 c512 ", lambda a: variant_scores_pol(a, 20, 64, 512, "fused")),
        ("fused   b64 c256 ", lambda a: variant_scores_pol(a, 20, 64, 256, "fused")),
        ("fused   b32 c512 ", lambda a: variant_scores_pol(a, 20, 32, 512, "fused")),
        ("split   b64 c512 ", lambda a: variant_scores_pol(a, 20, 64, 512, "split")),
        ("split   b32 c512 ", lambda a: variant_scores_pol(a, 20, 32, 512, "split")),
        ("current b64 c256 ", lambda a: fast_scores_pallas(a, 20, chunk_w=256)),
        ("current b64 c1024", lambda a: fast_scores_pallas(a, 20, chunk_w=1024)),
        # c640 divides 1920 exactly: kills the 1920->2048 chunk round-up.
        ("current b64 c640 ", lambda a: fast_scores_pallas(a, 20, chunk_w=640)),
        # bf16 input planes (the atlas_bf16 config): halves DMA + tap bytes.
        # NOTE: scores differ from the f32 variants on non-integer pixels
        # (upper pyramid levels) — the checksum may mismatch slightly.
        ("bf16in  b64 c512 ", lambda a: fast_scores_pallas(
            a.astype(jnp.bfloat16), 20)),
        ("bf16in  b64 c640 ", lambda a: fast_scores_pallas(
            a.astype(jnp.bfloat16), 20, chunk_w=640)),
        ("bf16split b64 c640", lambda a: variant_scores_pol(
            a.astype(jnp.bfloat16), 20, 64, 640, "split")),
        ("bf16split b64 c512", lambda a: variant_scores_pol(
            a.astype(jnp.bfloat16), 20, 64, 512, "split")),
        ("bf16fused b64 c640", lambda a: variant_scores_pol(
            a.astype(jnp.bfloat16), 20, 64, 640, "fused")),
        # Width-concat 2 frames per sweep: halves per-frame grid/DMA fixed
        # costs without the (B, bands) grid's serialized DMA pipeline.
        # (Handled specially in the loop below: checksum comparable.)
        ("wide2   b64 c640 ", "wide2"),
    ]
    ref_val = None
    for name, fn in variants:
        if fn == "wide2":
            def run(fr):
                def one(pair):
                    a = F.build_pyramid(pair[0], cfg.orb)
                    b2 = F.build_pyramid(pair[1], cfg.orb)
                    wide = jnp.concatenate([a, b2], axis=1)
                    # seam ring scores differ from per-frame sweeps (the
                    # 3px border mask sits at the concat edges) -- checksum
                    # is indicative only.
                    return jnp.sum(fast_scores_pallas(wide, 20, chunk_w=640))
                h, w = fr.shape[1], fr.shape[2]
                return jax.lax.map(one, fr.reshape(-1, 2, h, w))
        else:
            def run(fr, f=fn):
                def one(im):
                    atlas = F.build_pyramid(im, cfg.orb)
                    return jnp.sum(f(atlas))
                return jax.lax.map(one, fr)
        try:
            jf = jax.jit(run)
            batches = [jnp.asarray(frames[i * B:(i + 1) * B]) for i in range(ITERS + 1)]
            t0 = time.time(); ref = np.asarray(jf(batches[0])); comp = time.time() - t0
            ts = []
            for i in range(1, ITERS + 1):
                t0 = time.time(); np.asarray(jf(batches[i])); ts.append(time.time() - t0)
            if ref_val is None:
                ref_val = ref[0]
            agree = "OK" if abs(ref[0] - ref_val) < 1 else f"MISMATCH({ref[0]:.0f} vs {ref_val:.0f})"
            print(f"{name}  {min(ts)*1000/B:7.2f} ms/frame (batch {min(ts)*1000:.0f} ms, "
                  f"compile {comp:.0f}s, {agree})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "pol":
    main4()


# ---- Round-5 variants: strip-mined van Herk chains ----
#
# Hypothesis: the fused chain's ~34 live (band+2, chunk+2) planes stream
# through VMEM (live set >> VRF), so most chain ops pay load/load/op/store.
# The chain is ELEMENTWISE across the 16 tap planes (the 9-windows live in
# the circle-index dimension, not space), so the row loop can be strip-mined
# with only the 2-row NMS ring + 6-row tap halo recomputed per strip. If
# Mosaic keeps strip-sized planes in vregs, chain ops become pure ALU.
# Strip sizes are chosen so (strip + 2) hits the dtype's sublane tile
# (bf16: 16/32 rows; f32: 8/16 rows) — otherwise tile padding wastes lanes.

def _kernel_strip(x_hbm, out_ref, scratch, sem, *,
                  threshold, band, width, height, true_width, chunk_w, strip):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(slot, b):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * band, band + 2 * HALO), :],
            scratch.at[slot], sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    xb = scratch[i % 2]
    band_start = i * band

    for ci in range(width // chunk_w):
        for si in range(band // strip):
            r0 = si * strip
            x = jax.lax.slice(
                xb, (r0, ci * chunk_w),
                (r0 + strip + 2 * HALO, ci * chunk_w + chunk_w + 2 * HALO),
            )
            ch, cw = strip + 2, chunk_w + 2 * HALO - 6
            center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

            def tap(dy, dx, x=x, ch=ch, cw=cw):
                return jax.lax.slice(
                    x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw))

            diffs = [(tap(dy, dx) - center).astype(jnp.bfloat16)
                     for (dy, dx) in CIRCLE_OFFSETS]

            sufn, sufx = list(diffs), list(diffs)
            for blk in (0, 8):
                for s in range(blk + 6, blk - 1, -1):
                    d = diffs[s]
                    sufn[s] = jnp.minimum(d, sufn[s + 1])
                    sufx[s] = jnp.maximum(d, sufx[s + 1])
            pren, prex = list(diffs), list(diffs)
            for blk in (0, 8):
                for j in range(blk + 1, blk + 8):
                    d = diffs[j]
                    pren[j] = jnp.minimum(pren[j - 1], d)
                    prex[j] = jnp.maximum(prex[j - 1], d)
            bright = dark = None
            for s in range(16):
                w9n = jnp.minimum(sufn[s], pren[(s + 8) % 16])
                w9x = jnp.maximum(sufx[s], prex[(s + 8) % 16])
                bright = w9n if bright is None else jnp.maximum(bright, w9n)
                dark = w9x if dark is None else jnp.minimum(dark, w9x)
            dark = -dark
            score = jnp.maximum(bright, dark).astype(jnp.float32)
            score = jnp.where(score > threshold, score, 0.0)

            gy = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
                  + band_start + r0 - 1)
            gx = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
                  + ci * chunk_w - 1)
            ring_ok = ((gy >= 3) & (gy < height - 3)
                       & (gx >= 3) & (gx < true_width - 3))
            score = jnp.where(ring_ok, score, 0.0)

            def nbr(dy, dx, score=score):
                return jax.lax.slice(
                    score, (1 + dy, 1 + dx), (1 + dy + strip, 1 + dx + chunk_w))

            s0 = nbr(0, 0)
            neigh = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    nb = nbr(dy, dx)
                    neigh = nb if neigh is None else jnp.maximum(neigh, nb)
            out_ref[r0:r0 + strip, ci * chunk_w:(ci + 1) * chunk_w] = (
                jnp.where(s0 >= neigh, s0, 0.0))


def variant_scores_strip(img, threshold, band, chunk_w, strip):
    h, w = img.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % chunk_w)
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    x = jnp.pad(img.astype(dt),
                ((HALO, HALO + pad_h), (HALO, w_in - w - HALO)))
    n_bands = (h + pad_h) // band
    out = pl.pallas_call(
        partial(_kernel_strip, threshold=float(threshold), band=band,
                width=w_out, height=h, true_width=w, chunk_w=chunk_w,
                strip=strip),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, w_out), jnp.float32),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, w_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x)
    return out[:h, :w]


def main5():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    _, frames = synthesize(4, hw, hw, B * (ITERS + 1))

    bf = lambda a: a.astype(jnp.bfloat16)
    variants = [
        ("current  b64 c640   ", lambda a: fast_scores_pallas(
            bf(a), 20, chunk_w=640, polarity_fused=True)),
        ("strip s14 b56 c640  ", lambda a: variant_scores_strip(bf(a), 20, 56, 640, 14)),
        ("strip s30 b60 c640  ", lambda a: variant_scores_strip(bf(a), 20, 60, 640, 30)),
        ("strip s14 b56 c1920 ", lambda a: variant_scores_strip(bf(a), 20, 56, 1920, 14)),
        ("strip s14 b56 c256  ", lambda a: variant_scores_strip(bf(a), 20, 56, 256, 14)),
        ("strip s62 b62 c640  ", lambda a: variant_scores_strip(bf(a), 20, 62, 640, 62)),
        ("strip s14 b112 c640 ", lambda a: variant_scores_strip(bf(a), 20, 112, 640, 14)),
    ]
    ref_val = None
    for name, fn in variants:
        def run(fr, f=fn):
            def one(im):
                atlas = F.build_pyramid(im, cfg.orb)
                return jnp.sum(f(atlas))
            return jax.lax.map(one, fr)
        try:
            jf = jax.jit(run)
            batches = [jnp.asarray(frames[i * B:(i + 1) * B]) for i in range(ITERS + 1)]
            t0 = time.time(); ref = np.asarray(jf(batches[0])); comp = time.time() - t0
            ts = []
            for i in range(1, ITERS + 1):
                t0 = time.time(); np.asarray(jf(batches[i])); ts.append(time.time() - t0)
            if ref_val is None:
                ref_val = ref[0]
            agree = "OK" if abs(ref[0] - ref_val) < 1 else f"MISMATCH({ref[0]:.0f} vs {ref_val:.0f})"
            print(f"{name}  {min(ts)*1000/B:7.2f} ms/frame (batch {min(ts)*1000:.0f} ms, "
                  f"compile {comp:.0f}s, {agree})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "strip":
    main5()


# ---- Round-5 variants: compass-pretest chunk early-out (sparse skip) ----
#
# bench.py sparsity measurement (r5): on realistic lecture frames only
# ~18% of (56,640) atlas tiles and ~9% of (16,640) tiles contain ANY pixel
# passing the FAST compass pretest; worst-case synthetic content is 83-95%
# occupied. A per-chunk pl.when early-out therefore skips ~82% of the van
# Herk chain work on realistic content for ~15-20% pretest overhead on
# worst-case. EXACT: a bright 9-contiguous arc must contain two adjacent
# compass taps (positions 0,4,8,12 are 4 apart; any 9-window of 16 covers
# two consecutive multiples of 4), so (pair-bright | pair-dark) anywhere in
# the chunk is a necessary condition for any nonzero score.

def _kernel_sparse(x_hbm, out_ref, scratch, sem, *,
                   threshold, band, width, height, true_width, chunk_w,
                   pret_dtype=jnp.float32):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(slot, b):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * band, band + 2 * HALO), :],
            scratch.at[slot], sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    xb = scratch[i % 2]
    band_start = i * band
    h = band + 2 * HALO

    for ci in range(width // chunk_w):
        x = jax.lax.slice(
            xb, (0, ci * chunk_w), (h, ci * chunk_w + chunk_w + 2 * HALO)
        )
        # Compass pretest over this chunk's OUTPUT centers (band, chunk_w):
        # center x-offset is (4, 4); taps at +-3. Same subtract dtype/cast
        # as the chain's diffs so thresholds round identically.
        c0 = jax.lax.slice(x, (4, 4), (4 + band, 4 + chunk_w))

        # No bool vectors (i1 AND/OR of bf16-compare results hits a Mosaic
        # relayout bug): pair-AND = min, OR = max, one scalar compare after
        # the reduce. f32 diffs of bf16 operands are exact, and
        # bf16_round(d) > t implies d > t for bf16-representable t, so the
        # f32 pretest stays a necessary condition for the bf16 chain.
        def cdiff(dy, dx):
            t = jax.lax.slice(
                x, (4 + dy, 4 + dx), (4 + dy + band, 4 + dx + chunk_w)
            )
            return (t - c0).astype(pret_dtype)

        dn, de, ds, dw = cdiff(-3, 0), cdiff(0, 3), cdiff(3, 0), cdiff(0, -3)
        pairs = ((dn, de), (de, ds), (ds, dw), (dw, dn))
        bright_m = None
        dark_m = None
        for a, b2 in pairs:
            pb = jnp.minimum(a, b2)          # pair both-bright witness
            pd = jnp.maximum(a, b2)          # pair both-dark witness (neg)
            bright_m = pb if bright_m is None else jnp.maximum(bright_m, pb)
            dark_m = pd if dark_m is None else jnp.minimum(dark_m, pd)
        witness = jnp.maximum(bright_m, -dark_m)
        occupied = jnp.max(witness.astype(jnp.float32)) > threshold

        @pl.when(occupied)
        def _(x=x, ci=ci):
            ch, cw = h - 6, chunk_w + 2 * HALO - 6
            center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

            def tap(dy, dx):
                return jax.lax.slice(
                    x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw))

            diffs = [(tap(dy, dx) - center).astype(jnp.bfloat16)
                     for (dy, dx) in CIRCLE_OFFSETS]
            sufn, sufx = list(diffs), list(diffs)
            for blk in (0, 8):
                for s in range(blk + 6, blk - 1, -1):
                    d = diffs[s]
                    sufn[s] = jnp.minimum(d, sufn[s + 1])
                    sufx[s] = jnp.maximum(d, sufx[s + 1])
            pren, prex = list(diffs), list(diffs)
            for blk in (0, 8):
                for j in range(blk + 1, blk + 8):
                    d = diffs[j]
                    pren[j] = jnp.minimum(pren[j - 1], d)
                    prex[j] = jnp.maximum(prex[j - 1], d)
            bright = dark = None
            for s in range(16):
                w9n = jnp.minimum(sufn[s], pren[(s + 8) % 16])
                w9x = jnp.maximum(sufx[s], prex[(s + 8) % 16])
                bright = w9n if bright is None else jnp.maximum(bright, w9n)
                dark = w9x if dark is None else jnp.minimum(dark, w9x)
            dark = -dark
            score = jnp.maximum(bright, dark).astype(jnp.float32)
            score = jnp.where(score > threshold, score, 0.0)

            gy = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
                  + band_start - 1)
            gx = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
                  + ci * chunk_w - 1)
            ring_ok = ((gy >= 3) & (gy < height - 3)
                       & (gx >= 3) & (gx < true_width - 3))
            score = jnp.where(ring_ok, score, 0.0)

            def nbr(dy, dx, score=score):
                return jax.lax.slice(
                    score, (1 + dy, 1 + dx),
                    (1 + dy + band, 1 + dx + chunk_w))

            s0 = nbr(0, 0)
            neigh = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    nb = nbr(dy, dx)
                    neigh = nb if neigh is None else jnp.maximum(neigh, nb)
            out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = (
                jnp.where(s0 >= neigh, s0, 0.0))

        @pl.when(jnp.logical_not(occupied))
        def _(ci=ci):
            out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = jnp.zeros(
                (band, chunk_w), jnp.float32)


def variant_scores_sparse(img, threshold, band, chunk_w,
                          pret_dtype=jnp.float32):
    h, w = img.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % chunk_w)
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    x = jnp.pad(img.astype(dt),
                ((HALO, HALO + pad_h), (HALO, w_in - w - HALO)))
    n_bands = (h + pad_h) // band
    out = pl.pallas_call(
        partial(_kernel_sparse, threshold=float(threshold), band=band,
                width=w_out, height=h, true_width=w, chunk_w=chunk_w,
                pret_dtype=pret_dtype),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, w_out), jnp.float32),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, w_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x)
    return out[:h, :w]


def main6():
    enable_compilation_cache()
    from bench import synthesize_realistic_frames
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    B, ITERS = 8, 3
    slides, frames_w = synthesize(4, hw, hw, B * (ITERS + 1))
    frames_r = synthesize_realistic_frames(slides, hw, B * (ITERS + 1))

    bf = lambda a: a.astype(jnp.bfloat16)
    variants = [
        ("current  b64 c640", lambda a: fast_scores_pallas(
            bf(a), 20, chunk_w=640, polarity_fused=True)),
        ("sparse   b64 c640", lambda a: variant_scores_sparse(bf(a), 20, 64, 640)),
        ("sparse   b32 c640", lambda a: variant_scores_sparse(bf(a), 20, 32, 640)),
        ("sparse   b16 c640", lambda a: variant_scores_sparse(bf(a), 20, 16, 640)),
        ("sparsebf b64 c640", lambda a: variant_scores_sparse(
            bf(a), 20, 64, 640, pret_dtype=jnp.bfloat16)),
        ("sparsebf b32 c640", lambda a: variant_scores_sparse(
            bf(a), 20, 32, 640, pret_dtype=jnp.bfloat16)),
    ]
    for content, frames in (("worst", frames_w), ("realistic", frames_r)):
        print(f"== {content} content ==", flush=True)
        ref_val = None
        for name, fn in variants:
            def run(fr, f=fn):
                def one(im):
                    atlas = F.build_pyramid(im, cfg.orb)
                    return jnp.sum(f(atlas))
                return jax.lax.map(one, fr)
            try:
                jf = jax.jit(run)
                batches = [jnp.asarray(frames[i * B:(i + 1) * B])
                           for i in range(ITERS + 1)]
                t0 = time.time(); ref = np.asarray(jf(batches[0]))
                comp = time.time() - t0
                ts = []
                for i in range(1, ITERS + 1):
                    t0 = time.time(); np.asarray(jf(batches[i]))
                    ts.append(time.time() - t0)
                if ref_val is None:
                    ref_val = ref[0]
                agree = ("OK" if abs(ref[0] - ref_val) < 1
                         else f"MISMATCH({ref[0]:.0f} vs {ref_val:.0f})")
                print(f"{name}  {min(ts)*1000/B:7.2f} ms/frame "
                      f"(compile {comp:.0f}s, {agree})", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)
        # exactness: full score maps bit-equal on one frame of each batch
        cur = jax.jit(lambda im: fast_scores_pallas(
            bf(F.build_pyramid(im, cfg.orb)), 20, chunk_w=640,
            polarity_fused=True))
        sp = jax.jit(lambda im: variant_scores_sparse(
            bf(F.build_pyramid(im, cfg.orb)), 20, 64, 640))
        a = np.asarray(cur(jnp.asarray(frames[0])))
        b = np.asarray(sp(jnp.asarray(frames[0])))
        print(f"exactness ({content}): bit-equal={np.array_equal(a, b)} "
              f"nnz cur={np.count_nonzero(a)} sparse={np.count_nonzero(b)}",
              flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "sparse":
    main6()
