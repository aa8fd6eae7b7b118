"""Fused FAST-9/16 corner scoring + 3x3 NMS as a Pallas TPU kernel.

The XLA formulation (ops/fast.py) materializes 16 rolled copies of the image
([16, H, W]) and runs a multi-pass min/max cascade plus a separate NMS
reduce_window — several full HBM round-trips. This kernel processes the
image in VMEM-resident row bands with a 4-pixel halo: each band is DMA'd
from HBM once (double-buffered: band i+1's copy overlaps band i's compute),
the 16 circle taps become static slices of the band, the 9-window cascade
and NMS stay on-chip, and each output element is written exactly once.

Band blocks overlap by 2*HALO rows, which BlockSpec's block-index mapping
cannot express — the kernel keeps the input in HBM (memory_space=ANY) and
issues its own async copies into scratch.

Compute form (measured across variants, tools/bench_fast_variants.py):
- 9-window circular reductions via van Herk/Gil-Werman prefix/suffix chains
  (59 vector ops per polarity vs 79 for the log cascade, ~34 live planes).
- bf16 planes (f32 measured slightly slower; VPU op rate is otherwise
  dtype-insensitive on v5e).
- Wide bands (64 rows) with the compute chunked over 512-lane column
  groups so per-chunk transients fit VMEM: fewer grid steps beat smaller
  per-step footprints (band 16 unchunked was ~10% slower end-to-end).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS

__all__ = ["fast_scores_pallas", "fast_scores_pallas_batch"]

HALO = 4  # 3 px circle radius + 1 px NMS neighborhood


def _kernel(
    x_hbm, out_ref, scratch, sem, *,
    threshold: float, band: int, width: int, height: int, true_width: int,
    chunk_w: int, batched: bool = False, polarity_fused: bool = False,
    sparse_skip: bool = False, min_first: bool = False,
):
    if batched:
        # Grid (B, n_bands): one launch scores a whole frame batch — the
        # per-launch fixed cost (pipeline fill, prologue) amortizes over
        # B * n_bands steps instead of n_bands.
        fi = pl.program_id(0)
        i = pl.program_id(1)
        n = pl.num_programs(1)
        nf = pl.num_programs(0)

        def copy(slot, step):
            # step indexes the flattened (frame, band) sequence so the
            # prefetch of the next frame's first band crosses the frame edge.
            f, b = step // n, step % n
            return pltpu.make_async_copy(
                x_hbm.at[f, pl.ds(b * band, band + 2 * HALO), :],
                scratch.at[slot], sem.at[slot],
            )

        step = fi * n + i
        total = nf * n

        @pl.when(step == 0)
        def _():
            copy(0, 0).start()

        @pl.when(step + 1 < total)
        def _():
            copy((step + 1) % 2, step + 1).start()

        copy(step % 2, step).wait()
        xb = scratch[step % 2]
    else:
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
            xb, (0, ci * chunk_w),
            (h, ci * chunk_w + chunk_w + 2 * HALO),
        )

        def _chunk_body(x=x, ci=ci):
            _compute_chunk(
                x, ci, out_ref, band_start=band_start, threshold=threshold,
                band=band, height=height, true_width=true_width,
                chunk_w=chunk_w, batched=batched,
                polarity_fused=polarity_fused, h=h, min_first=min_first,
            )

        if not sparse_skip:
            _chunk_body()
            continue

        # Compass pretest early-out (chip-measured r5, 1080p atlas batch 8:
        # realistic lecture content -0.94 ms/frame — only ~18% of
        # (64, 640) tiles hold any candidate — worst-case corner-dense
        # content +0.48 ms; bit-equal on both). EXACT: a bright/dark
        # 9-contiguous arc always contains two adjacent compass taps
        # (positions 0,4,8,12 are 4 apart; any 9-of-16 window covers two
        # consecutive multiples of 4), so a pair-witness above threshold
        # somewhere in the chunk is necessary for any nonzero score.
        # No bool vectors (i1 combines of bf16 compares hit a Mosaic
        # relayout bug): pair-AND = min, OR = max, one scalar compare
        # after the f32 max-reduce. f32 diffs of bf16 operands are exact
        # and bf16_round(d) > t implies d > t for bf16-representable t,
        # so the f32 pretest stays a necessary condition for the bf16
        # chain's strict > threshold test.
        # With min_first the chain tests bf16(tap) - c_f32 (exact f32), so
        # the pretest TAPS must round through bf16 the same way to stay a
        # necessary condition (an f32 tap can round UP into clearing the
        # threshold). The center stays unrounded — the chain subtracts the
        # f32 center. Identity casts when the atlas is already bf16.
        def tap_pre(v):
            return (
                v.astype(jnp.bfloat16).astype(jnp.float32)
                if min_first else v.astype(jnp.float32)
            )

        c0 = jax.lax.slice(x, (4, 4), (4 + band, 4 + chunk_w))

        def cdiff(dy, dx, x=x):
            t = jax.lax.slice(
                x, (4 + dy, 4 + dx), (4 + dy + band, 4 + dx + chunk_w)
            )
            return tap_pre(t) - c0.astype(jnp.float32)

        dn, de, ds, dw = cdiff(-3, 0), cdiff(0, 3), cdiff(3, 0), cdiff(0, -3)
        bright_m = dark_m = None
        for a, b2 in ((dn, de), (de, ds), (ds, dw), (dw, dn)):
            pb = jnp.minimum(a, b2)   # pair both-bright witness
            pd = jnp.maximum(a, b2)   # pair both-dark witness (negated)
            bright_m = pb if bright_m is None else jnp.maximum(bright_m, pb)
            dark_m = pd if dark_m is None else jnp.minimum(dark_m, pd)
        occupied = jnp.max(jnp.maximum(bright_m, -dark_m)) > threshold

        @pl.when(occupied)
        def _():
            _chunk_body()

        @pl.when(jnp.logical_not(occupied))
        def _(ci=ci):
            zeros = jnp.zeros((band, chunk_w), jnp.float32)
            if batched:
                out_ref[0, :, ci * chunk_w:(ci + 1) * chunk_w] = zeros
            else:
                out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = zeros


def _compute_chunk(
    x, ci, out_ref, *, band_start, threshold, band, height, true_width,
    chunk_w, batched, polarity_fused, h, min_first=False,
):
    ch, cw = h - 6, chunk_w + 2 * HALO - 6
    center = jax.lax.slice(x, (3, 3), (3 + ch, 3 + cw))

    def tap(dy, dx):
        return jax.lax.slice(
            x, (3 + dy, 3 + dx), (3 + dy + ch, 3 + dx + cw)
        )

    if min_first:
        # config.fast_min_first: reduce RAW taps, subtract the center once
        # from the window extrema — max_s min_w (tap - c) ==
        # (max_s min_w tap) - c exactly, and the late f32 subtract of bf16
        # operands is exact: 16 bf16 diff planes (and their rounding)
        # disappear from the chunk.
        planes = [
            tap(dy, dx).astype(jnp.bfloat16) for (dy, dx) in CIRCLE_OFFSETS
        ]
    else:
        planes = [
            (tap(dy, dx) - center).astype(jnp.bfloat16)
            for (dy, dx) in CIRCLE_OFFSETS
        ]

    # Circular 9-window reductions via van Herk/Gil-Werman: per-8-block
    # prefix/suffix chains, window[s] = op(suffix[s], prefix[s+8]).
    # wmin = max_s min_window(planes), wmax = min_s max_window(planes).
    def seg_reduce(op, outer):
        suf = list(planes)
        for blk in (0, 8):
            for s in range(blk + 6, blk - 1, -1):
                suf[s] = op(planes[s], suf[s + 1])
        pre = list(planes)
        for blk in (0, 8):
            for j in range(blk + 1, blk + 8):
                pre[j] = op(pre[j - 1], planes[j])
        acc = None
        for s in range(16):
            w9 = op(suf[s], pre[(s + 8) % 16])
            acc = w9 if acc is None else outer(acc, w9)
        return acc

    if polarity_fused:
        # Interleave the bright/dark chains so each input plane is read
        # once per chain step (identical math, different schedule).
        sufn, sufx = list(planes), list(planes)
        for blk in (0, 8):
            for s in range(blk + 6, blk - 1, -1):
                d = planes[s]
                sufn[s] = jnp.minimum(d, sufn[s + 1])
                sufx[s] = jnp.maximum(d, sufx[s + 1])
        pren, prex = list(planes), list(planes)
        for blk in (0, 8):
            for j in range(blk + 1, blk + 8):
                d = planes[j]
                pren[j] = jnp.minimum(pren[j - 1], d)
                prex[j] = jnp.maximum(prex[j - 1], d)
        wmin = wmax = None
        for s in range(16):
            w9n = jnp.minimum(sufn[s], pren[(s + 8) % 16])
            w9x = jnp.maximum(sufx[s], prex[(s + 8) % 16])
            wmin = w9n if wmin is None else jnp.maximum(wmin, w9n)
            wmax = w9x if wmax is None else jnp.minimum(wmax, w9x)
    else:
        wmin = seg_reduce(jnp.minimum, jnp.maximum)
        wmax = seg_reduce(jnp.maximum, jnp.minimum)
    if min_first:
        cf = center.astype(jnp.float32)
        score = jnp.maximum(
            wmin.astype(jnp.float32) - cf, cf - wmax.astype(jnp.float32)
        )
    else:
        score = jnp.maximum(wmin, -wmax).astype(jnp.float32)
    score = jnp.where(score > threshold, score, 0.0)

    # Zero the global 3px image ring BEFORE NMS (parity with ops/fast.py:
    # ring pixels must not suppress interior neighbors). score[r, c] maps
    # to image row (band_start + r - 1), col (ci*chunk_w + c - 1).
    gy = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + band_start - 1
    gx = (
        jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        + ci * chunk_w - 1
    )
    ring_ok = (
        (gy >= 3) & (gy < height - 3) & (gx >= 3) & (gx < true_width - 3)
    )
    score = jnp.where(ring_ok, score, 0.0)

    # 3x3 NMS on the score plane; the extra ring in ch/cw feeds borders.
    def nbr(dy, dx):
        return jax.lax.slice(
            score, (1 + dy, 1 + dx), (1 + dy + band, 1 + dx + chunk_w)
        )

    s0 = nbr(0, 0)
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = nbr(dy, dx)
            neigh = nb if neigh is None else jnp.maximum(neigh, nb)
    res = jnp.where(s0 >= neigh, s0, 0.0)
    if batched:
        out_ref[0, :, ci * chunk_w:(ci + 1) * chunk_w] = res
    else:
        out_ref[:, ci * chunk_w:(ci + 1) * chunk_w] = res


def fast_scores_pallas(
    img: jax.Array,
    threshold: int,
    band: int = 64,
    chunk_w: int = 512,
    interpret: bool = False,
    polarity_fused: bool = False,
    sparse_skip: bool = False,
    min_first: bool = False,
) -> jax.Array:
    """NMS'd FAST score map of a [H, W] float32 image (Pallas kernel).

    Equivalent to ``nms3x3(fast_scores(img, threshold))`` from ops/fast.py;
    the 3 px ring where the circle would wrap scores 0, like the XLA path.
    """
    h, w = img.shape
    pad_h = (-h) % band
    # Mosaic requires DMA slice shapes 128-aligned in the lane dimension;
    # pad the (halo-extended) width up to a multiple of 128. The output
    # width must be chunk-aligned too.
    w_out = w + ((-w) % chunk_w)
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    dt = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    x = jnp.pad(
        img.astype(dt),
        ((HALO, HALO + pad_h), (HALO, w_in - w - HALO)),
    )
    n_bands = (h + pad_h) // band

    out = pl.pallas_call(
        partial(
            _kernel, threshold=float(threshold), band=band, width=w_out,
            height=h, true_width=w, chunk_w=chunk_w,
            polarity_fused=polarity_fused, sparse_skip=sparse_skip,
            min_first=min_first,
        ),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, w_out), jnp.float32),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (band, w_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x)
    # The 3px image ring is already exactly zero: the kernel zeroes it
    # before NMS (ring_ok), and NMS maps zero-score pixels to zero. No
    # post-mask — it would cost a full extra HBM pass over the score map.
    return out[:h, :w]


def fast_scores_pallas_batch(
    imgs: jax.Array,
    threshold: int,
    band: int = 64,
    chunk_w: int = 512,
    interpret: bool = False,
    polarity_fused: bool = False,
    sparse_skip: bool = False,
    min_first: bool = False,
) -> jax.Array:
    """NMS'd FAST score maps of a [B, H, W] batch in ONE kernel launch.

    Bit-identical per frame to fast_scores_pallas; the grid is (B, n_bands)
    so the launch fixed cost (pipeline fill, Mosaic prologue) is paid once
    per batch instead of once per frame (round-3 perf lever: detect was
    VPU-bound with per-frame launches inside lax.map).
    """
    b, h, w = imgs.shape
    pad_h = (-h) % band
    w_out = w + ((-w) % chunk_w)
    w_in = w_out + 2 * HALO + ((-(w_out + 2 * HALO)) % 128)
    dt = imgs.dtype if imgs.dtype == jnp.bfloat16 else jnp.float32
    x = jnp.pad(
        imgs.astype(dt),
        ((0, 0), (HALO, HALO + pad_h), (HALO, w_in - w - HALO)),
    )
    n_bands = (h + pad_h) // band

    out = pl.pallas_call(
        partial(
            _kernel, threshold=float(threshold), band=band, width=w_out,
            height=h, true_width=w, chunk_w=chunk_w, batched=True,
            polarity_fused=polarity_fused, sparse_skip=sparse_skip,
            min_first=min_first,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h + pad_h, w_out), jnp.float32),
        grid=(b, n_bands),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, band, w_out), lambda f, i: (f, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, band + 2 * HALO, w_in), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x)
    # Ring already zeroed in-kernel (see fast_scores_pallas).
    return out[:, :h, :w]
