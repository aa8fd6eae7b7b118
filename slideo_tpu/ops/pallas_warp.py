"""Batched bilinear warp-sampling Pallas kernel for verification.

TPU-native core of the warp-similarity check
(crates/matching-opencv/src/lib.rs:335-368): sample the VMEM-resident frame
thumbnail at every candidate's affine-warped verification grid.

The XLA formulation (ops/verify._bilinear_image) densifies bilinear taps
into [chunk, H] / [chunk, W] tent matrices that round-trip through HBM —
several hundred MB per frame. Here everything stays on-chip, and the tent
matrices are built TRANSPOSED (image axes in sublanes, sample points in
lanes) so no layout change is ever needed:

    ryT [H, P]  = relu(1 - |row_iota - sy[1, P]|)      (broadcast, no gather)
    G   [W, P]  = frame^T @ ryT                         (one MXU contraction)
    val [1, P]  = sum_sublanes(G * cxT)                 (VPU reduce)

Grid = (candidates, point blocks); the transposed frame thumbnail is a
revisited VMEM block (loaded once). Out-of-bounds handling matches the XLA
path: coordinates clip for sampling, callers mask true out-of-bounds points.

Windowed fast path: when a point block's x-coordinates span a narrow band
of the image (callers order verification points column-major over the slide
grid, so consecutive points walk DOWN one thumbnail column — their frame-x
stays within ~(block columns + rotation drift)), the column-tent build and
the final sublane reduction run on a [WWIN, PB] window of the image instead
of the full [W8, PB] — the two terms that dominated the kernel. Per-block
window starts and a full-path fallback flag (engaged for extreme rotations
whose x-span exceeds the window) are precomputed by the host and passed as
scalar-prefetch args.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bilinear_sample_pallas"]

PB = 2048  # sample points per grid step
WWIN = 64  # x-window sublanes for the coherent fast path


def _kernel(x0_ref, fb_ref, ft_ref, sx_ref, sy_ref, out_ref,
            *, h: int, w: int, nblk: int, wwin: int):
    ti, pi = pl.program_id(0), pl.program_id(1)
    idx = ti * nblk + pi
    sy = jnp.clip(sy_ref[0], 0.0, float(h - 1))   # [1, PB]
    sx = jnp.clip(sx_ref[0], 0.0, float(w - 1))
    fh8, fw8 = ft_ref.shape[1], ft_ref.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (fh8, PB), 0).astype(jnp.float32)
    ryt = jnp.maximum(0.0, 1.0 - jnp.abs(row_i - sy))         # [H8, PB]

    @pl.when(fb_ref[idx] == 0)
    def _():
        # x0_ref holds the window start divided by 8: multiplying back in
        # kernel lets Mosaic prove the sublane offset is 8-aligned.
        x0 = x0_ref[idx] * 8
        ftw = ft_ref[pl.ds(x0, wwin), :]                      # [WWIN, H8]
        g = jax.lax.dot_general(
            ftw.astype(jnp.bfloat16), ryt.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [WWIN, PB]
        col_i = (
            jax.lax.broadcasted_iota(jnp.int32, (wwin, PB), 0) + x0
        ).astype(jnp.float32)
        cxt = jnp.maximum(0.0, 1.0 - jnp.abs(col_i - sx))
        out_ref[0] = jnp.sum(g * cxt, axis=0, keepdims=True)

    @pl.when(fb_ref[idx] != 0)
    def _():
        g = jax.lax.dot_general(
            ft_ref[:].astype(jnp.bfloat16), ryt.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [W8, PB]
        col_i = jax.lax.broadcasted_iota(jnp.int32, (fw8, PB), 0).astype(jnp.float32)
        cxt = jnp.maximum(0.0, 1.0 - jnp.abs(col_i - sx))
        out_ref[0] = jnp.sum(g * cxt, axis=0, keepdims=True)


def bilinear_sample_pallas(
    img: jax.Array,
    xs: jax.Array,
    ys: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Bilinear-sample a [H, W] image at [T, P] float coords -> [T, P].

    Coordinates clip to the image for sampling (the caller zeroes true
    out-of-bounds points, like ops/verify._bilinear_image). bf16 MXU inputs:
    worst-case value error ~0.5 on a 255 scale, averaged over ~10k-pixel
    similarity sums. Point blocks whose x-span fits WWIN image columns take
    the windowed fast path (identical values — the skipped columns have
    zero tent weight); others fall back to the full-width form.
    """
    h, w = img.shape
    t, p = xs.shape
    p_pad = (-p) % PB
    if p_pad:
        # Padding repeats the last point: keeps pad blocks x-coherent so
        # they stay on the fast path (zero-pads would span [0, x_max]).
        xs = jnp.concatenate(
            [xs, jnp.broadcast_to(xs[:, -1:], (t, p_pad))], axis=1
        )
        ys = jnp.concatenate(
            [ys, jnp.broadcast_to(ys[:, -1:], (t, p_pad))], axis=1
        )
    pp = p + p_pad
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    ft = jnp.pad(img.astype(jnp.float32).T, ((0, w8 - w), (0, h8 - h)))

    nblk = pp // PB
    wwin = min(WWIN, w8)
    sxc = jnp.clip(xs, 0.0, float(w - 1)).reshape(t, nblk, PB)
    x0b = jnp.floor(jnp.min(sxc, axis=-1)).astype(jnp.int32) // 8
    x0b = jnp.clip(x0b, 0, max(w8 - wwin, 0) // 8)
    xmax = jnp.ceil(jnp.max(sxc, axis=-1)).astype(jnp.int32)
    fb = (xmax > x0b * 8 + wwin - 1).astype(jnp.int32)

    xs3 = xs.reshape(t, 1, pp)
    ys3 = ys.reshape(t, 1, pp)
    out = pl.pallas_call(
        partial(_kernel, h=h, w=w, nblk=nblk, wwin=wwin),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t, nblk),
            in_specs=[
                pl.BlockSpec((w8, h8), lambda ti, pi, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PB), lambda ti, pi, *_: (ti, 0, pi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PB), lambda ti, pi, *_: (ti, 0, pi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, PB), lambda ti, pi, *_: (ti, 0, pi),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((t, 1, pp), jnp.float32),
        interpret=interpret,
    )(x0b.reshape(-1), fb.reshape(-1), ft, xs3, ys3)
    return out.reshape(t, pp)[:, :p]
