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
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bilinear_sample_pallas"]

PB = 2048  # sample points per grid step


def _kernel(ft_ref, sx_ref, sy_ref, out_ref, *, h: int, w: int):
    sy = jnp.clip(sy_ref[0], 0.0, float(h - 1))   # [1, PB]
    sx = jnp.clip(sx_ref[0], 0.0, float(w - 1))
    fh8, fw8 = ft_ref.shape[1], ft_ref.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (fh8, PB), 0).astype(jnp.float32)
    ryt = jnp.maximum(0.0, 1.0 - jnp.abs(row_i - sy))         # [H8, PB]
    col_i = jax.lax.broadcasted_iota(jnp.int32, (fw8, PB), 0).astype(jnp.float32)
    cxt = jnp.maximum(0.0, 1.0 - jnp.abs(col_i - sx))         # [W8, PB]
    g = jax.lax.dot_general(
        ft_ref[:].astype(jnp.bfloat16), ryt.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [W8, PB]
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
    similarity sums.
    """
    h, w = img.shape
    t, p = xs.shape
    p_pad = (-p) % PB
    if p_pad:
        xs = jnp.pad(xs, ((0, 0), (0, p_pad)))
        ys = jnp.pad(ys, ((0, 0), (0, p_pad)))
    pp = p + p_pad
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    ft = jnp.pad(img.astype(jnp.float32).T, ((0, w8 - w), (0, h8 - h)))

    xs3 = xs.reshape(t, 1, pp)
    ys3 = ys.reshape(t, 1, pp)
    out = pl.pallas_call(
        partial(_kernel, h=h, w=w),
        grid=(t, pp // PB),
        in_specs=[
            pl.BlockSpec((w8, h8), lambda ti, pi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PB), lambda ti, pi: (ti, 0, pi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PB), lambda ti, pi: (ti, 0, pi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, PB), lambda ti, pi: (ti, 0, pi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 1, pp), jnp.float32),
        interpret=interpret,
    )(ft, xs3, ys3)
    return out.reshape(t, pp)[:, :p]
