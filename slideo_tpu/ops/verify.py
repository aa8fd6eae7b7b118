"""Warped-image similarity verification.

Device-side equivalent of the reference's final check
(crates/matching-opencv/src/lib.rs:335-368): warp the frame into slide space
with the inverse of the RANSAC transform, downscale to the comparison
thumbnail, and compute the L2 similarity against the slide's thumbnail.

Design: the reference warps the full-resolution frame and then
INTER_AREA-downscales (two passes over megapixels). Here each slide-thumbnail
pixel directly samples the *area-downscaled frame thumbnail* — the thumbnail
is the INTER_AREA prefilter, its ~0.5 MB source lives in VMEM, and the whole
verification is ~120k bilinear samples per candidate instead of megapixel
warps + gathers from a 2 MP HBM-resident source.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import compute_similarity, small_size, to_small_image
from .ransac import Similarity

__all__ = ["warp_similarity"]


def _bilinear_image(
    img: jax.Array, x: jax.Array, y: jax.Array, chunk: int = 2048
) -> jax.Array:
    """Bilinear sample [H, W] image at float coords; out-of-bounds -> 0.

    Gather-free: bilinear taps are densified into tent-weight matrices so the
    sampling runs as one MXU contraction plus a row-weighted sum (the same
    trick as ops/orb.sample_patches — per-element gathers are pathologically
    slow on TPU). value_n = rowsum((Ry @ img) * Cx) with Ry [N, H], Cx [N, W].

    Sampling is scanned in ``chunk``-point blocks so the [chunk, W] row
    profiles stay at VMEM scale (one [N, W] block for a dense 120k-point
    verification grid is ~220 MB of HBM round-trips per candidate).
    """
    h, w = img.shape
    inb = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    n = x.shape[0]
    grid_y = jnp.arange(h, dtype=jnp.float32)
    grid_x = jnp.arange(w, dtype=jnp.float32)

    def sample(xc, yc):
        ry = jnp.maximum(
            0.0, 1.0 - jnp.abs(jnp.clip(yc, 0.0, h - 1.0)[:, None] - grid_y)
        )
        cx = jnp.maximum(
            0.0, 1.0 - jnp.abs(jnp.clip(xc, 0.0, w - 1.0)[:, None] - grid_x)
        )
        rows = jnp.einsum("nh,hw->nw", ry, img, preferred_element_type=jnp.float32)
        return jnp.sum(rows * cx, axis=-1)

    if n <= chunk:
        val = sample(x, y)
    else:
        pad = (-n) % chunk
        xp = jnp.pad(x, (0, pad)).reshape(-1, chunk)
        yp = jnp.pad(y, (0, pad)).reshape(-1, chunk)
        val = jax.lax.map(lambda args: sample(*args), (xp, yp)).reshape(-1)[:n]
    return jnp.where(inb, val, 0.0)


def warp_similarity(
    frame: jax.Array | None,
    transforms: Similarity,
    slide_smalls: jax.Array,
    cand_slide_ids: jax.Array,
    slide_hw: tuple[int, int],
    max_area: int = 300 * 400,
    stride: int = 1,
    chunk: int = 8192,
    frame_small: jax.Array | None = None,
    frame_hw: tuple[int, int] | None = None,
) -> jax.Array:
    """Similarity of the warped frame vs each candidate slide thumbnail.

    frame:          [H, W] float32 grayscale full-resolution frame, or None
                    when a precomputed ``frame_small`` (+ static frame_hw)
                    is supplied — the batched pipeline computes thumbnails
                    once in its feature phase so full-res frames need not
                    stay live through the cascade
    transforms:     Similarity with [T]-shaped fields, mapping full-res slide
                    coords -> full-res frame coords (RANSAC direction)
    slide_smalls:   [S, hs, ws] float32 slide thumbnails
    cand_slide_ids: [T] int32
    slide_hw:       static full-resolution slide (page) size (Hs, Ws)

    Returns [T] float32 similarities (image_utils.rs:22-27 formula with the
    grayscale channel count).

    All candidates' sample points are flattened into ONE point stream and
    scanned in large chunks — candidate-sequential maps cost ~60 tiny
    dispatches of sub-MXU-size work per frame; flattened, the same sampling
    is ~13 full-size chunks regardless of candidate count.
    """
    hs, ws = slide_smalls.shape[-2], slide_smalls.shape[-1]
    full_h, full_w = slide_hw
    fh, fw = frame.shape if frame is not None else frame_hw
    fsh, fsw = small_size(fh, fw, max_area)
    if frame_small is None:
        frame_small = to_small_image(frame, max_area)
    # frame coords -> frame-thumbnail coords (area-resize pixel-center map)
    inv_fx = fsw / fw
    inv_fy = fsh / fh

    # Slide-thumbnail pixel (i, j) center in full slide coords.
    sy = full_h / hs
    sx = full_w / ws
    jj = (jnp.arange(0, ws, stride, dtype=jnp.float32) + 0.5) * sx - 0.5
    ii = (jnp.arange(0, hs, stride, dtype=jnp.float32) + 0.5) * sy - 0.5
    out_h, out_w = ii.shape[0], jj.shape[0]
    gx = jnp.broadcast_to(jj[None, None, :], (1, out_h, out_w))
    gy = jnp.broadcast_to(ii[None, :, None], (1, out_h, out_w))

    t = transforms
    fx = t.a[:, None, None] * gx - t.b[:, None, None] * gy + t.tx[:, None, None]
    fy = t.b[:, None, None] * gx + t.a[:, None, None] * gy + t.ty[:, None, None]
    sxp = (fx + 0.5) * inv_fx - 0.5                 # [T, oh, ow]
    syp = (fy + 0.5) * inv_fy - 0.5
    n_t = sxp.shape[0]
    if jax.default_backend() == "tpu":
        # On-chip sampling kernel (ops/pallas_warp.py): tent matmuls stay in
        # VMEM instead of streaming [chunk, W] profiles through HBM. Points
        # are ordered COLUMN-major over the slide grid so each sample block
        # walks down thumbnail columns — its frame-x span stays narrow and
        # the kernel's windowed fast path engages.
        from .pallas_warp import bilinear_sample_pallas

        sx2 = sxp.transpose(0, 2, 1).reshape(n_t, -1)
        sy2 = syp.transpose(0, 2, 1).reshape(n_t, -1)
        inb = (
            (sx2 >= 0) & (sx2 <= fsw - 1) & (sy2 >= 0) & (sy2 <= fsh - 1)
        )
        vals = bilinear_sample_pallas(frame_small, sx2, sy2)
        warped = (
            jnp.where(inb, vals, 0.0)
            .reshape(n_t, out_w, out_h)
            .transpose(0, 2, 1)
        )
    else:
        warped = _bilinear_image(
            frame_small, sxp.reshape(-1), syp.reshape(-1), chunk=chunk
        )
        warped = warped.reshape(-1, out_h, out_w)   # [T, oh, ow]

    smalls = jnp.take(slide_smalls, cand_slide_ids, axis=0)[:, ::stride, ::stride]
    return jax.vmap(lambda w, s: compute_similarity(w, s, channels=1))(
        warped, smalls
    )


def warp_similarity_homography(
    frame: jax.Array,
    transforms,
    slide_smalls: jax.Array,
    cand_slide_ids: jax.Array,
    slide_hw: tuple[int, int],
    max_area: int = 300 * 400,
    stride: int = 1,
) -> jax.Array:
    """Projective variant of warp_similarity for the SIFT/homography engine.

    transforms: ops.homography.Homography with [T, 8] params mapping full-res
    slide coords -> full-res frame coords.
    """
    from .homography import Homography, apply_homography

    hs, ws = slide_smalls.shape[-2], slide_smalls.shape[-1]
    full_h, full_w = slide_hw
    fh, fw = frame.shape
    fsh, fsw = small_size(fh, fw, max_area)
    frame_small = to_small_image(frame, max_area)
    inv_fx = fsw / fw
    inv_fy = fsh / fh

    sy = full_h / hs
    sx = full_w / ws
    jj = (jnp.arange(0, ws, stride, dtype=jnp.float32) + 0.5) * sx - 0.5
    ii = (jnp.arange(0, hs, stride, dtype=jnp.float32) + 0.5) * sy - 0.5
    out_h, out_w = ii.shape[0], jj.shape[0]
    gx = jnp.broadcast_to(jj[None, :], (out_h, out_w))
    gy = jnp.broadcast_to(ii[:, None], (out_h, out_w))
    grid = jnp.stack([gx, gy], axis=-1)

    f = jax.vmap(lambda h: apply_homography(Homography(h), grid))(transforms.h)
    sxp = (f[..., 0] + 0.5) * inv_fx - 0.5                 # [T, oh, ow]
    syp = (f[..., 1] + 0.5) * inv_fy - 0.5
    n_t = sxp.shape[0]
    if jax.default_backend() == "tpu":
        from .pallas_warp import bilinear_sample_pallas

        sx2 = sxp.transpose(0, 2, 1).reshape(n_t, -1)
        sy2 = syp.transpose(0, 2, 1).reshape(n_t, -1)
        inb = (sx2 >= 0) & (sx2 <= fsw - 1) & (sy2 >= 0) & (sy2 <= fsh - 1)
        vals = bilinear_sample_pallas(frame_small, sx2, sy2)
        warped = (
            jnp.where(inb, vals, 0.0)
            .reshape(n_t, out_w, out_h)
            .transpose(0, 2, 1)
        )
    else:
        warped = _bilinear_image(
            frame_small, sxp.reshape(-1), syp.reshape(-1)
        ).reshape(-1, out_h, out_w)
    smalls = jnp.take(slide_smalls, cand_slide_ids, axis=0)[:, ::stride, ::stride]
    return jax.vmap(lambda w, s: compute_similarity(w, s, channels=1))(
        warped, smalls
    )
