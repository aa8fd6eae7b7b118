"""SIFT-family scale-invariant features, vectorized for TPU.

Second feature family next to ORB (BASELINE.json config 2: "SIFT +
ratio-test kNN + RANSAC homography"). The reference has no SIFT engine, so
there is no behavior to replicate — this is a from-scratch TPU design:

- Gaussian scale space per octave as separable matmul blurs; DoG by
  subtraction; 26-neighbor extrema via static shifted comparisons (the same
  shift-cascade trick as FAST — no gathers).
- Keypoints: top-k |DoG| per octave (approx_max_k), edge rejection via the
  2x2 Hessian ratio test.
- Orientation: dominant bin of a Gaussian-weighted 36-bin gradient
  histogram over the keypoint patch (histogram = 36 masked sums — static).
- Descriptor: 4x4 spatial cells x 8 orientation bins over a rotated
  16x16 sample grid, gradients tent-sampled from the patch (gather-free,
  ops/orb.py machinery), trilinear soft-assignment as small einsums;
  L2-normalized, 0.2-clipped, renormalized (the standard SIFT recipe).

Descriptors are 128-d unit float vectors; matching reuses the
[Q, S] best-match table with dot-product scores (dist^2 = 2 - 2*dot).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SiftConfig
from . import image as image_ops
from .orb import HALF_PATCH, PATCH, extract_patches, sample_patches

__all__ = ["SiftFeatures", "extract_sift"]


class SiftFeatures(NamedTuple):
    """Fixed-size SIFT feature set of one image.

    pts:   [K, 2] float32 (x, y) in full-image coordinates
    desc:  [K, 128] float32, L2-normalized (zeros for invalid slots)
    score: [K] float32 |DoG| response
    scale: [K] float32 octave scale (2**octave) — localization error grows
           with it, so geometric verification uses scale-aware tolerances
    valid: [K] bool
    """

    pts: jax.Array
    desc: jax.Array
    score: jax.Array
    scale: jax.Array
    valid: jax.Array


def _dog_extrema(d_mid, contrast: float, edge_r: float):
    """Spatial extrema mask + response for one DoG level.

    8-neighbor comparison via static rolls (borders masked by caller) and
    the SIFT edge rejection: tr(H)^2/det(H) < (r+1)^2/r on the 2x2 spatial
    Hessian. Scale-axis strictness is intentionally dropped: with a compact
    truncated-kernel scale space the classic 26-neighbor test suppresses
    nearly everything; per-level spatial extrema with contrast + edge tests
    keep detector symmetry between slides and frames (which is what matching
    needs) while octaves + levels provide the scale coverage.
    """
    def nbrs(d):
        vals = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                vals.append(jnp.roll(d, (dy, dx), axis=(0, 1)))
        return vals

    others = nbrs(d_mid)
    omax = others[0]
    omin = others[0]
    for v in others[1:]:
        omax = jnp.maximum(omax, v)
        omin = jnp.minimum(omin, v)
    is_max = (d_mid > omax) & (d_mid > contrast)
    is_min = (d_mid < omin) & (d_mid < -contrast)

    # Edge rejection (2x2 Hessian from finite differences).
    dxx = jnp.roll(d_mid, -1, 1) + jnp.roll(d_mid, 1, 1) - 2 * d_mid
    dyy = jnp.roll(d_mid, -1, 0) + jnp.roll(d_mid, 1, 0) - 2 * d_mid
    dxy = 0.25 * (
        jnp.roll(d_mid, (-1, -1), (0, 1))
        + jnp.roll(d_mid, (1, 1), (0, 1))
        - jnp.roll(d_mid, (-1, 1), (0, 1))
        - jnp.roll(d_mid, (1, -1), (0, 1))
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr * edge_r < (edge_r + 1) ** 2 * det)

    return (is_max | is_min) & edge_ok, jnp.abs(d_mid)


@lru_cache(maxsize=8)
def _descriptor_geometry(cfg_key: tuple) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static sample grid + spatial cell weights for the 4x4x8 descriptor.

    grid: [G, 2] sample offsets (unrotated, in patch px, G = 16*16)
    cell_w: [G, 16] trilinear weight of each sample in each spatial cell
    """
    n_grid, n_cells, radius = cfg_key
    step = 2.0 * radius / n_grid
    coords = (np.arange(n_grid) + 0.5) * step - radius
    gx, gy = np.meshgrid(coords, coords)
    grid = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)  # [G, 2]
    # spatial cell centers (4x4 over the same square)
    cstep = 2.0 * radius / 4
    cc = (np.arange(4) + 0.5) * cstep - radius
    cgx, cgy = np.meshgrid(cc, cc)
    centers = np.stack([cgx.ravel(), cgy.ravel()], -1)  # [16, 2]
    # bilinear (tent) weight of each sample in each cell
    wx = np.maximum(0, 1 - np.abs(grid[:, None, 0] - centers[None, :, 0]) / cstep)
    wy = np.maximum(0, 1 - np.abs(grid[:, None, 1] - centers[None, :, 1]) / cstep)
    cell_w = (wx * wy).astype(np.float32)  # [G, 16]
    # Gaussian window over the descriptor support
    gauss = np.exp(-(grid[:, 0] ** 2 + grid[:, 1] ** 2) / (2 * (radius * 0.5) ** 2))
    return grid, cell_w, gauss.astype(np.float32)


def _descriptors_from_patches(
    patches: jax.Array, cos: jax.Array, sin: jax.Array, radius: float
) -> jax.Array:
    """[K, 128] SIFT descriptors from [K, PATCH, PATCH] blurred patches."""
    grid, cell_w, gauss = _descriptor_geometry((16, 16, float(radius)))
    gxs, gys = grid[:, 0], grid[:, 1]

    # Rotate the sample grid by each keypoint's orientation; sample gradients
    # with two-point central differences of the tent-sampled intensity.
    def rot(c, s, x, y):
        return c * x - s * y, s * x + c * y

    rx, ry = jax.vmap(rot, in_axes=(0, 0, None, None))(cos, sin, gxs, gys)
    # gradient sample offsets (rotated unit steps)
    ex, ey = jax.vmap(rot, in_axes=(0, 0, None, None))(
        cos, sin, jnp.float32(1.0), jnp.float32(0.0)
    )
    fx, fy = jax.vmap(rot, in_axes=(0, 0, None, None))(
        cos, sin, jnp.float32(0.0), jnp.float32(1.0)
    )

    def one(patch, rx, ry, ex, ey, fx, fy):
        # dx along the keypoint's rotated x-axis; dy along rotated y-axis
        v_px = sample_patches(patch[None], (rx + ex)[None], (ry + ey)[None])[0]
        v_mx = sample_patches(patch[None], (rx - ex)[None], (ry - ey)[None])[0]
        v_py = sample_patches(patch[None], (rx + fx)[None], (ry + fy)[None])[0]
        v_my = sample_patches(patch[None], (rx - fx)[None], (ry - fy)[None])[0]
        dx = 0.5 * (v_px - v_mx)
        dy = 0.5 * (v_py - v_my)
        mag = jnp.sqrt(dx * dx + dy * dy) * gauss
        ang = jnp.arctan2(dy, dx)  # relative to keypoint frame already
        # soft-assign to 8 orientation bins (circular tent)
        binf = (ang + jnp.pi) / (2 * jnp.pi) * 8.0
        b0 = jnp.floor(binf)
        frac = binf - b0
        bins = jnp.arange(8, dtype=jnp.float32)
        w0 = (jnp.mod(b0, 8)[:, None] == bins[None, :]) * (1 - frac)[:, None]
        w1 = (jnp.mod(b0 + 1, 8)[:, None] == bins[None, :]) * frac[:, None]
        ori_w = (w0 + w1) * mag[:, None]  # [G, 8]
        desc = jnp.einsum("gc,go->co", cell_w, ori_w)  # [16, 8]
        d = desc.reshape(-1)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
        d = jnp.minimum(d, 0.2)
        return d / jnp.maximum(jnp.linalg.norm(d), 1e-9)

    return jax.vmap(one)(patches, rx, ry, ex, ey, fx, fy)


def _orientations_hist(patches: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dominant gradient orientation per patch via a 36-bin histogram."""
    dx = 0.5 * (jnp.roll(patches, -1, 2) - jnp.roll(patches, 1, 2))
    dy = 0.5 * (jnp.roll(patches, -1, 1) - jnp.roll(patches, 1, 1))
    ys = np.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=np.float32)
    g = np.exp(-(ys[None, :] ** 2 + ys[:, None] ** 2) / (2 * (HALF_PATCH / 2) ** 2))
    mag = jnp.sqrt(dx * dx + dy * dy) * g
    ang = jnp.arctan2(dy, dx)
    binf = jnp.mod((ang + jnp.pi) / (2 * jnp.pi) * 36.0, 36.0).astype(jnp.int32)
    k = patches.shape[0]
    hist = jnp.zeros((k, 36))
    flat_mag = mag.reshape(k, -1)
    flat_bin = binf.reshape(k, -1)
    for b in range(36):  # static loop: 36 masked sums, no scatter
        hist = hist.at[:, b].set(jnp.sum(flat_mag * (flat_bin == b), axis=1))
    best = jnp.argmax(hist, axis=1).astype(jnp.float32)
    theta = (best + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi
    return jnp.cos(theta), jnp.sin(theta)


def extract_sift(img: jax.Array, cfg: SiftConfig) -> SiftFeatures:
    """SIFT-family features of a [H, W] float32 grayscale image."""
    h, w = img.shape
    per_level = []
    base = img
    scale = 1.0
    remaining = cfg.max_keypoints
    n_octaves = cfg.n_octaves
    quota_frac = cfg.octave_quota_decay

    quotas = []
    q = cfg.max_keypoints * (1 - quota_frac) / (1 - quota_frac**n_octaves)
    for o in range(n_octaves):
        quotas.append(max(int(round(q)), 1))
        q *= quota_frac
    quotas[-1] += cfg.max_keypoints - sum(quotas)

    for octave in range(n_octaves):
        oh, ow = base.shape
        min_dim = max(2 * cfg.border + 8, PATCH + 2)
        if oh < min_dim or ow < min_dim:
            per_level.append(
                SiftFeatures(
                    pts=jnp.zeros((quotas[octave], 2), jnp.float32),
                    desc=jnp.zeros((quotas[octave], 128), jnp.float32),
                    score=jnp.zeros((quotas[octave],), jnp.float32),
                    scale=jnp.ones((quotas[octave],), jnp.float32),
                    valid=jnp.zeros((quotas[octave],), bool),
                )
            )
            continue
        # 4 blur levels -> 3 DoGs -> 1 extrema level (the compact variant:
        # one scale sample per octave keeps shapes small; scale coverage
        # comes from the octaves).
        sigmas = [cfg.sigma0 * (2 ** (s / 3)) for s in range(4)]
        blurs = [image_ops.gaussian_blur(base, cfg.blur_ksize, s) for s in sigmas]
        dogs = [blurs[i + 1] - blurs[i] for i in range(3)]
        # union of per-level spatial extrema; response = strongest level
        resp = None
        for dlvl in dogs:
            m, r = _dog_extrema(dlvl, cfg.contrast_threshold, cfg.edge_ratio)
            r = jnp.where(m, r, 0.0)
            resp = r if resp is None else jnp.maximum(resp, r)
        mask = resp > 0
        # 2D subpixel offsets (quadratic fit of the mid DoG): off = -H^-1 g.
        dmid = dogs[1]
        gx_d = 0.5 * (jnp.roll(dmid, -1, 1) - jnp.roll(dmid, 1, 1))
        gy_d = 0.5 * (jnp.roll(dmid, -1, 0) - jnp.roll(dmid, 1, 0))
        dxx = jnp.roll(dmid, -1, 1) + jnp.roll(dmid, 1, 1) - 2 * dmid
        dyy = jnp.roll(dmid, -1, 0) + jnp.roll(dmid, 1, 0) - 2 * dmid
        dxy = 0.25 * (
            jnp.roll(dmid, (-1, -1), (0, 1)) + jnp.roll(dmid, (1, 1), (0, 1))
            - jnp.roll(dmid, (-1, 1), (0, 1)) - jnp.roll(dmid, (1, -1), (0, 1))
        )
        det = dxx * dyy - dxy * dxy
        det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
        off_x = jnp.clip(-(dyy * gx_d - dxy * gy_d) / det, -0.6, 0.6)
        off_y = jnp.clip(-(dxx * gy_d - dxy * gx_d) / det, -0.6, 0.6)
        ys_i = jax.lax.broadcasted_iota(jnp.int32, (oh, ow), 0)
        xs_i = jax.lax.broadcasted_iota(jnp.int32, (oh, ow), 1)
        inb = (
            (ys_i >= cfg.border)
            & (ys_i < oh - cfg.border)
            & (xs_i >= cfg.border)
            & (xs_i < ow - cfg.border)
        )
        score_map = jnp.where(mask & inb, resp, 0.0)
        kq = quotas[octave]
        top, idx = jax.lax.approx_max_k(score_map.reshape(-1), kq, recall_target=0.95)
        yy = idx // ow
        xx = idx % ow
        valid = top > 0.0

        patches = extract_patches(blurs[1], yy, xx)
        cos, sin = _orientations_hist(patches)
        desc = _descriptors_from_patches(patches, cos, sin, cfg.descriptor_radius)
        desc = jnp.where(valid[:, None], desc, 0.0)
        ox = jnp.take(off_x.reshape(-1), idx)
        oy = jnp.take(off_y.reshape(-1), idx)
        pts = jnp.stack(
            [xx.astype(jnp.float32) + ox, yy.astype(jnp.float32) + oy], -1
        ) * jnp.float32(scale)
        per_level.append(
            SiftFeatures(
                pts=pts, desc=desc, score=top,
                scale=jnp.full((kq,), scale, jnp.float32), valid=valid,
            )
        )

        base = image_ops.resize(base, (max(oh // 2, 1), max(ow // 2, 1)))
        scale *= 2.0

    feats = SiftFeatures(
        pts=jnp.concatenate([f.pts for f in per_level]),
        desc=jnp.concatenate([f.desc for f in per_level]),
        score=jnp.concatenate([f.score for f in per_level]),
        scale=jnp.concatenate([f.scale for f in per_level]),
        valid=jnp.concatenate([f.valid for f in per_level]),
    )
    return feats
