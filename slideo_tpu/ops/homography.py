"""Vectorized RANSAC for 8-DoF homographies (batched over candidates).

Companion to ops/ransac.py (4-DoF similarity) for the SIFT engine's
perspective verification (BASELINE.json configs 2/4: "RANSAC homography",
camera-recorded talks with perspective). Same architecture: all minimal
(4-point) hypotheses drawn up front, solved as batched 8x8 linear systems
on device, chunk-scanned inlier voting, least-squares refinement via normal
equations on the inlier set.

Coordinates are pre-scaled by 1/NORM for f32 conditioning; the transform is
returned in the ORIGINAL pixel frame (the scale conjugation cancels for the
mixed terms because both sides use the same NORM).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatchConfig

__all__ = ["Homography", "ransac_homography", "apply_homography"]

_HYP_CHUNK = 250
NORM = 1024.0  # coordinate pre-scale for f32 conditioning


class Homography(NamedTuple):
    """h = [h0..h7], h8=1:  u = (h0 x + h1 y + h2)/(h6 x + h7 y + 1)."""

    h: jax.Array  # [..., 8]


def apply_homography(t: Homography, pts: jax.Array) -> jax.Array:
    """Apply to [..., 2] points; t.h broadcasts against pts[..., 0]."""
    x, y = pts[..., 0], pts[..., 1]
    h = t.h
    w = h[..., 6] * x + h[..., 7] * y + 1.0
    w = jnp.where(jnp.abs(w) > 1e-8, w, 1e-8)
    u = (h[..., 0] * x + h[..., 1] * y + h[..., 2]) / w
    v = (h[..., 3] * x + h[..., 4] * y + h[..., 5]) / w
    return jnp.stack([u, v], axis=-1)


def _dlt_rows(p: jax.Array, q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """DLT equations for correspondences p[..., M, 2] -> q[..., M, 2].

    Returns (A [..., 2M, 8], b [..., 2M]) with A h = b, h8 = 1.
    """
    x, y = p[..., 0], p[..., 1]
    u, v = q[..., 0], q[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row_u = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], axis=-1)
    row_v = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], axis=-1)
    a = jnp.concatenate([row_u, row_v], axis=-2)
    b = jnp.concatenate([u, v], axis=-1)
    return a, b


def _solve_h(a: jax.Array, b: jax.Array, w: jax.Array | None = None):
    """Least-squares h from A h = b via ridge-stabilized normal equations."""
    if w is not None:
        a = a * w[..., None]
        b = b * w
    ata = jnp.einsum("...mi,...mj->...ij", a, a)
    atb = jnp.einsum("...mi,...m->...i", a, b)
    ata = ata + 1e-6 * jnp.eye(8, dtype=ata.dtype)
    h = jnp.linalg.solve(ata, atb[..., None])[..., 0]
    ok = jnp.isfinite(h).all(axis=-1)
    return Homography(jnp.where(ok[..., None], h, 0.0)), ok


def _inliers(
    t: Homography, src, dst, valid, thresh, tol=None
) -> jax.Array:
    """Inlier mask; ``tol`` [..., M] scales the threshold per match
    (keypoint localization error grows with the detection octave)."""
    proj = apply_homography(Homography(t.h[..., None, :]), src)
    err2 = jnp.sum((proj - dst) ** 2, axis=-1)
    t2 = thresh * thresh if tol is None else (thresh * tol) ** 2
    return (err2 < t2) & valid


class HomographyRansacResult(NamedTuple):
    transform: Homography      # h in ORIGINAL pixel coordinates, [C, 8]
    inliers: jax.Array         # [C, M] bool
    rating: jax.Array          # [C] float32 inlier count
    ok: jax.Array              # [C]


def _denormalize(h_n: jax.Array) -> jax.Array:
    """h in NORM-scaled coords -> original pixels.

    With T = diag(1/N, 1/N, 1): H_px = T^-1 H_n T, i.e. the translation
    column scales by N and the perspective row by 1/N.
    """
    return jnp.stack(
        [
            h_n[..., 0], h_n[..., 1], h_n[..., 2] * NORM,
            h_n[..., 3], h_n[..., 4], h_n[..., 5] * NORM,
            h_n[..., 6] / NORM, h_n[..., 7] / NORM,
        ],
        axis=-1,
    )


def ransac_homography(
    src: jax.Array,
    dst: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    cfg: MatchConfig,
    tol: jax.Array | None = None,
) -> HomographyRansacResult:
    """RANSAC homography fits for C candidates at once.

    src, dst: [C, M, 2] (slide -> frame) with valid entries compacted to the
    front (select_candidates* output). tol: optional [C, M] per-match
    threshold multipliers (e.g. the keypoints' octave scale).
    """
    c, m, _ = src.shape
    n_hyp = cfg.ransac_iters
    src_n = src / NORM
    dst_n = dst / NORM
    thresh_n = cfg.ransac_threshold / NORM
    n_valid = jnp.sum(valid, axis=-1).astype(jnp.int32)

    u = jax.random.uniform(key, (c, n_hyp, 4))
    idx = jnp.minimum(
        (u * n_valid[:, None, None]).astype(jnp.int32),
        jnp.maximum(n_valid - 1, 0)[:, None, None],
    )  # [C, H, 4]
    # distinct indices within each 4-sample
    d01 = idx[..., 0] != idx[..., 1]
    d = d01
    for a in range(4):
        for b_ in range(a + 1, 4):
            d = d & (idx[..., a] != idx[..., b_])
    enough = (n_valid >= 4)[:, None]

    take = lambda arr: jnp.take_along_axis(
        arr, idx.reshape(c, -1, 1), axis=1
    ).reshape(c, n_hyp, 4, 2)
    p = take(src_n)
    q = take(dst_n)
    a4, b4 = _dlt_rows(p, q)  # [C, H, 8, 8], [C, H, 8]
    hyp, hyp_ok = _solve_h(a4, b4)
    hyp_ok &= d & enough

    n_chunks = max(n_hyp // _HYP_CHUNK, 1)
    hyp_c = hyp.h[:, : n_chunks * _HYP_CHUNK].reshape(c, n_chunks, -1, 8).swapaxes(0, 1)
    ok_c = hyp_ok[:, : n_chunks * _HYP_CHUNK].reshape(c, n_chunks, -1).swapaxes(0, 1)

    init = (jnp.full((c,), -1.0), jnp.zeros((c, 8)))

    def step(carry, inp):
        best_n, best_h = carry
        h_chunk, okk = inp  # [C, h, 8], [C, h]
        inl = _inliers(
            Homography(h_chunk),
            src_n[:, None, :, :],
            dst_n[:, None, :, :],
            valid[:, None, :],
            thresh_n,
            None if tol is None else tol[:, None, :],
        )
        counts = jnp.where(okk, jnp.sum(inl, axis=-1).astype(jnp.float32), -1.0)
        cb = jnp.argmax(counts, axis=-1)
        cn = jnp.take_along_axis(counts, cb[:, None], 1)[:, 0]
        ch = jnp.take_along_axis(h_chunk, cb[:, None, None], 1)[:, 0]
        better = cn > best_n
        return (
            jnp.maximum(best_n, cn),
            jnp.where(better[:, None], ch, best_h),
        ), None

    (best_n, best_h), _ = jax.lax.scan(step, init, (hyp_c, ok_c))
    found = best_n >= 4

    a_all, b_all = _dlt_rows(src_n, dst_n)  # [C, 2M, 8], [C, 2M]

    def refine(h, _):
        inl = _inliers(Homography(h), src_n, dst_n, valid, thresh_n, tol)
        w = jnp.concatenate([inl, inl], axis=-1).astype(jnp.float32)
        t_new, ok = _solve_h(a_all, b_all, w)
        keep = ok & found & (jnp.sum(inl, -1) >= 4)
        return jnp.where(keep[:, None], t_new.h, h), None

    best_h, _ = jax.lax.scan(refine, best_h, None, length=cfg.ransac_refine_iters)

    inl = _inliers(Homography(best_h), src_n, dst_n, valid, thresh_n, tol)
    inl &= found[:, None]
    rating = jnp.sum(inl, axis=-1).astype(jnp.float32)
    return HomographyRansacResult(
        transform=Homography(_denormalize(best_h)),
        inliers=inl,
        rating=rating,
        ok=found,
    )
