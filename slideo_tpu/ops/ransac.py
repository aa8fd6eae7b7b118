"""Vectorized RANSAC for 4-DoF similarity transforms (batched over candidates).

TPU-native replacement for OpenCV's ``estimate_affine_partial_2d`` with
RANSAC (reference: crates/matching-opencv/src/image_utils.rs:44-61 —
reproj threshold 3.0, max_iters 2000, confidence 0.99, refine_iters 10).

Design: instead of OpenCV's sequential hypothesize-and-verify loop with
early exit, ALL hypotheses are drawn up front (2-point minimal sets, the
similarity transform has a closed form) and scored in parallel; scoring is
chunked over hypotheses with ``lax.scan`` so the [C, H, M] error tensor never
materializes.  The best hypothesis is then refined with ``refine_iters``
rounds of closed-form least squares on the current inlier set (the LS
estimate for a similarity transform is exact — complex-ratio form — so this
matches OpenCV's Levenberg-Marquardt refinement in fixed point count).

Determinism: hypotheses are drawn from jax.random with a caller-provided key
(the reference uses OpenCV's hidden RNG; only statistical parity is possible).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatchConfig

__all__ = ["Similarity", "ransac_similarity", "apply_similarity"]

_HYP_CHUNK = 500  # hypotheses scored per scan step (memory knob)


class Similarity(NamedTuple):
    """x' = a*x - b*y + tx ; y' = b*x + a*y + ty  (rotation+scale+translation)."""

    a: jax.Array
    b: jax.Array
    tx: jax.Array
    ty: jax.Array


def apply_similarity(t: Similarity, pts: jax.Array) -> jax.Array:
    """Apply [..., 2] points; transform fields broadcast against pts[..., 0]."""
    x, y = pts[..., 0], pts[..., 1]
    return jnp.stack([t.a * x - t.b * y + t.tx, t.b * x + t.a * y + t.ty], axis=-1)


def _fit_two_points(p: jax.Array, q: jax.Array) -> tuple[Similarity, jax.Array]:
    """Closed-form similarity from 2 correspondences p[..., 2, 2] -> q[..., 2, 2].

    Complex form: A = (q2-q1)/(p2-p1), t = q1 - A*p1. Returns (transform, ok).
    """
    dpx = p[..., 1, 0] - p[..., 0, 0]
    dpy = p[..., 1, 1] - p[..., 0, 1]
    dqx = q[..., 1, 0] - q[..., 0, 0]
    dqy = q[..., 1, 1] - q[..., 0, 1]
    den = dpx * dpx + dpy * dpy
    ok = den > 1e-9
    den = jnp.maximum(den, 1e-9)
    a = (dqx * dpx + dqy * dpy) / den
    b = (dqy * dpx - dqx * dpy) / den
    tx = q[..., 0, 0] - (a * p[..., 0, 0] - b * p[..., 0, 1])
    ty = q[..., 0, 1] - (b * p[..., 0, 0] + a * p[..., 0, 1])
    return Similarity(a, b, tx, ty), ok


def _fit_weighted(
    p: jax.Array, q: jax.Array, w: jax.Array
) -> tuple[Similarity, jax.Array]:
    """Weighted least-squares similarity p[..., M, 2] -> q[..., M, 2], w [..., M]."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    pm = jnp.sum(p * w[..., None], axis=-2) / wsum
    qm = jnp.sum(q * w[..., None], axis=-2) / wsum
    pc = p - pm[..., None, :]
    qc = q - qm[..., None, :]
    den = jnp.sum(w * (pc[..., 0] ** 2 + pc[..., 1] ** 2), axis=-1)
    ok = den > 1e-9
    den = jnp.maximum(den, 1e-9)
    a = jnp.sum(w * (qc[..., 0] * pc[..., 0] + qc[..., 1] * pc[..., 1]), axis=-1) / den
    b = jnp.sum(w * (qc[..., 1] * pc[..., 0] - qc[..., 0] * pc[..., 1]), axis=-1) / den
    tx = qm[..., 0] - (a * pm[..., 0] - b * pm[..., 1])
    ty = qm[..., 1] - (b * pm[..., 0] + a * pm[..., 1])
    return Similarity(a, b, tx, ty), ok


def _inliers(
    t: Similarity, src: jax.Array, dst: jax.Array, valid: jax.Array, thresh: float
) -> jax.Array:
    """Inlier mask [..., M] for transform fields shaped like src[..., 0, 0]."""
    proj = apply_similarity(
        Similarity(t.a[..., None], t.b[..., None], t.tx[..., None], t.ty[..., None]),
        src,
    )
    err2 = jnp.sum((proj - dst) ** 2, axis=-1)
    return (err2 < thresh * thresh) & valid


class RansacResult(NamedTuple):
    transform: Similarity      # fields [C]
    inliers: jax.Array         # [C, M] bool
    rating: jax.Array          # [C] float32 inlier count
    ok: jax.Array              # [C] bool — a model was found


def ransac_similarity(
    src: jax.Array,
    dst: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    cfg: MatchConfig,
) -> RansacResult:
    """RANSAC similarity fits for C candidates at once.

    src, dst: [C, M, 2] matched point pairs (slide -> frame); valid: [C, M]
    with valid entries compacted to the front (as produced by
    select_candidates). key: PRNG key.
    """
    c, m, _ = src.shape
    n_hyp = cfg.ransac_iters
    n_valid = jnp.sum(valid, axis=-1).astype(jnp.int32)  # [C]

    # Sample hypothesis pairs uniformly from each candidate's valid prefix.
    u = jax.random.uniform(key, (c, n_hyp, 2))
    idx = jnp.minimum(
        (u * n_valid[:, None, None]).astype(jnp.int32),
        jnp.maximum(n_valid - 1, 0)[:, None, None],
    )  # [C, H, 2]
    distinct = idx[..., 0] != idx[..., 1]
    enough = (n_valid >= 2)[:, None]

    p = jnp.take_along_axis(src, idx.reshape(c, -1, 1), axis=1).reshape(c, n_hyp, 2, 2)
    q = jnp.take_along_axis(dst, idx.reshape(c, -1, 1), axis=1).reshape(c, n_hyp, 2, 2)
    hyp, hyp_ok = _fit_two_points(p, q)  # fields [C, H]
    hyp_ok &= distinct & enough

    # Score hypotheses in chunks; carry the best (count, transform) per candidate.
    n_chunks = max(n_hyp // _HYP_CHUNK, 1)
    hyp_c = jax.tree.map(
        lambda x: x[:, : n_chunks * _HYP_CHUNK].reshape(c, n_chunks, -1).swapaxes(0, 1),
        hyp,
    )
    ok_c = hyp_ok[:, : n_chunks * _HYP_CHUNK].reshape(c, n_chunks, -1).swapaxes(0, 1)

    init = (
        jnp.full((c,), -1.0),
        Similarity(*(jnp.zeros((c,)) for _ in range(4))),
    )

    def step(carry, inp):
        best_n, best_t = carry
        t_chunk, okk = inp  # fields [C, h]
        inl = _inliers(
            t_chunk,
            src[:, None, :, :],
            dst[:, None, :, :],
            valid[:, None, :],
            cfg.ransac_threshold,
        )  # [C, h, M]
        counts = jnp.where(okk, jnp.sum(inl, axis=-1).astype(jnp.float32), -1.0)
        chunk_best = jnp.argmax(counts, axis=-1)  # [C]
        chunk_n = jnp.take_along_axis(counts, chunk_best[:, None], 1)[:, 0]
        take = lambda f: jnp.take_along_axis(f, chunk_best[:, None], 1)[:, 0]
        better = chunk_n > best_n
        new_t = Similarity(
            *(jnp.where(better, take(cf), bf)
              for cf, bf in zip(t_chunk, best_t))
        )
        return (jnp.maximum(best_n, chunk_n), new_t), None

    (best_n, best_t), _ = jax.lax.scan(step, init, (hyp_c, ok_c))
    found = best_n >= 2

    # Refinement: closed-form LS on inliers, re-classifying each round.
    def refine(t, _):
        inl = _inliers(t, src, dst, valid, cfg.ransac_threshold)
        t_new, ok = _fit_weighted(src, dst, inl.astype(jnp.float32))
        keep = ok & found
        t = Similarity(*(jnp.where(keep, nf, of) for nf, of in zip(t_new, t)))
        return t, None

    best_t, _ = jax.lax.scan(refine, best_t, None, length=cfg.ransac_refine_iters)

    inl = _inliers(best_t, src, dst, valid, cfg.ransac_threshold)
    inl &= found[:, None]
    rating = jnp.sum(inl, axis=-1).astype(jnp.float32)
    return RansacResult(transform=best_t, inliers=inl, rating=rating, ok=found)
