"""FAST-9/16 corner detection with scores + NMS, as pure XLA vector ops.

TPU-native replacement for OpenCV's FAST used by the reference's ORB
(reference: crates/matching-opencv/src/feature_extractor.rs:13-23 with
score_type=FAST_SCORE, fast_threshold=20).

Design: the circular segment test ("are >=9 contiguous of the 16 circle
pixels all brighter/darker than center by t") is evaluated for all pixels at
once.  The 9-wide circular window min/max is computed with a logarithmic
shift-and-min cascade over the 16-offset axis (4 passes instead of 16*9),
keeping peak memory at ~[16, H, W] int16.

The corner *score* follows OpenCV's FAST_SCORE definition: the maximum
threshold t' for which the segment test still passes, i.e.
``max_s min_{j in window9(s)} |d_j|`` for the bright (d>0) and dark (d<0)
cases.  A pixel is a corner iff score > threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "CIRCLE_OFFSETS", "fast_scores", "nms3x3", "score_map", "score_map_batch",
    "detect_keypoints",
]

# Bresenham circle of radius 3, 16 points, clockwise from (dy=-3, dx=0)
# (the standard FAST-16 ring).
CIRCLE_OFFSETS: tuple[tuple[int, int], ...] = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _window9_reduce(d: jax.Array, op) -> jax.Array:
    """Circular 9-window reduction along axis 0 (length 16).

    out[s] = reduce(d[s], d[s+1], ..., d[s+8])  (indices mod 16)
    """
    w2 = op(d, jnp.roll(d, -1, axis=0))
    w4 = op(w2, jnp.roll(w2, -2, axis=0))
    w8 = op(w4, jnp.roll(w4, -4, axis=0))
    return op(w8, jnp.roll(d, -8, axis=0))


def fast_scores(
    img: jax.Array, threshold: int, min_first: bool = False
) -> jax.Array:
    """FAST-9/16 score map for a [H, W] grayscale image.

    Returns float32 [H, W]; score > threshold marks a corner. Non-corners get
    score 0. The 3px ring border is zeroed (circle would wrap).

    min_first (config.fast_min_first): reduce RAW taps and subtract the
    center once from the window extrema — max_s min_w (tap - c) ==
    (max_s min_w tap) - c in exact arithmetic, and the late f32 subtract of
    bf16 operands IS exact, so this form rounds strictly less than the
    16 bf16 diff planes (bit-equal on integer pixels).
    """
    x = img.astype(jnp.float32)
    # Shifted copies of the image for the 16 circle offsets.  jnp.roll wraps,
    # which is fine because the border is masked afterwards.  Diffs are exact
    # small integers (pixel values <= 255), so bf16 halves VPU traffic with
    # no precision loss in the min/max cascade.
    shifted = jnp.stack(
        [jnp.roll(x, (-dy, -dx), axis=(0, 1)) for (dy, dx) in CIRCLE_OFFSETS],
        axis=0,
    )
    if min_first:
        t16 = shifted.astype(jnp.bfloat16)            # [16, H, W] raw taps
        maxmin = _window9_reduce(t16, jnp.minimum).max(axis=0)
        minmax = _window9_reduce(t16, jnp.maximum).min(axis=0)
        bright = maxmin.astype(jnp.float32) - x
        dark = x - minmax.astype(jnp.float32)
        score = jnp.maximum(bright, dark)
    else:
        d = (shifted - x[None]).astype(jnp.bfloat16)  # [16, H, W]
        bright = _window9_reduce(d, jnp.minimum).max(axis=0)  # max_s min_win d
        dark = -_window9_reduce(d, jnp.maximum).min(axis=0)   # max_s min_win -d
        score = jnp.maximum(bright, dark).astype(jnp.float32)
    score = jnp.where(score > float(threshold), score, 0.0)
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(inb, score, 0.0)


def nms3x3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression: keep score iff it equals the local max."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= neigh, score, 0.0)


def score_map(
    img: jax.Array, threshold: int, chunk_w: int = 512,
    polarity_fused: bool = False, sparse_skip: bool = False,
    min_first: bool = False,
) -> jax.Array:
    """NMS'd FAST score map of a [H, W] image, backend-dispatched.

    On TPU this is the fused single-pass Pallas kernel (ops/pallas_fast.py,
    bit-exact vs the XLA formulation); on CPU the XLA path. Callers may pass
    a whole pyramid *atlas*: scores within 4 px of a level boundary are
    contaminated by the neighboring level's rows, but every consumer masks a
    >=62 px per-level border (edge_threshold) before using them, so one
    atlas-wide pass equals per-level passes on all surviving pixels.
    chunk_w selects the Pallas kernel's column-chunk width (ignored on CPU).
    """
    if jax.default_backend() == "cpu":
        return nms3x3(fast_scores(img, threshold, min_first=min_first))
    from .pallas_fast import fast_scores_pallas

    return fast_scores_pallas(
        img, threshold, chunk_w=chunk_w, polarity_fused=polarity_fused,
        sparse_skip=sparse_skip, min_first=min_first,
    )


def score_map_batch(
    imgs: jax.Array, threshold: int, chunk_w: int = 512,
    polarity_fused: bool = False, sparse_skip: bool = False,
    min_first: bool = False,
) -> jax.Array:
    """NMS'd FAST score maps of a [B, H, W] batch, backend-dispatched.

    On TPU: one Pallas launch with grid (B, n_bands) — per-frame results are
    bit-identical to score_map, but the launch fixed cost amortizes over the
    batch. On CPU: the XLA path mapped over frames.
    """
    if jax.default_backend() == "cpu":
        return jax.lax.map(
            lambda im: nms3x3(fast_scores(im, threshold, min_first=min_first)),
            imgs,
        )
    from .pallas_fast import fast_scores_pallas_batch

    return fast_scores_pallas_batch(
        imgs, threshold, chunk_w=chunk_w, polarity_fused=polarity_fused,
        sparse_skip=sparse_skip, min_first=min_first,
    )


def detect_keypoints(
    img: jax.Array, threshold: int, border: int, k: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Top-k FAST corners of a [H, W] image.

    Returns (score [k], y [k], x [k], valid [k]). Keypoints within ``border``
    pixels of any edge are suppressed (reference edge_threshold=62 semantics,
    feature_extractor.rs:17).
    """
    h, w = img.shape
    score = score_map(img, threshold)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    score = jnp.where(inb, score, 0.0)
    flat = score.reshape(-1)
    # approx_max_k: TPU-native partial reduction instead of a 2M-element full
    # sort; corners missed at 5% recall are interchangeable with the ones
    # kept (quota allocation is heuristic to begin with).
    top, idx = jax.lax.approx_max_k(flat, k, recall_target=0.95)
    y = idx // w
    x = idx % w
    valid = top > 0.0
    return top, y, x, valid
