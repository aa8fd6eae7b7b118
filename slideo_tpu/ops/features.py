"""Full ORB-style feature extraction over an image pyramid.

TPU-native equivalent of the reference's FeatureExtractor
(crates/matching-opencv/src/feature_extractor.rs:12-47: nfeatures=2000,
scale_factor=1.2, nlevels=8, edge_threshold=62, fast_threshold=20,
score_type=FAST_SCORE, patch_size=62).

Everything is fixed-shape: each pyramid level detects exactly its quota of
keypoints (geometric allocation like OpenCV ORB), invalid slots carry
valid=False, and the result is padded to ``cfg.max_keypoints`` slots so one
compiled program serves every image of a given size bucket.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from . import fast, image, orb

__all__ = ["Features", "level_sizes", "extract_features", "extract_features_batch"]


class Features(NamedTuple):
    """Fixed-size feature set of one image.

    pts:   [K, 2] float32 (x, y) in level-0 (full image) coordinates
    desc:  [K, 256] int8 in {-1, +1}
    score: [K] float32 FAST score
    valid: [K] bool
    """

    pts: jax.Array
    desc: jax.Array
    score: jax.Array
    valid: jax.Array


def level_sizes(h: int, w: int, cfg: OrbConfig) -> list[tuple[int, int]]:
    """Static pyramid level sizes: round(size / scale_factor**level)."""
    out = []
    for lvl in range(cfg.n_levels):
        s = cfg.scale_factor**lvl
        out.append((max(int(round(h / s)), 1), max(int(round(w / s)), 1)))
    return out


def _extract_level(
    img_lvl: jax.Array, quota: int, scale: float, cfg: OrbConfig
) -> Features:
    score, ys, xs, valid = fast.detect_keypoints(
        img_lvl, cfg.fast_threshold, cfg.edge_threshold, quota
    )
    # One patch gather per keypoint; orientation on the raw patch, then the
    # description blur applied patch-locally as banded matmuls (OpenCV blurs
    # the whole level; the difference never reaches the sampled area).
    raw_patches = orb.extract_patches(img_lvl, ys, xs)
    cos, sin = orb.orientations(raw_patches)
    blurred_patches = orb.blur_patches(raw_patches, cfg.blur_ksize, cfg.blur_sigma)
    desc = orb.descriptors(
        blurred_patches, cos, sin, cfg.descriptor_bits, cfg.pattern_seed
    )
    desc = jnp.where(valid[:, None], desc, jnp.int8(0))
    pts = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1)
    pts = pts * jnp.float32(scale)
    return Features(pts=pts, desc=desc, score=score, valid=valid)


def extract_features(img: jax.Array, cfg: OrbConfig) -> Features:
    """ORB features of a [H, W] float32 grayscale image.

    Returns Features padded to cfg.max_keypoints slots. Shapes are static for
    a given (H, W); jit per size bucket.
    """
    h, w = img.shape
    sizes = level_sizes(h, w, cfg)
    quotas = cfg.per_level_quota
    per_level = []
    prev = img
    for lvl, ((lh, lw), quota) in enumerate(zip(sizes, quotas)):
        if quota <= 0:
            continue
        # Successive level-to-level resize (like OpenCV ORB's pyramid):
        # cheaper than resizing from level 0 every time and more faithful.
        img_lvl = prev if lvl == 0 else image.resize(prev, (lh, lw), area=False)
        prev = img_lvl
        usable = lh > 2 * cfg.edge_threshold and lw > 2 * cfg.edge_threshold
        if not usable:
            # Level too small for the keypoint border; emit empty quota slots.
            per_level.append(
                Features(
                    pts=jnp.zeros((quota, 2), jnp.float32),
                    desc=jnp.zeros((quota, cfg.descriptor_bits), jnp.int8),
                    score=jnp.zeros((quota,), jnp.float32),
                    valid=jnp.zeros((quota,), bool),
                )
            )
            continue
        per_level.append(
            _extract_level(img_lvl, quota, cfg.scale_factor**lvl, cfg)
        )
    feats = Features(
        pts=jnp.concatenate([f.pts for f in per_level]),
        desc=jnp.concatenate([f.desc for f in per_level]),
        score=jnp.concatenate([f.score for f in per_level]),
        valid=jnp.concatenate([f.valid for f in per_level]),
    )
    total = feats.pts.shape[0]
    pad = cfg.max_keypoints - total
    if pad < 0:
        raise ValueError(
            f"quota sum {total} exceeds max_keypoints {cfg.max_keypoints}"
        )
    if pad:
        feats = Features(
            pts=jnp.pad(feats.pts, ((0, pad), (0, 0))),
            desc=jnp.pad(feats.desc, ((0, pad), (0, 0))),
            score=jnp.pad(feats.score, ((0, pad),)),
            valid=jnp.pad(feats.valid, ((0, pad),)),
        )
    return feats


def extract_features_batch(imgs: jax.Array, cfg: OrbConfig) -> Features:
    """Features for a [B, H, W] batch.

    Uses lax.map (sequential over the batch) to keep the FAST stage's
    [16, H, W] transients from scaling with B; each image already saturates
    the VPU/MXU at 1080p.
    """
    return jax.lax.map(lambda im: extract_features(im, cfg), imgs)
