"""Warp-verify oracle tests (vs explicit OpenCV warps) + feature invariants."""

import dataclasses

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import image as image_ops
from slideo_tpu.ops import verify
from slideo_tpu.ops.features import extract_features, level_sizes
from slideo_tpu.ops.ransac import Similarity


def _scene(rng, h, w):
    img = np.zeros((h, w), np.float32)
    for _ in range(30):
        y, x = rng.randint(10, h - 20), rng.randint(10, w - 40)
        img[y : y + rng.randint(4, 12), x : x + rng.randint(6, 30)] = rng.randint(
            60, 255
        )
    return img


def test_warp_similarity_matches_cv2_oracle(rng):
    """Our thumbnail-space warp similarity tracks the reference computation
    (full-res warpAffine + INTER_AREA downscale + L2) within tolerance."""
    sh, sw = 300, 400
    slide = _scene(rng, sh, sw)
    a, b, tx, ty = 0.95 * np.cos(0.06), 0.95 * np.sin(0.06), 25.0, 12.0
    m = np.array([[a, -b, tx], [b, a, ty]], np.float32)
    frame = cv2.warpAffine(slide, m, (480, 360)).astype(np.float32)

    # reference-style computation with cv2
    frame_in_slide = cv2.warpAffine(
        frame, m, (sw, sh), flags=cv2.WARP_INVERSE_MAP
    )
    hs, ws = image_ops.small_size(sh, sw)
    warped_small = cv2.resize(frame_in_slide, (ws, hs), interpolation=cv2.INTER_AREA)
    slide_small = cv2.resize(slide, (ws, hs), interpolation=cv2.INTER_AREA)
    ref_sim = 1.0 - np.linalg.norm(warped_small - slide_small) / np.sqrt(
        255.0**2 * hs * ws
    )

    smalls = np.asarray(image_ops.to_small_image(jnp.asarray(slide[None])))
    for stride in (1, 2):
        got = verify.warp_similarity(
            jnp.asarray(frame),
            Similarity(*(jnp.asarray([v], jnp.float32) for v in (a, b, tx, ty))),
            jnp.asarray(smalls),
            jnp.asarray([0], jnp.int32),
            (sh, sw),
            stride=stride,
        )
        assert abs(float(got[0]) - ref_sim) < 0.03, (stride, float(got[0]), ref_sim)
    # and a WRONG transform must score clearly lower
    bad = verify.warp_similarity(
        jnp.asarray(frame),
        Similarity(*(jnp.asarray([v], jnp.float32) for v in (1.0, 0.0, 200.0, 150.0))),
        jnp.asarray(smalls),
        jnp.asarray([0], jnp.int32),
        (sh, sw),
        stride=2,
    )
    assert float(bad[0]) < ref_sim - 0.05


def test_extract_features_invariants(rng):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG.orb, n_features=200, max_keypoints=256, n_levels=4,
        edge_threshold=32,
    )
    img = _scene(rng, 220, 300)
    feats = jax.jit(lambda im: extract_features(im, cfg))(jnp.asarray(img))
    pts = np.asarray(feats.pts)
    valid = np.asarray(feats.valid)
    desc = np.asarray(feats.desc)
    assert pts.shape == (256, 2) and desc.shape == (256, 256)
    assert valid.sum() > 20
    # coordinates within the image, descriptors +-1 on valid slots only
    assert (pts[valid, 0] >= 0).all() and (pts[valid, 0] < 300).all()
    assert (pts[valid, 1] >= 0).all() and (pts[valid, 1] < 220).all()
    assert set(np.unique(desc[valid])) <= {-1, 1}
    assert (desc[~valid] == 0).all()
    # quotas sum to n_features
    assert sum(cfg.per_level_quota) == cfg.n_features
    # level sizes follow the exact 5:6 block ladder (5 * ceil(n / 6))
    sizes = level_sizes(220, 300, cfg)
    assert sizes[0] == (220, 300)
    assert sizes[1] == (5 * -(-220 // 6), 250)


def test_features_deterministic(rng):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG.orb, n_features=128, max_keypoints=128, n_levels=3,
        edge_threshold=32,
    )
    img = jnp.asarray(_scene(rng, 200, 260))
    f1 = extract_features(img, cfg)
    f2 = extract_features(img, cfg)
    assert (np.asarray(f1.desc) == np.asarray(f2.desc)).all()
    assert (np.asarray(f1.pts) == np.asarray(f2.pts)).all()
