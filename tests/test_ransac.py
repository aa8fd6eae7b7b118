"""Vectorized RANSAC vs OpenCV's estimateAffinePartial2D."""

import dataclasses

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import ransac


def _make_case(rng, n=80, outliers=20, angle=10.0, scale=0.9, t=(40.0, -15.0)):
    th = np.deg2rad(angle)
    a, b = scale * np.cos(th), scale * np.sin(th)
    src = rng.rand(n, 2).astype(np.float32) * 400
    dst = np.stack(
        [a * src[:, 0] - b * src[:, 1] + t[0], b * src[:, 0] + a * src[:, 1] + t[1]],
        axis=1,
    ).astype(np.float32)
    dst += rng.randn(n, 2).astype(np.float32) * 0.5
    dst[:outliers] = rng.rand(outliers, 2).astype(np.float32) * 400
    return src, dst, (a, b, t[0], t[1])


def test_ransac_recovers_similarity(rng):
    cfg = dataclasses.replace(DEFAULT_CONFIG.match, ransac_iters=512)
    src, dst, (a, b, tx, ty) = _make_case(rng)
    c, m = 1, src.shape[0]
    res = ransac.ransac_similarity(
        jnp.asarray(src[None]),
        jnp.asarray(dst[None]),
        jnp.ones((c, m), bool),
        jax.random.key(0),
        cfg,
    )
    assert bool(res.ok[0])
    got = [float(res.transform.a[0]), float(res.transform.b[0]),
           float(res.transform.tx[0]), float(res.transform.ty[0])]
    assert np.allclose(got[:2], [a, b], atol=0.01)
    assert np.allclose(got[2:], [tx, ty], atol=2.0)
    # ~60 inliers planted
    assert 50 <= float(res.rating[0]) <= 65

    # OpenCV agreement on inlier count
    mat, inl = cv2.estimateAffinePartial2D(
        src, dst, method=cv2.RANSAC, ransacReprojThreshold=3.0,
        maxIters=2000, confidence=0.99, refineIters=10,
    )
    assert abs(float(res.rating[0]) - inl.sum()) <= 3


def test_ransac_batched_candidates(rng):
    cfg = dataclasses.replace(DEFAULT_CONFIG.match, ransac_iters=256)
    cases = [_make_case(rng, angle=ang) for ang in (0.0, 25.0, -40.0)]
    src = np.stack([c[0] for c in cases])
    dst = np.stack([c[1] for c in cases])
    # candidate 3: pure noise, candidate 4: too few valid points
    noise_src = rng.rand(80, 2).astype(np.float32) * 400
    noise_dst = rng.rand(80, 2).astype(np.float32) * 400
    src = np.concatenate([src, noise_src[None], noise_src[None]])
    dst = np.concatenate([dst, noise_dst[None], noise_dst[None]])
    valid = np.ones((5, 80), bool)
    valid[4, 1:] = False
    res = ransac.ransac_similarity(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid),
        jax.random.key(1), cfg,
    )
    ratings = np.asarray(res.rating)
    assert (ratings[:3] >= 50).all()
    assert ratings[3] < 15  # noise: no strong consensus
    assert ratings[4] == 0 and not bool(res.ok[4])


def test_ransac_deterministic(rng):
    cfg = dataclasses.replace(DEFAULT_CONFIG.match, ransac_iters=128)
    src, dst, _ = _make_case(rng)
    args = (jnp.asarray(src[None]), jnp.asarray(dst[None]),
            jnp.ones((1, 80), bool), jax.random.key(7), cfg)
    r1 = ransac.ransac_similarity(*args)
    r2 = ransac.ransac_similarity(*args)
    assert float(r1.rating[0]) == float(r2.rating[0])
    assert float(r1.transform.a[0]) == float(r2.transform.a[0])


def test_apply_similarity_roundtrip():
    t = ransac.Similarity(
        a=jnp.float32(0.8), b=jnp.float32(0.3),
        tx=jnp.float32(10.0), ty=jnp.float32(-5.0),
    )
    pts = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    out = np.asarray(ransac.apply_similarity(t, pts))
    assert np.allclose(out[0], [0.8 * 1 - 0.3 * 2 + 10, 0.3 * 1 + 0.8 * 2 - 5])
    assert np.allclose(out[1], [10, -5])
