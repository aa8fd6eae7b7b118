"""SIFT-family engine: invariances, homography RANSAC, end-to-end match."""

import dataclasses

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slideo_tpu.config import DEFAULT_CONFIG, SiftConfig
from slideo_tpu.models import sift_matcher
from slideo_tpu.ops import homography as HG
from slideo_tpu.ops.sift import extract_sift


@pytest.fixture(scope="module")
def cfg():
    sift = dataclasses.replace(
        DEFAULT_CONFIG.sift, max_keypoints=256, n_octaves=3, border=24
    )
    match = dataclasses.replace(
        DEFAULT_CONFIG.match,
        ransac_iters=512, max_matches_per_slide=128, min_rating=15.0,
    )
    return dataclasses.replace(DEFAULT_CONFIG, sift=sift, match=match, engine="sift")


@pytest.fixture(scope="module")
def textured(rng):
    img = np.zeros((240, 320), np.float32)
    for _ in range(25):
        y, x = rng.randint(40, 200), rng.randint(40, 280)
        img[y : y + rng.randint(4, 14), x : x + rng.randint(6, 30)] = rng.randint(
            80, 255
        )
    return img


def test_sift_rotation_invariance(cfg, textured):
    ext = jax.jit(lambda im: extract_sift(im, cfg.sift))
    f0 = ext(jnp.asarray(textured))
    d0 = np.asarray(f0.desc)[np.asarray(f0.valid)]
    assert len(d0) > 50
    assert np.abs(np.linalg.norm(d0, axis=1) - 1).max() < 1e-3
    for ang in (30.0, 120.0):
        m = cv2.getRotationMatrix2D((160, 120), ang, 1.0)
        fr = ext(jnp.asarray(cv2.warpAffine(textured, m, (320, 240))))
        dr = np.asarray(fr.desc)[np.asarray(fr.valid)]
        best = (d0 @ dr.T).max(1)
        assert np.median(best) > 0.85, (ang, np.median(best))


def test_sift_scale_invariance(cfg, textured):
    ext = jax.jit(lambda im: extract_sift(im, cfg.sift))
    d0 = np.asarray(ext(jnp.asarray(textured)).desc)
    half = cv2.resize(textured, None, fx=0.5, fy=0.5)
    pad = np.zeros_like(textured)
    pad[:120, :160] = half
    ds = np.asarray(ext(jnp.asarray(pad)).desc)
    best = (d0 @ ds.T).max(1)
    assert np.median(best[np.abs(d0).sum(1) > 0]) > 0.75


def test_ransac_homography_vs_cv2(rng, cfg):
    h_true = np.array(
        [[0.9, 0.05, 30], [-0.03, 0.95, 20], [1e-4, -5e-5, 1.0]], np.float64
    )
    n = 100
    src = rng.rand(n, 2).astype(np.float32) * np.array([1600, 900])
    ones = np.ones((n, 1), np.float32)
    proj = np.hstack([src, ones]) @ h_true.T
    dst = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
    dst += rng.randn(n, 2).astype(np.float32) * 0.5
    dst[:30] = rng.rand(30, 2) * np.array([1600, 900])

    res = HG.ransac_homography(
        jnp.asarray(src[None]), jnp.asarray(dst[None]),
        jnp.ones((1, n), bool), jax.random.key(0), cfg.match,
    )
    assert bool(res.ok[0])
    _, inl_cv = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    assert abs(float(res.rating[0]) - inl_cv.sum()) <= 3

    # reprojection of the recovered transform on true inliers
    h = np.asarray(res.transform.h[0])
    hm = np.array([[h[0], h[1], h[2]], [h[3], h[4], h[5]], [h[6], h[7], 1.0]])
    p = np.hstack([src[30:], ones[30:]]) @ hm.T
    err = np.linalg.norm(p[:, :2] / p[:, 2:] - dst[30:], axis=1)
    assert err.max() < 3.0


def test_sift_engine_end_to_end(cfg, rng):
    s_cnt, h, w = 4, 300, 400
    slides = np.zeros((s_cnt, h, w), np.float32)
    for s in range(s_cnt):
        for _ in range(30):
            y, x = rng.randint(30, h - 40), rng.randint(30, w - 60)
            slides[s, y : y + rng.randint(4, 14), x : x + rng.randint(6, 40)] = (
                rng.randint(80, 255)
            )
    hp = cv2.getPerspectiveTransform(
        np.float32([[0, 0], [w, 0], [w, h], [0, h]]),
        np.float32([[30, 40], [430, 20], [460, 330], [10, 300]]),
    )
    frame = cv2.warpPerspective(slides[2], hp, (480, 360)).astype(np.float32)
    frame += rng.randn(360, 480).astype(np.float32) * 2

    index = jax.jit(lambda s: sift_matcher.build_slide_index_sift(s, cfg))(
        jnp.asarray(slides)
    )
    mf = jax.jit(
        lambda f, sd, ix: sift_matcher.match_frame_sift(f, sd, ix, (h, w), cfg)
    )
    res = mf(jnp.asarray(frame), jnp.int32(5), index)
    assert int(res.slide) == 2, (int(res.slide), float(res.similarity))
    assert float(res.similarity) > 0.7

    noise = (rng.rand(360, 480) * 255).astype(np.float32)
    res2 = mf(jnp.asarray(noise), jnp.int32(6), index)
    assert int(res2.slide) == -1
