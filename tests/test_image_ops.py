"""Unit tests for device image primitives against OpenCV oracles."""

import math

import cv2
import jax.numpy as jnp
import numpy as np

from slideo_tpu.ops import image


def test_area_resize_matches_opencv(rng):
    img = (rng.rand(97, 143) * 255).astype(np.float32)
    ours = np.asarray(image.resize(jnp.asarray(img), (48, 71), area=True))
    ref = cv2.resize(img, (71, 48), interpolation=cv2.INTER_AREA)
    assert np.abs(ours - ref).max() < 1.5


def test_bilinear_resize_matches_opencv(rng):
    img = (rng.rand(60, 80) * 255).astype(np.float32)
    ours = np.asarray(image.resize(jnp.asarray(img), (150, 200), area=False))
    ref = cv2.resize(img, (200, 150), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 2.0


def test_small_size_is_area_bounded():
    # image_utils.rs:8-20: factor = sqrt(120000/area), truncating casts.
    h, w = image.small_size(1080, 1920)
    assert h * w <= 120_000
    assert abs(w / h - 1920 / 1080) < 0.02
    assert (h, w) == (259, 461)


def test_similarity_formula(rng):
    a = (rng.rand(30, 40) * 255).astype(np.float32)
    b = (rng.rand(30, 40) * 255).astype(np.float32)
    ours = float(image.compute_similarity(jnp.asarray(a), jnp.asarray(b), channels=1))
    ref = 1 - np.linalg.norm((a - b).ravel()) / math.sqrt(255**2 * 1 * 30 * 40)
    assert abs(ours - ref) < 1e-5
    assert float(image.compute_similarity(jnp.asarray(a), jnp.asarray(a), channels=1)) == 1.0


def test_similarity_batch_broadcast(rng):
    a = (rng.rand(4, 30, 40) * 255).astype(np.float32)
    b = (rng.rand(4, 30, 40) * 255).astype(np.float32)
    sims = np.asarray(image.compute_similarity(jnp.asarray(a), jnp.asarray(b), channels=1))
    assert sims.shape == (4,)
    one = float(image.compute_similarity(jnp.asarray(a[2]), jnp.asarray(b[2]), channels=1))
    assert abs(sims[2] - one) < 1e-5


def test_gaussian_blur_close_to_opencv(rng):
    img = (rng.rand(50, 60) * 255).astype(np.float32)
    ours = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2.0)
    assert np.abs(ours - ref).max() < 0.5


def test_bgr_to_gray(rng):
    img = (rng.rand(20, 30, 3) * 255).astype(np.float32)
    ours = np.asarray(image.bgr_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    assert np.abs(ours - ref).max() < 1.0
