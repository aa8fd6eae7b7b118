"""Interpret-mode parity for the bilinear warp-sampling kernel."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from slideo_tpu.ops.pallas_warp import bilinear_sample_pallas  # noqa: E402
from slideo_tpu.ops.verify import _bilinear_image  # noqa: E402


def test_matches_xla_bilinear():
    rng = np.random.RandomState(0)
    h, w = 137, 253
    img = jnp.asarray((rng.rand(h, w) * 255).astype(np.float32))
    t, p = 3, 517
    xs = rng.uniform(-5, w + 5, (t, p)).astype(np.float32)
    ys = rng.uniform(-5, h + 5, (t, p)).astype(np.float32)

    got = np.asarray(
        bilinear_sample_pallas(img, jnp.asarray(xs), jnp.asarray(ys),
                               interpret=True)
    )
    inb = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    got = np.where(inb, got, 0.0)
    want = np.asarray(
        _bilinear_image(img, jnp.asarray(xs.reshape(-1)),
                        jnp.asarray(ys.reshape(-1)))
    ).reshape(t, p)
    # bf16 MXU inputs in the kernel: tolerance ~1 on a 255 scale.
    assert np.abs(got - want).max() < 1.5
    assert np.abs(got - want).mean() < 0.3


def test_windowed_fast_path_matches_xla():
    """Column-coherent points (the verification grid pattern) take the
    windowed path; values must match the full-width form exactly the same
    way random (fallback-path) points do."""
    rng = np.random.RandomState(1)
    h, w = 262, 464
    img = jnp.asarray((rng.rand(h, w) * 255).astype(np.float32))
    # Affine-warped column-major verification grid: x varies slowly.
    t = 4
    oh, ow = 90, 160
    gx, gy = np.meshgrid(np.arange(ow), np.arange(oh))
    xs_l, ys_l = [], []
    for i in range(t):
        th = np.deg2rad(rng.uniform(-4, 4))
        sc = rng.uniform(0.85, 1.0)
        a, b = sc * np.cos(th), sc * np.sin(th)
        fx = a * gx * (w / ow) - b * gy * (h / oh) + rng.uniform(0, 30)
        fy = b * gx * (w / ow) + a * gy * (h / oh) + rng.uniform(0, 20)
        xs_l.append(fx.T.reshape(-1))  # column-major, like ops/verify.py
        ys_l.append(fy.T.reshape(-1))
    xs = np.asarray(xs_l, np.float32)
    ys = np.asarray(ys_l, np.float32)

    got = np.asarray(
        bilinear_sample_pallas(img, jnp.asarray(xs), jnp.asarray(ys),
                               interpret=True)
    )
    inb = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    got = np.where(inb, got, 0.0)
    want = np.asarray(
        _bilinear_image(img, jnp.asarray(xs.reshape(-1)),
                        jnp.asarray(ys.reshape(-1)))
    ).reshape(t, -1)
    want = np.where(inb, want, 0.0)
    assert np.abs(got - want).max() < 1.5
    assert np.abs(got - want).mean() < 0.3
