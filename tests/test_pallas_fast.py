"""Pallas FAST kernel parity vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from slideo_tpu.ops import fast
from slideo_tpu.ops.pallas_fast import fast_scores_pallas


def _ref(img, threshold=20):
    h, w = img.shape
    score = np.asarray(fast.nms3x3(fast.fast_scores(jnp.asarray(img), threshold)))
    ys, xs = np.mgrid[0:h, 0:w]
    inb = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return np.where(inb, score, 0.0)


def test_pallas_fast_parity(rng):
    # integer pixels: both paths use exact bf16 arithmetic -> bit parity
    img = (rng.rand(200, 320) * 255).astype(np.uint8).astype(np.float32)
    got = np.asarray(fast_scores_pallas(jnp.asarray(img), 20, band=64, interpret=True))
    assert (got == _ref(img)).all()


def test_pallas_fast_odd_shape(rng):
    img = (rng.rand(173, 131) * 255).astype(np.uint8).astype(np.float32)
    got = np.asarray(fast_scores_pallas(jnp.asarray(img), 20, band=64, interpret=True))
    assert (got == _ref(img)).all()


def test_pallas_fast_structured(rng):
    img = np.zeros((128, 256), np.float32)
    img[30:90, 40:200] = 200
    img[50:60, 80:90] = 30
    got = np.asarray(fast_scores_pallas(jnp.asarray(img), 20, band=64, interpret=True))
    ref = _ref(img)
    assert (got == ref).all()
    assert (ref > 0).sum() > 0  # the fixture actually has corners


def test_pallas_fast_batched_parity(rng):
    """fast_scores_pallas_batch (grid (B, bands), one launch) must be
    bit-identical per frame to the single-frame kernel / XLA path."""
    from slideo_tpu.ops.pallas_fast import fast_scores_pallas_batch

    imgs = rng.randint(0, 256, (3, 150, 200)).astype(np.float32)
    got = np.asarray(
        fast_scores_pallas_batch(jnp.asarray(imgs), 20, band=64, interpret=True)
    )
    for b in range(3):
        np.testing.assert_array_equal(got[b], _ref(imgs[b]), err_msg=f"frame {b}")
