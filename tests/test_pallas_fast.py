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


def test_pallas_fast_bf16_input_parity(rng):
    """On a bf16 image (the atlas_bf16 config) the Pallas kernel and the XLA
    path must stay mutually bit-identical, and on integer pixels (level 0 of
    the atlas) bf16 storage must not change scores at all."""
    img = (rng.rand(160, 256) * 255).astype(np.uint8).astype(np.float32)
    # non-integer values too (like resized upper pyramid levels)
    img[80:] += 0.37
    imb = jnp.asarray(img).astype(jnp.bfloat16)
    got = np.asarray(fast_scores_pallas(imb, 20, band=64, interpret=True))
    ref = _ref(np.asarray(imb))  # XLA path on the same bf16 values
    assert (got == ref).all()
    # integer region: identical to the f32-atlas scores
    f32 = np.asarray(fast_scores_pallas(jnp.asarray(img[:80]), 20, band=64,
                                        interpret=True))
    assert (got[:77] == f32[:77]).sum() >= (77 * 256) - 256 * 4  # halo rows differ


def test_features_atlas_bf16_pipeline(rng):
    """extract_features with atlas_bf16=True runs end-to-end and finds
    essentially the same keypoints on integer-pixel content."""
    import dataclasses

    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.ops import features as F

    cfg = dataclasses.replace(
        DEFAULT_CONFIG.orb, n_features=200, n_levels=3, max_keypoints=256,
        edge_threshold=31, query_buckets=(256,),
    )
    cfgb = dataclasses.replace(cfg, atlas_bf16=True)
    img = jnp.asarray((rng.rand(200, 320) * 255).astype(np.uint8), jnp.float32)
    fa = F.extract_features(img, cfg)
    fb = F.extract_features(img, cfgb)
    na, nb = int(np.sum(np.asarray(fa.valid))), int(np.sum(np.asarray(fb.valid)))
    assert na > 20
    assert abs(na - nb) <= max(2, na // 20)


def test_pallas_fast_polarity_fused_parity(rng):
    """fast_polarity_fused interleaves the bright/dark van Herk chains —
    a pure reschedule; scores must be bit-identical."""
    img = (rng.rand(150, 260) * 255).astype(np.uint8).astype(np.float32)
    a = np.asarray(fast_scores_pallas(jnp.asarray(img), 20, band=64, interpret=True))
    b = np.asarray(fast_scores_pallas(jnp.asarray(img), 20, band=64,
                                      interpret=True, polarity_fused=True))
    assert (a == b).all()


def test_pallas_fast_sparse_skip_parity(rng):
    """fast_sparse_skip's compass-pretest chunk early-out is EXACT: the
    pretest (an adjacent compass tap pair over threshold) is a necessary
    condition for any 9-contiguous FAST arc, so skipped chunks are provably
    all-zero. Scores must be bit-identical on sparse AND dense content, in
    both the single-frame and batched kernels."""
    from slideo_tpu.ops.pallas_fast import fast_scores_pallas_batch

    # sparse: mostly flat with a few corner clusters (some chunks skip)
    sparse = np.full((200, 320), 120, np.float32)
    sparse[20:30, 40:50] = 250
    sparse[150:160, 200:260] = 10
    # dense: every chunk occupied
    dense = (rng.rand(200, 320) * 255).astype(np.uint8).astype(np.float32)
    for img in (sparse, dense):
        a = np.asarray(fast_scores_pallas(
            jnp.asarray(img), 20, band=64, interpret=True,
            polarity_fused=True))
        b = np.asarray(fast_scores_pallas(
            jnp.asarray(img), 20, band=64, interpret=True,
            polarity_fused=True, sparse_skip=True))
        assert (a == b).all()
    imgs = np.stack([sparse, dense])
    got = np.asarray(fast_scores_pallas_batch(
        jnp.asarray(imgs), 20, band=64, interpret=True, sparse_skip=True))
    for b2 in range(2):
        np.testing.assert_array_equal(got[b2], _ref(imgs[b2]))


def test_pallas_fast_min_first_parity(rng):
    """fast_min_first: chains on RAW taps + one late exact f32 subtract.

    (a) Pallas (interpret) == the XLA min_first path bit-for-bit, on both
        integer and fractional images, with and without sparse_skip.
    (b) On INTEGER pixels (atlas level 0) min_first == the diff form
        bit-for-bit (every quantity is exact in bf16 either way).
    (c) On fractional pixels (resized upper levels) the two forms may
        differ only at rounding scale: assert scores agree within 1.0
        and corner sets differ on <1% of pixels.
    """
    from slideo_tpu.ops.pallas_fast import fast_scores_pallas_batch

    ints = (rng.rand(150, 260) * 255).astype(np.uint8).astype(np.float32)
    frac = (rng.rand(150, 260) * 255).astype(np.float32)

    def xla_mf(img):
        h, w = img.shape
        score = np.asarray(fast.nms3x3(
            fast.fast_scores(jnp.asarray(img), 20, min_first=True)))
        ys, xs = np.mgrid[0:h, 0:w]
        inb = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
        return np.where(inb, score, 0.0)

    for img in (ints, frac):
        want = xla_mf(img)
        for sskip in (False, True):
            got = np.asarray(fast_scores_pallas(
                jnp.asarray(img), 20, band=64, interpret=True,
                polarity_fused=True, sparse_skip=sskip, min_first=True))
            np.testing.assert_array_equal(got, want)
        # bf16 input (the atlas_bf16 config) stays mutually bit-identical
        got16 = np.asarray(fast_scores_pallas(
            jnp.asarray(img, jnp.bfloat16), 20, band=64, interpret=True,
            polarity_fused=True, min_first=True))
        want16 = xla_mf(np.asarray(
            jnp.asarray(img, jnp.bfloat16), np.float32))
        np.testing.assert_array_equal(got16, want16)

    # batched kernel parity
    imgs = np.stack([ints, frac])
    got = np.asarray(fast_scores_pallas_batch(
        jnp.asarray(imgs), 20, band=64, interpret=True, min_first=True,
        sparse_skip=True))
    for b in range(2):
        np.testing.assert_array_equal(got[b], xla_mf(imgs[b]))

    # (b) integer pixels: min_first == diff form exactly
    np.testing.assert_array_equal(xla_mf(ints), _ref(ints))
    # (c) fractional pixels: PRE-NMS scores drift only at rounding scale
    # (post-NMS maps can differ structurally — an ulp flips the 3x3
    # winner — so the set-level check below is on corner density).
    a = np.asarray(fast.fast_scores(jnp.asarray(frac), 20, min_first=True))
    b = np.asarray(fast.fast_scores(jnp.asarray(frac), 20))
    both = (a > 0) & (b > 0)
    assert np.abs(a[both] - b[both]).max() <= 1.0
    assert ((a > 0) != (b > 0)).mean() < 0.01
