"""FAST-9/16 detector parity against OpenCV."""

import cv2
import jax.numpy as jnp
import numpy as np

from slideo_tpu.ops import fast


def _cv2_fast_points(img_u8, threshold, nms):
    det = cv2.FastFeatureDetector_create(
        threshold=threshold,
        nonmaxSuppression=nms,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
    )
    return {(int(k.pt[1]), int(k.pt[0])) for k in det.detect(img_u8)}


def _interior(points, h, w, margin=4):
    return {
        (y, x)
        for (y, x) in points
        if margin <= y < h - margin and margin <= x < w - margin
    }


def test_fast_corner_set_matches_opencv(rng):
    img = (rng.rand(64, 96) * 255).astype(np.uint8)
    score = np.asarray(fast.fast_scores(jnp.asarray(img.astype(np.float32)), 20))
    ours = _interior(set(zip(*np.nonzero(score > 0))), 64, 96)
    ref = _interior(_cv2_fast_points(img, 20, nms=False), 64, 96)
    assert ours == ref


def test_fast_structured_image(rng):
    img = np.zeros((80, 100), np.uint8)
    img[20:50, 30:70] = 200
    img[25:30, 40:45] = 30
    score = np.asarray(fast.fast_scores(jnp.asarray(img.astype(np.float32)), 20))
    ours = _interior(set(zip(*np.nonzero(score > 0))), 80, 100)
    ref = _interior(_cv2_fast_points(img, 20, nms=False), 80, 100)
    assert ours == ref


def test_detect_keypoints_respects_border_and_validity(rng):
    img = (rng.rand(64, 96) * 255).astype(np.float32)
    score, ys, xs, valid = fast.detect_keypoints(jnp.asarray(img), 20, border=16, k=64)
    ys, xs, valid = np.asarray(ys), np.asarray(xs), np.asarray(valid)
    assert valid.any()
    assert (ys[valid] >= 16).all() and (ys[valid] < 48).all()
    assert (xs[valid] >= 16).all() and (xs[valid] < 80).all()
    # scores sorted descending
    s = np.asarray(score)
    assert (np.diff(s) <= 1e-6).all()


def test_flat_image_has_no_corners():
    img = np.full((40, 40), 128.0, np.float32)
    _, _, _, valid = fast.detect_keypoints(jnp.asarray(img), 20, border=4, k=16)
    assert not np.asarray(valid).any()
