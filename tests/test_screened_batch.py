"""Batched-screening match path == legacy per-frame screened path.

The screened-deck batch path (_match_frames_screened_batch: per-frame
features -> one full-K stage-1 sweep -> per-frame stage-2/cascade) must
produce identical results to the legacy per-frame path (match_table_frame's
_screen_slides) — same vote rule, same candidate sets, same cascade.
CPU-runnable: the screening kernel runs in interpret mode when the backend
isn't TPU (hamming.screen_slides_batched).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slideo_tpu.config import DEFAULT_CONFIG, OrbConfig  # noqa: E402
from slideo_tpu.models import orb_matcher  # noqa: E402
from slideo_tpu.ops import hamming  # noqa: E402


def _deck(rng, n, hw):
    h, w = hw
    slides = np.zeros((n, h, w), np.uint8)
    for s in range(n):
        img = np.full((h, w), 255, np.uint8)
        cv2.putText(img, f"S{s}", (10, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.9,
                    0, 2)
        for _ in range(10):
            y, x = rng.randint(34, h - 16), rng.randint(8, w - 40)
            cv2.rectangle(img, (x, y), (x + rng.randint(12, 38), y + rng.randint(4, 12)),
                          int(rng.randint(0, 120)), -1)
        slides[s] = img
    return slides


def test_batched_screening_path_equals_legacy():
    rng = np.random.RandomState(3)
    hw = (180, 240)
    n_slides = 100  # > screen_above_slides=96 -> screening engages
    slides = _deck(rng, n_slides, hw)
    frames = []
    for i in range(3):
        s = rng.randint(n_slides)
        m = cv2.getRotationMatrix2D((hw[1] / 2, hw[0] / 2),
                                    rng.uniform(-2, 2), rng.uniform(0.95, 1.0))
        fr = cv2.warpAffine(slides[s], m, (hw[1], hw[0]), borderValue=40)
        frames.append(np.clip(
            fr.astype(np.float32) + rng.randn(*hw), 0, 255).astype(np.uint8))
    frames = np.stack(frames)

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        orb=OrbConfig(n_features=384, max_keypoints=384, n_levels=4,
                      edge_threshold=32, query_buckets=(256,)),
        match=dataclasses.replace(DEFAULT_CONFIG.match, ransac_iters=256),
    )
    # k=384 is not a multiple of 128? 384 = 3*128 ok.
    index = orb_matcher.build_slide_index_chunked(slides, cfg, chunk=25)
    di = index.desc_index
    s, k = n_slides, index.pts.shape[1]
    screen_desc = hamming.build_screen_desc(di.desc, di.valid, s, k)
    index_b = index._replace(desc_index=di._replace(screen_desc=screen_desc))
    assert di.screen_desc is None  # CPU build: legacy path by default

    fr = jnp.asarray(frames)
    seeds = jnp.arange(3, dtype=jnp.int32)
    legacy = orb_matcher.match_frames(fr, seeds, index, hw, cfg)
    batched = orb_matcher.match_frames(fr, seeds, index_b, hw, cfg)

    np.testing.assert_array_equal(np.asarray(legacy.slide),
                                  np.asarray(batched.slide))
    np.testing.assert_allclose(np.asarray(legacy.similarity),
                               np.asarray(batched.similarity), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(legacy.rating),
                               np.asarray(batched.rating), rtol=1e-5)
