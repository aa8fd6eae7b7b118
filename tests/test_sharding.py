"""Multi-device sharding on the virtual 8-device CPU mesh.

Validates: (a) frame-DP shard_map equals single-device results, (b) the
index-parallel kNN all_gather merge is exactly the global top-k, (c) the
full 2-D mesh match step runs and matches.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.models import orb_matcher
from slideo_tpu.ops import hamming
from slideo_tpu.parallel import mesh as pmesh

needs_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def cfg():
    orb = dataclasses.replace(
        DEFAULT_CONFIG.orb,
        n_features=128, max_keypoints=128, n_levels=3, edge_threshold=32,
    )
    match = dataclasses.replace(
        DEFAULT_CONFIG.match,
        ransac_iters=128, max_matches_per_slide=64, min_rating=15.0,
        knn_chunk=1024,
    )
    return dataclasses.replace(DEFAULT_CONFIG, orb=orb, match=match)


def _synthetic(rng, n_slides=4, hw=(200, 280), batch=8):
    import cv2

    h, w = hw
    slides = np.zeros((n_slides, h, w), np.float32)
    for s in range(n_slides):
        for _ in range(20):
            y, x = rng.randint(15, h - 25), rng.randint(15, w - 45)
            slides[s, y : y + rng.randint(3, 10), x : x + rng.randint(5, 35)] = (
                rng.randint(60, 255)
            )
    # Perturb frames: exact copies would hit the reference's ratio-filter
    # quirk (best distance 0 keeps no matches, lib.rs:275).
    frames = np.stack(
        [
            np.roll(slides[b % n_slides], b + 1, axis=1)
            + rng.randn(h, w).astype(np.float32) * 3.0
            for b in range(batch)
        ]
    )
    return slides, frames


@needs_8
def test_index_sharded_knn_is_exact(rng):
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("index",))
    q = rng.choice(np.array([-1, 1], np.int8), size=(64, 256))
    d = rng.choice(np.array([-1, 1], np.int8), size=(8, 96, 256))
    valid = rng.rand(8, 96) > 0.1
    index = hamming.build_index(jnp.asarray(d), jnp.asarray(valid))

    ref = hamming.knn(jnp.asarray(q), index, k=10, chunk=256)
    sharded = pmesh.knn_index_sharded(
        mesh, jnp.asarray(q), index, k=10, chunk=96
    )
    # distances must agree exactly (ids may differ on ties)
    assert (np.asarray(ref.dist) == np.asarray(sharded.dist)).all()
    assert (np.asarray(ref.valid) == np.asarray(sharded.valid)).all()


@needs_8
def test_frame_dp_matches_single_device(cfg, rng):
    slides, frames = _synthetic(rng)
    index = orb_matcher.build_slide_index(jnp.asarray(slides), cfg)
    seeds = jnp.arange(8, dtype=jnp.int32)
    hw = slides.shape[1:]

    single = orb_matcher.match_frames(jnp.asarray(frames), seeds, index, hw, cfg)
    mesh = pmesh.make_mesh(jax.devices()[:8], axis="frames")
    sharded = pmesh.match_frames_sharded(
        mesh, jnp.asarray(frames), seeds, index, hw, cfg
    )
    assert (np.asarray(single.slide) == np.asarray(sharded.slide)).all()
    np.testing.assert_allclose(
        np.asarray(single.similarity), np.asarray(sharded.similarity), rtol=1e-5
    )


@needs_8
def test_full_mesh_step(cfg, rng):
    slides, frames = _synthetic(rng)
    index = orb_matcher.build_slide_index(jnp.asarray(slides), cfg)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("frames", "index"))
    index = pmesh.shard_index(mesh, index)
    frames_s = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P("frames", None, None))
    )
    seeds = jax.device_put(
        jnp.arange(8, dtype=jnp.int32), NamedSharding(mesh, P("frames"))
    )
    out = pmesh.match_frames_mesh(
        frames_s, seeds, index, mesh=mesh, slide_hw=slides.shape[1:], cfg=cfg
    )
    got = np.asarray(out.slide)
    assert (got == np.arange(8) % 4).all(), got
