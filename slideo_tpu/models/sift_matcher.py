"""SIFT-family matcher: scale-invariant features + homography verification.

Second model family beside the ORB matcher (BASELINE.json config 2:
"SIFT + ratio-test kNN + RANSAC homography", config 4: camera-recorded
perspective). Pipeline shape mirrors orb_matcher:

    DoG features -> cosine match table -> Lowe ratio selection ->
    RANSAC homography -> top-10 rating cascade -> projective warp
    similarity -> winner.

The acceptance thresholds reuse MatchConfig (inlier floor, rating ratio,
similarity) so both engines plug into the same pipeline and cache.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlideoConfig
from ..ops import hamming, homography, image, select, verify
from ..ops.sift import SiftFeatures, extract_sift

__all__ = [
    "SiftSlideIndex",
    "build_slide_index_sift",
    "build_slide_index_sift_chunked",
    "match_frame_sift",
    "match_frames_sift",
]


class SiftSlideIndex(NamedTuple):
    """Per-deck device state for the SIFT engine.

    desc:   [S*K, 128] float32 unit descriptors
    valid:  [S*K] bool
    pts:    [S, K, 2] float32
    scale:  [S, K] float32 octave scale per keypoint
    smalls: [S, hs, ws] float32
    """

    desc: jax.Array
    valid: jax.Array
    pts: jax.Array
    scale: jax.Array
    smalls: jax.Array


def build_slide_index_sift(slide_grays: jax.Array, cfg: SlideoConfig) -> SiftSlideIndex:
    feats: SiftFeatures = jax.lax.map(
        lambda im: extract_sift(im, cfg.sift), slide_grays
    )
    s, k, d = feats.desc.shape
    smalls = image.to_small_image(slide_grays, cfg.video.small_image_area)
    return SiftSlideIndex(
        desc=feats.desc.reshape(s * k, d),
        valid=feats.valid.reshape(s * k),
        pts=feats.pts,
        scale=feats.scale,
        smalls=smalls,
    )


def build_slide_index_sift_chunked(
    slide_grays, cfg: SlideoConfig, chunk: int = 32
) -> SiftSlideIndex:
    """Build the SIFT deck index in fixed-size slide chunks (host loop).

    Mirrors orb_matcher.build_slide_index_chunked: each chunk is one device
    program, so a 500-slide 1080p deck never jits one monolithic program or
    holds all full-res pages in HBM at once (reference precompute analogue:
    the rayon per-slide pool, lib.rs:44-56).
    """
    import numpy as _np

    s = slide_grays.shape[0]
    chunk = max(1, min(chunk, s))
    n_chunks = -(-s // chunk)
    pad = n_chunks * chunk - s
    if pad:
        slide_grays = _np.concatenate(
            [slide_grays, _np.repeat(slide_grays[-1:], pad, axis=0)]
        )

    def one_chunk(imgs):
        feats = jax.lax.map(
            lambda im: extract_sift(im.astype(jnp.float32), cfg.sift), imgs
        )
        smalls = image.to_small_image(imgs, cfg.video.small_image_area)
        return feats, smalls

    fn = jax.jit(one_chunk)
    outs = [
        fn(jnp.asarray(slide_grays[c * chunk : (c + 1) * chunk]))
        for c in range(n_chunks)
    ]
    desc = jnp.concatenate([f.desc for f, _ in outs])[:s]
    valid = jnp.concatenate([f.valid for f, _ in outs])[:s]
    pts = jnp.concatenate([f.pts for f, _ in outs])[:s]
    scale = jnp.concatenate([f.scale for f, _ in outs])[:s]
    smalls = jnp.concatenate([sm for _, sm in outs])[:s]
    k, d = desc.shape[1], desc.shape[2]
    return jax.block_until_ready(
        SiftSlideIndex(
            desc=desc.reshape(s * k, d),
            valid=valid.reshape(s * k),
            pts=pts,
            scale=scale,
            smalls=smalls,
        )
    )


def match_frame_sift(
    frame: jax.Array,
    frame_seed: jax.Array,
    index: SiftSlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
):
    from .orb_matcher import FrameMatch

    n_slides, k_per_slide = index.pts.shape[0], index.pts.shape[1]
    mcfg = cfg.match

    feats = extract_sift(frame, cfg.sift)
    if n_slides > mcfg.screen_above_slides:
        # Large decks: bf16 stage-1 voting sweep, exact f32 table over the
        # cfg.screen_slides survivors only (the ORB engine's two-stage
        # shape; gate: tests/test_sift.py::test_sift_screened_matches_exact).
        score = jnp.where(feats.valid, feats.score, -1.0)
        cand = hamming.screen_slides_float(
            feats.desc, score, index.desc, index.valid,
            n_slides, k_per_slide, mcfg,
        )
        dsub, vsub = hamming.sub_desc_for_slides(
            index.desc, index.valid, cand, k_per_slide
        )
        table = hamming.match_table_float(
            feats.desc, dsub, vsub, cand.shape[0], k_per_slide,
            slide_ids=cand,
        )
    else:
        table = hamming.match_table_float(
            feats.desc, index.desc, index.valid, n_slides, k_per_slide
        )
    cands = select.select_candidates_lowe(
        table, feats.valid, mcfg, cfg.sift.lowe_ratio
    )

    cand_pts = jnp.take(index.pts, cands.slide_ids, axis=0)
    src = jnp.take_along_axis(cand_pts, cands.train_ids[..., None], axis=1)
    dst = jnp.take(feats.pts, cands.query_ids, axis=0)
    valid = cands.match_valid & cands.cand_valid[:, None]

    # Scale-aware inlier tolerance: localization error grows with the
    # detection octave on BOTH sides of a match.
    cand_scale = jnp.take(index.scale, cands.slide_ids, axis=0)
    src_scale = jnp.take_along_axis(cand_scale, cands.train_ids, axis=1)
    dst_scale = jnp.take(feats.scale, cands.query_ids, axis=0)
    tol = jnp.maximum(src_scale, dst_scale)

    key = jax.random.fold_in(jax.random.key(mcfg.ransac_seed), frame_seed)
    rr = homography.ransac_homography(src, dst, valid, key, mcfg, tol=tol)

    t = min(mcfg.top_rated, rr.rating.shape[0])
    top_rating, top_idx = jax.lax.top_k(rr.rating, t)
    best_rating = top_rating[0]
    retain = (top_rating > cfg.sift.min_rating) & (
        top_rating / jnp.maximum(best_rating, 1e-9) > mcfg.min_rating_ratio
    )
    retain &= jnp.take(rr.ok & cands.cand_valid, top_idx)

    top_h = homography.Homography(jnp.take(rr.transform.h, top_idx, axis=0))
    top_slides = jnp.take(cands.slide_ids, top_idx)

    sims = verify.warp_similarity_homography(
        frame, top_h, index.smalls, top_slides, slide_hw,
        stride=mcfg.verify_stride,
    )
    sims = jnp.where(retain, sims, -jnp.inf)

    win = jnp.argmax(sims)
    win_sim = sims[win]
    accept = win_sim > mcfg.min_similarity
    return FrameMatch(
        slide=jnp.where(accept, top_slides[win], -1).astype(jnp.int32),
        similarity=win_sim,
        rating=top_rating[win],
    )


def match_frames_sift(
    frames: jax.Array,
    frame_seeds: jax.Array,
    index: SiftSlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
):
    return jax.lax.map(
        lambda args: match_frame_sift(args[0], args[1], index, slide_hw, cfg),
        (frames, frame_seeds),
    )
