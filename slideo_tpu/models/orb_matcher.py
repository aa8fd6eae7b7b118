"""The flagship model: end-to-end ORB frame-vs-slides matcher, one XLA program.

This is the TPU-native replacement for the reference's whole per-frame
algorithm ``match_images_with_frame`` (crates/matching-opencv/src/lib.rs:
249-414) plus the slide precompute ``ProcessedImage::compute`` (lib.rs:92-132):

    features -> exact Hamming kNN (k=30) -> 5% ratio filter -> group by slide
    -> top-40 by count -> vectorized RANSAC (thresh 3.0, 2000 iters) ->
    top-10 by inliers, rating>50 & rating/best>0.2 -> inverse warp +
    L2 similarity -> similarity>0.5 -> winner.

All stages run on device with static shapes; a frame that matches nothing
returns slide index -1 (the reference's ``image: None``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

from ..config import SlideoConfig
from ..ops import fast as fast_ops
from ..ops import features as features_ops
from ..ops import hamming, image, ransac, select, verify
from ..ops.features import Features, extract_features

__all__ = ["SlideIndex", "FrameMatch", "build_slide_index", "build_slide_index_chunked", "build_slide_index_from_chunks", "match_frame", "match_frames", "cascade_from_table"]


class SlideIndex(NamedTuple):
    """Precomputed per-deck state living in device memory.

    desc_index: flattened descriptor index over all slides
    pts:        [S, K, 2] float32 keypoint positions per slide (page coords)
    smalls:     [S, hs, ws] float32 slide thumbnails for verification
    """

    desc_index: hamming.DescriptorIndex
    pts: jax.Array
    smalls: jax.Array


class FrameMatch(NamedTuple):
    """Result for one frame: slide = -1 means "no slide visible"."""

    slide: jax.Array        # int32
    similarity: jax.Array   # float32 (of the winner; -inf if none survived)
    rating: jax.Array       # float32 RANSAC inlier count of the winner


def build_slide_index(slide_grays: jax.Array, cfg: SlideoConfig) -> SlideIndex:
    """Extract features + thumbnails for all slides [S, H, W] (one program).

    The reference computes this per slide in a rayon pool (lib.rs:44-56);
    here it is one lax.map'd device program. For large decks prefer
    ``build_slide_index_chunked`` (bounded memory, upload/compute overlap).
    """
    feats: Features = jax.lax.map(
        lambda im: extract_features(im.astype(jnp.float32), cfg.orb), slide_grays
    )
    index = hamming.build_index(feats.desc, feats.valid)
    smalls = image.to_small_image(slide_grays, cfg.video.small_image_area)
    return SlideIndex(desc_index=index, pts=feats.pts, smalls=smalls)


def build_slide_index_chunked(
    slide_grays, cfg: SlideoConfig, chunk: int = 32
) -> SlideIndex:
    """Build the deck index in fixed-size slide chunks (host-side loop).

    slide_grays: [S, H, W] numpy array (uint8 preferred — 4x smaller
    host->device transfers). Each chunk is one device program; dispatches
    queue back-to-back so chunk c+1's upload overlaps chunk c's compute, and
    device memory holds one chunk of full-res pages instead of the deck.
    """
    s = slide_grays.shape[0]
    chunk = max(1, min(chunk, s))
    chunks = (slide_grays[c : c + chunk] for c in range(0, s, chunk))
    return build_slide_index_from_chunks(chunks, s, cfg, chunk)


def build_slide_index_from_chunks(
    chunks, n_slides: int, cfg: SlideoConfig, chunk: int,
    breakdown: dict | None = None,
) -> SlideIndex:
    """Build the deck index from an iterator of [<=chunk, H, W] uint8 numpy
    batches (streaming form of build_slide_index_chunked).

    The iterator may produce chunks lazily (e.g. decoding page PNGs in a
    background thread, pipeline._iter_page_chunks) so host image decode
    overlaps device upload + feature extraction — on a single-core host the
    decode cost of a 500-page deck then hides entirely under the build.
    A short final chunk is padded by repeating its last page (pad rows are
    trimmed after the concat).

    breakdown, if given, gains wall-time terms: decode_wait_s (time blocked
    on the chunk iterator), first_chunk_s (compile + first dispatch of the
    extract program), dispatch_s (remaining async chunk dispatches),
    assemble_s (concat + build_index + the blocking fetch barrier).
    """
    import time as _time

    import numpy as _np

    from ..ops.features import extract_features_batch

    def one_chunk(imgs):
        feats = extract_features_batch(imgs.astype(jnp.float32), cfg.orb)
        smalls = image.to_small_image(imgs, cfg.video.small_image_area)
        return feats, smalls

    fn = jax.jit(one_chunk)
    outs = []
    t_wait = t_first = t_disp = 0.0
    it = iter(chunks)
    while True:
        t0 = _time.time()
        batch = next(it, None)
        t_wait += _time.time() - t0
        if batch is None:
            break
        if batch.shape[0] < chunk:
            batch = _np.concatenate(
                [batch, _np.repeat(batch[-1:], chunk - batch.shape[0], axis=0)]
            )
        t0 = _time.time()
        outs.append(fn(jnp.asarray(batch)))
        if not t_first:
            t_first = _time.time() - t0
        else:
            t_disp += _time.time() - t0
    s = n_slides
    t0 = _time.time()
    desc = jnp.concatenate([f.desc for f, _ in outs])[:s]
    valid = jnp.concatenate([f.valid for f, _ in outs])[:s]
    pts = jnp.concatenate([f.pts for f, _ in outs])[:s]
    smalls = jnp.concatenate([sm for _, sm in outs])[:s]
    index = jax.jit(hamming.build_index)(desc, valid)
    out = jax.block_until_ready(
        SlideIndex(desc_index=index, pts=pts, smalls=smalls)
    )
    if breakdown is not None:
        breakdown.update(
            decode_wait_s=round(t_wait, 2),
            first_chunk_s=round(t_first, 2),
            dispatch_s=round(t_disp, 2),
            assemble_s=round(_time.time() - t0, 2),
        )
    return out


def _query_buckets(cfg: SlideoConfig) -> tuple[int, ...]:
    """Ascending static query-size buckets; max_keypoints is always last."""
    mk = cfg.orb.max_keypoints
    return tuple(sorted({q for q in cfg.orb.query_buckets if 0 < q < mk})) + (mk,)


def match_frame(
    frame: jax.Array,
    frame_seed: jax.Array,
    index: SlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
) -> FrameMatch:
    """Match one [H, W] float32 grayscale frame against the slide index.

    frame_seed: int32 scalar making RANSAC deterministic per frame (the
    reference relies on OpenCV's global RNG; we key on the frame identity).
    slide_hw: static full-resolution page size backing ``index.smalls``.

    Description + matching are bucketed by the frame's valid-keypoint count
    (lax.switch over static Q sizes): only the taken branch executes, so a
    typical ~500-keypoint lecture frame pays for Q=768 — not max_keypoints —
    in every per-keypoint stage and in the [Q, S] match table. Results are
    identical across buckets (a bucket always covers all valid keypoints).
    """
    h, w = frame.shape
    meta = features_ops.pyramid_meta(h, w, cfg.orb)
    atlas = features_ops.build_pyramid(frame, cfg.orb)
    kps = features_ops.detect_pyramid(atlas, meta, cfg.orb)
    return _match_detected(atlas, meta, kps, frame_seed, index, slide_hw, cfg)


def _match_detected(
    atlas: jax.Array,
    meta,
    kps,
    frame_seed: jax.Array,
    index: SlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
) -> FrameMatch:
    """Describe + match + cascade from a prebuilt atlas and detections
    (split from match_frame so match_frames can batch the pyramid + FAST
    front end across frames in one launch). The full-res frame is level 0
    of the atlas."""
    n_slides, k_per_slide = index.pts.shape[0], index.pts.shape[1]
    h, w = meta.sizes[0]
    # Level 0 holds the raw frame pixels (integers <= 255 — exact even when
    # the atlas is stored bf16); verification math stays float32.
    frame = jax.lax.slice(atlas, (0, 0), (h, w)).astype(jnp.float32)
    buckets = _query_buckets(cfg)

    # Train-id strategy: when the (possibly screened) table is barely wider
    # than the candidate set, computing the argmax inside the table kernel
    # (~20% over max-only) beats re-running the candidate slides' matmuls in
    # select (hamming.train_ids_for_slides). Wide exact tables keep the
    # max-only + recompute split.
    screened = n_slides > cfg.match.screen_above_slides
    table_cols = cfg.match.screen_slides if screened else n_slides
    with_train = table_cols <= max(4 * cfg.match.top_slides, 128)

    def run(q: int) -> FrameMatch:
        feats = features_ops.describe(atlas, meta, kps, q, cfg.orb)
        table = hamming.match_table_frame(
            feats.desc, feats.score, index.desc_index, n_slides, k_per_slide,
            cfg.match, with_train=with_train,
        )
        train_for_slides = (
            None if with_train else
            lambda sids: hamming.train_ids_for_slides(
                feats.desc, index.desc_index, sids, k_per_slide
            )
        )
        return cascade_from_table(
            frame, frame_seed, feats, table, index.pts, index.smalls,
            slide_hw, cfg, train_for_slides=train_for_slides,
        )

    if len(buckets) == 1:
        return run(buckets[0])
    count = jnp.sum(kps.valid)
    branch = jnp.searchsorted(
        jnp.asarray(np.asarray(buckets[:-1], np.int32)), count, side="left"
    )
    return jax.lax.switch(branch, [lambda q=q: run(q) for q in buckets])


def cascade_from_table(
    frame: jax.Array | None,
    frame_seed: jax.Array,
    feats: Features,
    table,
    slide_pts: jax.Array,
    slide_smalls: jax.Array,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
    train_for_slides=None,
    frame_small: jax.Array | None = None,
    frame_hw: tuple[int, int] | None = None,
) -> FrameMatch:
    """The post-matching verification cascade (ratio filter -> ... -> winner).

    Takes a hamming.MatchTable; split out so sharded matching variants
    (index-parallel, parallel/mesh.py) reuse the identical cascade.
    train_for_slides: required when the table carries no train ids
    (see select.select_candidates_table).
    frame may be None when a precomputed frame_small (+ static frame_hw)
    is supplied (the batched screened pipeline).
    """
    mcfg = cfg.match
    keep, top_counts, cand_cols = select.rank_candidates_table(
        table, feats.valid, mcfg
    )

    def make_cands(c: int) -> select.CandidateMatches:
        return select.compact_from_rank(
            table, keep, top_counts[:c], cand_cols[:c], mcfg, train_for_slides
        )

    def run(cs: select.CandidateMatches) -> FrameMatch:
        # Gather matched point pairs: slide keypoints -> frame keypoints.
        cand_pts = jnp.take(slide_pts, cs.slide_ids, axis=0)        # [C, K, 2]
        src = jnp.take_along_axis(cand_pts, cs.train_ids[..., None], axis=1)
        dst = jnp.take(feats.pts, cs.query_ids, axis=0)             # [C, M, 2]
        valid = cs.match_valid & cs.cand_valid[:, None]

        key = jax.random.fold_in(jax.random.key(mcfg.ransac_seed), frame_seed)
        rr = ransac.ransac_similarity(src, dst, valid, key, mcfg)

        # Rating cascade (lib.rs:329-333): top-10 by inliers, floor 50,
        # competitiveness 0.2 of the best rating.
        t = min(mcfg.top_rated, rr.rating.shape[0])
        top_rating, top_idx = jax.lax.top_k(rr.rating, t)
        best_rating = top_rating[0]
        retain = (top_rating > mcfg.min_rating) & (
            top_rating / jnp.maximum(best_rating, 1e-9) > mcfg.min_rating_ratio
        )
        retain &= jnp.take(rr.ok & cs.cand_valid, top_idx)

        top_t = ransac.Similarity(*(jnp.take(f, top_idx) for f in rr.transform))
        top_slides = jnp.take(cs.slide_ids, top_idx)

        sims = verify.warp_similarity(
            frame, top_t, slide_smalls, top_slides, slide_hw,
            stride=mcfg.verify_stride,
            frame_small=frame_small, frame_hw=frame_hw,
        )
        sims = jnp.where(retain, sims, -jnp.inf)

        # Final pick (lib.rs:370-383): max similarity, must exceed 0.5.
        win = jnp.argmax(sims)
        win_sim = sims[win]
        accept = win_sim > mcfg.min_similarity
        return FrameMatch(
            slide=jnp.where(accept, top_slides[win], -1).astype(jnp.int32),
            similarity=win_sim,
            rating=top_rating[win],
        )

    # Lossless viable-prefix trim (MatchConfig.cascade_viable_prefix):
    # counts are sorted desc, so when at most `prefix` candidates exceed the
    # rating floor they all sit in the prefix, and skipping compaction +
    # RANSAC + verify for the rest cannot change the winner (see config.py
    # proof sketch).
    c_total = top_counts.shape[0]
    prefix = mcfg.cascade_viable_prefix
    if 0 < prefix < c_total:
        n_viable = jnp.sum(top_counts > mcfg.min_rating)
        return jax.lax.cond(
            n_viable <= prefix,
            lambda: run(make_cands(prefix)),
            lambda: run(make_cands(c_total)),
        )
    return run(make_cands(c_total))


def _pad_features(ft: Features, total: int) -> Features:
    """Pad a bucket-sized Features to ``total`` slots (pad rows invalid).

    The pad sits at the END, so slicing [:q] recovers the bucket-sized set
    bit-exactly (describe's compaction orders rows by descending score)."""
    pad = total - ft.score.shape[0]
    if pad <= 0:
        return ft
    return Features(
        pts=jnp.pad(ft.pts, ((0, pad), (0, 0))),
        desc=jnp.pad(ft.desc, ((0, pad), (0, 0))),
        score=jnp.pad(ft.score, ((0, pad),)),
        valid=jnp.pad(ft.valid, ((0, pad),)),
    )


def _match_frames_screened_batch(
    frames: jax.Array,
    frame_seeds: jax.Array,
    index: SlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
) -> FrameMatch:
    """Screened-deck batch path: per-frame features -> ONE batched stage-1
    sweep -> per-frame stage-2 + cascade.

    Stage-1 voting is full-K (hamming.screen_slides_batched): all frames'
    strongest queries stack into one Pallas sweep, so the screening tensor
    streams from HBM once per batch instead of once per frame — full-K
    recall (the fidelity fix, see config.screen_k_per_slide) at roughly the
    cost the quarter-K per-frame sweep used to pay. Full-res frames are
    consumed by phase 1 (features + verification thumbnail); the cascade
    runs from the thumbnail, so no [B, H, W] float pyramid survives across
    phases.
    """
    b, h, w = frames.shape
    meta = features_ops.pyramid_meta(h, w, cfg.orb)
    n_slides, k_per_slide = index.pts.shape[0], index.pts.shape[1]
    mk = cfg.orb.max_keypoints
    mcfg = cfg.match
    buckets = _query_buckets(cfg)

    def feat_fn(im):
        imf = im.astype(jnp.float32)
        atlas = features_ops.build_pyramid(imf, cfg.orb)
        kps = features_ops.detect_pyramid(atlas, meta, cfg.orb)

        def at(q: int) -> Features:
            return _pad_features(
                features_ops.describe(atlas, meta, kps, q, cfg.orb), mk
            )

        if len(buckets) == 1:
            ft = at(buckets[0])
            count = jnp.sum(kps.valid)
        else:
            count = jnp.sum(kps.valid)
            branch = jnp.searchsorted(
                jnp.asarray(np.asarray(buckets[:-1], np.int32)), count,
                side="left",
            )
            ft = jax.lax.switch(branch, [lambda q=q: at(q) for q in buckets])
        fsmall = image.to_small_image(imf, cfg.video.small_image_area)
        key = jnp.where(ft.valid, ft.score, -1.0)
        _, topq = jax.lax.top_k(key, mcfg.screen_queries)
        qdesc = jnp.take(ft.desc, topq, axis=0)
        return ft, fsmall, qdesc, count

    ft, fsmalls, qdescs, counts = jax.lax.map(feat_fn, frames)

    cand = hamming.screen_slides_batched(
        qdescs, index.desc_index, n_slides, k_per_slide, mcfg
    )                                                          # [B, C]

    def tail_fn(args):
        ft_i, fsmall_i, cand_i, count_i, seed_i = args
        ft_i = Features(*ft_i)

        def run(q: int) -> FrameMatch:
            ftq = Features(*(f[:q] for f in ft_i))  # exact: pad is at the end
            sub = hamming.sub_index_for_slides(
                index.desc_index, cand_i, k_per_slide
            )
            table = hamming.match_table(
                ftq.desc, sub, cand_i.shape[0], k_per_slide,
                slide_ids=cand_i, with_train=True,
            )
            return cascade_from_table(
                None, seed_i, ftq, table, index.pts, index.smalls,
                slide_hw, cfg, frame_small=fsmall_i, frame_hw=(h, w),
            )

        if len(buckets) == 1:
            return run(buckets[0])
        branch = jnp.searchsorted(
            jnp.asarray(np.asarray(buckets[:-1], np.int32)), count_i,
            side="left",
        )
        return jax.lax.switch(branch, [lambda q=q: run(q) for q in buckets])

    return jax.lax.map(
        tail_fn, (tuple(ft), fsmalls, cand, counts, frame_seeds)
    )


def match_frames(
    frames: jax.Array,
    frame_seeds: jax.Array,
    index: SlideIndex,
    slide_hw: tuple[int, int],
    cfg: SlideoConfig,
) -> FrameMatch:
    """Match a [B, H, W] batch.

    Screened decks (> MatchConfig.screen_above_slides) with a prebuilt
    screening tensor take the batched stage-1 path
    (_match_frames_screened_batch). Otherwise frames run through match_frame
    inside lax.map — full-batch fusion of detect/describe/cascade measured
    SLOWER on v5e (the (B, bands) grid serializes per-band DMA across
    frames and cascade transients scale with B; round-2/r4 NOTES).
    """
    n_slides = index.pts.shape[0]
    if (
        n_slides > cfg.match.screen_above_slides
        and cfg.match.screen_bits == hamming.SCREEN_BITS
        and index.desc_index.screen_desc is not None
    ):
        return _match_frames_screened_batch(
            frames, frame_seeds, index, slide_hw, cfg
        )
    return jax.lax.map(
        lambda args: match_frame(args[0], args[1], index, slide_hw, cfg),
        (frames, frame_seeds),
    )


def jit_match_frames(slide_hw: tuple[int, int], cfg: SlideoConfig):
    """Compiled batch matcher: (frames, seeds, index) -> FrameMatch.

    The index is a traced argument (never close over device arrays in a jit —
    they would be embedded into the executable as constants).
    """
    return jax.jit(partial(match_frames, slide_hw=slide_hw, cfg=cfg))
