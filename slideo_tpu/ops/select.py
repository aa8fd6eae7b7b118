"""Match filtering, per-slide grouping, and candidate compaction.

Device-side equivalent of the reference's per-frame match bookkeeping
(crates/matching-opencv/src/lib.rs:268-295): the 5%-of-best distance filter,
grouping matches by slide, ranking slides by match count, and taking the top
40 candidates — all as masked fixed-shape ops (segment-sum + top-k) instead
of hash maps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatchConfig
from .hamming import KnnResult

__all__ = [
    "CandidateMatches",
    "select_candidates",
    "select_candidates_table",
    "rank_candidates_table",
    "compact_from_rank",
]


class CandidateMatches(NamedTuple):
    """Per-candidate-slide compacted matches, fixed shapes.

    slide_ids:  [C] int32 candidate slide (top-C by kept-match count)
    cand_valid: [C] bool candidate has any kept match
    query_ids:  [C, M] int32 frame keypoint slot of each match
    train_ids:  [C, M] int32 slide keypoint slot of each match
    match_valid:[C, M] bool  (valid entries are compacted to the front,
                              ordered by ascending distance)
    counts:     [C] float32 kept-match count (the reference's grouping size)
    """

    slide_ids: jax.Array
    cand_valid: jax.Array
    query_ids: jax.Array
    train_ids: jax.Array
    match_valid: jax.Array
    counts: jax.Array


def rank_candidates_table(
    table, query_valid: jax.Array, cfg: MatchConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The cheap half of table-based candidate selection.

    Applies the ratio filter + per-query fan-out cap and ranks slides by
    kept-match count. Returns (keep [Q, S] bool, top_counts [C] desc-sorted,
    cand_cols [C] table columns). The expensive per-candidate compaction
    lives in compact_from_rank so callers can compact only a prefix
    (cascade_viable_prefix).
    """
    q, s = table.dist.shape
    big = jnp.float32(1e6)
    valid = table.valid & query_valid[:, None]
    dist = jnp.where(valid, table.dist, big)
    best = jnp.min(dist, axis=1, keepdims=True)
    keep = valid & (table.dist < best * cfg.ratio)

    # Per-query fan-out cap (reference kNN k=30): keep only the knn_k
    # nearest kept slides. Only needed when more columns could pass.
    if s > cfg.knn_k:
        key = jnp.where(keep, big - table.dist, -big)
        kth = jax.lax.top_k(key, cfg.knn_k)[0][:, -1:]
        keep &= key >= jnp.maximum(kth, 0.0)

    counts = jnp.sum(keep, axis=0).astype(jnp.float32)  # [S]
    c = min(cfg.top_slides, s)
    top_counts, cand_cols = jax.lax.top_k(counts, c)
    return keep, top_counts, cand_cols


def compact_from_rank(
    table,
    keep: jax.Array,
    top_counts: jax.Array,
    cand_cols: jax.Array,
    cfg: MatchConfig,
    train_for_slides=None,
) -> CandidateMatches:
    """Per-candidate match compaction (the expensive top_k-per-candidate
    half); cand_cols/top_counts may be a prefix of rank_candidates_table's
    output."""
    q = keep.shape[0]
    big = jnp.float32(1e6)
    cand_valid = top_counts > 0
    m = min(cfg.max_matches_per_slide, q)
    cand_slide_ids = jnp.take(table.slide_ids, cand_cols)
    if table.train is None:
        if train_for_slides is None:
            raise ValueError("table has no train ids; pass train_for_slides")
        train_cq = train_for_slides(cand_slide_ids)  # [C, Q]
    else:
        train_cq = table.train.T[cand_cols]          # [C, Q]

    def compact(col, train_q):
        mine = keep[:, col]
        key = jnp.where(mine, big - table.dist[:, col], -big)
        topv, qidx = jax.lax.top_k(key, m)
        return qidx, jnp.take(train_q, qidx), topv > 0

    query_ids, train_ids, match_valid = jax.vmap(compact)(cand_cols, train_cq)
    return CandidateMatches(
        slide_ids=cand_slide_ids,
        cand_valid=cand_valid,
        query_ids=query_ids,
        train_ids=train_ids,
        match_valid=match_valid,
        counts=top_counts,
    )


def select_candidates_table(
    table,
    query_valid: jax.Array,
    cfg: MatchConfig,
    train_for_slides=None,
) -> CandidateMatches:
    """Candidate selection from a best-match table (sort-free fast path).

    table: hamming.MatchTable with [Q, S] dist/train, [S] slide_ids.
    Semantics follow lib.rs:268-295: per query, the nearest neighbour over
    the whole index defines best_dist; matches with dist < best*1.05 are
    kept (including the quirk that best_dist==0 keeps nothing), capped at
    the cfg.knn_k strongest slides per query (the reference's kNN fan-out);
    slides are ranked by kept-match count and the top cfg.top_slides become
    candidates with their matches compacted by ascending distance.

    train_for_slides: callback [C] global slide ids -> [C, Q] arg-best
    descriptor slots (hamming.train_ids_for_slides bound to the index).
    Required when the table was built ``with_train=False``: the argmax then
    runs only over the <=cfg.top_slides candidates instead of every slide.
    """
    keep, top_counts, cand_cols = rank_candidates_table(table, query_valid, cfg)
    return compact_from_rank(
        table, keep, top_counts, cand_cols, cfg, train_for_slides
    )


def select_candidates_lowe(
    table,
    query_valid: jax.Array,
    cfg: MatchConfig,
    lowe_ratio: float = 0.75,
) -> CandidateMatches:
    """Candidate selection with Lowe's ratio test (the SIFT engine's rule).

    PER-SLIDE Lowe: for each (query, slide) pair the pair's best match is
    kept iff best < lowe_ratio * second_best WITHIN that slide
    (table.dist2, built by hamming.match_table_float). This mirrors the
    reference's matching shape — it runs its kNN + filter per
    (frame, slide) pair, one slide's descriptor set at a time
    (lib.rs:249-292) — and makes screening exact by construction: a
    per-slide quantity is identical whether the table holds 16 screened
    columns or the whole deck. (The earlier cross-column formulation made
    the ratio depend on which OTHER slides were present, so the screened
    and exact paths admitted different match sets on near-duplicate decks
    — caught by test_fidelity_production's SIFT A/B at 250 slides.)
    Grouping/compaction mirror select_candidates_table.
    """
    q, s = table.dist.shape
    big = jnp.float32(1e6)
    assert table.dist2 is not None, "per-slide Lowe needs match_table_float"
    valid = table.valid & query_valid[:, None]
    keep = valid & (table.dist < lowe_ratio * table.dist2)

    counts = jnp.sum(keep, axis=0).astype(jnp.float32)
    c = min(cfg.top_slides, s)
    top_counts, cand_cols = jax.lax.top_k(counts, c)
    cand_valid = top_counts > 0

    m = min(cfg.max_matches_per_slide, q)

    def compact(col):
        mine = keep[:, col]
        key = jnp.where(mine, big - table.dist[:, col], -big)
        topv, qidx = jax.lax.top_k(key, m)
        return qidx, jnp.take(table.train[:, col], qidx), topv > 0

    query_ids, train_ids, match_valid = jax.vmap(compact)(cand_cols)
    return CandidateMatches(
        slide_ids=jnp.take(table.slide_ids, cand_cols),
        cand_valid=cand_valid,
        query_ids=query_ids,
        train_ids=train_ids,
        match_valid=match_valid,
        counts=top_counts,
    )


def select_candidates(
    matches: KnnResult,
    query_valid: jax.Array,
    n_slides: int,
    cfg: MatchConfig,
) -> CandidateMatches:
    """Apply the ratio filter and compact matches per top candidate slide.

    matches: KnnResult with [Q, k] arrays, distances ascending per query.
    query_valid: [Q] bool.

    The kept-match rule replicates lib.rs:275 exactly:
    ``dist < best_dist * 1.05`` with best = the query's nearest neighbour —
    including its quirk that a best distance of 0 keeps nothing.
    """
    q, k = matches.dist.shape
    best = matches.dist[:, :1]
    keep = matches.dist < best * cfg.ratio
    keep &= matches.valid & query_valid[:, None]

    flat_keep = keep.reshape(-1)
    flat_slide = matches.slide.reshape(-1)
    flat_dist = matches.dist.reshape(-1)
    flat_train = matches.train.reshape(-1)
    flat_query = (
        jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32)[:, None], (q, k)).reshape(-1)
    )

    counts = jax.ops.segment_sum(
        flat_keep.astype(jnp.float32), flat_slide, num_segments=n_slides
    )
    c = min(cfg.top_slides, n_slides)
    top_counts, cand_slides = jax.lax.top_k(counts, c)
    cand_slides = cand_slides.astype(jnp.int32)
    cand_valid = top_counts > 0

    # Compact each candidate's matches: rank key puts kept matches of the
    # candidate first, ordered by ascending distance.
    m = cfg.max_matches_per_slide
    big = jnp.float32(1e9)

    def compact(slide_id):
        mine = flat_keep & (flat_slide == slide_id)
        key = jnp.where(mine, big - flat_dist, -big)
        topv, idx = jax.lax.top_k(key, min(m, key.shape[0]))
        return (
            jnp.take(flat_query, idx),
            jnp.take(flat_train, idx),
            topv > 0,
        )

    query_ids, train_ids, match_valid = jax.vmap(compact)(cand_slides)
    return CandidateMatches(
        slide_ids=cand_slides,
        cand_valid=cand_valid,
        query_ids=query_ids,
        train_ids=train_ids,
        match_valid=match_valid,
        counts=top_counts,
    )
