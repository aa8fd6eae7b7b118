"""Exact Hamming kNN descriptor matching on the MXU.

TPU-native replacement for the reference's FLANN-LSH approximate matcher
(crates/matching-opencv/src/flann.rs:14-89, knn_match k=30 at lib.rs:266).

Design
------
Descriptors are stored as +-1 int8 vectors of length 256; for two such
vectors, hamming = (256 - <q, d>) / 2, so distance ranking is a plain int8
matmul on the MXU with int32 accumulation.  The index (all slide descriptors
concatenated) is streamed through in fixed-size chunks with a running top-k
merge (``lax.scan``), so the [Q, N] score matrix never materializes in HBM.

Exact kNN dominates FLANN-LSH's recall, so output fidelity relative to the
reference can only improve; all downstream thresholds are unchanged.

For large decks an optional two-stage screening path (the LSH analogue)
first ranks slides using a 64-bit descriptor prefix over the strongest
queries, then runs exact kNN against only the surviving slides' descriptors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatchConfig

__all__ = ["DescriptorIndex", "build_index", "knn", "knn_frame"]

# Plain int (NOT a jnp scalar): module import must not touch any backend.
_NEG = -(2**30)

# Stage-1 screening tensor geometry: 128 descriptor-prefix rows + 2 validity
# rows (+-127 each: their sum -254 pushes invalid slots below any legitimate
# +-1 dot product, including the t < -127 edge when a query matches nothing)
# padded to the int8 sublane tile (32).
SCREEN_BITS = 128
_SCREEN_D = 160


class DescriptorIndex(NamedTuple):
    """Flattened multi-slide descriptor index.

    desc:      [N, D] int8 (+-1; zeros for invalid slots), N = n_slides * K
    slide_ids: [N] int32 slide of each descriptor
    train_ids: [N] int32 keypoint slot within its slide
    valid:     [N] bool
    desc_t:    [S, D, K] int8 per-slide-transposed copy, or None. The fused
               match-table kernel's fast path contracts (lhs [QB, D]) x
               (rhs [D, K]) per slide with int8 MXU inputs — natural layout,
               no in-kernel transpose or int8->bf16 relayout (both measured
               20-40% slower; tools/bench_table_kernel.py).
    screen_desc: [S, _SCREEN_D, K] int8 stage-1 voting tensor, or None:
               SCREEN_BITS descriptor-prefix rows per slide (transposed like
               desc_t) plus two validity rows that fold the invalid-slot
               bias INTO the MXU contraction (queries append two +1 columns)
               — the screening kernel then needs no per-element bias add.
    """

    desc: jax.Array
    slide_ids: jax.Array
    train_ids: jax.Array
    valid: jax.Array
    desc_t: jax.Array | None = None
    screen_desc: jax.Array | None = None

    @property
    def n_descriptors(self) -> int:
        return self.desc.shape[0]


def build_screen_desc(desc: jax.Array, valid: jax.Array, s: int, k: int) -> jax.Array:
    """[S, _SCREEN_D, K] int8 stage-1 voting tensor (see DescriptorIndex)."""
    d3 = desc.reshape(s, k, -1)[:, :, :SCREEN_BITS]
    pt = jnp.swapaxes(d3, 1, 2)                                # [S, bits, K]
    v = jnp.where(valid.reshape(s, k), 0, -127).astype(jnp.int8)
    vrows = jnp.broadcast_to(v[:, None, :], (s, 2, k))
    pad = jnp.zeros((s, _SCREEN_D - SCREEN_BITS - 2, k), jnp.int8)
    return jnp.concatenate([pt, vrows, pad], axis=1)


def unpack_descriptor_bits(
    desc_bits: jax.Array, valid_bits: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Device-side np.unpackbits: packed persisted index -> build_index inputs.

    desc_bits:  [S, K, D//8] uint8 (np.packbits of desc > 0, bitorder "big")
    valid_bits: [S, ceil(K/8)] uint8 (np.packbits of the validity mask)
    Returns (desc [S, K, D] int8 in {-1, +1}, valid [S, K] bool).

    Warm index loads ship the PACKED arrays to the device (32 MB for a
    500-slide deck) and unpack there — the host-side unpackbits + 262 MB
    raw-descriptor upload this replaces dominated warm-start time on
    tunneled/remote devices.
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # packbits is MSB-first
    s = desc_bits.shape[0]
    bits = (desc_bits[..., None] >> shifts) & jnp.uint8(1)
    desc = (bits.astype(jnp.int8) * 2 - 1).reshape(s, k, -1)
    vbits = (valid_bits[..., None] >> shifts) & jnp.uint8(1)
    valid = vbits.reshape(s, -1)[:, :k].astype(bool)
    return desc, valid


def pack_descriptor_bits(
    desc: jax.Array, valid: jax.Array, s: int, k: int
) -> tuple[jax.Array, jax.Array]:
    """Device-side np.packbits: build_index arrays -> persistable packed form.

    Inverse of unpack_descriptor_bits (same MSB-first byte layout as
    np.packbits): desc [S*K, D] (any signed dtype; bit = value > 0),
    valid [S*K] bool. Returns (desc_bits [S, K, D//8] uint8,
    valid_bits [S, ceil(K/8)] uint8).

    Packing on device before the fetch is what makes cold-build persistence
    viable on tunneled/remote TPUs: fetching the raw f32 descriptor tensor
    of a 500-slide deck moves ~1 GB (chip-measured r5: 436 s of a 483 s
    cold build was this one np.asarray); the packed form is 32 MB.
    """
    d = desc.shape[-1]
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    bits = (desc > 0).astype(jnp.uint8).reshape(s, k, d // 8, 8)
    desc_bits = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)
    kp = (-k) % 8
    v = valid.reshape(s, k).astype(jnp.uint8)
    if kp:
        v = jnp.pad(v, ((0, 0), (0, kp)))
    vbits = jnp.sum(
        v.reshape(s, -1, 8) * weights, axis=-1, dtype=jnp.uint8
    )
    return desc_bits, vbits


def build_index(slide_desc: jax.Array, slide_valid: jax.Array) -> DescriptorIndex:
    """Build the index from per-slide descriptors [S, K, D] and validity [S, K]."""
    s, k, d = slide_desc.shape
    desc = slide_desc.reshape(s * k, d)
    slide_ids = jnp.repeat(jnp.arange(s, dtype=jnp.int32), k)
    train_ids = jnp.tile(jnp.arange(k, dtype=jnp.int32), s)
    valid = slide_valid.reshape(s * k)
    desc = jnp.where(valid[:, None], desc, jnp.int8(0))
    # The transposed copies only feed the fused Pallas kernels, which run on
    # TPU alone — don't grow index memory (~+420 MB at 500x2048x256) on
    # other backends where those paths are never taken.
    on_tpu = jax.default_backend() == "tpu"
    desc_t = jnp.swapaxes(desc.reshape(s, k, d), 1, 2) if on_tpu else None
    screen_desc = (
        build_screen_desc(desc, valid, s, k)
        if on_tpu and k % 128 == 0 and d >= SCREEN_BITS
        else None
    )
    return DescriptorIndex(desc, slide_ids, train_ids, valid, desc_t, screen_desc)


def _chunked_topk_scores(
    query: jax.Array, desc: jax.Array, valid: jax.Array, k: int, chunk: int
) -> tuple[jax.Array, jax.Array]:
    """Running top-k of <query, desc_n> over index rows, streamed in chunks.

    query: [Q, D] int8; desc: [N, D] int8; valid: [N] bool.
    Returns (scores [Q, k] int32 sorted desc, ids [Q, k] int32 global rows).
    Invalid rows score -inf; with fewer than k valid rows the tail keeps the
    -inf sentinel (caller masks on score).
    """
    n = desc.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))
    n_chunks = desc.shape[0] // chunk
    desc_c = desc.reshape(n_chunks, chunk, desc.shape[1])
    valid_c = valid.reshape(n_chunks, chunk)

    q = query.shape[0]
    init = (
        jnp.full((q, k), _NEG, jnp.int32),
        jnp.zeros((q, k), jnp.int32),
    )

    def step(carry, inputs):
        best_s, best_i = carry
        ci, dchunk, vchunk = inputs
        scores = jax.lax.dot_general(
            query,
            dchunk,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [Q, chunk]
        scores = jnp.where(vchunk[None, :], scores, _NEG)
        s_top, i_top = jax.lax.top_k(scores, min(k, chunk))
        i_top = i_top + ci * chunk
        merged_s = jnp.concatenate([best_s, s_top], axis=1)
        merged_i = jnp.concatenate([best_i, i_top], axis=1)
        new_s, sel = jax.lax.top_k(merged_s, k)
        new_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (new_s, new_i), None

    (best_s, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), desc_c, valid_c)
    )
    return best_s, best_i


class KnnResult(NamedTuple):
    """Per-query k nearest index entries (sorted by ascending distance).

    dist:  [Q, k] float32 hamming distances
    slide: [Q, k] int32 slide ids
    train: [Q, k] int32 keypoint slot within the slide
    valid: [Q, k] bool
    """

    dist: jax.Array
    slide: jax.Array
    train: jax.Array
    valid: jax.Array


class MatchTable(NamedTuple):
    """Per-(query, slide) best match — the sort-free kNN representation.

    For every frame descriptor q and slide s: the minimum hamming distance
    over all of s's descriptors and the arg-min descriptor slot. This is
    sufficient for the reference's downstream pipeline (ratio filter, group
    by slide, count, RANSAC pairs: lib.rs:268-312) and replaces sorted
    top-k — which lowers to full row sorts on TPU — with pure max/argmax
    reductions that run at VPU rate.

    dist:  [Q, S] float32 best hamming distance per slide
    train: [Q, S] int32 arg-best keypoint slot within the slide, or None
           when the table was built with ``with_train=False`` (the cascade
           then recomputes arg slots only for candidate slides via
           ``train_ids_for_slides`` — the argmax over the full index is the
           VPU-dominant cost of the table, ~3x the plain max)
    slide_ids: [S] int32 global slide id of each column
    valid: [Q, S] bool (slide has >=1 valid descriptor)
    dist2: [Q, S] float32 per-slide SECOND-best distance, or None. Built by
           match_table_float for the SIFT engine's per-slide Lowe ratio test
           (select.select_candidates_lowe): the ratio is evaluated within
           each (frame, slide) pair — mirroring the reference's per-pair
           kNN matching (lib.rs:249-292 runs the matcher per slide) — so
           screening cannot change it (a per-slide quantity is identical
           whether 16 or 500 columns are present).
    """

    dist: jax.Array
    train: jax.Array | None
    slide_ids: jax.Array
    valid: jax.Array
    dist2: jax.Array | None = None


def match_table(
    query: jax.Array,
    index: DescriptorIndex,
    n_slides: int,
    k_per_slide: int,
    chunk_slides: int = 8,
    slide_ids: jax.Array | None = None,
    with_train: bool = True,
) -> MatchTable:
    """Compute the [Q, S] best-match table.

    On TPU (when shapes are lane-aligned) this uses the fused Pallas kernel
    (ops/pallas_table.py): one MXU contraction + on-chip max/argmax per
    slide, no [Q, c*K] score blocks ever reaching HBM. The XLA fallback
    streams slide chunks through a lax.scan of matmul + max/argmax
    (several GB of HBM score traffic per 1080p frame — ~4x slower).
    ~2*Q*D*S*K flops total, no sorts anywhere.
    """
    q, d_bits = query.shape
    if (
        jax.default_backend() == "tpu"
        and d_bits % 128 == 0
        and k_per_slide % 128 == 0
        and q >= 8
    ):
        from .pallas_table import match_table_scores_pallas

        bias = jnp.where(index.valid, 0.0, -1e6).astype(jnp.float32)
        if index.desc_t is not None:
            # Fast path: per-slide-transposed int8 index, all-integer
            # kernel (see DescriptorIndex.desc_t).
            best, arg = match_table_scores_pallas(
                query, index.desc_t, bias, n_slides, k_per_slide,
                with_arg=with_train, dtype=jnp.int8, transposed=True,
            )
        else:
            best, arg = match_table_scores_pallas(
                query.astype(jnp.float32), index.desc, bias, n_slides,
                k_per_slide, with_arg=with_train,
            )
        svalid = jnp.any(index.valid.reshape(n_slides, k_per_slide), axis=1)
        dist = (d_bits - best).astype(jnp.float32) * 0.5
        if slide_ids is None:
            slide_ids = jnp.arange(n_slides, dtype=jnp.int32)
        return MatchTable(
            dist=dist,
            train=arg,
            slide_ids=slide_ids,
            valid=jnp.broadcast_to(svalid[None, :], (q, n_slides)),
        )
    chunk_slides = max(1, min(chunk_slides, n_slides))
    pad_s = (-n_slides) % chunk_slides
    desc = index.desc.reshape(n_slides, k_per_slide, d_bits)
    valid = index.valid.reshape(n_slides, k_per_slide)
    if pad_s:
        desc = jnp.pad(desc, ((0, pad_s), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad_s), (0, 0)))
    n_chunks = desc.shape[0] // chunk_slides
    desc_c = desc.reshape(n_chunks, chunk_slides * k_per_slide, d_bits)
    valid_c = valid.reshape(n_chunks, chunk_slides, k_per_slide)

    # f32 inputs with f32 accumulation: exact for +-1 dots, and measured
    # fastest on v5e for this [2048, 256] x [256, 16k] shape (bf16 inputs
    # lowered ~8x slower here; int8 ~1.4x slower — see BENCH notes).
    query_f = query.astype(jnp.float32)

    def step(_, inputs):
        dchunk, vchunk = inputs
        scores = jax.lax.dot_general(
            query_f,
            dchunk.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(q, chunk_slides, k_per_slide)
        scores = jnp.where(vchunk[None], scores, jnp.float32(_NEG))
        best = jnp.max(scores, axis=-1)          # [Q, c]
        arg = (
            jnp.argmax(scores, axis=-1) if with_train
            else jnp.zeros((), jnp.int32)
        )
        return None, (best, arg, jnp.any(vchunk, axis=-1))

    _, (best, arg, svalid) = jax.lax.scan(step, None, (desc_c, valid_c))
    # [n_chunks, Q, c] -> [Q, S]
    best = jnp.moveaxis(best, 0, 1).reshape(q, -1)[:, :n_slides]
    if with_train:
        arg = (
            jnp.moveaxis(arg, 0, 1).reshape(q, -1)[:, :n_slides]
            .astype(jnp.int32)
        )
    else:
        arg = None
    svalid = svalid.reshape(-1)[:n_slides]
    dist = (d_bits - best).astype(jnp.float32) * 0.5
    if slide_ids is None:
        slide_ids = jnp.arange(n_slides, dtype=jnp.int32)
    return MatchTable(
        dist=dist,
        train=arg,
        slide_ids=slide_ids,
        valid=jnp.broadcast_to(svalid[None, :], (q, n_slides)),
    )


def train_ids_for_slides(
    query: jax.Array,
    index: DescriptorIndex,
    slide_ids: jax.Array,
    k_per_slide: int,
) -> jax.Array:
    """Arg-best descriptor slot of each query within each given slide.

    query: [Q, D] +-1 descriptors; slide_ids: [C] int32 global slide ids.
    Returns [C, Q] int32 — exactly the ``train`` columns the full-table
    argmax would produce for these slides (same scores, same first-index tie
    break), at C/S of the cost. Used by the candidate-selection stage to
    avoid computing the argmax over the whole index.
    """
    d_dim = index.desc.shape[1]
    query_f = query.astype(jnp.float32)

    def one(s):
        row0 = s * k_per_slide
        d = jax.lax.dynamic_slice(index.desc, (row0, 0), (k_per_slide, d_dim))
        v = jax.lax.dynamic_slice(index.valid, (row0,), (k_per_slide,))
        scores = jax.lax.dot_general(
            query_f, d.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores + jnp.where(v, 0.0, -1e6)[None, :]
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    return jax.lax.map(one, slide_ids)


def match_table_float(
    query: jax.Array,
    desc: jax.Array,
    valid: jax.Array,
    n_slides: int,
    k_per_slide: int,
    chunk_slides: int = 8,
    slide_ids: jax.Array | None = None,
) -> MatchTable:
    """Best-match table for float (e.g. SIFT) descriptors.

    query: [Q, D] float32 L2-normalized; desc: [N, D] float32 (N = S*K);
    dist = sqrt(max(2 - 2*dot, 0)) — the L2 distance of unit vectors, so the
    same matmul+max/argmax machinery as the hamming table applies.
    """
    q, d_dim = query.shape
    chunk_slides = max(1, min(chunk_slides, n_slides))
    pad_s = (-n_slides) % chunk_slides
    desc3 = desc.reshape(n_slides, k_per_slide, d_dim)
    valid3 = valid.reshape(n_slides, k_per_slide)
    if pad_s:
        desc3 = jnp.pad(desc3, ((0, pad_s), (0, 0), (0, 0)))
        valid3 = jnp.pad(valid3, ((0, pad_s), (0, 0)))
    n_chunks = desc3.shape[0] // chunk_slides
    desc_c = desc3.reshape(n_chunks, chunk_slides * k_per_slide, d_dim)
    valid_c = valid3.reshape(n_chunks, chunk_slides, k_per_slide)

    def step(_, inputs):
        dchunk, vchunk = inputs
        scores = jax.lax.dot_general(
            query, dchunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(q, chunk_slides, k_per_slide)
        scores = jnp.where(vchunk[None], scores, jnp.float32(_NEG))
        best = jnp.max(scores, -1)
        arg = jnp.argmax(scores, -1)
        # Per-slide second best (for the per-slide Lowe ratio): re-max with
        # the winning slot masked out. A slide with one valid slot gets
        # _NEG -> an effectively infinite dist2 (no second neighbour:
        # Lowe passes, the classic convention).
        k_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        second = jnp.max(
            jnp.where(k_iota == arg[..., None], jnp.float32(_NEG), scores),
            -1,
        )
        return None, (best, arg, second, jnp.any(vchunk, -1))

    _, (best, arg, second, svalid) = jax.lax.scan(
        step, None, (desc_c, valid_c)
    )
    best = jnp.moveaxis(best, 0, 1).reshape(q, -1)[:, :n_slides]
    arg = jnp.moveaxis(arg, 0, 1).reshape(q, -1)[:, :n_slides].astype(jnp.int32)
    second = jnp.moveaxis(second, 0, 1).reshape(q, -1)[:, :n_slides]
    svalid = svalid.reshape(-1)[:n_slides]
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    dist2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
    if slide_ids is None:
        slide_ids = jnp.arange(n_slides, dtype=jnp.int32)
    return MatchTable(
        dist=dist,
        train=arg,
        slide_ids=slide_ids,
        valid=jnp.broadcast_to(svalid[None, :], (q, n_slides)),
        dist2=dist2,
    )


def sub_index_for_slides(
    index: DescriptorIndex, cand: jax.Array, k_per_slide: int
) -> DescriptorIndex:
    """Candidate-slide sub-index via contiguous per-slide dynamic slices
    (each slide's descriptors are one [K, D] block — per-slide DMAs instead
    of a 131k-row gather). cand: [C] int32 global slide ids."""
    d_dim = index.desc.shape[1]

    def slice_slide(c):
        row0 = c * k_per_slide
        out = (
            jax.lax.dynamic_slice(index.desc, (row0, 0), (k_per_slide, d_dim)),
            jax.lax.dynamic_slice(index.valid, (row0,), (k_per_slide,)),
        )
        if index.desc_t is not None:
            out += (
                jax.lax.dynamic_slice(
                    index.desc_t, (c, 0, 0), (1, d_dim, k_per_slide)
                )[0],
            )
        return out

    sliced = jax.lax.map(slice_slide, cand)
    n_cand = cand.shape[0]
    return DescriptorIndex(
        desc=sliced[0].reshape(n_cand * k_per_slide, d_dim),
        slide_ids=jnp.repeat(cand, k_per_slide),
        train_ids=jnp.tile(jnp.arange(k_per_slide, dtype=jnp.int32), n_cand),
        valid=sliced[1].reshape(n_cand * k_per_slide),
        desc_t=sliced[2] if index.desc_t is not None else None,
    )


def screen_slides_batched(
    qdesc: jax.Array,
    index: DescriptorIndex,
    n_slides: int,
    k_per_slide: int,
    cfg: MatchConfig,
    interpret: bool | None = None,
) -> jax.Array:
    """Stage-1 candidate slides for a BATCH of frames in ONE index sweep.

    qdesc: [B, Qs, D] int8 — each frame's strongest cfg.screen_queries
    descriptors. Returns [B, min(cfg.screen_slides, n_slides)] int32.

    Full-K voting (every index slot; a 512-slot trim measurably lost frames
    whose matches sit on higher pyramid levels — see config.py) with the
    per-frame cost amortized: all frames' queries stack into one Pallas
    sweep, so the ~S*K*_SCREEN_D-byte index streams through VMEM once per
    batch instead of once per frame. Slot validity rides two +-127 rows of
    index.screen_desc against two +1 query columns (invalid slots score
    <= -254, below any real prefix dot), so the kernel runs bias-free.
    Vote rule identical to _screen_slides: per (query, slide) best distance,
    keep within best*1.05 + 1, count votes per slide.

    With cfg.screen_prevote a strided-K pre-vote over the whole deck first
    keeps cfg.screen_prevote_slides candidates per frame, and the full-K
    vote runs on those slides only (gathered per frame) — the stage-1 MXU
    work drops ~2.7x at 500 slides (see config.screen_prevote).
    """
    from .pallas_table import match_table_scores_pallas

    if interpret is None:
        # Tests attach screen_desc to CPU-built indices; the kernel only
        # compiles natively on TPU.
        interpret = jax.default_backend() != "tpu"
    b, qs, _ = qdesc.shape
    bits = SCREEN_BITS
    q = qdesc[..., :bits].reshape(b * qs, bits)
    ext = jnp.concatenate(
        [
            jnp.ones((b * qs, 2), jnp.int8),
            jnp.zeros((b * qs, _SCREEN_D - bits - 2), jnp.int8),
        ],
        axis=1,
    )
    qp = jnp.concatenate([q, ext], axis=1)
    c_out = min(cfg.screen_slides, n_slides)

    def votes_of(best):
        # [..., nq, ns] scores -> [..., ns] vote counts (same rule as
        # _screen_slides: keep within best-dist * ratio + 1 per query).
        dist = (bits - best.astype(jnp.float32)) * 0.5
        bestd = jnp.min(dist, axis=-1, keepdims=True)
        keep = dist <= bestd * 1.05 + 1.0
        return jnp.sum(keep, axis=-2).astype(jnp.float32)

    p = cfg.screen_prevote_slides
    if (
        cfg.screen_prevote and n_slides > p
        # strided slots must keep the kernel's lane geometry
        and k_per_slide % (128 * cfg.screen_prevote_k_stride) == 0
    ):
        # Stage 1a: strided-K pre-vote with the strongest prevote queries
        # (qdesc rows are strongest-first: _match_frames_screened_batch
        # orders them by lax.top_k over the detection score).
        stride = cfg.screen_prevote_k_stride
        kp = k_per_slide // stride
        npq = min(cfg.screen_prevote_queries, qs)
        qpre = qp.reshape(b, qs, _SCREEN_D)[:, :npq].reshape(-1, _SCREEN_D)
        desc_pre = jax.lax.slice(
            index.screen_desc, (0, 0, 0),
            (n_slides, _SCREEN_D, k_per_slide), (1, 1, stride),
        )
        best, _ = match_table_scores_pallas(
            qpre, desc_pre, jnp.zeros((n_slides * kp,), jnp.float32),
            n_slides, kp, dtype=jnp.int8, with_arg=False, transposed=True,
            skip_bias=True, interpret=interpret,
        )
        votes = votes_of(best.reshape(b, npq, n_slides))
        _, pre = jax.lax.top_k(votes, p)                       # [B, P]
        pre = pre.astype(jnp.int32)

        # Stage 1b: full-K vote over each frame's P surviving slides.
        def one(args):
            qi, ci = args                                      # [Qs,D], [P]

            def slice_slide(c):
                return jax.lax.dynamic_slice(
                    index.screen_desc, (c, 0, 0),
                    (1, _SCREEN_D, k_per_slide),
                )[0]

            sub = jax.lax.map(slice_slide, ci)                 # [P, D, K]
            bi, _ = match_table_scores_pallas(
                qi, sub, jnp.zeros((p * k_per_slide,), jnp.float32),
                p, k_per_slide, dtype=jnp.int8, with_arg=False,
                transposed=True, skip_bias=True, interpret=interpret,
            )
            v = votes_of(bi.reshape(qs, p))                    # [P]
            _, t = jax.lax.top_k(v, c_out)
            return jnp.take(ci, t)

        return jax.lax.map(one, (qp.reshape(b, qs, _SCREEN_D), pre))

    best, _ = match_table_scores_pallas(
        qp,
        index.screen_desc,
        jnp.zeros((n_slides * k_per_slide,), jnp.float32),
        n_slides,
        k_per_slide,
        dtype=jnp.int8,
        with_arg=False,
        transposed=True,
        skip_bias=True,
        interpret=interpret,
    )
    votes = votes_of(best.reshape(b, qs, n_slides))            # [B, S]
    _, top = jax.lax.top_k(votes, c_out)
    return top.astype(jnp.int32)


def match_table_frame(
    query: jax.Array,
    query_score: jax.Array,
    index: DescriptorIndex,
    n_slides: int,
    k_per_slide: int,
    cfg: MatchConfig,
    with_train: bool = True,
) -> MatchTable:
    """Frame-level match table with optional large-deck screening.

    Decks up to cfg.screen_above_slides get the exact table over every
    slide. Above that, stage-1 sketch voting (the FLANN-LSH analogue)
    selects cfg.screen_slides candidate slides and the exact table is
    computed only for those columns (slide_ids maps columns back).
    """
    if n_slides <= cfg.screen_above_slides:
        return match_table(
            query, index, n_slides, k_per_slide, with_train=with_train
        )

    cand = _screen_slides(query, query_score, index, n_slides, cfg)
    sub = sub_index_for_slides(index, cand, k_per_slide)
    return match_table(
        query, sub, cand.shape[0], k_per_slide, slide_ids=cand,
        with_train=with_train,
    )


def screen_slides_float(
    query: jax.Array,
    query_score: jax.Array,
    desc: jax.Array,
    valid: jax.Array,
    n_slides: int,
    k_per_slide: int,
    cfg: MatchConfig,
    chunk_slides: int = 16,
) -> jax.Array:
    """Stage-1 slide screening for FLOAT (SIFT) descriptors.

    The strongest cfg.screen_queries frame descriptors vote over per-slide
    best cosine distances, same within-5%-of-best rule as the Hamming
    screen (+0.05 absolute margin in unit-vector L2 — the analogue of the
    Hamming rule's +1 bit, and > the bf16 quantization noise). The sweep
    contracts in bf16 (f32 accumulation): voting needs ranking, not exact
    distances — stage 2 re-ranks the survivors with exact f32 descriptors.
    Returns [min(cfg.screen_slides, n_slides)] int32 slide ids.

    This is what keeps the SIFT engine viable at reference deck scale
    (SURVEY §2.6): the exact [Q, S*K] f32 table is ~270 GMAC/frame at 500
    slides; the bf16 voting sweep + exact table over cfg.screen_slides
    survivors is ~25x less work. Recall gate:
    tests/test_sift.py::test_sift_screened_matches_exact.
    """
    _, top_q = jax.lax.top_k(query_score, min(cfg.screen_queries, query.shape[0]))
    q_sub = jnp.take(query, top_q, axis=0).astype(jnp.bfloat16)
    qs = q_sub.shape[0]
    d_dim = desc.shape[-1]
    chunk_slides = max(1, min(chunk_slides, n_slides))
    pad_s = (-n_slides) % chunk_slides
    desc3 = desc.reshape(n_slides, k_per_slide, d_dim)
    valid3 = valid.reshape(n_slides, k_per_slide)
    if pad_s:
        desc3 = jnp.pad(desc3, ((0, pad_s), (0, 0), (0, 0)))
        valid3 = jnp.pad(valid3, ((0, pad_s), (0, 0)))
    n_chunks = desc3.shape[0] // chunk_slides
    desc_c = desc3.astype(jnp.bfloat16).reshape(
        n_chunks, chunk_slides * k_per_slide, d_dim
    )
    valid_c = valid3.reshape(n_chunks, chunk_slides, k_per_slide)

    def step(_, inputs):
        dchunk, vchunk = inputs
        dots = jax.lax.dot_general(
            q_sub, dchunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(qs, chunk_slides, k_per_slide)
        dots = jnp.where(vchunk[None], dots, jnp.float32(-2.0))
        return None, jnp.max(dots, axis=-1)

    _, best_dot = jax.lax.scan(step, None, (desc_c, valid_c))
    best_dot = jnp.moveaxis(best_dot, 0, 1).reshape(qs, -1)[:, :n_slides]
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best_dot, 0.0))
    bestd = jnp.min(dist, axis=1, keepdims=True)
    keep = dist <= bestd * 1.05 + 0.05
    votes = jnp.sum(keep, axis=0).astype(jnp.float32)
    _, top = jax.lax.top_k(votes, min(cfg.screen_slides, n_slides))
    return top.astype(jnp.int32)


def sub_desc_for_slides(
    desc: jax.Array, valid: jax.Array, cand: jax.Array, k_per_slide: int
) -> tuple[jax.Array, jax.Array]:
    """Candidate-slide float descriptor block: contiguous per-slide dynamic
    slices of the flat [S*K, D] arrays (float analogue of
    sub_index_for_slides). Returns ([C*K, D], [C*K])."""
    d_dim = desc.shape[-1]

    def slice_slide(c):
        row0 = c * k_per_slide
        return (
            jax.lax.dynamic_slice(desc, (row0, 0), (k_per_slide, d_dim)),
            jax.lax.dynamic_slice(valid, (row0,), (k_per_slide,)),
        )

    dsub, vsub = jax.lax.map(slice_slide, cand)
    return dsub.reshape(-1, d_dim), vsub.reshape(-1)


def knn(query: jax.Array, index: DescriptorIndex, k: int, chunk: int) -> KnnResult:
    """Exact Hamming kNN of [Q, D] +-1 queries against the index."""
    d_bits = query.shape[1]
    scores, gids = _chunked_topk_scores(query, index.desc, index.valid, k, chunk)
    dist = (d_bits - scores).astype(jnp.float32) * 0.5
    slide = jnp.take(index.slide_ids, gids)
    train = jnp.take(index.train_ids, gids)
    valid = scores > _NEG // 2
    return KnnResult(dist, slide, train, valid)


def _screen_slides(
    query: jax.Array,
    query_score: jax.Array,
    index: DescriptorIndex,
    n_slides: int,
    cfg: MatchConfig,
) -> jax.Array:
    """Stage-1 slide screening: [cfg.screen_slides] candidate slide ids.

    Matches the strongest cfg.screen_queries frame descriptors against the
    whole index and votes per slide with the same within-5%-of-best rule the
    main filter uses. This is the role FLANN's LSH tables play in the
    reference (approximate candidate generation, flann.rs:14-26); the final
    ranking still uses full descriptors over the surviving slides.

    One mode: cfg.screen_bits-bit descriptor prefixes over EVERY index row.
    Full-K coverage is what carries recall — the frame's strong corners
    always have their counterpart in the index; measured recall at 500
    text-like slides is 8/8 with rank-0 votes. (A cheaper "sketch" mode —
    full descriptors over each slide's first 128 slots — was measured to
    lose recall at 500 slides and deleted in r5.)
    """
    _, top_q = jax.lax.top_k(query_score, cfg.screen_queries)
    q_sub = jnp.take(query, top_q, axis=0)
    k_per_slide = index.desc.shape[0] // n_slides
    q_sub = q_sub[:, : cfg.screen_bits]
    ksk = min(cfg.screen_k_per_slide, k_per_slide)
    desc3 = index.desc.reshape(n_slides, k_per_slide, index.desc.shape[1])
    valid2 = index.valid.reshape(n_slides, k_per_slide)
    prefix_index = DescriptorIndex(
        desc=desc3[:, :ksk, : cfg.screen_bits].reshape(
            n_slides * ksk, cfg.screen_bits
        ),
        slide_ids=jnp.repeat(jnp.arange(n_slides, dtype=jnp.int32), ksk),
        train_ids=jnp.tile(jnp.arange(ksk, dtype=jnp.int32), n_slides),
        valid=valid2[:, :ksk].reshape(n_slides * ksk),
        desc_t=(
            index.desc_t[:, : cfg.screen_bits, :ksk]
            if index.desc_t is not None else None
        ),
    )
    table = match_table(
        q_sub, prefix_index, n_slides, ksk, chunk_slides=16,
        with_train=False,
    )
    best = jnp.min(jnp.where(table.valid, table.dist, jnp.inf), axis=1, keepdims=True)
    keep = table.valid & (table.dist <= best * 1.05 + 1.0)
    votes = jnp.sum(keep, axis=0).astype(jnp.float32)
    _, top_slides = jax.lax.top_k(votes, min(cfg.screen_slides, n_slides))
    return top_slides.astype(jnp.int32)


def knn_frame(
    query: jax.Array,
    query_score: jax.Array,
    index: DescriptorIndex,
    n_slides: int,
    k_per_slide: int,
    cfg: MatchConfig,
) -> KnnResult:
    """Frame-level kNN with optional large-deck screening.

    For decks up to cfg.screen_above_slides slides this is exact kNN over the
    full index (strictly better recall than the reference's LSH).  Above
    that, stage-1 screening restricts the exact search to the
    cfg.screen_slides most promising slides.
    """
    if n_slides <= cfg.screen_above_slides:
        return knn(query, index, cfg.knn_k, cfg.knn_chunk)

    cand = _screen_slides(query, query_score, index, n_slides, cfg)
    # Rows of slide s occupy [s*K, (s+1)*K) in the flattened index.
    rows = (cand[:, None] * k_per_slide + jnp.arange(k_per_slide)[None, :]).reshape(-1)
    sub = DescriptorIndex(
        desc=jnp.take(index.desc, rows, axis=0),
        slide_ids=jnp.take(index.slide_ids, rows),
        train_ids=jnp.take(index.train_ids, rows),
        valid=jnp.take(index.valid, rows),
    )
    return knn(query, sub, cfg.knn_k, cfg.knn_chunk)
