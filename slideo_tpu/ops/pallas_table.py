"""Fused Hamming match-table Pallas kernel.

The XLA formulation (ops/hamming.match_table) materializes each [Q, c*K]
score block to HBM and reads it back for the per-slide max/argmax — ~4 GB of
HBM round-trips per 1080p frame against a 500-slide deck, which dominates
the matching stage. This kernel keeps the score block for one slide in VMEM:
grid over (slide groups, query blocks), one [QB, 256] x [256, K] MXU
contraction per slide, reduce to that slide's best score/argmax on-chip, and
write only the [S, Q] result rows (a few MB per frame).

The grid is 2-D — slide groups outer, query blocks inner — so the per-step
VMEM footprint is bounded by the query *block* (QB=256 rows), not the full
query count: the largest transient is one [QB, K] score block (2 MB f32 at
K=2048) next to the double-buffered [_SB, K, D] descriptor block (2x4 MB),
safely inside the 16 MB scoped-VMEM limit even for the Q=2048 bucket.
Descriptor blocks depend only on the outer index, so each slide group is
DMA'd once and revisited by every query block (the whole index streams
through VMEM exactly once per frame).

Descriptors are +-1 vectors, so the dot products are small integers
(|sum| <= 256) and every MXU input dtype — int8, bfloat16, float32 — computes
them EXACTLY (bf16 represents integers to 256; accumulation is
int32/float32). ``dtype`` therefore only selects speed: int8 runs at the
v5e MXU's 4x rate, bf16 at 2x, relative to float32.

This makes EXACT matching affordable for reference-scale decks ("<1000
slides", /root/reference/README.md:41), so the production path needs no
LSH-style screening at all below MatchConfig.screen_above_slides — strictly
better recall than the reference's FLANN-LSH (flann.rs:14-26) with identical
downstream semantics.

Outputs are transposed ([S, Q] rather than [Q, S]) so each grid step writes
lane-aligned rows; the caller transposes back (1.5 MB, negligible).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["match_table_scores_pallas"]

_QB = 256  # query rows per grid step (bounds the [QB, K] score transient)


def _slides_per_step(desc_itemsize: int, k_per_slide: int, d_bits: int) -> int:
    """Slides per grid step: keep the double-buffered descriptor block
    inside ~8 MB of the 16 MB scoped-VMEM budget (the score transient,
    query block, and outputs take the rest)."""
    block_bytes = k_per_slide * d_bits * desc_itemsize
    sb = 8
    while sb > 1 and sb * block_bytes > 4 * 1024 * 1024:
        sb //= 2
    return sb


def _lane_max(scores):
    """max over the lane axis via 128-wide column folding.

    A full-width lane reduction shuffles across all K lanes per query row;
    folding K/128 static column slices elementwise first (free at 128-
    aligned offsets) leaves ONE 128-lane tree (~8% on the screening kernel;
    a fully flattened one-matmul-per-group form and larger slide groups both
    measured SLOWER — tools/bench_screen_kernel.py).
    """
    k = scores.shape[1]
    m = scores[:, :128]
    for c in range(1, k // 128):
        m = jnp.maximum(m, scores[:, c * 128:(c + 1) * 128])
    return jnp.max(m, axis=1)


def _kernel_t(q_ref, desc_ref, bias_ref, best_ref, arg_ref=None, *, dtype, sb,
              skip_bias=False):
    """Transposed-index variant: desc_ref is [sb, D, K] — each slide's
    descriptors stored column-major so the MXU contraction is the natural
    (lhs [QB, D]) x (rhs [D, K]) layout with no in-VMEM transpose.

    In the max-only int8 mode (dtype int8, no arg_ref) everything stays
    integer: int8 MXU inputs, int32 accumulation, int32 bias and max —
    exact, and skips both the int8->bf16 relayout and the f32 score cast.
    """
    q = q_ref[:]
    int_mode = dtype == jnp.int8
    acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    for j in range(sb):
        scores = jax.lax.dot_general(
            q, desc_ref[j].astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )                                             # [_QB, K]
        if int_mode:
            if not skip_bias:
                scores = scores + bias_ref[j, 0, :][None, :]
            best_ref[j, :] = _lane_max(scores)
            if arg_ref is not None:
                # Mosaic argmax wants f32; the cast is exact and monotone
                # (|score + bias| < 2^21), so arg matches the i32 max.
                arg_ref[j, :] = jnp.argmax(
                    scores.astype(jnp.float32), axis=1
                ).astype(jnp.int32)
            continue
        scores = scores.astype(jnp.float32) + bias_ref[j, 0, :][None, :]
        best_ref[j, :] = _lane_max(scores)
        if arg_ref is not None:
            arg_ref[j, :] = jnp.argmax(scores, axis=1).astype(jnp.int32)


def _kernel(q_ref, desc_ref, bias_ref, best_ref, arg_ref=None, *, dtype, sb):
    """One grid step = sb slides x _QB queries.

    q_ref:    [_QB, D] (+-1 descriptors in the compute dtype; pad rows are 0)
    desc_ref: [sb, K, D] block of these slides' descriptors. When stored
              int8 it is cast to the compute dtype per block IN the kernel;
              prefer storing the index pre-cast (bf16) — Mosaic's int8->bf16
              relayout (32,128)->(16,128) costs cross-sublane shuffles that
              dominate the whole kernel
    bias_ref: [sb, 1, K] float32 additive bias (0 valid / -1e6 invalid)
    best_ref: [sb, _QB] float32 best score per query per slide
    arg_ref:  [sb, _QB] int32 argmax descriptor slot (omitted in max-only
              mode — the downstream cascade only needs arg slots for the
              <=40 candidate slides, recomputed cheaply by
              hamming.train_ids_for_slides)
    """
    q = q_ref[:]
    acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    for j in range(sb):
        scores = jax.lax.dot_general(
            q, desc_ref[j].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )                                             # [_QB, K]
        # Mosaic's argmax lowering supports only float32; the cast is exact
        # (|score| <= 256 and the bias is a power-of-10 well inside f32).
        scores = scores.astype(jnp.float32) + bias_ref[j, 0, :][None, :]
        best_ref[j, :] = _lane_max(scores)
        if arg_ref is not None:
            arg_ref[j, :] = jnp.argmax(scores, axis=1).astype(jnp.int32)


def match_table_scores_pallas(
    query: jax.Array,
    desc: jax.Array,
    bias: jax.Array,
    n_slides: int,
    k_per_slide: int,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    with_arg: bool = True,
    transposed: bool = False,
    skip_bias: bool = False,
) -> tuple[jax.Array, jax.Array | None]:
    """Per-(query, slide) best dot-product score and (optionally) arg slot.

    query: [Q, D] int8/float32 +-1 descriptors (invalid rows all-zero)
    desc:  [S*K, D] +-1 index descriptors; int8 (cast in-kernel) or already
           in the compute dtype (preferred — avoids Mosaic's slow int8
           relayout; hamming.build_index stores bf16 for exactly this)
    bias:  [S*K] float32 additive row bias (0 valid / -1e6 invalid)
    dtype: MXU input dtype (int8 | bfloat16 | float32) — exact either way.
    skip_bias: elide the per-element bias add (int8 transposed max-only
    path; callers fold validity into the contraction instead — see
    hamming.build_screen_desc).
    Returns (best [Q, S] float32, arg [Q, S] int32 or None if not with_arg).

    Requires K a multiple of 128 and D of 8 (use hamming.match_table
    otherwise).
    """
    q, d_bits = query.shape
    if transposed:
        assert desc.shape == (n_slides, d_bits, k_per_slide), desc.shape
    else:
        assert desc.shape[0] == n_slides * k_per_slide
    assert d_bits % 8 == 0 and k_per_slide % 128 == 0, (d_bits, k_per_slide)
    q_pad = (-q) % _QB
    if q_pad:
        query = jnp.pad(query, ((0, q_pad), (0, 0)))
    qp = q + q_pad

    int_mode = dtype == jnp.int8 and transposed
    sb = _slides_per_step(desc.dtype.itemsize, k_per_slide, d_bits)
    s_pad = (-n_slides) % sb
    desc3 = (
        desc if transposed else desc.reshape(n_slides, k_per_slide, d_bits)
    )
    bias_dtype = jnp.int32 if int_mode else jnp.float32
    pad_bias = -(1 << 20) if int_mode else -1e6
    bias2 = bias.astype(bias_dtype).reshape(n_slides, 1, k_per_slide)
    if s_pad:
        desc3 = jnp.pad(desc3, ((0, s_pad), (0, 0), (0, 0)))
        bias2 = jnp.pad(
            bias2, ((0, s_pad), (0, 0), (0, 0)), constant_values=pad_bias
        )
    sp = n_slides + s_pad

    desc_block = (
        (sb, d_bits, k_per_slide) if transposed
        else (sb, k_per_slide, d_bits)
    )
    out_spec = pl.BlockSpec((sb, _QB), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    best_dtype = jnp.int32 if int_mode else jnp.float32
    out = pl.pallas_call(
        partial(_kernel_t, dtype=dtype, sb=sb, skip_bias=skip_bias)
        if transposed else partial(_kernel, dtype=dtype, sb=sb),
        grid=(sp // sb, qp // _QB),
        in_specs=[
            pl.BlockSpec((_QB, d_bits), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                desc_block, lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (sb, 1, k_per_slide), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec, out_spec) if with_arg else (out_spec,),
        out_shape=(
            jax.ShapeDtypeStruct((sp, qp), best_dtype),
            jax.ShapeDtypeStruct((sp, qp), jnp.int32),
        ) if with_arg else (
            jax.ShapeDtypeStruct((sp, qp), best_dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * d_bits * sp * k_per_slide,
            bytes_accessed=sp * k_per_slide * d_bits + 2 * sp * qp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query.astype(dtype), desc3, bias2)
    best_t = out[0].astype(jnp.float32) if int_mode else out[0]
    if with_arg:
        return best_t.T[:q, :n_slides], out[1].T[:q, :n_slides]
    return best_t.T[:q, :n_slides], None
