"""Fused Hamming match-table Pallas kernel.

The XLA formulation (ops/hamming.match_table) materializes each [Q, c*K]
score block to HBM and reads it back for the per-slide max/argmax — ~4 GB of
HBM round-trips per 1080p frame against a 500-slide deck, which dominates
the matching stage. This kernel keeps the score block for one slide in VMEM:
grid over slide groups, one [Q, 256] x [256, K] MXU contraction per slide,
reduce to that slide's best score/argmax on-chip, and write only the [S, Q]
result rows (a few MB per frame).

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

_SB = 8  # slides per grid step (output sublane alignment)


def _kernel(q_ref, desc_ref, bias_ref, best_ref, arg_ref, *, k_chunk: int):
    """One grid step = _SB slides.

    q_ref:    [Q, D] float32 (+-1 descriptors, padded rows are 0)
    desc_ref: [_SB, K, D] int8 block of these slides' descriptors
    bias_ref: [_SB, 1, K] float32 (0 for valid rows, -1e6 for invalid)
    best_ref: [_SB, Q] float32 best score per query per slide
    arg_ref:  [_SB, Q] int32 argmax descriptor slot
    """
    q = q_ref[:]
    k_total = desc_ref.shape[1]
    n_chunks = k_total // k_chunk

    for j in range(_SB):
        best = None
        arg = None
        for c in range(n_chunks):
            d = desc_ref[j, c * k_chunk : (c + 1) * k_chunk, :].astype(jnp.float32)
            scores = jax.lax.dot_general(
                q, d, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Q, k_chunk]
            scores = scores + bias_ref[j, 0, c * k_chunk : (c + 1) * k_chunk][None, :]
            c_best = jnp.max(scores, axis=1)
            c_arg = jnp.argmax(scores, axis=1).astype(jnp.int32) + c * k_chunk
            if best is None:
                best, arg = c_best, c_arg
            else:
                take = c_best > best
                best = jnp.maximum(best, c_best)
                arg = jnp.where(take, c_arg, arg)
        best_ref[j, :] = best
        arg_ref[j, :] = arg


def match_table_scores_pallas(
    query: jax.Array,
    desc: jax.Array,
    bias: jax.Array,
    n_slides: int,
    k_per_slide: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-(query, slide) best dot-product score and arg slot.

    query: [Q, D] int8/float32 +-1 descriptors (invalid rows all-zero)
    desc:  [S*K, D] int8 +-1 index descriptors
    bias:  [S*K] float32 additive row bias (0 valid / -1e6 invalid)
    Returns (best [Q, S] float32, arg [Q, S] int32).

    Requires D and K multiples of 128 (use hamming.match_table otherwise).
    """
    q, d_bits = query.shape
    assert desc.shape[0] == n_slides * k_per_slide
    assert d_bits % 128 == 0 and k_per_slide % 128 == 0, (d_bits, k_per_slide)
    q_pad = (-q) % 8
    if q_pad:
        query = jnp.pad(query, ((0, q_pad), (0, 0)))
    qp = q + q_pad

    # Keep the [Q, k_chunk] score block well inside VMEM next to the
    # double-buffered [_SB, K, D] descriptor blocks.
    k_chunk = k_per_slide
    while qp * k_chunk * 4 > 4 * 1024 * 1024 and k_chunk % 256 == 0:
        k_chunk //= 2

    s_pad = (-n_slides) % _SB
    desc3 = desc.reshape(n_slides, k_per_slide, d_bits)
    bias2 = bias.reshape(n_slides, 1, k_per_slide)
    if s_pad:
        desc3 = jnp.pad(desc3, ((0, s_pad), (0, 0), (0, 0)))
        bias2 = jnp.pad(
            bias2, ((0, s_pad), (0, 0), (0, 0)), constant_values=-1e6
        )
    sp = n_slides + s_pad

    best_t, arg_t = pl.pallas_call(
        partial(_kernel, k_chunk=k_chunk),
        grid=(sp // _SB,),
        in_specs=[
            pl.BlockSpec((qp, d_bits), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_SB, k_per_slide, d_bits), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_SB, 1, k_per_slide), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((_SB, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((sp, qp), jnp.float32),
            jax.ShapeDtypeStruct((sp, qp), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * d_bits * sp * k_per_slide,
            bytes_accessed=sp * k_per_slide * d_bits + 2 * sp * qp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query.astype(jnp.float32), desc3, bias2)
    return best_t.T[:q, :n_slides], arg_t.T[:q, :n_slides]
