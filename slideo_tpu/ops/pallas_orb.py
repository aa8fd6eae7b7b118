"""Fused ORB descriptor Pallas kernel: patch DMA + orientation + blur + rBRIEF.

TPU-native replacement for the describe stage's XLA formulation
(ops/orb.py: vmapped ``dynamic_slice`` patch gathers, whole-patch blur
matmuls, per-chunk tent-weight sampling), which moves hundreds of MB of
per-keypoint transients through HBM. Reference behavior being implemented:
OpenCV ORB's orientation + steered BRIEF
(crates/matching-opencv/src/feature_extractor.rs:29-47).

Design
------
Grid over keypoint blocks (KB per step, double-buffered):

1. Each keypoint DMAs one [80, 256] float32 window of the pyramid atlas
   around its patch. DMA offsets must be provably aligned (sublane 8, lane
   128), so the host passes block indices (y0//8-style) and the kernel
   multiplies back; the residual offsets are removed with dynamic rolls
   (positive modular shifts only — dynamic negative shifts miscompile).
   After the rolls the 63x63 patch always occupies rows 4..66, cols 0..62.
2. Orientation = intensity-centroid moments over the patch disc — two
   masked reductions against static moment masks (centered at (35, 31)).
3. The angle is quantized to 32 bins (11.25 deg — the original ORB paper
   quantizes to 12 deg). Per bin, host-precomputed tables fold the
   Gaussian blur INTO the rotated tent sampling weights:
       vals = rowsum((A_bin @ W) * D_bin),
   A_bin = RotTentRows @ BlurRows [512, 72], D_bin = RotTentCols @
   BlurCols [512, 128] — one small MXU contraction per keypoint, no
   blurred image, no per-keypoint weight transients in HBM.
4. Bits compare the two sample sets: +1 where point B is brighter.

The blur tables use a plain (non-reflecting) Gaussian band: inside the
window, border handling differences never reach the sampled area (sample
points stay >= 9 px from the patch border; blur radius 3).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orb import DESC_RADIUS, HALF_PATCH, PATCH, brief_pattern

__all__ = ["orb_descriptors_pallas", "ANGLE_BINS"]

ANGLE_BINS = 32
WIN_H = 80    # window rows: patch 63 + blur margin + sublane-alignment slack
WIN_W = 256   # window lanes: patch 63 + lane-alignment residual (<=127)
KB = 16       # keypoints per grid step (fewer grid steps beat
              # smaller VMEM footprints; windows are bf16)
_ROW0 = 4     # patch top row after the row roll
_CENTER_Y = _ROW0 + HALF_PATCH  # 35
_CENTER_X = HALF_PATCH          # 31


def _gauss(ksize: int, sigma: float) -> np.ndarray:
    from .image import _gauss_kernel_1d

    return _gauss_kernel_1d(ksize, sigma)


def _band(n: int, ksize: int, sigma: float) -> np.ndarray:
    """[n, n] plain banded Gaussian (no edge reflection)."""
    g = _gauss(ksize, sigma)
    half = ksize // 2
    b = np.zeros((n, n), np.float32)
    for i in range(n):
        for t in range(-half, half + 1):
            j = i + t
            if 0 <= j < n:
                b[i, j] += g[t + half]
    return b


def _tent(pos: np.ndarray, n: int) -> np.ndarray:
    """[len(pos), n] bilinear tent rows."""
    grid = np.arange(n, dtype=np.float64)
    return np.maximum(0.0, 1.0 - np.abs(pos[:, None] - grid[None, :]))


@lru_cache(maxsize=4)
def _bin_tables(
    n_bits: int, seed: int, blur_ksize: int, blur_sigma: float
) -> tuple[np.ndarray, np.ndarray]:
    """Blur-folded rotated sampling tables per angle bin.

    Returns (A [BINS, 2*n_bits, WIN_H-8], D [BINS, 2*n_bits, 128]) float32.
    Sample order: first n_bits rows = pattern point A, last = point B.
    """
    pat = brief_pattern(n_bits, seed).astype(np.float64)  # [n, 2, 2] (x, y)
    px = np.concatenate([pat[:, 0, 0], pat[:, 1, 0]])
    py = np.concatenate([pat[:, 0, 1], pat[:, 1, 1]])
    rows = WIN_H - 8
    b_rows = _band(rows, blur_ksize, blur_sigma)
    b_cols = _band(128, blur_ksize, blur_sigma)
    a = np.zeros((ANGLE_BINS, 2 * n_bits, rows), np.float32)
    d = np.zeros((ANGLE_BINS, 2 * n_bits, 128), np.float32)
    for bi in range(ANGLE_BINS):
        th = (bi + 0.5) * 2.0 * np.pi / ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        sx = c * px - s * py + _CENTER_X
        sy = s * px + c * py + _CENTER_Y
        a[bi] = _tent(sy, rows) @ b_rows
        d[bi] = _tent(sx, 128) @ b_cols
    return a, d


@lru_cache(maxsize=2)
def _moment_masks() -> tuple[np.ndarray, np.ndarray]:
    """Static [WIN_H-8, 128] x/y moment masks over the orientation disc."""
    ys = np.arange(WIN_H - 8, dtype=np.float32)[:, None] - _CENTER_Y
    xs = np.arange(128, dtype=np.float32)[None, :] - _CENTER_X
    disc = (ys * ys + xs * xs <= HALF_PATCH * HALF_PATCH).astype(np.float32)
    return (disc * xs).astype(np.float32), (disc * ys).astype(np.float32)


def _sector32(x, y):
    """Angle bin of atan2(y, x) in 32 sectors, by binary subdivision
    (no atan2 — transcendental-free, exact on sector interiors)."""
    neg_y = y < 0
    b = jnp.where(neg_y, 16, 0)
    x, y = jnp.where(neg_y, -x, x), jnp.where(neg_y, -y, y)
    neg_x = x < 0
    b += jnp.where(neg_x, 8, 0)
    x, y = jnp.where(neg_x, y, x), jnp.where(neg_x, -x, y)
    c = y > x
    b += jnp.where(c, 4, 0)
    isq2 = np.float32(1.0 / np.sqrt(2.0))
    x, y = (
        jnp.where(c, (x + y) * isq2, x),
        jnp.where(c, (y - x) * isq2, y),
    )
    c8, s8 = np.float32(np.cos(np.pi / 8)), np.float32(np.sin(np.pi / 8))
    c = y > x * np.float32(np.tan(np.pi / 8))
    b += jnp.where(c, 2, 0)
    x, y = (
        jnp.where(c, x * c8 + y * s8, x),
        jnp.where(c, y * c8 - x * s8, y),
    )
    c = y > x * np.float32(np.tan(np.pi / 16))
    b += jnp.where(c, 1, 0)
    return b.astype(jnp.int32)


def _start_windows(atlas_hbm, wins, sems, yb, xb, slot, blk):
    for k in range(KB):
        idx = blk * KB + k
        pltpu.make_async_copy(
            atlas_hbm.at[pl.ds(yb[idx] * 8, WIN_H), pl.ds(xb[idx] * 128, WIN_W)],
            wins.at[slot, k],
            sems.at[slot, k],
        ).start()


def _wait_window(atlas_hbm, wins, sems, yb, xb, slot, idx, k):
    pltpu.make_async_copy(
        atlas_hbm.at[pl.ds(yb[idx] * 8, WIN_H), pl.ds(xb[idx] * 128, WIN_W)],
        wins.at[slot, k],
        sems.at[slot, k],
    ).wait()


def _kernel_bins(yb, xb, rr, cc, atlas_hbm, mx, my, out_ref, win_out,
                 wins, sems):
    """Pass 1: per-keypoint orientation bin (DMA + rolls + moments), PLUS
    the rolled, patch-aligned [72, 128] bf16 window written to HBM so pass 2
    never repeats the alignment work.

    Window alignment uses VPU dynamic rotates. An MXU permutation-matmul
    form (one-hot shift matrices contracted on the MXU) was measured
    SLOWER on v5e — 406 vs 391 ms/batch-64 end-to-end, and +17 ms even on
    top of the shipped fused-polarity config (r4 chip A/B) — the two
    [80, 80] x [80, 256] matmuls per keypoint cost more issue slots than
    the two log-stage rotates they replace. Deleted, not gated.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        _start_windows(atlas_hbm, wins, sems, yb, xb, 0, 0)

    @pl.when(i + 1 < n)
    def _():
        _start_windows(atlas_hbm, wins, sems, yb, xb, (i + 1) % 2, i + 1)

    cols = []
    for k in range(KB):
        idx = i * KB + k
        _wait_window(atlas_hbm, wins, sems, yb, xb, i % 2, idx, k)
        # Mosaic's dynamic rotate is 32-bit-only: cast up for the rolls.
        w = wins[i % 2, k].astype(jnp.float32)
        w = pltpu.roll(w, rr[idx], 0)
        w = pltpu.roll(w, cc[idx], 1)
        w1 = w[: WIN_H - 8, :128]
        win_out[k] = w1.astype(jnp.bfloat16)
        m10 = jnp.sum(w1 * mx[:])
        m01 = jnp.sum(w1 * my[:])
        cols.append(_sector32(m10, m01).astype(jnp.float32))
    row = jnp.stack(cols).reshape(1, KB)
    out_ref[:] = jnp.pad(row, ((0, 7), (0, 128 - KB)))[None]


def _kernel_desc(bins_blk, src, aligned_hbm, a_tab, d_tab,
                 out_ref, wins, sems):
    """Pass 2: descriptors for KB keypoints SHARING one angle bin.

    One [512, 72] x [72, KB*128] MXU contraction per block (the windows are
    concatenated along lanes) instead of KB tiny serialized dots — the
    per-keypoint form ran at <1% MXU utilization and was the entire cost of
    the describe stage (tools/bench_orb_kernel.py ablation).

    Windows arrive pre-rolled and bf16 from pass 1 (aligned_hbm [K, 72, 128]
    indexed by the bin-sorted ``src`` row): the per-keypoint DMA here is a
    plain aligned copy with no rolls or casts.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def start(slot, blk):
        for k in range(KB):
            idx = blk * KB + k
            pltpu.make_async_copy(
                aligned_hbm.at[src[idx]], wins.at[slot, k], sems.at[slot, k]
            ).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start((i + 1) % 2, i + 1)

    w1s = []
    for k in range(KB):
        idx = i * KB + k
        pltpu.make_async_copy(
            aligned_hbm.at[src[idx]], wins.at[i % 2, k], sems.at[i % 2, k]
        ).wait()
        w1s.append(wins[i % 2, k])
    wcat = jnp.concatenate(w1s, axis=1)            # [72, KB*128]
    b = bins_blk[i]
    a = a_tab[b]                                   # [512, 72] bf16
    d = d_tab[b].astype(jnp.float32)               # [512, 128]
    g = jax.lax.dot_general(
        a, wcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [512, KB*128]
    vals_cols = [
        jnp.sum(g[:, k * 128:(k + 1) * 128] * d, axis=1, keepdims=True)
        for k in range(KB)
    ]
    vals = jnp.concatenate(vals_cols, axis=1)      # [512, KB]
    vt = vals.T                                    # [KB, 512]
    n_bits = vt.shape[1] // 2
    out_ref[:] = jnp.where(vt[:, n_bits:] > vt[:, :n_bits], 1.0, -1.0)


def _kernel_desc_t(bins_blk, src, aligned_hbm, a_tab_t, d_tab_t,
                   out_ref, wins, sems, *, loop: bool):
    """Pass 2, transposed epilogue: windows stack on SUBLANES and the
    second contraction runs over the window columns on the MXU.

        u = wstack [KB*72, 128] @ d_b^T [128, 512]   (f32 acc)
        vals[k, s] = sum_r a_b^T[r, s] * u[k*72+r, s]

    vs the lane-concat form (_kernel_desc): the MXU contraction dim is the
    full 128 window lanes (the lane form contracts over 72 rows padded to
    128 — 44% wasted MXU passes), and the per-keypoint epilogue reduces
    over 72 SUBLANES instead of 128 lanes with an f32 d-cast per block.
    ``loop`` selects the per-keypoint-slice reduction vs one reshaped
    [KB, 72, 512] sum (chip A/B arbitrates; tools/bench_orb_kernel.py).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def start(slot, blk):
        for k in range(KB):
            idx = blk * KB + k
            pltpu.make_async_copy(
                aligned_hbm.at[src[idx]], wins.at[slot, k], sems.at[slot, k]
            ).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start((i + 1) % 2, i + 1)

    w1s = []
    for k in range(KB):
        idx = i * KB + k
        pltpu.make_async_copy(
            aligned_hbm.at[src[idx]], wins.at[i % 2, k], sems.at[i % 2, k]
        ).wait()
        w1s.append(wins[i % 2, k])
    rows = w1s[0].shape[0]                         # 72
    wstack = jnp.concatenate(w1s, axis=0)          # [KB*72, 128] bf16
    b = bins_blk[i]
    dt = d_tab_t[b]                                # [128, 512] bf16
    u = jax.lax.dot_general(
        wstack, dt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [KB*72, 512] f32
    at = a_tab_t[b].astype(jnp.float32)            # [72, 512]
    if loop:
        vals = jnp.concatenate(
            [
                jnp.sum(u[k * rows:(k + 1) * rows] * at, axis=0,
                        keepdims=True)
                for k in range(KB)
            ],
            axis=0,
        )                                          # [KB, 512]
    else:
        vals = jnp.sum(u.reshape(KB, rows, 512) * at[None], axis=1)
    n_bits = vals.shape[1] // 2
    out_ref[:] = jnp.where(
        vals[:, n_bits:] > vals[:, :n_bits], 1.0, -1.0
    )


def orb_descriptors_pallas(
    atlas: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    y_lo: jax.Array,
    y_hi: jax.Array,
    x_hi: jax.Array,
    n_bits: int = 256,
    seed: int = 0x51DE0,
    blur_ksize: int = 7,
    blur_sigma: float = 2.0,
    interpret: bool = False,
    x_lo: jax.Array | None = None,
    pass2: str = "lanes",
) -> jax.Array:
    """Fused descriptors of keypoints at integer (ys, xs) on a [Ha, W] atlas.

    Same patch clamping contract as orb.extract_patches (per-keypoint level
    bounds; padded slots clamp harmlessly). Returns [K, n_bits] int8 in
    {-1, +1}. Orientation is quantized to ANGLE_BINS sectors (vs the XLA
    path's continuous angle) — descriptor consistency between slides and
    frames is preserved because both sides use the same path per backend.
    """
    ha, w_atlas = atlas.shape
    k = ys.shape[0]
    if x_lo is None:
        x_lo = jnp.zeros_like(xs)
    kp_pad = (-k) % KB
    if kp_pad:
        z = lambda arr: jnp.pad(arr, ((0, kp_pad),))
        ys, xs, x_lo = z(ys), z(xs), z(x_lo)
        y_lo, y_hi, x_hi = z(y_lo), jnp.pad(y_hi, ((0, kp_pad),), constant_values=PATCH), jnp.pad(x_hi, ((0, kp_pad),), constant_values=PATCH)
    kp = k + kp_pad

    y0 = jnp.clip(ys - HALF_PATCH, y_lo, jnp.maximum(y_hi - PATCH, y_lo))
    x0 = jnp.clip(xs - HALF_PATCH, x_lo, jnp.maximum(x_hi - PATCH, x_lo))
    yb = jnp.maximum(y0 - _ROW0, 0) // 8
    r0 = y0 - yb * 8
    rr = (_ROW0 - r0) % WIN_H          # positive modular row roll
    xb = x0 // 128
    cc = (WIN_W - (x0 - xb * 128)) % WIN_W  # positive modular lane roll

    # Pad the atlas so every window DMA stays in bounds.
    ha_pad = -(-(ha + WIN_H) // 8) * 8
    max_xb = max((w_atlas - PATCH) // 128, 0)
    w_pad = max(max_xb * 128 + WIN_W, w_atlas)
    # bf16 window source: halves the per-keypoint DMA bytes. Pixel values
    # are 0..255 with ~0.5 rounding — the same scale the TPU XLA path's
    # bf16 matmuls already round at. Orientation moments accumulate the
    # bf16 pixels against float32 masks (f32 accumulation).
    atlas_p = jnp.pad(
        atlas.astype(jnp.bfloat16),
        ((0, ha_pad - ha), (0, w_pad - w_atlas)),
    )

    a_np, d_np = _bin_tables(n_bits, seed, blur_ksize, float(blur_sigma))
    if pass2 == "lanes":
        a_tab = jnp.asarray(a_np, jnp.bfloat16)
        d_tab = jnp.asarray(d_np, jnp.bfloat16)
    else:  # "sublanes" / "sublanes_loop": transposed tables for _kernel_desc_t
        a_tab = jnp.asarray(a_np.transpose(0, 2, 1), jnp.bfloat16)
        d_tab = jnp.asarray(d_np.transpose(0, 2, 1), jnp.bfloat16)
    mx, my = _moment_masks()
    yb, xb = yb.astype(jnp.int32), xb.astype(jnp.int32)
    rr, cc = rr.astype(jnp.int32), cc.astype(jnp.int32)

    # ---- pass 1: orientation bins + rolled bf16 windows ----
    nblk = kp // KB
    bins_f, aligned = pl.pallas_call(
        _kernel_bins,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, WIN_H - 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, KB, WIN_H, WIN_W), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((kp, WIN_H - 8, 128), jnp.bfloat16),
        ],
        interpret=interpret,
    )(yb, xb, rr, cc, atlas_p, jnp.asarray(mx), jnp.asarray(my))
    bins = bins_f[:, 0, :KB].reshape(kp).astype(jnp.int32)

    # ---- group keypoints by bin (each pass-2 block shares one table) ----
    order = jnp.argsort(bins, stable=True)
    bins_sorted = jnp.take(bins, order)
    counts = jnp.zeros((ANGLE_BINS,), jnp.int32).at[bins].add(1)
    padded = -(-counts // KB) * KB
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    bin_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(kp, dtype=jnp.int32) - jnp.take(bin_starts, bins_sorted)
    pos_sorted = jnp.take(offs, bins_sorted) + rank
    kpp = kp + ANGLE_BINS * KB  # static capacity for per-bin padding

    def scat(arr):
        out = jnp.zeros((kpp,), arr.dtype)
        return out.at[pos_sorted].set(jnp.take(arr, order))

    # Per-slot source row in pass 1's aligned-window buffer (padding slots
    # read row 0 — their outputs are never gathered back).
    src = scat(jnp.arange(kp, dtype=jnp.int32))
    ends = jnp.cumsum(padded)
    blk_starts = jnp.arange(kpp // KB, dtype=jnp.int32) * KB
    block_bins = jnp.minimum(
        jnp.searchsorted(ends, blk_starts, side="right").astype(jnp.int32),
        ANGLE_BINS - 1,
    )

    # ---- pass 2: one wide contraction per same-bin block ----
    if pass2 == "lanes":
        kernel2 = _kernel_desc
    else:
        kernel2 = partial(_kernel_desc_t, loop=pass2 == "sublanes_loop")
    bits_p = pl.pallas_call(
        kernel2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(kpp // KB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((KB, n_bits), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, KB, WIN_H - 8, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kpp, n_bits), jnp.float32),
        interpret=interpret,
    )(block_bins, src, aligned, a_tab, d_tab)

    inv = jnp.zeros((kp,), jnp.int32).at[order].set(pos_sorted)
    bits = jnp.take(bits_p, inv, axis=0)
    return bits[:k].astype(jnp.int8)
