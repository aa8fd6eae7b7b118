"""Full ORB-style feature extraction over an image pyramid.

TPU-native equivalent of the reference's FeatureExtractor
(crates/matching-opencv/src/feature_extractor.rs:12-47: nfeatures=2000,
scale_factor=1.2, nlevels=8, edge_threshold=62, fast_threshold=20,
score_type=FAST_SCORE, patch_size=62).

Structure (round 2): the pipeline is split into three fixed-shape stages so
the expensive description stage can run on a *compacted* keypoint set:

1. ``build_pyramid``  — successive 5:6 block-periodic downscales packed into
   one [sum(h_l), W0] **atlas** image (one 2-D array holds every level, each
   at a static row offset), so later patch extraction is a single 2-D
   dynamic slice per keypoint regardless of its level.
2. ``detect_pyramid`` — FAST-score detection per level with geometric
   quotas; results concatenate into one Keypoints struct with level ids.
3. ``describe``       — compacts the top-``q`` keypoints by score (q is a
   static bucket size >= the valid count, so compaction is exact) and runs
   patch gather + orientation + blur + steered BRIEF only on those q slots.

Real lecture frames carry ~200-700 keypoints (reference BACKGROUND.md:11)
while slides saturate the 2000 quota; bucketing q removes the 3-10x padding
waste from every per-keypoint stage and from the [Q, S] match table.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OrbConfig
from . import fast, image, orb

__all__ = [
    "Features",
    "Keypoints",
    "PyramidMeta",
    "pyramid_meta",
    "level_sizes",
    "build_pyramid",
    "detect_pyramid",
    "detect_from_scores",
    "describe",
    "extract_features",
    "extract_features_batch",
]


class Features(NamedTuple):
    """Fixed-size feature set of one image.

    pts:   [K, 2] float32 (x, y) in level-0 (full image) coordinates
    desc:  [K, 256] int8 in {-1, +1}
    score: [K] float32 FAST score
    valid: [K] bool
    """

    pts: jax.Array
    desc: jax.Array
    score: jax.Array
    valid: jax.Array


class Keypoints(NamedTuple):
    """Detected (but not yet described) keypoints, concatenated over levels.

    score: [K] float32; y, x: [K] int32 level-local integer coords;
    level: [K] int32; valid: [K] bool.
    """

    score: jax.Array
    y: jax.Array
    x: jax.Array
    level: jax.Array
    valid: jax.Array


class PyramidMeta(NamedTuple):
    """Static (trace-time) pyramid geometry for one image size.

    sizes:    per-level (h, w)
    offsets:  per-level row offset of the level inside the atlas
    xoffsets: per-level column offset (levels are shelf-packed side by side
              where they fit — a level-0-width column per level wastes ~30%
              of the FAST/score sweep on zero padding)
    atlas_hw: (packed height, level-0 width)

    Packing safety: all per-level consumers mask a >=62 px border
    (edge_threshold) before using scores, and FAST/NMS influence reaches
    only 4 px, so adjacent levels never contaminate each other's usable
    pixels even with zero gap; descriptor windows sample >=6 px inside the
    patch, so their blur taps stay within the level too.
    """

    sizes: tuple[tuple[int, int], ...]
    offsets: tuple[int, ...]
    xoffsets: tuple[int, ...]
    atlas_hw: tuple[int, int]


def _next_65(n: int) -> int:
    """Output size of one 5:6 block-periodic downscale (pads n to mult of 6)."""
    return 5 * ((n + 5) // 6)


def level_sizes(h: int, w: int, cfg: OrbConfig) -> list[tuple[int, int]]:
    """Static pyramid level sizes under successive exact-1.2x downscales."""
    out = [(h, w)]
    for _ in range(1, cfg.n_levels):
        h, w = _next_65(h), _next_65(w)
        out.append((h, w))
    return out


def pyramid_meta(h: int, w: int, cfg: OrbConfig) -> PyramidMeta:
    """Shelf-pack the pyramid levels into a [Ha, w] atlas (greedy first-fit:
    each level joins the first shelf with enough remaining width and height,
    else opens a new shelf of its own height)."""
    sizes = tuple(level_sizes(h, w, cfg))
    offsets = [0]
    xoffsets = [0]
    shelves: list[list[int]] = []  # [row_start, height, x_cursor]
    row = sizes[0][0]
    for lh, lw in sizes[1:]:
        placed = False
        for shelf in shelves:
            if lh <= shelf[1] and shelf[2] + lw <= w:
                offsets.append(shelf[0])
                xoffsets.append(shelf[2])
                shelf[2] += lw
                placed = True
                break
        if not placed:
            shelves.append([row, lh, lw])
            offsets.append(row)
            xoffsets.append(0)
            row += lh
    return PyramidMeta(
        sizes=sizes, offsets=tuple(offsets), xoffsets=tuple(xoffsets),
        atlas_hw=(row, w),
    )


def _pattern_65() -> np.ndarray:
    """[5, 6] bilinear weights of the exact 6->5 downscale.

    Row r samples src = (r + 0.5) * 1.2 - 0.5 = 1.2*r + 0.1 — always two taps
    inside the same 6-block, so downscale-by-1.2 is a block-periodic
    contraction: ~5 flops/pixel instead of a dense [out, in] matmul
    (which is what `image.resize` lowers to — ~900x more flops at 1080p).
    """
    p = np.zeros((5, 6), np.float32)
    for r in range(5):
        src = 1.2 * r + 0.1
        i0 = int(np.floor(src))
        frac = src - i0
        p[r, i0] = 1.0 - frac
        p[r, i0 + 1] = frac
    return p


def _resize_65_weights(n_out: int, n_in: int) -> jax.Array:
    """[n_out, n_in] dense tent matrix of the exact 6->5 block resize.

    Output index i reads src position p = 6*(i//5) + 1.2*(i%5) + 0.1 with two
    bilinear taps; taps landing in the edge padding fold onto column n_in-1,
    which is exactly a tent centered at min(p, n_in-1). Rows are 2-sparse, so
    a dense matmul computes the identical sums (adding exact zeros) — but on
    the MXU, which is ~10x faster end-to-end than the block-periodic einsum
    form (tiny 6-wide contractions with hostile layouts). Built from iota on
    device: no multi-MB weight literals in the program.
    """
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    block = jnp.floor(i / 5.0)
    frac = 1.2 * (i - 5.0 * block) + 0.1  # in [0.1, 4.9]: full f32 precision
    # d = p - j with p = 6*block + frac, ordered so the integer parts (exact
    # in f32) cancel first — adding frac to a ~1000-scale p first would lose
    # the tent weights' low bits.
    base = jnp.minimum(6.0 * block, float(n_in - 1))
    frac = jnp.where(6.0 * block > n_in - 1, 0.0, frac)  # edge clamp
    frac = jnp.minimum(frac, float(n_in - 1) - base)
    d = (base - j) + frac
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def resize_65(img: jax.Array, bf16: bool = False) -> jax.Array:
    """Downscale [H, W] by exactly 1.2x per axis (edge-padded to mult of 6).

    Coordinate convention per step: src = 1.2 * dst + 0.1 (OpenCV's
    half-pixel INTER_LINEAR mapping), so after l steps
    level->level0 is the affine map  x0 = 1.2**l * x + (1.2**l - 1) / 2.
    Rows resize first, then columns (two dense MXU matmuls; see
    _resize_65_weights for why dense beats the sparse block form).
    bf16=True casts matmul inputs to bfloat16 (f32 accumulation) — the
    MXU's native rate, ~0.3% pixel rounding per level.
    """
    h, w = img.shape
    oh, ow = _next_65(h), _next_65(w)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    r = _resize_65_weights(oh, h).astype(dt)
    c = _resize_65_weights(ow, w).astype(dt)
    x = jax.lax.dot_general(
        r, img.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(
        x.astype(dt), c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def build_pyramid(img: jax.Array, cfg: OrbConfig) -> jax.Array:
    """Pack all pyramid levels of a [H, W] image into one [Ha, W] atlas.

    Level l occupies rows [offsets[l], offsets[l] + h_l), columns [0, w_l);
    the rest is zero. Successive level-to-level 1.2x resizes (like OpenCV
    ORB's pyramid).
    """
    h, w = img.shape
    meta = pyramid_meta(h, w, cfg)
    dtype = jnp.bfloat16 if cfg.atlas_bf16 else jnp.float32
    atlas = jnp.zeros(meta.atlas_hw, dtype)
    prev = img.astype(jnp.float32)
    for lvl, ((lh, lw), off, xoff) in enumerate(
        zip(meta.sizes, meta.offsets, meta.xoffsets)
    ):
        if lvl > 0:
            # The level chain stays float32 between steps; atlas_bf16 only
            # quantizes the stored copy. (bf16 matmul INPUTS for the resize
            # chain measured a wash on v5e — 390.4 vs 390.7 ms/batch-64, r4
            # chip A/B — so the resize stays f32-in/f32-acc.)
            prev = resize_65(prev)
        atlas = jax.lax.dynamic_update_slice(atlas, prev.astype(dtype), (off, xoff))
    return atlas


def _level_scales(cfg: OrbConfig) -> np.ndarray:
    return np.asarray(
        [cfg.scale_factor**lvl for lvl in range(cfg.n_levels)], np.float32
    )


def detect_pyramid(atlas: jax.Array, meta: PyramidMeta, cfg: OrbConfig) -> Keypoints:
    """FAST keypoints per level (geometric quotas), concatenated.

    Coordinates are level-local; ``describe`` resolves them against the
    atlas. Quota slots a level cannot fill carry valid=False.

    The FAST+NMS score map runs ONCE over the whole atlas (one Pallas
    sweep instead of 8 per-level calls); the >=62 px per-level border mask
    makes level-boundary contamination unreachable, so per-level results are
    identical (see fast.score_map). Only the top-k runs per level (quotas).
    """
    score_atlas = fast.score_map(
        atlas, cfg.fast_threshold, cfg.fast_chunk_w, cfg.fast_polarity_fused,
        cfg.fast_sparse_skip, cfg.fast_min_first,
    )
    return detect_from_scores(score_atlas, meta, cfg)


def detect_from_scores(
    score_atlas: jax.Array, meta: PyramidMeta, cfg: OrbConfig
) -> Keypoints:
    """Per-level quota top-k over a precomputed NMS'd FAST score atlas
    (split from detect_pyramid so a batched score sweep can feed it)."""
    quotas = cfg.per_level_quota
    border = cfg.edge_threshold
    parts: list[Keypoints] = []
    for lvl, ((lh, lw), off, xoff, quota) in enumerate(
        zip(meta.sizes, meta.offsets, meta.xoffsets, quotas)
    ):
        if quota <= 0:
            continue
        usable = lh > 2 * border and lw > 2 * border
        if not usable:
            parts.append(
                Keypoints(
                    score=jnp.zeros((quota,), jnp.float32),
                    y=jnp.zeros((quota,), jnp.int32),
                    x=jnp.zeros((quota,), jnp.int32),
                    level=jnp.full((quota,), lvl, jnp.int32),
                    valid=jnp.zeros((quota,), bool),
                )
            )
            continue
        score = jax.lax.slice(score_atlas, (off, xoff), (off + lh, xoff + lw))
        ys_g = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 0)
        xs_g = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 1)
        inb = (
            (ys_g >= border) & (ys_g < lh - border)
            & (xs_g >= border) & (xs_g < lw - border)
        )
        score = jnp.where(inb, score, 0.0)
        flat = score.reshape(-1)
        # approx_max_k: TPU-native partial reduction instead of a full sort;
        # corners missed at 5% recall are interchangeable with the ones kept
        # (quota allocation is heuristic to begin with).
        top, idx = jax.lax.approx_max_k(flat, quota, recall_target=0.95)
        parts.append(
            Keypoints(
                score=top,
                y=(idx // lw).astype(jnp.int32),
                x=(idx % lw).astype(jnp.int32),
                level=jnp.full((quota,), lvl, jnp.int32),
                valid=top > 0.0,
            )
        )
    kps = Keypoints(*(jnp.concatenate(f) for f in zip(*parts)))
    total = kps.score.shape[0]
    pad = cfg.max_keypoints - total
    if pad < 0:
        raise ValueError(f"quota sum {total} exceeds max_keypoints {cfg.max_keypoints}")
    if pad:
        kps = Keypoints(
            score=jnp.pad(kps.score, (0, pad)),
            y=jnp.pad(kps.y, (0, pad)),
            x=jnp.pad(kps.x, (0, pad)),
            level=jnp.pad(kps.level, (0, pad)),
            valid=jnp.pad(kps.valid, (0, pad)),
        )
    return kps


def describe(
    atlas: jax.Array, meta: PyramidMeta, kps: Keypoints, q: int, cfg: OrbConfig
) -> Features:
    """Descriptors for the strongest ``q`` keypoint slots.

    q is a static bucket size; when q >= the number of valid keypoints the
    compaction is exact (only padding slots are dropped), so bucketed and
    full-width paths produce identical match results.
    """
    k = kps.score.shape[0]
    if q < k:
        key = jnp.where(kps.valid, kps.score, -1.0)
        _, sel = jax.lax.top_k(key, q)
        kps = Keypoints(*(jnp.take(f, sel) for f in kps))

    offsets = np.asarray(meta.offsets, np.int32)
    xoffsets = np.asarray(meta.xoffsets, np.int32)
    heights = np.asarray([s[0] for s in meta.sizes], np.int32)
    widths = np.asarray([s[1] for s in meta.sizes], np.int32)
    # Atlas-absolute center coords; clamping in extract_patches must stay
    # inside the keypoint's own level, so pass per-keypoint slice bounds.
    y_lo = jnp.take(jnp.asarray(offsets), kps.level)
    y_abs = kps.y + y_lo
    y_hi = y_lo + jnp.take(jnp.asarray(heights), kps.level)
    x_lo = jnp.take(jnp.asarray(xoffsets), kps.level)
    x_abs = kps.x + x_lo
    x_hi = x_lo + jnp.take(jnp.asarray(widths), kps.level)

    if jax.default_backend() == "tpu":
        # Fused Pallas kernel: window DMA + orientation + blur-folded
        # steered BRIEF in one pass (ops/pallas_orb.py; angle quantized to
        # 32 bins like the original ORB paper's 12 deg). Slides and frames
        # share the path, so matching stays internally consistent.
        from .pallas_orb import orb_descriptors_pallas

        desc = orb_descriptors_pallas(
            atlas, y_abs, x_abs, y_lo, y_hi, x_hi,
            cfg.descriptor_bits, cfg.pattern_seed,
            cfg.blur_ksize, cfg.blur_sigma,
            x_lo=x_lo, pass2=cfg.describe_pass2,
        )
    else:
        patches = orb.extract_patches(
            atlas, y_abs, x_abs, y_lo, y_hi, x_hi, x_lo
        ).astype(jnp.float32)  # bf16 atlas: values stay quantized, math f32
        cos, sin = orb.orientations(patches)
        blurred = orb.blur_patches(patches, cfg.blur_ksize, cfg.blur_sigma)
        desc = orb.descriptors(
            blurred, cos, sin, cfg.descriptor_bits, cfg.pattern_seed
        )
    desc = jnp.where(kps.valid[:, None], desc, jnp.int8(0))

    # Exact level->level0 affine map of the successive 1.2x resizes:
    # x0 = r*x + (r-1)/2 with r = 1.2**level (see resize_65).
    r = jnp.take(jnp.asarray(_level_scales(cfg)), kps.level)
    half = (r - 1.0) * 0.5
    pts = jnp.stack(
        [kps.x.astype(jnp.float32) * r + half, kps.y.astype(jnp.float32) * r + half],
        axis=-1,
    )
    return Features(pts=pts, desc=desc, score=kps.score, valid=kps.valid)


def extract_features(img: jax.Array, cfg: OrbConfig) -> Features:
    """ORB features of a [H, W] float32 grayscale image (full-width path).

    Returns Features padded to cfg.max_keypoints slots. Shapes are static for
    a given (H, W); jit per size bucket.
    """
    h, w = img.shape
    meta = pyramid_meta(h, w, cfg)
    atlas = build_pyramid(img, cfg)
    kps = detect_pyramid(atlas, meta, cfg)
    return describe(atlas, meta, kps, cfg.max_keypoints, cfg)


def extract_features_batch(imgs: jax.Array, cfg: OrbConfig) -> Features:
    """Features for a [B, H, W] batch.

    Uses lax.map (sequential over the batch) to keep the FAST stage's
    transients from scaling with B; each image already saturates the
    VPU/MXU at 1080p.
    """
    return jax.lax.map(lambda im: extract_features(im, cfg), imgs)
