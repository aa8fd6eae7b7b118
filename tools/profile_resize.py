"""Micro-bench of pyramid construction variants on the TPU (dev tool).

Variants:
  A: current resize_65 (block einsum both axes) + dynamic_update_slice atlas
  B: rows block einsum + cols dense banded matmul
  C: dense banded matmuls both axes (round-1 formulation)
  D: conv_general_dilated stride-6 formulation
  concat vs dus: atlas assembly comparison
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import features as F
from slideo_tpu.ops import image as image_ops
from slideo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
cfg = DEFAULT_CONFIG.orb
H, W = 1080, 1920
B, ITERS = 8, 3
rng = np.random.RandomState(0)
frames = rng.randint(0, 255, (B * (ITERS + 1), H, W)).astype(np.float32)


def time_fn(name, fn):
    jfn = jax.jit(fn)
    batches = [jnp.asarray(frames[i * B : (i + 1) * B]) for i in range(ITERS + 1)]
    t0 = time.time()
    np.asarray(jfn(batches[0]))
    tc = time.time() - t0
    times = []
    for i in range(1, ITERS + 1):
        t0 = time.time()
        np.asarray(jfn(batches[i]))
        times.append(time.time() - t0)
    print(f"{name:24s} {min(times)/B*1000:7.2f} ms/frame (compile {tc:.1f}s)",
          flush=True)


def pyramid_levels(img, step):
    """List of level images via the given one-step downscale."""
    meta = F.pyramid_meta(img.shape[0], img.shape[1], cfg)
    levels = [img]
    for _ in range(1, cfg.n_levels):
        levels.append(step(levels[-1]))
    return levels, meta


def atlas_concat(levels, meta):
    w0 = meta.atlas_hw[1]
    return jnp.concatenate(
        [jnp.pad(l, ((0, 0), (0, w0 - l.shape[1]))) for l in levels], axis=0
    )


# --- variant steps ---------------------------------------------------------

def step_block(img):  # current
    return F.resize_65(img)


def step_rowsblock_colsdense(img):
    p = F._pattern_65()
    h, w = img.shape
    h6 = 6 * ((h + 5) // 6)
    x = jnp.pad(img, ((0, h6 - h), (0, 0)), mode="edge")
    x = x.reshape(h6 // 6, 6, w)
    x = jnp.einsum("rj,kjw->krw", p, x, preferred_element_type=jnp.float32)
    x = x.reshape(h6 // 6 * 5, w)
    w_out = F._next_65(w)
    wx = _dense_65(w, w_out)
    return jnp.einsum("hw,vw->hv", x, wx, preferred_element_type=jnp.float32)


def _dense_65(n_in, n_out):
    p = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        src = 1.2 * o + 0.1
        i0 = int(np.floor(src))
        fr = src - i0
        ia, ib = min(i0, n_in - 1), min(i0 + 1, n_in - 1)
        p[o, ia] += 1 - fr
        p[o, ib] += fr
    return p


def step_dense(img):
    h, w = img.shape
    ho, wo = F._next_65(h), F._next_65(w)
    wy = _dense_65(h, ho)
    wx = _dense_65(w, wo)
    x = jnp.einsum("hw,vw->hv", img, wx, preferred_element_type=jnp.float32)
    return jnp.einsum("hv,uh->uv", x, wy, preferred_element_type=jnp.float32)


def step_conv(img):
    p = F._pattern_65()  # [5, 6]
    h, w = img.shape
    h6, w6 = 6 * ((h + 5) // 6), 6 * ((w + 5) // 6)
    x = jnp.pad(img, ((0, h6 - h), (0, w6 - w)), mode="edge")[None, None]
    ky = p.reshape(5, 1, 6, 1)  # OIHW: 5 out-features over 6-row window
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(ky), (6, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [1, 5, h6/6, w6]
    out = jnp.moveaxis(out[0], 0, 1).reshape(h6 // 6 * 5, w6)
    kx = p.reshape(5, 1, 1, 6)
    out = jax.lax.conv_general_dilated(
        out[None, None], jnp.asarray(kx), (1, 6), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jnp.moveaxis(out[0], 0, 2).reshape(h6 // 6 * 5, w6 // 6 * 5)
    return out


def make_full(step, assemble):
    def full(batch):
        def one(img):
            levels, meta = pyramid_levels(img, step)
            return jnp.sum(assemble(levels, meta))
        return jax.lax.map(one, batch)
    return full


def atlas_dus(levels, meta):
    atlas = jnp.zeros(meta.atlas_hw, jnp.float32)
    for l, off, xoff in zip(levels, meta.offsets, meta.xoffsets):
        atlas = jax.lax.dynamic_update_slice(atlas, l, (off, xoff))
    return atlas


def levels_only(levels, meta):
    return sum(jnp.sum(l) for l in levels)


def full_batched_dense(batch):
    """Variant E: whole batch per level, dense banded matmuls (MXU shapes
    [B*H, W] x [W, W'] — no per-frame skinny chains)."""
    meta = F.pyramid_meta(H, W, cfg)
    w0 = meta.atlas_hw[1]
    levels = [batch]
    x = batch
    for lvl in range(1, cfg.n_levels):
        h, w = x.shape[1], x.shape[2]
        ho, wo = F._next_65(h), F._next_65(w)
        wy = jnp.asarray(_dense_65(h, ho))   # [ho, h]
        wx = jnp.asarray(_dense_65(w, wo))   # [wo, w]
        x = jnp.einsum("bhw,vw->bhv", x, wx, preferred_element_type=jnp.float32)
        x = jnp.einsum("bhv,uh->buv", x, wy, preferred_element_type=jnp.float32)
        levels.append(x)
    atlas = jnp.concatenate(
        [jnp.pad(l, ((0, 0), (0, 0), (0, w0 - l.shape[2]))) for l in levels],
        axis=1,
    )
    return jnp.sum(atlas, axis=(1, 2))


def full_batched_block(batch):
    """Variant F: whole batch per level, block-periodic einsums (5 flops/px)."""
    meta = F.pyramid_meta(H, W, cfg)
    w0 = meta.atlas_hw[1]
    p = jnp.asarray(F._pattern_65())
    levels = [batch]
    x = batch
    for lvl in range(1, cfg.n_levels):
        b, h, w = x.shape
        h6, w6 = 6 * ((h + 5) // 6), 6 * ((w + 5) // 6)
        x = jnp.pad(x, ((0, 0), (0, h6 - h), (0, w6 - w)), mode="edge")
        x = x.reshape(b, h6 // 6, 6, w6)
        x = jnp.einsum("rj,bkjw->bkrw", p, x, preferred_element_type=jnp.float32)
        x = x.reshape(b, h6 // 6 * 5, w6 // 6, 6)
        x = jnp.einsum("rj,bhkj->bhkr", p, x, preferred_element_type=jnp.float32)
        x = x.reshape(b, h6 // 6 * 5, w6 // 6 * 5)
        levels.append(x)
    atlas = jnp.concatenate(
        [jnp.pad(l, ((0, 0), (0, 0), (0, w0 - l.shape[2]))) for l in levels],
        axis=1,
    )
    return jnp.sum(atlas, axis=(1, 2))


if __name__ == "__main__":
    time_fn("E batched dense", full_batched_dense)
    time_fn("F batched block", full_batched_block)
    time_fn("A block+dus (current)", make_full(step_block, atlas_dus))
    time_fn("A block, levels only", make_full(step_block, levels_only))
    time_fn("A block + concat", make_full(step_block, atlas_concat))
    time_fn("B rowsblock+colsdense", make_full(step_rowsblock_colsdense, atlas_concat))
    time_fn("C dense both", make_full(step_dense, atlas_concat))
    time_fn("D conv stride6", make_full(step_conv, atlas_concat))
