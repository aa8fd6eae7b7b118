"""Split the match-table stage's cost: screening / sub-index slice / stage-2.

Times each substage of hamming.match_table_frame at the bench shape
(Q=2048, 500 slides screened to screen_slides) from precomputed frame
descriptors, floor-subtracted, distinct inputs per iteration.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python3 tools/profile_table.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import synthesize
    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.ops import features as F, hamming
    from slideo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    mcfg = cfg.match
    hw = (1080, 1920)
    b = args.batch
    n_sets = 4
    slides, frames = synthesize(args.slides, hw, hw, b * n_sets)
    print(f"slides={args.slides} batch={b} device={jax.devices()[0]}", flush=True)

    index = orb_matcher.build_slide_index_chunked(slides, cfg)
    n_slides, k_per_slide = index.pts.shape[0], index.pts.shape[1]
    meta = F.pyramid_meta(*hw, cfg.orb)
    q = cfg.orb.max_keypoints

    def timed(fn, inputs, n=3, tag=""):
        outs = fn(inputs[0])
        for o in jax.tree.leaves(outs):
            np.asarray(o)
        ts = []
        for i in range(1, n + 1):
            t0 = time.time()
            outs = fn(inputs[i % len(inputs)])
            for o in jax.tree.leaves(outs):
                np.asarray(o)
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    tiny = [jnp.asarray(np.full((8,), i, np.float32)) for i in range(4)]
    floor = timed(jax.jit(lambda x: x.sum()), tiny, n=5)
    print(f"floor {floor*1000:.1f} ms", flush=True)

    def per_frame(t, tag):
        print(f"{tag:44s} {max(t - floor, 0)*1000/b:9.3f} ms/frame", flush=True)

    # Precompute per-frame features.
    def feats_b(fr):
        def one(im):
            atlas = F.build_pyramid(im, cfg.orb)
            kps = F.detect_pyramid(atlas, meta, cfg.orb)
            ft = F.describe(atlas, meta, kps, q, cfg.orb)
            return ft.desc, ft.score, ft.valid
        return jax.lax.map(one, fr)
    fj = jax.jit(feats_b)
    fts = []
    for i in range(n_sets):
        ft = fj(jnp.asarray(frames[i * b:(i + 1) * b]))
        jax.block_until_ready(ft)
        fts.append(ft)

    screened = n_slides > mcfg.screen_above_slides
    print(f"screened={screened} screen_slides={mcfg.screen_slides} "
          f"screen_queries={mcfg.screen_queries} bits={mcfg.screen_bits}",
          flush=True)

    # --- (a) screening only ---
    def screen_b(ft, didx):
        desc, score, valid = ft
        return jax.lax.map(
            lambda dv: hamming._screen_slides(dv[0], dv[1], didx, n_slides, mcfg),
            (desc, score))
    sj = jax.jit(screen_b)
    t = timed(lambda ft: sj(ft, index.desc_index), fts)
    per_frame(t, "stage-1 screening")

    # --- (b) screening + sub-index slicing (reduce to avoid fetch volume) ---
    def slice_b(ft, didx):
        desc, score, valid = ft
        def one(dv):
            cand = hamming._screen_slides(dv[0], dv[1], didx, n_slides, mcfg)
            d_dim = didx.desc.shape[1]
            def slice_slide(c):
                row0 = c * k_per_slide
                out = (
                    jax.lax.dynamic_slice(didx.desc, (row0, 0), (k_per_slide, d_dim)),
                    jax.lax.dynamic_slice(didx.valid, (row0,), (k_per_slide,)),
                )
                if didx.desc_t is not None:
                    out += (jax.lax.dynamic_slice(
                        didx.desc_t, (c, 0, 0), (1, d_dim, k_per_slide))[0],)
                return out
            sl = jax.lax.map(slice_slide, cand)
            return sum(jnp.sum(x.astype(jnp.int32)) for x in sl[:2])
        return jax.lax.map(one, (desc, score))
    slj = jax.jit(slice_b)
    t = timed(lambda ft: slj(ft, index.desc_index), fts)
    per_frame(t, "screening + sub-index slice")

    # --- (c) full table (screen + slice + stage-2 exact) ---
    def table_b(ft, didx):
        desc, score, valid = ft
        def one(dv):
            tb = hamming.match_table_frame(
                dv[0], dv[1], didx, n_slides, k_per_slide, mcfg,
                with_train=True)
            return tb.dist.sum() + tb.train.sum()
        return jax.lax.map(one, (desc, score))
    tj = jax.jit(table_b)
    t = timed(lambda ft: tj(ft, index.desc_index), fts)
    per_frame(t, "full table (screen+slice+stage2)")

    # --- (d) stage-2 exact table at screen_slides columns, no screening ---
    cand_fix = jnp.arange(mcfg.screen_slides, dtype=jnp.int32)

    def stage2_b(ft, didx):
        desc, score, valid = ft
        d_dim = didx.desc.shape[1]
        def one(dv):
            def slice_slide(c):
                row0 = c * k_per_slide
                out = (
                    jax.lax.dynamic_slice(didx.desc, (row0, 0), (k_per_slide, d_dim)),
                    jax.lax.dynamic_slice(didx.valid, (row0,), (k_per_slide,)),
                )
                if didx.desc_t is not None:
                    out += (jax.lax.dynamic_slice(
                        didx.desc_t, (c, 0, 0), (1, d_dim, k_per_slide))[0],)
                return out
            sl = jax.lax.map(slice_slide, cand_fix)
            n_cand = mcfg.screen_slides
            sub = hamming.DescriptorIndex(
                desc=sl[0].reshape(n_cand * k_per_slide, d_dim),
                slide_ids=jnp.repeat(cand_fix, k_per_slide),
                train_ids=jnp.tile(jnp.arange(k_per_slide, dtype=jnp.int32), n_cand),
                valid=sl[1].reshape(n_cand * k_per_slide),
                desc_t=sl[2] if didx.desc_t is not None else None,
            )
            tb = hamming.match_table(dv[0], sub, n_cand, k_per_slide,
                                     slide_ids=cand_fix, with_train=True)
            return tb.dist.sum() + tb.train.sum()
        return jax.lax.map(one, (desc, score))
    s2j = jax.jit(stage2_b)
    t = timed(lambda ft: s2j(ft, index.desc_index), fts)
    per_frame(t, "slice + stage-2 exact (fixed cands)")


if __name__ == "__main__":
    main()
