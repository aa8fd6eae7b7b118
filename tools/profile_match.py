"""Per-stage TPU timing of the match path (not part of the driver contract).

Times successive prefixes of the per-frame program, each as one jit'd
lax.map over a batch with distinct inputs (the remote runtime caches
identical executions and has a ~45 ms dispatch floor; see CLAUDE.md).
Stage cost = difference of successive prefix times.

Usage: python tools/profile_match.py [--slides 500] [--batch 8] [--iters 3]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--realistic", action="store_true",
                    help="use sparse (lecture-like, 200-700 kp) frames")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import synthesize
    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.ops import features as F
    from slideo_tpu.ops import hamming
    from slideo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = tuple(args.frame_hw)
    n_in = args.batch * (args.iters + 1)
    slides, frames = synthesize(args.slides, hw, hw, n_in)
    meta = F.pyramid_meta(hw[0], hw[1], cfg.orb)

    t0 = time.time()
    index = orb_matcher.build_slide_index_chunked(slides, cfg)
    print(f"index build: {time.time()-t0:.1f}s", flush=True)
    n_slides, k_per = index.pts.shape[0], index.pts.shape[1]

    def prefix_pyramid(fr, seeds, idx):
        return jax.lax.map(
            lambda f: jnp.sum(F.build_pyramid(f, cfg.orb)), fr
        )

    def prefix_detect(fr, seeds, idx):
        def one(f):
            atlas = F.build_pyramid(f, cfg.orb)
            kps = F.detect_pyramid(atlas, meta, cfg.orb)
            return kps.score.sum() + kps.valid.sum() + kps.x.sum()
        return jax.lax.map(one, fr)

    def make_prefix_describe(q):
        def prefix_describe(fr, seeds, idx):
            def one(f):
                atlas = F.build_pyramid(f, cfg.orb)
                kps = F.detect_pyramid(atlas, meta, cfg.orb)
                feats = F.describe(atlas, meta, kps, q, cfg.orb)
                return feats.desc.astype(jnp.int32).sum() + feats.pts.sum()
            return jax.lax.map(one, fr)
        return prefix_describe

    def make_prefix_table(q):
        def prefix_table(fr, seeds, idx):
            def one(f):
                atlas = F.build_pyramid(f, cfg.orb)
                kps = F.detect_pyramid(atlas, meta, cfg.orb)
                feats = F.describe(atlas, meta, kps, q, cfg.orb)
                screened = n_slides > cfg.match.screen_above_slides
                cols = cfg.match.screen_slides if screened else n_slides
                wt = cols <= max(4 * cfg.match.top_slides, 128)
                t = hamming.match_table_frame(
                    feats.desc, feats.score, idx.desc_index, n_slides, k_per,
                    cfg.match, with_train=wt)
                return t.dist.sum()
            return jax.lax.map(one, fr)
        return prefix_table

    def make_prefix_select(q, with_ransac=False):
        from slideo_tpu.ops import ransac as ransac_ops
        from slideo_tpu.ops import select as select_ops
        import jax.numpy as jnp_

        def prefix_select(fr, seeds, idx):
            def one(args):
                f, seed = args
                atlas = F.build_pyramid(f, cfg.orb)
                kps = F.detect_pyramid(atlas, meta, cfg.orb)
                feats = F.describe(atlas, meta, kps, q, cfg.orb)
                # mirror the production path: in-table argmax when the
                # (screened) table is narrow (orb_matcher.match_frame)
                screened = n_slides > cfg.match.screen_above_slides
                cols = cfg.match.screen_slides if screened else n_slides
                wt = cols <= max(4 * cfg.match.top_slides, 128)
                t = hamming.match_table_frame(
                    feats.desc, feats.score, idx.desc_index, n_slides, k_per,
                    cfg.match, with_train=wt)
                tfs = None if wt else (
                    lambda sids: hamming.train_ids_for_slides(
                        feats.desc, idx.desc_index, sids, k_per))
                cands = select_ops.select_candidates_table(
                    t, feats.valid, cfg.match, train_for_slides=tfs)
                acc = (cands.counts.sum() + cands.query_ids.sum()
                       + cands.train_ids.sum())
                if not with_ransac:
                    return acc
                cand_pts = jnp_.take(idx.pts, cands.slide_ids, axis=0)
                src = jnp_.take_along_axis(
                    cand_pts, cands.train_ids[..., None], axis=1)
                dst = jnp_.take(feats.pts, cands.query_ids, axis=0)
                valid = cands.match_valid & cands.cand_valid[:, None]
                key = jax.random.fold_in(
                    jax.random.key(cfg.match.ransac_seed), seed)
                rr = ransac_ops.ransac_similarity(src, dst, valid, key, cfg.match)
                return acc + rr.rating.sum()
            return jax.lax.map(one, (fr, seeds))
        return prefix_select

    def full(fr, seeds, idx):
        return orb_matcher.match_frames(fr, seeds, idx, hw, cfg).slide

    def kp_count(fr, seeds, idx):
        def one(f):
            atlas = F.build_pyramid(f, cfg.orb)
            kps = F.detect_pyramid(atlas, meta, cfg.orb)
            return jnp.sum(kps.valid)
        return jax.lax.map(one, fr)

    stages = [
        ("pyramid", prefix_pyramid),
        ("detect", prefix_detect),
        ("describe768", make_prefix_describe(768)),
        ("describe2048", make_prefix_describe(2048)),
        ("table768", make_prefix_table(768)),
        ("table2048", make_prefix_table(2048)),
        ("select2048", make_prefix_select(2048)),
        ("ransac2048", make_prefix_select(2048, with_ransac=True)),
        ("full_match", full),
    ]

    counts = np.asarray(jax.jit(kp_count)(
        jnp.asarray(frames[: args.batch]), None, index))
    print("kp counts per frame:", counts, flush=True)

    batches = [jnp.asarray(frames[i * args.batch:(i + 1) * args.batch])
               for i in range(args.iters + 1)]
    seeds = [jnp.arange(i * args.batch, (i + 1) * args.batch, dtype=jnp.int32)
             for i in range(args.iters + 1)]

    for name, fn in stages:
        jfn = jax.jit(fn)
        t0 = time.time()
        np.asarray(jfn(batches[0], seeds[0], index))
        t_compile = time.time() - t0
        times = []
        for i in range(1, args.iters + 1):
            t0 = time.time()
            np.asarray(jfn(batches[i], seeds[i], index))
            times.append(time.time() - t0)
        best = min(times)
        print(f"{name:14s} {best/args.batch*1000:7.2f} ms/frame  "
              f"(batch {best*1000:.0f} ms, compile {t_compile:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
