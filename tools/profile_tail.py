"""Tail-stage TPU profile at the bench's real bucket (Q=2048, 500 slides).

Measures describe / table / select / RANSAC / verify in isolation from
precomputed inputs, floor-subtracted (floor = trivial-jit time). Memory-
frugal: intermediates are fetched to host or reduced; atlases are the only
large live arrays.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python3 tools/profile_tail.py
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
    from slideo_tpu.ops import features as F, hamming, ransac, select, verify
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
    q = cfg.orb.max_keypoints  # 2048 — the bucket the bench frames hit

    def timed(fn, inputs, n=3, tag=""):
        outs = fn(inputs[0])
        for o in jax.tree.leaves(outs):
            np.asarray(o)
        ts = []
        for i in range(1, n + 1):
            outs = fn(inputs[i % len(inputs)])
            t0 = time.time()
            for o in jax.tree.leaves(outs):
                np.asarray(o)
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2]
        if tag:
            print(f"{tag:48s} {t*1000:9.2f} ms total", flush=True)
        return t

    def timed2(fn, inputs, n=3, tag=""):
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
        t = sorted(ts)[len(ts) // 2]
        if tag:
            print(f"{tag:48s} {t*1000:9.2f} ms total", flush=True)
        return t

    tiny = [jnp.asarray(np.full((8,), i, np.float32)) for i in range(4)]
    floor = timed2(jax.jit(lambda x: x.sum()), tiny, n=5, tag="floor")

    def scal(fn):
        def wrapped(*a):
            leaves = jax.tree.leaves(fn(*a))
            return sum(l.sum().astype(jnp.float32) for l in leaves)
        return jax.jit(wrapped)

    def per_frame(t, tag):
        print(f"{tag:48s} {max(t - floor, 0)*1000/b:9.3f} ms/frame", flush=True)

    # Precompute atlases + kps per input set.
    pyr_j = jax.jit(lambda fr: jax.lax.map(
        lambda im: F.build_pyramid(im, cfg.orb), fr))
    det_j = jax.jit(lambda atl: jax.lax.map(
        lambda a: F.detect_pyramid(a, meta, cfg.orb), atl))
    atl = []
    kps = []
    for i in range(n_sets):
        a = pyr_j(jnp.asarray(frames[i * b:(i + 1) * b]))
        k = det_j(a)
        jax.block_until_ready(k)
        atl.append(a)
        kps.append(k)

    # --- describe at q=2048 ---
    def describe_b(inp):
        a, kp = inp
        return jax.lax.map(
            lambda ak: F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb).desc,
            (a, tuple(kp)))
    ins = list(zip(atl, kps))
    t = timed2(scal(describe_b), ins)
    per_frame(t, f"describe q={q}")

    # --- describe + table (screened) ---
    screened = n_slides > mcfg.screen_above_slides
    table_cols = mcfg.screen_slides if screened else n_slides
    with_train = table_cols <= max(4 * mcfg.top_slides, 128)

    def feats_b(inp):
        a, kp = inp
        return jax.lax.map(
            lambda ak: F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb),
            (a, tuple(kp)))

    def table_b(inp, didx):
        a, kp = inp
        def one(ak):
            ft = F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb)
            t = hamming.match_table_frame(
                ft.desc, ft.score, didx, n_slides, k_per_slide,
                mcfg, with_train=with_train)
            return t.dist.sum() + (t.train.sum() if t.train is not None else 0)
        return jax.lax.map(one, (a, tuple(kp)))
    tbj = jax.jit(table_b)
    t = timed2(lambda inp: tbj(inp, index.desc_index), ins)
    per_frame(t, "describe+table")

    # Precompute per-frame feats + tables (host roundtrip, then re-upload
    # as stacked arrays so downstream timings isolate select/ransac/verify).
    feats_j = jax.jit(feats_b)
    ins2 = ins

    def tables_b(inp, didx):
        a, kp = inp
        def one(ak):
            ft = F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb)
            tb = hamming.match_table_frame(
                ft.desc, ft.score, didx, n_slides, k_per_slide,
                mcfg, with_train=with_train)
            return (tb.dist, tb.train if tb.train is not None else
                    jnp.zeros_like(tb.dist, jnp.int32), tb.slide_ids,
                    tb.valid)
        return jax.lax.map(one, (a, tuple(kp)))
    _tj = jax.jit(tables_b)
    tables_j = lambda inp: _tj(inp, index.desc_index)
    fts = []
    tbls = []
    for i in range(n_sets):
        ft = feats_j(ins2[i])
        tb = tables_j(ins2[i])
        jax.block_until_ready((ft, tb))
        fts.append(ft)
        tbls.append(tb)
    del atl, ins
    mk_tbl = lambda tb, i: hamming.MatchTable(
        dist=tb[0][i], train=tb[1][i] if with_train else None,
        slide_ids=tb[2][i], valid=tb[3][i])

    # --- select (rank + compact) ---
    def select_b(inp):
        ft, tb = inp
        def one(i):
            t = mk_tbl(tb, i)
            cands = select.select_candidates_table(
                t, ft.valid[i], mcfg,
                train_for_slides=None if with_train else (
                    lambda sids: hamming.train_ids_for_slides(
                        ft.desc[i], index.desc_index, sids, k_per_slide)))
            return sum(jnp.sum(f) for f in (cands.query_ids, cands.train_ids))
        return jax.lax.map(one, jnp.arange(b))
    sj = jax.jit(select_b)
    t = timed2(lambda inp: sj(inp), list(zip(fts, tbls)))
    per_frame(t, "select (rank+compact)")

    # --- select + ransac ---
    def ransac_b(inp, ipts):
        ft, tb = inp
        def one(i):
            t = mk_tbl(tb, i)
            cs = select.select_candidates_table(t, ft.valid[i], mcfg)
            cand_pts = jnp.take(ipts, cs.slide_ids, axis=0)
            src = jnp.take_along_axis(cand_pts, cs.train_ids[..., None], axis=1)
            dst = jnp.take(ft.pts[i], cs.query_ids, axis=0)
            valid = cs.match_valid & cs.cand_valid[:, None]
            key = jax.random.fold_in(jax.random.key(mcfg.ransac_seed), i)
            rr = ransac.ransac_similarity(src, dst, valid, key, mcfg)
            return rr.rating.sum() + rr.transform.a.sum()
        return jax.lax.map(one, jnp.arange(b))
    rj = jax.jit(ransac_b)
    t = timed2(lambda inp: rj(inp, index.pts), list(zip(fts, tbls)))
    per_frame(t, "select+ransac")

    # --- full cascade (adds verify) needs frames ---
    frs = [jnp.asarray(frames[i * b:(i + 1) * b]) for i in range(n_sets)]

    def cascade_b(inp, ipts, ismalls):
        ft, tb, fr = inp
        def one(i):
            t = mk_tbl(tb, i)
            fm = orb_matcher.cascade_from_table(
                fr[i].astype(jnp.float32), i, jax.tree.map(lambda x: x[i], ft),
                t, ipts, ismalls, hw, cfg)
            return fm.slide.astype(jnp.float32) + jnp.where(
                jnp.isfinite(fm.similarity), fm.similarity, 0.0)
        return jax.lax.map(one, jnp.arange(b))
    cj = jax.jit(cascade_b)
    t = timed2(lambda inp: cj(inp, index.pts, index.smalls),
               list(zip(fts, tbls, frs)))
    per_frame(t, "full cascade (select+ransac+verify)")


if __name__ == "__main__":
    main()
