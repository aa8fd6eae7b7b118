"""Round-3 floor-aware TPU profile.

Separates the per-call dispatch+fetch floor from marginal per-frame work:
- floor: a trivial jit (sum of a tiny input) timed like everything else
- each stage timed at two batch sizes -> slope = marginal ms/frame
- fetch cost: one vs two sequential np.asarray roundtrips
- bucket occupancy: valid-keypoint counts of the synthetic bench frames

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python3 tools/profile_r3.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, inputs, n=3, tag=""):
    import jax

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
        print(f"{tag:52s} {t * 1000:9.2f} ms", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--b1", type=int, default=16)
    ap.add_argument("--b2", type=int, default=48)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import synthesize
    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.ops import fast, features as F, hamming, select
    from slideo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    b1, b2 = args.b1, args.b2
    n_in = (b1 + b2) * 4
    slides, frames = synthesize(args.slides, hw, hw, n_in)
    print(f"slides={args.slides} b1={b1} b2={b2} device={jax.devices()[0]}",
          flush=True)

    t0 = time.time()
    index = orb_matcher.build_slide_index_chunked(slides, cfg)
    print(f"index build: {time.time() - t0:.1f}s", flush=True)

    # ---- floor: trivial program, one fetch ----
    tiny = [jnp.asarray(np.full((8,), i, np.float32)) for i in range(4)]
    null = jax.jit(lambda x: x.sum())
    t_floor = timed(null, tiny, n=5, tag="floor: trivial jit, 1 fetch")

    # ---- fetch count cost on the full matcher output ----
    match = orb_matcher.jit_match_frames(hw, cfg)

    def mk(lo, b):
        return (
            jnp.asarray(frames[lo:lo + b]),
            jnp.arange(lo, lo + b, dtype=jnp.int32),
        )

    ins1 = [mk(i * b1, b1) for i in range(4)]
    ins2 = [mk(4 * b1 + i * b2, b2) for i in range(4)]

    def full1(inp):
        out = match(inp[0], inp[1], index)
        return out.slide  # single fetched leaf

    def full3(inp):
        out = match(inp[0], inp[1], index)
        np.asarray(out.slide)
        np.asarray(out.similarity)
        np.asarray(out.rating)
        return ()

    t_f1_b1 = timed(full1, ins1, tag=f"FULL b{b1}, 1 fetch")
    t_f1_b2 = timed(full1, ins2, tag=f"FULL b{b2}, 1 fetch")
    t_f3_b1 = timed(full3, ins1, tag=f"FULL b{b1}, 3 sequential fetches")
    w = (t_f1_b2 - t_f1_b1) / (b2 - b1)
    f = t_f1_b1 - b1 * w
    print(f"  -> marginal {w*1000:.2f} ms/frame, per-call overhead "
          f"{f*1000:.1f} ms, extra per fetch {max(t_f3_b1-t_f1_b1,0)*500:.1f} ms",
          flush=True)

    # ---- per-stage marginal cost via slope ----
    meta = F.pyramid_meta(*hw, cfg.orb)

    def scal(fn):
        def wrapped(*a):
            leaves = jax.tree.leaves(fn(*a))
            return sum(l.sum().astype(jnp.float32) for l in leaves)
        return jax.jit(wrapped)

    def slope(body, tag, prep=lambda inp: inp):
        j1 = [prep(i) for i in ins1]
        j2 = [prep(i) for i in ins2]
        t1 = timed(body, j1)
        t2 = timed(body, j2)
        m = (t2 - t1) / (b2 - b1)
        print(f"{tag:52s} {m*1000:9.3f} ms/frame", flush=True)
        return m

    pyr_j = jax.jit(
        lambda fr: jax.lax.map(lambda im: F.build_pyramid(im, cfg.orb), fr)
    )
    m_pyr = slope(scal(lambda fr: pyr_j(fr)), "pyramid", prep=lambda inp: inp[0])

    atl1 = [pyr_j(i[0]) for i in ins1]
    atl2 = [pyr_j(i[0]) for i in ins2]
    for a in atl1 + atl2:
        np.asarray(a[0, 0, 0])

    fast_body = scal(lambda atl: jax.lax.map(
        lambda a: fast.score_map(a, cfg.orb.fast_threshold), atl))
    t1 = timed(fast_body, atl1)
    t2 = timed(fast_body, atl2)
    m_fast = (t2 - t1) / (b2 - b1)
    print(f"{'FAST score (pallas, per-frame)':52s} {m_fast*1000:9.3f} ms/frame",
          flush=True)

    fb_j = jax.jit(lambda atl: jax.lax.map(
        lambda a: fast.score_map(a, cfg.orb.fast_threshold), atl))
    sc1 = [fb_j(a) for a in atl1]
    sc2 = [fb_j(a) for a in atl2]
    for s in sc1 + sc2:
        np.asarray(s[0, 0, 0])
    det_body = scal(lambda sc: jax.lax.map(
        lambda s: F.detect_from_scores(s, meta, cfg.orb), sc))
    t1 = timed(det_body, sc1)
    t2 = timed(det_body, sc2)
    m_det = (t2 - t1) / (b2 - b1)
    print(f"{'detect top-k':52s} {m_det*1000:9.3f} ms/frame", flush=True)

    # valid counts / bucket occupancy of the synthetic frames
    det_j = jax.jit(lambda sc: jax.lax.map(
        lambda s: F.detect_from_scores(s, meta, cfg.orb), sc))
    kps1 = [det_j(s) for s in sc1]
    counts = np.concatenate(
        [np.asarray(jnp.sum(k.valid, axis=1)) for k in kps1])
    buckets = orb_matcher._query_buckets(cfg)
    occ = {q: int(np.sum([np.searchsorted(np.asarray(buckets[:-1]), c,
                                          side="left") == bi
                          for c in counts]))
           for bi, q in enumerate(buckets)}
    print(f"frame valid-kp counts: min {counts.min()} med "
          f"{int(np.median(counts))} max {counts.max()}  bucket occupancy "
          f"{occ}", flush=True)

    # describe at each bucket size
    for q in buckets:
        def describe_all(inp, q=q):
            atl, kp = inp
            return jax.lax.map(
                lambda ak: F.describe(
                    ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb).desc,
                (atl, tuple(kp)),
            )
        d1 = list(zip(atl1, kps1))
        kps2 = [det_j(s) for s in sc2]
        d2 = list(zip(atl2, kps2))
        body = scal(describe_all)
        t1 = timed(body, d1)
        t2 = timed(body, d2)
        m_desc = (t2 - t1) / (b2 - b1)
        print(f"{f'describe q={q}':52s} {m_desc*1000:9.3f} ms/frame", flush=True)

    # table (screened) at each bucket size, as delta over describe
    n_pts = index.pts.shape[1]
    for q in buckets:
        def dt(inp, q=q):
            atl, kp = inp
            def one(ak):
                ft = F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb)
                t = hamming.match_table_frame(
                    ft.desc, ft.score, index.desc_index, args.slides,
                    n_pts, cfg.match, with_train=True,
                )
                return t.dist.sum()
            return jax.lax.map(one, (atl, tuple(kp)))
        d1 = list(zip(atl1, kps1))
        kps2 = [det_j(s) for s in sc2]
        d2 = list(zip(atl2, kps2))
        body = jax.jit(dt)
        t1 = timed(body, d1)
        t2 = timed(body, d2)
        m_dt = (t2 - t1) / (b2 - b1)
        print(f"{f'describe+table q={q}':52s} {m_dt*1000:9.3f} ms/frame",
              flush=True)

    print(f"\nFULL marginal {w*1000:.2f} ms/frame; floor {f*1000:.1f} ms; "
          f"pyramid {m_pyr*1000:.2f} fast {m_fast*1000:.2f} "
          f"detect {m_det*1000:.2f}", flush=True)


if __name__ == "__main__":
    main()
