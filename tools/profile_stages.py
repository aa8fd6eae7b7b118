"""One-session TPU stage profile: FAST (single vs batched), describe, table,
select+cascade, full match — everything round 3 needs to decide the next
kernel move, in one run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python3 tools/profile_stages.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, inputs, n=3, tag=""):
    """Median wall time of fn over DISTINCT inputs (remote runtime caches
    identical executions; block_until_ready does not reliably wait)."""
    outs = fn(inputs[0])
    for o in __import__("jax").tree.leaves(outs):
        np.asarray(o)
    ts = []
    for i in range(1, n + 1):
        t0 = time.time()
        outs = fn(inputs[i % len(inputs)])
        for o in __import__("jax").tree.leaves(outs):
            np.asarray(o)
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(f"{tag:46s} {t * 1000:9.2f} ms", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import synthesize
    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.ops import fast, features as F, hamming
    from slideo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    hw = (1080, 1920)
    b = args.batch
    n_in = b * 4
    slides, frames = synthesize(args.slides, hw, hw, n_in)
    print(f"slides={args.slides} batch={b} device={jax.devices()[0]}", flush=True)

    t0 = time.time()
    index = orb_matcher.build_slide_index_chunked(slides, cfg)
    print(f"index build: {time.time() - t0:.1f}s", flush=True)

    meta = F.pyramid_meta(*hw, cfg.orb)
    frames_j = [jnp.asarray(frames[i * b:(i + 1) * b]) for i in range(4)]
    seeds_j = [jnp.arange(i * b, (i + 1) * b, dtype=jnp.int32) for i in range(4)]

    def scal(fn):
        """Jit fn but reduce every output leaf to one f32 scalar on-device so
        timing measures compute, not tunnel download."""
        def wrapped(*a):
            leaves = jax.tree.leaves(fn(*a))
            return sum(l.sum().astype(jnp.float32) for l in leaves)
        return jax.jit(wrapped)

    # --- pyramid ---
    pyr_body = lambda fr: jax.lax.map(
        lambda im: F.build_pyramid(im, cfg.orb), fr)
    t_pyr = timed(scal(pyr_body), frames_j, tag=f"pyramid x{b} (lax.map, MXU resize)")
    pyr = jax.jit(pyr_body)
    atlases = [pyr(f) for f in frames_j]
    for a in atlases:
        np.asarray(a[0, 0, 0])

    # --- FAST: per-frame launches vs one batched launch ---
    f_single = lambda atl: jax.lax.map(
        lambda a: fast.score_map(a, cfg.orb.fast_threshold), atl)
    f_batch = lambda atl: fast.score_map_batch(atl, cfg.orb.fast_threshold)
    t_fs = timed(scal(f_single), atlases, tag=f"FAST x{b} per-frame launches")
    t_fb = timed(scal(f_batch), atlases, tag=f"FAST x{b} ONE batched launch")

    # --- detect (top-k) from scores ---
    fb_j = jax.jit(f_batch)
    scores = [fb_j(a) for a in atlases]
    for s in scores:
        np.asarray(s[0, 0, 0])
    det_body = lambda sc: jax.lax.map(
        lambda s: F.detect_from_scores(s, meta, cfg.orb), sc)
    t_det = timed(scal(det_body), scores, tag=f"detect top-k x{b}")

    # --- describe (bucket 768) ---
    det = jax.jit(det_body)
    kps = [det(s) for s in scores]
    desc_in = list(zip(atlases, kps))
    q = cfg.orb.query_buckets[0]

    def describe_all(inp):
        atl, kp = inp
        return jax.lax.map(
            lambda ak: F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb).desc,
            (atl, tuple(kp)),
        )

    t_desc = timed(scal(describe_all), desc_in, tag=f"describe x{b} (q={q})")

    # --- match table (screened); index passed as jit arg (413 trap) ---
    def table_one(inp, desc_index, n_pts):
        atl, kp = inp
        def one(ak):
            ft = F.describe(ak[0], meta, F.Keypoints(*ak[1]), q, cfg.orb)
            t = hamming.match_table_frame(
                ft.desc, ft.score, desc_index, args.slides,
                n_pts, cfg.match, with_train=True,
            )
            return t.dist.sum()
        return jax.lax.map(one, (atl, tuple(kp)))

    tab_j = jax.jit(table_one, static_argnums=(2,))
    n_pts = index.pts.shape[1]
    t_tab = timed(lambda inp: tab_j(inp, index.desc_index, n_pts), desc_in,
                  tag=f"describe+table x{b}")

    # --- full match (new default config) ---
    mfull = orb_matcher.jit_match_frames(hw, cfg)
    full_in = list(zip(frames_j, seeds_j))
    t_full = timed(lambda inp: mfull(inp[0], inp[1], index), full_in,
                   tag=f"FULL match x{b} (shipped cfg)")

    # --- full match without cascade trim ---
    import dataclasses

    cfg_np = dataclasses.replace(
        cfg, match=dataclasses.replace(cfg.match, cascade_viable_prefix=0)
    )
    m_np = orb_matcher.jit_match_frames(hw, cfg_np)
    t_notrim = timed(lambda inp: m_np(inp[0], inp[1], index), full_in,
                     tag=f"FULL match x{b} (no cascade trim)")

    ms = lambda t: t * 1000 / b
    print("\nper-frame ms:", flush=True)
    print(f"  pyramid {ms(t_pyr):.2f}  FAST(batched) {ms(t_fb):.2f} "
          f"(was {ms(t_fs):.2f})  detect {ms(t_det):.2f}  "
          f"describe {ms(t_desc):.2f}  +table {ms(t_tab):.2f}")
    print(f"  FULL {ms(t_full):.2f}  no-trim {ms(t_notrim):.2f}", flush=True)


if __name__ == "__main__":
    main()
