"""A/B the full match path under config variants in ONE process/session.

Builds the slide index once, then times jit_match_frames for each variant
over distinct input batches (remote runtime caches identical executions).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
      python3 tools/bench_config_ab.py --slides 500 --batch 64
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--variants", default="shipped,notrim,nofront,neither")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from bench import synthesize
    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg0 = DEFAULT_CONFIG
    hw = (1080, 1920)
    b = args.batch
    slides, frames = synthesize(args.slides, hw, hw, b * (args.iters + 1))
    print(f"slides={args.slides} batch={b} device={jax.devices()[0]}", flush=True)

    t0 = time.time()
    index = orb_matcher.build_slide_index_chunked(slides, cfg0)
    jax.block_until_ready(index.desc_index)
    print(f"index build: {time.time() - t0:.1f}s", flush=True)

    batches = [
        jnp.asarray(frames[i * b : (i + 1) * b]) for i in range(args.iters + 1)
    ]
    seeds = [
        jnp.arange(i * b, (i + 1) * b, dtype=jnp.int32)
        for i in range(args.iters + 1)
    ]

    def variant(name: str):
        cfg = cfg0
        if name in ("notrim", "neither"):
            cfg = dataclasses.replace(
                cfg, match=dataclasses.replace(cfg.match, cascade_viable_prefix=0)
            )
        # Kernel variants, composable ("polsplit+c512+f32atlas" = the old
        # round-3 shipped config; bare names toggle against the defaults).
        orb_kw = {}
        if "bf16atlas" in name:
            orb_kw["atlas_bf16"] = True
        if "c640" in name:
            orb_kw["fast_chunk_w"] = 640
        if "c512" in name:
            orb_kw["fast_chunk_w"] = 512
        if "polfused" in name:
            orb_kw["fast_polarity_fused"] = True
        if "polsplit" in name:
            orb_kw["fast_polarity_fused"] = False
        if "f32atlas" in name:
            orb_kw["atlas_bf16"] = False
        if "minfirst" in name:
            orb_kw["fast_min_first"] = True
        if orb_kw:
            cfg = dataclasses.replace(
                cfg, orb=dataclasses.replace(cfg.orb, **orb_kw)
            )
        if "prevote" in name:
            cfg = dataclasses.replace(
                cfg, match=dataclasses.replace(cfg.match, screen_prevote=True)
            )
        return cfg

    for name in args.variants.split(","):
        cfg = variant(name)
        match = orb_matcher.jit_match_frames(hw, cfg)
        t0 = time.time()
        out = match(batches[0], seeds[0], index)
        np.asarray(out.slide)
        t_compile = time.time() - t0
        times = []
        for i in range(1, args.iters + 1):
            t0 = time.time()
            out_i = match(batches[i], seeds[i], index)
            np.asarray(out_i.slide)
            np.asarray(out_i.similarity)
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{name:10s} compile {t_compile:6.1f}s  best {best*1000:8.1f} ms "
            f"({b/best:7.1f} fps, {best*1000/b:5.2f} ms/frame)  "
            f"times {[round(t*1000) for t in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
