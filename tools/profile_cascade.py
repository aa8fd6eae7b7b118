"""Isolate cascade stage costs by toggling config knobs (TPU dev tool).

Times the full match program under variants (fewer RANSAC hypotheses,
coarser verify stride, smaller match cap, no screening) — differences
against the baseline attribute cost to each stage. One dispatch per timing
(batch amortizes the ~40 ms dispatch floor; see profile_floor.py).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synthesize
    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    hw = (1080, 1920)
    B = args.batch
    slides, frames = synthesize(args.slides, hw, hw, B * (args.iters + 1))
    cfg0 = DEFAULT_CONFIG

    index = orb_matcher.build_slide_index_chunked(slides, cfg0)
    batches = [jnp.asarray(frames[i * B : (i + 1) * B]) for i in range(args.iters + 1)]
    seeds = [jnp.arange(i * B, (i + 1) * B, dtype=jnp.int32) for i in range(args.iters + 1)]

    def variant(name, **match_overrides):
        cfg = dataclasses.replace(
            cfg0, match=dataclasses.replace(cfg0.match, **match_overrides)
        )
        fn = jax.jit(lambda f, s, i: orb_matcher.match_frames(f, s, i, hw, cfg).slide)
        t0 = time.time()
        out0 = np.asarray(fn(batches[0], seeds[0], index))
        tc = time.time() - t0
        times = []
        for i in range(1, args.iters + 1):
            t0 = time.time()
            np.asarray(fn(batches[i], seeds[i], index))
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{name:28s} {best/B*1000:7.2f} ms/frame  matched={int((out0>=0).sum())}/{B}"
            f"  (compile {tc:.0f}s)",
            flush=True,
        )
        return best / B * 1000

    base = variant("baseline")
    variant("ransac_iters=512", ransac_iters=512)
    variant("ransac_iters=128", ransac_iters=128)
    variant("verify_stride=4", verify_stride=4)
    variant("max_matches=128", max_matches_per_slide=128)
    variant("top_slides=16", top_slides=16)
    variant("screen_queries=256", screen_queries=256)
    variant("screen_slides=32", screen_slides=32)
    variant("no-screen (exact)", screen_above_slides=10000)


if __name__ == "__main__":
    main()
