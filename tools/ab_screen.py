"""Exact-vs-screened assignment A/B at bench scale + per-config table timing.

For each screening config: match the same frames with (a) the exact table
over all slides (screening disabled) and (b) the screened path, compare
assignments, and time the screened match. This is the fidelity gate for
tightening MatchConfig.screen_* (VERDICT weak #5 / next #7).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python3 tools/ab_screen.py
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--platform", default=None)
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
    hw = (1080, 1920)
    n_in = args.batch * (args.iters + 1)
    slides, frames = synthesize(args.slides, hw, hw, n_in)

    cfg0 = DEFAULT_CONFIG
    t0 = time.time()
    index = orb_matcher.build_slide_index_chunked(slides, cfg0)
    print(f"index build: {time.time()-t0:.1f}s", flush=True)

    def run(cfg, tag):
        # Timing mirrors bench.py: one batch kept in flight so the remote
        # dispatch+fetch floor overlaps compute (per-call fetch timing
        # measured 5-10x noise here).
        match = orb_matcher.jit_match_frames(hw, cfg)
        batches = [
            (jnp.asarray(frames[i * args.batch:(i + 1) * args.batch]),
             jnp.arange(i * args.batch, (i + 1) * args.batch,
                        dtype=jnp.int32))
            for i in range(args.iters + 1)
        ]
        outs = [np.asarray(match(*batches[0], index).slide)]
        times = []
        inflight = match(*batches[1], index)
        for i in range(2, args.iters + 1):
            t0 = time.time()
            nxt = match(*batches[i], index)
            outs.append(np.asarray(inflight.slide))
            inflight = nxt
            times.append(time.time() - t0)
        outs.append(np.asarray(inflight.slide))
        ms = (min(times) * 1000 / args.batch) if times else float("nan")
        print(f"{tag:40s} {ms:6.2f} ms/frame", flush=True)
        return np.concatenate(outs), ms

    exact_cfg = dataclasses.replace(
        cfg0, match=dataclasses.replace(cfg0.match, screen_above_slides=100000)
    )
    exact, _ = run(exact_cfg, "exact (no screening)")

    configs = [
        dict(screen_slides=16, screen_queries=256, screen_bits=128,
             screen_k_per_slide=2048),  # shipped: batched FULL-K voting (r3)
        dict(screen_slides=16, screen_queries=128, screen_bits=128,
             screen_k_per_slide=2048),
    ]
    for kw in configs:
        cfg = dataclasses.replace(
            cfg0, match=dataclasses.replace(cfg0.match, **kw)
        )
        tag = f"screened s={kw['screen_slides']} q={kw['screen_queries']} b={kw['screen_bits']}"
        got, ms = run(cfg, tag)
        diff = int((got != exact).sum())
        print(f"    assignment diffs vs exact: {diff}/{len(exact)}", flush=True)


if __name__ == "__main__":
    main()
