"""Investigate exact-vs-screened assignment diffs at bench scale.

Reproduces tools/ab_screen.py's frame set WITH ground truth (re-derives the
slide shown in each synthetic frame from bench.synthesize's RNG sequence),
reruns both paths, and prints every differing frame's truth / exact /
screened assignment with similarity+rating from both paths.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python3 tools/debug_ab_diff.py
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def frame_truth(n_slides, slide_hw, frame_hw, batch, seed=0):
    """The slide index shown in each frame of bench.synthesize's output
    (mirrors its RNG consumption exactly; see bench.py:synthesize)."""
    rng = np.random.RandomState(seed)
    sh, sw = slide_hw
    for s in range(n_slides):
        for _ in range(45):
            rng.randint(110, max(sh - 60, 111))
            rng.randint(40, max(sw - 160, 41))
            rng.randint(40, 150), rng.randint(8, 22)
            rng.randint(0, 130)
        for _ in range(6):
            rng.randint(140, max(sh - 40, 141))
            rng.randint(40, max(sw - 400, 41))
            rng.randint(1000), rng.randint(1000)
            rng.randint(0, 100)
    fh, fw = frame_hw
    truth = []
    for b in range(batch):
        s = rng.randint(n_slides)
        truth.append(s)
        rng.uniform(-3, 3), rng.uniform(0.9, 1.0)
        rng.uniform(-20, 20), rng.uniform(-15, 15)
        rng.randn(fh, fw)
    return truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--frames", type=int, default=144)
    ap.add_argument("--batch", type=int, default=48)
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
    slides, frames = synthesize(args.slides, hw, hw, args.frames)
    truth = frame_truth(args.slides, hw, hw, args.frames)

    cfg0 = DEFAULT_CONFIG
    index = orb_matcher.build_slide_index_chunked(slides, cfg0)

    def run(cfg):
        match = orb_matcher.jit_match_frames(hw, cfg)
        outs = []
        for lo in range(0, args.frames, args.batch):
            fr = jnp.asarray(frames[lo:lo + args.batch])
            seeds = jnp.arange(lo, lo + args.batch, dtype=jnp.int32)
            out = match(fr, seeds, index)
            outs.append(jax.tree.map(np.asarray, out))
        return jax.tree.map(lambda *x: np.concatenate(x), *outs)

    exact_cfg = dataclasses.replace(
        cfg0, match=dataclasses.replace(cfg0.match, screen_above_slides=100000)
    )
    ex = run(exact_cfg)
    sc = run(cfg0)

    diffs = np.nonzero(ex.slide != sc.slide)[0]
    print(f"diffs: {len(diffs)}/{args.frames}", flush=True)
    for i in diffs:
        print(f"  frame {i}: truth={truth[i]} "
              f"exact=(slide {ex.slide[i]}, sim {ex.similarity[i]:.4f}, "
              f"rating {ex.rating[i]:.0f}) "
              f"screened=(slide {sc.slide[i]}, sim {sc.similarity[i]:.4f}, "
              f"rating {sc.rating[i]:.0f})", flush=True)
    n_correct_ex = int((ex.slide == np.asarray(truth)).sum())
    n_correct_sc = int((sc.slide == np.asarray(truth)).sum())
    print(f"truth agreement: exact {n_correct_ex}/{args.frames}, "
          f"screened {n_correct_sc}/{args.frames}", flush=True)


if __name__ == "__main__":
    main()
