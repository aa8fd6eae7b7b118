"""Check the valid-keypoint counts of bench.synthesize_realistic_frames.

The Q=768 query bucket only engages when a frame's total valid detections
(jnp.sum(kps.valid), orb_matcher._match_detected) stay below 768; the
documented production regime is 200-700 (reference BACKGROUND.md:11). If
the "realistic" generator overshoots, fps_realistic_content silently
measures the worst-case Q=2048 program twice.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python3 tools/check_realistic_counts.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import synthesize, synthesize_realistic_frames
from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.ops import features as F
from slideo_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG.orb
    hw = (1080, 1920)
    slides, worst = synthesize(4, hw, hw, 8)
    real = synthesize_realistic_frames(slides, hw, 8)
    meta = F.pyramid_meta(*hw, cfg)

    @jax.jit
    def counts(frames):
        def one(im):
            kps = F.detect_pyramid(F.build_pyramid(im, cfg), meta, cfg)
            return jnp.sum(kps.valid)
        return jax.lax.map(one, frames)

    for name, fr in (("worst", worst), ("realistic", real)):
        c = np.asarray(counts(jnp.asarray(fr, jnp.float32)))
        print(f"{name}: counts={c.tolist()}", flush=True)


if __name__ == "__main__":
    main()
