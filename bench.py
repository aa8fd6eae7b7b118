"""Benchmark: matched frames/sec/chip at 1080p (driver contract).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 2000 matched frames/sec/chip at 1080p
against a 500-slide deck on TPU v5e.

Measures the full device match path per frame — ORB-style feature
extraction on the 1080p frame, Hamming kNN against the 500-slide descriptor
index (with large-deck screening), candidate selection, vectorized RANSAC,
and warped-thumbnail verification — on synthetic but realistic inputs
(text-like slides, affine-perturbed frames). Host decode is excluded: the
metric is chip throughput (frames are device-resident, as in the streaming
pipeline where transfers overlap compute).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synthesize(n_slides: int, slide_hw, frame_hw, batch: int, seed: int = 0):
    import cv2

    rng = np.random.RandomState(seed)
    sh, sw = slide_hw
    slides = np.zeros((n_slides, sh, sw), np.float32)
    for s in range(n_slides):
        img = np.full((sh, sw), 255, np.uint8)
        cv2.rectangle(img, (30, 20), (sw - 30, 80), 40, -1)
        cv2.putText(img, f"Slide {s}", (40, 65), cv2.FONT_HERSHEY_SIMPLEX, 1.4, 255, 3)
        for _ in range(45):
            y, x = rng.randint(110, sh - 60), rng.randint(40, sw - 160)
            w, h = rng.randint(40, 150), rng.randint(8, 22)
            cv2.rectangle(img, (x, y), (x + w, y + h), int(rng.randint(0, 130)), -1)
        for _ in range(6):
            y, x = rng.randint(140, sh - 40), rng.randint(40, sw - 400)
            cv2.putText(img, f"line {rng.randint(1000)} item {rng.randint(1000)}",
                        (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.9, int(rng.randint(0, 100)), 2)
        slides[s] = img
    fh, fw = frame_hw
    frames = np.zeros((batch, fh, fw), np.float32)
    for b in range(batch):
        s = rng.randint(n_slides)
        m = cv2.getRotationMatrix2D((sw / 2, sh / 2), rng.uniform(-3, 3), rng.uniform(0.9, 1.0))
        m[:, 2] += [rng.uniform(-20, 20), rng.uniform(-15, 15)]
        f = cv2.warpAffine(slides[s], m, (fw, fh), borderValue=40)
        frames[b] = f + rng.randn(fh, fw) * 2
    return slides, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--slide-hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--platform", default=None, help="jax platform override")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher

    cfg = DEFAULT_CONFIG
    slide_hw = tuple(args.slide_hw)
    frame_hw = tuple(args.frame_hw)
    # One distinct batch per timed iteration: the remote runtime caches
    # identical executions, so re-running the same arrays measures nothing.
    slides, frames = synthesize(
        args.slides, slide_hw, frame_hw, args.batch * (args.iters + 1)
    )

    t0 = time.time()
    build = jax.jit(lambda s: orb_matcher.build_slide_index(s, cfg))
    index = jax.block_until_ready(build(jnp.asarray(slides)))
    t_index = time.time() - t0

    match = orb_matcher.jit_match_frames(slide_hw, cfg)
    batches = [
        jnp.asarray(frames[i * args.batch : (i + 1) * args.batch])
        for i in range(args.iters + 1)
    ]
    seeds = [
        jnp.arange(i * args.batch, (i + 1) * args.batch, dtype=jnp.int32)
        for i in range(args.iters + 1)
    ]

    # Warmup / compile.
    t0 = time.time()
    out = jax.block_until_ready(match(batches[0], seeds[0], index))
    t_compile = time.time() - t0
    matched = int((np.asarray(out.slide) >= 0).sum())

    times = []
    for i in range(1, args.iters + 1):
        t0 = time.time()
        out_i = match(batches[i], seeds[i], index)
        np.asarray(out_i.slide)  # host fetch: block_until_ready does not
        np.asarray(out_i.similarity)  # reliably wait on this remote runtime
        times.append(time.time() - t0)
    best = min(times)
    fps = args.batch / best

    result = {
        "metric": "matched frames/sec/chip at 1080p (500-slide deck)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2000.0, 4),
    }
    print(json.dumps(result))
    # diagnostics on stderr-ish second line (driver reads line 1)
    import sys

    print(
        json.dumps(
            {
                "index_build_s": round(t_index, 2),
                "first_call_s": round(t_compile, 2),
                "times_s": [round(t, 4) for t in times],
                "matched_in_batch": matched,
                "batch": args.batch,
                "device": str(jax.devices()[0]),
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
