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
import sys
import time

import numpy as np


def synthesize(n_slides: int, slide_hw, frame_hw, batch: int, seed: int = 0):
    import cv2

    rng = np.random.RandomState(seed)
    sh, sw = slide_hw
    slides = np.zeros((n_slides, sh, sw), np.uint8)
    for s in range(n_slides):
        img = np.full((sh, sw), 255, np.uint8)
        cv2.rectangle(img, (30, 20), (sw - 30, 80), 40, -1)
        cv2.putText(img, f"Slide {s}", (40, 65), cv2.FONT_HERSHEY_SIMPLEX, 1.4, 255, 3)
        for _ in range(45):
            y = rng.randint(110, max(sh - 60, 111))
            x = rng.randint(40, max(sw - 160, 41))
            w, h = rng.randint(40, 150), rng.randint(8, 22)
            cv2.rectangle(img, (x, y), (x + w, y + h), int(rng.randint(0, 130)), -1)
        for _ in range(6):
            y = rng.randint(140, max(sh - 40, 141))
            x = rng.randint(40, max(sw - 400, 41))
            cv2.putText(img, f"line {rng.randint(1000)} item {rng.randint(1000)}",
                        (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.9, int(rng.randint(0, 100)), 2)
        slides[s] = img
    fh, fw = frame_hw
    frames = np.zeros((batch, fh, fw), np.uint8)
    for b in range(batch):
        s = rng.randint(n_slides)
        m = cv2.getRotationMatrix2D((sw / 2, sh / 2), rng.uniform(-3, 3), rng.uniform(0.9, 1.0))
        m[:, 2] += [rng.uniform(-20, 20), rng.uniform(-15, 15)]
        f = cv2.warpAffine(slides[s], m, (fw, fh), borderValue=40)
        frames[b] = np.clip(
            f.astype(np.float32) + rng.randn(fh, fw) * 2, 0, 255
        ).astype(np.uint8)
    return slides, frames


def synthesize_realistic_frames(slides, frame_hw, batch: int, seed: int = 3):
    """Frames in the DOCUMENTED production keypoint regime (200-700 FAST
    keypoints; reference BACKGROUND.md:11) rather than the quota-saturating
    worst case `synthesize` produces. Calibrated against detect_pyramid's
    total valid-keypoint count: a mostly-empty page with a title and 1-2
    washed-out bullet lines, camera/projector-blurred (Gaussian sigma 1.65) —
    crisper or denser synthetic text regenerates corners at every pyramid
    level and overshoots the regime (1100-1550 total). Warped like the
    worst-case frames, so these exercise the same match program but take
    the Q=768 query bucket."""
    import cv2

    rng = np.random.RandomState(seed)
    fh, fw = frame_hw
    n_slides = slides.shape[0]
    sh, sw = slides.shape[1], slides.shape[2]
    frames = np.zeros((batch, fh, fw), np.uint8)
    for b in range(batch):
        img = np.full((sh, sw), 255, np.uint8)
        cv2.putText(img, f"Slide {rng.randint(n_slides)}", (40, 65),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.4, 140, 3)
        for i in range(rng.randint(1, 3)):
            y = 200 + 110 * i
            cv2.putText(img, f"bullet point {rng.randint(1000)}",
                        (60, y), cv2.FONT_HERSHEY_SIMPLEX, 1.0, 185, 2)
        img = cv2.GaussianBlur(img, (0, 0), 1.65)
        m = cv2.getRotationMatrix2D(
            (sw / 2, sh / 2), rng.uniform(-3, 3), rng.uniform(0.9, 1.0)
        )
        m[:, 2] += [rng.uniform(-20, 20), rng.uniform(-15, 15)]
        f = cv2.warpAffine(img, m, (fw, fh), borderValue=235)
        frames[b] = np.clip(
            f.astype(np.float32) + rng.randn(fh, fw) * 2, 0, 255
        ).astype(np.uint8)
    return frames


def make_video(path, slides, minutes: float, fps: float = 30.0, seed: int = 1):
    """Synthesize a lecture-style 1080p video: each slide shown ~20 s with
    slight affine motion + noise, occasional no-slide (noise) segments.

    XVID-in-AVI: the only available encoder here whose container carries a
    real frame index (cv2 seeks in ~3 ms, like real-world h264 lectures).
    mp4v-in-mp4 seeks by decoding from the file start — pathological, and
    unrepresentative of production inputs."""
    import cv2

    rng = np.random.RandomState(seed)
    h, w = slides.shape[1], slides.shape[2]
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"XVID"), fps, (w, h), isColor=False
    )
    total = int(minutes * 60 * fps)
    seg_len = int(20 * fps)
    # Noise bank: fresh 1080p gaussian noise per frame costs ~50 ms/frame of
    # host time (hours for a 1-h video on a 1-core rig); cycling 16 offset
    # slices of one precomputed plane keeps frames visually distinct to the
    # encoder at ~zero cost.
    bank = (rng.randn(h + 16, w + 16) * 1.5).astype(np.float32)
    noise_u8 = rng.randint(0, 255, (h + 16, w + 16), np.uint8)
    t = 0
    while t < total:
        if rng.rand() < 0.1:
            for _ in range(min(seg_len // 2, total - t)):
                o = t % 16
                vw.write(noise_u8[o : o + h, o : o + w])
                t += 1
            continue
        s = rng.randint(slides.shape[0])
        m = cv2.getRotationMatrix2D(
            (w / 2, h / 2), rng.uniform(-2, 2), rng.uniform(0.92, 1.0)
        )
        m[:, 2] += [rng.uniform(-15, 15), rng.uniform(-10, 10)]
        base = cv2.warpAffine(slides[s], m, (w, h), borderValue=40).astype(
            np.float32
        )
        for _ in range(min(seg_len, total - t)):
            o = t % 16
            frame = base + bank[o : o + h, o : o + w]
            vw.write(np.clip(frame, 0, 255).astype(np.uint8))
            t += 1
    vw.release()


def bench_pages(slides: np.ndarray, work, tag: str = "bench"):
    """Persist the synthetic deck as page PNGs once and wrap as PdfPage
    records so MatchingEngine's content-keyed index persistence engages
    (re-runs skip the slide index build entirely)."""
    import cv2

    from slideo_tpu.app.pipeline import PdfPage

    pages_dir = work / "pages"
    if not pages_dir.exists() or len(list(pages_dir.glob("p-*.png"))) != len(slides):
        pages_dir.mkdir(parents=True, exist_ok=True)
        for i in range(len(slides)):
            cv2.imwrite(str(pages_dir / f"p-{i+1}.png"), slides[i])
    return [
        PdfPage(work / "deck.pdf", tag + "0" * (64 - len(tag)),
                pages_dir / f"p-{i+1}.png", i + 1)
        for i in range(len(slides))
    ]


def _pipeline_load_breakdown():
    from slideo_tpu.app import pipeline

    return dict(pipeline.LAST_LOAD_BREAKDOWN) or None


def _pipeline_build_breakdown():
    from slideo_tpu.app import pipeline

    return dict(pipeline.LAST_BUILD_BREAKDOWN) or None


def _cached_inputs(args, slide_hw, frame_hw):
    """synthesize() output cached as .npy next to the bench deck (the cv2
    synthesis of 500 slides + 320 warped frames costs ~4 min of host time
    on a 1-core rig — pure re-run overhead)."""
    import tempfile
    from pathlib import Path

    n = args.batch * (args.iters + 1)
    work = Path(tempfile.gettempdir()) / (
        f"slideo-bench-deck-{args.slides}s-{slide_hw[0]}x{slide_hw[1]}"
    )
    work.mkdir(parents=True, exist_ok=True)
    fkey = work / f"frames-{frame_hw[0]}x{frame_hw[1]}-{n}.npy"
    skey = work / "slides.npy"
    if fkey.exists() and skey.exists():
        return np.load(skey), np.load(fkey)
    slides, frames = synthesize(args.slides, slide_hw, frame_hw, n)
    np.save(skey, slides)
    np.save(fkey, frames)
    return slides, frames


def run_e2e(args, cfg):
    """Wall-clock benchmark of the REAL pipeline on a synthetic lecture:
    decode -> dedup -> match -> results, exactly as `sync` drives it."""
    import tempfile
    from pathlib import Path

    import jax

    from slideo_tpu.app.pipeline import MatchingEngine
    from slideo_tpu.io.video import open_video_info

    slide_hw = tuple(args.slide_hw)
    slides, _ = synthesize(args.slides, slide_hw, slide_hw, 0)
    work = Path(tempfile.gettempdir()) / (
        f"slideo-bench-e2e-{args.slides}s-{args.video_min}m-"
        f"{slide_hw[0]}x{slide_hw[1]}"
    )
    work.mkdir(parents=True, exist_ok=True)
    video = work / "lecture.avi"
    if not video.exists():
        t0 = time.time()
        make_video(video, slides, args.video_min)
        print(f"synthesized {args.video_min} min video in {time.time()-t0:.0f}s",
              file=sys.stderr)
    pages = bench_pages(slides, work, tag="e2e")
    t0 = time.time()
    engine = MatchingEngine(cfg, pages)
    t_index = time.time() - t0

    from slideo_tpu.utils.trace import StageTracer

    tracer = StageTracer(enabled=True)
    info = open_video_info(video)
    t0 = time.time()
    matchings = engine.match_video(video, tracer=tracer)
    t_video = time.time() - t0
    sampled = info.frames_to_process(cfg.video.interval_s)
    video_s = info.total_time_s
    matched = sum(1 for m in matchings if m.page is not None)
    result = {
        "metric": "e2e wall-clock sampled frames/s (decode+dedup+match)",
        "value": round(sampled / t_video, 2),
        "unit": "frames/s",
        "vs_baseline": round((video_s / t_video) * 60 / 3600, 4),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "video_min": round(video_s / 60, 2),
                "wall_s": round(t_video, 1),
                "speedup_vs_realtime": round(video_s / t_video, 1),
                "projected_1h_video_s": round(3600 / (video_s / t_video), 1),
                "index_build_s": round(t_index, 2),
                "sampled_frames": sampled,
                "timeline_rows": len(matchings),
                "matched_rows": matched,
                "decode_mode": cfg.video.decode_mode,
                "stage_s": {
                    k: round(v["total_s"], 2)
                    for k, v in tracer.as_dict().items()
                },
                "nproc": __import__("os").cpu_count(),
                "device": str(jax.devices()[0]),
            }
        ),
        file=sys.stderr,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=500)
    # Default = the SHIPPED config's batch size (VideoConfig.batch_size), so
    # the driver metric measures the production configuration. Large batches
    # amortize this runtime's ~30 ms dispatch+fetch floor; the streaming
    # pipeline keeps batches in flight, so chip throughput is the honest
    # metric (see tools/profile_floor.py).
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--slide-hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument("--platform", default=None, help="jax platform override")
    ap.add_argument("--e2e", action="store_true",
                    help="wall-clock pipeline benchmark on a synthetic lecture")
    ap.add_argument("--video-min", type=float, default=10.0,
                    help="synthetic video length for --e2e (minutes)")
    ap.add_argument("--decode-mode", choices=["grab", "chunk", "seek"], default=None)
    ap.add_argument("--engine", choices=["orb", "sift"], default="orb")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from slideo_tpu.config import DEFAULT_CONFIG
    from slideo_tpu.models import orb_matcher
    from slideo_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()

    import dataclasses

    cfg = DEFAULT_CONFIG
    if args.engine != "orb":
        cfg = dataclasses.replace(cfg, engine=args.engine)
    if args.batch is None:
        args.batch = cfg.video.batch_size
    if args.decode_mode:
        cfg = dataclasses.replace(
            cfg, video=dataclasses.replace(cfg.video, decode_mode=args.decode_mode)
        )
    if args.e2e:
        return run_e2e(args, cfg)
    slide_hw = tuple(args.slide_hw)
    frame_hw = tuple(args.frame_hw)
    # One distinct batch per timed iteration: the remote runtime caches
    # identical executions, so re-running the same arrays measures nothing.
    # Synthesis costs minutes on a 1-core host — cache the arrays on disk.
    slides, frames = _cached_inputs(args, slide_hw, frame_hw)

    # Build (or reload) the slide index through MatchingEngine so the
    # content-keyed index persistence and the jax persistent compile cache
    # both engage — warm re-runs skip the ~40 s build + ~20 s first compile.
    import tempfile
    from pathlib import Path

    from slideo_tpu.app.pipeline import MatchingEngine, _index_cache_key
    from slideo_tpu.app.hashing import get_temp_path_key

    work = Path(tempfile.gettempdir()) / (
        f"slideo-bench-deck-{args.slides}s-{slide_hw[0]}x{slide_hw[1]}"
    )
    pages = bench_pages(slides, work)
    index_warm = (
        get_temp_path_key("index", _index_cache_key(pages, cfg)) / "index.npz"
    ).exists()
    t0 = time.time()
    engine = MatchingEngine(cfg, pages)
    index = engine.index
    t_index = time.time() - t0

    if args.engine == "sift":
        from functools import partial

        from slideo_tpu.models import sift_matcher

        match = jax.jit(
            partial(sift_matcher.match_frames_sift, slide_hw=slide_hw, cfg=cfg)
        )
    else:
        match = orb_matcher.jit_match_frames(slide_hw, cfg)
    batches = [
        jnp.asarray(frames[i * args.batch : (i + 1) * args.batch])
        for i in range(args.iters + 1)
    ]
    seeds = [
        jnp.arange(i * args.batch, (i + 1) * args.batch, dtype=jnp.int32)
        for i in range(args.iters + 1)
    ]

    # Warmup / compile, split into trace+lower (host Python, no cache can
    # help) vs backend compile (what jax_compilation_cache_dir may skip) vs
    # first execution.
    t0 = time.time()
    lowered = match.lower(batches[0], seeds[0], index)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_backend = time.time() - t0
    t0 = time.time()
    out = compiled(batches[0], seeds[0], index)
    np.asarray(out.slide)
    t_first_exec = time.time() - t0
    t_compile = t_lower + t_backend + t_first_exec
    matched = int((np.asarray(out.slide) >= 0).sum())

    # Timing mirrors the production pipeline (app/pipeline.py
    # resolve_inflight(keep=1)): one batch stays in flight so the ~45 ms
    # dispatch+fetch tunnel roundtrip overlaps the next batch's compute,
    # and only `slide` is fetched — exactly what match_video consumes.
    # Every timed iteration runs a DISTINCT batch (the remote runtime
    # caches identical executions, which would measure nothing).
    times = []
    inflight = compiled(batches[1], seeds[1], index)
    for i in range(2, args.iters + 1):
        t0 = time.time()
        nxt = compiled(batches[i], seeds[i], index)
        np.asarray(inflight.slide)  # host fetch: block_until_ready does
        inflight = nxt              # not reliably wait on this runtime
        times.append(time.time() - t0)
    np.asarray(inflight.slide)
    best = min(times)
    fps = args.batch / best

    # Second regime: the DOCUMENTED production content (200-700 keypoints
    # per frame, reference BACKGROUND.md:11) — the driver metric stays the
    # quota-saturating worst case above; this records what a real lecture
    # costs (the Q=768 query bucket engages). Same compiled program.
    realistic = synthesize_realistic_frames(
        slides, frame_hw, args.batch * (args.iters + 1)
    )
    rbatches = [
        jnp.asarray(realistic[i * args.batch : (i + 1) * args.batch])
        for i in range(args.iters + 1)
    ]
    rtimes = []
    inflight = compiled(rbatches[0], seeds[0], index)
    for i in range(1, args.iters + 1):
        t0 = time.time()
        nxt = compiled(rbatches[i], seeds[i], index)
        np.asarray(inflight.slide)
        inflight = nxt
        rtimes.append(time.time() - t0)
    np.asarray(inflight.slide)
    fps_realistic = args.batch / min(rtimes)

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
                "index_source": "warm" if index_warm else "cold",
                "first_call_s": round(t_compile, 2),
                "trace_lower_s": round(t_lower, 2),
                "backend_compile_s": round(t_backend, 2),
                "first_exec_s": round(t_first_exec, 2),
                "index_load": _pipeline_load_breakdown(),
                "index_build": _pipeline_build_breakdown(),
                "times_s": [round(t, 4) for t in times],
                "fps_realistic_content": round(fps_realistic, 2),
                # Formal re-scope (NOTES.md "Per-chip ceiling"): exact-parity
                # ORB at 1080p worst-case content has a derived 450-550
                # fps/chip speed-of-light on v5e; the 2000 fps baseline
                # target is below the FAST+pyramid inherent cost alone and
                # is not reachable for this algorithm/fidelity contract on
                # this chip. Cheap-detection (2x-decimated FAST sweep) was
                # chip-measured and DELETED (r4 NOTES): 44/128 assignment
                # diffs on worst-case content and truth recall 67->35/128
                # on a sparse lecture deck, for only a 12% speedup.
                "exact_parity_ceiling_fps": [450, 550],
                "matched_in_batch": matched,
                "batch": args.batch,
                "device": str(jax.devices()[0]),
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
