"""Host-side video decoding: frame sampling, batching, parallel chunk decode.

Replaces crates/matching-opencv/src/video_capture.rs: open the video, report
total frames / total time, and yield one decoded frame per sampling interval
(grab every frame header, decode only frames where
``frame_idx % floor(fps*interval) < 1.0`` — video_capture.rs:52).

Decode modes:
- "grab": reference-exact sequential grab/retrieve loop.
- "chunk": segmented parallel grab — N workers, each seeks once to its
  contiguous segment then grabs forward. Same sampled frames as "grab",
  ~workers-x faster on the decode-bound path. The throughput mode for long
  videos (decode is the host-side bottleneck; see SURVEY.md §7).
- "seek": jump directly to each sampled frame index in worker threads.
  Fast only on codecs with dense keyframes; long-GOP files degrade badly
  (every seek re-decodes from a keyframe).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from pathlib import Path
from queue import Queue
from typing import Iterator

import cv2
import numpy as np

__all__ = ["VideoInfo", "SampledFrame", "open_video_info", "sampled_frames"]


@dataclass(frozen=True)
class VideoInfo:
    path: Path
    fps: float
    total_frames: int
    width: int
    height: int

    @property
    def total_time_s(self) -> float:
        return self.total_frames / self.fps if self.fps > 0 else 0.0

    def frames_to_process(self, interval_s: float) -> int:
        return int(self.total_time_s / interval_s)

    def sample_stride(self, interval_s: float) -> int:
        """floor(fps * interval): a frame is sampled iff idx % stride == 0."""
        return max(int(self.fps * interval_s), 1)


@dataclass
class SampledFrame:
    """One decoded sampled frame. gray is [H, W] uint8 (OpenCV BGR weights).

    uint8 matches the reference's Mats and keeps host->device transfers 4x
    smaller than float32; device programs cast on entry.
    """

    gray: np.ndarray
    time_s: float
    frame_idx: int


def open_video_info(path: Path) -> VideoInfo:
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"Could not open video '{path}'")
    info = VideoInfo(
        path=Path(path),
        fps=cap.get(cv2.CAP_PROP_FPS) or 0.0,
        total_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
    )
    cap.release()
    return info


def _to_gray(frame: np.ndarray) -> np.ndarray:
    if frame.ndim == 3:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    return np.ascontiguousarray(frame)


def _sampled_frames_grab(
    path: Path, interval_s: float, start_after_frame: int = -1
) -> Iterator[SampledFrame]:
    """Reference-exact loop (video_capture.rs:39-58): grab every frame,
    retrieve one per interval. start_after_frame skips (seeks past) all
    frames <= that index — the checkpoint/resume path."""
    cap = cv2.VideoCapture(str(path))
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    stride = max(int(fps * interval_s), 1)
    if start_after_frame >= 0:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start_after_frame + 1)
    try:
        while True:
            frame_idx = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
            if not cap.grab():
                return
            if frame_idx % stride == 0 and frame_idx > start_after_frame:
                ok, frame = cap.retrieve()
                if not ok:
                    return
                yield SampledFrame(_to_gray(frame), frame_idx / fps, frame_idx)
    finally:
        cap.release()


# Per-worker in-flight frame cap in "seek" mode. Total buffered memory is
# bounded by workers * _SEEK_QUEUE_DEPTH frames (~2 MB each at 1080p), no
# matter how long the video is.
_SEEK_QUEUE_DEPTH = 8


def _sampled_frames_seek(
    path: Path, interval_s: float, workers: int, start_after_frame: int = -1
) -> Iterator[SampledFrame]:
    """Seek straight to sampled indices, decoding in parallel threads (cv2
    releases the GIL inside ffmpeg) and STREAMING frames in order.

    Indices are dealt round-robin to workers; each worker feeds its own
    bounded queue and the consumer pops queues in index order, so frames
    stream with bounded memory (a 30 h video never buffers more than
    workers * depth frames) and decode overlaps downstream device work.
    """
    info = open_video_info(path)
    stride = info.sample_stride(interval_s)
    indices = [
        i for i in range(0, info.total_frames, stride) if i > start_after_frame
    ]
    if not indices:
        return
    workers = max(1, min(workers, len(indices)))
    queues = [Queue(maxsize=_SEEK_QUEUE_DEPTH) for _ in range(workers)]
    stop = threading.Event()

    def work(w: int) -> None:
        cap = cv2.VideoCapture(str(path))
        try:
            for idx in indices[w::workers]:
                if stop.is_set():
                    return
                cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
                ok, frame = cap.read()
                item = (
                    SampledFrame(_to_gray(frame), idx / info.fps, idx)
                    if ok
                    else None
                )
                while not stop.is_set():
                    try:
                        queues[w].put(item, timeout=0.1)
                        break
                    except Exception:
                        continue
                if item is None or stop.is_set():
                    return
        finally:
            cap.release()

    threads = [
        threading.Thread(target=work, args=(w,), daemon=True)
        for w in range(workers)
    ]
    for t in threads:
        t.start()
    try:
        for i in range(len(indices)):
            item = queues[i % workers].get()
            if item is None:  # decode failure: treat as end of stream
                return
            yield item
    finally:
        stop.set()


_CHUNK_QUEUE_DEPTH = 32


def _sampled_frames_chunk(
    path: Path, interval_s: float, workers: int, start_after_frame: int = -1
) -> Iterator[SampledFrame]:
    """Segmented sequential decode: each worker seeks ONCE to its contiguous
    segment of the video, then grab/retrieves forward like the reference
    loop. One seek per worker instead of one per sampled frame — per-sample
    seeking ("seek" mode) degrades badly on long-GOP codecs where every
    seek re-decodes from a distant keyframe.

    Yields exactly the same sampled indices as "grab" mode, in order, with
    memory bounded by workers * _CHUNK_QUEUE_DEPTH frames.
    """
    info = open_video_info(path)
    stride = info.sample_stride(interval_s)
    indices = [
        i for i in range(0, info.total_frames, stride) if i > start_after_frame
    ]
    if not indices:
        return
    workers = max(1, min(workers, len(indices)))
    per = -(-len(indices) // workers)
    segments = [indices[w * per:(w + 1) * per] for w in range(workers)]
    segments = [s for s in segments if s]
    queues = [Queue(maxsize=_CHUNK_QUEUE_DEPTH) for _ in segments]
    stop = threading.Event()

    def work(w: int) -> None:
        seg = segments[w]
        cap = cv2.VideoCapture(str(path))
        try:
            if seg[0] > 0:
                cap.set(cv2.CAP_PROP_POS_FRAMES, seg[0])
            pos = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
            if pos > seg[0] or pos < 0:
                # Seek overshot or position reporting is unreliable (VFR /
                # broken index): the grab loop below only corrects
                # undershoot, so a silent overshoot would yield frames with
                # wrong indices. Fall back to sequential grab from 0 for
                # this segment — slow but byte-identical to "grab" mode.
                cap.release()
                cap = cv2.VideoCapture(str(path))
                pos = 0
            target = 0
            while target < len(seg) and not stop.is_set():
                idx = seg[target]
                if pos < idx:
                    if not cap.grab():
                        break
                    pos += 1
                    continue
                ok, frame = cap.read()
                pos += 1
                item = (
                    SampledFrame(_to_gray(frame), idx / info.fps, idx)
                    if ok else None
                )
                target += 1
                while not stop.is_set():
                    try:
                        queues[w].put(item, timeout=0.1)
                        break
                    except Exception:
                        continue
                if item is None:
                    return
            if target < len(seg):  # ran out of frames: signal end
                while not stop.is_set():
                    try:
                        queues[w].put(None, timeout=0.1)
                        break
                    except Exception:
                        continue
        finally:
            cap.release()

    threads = [
        threading.Thread(target=work, args=(w,), daemon=True)
        for w in range(len(segments))
    ]
    for t in threads:
        t.start()
    try:
        for w, seg in enumerate(segments):
            for _ in seg:
                item = queues[w].get()
                if item is None:
                    return
                yield item
    finally:
        stop.set()


def _prefetched(it: Iterator[SampledFrame], depth: int = 16) -> Iterator[SampledFrame]:
    """Run an iterator in a background thread with a bounded queue, so host
    decode overlaps the consumer's device work (double-buffering)."""
    q: Queue = Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def work() -> None:
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except Exception:
                        continue
                if stop.is_set():
                    return
        finally:
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except Exception:
                    continue

    t = threading.Thread(target=work, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            yield item
    finally:
        stop.set()


def sampled_frames(
    path: Path,
    interval_s: float = 5.0,
    mode: str = "grab",
    workers: int = 4,
    start_after_frame: int = -1,
    prefetch: bool = True,
) -> Iterator[SampledFrame]:
    if mode == "seek":
        return _sampled_frames_seek(path, interval_s, workers, start_after_frame)
    if mode == "chunk":
        return _sampled_frames_chunk(path, interval_s, workers, start_after_frame)
    it = _sampled_frames_grab(path, interval_s, start_after_frame)
    return _prefetched(it) if prefetch else it
