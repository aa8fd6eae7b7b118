"""End-to-end sync pipeline: PDFs + videos -> (video_ms -> page) timelines.

This is the orchestration layer of the reference's ``main()``
(crates/app/src/main.rs:40-103) and the video matcher task driver
(crates/matching-opencv/src/lib.rs:140-246), re-built around a device-resident
matching engine:

  * slide pages are letterboxed into one [S, H, W] batch and preprocessed on
    device in a single program (features + descriptor index + thumbnails);
  * sampled video frames stream through in fixed-size batches: a device dedup
    kernel computes thumbnails + changed flags, then only changed frames run
    the full match program (the reference skips unchanged frames the same
    way, lib.rs:205-209);
  * results keep the reference's exact output contract: a sentinel
    no-match record at total_time (lib.rs:182-189), sort by time, drop
    consecutive duplicates (lib.rs:229-244).
"""

from __future__ import annotations

import random
import string
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlideoConfig
from ..models import orb_matcher
from ..ops import image as image_ops
from .db import Db, PdfExtractedPagesDir
from ..utils.trace import StageTracer
from .hashing import get_temp_path_key
from .progress import ProgressReporter, null_reporter
from ..io import pdf as pdf_io
from ..io.video import open_video_info, sampled_frames

__all__ = ["PdfPage", "Matching", "pdfs_to_images", "MatchingEngine", "sync"]


@dataclass(frozen=True)
class PdfPage:
    """One rasterized page (reference: pdf_to_images.rs:18-31)."""

    pdf_path: Path
    pdf_hash: str
    image_path: Path
    page_nr: int  # 1-based


@dataclass
class Matching:
    """Result record (reference: crates/matching/src/lib.rs:35-40)."""

    video_ms: int
    video_frame_idx: int
    page: PdfPage | None


def pdfs_to_images(
    pdfs: list[tuple[Path, str]],
    db: Db,
    reporter: ProgressReporter = null_reporter,
) -> list[PdfPage]:
    """Rasterize PDFs with the two-phase extraction cache
    (reference: pdf_to_images.rs:33-111).

    pdfs: (path, content_hash) pairs. Reuses a recorded extraction dir iff
    finished=true; otherwise records finished=false, extracts into a fresh
    random temp dir, then marks finished=true.
    """
    pages: list[PdfPage] = []
    for pdf_path, pdf_hash in pdfs:
        cached = db.get_pdf_extracted_pages_dir(pdf_hash)
        if cached is not None and cached.finished and cached.dir.exists():
            target = cached.dir
        else:
            if not pdf_io.have_poppler():
                raise RuntimeError(
                    "poppler (pdftocairo/pdfinfo) not found on PATH and no "
                    f"finished extraction cached for {pdf_path}"
                )
            info = pdf_io.pdf_info(pdf_path)
            rand = "".join(random.choices(string.ascii_lowercase, k=8))
            target = get_temp_path_key("pdf", f"{pdf_hash}-{rand}")
            target.mkdir(parents=True, exist_ok=True)
            db.set_pdf_extracted_pages_dir(
                PdfExtractedPagesDir(pdf_hash, target, finished=False)
            )
            pdf_io.pdftocairo(
                pdf_path, target, progress=reporter, total_pages=info.pages
            )
            db.set_pdf_extracted_pages_dir(
                PdfExtractedPagesDir(pdf_hash, target, finished=True)
            )
        for page in pdf_io._scan_pages(target):
            pages.append(PdfPage(pdf_path, pdf_hash, page.image_path, page.page_nr))
    return pages


def _load_page_grays(pages: list[PdfPage]) -> tuple[np.ndarray, tuple[int, int]]:
    """Load pages as grayscale and letterbox into one [S, H, W] batch.

    Pages of different PDFs may differ in size; matching is content-based so
    letterboxing (top-left anchored, zero fill) is transparent to the
    algorithm — keypoint coordinates stay valid.
    """
    grays = []
    for p in pages:
        img = cv2.imread(str(p.image_path), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"Could not read file '{p.image_path}'")
        grays.append(img.astype(np.float32))
    h = max(g.shape[0] for g in grays)
    w = max(g.shape[1] for g in grays)
    batch = np.zeros((len(grays), h, w), np.float32)
    for i, g in enumerate(grays):
        batch[i, : g.shape[0], : g.shape[1]] = g
    return batch, (h, w)


class MatchingEngine:
    """Device-resident matcher for one deck of slides.

    Equivalent of OpenCVVideoMatcher + its thread-local FLANN pool
    (lib.rs:134-262) — except the index is one immutable device array shared
    by all streams, so no per-thread state is needed.
    """

    def __init__(self, cfg: SlideoConfig, pages: list[PdfPage]):
        self.cfg = cfg
        self.pages = pages
        grays, self.slide_hw = _load_page_grays(pages)
        build = jax.jit(partial(orb_matcher.build_slide_index, cfg=cfg))
        self.index = jax.block_until_ready(build(jnp.asarray(grays)))
        self._match = None
        self._dedup = None
        self._frame_hw: tuple[int, int] | None = None

    def _compile_for_frames(self, frame_hw: tuple[int, int]) -> None:
        if self._frame_hw == frame_hw:
            return
        self._frame_hw = frame_hw
        cfg = self.cfg
        _match_jit = orb_matcher.jit_match_frames(self.slide_hw, cfg)
        self._match = lambda frames, seeds: _match_jit(frames, seeds, self.index)
        small_hw = image_ops.small_size(*frame_hw, cfg.video.small_image_area)

        def dedup(frames: jax.Array, prev_small: jax.Array, has_prev: jax.Array):
            smalls = image_ops.resize(frames, small_hw, area=True)
            prevs = jnp.concatenate([prev_small[None], smalls[:-1]], axis=0)
            sims = image_ops.compute_similarity(smalls, prevs, channels=1)
            first_mask = jnp.arange(frames.shape[0]) == 0
            sims = jnp.where(first_mask & ~has_prev, 0.0, sims)
            changed = sims < cfg.video.dedup_similarity
            return smalls, changed

        self._dedup = jax.jit(dedup)

    def match_video(
        self,
        video_path: Path,
        reporter: ProgressReporter = null_reporter,
        tracer: StageTracer | None = None,
    ) -> list[Matching]:
        cfg = self.cfg
        tracer = tracer or StageTracer(enabled=False)
        info = open_video_info(video_path)
        total_ms = int(info.total_time_s * 1000)
        frames_total = info.frames_to_process(cfg.video.interval_s)

        results: list[Matching] = [
            # Sentinel marking the video end (lib.rs:182-189).
            Matching(video_ms=total_ms, video_frame_idx=info.total_frames, page=None)
        ]

        batch: list = []
        pending: list = []  # changed frames awaiting a match batch
        prev_small = None
        processed = 0
        bs = cfg.video.batch_size

        def flush_matches(force: bool = False):
            nonlocal pending
            while pending and (len(pending) >= bs or force):
                chunk, pending = pending[:bs], pending[bs:]
                n = len(chunk)
                frames_np = np.stack([c.gray for c in chunk + [chunk[-1]] * (bs - n)])
                seeds = np.array(
                    [c.frame_idx for c in chunk] + [0] * (bs - n), np.int32
                )
                with tracer.stage("match"):
                    res = self._match(jnp.asarray(frames_np), jnp.asarray(seeds))
                    slides = np.asarray(res.slide)
                for i, sf in enumerate(chunk):
                    page = self.pages[slides[i]] if slides[i] >= 0 else None
                    results.append(
                        Matching(
                            video_ms=int(sf.time_s * 1000),
                            video_frame_idx=sf.frame_idx,
                            page=page,
                        )
                    )

        def flush_dedup(force: bool = False):
            nonlocal batch, prev_small, processed
            if not batch or (len(batch) < bs and not force):
                return
            frames_np = np.stack([b.gray for b in batch])
            self._compile_for_frames(frames_np.shape[1:])
            has_prev = prev_small is not None
            if prev_small is None:
                small_hw = image_ops.small_size(
                    *frames_np.shape[1:], cfg.video.small_image_area
                )
                prev = jnp.zeros(small_hw, jnp.float32)
            else:
                prev = prev_small
            with tracer.stage("dedup"):
                smalls, changed = self._dedup(
                    jnp.asarray(frames_np), prev, jnp.asarray(has_prev)
                )
                changed_np = np.asarray(changed)
            prev_small = smalls[-1]
            for i, b in enumerate(batch):
                if changed_np[i]:
                    pending.append(b)
                processed += 1
            reporter(processed, frames_total, f"Processing frames of '{video_path.name}'...")
            batch = []
            flush_matches()

        frame_iter = sampled_frames(
            video_path,
            cfg.video.interval_s,
            mode=cfg.video.decode_mode,
            workers=cfg.video.decode_workers,
        )
        while True:
            with tracer.stage("decode"):
                sf = next(frame_iter, None)
            if sf is None:
                break
            batch.append(sf)
            flush_dedup()
        flush_dedup(force=True)
        flush_matches(force=True)
        reporter(frames_total, frames_total, "Finished!")

        # Sort by time; drop consecutive duplicates (lib.rs:229-244).
        results.sort(key=lambda m: m.video_ms)
        cleaned: list[Matching] = []
        last: Matching | None = None
        for m in results:
            if last is not None and last.page == m.page:
                continue
            last = m
            cleaned.append(m)
        return cleaned


def sync(
    pages: list[PdfPage],
    videos: list[tuple[Path, str]],
    db: Db,
    cfg: SlideoConfig,
    reporter: ProgressReporter = null_reporter,
    tracer: StageTracer | None = None,
) -> None:
    """Match every video against the deck and persist matchings."""
    engine = MatchingEngine(cfg, pages)
    for video_path, video_hash in videos:
        matchings = engine.match_video(video_path, reporter, tracer)
        rows = [
            (
                m.video_ms,
                m.page.pdf_hash if m.page else None,
                (m.page.page_nr - 1) if m.page else None,
            )
            for m in matchings
        ]
        db.update_video_matchings(video_hash, rows)
