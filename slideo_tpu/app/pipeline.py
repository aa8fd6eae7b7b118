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

import os
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
from ..models import orb_matcher, sift_matcher
from ..ops import image as image_ops
from .db import Db, PdfExtractedPagesDir
from ..utils.trace import StageTracer
from .hashing import get_temp_path_key
from .progress import ComposedProgressReporter, ProgressReporter, null_reporter
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

    def get_path(self) -> Path:  # MatchableImage protocol (matching.py)
        return self.image_path


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


def _png_size(path: Path) -> tuple[int, int] | None:
    """(h, w) from a PNG IHDR header without decoding the image, or None."""
    try:
        with open(path, "rb") as f:
            head = f.read(26)
    except OSError:
        return None
    if head[:8] == b"\x89PNG\r\n\x1a\n" and head[12:16] == b"IHDR":
        w = int.from_bytes(head[16:20], "big")
        h = int.from_bytes(head[20:24], "big")
        if h > 0 and w > 0:
            return h, w
    return None


def _page_paths(pages: list) -> list[Path]:
    return [p.get_path() if hasattr(p, "get_path") else p.image_path for p in pages]


def _letterbox_hw(paths: list[Path]) -> tuple[int, int]:
    """Common letterbox size of a page set — from PNG headers when possible
    (pdftocairo emits PNGs), full decode only as a fallback, so sizing a
    500-page deck costs one small read per file instead of 500 decodes."""
    import cv2

    h = w = 0
    for path in paths:
        size = _png_size(path)
        if size is None:
            img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise IOError(f"Could not read file '{path}'")
            size = img.shape
        h, w = max(h, size[0]), max(w, size[1])
    return h, w


def _iter_page_chunks(paths: list[Path], hw: tuple[int, int], chunk: int):
    """Decode pages chunk-by-chunk into letterboxed [c, h, w] uint8 batches,
    prefetching one chunk ahead in a worker thread (cv2.imread releases the
    GIL) so PNG decode overlaps the device-side index build of the previous
    chunk."""
    import cv2
    from concurrent.futures import ThreadPoolExecutor

    h, w = hw

    def load(c0: int) -> np.ndarray:
        sub = paths[c0 : c0 + chunk]
        batch = np.zeros((len(sub), h, w), np.uint8)
        for i, path in enumerate(sub):
            img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise IOError(f"Could not read file '{path}'")
            batch[i, : img.shape[0], : img.shape[1]] = img
        return batch

    starts = list(range(0, len(paths), chunk))
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(load, starts[0])
        for i in range(len(starts)):
            batch = fut.result()
            if i + 1 < len(starts):
                fut = pool.submit(load, starts[i + 1])
            yield batch


def _load_page_grays(pages: list[PdfPage]) -> tuple[np.ndarray, tuple[int, int]]:
    """Load pages as grayscale and letterbox into one [S, H, W] uint8 batch.

    Pages of different PDFs may differ in size; matching is content-based so
    letterboxing (top-left anchored, zero fill) is transparent to the
    algorithm — keypoint coordinates stay valid. uint8 keeps host->device
    transfers 4x smaller than float32 (device programs cast on entry); the
    reference's Mats are uint8 throughout too.
    """
    grays = []
    for p in pages:
        path = p.get_path() if hasattr(p, "get_path") else p.image_path
        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"Could not read file '{path}'")
        grays.append(img)
    h = max(g.shape[0] for g in grays)
    w = max(g.shape[1] for g in grays)
    batch = np.zeros((len(grays), h, w), np.uint8)
    for i, g in enumerate(grays):
        batch[i, : g.shape[0], : g.shape[1]] = g
    return batch, (h, w)


# Bump when any change invalidates persisted slide indexes (descriptor
# pattern, feature pipeline, packing layout, ...).
_INDEX_FORMAT_VERSION = 2


def _index_cache_key(pages: list[PdfPage], cfg) -> str:
    """Content key of a persisted slide index: page image bytes + config.

    The letterbox size is a pure function of the page images, so it doesn't
    need to be part of the key (it is stored in the archive).
    """
    from .hashing import hash_files, hash_str

    paths = [p.get_path() if hasattr(p, "get_path") else p.image_path for p in pages]
    # The descriptor implementation differs per backend (TPU: fused Pallas
    # kernel with binned angles; CPU: continuous-angle XLA path), so an
    # index built on one backend must not be served to the other.
    parts = [
        f"v{_INDEX_FORMAT_VERSION}",
        jax.default_backend(),
        cfg.engine,
        repr(cfg.sift if cfg.engine == "sift" else cfg.orb),
        str(cfg.video.small_image_area),
        *hash_files(paths),
    ]
    return hash_str("|".join(parts))


def _save_orb_index(key: str, index, slide_hw: tuple[int, int]) -> None:
    """Persist a built SlideIndex. Descriptors pack to bits (~32 MB for a
    500-slide deck vs 262 MB raw); verification thumbnails store as float16
    (max abs error 0.06 on the 0..255 pixel scale — assignment parity is
    gated by the warm-equality test, tests/test_pipeline.py). pts stay
    float32: subpixel coordinates up to ~2048 px exceed f16's 11-bit
    mantissa. Crash-safe: write + atomic rename."""
    import time as _time

    import jax.numpy as jnp

    from ..ops import hamming

    target = get_temp_path_key("index", key)
    target.mkdir(parents=True, exist_ok=True)
    di = index.desc_index
    s, k, _ = index.pts.shape
    # Pack bits and quantize thumbnails ON DEVICE before fetching: the raw
    # f32 descriptor tensor of a 500-slide deck is ~1 GB and the fetch over
    # a tunneled TPU was 436 s of a 483 s cold build (r5 breakdown); the
    # packed+f16 form is ~160 MB.
    t0 = _time.time()
    packed_dev, vbits_dev = jax.jit(
        hamming.pack_descriptor_bits, static_argnums=(2, 3)
    )(di.desc, di.valid, s, k)
    smalls_dev = jnp.asarray(index.smalls, jnp.float16)
    # NOTE on save_fetch_s attribution: on the tunneled TPU runtime,
    # block_until_ready does NOT synchronize, so the first np.asarray here
    # is the point where the WHOLE build's queued async work (a ~1 GB u8
    # page-upload stream + per-chunk extract programs) drains at tunnel
    # rate. Controlled probes (tools/probe_fetch2.py) show post-drain
    # fetches run at 20-30 MB/s regardless of shape/layout — the large
    # save_fetch_s readings are queue drain mis-attributed to download,
    # not a fetch-path problem. The actual download here is ~160 MB.
    packed = np.asarray(packed_dev)
    vbits = np.asarray(vbits_dev)
    pts_h = np.asarray(index.pts)
    smalls_h = np.asarray(smalls_dev)
    t_fetch = _time.time() - t0
    t0 = _time.time()
    # Per-process tmp name: concurrent cold builds of the same key (real
    # multi-process runs) must not interleave writes into one inode before
    # the atomic replace.
    tmp = target / f"index.npz.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            desc_bits=packed,
            valid=vbits,
            pts=pts_h,
            smalls_f16=smalls_h,
            slide_hw=np.asarray(slide_hw, np.int32),
            k_per_slide=np.asarray([k], np.int32),
        )
    tmp.replace(target / "index.npz")
    LAST_BUILD_BREAKDOWN.update(
        save_fetch_s=round(t_fetch, 2),
        save_write_s=round(_time.time() - t0, 2),
    )


def _save_sift_index(key: str, index, slide_hw: tuple[int, int]) -> None:
    """Persist a built SiftSlideIndex. Descriptors and thumbnails store as
    float16: unit-vector SIFT descriptors lose ~1e-3 relative (matching is
    dot-product RANKING — the warm-equality and screened-recall gates in
    tests/test_sift.py arbitrate), and the npz + warm upload halve vs f32
    (~250 MB for a 500-slide deck). Crash-safe: write + atomic rename."""
    import jax.numpy as jnp

    target = get_temp_path_key("index", key)
    target.mkdir(parents=True, exist_ok=True)
    tmp = target / f"index.npz.tmp.{os.getpid()}"
    # f16-cast on device BEFORE fetching (like the ORB save): the f32 desc
    # + thumbnail fetch of a 500-slide deck is ~500 MB over the tunnel.
    # (See _save_orb_index on save-fetch timing semantics: the first fetch
    # drains the whole build's async queue on this runtime.)
    with open(tmp, "wb") as f:
        np.savez(
            f,
            desc_f16=np.asarray(jnp.asarray(index.desc, jnp.float16)),
            valid=np.packbits(np.asarray(index.valid)),
            pts=np.asarray(index.pts),
            scale=np.asarray(index.scale),
            smalls_f16=np.asarray(jnp.asarray(index.smalls, jnp.float16)),
            slide_hw=np.asarray(slide_hw, np.int32),
        )
    tmp.replace(target / "index.npz")


def _load_sift_index(key: str):
    """Load a persisted SiftSlideIndex; returns (index, slide_hw) or None.
    f16 payloads upload half the bytes and cast to f32 on device."""
    from ..models import sift_matcher

    path = get_temp_path_key("index", key) / "index.npz"
    if not path.exists():
        return None
    try:
        with np.load(path) as z:
            n = z["desc_f16"].shape[0]
            up = jax.jit(lambda a: a.astype(jnp.float32))
            result = sift_matcher.SiftSlideIndex(
                desc=up(jnp.asarray(z["desc_f16"])),
                valid=jnp.asarray(np.unpackbits(z["valid"])[:n].astype(bool)),
                pts=jnp.asarray(z["pts"]),
                scale=jnp.asarray(z["scale"]),
                smalls=up(jnp.asarray(z["smalls_f16"])),
            )
            slide_hw = tuple(int(v) for v in z["slide_hw"])
            return jax.block_until_ready(result), slide_hw
    except Exception:
        return None


# Wall-clock breakdown of the most recent _load_orb_index/_load_sift_index
# call (bench diagnostics): {"read_s", "upload_assemble_s"}.
LAST_LOAD_BREAKDOWN: dict[str, float] = {}

# Wall-clock breakdown of the most recent COLD MatchingEngine index build
# (bench diagnostics): {"hash_key_s", "letterbox_s", "extract_s", "save_s"}.
# extract_s covers the streamed decode+upload+device-extraction loop (decode
# overlaps the device program, so it is one phase by construction).
LAST_BUILD_BREAKDOWN: dict[str, float] = {}


def _load_orb_index(key: str):
    """Load a persisted SlideIndex; returns (SlideIndex, slide_hw) or None.

    Warm-start critical path: only the PACKED descriptor bits (32 MB at 500
    slides), f16 thumbnails, and pts cross to the device; bit unpacking and
    index assembly (incl. the transposed/screening tensors) run in one
    device program (hamming.unpack_descriptor_bits). The previous host-side
    unpackbits shipped 262 MB of raw int8 descriptors + 240 MB f32
    thumbnails — tunnel/PCIe upload dominated warm start."""
    import time as _time

    from ..models import orb_matcher
    from ..ops import hamming

    path = get_temp_path_key("index", key) / "index.npz"
    if not path.exists():
        return None
    try:
        t0 = _time.time()
        with np.load(path) as z:
            k = int(z["k_per_slide"][0])
            desc_bits = np.ascontiguousarray(z["desc_bits"])
            valid_bits = np.ascontiguousarray(z["valid"])
            smalls_f16 = np.ascontiguousarray(z["smalls_f16"])
            pts = np.ascontiguousarray(z["pts"])
            slide_hw = tuple(int(v) for v in z["slide_hw"])
        t_read = _time.time() - t0

        def assemble(desc_bits, valid_bits, smalls_f16):
            desc, valid = hamming.unpack_descriptor_bits(
                desc_bits, valid_bits, k
            )
            return (
                hamming.build_index(desc, valid),
                smalls_f16.astype(jnp.float32),
            )

        t0 = _time.time()
        index, smalls = jax.jit(assemble)(
            jnp.asarray(desc_bits), jnp.asarray(valid_bits),
            jnp.asarray(smalls_f16),
        )
        result = orb_matcher.SlideIndex(
            desc_index=index, pts=jnp.asarray(pts), smalls=smalls
        )
        result = jax.block_until_ready(result)
        LAST_LOAD_BREAKDOWN.update(
            read_s=round(t_read, 2),
            upload_assemble_s=round(_time.time() - t0, 2),
        )
        return result, slide_hw
    except Exception:
        return None


class MatchingEngine:
    """Device-resident matcher for one deck of slides.

    Equivalent of OpenCVVideoMatcher + its thread-local FLANN pool
    (lib.rs:134-262) — except the index is one immutable device array shared
    by all streams, so no per-thread state is needed.
    """

    # Slides per index-build chunk: bounds device memory + per-program compile
    # size and lets chunk upload overlap the previous chunk's compute.
    _BUILD_CHUNK = 32

    def __init__(self, cfg: SlideoConfig, pages: list[PdfPage]):
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        # Each engine's diagnostics reflect only its own construction: a warm
        # engine built after a cold one must not report the stale breakdown.
        LAST_BUILD_BREAKDOWN.clear()
        LAST_LOAD_BREAKDOWN.clear()
        self.cfg = cfg
        self.pages = pages
        self._match = None
        self._dedup = None
        self._frame_hw: tuple[int, int] | None = None

        import time as _time

        t0 = _time.time()
        key = _index_cache_key(pages, cfg)
        t_key = _time.time() - t0
        load, save = (
            (_load_orb_index, _save_orb_index)
            if cfg.engine == "orb"
            else (_load_sift_index, _save_sift_index)
        )
        cached = load(key)
        if cached is not None:
            self.index, self.slide_hw = cached
            return
        t0 = _time.time()
        if cfg.engine == "orb":
            # Streaming cold build: page PNGs decode in a worker thread one
            # chunk ahead of the device program, so host decode (the
            # reference's rayon precompute pool, lib.rs:44-56) overlaps
            # upload + on-device feature extraction instead of preceding it.
            paths = _page_paths(pages)
            self.slide_hw = _letterbox_hw(paths)
            t_box = _time.time() - t0
            chunk = max(1, min(self._BUILD_CHUNK, len(paths)))
            t0 = _time.time()
            self.index = orb_matcher.build_slide_index_from_chunks(
                _iter_page_chunks(paths, self.slide_hw, chunk),
                len(paths), cfg, chunk, breakdown=LAST_BUILD_BREAKDOWN,
            )
        else:
            grays, self.slide_hw = _load_page_grays(pages)
            t_box = _time.time() - t0
            t0 = _time.time()
            self.index = sift_matcher.build_slide_index_sift_chunked(
                grays, cfg, chunk=self._BUILD_CHUNK
            )
        t_extract = _time.time() - t0
        t0 = _time.time()
        try:
            save(key, self.index, self.slide_hw)
        except OSError:
            pass  # persistence is best-effort; the in-memory index stands
        LAST_BUILD_BREAKDOWN.update(
            hash_key_s=round(t_key, 2),
            letterbox_s=round(t_box, 2),
            extract_s=round(t_extract, 2),
            save_s=round(_time.time() - t0, 2),
        )

    def _mesh(self):
        """Frame-data-parallel device mesh, when the runtime has >1 device.

        This is the production scale-out path (SURVEY.md §2.8): the slide
        index is replicated over the mesh, each device matches its shard of
        every frame batch (reference analogue: the rayon frame pool,
        lib.rs:174-221). Disable with SLIDEO_MESH=off.
        """
        import os

        if os.environ.get("SLIDEO_MESH", "auto") == "off":
            return None
        # Local, not global: in a multi-process run this host only shards
        # its own frame batches over its own devices (see mesh.make_mesh).
        if len(jax.local_devices()) <= 1:
            return None
        from ..parallel import mesh as mesh_mod

        return mesh_mod.make_mesh()

    @property
    def device_batch(self) -> int:
        """Dispatch batch size: the configured batch rounded up to a multiple
        of the mesh size (shard_map needs the frame axis divisible by it).
        Batching/checkpoint cadence keeps the configured size; dispatch pads."""
        bs = self.cfg.video.batch_size
        mesh = self._mesh()
        if mesh is not None:
            n = mesh.devices.size
            bs = -(-bs // n) * n
        return bs

    def _compile_for_frames(self, frame_hw: tuple[int, int]) -> None:
        if self._frame_hw == frame_hw:
            return
        self._frame_hw = frame_hw
        cfg = self.cfg
        mesh = self._mesh()
        if cfg.engine == "sift":
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel import mesh as mesh_mod

                self.index = jax.device_put(self.index, NamedSharding(mesh, P()))
                _match_jit = jax.jit(
                    partial(
                        mesh_mod.match_frames_sift_sharded,
                        mesh, slide_hw=self.slide_hw, cfg=cfg,
                    )
                )
            else:
                _match_jit = jax.jit(
                    partial(
                        sift_matcher.match_frames_sift,
                        slide_hw=self.slide_hw, cfg=cfg,
                    )
                )
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import mesh as mesh_mod

            # Replicate the index across the mesh once (device_put moves it;
            # afterwards every batch shards only the frames).
            self.index = jax.device_put(self.index, NamedSharding(mesh, P()))
            _match_jit = jax.jit(
                partial(
                    mesh_mod.match_frames_sharded,
                    mesh, slide_hw=self.slide_hw, cfg=cfg,
                ),
                static_argnames=(),
            )
        else:
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
        checkpoint=None,
        resume_state: tuple[list, int] | None = None,
    ) -> list[Matching]:
        """Match one video; optionally checkpointing per-chunk progress.

        checkpoint: callable(rows, last_frame_idx) with rows =
        (frame_idx, video_ms, pdf_hash, page_idx 0-based), invoked after each
        batch with the newly decided matchings (framework extension over the
        reference's whole-video granularity, SURVEY.md §5.4).
        resume_state: (rows, last_frame_idx) from Db.load_partial_matchings —
        decoding restarts after last_frame_idx.
        """
        cfg = self.cfg
        tracer = tracer or StageTracer(enabled=False)
        info = open_video_info(video_path)
        total_ms = int(info.total_time_s * 1000)
        frames_total = info.frames_to_process(cfg.video.interval_s)

        # Multi-host (SURVEY.md §5.8): each host decodes + matches one
        # contiguous block of the sampled-frame stream; the tiny per-frame
        # result records are all-gathered at the end. Per-chunk
        # checkpointing is single-host only (hosts would race on the DB).
        import os

        n_procs = jax.process_count()
        multihost = n_procs > 1 or os.environ.get("SLIDEO_MULTIHOST") == "1"
        shard_lo, shard_hi = -1, None
        if multihost:
            from ..parallel.mesh import host_frame_shard

            checkpoint = None
            resume_state = None
            stride = info.sample_stride(cfg.video.interval_s)
            my = host_frame_shard(list(range(0, info.total_frames, stride)))
            shard_lo = my[0] - 1 if my else info.total_frames
            shard_hi = my[-1] if my else -1
            frames_total = max(len(my), 1)

        results: list[Matching] = [
            # Sentinel marking the video end (lib.rs:182-189).
            Matching(video_ms=total_ms, video_frame_idx=info.total_frames, page=None)
        ]

        start_after = shard_lo
        if resume_state is not None:
            by_key = {(p.pdf_hash, p.page_nr): p for p in self.pages}
            rows, start_after = resume_state
            for frame_idx, video_ms, pdf_hash, page_idx in rows:
                page = (
                    by_key.get((pdf_hash, page_idx + 1))
                    if pdf_hash is not None and page_idx is not None
                    else None
                )
                results.append(
                    Matching(video_ms=video_ms, video_frame_idx=frame_idx, page=page)
                )

        batch: list = []
        pending: list = []  # changed frames awaiting a match batch
        inflight: list = []  # (chunk, device FrameMatch) awaiting host fetch
        prev_small = None
        processed = 0
        bs = cfg.video.batch_size
        last_deduped = start_after  # highest frame idx through dedup
        ckpt_cursor = len(results)  # results[0..cursor) already checkpointed

        def save_checkpoint():
            nonlocal ckpt_cursor
            if checkpoint is None:
                return
            # A frame is "decided" once deduped and (if changed) matched;
            # frames still pending or in flight gate the checkpoint frontier.
            gates = [p[0].frame_idx for p in pending[:1]]
            gates += [c[0][0].frame_idx for c in inflight[:1]]
            frontier = min(gates) - 1 if gates else last_deduped
            new_rows = [
                (
                    m.video_frame_idx,
                    m.video_ms,
                    m.page.pdf_hash if m.page else None,
                    (m.page.page_nr - 1) if m.page else None,
                )
                for m in results[ckpt_cursor:]
                if m.video_frame_idx <= frontier
            ]
            ckpt_cursor = len(results)
            checkpoint(new_rows, frontier)

        def resolve_inflight(keep: int = 0):
            # Fetch completed device results; keep the newest `keep` batches
            # in flight so device compute overlaps decode + dedup of the
            # following frames (jax dispatch is async until the host fetch).
            while len(inflight) > keep:
                chunk, res = inflight.pop(0)
                with tracer.stage("match.fetch"):
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

        def flush_matches(force: bool = False):
            nonlocal pending
            dbs = self.device_batch
            while pending and (len(pending) >= bs or force):
                chunk, pending = pending[:bs], pending[bs:]
                n = len(chunk)
                # Changed frames already live on device (compacted out of the
                # dedup batch) — assemble the match batch from contiguous
                # device slices instead of re-uploading from host (the
                # round-2 double-H2D: every changed frame crossed PCIe/the
                # tunnel twice).
                parts = []
                i = 0
                while i < n:
                    dev, row = chunk[i][1], chunk[i][2]
                    j = i
                    while (
                        j + 1 < n
                        and chunk[j + 1][1] is dev
                        and chunk[j + 1][2] == chunk[j][2] + 1
                    ):
                        j += 1
                    parts.append(dev[row : chunk[j][2] + 1])
                    i = j + 1
                if dbs > n:  # pad with copies of the last frame
                    last = parts[-1][-1:]
                    parts.append(jnp.concatenate([last] * (dbs - n)))
                frames_dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                seeds = np.array(
                    [c[0].frame_idx for c in chunk] + [0] * (dbs - n), np.int32
                )
                with tracer.stage("match.dispatch"):
                    res = self._match(frames_dev, jnp.asarray(seeds))
                inflight.append(([c[0] for c in chunk], res))
                resolve_inflight(keep=1)
            if force:
                resolve_inflight(keep=0)

        def flush_dedup(force: bool = False):
            nonlocal batch, prev_small, processed, last_deduped
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
                frames_dev = jnp.asarray(frames_np)
                smalls, changed = self._dedup(
                    frames_dev, prev, jnp.asarray(has_prev)
                )
                changed_np = np.asarray(changed)
            prev_small = smalls[-1]
            rows = np.nonzero(changed_np)[0]
            if rows.size:
                # Compact the changed frames out of the dedup batch on
                # device: pending keeps only changed frames in HBM and the
                # match stage never re-uploads them.
                changed_dev = jnp.take(frames_dev, jnp.asarray(rows), axis=0)
                for j, i in enumerate(rows):
                    pending.append((batch[i], changed_dev, j))
            for b in batch:
                processed += 1
                last_deduped = b.frame_idx
            reporter(processed, frames_total, f"Processing frames of '{video_path.name}'...")
            batch = []
            flush_matches()
            save_checkpoint()

        frame_iter = sampled_frames(
            video_path,
            cfg.video.interval_s,
            mode=cfg.video.decode_mode,
            workers=cfg.video.decode_workers,
            start_after_frame=start_after,
        )
        while True:
            with tracer.stage("decode"):
                sf = next(frame_iter, None)
            if sf is None:
                break
            if shard_hi is not None and sf.frame_idx > shard_hi:
                break  # past this host's block — stop decoding early
            batch.append(sf)
            flush_dedup()
        flush_dedup(force=True)
        flush_matches(force=True)
        save_checkpoint()
        reporter(frames_total, frames_total, "Finished!")

        if multihost:
            # Exchange this host's records (everything but the sentinel) for
            # the full timeline; every host returns the same merged result.
            from ..parallel.mesh import gather_host_matchings

            page_pos = {id(p): i for i, p in enumerate(self.pages)}
            local_rows = [
                (m.video_frame_idx, m.video_ms,
                 page_pos[id(m.page)] if m.page is not None else -1)
                for m in results[1:]
            ]
            merged = gather_host_matchings(local_rows)
            results[1:] = [
                Matching(
                    video_ms=ms,
                    video_frame_idx=fi,
                    page=self.pages[pg] if pg >= 0 else None,
                )
                for fi, ms, pg in merged
            ]

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
    """Match every video against the deck and persist matchings.

    Progress across all videos is composed into the caller's single bar
    (reference: ComposedProgressReporter, progress.rs:5-36).
    """
    engine = MatchingEngine(cfg, pages)
    composed = ComposedProgressReporter(reporter)
    nested = [composed.create_nested() for _ in videos]
    for (video_path, video_hash), video_reporter in zip(videos, nested):
        resume_state = db.load_partial_matchings(video_hash)

        def checkpoint(rows, last_frame_idx, _vh=video_hash):
            db.save_partial_matchings(_vh, rows, last_frame_idx)

        matchings = engine.match_video(
            video_path,
            video_reporter,
            tracer,
            checkpoint=checkpoint,
            resume_state=resume_state,
        )
        rows = [
            (
                m.video_ms,
                m.page.pdf_hash if m.page else None,
                (m.page.page_nr - 1) if m.page else None,
            )
            for m in matchings
        ]
        # Multi-host runs: every host holds the merged timeline, but only
        # process 0 owns the cache write (hosts may not even share a disk).
        if jax.process_index() == 0:
            db.finalize_video_matchings(video_hash, rows)


class _VideoMatcherTask:
    """One bound (deck x video) unit of work (reference: lib.rs:26-29)."""

    def __init__(self, engine: MatchingEngine, video_path: Path, reporter):
        self._engine = engine
        self._video_path = Path(video_path)
        self._reporter = reporter

    def process(self) -> list[Matching]:
        return self._engine.match_video(self._video_path, self._reporter)


class TpuImageVideoMatcher:
    """The TPU engine behind the engine-neutral interface
    (slideo_tpu.matching): the reference's OpenCVImageVideoMatcher analogue
    (crates/matching-opencv/src/lib.rs:34-75)."""

    def __init__(self, cfg: SlideoConfig | None = None):
        from ..config import DEFAULT_CONFIG

        self.cfg = cfg or DEFAULT_CONFIG

    def create_video_matcher(self, images, reporter=null_reporter) -> MatchingEngine:
        reporter(0, len(images), "Analyzing PDF pages...")
        engine = MatchingEngine(self.cfg, list(images))
        reporter(len(images), len(images), "PDF page analysis successful.")
        return engine


def _match_images_with_video(self, video_path: Path, reporter=null_reporter):
    return _VideoMatcherTask(self, video_path, reporter)


MatchingEngine.match_images_with_video = _match_images_with_video
