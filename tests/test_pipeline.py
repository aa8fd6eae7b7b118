"""End-to-end pipeline test: synthetic deck + video -> timeline in SQLite.

This is the reference's whole `slideo a.pdf b.mp4` flow (SURVEY.md §3.1) on
tiny synthetic media — no poppler or large fixtures needed (pages are
injected through the cache's own pre-extracted-pages path).
"""

import dataclasses
import hashlib
from pathlib import Path

import cv2
import numpy as np
import pytest

from slideo_tpu.config import DEFAULT_CONFIG
from slideo_tpu.app.db import Db, PdfExtractedPagesDir
from slideo_tpu.app import pipeline


@pytest.fixture(scope="module")
def small_cfg():
    orb = dataclasses.replace(
        DEFAULT_CONFIG.orb,
        n_features=256, max_keypoints=256, n_levels=3, edge_threshold=32,
    )
    match = dataclasses.replace(
        DEFAULT_CONFIG.match,
        ransac_iters=256, max_matches_per_slide=128, min_rating=20.0,
        knn_chunk=2048,
    )
    video = dataclasses.replace(DEFAULT_CONFIG.video, batch_size=4)
    return dataclasses.replace(DEFAULT_CONFIG, orb=orb, match=match, video=video)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("media")
    rng = np.random.RandomState(7)
    pages_dir = root / "pages"
    pages_dir.mkdir()
    H, W = 240, 320
    pages = []
    for p in range(3):
        img = np.full((H, W), 255, np.uint8)
        cv2.putText(img, f"Pg {p+1}", (20, 40), cv2.FONT_HERSHEY_SIMPLEX, 1.0, 0, 2)
        for _ in range(20):
            y, x = rng.randint(60, H - 30), rng.randint(20, W - 60)
            cv2.rectangle(
                img, (x, y), (x + rng.randint(15, 50), y + rng.randint(4, 10)),
                int(rng.randint(0, 120)), -1,
            )
        cv2.imwrite(str(pages_dir / f"p-{p+1}.png"), img)
        pages.append(img)

    pdf_path = root / "deck.pdf"
    pdf_path.write_bytes(b"%PDF fixture" + rng.bytes(32))
    pdf_hash = hashlib.sha256(pdf_path.read_bytes()).hexdigest()

    vid_path = root / "talk.avi"
    vw = cv2.VideoWriter(
        str(vid_path), cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (W, H)
    )
    # pages 1 then 3, 10s each at 5fps; interval 5s -> 10 sampled frames
    for p in (0, 2):
        base = cv2.cvtColor(pages[p], cv2.COLOR_GRAY2BGR)
        for _ in range(50):
            vw.write(base)
    vw.release()
    video_hash = hashlib.sha256(vid_path.read_bytes()).hexdigest()
    return dict(
        root=root, pages_dir=pages_dir, pdf_path=pdf_path, pdf_hash=pdf_hash,
        vid_path=vid_path, video_hash=video_hash,
    )


def test_sync_pipeline(fixture_dir, small_cfg, tmp_path):
    db = Db(tmp_path / "slideo.db")
    f = fixture_dir
    db.set_pdf_extracted_pages_dir(
        PdfExtractedPagesDir(f["pdf_hash"], f["pages_dir"], True)
    )
    pages = pipeline.pdfs_to_images([(f["pdf_path"], f["pdf_hash"])], db)
    assert [p.page_nr for p in pages] == [1, 2, 3]

    db.create_or_reset_video(f["video_hash"], [f["pdf_hash"]])
    pipeline.sync(pages, [(f["vid_path"], f["video_hash"])], db, small_cfg)

    rows = db.conn.execute(
        "SELECT video_ms, pdf_hash, page FROM videos_mapping ORDER BY video_ms"
    ).fetchall()
    # Expect: page 0 at t=0, page 2 at the segment switch (10s +-1 sample),
    # trailing sentinel (pdf_hash None).
    assert rows[0][0] == 0 and rows[0][2] == 0, rows
    switches = [r for r in rows if r[1] == f["pdf_hash"] and r[2] == 2]
    assert len(switches) == 1, rows
    assert abs(switches[0][0] - 10_000) <= 5_000, rows
    assert rows[-1][1] is None, rows
    assert db.find_mapping_info(f["video_hash"]).finished

    # viewer JSON: both pages present with positive durations
    matchings = db.get_pdf_video_matchings(f["pdf_hash"])
    assert {m["page_idx"] for m in matchings} == {0, 2}
    assert all(m["duration_ms"] > 0 for m in matchings)


def test_video_info_and_sampling(fixture_dir):
    from slideo_tpu.io.video import open_video_info, sampled_frames

    info = open_video_info(fixture_dir["vid_path"])
    assert info.total_frames == 100 and abs(info.fps - 5.0) < 0.1
    assert abs(info.total_time_s - 20.0) < 0.1

    frames = list(sampled_frames(fixture_dir["vid_path"], 5.0, mode="grab"))
    # one frame per 5s: indices 0, 25, 50, 75 (stride floor(5*5)=25)
    assert [f.frame_idx for f in frames] == [0, 25, 50, 75]
    assert frames[0].gray.shape == (240, 320)

    seek = list(sampled_frames(fixture_dir["vid_path"], 5.0, mode="seek", workers=2))
    assert [f.frame_idx for f in seek] == [0, 25, 50, 75]
    # decoded content should agree between modes
    assert np.abs(seek[2].gray - frames[2].gray).mean() < 2.0

    # chunk mode: identical sampled indices AND identical decoded bytes
    # (it grabs forward like the reference loop, one seek per segment)
    for workers in (1, 2, 3):
        chunk = list(
            sampled_frames(
                fixture_dir["vid_path"], 5.0, mode="chunk", workers=workers
            )
        )
        assert [f.frame_idx for f in chunk] == [0, 25, 50, 75], workers
        for cf, gf in zip(chunk, frames):
            assert np.array_equal(cf.gray, gf.gray), (workers, cf.frame_idx)

    # chunk mode resumes from a checkpoint frontier like grab
    chunk_resume = list(
        sampled_frames(
            fixture_dir["vid_path"], 5.0, mode="chunk", workers=2,
            start_after_frame=25,
        )
    )
    assert [f.frame_idx for f in chunk_resume] == [50, 75]


def test_checkpoint_resume(fixture_dir, small_cfg, tmp_path):
    """Interrupt after a mid-run checkpoint; resume must complete the video
    without reprocessing checkpointed frames and produce the same timeline."""
    from slideo_tpu.app.pipeline import MatchingEngine

    # denser sampling + single-frame batches so checkpoints happen mid-video
    # even with the one-batch match-dispatch overlap (results of the newest
    # in-flight batch land one flush later by design).
    cfg = dataclasses.replace(
        small_cfg,
        video=dataclasses.replace(small_cfg.video, batch_size=1, interval_s=2.0),
    )

    db = Db(tmp_path / "slideo.db")
    f = fixture_dir
    db.set_pdf_extracted_pages_dir(
        PdfExtractedPagesDir(f["pdf_hash"], f["pages_dir"], True)
    )
    pages = pipeline.pdfs_to_images([(f["pdf_path"], f["pdf_hash"])], db)
    db.create_or_reset_video(f["video_hash"], [f["pdf_hash"]])

    engine = MatchingEngine(cfg, pages)

    class Stop(Exception):
        pass

    calls = []

    def crashing_checkpoint(rows, last_frame_idx):
        db.save_partial_matchings(f["video_hash"], rows, last_frame_idx)
        calls.append(last_frame_idx)
        # crash at the first mid-video checkpoint (not the final one)
        if 0 <= last_frame_idx < 90:
            raise Stop()

    try:
        engine.match_video(f["vid_path"], checkpoint=crashing_checkpoint)
        raise AssertionError("expected simulated crash")
    except Stop:
        pass

    state = db.load_partial_matchings(f["video_hash"])
    assert state is not None
    saved_rows, last_idx = state
    assert last_idx >= 0
    assert not db.find_mapping_info(f["video_hash"]).finished

    # Resume: frames <= last_idx must not be decoded again.
    seen = []
    orig = pipeline.sampled_frames

    def spy(*a, **kw):
        for sf in orig(*a, **kw):
            seen.append(sf.frame_idx)
            yield sf

    pipeline_sampled = pipeline.sampled_frames
    pipeline.sampled_frames = spy
    try:
        matchings = engine.match_video(
            f["vid_path"],
            checkpoint=lambda rows, idx: db.save_partial_matchings(
                f["video_hash"], rows, idx
            ),
            resume_state=state,
        )
    finally:
        pipeline.sampled_frames = pipeline_sampled
    assert seen and min(seen) > last_idx

    db.update_video_matchings(
        f["video_hash"],
        [
            (m.video_ms, m.page.pdf_hash if m.page else None,
             (m.page.page_nr - 1) if m.page else None)
            for m in matchings
        ],
    )
    db.clear_partial_matchings(f["video_hash"])
    assert db.load_partial_matchings(f["video_hash"]) is None

    rows = db.conn.execute(
        "SELECT video_ms, page FROM videos_mapping ORDER BY video_ms"
    ).fetchall()
    # same shape as the uninterrupted run: page 0 at start, page 2 later
    assert rows[0][1] == 0
    assert any(r[1] == 2 for r in rows)


def test_orb_engine_persistence_roundtrip(fixture_dir, small_cfg, tmp_path, monkeypatch):
    """Cold build -> persisted v2 index (packed descriptor bits + f16
    thumbnails, device-side unpack) -> warm engine.

    Exactness contract: descriptors / validity / keypoints are BIT-equal
    across the round-trip; thumbnails are within the f16 quantum (max abs
    0.0625 on the 0..255 pixel scale); frame->page assignments identical.
    The cold build here also exercises the streaming chunked page decode
    (pipeline._iter_page_chunks)."""
    import tempfile

    import jax.numpy as jnp

    from slideo_tpu.app.pipeline import MatchingEngine, PdfPage

    monkeypatch.setenv("TMPDIR", str(tmp_path))  # isolate index persistence
    tempfile.tempdir = None  # force re-read of TMPDIR
    f = fixture_dir
    pages = [
        PdfPage(f["pdf_path"], f["pdf_hash"], f["pages_dir"] / f"p-{i+1}.png", i + 1)
        for i in range(3)
    ]
    eng_cold = MatchingEngine(small_cfg, pages)
    eng_warm = MatchingEngine(small_cfg, pages)  # loads the persisted index
    assert eng_cold.slide_hw == eng_warm.slide_hw
    di_c, di_w = eng_cold.index.desc_index, eng_warm.index.desc_index
    assert (np.asarray(di_c.desc) == np.asarray(di_w.desc)).all()
    assert (np.asarray(di_c.valid) == np.asarray(di_w.valid)).all()
    assert (np.asarray(eng_cold.index.pts) == np.asarray(eng_warm.index.pts)).all()
    np.testing.assert_allclose(
        np.asarray(eng_warm.index.smalls),
        np.asarray(eng_cold.index.smalls),
        atol=0.07,  # f16 quantum at 255
    )

    page_img = cv2.imread(str(f["pages_dir"] / "p-3.png"), cv2.IMREAD_GRAYSCALE)
    h, w = page_img.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), 2.0, 0.97)
    frame = cv2.warpAffine(page_img, m, (w, h), borderValue=40)
    results = []
    for eng in (eng_cold, eng_warm):
        n = eng.device_batch
        eng._compile_for_frames((h, w))
        out = eng._match(
            jnp.asarray(np.stack([frame] * n).astype(np.float32)),
            jnp.arange(n, dtype=jnp.int32),
        )
        results.append(list(np.asarray(out.slide)))
    assert results[0] == results[1] == [2] * len(results[0])
    tempfile.tempdir = None  # restore for later tests


def test_engine_satisfies_matching_protocols(fixture_dir, small_cfg, tmp_path):
    """The TPU engine plugs into the engine-neutral interface layer."""
    from slideo_tpu import matching as M
    from slideo_tpu.app.pipeline import TpuImageVideoMatcher

    db = Db(tmp_path / "slideo.db")
    f = fixture_dir
    db.set_pdf_extracted_pages_dir(
        PdfExtractedPagesDir(f["pdf_hash"], f["pages_dir"], True)
    )
    pages = pipeline.pdfs_to_images([(f["pdf_path"], f["pdf_hash"])], db)
    assert isinstance(pages[0], M.MatchableImage)
    assert pages[0].get_path().exists()

    factory = TpuImageVideoMatcher(small_cfg)
    assert isinstance(factory, M.ImageVideoMatcher)
    matcher = factory.create_video_matcher(pages)
    assert isinstance(matcher, M.VideoMatcher)
    task = matcher.match_images_with_video(f["vid_path"])
    assert isinstance(task, M.VideoMatcherTask)
    results = task.process()
    # first record shows page 1 (index 0)
    first = [m for m in results if m.page is not None][0]
    assert first.page.page_nr == 1


def test_engine_mesh_equals_single_device(fixture_dir, small_cfg):
    """The production frame-DP mesh path (auto on >1 device — the 8-device
    virtual CPU mesh here) must produce exactly the same matchings as the
    single-device path (SLIDEO_MESH=off)."""
    import os

    import jax

    from slideo_tpu.app.pipeline import MatchingEngine, PdfPage

    assert jax.device_count() > 1  # conftest forces the 8-device CPU mesh
    f = fixture_dir
    pages = [
        PdfPage(f["pdf_path"], f["pdf_hash"], f["pages_dir"] / f"p-{i}.png", i)
        for i in (1, 2, 3)
    ]

    def run():
        engine = MatchingEngine(small_cfg, pages)
        out = engine.match_video(f["vid_path"])
        return [(m.video_ms, m.page.page_nr if m.page else None) for m in out]

    old = os.environ.get("SLIDEO_MESH")
    try:
        os.environ["SLIDEO_MESH"] = "off"
        single = run()
        os.environ["SLIDEO_MESH"] = "auto"
        meshed = run()
    finally:
        if old is None:
            os.environ.pop("SLIDEO_MESH", None)
        else:
            os.environ["SLIDEO_MESH"] = old
    assert single == meshed
    assert any(p is not None for _, p in single)


def test_multihost_path_process_count_1(fixture_dir, small_cfg, monkeypatch):
    """SLIDEO_MULTIHOST=1 forces the multi-host code path (host frame shard,
    gather_host_matchings) with process_count=1 — it must produce the same
    timeline as the normal single-host path (mesh.py host_frame_shard /
    gather are identity at one process)."""
    from slideo_tpu.app.pipeline import MatchingEngine
    from slideo_tpu.app.db import Db as _Db

    f = fixture_dir
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        db = _Db(Path(td) / "slideo.db")
        db.set_pdf_extracted_pages_dir(
            PdfExtractedPagesDir(f["pdf_hash"], f["pages_dir"], True)
        )
        pages = pipeline.pdfs_to_images([(f["pdf_path"], f["pdf_hash"])], db)
        db.close()

    engine = MatchingEngine(small_cfg, pages)
    base = engine.match_video(f["vid_path"])
    monkeypatch.setenv("SLIDEO_MULTIHOST", "1")
    multi = engine.match_video(f["vid_path"])
    key = lambda ms: [
        (m.video_ms, m.video_frame_idx, m.page.page_nr if m.page else None)
        for m in ms
    ]
    assert key(multi) == key(base)


def test_host_frame_shard_partition():
    """Contiguous, disjoint, covering blocks at any process count."""
    from slideo_tpu.parallel.mesh import host_frame_shard, gather_host_matchings

    idx = list(range(0, 97, 3))
    for pc in (1, 2, 3, 8):
        shards = [host_frame_shard(idx, pi, pc) for pi in range(pc)]
        flat = [i for s in shards for i in s]
        assert flat == idx  # order-preserving cover, no overlap
        for s in shards:
            if len(s) > 1:
                step = s[1] - s[0]
                assert all(b - a == step for a, b in zip(s, s[1:]))
    rows = [(1, 1000, 0), (2, 2000, -1)]
    assert gather_host_matchings(rows, process_count=1) == rows
