"""SIFT-family engine: invariances, homography RANSAC, end-to-end match."""

import dataclasses

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slideo_tpu.config import DEFAULT_CONFIG, SiftConfig
from slideo_tpu.models import sift_matcher
from slideo_tpu.ops import homography as HG
from slideo_tpu.ops.sift import extract_sift


@pytest.fixture(scope="module")
def cfg():
    sift = dataclasses.replace(
        DEFAULT_CONFIG.sift, max_keypoints=256, n_octaves=3, border=24
    )
    match = dataclasses.replace(
        DEFAULT_CONFIG.match,
        ransac_iters=512, max_matches_per_slide=128, min_rating=15.0,
    )
    return dataclasses.replace(DEFAULT_CONFIG, sift=sift, match=match, engine="sift")


@pytest.fixture(scope="module")
def textured(rng):
    img = np.zeros((240, 320), np.float32)
    for _ in range(25):
        y, x = rng.randint(40, 200), rng.randint(40, 280)
        img[y : y + rng.randint(4, 14), x : x + rng.randint(6, 30)] = rng.randint(
            80, 255
        )
    return img


def test_sift_rotation_invariance(cfg, textured):
    ext = jax.jit(lambda im: extract_sift(im, cfg.sift))
    f0 = ext(jnp.asarray(textured))
    d0 = np.asarray(f0.desc)[np.asarray(f0.valid)]
    assert len(d0) > 50
    assert np.abs(np.linalg.norm(d0, axis=1) - 1).max() < 1e-3
    for ang in (30.0, 120.0):
        m = cv2.getRotationMatrix2D((160, 120), ang, 1.0)
        fr = ext(jnp.asarray(cv2.warpAffine(textured, m, (320, 240))))
        dr = np.asarray(fr.desc)[np.asarray(fr.valid)]
        best = (d0 @ dr.T).max(1)
        assert np.median(best) > 0.85, (ang, np.median(best))


def test_sift_scale_invariance(cfg, textured):
    ext = jax.jit(lambda im: extract_sift(im, cfg.sift))
    d0 = np.asarray(ext(jnp.asarray(textured)).desc)
    half = cv2.resize(textured, None, fx=0.5, fy=0.5)
    pad = np.zeros_like(textured)
    pad[:120, :160] = half
    ds = np.asarray(ext(jnp.asarray(pad)).desc)
    best = (d0 @ ds.T).max(1)
    assert np.median(best[np.abs(d0).sum(1) > 0]) > 0.75


def test_ransac_homography_vs_cv2(rng, cfg):
    h_true = np.array(
        [[0.9, 0.05, 30], [-0.03, 0.95, 20], [1e-4, -5e-5, 1.0]], np.float64
    )
    n = 100
    src = rng.rand(n, 2).astype(np.float32) * np.array([1600, 900])
    ones = np.ones((n, 1), np.float32)
    proj = np.hstack([src, ones]) @ h_true.T
    dst = (proj[:, :2] / proj[:, 2:]).astype(np.float32)
    dst += rng.randn(n, 2).astype(np.float32) * 0.5
    dst[:30] = rng.rand(30, 2) * np.array([1600, 900])

    res = HG.ransac_homography(
        jnp.asarray(src[None]), jnp.asarray(dst[None]),
        jnp.ones((1, n), bool), jax.random.key(0), cfg.match,
    )
    assert bool(res.ok[0])
    _, inl_cv = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    assert abs(float(res.rating[0]) - inl_cv.sum()) <= 3

    # reprojection of the recovered transform on true inliers
    h = np.asarray(res.transform.h[0])
    hm = np.array([[h[0], h[1], h[2]], [h[3], h[4], h[5]], [h[6], h[7], 1.0]])
    p = np.hstack([src[30:], ones[30:]]) @ hm.T
    err = np.linalg.norm(p[:, :2] / p[:, 2:] - dst[30:], axis=1)
    assert err.max() < 3.0


def test_sift_engine_end_to_end(cfg, rng):
    s_cnt, h, w = 4, 300, 400
    slides = np.zeros((s_cnt, h, w), np.float32)
    for s in range(s_cnt):
        for _ in range(30):
            y, x = rng.randint(30, h - 40), rng.randint(30, w - 60)
            slides[s, y : y + rng.randint(4, 14), x : x + rng.randint(6, 40)] = (
                rng.randint(80, 255)
            )
    hp = cv2.getPerspectiveTransform(
        np.float32([[0, 0], [w, 0], [w, h], [0, h]]),
        np.float32([[30, 40], [430, 20], [460, 330], [10, 300]]),
    )
    frame = cv2.warpPerspective(slides[2], hp, (480, 360)).astype(np.float32)
    frame += rng.randn(360, 480).astype(np.float32) * 2

    index = jax.jit(lambda s: sift_matcher.build_slide_index_sift(s, cfg))(
        jnp.asarray(slides)
    )
    mf = jax.jit(
        lambda f, sd, ix: sift_matcher.match_frame_sift(f, sd, ix, (h, w), cfg)
    )
    res = mf(jnp.asarray(frame), jnp.int32(5), index)
    assert int(res.slide) == 2, (int(res.slide), float(res.similarity))
    assert float(res.similarity) > 0.7

    noise = (rng.rand(360, 480) * 255).astype(np.float32)
    res2 = mf(jnp.asarray(noise), jnp.int32(6), index)
    assert int(res2.slide) == -1


def _mini_deck(rng, n=6, h=300, w=400):
    slides = np.zeros((n, h, w), np.float32)
    for s in range(n):
        for _ in range(30):
            y, x = rng.randint(30, h - 40), rng.randint(30, w - 60)
            slides[s, y : y + rng.randint(4, 14), x : x + rng.randint(6, 40)] = (
                rng.randint(80, 255)
            )
    return slides


def test_sift_chunked_index_equals_monolithic(cfg, rng):
    """build_slide_index_sift_chunked must reproduce the monolithic build
    exactly (it is the production path for large decks — VERDICT r2 #6)."""
    slides = _mini_deck(rng)
    mono = jax.jit(lambda s: sift_matcher.build_slide_index_sift(s, cfg))(
        jnp.asarray(slides)
    )
    chunked = sift_matcher.build_slide_index_sift_chunked(slides, cfg, chunk=2)
    for a, b, name in [
        (mono.desc, chunked.desc, "desc"),
        (mono.pts, chunked.pts, "pts"),
        (mono.scale, chunked.scale, "scale"),
        (mono.smalls, chunked.smalls, "smalls"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )
    assert (np.asarray(mono.valid) == np.asarray(chunked.valid)).all()


def test_sift_engine_pipeline_with_persistence(cfg, rng, tmp_path, monkeypatch):
    """MatchingEngine with engine=sift: chunked build, persisted index
    round-trip (warm engine bit-identical match results), mesh-eligible."""
    import dataclasses as dc

    from slideo_tpu.app.pipeline import MatchingEngine, PdfPage

    monkeypatch.setenv("TMPDIR", str(tmp_path))  # isolate index persistence
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    slides = _mini_deck(rng).astype(np.uint8)
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    for i, s in enumerate(slides):
        cv2.imwrite(str(pages_dir / f"p-{i+1}.png"), s)
    pages = [
        PdfPage(tmp_path / "deck.pdf", "f" * 64, pages_dir / f"p-{i+1}.png", i + 1)
        for i in range(len(slides))
    ]
    scfg = dc.replace(cfg, video=dc.replace(cfg.video, batch_size=4))

    eng_cold = MatchingEngine(scfg, pages)
    eng_warm = MatchingEngine(scfg, pages)  # loads the persisted index
    # desc/smalls persist as float16 (halves the archive + warm upload):
    # exact within the f16 quantum; pts/scale/valid stay bit-exact.
    np.testing.assert_allclose(
        np.asarray(eng_warm.index.desc), np.asarray(eng_cold.index.desc),
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(eng_warm.index.smalls), np.asarray(eng_cold.index.smalls),
        atol=0.07,
    )
    for a, b in [
        (eng_cold.index.valid, eng_warm.index.valid),
        (eng_cold.index.pts, eng_warm.index.pts),
        (eng_cold.index.scale, eng_warm.index.scale),
    ]:
        assert (np.asarray(a) == np.asarray(b)).all()

    # match a perspective frame through both engines' jit paths
    h, w = slides.shape[1:]
    hp = cv2.getPerspectiveTransform(
        np.float32([[0, 0], [w, 0], [w, h], [0, h]]),
        np.float32([[20, 25], [380, 15], [390, 280], [15, 270]]),
    )
    frame = cv2.warpPerspective(slides[3], hp, (w, h))
    for eng in (eng_cold, eng_warm):
        n = eng.device_batch  # mesh-padded dispatch batch (8 on the CI mesh)
        frames = np.stack([frame] * n)
        eng._compile_for_frames((h, w))
        out = eng._match(
            jnp.asarray(frames.astype(np.float32)),
            jnp.arange(n, dtype=jnp.int32),
        )
        assert list(np.asarray(out.slide)) == [3] * n
    tempfile.tempdir = None  # restore for later tests


def test_sift_screened_matches_exact(cfg, rng):
    """Large-deck SIFT screening recall gate: the bf16 stage-1 voting sweep
    + exact table over the survivors must reproduce the exact full-table
    assignments (hamming.screen_slides_float; the deck is scaled down via
    screen_above_slides so the screened route engages at test size)."""
    import dataclasses as dc

    slides = _mini_deck(rng, n=16)
    h, w = slides.shape[1:]
    exact_cfg = dc.replace(
        cfg, match=dc.replace(cfg.match, screen_above_slides=999)
    )
    screened_cfg = dc.replace(
        cfg,
        match=dc.replace(
            cfg.match, screen_above_slides=8, screen_slides=4, screen_queries=64
        ),
    )
    index = sift_matcher.build_slide_index_sift_chunked(slides, cfg, chunk=8)

    frames = []
    for i, ang in [(3, -4.0), (9, 2.5), (14, 0.0)]:
        m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 0.95)
        fr = cv2.warpAffine(slides[i], m, (w, h)).astype(np.float32)
        frames.append(fr + rng.randn(h, w).astype(np.float32) * 1.5)
    frames.append((rng.rand(h, w) * 255).astype(np.float32))  # no-match
    frames = np.stack(frames)
    seeds = jnp.arange(len(frames), dtype=jnp.int32)

    outs = {}
    for name, c in (("exact", exact_cfg), ("screened", screened_cfg)):
        fn = jax.jit(
            lambda f, s, ix, c=c: sift_matcher.match_frames_sift(
                f, s, ix, (h, w), c
            )
        )
        outs[name] = np.asarray(fn(jnp.asarray(frames), seeds, index).slide)
    assert list(outs["exact"]) == [3, 9, 14, -1], outs["exact"]
    assert list(outs["screened"]) == list(outs["exact"])


def test_sift_thresholds_vs_cv2_oracle(cfg, rng):
    """Acceptance oracle for the SIFT engine's thresholds (SiftConfig
    min_rating/lowe_ratio have no reference analogue — the rustcv prototype,
    crates/matching-rustcv/main.rs.txt:92-209, is the model): a cv2.SIFT +
    Lowe-ratio + findHomography pipeline decides each frame; our engine must
    agree on every assignment (match vs no-match and which slide)."""
    if not hasattr(cv2, "SIFT_create"):
        pytest.skip("cv2 without SIFT")
    slides = _mini_deck(rng)
    h, w = slides.shape[1:]
    frames, expected = [], []
    for i in range(6):
        if i % 3 == 2:
            frames.append((rng.rand(h, w) * 255).astype(np.float32))
            expected.append(-1)
            continue
        s = rng.randint(len(slides))
        hp = cv2.getPerspectiveTransform(
            np.float32([[0, 0], [w, 0], [w, h], [0, h]]),
            np.float32(
                [[0, 0], [w, 0], [w, h], [0, h]]
                + rng.uniform(-25, 25, (4, 2)).astype(np.float32)
            ),
        )
        fr = cv2.warpPerspective(slides[s], hp, (w, h))
        frames.append(fr + rng.randn(h, w).astype(np.float32) * 2)
        expected.append(s)

    # cv2 oracle
    sift = cv2.SIFT_create()
    s8 = [np.clip(s, 0, 255).astype(np.uint8) for s in slides]
    slide_feats = [sift.detectAndCompute(s, None) for s in s8]
    oracle = []
    for fr in frames:
        fkp, fdesc = sift.detectAndCompute(
            np.clip(fr, 0, 255).astype(np.uint8), None
        )
        best_slide, best_inl = -1, 0
        if fdesc is not None and len(fdesc) >= 2:
            bf = cv2.BFMatcher()
            for si, (kp, desc) in enumerate(slide_feats):
                if desc is None or len(desc) < 2:
                    continue
                good = []
                for m, n in bf.knnMatch(fdesc, desc, k=2):
                    if m.distance < 0.8 * n.distance:
                        good.append(m)
                if len(good) < 8:
                    continue
                src = np.float32([kp[m.trainIdx].pt for m in good]).reshape(-1, 1, 2)
                dst = np.float32([fkp[m.queryIdx].pt for m in good]).reshape(-1, 1, 2)
                hm, inl = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
                if hm is None:
                    continue
                if int(inl.sum()) > best_inl:
                    best_inl, best_slide = int(inl.sum()), si
        oracle.append(best_slide if best_inl >= 10 else -1)

    index = jax.jit(lambda s: sift_matcher.build_slide_index_sift(s, cfg))(
        jnp.asarray(slides)
    )
    mf = jax.jit(
        lambda f, sd, ix: sift_matcher.match_frame_sift(f, sd, ix, (h, w), cfg)
    )
    ours = [int(mf(jnp.asarray(fr), jnp.int32(i), index).slide)
            for i, fr in enumerate(frames)]
    assert ours == oracle, (ours, oracle, expected)
    assert oracle == expected  # oracle sanity on ground truth
