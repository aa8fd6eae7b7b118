"""Host-layer unit tests: hashing, paths, pdf parsing, progress, native."""

import hashlib
import io
from pathlib import Path

import pytest

from slideo_tpu.app import hashing, progress
from slideo_tpu.app.checked_path import CheckedPath, Kind
from slideo_tpu.app.video_exts import is_video_ext
from slideo_tpu.io import pdf as pdf_io


def test_hash_file_matches_hashlib(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"slideo" * 10_000)
    assert hashing.hash_file(f) == hashlib.sha256(f.read_bytes()).hexdigest()


def test_hash_files_parallel(tmp_path):
    files = []
    for i in range(5):
        p = tmp_path / f"{i}.bin"
        p.write_bytes(bytes([i]) * 1000)
        files.append(p)
    assert hashing.hash_files(files) == [hashing.hash_file(p) for p in files]


def test_temp_path_key_stable():
    a = hashing.get_temp_path_key("pdf", "somekey")
    b = hashing.get_temp_path_key("pdf", "somekey")
    c = hashing.get_temp_path_key("pdf", "otherkey")
    assert a == b != c
    assert a.name.startswith("pdf-") and len(a.name) == 4 + 20


def test_checked_path_classification(tmp_path):
    assert CheckedPath.from_path(Path("a.pdf")).kind == Kind.PDF
    assert CheckedPath.from_path(Path("a.PDF")).kind == Kind.PDF
    assert CheckedPath.from_path(Path("b.mp4")).kind == Kind.VIDEO
    assert CheckedPath.from_path(Path("b.MKV")).kind == Kind.VIDEO
    with pytest.raises(ValueError, match="Unsupported file extension 'xyz'"):
        CheckedPath.from_path(Path("c.xyz"))
    with pytest.raises(ValueError, match="Unsupported file extension in"):
        CheckedPath.from_path(Path("noext"))
    d = tmp_path / "somedir"
    d.mkdir()
    with pytest.raises(ValueError, match="directory"):
        CheckedPath.from_path(d)


def test_video_exts():
    for ext in ("mp4", "mkv", "webm", "avi", "mov"):
        assert is_video_ext(ext)
    for ext in ("pdf", "txt", "png"):
        assert not is_video_ext(ext)


def test_pdf_page_filename_parsing(tmp_path):
    for name in ("p-1.png", "p-02.png", "p-10.png", "junk.txt", "q-3.png"):
        (tmp_path / name).write_bytes(b"x")
    pages = pdf_io._scan_pages(tmp_path)
    assert [p.page_nr for p in pages] == [1, 2, 10]


def test_pdfinfo_parser_gating():
    # have_poppler is environment-dependent; the parse helper is pure.
    assert isinstance(pdf_io.have_poppler(), bool)


def test_composed_progress_sums():
    seen = []
    composed = progress.ComposedProgressReporter(
        lambda p, t, m: seen.append((p, t))
    )
    r1 = composed.create_nested()
    r2 = composed.create_nested()
    r1(2, 10, "a")
    r2(3, 5, "b")
    assert seen[-1] == (5, 15)
    r1(10, 10, "a")
    assert seen[-1] == (13, 15)


def test_terminal_progress_renders():
    buf = io.StringIO()
    bar = progress.TerminalProgress(stream=buf, min_interval_s=0.0)
    bar.report(1, 4, "working")
    bar.report(4, 4, "done")
    bar.finish()
    out = buf.getvalue()
    assert "1/4" in out and "4/4" in out and out.endswith("\n")


def test_native_fallback_contract():
    from slideo_tpu import native

    # available() may be False in minimal environments; hash_file must work
    # either way via the hashlib fallback (exercised above). When the lib is
    # present, parity with hashlib is asserted in test_hamming/test above.
    assert isinstance(native.available(), bool)


def test_vendored_poppler_path_discovery(tmp_path, monkeypatch):
    """_ensure_poppler_on_path prepends SLIDEO_POPPLER_DIR (or the package
    _vendor dir) to PATH once, so a bundled poppler resolves without a
    system install — the reference's Windows-release behavior
    (main.rs:44-45)."""
    import os
    import stat

    fake = tmp_path / "popplerbin"
    fake.mkdir()
    for exe in ("pdftocairo", "pdfinfo"):
        p = fake / exe
        p.write_text("#!/bin/sh\nexit 0\n")
        p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setenv("SLIDEO_POPPLER_DIR", str(fake))
    # empty PATH: only the vendored dir can resolve the binaries
    monkeypatch.setenv("PATH", str(tmp_path / "nothing"))
    monkeypatch.setattr(pdf_io, "_POPPLER_PATH_DONE", False)
    assert pdf_io.have_poppler()
    assert os.environ["PATH"].startswith(str(fake))
    # idempotent: a second call must not prepend again
    pdf_io._ensure_poppler_on_path()
    assert os.environ["PATH"].count(str(fake)) == 1
