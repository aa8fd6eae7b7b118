"""HTTP server contract tests: routes, JSON shapes, range requests."""

import json
import threading
import urllib.request
import urllib.error

import pytest

from slideo_tpu.app.db import Db, PdfExtractedPagesDir
from slideo_tpu.app.web import make_server

PDF = "a" * 64
VID = "b" * 64


@pytest.fixture()
def server(tmp_path):
    db = Db(tmp_path / "slideo.db")
    media = tmp_path / "video.bin"
    media.write_bytes(bytes(range(256)) * 40)  # 10240 bytes
    pages = tmp_path / "pages"
    pages.mkdir()
    (pages / "p-1.png").write_bytes(b"\x89PNG fakepage1")
    (pages / "p-2.png").write_bytes(b"\x89PNG fakepage2")
    db.update_hashes([(str(media), VID)])
    db.set_pdf_extracted_pages_dir(PdfExtractedPagesDir(PDF, pages, True))
    db.create_or_reset_video(VID, [PDF])
    db.update_video_matchings(VID, [(0, PDF, 0), (7000, None, None)])
    db.close()

    srv = make_server(tmp_path / "slideo.db", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    return urllib.request.urlopen(req)


def test_pdf_matchings_json(server):
    with _get(f"{server}/pdf-matchings/{PDF}") as r:
        rows = json.loads(r.read())
    assert rows == [
        {
            "video_offset_ms": 0,
            "pdf_hash": PDF,
            "video_hash": VID,
            "page_idx": 0,
            "duration_ms": 7000,
        }
    ]


def test_files_full_and_range(server):
    with _get(f"{server}/files/{VID}") as r:
        body = r.read()
    assert len(body) == 10240
    with _get(f"{server}/files/{VID}", {"Range": "bytes=10-19"}) as r:
        assert r.status == 206
        assert r.headers["Content-Range"] == "bytes 10-19/10240"
        assert r.read() == bytes(range(10, 20))
    with _get(f"{server}/files/{VID}", {"Range": "bytes=-16"}) as r:
        assert r.status == 206 and len(r.read()) == 16


def test_pdf_pages_routes(server):
    with _get(f"{server}/pdf-pages/{PDF}") as r:
        pages = json.loads(r.read())
    assert [p["page_idx"] for p in pages] == [0, 1]
    with _get(f"{server}{pages[1]['url']}") as r:
        assert r.read().endswith(b"fakepage2")


def test_index_and_assets(server):
    with _get(f"{server}/") as r:
        assert b"<!DOCTYPE html>" in r.read()
    with _get(f"{server}/viewer.js") as r:
        assert b"playVideo" in r.read()


def test_errors(server):
    for url, code in [
        (f"{server}/files/{'f' * 64}", 404),       # unknown hash
        (f"{server}/files/notahash", 400),          # malformed hash
        (f"{server}/no-such-asset.js", 404),
        (f"{server}/pdf-pages/{'c' * 64}", 404),    # no extraction recorded
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(url)
        assert e.value.code == code

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/files/{VID}", {"Range": "bytes=99999999-"})
    assert e.value.code == 416


def test_on_demand_extraction_async(server, tmp_path, monkeypatch):
    """A never-extracted but known PDF is extracted off-request: the first
    GET returns 202 and the viewer polls until pages exist (web.py 202+poll
    flow replacing the old blocking in-request extraction)."""
    import time

    import slideo_tpu.io.pdf as iopdf
    import slideo_tpu.app.pipeline as pipeline

    h = "d" * 64
    pdf_file = tmp_path / "deck2.pdf"
    pdf_file.write_bytes(b"%PDF fake")
    db = Db(tmp_path / "slideo.db")
    db.update_hashes([(str(pdf_file), h)])
    db.close()

    started = threading.Event()
    release = threading.Event()

    def fake_pdfs_to_images(pdfs, db, reporter=None):
        started.set()
        assert release.wait(10)
        pages = tmp_path / "lazy_pages"
        pages.mkdir(exist_ok=True)
        (pages / "p-1.png").write_bytes(b"\x89PNG lazypage1")
        db.set_pdf_extracted_pages_dir(PdfExtractedPagesDir(h, pages, True))

    monkeypatch.setattr(iopdf, "have_poppler", lambda: True)
    monkeypatch.setattr(pipeline, "pdfs_to_images", fake_pdfs_to_images)

    r = _get(f"{server}/pdf-pages/{h}")
    assert r.status == 202
    assert json.loads(r.read()) == {"status": "extracting"}
    assert started.wait(10)
    # Still extracting: request thread is NOT blocked by the worker.
    assert _get(f"{server}/pdf-pages/{h}").status == 202
    release.set()
    for _ in range(100):
        r = _get(f"{server}/pdf-pages/{h}")
        if r.status == 200:
            break
        time.sleep(0.05)
    assert r.status == 200
    assert [p["page_idx"] for p in json.loads(r.read())] == [0]


def test_on_demand_extraction_failure_is_500(server, tmp_path, monkeypatch):
    import time

    import slideo_tpu.io.pdf as iopdf
    import slideo_tpu.app.pipeline as pipeline

    h = "e" * 64
    pdf_file = tmp_path / "deck3.pdf"
    pdf_file.write_bytes(b"%PDF broken")
    db = Db(tmp_path / "slideo.db")
    db.update_hashes([(str(pdf_file), h)])
    db.close()

    monkeypatch.setattr(iopdf, "have_poppler", lambda: True)

    def boom(pdfs, db, reporter=None):
        raise RuntimeError("pdftocairo exploded")

    monkeypatch.setattr(pipeline, "pdfs_to_images", boom)

    # First request either catches the job mid-flight (202) or, if the
    # worker already failed, reports 500 straight away.
    try:
        code = _get(f"{server}/pdf-pages/{h}").status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code in (202, 500)
    for _ in range(100):
        try:
            code = _get(f"{server}/pdf-pages/{h}").status
        except urllib.error.HTTPError as e:
            code = e.code
        if code == 500:
            break
        time.sleep(0.05)
    assert code == 500
