"""SQLite cache: schema, two-phase protocols, viewer JSON contract."""

from pathlib import Path

from slideo_tpu.app.db import Db, PdfExtractedPagesDir


def _db(tmp_path) -> Db:
    return Db(tmp_path / "slideo.db")


def test_update_hashes_replaces(tmp_path):
    db = _db(tmp_path)
    db.update_hashes([("/a.pdf", "h1"), ("/b.mp4", "h2")])
    assert db.get_path("h1") == Path("/a.pdf")
    # moved file: same hash, new path (delete-then-insert semantics)
    db.update_hashes([("/moved.pdf", "h1")])
    assert db.get_path("h1") == Path("/moved.pdf")
    assert db.get_path("h2") == Path("/b.mp4")
    assert db.get_path("missing") is None


def test_video_two_phase_and_mapping_info(tmp_path):
    db = _db(tmp_path)
    assert db.find_mapping_info("v1") is None
    db.create_or_reset_video("v1", ["p1", "p2"])
    info = db.find_mapping_info("v1")
    assert not info.finished and sorted(info.pdf_hashes) == ["p1", "p2"]
    db.update_video_matchings("v1", [(0, "p1", 0), (5000, None, None)])
    info = db.find_mapping_info("v1")
    assert info.finished
    # re-registering resets finished and clears matchings (FK cascade)
    db.create_or_reset_video("v1", ["p1"])
    assert not db.find_mapping_info("v1").finished
    assert db.get_pdf_video_matchings("p1") == []


def test_pdf_matchings_json_contract(tmp_path):
    """Row shape + duration computation per db.rs:212-271."""
    db = _db(tmp_path)
    db.create_or_reset_video("v1", ["p1", "p2"])
    db.update_video_matchings(
        "v1",
        [
            (0, "p1", 0),       # page 1 from 0ms
            (5000, "p2", 3),    # other pdf (breaks the timeline for p1)
            (12000, "p1", 1),
            (20000, None, None),  # no slide visible (sentinel-ish)
        ],
    )
    rows = db.get_pdf_video_matchings("p1")
    assert rows == [
        {
            "video_offset_ms": 0,
            "pdf_hash": "p1",
            "video_hash": "v1",
            "page_idx": 0,
            "duration_ms": 5000,
        },
        {
            "video_offset_ms": 12000,
            "pdf_hash": "p1",
            "video_hash": "v1",
            "page_idx": 1,
            "duration_ms": 8000,
        },
    ]
    # last mapping of a video falls back to 5000ms duration
    db.create_or_reset_video("v2", ["p1"])
    db.update_video_matchings("v2", [(100, "p1", 4)])
    rows = db.get_pdf_video_matchings("p1")
    assert rows[-1]["video_hash"] == "v2" and rows[-1]["duration_ms"] == 5000


def test_pdf_extracted_pages_dir_roundtrip(tmp_path):
    db = _db(tmp_path)
    assert db.get_pdf_extracted_pages_dir("x") is None
    db.set_pdf_extracted_pages_dir(PdfExtractedPagesDir("x", tmp_path / "d", False))
    rec = db.get_pdf_extracted_pages_dir("x")
    assert rec.dir == tmp_path / "d" and not rec.finished
    db.set_pdf_extracted_pages_dir(PdfExtractedPagesDir("x", tmp_path / "d", True))
    assert db.get_pdf_extracted_pages_dir("x").finished


def test_concurrent_connections(tmp_path):
    db1 = _db(tmp_path)
    db2 = Db(tmp_path / "slideo.db")
    db1.update_hashes([("/a", "h1")])
    assert db2.get_path("h1") == Path("/a")
