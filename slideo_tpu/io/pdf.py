"""Poppler subprocess wrappers: pdfinfo + pdftocairo.

Replaces crates/pdftocairo/src/{pdf_info.rs,pdftocairo.rs}: run the poppler
CLI tools, poll the output directory for progress (pdftocairo.rs:195-213),
and parse ``p-NN.png`` filenames into sorted page numbers
(pdftocairo.rs:217-232).

Poppler may be absent (e.g. CI containers); ``have_poppler()`` gates the
feature and the cache's pre-extracted-pages path keeps everything else
testable without it.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import threading
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

__all__ = ["PdfInfo", "Page", "Options", "have_poppler", "pdf_info", "pdftocairo"]

ProgressFn = Callable[[int, int, str], None]


@dataclass
class PdfInfo:
    pages: int
    raw: dict[str, str]


@dataclass
class Page:
    page_nr: int  # 1-based, like the reference (pdf_to_images.rs:18-31)
    image_path: Path


@dataclass
class Options:
    """Subset of pdftocairo options the reference models (pdftocairo.rs:81-138)."""

    format: str = "png"          # png | jpeg | pdf | svg | eps
    color: str = "color"         # color | mono | gray
    first_page: int | None = None
    last_page: int | None = None
    pages: str = "all"           # all | odd | even
    scale_to: int | None = None  # -scale-to (longest side, px)
    reuse_target_dir_content: bool = True


_POPPLER_PATH_DONE = False


def _ensure_poppler_on_path() -> None:
    """Prepend a vendored/env-pointed poppler to PATH once per process.

    Mirrors the reference's Windows bundling: its release unpacks a
    poppler build next to the binary and prepends it to PATH at startup
    (/root/reference/.github/workflows/release.yml:118-126,
    crates/app/src/main.rs:44-45). Here the Windows release bundle ships
    poppler under slideo_tpu/_vendor/poppler (release.yml build-windows
    job); SLIDEO_POPPLER_DIR overrides for custom installs.
    """
    global _POPPLER_PATH_DONE
    if _POPPLER_PATH_DONE:
        return
    _POPPLER_PATH_DONE = True
    pkg = Path(__file__).resolve().parent.parent
    candidates = []
    env_dir = os.environ.get("SLIDEO_POPPLER_DIR")
    if env_dir:
        candidates.append(Path(env_dir))
    vend = pkg / "_vendor" / "poppler"
    # poppler-windows release layout and plain bin/ layouts
    candidates += [vend / "Library" / "bin", vend / "bin", vend]
    for c in candidates:
        if c.is_dir():
            os.environ["PATH"] = str(c) + os.pathsep + os.environ.get("PATH", "")
            break


def have_poppler() -> bool:
    _ensure_poppler_on_path()
    return shutil.which("pdftocairo") is not None and shutil.which("pdfinfo") is not None


def pdf_info(pdf: Path) -> PdfInfo:
    """Run ``pdfinfo`` and parse its ``Key: Value`` lines (pdf_info.rs:16-46)."""
    _ensure_poppler_on_path()
    out = subprocess.run(
        ["pdfinfo", str(pdf)], capture_output=True, text=True, check=True
    ).stdout
    raw: dict[str, str] = {}
    for line in out.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            raw[k.strip()] = v.strip()
    return PdfInfo(pages=int(raw.get("Pages", "0")), raw=raw)


_PAGE_RE = re.compile(r"^p-0*(\d+)\.(png|jpg|jpeg)$")


def _scan_pages(target_dir: Path) -> list[Page]:
    pages = []
    for f in target_dir.iterdir():
        m = _PAGE_RE.match(f.name)
        if m:
            pages.append(Page(page_nr=int(m.group(1)), image_path=f))
    pages.sort(key=lambda p: p.page_nr)
    return pages


def pdftocairo(
    pdf: Path,
    target_dir: Path,
    options: Options | None = None,
    progress: ProgressFn | None = None,
    total_pages: int | None = None,
) -> list[Page]:
    """Rasterize all pages to ``target_dir/p-NN.png``; returns sorted pages.

    Progress is reported by polling the output directory every 500 ms while
    the subprocess runs, exactly like the reference (pdftocairo.rs:195-213).
    """
    _ensure_poppler_on_path()
    options = options or Options()
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)

    if options.reuse_target_dir_content and any(target_dir.iterdir()):
        return _scan_pages(target_dir)

    cmd = ["pdftocairo", str(pdf), str(target_dir / "p"), f"-{options.format}"]
    if options.color == "mono":
        cmd.append("-mono")
    elif options.color == "gray":
        cmd.append("-gray")
    if options.pages == "odd":
        cmd.append("-o")
    elif options.pages == "even":
        cmd.append("-e")
    if options.first_page is not None:
        cmd += ["-f", str(options.first_page)]
    if options.last_page is not None:
        cmd += ["-l", str(options.last_page)]
    if options.scale_to is not None:
        cmd += ["-scale-to", str(options.scale_to)]

    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            n = sum(1 for _ in target_dir.iterdir())
            if progress and total_pages:
                progress(n, total_pages, f"Extracting pages of {pdf.name}...")
            time.sleep(0.5)

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()
    try:
        _, err = proc.communicate()
        if proc.returncode != 0:
            raise RuntimeError(
                f"pdftocairo failed ({proc.returncode}): {err.decode(errors='replace')}"
            )
    finally:
        stop.set()
        poller.join()
    return _scan_pages(target_dir)
