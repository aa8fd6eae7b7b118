#!/usr/bin/env python3
"""Vendor pdf.js into the viewer's static assets for offline operation.

The reference embeds every webview asset in its binary via rust-embed
(/root/reference/crates/app/src/web.rs:69-71), so its viewer renders
vector pages fully offline. This build's viewer prefers a locally served
pdf.js (``/vendor/pdf.min.js``) and only falls back to the CDN when the
vendored copy is absent (viewer.js:tryOpenPdf). Release/CI builds run
this script before ``python -m build`` so the wheel ships self-contained;
dev checkouts without network keep the CDN fallback path.

Pinned to the same pdf.js release the CDN fallback uses, and verified by
content sniff (JS header + minimum size) before install — a truncated or
HTML-error download must not be published into the wheel.
"""

from __future__ import annotations

import sys
import urllib.request
from pathlib import Path

PDFJS_VERSION = "3.11.174"
BASE = f"https://cdnjs.cloudflare.com/ajax/libs/pdf.js/{PDFJS_VERSION}"
FILES = ("pdf.min.js", "pdf.worker.min.js")
DEST = (
    Path(__file__).resolve().parent.parent
    / "slideo_tpu"
    / "webview"
    / "static"
    / "vendor"
)


def fetch(name: str) -> bytes:
    url = f"{BASE}/{name}"
    with urllib.request.urlopen(url, timeout=60) as r:
        data = r.read()
    # Content sniff: cdnjs serves minified JS; an HTML error page or a
    # truncated body must fail the build, not ship in the wheel.
    if len(data) < 100_000 or data[:1] in (b"<",):
        raise RuntimeError(f"{url}: implausible payload ({len(data)} bytes)")
    return data


def main() -> int:
    DEST.mkdir(parents=True, exist_ok=True)
    for name in FILES:
        out = DEST / name
        data = fetch(name)
        out.write_bytes(data)
        print(f"vendored {out.relative_to(DEST.parent.parent.parent)} "
              f"({len(data) // 1024} KiB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
