"""Content hashing: SHA-256 of file bytes is a file's identity
(reference: crates/app/src/utils.rs:28-33), so moved/renamed files keep
their cache entries. Hashing is parallel over files (rayon in the reference,
a thread pool here: file IO releases the GIL). A native C++ hasher is used
when built (slideo_tpu.native); hashlib otherwise.
"""

from __future__ import annotations

import hashlib
import tempfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

_CHUNK = 1 << 20


def hash_file(path: Path) -> str:
    try:
        from ..native import sha256_file  # optional C++ fast path

        h = sha256_file(str(path))
        if h:
            return h
    except Exception:
        pass
    sha = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(_CHUNK)
            if not chunk:
                break
            sha.update(chunk)
    return sha.hexdigest()


def hash_files(paths: list[Path], workers: int = 8) -> list[str]:
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(hash_file, paths))


def hash_str(value: str) -> str:
    return hashlib.sha256(value.encode()).hexdigest()


def get_temp_path() -> Path:
    """$TMP/pdf-video-sync (reference: utils.rs:10-14)."""
    return Path(tempfile.gettempdir()) / "pdf-video-sync"


def get_temp_path_key(category: str, key: str) -> Path:
    """$TMP/pdf-video-sync/{category}-{sha256(key)[0..20]} (utils.rs:24-26)."""
    return get_temp_path() / f"{category}-{hash_str(key)[:20]}"
