"""JAX persistent compilation cache setup.

First-call compiles of the full-size matcher are tens of seconds; enabling
jax's persistent cache makes every rerun of the CLI/bench skip them (the
reference has no compile step — this recovers the gap for warm runs).

Opt out with SLIDEO_COMPILE_CACHE=0; override the location with
SLIDEO_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    loc = os.environ.get("SLIDEO_COMPILE_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "slideo-jax-cache",
        )
    try:
        import jax

        if jax.default_backend() == "cpu":
            # CPU AOT cache entries are machine-feature sensitive (loader
            # warns about SIGILL on feature mismatch) and CPU compiles are
            # only a test concern; cache accelerator compiles only.
            return
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: compile cache is an optimization only
