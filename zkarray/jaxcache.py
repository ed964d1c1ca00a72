"""Persistent XLA compilation-cache setup shared by the test suite, the
benchmark harness and the driver entry points.

Two quirks of this environment are handled here:

* jax's cache writer prefers the ``zstd``/``zstandard`` C extensions for
  entry compression and falls back to ``zlib`` when neither imports.
  ``zstandard.backend_c`` hard-segfaults this box's interpreter while
  compressing large executables (reproduced twice: compilation-cache write
  during an ``ifft`` compile killed the whole pytest process). Forcing the
  pure-zlib fallback costs a little write time and removes the crash.
* config updates must happen before the first backend use; callers invoke
  :func:`setup_cache` at import time.
"""

from __future__ import annotations

import os


def setup_cache(cache_dir: str | None = None):
    """Enable the persistent compilation cache at ``cache_dir`` (default:
    ``<repo>/.jax_cache``) and force zlib entry compression. Returns jax."""
    import jax

    try:
        import jax._src.compilation_cache as _cc

        _cc.zstd = None
        _cc.zstandard = None  # fall back to zlib (see module docstring)
    except Exception:
        pass

    if cache_dir is None:
        cache_dir = os.environ.get(
            "ZKARRAY_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache"),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return jax
