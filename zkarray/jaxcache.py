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
import time
import warnings


# jit module names whose compiled XLA:CPU executables deterministically
# SEGFAULT in executable.serialize() during persistent-cache writes on this
# box (jax 0.9; reproduced twice each in round 4: a full suite run died at
# test_gt and two pairing runs died at the BN254 final-exp glue). Their
# cache writes are skipped — they recompile each cold run, everything else
# stays cached. Extend via ZKARRAY_CACHE_WRITE_DENY=name1,name2.
_SERIALIZE_DENY = (
    "_fe_hard_glue",
    "cyclotomic_exp",
    "fp12_pow_const",
    "jit_gt_",  # anchored: only gt.py's own jits, not any name containing "gt_"
)


def _install_serialize_guard(cc_mod):
    """Skip persistent-cache writes for executables known to crash
    ``executable.serialize()`` (XLA:CPU fault — the write segfaults the
    whole interpreter, killing test runs midway). A fork-canary variant was
    tried first and aborted too (fork in a threaded XLA runtime), so a
    module-name denylist is the working mitigation."""
    orig = cc_mod.put_executable_and_time
    if getattr(orig, "_zkarray_guarded", False):
        return

    def guarded(cache_key, module_name, executable, backend, compile_time):
        # env re-read per call: tests shield additional executables (e.g.
        # the BW6-767 Miller loop, whose L=48 graph also hits the fault)
        deny = tuple(_SERIALIZE_DENY) + tuple(
            d for d in os.environ.get("ZKARRAY_CACHE_WRITE_DENY", "").split(",") if d
        )
        name = str(module_name)
        # the serialize() fault is XLA:CPU-only — TPU executables cache fine
        # (and the pairing compiles are minutes-long through the tunnel)
        try:
            is_cpu = getattr(backend, "platform", "cpu") == "cpu"
        except Exception:
            is_cpu = True
        if is_cpu and any(d in name for d in deny):
            warnings.warn(
                f"skipping persistent-cache write for '{name}' "
                "(XLA:CPU serialize-crash denylist; see zkarray/jaxcache.py)"
            )
            return
        return orig(cache_key, module_name, executable, backend, compile_time)

    guarded._zkarray_guarded = True
    cc_mod.put_executable_and_time = guarded


def setup_cache(cache_dir: str | None = None):
    """Enable the persistent compilation cache at ``cache_dir`` (default:
    ``<repo>/.jax_cache``) and force zlib entry compression. Returns jax."""
    import jax

    try:
        import jax._src.compilation_cache as _cc

        _cc.zstd = None
        _cc.zstandard = None  # fall back to zlib (see module docstring)
        _install_serialize_guard(_cc)
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
