"""Persistent XLA compilation cache (round-3 VERDICT missing #5).

Compiles on this rig go through a remote axon compiler at ~30-400 s per
program geometry; identical programs were re-compiled on every CLI call,
bench run, and smoke-gate run. The JAX persistent cache eliminates that:
measured on the axon TPU backend, a cold vertical-encode compile of 8.0 s
drops to 1.9 s in a fresh process (and the 90 s bench-geometry compile to
seconds — see BASELINE.md).

Enabled from dctpu/__init__ for every consumer (CLI, bench, smoke gate,
tests). Controls:

  DCTPU_NO_COMPILE_CACHE=1      opt out entirely
  JAX_COMPILATION_CACHE_DIR     overrides the default cache directory
                                (~/.cache/dctpu/jax)

The cache is content-addressed by HLO + compile options + backend, so CPU
test processes and TPU runs coexist in one directory, and concurrent
writers (pytest-xdist) are safe: entries are written atomically.

Known cosmetic noise: loading a cached CPU executable logs an E-level
"machine type ... doesn't match" warning because XLA's synthetic
prefer-no-scatter/prefer-no-gather compile hints are not host CPUID
features. Compile and execution machine are identical here; executions
verified bit-exact (tests + smoke gate).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Point JAX at the persistent cache dir. Returns the dir (None if off)."""
    if os.environ.get("DCTPU_NO_COMPILE_CACHE"):
        return None
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "dctpu", "jax"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: the default thresholds skip small/fast programs,
        # but on this rig even "fast" compiles pay a remote-compiler round
        # trip, and disk is cheap relative to 30-400 s recompiles.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # never let cache plumbing break the codec
        return None
    return path
