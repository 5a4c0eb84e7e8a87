"""Host platform plumbing.

This box's ``sitecustomize`` force-registers an experimental TPU PJRT
plugin and then sets ``jax.config.jax_platforms`` PROGRAMMATICALLY, which
silently overrides the ``JAX_PLATFORMS`` environment variable. CLIs call
``honor_jax_platforms_env()`` early so ``JAX_PLATFORMS=cpu python
tools/train.py ...`` really runs on CPU.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` over any programmatic override.

    No-op when the variable is unset or a backend is already initialized.
    """
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except RuntimeError:
        pass  # backend already initialized; too late to switch


def setup_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compile cache for this process.

    The flagship train graphs take minutes to compile on this host; every
    CLI calls this so repeat runs (and crashed/timed-out runs) reuse
    compiled executables. ``JAX_COMPILATION_CACHE_DIR`` overrides the
    default /tmp/jax_cache.
    """
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
