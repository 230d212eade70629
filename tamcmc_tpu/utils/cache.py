"""Persistent XLA compilation cache.

Compiles are the scarce resource in this environment (remote TPU compile
service + a 2-vCPU host); cache them across processes.  NOTE: in the
installed jax 0.9.0 the JAX_COMPILATION_CACHE_DIR env var is NOT honoured —
only jax.config.update works, hence this helper.
"""

import os

import jax

_DONE = False


def ensure_cpu_fallback() -> None:
    """Make sure the host-CPU platform is registered alongside the TPU.

    The sandbox pins JAX_PLATFORMS=axon (TPU tunnel only); one-shot setup
    work (demo data generation, small evals) wants a CpuDevice.  Must run
    before the backend initialises.
    """
    try:
        plat = jax.config.jax_platforms
        if plat and "cpu" not in str(plat).split(","):
            jax.config.update("jax_platforms", f"{plat},cpu")
    except Exception:
        pass


def enable_compile_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _DONE = True
    except Exception:
        pass
