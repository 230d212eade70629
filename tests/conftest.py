"""Test fixture: force CPU backend with 8 fake devices so the full
multi-chip sharding path (shard_map over a (temp, chain) mesh, ppermute
swaps, psum adaptation reductions) is exercised without TPU pod hardware.

This mirrors the reference's "validation ladder" gap: OthmanB/TAMCMC-C- has
no automated tests (SURVEY.md section 4); we build the pyramid it lacks.
MUST run before any `import jax` anywhere in the test process.
"""
import os
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile time sane in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# XLA:CPU compiles are slow in this sandbox — persistent cache makes reruns fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# The sandbox injects /root/.axon_site (PYTHONPATH) which force-prepends the
# experimental 'axon' TPU platform, SILENTLY OVERRIDING JAX_PLATFORMS=cpu.
# Tests must run on the real host CPU (8 fake devices for mesh tests), so we
# override back explicitly — config.update after import wins over the hook.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tamcmc_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
