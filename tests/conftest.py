"""Test harness config: force the CPU backend with an 8-device virtual mesh.

IMPORTANT: sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (single real TPU through a tunnel), so mutating
os.environ here is too late/unreliable — jax.config.update is the only
dependable override. Real-TPU benchmarking happens in bench.py only.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/zk_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """One-process full-suite runs used to die at ~60% from accumulated
    jit executables (test_parallel alone holds ~13 GB RSS). Dropping the
    in-memory executable cache between modules bounds peak RSS; the
    on-disk persistent cache keeps re-jits cheap."""
    yield
    jax.clear_caches()
    gc.collect()
