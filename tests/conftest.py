"""Test harness config: force an 8-device virtual CPU mesh (multi-chip
sharding tests run on CPU; real-TPU benchmarking happens in bench.py)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets 'axon' (real TPU); tests run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/zk_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
