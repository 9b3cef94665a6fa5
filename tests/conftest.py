"""Test configuration.

* Force an 8-device CPU mesh so sharding paths are exercised without TPU
  hardware (SURVEY.md §4: multi-host tests on CPU sim).
* Enable the persistent compilation cache: per-shape XLA compiles cost ~1s
  on this CPU, so tests keep array shapes canonical and reuse compiled
  executables across runs.
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_kmers_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
