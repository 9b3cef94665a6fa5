"""Test configuration.

* Force an 8-device CPU mesh so sharding paths are exercised without TPU
  hardware (SURVEY.md §4: multi-host tests on CPU sim).
* Enable the persistent compilation cache: per-shape XLA compiles cost ~1s
  on this CPU, so tests keep array shapes canonical and reuse compiled
  executables across runs.

The environment may pre-register a real-TPU JAX backend at interpreter
startup (sitecustomize imports jax before this file runs and pins
``jax_platforms``), so setting env vars here is not enough: explicitly
re-point the jax config at CPU and clear any initialized backends.

KMERS_TPU_TEST_TPU=1 skips the CPU pinning so the ``tpu``-marked
on-device lane (tests/test_tpu_device.py) runs against the real chip:
``KMERS_TPU_TEST_TPU=1 pytest -m tpu``.  Off-TPU those tests skip.
"""

import os

_WANT_TPU = bool(os.environ.get("KMERS_TPU_TEST_TPU"))

if not _WANT_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_kmers_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

if not _WANT_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:  # pragma: no cover - best effort on older jax
        pass
