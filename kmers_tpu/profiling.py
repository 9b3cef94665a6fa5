"""Tracing / profiling / roofline accounting (SURVEY.md §5.1).

The reference ships only criterion wall-clock benches; the TPU build's
observability story:

  * ``trace(logdir)`` -- context manager around ``jax.profiler`` for
    XProf/TensorBoard traces of any pipeline section.
  * ``Timer`` -- dispatch-aware wall timing (block_until_ready fenced).
  * ``roofline`` -- achieved-bandwidth fraction for a measured op given its
    per-element HBM traffic (the north-star metric for the pack kernel).
  * ``MetricsAccumulator`` -- host-side aggregation of the pipelines'
    counter dicts (reads, kmers_emitted, windows_skipped, route_overflow,
    route_bytes).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterable, Optional

import jax

#: peak HBM bandwidth by device kind substring (GB/s)
HBM_GBPS = {"v5e": 819.0, "v5 lite": 819.0, "v5litepod": 819.0,
            "v4": 1228.0, "v5p": 2765.0, "v6e": 1640.0, "v6lite": 1640.0}


def device_hbm_gbps(device=None) -> float:
    """Peak HBM bandwidth of `device` (GB/s).

    Fails loudly on an unknown TPU rather than silently assuming a v5e
    denominator -- a wrong peak makes every roofline fraction fiction
    (bench.py shares this implementation).  ``KMERS_TPU_HBM_GBPS``
    overrides; non-TPU backends get the v5e figure as a nominal-only
    number for CPU smoke runs."""
    override = os.environ.get("KMERS_TPU_HBM_GBPS")
    if override:
        return float(override)
    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower().replace(" ", "")
    for key, bw in HBM_GBPS.items():
        if key.replace(" ", "") in kind:
            return bw
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower().replace(" ", "")
    if gen in HBM_GBPS:
        return HBM_GBPS[gen]
    if dev.platform == "tpu":
        raise RuntimeError(
            f"unknown TPU device_kind {dev.device_kind!r}: add its peak HBM "
            f"GB/s to profiling.HBM_GBPS or set KMERS_TPU_HBM_GBPS")
    return HBM_GBPS["v5e"]


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace of the enclosed block (view with XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing with async-dispatch fencing.

    Protocol (see bench.py): warm up first, cycle distinct input buffers,
    block once per round on the last output.
    """

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def round(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def best(self) -> float:
        return min(self.times)

    def rate(self, items: int) -> float:
        """items/sec at the best round."""
        return items / self.best


def roofline(rate_items_per_s: float, bytes_per_item: float,
             device=None) -> Dict[str, float]:
    """Achieved-vs-peak HBM bandwidth for a measured op."""
    peak = device_hbm_gbps(device) * 1e9
    achieved = rate_items_per_s * bytes_per_item
    return {
        "achieved_gbps": achieved / 1e9,
        "peak_gbps": peak / 1e9,
        "fraction": achieved / peak,
    }


class MetricsAccumulator:
    """Sums the metrics dicts returned by pipeline steps."""

    def __init__(self):
        self.totals: Dict[str, int] = {}
        self.steps = 0

    def update(self, metrics: Dict) -> None:
        for k, v in metrics.items():
            self.totals[k] = self.totals.get(k, 0) + int(v)
        self.steps += 1

    def __getitem__(self, key: str) -> int:
        return self.totals.get(key, 0)

    def summary(self) -> Dict[str, int]:
        return dict(self.totals, steps=self.steps)
