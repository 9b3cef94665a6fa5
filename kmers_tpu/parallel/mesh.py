"""Device mesh setup (SURVEY.md §5.8).

The reference has no distributed code; this subsystem is designed TPU-first:
``jax.sharding.Mesh`` + ``shard_map``, XLA collectives over ICI/DCN.

Mesh axes used by the framework:
  * ``"d"`` -- data/shard axis: reads are data-parallel over it, and the
    k-mer hash space is range-partitioned over it (each device owns the
    k-mers whose hash-prefix == its index).
  * ``"s"`` (optional) -- sequence axis for long-contig sequence
    parallelism with (k-1)-base halo exchange (see parallel.halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              seq_shards: int = 1) -> Mesh:
    """Build a ("d",) or ("d", "s") mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if seq_shards == 1:
        return Mesh(np.asarray(devices[:n]), axis_names=("d",))
    if n % seq_shards:
        raise ValueError(f"n={n} not divisible by seq_shards={seq_shards}")
    arr = np.asarray(devices[:n]).reshape(n // seq_shards, seq_shards)
    return Mesh(arr, axis_names=("d", "s"))


def batch_sharding(mesh: Mesh):
    """Sharding for a [batch, ...] array: batch split over 'd'."""
    return NamedSharding(mesh, P("d"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def process_local_batch(global_batch: int, mesh: Mesh) -> int:
    """Per-device batch size (ceil)."""
    d = mesh.shape["d"]
    return (global_batch + d - 1) // d
