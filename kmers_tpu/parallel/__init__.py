"""Distributed layer: mesh setup, hash-prefix routing, sharded counting.

All new scope vs the reference (SURVEY.md §5.8) -- designed TPU-first:
shard_map over a jax.sharding.Mesh, XLA collectives (all_to_all / psum)
over ICI, fixed-capacity routing with overflow counters.
"""

from . import count, mesh, pipeline, route
from .count import CountTable, count_words, count_weighted, merge_tables, lookup
from .mesh import make_mesh, batch_sharding, replicated
from .pipeline import CountResult, count_reads, make_sharded_counter
from .route import Routed, owner_of

__all__ = [
    "count", "mesh", "pipeline", "route",
    "CountTable", "count_words", "count_weighted", "merge_tables", "lookup",
    "make_mesh", "batch_sharding", "replicated",
    "CountResult", "count_reads", "make_sharded_counter",
    "Routed", "owner_of",
]
