"""Weak-scaling invariants on the CPU mesh (VERDICT r1 item 5).

On real hardware, weak scaling (fixed per-device batch) holds when the
per-device compute AND per-device communication volume are independent of
the device count D.  Wall-clock cannot evidence that on this host -- the 8
"devices" are virtual and share 2 physical cores, so per-step time grows
with D by construction -- but the volume invariants CAN be asserted
exactly, and they are what the ICI model in docs/design.md consumes:

  * per-device all_to_all payload: with route capacity C(D) = S/D (S =
    per-device lane budget with slack), the [D, C] send buffer is S lanes
    regardless of D;
  * per-shard table capacity: passes * D * C(D) = passes * S, D-invariant;
  * exactness: the merged counts equal the oracle's at every D.
"""

import collections

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.oracle import numpy_ref as o
from kmers_tpu.parallel import make_sharded_counter, mesh as mesh_ops
from kmers_tpu.parallel import pipeline

RNG = np.random.default_rng(555)

K = 21
READS_PER_DEV = 8
L = 64
S = 1024  # per-device routed-lane budget (slack over 8*44 = 352 expected)


def make_reads(n_reads, seed):
    rng = np.random.default_rng(seed)
    reads = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                       size=(n_reads, L), p=[0.2475] * 4 + [0.01])
    return reads


def oracle_counts(reads):
    c = collections.Counter()
    for row in reads:
        it = o.CanonicalKmerIterator(bytes(row), K)
        while not it.exhausted():
            km, _pos = it.get()
            c[km.get_canonical_word()] += 1
            it.inc()
    return c


def table_counts(result):
    t = result.table
    out = collections.Counter()
    d = t.counts.shape[0]
    for s in range(d):
        nu = int(t.n_unique[s])
        hi = np.asarray(t.keys.hi[s][:nu], dtype=np.uint64)
        lo = np.asarray(t.keys.lo[s][:nu], dtype=np.uint64)
        cnt = np.asarray(t.counts[s][:nu])
        for h, l, c in zip(hi, lo, cnt):
            out[int(h) << 32 | int(l)] += int(c)
    return out


@pytest.mark.parametrize("d", [1, 2, 4, 8])
def test_weak_scaling_volume_invariants(d):
    mesh = mesh_ops.make_mesh(d)
    cap = S // d
    counter = make_sharded_counter(mesh, k=K, route_capacity=cap)
    reads = make_reads(READS_PER_DEV * d, seed=7)  # same per-device load
    res = counter(jax.device_put(jnp.asarray(reads),
                                 mesh_ops.batch_sharding(mesh)))
    jax.block_until_ready(res)

    # no silent loss at this slack
    assert int(res.metrics["route_overflow"]) == 0
    # per-device all_to_all payload is D-invariant: total bytes = D * S * 9
    assert int(res.metrics["route_bytes"]) == d * S * 9
    # per-shard table capacity is D-invariant (passes * D * C(D) = S)
    assert res.table.counts.shape == (d, S)
    # bit-exact vs the scalar oracle at every D
    assert table_counts(res) == oracle_counts(reads)


def test_weak_scaling_minimizer_and_wide(monkeypatch):
    """Same volume invariants for the minimizer-bucketing and wide (k=63)
    sharded counters at D in {2, 8}."""
    for d in (2, 8):
        mesh = mesh_ops.make_mesh(d)
        cap = S // d
        mini = pipeline.make_sharded_minimizer_counter(
            mesh, k=21, w=7, route_capacity=cap, route_passes=2)
        reads = make_reads(READS_PER_DEV * d, seed=11)
        res = mini(jax.device_put(jnp.asarray(reads),
                                  mesh_ops.batch_sharding(mesh)))
        assert res.table.counts.shape == (d, 2 * S)

        wide = pipeline.make_sharded_counter_wide(
            mesh, k=63, route_capacity=cap)
        res_w = wide(jax.device_put(jnp.asarray(reads),
                                    mesh_ops.batch_sharding(mesh)))
        assert res_w.table.counts.shape == (d, S)
        assert int(res_w.metrics["route_overflow"]) == 0
