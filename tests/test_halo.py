"""Sequence parallelism (halo exchange) + sharded minimizer bucketing."""

import collections
import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.core import u64 as u
from kmers_tpu.core.u64 import U64
from kmers_tpu.core import u128 as u128
from kmers_tpu.oracle import numpy_ref as o
from kmers_tpu.parallel import count as count_ops
from kmers_tpu.parallel import mesh as mesh_ops, pipeline

RNG = random.Random(777)


def requires_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def rand_seq(n, alphabet=b"ACGT"):
    return bytes(RNG.choice(alphabet) for _ in range(n))


def _shard_tables(t, wide=False):
    for d in range(t.counts.shape[0]):
        if wide:
            yield count_ops.CountTableWide(
                keys=u128.U128(U64(t.keys.hi.hi[d], t.keys.hi.lo[d]),
                               U64(t.keys.lo.hi[d], t.keys.lo.lo[d])),
                counts=t.counts[d], n_unique=t.n_unique[d])
        else:
            yield count_ops.CountTable(
                keys=U64(t.keys.hi[d], t.keys.lo[d]),
                counts=t.counts[d], n_unique=t.n_unique[d])


def _pairs(table, wide=False):
    nu = int(table.n_unique)
    if wide:
        keys = u128.to_python_ints(table.keys)[:nu]
    else:
        keys = [int(x) for x in u.to_numpy(table.keys)[:nu]]
    return list(zip(keys, (int(c) for c in np.asarray(table.counts)[:nu])))


@pytest.mark.parametrize("k", [21, 63])
def test_sequence_parallel_counter_vs_oracle(k):
    """One long sequence with Ns sharded over 8 devices: counts must equal
    a single-sequence oracle count (windows across cuts included)."""
    requires_8()
    G = 8 * 64
    seq = bytearray(rand_seq(G))
    for _ in range(5):
        seq[RNG.randrange(G)] = ord("N")
    seq = bytes(seq)
    m = mesh_ops.make_mesh(8)
    counter = pipeline.make_sequence_parallel_counter(
        m, k, route_capacity=128)
    arr = jax.device_put(
        jnp.asarray(np.frombuffer(seq, dtype=np.uint8)),
        mesh_ops.batch_sharding(m))
    res = counter(arr)
    assert int(res.metrics["route_overflow"]) == 0
    wide = k > 32
    got = collections.Counter()
    for shard in _shard_tables(res.table, wide):
        for key, c in _pairs(shard, wide):
            assert key not in got
            got[key] += c
    want = collections.Counter()
    for p in range(G - k + 1):
        sub = seq[p:p + k]
        if all(o.encode_binary_u8(x) < 4 for x in sub):
            if wide:
                want[o.canonical_wide(o.word_from_bytes_wide(sub), k)] += 1
            else:
                fw = o.word_from_bytes(sub)
                want[min(fw, o.reverse_complement_word(fw, k))] += 1
    assert sorted(got.items()) == sorted(want.items()), f"k={k}"
    assert int(res.metrics["kmers_emitted"]) == sum(want.values())


def test_sharded_minimizer_counter_vs_oracle():
    requires_8()
    k, w, L = 31, 11, 64
    reads = [rand_seq(L) for _ in range(16)]
    m = mesh_ops.make_mesh(8)
    counter = pipeline.make_sharded_minimizer_counter(
        m, k, w, route_capacity=128, seed=9)
    batch = jnp.asarray(
        np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads]))
    res = counter(jax.device_put(batch, mesh_ops.batch_sharding(m)))
    assert int(res.metrics["route_overflow"]) == 0
    got = collections.Counter()
    for shard in _shard_tables(res.table):
        for key, c in _pairs(shard):
            assert key not in got
            got[key] += c
    # oracle: per-kmer minimizer via brute-force scan (deque-equivalent)
    state = o.mix_hash_state(9)
    want = collections.Counter()
    for r in reads:
        for p in range(L - k + 1):
            fw = o.word_from_bytes(r[p:p + k])
            mm, _ = o.minimizer_word(fw, k, w, state)
            want[mm] += 1
    assert sorted(got.items()) == sorted(want.items())
    assert int(res.metrics["kmers_emitted"]) == 16 * (L - k + 1)
