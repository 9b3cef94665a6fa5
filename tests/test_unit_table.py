"""Unit (passthrough) per-batch tables -- the round-4 streaming form.

The deferred weighted consolidation sorts every pending lane regardless of
per-batch aggregation (static shapes), so StreamingCounter now emits raw
folded canonical keys (count.UnitTable) per batch and defers ALL counting
to the merge.  These tests pin the equivalences that make that legal:
unit-mode tables merge to the exact same CountTable as compact per-batch
counting, across narrow/wide keys, ragged validity, packed ingest and the
sharded route."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.core import u64 as u
from kmers_tpu.core.u64 import U64
from kmers_tpu.io import fastx
from kmers_tpu.parallel import count as count_ops
from kmers_tpu.parallel import pipeline
from kmers_tpu.parallel.count import UnitTable, UnitTableWide
from kmers_tpu.parallel.stream import StreamingCounter, _merge_bounded

RNG = np.random.default_rng(42)


def rand_reads(B, L, n_rate=0.05):
    return RNG.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L),
                      p=[(1 - n_rate) / 4] * 4 + [n_rate])


def table_dict(t):
    nu = int(t.n_unique)
    keys = np.asarray(t.keys.hi).astype(np.uint64) << 32 | np.asarray(
        t.keys.lo)
    return dict(zip(keys[:nu].tolist(),
                    np.asarray(t.counts)[:nu].tolist()))


def test_unit_table_invalid_lane_normalization():
    words = U64(jnp.asarray([1, 7, 0x7FFFFFFF], dtype=jnp.uint32),
                jnp.asarray([2, 8, 9], dtype=jnp.uint32))
    valid = jnp.asarray([True, False, True])
    t = count_ops.unit_table(words, valid)
    np.testing.assert_array_equal(np.asarray(t.keys.hi),
                                  [1, 0x80000000, 0x7FFFFFFF])
    np.testing.assert_array_equal(np.asarray(t.keys.lo), [2, 0, 9])
    assert t.capacity == 3


def test_empty_like_unit_table_is_all_dead():
    t = UnitTable(keys=U64(jnp.zeros(8, jnp.uint32),
                           jnp.zeros(8, jnp.uint32)))
    e = count_ops.empty_like_table(t)
    m = count_ops.merge_many([e])
    assert int(m.n_unique) == 0
    # an all-zeros UnitTable would instead claim 8 occurrences of key 0
    bad = count_ops.merge_many([t])
    assert int(bad.n_unique) == 1 and int(bad.counts[0]) == 8


@pytest.mark.parametrize("k", [15, 21, 31])
def test_unit_merge_equals_compact(k):
    reads = jnp.asarray(rand_reads(24, 70))
    res_u = pipeline.count_reads(reads, k, aggregate="unit")
    res_c = pipeline.count_reads(reads, k, aggregate="compact")
    assert isinstance(res_u.table, UnitTable)
    merged = count_ops.merge_many([res_u.table], max_k=k)
    assert table_dict(merged) == table_dict(res_c.table)
    assert (int(res_u.metrics["kmers_emitted"])
            == int(res_c.metrics["kmers_emitted"]))


def test_unit_merge_mixed_with_count_tables():
    k = 17
    r1, r2 = jnp.asarray(rand_reads(8, 50)), jnp.asarray(rand_reads(8, 50))
    t_unit = pipeline.count_reads(r1, k, aggregate="unit").table
    t_cnt = pipeline.count_reads(r2, k, aggregate="compact").table
    both = count_ops.merge_many([t_unit, t_cnt], max_k=k)
    ref = count_ops.merge_many([
        pipeline.count_reads(r1, k, aggregate="compact").table, t_cnt],
        max_k=k)
    assert table_dict(both) == table_dict(ref)


def test_unit_packed_ingest_equals_ascii():
    k = 19
    rows = rand_reads(16, 64, n_rate=0.1)
    words, validbits = fastx.pack_batch_np(rows)
    res_p = pipeline.count_reads_packed(jnp.asarray(words),
                                        jnp.asarray(validbits), k,
                                        aggregate="unit")
    res_a = pipeline.count_reads(jnp.asarray(rows), k, aggregate="compact")
    merged = count_ops.merge_many([res_p.table], max_k=k)
    assert table_dict(merged) == table_dict(res_a.table)


def test_wide_unit_merge_equals_compact():
    k = 45
    reads = jnp.asarray(rand_reads(16, 80))
    res_u = pipeline.count_reads_wide(reads, k, aggregate="unit")
    res_c = pipeline.count_reads_wide(reads, k, aggregate="compact")
    assert isinstance(res_u.table, UnitTableWide)
    merged = count_ops.merge_many_wide([res_u.table], max_k=k)
    nu = int(merged.n_unique)
    assert nu == int(res_c.table.n_unique)
    for part in ("hi", "lo"):
        for w in ("hi", "lo"):
            a = np.asarray(getattr(getattr(merged.keys, part), w))[:nu]
            b = np.asarray(getattr(getattr(res_c.table.keys, part), w))[:nu]
            np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(merged.counts)[:nu],
                                  np.asarray(res_c.table.counts)[:nu])


def test_merge_bounded_no_evict_slice_matches_evict_path():
    """The lax.cond fast path (free slice) must agree with the eviction
    path whenever both are applicable (n_unique == capacity exactly)."""
    k = 13
    reads = jnp.asarray(rand_reads(8, 40, n_rate=0.0))
    t = pipeline.count_reads(reads, k, aggregate="unit").table
    merged = count_ops.merge_many([t], max_k=k)
    nu = int(merged.n_unique)
    z = jnp.zeros(nu, dtype=jnp.uint32)
    empty = count_ops.CountTable(keys=U64(z, z),
                                 counts=jnp.zeros(nu, jnp.int32),
                                 n_unique=jnp.int32(0))
    # capacity exactly n_unique: cond takes the no-evict branch
    out, du, dk = _merge_bounded(empty, (t,), nu, max_k=k)
    assert int(du) == 0 and int(dk) == 0
    assert table_dict(out) == table_dict(merged)
    # capacity n_unique - 1: eviction branch drops exactly one entry
    out2, du2, dk2 = _merge_bounded(
        count_ops.empty_like_table(
            count_ops.CountTable(keys=U64(z[:nu - 1], z[:nu - 1]),
                                 counts=jnp.zeros(nu - 1, jnp.int32),
                                 n_unique=jnp.int32(0))),
        (t,), nu - 1, max_k=k)
    assert int(du2) == 1
    d_all, d_kept = table_dict(merged), table_dict(out2)
    dropped = set(d_all) - set(d_kept)
    assert len(dropped) == 1
    (dkey,) = dropped
    # lowest count evicted first, ties evict the largest key
    min_c = min(d_all.values())
    assert d_all[dkey] == min_c
    assert dkey == max(kk for kk, c in d_all.items() if c == min_c)
    assert int(dk2) == d_all[dkey]


def test_streaming_counter_uses_unit_mode():
    assert StreamingCounter(31, capacity=64)._aggregate == "unit"
    assert StreamingCounter(32, capacity=64)._aggregate == "runlength"
    assert StreamingCounter(33, capacity=64)._aggregate == "unit"
    assert StreamingCounter(63, capacity=64)._aggregate == "unit"
    assert StreamingCounter(64, capacity=64)._aggregate == "runlength"


@pytest.mark.parametrize("k", [32, 64])
def test_streaming_k32_k64_fallback_still_exact(k):
    """k = 32 / 64 have no spare flag bit; the run-length fallback must
    stay bit-exact (full-width keys, the MASK_TABLE[32] quirk zone)."""
    reads = rand_reads(12, 70)
    sc = StreamingCounter(k, capacity=4096, merge_every=3)
    for i in range(0, 12, 4):
        sc.update(jnp.asarray(reads[i:i + 4]))
    pairs = dict(sc.to_pairs())
    if k == 32:
        res = pipeline.count_reads(jnp.asarray(reads), k,
                                   aggregate="compact")
        assert pairs == table_dict(res.table)
    else:
        res = pipeline.count_reads_wide(jnp.asarray(reads), k,
                                        aggregate="compact")
        nu = int(res.table.n_unique)
        from kmers_tpu.core import u128 as u128mod
        keys = u128mod.to_python_ints(res.table.keys)[:nu]
        cts = np.asarray(res.table.counts)[:nu]
        assert pairs == {a: int(b) for a, b in zip(keys, cts)}
