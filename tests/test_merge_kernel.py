"""Streaming-consolidation kernels (round 5, VERDICT r4 item 1):
merge-path sorted merge + flagged compress, and the full fast-path
consolidation's bit-identity with the sort-based reference path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.core.u64 import U64
from kmers_tpu.kernels.merge import compress_flagged, merge_sorted
from kmers_tpu.parallel import count as count_ops
from kmers_tpu.parallel.count import CountTable, UnitTable

RNG = np.random.default_rng(420)


def sorted_table_planes(n_live, cap, bits):
    # duplicates in A are fine for merge_sorted itself (real tables have
    # unique keys, but the kernel doesn't require it)
    keys = np.sort(RNG.integers(0, 1 << bits, n_live).astype(np.uint64))
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    w = np.zeros(cap, np.uint32)
    hi[:n_live] = (keys >> 32).astype(np.uint32)
    lo[:n_live] = (keys & 0xFFFFFFFF).astype(np.uint32)
    w[:n_live] = RNG.integers(1, 50, n_live)
    return hi, lo, w, keys, w[:n_live].copy()


@pytest.mark.parametrize("nA,capA,nB,totB,tile,bits", [
    (700, 1024, 900, 1024, 1024, 20),
    (0, 512, 300, 512, 1024, 8),
    (512, 512, 0, 512, 1024, 8),
    (15, 1024, 3000, 4096, 1024, 4),      # heavy duplicates across A/B
    (5000, 8192, 9000, 16384, 8192, 11),  # production tile size
])
def test_merge_sorted_matches_numpy(nA, capA, nB, totB, tile, bits):
    a_hi, a_lo, a_w, ka, wa = sorted_table_planes(nA, capA, bits)
    kb = np.sort(RNG.integers(0, 1 << bits, nB).astype(np.uint64))
    b_hi = np.full(totB, 0x80000000, np.uint32)
    b_lo = np.zeros(totB, np.uint32)
    b_hi[:nB] = (kb >> 32).astype(np.uint32)
    b_lo[:nB] = (kb & 0xFFFFFFFF).astype(np.uint32)
    o_hi, o_lo, o_w = (np.asarray(x) for x in merge_sorted(
        jnp.asarray(a_hi), jnp.asarray(a_lo), jnp.asarray(a_w),
        jnp.asarray(b_hi), jnp.asarray(b_lo), tile=tile, interpret=True))
    n_live = nA + nB
    got_valid = (o_hi >> 31) == 0
    assert got_valid[:n_live].all() and not got_valid[n_live:].any()
    got_keys = (o_hi.astype(np.uint64) << 32) | o_lo.astype(np.uint64)
    assert (np.diff(got_keys[:n_live].astype(np.int64)) >= 0).all()
    ref = sorted(list(zip(ka.tolist(), wa.tolist()))
                 + [(k, 1) for k in kb.tolist()])
    got = sorted(zip(got_keys[:n_live].tolist(), o_w[:n_live].tolist()))
    assert got == ref
    assert o_w[:n_live].sum() == wa.sum() + nB


@pytest.mark.parametrize("n,p_keep", [
    (16384, 0.3), (3 * 16384, 0.9), (4 * 16384, 0.01), (130000, 0.33),
    (16384, 0.0), (16384, 1.0),
])
def test_compress_flagged_matches_numpy(n, p_keep):
    hi = RNG.integers(0, 2**31, n, dtype=np.uint32)
    lo = RNG.integers(0, 2**32, n, dtype=np.uint32)
    pay = RNG.integers(0, 2**32, n, dtype=np.uint32)
    keep = (RNG.random(n) < p_keep).astype(np.uint8)
    o_hi, o_lo, o_pay = (np.asarray(x) for x in compress_flagged(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay),
        jnp.asarray(keep), interpret=True))
    m = keep.astype(bool)
    cnt = int(m.sum())
    np.testing.assert_array_equal(o_hi[:cnt], hi[m])
    np.testing.assert_array_equal(o_lo[:cnt], lo[m])
    np.testing.assert_array_equal(o_pay[:cnt], pay[m])


def make_table_and_units(cap, n_live, n_units, valid_frac, bits):
    t_hi = np.zeros(cap, np.uint32)
    t_lo = np.zeros(cap, np.uint32)
    t_c = np.zeros(cap, np.int32)
    keys = np.sort(RNG.choice(1 << bits, size=min(n_live, 1 << bits),
                              replace=False).astype(np.uint64))
    n_live = keys.size
    t_hi[:n_live] = (keys >> 32).astype(np.uint32)
    t_lo[:n_live] = (keys & 0xFFFFFFFF).astype(np.uint32)
    t_c[:n_live] = RNG.integers(1, 100, n_live)
    table = CountTable(keys=U64(jnp.asarray(t_hi), jnp.asarray(t_lo)),
                       counts=jnp.asarray(t_c), n_unique=jnp.int32(n_live))
    u_keys = RNG.integers(0, 1 << bits, n_units).astype(np.uint64)
    uv = RNG.random(n_units) < valid_frac
    u_hi = np.where(uv, (u_keys >> 32).astype(np.uint32),
                    0x80000000).astype(np.uint32)
    u_lo = np.where(uv, (u_keys & 0xFFFFFFFF).astype(np.uint32),
                    0).astype(np.uint32)
    return table, UnitTable(keys=U64(jnp.asarray(u_hi), jnp.asarray(u_lo)))


@pytest.mark.parametrize("cap,n_live,n_units,valid_frac,bits", [
    (4096, 3000, 8192, 0.8, 16),
    (4096, 0, 8192, 0.5, 8),
    (2048, 64, 4096, 1.0, 6),
    (1024, 512, 16384, 0.3, 30),
    (1024, 100, 2048, 0.0, 10),
])
def test_merge_table_with_sorted_units_matches_merge_many(
        cap, n_live, n_units, valid_frac, bits):
    table, unit = make_table_and_units(cap, n_live, n_units, valid_frac,
                                       bits)
    want = count_ops.merge_many([table, unit], max_k=31)
    s_hi, s_lo = jax.lax.sort((unit.keys.hi, unit.keys.lo), num_keys=2,
                              is_stable=False)
    got = count_ops.merge_table_with_sorted_units(table, U64(s_hi, s_lo),
                                                  interpret=True)
    nu = int(want.n_unique)
    assert int(got.n_unique) == nu
    np.testing.assert_array_equal(np.asarray(got.keys.hi)[:nu],
                                  np.asarray(want.keys.hi)[:nu])
    np.testing.assert_array_equal(np.asarray(got.keys.lo)[:nu],
                                  np.asarray(want.keys.lo)[:nu])
    np.testing.assert_array_equal(np.asarray(got.counts)[:nu],
                                  np.asarray(want.counts)[:nu])
    assert (np.asarray(got.counts)[nu:] == 0).all()
    assert (np.asarray(got.keys.hi)[nu:] == 0).all()


def test_streaming_counter_fast_path_matches_reference(monkeypatch):
    """Full StreamingCounter bit-identity: the Pallas fast-path
    consolidation (interpret lane) vs the sort-based path, same batches,
    incl. an eviction round."""
    import collections

    from kmers_tpu.oracle import numpy_ref as o
    from kmers_tpu.parallel.stream import StreamingCounter

    rng = np.random.default_rng(7)
    reads = [bytes(rng.choice(list(b"ACGTN"), 60,
                              p=[.24, .24, .24, .24, .04]).astype(np.uint8))
             for _ in range(24)]
    arrs = [jnp.asarray(np.frombuffer(b"".join(reads[i:i + 8]),
                                      dtype=np.uint8).reshape(8, 60))
            for i in range(0, 24, 8)]
    k = 17

    def run():
        sc = StreamingCounter(k, capacity=4096, merge_every=2)
        for a in arrs:
            sc.update(a)
        return sc

    monkeypatch.setenv("KMERS_TPU_STREAM_MERGE", "0")
    ref = run()
    monkeypatch.setenv("KMERS_TPU_STREAM_MERGE", "interpret")
    fast = run()
    assert fast.to_pairs() == ref.to_pairs()
    want = collections.Counter()
    for r in reads:
        for _, fw, rc in o.CanonicalKmerIterator(r, k):
            want[min(fw, rc)] += 1
    assert dict(fast.to_pairs()) == dict(want)

    # eviction round: tiny capacity forces the rank-evict branch on top
    # of the fast merged table (the dispatch mode is read at consolidate
    # time, so each counter runs fully under its own env setting)
    def run_small():
        sc = StreamingCounter(k, capacity=64, merge_every=2)
        for a in arrs:
            sc.update(a)
        sc._consolidate()
        return sc

    monkeypatch.setenv("KMERS_TPU_STREAM_MERGE", "0")
    sc_ref = run_small()
    monkeypatch.setenv("KMERS_TPU_STREAM_MERGE", "interpret")
    sc_fast = run_small()
    assert sc_fast.to_pairs() == sc_ref.to_pairs()
    assert sc_fast.dropped_kmers == sc_ref.dropped_kmers > 0
    assert sc_fast.dropped_unique == sc_ref.dropped_unique > 0


@pytest.mark.parametrize("cap,n_live,nq,bits,vf", [
    (1024, 700, 2048, 12, 1.0),
    (1024, 700, 2048, 12, 0.7),   # some invalid queries
    (512, 0, 1024, 8, 1.0),       # empty table
    (2048, 1500, 256, 40, 1.0),   # mostly-absent queries
])
def test_lookup_merge_matches_binary_search(cap, n_live, nq, bits, vf):
    """Round-5 merge-based lookup (one streaming merge + sorts) vs the
    binary-search reference -- identical answers incl. absent keys,
    duplicate queries, and invalid query lanes."""
    table, _ = make_table_and_units(cap, n_live, 1, 0, bits)
    q_keys = RNG.integers(0, 1 << bits, nq).astype(np.uint64)
    queries = U64(jnp.asarray((q_keys >> 32).astype(np.uint32)),
                  jnp.asarray((q_keys & 0xFFFFFFFF).astype(np.uint32)))
    valid = jnp.asarray(RNG.random(nq) < vf)
    got = np.asarray(count_ops.lookup_merge(table, queries, valid=valid,
                                            interpret=True))
    want = np.asarray(count_ops.lookup(table, queries))
    v = np.asarray(valid)
    np.testing.assert_array_equal(got[v], want[v])
    assert (got[~v] == 0).all()


def make_wide_table_and_units(cap, n_live, n_units, valid_frac, bits):
    from kmers_tpu.core.u128 import U128
    from kmers_tpu.parallel.count import CountTableWide, UnitTableWide

    keys = np.sort(RNG.integers(0, 1 << bits, n_live).astype(np.object_))
    keys = sorted(set(int(x) for x in keys))
    n_live = len(keys)
    planes = np.zeros((4, cap), np.uint32)
    for i, kv in enumerate(keys):
        for j in range(4):
            planes[j, i] = (kv >> (32 * (3 - j))) & 0xFFFFFFFF
    counts = np.zeros(cap, np.int32)
    counts[:n_live] = RNG.integers(1, 100, n_live)
    from kmers_tpu.core.u64 import U64 as U64_

    table = CountTableWide(
        keys=U128(U64_(jnp.asarray(planes[0]), jnp.asarray(planes[1])),
                  U64_(jnp.asarray(planes[2]), jnp.asarray(planes[3]))),
        counts=jnp.asarray(counts), n_unique=jnp.int32(n_live))
    uk = [int(x) for x in RNG.integers(0, 1 << bits, n_units)]
    uv = RNG.random(n_units) < valid_frac
    up = np.zeros((4, n_units), np.uint32)
    for i, kv in enumerate(uk):
        if uv[i]:
            for j in range(4):
                up[j, i] = (kv >> (32 * (3 - j))) & 0xFFFFFFFF
        else:
            up[0, i] = 0x80000000
    unit = UnitTableWide(
        keys=U128(U64_(jnp.asarray(up[0]), jnp.asarray(up[1])),
                  U64_(jnp.asarray(up[2]), jnp.asarray(up[3]))))
    return table, unit


@pytest.mark.parametrize("cap,n_live,n_units,valid_frac,bits", [
    (2048, 1500, 4096, 0.8, 40),
    (1024, 0, 2048, 0.5, 8),
    (1024, 300, 8192, 1.0, 6),    # heavy duplicates
])
def test_merge_table_with_sorted_units_wide_matches_merge_many(
        cap, n_live, n_units, valid_frac, bits):
    from kmers_tpu.core.u128 import U128
    from kmers_tpu.core.u64 import U64 as U64_

    table, unit = make_wide_table_and_units(cap, n_live, n_units,
                                            valid_frac, bits)
    want = count_ops.merge_many_wide([table, unit], max_k=63)
    uk = unit.keys
    s = jax.lax.sort((uk.hi.hi, uk.hi.lo, uk.lo.hi, uk.lo.lo),
                     num_keys=4, is_stable=False)
    got = count_ops.merge_table_with_sorted_units_wide(
        table, U128(U64_(s[0], s[1]), U64_(s[2], s[3])), interpret=True)
    nu = int(want.n_unique)
    assert int(got.n_unique) == nu
    for a, b in ((got.keys.hi.hi, want.keys.hi.hi),
                 (got.keys.hi.lo, want.keys.hi.lo),
                 (got.keys.lo.hi, want.keys.lo.hi),
                 (got.keys.lo.lo, want.keys.lo.lo),
                 (got.counts, want.counts)):
        np.testing.assert_array_equal(np.asarray(a)[:nu],
                                      np.asarray(b)[:nu])
    assert (np.asarray(got.counts)[nu:] == 0).all()


def test_streaming_counter_wide_fast_path_matches_reference(monkeypatch):
    """Wide (k=47) StreamingCounter: the Pallas fast path vs the
    sort-based path, same batches."""
    from kmers_tpu.parallel.stream import StreamingCounter

    rng = np.random.default_rng(12)
    arrs = [jnp.asarray(rng.choice(
        np.frombuffer(b"ACGTN", dtype=np.uint8), size=(8, 96),
        p=[.24, .24, .24, .24, .04])) for _ in range(4)]
    k = 47

    def run():
        sc = StreamingCounter(k, capacity=4096, merge_every=2)
        for a in arrs:
            sc.update(a)
        return sc

    monkeypatch.setenv("KMERS_TPU_STREAM_MERGE", "0")
    ref = run()
    monkeypatch.setenv("KMERS_TPU_STREAM_MERGE", "interpret")
    fast = run()
    assert fast.to_pairs() == ref.to_pairs()
    assert fast.kmers == ref.kmers > 0
