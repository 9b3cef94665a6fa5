"""Pallas kernels vs the jnp reference path (interpret mode on CPU;
SURVEY.md §5.2: kernels with manual memory handling are tested against the
jnp implementation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.core import u64 as u
from kmers_tpu.kernels import window as kwin
from kmers_tpu.ops import kmer as kmer_ops

RNG = np.random.default_rng(77)


def make_reads(B, L, n_frac=0.03):
    reads = RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, L))
    mask = RNG.random((B, L)) < n_frac
    reads[mask] = ord("N")
    # sprinkle lowercase
    lower = RNG.random((B, L)) < 0.1
    reads[lower] |= 0x20
    return jnp.asarray(reads)


def assert_window_outputs_match(got, reads, k, seed):
    """Kernel contract: valid lanes bit-identical to the jnp path, invalid
    lanes ZERO in the four u32 outputs."""
    win = kmer_ops.kmer_windows(reads, k)
    canon = kmer_ops.canonical_word(win.fw, win.rc)
    h = u.mix_hash(canon, seed)
    v = np.asarray(win.valid)
    np.testing.assert_array_equal(np.asarray(got[4]).astype(bool), v)
    for arr, want in zip(got[:4], (canon.hi, canon.lo, h.hi, h.lo)):
        arr = np.asarray(arr)
        np.testing.assert_array_equal(arr[v], np.asarray(want)[v])
        assert (arr[~v] == 0).all()


@pytest.mark.parametrize("k", [5, 16, 17, 31, 32])
def test_window_kernel_matches_jnp(k):
    B, L = 8, 256
    reads = make_reads(B, L)
    got = kwin.pack_canonical_hash(reads, k, seed=3, block_rows=8,
                                   interpret=True)
    assert_window_outputs_match(got, reads, k, 3)


def test_window_kernel_multiblock_grid():
    k, B, L = 31, 32, 128
    reads = make_reads(B, L)
    got = kwin.pack_canonical_hash(reads, k, block_rows=8, interpret=True)
    assert_window_outputs_match(got, reads, k, 0)


@pytest.mark.parametrize("stage", ["pack", "canon"])
@pytest.mark.parametrize("k", [5, 16, 17, 31])
def test_pack_canonical_keys_matches_jnp(stage, k):
    """Folded-key counting variant: bit 31 of hi = invalid flag, valid
    lanes bit-identical to the jnp window path, invalid lanes exactly
    (0x80000000, 0)."""
    B, L = 8, 256
    reads = make_reads(B, L)
    key_hi, key_lo = kwin.pack_canonical_keys(reads, k, stage=stage,
                                              block_rows=8, interpret=True)
    key_hi, key_lo = np.asarray(key_hi), np.asarray(key_lo)
    win = kmer_ops.kmer_windows(reads, k)
    want = (kmer_ops.canonical_word(win.fw, win.rc) if stage == "canon"
            else win.fw)
    v = np.asarray(win.valid)
    np.testing.assert_array_equal(key_hi[v], np.asarray(want.hi)[v])
    np.testing.assert_array_equal(key_lo[v], np.asarray(want.lo)[v])
    assert (key_hi[~v] == 0x80000000).all()
    assert (key_lo[~v] == 0).all()
    # the folded layout is sort_by_word's spare-bit key layout: sorting
    # (key_hi, key_lo) puts valid lanes first in canonical order
    from kmers_tpu.parallel.count import sort_by_word
    from kmers_tpu.core.u64 import U64

    sw, sv = sort_by_word(U64(jnp.asarray(key_hi.reshape(-1) & 0x7FFFFFFF),
                              jnp.asarray(key_lo.reshape(-1))),
                          jnp.asarray(v.reshape(-1)), spare_hi_bit=True)[:2]
    assert int(np.asarray(sv).sum()) == v.sum()


@pytest.mark.parametrize("stage", ["pack", "canon"])
@pytest.mark.parametrize("k,L", [(5, 128), (15, 256), (16, 256), (17, 256),
                                 (21, 1024), (31, 256)])
def test_pack_canonical_keys_packed_matches_jnp(stage, k, L):
    """Packed-ingest folded kernel (VERDICT r4 item 3): starts from the
    read_packed_batches layout, emits the folded spare-bit keys in the
    documented q-layout (a fixed permutation of window positions)."""
    from kmers_tpu.io.fastx import pack_batch_np

    B = 8
    reads = make_reads(B, L)
    words, vbits = (jnp.asarray(a) for a in pack_batch_np(np.asarray(reads)))
    key_hi, key_lo = kwin.pack_canonical_keys_packed(
        words, vbits, k, stage=stage, block_rows=8, interpret=True)
    key_hi, key_lo = np.asarray(key_hi), np.asarray(key_lo)
    win = kmer_ops.kmer_windows_packed(words, vbits, k)
    want = (kmer_ops.canonical_word(win.fw, win.rc) if stage == "canon"
            else win.fw)
    p_of_q = kwin.qspace_positions(L)
    v = np.asarray(win.valid)[:, p_of_q]
    got_valid = (key_hi >> 31) == 0
    np.testing.assert_array_equal(got_valid, v)
    np.testing.assert_array_equal(key_hi[v], np.asarray(want.hi)[:, p_of_q][v])
    np.testing.assert_array_equal(key_lo[v], np.asarray(want.lo)[:, p_of_q][v])
    assert (key_hi[~v] == 0x80000000).all() and (key_lo[~v] == 0).all()


def test_count_reads_packed_unit_table_exact():
    """The packed unit path (kernel or jnp) produces the same counted
    table as the ASCII path after a merge -- the CLI-default invariant."""
    from kmers_tpu.parallel import count as count_ops
    from kmers_tpu.parallel import pipeline
    from kmers_tpu.io.fastx import pack_batch_np

    k, B, L = 21, 8, 256
    reads = make_reads(B, L)
    words, vbits = (jnp.asarray(a) for a in pack_batch_np(np.asarray(reads)))
    res_p = pipeline.count_reads_packed(words, vbits, k, aggregate="unit")
    res_a = pipeline.count_reads(reads, k, aggregate="unit")
    tp = count_ops.merge_many([res_p.table], max_k=k)
    ta = count_ops.merge_many([res_a.table], max_k=k)
    assert int(res_p.metrics["kmers_emitted"]) == int(
        res_a.metrics["kmers_emitted"])
    nu = int(ta.n_unique)
    assert int(tp.n_unique) == nu
    for a, b in ((tp.keys.hi, ta.keys.hi), (tp.keys.lo, ta.keys.lo),
                 (tp.counts, ta.counts)):
        np.testing.assert_array_equal(np.asarray(a)[:nu], np.asarray(b)[:nu])


from kmers_tpu.kernels import minimizer as kmini
from kmers_tpu.ops import hash as hash_ops
from kmers_tpu.ops import minimizer as mini_ops


@pytest.mark.parametrize("use_lex,order", [(False, "mix64"),
                                           (False, "mix32"),
                                           (False, "mix16"),
                                           (True, "mix64")])
@pytest.mark.parametrize("k,w", [
    (11, 11),   # W=1 (w == k edge)
    (16, 11),   # W=6: largest direct-scan branch
    (17, 11),   # W=7: smallest vHGW branch (boundary)
    (31, 11),   # W=21: vHGW steady state
    (31, 19),   # w > 16: mix32 order with a 5-plane carry
])
def test_minimizer_kernel_matches_jnp(use_lex, order, k, w):
    if w > k:
        pytest.skip("w > k")
    B, L = 8, 256
    reads = make_reads(B, L)
    got = kmini.minimizer_kernel(reads, k, w, seed=5, use_lex=use_lex,
                                 block_rows=8, interpret=True, order=order)
    if use_lex:
        hash_fn = hash_ops.lex_hash_fn(w)
    elif order == "mix32":
        hash_fn = hash_ops.mix32_hash_fn(5)
    elif order == "mix16":
        hash_fn = hash_ops.mix16_hash_fn(5)
    else:
        hash_fn = hash_ops.mix_hash_fn(5)
    want = mini_ops.minimizer_stream(reads, k, w, hash_fn)
    valid = np.asarray(want.valid)
    gv = np.asarray(got[3]).astype(bool)
    np.testing.assert_array_equal(gv, valid)
    # compare only valid positions (invalid carry garbage words)
    np.testing.assert_array_equal(np.asarray(got[0])[valid],
                                  np.asarray(want.word.hi)[valid])
    np.testing.assert_array_equal(np.asarray(got[1])[valid],
                                  np.asarray(want.word.lo)[valid])
    np.testing.assert_array_equal(np.asarray(got[2])[valid],
                                  np.asarray(want.pos)[valid])


from kmers_tpu.core import u128 as u128mod
from kmers_tpu.kernels import window_wide as kww


@pytest.mark.parametrize("k", [33, 48, 63, 64])
def test_window_wide_kernel_matches_jnp(k):
    B, L = 8, 256
    reads = make_reads(B, L)
    got = kww.pack_canonical_hash_wide(reads, k, seed=7, block_rows=8,
                                       interpret=True)
    win = kmer_ops.kmer_windows_wide(reads, k)
    canon = kmer_ops.canonical_word_wide(win.fw, win.rc)
    h = u128mod.mix_hash(canon, 7)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(canon.lo.lo))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(canon.lo.hi))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(canon.hi.lo))
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(canon.hi.hi))
    np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(h.hi))
    np.testing.assert_array_equal(np.asarray(got[5]), np.asarray(h.lo))
    np.testing.assert_array_equal(np.asarray(got[6]).astype(bool),
                                  np.asarray(win.valid))


@pytest.mark.parametrize("k", [33, 48, 63])
def test_pack_canonical_keys_wide_matches_jnp(k):
    """Wide folded-key kernel (VERDICT r4 item 4): UnitTableWide's exact
    spare-bit layout, valid lanes bit-identical to the jnp wide path,
    invalid lanes exactly (0x80000000, 0, 0, 0)."""
    B, L = 8, 256
    reads = make_reads(B, L)
    k3, k2, k1, k0 = (np.asarray(x) for x in kww.pack_canonical_keys_wide(
        reads, k, block_rows=8, interpret=True))
    win = kmer_ops.kmer_windows_wide(reads, k)
    canon = kmer_ops.canonical_word_wide(win.fw, win.rc)
    v = np.asarray(win.valid)
    np.testing.assert_array_equal((k3 >> 31) == 0, v)
    for got, want in ((k3, canon.hi.hi), (k2, canon.hi.lo),
                      (k1, canon.lo.hi), (k0, canon.lo.lo)):
        np.testing.assert_array_equal(got[v], np.asarray(want)[v])
    assert (k3[~v] == 0x80000000).all()
    for got in (k2, k1, k0):
        assert (got[~v] == 0).all()


def test_count_reads_wide_unit_table_exact():
    """The wide unit path (kernel or jnp) merges to the same table as the
    compact wide path."""
    from kmers_tpu.parallel import count as count_ops
    from kmers_tpu.parallel import pipeline

    k, B, L = 47, 8, 256
    reads = make_reads(B, L)
    res_u = pipeline.count_reads_wide(reads, k, aggregate="unit")
    tu = count_ops.merge_many_wide([res_u.table], max_k=k)
    tc = pipeline.count_reads_wide(reads, k, aggregate="compact").table
    nu = int(tc.n_unique)
    assert int(tu.n_unique) == nu
    for a, b in ((tu.keys.hi.hi, tc.keys.hi.hi),
                 (tu.keys.hi.lo, tc.keys.hi.lo),
                 (tu.keys.lo.hi, tc.keys.lo.hi),
                 (tu.keys.lo.lo, tc.keys.lo.lo),
                 (tu.counts, tc.counts)):
        np.testing.assert_array_equal(np.asarray(a)[:nu], np.asarray(b)[:nu])
