"""Segment-local sort+count kernel (kernels/count_tile) vs numpy model,
and the end-to-end property that matters: consolidating segmented
per-batch tables yields the exact same compacted table as the
global-sort path."""

import numpy as np
import pytest
import jax.numpy as jnp

from kmers_tpu.core.u64 import U64
from kmers_tpu.kernels.count_tile import segment_count_keys
from kmers_tpu.parallel import count as count_ops

RNG = np.random.default_rng(4242)


def _folded_keys(n, n_distinct=50, invalid_frac=0.1):
    """Random folded keys: valid lanes draw from a small key universe (to
    force duplicate runs), invalid lanes are exactly (0x80000000, 0)."""
    uni_hi = RNG.integers(0, 1 << 30, n_distinct, dtype=np.uint32)
    uni_lo = RNG.integers(0, 1 << 32, n_distinct, dtype=np.uint32)
    pick = RNG.integers(0, n_distinct, n)
    hi = uni_hi[pick].copy()
    lo = uni_lo[pick].copy()
    inv = RNG.random(n) < invalid_frac
    hi[inv] = 0x80000000
    lo[inv] = 0
    return hi, lo, ~inv


def _np_segment_model(hi, lo, valid, T, block):
    """Per-segment: sort valid keys, run-length encode; model output.
    Padding is block-granular (matches the kernel's pallas grid)."""
    n = hi.size
    n_pad = -(-n // block) * block
    out_hi = np.zeros(n_pad, np.uint32)
    out_lo = np.zeros(n_pad, np.uint32)
    out_cnt = np.zeros(n_pad, np.int32)
    for s0 in range(0, n_pad, T):
        seg = slice(s0, min(s0 + T, n))
        vh, vl = hi[seg][valid[seg]], lo[seg][valid[seg]]
        keys = (vh.astype(np.uint64) << 32) | vl.astype(np.uint64)
        keys.sort()
        uk, counts = np.unique(keys, return_counts=True)
        p = s0
        pos = 0
        for k, c in zip(uk, counts):
            out_hi[p] = k >> 32
            out_lo[p] = k & 0xFFFFFFFF
            out_cnt[p] = c
            p += c  # runs stay in place: start lane of each run
        # non-start lanes within runs still hold the key value
        ks = np.sort(keys)
        out_hi[s0:s0 + ks.size] = (ks >> 32).astype(np.uint32)
        out_lo[s0:s0 + ks.size] = (ks & 0xFFFFFFFF).astype(np.uint32)
        del pos
    return out_hi, out_lo, out_cnt


@pytest.mark.parametrize("n,S,B", [(1024, 256, 256), (4096, 1024, 2048),
                                   (5000, 1024, 4096), (300, 256, 1024),
                                   (8192, 128, 8192), (2048, 64, 1024),
                                   (2048, 32, 2048)])
def test_segment_count_matches_model(n, S, B):
    """Including blocks holding several segments (B > S): the full-width
    rolls must never leak values across segment boundaries."""
    hi, lo, valid = _folded_keys(n)
    kh, kl, cnt = segment_count_keys(jnp.asarray(hi), jnp.asarray(lo),
                                     seg_lanes=S, block_lanes=B,
                                     interpret=True)
    mh, ml, mc = _np_segment_model(hi, lo, valid, S, B)
    np.testing.assert_array_equal(np.asarray(kh), mh)
    np.testing.assert_array_equal(np.asarray(kl), ml)
    np.testing.assert_array_equal(np.asarray(cnt), mc)


def test_segment_counts_conserve_mass():
    hi, lo, valid = _folded_keys(4096, n_distinct=11)
    _, _, cnt = segment_count_keys(jnp.asarray(hi), jnp.asarray(lo),
                                   seg_lanes=512, block_lanes=1024,
                                   interpret=True)
    assert int(np.asarray(cnt).sum()) == int(valid.sum())


def test_segmented_table_merges_to_exact_counts():
    """The property the streaming pipeline relies on: a segmented
    run-length table fed through the weighted re-count (merge_many)
    produces the exact same compacted table as the global-sort path."""
    hi, lo, valid = _folded_keys(2048, n_distinct=37)
    words = U64(jnp.asarray(hi & 0x7FFFFFFF), jnp.asarray(lo))
    v = jnp.asarray(valid)

    seg = count_ops.count_words_segmented(words, v, seg_lanes=256,
                                          block_lanes=1024, interpret=True)
    merged = count_ops.merge_many([seg], max_k=31)
    want = count_ops.count_words(words, v, max_k=31, compact=True)

    nu = int(want.n_unique)
    assert int(merged.n_unique) == nu
    np.testing.assert_array_equal(np.asarray(merged.keys.hi)[:nu],
                                  np.asarray(want.keys.hi)[:nu])
    np.testing.assert_array_equal(np.asarray(merged.keys.lo)[:nu],
                                  np.asarray(want.keys.lo)[:nu])
    np.testing.assert_array_equal(np.asarray(merged.counts)[:nu],
                                  np.asarray(want.counts)[:nu])
    # segmented n_unique counts (segment, key) runs: an upper bound
    assert int(seg.n_unique) >= nu


# -- wide (4-plane, 33 <= k <= 63) kernel -------------------------------------

from kmers_tpu.core.u64 import U64 as _U64
from kmers_tpu.core.u128 import U128
from kmers_tpu.kernels.count_tile import segment_count_keys_wide


def _folded_keys_wide(n, n_distinct=40, invalid_frac=0.1):
    uni = [RNG.integers(0, 1 << (30 if i == 0 else 32), n_distinct,
                        dtype=np.uint32) for i in range(4)]
    pick = RNG.integers(0, n_distinct, n)
    planes = [u[pick].copy() for u in uni]
    inv = RNG.random(n) < invalid_frac
    planes[0][inv] = 0x80000000
    for p in planes[1:]:
        p[inv] = 0
    return planes, ~inv


def _np_segment_model_wide(planes, valid, T, block):
    n = planes[0].size
    n_pad = -(-n // block) * block
    outs = [np.zeros(n_pad, np.uint32) for _ in range(4)]
    out_cnt = np.zeros(n_pad, np.int32)
    for s0 in range(0, n_pad, T):
        seg = slice(s0, min(s0 + T, n))
        vs = [p[seg][valid[seg]] for p in planes]
        keys = [tuple(int(p[i]) for p in vs) for i in range(vs[0].size)]
        keys.sort()
        p = s0
        for key in keys:
            for o, w in zip(outs, key):
                o[p] = w
            p += 1
        p = s0
        i = 0
        while i < len(keys):
            j = i
            while j < len(keys) and keys[j] == keys[i]:
                j += 1
            out_cnt[s0 + i] = j - i
            i = j
    return outs, out_cnt


@pytest.mark.parametrize("n,S,B", [(1024, 256, 256), (2048, 64, 1024),
                                   (700, 128, 512)])
def test_segment_count_wide_matches_model(n, S, B):
    planes, valid = _folded_keys_wide(n)
    outs = segment_count_keys_wide(*[jnp.asarray(p) for p in planes],
                                   seg_lanes=S, block_lanes=B,
                                   interpret=True)
    model_planes, model_cnt = _np_segment_model_wide(planes, valid, S, B)
    for got, want in zip(outs[:4], model_planes):
        np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(outs[4]), model_cnt)


def test_segmented_wide_table_merges_to_exact_counts():
    planes, valid = _folded_keys_wide(2048, n_distinct=23)
    words = U128(_U64(jnp.asarray(planes[0] & 0x7FFFFFFF),
                      jnp.asarray(planes[1])),
                 _U64(jnp.asarray(planes[2]), jnp.asarray(planes[3])))
    v = jnp.asarray(valid)
    seg = count_ops.count_words_segmented_wide(
        words, v, seg_lanes=128, block_lanes=1024, interpret=True)
    merged = count_ops.merge_many_wide([seg], max_k=63)
    want = count_ops.count_words_wide(words, v, max_k=63, compact=True)
    nu = int(want.n_unique)
    assert int(merged.n_unique) == nu
    for part in ("hi", "lo"):
        for w in ("hi", "lo"):
            a = np.asarray(getattr(getattr(merged.keys, part), w))[:nu]
            b = np.asarray(getattr(getattr(want.keys, part), w))[:nu]
            np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(merged.counts)[:nu],
                                  np.asarray(want.counts)[:nu])
    assert int(seg.n_unique) >= nu
