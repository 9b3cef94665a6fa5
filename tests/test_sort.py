"""Pallas hierarchical bitonic sort: byte-equality with jax.lax.sort
(interpret mode on CPU; the TPU fast path in count.sort_by_word uses the
identical kernel)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.kernels.sort import bitonic_sort_u64

RNG = np.random.default_rng(31337)


def _rand_pairs(n):
    hi = RNG.integers(0, 1 << 32, size=n, dtype=np.uint32)
    lo = RNG.integers(0, 1 << 32, size=n, dtype=np.uint32)
    # force duplicate keys (equal pairs must still give byte-equal output)
    hi[: n // 4] = hi[n // 4: n // 2]
    lo[: n // 8] = lo[n // 8: n // 4]
    return hi, lo


@pytest.mark.parametrize("n,tile", [(512, 512), (2048, 512),
                                    (1 << 13, 1 << 11), (1 << 15, 1 << 13)])
def test_bitonic_matches_lax_sort(n, tile):
    hi, lo = _rand_pairs(n)
    sh, sl = bitonic_sort_u64(jnp.asarray(hi), jnp.asarray(lo),
                              tile_lanes=tile, interpret=True)
    eh, el = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(eh))
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(el))


def test_bitonic_flagbit_layout_matches_count_sort():
    """The exact shape sort_by_word feeds on the TPU path: canonical k=31
    words with the invalid-flag folded into bit 31 of hi."""
    from kmers_tpu.parallel import pipeline

    reads = RNG.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                       size=(8, 128), p=[0.24] * 4 + [0.04])
    canon, valid = pipeline.canonical_kmers(jnp.asarray(reads), 31)
    flag = jnp.where(valid, jnp.uint32(0), jnp.uint32(1) << 31)
    key_hi = (canon.hi | flag).reshape(-1)
    key_lo = canon.lo.reshape(-1)
    sh, sl = bitonic_sort_u64(key_hi, key_lo, tile_lanes=512,
                              interpret=True)
    eh, el = jax.lax.sort((key_hi, key_lo), num_keys=2)
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(eh))
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(el))


def test_bitonic_rejects_bad_sizes():
    hi = jnp.zeros(768, jnp.uint32)       # not a power of two
    with pytest.raises(AssertionError):
        bitonic_sort_u64(hi, hi, interpret=True)


@pytest.mark.parametrize("n", [768, 1000, 5000])
def test_bitonic_padded_any_size(n):
    """sort_by_word's non-power-of-two path: pad with all-ones sentinels
    (strictly greater than every real key incl. the folded invalid flag),
    sort, slice -- exact vs lax.sort at any n."""
    from kmers_tpu.parallel.count import _bitonic_sort_padded

    hi, lo = _rand_pairs(n)
    # include real lanes equal to the sentinel: the slice may keep either
    # copy -- they are bit-identical, so output must still be byte-equal
    hi[-3:] = 0xFFFFFFFF
    lo[-3:] = 0xFFFFFFFF
    sh, sl = _bitonic_sort_padded(jnp.asarray(hi), jnp.asarray(lo),
                                  interpret=True)
    eh, el = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(eh))
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(el))
