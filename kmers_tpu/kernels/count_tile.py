"""Pallas TPU kernel: segment-local sort + run-length count of k-mer keys.

The insight that removes the global per-batch sort from the counting
pipeline (VERDICT r2 item 2): a per-batch table does NOT need globally
sorted keys.  Consolidation (parallel.stream._merge_bounded ->
count.merge_many) re-counts a concatenation of pending tables by weight,
keyed only on ``counts > 0`` lanes -- so a batch may contribute a table
that is sorted WITHIN independent segments, with one run-length entry per
(segment, key).  A key appearing in S segments costs S live lanes instead
of 1; the consolidation sort already processes every lane of every
pending table (dead or alive), so the merge cost is UNCHANGED while the
per-batch cost drops from a global 2^20-lane u64 sort (lax.sort: 1.55 ms)
to tile-local VMEM sorts that never leave the chip.

One kernel instance loads a [T] segment of folded keys into VMEM as
[T/128, 128] and, entirely on-chip:

  1. sorts the segment with a static-stride bitonic network -- every
     compare-exchange partner (index i ^ s) is two static ``pltpu.roll``s
     (lane axis for s < 128, sublane axis above) + an iota select; levels
     run under a ``lax.fori_loop`` with the level's unneeded large
     strides masked off (static strides are ~10x faster than Mosaic's
     dynamic rotates -- see kernels/sort.py -- at the price of running
     log2(T) stages per level instead of log2(kk); tile sizes are small
     enough that the waste is cheap);
  2. marks run starts (valid lanes whose predecessor in linear order
     differs);
  3. computes each run's length as (next boundary - index) via a
     log-depth suffix-min over boundary positions (static linear shifts);
  4. emits (key_hi, key_lo, counts): counts > 0 exactly at run starts,
     invalid/padding lanes emit (0, 0, 0).

The invalid flag arrives folded into bit 31 of key_hi (the
kernels/window.pack_canonical_keys / count.sort_by_word spare-bit layout,
k <= 31 only), so invalid lanes sort to each segment's end by
construction and the last valid run is closed by the first invalid lane.

All masks are int32 0/1 until the final u32 select (Mosaic cannot lower
i1-valued selects); all shifts/rolls are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

INVALID_HI = 0x80000000      # folded key of an invalid / padding lane
                             # (key_lo = 0)


def _static_stage(hi, lo, s: int, dir_up, row_iota, lane_iota):
    """One compare-exchange at static stride s; dir_up int32 0/1 mask."""
    R = hi.shape[0]
    if s < LANES:
        def partner(x):
            plus = pltpu.roll(x, shift=LANES - s, axis=1)    # x[.., c + s]
            minus = pltpu.roll(x, shift=s, axis=1)           # x[.., c - s]
            return jnp.where((lane_iota & s) == 0, plus, minus)
        is_low = 1 - ((lane_iota & s) >> (s.bit_length() - 1))
    else:
        sr = s // LANES
        def partner(x):
            plus = pltpu.roll(x, shift=R - sr, axis=0)       # x[r + sr, ..]
            minus = pltpu.roll(x, shift=sr, axis=0)          # x[r - sr, ..]
            return jnp.where((row_iota & sr) == 0, plus, minus)
        is_low = 1 - ((row_iota & sr) >> (sr.bit_length() - 1))
    p_hi, p_lo = partner(hi), partner(lo)
    hi_eq = p_hi == hi
    p_less = (p_hi < hi) | (hi_eq & (p_lo < lo))
    p_greater = ~p_less & ~(hi_eq & (p_lo == lo))
    want_less = (is_low ^ dir_up) == 0
    take = (want_less & p_less) | (~want_less & p_greater)
    return jnp.where(take, p_hi, hi), jnp.where(take, p_lo, lo)


def _tile_sort(hi, lo, tile_lanes: int, idx, row_iota, lane_iota):
    """Full ascending bitonic sort of one [R, 128] tile: fori over levels,
    the level's inactive (too-large) static strides masked off."""
    n_levels = tile_lanes.bit_length() - 1
    strides = [1 << e for e in range(n_levels - 1, -1, -1)]

    def level(l, carry):
        h, w = carry
        kk = jnp.int32(2) << l
        dir_up = jnp.where((idx & kk) == 0, 1, 0)
        for s in strides:
            h2, w2 = _static_stage(h, w, s, dir_up, row_iota, lane_iota)
            act = jnp.int32(s) < kk
            h = jnp.where(act, h2, h)
            w = jnp.where(act, w2, w)
        return h, w

    return jax.lax.fori_loop(0, n_levels, level, (hi, lo))


def _lin_prev(x, lane_iota):
    """value at linear index i-1 (row-major [R, 128]); i=0 gets wrapped
    garbage -- callers mask it."""
    lane = pltpu.roll(x, shift=1, axis=1)
    carried = pltpu.roll(lane, shift=1, axis=0)
    return jnp.where(lane_iota == 0, carried, lane)


def _lin_next(x, s: int, fill, idx, lane_iota, tile_lanes: int):
    """value at linear index i+s (static s, power of two); `fill` past the
    tile end."""
    R = x.shape[0]
    if s % LANES == 0:
        rolled = pltpu.roll(x, shift=R - s // LANES, axis=0)
    else:
        sl = s % LANES
        lane = pltpu.roll(x, shift=LANES - sl, axis=1)       # c <- c + sl
        rows = s // LANES
        plain = pltpu.roll(lane, shift=R - rows, axis=0) if rows else lane
        carried = pltpu.roll(lane, shift=R - rows - 1, axis=0)
        rolled = jnp.where(lane_iota >= LANES - sl, carried, plain)
    return jnp.where(idx + s < tile_lanes, rolled, fill)


def _count_tile_kernel(hi_ref, lo_ref, key_hi_out, key_lo_out, counts_out,
                       *, tile_lanes: int):
    hi, lo = hi_ref[:], lo_ref[:]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    idx = row_iota * LANES + lane_iota

    hi, lo = _tile_sort(hi, lo, tile_lanes, idx, row_iota, lane_iota)

    valid = (hi >> 31) == 0              # folded flag: invalid sorts last
    p_hi = _lin_prev(hi, lane_iota)
    p_lo = _lin_prev(lo, lane_iota)
    neq = (p_hi != hi) | (p_lo != lo)
    starts = valid & ((idx == 0) | neq)

    # next run boundary after i (run starts and the first invalid lane are
    # boundaries): suffix-min of boundary positions, then shift by one
    T = tile_lanes
    b_pos = jnp.where(starts | ~valid, idx, T)
    m = b_pos
    s = 1
    while s < T:
        m = jnp.minimum(m, _lin_next(m, s, jnp.int32(T), idx, lane_iota, T))
        s *= 2
    ns_excl = _lin_next(m, 1, jnp.int32(T), idx, lane_iota, T)

    counts_out[:] = (jnp.where(starts, ns_excl - idx, 0)).astype(jnp.int32)
    vmask = jnp.uint32(0) - valid.astype(jnp.uint32)
    key_hi_out[:] = hi & vmask           # clears the flag bit with it
    key_lo_out[:] = lo & vmask


@functools.partial(jax.jit, static_argnames=("tile_lanes", "interpret"))
def segment_count_keys(key_hi: jnp.ndarray, key_lo: jnp.ndarray,
                       tile_lanes: int = 1 << 12,
                       interpret: bool = False):
    """Segment-local sort+count of flat folded keys (bit 31 of key_hi =
    invalid flag; invalid lanes must be exactly (0x80000000, 0)).

    Returns (keys_hi, keys_lo, counts), all [n_pad] with
    n_pad = ceil(n / tile_lanes) * tile_lanes: within each tile_lanes
    segment keys are sorted ascending (valid first), counts[i] > 0 exactly
    at run starts and equals the run length within the segment; all other
    lanes are (0, 0, 0).  The result is a valid run-length CountTable
    payload for merge_many / count_weighted (live lanes = counts > 0); it
    is NOT globally sorted -- a key may own one run per segment.
    """
    assert tile_lanes >= LANES and tile_lanes % LANES == 0
    assert tile_lanes & (tile_lanes - 1) == 0
    n = key_hi.size
    n_pad = -(-n // tile_lanes) * tile_lanes
    if n_pad != n:
        pad_hi = jnp.full(n_pad - n, INVALID_HI, dtype=jnp.uint32)
        pad_lo = jnp.zeros(n_pad - n, dtype=jnp.uint32)
        key_hi = jnp.concatenate([key_hi.reshape(-1), pad_hi])
        key_lo = jnp.concatenate([key_lo.reshape(-1), pad_lo])
    shape2d = (n_pad // LANES, LANES)
    hi2 = key_hi.reshape(shape2d)
    lo2 = key_lo.reshape(shape2d)
    rows = tile_lanes // LANES
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct(shape2d, jnp.uint32)
    outi = jax.ShapeDtypeStruct(shape2d, jnp.int32)
    kh, kl, cnt = pl.pallas_call(
        functools.partial(_count_tile_kernel, tile_lanes=tile_lanes),
        grid=(n_pad // tile_lanes,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out32, out32, outi),
        interpret=interpret,
    )(hi2, lo2)
    return kh.reshape(n_pad), kl.reshape(n_pad), cnt.reshape(n_pad)
