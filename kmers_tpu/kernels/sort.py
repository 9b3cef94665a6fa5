"""Hierarchical bitonic sort of u64 keys ((hi, lo) uint32 lane pairs),
ascending -- Pallas intra-tile passes + XLA cross-tile stages.

Why not ``jax.lax.sort``: XLA's TPU sort stages every compare-exchange
pass through HBM (measured ~114 round trips for 1M lanes = 1.67 ms,
BASELINE.md config 5a profile).  A bitonic network has
log2(n)*(log2(n)+1)/2 stages, but every stage at stride < TILE only
touches lanes within one tile -- so the hot path here is a Pallas kernel
that keeps a whole tile resident in VMEM and runs *all* its stages at VPU
speed.  HBM is touched:

  * once to sort every tile (levels kk = 2 .. TILE fused: one pass),
  * once per merge level for the fused intra-tile strides TILE/2 .. 1,
  * once per cross-tile stage (stride >= TILE) -- these are plain
    elementwise XLA (reshape + flip-pair + select): already a single
    fused read+write, no kernel needed.

For n = 2^20 with TILE = 2^17 (the largest tile that fits the 16 MB
VMEM scoped-allocation budget: 2 in + 2 out x 512 KB + loop temporaries):
1 tile pass + 3 intra passes + 6 cross stages = 10 HBM passes instead of
~114.

Network: classic direction-alternating bitonic (Batcher).  For level
kk = 2, 4, ..., n and stride s = kk/2 ... 1, lane i exchanges with
i ^ s; the pair is ordered ascending iff (global_index & kk) == 0.
Partner values at XOR stride s are two ``pltpu.roll``s + an iota-bit
select -- no gathers, no scatters (SURVEY.md §7 "sort, don't scatter").

Kernel structure notes (hard-won on the axon remote-compile relay):

  * The in-tile stage loops are ``lax.fori_loop``s with DYNAMIC stride
    rolls, not a Python unroll: the fully unrolled network for a 2^18
    tile is 171 stages (~2,500 vector ops) and Mosaic takes >10 minutes
    to compile it; the loop form compiles in ~30 s and runs at the same
    HBM-bound speed.
  * The merge level kk enters the intra-tile kernel as an SMEM scalar, so
    ONE compiled kernel serves every merge level of every call shape.
  * All side/direction masks are computed as int32 0/1 (never bool-vs-
    bool compares, never bool-valued selects): Mosaic cannot lower
    i1-valued select_n / i8->i1 truncation.

Not stable (equal (hi, lo) pairs may permute -- they are bit-identical
lanes, so the sorted output is still byte-equal to lax.sort's).  No
payload support: the counting pipeline's run-length form
(parallel/count.py) needs none.  n must be a power of two and >= 512;
parallel.count pads with 0xFFFFFFFF sentinel lanes (strictly greater
than every real key) and slices back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128          # TPU vector lane count: arrays are [rows, 128]


def _dyn_stage(hi, lo, s, dir_up, idx, row_iota, lane_iota):
    """One compare-exchange stage at traced stride s (a power of two).

    dir_up: int32 0/1 (1 = ascending), idx: within-tile linear index
    [R, 128] int32.  Partner lanes (index idx ^ s) come from two dynamic
    rolls along the lane axis (s < 128) or the sublane axis (s >= 128),
    selected by lax.cond so only one pair of rolls executes."""
    R = hi.shape[0]

    def lane_partner(x):
        plus = pltpu.roll(x, shift=LANES - s, axis=1)     # x[.., c + s]
        minus = pltpu.roll(x, shift=s, axis=1)            # x[.., c - s]
        return jnp.where((lane_iota & s) == 0, plus, minus)

    def row_partner(x):
        sr = s // LANES
        plus = pltpu.roll(x, shift=R - sr, axis=0)        # x[r + sr, ..]
        minus = pltpu.roll(x, shift=sr, axis=0)           # x[r - sr, ..]
        return jnp.where((row_iota & sr) == 0, plus, minus)

    p_hi, p_lo = jax.lax.cond(
        s < LANES,
        lambda: (lane_partner(hi), lane_partner(lo)),
        lambda: (row_partner(hi), row_partner(lo)))

    is_low = jnp.where((idx & s) == 0, 1, 0)      # low side of the pair
    hi_eq = p_hi == hi
    p_less = (p_hi < hi) | (hi_eq & (p_lo < lo))
    p_greater = ~p_less & ~(hi_eq & (p_lo == lo))
    want_less = (is_low ^ dir_up) == 0    # low side of an ascending pair
    take = (want_less & p_less) | (~want_less & p_greater)
    return jnp.where(take, p_hi, hi), jnp.where(take, p_lo, lo)


def _level_strides(hi, lo, kk, n_strides, gidx, idx, row_iota, lane_iota):
    """Run strides kk/2, kk/4, ..., (n_strides of them) of merge level kk.
    Direction of every pair: ascending iff (global_index & kk) == 0."""
    dir_up = jnp.where((gidx & kk) == 0, 1, 0)

    def body(j, carry):
        h, l = carry
        s = kk >> (j + 1)
        return _dyn_stage(h, l, s, dir_up, idx, row_iota, lane_iota)

    return jax.lax.fori_loop(0, n_strides, body, (hi, lo))


def _iotas(shape):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = row_iota * LANES + lane_iota
    return idx, row_iota, lane_iota


def _tile_sort_kernel(hi_ref, lo_ref, hi_out, lo_out, *, tile_lanes: int):
    """Levels kk = 2 .. tile_lanes fused: each tile leaves fully sorted,
    alternating ascending/descending per the global network."""
    hi, lo = hi_ref[:], lo_ref[:]
    idx, row_iota, lane_iota = _iotas(hi.shape)
    gidx = pl.program_id(0) * tile_lanes + idx
    n_levels = tile_lanes.bit_length() - 1        # log2(tile_lanes)

    def level(l, carry):
        h, lw = carry
        kk = jnp.int32(2) << l                    # level size 2^(l+1)
        return _level_strides(h, lw, kk, l + 1, gidx, idx, row_iota,
                              lane_iota)

    hi, lo = jax.lax.fori_loop(0, n_levels, level, (hi, lo))
    hi_out[:] = hi
    lo_out[:] = lo


def _intra_pass_kernel(kk_ref, hi_ref, lo_ref, hi_out, lo_out, *,
                       tile_lanes: int):
    """Strides tile_lanes/2 .. 1 of merge level kk (an SMEM scalar, so one
    compile serves all merge levels); direction from the global index."""
    hi, lo = hi_ref[:], lo_ref[:]
    idx, row_iota, lane_iota = _iotas(hi.shape)
    gidx = pl.program_id(0) * tile_lanes + idx
    kk = kk_ref[0]
    n_strides = tile_lanes.bit_length() - 1       # log2(tile_lanes)
    # entry stride is tile_lanes/2 regardless of kk: rewrite the level as
    # kk' = tile_lanes with per-lane direction still taken from kk
    dir_up = jnp.where((gidx & kk) == 0, 1, 0)

    def body(j, carry):
        h, lw = carry
        s = jnp.int32(tile_lanes) >> (j + 1)
        return _dyn_stage(h, lw, s, dir_up, idx, row_iota, lane_iota)

    hi, lo = jax.lax.fori_loop(0, n_strides, body, (hi, lo))
    hi_out[:] = hi
    lo_out[:] = lo


def _cross_stage_xla(hi, lo, kk: int, s: int):
    """One cross-tile stage (stride s >= TILE) in plain XLA: pairs
    (i, i ^ s) are adjacent s-blocks; a reshape aligns them, the select
    fuses into a single HBM read+write."""
    n = hi.size
    h = hi.reshape(n // (2 * s), 2, s)
    l = lo.reshape(n // (2 * s), 2, s)
    a_hi, b_hi = h[:, 0], h[:, 1]
    a_lo, b_lo = l[:, 0], l[:, 1]
    # direction: all lanes of pair-block r share global bit kk
    r = jnp.arange(n // (2 * s), dtype=jnp.int32)
    dir_up = (((r * 2 * s) & kk) == 0)[:, None]
    hi_eq = b_hi == a_hi
    b_less = (b_hi < a_hi) | (hi_eq & (b_lo < a_lo))
    b_greater = ~b_less & ~(hi_eq & (b_lo == a_lo))
    take = jnp.where(dir_up, b_less, b_greater)   # A side takes partner
    new_a_hi = jnp.where(take, b_hi, a_hi)
    new_b_hi = jnp.where(take, a_hi, b_hi)
    new_a_lo = jnp.where(take, b_lo, a_lo)
    new_b_lo = jnp.where(take, a_lo, b_lo)
    hi = jnp.stack([new_a_hi, new_b_hi], axis=1).reshape(n)
    lo = jnp.stack([new_a_lo, new_b_lo], axis=1).reshape(n)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("tile_lanes", "interpret"))
def bitonic_sort_u64(hi: jnp.ndarray, lo: jnp.ndarray,
                     tile_lanes: int = 1 << 17,
                     interpret: bool = False):
    """Sort flat uint32 arrays (hi, lo) ascending as u64 keys.

    n = hi.size must be a power of two, >= 512.  Returns
    (hi_sorted, lo_sorted), byte-identical to
    jax.lax.sort((hi, lo), num_keys=2).
    """
    n = hi.size
    assert n == lo.size and hi.shape == (n,) and lo.shape == (n,)
    assert n & (n - 1) == 0 and n >= 512, n
    T = min(tile_lanes, n)
    assert T % LANES == 0 and T & (T - 1) == 0
    n_tiles = n // T
    rows_per_tile = T // LANES
    shape2d = (n // LANES, LANES)
    hi2, lo2 = hi.reshape(shape2d), lo.reshape(shape2d)
    tile_spec = pl.BlockSpec((rows_per_tile, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out2d = jax.ShapeDtypeStruct(shape2d, jnp.uint32)

    # phase 1: sort every tile (levels kk = 2 .. T fused, one HBM pass)
    hi2, lo2 = pl.pallas_call(
        functools.partial(_tile_sort_kernel, tile_lanes=T),
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec],
        out_specs=(tile_spec, tile_spec),
        out_shape=(out2d, out2d),
        interpret=interpret,
    )(hi2, lo2)

    intra = pl.pallas_call(
        functools.partial(_intra_pass_kernel, tile_lanes=T),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tile_spec, tile_spec],
        out_specs=(tile_spec, tile_spec),
        out_shape=(out2d, out2d),
        interpret=interpret,
    )

    # phase 2: merge levels kk = 2T .. n
    kk = 2 * T
    while kk <= n:
        flat_hi, flat_lo = hi2.reshape(n), lo2.reshape(n)
        s = kk // 2
        while s >= T:            # cross-tile stages: plain XLA passes
            flat_hi, flat_lo = _cross_stage_xla(flat_hi, flat_lo, kk, s)
            s //= 2
        hi2 = flat_hi.reshape(shape2d)
        lo2 = flat_lo.reshape(shape2d)
        # strides T/2 .. 1 fused into one Pallas pass
        hi2, lo2 = intra(jnp.array([kk], dtype=jnp.int32), hi2, lo2)
        kk *= 2
    return hi2.reshape(n), lo2.reshape(n)
