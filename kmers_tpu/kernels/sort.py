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

For n = 2^20 with TILE = 2^18: 1 + 2 + 3 = 6 HBM passes instead of ~114.

Network: classic direction-alternating bitonic (Batcher).  For level
kk = 2, 4, ..., n and stride s = kk/2 ... 1, lane i exchanges with
i ^ s; the pair is ordered ascending iff (i & kk) == 0.  Partner values
at XOR stride s are two ``pltpu.roll``s + an iota-bit select -- no
gathers, no scatters (SURVEY.md §7 "sort, don't scatter").

Not stable (equal (hi, lo) pairs may permute -- they are bit-identical
lanes, so the sorted output is still byte-equal to lax.sort's).  No
payload support: the counting pipeline's run-length form
(parallel/count.py) needs none.  n must be a power of two and >= 512;
callers pad with 0xFFFFFFFF sentinel lanes, which sort last (the
counting pipeline's invalid-flag bit provides exactly this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128          # TPU vector lane count: arrays are [rows, 128]


def _partner(x: jnp.ndarray, s: int, row_iota, lane_iota) -> jnp.ndarray:
    """value at index (i ^ s) for every lane i of a [R, 128] tile."""
    if s < LANES:
        plus = pltpu.roll(x, shift=LANES - s, axis=1)     # x[.., c + s]
        minus = pltpu.roll(x, shift=s, axis=1)            # x[.., c - s]
        low = (lane_iota & s) == 0
    else:
        sr = s // LANES
        R = x.shape[0]
        plus = pltpu.roll(x, shift=R - sr, axis=0)        # x[r + sr, ..]
        minus = pltpu.roll(x, shift=sr, axis=0)           # x[r - sr, ..]
        low = (row_iota & sr) == 0
    return jnp.where(low, plus, minus)


def _stage(hi, lo, s: int, dir_up, row_iota, lane_iota):
    """One compare-exchange stage at stride s; dir_up = ascending mask."""
    p_hi = _partner(hi, s, row_iota, lane_iota)
    p_lo = _partner(lo, s, row_iota, lane_iota)
    if s < LANES:
        is_low = (lane_iota & s) == 0
    else:
        is_low = (row_iota & (s // LANES)) == 0
    hi_eq = p_hi == hi
    p_less = (p_hi < hi) | (hi_eq & (p_lo < lo))
    p_greater = ~p_less & ~(hi_eq & (p_lo == lo))
    take = jnp.where(is_low == dir_up, p_less, p_greater)
    return jnp.where(take, p_hi, hi), jnp.where(take, p_lo, lo)


def _tile_dir(kk: int, tile_idx, tile_lanes: int, row_iota, lane_iota):
    """dir_up mask for level kk inside a tile: (global_index & kk) == 0."""
    if kk < LANES:
        return (lane_iota & kk) == 0
    if kk < tile_lanes:
        return (row_iota & (kk // LANES)) == 0
    # kk >= tile size: uniform over the tile, from the tile index bits
    rows_per_tile = tile_lanes // LANES
    bit = (tile_idx * rows_per_tile) & (kk // LANES)
    return jnp.broadcast_to(bit == 0, row_iota.shape)


def _tile_sort_kernel(hi_ref, lo_ref, hi_out, lo_out, *, tile_lanes: int):
    """Levels kk = 2 .. tile_lanes fused: each tile leaves fully sorted,
    alternating ascending/descending per the global network."""
    hi, lo = hi_ref[:], lo_ref[:]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    t = pl.program_id(0)
    kk = 2
    while kk <= tile_lanes:
        dir_up = _tile_dir(kk, t, tile_lanes, row_iota, lane_iota)
        s = kk // 2
        while s >= 1:
            hi, lo = _stage(hi, lo, s, dir_up, row_iota, lane_iota)
            s //= 2
        kk *= 2
    hi_out[:] = hi
    lo_out[:] = lo


def _intra_pass_kernel(hi_ref, lo_ref, hi_out, lo_out, *, kk: int,
                       tile_lanes: int):
    """Strides tile_lanes/2 .. 1 of merge level kk, fused (direction is
    uniform per tile since kk >= 2 * tile_lanes)."""
    hi, lo = hi_ref[:], lo_ref[:]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    t = pl.program_id(0)
    dir_up = _tile_dir(kk, t, tile_lanes, row_iota, lane_iota)
    s = tile_lanes // 2
    while s >= 1:
        hi, lo = _stage(hi, lo, s, dir_up, row_iota, lane_iota)
        s //= 2
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
                     tile_lanes: int = 1 << 18,
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

    def call(kernel):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[tile_spec, tile_spec],
            out_specs=(tile_spec, tile_spec),
            out_shape=(out2d, out2d),
            interpret=interpret,
        )

    # phase 1: sort every tile (levels kk = 2 .. T fused, one HBM pass)
    hi2, lo2 = call(functools.partial(_tile_sort_kernel, tile_lanes=T))(
        hi2, lo2)

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
        hi2, lo2 = call(functools.partial(_intra_pass_kernel, kk=kk,
                                          tile_lanes=T))(hi2, lo2)
        kk *= 2
    return hi2.reshape(n), lo2.reshape(n)
