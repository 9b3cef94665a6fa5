"""Pallas TPU kernel: fused pack+canonical+hash for multi-word k (33..64).

Same structure as kernels/window.py with a 4-lane (2xu64) payload: window
words at p are the packed 16-base u32 words at p, p+16, p+32, p+48; revcomp
is complement + 128-bit base reversal (per-lane ladders + lane-order swap)
+ cross-lane funnel shift; canonical is a 4-deep lexicographic min; the
bucketing hash is the 128-bit mixer (bit-identical to core.u128.mix_hash).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window import _shift_left_roll


def _ladder(x):
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def _mix32(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _mix64(hi, lo, seed: int):
    s_lo = jnp.uint32(seed & 0xFFFFFFFF)
    s_hi = jnp.uint32((seed >> 32) & 0xFFFFFFFF)
    out_lo = _mix32(lo ^ _mix32(hi ^ s_lo))
    out_hi = _mix32(hi ^ _mix32(lo ^ s_hi ^ jnp.uint32(0x9E3779B9)))
    return out_hi, out_lo


def _shr_lanes(words, sh: int):
    """Logical right shift of a little-endian 4x-u32 value by static sh."""
    lane, bit = divmod(sh, 32)
    zeros = jnp.zeros_like(words[0])
    out = []
    for j in range(4):
        src = j + lane
        x = words[src] if src < 4 else zeros
        if bit:
            carry = words[src + 1] if src + 1 < 4 else zeros
            x = (x >> bit) | (carry << (32 - bit))
        out.append(x)
    return out


def _wide_body(ascii_u8, k: int):
    """Shared on-chip pipeline: ASCII -> wide windows -> canonical +
    validity.  Returns (canon [4 lanes, little-endian], valid01)."""
    BB, L = ascii_u8.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (BB, L), 1)

    c = ascii_u8.astype(jnp.uint32)
    internal = (c >> 1) & jnp.uint32(3)
    codes = internal ^ (internal >> 1)
    lower = c | jnp.uint32(0x20)
    valid = (
        (lower == jnp.uint32(ord("a"))) | (lower == jnp.uint32(ord("c"))) |
        (lower == jnp.uint32(ord("g"))) | (lower == jnp.uint32(ord("t")))
    ).astype(jnp.uint32)

    w = codes
    for s in (1, 2, 4, 8):
        w = w | (_shift_left_roll(w, s, iota) << (2 * s))

    # window words, little-endian lanes [w0..w3] = bases [0:16,16:32,32:48,48:64]
    fw = [w, _shift_left_roll(w, 16, iota), _shift_left_roll(w, 32, iota),
          _shift_left_roll(w, 48, iota)]
    rem = k - 32
    if rem <= 16:
        if rem < 16:
            fw[2] = fw[2] & jnp.uint32((1 << (2 * rem)) - 1)
        fw[3] = jnp.zeros_like(fw[3])
    elif rem < 32:
        fw[3] = fw[3] & jnp.uint32((1 << (2 * (rem - 16))) - 1)

    # revcomp: complement, reverse all 64 base slots (lane swap + ladders),
    # shift down to k bases
    rev = [_ladder(~fw[3]), _ladder(~fw[2]), _ladder(~fw[1]), _ladder(~fw[0])]
    rc = _shr_lanes(rev, 2 * (64 - k))

    # canonical: lexicographic min, most-significant lane first
    fw_lt = fw[3] < rc[3]
    eq = fw[3] == rc[3]
    for j in (2, 1, 0):
        fw_lt = fw_lt | (eq & (fw[j] < rc[j]))
        eq = eq & (fw[j] == rc[j])
    canon = [jnp.where(fw_lt, a, b) for a, b in zip(fw, rc)]

    v = valid
    got = 1
    while got < k:
        step = got if got * 2 <= k else k - got
        v = v & _shift_left_roll(v, step, iota)
        got += step
    v = v & (iota < L - k + 1).astype(jnp.uint32)
    return canon, v


def _window_wide_kernel(reads_ref, c0_ref, c1_ref, c2_ref, c3_ref,
                        hash_hi_ref, hash_lo_ref, valid_ref,
                        *, k: int, seed: int):
    canon, v = _wide_body(reads_ref[:], k)

    # 128-bit mixer hash (core.u128.mix_hash)
    inner_hi, inner_lo = _mix64(canon[3], canon[2], seed ^ 0xA5A5A5A5)
    h_hi, h_lo = _mix64(canon[1] ^ inner_hi, canon[0] ^ inner_lo, seed)

    c0_ref[:] = canon[0]
    c1_ref[:] = canon[1]
    c2_ref[:] = canon[2]
    c3_ref[:] = canon[3]
    hash_hi_ref[:] = h_hi
    hash_lo_ref[:] = h_lo
    valid_ref[:] = v.astype(jnp.uint8)


def _folded_wide_kernel(reads_ref, k3_ref, k2_ref, k1_ref, k0_ref,
                        *, k: int):
    """Counting-consumer emission for wide keys: 4 uint32 planes with the
    INVALID flag folded into bit 31 of the most-significant lane
    (structurally clear for k <= 63: c3 holds at most 2k-96 <= 30 bits) --
    exactly count.UnitTableWide's layout (invalid lanes are
    (0x80000000, 0, 0, 0)).  16 B/lane out vs the full kernel's 26."""
    canon, v = _wide_body(reads_ref[:], k)
    vmask = jnp.uint32(0) - v
    k3_ref[:] = (canon[3] & vmask) | ((v ^ jnp.uint32(1)) << 31)
    k2_ref[:] = canon[2] & vmask
    k1_ref[:] = canon[1] & vmask
    k0_ref[:] = canon[0] & vmask


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pack_canonical_keys_wide(reads: jnp.ndarray, k: int,
                             block_rows: int = 128,
                             interpret: bool = False):
    """Counting-consumer variant of the wide window kernel (33 <= k <= 63,
    VERDICT r4 item 4): returns (k3, k2, k1, k0) [B, L] uint32 -- the
    canonical 128-bit word's little-endian lanes (k3 most significant)
    with the INVALID flag folded into bit 31 of k3, i.e. exactly the
    spare-bit layout of count.sort_by_word_wide(spare_hi_bit=True) /
    count.UnitTableWide (keys.hi.hi = k3, hi.lo = k2, lo.hi = k1,
    lo.lo = k0).  16 B/lane of output vs the full kernel's 26; invalid
    lanes are exactly (0x80000000, 0, 0, 0)."""
    assert 33 <= k <= 63, "bit 31 of the top lane must be clear"
    B, L = reads.shape
    bb = min(block_rows, B)
    assert B % bb == 0
    spec = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct((B, L), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_folded_wide_kernel, k=k),
        grid=(B // bb,),
        in_specs=[spec],
        out_specs=(spec,) * 4,
        out_shape=(out32,) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(reads)


@functools.partial(jax.jit, static_argnames=("k", "seed", "block_rows",
                                             "interpret"))
def pack_canonical_hash_wide(reads: jnp.ndarray, k: int, seed: int = 0,
                             block_rows: int = 128, interpret: bool = False):
    """Fused pack+canonical+hash for 33 <= k <= 64 over [B, L] uint8 reads.

    Returns (c0, c1, c2, c3, hash_hi, hash_lo, valid_u8), all [B, L]:
    canonical word = c3:c2:c1:c0 little-endian u32 lanes (c0 = bases 0..15).
    """
    assert 33 <= k <= 64
    B, L = reads.shape
    bb = min(block_rows, B)
    assert B % bb == 0
    spec = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct((B, L), jnp.uint32)
    out8 = jax.ShapeDtypeStruct((B, L), jnp.uint8)
    return pl.pallas_call(
        functools.partial(_window_wide_kernel, k=k, seed=seed),
        grid=(B // bb,),
        in_specs=[spec],
        out_specs=(spec,) * 7,
        out_shape=(out32, out32, out32, out32, out32, out32, out8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(reads)
