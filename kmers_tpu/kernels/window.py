"""Pallas TPU kernel: fused ASCII -> pack -> k-mer windows -> canonical -> hash.

The roofline kernel of the framework (BASELINE.json: ">= 80% of HBM roofline
on the pack kernel").  One kernel instance loads a [BB, L] slab of ASCII
reads into VMEM and produces, entirely on-chip:

  canonical (hi, lo) uint32, mixer hash (hi, lo) uint32, validity mask

so HBM traffic is exactly 1 B/base in + 17 B/window out -- none of the
log-doubling intermediates ever leave VMEM.

Position shifts (the log-doubling pack and the k-window validity AND) use
``pltpu.roll`` + an iota tail mask instead of pad/concat: roll is a native
Mosaic lane rotation, and the tail lanes (positions past L-s) are zeroed by
compare-with-iota -- no scalar loops, no dynamic shapes.

Semantics are bit-identical to the jnp path (ops.kmer.kmer_windows +
core.u64.mix_hash); tests drive both and compare (SURVEY.md §5.2: test
Pallas kernels in interpret mode vs the jnp reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _shift_left_roll(a: jnp.ndarray, s: int, iota: jnp.ndarray) -> jnp.ndarray:
    """a'[.., p] = a[.., p+s] (zeros past the end), via roll + tail mask."""
    if s == 0:
        return a
    L = a.shape[-1]
    if s >= L:   # every source position is past the end (tiny-L reads)
        return jnp.zeros_like(a)
    rolled = pltpu.roll(a, shift=L - s, axis=len(a.shape) - 1)
    return jnp.where(iota < L - s, rolled, jnp.zeros_like(a))


def _roll_left(a: jnp.ndarray, s: int) -> jnp.ndarray:
    """a'[.., p] = a[.., (p+s) mod L] -- NO tail mask (when safe).

    Compute-saver for the window kernel: a k-window at lane p only reads
    lanes p..p+k-1, all < L whenever the window is structurally valid
    (p <= L-k), so wrap-around garbage lands exclusively in lanes the final
    validity AND (iota < L-k+1) marks invalid -- and those lanes' outputs
    are zeroed wholesale at the end.  Saves one compare + one select per
    roll (~10 rolls/lane) over _shift_left_roll.

    ONLY when L % 128 == 0: Mosaic's compiled lowering of an unmasked
    full-rotation roll over a lane axis that is NOT a multiple of the
    128-lane register width produced wrong values at ~1% of INTERIOR
    (structurally valid) lanes -- caught by the round-4 on-device test
    lane (tests/test_tpu_device.py, L=160: 239/14761 valid lanes wrong;
    L=256: 0; interpret mode: 0; the masked form: 0 everywhere).  For
    unaligned L we fall back to the masked form, which never consumes
    rolled-in lanes."""
    if s == 0:
        return a
    L = a.shape[-1]
    if s >= L:
        return jnp.zeros_like(a)
    if L % 128 != 0:
        iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
        return _shift_left_roll(a, s, iota)
    return pltpu.roll(a, shift=L - s, axis=len(a.shape) - 1)


def _window_body(ascii_u8, k: int, seed: int, stage: str):
    """Shared on-chip pipeline: ASCII -> packed window words [-> canonical
    [-> hash]].  stage selects how deep to compute:

      "pack"  -> (fw_hi, fw_lo, v)            ~55 VPU ops/lane
      "canon" -> (canon_hi, canon_lo, v)      ~90 VPU ops/lane
      "full"  -> (canon_hi, canon_lo, h_hi, h_lo, v)   ~120 VPU ops/lane

    The graded stages exist for the roofline ablation (BASELINE.md): with
    output bytes held constant across "pack"/"canon", rate differences
    isolate compute cost; with compute held constant, output-set
    differences isolate HBM traffic."""
    BB, L = ascii_u8.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (BB, L), 1)

    c = ascii_u8.astype(jnp.uint32)
    internal = (c >> 1) & jnp.uint32(3)
    codes = internal ^ (internal >> 1)          # A=0,C=1,G=2,T=3
    lower = c | jnp.uint32(0x20)
    # validity as 0/1 uint32: Mosaic's lane rotate handles 32-bit data only,
    # so the log-doubling AND below must not operate on i1 vectors
    valid = (
        (lower == jnp.uint32(ord("a"))) | (lower == jnp.uint32(ord("c"))) |
        (lower == jnp.uint32(ord("g"))) | (lower == jnp.uint32(ord("t")))
    ).astype(jnp.uint32)

    # log-doubling pack: w16[p] = bases p..p+15 (unmasked rolls: wrap
    # garbage only reaches structurally-invalid lanes, zeroed at the end)
    w = codes
    for s in (1, 2, 4, 8):
        w = w | (_roll_left(w, s) << (2 * s))

    # window words (k <= 32): lo = w16[p], hi = w16[p+16] masked
    if k <= 16:
        lo = w & jnp.uint32((1 << (2 * k)) - 1) if k < 16 else w
        hi = jnp.zeros_like(lo)
    else:
        lo = w
        hi = _roll_left(w, 16)
        if k < 32:
            hi = hi & jnp.uint32((1 << (2 * (k - 16))) - 1)

    # validity of the k-window: log-doubling AND, then structural bound
    # (a valid window's AND tree reads only lanes p..p+k-1 < L, so the
    # unmasked rolls are safe here too)
    v = valid
    got = 1
    while got < k:
        step = got if got * 2 <= k else k - got
        v = v & _roll_left(v, step)
        got += step
    v = v & (iota < L - k + 1).astype(jnp.uint32)

    if stage == "pack":
        return hi, lo, v

    # reverse complement: complement, 4-step in-lane ladder, (hi,lo) swap,
    # shift down to k bases (naive_impl/kmer.rs:124-136)
    def ladder(x):
        x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
        x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
        x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
        return (x >> 16) | (x << 16)

    rc_hi64, rc_lo64 = ladder(~lo), ladder(~hi)
    sh = 2 * (32 - k)
    if sh:
        if sh < 32:
            rc_lo = (rc_lo64 >> sh) | (rc_hi64 << (32 - sh))
            rc_hi = rc_hi64 >> sh
        elif sh == 32:
            rc_lo, rc_hi = rc_hi64, jnp.zeros_like(rc_hi64)
        else:
            rc_lo = rc_hi64 >> (sh - 32)
            rc_hi = jnp.zeros_like(rc_hi64)
    else:
        rc_hi, rc_lo = rc_hi64, rc_lo64

    # canonical = min((hi,lo), (rc_hi,rc_lo))
    fw_smaller = (hi < rc_hi) | ((hi == rc_hi) & (lo < rc_lo))
    canon_hi = jnp.where(fw_smaller, hi, rc_hi)
    canon_lo = jnp.where(fw_smaller, lo, rc_lo)

    if stage == "canon":
        return canon_hi, canon_lo, v

    # mixer hash (bit-identical to core.u64.mix_hash)
    def mix32(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        return x ^ (x >> 16)

    s_lo = jnp.uint32(seed & 0xFFFFFFFF)
    s_hi = jnp.uint32((seed >> 32) & 0xFFFFFFFF)
    h_lo = mix32(canon_lo ^ mix32(canon_hi ^ s_lo))
    h_hi = mix32(canon_hi ^ mix32(canon_lo ^ s_hi ^ jnp.uint32(0x9E3779B9)))
    return canon_hi, canon_lo, h_hi, h_lo, v


def _window_kernel(reads_ref, canon_hi_ref, canon_lo_ref,
                   hash_hi_ref, hash_lo_ref, valid_ref, *, k: int, seed: int):
    canon_hi, canon_lo, h_hi, h_lo, v = _window_body(
        reads_ref[:], k, seed, "full")
    vmask = jnp.uint32(0) - v          # v in {0,1}: 0 or all-ones
    canon_hi_ref[:] = canon_hi & vmask
    canon_lo_ref[:] = canon_lo & vmask
    hash_hi_ref[:] = h_hi & vmask
    hash_lo_ref[:] = h_lo & vmask
    valid_ref[:] = v.astype(jnp.uint8)


def _folded_kernel(reads_ref, key_hi_ref, key_lo_ref, *, k: int, seed: int,
                   stage: str):
    """Counting-consumer emission: 2 uint32 planes instead of 4 + a valid
    byte.  The invalid flag folds into bit 31 of the hi word (structurally
    clear for k <= 31: hi holds at most 2k-32 <= 30 bits), which is exactly
    the spare-bit key layout parallel.count.sort_by_word(spare_hi_bit=True)
    sorts on.  HBM out drops 17 -> 8 B/lane."""
    out = _window_body(reads_ref[:], k, seed, stage)
    hi, lo, v = out[0], out[1], out[-1]
    vmask = jnp.uint32(0) - v
    key_hi_ref[:] = (hi & vmask) | ((v ^ jnp.uint32(1)) << 31)
    key_lo_ref[:] = lo & vmask


@functools.partial(jax.jit, static_argnames=("k", "seed", "block_rows",
                                             "interpret"))
def pack_canonical_hash(reads: jnp.ndarray, k: int, seed: int = 0,
                        block_rows: int = 256, interpret: bool = False):
    """Fused pack+canonical+hash over [B, L] uint8 reads (k <= 32).

    Returns (canon_hi, canon_lo, hash_hi, hash_lo, valid_u8), all [B, L];
    window p of read b starts at base p (positions past L-k are invalid).
    Valid lanes are bit-identical to the jnp path (ops.kmer.kmer_windows +
    canonical + core.u64.mix_hash); invalid lanes are ZERO in the four u32
    outputs (the jnp path leaves unspecified values there).
    B must be a multiple of block_rows (pad the batch).
    """
    assert 1 <= k <= 32
    B, L = reads.shape
    bb = min(block_rows, B)
    assert B % bb == 0, (B, bb)
    grid = (B // bb,)
    spec = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct((B, L), jnp.uint32)
    out8 = jax.ShapeDtypeStruct((B, L), jnp.uint8)
    return pl.pallas_call(
        functools.partial(_window_kernel, k=k, seed=seed),
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec, spec, spec, spec),
        out_shape=(out32, out32, out32, out32, out8),
        interpret=interpret,
    )(reads)


@functools.partial(jax.jit, static_argnames=("k", "stage", "block_rows",
                                             "interpret"))
def pack_canonical_keys(reads: jnp.ndarray, k: int, stage: str = "canon",
                        block_rows: int = 256, interpret: bool = False):
    """Counting-consumer variant of the window kernel (k <= 31): returns
    (key_hi, key_lo) [B, L] uint32 with the INVALID flag folded into bit 31
    of key_hi -- the exact spare-bit sort-key layout of
    parallel.count.sort_by_word(spare_hi_bit=True).  8 B/lane of output vs
    the full kernel's 17 (VERDICT r2 item 5: cut output traffic for the
    counting consumer).

    stage="canon" keys are the canonical k-mer word; stage="pack" stops at
    the forward window word (the roofline ablation's compute-light arm).
    Valid lanes match the jnp path bit-for-bit; invalid lanes are exactly
    0x80000000 / 0.
    """
    assert 1 <= k <= 31, "bit 31 of hi must be structurally clear"
    assert stage in ("pack", "canon")
    B, L = reads.shape
    bb = min(block_rows, B)
    assert B % bb == 0, (B, bb)
    spec = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct((B, L), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_folded_kernel, k=k, seed=0, stage=stage),
        grid=(B // bb,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(out32, out32),
        interpret=interpret,
    )(reads)
