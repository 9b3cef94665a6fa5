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
    return _canon_hash_tail(hi, lo, v, k, seed, stage)


def _canon_hash_tail(hi, lo, v, k: int, seed: int, stage: str):
    """Shared tail of the window kernels (ASCII and packed-ingest): window
    words -> canonical [-> hash].  Bit-identical to the jnp path."""
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
                        block_rows: int = 64, interpret: bool = False):
    """Fused pack+canonical+hash over [B, L] uint8 reads (k <= 32).

    Returns (canon_hi, canon_lo, hash_hi, hash_lo, valid_u8), all [B, L];
    window p of read b starts at base p (positions past L-k are invalid).
    Valid lanes are bit-identical to the jnp path (ops.kmer.kmer_windows +
    canonical + core.u64.mix_hash); invalid lanes are ZERO in the four u32
    outputs (the jnp path leaves unspecified values there).
    B must be a multiple of block_rows (pad the batch).

    block_rows default 64 (round-5 sweep, same-session A/B on v5e):
    64 rows ran 31.8 vs 256's 28.5 G kmers/s (+11%) -- more grid steps
    give Mosaic better DMA/compute overlap at this VMEM footprint; 16 is
    too small (19.2 G) and 512 overflows scoped VMEM.
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


# -- packed-ingest kernel (VERDICT r4 item 3) ----------------------------------
#
# The CLI's default ingest ships 2-bit packed words (0.25 B/base) +
# validity bitmaps, not ASCII; this kernel starts FROM that layout, so
# per-lane HBM input drops 1 B (ASCII) -> 0.5 B (word + duplicated
# validity word / 16 lanes) and the host's pack work is not redone.
#
# The lane-order trick: Mosaic has no element-repeat along lanes (only
# pltpu.repeat = TILE-repeat), so expanding words[j] to the 16 lanes of
# its bases is not directly expressible.  But a tile-repeat IS the wanted
# expansion under a transposed lane order: define output lane
#     q = r * NW + j   <->   window at base p = 16*j + r
# (NW = L/16 words/row, r = in-word base offset).  Then
# tile16(words)[q] = words[q mod NW] = words[j] -- exactly the word
# containing base p -- and neighbor ops stay cheap:
#     base p+16  ->  (r, j+1)  =  lane q+1          (one roll)
#     base p+s   ->  r' = r+s mod 16, j' = j + (r+s)//16
#                =  lane q + NW*s        (r <  16-s)
#                   lane q + NW*s-L+1    (r >= 16-s)  (two rolls + select)
# The q-order output is a PERMUTATION of the window lanes, which the
# counting consumer (count.UnitTable -> merge sort) treats as an
# unordered multiset, so no un-permute pass is ever paid; tests compare
# against the jnp path through the documented q<->p map.


def _packed_windows(words: jnp.ndarray, vdup: jnp.ndarray, k: int):
    """[BB, NW] packed code words + [BB, NW] duplicated validity words ->
    (hi, lo, valid01) window planes [BB, L] in q-layout (see above).

    vdup[j] = validbits[j // 2] (host/XLA-side jnp.repeat): lane q's base
    p = 16j + r lives in 32-base validity word p//32 == j//2, bit
    p%32 == 16*(j&1) + r; NW is even (L % 32 == 0), so j&1 == q&1.
    Requires L % 128 == 0: the shift network uses unmasked full-rotation
    rolls (wrap garbage provably lands only at structurally invalid
    lanes), and unmasked rolls on a non-128-multiple lane axis hit the
    documented Mosaic miscompile (docs/design.md §11)."""
    BB, NW = words.shape
    L = NW * 16
    roll_l = lambda x, t: pltpu.roll(x, shift=(L - t) % L, axis=1)

    T = pltpu.repeat(words, repeats=16, axis=1)          # [BB, L]
    TV = pltpu.repeat(vdup, repeats=16, axis=1)
    q = jax.lax.broadcasted_iota(jnp.int32, (BB, L), 1)
    r = (q // NW).astype(jnp.uint32)                     # 0..15
    j_parity = (q & 1).astype(jnp.uint32)

    # w16[q] = bases p..p+15 = (words[j] >> 2r) | (words[j+1] << 32-2r)
    sh = 2 * r
    W1 = roll_l(T, 1)                                    # words[j+1]
    w16 = (T >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                W1 << ((jnp.uint32(32) - sh) &
                                       jnp.uint32(31)))

    # per-base validity bit: TV[q] = validbits[j//2], bit 16*(j&1) + r
    v = (TV >> (16 * j_parity + r)) & jnp.uint32(1)

    def shift_q(x, s: int):
        """x at base p -> x at base p+s (1 <= s <= 15) in q-layout."""
        a = roll_l(x, NW * s)                            # r < 16-s lanes
        b = pltpu.roll(x, shift=L - 1 - NW * s, axis=1)  # r >= 16-s lanes
        return jnp.where(r < jnp.uint32(16 - s), a, b)

    # window words: lo = w16[p], hi = w16[p+16] = lane q+1
    if k <= 16:
        lo = w16 & jnp.uint32((1 << (2 * k)) - 1) if k < 16 else w16
        hi = jnp.zeros_like(lo)
    else:
        lo = w16
        hi = roll_l(w16, 1)
        if k < 32:
            hi = hi & jnp.uint32((1 << (2 * (k - 16))) - 1)

    # k-window validity: log-doubling AND with q-space base shifts
    # (k <= 31 so every step is 1..15, within shift_q's range)
    vv = v
    got = 1
    while got < k:
        step = got if got * 2 <= k else k - got
        vv = vv & shift_q(vv, step)
        got += step

    # structural bound: window start p = 16*(q mod NW) + q//NW <= L-k
    p = 16 * (q % NW) + q // NW
    vv = vv & (p < L - k + 1).astype(jnp.uint32)
    return hi, lo, vv


def _folded_packed_kernel(words_ref, vdup_ref, key_hi_ref, key_lo_ref, *,
                          k: int, seed: int, stage: str):
    hi, lo, v = _packed_windows(words_ref[:], vdup_ref[:], k)
    if stage != "pack":
        hi, lo, v = _canon_hash_tail(hi, lo, v, k, seed, stage)
    vmask = jnp.uint32(0) - v
    key_hi_ref[:] = (hi & vmask) | ((v ^ jnp.uint32(1)) << 31)
    key_lo_ref[:] = lo & vmask


@functools.partial(jax.jit, static_argnames=("k", "stage", "block_rows",
                                             "interpret"))
def pack_canonical_keys_packed(words: jnp.ndarray, validbits: jnp.ndarray,
                               k: int, stage: str = "canon",
                               block_rows: int = 256,
                               interpret: bool = False):
    """pack_canonical_keys starting from PACKED ingest ([B, L/16] uint32
    code words + [B, L/32] validity bitmaps, io.fastx.read_packed_batches
    layout): folded (key_hi, key_lo) [B, L] uint32, invalid flag in bit 31
    of key_hi, 0.5 B/lane of input traffic instead of ASCII's 1.

    OUTPUT LANE ORDER IS PERMUTED (q-layout): lane q of a row is the
    window at base p = 16*(q % (L/16)) + q // (L/16).  Valid lanes are
    bit-identical to the jnp packed path under that map; invalid lanes
    are exactly (0x80000000, 0).  The counting consumer treats lanes as
    an unordered multiset, so the permutation is free.

    Constraints: 1 <= k <= 31, L % 128 == 0 (Mosaic unmasked-roll
    alignment, docs/design.md §11), B % block_rows == 0.
    """
    assert 1 <= k <= 31, "bit 31 of hi must be structurally clear"
    assert stage in ("pack", "canon")
    B, NW = words.shape
    L = NW * 16
    assert L % 128 == 0, "q-space rolls need lane axis % 128 == 0"
    assert validbits.shape == (B, NW // 2), (words.shape, validbits.shape)
    vdup = jnp.repeat(validbits, 2, axis=-1)             # [B, NW]
    bb = min(block_rows, B)
    assert B % bb == 0, (B, bb)
    spec_w = pl.BlockSpec((bb, NW), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out32 = jax.ShapeDtypeStruct((B, L), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_folded_packed_kernel, k=k, seed=0, stage=stage),
        grid=(B // bb,),
        in_specs=[spec_w, spec_w],
        out_specs=(spec_o, spec_o),
        out_shape=(out32, out32),
        interpret=interpret,
    )(words, vdup)


def qspace_positions(L: int) -> "jnp.ndarray":
    """p[q]: window base position of lane q in the packed kernel's output
    layout (tests / any consumer that needs positions back)."""
    import numpy as np

    nw = L // 16
    q = np.arange(L)
    return 16 * (q % nw) + q // nw


@functools.partial(jax.jit, static_argnames=("k", "stage", "block_rows",
                                             "interpret"))
def pack_canonical_keys(reads: jnp.ndarray, k: int, stage: str = "canon",
                        block_rows: int = 64, interpret: bool = False):
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
