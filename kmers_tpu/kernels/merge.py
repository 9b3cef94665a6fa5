"""Pallas TPU kernels for the streaming consolidation (VERDICT r4 item 1).

The round-4 consolidation re-sorted capacity + pending lanes from scratch
every merge (two full `lax.sort`s, 105 ms each at 25 M lanes -- measured
round 5), even though the main table is ALREADY sorted and the pending
lanes only need one cheap sort of their own.  These kernels replace both
big sorts with single streaming passes at HBM bandwidth:

  merge_sorted     merge-path merge of the sorted table (3 planes:
                   key_hi, key_lo, weight) with the sorted pending keys
                   (2 planes; weight == 1 derived from the folded flag
                   bit) -> one sorted (key_hi, key_lo, weight) array.
                   ~36 B/lane of HBM traffic instead of a 105 ms sort.
  compress_flagged stable-compact the flagged (run-start) lanes of a
                   sorted array to the front, carrying one payload plane
                   -- replaces the second full sort (the compaction) with
                   a read-once/write-once pass.

Design constraints honored (kernels/sort.py round-3 post-mortem +
docs/design.md §11): static strides only, no sublane rolls on
non-8-multiple row counts (all cross-row shifts are static slices +
concat), lane-axis rolls only at width exactly 128, small unrolled
networks (small unrolled stage counts, not 171).

Tile defaults from the round-5 on-chip sweep (25 M lanes): merge tile
32768 = 8.97 ms (8192: 13.94; 65536 no better), compress block 65536 =
4.82 ms (16384: 6.62; 131072 no better) -- bigger tiles amortize per-
grid-step overheads until VMEM pressure flattens the curve.

merge_sorted correctness sketch (merge path, Green et al.):
  * tile boundaries d_t = t*TILE are split by binary search into
    (a_t, b_t) with a_t + b_t = d_t and key(A[a_t-1]) <= key(B[b_t])
    under the composite order (key, source-index) -- A-first on ties.
  * output tile t is exactly the multiset A[a_t..a_{t+1}) u
    B[b_t..b_{t+1}); both windows fit in TILE lanes, so sorting the
    2*TILE window [A[a_t..a_t+TILE) asc, B-window desc] (a bitonic
    sequence) and keeping the first TILE lanes yields the tile.
  * the composite tie-break (a uint32 source-index plane, A < B) makes
    every element distinct, so tiles partition the multiset exactly even
    when equal keys straddle a boundary (weights differ among equal
    keys; without the tie-break a weight could be duplicated/lost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_plane_2d(x: jnp.ndarray, total: int, fill: int) -> jnp.ndarray:
    """1D uint32 -> [total/LANES, LANES] with `fill` padding."""
    pad = total - x.shape[0]
    x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(total // LANES, LANES)


def _rows_from(x: jnp.ndarray, base: int, r_out: int) -> jnp.ndarray:
    """x[base : base+r_out] rows, zero-padded past the end (static base)."""
    R = x.shape[0]
    lo = x[base:, :] if base < R else x[:0, :]
    need = r_out - lo.shape[0]
    if need > 0:
        lo = jnp.concatenate([lo, jnp.zeros((need, LANES), x.dtype)], axis=0)
    return lo[:r_out]


def _shift_linear_down(x: jnp.ndarray, S: int, R_out: int) -> jnp.ndarray:
    """out[lin] = x[lin + S] on a row-major [R, LANES] array (static S),
    returning R_out rows; out-of-range source lanes are zeros.  No
    sublane rolls: cross-row movement is static slices + concat; the
    lane-level rotation is a static pltpu.roll on the (exactly 128-wide,
    Mosaic-safe) lane axis."""
    m, s = divmod(S, LANES)
    if s == 0:
        return _rows_from(x, m, R_out)
    y = pltpu.roll(x, shift=LANES - s, axis=1)      # y[r, l] = x[r, (l+s)%128]
    ya = _rows_from(y, m, R_out)
    yb = _rows_from(y, m + 1, R_out)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R_out, LANES), 1)
    return jnp.where(lane < LANES - s, ya, yb)


def _xor_partner(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """p[i] = x[i ^ s] on a row-major [R, LANES] array (static stride s).

    s < LANES: lane-axis XOR via two static lane rolls + select (lane
    axis width is exactly 128 -- the Mosaic-safe case).
    s >= LANES: row XOR m = s/LANES via static row slices + concat
    (rows with row&m==0 read row+m, others row-m; both in-bounds)."""
    R = x.shape[0]
    if s < LANES:
        left = pltpu.roll(x, shift=LANES - s, axis=1)    # x[r, l+s]
        right = pltpu.roll(x, shift=s, axis=1)           # x[r, l-s]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & s) == 0, left, right)
    m = s // LANES
    down = jnp.concatenate([x[m:], x[:m]], axis=0)       # x[row+m] (junk wrap)
    up = jnp.concatenate([x[R - m:], x[:R - m]], axis=0)  # x[row-m]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & m) == 0, down, up)


def _window_extract(vbuf: jnp.ndarray, off, RW: int) -> jnp.ndarray:
    """First TILE lanes starting at dynamic in-row offset `off` (0..127)
    of a [RW+1, LANES] DMA landing buffer: one dynamic lane roll + static
    slices (no sublane rolls)."""
    sh = jax.lax.rem(LANES - off, LANES)
    y = pltpu.roll(vbuf, shift=sh, axis=1)           # y[r, l] = x[r, (l+off)%128]
    ya = y[:RW]
    yb = y[1:RW + 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (RW, LANES), 1)
    return jnp.where(lane < LANES - off, ya, yb)


@functools.partial(jax.jit, static_argnames=("tile", "interpret",
                                             "with_idx"))
def merge_sorted(a_hi, a_lo, a_w, b_hi, b_lo, tile: int = 32768,
                 interpret: bool = False, with_idx: bool = False):
    """Merge sorted A (key_hi, key_lo, weight-u32) with sorted B
    (key_hi, key_lo in the folded spare-bit layout: bit 31 of hi set =
    dead lane, weight = flag^1) into one sorted (hi, lo, w) of length
    round_up(nA+nB, tile); tail pad lanes are (0xFFFFFFFF, 0xFFFFFFFF, 0).

    Both inputs must be ascending by (hi, lo) with dead/sentinel lanes
    (bit 31 of hi set) sorted last.  Equal real keys merge in A-then-B
    index order (irrelevant to the weighted re-count, but deterministic).

    with_idx=True additionally returns the composite source-index plane:
    bit 31 set = a B lane, low bits = its rank in B (A lanes: rank in A).
    The merge-based lookup keys on it (count.lookup_merge).

    One implementation serves both key widths: this is _merge_sorted_impl
    at nk=2; merge_sorted_wide is the same at nk=4.
    """
    keys, w, *rest = _merge_sorted_impl((a_hi, a_lo), a_w, (b_hi, b_lo),
                                        tile, interpret, with_idx)
    return (keys[0], keys[1], w, *rest)


# -- streaming compress (the compaction sort replacement) ----------------------

def _cumsum_lanes_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum along the 128-lane axis (log-doubling with
    static lane rolls)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < LANES:
        sh = pltpu.roll(acc, shift=s, axis=1)          # acc[r, l-s]
        acc = acc + jnp.where(lane >= s, sh, jnp.zeros_like(sh))
        s *= 2
    return acc - x


def _cumsum_rows_excl(tot: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum along rows (static slice shifts; tot is
    [R, LANES] with the row total broadcast across lanes)."""
    R = tot.shape[0]
    acc = tot
    s = 1
    while s < R:
        sh = jnp.concatenate(
            [jnp.zeros((s, LANES), tot.dtype), acc[:R - s]], axis=0)
        acc = acc + sh
        s *= 2
    return acc - tot


def _compress_kernel(offs_ref, cnt_ref,
                     hi_ref, lo_ref, pay_ref, keep_ref,
                     out_hi_ref, out_lo_ref, out_pay_ref,
                     c_hi, c_lo, c_pay, s_hi, s_lo, s_pay, sem,
                     *, rows: int, n_blocks: int):
    """Grid step g: stable-compact this block's kept lanes behind the
    carried partial row, write all full 128-lane rows to the output at
    the (jnp-precomputed, row-aligned) offset, keep the new partial row
    in the persistent carry scratch.  Grid execution is sequential on
    TPU, so the carry flows block to block."""
    WR = rows + 8            # working rows: 1 carry + `rows` block + pad
    g = pl.program_id(0)
    off = offs_ref[g]
    cnt = cnt_ref[g]
    carry_cnt = jax.lax.rem(off, LANES)
    r0 = off // LANES

    keep = keep_ref[:].astype(jnp.uint32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    # rank of each kept lane within the block (exclusive count of kept
    # lanes before it, row-major)
    lane_excl = _cumsum_lanes_excl(keep)
    row_tot = jnp.broadcast_to(
        (lane_excl[:, LANES - 1:] + keep[:, LANES - 1:]), (rows, LANES))
    rank = _cumsum_rows_excl(row_tot) + lane_excl

    lin = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
           + lane)
    disp_blk = (LANES + lin) - (carry_cnt + rank.astype(jnp.int32))

    def widen(x, fill=0):
        pad = jnp.full((WR - 1 - rows, LANES), fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    carry_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    carry_active = (carry_lane < carry_cnt).astype(jnp.uint32)
    w_hi = jnp.concatenate([c_hi[:], widen(hi_ref[:])], axis=0)
    w_lo = jnp.concatenate([c_lo[:], widen(lo_ref[:])], axis=0)
    w_pay = jnp.concatenate([c_pay[:], widen(pay_ref[:])], axis=0)
    w_rem = jnp.concatenate(
        [jnp.zeros((1, LANES), jnp.int32),
         widen(jnp.where(keep == 1, disp_blk, 0))], axis=0)
    w_act = jnp.concatenate([carry_active, widen(keep)], axis=0)

    # LSB-first bit-serial shifts of the monotone partial route: two
    # active elements never collide (see module docstring proof sketch)
    b = 0
    while (1 << b) <= LANES + rows * LANES:
        s = 1 << b
        moving = (w_act == 1) & (((w_rem >> b) & 1) == 1)
        mv_u32 = moving.astype(jnp.uint32)
        recv = _shift_linear_down(mv_u32, s, WR) == 1
        w_hi = jnp.where(recv, _shift_linear_down(w_hi, s, WR), w_hi)
        w_lo = jnp.where(recv, _shift_linear_down(w_lo, s, WR), w_lo)
        w_pay = jnp.where(recv, _shift_linear_down(w_pay, s, WR), w_pay)
        w_rem = jnp.where(recv, _shift_linear_down(w_rem, s, WR) - s, w_rem)
        w_act = jnp.where(recv, jnp.uint32(1),
                          jnp.where(moving, jnp.uint32(0), w_act))
        b += 1

    total = carry_cnt + cnt
    rows_full = total // LANES

    # DMA sources must be refs: land the routed planes in VMEM scratch
    s_hi[:] = w_hi
    s_lo[:] = w_lo
    s_pay[:] = w_pay

    # write rows [0, rows_full) at output row r0 via power-of-two DMAs
    # (DMA row counts must divide/be multiples of the 8-sublane tile)
    def write_rows(src, dst, row_off, nrows):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(row_off, nrows), :],
            dst.at[pl.ds(r0 + row_off, nrows), :], sem)
        cp.start()
        cp.wait()

    # enough bits to cover rows_full <= rows (carry < 128 adds no row;
    # rows is a power of two, so bit_length() covers exactly 0..rows)
    for bit in reversed(range(max(8, rows.bit_length()))):
        nrows = 1 << bit
        row_off = (rows_full >> (bit + 1)) << (bit + 1)

        @pl.when(((rows_full >> bit) & 1) == 1)
        def _(nrows=nrows, row_off=row_off):
            write_rows(s_hi, out_hi_ref, row_off, nrows)
            write_rows(s_lo, out_lo_ref, row_off, nrows)
            write_rows(s_pay, out_pay_ref, row_off, nrows)

    # final flush: the last block writes its partial row too (junk tail
    # lanes past n_unique are masked by the caller).  Must happen BEFORE
    # the carry update below overwrites nothing -- reads s_* refs.
    @pl.when((g == n_blocks - 1) & (total > rows_full * LANES))
    def _():
        write_rows(s_hi, out_hi_ref, rows_full, 1)
        write_rows(s_lo, out_lo_ref, rows_full, 1)
        write_rows(s_pay, out_pay_ref, rows_full, 1)

    # stash the new partial row in the carry scratch
    c_hi[:] = s_hi[pl.ds(rows_full, 1), :]
    c_lo[:] = s_lo[pl.ds(rows_full, 1), :]
    c_pay[:] = s_pay[pl.ds(rows_full, 1), :]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def compress_flagged(hi, lo, pay, keep, block: int = 65536,
                     interpret: bool = False):
    """Stable-compact the lanes with keep != 0 to the front, carrying
    `pay`: out[j] = (hi, lo, pay) of the j-th kept lane.  Returns
    (hi, lo, pay) of the padded input length; lanes past the kept count
    are UNSPECIFIED (mask with the caller-known count).

    One read + one write of the data instead of the 3-operand full sort
    the round-4 compaction used (105 ms at 25 M lanes -- this pass is
    ~24 B/lane of HBM traffic).  keep: uint8/uint32 0-or-1 lanes."""
    n = hi.shape[0]
    n_pad = _round_up(max(n, block), block)
    G = n_pad // block
    rows = block // LANES
    keep8 = keep.astype(jnp.uint8)
    k2 = _pad_plane_2d(keep8.astype(jnp.uint32), n_pad, 0).astype(jnp.uint8)
    hi2 = _pad_plane_2d(hi, n_pad, 0)
    lo2 = _pad_plane_2d(lo, n_pad, 0)
    pay2 = _pad_plane_2d(pay.astype(jnp.uint32), n_pad, 0)
    per_block = (k2.astype(jnp.uint32).reshape(G, block).sum(axis=1)
                 .astype(jnp.int32))
    offs = (jnp.cumsum(per_block) - per_block).astype(jnp.int32)

    blk_spec = pl.BlockSpec((rows, LANES), lambda g, *_: (g, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[blk_spec, blk_spec, blk_spec, blk_spec],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.uint32) for _ in range(3)]
        + [pltpu.VMEM((rows + 8, LANES), jnp.uint32) for _ in range(3)]
        + [pltpu.SemaphoreType.DMA(())],
    )
    out2 = jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.uint32)
    o_hi, o_lo, o_pay = pl.pallas_call(
        functools.partial(_compress_kernel, rows=rows, n_blocks=G),
        grid_spec=grid_spec,
        out_shape=(out2, out2, out2),
        interpret=interpret,
    )(offs, per_block, hi2, lo2, pay2, k2)
    return (o_hi.reshape(-1)[:n], o_lo.reshape(-1)[:n],
            o_pay.reshape(-1)[:n])


# -- N-key-plane variant (wide keys: 33 <= k <= 63) ----------------------------

def _bitonic_merge_n(keys, w, idx, n2: int):
    """Sort a bitonic [R2, LANES] sequence by the strictly-distinct
    composite key (keys..., idx), carrying w: log2(n2) compare-exchange
    stages, static strides.  Distinct keys mean the up-lane of every
    pair keeps the strict minimum and the down-lane the maximum --
    complementary selections, no tie ambiguity."""
    lin = (jax.lax.broadcasted_iota(jnp.int32, keys[0].shape, 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, keys[0].shape, 1))
    s = n2 // 2
    while s >= 1:
        p_keys = [_xor_partner(kp, s) for kp in keys]
        p_w = _xor_partner(w, s)
        p_idx = _xor_partner(idx, s)
        lt = jnp.zeros(keys[0].shape, jnp.bool_)
        eq = jnp.ones(keys[0].shape, jnp.bool_)
        for kp, pp in zip(keys, p_keys):
            lt = lt | (eq & (kp < pp))
            eq = eq & (kp == pp)
        lt = lt | (eq & (idx < p_idx))
        is_up = (lin & s) == 0
        keep_self = is_up == lt
        keys = [jnp.where(keep_self, kp, pp)
                for kp, pp in zip(keys, p_keys)]
        w = jnp.where(keep_self, w, p_w)
        idx = jnp.where(keep_self, idx, p_idx)
        s //= 2
    return keys, w, idx


def _merge_kernel_n(a_start_ref, b_fs_ref, *refs,
                    tile: int, n_a: int, n_b: int, nk: int,
                    with_idx: bool):
    """The merge kernel over nk key planes.  refs layout: nk A-key refs,
    1 A-weight ref, nk flipped-B-key refs, then nk+1 (+1 if with_idx)
    output refs (keys + w [+ source index]), then 2*nk+1 VMEM scratch,
    then the DMA semaphore array.

    DMA row count RW + 8: Mosaic's HBM<->VMEM DMA faults on row counts
    that are not multiples (or divisors) of the 8-sublane tile --
    measured on v5e: 2/4/8/16-row copies are exact at ARBITRARY row
    offsets, 6/9-row copies crash the worker.  Only the first RW+1 rows
    are consumed."""
    n_in = 2 * nk + 1
    n_o = nk + 1 + (1 if with_idx else 0)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:n_in + n_o]
    scratch = refs[n_in + n_o:n_in + n_o + n_in]
    sems = refs[n_in + n_o + n_in]
    RW = tile // LANES
    t = pl.program_id(0)
    a0 = a_start_ref[t]
    fs = b_fs_ref[t]

    cps = []
    for slot, (src, dst) in enumerate(zip(in_refs, scratch)):
        start = a0 if slot <= nk else fs
        cp = pltpu.make_async_copy(
            src.at[pl.ds(start // LANES, RW + 8), :], dst, sems.at[slot])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    a_off = jax.lax.rem(a0, LANES)
    b_off = jax.lax.rem(fs, LANES)
    wa = [_window_extract(scratch[i][:], a_off, RW) for i in range(nk + 1)]
    wb = [_window_extract(scratch[nk + 1 + i][:], b_off, RW)
          for i in range(nk)]

    lin = (jax.lax.broadcasted_iota(jnp.int32, (RW, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (RW, LANES), 1))
    idx_a = (a0 + lin).astype(jnp.uint32)
    pf = tile
    b_of_lin = (pf + n_b - 1) - (fs + lin)
    idx_b = jnp.uint32(1 << 31) + b_of_lin.astype(jnp.uint32)
    wb_w = (wb[0] >> 31) ^ jnp.uint32(1)   # flag in the MS key plane

    keys = [jnp.concatenate([wa[i], wb[i]], axis=0) for i in range(nk)]
    w = jnp.concatenate([wa[nk], wb_w], axis=0)
    idx = jnp.concatenate([idx_a, idx_b], axis=0)

    s_keys, s_w, s_idx = _bitonic_merge_n(keys, w, idx, 2 * tile)
    for i in range(nk):
        out_refs[i][:] = s_keys[i][:RW]
    out_refs[nk][:] = s_w[:RW]
    if with_idx:
        out_refs[nk + 1][:] = s_idx[:RW]


def _le_lex(a_vals, b_vals):
    lt = None
    eq = None
    for av, bv in zip(a_vals, b_vals):
        if lt is None:
            lt = av < bv
            eq = av == bv
        else:
            lt = lt | (eq & (av < bv))
            eq = eq & (av == bv)
    return lt | eq


def _merge_path_search_n(a_keys, b_keys, tile: int, n_out: int):
    """Vectorized merge-path boundary search over nk-plane lexicographic
    keys: for each tile boundary d_t = t*tile, the largest a with
    key(A[a-1]) <= key(B[d-a]) (A-first ties), a in
    [max(0, d-nB), min(d, nA)].  Returns a_starts [T] i32."""
    n_a, n_b = a_keys[0].shape[0], b_keys[0].shape[0]
    T = n_out // tile
    d = jnp.arange(T, dtype=jnp.int32) * tile
    lo_b = jnp.maximum(0, d - n_b)
    hi_b = jnp.minimum(d, n_a)
    steps = max(1, int(n_a).bit_length())
    for _ in range(steps):
        mid = (lo_b + hi_b + 1) // 2
        ai = jnp.clip(mid - 1, 0, n_a - 1)
        bi = jnp.clip(d - mid, 0, max(n_b - 1, 0))
        ok = _le_lex([kp[ai] for kp in a_keys], [kp[bi] for kp in b_keys])
        ok = ok | (mid - 1 < 0)
        ok = ok | (d - mid >= n_b)
        take = ok & (mid <= hi_b)
        lo_b = jnp.where(take, mid, lo_b)
        hi_b = jnp.where(take, hi_b, mid - 1)
    return lo_b


def _merge_sorted_impl(a_keys, a_w, b_keys, tile: int,
                       interpret: bool, with_idx: bool):
    """Shared nk-plane merge-path merge (see merge_sorted's contract).
    Returns (keys tuple, w[, idx])."""
    assert tile % (8 * LANES) == 0, "output block rows must be 8-aligned"
    nk = len(a_keys)
    assert nk == len(b_keys)
    n_a, n_b = a_keys[0].shape[0], b_keys[0].shape[0]
    n_out = _round_up(max(n_a + n_b, tile), tile)
    T = n_out // tile
    a_starts = _merge_path_search_n(a_keys, b_keys, tile, n_out)
    b_fs = n_b - (jnp.arange(T, dtype=jnp.int32) * tile - a_starts)

    MAXU = 0xFFFFFFFF
    # DMA windows read RW + 8 rows from start//LANES: pad both inputs
    # past their logical end accordingly; flipped B gets a tile-sized MAX
    # front pad (covers b >= nB reads)
    la = _round_up(n_a + tile + 9 * LANES, LANES)
    lb = _round_up(tile + n_b + 9 * LANES, LANES)
    pad_front = jnp.full((tile,), MAXU, jnp.uint32)
    a2 = [_pad_plane_2d(kp, la, MAXU) for kp in a_keys]
    a2.append(_pad_plane_2d(a_w.astype(jnp.uint32), la, 0))
    b2 = [_pad_plane_2d(jnp.concatenate([pad_front, jnp.flip(kp)]),
                        lb, MAXU) for kp in b_keys]

    RW = tile // LANES
    n_outs = nk + 1 + (1 if with_idx else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 * nk + 1),
        out_specs=[pl.BlockSpec((RW, LANES), lambda t, *_: (t, 0),
                                memory_space=pltpu.VMEM)] * n_outs,
        scratch_shapes=[pltpu.VMEM((RW + 8, LANES), jnp.uint32)
                        for _ in range(2 * nk + 1)]
        + [pltpu.SemaphoreType.DMA((2 * nk + 1,))],
    )
    out2 = jax.ShapeDtypeStruct((n_out // LANES, LANES), jnp.uint32)
    outs = pl.pallas_call(
        functools.partial(_merge_kernel_n, tile=tile, n_a=n_a, n_b=n_b,
                          nk=nk, with_idx=with_idx),
        grid_spec=grid_spec,
        out_shape=(out2,) * n_outs,
        interpret=interpret,
    )(a_starts, b_fs, *a2, *b2)
    flat = [o.reshape(-1) for o in outs]
    if with_idx:
        return tuple(flat[:nk]), flat[nk], flat[nk + 1]
    return tuple(flat[:nk]), flat[nk]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def merge_sorted_wide(a_keys, a_w, b_keys, tile: int = 32768,
                      interpret: bool = False):
    """merge_sorted for 128-bit keys: a_keys / b_keys are 4-tuples of
    uint32 planes, MOST significant first (UnitTableWide layout: the
    folded dead flag is bit 31 of plane 0).  Returns (keys 4-tuple, w)
    of length round_up(nA+nB, tile)."""
    return _merge_sorted_impl(tuple(a_keys), a_w, tuple(b_keys), tile,
                              interpret, False)
