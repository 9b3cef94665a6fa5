"""Measure the five BASELINE.json graded configs; print one JSON line each.

Usage: python bench_configs.py [--quick]

Runs on whatever jax.devices()[0] is (the real TPU chip under the driver).
Multi-chip configs (4, 5) measure the single-chip kernel here and are
functionally validated on the 8-device CPU mesh by tests/test_parallel.py,
tests/test_halo.py (no multi-chip hardware in this environment).

Timing: the benchlib serial-chain slope protocol -- every iteration's input
is derived on-device from the previous iteration's outputs, the only sync
is a dependent-scalar fetch, and the rate is the slope between two chain
lengths (see benchlib.py for why block_until_ready timing is fiction over
the axon relay).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_kmers_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import benchlib

QUICK = "--quick" in sys.argv


def first_reads(B, L, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                  size=(B, L)))


def emit(name, value, unit, note=""):
    print(json.dumps({"config": name, "value": round(value, 1), "unit": unit,
                      "note": note}), flush=True)


def main():
    from kmers_tpu.core import u64 as u
    from kmers_tpu.kernels import minimizer as kmini, window as kwin
    from kmers_tpu.kernels import window_wide as kww
    from kmers_tpu.ops import kmer as kmer_ops
    from kmers_tpu.parallel import count_reads

    # config 1: k=15 encode+hash, 10k x 150bp reads
    B1, L1 = (1024, 152) if QUICK else (10240, 152)

    def cfg1(reads):
        win = kmer_ops.kmer_windows(reads, 15)
        h = u.mix_hash(win.fw)
        return benchlib.ascii_from_codes(h.lo)

    # k15 is so fast (~12 us/iter) that the default 256-iteration delta
    # is within relay RTT jitter -- a 2026-08 run measured a physically
    # impossible 1.8 T kmers/s that way.  Stretch the chain so the delta
    # is ~25 ms of pure device time.
    rate = benchlib.chain_rate(cfg1, first_reads(B1, L1, 1),
                               B1 * (L1 - 15 + 1), s_short=8, s_long=2056)
    emit("k15_encode_hash_150bp", rate, "kmers/s")

    # config 2: k=31 canonical over 1M reads (streamed in batches)
    B2, L2 = 2048, 1024

    def cfg2(reads):
        _, _, _, hash_lo, _ = kwin.pack_canonical_hash(reads, 31)
        return benchlib.ascii_from_codes(hash_lo)

    rate = benchlib.chain_rate(cfg2, first_reads(B2, L2, 2),
                               B2 * (L2 - 31 + 1))
    emit("k31_canonical_hash", rate, "kmers/s",
         "bit-exactness vs reference: tests/test_ops.py, tests/test_oracle.py")

    # config 3: k=63 multi-word (2xu64) windows + canonical + hash
    # (fused Pallas kernel; correctness vs jnp checked here on-device)
    from kmers_tpu.core import u128 as u128mod

    B3, L3 = (256, 512) if QUICK else (2048, 1024)
    inp3 = first_reads(B3, L3, 3)
    got = jax.block_until_ready(kww.pack_canonical_hash_wide(inp3, 63))
    win = kmer_ops.kmer_windows_wide(inp3, 63)
    canon = kmer_ops.canonical_word_wide(win.fw, win.rc)
    h = u128mod.mix_hash(canon, 0)
    exact = all([
        np.array_equal(np.asarray(got[0]), np.asarray(canon.lo.lo)),
        np.array_equal(np.asarray(got[3]), np.asarray(canon.hi.hi)),
        np.array_equal(np.asarray(got[4]), np.asarray(h.hi)),
        np.array_equal(np.asarray(got[6]).astype(bool),
                       np.asarray(win.valid)),
    ])
    del got, win, canon, h  # free device memory before the timed loop

    def cfg3(reads):
        outs = kww.pack_canonical_hash_wide(reads, 63)
        return benchlib.ascii_from_codes(outs[5])   # hash_lo

    rate = benchlib.chain_rate(cfg3, inp3, B3 * (L3 - 63 + 1))
    emit("k63_2xu64_window_canonical", rate, "kmers/s",
         f"pallas kernel, on-device bit-exact vs jnp: {exact}")

    # config 3u: the wide FOLDED-KEY kernel (round 5) -- the wide unit
    # streaming path's per-batch emission (16 B/lane out vs full's 26)
    def cfg3u(reads):
        k3, k2, k1, k0 = kww.pack_canonical_keys_wide(reads, 63)
        return benchlib.ascii_from_codes(k0 ^ k1 ^ k2 ^ k3)

    rate = benchlib.chain_rate(cfg3u, inp3, B3 * (L3 - 63 + 1))
    emit("k63_folded_keys_unit", rate, "kmers/s",
         "pack_canonical_keys_wide: UnitTableWide spare-bit layout, the "
         "wide streaming per-batch form")

    # config 4: minimizers w=11 k=31 (single-chip kernel; 8-chip DP path
    # validated on CPU mesh in tests/test_halo.py)
    B4, L4 = (256, 512) if QUICK else (2048, 1024)

    def cfg4(reads):
        word_hi, word_lo, pos, _valid = kmini.minimizer_kernel(
            reads, 31, 11, order="mix16")
        return benchlib.ascii_from_codes(word_lo ^ pos.astype(jnp.uint32))

    rate = benchlib.chain_rate(cfg4, first_reads(B4, L4, 4),
                               B4 * (L4 - 31 + 1))
    emit("minimizers_k31_w11", rate, "kmers/s",
         "mix16 packed selection order (explicit opt-in; default is "
         "mix64); 8-chip data-parallel path: tests/test_halo.py on CPU "
         "mesh")

    # config 5: full counting pipeline (windows+canonical+sort+count),
    # E. coli-scale stream = many such batches; multi-host all_to_all path
    # validated on CPU mesh (tests/test_parallel.py)
    B5, L5 = (512, 256) if QUICK else (4096, 256)

    def cfg5(reads):
        res = count_reads(reads, 31)
        # scalar depending on the whole table; rotates every base code
        s = (jnp.sum(res.table.counts.astype(jnp.uint32)) ^
             jnp.sum(res.table.keys.lo)) & jnp.uint32(3)
        internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
        code = internal ^ (internal >> 1)
        return benchlib.ascii_from_codes(code + s)

    rate = benchlib.chain_rate(cfg5, first_reads(B5, L5, 5),
                               B5 * (L5 - 31 + 1))
    emit("count_pipeline_k31", rate, "kmers/s",
         "scatter-free sort+compact count table per batch; sharded path on CPU mesh")

    # config 5r: same pipeline in the streaming per-batch form -- run-length
    # table (count_sorted_runs), no per-batch compaction sort; this is what
    # StreamingCounter actually executes per batch
    def cfg5r(reads):
        res = count_reads(reads, 31, compact=False)
        s = (jnp.sum(res.table.counts.astype(jnp.uint32)) ^
             jnp.sum(res.table.keys.lo)) & jnp.uint32(3)
        internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
        code = internal ^ (internal >> 1)
        return benchlib.ascii_from_codes(code + s)

    rate = benchlib.chain_rate(cfg5r, first_reads(B5, L5, 5),
                               B5 * (L5 - 31 + 1))
    emit("count_pipeline_k31_runlength", rate, "kmers/s",
         "run-length table form (round-3 streaming per-batch mode): key "
         "sort + reverse-cummin, compaction deferred to consolidation")

    # config 5u: the round-4 streaming per-batch form -- UnitTable
    # passthrough (raw folded canonical keys from the fused Pallas kernel,
    # zero per-batch aggregation; see kmers_tpu/parallel/count.UnitTable)
    def cfg5u(reads):
        res = count_reads(reads, 31, aggregate="unit")
        s = (jnp.sum(res.table.keys.lo) ^ jnp.sum(res.table.keys.hi)
             ) & jnp.uint32(3)
        internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
        code = internal ^ (internal >> 1)
        return benchlib.ascii_from_codes(code + s)

    rate = benchlib.chain_rate(cfg5u, first_reads(B5, L5, 5),
                               B5 * (L5 - 31 + 1))
    emit("count_pipeline_k31_unit", rate, "kmers/s",
         "unit passthrough form (round-4 streaming per-batch mode): the "
         "per-batch table IS the fused window kernel's folded keys")


def length_matrix():
    """The reference's criterion matrix, all four arms
    (/root/reference/benches/simple_benchmark.rs:58-102): k=31 construct
    and reverse-complement, naive_impl vs generic+Xor10, over input
    lengths 2^8..2^15.

    ONE static shape serves the whole matrix (VERDICT r3 item 4): every
    length packs into the same [B, 2^15] slab as N-separated reads --
    m = floor((2^15+1)/(len+1)) reads of `len` bases per row, one 'N'
    between them (the N machinery invalidates the straddling windows
    natively, exactly as in production ragged batches).  Each arm
    therefore compiles exactly one chain pair; per-length numbers differ
    only in input data.  Rates use the VALID k-mers actually produced, so
    short lengths honestly pay their separator/tail overhead
    ((len-k+1)/(len+1) utilization) -- the TPU analog of the reference's
    per-length efficiency curve.

    Arm mapping (batch-first analogs of the per-window scalar loops):
      construct/naive  -> fused pack+windows+canonical+hash Pallas kernel
      construct/xor10  -> xor10 base codes + log-doubling window words
                          (generic Kmer<u64,31> + Xor10)
      rc/naive         -> windows + the 5-step revcomp ladder
      rc/xor10         -> xor10 windows + complement(^0b10) + base
                          reversal + shift (corrected semantics)
    """
    from kmers_tpu.core import u64 as u
    from kmers_tpu.kernels import window as kwin
    from kmers_tpu.ops import kmer as kmer_ops

    K = 31
    B, LPAD = (8, 1 << 15) if QUICK else (64, 1 << 15)

    def arm_naive(reads):
        _, _, _, hash_lo, _ = kwin.pack_canonical_hash(reads, K,
                                                       block_rows=8)
        return benchlib.ascii_from_codes(hash_lo)

    def arm_xor10(reads):
        internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
        w = kmer_ops.window_words(internal, K)    # Kmer<u64,31> words
        return benchlib.ascii_from_codes(w.lo ^ w.hi)

    def arm_rc_naive(reads):
        win = kmer_ops.kmer_windows(reads, K)     # includes revcomp
        return benchlib.ascii_from_codes(win.rc.lo ^ win.rc.hi)

    def arm_rc_xor10(reads):
        internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
        w = kmer_ops.window_words(internal, K)
        comp = u.xor_const(w, 0xAAAAAAAAAAAAAAAA)  # code ^ 0b10 per base
        rc = u.shr(u.reverse_bases(comp), 2 * (32 - K))
        return benchlib.ascii_from_codes(rc.lo ^ rc.hi)

    rng = np.random.default_rng(11)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    exps = (8, 12, 15) if QUICK else range(8, 16)
    for exp in exps:
        L = 1 << exp
        m = (LPAD + 1) // (L + 1)        # reads per row, N-separated
        row = np.full((B, LPAD), ord("N"), dtype=np.uint8)
        for j in range(m):
            s = j * (L + 1)
            row[:, s:s + L] = rng.choice(acgt, size=(B, L))
        reads0 = jnp.asarray(row)
        n = B * m * (L - K + 1)
        for name, fn in (("naive", arm_naive), ("xor10", arm_xor10),
                         ("rc_naive", arm_rc_naive),
                         ("rc_xor10", arm_rc_xor10)):
            rate = benchlib.chain_rate(fn, reads0, n)
            emit(f"{name}_k31_len_2e{exp}", rate, "kmers/s",
                 f"B={B} x {m} reads/row, one [B, 32768] compile per arm")


def generic_layer_bench():
    """Throughput of ops/generic.py itself (encode / rev_comp, u64+Xor10
    and u64+ACGT) on [N, 31] k-mer batches -- the generic layer had never
    been timed (VERDICT r2 missing item 1)."""
    from kmers_tpu.ops import generic as g

    N = 1 << 18
    rng = np.random.default_rng(7)
    kmers0 = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                    size=(N, 31)))
    def lanes_to_next_ascii(lanes):
        """Derive the next [N, 31] ASCII batch from both output lanes
        (serial dependency on everything the benched op computes)."""
        shifts = 2 * jnp.arange(16, dtype=jnp.uint32)
        parts = [((x[..., None] >> shifts) & jnp.uint32(3)) for x in lanes]
        codes = jnp.concatenate(parts, axis=-1)[:, :31]
        return benchlib.ascii_from_codes(codes)

    for enc_name in ("xor10", "ACGT"):
        spec = g.GenericSpec(64, 31, enc_name)

        def enc_step(ascii_u8, spec=spec):
            return lanes_to_next_ascii(g.encode(spec, ascii_u8))

        rate = benchlib.chain_rate(enc_step, kmers0, N)
        emit(f"generic_encode_u64_{enc_name}", rate, "kmers/s", f"N={N}")

        def rc_step(ascii_u8, spec=spec):
            return lanes_to_next_ascii(
                g.rev_comp(spec, g.encode(spec, ascii_u8)))

        rate = benchlib.chain_rate(rc_step, kmers0, N)
        emit(f"generic_encode_revcomp_u64_{enc_name}", rate, "kmers/s",
             f"N={N}")

    # windowed construction (round 4; VERDICT r3 item 5): every base
    # encoded once, windows assembled from the shared log-doubling pack --
    # vs the per-kmer [N, 31] layout above that re-reads each base k times
    B, L = 2048, 1024
    reads0 = first_reads(B, L, 8)
    for enc_name in ("xor10", "ACGT"):
        spec = g.GenericSpec(64, 31, enc_name)

        def win_step(reads, spec=spec):
            lanes, _valid = g.encode_windows(spec, reads)
            return benchlib.ascii_from_codes(lanes[0] ^ lanes[1])

        rate = benchlib.chain_rate(win_step, reads0, B * (L - 31 + 1))
        emit(f"generic_encode_windows_u64_{enc_name}", rate, "kmers/s",
             f"B={B} L={L}; bit-exact vs per-window encode "
             "(tests/test_generic.py)")


def ablation():
    """Roofline ablation (VERDICT r2 item 5): the same fused window kernel
    at three compute depths / two output widths.  Comparing measured rates
    against the HBM-traffic model and the VPU-op model tells which ceiling
    actually binds the headline kernel:

      arm      HBM B/lane (kernel+chain)   ~VPU ops/lane
      full     18 + 5 = 23                 ~120
      canon     9 + 5 = 14                 ~90
      pack      9 + 5 = 14                 ~55

    If HBM-bound: canon/full = 23/14 = 1.64x, pack/canon = 1.00x.
    If VPU-bound: canon/full = 120/90 = 1.33x, pack/canon = 90/55 = 1.64x.
    The measured pattern is recorded in BASELINE.md next to the headline's
    vs_baseline so the 23 B/lane traffic model is anchored to evidence."""
    from kmers_tpu.kernels import window as kwin

    K, B, L = 31, 2048, 1024

    def arm_full(reads):
        _, _, _, hash_lo, _ = kwin.pack_canonical_hash(reads, K)
        return benchlib.ascii_from_codes(hash_lo)

    def arm_canon(reads):
        _, key_lo = kwin.pack_canonical_keys(reads, K, stage="canon")
        return benchlib.ascii_from_codes(key_lo)

    def arm_pack(reads):
        _, key_lo = kwin.pack_canonical_keys(reads, K, stage="pack")
        return benchlib.ascii_from_codes(key_lo)

    n = B * (L - K + 1)
    reads0 = first_reads(B, L, 9)
    rates = {}
    for name, fn, bytes_lane, ops in (("full", arm_full, 23, 120),
                                      ("canon", arm_canon, 14, 90),
                                      ("pack", arm_pack, 14, 55)):
        rates[name] = benchlib.chain_rate(fn, reads0, n)
        emit(f"ablate_{name}_k31", rates[name], "kmers/s",
             f"model: {bytes_lane} B/lane, ~{ops} VPU ops/lane")
    emit("ablate_canon_over_full", rates["canon"] / rates["full"], "x",
         "HBM-bound predicts 1.64, VPU-bound predicts 1.33")
    emit("ablate_pack_over_canon", rates["pack"] / rates["canon"], "x",
         "HBM-bound predicts 1.00, VPU-bound predicts 1.64")


def minimizer_ablation():
    """Traffic/op model + ablation for the minimizer kernel (VERDICT r3
    item 3), k=31 w=11 (W=21 window scan).

    Traffic (chain protocol, B/lane): 1 in + 13 out + ~5 chain = ~19
      -> HBM ceiling 819/19 = 43 G lanes/s.
    VPU ops/lane (round-4 kernel: unmasked rolls, pos-free 2-word
    compare, 4-plane carry for w <= 16):
      decode+valid ~8, pack ~13, hash ~34, vHGW 10 stages x ~14 + final
      ~12 = ~152, validity ~9  => ~215 ops "full"; ~75 ops "hash" arm
      -> VPU ceilings ~18 G (full) / ~51 G (hash) at 3.85 T ops/s.
    The hash arm writes the same bytes as full, so rate(hash)/rate(full)
    isolates the vHGW scan cost; whichever measured rate tracks its
    model's ceiling tells which resource binds."""
    from kmers_tpu.kernels import minimizer as kmini

    K, W_, B, L = 31, 11, 2048, 1024
    reads0 = first_reads(B, L, 13)
    n = B * (L - K + 1)

    def arm(stage, order="mix64"):
        def fn(reads):
            wh, wl, pos, _v = kmini.minimizer_kernel(reads, K, W_,
                                                     stage=stage,
                                                     order=order)
            return benchlib.ascii_from_codes(
                wl ^ wh ^ pos.astype(jnp.uint32))
        return fn

    rates = {}
    for stage, ops in (("full", 215), ("hash", 75)):
        rates[stage] = benchlib.chain_rate(arm(stage), reads0, n)
        emit(f"minimizer_{stage}_k31_w11", rates[stage], "kmers/s",
             f"model: ~19 B/lane, ~{ops} VPU ops/lane")
    emit("minimizer_hash_over_full", rates["hash"] / rates["full"], "x",
         "VPU-bound predicts ~2.9, HBM-bound predicts 1.0")
    # mix32 selection order: one hash plane in the (VPU-bound) scan
    r32 = benchlib.chain_rate(arm("full", order="mix32"), reads0, n)
    emit("minimizer_full_mix32_k31_w11", r32, "kmers/s",
         "32-bit selection order (core.u64.mix32_order): half the scan's "
         "compare planes; bit-exact vs the jnp mix32 path "
         "(tests/test_kernels.py)")
    # mix16 packed order (round 5): (order16 << 12) | pos in ONE compare
    # plane -- pos stops being a carried payload
    r16 = benchlib.chain_rate(arm("full", order="mix16"), reads0, n)
    emit("minimizer_full_mix16_k31_w11", r16, "kmers/s",
         "packed 16-bit order + in-key position (hash.mix16_hash_fn): "
         "one fewer carried plane; deque-equivalent "
         "(tests/test_kernels.py)")


def superkmer_bench():
    """Single-chip DEVICE cost of the two sharded-routing modes, k=31
    w=11 (1-device mesh: the all_to_all is degenerate, so this isolates
    emission + bucketing + [expansion] + unit-table wrap -- the compute
    price paid for minimizer partitioning's 4.0x wire-byte win; the win
    itself is a multi-chip property, measured as bytes in BASELINE.md)."""
    from kmers_tpu.parallel import mesh as mesh_ops, pipeline

    m = mesh_ops.make_mesh(1)
    B, L = (256, 256) if QUICK else (2048, 256)
    n = B * (L - 31 + 1)
    sk = pipeline.make_superkmer_counter(m, 31, 11,
                                         route_capacity=1 << 17,
                                         aggregate="unit")
    hashed = pipeline.make_sharded_counter(m, 31, route_capacity=1 << 20,
                                           aggregate="unit")

    def mk(counter):
        def fn(reads):
            res = counter(reads)
            s = (jnp.sum(res.table.keys.lo) ^ jnp.sum(res.table.keys.hi)
                 ) & jnp.uint32(3)
            internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
            code = internal ^ (internal >> 1)
            return benchlib.ascii_from_codes(code + s)
        return fn

    reads0 = first_reads(B, L, 17)
    for name, counter in (("superkmer", sk), ("hash", hashed)):
        rate = benchlib.chain_rate(mk(counter), reads0, n)
        emit(f"partition_{name}_device_cost_k31", rate, "kmers/s",
             "emission+bucket+expand+unit wrap, 1-device mesh")


def streaming_sustained():
    """The honest TOTAL device cost of streaming counting: per-batch unit
    emission is ~free (config 5u), so the cost center is the deferred
    consolidation.  This measures seconds per consolidation with the
    chain-slope protocol (each iteration's pending keys derive from the
    previous merged table -- serial dependency) in both regimes:

      noevict: distinct keys fit capacity (the sized-right common case;
               lax.cond takes the free-slice path: 2 device sorts)
      evict:   table saturated, rank-evict every merge (4 device sorts)

    and reports the sustained streaming rate
        kmers_per_batch / (t_batch_unit + t_consolidate / merge_every).
    """
    import functools

    from kmers_tpu.core.u64 import U64
    from kmers_tpu.parallel import count as count_ops
    from kmers_tpu.parallel import count_reads
    from kmers_tpu.parallel.count import CountTable, UnitTable
    from kmers_tpu.parallel.stream import (_merge_bounded,
                                           _merge_bounded_streaming)

    B5, L5 = (512, 256) if QUICK else (4096, 256)
    ME = 4 if QUICK else 16           # merge_every
    CAP = (1 << 19) if QUICK else (1 << 23)
    lanes = B5 * L5

    def mix32(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        return x ^ (x >> 16)

    def make_step(space_bits: int, fast: bool):
        lo_mask = jnp.uint32((1 << min(space_bits, 32)) - 1)
        hi_bits = max(space_bits - 32, 0)
        hi_mask = jnp.uint32((1 << hi_bits) - 1)   # < bit 31: flag stays clear

        @functools.partial(jax.jit, donate_argnums=0)
        def step(table):
            base = table.keys.lo[:lanes] ^ table.keys.hi[:lanes]
            pending = tuple(
                UnitTable(keys=U64(
                    mix32(base + jnp.uint32(2 * i + 1)) & hi_mask,
                    mix32(base ^ jnp.uint32((0x9E3779B9 * (i + 1))
                                            & 0xFFFFFFFF)) & lo_mask))
                for i in range(ME))
            if fast:
                out, _, _ = _merge_bounded_streaming(table, pending, CAP)
            else:
                out, _, _ = _merge_bounded(table, pending, CAP, max_k=31)
            return out

        return step

    z = jnp.zeros(CAP, dtype=jnp.uint32)
    table0 = CountTable(keys=U64(z, z), counts=jnp.zeros(CAP, jnp.int32),
                        n_unique=jnp.int32(0))
    # noevict: ME*lanes draws from a space_bits space; distinct << CAP.
    # "fast" = what StreamingCounter actually dispatches on TPU since
    # round 5 (Pallas merge+compress); "sorts" = the round-4 reference
    # path, kept measured for the A/B record.
    ne_bits = max(CAP.bit_length() - 3, 16)
    sec_ne = benchlib.chain_seconds_per_iter(
        make_step(ne_bits, fast=True), table0,
        s_short=2, s_long=10, rounds=4)
    emit("consolidate_noevict", sec_ne * 1e3, "ms/merge",
         f"capacity {CAP}, {ME} pending x {lanes} lanes, Pallas "
         "merge+compress fast path (the round-5 default)")
    sec_ne_sort = benchlib.chain_seconds_per_iter(
        make_step(ne_bits, fast=False), table0,
        s_short=2, s_long=10, rounds=4)
    emit("consolidate_noevict_sortpath", sec_ne_sort * 1e3, "ms/merge",
         "round-4 sort-based reference path (KMERS_TPU_STREAM_MERGE=0)")
    sec_ev = benchlib.chain_seconds_per_iter(
        make_step(60, fast=True), table0, s_short=2, s_long=10, rounds=4)
    emit("consolidate_evict", sec_ev * 1e3, "ms/merge",
         "saturated table, rank-evict every merge (fast merged table + "
         "eviction sorts)")

    def cfg5u(reads):
        res = count_reads(reads, 31, aggregate="unit")
        s = (jnp.sum(res.table.keys.lo) ^ jnp.sum(res.table.keys.hi)
             ) & jnp.uint32(3)
        internal = (reads.astype(jnp.uint32) >> 1) & jnp.uint32(3)
        code = internal ^ (internal >> 1)
        return benchlib.ascii_from_codes(code + s)

    t_batch = benchlib.chain_seconds_per_iter(cfg5u, first_reads(B5, L5, 5))
    kmers_per_batch = B5 * (L5 - 31 + 1)
    for name, sec in (("noevict", sec_ne), ("evict", sec_ev)):
        sustained = kmers_per_batch / (t_batch + sec / ME)
        emit(f"stream_sustained_{name}", sustained, "kmers/s",
             f"per-batch {t_batch*1e3:.3f} ms + merge {sec*1e3:.1f} ms / "
             f"merge_every {ME}")

    # the CLI's default ingest: PACKED batches -- since round 5 this
    # dispatches to the fused Pallas packed-ingest kernel on TPU
    # (kernels/window.pack_canonical_keys_packed, 0.5 B/lane input)
    from kmers_tpu.io.fastx import pack_batch_np
    from kmers_tpu.parallel.pipeline import count_reads_packed

    w0, v0 = pack_batch_np(np.asarray(first_reads(B5, L5, 5)))
    wv0 = (jnp.asarray(w0), jnp.asarray(v0))

    def cfg5p(carry):
        words, validbits = carry
        res = count_reads_packed(words, validbits, 31, aggregate="unit")
        s = (jnp.sum(res.table.keys.lo) ^ jnp.sum(res.table.keys.hi))
        return (words ^ (s & jnp.uint32(3)), validbits)

    t_packed = benchlib.chain_seconds_per_iter(cfg5p, wv0)
    emit("count_pipeline_k31_unit_packed", kmers_per_batch / t_packed,
         "kmers/s", "packed-ingest unit emission (Pallas "
         "pack_canonical_keys_packed on TPU; jnp fallback elsewhere)")


def lookup_bench():
    """Distributed lookup service (VERDICT r4 item 9): queries/s/chip for
    make_sharded_lookup on a 1-device mesh -- the all_to_all is degenerate,
    so this isolates the device cost of the query path: owner bucket-sort,
    binary search over the shard table, and the scatter-based reply
    delivery.  A second arm stops before the reply scatter to price the
    scatter separately (route.py:365-374 -- the op class the counting path
    avoided)."""
    from kmers_tpu.core.u64 import U64
    from kmers_tpu.parallel import count as count_ops
    from kmers_tpu.parallel import mesh as mesh_ops, pipeline

    NQ = (1 << 16) if QUICK else (1 << 20)
    CAP = 1 << 20
    m = mesh_ops.make_mesh(1)
    # build a realistic table: random keys, counts 1..100
    rng = np.random.default_rng(11)
    n_keys = CAP // 2
    keys = np.zeros(CAP, np.uint64)
    keys[:n_keys] = np.sort(
        rng.choice(2**62, size=n_keys, replace=False)).astype(np.uint64)
    table = count_ops.CountTable(
        keys=U64(jnp.asarray((keys >> 32).astype(np.uint32)),
                 jnp.asarray((keys & 0xFFFFFFFF).astype(np.uint32))),
        counts=jnp.asarray(
            np.where(np.arange(CAP) < n_keys,
                     rng.integers(1, 100, CAP), 0).astype(np.int32)),
        n_unique=jnp.int32(n_keys))
    tables = jax.tree.map(lambda x: x[None], table)    # leading [D=1]

    q0 = U64(jnp.asarray(rng.integers(0, 2**30, NQ, dtype=np.uint32)),
             jnp.asarray(rng.integers(0, 2**32, NQ, dtype=np.uint32)))
    valid = jnp.ones(NQ, dtype=bool)

    def mix32(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        return x ^ (x >> 16)

    for arm, merge in (("merge", True), ("binsearch", False)):
        lookup = pipeline.make_sharded_lookup(m, query_capacity=NQ,
                                              max_k=31, merge_lookup=merge)

        def step(carry, lookup=lookup):
            qh, ql = carry
            counts, _ov = lookup(tables, qh, ql, valid)
            u = counts.astype(jnp.uint32)
            return (mix32(qh ^ u) & jnp.uint32(0x3FFFFFFF), mix32(ql + u))

        sec = benchlib.chain_seconds_per_iter(step, (q0.hi, q0.lo),
                                              s_short=4, s_long=68,
                                              rounds=4)
        emit(f"lookup_service_1chip_{arm}", NQ / sec, "queries/s",
             f"{NQ} queries vs {n_keys}-key table; "
             + ("merge-based lookup + scatter-free reply (the TPU "
                "default since round 5)" if merge else
                "per-query binary search (the round-4 path)"))


if __name__ == "__main__":
    if "--lengths" in sys.argv:
        length_matrix()
    elif "--generic" in sys.argv:
        generic_layer_bench()
    elif "--ablate" in sys.argv:
        ablation()
    elif "--stream" in sys.argv:
        streaming_sustained()
    elif "--minimizer" in sys.argv:
        minimizer_ablation()
    elif "--superk" in sys.argv:
        superkmer_bench()
    elif "--lookup" in sys.argv:
        lookup_bench()
    else:
        main()
