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

    rate = benchlib.chain_rate(cfg1, first_reads(B1, L1, 1),
                               B1 * (L1 - 15 + 1))
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

    # config 4: minimizers w=11 k=31 (single-chip kernel; 8-chip DP path
    # validated on CPU mesh in tests/test_halo.py)
    B4, L4 = (256, 512) if QUICK else (2048, 1024)

    def cfg4(reads):
        word_hi, word_lo, pos, _valid = kmini.minimizer_kernel(reads, 31, 11)
        return benchlib.ascii_from_codes(word_lo ^ pos.astype(jnp.uint32))

    rate = benchlib.chain_rate(cfg4, first_reads(B4, L4, 4),
                               B4 * (L4 - 31 + 1))
    emit("minimizers_k31_w11", rate, "kmers/s",
         "8-chip data-parallel path: tests/test_halo.py on CPU mesh")

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
         "run-length table form (streaming per-batch mode): key sort + "
         "reverse-cummin, compaction deferred to consolidation")


def length_matrix():
    """The reference's criterion matrix, all four arms
    (/root/reference/benches/simple_benchmark.rs:58-102): k=31 construct
    and reverse-complement, naive_impl vs generic+Xor10, over input
    lengths 2^8..2^15.  Batch sized to keep ~2 MiB of ASCII per call.

    Arm mapping (batch-first analogs of the per-window scalar loops):
      construct/naive  -> fused pack+windows+canonical+hash Pallas kernel
                          (compute_naive + the canonical/hash the engine
                          always produces)
      construct/xor10  -> xor10 base codes + log-doubling window words
                          (compute_xor10: generic Kmer<u64,31> + Xor10)
      rc/naive         -> windows + the 5-step revcomp ladder (rc_naive)
      rc/xor10         -> xor10 windows + complement(^0b10) + base
                          reversal + shift (rc_xor10, corrected semantics)
    """
    from kmers_tpu.core import u64 as u
    from kmers_tpu.kernels import window as kwin
    from kmers_tpu.ops import kmer as kmer_ops

    K = 31

    for exp in range(8, 16):
        L = 1 << exp
        B = max(256, (2 << 20) // L)
        B -= B % 256
        reads0 = first_reads(B, L, exp)

        def arm_naive(reads):
            _, _, _, hash_lo, _ = kwin.pack_canonical_hash(reads, K)
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

        n = B * (L - K + 1)
        for name, fn in (("naive", arm_naive), ("xor10", arm_xor10),
                         ("rc_naive", arm_rc_naive),
                         ("rc_xor10", arm_rc_xor10)):
            rate = benchlib.chain_rate(fn, reads0, n)
            emit(f"{name}_k31_len_2e{exp}", rate, "kmers/s", f"B={B} L={L}")


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


if __name__ == "__main__":
    if "--lengths" in sys.argv:
        length_matrix()
    elif "--generic" in sys.argv:
        generic_layer_bench()
    elif "--ablate" in sys.argv:
        ablation()
    else:
        main()
