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


def length_matrix():
    """The reference's criterion matrix: k=31 construct (+canonical+hash)
    throughput over input lengths 2^8..2^15
    (/root/reference/benches/simple_benchmark.rs:61-78).  Batch sized to
    keep ~2 MiB of ASCII per call at every length."""
    from kmers_tpu.kernels import window as kwin

    for exp in range(8, 16):
        L = 1 << exp
        B = max(256, (2 << 20) // L)
        B -= B % 256

        def step(reads):
            _, _, _, hash_lo, _ = kwin.pack_canonical_hash(reads, 31)
            return benchlib.ascii_from_codes(hash_lo)

        rate = benchlib.chain_rate(step, first_reads(B, L, exp),
                                   B * (L - 31 + 1))
        emit(f"construct_k31_len_2e{exp}", rate, "kmers/s", f"B={B} L={L}")


if __name__ == "__main__":
    if "--lengths" in sys.argv:
        length_matrix()
    else:
        main()
