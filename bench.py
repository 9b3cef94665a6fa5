"""Benchmark: fused pack + canonical + hash throughput, k=31 (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the HBM-roofline speed-of-light for this step on the current
chip.  Timing protocol: serial lax.scan chain + slope between two chain
lengths, with a dependent-scalar fetch as the only sync -- see benchlib.py
for why nothing else is trustworthy over the axon relay (round 1 shipped a
physically impossible vs_baseline=1.005 built on block_until_ready).

Traffic model (all arrays [B, L]-padded; windows exist at the first L-k+1
lanes but every lane is read/written):
    kernel: ASCII in (1 B/lane) + canonical hi/lo + hash hi/lo (4x u32)
            + validity (u8) out = 18 B/lane
    chain derivation (next ASCII from this iteration's hash word, one
            elementwise kernel): hash_lo in (4 B/lane) + ASCII out (1 B/lane)
            = 5 B/lane
    total 23 B/lane = 23*L/(L-k+1) B/kmer (~23.7 B at L=1024, k=31).
SOL = HBM_BW / bytes_per_kmer.  The ">= 80% of HBM roofline" target from
BASELINE.json means vs_baseline >= 0.8; values >= 1.0 are a measurement
bug, never a result.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_kmers_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np
import jax.numpy as jnp

import benchlib
from kmers_tpu.kernels import window as kwin
from kmers_tpu.profiling import device_hbm_gbps as hbm_gbps

K = 31
B, L = 2048, 1024          # 2 MiB of ASCII; ~2.03M k-mer windows per call


def step(reads):
    """One benched iteration: the fused kernel, then derive the next input
    from the hash output (serial dependency; 4-letter variety)."""
    _, _, _, hash_lo, _ = kwin.pack_canonical_hash(reads, K)
    return benchlib.ascii_from_codes(hash_lo)


def main():
    rng = np.random.default_rng(0)
    reads0 = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                                    size=(B, L)))
    # VERDICT r4 item 2: one chain-slope measurement has a real 0.80-0.91x
    # run-to-run spread over the relay (BENCH_r0{2,3,4} sat at ~0.83 while
    # hand runs drew 0.91).  The headline is now the MEDIAN of >= 5
    # independent slope measurements, with the spread reported alongside
    # so a lucky/unlucky draw is visible instead of silently shipped.
    n_rounds = int(os.environ.get("KMERS_TPU_BENCH_ROUNDS", "5"))
    secs = [benchlib.chain_seconds_per_iter(step, reads0)
            for _ in range(n_rounds)]
    kmers = B * (L - K + 1)
    rates = sorted(kmers / s for s in secs)
    rate = float(np.median(rates))
    bytes_per_iter = B * L * (18 + 5)
    sol = hbm_gbps() * 1e9 / (bytes_per_iter / kmers)
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip_pack_canonical_hash_k31",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(rate / sol, 4),
        "spread_min": round(rates[0] / sol, 4),
        "spread_max": round(rates[-1] / sol, 4),
        "rounds": n_rounds,
    }))


if __name__ == "__main__":
    main()
