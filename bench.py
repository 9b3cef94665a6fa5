"""Benchmark: fused pack + canonical + hash throughput, k=31 (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the HBM-roofline speed-of-light for this op on the current chip:
the benched step reads 1 B/kmer of ASCII and writes the canonical word (8 B),
the mixer hash (8 B) and the validity byte (1 B) back to HBM -- 18 B of HBM
traffic per k-mer.  SOL = HBM_BW / 18.  The ">= 80% of HBM roofline" target
from BASELINE.json means vs_baseline >= 0.8.

Protocol notes (learned the hard way):
  * inputs CYCLE through 8 distinct device buffers -- repeated calls on one
    buffer can short-circuit in the runtime and report super-roofline rates;
  * the host must be otherwise idle (dispatch is host-driven; concurrent
    CPU load inflates per-call latency 20x);
  * best-of-3 timed rounds after a warmup/compile call.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_kmers_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np
import jax.numpy as jnp

from kmers_tpu.kernels import window as kwin

K = 31
B, L = 2048, 1024          # 2 MiB of ASCII; ~2.03M k-mer windows per call
N_BUFFERS = 8
CALLS = 48
ROUNDS = 3

# Peak HBM bandwidth by TPU generation (GB/s); fallback covers CPU runs.
HBM_GBPS = {"v5e": 819.0, "v5litepod": 819.0, "v5 lite": 819.0,
            "v4": 1228.0, "v5p": 2765.0, "v6e": 1640.0}


def hbm_gbps() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    for key, bw in HBM_GBPS.items():
        if key.replace(" ", "") in kind.replace(" ", ""):
            return bw
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    return HBM_GBPS.get(gen, 819.0)


def step(reads):
    return kwin.pack_canonical_hash(reads, K)


def main():
    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                               size=(B, L)))
        for _ in range(N_BUFFERS)
    ]
    jax.block_until_ready(step(inputs[0]))   # compile
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        outs = [step(inputs[i % N_BUFFERS])[0] for i in range(CALLS)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / CALLS)
    kmers = B * (L - K + 1)
    rate = kmers / best
    sol = hbm_gbps() * 1e9 / 18.0
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip_pack_canonical_hash_k31",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(rate / sol, 4),
    }))


if __name__ == "__main__":
    main()
