"""Synthetic read-set generator for end-to-end benchmarking.

Simulates an E. coli-scale experiment (BASELINE config 5): a random
genome (default 4.6 Mbp), uniformly sampled fixed-length reads with a
configurable N rate and lowercase rate, written as FASTA (genome) and
gzip FASTQ (reads).  Entirely synthetic -- no external downloads (this
environment has no egress); the workload shape (genome size, read count,
read length, error sprinkling) matches a real E. coli run.

Usage:
  python tools/simulate_reads.py out_dir [--genome-mbp 4.6]
      [--reads 1000000] [--read-len 150] [--n-rate 0.002]
      [--lower-rate 0.05] [--seed 0]
"""

import argparse
import gzip
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--genome-mbp", type=float, default=4.6)
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--n-rate", type=float, default=0.002)
    ap.add_argument("--lower-rate", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gzip-level", type=int, default=1)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    g_len = int(args.genome_mbp * 1e6)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.choice(bases, size=g_len)

    os.makedirs(args.out_dir, exist_ok=True)
    genome_path = os.path.join(args.out_dir, "genome.fasta")
    with open(genome_path, "wb") as f:
        f.write(b">synthetic_genome\n")
        for i in range(0, g_len, 80):
            f.write(genome[i:i + 80].tobytes() + b"\n")

    L = args.read_len
    starts = rng.integers(0, g_len - L, size=args.reads)
    # gather all reads as one [reads, L] matrix
    reads = genome[starts[:, None] + np.arange(L)[None, :]].copy()
    n_mask = rng.random(reads.shape) < args.n_rate
    reads[n_mask] = ord("N")
    low_mask = rng.random(reads.shape) < args.lower_rate
    reads[low_mask] |= 0x20

    reads_path = os.path.join(args.out_dir, "reads.fastq.gz")
    qual = b"I" * L
    with gzip.open(reads_path, "wb", compresslevel=args.gzip_level) as f:
        chunk = []
        for i in range(args.reads):
            chunk.append(b"@r%d\n%s\n+\n%s\n"
                         % (i, reads[i].tobytes(), qual))
            if len(chunk) == 20000:
                f.write(b"".join(chunk))
                chunk = []
        if chunk:
            f.write(b"".join(chunk))

    print(f"wrote {genome_path} ({g_len} bp) and {reads_path} "
          f"({args.reads} x {L} bp, n_rate={args.n_rate})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
