"""Worker for the 2-process multi-host simulation (tests/test_multihost.py).

Each process: jax.distributed.initialize over loopback, 4 virtual CPU
devices -> global mesh of 8; then four scenarios across the process
boundary (all with cross-process all_to_all):

  A. sharded count (k=21) of a process-local read slice
  B. ShardedStreamingCounter, WIDE k=63, PACKED updates via
     make_global_array (the full streaming stack multi-process)
  C. sharded minimizer bucketing (k=21, w=7)
  D. distributed lookup service over A's shard tables

Process 0 writes results to an npz for the parent to verify vs oracle.

Run:  python tests/multihost_worker.py <process_id> <coord_port> <out.npz>
"""

import os
import sys

pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_kmers_tpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from kmers_tpu.parallel import mesh as mesh_ops, pipeline

mesh_ops.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                          num_processes=2, process_id=pid)
import jax  # noqa: E402  (after distributed init)
import jax.numpy as jnp  # noqa: E402

assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

out = {}

# -- A: sharded count of a read batch ----------------------------------------
K, B, L = 21, 16, 64
rng = np.random.default_rng(424242)          # same stream on both processes
reads = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L),
                   p=[0.245] * 4 + [0.02])

mesh = mesh_ops.make_mesh()
local = reads[mesh_ops.local_read_slice(B)]
garr = mesh_ops.make_global_array(local, mesh)

counter = pipeline.make_sharded_counter(mesh, K, route_capacity=256)
res = counter(garr)
jax.block_until_ready(res)

metrics = {k: int(v) for k, v in res.metrics.items()}
from jax.experimental import multihost_utils  # noqa: E402

t = res.table
gathered = multihost_utils.process_allgather(
    (t.keys.hi, t.keys.lo, t.counts, t.n_unique), tiled=True)
keys_hi, keys_lo, counts, n_unique = (np.asarray(x) for x in gathered)
out.update(keys_hi=keys_hi, keys_lo=keys_lo, counts=counts,
           n_unique=n_unique, reads=reads,
           **{f"m_{k}": v for k, v in metrics.items()})

# -- B: wide (k=63) streaming counter, packed updates ------------------------
from kmers_tpu.io import fastx  # noqa: E402
from kmers_tpu.parallel.stream import ShardedStreamingCounter  # noqa: E402

KW, BW, LW = 63, 8, 96
rows_w = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(BW, LW))
sc = ShardedStreamingCounter(KW, capacity=2048, mesh=mesh,
                             route_capacity=256, merge_every=2)
for _ in range(2):  # two identical batches: counts double, merge exercised
    words, validbits = fastx.pack_batch_np(rows_w)
    sl = mesh_ops.local_read_slice(BW)
    sc.update_packed(words[sl], validbits[sl])
pairs = sc.to_pairs()
out["wide_reads"] = rows_w
out["wide_keys"] = np.array([f"{w:032x}" for w, _ in pairs])
out["wide_counts"] = np.array([c for _, c in pairs], dtype=np.int64)
out["wide_overflow"] = np.int64(sc.route_overflow)

# -- C: sharded minimizer bucketing ------------------------------------------
mini = pipeline.make_sharded_minimizer_counter(mesh, K, 7,
                                               route_capacity=512,
                                               route_passes=2)
res_c = mini(garr)
jax.block_until_ready(res_c)
tc = res_c.table
g_c = multihost_utils.process_allgather(
    (tc.keys.hi, tc.keys.lo, tc.counts, tc.n_unique), tiled=True)
out.update(mini_keys_hi=np.asarray(g_c[0]), mini_keys_lo=np.asarray(g_c[1]),
           mini_counts=np.asarray(g_c[2]), mini_n_unique=np.asarray(g_c[3]),
           mini_overflow=np.int64(int(res_c.metrics["route_overflow"])))

# -- D: distributed lookup service over A's shard tables ---------------------
lookup = pipeline.make_sharded_lookup(mesh, query_capacity=256)
canon, valid = pipeline.canonical_kmers(jnp.asarray(reads), K)
q_hi = mesh_ops.make_global_array(
    np.asarray(canon.hi)[mesh_ops.local_read_slice(B)], mesh)
q_lo = mesh_ops.make_global_array(
    np.asarray(canon.lo)[mesh_ops.local_read_slice(B)], mesh)
q_valid = mesh_ops.make_global_array(
    np.asarray(valid)[mesh_ops.local_read_slice(B)], mesh)
counts_d, overflow_d = lookup(res.table, q_hi, q_lo, q_valid)
g_d = multihost_utils.process_allgather(counts_d, tiled=True)
out["lookup_counts"] = np.asarray(g_d)
out["lookup_hi"] = np.asarray(canon.hi)
out["lookup_lo"] = np.asarray(canon.lo)
out["lookup_valid"] = np.asarray(valid)
out["lookup_overflow"] = np.int64(int(overflow_d))

if pid == 0:
    np.savez(out_path, **out)
print(f"process {pid} done: {metrics}", flush=True)
