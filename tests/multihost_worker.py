"""Worker for the 2-process multi-host simulation (tests/test_multihost.py).

Each process: jax.distributed.initialize over loopback, 4 virtual CPU
devices -> global mesh of 8; loads its local half of the read batch
(process_index-based), runs the sharded counter, and process 0 writes the
merged (key, count) pairs + metrics to an npz for the parent to check.

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

assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

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
# gather the globally-sharded table to every process (collective)
from jax.experimental import multihost_utils  # noqa: E402

t = res.table
gathered = multihost_utils.process_allgather(
    (t.keys.hi, t.keys.lo, t.counts, t.n_unique), tiled=True)
if pid == 0:
    keys_hi, keys_lo, counts, n_unique = (np.asarray(x) for x in gathered)
    np.savez(out_path, keys_hi=keys_hi, keys_lo=keys_lo, counts=counts,
             n_unique=n_unique, reads=reads,
             **{f"m_{k}": v for k, v in metrics.items()})
print(f"process {pid} done: {metrics}", flush=True)
