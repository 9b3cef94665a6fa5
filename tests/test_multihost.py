"""REAL multi-process 'multi-host' simulation: 2 processes x 4 virtual CPU
devices, jax.distributed over loopback, sharded counting with all_to_all
across the process boundary (SURVEY.md §4/§5.8: CPU multi-process sim,
portable to real pods)."""

import collections
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from kmers_tpu.oracle import numpy_ref as o

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_count(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH",
                        "JAX_PLATFORMS", "XLA_FLAGS")}
    worker = os.path.join(HERE, "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=150)[0].decode() for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-2000:]
    z = np.load(out)
    assert int(z["m_route_overflow"]) == 0
    assert int(z["m_reads"]) == 16
    # merged table == oracle counts of the full read set
    got = collections.Counter()
    for d in range(z["counts"].shape[0]):
        nu = int(z["n_unique"][d])
        for i in range(nu):
            key = (int(z["keys_hi"][d][i]) << 32) | int(z["keys_lo"][d][i])
            assert key not in got, "shards must be disjoint"
            got[key] += int(z["counts"][d][i])
    want = collections.Counter()
    for row in z["reads"]:
        it = o.CanonicalKmerIterator(bytes(row), 21)
        for _, fw, rc in it:
            want[min(fw, rc)] += 1
    assert got == want
    assert int(z["m_kmers_emitted"]) == sum(want.values())
