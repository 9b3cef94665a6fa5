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
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
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

    # -- B: wide (k=63) streaming counter, packed multi-process updates ----
    assert int(z["wide_overflow"]) == 0
    want_w = collections.Counter()
    for row in z["wide_reads"]:
        b = bytes(row)
        for p_ in range(len(b) - 62):
            sub = b[p_:p_ + 63]
            fw = o.word_from_bytes_wide(sub)
            want_w[o.canonical_wide(fw, 63)] += 2     # two identical batches
    got_w = {int(k, 16): int(c)
             for k, c in zip(z["wide_keys"], z["wide_counts"])}
    assert got_w == dict(want_w)

    # -- C: sharded minimizer bucketing (k=21, w=7) ------------------------
    from kmers_tpu.core import u64 as u
    from kmers_tpu.ops import hash as hash_ops
    from kmers_tpu.ops import minimizer as mini_ops

    import jax.numpy as jnp

    assert int(z["mini_overflow"]) == 0
    mm = mini_ops.minimizer_stream(jnp.asarray(z["reads"]), 21, 7,
                                   hash_ops.mix_hash_fn(0))
    mwords = u.to_numpy(mm.word)[np.asarray(mm.valid)]
    want_m = collections.Counter(int(w) for w in mwords)
    got_m = collections.Counter()
    for d in range(z["mini_counts"].shape[0]):
        nu = int(z["mini_n_unique"][d])
        for i in range(nu):
            key = ((int(z["mini_keys_hi"][d][i]) << 32)
                   | int(z["mini_keys_lo"][d][i]))
            got_m[key] += int(z["mini_counts"][d][i])
    assert got_m == want_m

    # -- D: distributed lookup service over A's shard tables ---------------
    assert int(z["lookup_overflow"]) == 0
    lc = z["lookup_counts"]
    for bi in range(lc.shape[0]):
        for li in range(lc.shape[1]):
            if z["lookup_valid"][bi, li]:
                key = ((int(z["lookup_hi"][bi, li]) << 32)
                       | int(z["lookup_lo"][bi, li]))
                assert int(lc[bi, li]) == want[key], (bi, li)
            else:
                assert int(lc[bi, li]) == -1
