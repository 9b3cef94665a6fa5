"""Multi-word k-mer path (33 <= k <= 64): u128 lanes vs Python-int oracle."""

import collections
import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.core import u64 as u
from kmers_tpu.core import u128 as u128
from kmers_tpu.core.u128 import U128
from kmers_tpu.core.u64 import U64
from kmers_tpu.oracle import numpy_ref as o
from kmers_tpu.ops import kmer as kmer_ops
from kmers_tpu.parallel import count as count_ops
from kmers_tpu.parallel import mesh as mesh_ops, pipeline
from kmers_tpu.parallel.stream import StreamingCounter

RNG = random.Random(4242)

N = 128
WIDE_KS = [33, 40, 48, 63, 64]
M128 = (1 << 128) - 1


def rand_vals(n=N, bits=128):
    return [RNG.getrandbits(bits) for _ in range(n)]


SHIFTS = [0, 1, 31, 32, 33, 63, 64, 65, 127, 128]


@jax.jit
def _u128_bundle(a, b):
    out = {}
    for n in SHIFTS:
        out[f"shl{n}"] = u128.shl(a, n)
        out[f"shr{n}"] = u128.shr(a, n)
    out["and"] = u128.and_(a, b)
    out["xor"] = u128.xor(a, b)
    out["not"] = u128.not_(a)
    out["lt"] = u128.lt(a, b)
    out["le"] = u128.le(a, b)
    out["eq"] = u128.eq(a, b)
    out["min"] = u128.min_(a, b)
    for k in WIDE_KS:
        ak = u128.and_const(a, o.mask_wide(k))
        out[f"rc{k}"] = u128.reverse_complement(ak, k)
        out[f"lex{k}"] = u128.lex_hash(ak, k)
    out["mix"] = u128.mix_hash(a, 3)
    return out


@pytest.fixture(scope="module")
def bundle():
    a_vals, b_vals = rand_vals(), rand_vals()
    a_vals[0] = b_vals[0]
    # equal-high-half pair to stress the compare chain
    a_vals[1] = (b_vals[1] & ~((1 << 64) - 1)) | (a_vals[1] & ((1 << 64) - 1))
    out = _u128_bundle(u128.from_python_ints(a_vals),
                       u128.from_python_ints(b_vals))
    return a_vals, b_vals, out


def test_u128_shifts(bundle):
    a, _, out = bundle
    for n in SHIFTS:
        assert u128.to_python_ints(out[f"shl{n}"]) == \
            [(x << n) & M128 for x in a], f"shl{n}"
        assert u128.to_python_ints(out[f"shr{n}"]) == \
            [x >> n for x in a], f"shr{n}"


def test_u128_bitwise_cmp(bundle):
    a, b, out = bundle
    assert u128.to_python_ints(out["and"]) == [x & y for x, y in zip(a, b)]
    assert u128.to_python_ints(out["xor"]) == [x ^ y for x, y in zip(a, b)]
    assert u128.to_python_ints(out["not"]) == [x ^ M128 for x in a]
    assert list(np.asarray(out["lt"])) == [x < y for x, y in zip(a, b)]
    assert list(np.asarray(out["le"])) == [x <= y for x, y in zip(a, b)]
    assert list(np.asarray(out["eq"])) == [x == y for x, y in zip(a, b)]
    assert u128.to_python_ints(out["min"]) == [min(x, y) for x, y in zip(a, b)]


def test_u128_rc_lex_mix_vs_oracle(bundle):
    a, _, out = bundle
    for k in WIDE_KS:
        masked = [x & o.mask_wide(k) for x in a]
        assert u128.to_python_ints(out[f"rc{k}"]) == \
            [o.reverse_complement_wide(x, k) for x in masked], f"rc{k}"
        # lex hash: base reversal without complement
        want = [o.reverse_bases_wide(x) >> (2 * (64 - k)) for x in masked]
        assert u128.to_python_ints(out[f"lex{k}"]) == want, f"lex{k}"
    got_mix = [int(h) << 32 | int(l) for h, l in zip(
        np.asarray(u.to_numpy(out["mix"]) >> np.uint64(32)),
        np.asarray(u.to_numpy(out["mix"]) & np.uint64(0xFFFFFFFF)))]
    assert got_mix == [o.mix_hash_wide(x, 3) for x in a]


def rand_seq(n, alphabet=b"ACGT"):
    return bytes(RNG.choice(alphabet) for _ in range(n))


def _oracle_wide_windows(seq, k):
    """(pos, fw, canonical) for every fully-valid window."""
    out = []
    for p in range(len(seq) - k + 1):
        sub = seq[p:p + k]
        if all(o.encode_binary_u8(c) < 4 for c in sub):
            fw = o.word_from_bytes_wide(sub)
            out.append((p, fw, o.canonical_wide(fw, k)))
    return out


def test_wide_windows_vs_oracle():
    L = 150
    for k in WIDE_KS:
        seq = bytearray(rand_seq(L))
        for _ in range(3):
            seq[RNG.randrange(L)] = ord("N")
        seq = bytes(seq)
        win = jax.jit(lambda a, k=k: kmer_ops.kmer_windows_wide(a, k))(
            jnp.asarray(np.frombuffer(seq, dtype=np.uint8))[None, :])
        fw = u128.to_python_ints(win.fw)
        canon = u128.to_python_ints(
            kmer_ops.canonical_word_wide(win.fw, win.rc))
        valid = np.asarray(win.valid)[0]
        got = [(p, fw[p], canon[p]) for p in range(win.n_windows) if valid[p]]
        assert got == _oracle_wide_windows(seq, k), f"k={k}"


def test_wide_rolling_vs_oracle():
    k = 63
    vals = [v & o.mask_wide(k) for v in rand_vals(32)]
    bases = [RNG.randrange(4) for _ in vals]
    va = u128.from_python_ints(vals)
    ba = jnp.asarray(np.array(bases, dtype=np.uint32))
    new_a, ev_a = jax.jit(
        lambda x, b: kmer_ops.append_base_wide(x, b, k))(va, ba)
    new_p, ev_p = jax.jit(
        lambda x, b: kmer_ops.prepend_base_wide(x, b, k))(va, ba)
    want_a = [o.append_base_wide(v, b, k) for v, b in zip(vals, bases)]
    want_p = [o.prepend_base_wide(v, b, k) for v, b in zip(vals, bases)]
    assert u128.to_python_ints(new_a) == [w for w, _ in want_a]
    assert list(np.asarray(ev_a)) == [e for _, e in want_a]
    assert u128.to_python_ints(new_p) == [w for w, _ in want_p]
    assert list(np.asarray(ev_p)) == [e for _, e in want_p]


def _table_pairs_wide(table):
    nu = int(table.n_unique)
    keys = u128.to_python_ints(table.keys)[:nu]
    counts = np.asarray(table.counts)[:nu]
    return [(k, int(c)) for k, c in zip(keys, counts)]


def test_count_reads_wide_vs_oracle():
    k, L = 63, 100
    reads = []
    for _ in range(8):
        r = bytearray(rand_seq(L))
        for i in range(L):
            if RNG.random() < 0.02:
                r[i] = ord("N")
        reads.append(bytes(r))
    batch = jnp.asarray(
        np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads]))
    res = jax.jit(lambda a: pipeline.count_reads_wide(a, k))(batch)
    want = collections.Counter()
    for r in reads:
        for _, _, canon in _oracle_wide_windows(r, k):
            want[canon] += 1
    assert _table_pairs_wide(res.table) == sorted(want.items())


def test_sharded_counter_wide():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    k, L = 63, 80
    reads = [rand_seq(L) for _ in range(16)]
    batch = jnp.asarray(
        np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads]))
    m = mesh_ops.make_mesh(8)
    counter = pipeline.make_sharded_counter_wide(m, k, route_capacity=64)
    res = counter(jax.device_put(batch, mesh_ops.batch_sharding(m)))
    assert int(res.metrics["route_overflow"]) == 0
    got = collections.Counter()
    t = res.table
    for d in range(8):
        shard = count_ops.CountTableWide(
            keys=U128(U64(t.keys.hi.hi[d], t.keys.hi.lo[d]),
                      U64(t.keys.lo.hi[d], t.keys.lo.lo[d])),
            counts=t.counts[d], n_unique=t.n_unique[d])
        for w, c in _table_pairs_wide(shard):
            assert w not in got
            got[w] += c
    want = collections.Counter()
    for r in reads:
        for _, _, canon in _oracle_wide_windows(r, k):
            want[canon] += 1
    assert sorted(got.items()) == sorted(want.items())


def test_minimizer_stream_wide_k():
    """minimizer_stream is k-width-agnostic: works for k=63 (w-mers stay
    <= 32 bases)."""
    from kmers_tpu.ops import hash as hash_ops
    from kmers_tpu.ops.minimizer import minimizer_stream

    k, w, L = 63, 11, 100
    seq = rand_seq(L)
    mm = minimizer_stream(
        jnp.asarray(np.frombuffer(seq, dtype=np.uint8))[None, :],
        k, w, hash_ops.mix_hash_fn(3))
    words = u.to_numpy(mm.word)[0]
    poss = np.asarray(mm.pos)[0]
    state = o.mix_hash_state(3)
    for p in range(L - k + 1):
        # oracle: brute-force leftmost argmin over the k-mer's w-mers
        best, off = None, None
        for q in range(p, p + k - w + 1):
            wm = o.word_from_bytes(seq[q:q + w])
            h = state.hash_word(wm)
            if best is None or h < best[0]:
                best, off = (h, wm), q
        assert (int(words[p]), int(poss[p])) == (best[1], off), p


# -- wide product path: tables, merging, lookup, streaming, CLI ---------------

def test_lookup_wide_and_merge():
    k = 63
    reads = [rand_seq(120) for _ in range(6)]
    b1 = jnp.asarray(np.stack(
        [np.frombuffer(r, dtype=np.uint8) for r in reads[:3]]))
    b2 = jnp.asarray(np.stack(
        [np.frombuffer(r, dtype=np.uint8) for r in reads[3:]]))
    t1 = pipeline.count_reads_wide(b1, k).table
    t2 = pipeline.count_reads_wide(b2, k).table
    merged = count_ops.merge_many_wide([t1, t2], max_k=k)
    want = collections.Counter()
    for r in reads:
        for _, _, canon in _oracle_wide_windows(r, k):
            want[canon] += 1
    assert _table_pairs_wide(merged) == sorted(want.items())
    # lookup: every present key + some absent ones
    present = list(want)[:20]
    absent = [((1 << 126) - 7) & o.mask_wide(k), 12345]
    queries = u128.from_python_ints(present + absent)
    got = np.asarray(count_ops.lookup_wide(merged, queries))
    assert [int(c) for c in got] == [want[w] for w in present] + [0, 0]


def test_streaming_counter_wide_matches_oracle(tmp_path):
    k = 63
    sc = StreamingCounter(k, capacity=4096, merge_every=2)
    want = collections.Counter()
    for _ in range(3):
        reads = []
        for _ in range(4):
            r = bytearray(rand_seq(100))
            for i in range(3):
                r[RNG.randrange(100)] = ord("N")
            reads.append(bytes(r))
        batch = jnp.asarray(
            np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads]))
        sc.update(batch)
        for r in reads:
            for _, _, canon in _oracle_wide_windows(r, k):
                want[canon] += 1
    assert sc.to_pairs() == sorted(want.items())
    # packed updates give the identical table
    from kmers_tpu.io import fastx as fx

    sc2 = StreamingCounter(k, capacity=4096, merge_every=2)
    rows = np.stack([np.frombuffer(rand_seq(96), dtype=np.uint8)
                     for _ in range(4)])
    w, v = fx.pack_batch_np(rows)
    sc2.update_packed(w, v)
    sc3 = StreamingCounter(k, capacity=4096)
    sc3.update(jnp.asarray(rows))
    assert sc2.to_pairs() == sc3.to_pairs()
    # checkpoint round-trip preserves the wide table exactly
    p = str(tmp_path / "wide.npz")
    sc.save(p)
    back = StreamingCounter.load(p)
    assert back.wide and back.k == k
    assert back.to_pairs() == sc.to_pairs()
    assert back.kmers == sc.kmers
    # lookup through the streaming API
    some = [w for w, _ in sc.to_pairs()[:5]]
    got = np.asarray(back.lookup(u128.from_python_ints(some)))
    assert [int(c) for c in got] == [want[w] for w in some]


def test_streaming_counter_wide_eviction_counted():
    k = 40
    sc = StreamingCounter(k, capacity=16, merge_every=1)
    reads = [rand_seq(90) for _ in range(4)]
    batch = jnp.asarray(
        np.stack([np.frombuffer(r, dtype=np.uint8) for r in reads]))
    sc.update(batch)
    _ = sc.to_pairs()
    total_seen = sum(
        len(_oracle_wide_windows(r, k)) for r in reads)
    kept = sum(c for _, c in sc.to_pairs())
    assert sc.dropped_unique > 0
    assert kept + sc.dropped_kmers == total_seen


def test_cli_wide_count_query_stats(tmp_path, capsys):
    from kmers_tpu.__main__ import main

    k = 63
    records = [rand_seq(RNG.randrange(70, 200)) for _ in range(8)]
    path = str(tmp_path / "reads.fasta")
    with open(path, "wb") as f:
        for i, r in enumerate(records):
            f.write(b">r%d\n" % i + r + b"\n")
    out = str(tmp_path / "wide_table.npz")
    assert main(["count", path, "-k", str(k), "-o", out,
                 "--capacity", "4096", "--batch", "4",
                 "--length", "224"]) == 0
    want = collections.Counter()
    for r in records:
        for _, _, canon in _oracle_wide_windows(r, k):
            want[canon] += 1
    sc = StreamingCounter.load(out)
    assert sc.to_pairs() == sorted(want.items())
    # query round-trip through the ASCII interface
    probe = records[0][:k].decode()
    assert main(["query", out, probe]) == 0
    got = capsys.readouterr().out.strip().split("\t")
    fw = o.word_from_bytes_wide(probe.encode())
    assert int(got[1]) == want[o.canonical_wide(fw, k)]
    assert main(["stats", out]) == 0
