"""Endianness + eviction hardening (VERDICT r3 item 8).

(a) Big-endian-producer simulation: the reference CI runs its full test
    matrix on s390x (big-endian) to prove the bit-packing is
    endian-portable (/root/reference/.github/workflows/main.yml:115-139).
    No BE host exists here, so we prove the WRITERS are endian-correct
    two ways: golden bytes computed with pure-Python int.to_bytes
    (endianness explicit, no numpy), and byteswapped-view ('>u4') inputs
    producing byte-identical output to the native path.

(b) Adversarial-arrival eviction: the count-based eviction policy is an
    approximation under adversarial order (parallel/stream.py module
    docstring) -- a key evicted early loses its prior count if it
    reappears.  These tests quantify the documented bound: the drop
    counters exactly cover the loss (kmers == live mass + dropped_kmers
    invariant), and a re-appearing evicted key reports exactly its
    occurrences since the last eviction.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from kmers_tpu.core.u64 import U64
from kmers_tpu.ops.seqvector import SeqVector, pack_ascii_to_words
from kmers_tpu.parallel.count import CountTable
from kmers_tpu.parallel.stream import StreamingCounter


# -- (a) endianness ------------------------------------------------------------

def test_simple_sds_writer_golden_bytes():
    """to_simple_sds output vs bytes computed with int.to_bytes only --
    correct on any host byte order."""
    seq = "ACGTACGTACGTAGGTCC"                      # 18 bases, 36 bits
    sv = SeqVector.from_str(seq)
    got = sv.to_simple_sds()
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    word = 0
    for i, ch in enumerate(seq):
        word |= code[ch] << (2 * i)
    expect = ((36).to_bytes(8, "little")            # bit length
              + (1).to_bytes(8, "little")           # u64 word count
              + word.to_bytes(8, "little"))
    assert got == expect


def test_simple_sds_writer_byteswapped_producer():
    """A producer whose in-memory arrays are big-endian views must write
    the identical byte stream (writers normalize, not memcpy)."""
    words = pack_ascii_to_words(
        np.frombuffer(b"ACGTTGCAACGTTGCACCGG", dtype=np.uint8))
    words = np.concatenate([words, np.zeros(2, np.uint32)])
    native = SeqVector(jnp.asarray(words), 20)
    be_view = words.astype(">u4")                  # same values, BE bytes
    assert be_view.tobytes() != words.tobytes()    # genuinely byteswapped
    be = SeqVector(jnp.asarray(be_view.astype(np.uint32)), 20)
    assert native.to_simple_sds() == be.to_simple_sds()
    # and the numpy-checkpoint writer
    import io
    buf_n, buf_b = io.BytesIO(), io.BytesIO()
    np.savez(buf_n, words=np.asarray(native.words, dtype="<u4"))
    np.savez(buf_b, words=np.asarray(be.words, dtype="<u4"))
    za = np.load(io.BytesIO(buf_n.getvalue()))
    zb = np.load(io.BytesIO(buf_b.getvalue()))
    assert za["words"].dtype.str == "<u4"
    np.testing.assert_array_equal(za["words"], zb["words"])


def test_counter_checkpoint_bytes_are_little_endian(tmp_path):
    """The npz checkpoint must store explicit little-endian words whose
    raw bytes match int.to_bytes -- byte-stable across host orders."""
    sc = StreamingCounter(15, capacity=64)
    sc.update(jnp.asarray(np.frombuffer(b"ACGTACGTACGTACGTACG",
                                        dtype=np.uint8)[None, :]))
    path = str(tmp_path / "t.npz")
    sc.save(path)
    z = np.load(path)
    assert z["keys_hi"].dtype.str == "<u4"
    assert z["keys_lo"].dtype.str == "<u4"
    assert z["counts"].dtype.str == "<i4"
    lo = z["keys_lo"]
    raw = lo.tobytes()
    expect = b"".join(int(v).to_bytes(4, "little") for v in lo)
    assert raw == expect
    # a byteswapped-producer table must checkpoint to identical bytes
    sc2 = StreamingCounter(15, capacity=64)
    sc2.table = CountTable(
        keys=U64(jnp.asarray(np.asarray(sc.table.keys.hi).astype(">u4")
                             .astype(np.uint32)),
                 jnp.asarray(np.asarray(sc.table.keys.lo).astype(">u4")
                             .astype(np.uint32))),
        counts=sc.table.counts, n_unique=sc.table.n_unique)
    sc2.batches, sc2.kmers = sc.batches, sc.kmers
    path2 = str(tmp_path / "t2.npz")
    sc2.save(path2)
    z2 = np.load(path2)
    np.testing.assert_array_equal(z["keys_hi"], z2["keys_hi"])
    np.testing.assert_array_equal(z["keys_lo"], z2["keys_lo"])


# -- (b) adversarial-arrival eviction ------------------------------------------

def _read_of(kmer: str, copies: int, L: int) -> np.ndarray:
    """A batch row containing `copies` N-separated copies of `kmer`."""
    s = ("N".join([kmer] * copies)).ljust(L, "N").encode()
    return np.frombuffer(s, dtype=np.uint8)


def _filler_rows(n_keys: int, k: int, L: int, copies: int):
    """n_keys distinct high-count k-mers, one per row."""
    rng = np.random.default_rng(5)
    rows = []
    for _ in range(n_keys):
        km = "".join(rng.choice(list("ACGT"), k))
        rows.append(_read_of(km, copies, L))
    return rows


def test_eviction_mass_invariant_and_requantified_loss():
    k, L = 15, 160
    cap = 8
    target = "ACACACGTGTGTGAC"                      # the adversarial key
    assert len(target) == k

    sc = StreamingCounter(k, capacity=cap, merge_every=1)
    # batch 1: target x3 + cap fillers x9 each -> target is the unique
    # lowest-count key and must be evicted at consolidation
    rows = [_read_of(target, 3, L)] + _filler_rows(cap, k, L, 9)
    sc.update(jnp.asarray(np.stack(rows)))
    sc._consolidate()
    assert sc.dropped_unique >= 1
    loss_1 = sc.dropped_kmers
    assert loss_1 >= 3                              # target's mass is gone

    # batch 2: target x5 + the same fillers x9 -> target re-enters, is
    # evicted AGAIN with only its new mass (the old 3 are lost forever)
    sc.update(jnp.asarray(np.stack(
        [_read_of(target, 5, L)] + _filler_rows(cap, k, L, 9))))
    sc._consolidate()

    # the invariant "no silent caps" promises: every counted k-mer is
    # either in the live table or accounted in dropped_kmers
    live_mass = int(np.asarray(sc.table.counts).sum())
    assert live_mass + sc.dropped_kmers == sc.kmers

    # quantify the documented worst case: if target had survived to the
    # end it would report only its post-eviction occurrences
    from kmers_tpu.oracle import numpy_ref as o
    fw = o.word_from_bytes(target.encode())
    canon = min(fw, o.reverse_complement_word(fw, k))
    got = dict(sc.to_pairs()).get(canon, 0)
    assert got in (0, 5)                            # never 8: prior mass lost
    assert got != 8


def test_eviction_reappearing_key_can_survive_with_partial_count():
    """When the re-appearing key survives the second consolidation, its
    reported count is exactly its occurrences since eviction -- the
    documented approximation, bounded by dropped_kmers."""
    k, L = 15, 160
    cap = 4
    target = "ACACACGTGTGTGAC"
    sc = StreamingCounter(k, capacity=cap, merge_every=1)
    sc.update(jnp.asarray(np.stack(
        [_read_of(target, 2, L)] + _filler_rows(cap, k, L, 9))))
    sc._consolidate()
    first_drop = sc.dropped_kmers
    assert first_drop >= 2
    # batch 2: target now dominates -- it survives with only its new mass
    sc.update(jnp.asarray(np.stack([_read_of(target, 9, L)])))
    from kmers_tpu.oracle import numpy_ref as o
    fw = o.word_from_bytes(target.encode())
    canon = min(fw, o.reverse_complement_word(fw, k))
    pairs = dict(sc.to_pairs())
    assert pairs.get(canon) == 9                    # not 11: 2 lost, counted
    live_mass = int(np.asarray(sc.table.counts).sum())
    assert live_mass + sc.dropped_kmers == sc.kmers
