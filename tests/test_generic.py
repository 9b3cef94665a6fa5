"""Generic layer (Kmer<P,K,B> analog) vs oracle across widths/encodings."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from kmers_tpu import utils
from kmers_tpu.core import wideint as wi
from kmers_tpu.oracle import numpy_ref as o
from kmers_tpu.ops import generic as g

RNG = random.Random(24680)

WIDTHS = [8, 16, 32, 64, 128]
PERM_SAMPLE = ["ACTG", "ACGT", "TGCA", "GATC", "CTGA"]


def rand_seq(n):
    return bytes(RNG.choice(b"ACGTacgt") for _ in range(n))


def seq_batch(seqs):
    return jnp.asarray(np.stack([np.frombuffer(s, dtype=np.uint8)
                                 for s in seqs]))


def oracle_encoder(name):
    return o.Xor10Encoding() if name == "xor10" else o.NaiveEncoding(name)


def ks_for(width):
    per = width // 2
    return sorted({1, per - 1, per, per + 1, 2 * per, 2 * per + 1, 15, 31}
                  & set(range(1, 66)))


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("encname", ["ACGT", "TGCA", "xor10"])
def test_encode_words_vs_oracle(width, encname):
    oe = oracle_encoder(encname)
    for k in ks_for(width):
        spec = g.GenericSpec(width, k, encname)
        seqs = [rand_seq(k) for _ in range(8)]
        lanes = g.encode(spec, seq_batch(seqs))
        words = g.lanes_to_words(spec, lanes)
        for i, s in enumerate(seqs):
            want = oe.encode(s, width, spec.n_words)
            assert list(words[i]) == want, f"w={width} k={k} {encname} i={i}"


@pytest.mark.parametrize("width", [8, 32, 128])
@pytest.mark.parametrize("encname", PERM_SAMPLE + ["xor10"])
def test_decode_roundtrip_with_padding_quirk(width, encname):
    oe = oracle_encoder(encname)
    k = max(1, width // 2 - 1)  # force a padding slot for width > 2
    spec = g.GenericSpec(width, k, encname)
    seqs = [rand_seq(k) for _ in range(4)]
    lanes = g.encode(spec, seq_batch(seqs))
    dec = np.asarray(g.decode(spec, lanes))
    for i, s in enumerate(seqs):
        want = oe.decode(oe.encode(s, width, spec.n_words), width)
        assert bytes(dec[i]) == want, f"{encname}"
        # decode emits ALL storage bases (quirk): longer than k
        assert len(want) == spec.total_bases
        assert bytes(dec[i][:k]) == want[:k]


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("encname", ["ACGT", "AGTC", "xor10"])
def test_rev_comp_vs_oracle(width, encname):
    oe = oracle_encoder(encname)
    for k in ks_for(width):
        spec = g.GenericSpec(width, k, encname)
        seqs = [rand_seq(k) for _ in range(6)]
        lanes = g.encode(spec, seq_batch(seqs))
        rc = g.rev_comp(spec, lanes)
        words = g.lanes_to_words(spec, rc)
        for i, s in enumerate(seqs):
            want = oe.rev_comp(oe.encode(s, width, spec.n_words), width, k)
            assert list(words[i]) == want, f"w={width} k={k} {encname}"


def test_rev_comp_involution():
    for encname in PERM_SAMPLE + ["xor10"]:
        spec = g.GenericSpec(64, 31, encname)
        seqs = [rand_seq(31) for _ in range(8)]
        lanes = g.encode(spec, seq_batch(seqs))
        back = g.rev_comp(spec, g.rev_comp(spec, lanes))
        assert wi.to_python_ints(back) == wi.to_python_ints(lanes), encname


def test_get_and_prefix_quirk():
    spec = g.GenericSpec(64, 20, "ACGT")
    s = b"ACGTACGTACGTACGTACGT"
    lanes = g.encode(spec, jnp.asarray(
        np.frombuffer(s, dtype=np.uint8))[None, :])
    arr_words = [int(w) for w in g.lanes_to_words(spec, lanes)[0]]
    for i in range(20):
        got = int(np.asarray(g.get(spec, lanes, i))[0])
        assert got == o.generic_get(arr_words, 64, i)
    for ln in (0, 3, 10):
        got = wi.to_python_ints(g.get_prefix(spec, lanes, ln))[0]
        assert got == o.generic_get_prefix(arr_words, 64, ln), ln
        # quirk: 2*ln+1 bits, one more bit than 2*ln
        assert got < (1 << (2 * ln + 1))


def test_utils_parity():
    # utils.rs:40-74 test values
    assert utils.kmer_space(1) == 4
    assert utils.kmer_space(2) == 16
    assert utils.kmer_space(4) == 256
    assert utils.canonical_space(1) == 2
    assert utils.canonical_space(2) == 4
    assert utils.canonical_space(3) == 32
    # bitmer_to_bytes (src/kmer.rs:71-91): LSB-first, uppercase
    assert utils.bitmer_to_bytes(0, 3) == b"AAA"
    assert utils.bitmer_to_bytes(0b11100100, 4) == b"ACGT"


def test_all_24_perms_encode_decode_complement():
    for perm in g.NAIVE_PERMS:
        spec = g.GenericSpec(64, 12, perm)
        oe = o.NaiveEncoding(perm)
        s = rand_seq(12)
        lanes = g.encode(spec, jnp.asarray(
            np.frombuffer(s, dtype=np.uint8))[None, :])
        assert list(g.lanes_to_words(spec, lanes)[0]) == \
            oe.encode(s, 64, spec.n_words), perm
        rc = g.rev_comp(spec, lanes)
        assert list(g.lanes_to_words(spec, rc)[0]) == \
            oe.rev_comp(oe.encode(s, 64, spec.n_words), 64, 12), perm


# -- windowed construction (round 4; VERDICT r3 item 5) ------------------------

def test_encode_windows_matches_per_window():
    """encode_windows must be bit-identical to per-window encode (the
    reference's construct loop) at every valid position, across widths,
    k straddling lane boundaries, and both encoder families."""
    import numpy as np

    rng = np.random.default_rng(99)
    reads = jnp.asarray(rng.choice(
        np.frombuffer(b"ACGTacgtNx", dtype=np.uint8), size=(4, 70)))
    for width, k in ((8, 3), (16, 7), (32, 15), (64, 16), (64, 17),
                     (64, 31), (64, 32), (128, 33), (128, 63)):
        for enc_name in ("ACGT", "TGCA", "xor10"):
            spec = g.GenericSpec(width, k, enc_name)
            lanes, valid = g.encode_windows(spec, reads)
            assert len(lanes) == spec.n_lanes
            v = np.asarray(valid)
            # per-window reference path
            for p in range(70 - k + 1):
                ref = g.encode(spec, reads[:, p:p + k])
                for j in range(spec.n_lanes):
                    got = np.asarray(lanes[j][:, p])
                    np.testing.assert_array_equal(
                        got, np.asarray(ref[j]),
                        err_msg=f"w={width} k={k} {enc_name} p={p} lane{j}")
            assert v[:, :70 - k + 1].all() and not v[:, 70 - k + 1:].any()
