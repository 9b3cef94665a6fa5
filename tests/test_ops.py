"""Differential tests: batched jnp ops vs the scalar oracle.

This is the quickcheck analog (SURVEY §4): random inputs, bit-exact
comparison against kmers_tpu.oracle.numpy_ref for every op.

XLA compilation on this host is very slow (~1s per compile, regardless of
graph size), so each test group funnels ALL its device work through ONE
jitted composite function; eager op chains are forbidden here.
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmers_tpu.core import u64 as u
from kmers_tpu.core.u64 import U64
from kmers_tpu.oracle import numpy_ref as o
from kmers_tpu.ops import encoding, hash as hash_ops, kmer as kmer_ops
from kmers_tpu.ops import minimizer as mini_ops
from kmers_tpu.ops import seqvector as sv_ops

RNG = random.Random(1234)

NW = 256   # canonical word-array length
SL = 128   # canonical sequence length


def rand_words(n=NW):
    return [RNG.getrandbits(64) for _ in range(n)]


def as_u64(ws):
    return u.from_numpy(np.array(ws, dtype=np.uint64))


def rand_seq(n, alphabet=b"ACGT"):
    return bytes(RNG.choice(alphabet) for _ in range(n))


def seq_arr(seq: bytes) -> jnp.ndarray:
    return jnp.asarray(np.frombuffer(seq, dtype=np.uint8))


# ---------------------------------------------------------------------------
# core/u64 arithmetic vs Python ints  (one jitted bundle)
# ---------------------------------------------------------------------------

SHIFT_AMOUNTS = [0, 1, 2, 5, 31, 32, 33, 47, 62, 63, 64]
KS = [1, 2, 3, 15, 16, 17, 31, 32]
SEEDS = [0, 42, 0xDEADBEEFCAFE]


@jax.jit
def _u64_bundle(a, b):
    out = {}
    for n in SHIFT_AMOUNTS:
        out[f"shl{n}"] = u.shl(a, n)
        out[f"shr{n}"] = u.shr(a, n)
    out["and"] = u.and_(a, b)
    out["or"] = u.or_(a, b)
    out["xor"] = u.xor(a, b)
    out["not"] = u.not_(a)
    out["lt"] = u.lt(a, b)
    out["le"] = u.le(a, b)
    out["eq"] = u.eq(a, b)
    out["min"] = u.min_(a, b)
    out["add"] = u.add(a, b)
    for k in KS:
        ak = u.and_const(a, o.MASK_TABLE[k] if k < 32 else o.MASK64)
        out[f"rc{k}"] = u.reverse_complement(ak, k)
        out[f"lex{k}"] = u.lex_hash(ak, k)
    for s in SEEDS:
        out[f"mix{s}"] = u.mix_hash(a, s)
    return out


@pytest.fixture(scope="module")
def u64_bundle():
    a_ws, b_ws = rand_words(), rand_words()
    a_ws[0] = b_ws[0]                      # equal pair
    a_ws[1] = (b_ws[1] & ~0xFFFFFFFF) | (a_ws[1] & 0xFFFFFFFF)  # hi-equal
    out = _u64_bundle(as_u64(a_ws), as_u64(b_ws))
    return a_ws, b_ws, jax.tree.map(np.asarray, out)


def _w64(x):
    return np.array(x, dtype=np.uint64)


def test_u64_shifts(u64_bundle):
    a_ws, _, out = u64_bundle
    for n in SHIFT_AMOUNTS:
        np.testing.assert_array_equal(
            u.to_numpy(U64(*out[f"shl{n}"])), _w64([(w << n) & o.MASK64 for w in a_ws]))
        np.testing.assert_array_equal(
            u.to_numpy(U64(*out[f"shr{n}"])), _w64([w >> n for w in a_ws]))


def test_u64_bitwise(u64_bundle):
    a_ws, b_ws, out = u64_bundle
    np.testing.assert_array_equal(
        u.to_numpy(U64(*out["and"])), _w64([x & y for x, y in zip(a_ws, b_ws)]))
    np.testing.assert_array_equal(
        u.to_numpy(U64(*out["or"])), _w64([x | y for x, y in zip(a_ws, b_ws)]))
    np.testing.assert_array_equal(
        u.to_numpy(U64(*out["xor"])), _w64([x ^ y for x, y in zip(a_ws, b_ws)]))
    np.testing.assert_array_equal(
        u.to_numpy(U64(*out["not"])), _w64([(~x) & o.MASK64 for x in a_ws]))


def test_u64_cmp(u64_bundle):
    a_ws, b_ws, out = u64_bundle
    np.testing.assert_array_equal(out["lt"], [x < y for x, y in zip(a_ws, b_ws)])
    np.testing.assert_array_equal(out["le"], [x <= y for x, y in zip(a_ws, b_ws)])
    np.testing.assert_array_equal(out["eq"], [x == y for x, y in zip(a_ws, b_ws)])
    np.testing.assert_array_equal(
        u.to_numpy(U64(*out["min"])), _w64([min(x, y) for x, y in zip(a_ws, b_ws)]))
    np.testing.assert_array_equal(
        u.to_numpy(U64(*out["add"])), _w64([(x + y) & o.MASK64 for x, y in zip(a_ws, b_ws)]))


def test_u64_revcomp_vs_oracle(u64_bundle):
    a_ws, _, out = u64_bundle
    for k in KS:
        mask = o.MASK_TABLE[k] if k < 32 else o.MASK64
        want = _w64([o.reverse_complement_word(w & mask, k) for w in a_ws])
        np.testing.assert_array_equal(
            u.to_numpy(U64(*out[f"rc{k}"])), want, err_msg=f"k={k}")


def test_u64_lex_hash_vs_oracle(u64_bundle):
    a_ws, _, out = u64_bundle
    for k in KS:
        mask = o.MASK_TABLE[k] if k < 32 else o.MASK64
        want = _w64([o.lex_hash(w & mask, k) for w in a_ws])
        np.testing.assert_array_equal(
            u.to_numpy(U64(*out[f"lex{k}"])), want, err_msg=f"k={k}")


def test_u64_mix_hash_vs_oracle(u64_bundle):
    a_ws, _, out = u64_bundle
    for s in SEEDS:
        want = _w64([o.mix_hash(w, s) for w in a_ws])
        np.testing.assert_array_equal(
            u.to_numpy(U64(*out[f"mix{s}"])), want, err_msg=f"seed={s}")


# ---------------------------------------------------------------------------
# encoding (one jitted bundle)
# ---------------------------------------------------------------------------

@jax.jit
def _encoding_bundle(arr, codes0123):
    out = {
        "codes": encoding.ascii_to_codes(arr),
        "valid": encoding.valid_mask(arr),
        "low": encoding.codes_to_ascii(codes0123, lower=True),
        "up": encoding.codes_to_ascii(codes0123, lower=False),
    }
    for perm, disc in o.NAIVE_PERMS.items():
        enc = encoding.perm_encode(arr, disc)
        out[f"enc_{perm}"] = enc
        out[f"dec_{perm}"] = encoding.perm_decode(enc, disc)
        out[f"comp_{perm}"] = encoding.perm_complement(enc, disc)
    return out


@pytest.fixture(scope="module")
def enc_bundle():
    data = b"ACGTacgtNnXZ-" + rand_seq(SL - 13, b"ACGTacgtNRYX")
    codes = jnp.asarray(np.array([0, 1, 2, 3] * (SL // 4), dtype=np.uint32))
    out = _encoding_bundle(seq_arr(data), codes)
    return data, jax.tree.map(np.asarray, out)


def test_ascii_to_codes(enc_bundle):
    data, out = enc_bundle
    for i, c in enumerate(data):
        b = o.encode_binary_u8(c)
        if b == o.INVALID:
            assert not out["valid"][i]
        else:
            assert out["valid"][i]
            assert out["codes"][i] == b


def test_codes_to_ascii(enc_bundle):
    _, out = enc_bundle
    assert bytes(out["low"]) == b"acgt" * (SL // 4)
    assert bytes(out["up"]) == b"ACGT" * (SL // 4)


def test_perm_encode_decode_complement(enc_bundle):
    data, out = enc_bundle
    valid_idx = [i for i, c in enumerate(data) if o.encode_binary_u8(c) != o.INVALID]
    for perm in o.NAIVE_PERMS:
        e = o.NaiveEncoding(perm)
        for i in valid_idx:
            c = data[i]
            want = e.nuc2bits(c)
            assert out[f"enc_{perm}"][i] == want, perm
            assert out[f"dec_{perm}"][i] == e.bits2nuc(want), perm
            assert out[f"comp_{perm}"][i] == e.complement(want), perm


# ---------------------------------------------------------------------------
# kmer windows + canonical + iterator semantics (one jitted bundle per shape)
# ---------------------------------------------------------------------------

WINDOW_KS = [3, 15, 16, 17, 31, 32]


@jax.jit
def _windows_bundle(arr):
    out = {}
    for k in WINDOW_KS:
        win = kmer_ops.kmer_windows(arr, k)
        out[k] = (win.fw, win.rc, win.valid)
    return out


def test_window_words_vs_oracle():
    seq = rand_seq(SL)
    out = _windows_bundle(seq_arr(seq))
    for k in WINDOW_KS:
        fw = u.to_numpy(out[k][0])
        for p in range(SL - k + 1):
            assert int(fw[p]) == o.word_from_bytes(seq[p:p + k]), f"k={k} pos={p}"


def test_kmer_windows_match_iterator():
    """Batch windows+valid must reproduce CanonicalKmerIterator output
    exactly, including N-skipping (canonical_kmer_iterator.rs:41-70)."""
    for trial in range(6):
        seq = bytearray(rand_seq(SL))
        for _ in range(RNG.randint(0, 6)):
            seq[RNG.randrange(SL)] = ord("N")
        if trial == 3:  # models a short read padded with N
            for i in range(45, SL):
                seq[i] = ord("N")
        seq = bytes(seq)
        out = _windows_bundle(seq_arr(seq))
        for k in (3, 31):
            fw_p, rc_p, valid = jax.tree.map(np.asarray, out[k])
            fw, rc = u.to_numpy(U64(*fw_p)), u.to_numpy(U64(*rc_p))
            n_win = SL - k + 1
            want = o.valid_kmer_positions(seq, k)
            got = [(p, int(fw[p]), int(rc[p])) for p in range(n_win) if valid[p]]
            assert got == want, f"trial {trial} k={k}"
            assert not valid[n_win:].any()


ROLL_KS = [3, 21, 31, 32]


@jax.jit
def _rolling_bundle(x, b):
    out = {}
    for k in ROLL_KS:
        mask = o.MASK_TABLE[k] if k < 32 else o.MASK64
        xk = u.and_const(x, mask)
        rc = u.reverse_complement(xk, k)
        out[f"canon{k}"] = kmer_ops.canonical_word(xk, rc)
        out[f"isfw{k}"] = kmer_ops.is_fw_canonical(xk, rc)
        out[f"iscan{k}"] = kmer_ops.is_canonical(xk, k)
        out[f"app{k}"] = kmer_ops.append_base(xk, b, k)
        out[f"pre{k}"] = kmer_ops.prepend_base(xk, b, k)
        out[f"ckapp{k}"] = kmer_ops.ck_append_base(xk, rc, b, k)
        out[f"ckpre{k}"] = kmer_ops.ck_prepend_base(xk, rc, b, k)
        out[f"match_self{k}"] = kmer_ops.match_type(xk, rc, xk)
        out[f"match_rc{k}"] = kmer_ops.match_type(xk, rc, rc)
        out[f"match_zero{k}"] = kmer_ops.match_type(
            xk, rc, U64(jnp.zeros_like(xk.hi), jnp.zeros_like(xk.lo)))
    return out


@pytest.fixture(scope="module")
def roll_bundle():
    ws = rand_words()
    bases = [RNG.randrange(4) for _ in ws]
    out = _rolling_bundle(as_u64(ws), jnp.asarray(np.array(bases, dtype=np.uint32)))
    return ws, bases, jax.tree.map(np.asarray, out)


def test_canonical_ops_vs_oracle(roll_bundle):
    ws, _, out = roll_bundle
    for k in ROLL_KS:
        mask = o.MASK_TABLE[k] if k < 32 else o.MASK64
        canon = u.to_numpy(U64(*out[f"canon{k}"]))
        for i, w in enumerate(ws):
            ck = o.CanonicalKmer.from_u64(w & mask, k) if k < 32 else \
                o.CanonicalKmer(fw=o.Kmer(k, w), rc=o.Kmer(k, o.reverse_complement_word(w, k)))
            assert int(canon[i]) == ck.get_canonical_word(), f"k={k} i={i}"
            assert bool(out[f"isfw{k}"][i]) == ck.is_fw_canonical()
        iscan = out[f"iscan{k}"]
        for i, w in enumerate(ws):
            km = o.Kmer(k=k, data=w & mask)
            assert bool(iscan[i]) == km.is_canonical()


def test_rolling_ops_vs_oracle(roll_bundle):
    ws, bases, out = roll_bundle
    for k in ROLL_KS:
        mask = o.MASK_TABLE[k] if k < 32 else o.MASK64
        app_new, app_ev = U64(*out[f"app{k}"][0]), out[f"app{k}"][1]
        pre_new, pre_ev = U64(*out[f"pre{k}"][0]), out[f"pre{k}"][1]
        app_np, pre_np = u.to_numpy(app_new), u.to_numpy(pre_new)
        for i, w in enumerate(ws):
            km = o.Kmer(k=k, data=w & mask)
            ev = km.append_base(bases[i])
            assert int(app_np[i]) == km.data and int(app_ev[i]) == ev, f"k={k}"
            km = o.Kmer(k=k, data=w & mask)
            ev = km.prepend_base(bases[i])
            assert int(pre_np[i]) == km.data and int(pre_ev[i]) == ev, f"k={k}"


def test_ck_rolling_vs_oracle(roll_bundle):
    ws, bases, out = roll_bundle
    for k in ROLL_KS:
        if k == 32:
            continue  # CanonicalKmer rolling at k=32 inherits the from_u64 quirk
        mask = o.MASK_TABLE[k]
        for tag, action in [("ckapp", "append_base"), ("ckpre", "prepend_base")]:
            nfw, nrc, ev = out[f"{tag}{k}"]
            nfw, nrc = u.to_numpy(U64(*nfw)), u.to_numpy(U64(*nrc))
            for i, w in enumerate(ws):
                ck = o.CanonicalKmer.from_u64(w & mask, k)
                want_ev = getattr(ck, action)(bases[i])
                assert int(nfw[i]) == ck.get_fw_word(), f"{tag} k={k}"
                assert int(nrc[i]) == ck.get_rc_word(), f"{tag} k={k}"
                assert int(ev[i]) == want_ev, f"{tag} k={k}"


def test_match_type_vs_oracle(roll_bundle):
    ws, _, out = roll_bundle
    for k in ROLL_KS:
        mask = o.MASK_TABLE[k] if k < 32 else o.MASK64
        for i, w in enumerate(ws):
            wm = w & mask
            rcw = o.reverse_complement_word(wm, k)
            want_self = 1  # IdentityMatch checked first
            want_rc = 1 if wm == rcw else 2
            want_zero = 1 if wm == 0 else (2 if rcw == 0 else 0)
            assert int(out[f"match_self{k}"][i]) == want_self
            assert int(out[f"match_rc{k}"][i]) == want_rc
            assert int(out[f"match_zero{k}"][i]) == want_zero


# ---------------------------------------------------------------------------
# per-kmer minimizer + minimizer stream (one jitted bundle)
# ---------------------------------------------------------------------------

MINI_PARAMS = [(5, 3), (6, 3), (7, 3), (31, 11), (9, 4)]


@jax.jit
def _mini_bundle(x13, arr):
    out = {
        "mm_mix": kmer_ops.minimizer(x13, 13, 5, hash_ops.mix_hash_fn(7)),
        "mm_lex": kmer_ops.minimizer(x13, 13, 5, hash_ops.lex_hash_fn(5)),
    }
    for k, w in MINI_PARAMS:
        s = mini_ops.minimizer_stream(arr, k, w, hash_ops.mix_hash_fn(3))
        out[f"st{k}_{w}"] = (s.word, s.pos, s.valid)
    return out


@pytest.fixture(scope="module")
def mini_bundle():
    k = 13
    ws = [w & o.MASK_TABLE[k] for w in rand_words()]
    seq = rand_seq(SL)
    out = _mini_bundle(as_u64(ws), seq_arr(seq))
    return ws, seq, jax.tree.map(np.asarray, out)


def test_minimizer_vs_oracle(mini_bundle):
    ws, _, out = mini_bundle
    for tag, ostate in [("mm_mix", o.mix_hash_state(7)), ("mm_lex", o.lex_hash_state(5))]:
        mm, pos = U64(*out[tag][0]), out[tag][1]
        mmh = u.to_numpy(mm)
        for i, w in enumerate(ws):
            want_mm, want_off = o.minimizer_word(w, 13, 5, ostate)
            assert int(mmh[i]) == want_mm, tag
            assert int(pos[i]) == want_off, tag


def test_minimizer_stream_vs_oracle(mini_bundle):
    _, seq, out = mini_bundle
    sv = o.SeqVector.from_bytes(seq)
    for k, w in MINI_PARAMS:
        word, pos, _ = out[f"st{k}_{w}"]
        word = u.to_numpy(U64(*word))
        want = list(sv.iter_minimizers(k, w, o.mix_hash_state(3)))
        n_kmers = SL - k + 1
        assert len(want) == n_kmers
        got = [(int(word[i]), int(pos[i])) for i in range(n_kmers)]
        assert got == want, f"k={k} w={w}"


@jax.jit
def _mini_golden_bundle(a1, a2, a3):
    s1 = mini_ops.minimizer_stream(a1, 6, 3, hash_ops.lex_hash_fn(6))
    s2 = mini_ops.minimizer_stream(a2, 5, 3, hash_ops.lex_hash_fn(5))
    s3 = mini_ops.minimizer_stream(a3, 7, 3, hash_ops.lex_hash_fn(3))
    return [(s.word, s.pos) for s in (s1, s2, s3)]


def test_minimizer_stream_golden():
    # the reference's minimizer fixtures through the device path
    # (minimizers.rs:238-290); sequences padded to a shared length with N
    # (mask machinery leaves the valid prefix untouched)
    pads = [b"AAACAAA", b"AACCAAA", b"CACACACC" + b"AC"]
    args = [seq_arr(s + b"N" * (16 - len(s))) for s in pads]
    out = jax.tree.map(np.asarray, _mini_golden_bundle(*args))

    def got(i, n):
        word = u.to_numpy(U64(*out[i][0]))
        return [(int(word[j]), int(out[i][1][j])) for j in range(n)]

    assert got(0, 2) == [(0, 0), (0, 4)]
    assert got(1, 3) == [(0b010000, 0), (0b010100, 1), (0b000000, 4)]
    aca = 0b000100
    assert got(2, 4) == [(aca, 1), (aca, 1), (aca, 3), (aca, 3)]


# ---------------------------------------------------------------------------
# SeqVector device container
# ---------------------------------------------------------------------------

SV_KS = [1, 5, 16, 17, 31, 32]
SVL = 200


@jax.jit
def _sv_gather_bundle(words):
    pos_full = jnp.arange(SVL, dtype=jnp.int32)
    out = {}
    for k in SV_KS:
        n = SVL - k + 1
        out[k] = sv_ops.gather_kmers(words, jnp.minimum(pos_full, n - 1), k)
    return out


def test_seqvector_pack_roundtrip():
    seq = rand_seq(173)
    sv = sv_ops.SeqVector.from_bytes(seq)
    assert len(sv) == 173
    assert sv.to_string() == seq.decode()


def test_seqvector_gather_vs_oracle():
    seq = rand_seq(SVL)
    sv = sv_ops.SeqVector.from_bytes(seq)
    osv = o.SeqVector.from_bytes(seq)
    out = jax.tree.map(np.asarray, _sv_gather_bundle(sv.words))
    for k in SV_KS:
        n = SVL - k + 1
        got = u.to_numpy(U64(*out[k]))[:n]
        want = [osv.get_kmer_u64(p, k) for p in range(n)]
        np.testing.assert_array_equal(got, _w64(want), err_msg=f"k={k}")


def test_seqvector_minimizers_vs_oracle():
    seq = rand_seq(150)
    sv = sv_ops.SeqVector.from_bytes(seq)
    osv = o.SeqVector.from_bytes(seq)
    k, w = 31, 11
    got = list(sv.iter_minimizers(k, w, hash_ops.mix_hash_fn(5)))
    want = list(osv.iter_minimizers(k, w, o.mix_hash_state(5)))
    assert got == want


def test_seqvector_push_chars():
    sv = sv_ops.SeqVector.from_bytes(b"")
    sv.push_chars(b"A" * 30)
    assert sv.to_string() == "A" * 30
    sv.push_chars(b"C" * 40)
    assert len(sv) == 70
    assert sv.to_string() == "A" * 30 + "C" * 40


def test_seqvector_save_load(tmp_path):
    seq = rand_seq(99)
    sv = sv_ops.SeqVector.from_bytes(seq)
    p = str(tmp_path / "sv.npz")
    sv.save(p)
    sv2 = sv_ops.SeqVector.load(p)
    assert sv2.to_string() == seq.decode()


def test_kmer_windows_short_read():
    """Regression: reads shorter than the 16-base pack stride must not crash
    (found driving L=4 through kmer_windows) and must match the oracle."""
    for L, k in [(4, 4), (3, 2), (7, 5), (16, 16)]:
        seq = rand_seq(L)
        out = kmer_ops.kmer_windows(seq_arr(seq)[None, :], k)
        fw = u.to_numpy(out.fw)[0]
        valid = np.asarray(out.valid)[0]
        want = o.valid_kmer_positions(seq, k)
        got = [(p, int(fw[p])) for p in range(out.n_windows) if valid[p]]
        assert got == [(p, f) for p, f, _ in want], f"L={L} k={k}"


def test_seqvector_slice_parity():
    seq = rand_seq(120)
    sv = sv_ops.SeqVector.from_bytes(seq)
    osv = o.SeqVector.from_bytes(seq)
    sl = sv.slice(17, 93)
    osl = osv.slice(17, 93)
    assert len(sl) == len(osl)
    assert sl.to_string() == str(osl)
    k = 13
    for p in (0, 5, len(sl) - k):
        assert sl.get_kmer_u64(p, k) == osl.get_kmer_u64(p, k)
    # re-slice
    s2, o2 = sl.slice(10, 40), osl.slice(10, 40)
    assert s2.to_string() == str(o2)
    assert s2.get_base(3) == o2.get_base(3)
    assert [wk for wk, _ in s2.iter_kmers(7)] == \
        [km.into_u64() for km in o2.iter_kmers(7)]


def test_seqvector_name_parity_iterators():
    # SeqVecKmerIterator / SeqVecMinimizerIter / MappedMinimizer
    # (seq_vector.rs:260-300, minimizers.rs:20-36,97-142)
    seq = rand_seq(90)
    sv = sv_ops.SeqVector.from_bytes(seq)
    osv = o.SeqVector.from_bytes(seq)
    k, w = 21, 7
    it = sv_ops.SeqVecKmerIterator(sv, k)
    assert len(it) == 90 - k + 1
    assert list(it) == [(km.data, km.k) for km in osv.iter_kmers(k)]
    mit = sv_ops.SeqVecMinimizerIter(sv, k, w, hash_ops.mix_hash_fn(9))
    got = [(m.word, m.pos) for m in mit]
    assert got == list(osv.iter_minimizers(k, w, o.mix_hash_state(9)))


def test_seqvector_with_capacity():
    sv = sv_ops.SeqVector.with_capacity(64)
    assert sv.is_empty()
    sv.push_chars(b"ACGTACGT")
    assert sv.to_string() == "ACGTACGT"


def test_rev_encoding_inverse():
    # rev_encoding is the inverse permutation (encoding/naive.rs:29-39)
    from kmers_tpu.ops.generic import NAIVE_PERMS
    for disc in NAIVE_PERMS.values():
        rev = encoding.rev_encoding(disc)
        for internal in range(4):
            code = (disc >> (6 - 2 * internal)) & 3
            assert (rev >> (6 - 2 * code)) & 3 == internal
