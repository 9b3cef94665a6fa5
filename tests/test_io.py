"""FASTA/FASTQ ingest: native parser vs python fallback, chunking halo."""

import collections
import random

import numpy as np
import pytest

from kmers_tpu.io import fastx
from kmers_tpu.oracle import numpy_ref as o

RNG = random.Random(31337)


def rand_seq(n, alphabet=b"ACGTN"):
    return bytes(RNG.choice(alphabet) for _ in range(n))


def write_fasta(path, records, width=60):
    with open(path, "wb") as f:
        for i, r in enumerate(records):
            f.write(b">rec%d some description\n" % i)
            for j in range(0, len(r), width):
                f.write(r[j:j + width] + b"\n")


def write_fastq(path, records, tricky_quality=True):
    with open(path, "wb") as f:
        for i, r in enumerate(records):
            f.write(b"@rec%d\n" % i)
            f.write(r + b"\n+\n")
            # quality starting with '@' to stress the parser
            q = (b"@" if tricky_quality else b"I") + b"I" * (len(r) - 1) \
                if r else b""
            f.write(q + b"\n")


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
@pytest.mark.parametrize("force_python", [False, True])
def test_read_records_roundtrip(tmp_path, fmt, force_python):
    if not force_python and not fastx.native_available():
        pytest.skip("native lib not built")
    records = [rand_seq(RNG.randrange(1, 120)) for _ in range(37)]
    p = str(tmp_path / f"reads.{fmt}")
    (write_fasta if fmt == "fasta" else write_fastq)(p, records)
    got = []
    for rows, lens in fastx.read_records(p, batch=8, length=128,
                                         force_python=force_python):
        for i in range(rows.shape[0]):
            got.append(bytes(rows[i, :lens[i]]))
    assert got == records


@pytest.mark.parametrize("force_python", [False, True])
def test_read_records_truncation_reports_true_length(tmp_path, force_python):
    if not force_python and not fastx.native_available():
        pytest.skip("native lib not built")
    records = [rand_seq(500), rand_seq(20)]
    p = str(tmp_path / "reads.fasta")
    write_fasta(p, records)
    [(rows, lens)] = list(fastx.read_records(p, batch=8, length=64,
                                             force_python=force_python))
    assert list(lens) == [500, 20]
    assert bytes(rows[0]) == records[0][:64]


def _kmer_multiset(records, k):
    c = collections.Counter()
    for r in records:
        for p in range(len(r) - k + 1):
            sub = r[p:p + k]
            if all(o.encode_binary_u8(x) < 4 for x in sub):
                c[sub] += 1
    return c


@pytest.mark.parametrize("force_python", [False, True])
def test_kmer_batches_cover_all_windows(tmp_path, force_python):
    """Every k-mer of every record appears in exactly one row, even for
    records far longer than the row length (halo chunking)."""
    if not force_python and not fastx.native_available():
        pytest.skip("native lib not built")
    k = 21
    records = [rand_seq(RNG.randrange(5, 700), b"ACGT") for _ in range(9)]
    records.append(rand_seq(3000, b"ACGTN"))  # long + Ns
    p = str(tmp_path / "mix.fasta")
    write_fasta(p, records, width=71)
    got = collections.Counter()
    for batch in fastx.read_kmer_batches(p, k=k, batch=4, length=100,
                                         force_python=force_python):
        assert batch.shape == (4, 100)
        for row in batch:
            got += _kmer_multiset([bytes(row)], k)
    assert got == _kmer_multiset(records, k)


def test_native_python_chunk_parity(tmp_path):
    if not fastx.native_available():
        pytest.skip("native lib not built")
    k = 15
    records = [rand_seq(RNG.randrange(1, 400)) for _ in range(20)]
    p = str(tmp_path / "reads.fastq")
    write_fastq(p, records)
    a = [b.copy() for b in fastx.read_kmer_batches(p, k, 8, 64)]
    b = [x.copy() for x in fastx.read_kmer_batches(p, k, 8, 64,
                                                   force_python=True)]
    # same k-mer multiset (row layout may differ between implementations)
    ca = collections.Counter()
    cb = collections.Counter()
    for batch in a:
        for row in batch:
            ca += _kmer_multiset([bytes(row)], k)
    for batch in b:
        for row in batch:
            cb += _kmer_multiset([bytes(row)], k)
    assert ca == cb


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
@pytest.mark.parametrize("force_python", [False, True])
def test_gzip_roundtrip(tmp_path, fmt, force_python):
    """.fastq.gz / .fasta.gz decode to the same records as the plain file
    (native path: zlib gzFile; python path: gzip module by magic bytes)."""
    import gzip

    if not force_python and not fastx.native_available():
        pytest.skip("native lib not built")
    records = [rand_seq(RNG.randrange(1, 300)) for _ in range(25)]
    plain = str(tmp_path / f"reads.{fmt}")
    (write_fasta if fmt == "fasta" else write_fastq)(plain, records)
    gzpath = plain + ".gz"
    with open(plain, "rb") as src, gzip.open(gzpath, "wb") as dst:
        dst.write(src.read())
    got = []
    for rows, lens in fastx.read_records(gzpath, batch=8, length=512,
                                         force_python=force_python):
        for i in range(rows.shape[0]):
            got.append(bytes(rows[i, :lens[i]]))
    assert got == records


@pytest.mark.parametrize("force_python", [False, True])
def test_gzip_kmer_batches_match_plain(tmp_path, force_python):
    if not force_python and not fastx.native_available():
        pytest.skip("native lib not built")
    import gzip

    k = 21
    records = [rand_seq(RNG.randrange(5, 900)) for _ in range(12)]
    plain = str(tmp_path / "mix.fasta")
    write_fasta(plain, records, width=80)
    gzpath = plain + ".gz"
    with open(plain, "rb") as src, gzip.open(gzpath, "wb") as dst:
        dst.write(src.read())
    a = [b.copy() for b in fastx.read_kmer_batches(
        plain, k, 4, 128, force_python=force_python)]
    b = [b.copy() for b in fastx.read_kmer_batches(
        gzpath, k, 4, 128, force_python=force_python)]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pack2bit_native_matches_seqvector():
    seq = rand_seq(1000, b"ACGTNacgt")
    words, bitmap = fastx.pack2bit_native(seq)
    from kmers_tpu.ops.seqvector import pack_ascii_to_words

    ref_words = pack_ascii_to_words(np.frombuffer(seq, dtype=np.uint8))
    # invalid bases pack as garbage in the numpy path; mask them via bitmap
    for i, ch in enumerate(seq):
        ok = chr(ch).upper() in "ACGT"
        bit = (int(bitmap[i // 64]) >> (i % 64)) & 1
        assert bit == int(ok), i
        if ok:
            got = (int(words[i // 16]) >> ((i % 16) * 2)) & 3
            want = (int(ref_words[i // 16]) >> ((i % 16) * 2)) & 3
            assert got == want


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
@pytest.mark.parametrize("force_python", [False, True])
def test_packed_batches_match_ascii_pack(tmp_path, fmt, force_python):
    """read_packed_batches == pack_batch_np(read_kmer_batches): the native
    fused parse+pack delivers bit-identical words/bitmaps to packing the
    ASCII rows, including halo-chunked long records and padding rows."""
    if not force_python and not fastx.native_available():
        pytest.skip("native lib not built")
    records = [rand_seq(RNG.randrange(1, 120)) for _ in range(23)]
    records.append(rand_seq(900))  # long record: chunked with halo
    p = str(tmp_path / f"reads.{fmt}")
    (write_fasta if fmt == "fasta" else write_fastq)(p, records)
    k, B, L = 21, 8, 96
    ascii_batches = list(fastx.read_kmer_batches(
        p, k=k, batch=B, length=L, force_python=force_python))
    packed_batches = list(fastx.read_packed_batches(
        p, k=k, batch=B, length=L, force_python=force_python))
    assert len(ascii_batches) == len(packed_batches)
    for rows, (w, v) in zip(ascii_batches, packed_batches):
        ew, ev = fastx.pack_batch_np(rows)
        assert np.array_equal(w, ew)
        assert np.array_equal(v, ev)


def test_packed_batches_gzip_matches_plain(tmp_path):
    import gzip

    records = [rand_seq(RNG.randrange(1, 200)) for _ in range(19)]
    plain = str(tmp_path / "reads.fasta")
    write_fasta(plain, records)
    gz = str(tmp_path / "reads.fasta.gz")
    with open(plain, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    a = list(fastx.read_packed_batches(plain, k=15, batch=8, length=64))
    b = list(fastx.read_packed_batches(gz, k=15, batch=8, length=64))
    assert len(a) == len(b)
    for (w1, v1), (w2, v2) in zip(a, b):
        assert np.array_equal(w1, w2) and np.array_equal(v1, v2)


def test_packed_batches_rejects_bad_length(tmp_path):
    p = str(tmp_path / "reads.fasta")
    write_fasta(p, [rand_seq(50)])
    with pytest.raises(AssertionError):
        list(fastx.read_packed_batches(p, k=15, batch=4, length=40))


def test_prefetch_order_and_error_propagation():
    assert list(fastx.prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        yield 2
        raise ValueError("parse error")

    it = fastx.prefetch(boom())
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="parse error"):
        next(it)
