"""CLI end-to-end: count -> stats -> query -> resume."""

import collections
import random
import sys

import pytest

from kmers_tpu.__main__ import main
from kmers_tpu.oracle import numpy_ref as o

RNG = random.Random(22)


@pytest.fixture()
def fasta(tmp_path):
    recs = ["".join(RNG.choice("ACGT") for _ in range(90)) for _ in range(20)]
    p = tmp_path / "reads.fasta"
    with open(p, "w") as f:
        for i, r in enumerate(recs):
            f.write(f">r{i}\n{r}\n")
    return str(p), recs


def test_cli_count_query_stats(fasta, tmp_path, capsys):
    path, recs = fasta
    out = str(tmp_path / "t.npz")
    assert main(["count", path, "-k", "15", "-o", out,
                 "--batch", "8", "--length", "96"]) == 0
    # stats
    assert main(["stats", out]) == 0
    stats = capsys.readouterr().out
    want = collections.Counter()
    for r in recs:
        for p in range(len(r) - 15 + 1):
            fw = o.word_from_bytes(r[p:p + 15].encode())
            want[min(fw, o.reverse_complement_word(fw, 15))] += 1
    assert f"total kmers:    {sum(want.values())}" in stats
    # query: most frequent + absent
    top, top_c = want.most_common(1)[0]
    top_s = o.word_to_string(top, 15).upper()
    assert main(["query", out, top_s, "A" * 15]) == 0
    lines = capsys.readouterr().out.strip().split("\n")
    assert lines[0] == f"{top_s}\t{top_c}"
    # bad query length
    assert main(["query", out, "ACGT"]) == 2


def test_cli_resume_k_mismatch(fasta, tmp_path):
    path, _ = fasta
    out = str(tmp_path / "t.npz")
    assert main(["count", path, "-k", "15", "-o", out]) == 0
    assert main(["count", path, "-k", "17", "-o", out, "--resume"]) == 2
