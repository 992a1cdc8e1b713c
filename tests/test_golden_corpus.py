"""End-to-end kernel checks against the reference's golden fixtures for
its 2-read corpus (/root/reference/test_data/reads.fq,
/root/reference/ktio/src/seq.rs:165-181).  Small goldens are embedded;
the 2x136 CFV golden is read from the reference tree when present
(skipped otherwise so the repo stays standalone)."""

import os

import numpy as np
import pytest

from kmerray.core.coverage import coverage_batch
from kmerray.core.encoding import (canonical_flat_kmers, numeric_to_kmer,
                                   tokens_from_str)
from kmerray.core.minimiser import minimisers_batch
from kmerray.core.oligo import cfv_batch

READ_1 = ("GGGTGATGGCCGCTGCCGATGGCGTCAAATCCCACCAAGTTACCCTTAACAACTTAAGGG"
          "TTTTCAAATAGA")
READ_2 = ("GTTCAGGGATACGACGTTTGTATTTTAAGAATCTGAAGCAGAAGTCGATGATAATACGCG"
          "TCGTTTTATCAT")

REF_GOLDEN = "/root/reference/test_data"


def corpus():
    toks = [tokens_from_str(READ_1), tokens_from_str(READ_2)]
    values = np.concatenate(toks)
    offsets = np.array([0, len(toks[0]), len(toks[0]) + len(toks[1])],
                       dtype=np.int64)
    return values, offsets


def test_counter_k15_golden():
    # counter/src/lib.rs:259-276 golden: the corpus' canonical 15-mer
    # counts (expected_counts.part_0_chunk_0, 116 distinct)
    values, offsets = corpus()
    canon, row = canonical_flat_kmers(values, offsets, 15)
    kmers, counts = np.unique(canon, return_counts=True)
    got = dict(zip(kmers.tolist(), counts.tolist()))
    assert len(got) == 116
    if os.path.exists(f"{REF_GOLDEN}/expected_counts.part_0_chunk_0"):
        exp = {}
        with open(f"{REF_GOLDEN}/expected_counts.part_0_chunk_0") as fh:
            for line in fh:
                k, c = line.split()
                exp[int(k)] = int(c)
        assert got == exp


def test_coverage_golden():
    # coverage/src/lib.rs:195-242: k=4, bin_size=2, bin_count=3
    values, offsets = corpus()
    canon, _ = canonical_flat_kmers(values, offsets, 4)
    kmers, counts = np.unique(canon, return_counts=True)
    un = coverage_batch(values, offsets, 4, kmers, counts, 2, 3, norm=False)
    assert un.tolist() == [[22.0, 44.0, 3.0], [13.0, 55.0, 1.0]]
    nm = coverage_batch(values, offsets, 4, kmers, counts, 2, 3, norm=True)
    # golden text is 6-dp rounded (expected_counts.vectors)
    assert np.round(nm, 6).tolist() == [[0.318841, 0.637681, 0.043478],
                                        [0.188406, 0.797101, 0.014493]]


def test_m2s_golden():
    # misc/src/minimisers.rs:169-178: w=0, m=10 whole-seq minimizers
    values, offsets = corpus()
    rows, mmers, starts, ends = minimisers_batch(values, offsets, 0, 10)
    got = {(int(r)): (numeric_to_kmer(int(k), 10), int(s), int(e))
           for r, k, s, e in zip(rows, mmers, starts, ends)}
    assert got == {0: ("AAAACCCTTA", 0, 72), 1: ("AAAACGACGC", 0, 72)}


def test_s2m_golden():
    # misc/src/minimisers.rs:180-187: w=31, m=7 decompositions
    values, offsets = corpus()
    rows, mmers, starts, ends = minimisers_batch(values, offsets, 31, 7)
    got = {0: [], 1: []}
    for r, k, s, e in zip(rows, mmers, starts, ends):
        got[int(r)].append(f"{numeric_to_kmer(int(k), 7)}:{s}-{e}")
    assert got[0] == ["ACGCCAT:0-32", "AAATCCC:2-57", "AACAACT:27-62",
                      "AAACCCT:32-63", "AAAACCC:33-72"]
    assert got[1] == ["AAAATAC:0-50", "AAGAATC:20-57", "AAGCAGA:27-64",
                      "AACGACG:34-65", "AAACGAC:35-66", "AAAACGA:36-72"]


@pytest.mark.skipif(not os.path.exists(f"{REF_GOLDEN}/expected_fa.kmers"),
                    reason="reference goldens unavailable")
def test_cfv_golden_6dp():
    # composition/src/oligo.rs:312-368: k=4 canonical normalized, text
    # fixture rounded to 6 dp
    values, offsets = corpus()
    mat = cfv_batch(values, offsets, 4, canonical=True, norm=True)
    with open(f"{REF_GOLDEN}/expected_fa.kmers") as fh:
        exp = np.array([[float(x) for x in line.split()] for line in fh])
    assert mat.shape == exp.shape
    assert np.allclose(np.round(mat, 6), exp, atol=1e-9)
