"""Minimizer kernel tests from the reference's worked examples
(/root/reference/kmer/src/minimiser.rs:183-305)."""

import numpy as np

from kmerray.core.encoding import tokens_from_str, numeric_to_kmer
from kmerray.core.minimiser import minimisers_batch, sliding_min

SEQ100 = ("ATGCGATATCGTAGGCGTCGATGGAGAGCTAGATCGATCGATCTAAATCCCGATCGATTC"
          "CGAGCGCGATCAAAGCGCGATAGGCTAGCTAAAGCTAGCA")


def run(seq, w, m):
    t = tokens_from_str(seq)
    off = np.array([0, len(t)], dtype=np.int64)
    rows, mmers, starts, ends = minimisers_batch(t, off, w, m)
    return [(numeric_to_kmer(int(k), m), seq[s:e])
            for k, s, e in zip(mmers, starts, ends)]


def test_sliding_min():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1000, size=137).astype(np.uint64)
    for w in (1, 2, 5, 16, 137):
        expect = np.array([a[i:i + w].min() for i in range(len(a) - w + 1)],
                          dtype=np.uint64)
        assert np.array_equal(sliding_min(a, w), expect)


def test_minimisers_blog_example():
    # kmer/src/minimiser.rs:183-288 — (w=31, m=7) over the 100-base blog
    # sequence
    got = run(SEQ100, 31, 7)
    expected = [
        ("ACGATAT", "ATGCGATATCGTAGGCGTCGATGGAGAGCTAGATCG"),
        ("ACGCCTA", "TATCGTAGGCGTCGATGGAGAGCTAGATCGATCGAT"),
        ("AGAGCTA", "AGGCGTCGATGGAGAGCTAGATCGATCGATCTAAATCC"),
        ("AAATCCC", "ATGGAGAGCTAGATCGATCGATCTAAATCCCGATCGATTCCGAGCGCGATCAAAG"),
        ("AATCCCG", "AATCCCGATCGATTCCGAGCGCGATCAAAGC"),
        ("AATCGAT", "ATCCCGATCGATTCCGAGCGCGATCAAAGCG"),
        ("AAAGCGC", "TCCCGATCGATTCCGAGCGCGATCAAAGCGCGATAGGCTAGCTAAAGCTAGCA"),
    ]
    assert got == expected


def test_minimisers_with_ambiguity():
    # kmer/src/minimiser.rs:290-305 — (w=8, m=5) with an N break
    got = run("ATGCGATATCGNTAGGCGTCGATGGA", 8, 5)
    expected = [
        ("ATCGC", "ATGCGATA"),
        ("ATATC", "TGCGATATCG"),
        ("ACGCC", "TAGGCGTCGA"),
        ("ATCGA", "GCGTCGATGGA"),
    ]
    assert got == expected


def test_whole_sequence_minimiser():
    # w=0 sentinel -> whole-row window
    # (/root/reference/misc/src/minimisers.rs:44-48)
    seq = SEQ100
    t = tokens_from_str(seq)
    off = np.array([0, len(t)], dtype=np.int64)
    rows, mmers, starts, ends = minimisers_batch(t, off, 0, 7)
    assert len(rows) == 1
    assert starts[0] == 0 and ends[0] == len(seq)
    # must equal the min over all canonical 7-mers
    from kmerray.core.encoding import canonical_flat_kmers
    canon, _ = canonical_flat_kmers(t, off, 7)
    assert mmers[0] == canon.min()


def test_no_window_no_emission():
    # shorter than w: the reference emits a u64::MAX artifact; we emit
    # nothing (documented divergence)
    got = run("ACGTACGT", 31, 7)
    assert got == []


def test_multi_row_independence():
    seqs = ["ATGCGATATCGNTAGGCGTCGATGGA", "ACGT", SEQ100]
    toks = [tokens_from_str(s) for s in seqs]
    values = np.concatenate(toks)
    offsets = np.concatenate([[0], np.cumsum([len(t) for t in toks])]
                             ).astype(np.int64)
    rows, mmers, starts, ends = minimisers_batch(values, offsets, 8, 5)
    per_row = {}
    for r, k, s, e in zip(rows, mmers, starts, ends):
        per_row.setdefault(int(r), []).append(
            (numeric_to_kmer(int(k), 5), seqs[r][s:e]))
    single0 = run(seqs[0], 8, 5)
    single2 = run(seqs[2], 8, 5)
    assert per_row[0] == single0
    assert per_row[2] == single2
    assert 1 not in per_row  # too short for any window
