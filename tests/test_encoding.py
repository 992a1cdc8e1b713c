"""Kernel unit tests translated 1:1 from the reference's inline Rust
tests (they transfer directly since tokens = SEQ_NT4 codes):
/root/reference/kmer/src/kmer.rs:113-176, kmer/src/lib.rs:56-71."""

import numpy as np
import pytest

from kmerray.core.encoding import (
    flat_kmers, kmer_pos_maps, kmer_to_numeric, numeric_to_kmer,
    rev_comp, tokens_from_str,
)


def one_row(tokens):
    t = np.asarray(tokens, dtype=np.int32)
    return t, np.array([0, len(t)], dtype=np.int64)


def kmer_pairs(seq, k):
    v, off = one_row(tokens_from_str(seq))
    f, r, row = flat_kmers(v, off, k)
    return list(zip(f.tolist(), r.tolist()))


def test_kmers_generated():
    # kmer/src/kmer.rs:113-129 — ACGT k=2
    assert kmer_pairs("ACGT", 2) == [(1, 11), (6, 6), (11, 1)]


def test_kmers_generated_ambiguous():
    # kmer/src/kmer.rs:131-145 — ACNGTT k=2, reset at N
    assert kmer_pairs("ACNGTT", 2) == [(1, 11), (11, 1), (15, 0)]


def test_rev_comp():
    # kmer/src/kmer.rs:147-153
    assert int(rev_comp(np.uint64(0b00011011), 4)) == 0b00011011
    assert int(rev_comp(np.uint64(0b001101101011), 6)) == 0b000101100011


def test_rev_comp_involution():
    rng = np.random.default_rng(7)
    for k in (1, 2, 5, 13, 31, 32):
        x = rng.integers(0, 4**min(k, 31), size=100, dtype=np.uint64)
        assert np.array_equal(rev_comp(rev_comp(x, k), k), x)


def test_pos_map():
    # kmer/src/kmer.rs:155-176
    pos_map, canon, kcount = kmer_pos_maps(4)
    assert kcount == 136
    assert len(canon) == 136
    assert (pos_map < 136).all()
    assert (pos_map > 0).sum() == 4**4 - (pos_map == 0).sum()
    assert pos_map[0] == 0          # AAAA -> 0
    assert pos_map[0b11111111] == 0  # TTTT -> 0
    assert pos_map[0b11] == 0b11     # AAAT -> 11


def test_numeric_acgt_roundtrip():
    # /root/reference/tests/test_utils.py equivalents
    assert numeric_to_kmer(111, 5) == "ACGTT"
    assert kmer_to_numeric("ACGTT")[0] == 111
    assert numeric_to_kmer(27, 5) == "AACGT"
    assert kmer_to_numeric("AACGT")[0] == 27
    f, r = kmer_to_numeric("ACGT")
    assert (f, r) == (0b00011011, 0b00011011)
    with pytest.raises(ValueError):
        kmer_to_numeric("ACGN")


def test_row_boundary_masking():
    # windows must never span rows: two rows ACG | T yields only ACG's
    # 2-mers plus nothing crossing the boundary
    v = np.array([0, 1, 2, 3], dtype=np.int32)
    off = np.array([0, 3, 4], dtype=np.int64)
    f, r, row = flat_kmers(v, off, 2)
    assert f.tolist() == [1, 6]
    assert row.tolist() == [0, 0]


def test_short_and_empty_rows():
    v = np.array([0, 1], dtype=np.int32)
    off = np.array([0, 0, 2, 2], dtype=np.int64)
    f, r, row = flat_kmers(v, off, 3)
    assert len(f) == 0
    f, r, row = flat_kmers(v, off, 2)
    assert row.tolist() == [1]


def test_k32_no_overflow():
    v = np.array([3] * 40, dtype=np.int32)
    off = np.array([0, 40], dtype=np.int64)
    f, r, row = flat_kmers(v, off, 32)
    assert len(f) == 9
    assert f[0] == np.uint64(0xFFFFFFFFFFFFFFFF)  # T*32
    assert r[0] == np.uint64(0)                    # A*32


def test_positions():
    v = tokens_from_str("ACNGTT")
    off = np.array([0, 6], dtype=np.int64)
    f, r, row, pos = flat_kmers(v, off, 2, return_pos=True)
    assert pos.tolist() == [0, 3, 4]
