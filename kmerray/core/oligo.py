"""Oligonucleotide composition feature vector (CFV) kernel.

Reproduces ``OligoComputer::vectorise_one``
(/root/reference/composition/src/oligo.rs:231-259): count canonical
(or raw forward) k-mers of each row into a dense vector of length
``kcount`` (canonical) or ``4^k`` (raw), optionally L1-normalized by
``max(1, total)`` so an all-ambiguous row yields a zero vector, not
NaN (/root/reference/composition/src/oligo.rs:256).

Vectorized over a whole batch: one ``np.bincount`` builds the
(nrows x width) count matrix for every row at once.
"""

from __future__ import annotations

import numpy as np

from .encoding import flat_kmers, kmer_pos_maps, numeric_to_kmer


def cfv_header(k: int, canonical: bool = True) -> list[str]:
    """Column names in ACGT, canonical (sorted canonical numeric order)
    or raw order (/root/reference/composition/src/oligo.rs:69-83)."""
    if canonical:
        _, canon_kmers, _ = kmer_pos_maps(k)
        return [numeric_to_kmer(int(km), k) for km in canon_kmers]
    return [numeric_to_kmer(i, k) for i in range(4**k)]


def cfv_width(k: int, canonical: bool = True) -> int:
    if canonical:
        return kmer_pos_maps(k)[2]
    return 4**k


def cfv_batch(values, offsets, k: int, canonical: bool = True,
              norm: bool = True) -> np.ndarray:
    """(nrows x width) float64 CFV matrix for a batch of token rows.

    Canonical mode indexes ``pos_map`` with the *forward* k-mer
    directly — the table already maps any k-mer to its canonical
    column (kmer_pos_maps canonicalizes at build time), so the runtime
    rev-comp + min of the reference's inner loop
    (/root/reference/composition/src/oligo.rs:242-246) disappears
    entirely (~40% kernel time)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    nrows = len(offsets) - 1
    f, rc, row = flat_kmers(values, offsets, k, with_rc=False)
    if canonical:
        pos_map, _, width = kmer_pos_maps(k)
        cols = pos_map[f].astype(np.int64)
    else:
        width = 4**k
        cols = f.astype(np.int64)
    counts = np.bincount(row * width + cols,
                         minlength=nrows * width).astype(np.float64)
    mat = counts.reshape(nrows, width)
    if norm:
        totals = np.maximum(1.0, mat.sum(axis=1, keepdims=True))
        mat /= totals
    return mat
