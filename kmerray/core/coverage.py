"""Coverage-histogram kernel.

Reproduces ``CovComputer::vectorise_one``
(/root/reference/coverage/src/lib.rs:165-184): for each row, look up
the *global* count of every canonical k-mer (missing -> 0,
/root/reference/coverage/src/lib.rs:171), bin it as
``min(floor(count / bin_size), bin_count - 1)``, histogram the bins,
optionally L1-normalize by ``max(1, total)``.

The global dictionary is passed as parallel sorted arrays
``(sorted_kmers, counts)`` — the broadcast-friendly form held in
actor-pool state; lookup is a vectorized ``np.searchsorted``.
"""

from __future__ import annotations

import numpy as np

from .encoding import canonical_flat_kmers


def lookup_counts(canon: np.ndarray, sorted_kmers: np.ndarray,
                  counts: np.ndarray) -> np.ndarray:
    """Vectorized dictionary lookup with missing -> 0 semantics.

    For large dictionaries the queries are pre-sorted so consecutive
    binary searches touch neighboring cache lines (~1.6x measured at
    6M keys / 4M queries), then scattered back."""
    if len(sorted_kmers) == 0 or len(canon) == 0:
        return np.zeros(len(canon), dtype=np.int64)
    if len(sorted_kmers) > 100_000 and len(canon) > 100_000:
        order = np.argsort(canon, kind="stable")
        idx_sorted = np.searchsorted(sorted_kmers, canon[order])
        idx = np.empty_like(idx_sorted)
        idx[order] = idx_sorted
    else:
        idx = np.searchsorted(sorted_kmers, canon)
    idx = np.minimum(idx, len(sorted_kmers) - 1)
    found = sorted_kmers[idx] == canon
    return np.where(found, counts[idx], 0).astype(np.int64)


def coverage_batch(values, offsets, k: int, sorted_kmers, counts,
                   bin_size: int, bin_count: int,
                   norm: bool = True) -> np.ndarray:
    """(nrows x bin_count) float64 coverage-histogram matrix."""
    offsets = np.asarray(offsets, dtype=np.int64)
    nrows = len(offsets) - 1
    canon, row = canonical_flat_kmers(values, offsets, k)
    cnt = lookup_counts(canon, np.asarray(sorted_kmers),
                        np.asarray(counts))
    bins = np.minimum(cnt // bin_size, bin_count - 1)
    mat = np.bincount(row * bin_count + bins,
                      minlength=nrows * bin_count).astype(np.float64)
    mat = mat.reshape(nrows, bin_count)
    if norm:
        mat /= np.maximum(1.0, mat.sum(axis=1, keepdims=True))
    return mat
