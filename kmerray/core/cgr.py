"""Chaos-game-representation kernels.

Whole-sequence CGR reproduces ``CgrComputer::vectorise_one``
(/root/reference/composition/src/cgr.rs:127-144): marker starts at the
center and steps ``marker = (corner + marker) / 2`` per base, emitting
one (x, y) point per base.  Corner map per token code
(/root/reference/composition/src/cgr.rs:12-36): A=(0,0), C=(0,v),
G=(v,v), T=(v,0), center=(v/2, v/2).

The reference *errors* on an ambiguous base
(/root/reference/composition/src/cgr.rs:138-140) — unlike the k-mer
kernels which silently reset.  ``strict=True`` matches that;
``strict=False`` yields None rows instead (for pipelines).

Vectorized ACROSS rows: the recurrence is sequential per row, so we
iterate over base positions (max row length steps) updating all rows'
markers simultaneously — each step is the exact same fp operation
order as the reference, so points are bit-identical.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .encoding import kmer_pos_maps, numeric_to_kmer


def _corners(vecsize: float) -> tuple[np.ndarray, np.ndarray]:
    v = float(vecsize)
    # indexed by token code 0..3 = A,C,G,T
    cx = np.array([0.0, 0.0, v, v], dtype=np.float64)
    cy = np.array([0.0, v, v, 0.0], dtype=np.float64)
    return cx, cy


def cgr_batch(values, offsets, vecsize: float = 1.0, strict: bool = True):
    """Per-row CGR walks.

    Returns ``(xs, ys, valid)``: ``xs``/``ys`` are flat float64 arrays
    aligned with ``values`` (one point per base, rows concatenated);
    ``valid`` is a per-row bool array — False where the row contains an
    ambiguous token (points for such rows are NaN).  With
    ``strict=True`` raises ValueError instead, like the reference.
    """
    v = np.asarray(values)
    offsets = np.asarray(offsets, dtype=np.int64)
    nrows = len(offsets) - 1
    lengths = np.diff(offsets)
    bad_tok = (v >= 4) | (v < 0)
    if strict and bad_tok.any():
        raise ValueError("Bad nucleotide, unable to proceed")
    # per-row validity
    row_bad = np.zeros(nrows, dtype=np.int64)
    np.add.at(row_bad, np.repeat(np.arange(nrows), lengths), bad_tok)
    valid = row_bad == 0

    cx, cy = _corners(vecsize)
    center = float(vecsize) / 2.0

    # rows sorted by length DESC: at step i the rows still walking are
    # a prefix of the sorted order, so total work is O(total tokens)
    # and memory O(total tokens) — no (nrows x maxlen) padded grid
    # (one 5x-long row used to inflate the whole batch)
    v_clean = np.where(bad_tok, 0, v)
    xs = np.empty(len(v), dtype=np.float64)
    ys = np.empty(len(v), dtype=np.float64)
    order = np.argsort(-lengths, kind="stable")
    slen = lengths[order]
    starts = offsets[:-1][order]
    maxlen = int(slen[0]) if nrows else 0
    mx = np.full(nrows, center)
    my = np.full(nrows, center)
    for i in range(maxlen):
        # rows with slen >= i+1 (prefix; -slen is ascending)
        cnt = int(np.searchsorted(-slen, -(i + 1), side="right"))
        idx = starts[:cnt] + i
        tok = v_clean[idx]
        mx[:cnt] = (cx[tok] + mx[:cnt]) / 2.0
        my[:cnt] = (cy[tok] + my[:cnt]) / 2.0
        xs[idx] = mx[:cnt]
        ys[idx] = my[:cnt]
    if not valid.all():
        flat_invalid = np.repeat(~valid, lengths)
        xs[flat_invalid] = np.nan
        ys[flat_invalid] = np.nan
    return xs, ys, valid


@lru_cache(maxsize=None)
def oligo_cgr_points(k: int, vecsize: float) -> tuple[np.ndarray, np.ndarray]:
    """CGR endpoint of every canonical k-mer string, in canonical column
    order — sequence-independent, so computed once per worker
    (/root/reference/composition/src/oligocgr.rs:123-143 recomputes per
    sequence; we hoist it)."""
    _, canon_kmers, kcount = kmer_pos_maps(k)
    cx, cy = _corners(vecsize)
    center = float(vecsize) / 2.0
    xs = np.empty(kcount)
    ys = np.empty(kcount)
    for i, km in enumerate(canon_kmers):
        x = y = center
        for ch in numeric_to_kmer(int(km), k):
            code = "ACGT".index(ch)
            x = (cx[code] + x) / 2.0
            y = (cy[code] + y) / 2.0
        xs[i] = x
        ys[i] = y
    return xs, ys
