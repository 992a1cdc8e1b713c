"""Minimizer kernel: (w, m) sliding windows of canonical m-mers.

Reproduces ``MinimiserGenerator``
(/root/reference/kmer/src/minimiser.rs:36-176): per w-base window take
the minimum canonical m-mer; merge maximal runs of consecutive windows
sharing one minimizer *value* into a single emission
``(minimiser, span_start, span_end)`` where the span is the union of
the run's windows (exclusive end).  Ambiguous tokens close the window
(/root/reference/kmer/src/minimiser.rs:81-102).  ``w == 0`` means
whole-sequence minimizer (/root/reference/misc/src/minimisers.rs:44-48).

Vectorized: canonical m-mers for the whole batch in one pass, sliding
minimum via the van Herk / Gil-Werman block trick (O(n), no (n x W)
materialization), run-length encoding via np.diff — no Python loop
over rows or windows.

Documented divergences from the reference iterator's edge behavior:
  * when a row has a valid tail m-mer but no complete w-window, the
    reference emits a bogus ``(u64::MAX, 0, len)`` artifact
    (/root/reference/kmer/src/minimiser.rs:160-163 reached with an
    unfilled buffer); we emit nothing;
  * with ``w == 0`` and an ambiguous token in the row the reference
    likewise emits the MAX sentinel; we emit the min over the valid
    m-mers instead.
Its drop-final-run quirk (a minimizer change exactly at a row's last
window returns early, so that final single-window run is never
emitted) IS replicated, so clean-sequence outputs match exactly.
"""

from __future__ import annotations

import numpy as np

from .encoding import UINT64_MAX, rev_comp, row_ids

_EMPTY = (np.empty(0, np.int64), np.empty(0, np.uint64),
          np.empty(0, np.int64), np.empty(0, np.int64))


def sliding_min(a: np.ndarray, w: int) -> np.ndarray:
    """Minimum over every window of ``w`` consecutive elements (van Herk:
    per-block prefix/suffix cumulative minima, O(n))."""
    n = len(a)
    nw = n - w + 1
    if nw <= 0:
        return np.empty(0, dtype=a.dtype)
    if w == 1:
        return a.copy()
    pad = (-n) % w
    ap = np.concatenate([a, np.full(pad, UINT64_MAX, dtype=a.dtype)])
    blocks = ap.reshape(-1, w)
    pre = np.minimum.accumulate(blocks, axis=1).ravel()
    suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suf[:nw], pre[w - 1:w - 1 + nw])


def _aligned_canonical(values, offsets, m: int):
    """Canonical m-mer per flat start position (UINT64_MAX where the
    window is invalid), plus the validity mask."""
    v = np.asarray(values)
    n = len(v)
    nwin = n - m + 1
    if nwin <= 0:
        return np.empty(0, np.uint64), np.empty(0, bool)
    bad = (v >= 4) | (v < 0)
    vv = np.where(bad, 0, v).astype(np.uint64)
    f = np.zeros(nwin, dtype=np.uint64)
    for j in range(m):
        f = (f << np.uint64(2)) | vv[j:j + nwin]
    if m <= 10:
        from .encoding import canonical_value_map
        canon = canonical_value_map(m)[f]
    else:
        canon = np.minimum(f, rev_comp(f, m))
    c = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(bad, out=c[1:])
    valid = (c[m:] - c[:-m]) == 0
    rid = row_ids(np.asarray(offsets, dtype=np.int64))
    valid &= rid[:nwin] == rid[m - 1:]
    canon = np.where(valid, canon, UINT64_MAX)
    return canon, valid


def minimisers_batch(values, offsets, w: int, m: int):
    """Minimizer emissions for a batch of token rows.

    Returns ``(row, mmer, start, end)`` — row index, canonical
    minimizer, and the [start, end) span within the row covered by the
    run of windows sharing that minimizer, in row-major order.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    if w == 0:
        return _whole_row_minimisers(values, offsets, m)
    if not (0 < m < w):
        raise ValueError(f"need 0 < m < w, got m={m} w={w}")

    v = np.asarray(values)
    n = len(v)
    W = w - m + 1                     # m-mer positions per w-window
    nwin = n - w + 1                  # flat w-window count
    if nwin <= 0:
        return _EMPTY

    canon, mvalid = _aligned_canonical(values, offsets, m)
    winmin = sliding_min(canon, W)

    # w-window j valid iff all W m-mers j..j+W-1 valid and window within
    # one row
    c = np.zeros(len(mvalid) + 1, dtype=np.int64)
    np.cumsum(~mvalid, out=c[1:])
    wvalid = (c[W:] - c[:-W]) == 0
    rid = row_ids(offsets)
    wvalid &= rid[:nwin] == rid[w - 1:]

    idx = np.flatnonzero(wvalid)
    if len(idx) == 0:
        return _EMPTY
    vals = winmin[idx]
    rows = rid[idx]
    brk = (np.diff(idx) != 1) | (np.diff(vals.view(np.int64)) != 0) \
        | (np.diff(rows) != 0)
    starts_i = np.concatenate([[0], np.flatnonzero(brk) + 1])
    ends_i = np.concatenate([np.flatnonzero(brk), [len(idx) - 1]])
    j1 = idx[starts_i]
    j2 = idx[ends_i]
    run_rows = rows[starts_i]
    run_vals = vals[starts_i]

    # reference quirk: a run consisting solely of a row's LAST window,
    # entered via a minimizer change there, is never emitted
    # (/root/reference/kmer/src/minimiser.rs:124-155 return before the
    # end-of-sequence emission at :160-163)
    last_win = offsets[run_rows + 1] - w
    single = j1 == j2
    prev_valid = np.zeros(len(j1), dtype=bool)
    has_prev = j1 > 0
    prev_valid[has_prev] = wvalid[j1[has_prev] - 1] & \
        (rid[j1[has_prev] - 1] == run_rows[has_prev])
    drop = single & (j2 == last_win) & prev_valid
    keep = ~drop

    row_off = offsets[run_rows]
    return (run_rows[keep], run_vals[keep],
            (j1 - row_off)[keep], (j2 + w - row_off)[keep])


def _whole_row_minimisers(values, offsets, m: int):
    """w=0: one minimizer per row = min over the row's valid canonical
    m-mers; span is the whole row.  Rows with no valid m-mer emit
    nothing."""
    nrows = len(offsets) - 1
    canon, valid = _aligned_canonical(values, offsets, m)
    if len(canon) == 0:
        return _EMPTY
    rid = row_ids(offsets)[:len(canon)]
    mins = np.full(nrows, UINT64_MAX, dtype=np.uint64)
    np.minimum.at(mins, rid[valid], canon[valid])
    rows = np.flatnonzero(mins != UINT64_MAX).astype(np.int64)
    lengths = np.diff(offsets)
    return (rows, mins[rows], np.zeros(len(rows), dtype=np.int64),
            lengths[rows].astype(np.int64))
