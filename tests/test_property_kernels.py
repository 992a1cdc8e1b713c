"""Property-based equivalence: the vectorized kernels vs literal
(pure-Python, test-only) transcriptions of the reference's iterator
semantics (/root/reference/kmer/src/kmer.rs:77-107,
kmer/src/minimiser.rs:62-176), over random token arrays including
ambiguity, short rows, and poly-A runs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from kmerray.core.encoding import UINT64_MAX, flat_kmers
from kmerray.core.minimiser import minimisers_batch


def naive_kmers(tokens, k):
    """Literal transcription of KmerGenerator::next."""
    mask = (1 << (2 * k)) - 1
    shift = 2 * (k - 1)
    f = r = length = 0
    out = []
    for code in tokens:
        if 0 <= code < 4:
            f = ((f << 2) | int(code)) & mask
            r = (r >> 2) | ((int(code) ^ 3) << shift)
            length += 1
        else:
            length = 0
        if length == k:
            length -= 1
            out.append((f, r))
    return out


def naive_minimisers(tokens, w, m):
    """Per-window-min + value-RLE + the reference's end-of-row drop
    quirk, computed naively from the m-mer array."""
    n = len(tokens)
    # aligned canonical m-mers (None = invalid)
    canon = [None] * max(0, n - m + 1)
    for i in range(len(canon)):
        win = tokens[i:i + m]
        if all(0 <= c < 4 for c in win):
            f = 0
            for c in win:
                f = (f << 2) | int(c)
            r = 0
            x = f
            for _ in range(m):
                r = (r << 2) | ((x & 3) ^ 3)
                x >>= 2
            canon[i] = min(f, r)
    W = w - m + 1
    nwin = n - w + 1
    wins = []
    for j in range(max(0, nwin)):
        ms = canon[j:j + W]
        wins.append(min(ms) if all(x is not None for x in ms) else None)
    # value-RLE over valid windows
    runs = []
    for j, v in enumerate(wins):
        if v is None:
            continue
        if runs and runs[-1][3] == j - 1 and runs[-1][0] == v:
            runs[-1][3] = j
        else:
            runs.append([v, j, j, j])  # value, j1, _, j2
    out = []
    last_win = nwin - 1
    for v, j1, _, j2 in runs:
        if j1 == j2 == last_win and j1 > 0 and wins[j1 - 1] is not None:
            continue  # reference drop quirk
        out.append((v, j1, j2 + w))
    return out


tokens_strategy = st.lists(
    st.integers(min_value=0, max_value=5), min_size=0, max_size=80)


@settings(max_examples=200, deadline=None)
@given(tokens=tokens_strategy, k=st.integers(2, 8))
def test_flat_kmers_equiv(tokens, k):
    t = np.asarray(tokens, dtype=np.int32)
    off = np.array([0, len(t)], dtype=np.int64)
    f, r, row = flat_kmers(t, off, k)
    got = list(zip(f.tolist(), r.tolist()))
    assert got == naive_kmers(tokens, k)


@settings(max_examples=200, deadline=None)
@given(tokens=tokens_strategy,
       m=st.integers(2, 6), extra=st.integers(1, 10))
def test_minimisers_equiv(tokens, m, extra):
    w = m + extra
    t = np.asarray(tokens, dtype=np.int32)
    off = np.array([0, len(t)], dtype=np.int64)
    rows, mm, ss, ee = minimisers_batch(t, off, w, m)
    got = list(zip(mm.tolist(), ss.tolist(), ee.tolist()))
    assert got == naive_minimisers(tokens, w, m)


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(tokens_strategy, min_size=1, max_size=8),
       k=st.integers(2, 6))
def test_multi_row_equals_per_row(rows, k):
    values = np.concatenate([np.asarray(r, np.int32) for r in rows]) \
        if any(rows) else np.empty(0, np.int32)
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    f, r_, row = flat_kmers(values, offsets, k)
    per_row = {}
    for i, rr in enumerate(rows):
        per_row[i] = naive_kmers(rr, k)
    got = {}
    for ff, rr2, ri in zip(f.tolist(), r_.tolist(), row.tolist()):
        got.setdefault(ri, []).append((ff, rr2))
    for i in range(len(rows)):
        assert got.get(i, []) == per_row[i]
