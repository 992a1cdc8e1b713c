"""Vectorized k-mer encoding kernels over token arrays (pure NumPy, no Ray).

Semantics reproduce the reference's rolling 2-bit encoder exactly
(/root/reference/kmer/src/kmer.rs:77-107): tokens 0..3 are bases
(0=A, 1=C, 2=G, 3=T, the SEQ_NT4_TABLE code space,
/root/reference/kmer/src/kmer.rs:6-15); any token >= 4 (or < 0) is an
ambiguity sentinel that resets the rolling window so no k-mer spanning
it is emitted (/root/reference/kmer/src/kmer.rs:96-99).

Unlike the reference's per-record pull iterator, every kernel here is
batch-vectorized over the *flattened* token buffer of an Arrow
``list<int32>`` column: windows that cross row boundaries are masked
out, so one NumPy pass covers a whole batch of rows.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

UINT64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)
_M32 = np.uint64(0x00000000FFFFFFFF)

_BASES = "ACGT"
_BASE_TO_CODE = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3,
                 "a": 0, "c": 1, "g": 2, "t": 3, "u": 3}


def rev_comp(kmers, k: int):
    """Vectorized reverse complement of packed 2-bit k-mers.

    Matches ``KmerGenerator::rev_comp`` (/root/reference/kmer/src/kmer.rs:43-52)
    for arbitrary packed values: complement every 2-bit group, then
    reverse the order of the k groups.  Implemented as an O(log 64)
    bit-swap network instead of the reference's per-base loop.
    """
    x = np.asarray(kmers, dtype=np.uint64)
    x = ~x  # complement each 2-bit group (code ^ 3 per group)
    # reverse all 32 2-bit groups of the 64-bit word
    x = ((x & _M2) << np.uint64(2)) | ((x >> np.uint64(2)) & _M2)
    x = ((x & _M4) << np.uint64(4)) | ((x >> np.uint64(4)) & _M4)
    x = ((x & _M8) << np.uint64(8)) | ((x >> np.uint64(8)) & _M8)
    x = ((x & _M16) << np.uint64(16)) | ((x >> np.uint64(16)) & _M16)
    x = ((x & _M32) << np.uint64(32)) | ((x >> np.uint64(32)) & _M32)
    # keep only the top 2k reversed bits == the original low 2k bits
    return x >> np.uint64(64 - 2 * k)


@lru_cache(maxsize=None)
def kmer_pos_maps(k: int):
    """Canonical index maps for all 4^k k-mers.

    Returns ``(pos_map, canon_kmers, kcount)`` mirroring
    ``KmerGenerator::kmer_pos_maps`` (/root/reference/kmer/src/kmer.rs:54-73):
    ``pos_map`` is a ``uint32`` array of length 4^k mapping any packed
    k-mer to the column index of its canonical (min of fwd/revcomp)
    form in sorted canonical order; ``canon_kmers`` is the sorted
    ``uint64`` array of distinct canonical k-mers; ``kcount`` its length
    (k=4 -> 136).  Memoized: built once per worker process.
    """
    if not (1 <= k <= 13):
        raise ValueError(f"pos maps only supported for 1<=k<=13, got {k}")
    all_kmers = np.arange(4**k, dtype=np.uint64)
    canon = np.minimum(all_kmers, rev_comp(all_kmers, k))
    canon_kmers = np.unique(canon)
    pos_map = np.searchsorted(canon_kmers, canon).astype(np.uint32)
    return pos_map, canon_kmers, len(canon_kmers)


def numeric_to_kmer(kmer: int, k: int) -> str:
    """Render packed k-mer as ACGT (/root/reference/kmer/src/lib.rs:19-34)."""
    out = []
    v = int(kmer)
    for _ in range(k):
        out.append(_BASES[v & 3])
        v >>= 2
    return "".join(reversed(out))


def kmer_to_numeric(s: str) -> tuple[int, int]:
    """Parse ACGT string to (fwd, revcomp) pair
    (/root/reference/kmer/src/lib.rs:36-50). Raises on ambiguous chars."""
    f = 0
    for ch in s:
        if ch not in _BASE_TO_CODE:
            raise ValueError(f"ambiguous base {ch!r}")
        f = (f << 2) | _BASE_TO_CODE[ch]
    r = int(rev_comp(np.uint64(f), len(s)))
    return f, r


def tokens_from_str(s: str) -> np.ndarray:
    """ASCII sequence -> int32 token codes (4 for ambiguous), for tests."""
    return np.array([_BASE_TO_CODE.get(c, 4) for c in s], dtype=np.int32)


def row_ids(offsets: np.ndarray) -> np.ndarray:
    """Row id for each flat token position given list offsets."""
    lengths = np.diff(offsets)
    return np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)


def _pack_windows(vv: np.ndarray, k: int, nwin: int) -> np.ndarray:
    """2-bit pack of every length-k window of ``vv`` (unsigned codes)
    via binary-doubling combines: ``g_{2m}[i] = g_m[i]<<2m | g_m[i+m]``
    then one shift-or per set bit of k — O(log k) array passes instead
    of the k-pass rolling shift-or (measured on a 6.4M-token batch,
    quiet samples: k=4 350->150 ms, k=8 450->160 ms, k=15
    680->190 ms; the smaller working set is also visibly less
    sensitive to neighbor memory pressure)."""
    n = len(vv)
    dt = vv.dtype.type
    g = {1: vv}
    m = 1
    while m * 2 <= k:
        a = g[m]
        ln = n - 2 * m + 1
        g[2 * m] = (a[:ln] << dt(2 * m)) | a[m:m + ln]
        m *= 2
    f = None
    a = 0
    for b in sorted(g, reverse=True):
        if k & b:
            if f is None:
                f, a = g[b], b
            else:
                ln = n - a - b + 1
                f = (f[:ln] << dt(2 * b)) | g[b][a:a + ln]
                a += b
    return f[:nwin]


def flat_kmers(values: np.ndarray, offsets: np.ndarray, k: int,
               return_pos: bool = False, with_rc: bool = True):
    """All valid k-mers of every row in one vectorized pass.

    ``values`` is the flattened token buffer of a list column,
    ``offsets`` the int64 row offsets (len nrows+1).  Returns
    ``(fwd, rc, row)`` uint64/uint64/int64 arrays — one entry per valid
    k-mer window, in row-major left-to-right order, exactly the windows
    the reference's iterator emits (ambiguity resets, max k enforced by
    caller).  With ``return_pos=True`` also returns the 0-based start
    position of each window within its row.  ``with_rc=False`` skips
    the reverse-complement pass (the second array is then an alias of
    ``fwd`` and must be ignored) — for callers that canonicalize via
    the pos_map table instead.

    The encode runs in uint32 when the packed k-mer fits (k <= 16) —
    half the memory traffic of the former always-uint64 loop — and
    widens to uint64 only on the (already window-filtered) output.
    """
    if not (1 <= k <= 32):
        raise ValueError(f"k must be in 1..32, got {k}")
    v = np.asarray(values)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(v)
    nwin = n - k + 1
    empty = (np.empty(0, np.uint64), np.empty(0, np.uint64),
             np.empty(0, np.int64))
    if nwin <= 0:
        return empty + (np.empty(0, np.int64),) if return_pos else empty

    bad = (v >= 4) | (v < 0)
    # ambiguous positions keep garbage low bits (&3): every window
    # containing one is masked invalid below, so the value never leaks
    dt = np.uint32 if k <= 16 else np.uint64
    vv = v.astype(dt) & dt(3)
    fw = _pack_windows(vv, k, nwin)

    # window invalid if it contains an ambiguous token; int32 prefix
    # sums overflow silently past 2^31 tokens in one flat buffer, so
    # widen for pathological batches (block splitting keeps real
    # batches far below this)
    cdt = np.int32 if n < 2**31 - 1 else np.int64
    c = np.zeros(n + 1, dtype=cdt)
    np.cumsum(bad, out=c[1:])
    valid = (c[k:] - c[:-k]) == 0
    # ... or crosses a row boundary
    rid = row_ids(offsets)
    valid &= rid[:nwin] == rid[k - 1:]

    f = fw[valid].astype(np.uint64)
    rc = rev_comp(f, k) if with_rc else f
    row = rid[:nwin][valid]
    if return_pos:
        pos = np.arange(nwin, dtype=np.int64)[valid] - offsets[row]
        return f, rc, row, pos
    return f, rc, row


@lru_cache(maxsize=None)
def canonical_value_map(k: int) -> np.ndarray:
    """uint64 table of length 4^k: kmer -> min(kmer, revcomp(kmer)).
    Memoized per worker; makes canonicalization a single gather for
    small k (<= 12: table <= 128 MB would be too fat above that)."""
    all_kmers = np.arange(4**k, dtype=np.uint64)
    return np.minimum(all_kmers, rev_comp(all_kmers, k))


def canonical_flat_kmers(values, offsets, k: int):
    """(canonical kmers, row ids) for a batch — min(fwd, revcomp) identity
    as in /root/reference/composition/src/oligo.rs:244.  For k <= 10 the
    rev-comp+min collapses to one table gather (canonical_value_map)."""
    if k <= 10:
        f, _, row = flat_kmers(values, offsets, k, with_rc=False)
        return canonical_value_map(k)[f], row
    f, rc, row = flat_kmers(values, offsets, k)
    return np.minimum(f, rc), row
