"""Python-native API mirroring the reference's ``pykmertools`` surface
(/root/reference/pip/src/lib.rs:31-39, pybindings/src/*.rs): batch
functions over token arrays / sequences, no Ray required.  Accepts
either token arrays (int codes) or ACGT strings everywhere.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np

from .core.cgr import cgr_batch, oligo_cgr_points
from .core.encoding import (flat_kmers, kmer_to_numeric, numeric_to_kmer,
                            tokens_from_str)
from .core.minimiser import minimisers_batch
from .core.oligo import cfv_batch, cfv_header


def _tok(seq) -> np.ndarray:
    if isinstance(seq, str):
        return tokens_from_str(seq)
    if isinstance(seq, (bytes, bytearray)):
        return tokens_from_str(seq.decode())
    return np.asarray(seq, dtype=np.int32)


def _pack(seqs: Iterable) -> tuple[np.ndarray, np.ndarray]:
    toks = [_tok(s) for s in seqs]
    values = np.concatenate(toks) if toks else np.empty(0, np.int32)
    offsets = np.zeros(len(toks) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in toks], out=offsets[1:])
    return values, offsets


class OligoComputer:
    """pykmertools.OligoComputer
    (/root/reference/pybindings/src/oligo.rs:16-100).  Note: we follow
    the CLI's raw-mode normalization denominator (+1 per k-mer), not
    the binding's divergent +2
    (/root/reference/composition/src/oligo.rs:250-251 vs
    pybindings/src/oligo.rs:61 — SURVEY §2.7.1)."""

    def __init__(self, ksize: int, canonical: bool = True,
                 norm: bool = True):
        self.ksize = ksize
        self.canonical = canonical
        self.norm = norm

    def vectorise_one(self, seq) -> np.ndarray:
        return self.vectorise_batch([seq])[0]

    def vectorise_batch(self, seqs: Iterable) -> np.ndarray:
        values, offsets = _pack(seqs)
        return cfv_batch(values, offsets, self.ksize,
                         canonical=self.canonical, norm=self.norm)

    def get_header(self) -> list[str]:
        return cfv_header(self.ksize, canonical=self.canonical)


class CgrComputer:
    """pykmertools.CgrComputer (/root/reference/pybindings/src/cgr.rs:16-63)."""

    def __init__(self, vecsize: float = 1.0):
        self.vecsize = float(vecsize)

    def vectorise_one(self, seq) -> list[tuple[float, float]]:
        return self.vectorise_batch([seq])[0]

    def vectorise_batch(self, seqs: Iterable) -> list[list[tuple]]:
        values, offsets = _pack(seqs)
        xs, ys, valid = cgr_batch(values, offsets, vecsize=self.vecsize,
                                  strict=True)
        out = []
        for i in range(len(offsets) - 1):
            s, e = offsets[i], offsets[i + 1]
            out.append(list(zip(xs[s:e].tolist(), ys[s:e].tolist())))
        return out


class OligoCgrComputer:
    """pykmertools-style oligo-CGR
    (/root/reference/composition/src/oligocgr.rs:123-163)."""

    def __init__(self, ksize: int, vecsize: float, norm: bool = True):
        self.ksize = ksize
        self.vecsize = float(vecsize)
        self.norm = norm

    def vectorise_one(self, seq) -> list[tuple[tuple[float, float], float]]:
        values, offsets = _pack([seq])
        freqs = cfv_batch(values, offsets, self.ksize, canonical=True,
                          norm=self.norm)[0]
        xs, ys = oligo_cgr_points(self.ksize, self.vecsize)
        return [((float(x), float(y)), float(f))
                for x, y, f in zip(xs, ys, freqs)]


class KmerGenerator:
    """Iterator of (fwd, rc) pairs
    (/root/reference/pybindings/src/kmer.rs:15-42) — vectorized up
    front, iterated lazily."""

    def __init__(self, seq, ksize: int):
        t = _tok(seq)
        off = np.array([0, len(t)], dtype=np.int64)
        self._f, self._r, _ = flat_kmers(t, off, ksize)

    def __iter__(self) -> Iterator[tuple[int, int]]:
        return iter(zip(self._f.tolist(), self._r.tolist()))


class MinimiserGenerator:
    """Iterator of (minimiser, start, end)
    (/root/reference/pybindings/src/min.rs:15-48)."""

    def __init__(self, seq, wsize: int, msize: int):
        t = _tok(seq)
        off = np.array([0, len(t)], dtype=np.int64)
        _, self._m, self._s, self._e = minimisers_batch(t, off, wsize, msize)

    def __iter__(self) -> Iterator[tuple[int, int, int]]:
        return iter(zip(self._m.tolist(), self._s.tolist(),
                        self._e.tolist()))


def to_acgt(kmer: int, ksize: int) -> str:
    """pykmertools.utils.to_acgt (/root/reference/pybindings/src/kmer.rs:48-56)."""
    return numeric_to_kmer(kmer, ksize)


def to_numeric(kmer: str) -> tuple[int, int]:
    """pykmertools.utils.to_numeric (/root/reference/pybindings/src/kmer.rs:58-65)."""
    return kmer_to_numeric(kmer)


class KmerMinimiserGenerator:
    """Iterator of (minimiser, start, end, canonical w-mers of the
    run's windows) — the reference's vestigial M11
    (/root/reference/kmer/src/kmer_minimisers.rs:42-206; the author
    marks it 'TODO I cannot remember why I made this').  Provided for
    surface completeness: per minimizer run, the canonical w-length
    k-mers of each window in the span."""

    def __init__(self, seq, wsize: int, msize: int):
        t = _tok(seq)
        off = np.array([0, len(t)], dtype=np.int64)
        _, self._m, self._s, self._e = minimisers_batch(t, off, wsize, msize)
        f, r, _, pos = flat_kmers(t, off, wsize, return_pos=True)
        self._wmers = dict(zip(pos.tolist(),
                               np.minimum(f, r).tolist()))
        self._w = wsize

    def __iter__(self):
        for m, s, e in zip(self._m.tolist(), self._s.tolist(),
                           self._e.tolist()):
            kmers = [self._wmers[p] for p in range(s, e - self._w + 1)
                     if p in self._wmers]
            yield m, s, e, kmers


def run_cli(argv=None) -> int:
    """pykmertools.run_cli parity shim
    (/root/reference/pip/src/lib.rs:12-18): run the kmerray CLI from
    Python.  The reference reads ``sys.argv[1:]`` (skip(1)); we accept
    an explicit argv list too, matching the binding's
    invoke-the-CLI-in-process semantics."""
    import sys as _sys

    from .__main__ import main as _main
    return _main(_sys.argv[1:] if argv is None else list(argv))
