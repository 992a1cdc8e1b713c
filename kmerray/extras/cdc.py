"""Content-defined chunking (CDC) over opaque binary payloads — the
storage/media-side dedup primitive (LBFS/Rabin, FastCDC): chunk
boundaries depend on local CONTENT, not offsets, so an insertion
shifts at most one chunk instead of re-cutting the whole blob, and
identical regions of different blobs hash to identical chunks.

Gear rolling hash (the FastCDC gear, XOR form)::

    h_t = ((h_{t-1} << 1) & 2^64-1) ^ GEAR[b_t]
        = XOR over j in 0..63 of GEAR[b_{t-j}] << j

a boundary falls AFTER byte t when ``h_t & MASK == 0`` (MASK = 0x3F
-> 64-byte average chunks on random bytes).  This is the pure
content-defined cut — production FastCDC adds min/max chunk bounds,
which shape the size distribution but not the dedup principle (the
bounds make the cut sequence sequentially dependent; the pure form
stays fully vectorizable).

Vectorization (the whole batch in one flat buffer, no per-byte
Python):

* the 64-term XOR expansion runs as 64 shifted-XOR passes over the
  concatenated payload bytes;
* cross-payload contamination (terms reaching across a doc start) is
  XOR-removed by a bounded fix-up — for shift j only the first j
  bytes of each doc need repair, so the fix-up touches docs x 63
  positions, vectorized per j;
* chunk content hashes are position-cycled rotations
  ``XOR_i rotl64(GEAR2[b_i], i mod 64)`` folded per chunk with ONE
  ``np.bitwise_xor.reduceat`` over the flat buffer.

The oracle (kmerray/oracle.py cdc_chunks_sql) embeds an INDEPENDENT
byte-at-a-time pure-Python fit of the same definition as SQL
literals, so the vectorized expansion is gated against the sequential
recurrence it claims to equal.

Scale shape: stateless ``map_batches`` — each payload chunks
independently, zero shuffles; the optional per-item digest is a
same-block fold (chunks of one payload never cross blocks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .sketch import splitmix64

CDC_MASK = np.uint64(0x3F)          # avg 64-byte chunks
_U64 = np.uint64
GEAR = splitmix64(np.arange(256, dtype=np.int64) + 101)
GEAR2 = splitmix64(np.arange(256, dtype=np.int64) + 707)


def _rotl64(v: np.ndarray, s: np.ndarray) -> np.ndarray:
    s = s.astype(np.uint64) & _U64(63)
    with np.errstate(over="ignore"):
        return (v << s) | (v >> ((_U64(64) - s) & _U64(63)))
    # note: s == 0 gives v >> 64 which numpy defines as 0 only via
    # the & 63 guard above (v >> 0 | v << 0 == v)


def _gear_hashes(flat: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """h_t for every byte of the concatenated payloads, with the
    per-payload recurrence reset (bounded fix-up, see module doc)."""
    n = len(flat)
    g = GEAR[flat]
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(64):
            if j >= n:
                break
            h[j:] ^= g[: n - j] << _U64(j)
        # rel position of every byte inside its payload
        lens = np.diff(np.append(starts, n))
        rel = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        for j in range(1, 64):
            if j >= n:
                break
            pos = np.flatnonzero(rel < j)
            pos = pos[pos >= j]
            if len(pos):
                h[pos] ^= g[pos - j] << _U64(j)
    return h


def cdc_chunk_fn(batch: pa.Table) -> pa.Table:
    items = batch.column("item_id").to_pylist()
    pay = batch.column("payload").to_pylist()
    if not pay:
        return pa.table({
            "item_id": pa.array([], pa.string()),
            "chunk_idx": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "chash": pa.array([], pa.int64())})
    lens = np.array([len(p) for p in pay], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    flat = np.frombuffer(b"".join(pay), dtype=np.uint8)
    n = len(flat)
    h = _gear_hashes(flat, starts)
    rel = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    doc_of = np.repeat(np.arange(len(pay), dtype=np.int64), lens)

    # cut AFTER byte t at mask hits; every payload also ends a chunk
    hit = (h & CDC_MASK) == 0
    is_end = np.zeros(n, dtype=bool)
    ends_idx = np.cumsum(lens) - 1
    is_end[ends_idx[lens > 0]] = True
    cut = hit | is_end
    cpos = np.flatnonzero(cut)                   # global end byte
    cdoc = doc_of[cpos]
    # chunk start = previous cut end + 1 within the same doc
    prev = np.concatenate(([-1], cpos[:-1]))
    prev_doc = np.concatenate(([-1], cdoc[:-1]))
    cstart = np.where(prev_doc == cdoc, prev + 1, starts[cdoc])
    clen = cpos - cstart + 1
    first = np.ones(len(cpos), dtype=bool)
    first[1:] = cdoc[1:] != cdoc[:-1]
    cidx = np.arange(len(cpos)) - np.maximum.accumulate(
        np.where(first, np.arange(len(cpos)), 0))

    # chunk content hashes: rotl-cycled gear2 XOR-folded per chunk
    with np.errstate(over="ignore"):
        rot = _rotl64(GEAR2[flat],
                      (np.arange(n, dtype=np.int64)
                       - np.repeat(cstart, clen)))
    chash = np.bitwise_xor.reduceat(rot, cstart) if len(cstart) else \
        np.zeros(0, dtype=np.uint64)

    return pa.table({
        "item_id": pa.array(np.asarray(items, dtype=object)[cdoc],
                            pa.string()),
        "chunk_idx": pa.array(cidx.astype(np.int64)),
        "start": pa.array((cstart - starts[cdoc]).astype(np.int64)),
        "length": pa.array(clen.astype(np.int64)),
        "chash": pa.array(chash.view(np.int64))})


def cdc_chunks(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-payload content-defined chunk table:
    ``(item_id, chunk_idx, start, length, chash)``."""
    return ds.map_batches(cdc_chunk_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def cdc_digest(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-item chunking digest — ``(item_id, n_chunks, xh, tot)``
    with ``xh`` the XOR of the item's chunk hashes (order-invariant,
    overflow-free) and ``tot`` the byte total.  Chunks of one payload
    never cross blocks, so this is a same-block fold."""
    chunks = cdc_chunks(ds)

    def fold(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "item_id": b.column("item_id").to_pylist(),
            "chash": b.column("chash").to_numpy(),
            "length": b.column("length").to_numpy()})
        g = df.groupby("item_id", sort=False)
        out = g.agg(n_chunks=("chash", "size"),
                    xh=("chash", lambda s: np.bitwise_xor.reduce(
                        s.to_numpy())),
                    tot=("length", "sum")).reset_index()
        return pa.table({
            "item_id": pa.array(out["item_id"].to_numpy(object),
                                pa.string()),
            "n_chunks": pa.array(out["n_chunks"].to_numpy(np.int64)),
            "xh": pa.array(out["xh"].to_numpy(np.int64)),
            "tot": pa.array(out["tot"].to_numpy(np.int64))})

    return chunks.map_batches(fold, batch_format="pyarrow",
                              zero_copy_batch=True)
