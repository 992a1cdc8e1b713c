"""Training-data chunking / text-rewrite stages over the `documents`
table: fixed-token-window chunking (the standard LLM pretraining prep
step) and stopword/boilerplate scrubbing.  Both are stateless
zero-copy-Arrow ``map_batches`` stages — the window explosion and the
filtered-text rebuild are pure offset arithmetic over ONE
``split_pattern`` kernel call per batch, no per-row Python.

At 100 TB both stream: each batch expands locally (windows ~= 2-4x the
input rows at stride = W/2) and flows straight to the consumer; nothing
shuffles and nothing is materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .text import STOPWORDS


def _split_words(batch: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """One Arrow split kernel -> (flat value StringArray, int64 row
    offsets rebased to 0)."""
    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy().astype(np.int64)
    start = offs[0]
    # values may carry a prefix when the ListArray is a slice
    vals = words.values
    if start:
        vals = vals.slice(start)
    return vals, offs - start


def _join_windows(vals: pa.Array, woffs: np.ndarray) -> pa.Array:
    """list<string> from flat values + window offsets -> ' '-joined
    strings (int32 list offsets; guard the overflow instead of silently
    wrapping — callers chunk batches far below 2^31 flat tokens)."""
    if woffs[-1] > np.iinfo(np.int32).max:
        raise ValueError("window batch exceeds int32 list offsets; "
                         "lower batch_size")
    lst = pa.ListArray.from_arrays(pa.array(woffs, pa.int32()), vals)
    return pc.binary_join(lst, " ")


def chunk_windows_fn(batch: pa.Table, window: int,
                     stride: int) -> pa.Table:
    """Explode each doc's single-space words into windows of `window`
    tokens every `stride` tokens (trailing partial windows kept, same
    rule as ``generate_series(1, n, stride)``): one output row per
    window with its re-joined text.

    Vectorized end-to-end: window starts/lengths from the row offsets,
    flat token indices via the repeat/arange trick, one ``take`` + one
    ``binary_join``."""
    vals, offs = _split_words(batch)
    n = np.diff(offs)
    nwin = (n - 1) // stride + 1          # n >= 1 (split never empty)
    win_row = np.repeat(np.arange(len(n)), nwin)
    first = np.cumsum(nwin) - nwin
    wi = np.arange(int(nwin.sum()), dtype=np.int64) - first[win_row]
    start = wi * stride
    length = np.minimum(window, n[win_row] - start)
    woffs = np.zeros(len(length) + 1, dtype=np.int64)
    np.cumsum(length, out=woffs[1:])
    idx = (np.repeat(offs[:-1][win_row] + start, length)
           + np.arange(int(woffs[-1]), dtype=np.int64)
           - np.repeat(woffs[:-1], length))
    flat = vals.take(pa.array(idx))
    return pa.table({
        "doc_id": batch.column("doc_id").take(pa.array(win_row)),
        "win_id": pa.array(wi),
        "n_win_tokens": pa.array(length.astype(np.int64)),
        "win_text": _join_windows(flat, woffs),
    })


def chunk_windows_pipeline(ds: "ray.data.Dataset", window: int = 32,
                           stride: int = 16) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: chunk_windows_fn(b, window, stride),
        batch_format="pyarrow", zero_copy_batch=True)


def stop_filter_fn(batch: pa.Table,
                   stoplist: tuple[str, ...] = STOPWORDS) -> pa.Table:
    """Rewrite each doc with stoplist words removed (single-space
    rejoin; a doc that is ALL stopwords becomes '').  The flat keep
    mask + per-row kept counts rebuild the list column without any
    per-row work."""
    vals, offs = _split_words(batch)
    nrows = batch.num_rows
    rowid = np.repeat(np.arange(nrows), np.diff(offs))
    v = np.asarray(vals.to_pandas(), dtype=object)
    keep = ~np.isin(v, np.array(stoplist))
    kept_per_row = np.bincount(rowid[keep], minlength=nrows)
    woffs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(kept_per_row, out=woffs[1:])
    flat = vals.filter(pa.array(keep))
    n_removed = np.diff(offs) - kept_per_row
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "clean_text": _join_windows(flat, woffs),
        "n_removed": pa.array(n_removed.astype(np.int64)),
    })


def stop_filter_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(stop_filter_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def normalize_text_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """Text normalization for training corpora: mask digit runs with
    a sentinel token and count the masked runs.  One C-regex pass per
    column (pandas ``str.replace``/``str.count`` — character-class
    pattern, so Python re and DuckDB RE2 agree exactly); stateless
    map_batches, streams at read speed."""
    text = batch["text"]
    out = batch[["doc_id"]].copy()
    out["norm_text"] = text.str.replace(r"[0-9]+", "<NUM>", regex=True)
    out["n_masked"] = text.str.count(r"[0-9]+").astype("int64")
    return out


def normalize_text_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(normalize_text_fn, batch_format="pandas")
