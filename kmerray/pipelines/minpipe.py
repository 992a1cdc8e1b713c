"""`min` pipelines — minimizer decomposition (s2m) and minimizer
binning / inverted index (m2s, G3).

s2m (/root/reference/misc/src/minimisers.rs:87-160) is a stateless
per-row map.  m2s (/root/reference/misc/src/minimisers.rs:11-85) is
the explode -> groupby(minimiser) inverted index; the shuffle key is
the canonical m-mer (Zipf-skewed: poly-A minimizers are hot — hot
groups still fit one task because entries are (doc_id, start, end)
triples, and Ray hash-partitions keys, not ranges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..core.minimiser import minimisers_batch
from .arrow_util import list_column_to_numpy


def make_s2m_fn(w: int, m: int):
    """Per row: ordered minimizer decomposition as
    ``minimisers: list<struct<mmer:uint64, start:int32, end:int32>>``."""
    def s2m(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch.column("tokens"))
        rows, mmers, starts, ends = minimisers_batch(values, offsets, w, m)
        nrows = len(offsets) - 1
        # emissions are already in row-major order
        counts = np.bincount(rows, minlength=nrows)
        out_off = np.zeros(nrows + 1, dtype=np.int32)
        np.cumsum(counts, out=out_off[1:])
        entries = pa.StructArray.from_arrays(
            [pa.array(mmers, pa.uint64()),
             pa.array(starts.astype(np.int32), pa.int32()),
             pa.array(ends.astype(np.int32), pa.int32())],
            names=["mmer", "start", "end"])
        lst = pa.ListArray.from_arrays(pa.array(out_off, pa.int32()), entries)
        return batch.append_column("minimisers", lst)
    return s2m


def s2m_pipeline(ds: "ray.data.Dataset", w: int, m: int,
                 batch_size: int = 1024) -> "ray.data.Dataset":
    return ds.map_batches(make_s2m_fn(w, m), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def make_explode_fn(w: int, m: int):
    """Per batch: exploded ``(mmer, doc_id, start, end)`` rows."""
    def explode(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch.column("tokens"))
        rows, mmers, starts, ends = minimisers_batch(values, offsets, w, m)
        doc_ids = batch.column("doc_id").take(pa.array(rows, pa.int64()))
        return pa.table({"mmer": pa.array(mmers, pa.uint64()),
                         "doc_id": doc_ids,
                         "start": pa.array(starts.astype(np.int32)),
                         "end": pa.array(ends.astype(np.int32))})
    return explode


def minimisers_exploded(ds: "ray.data.Dataset", w: int, m: int,
                        batch_size: int = 1024) -> "ray.data.Dataset":
    return ds.map_batches(make_explode_fn(w, m), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def m2s_pipeline(ds: "ray.data.Dataset", w: int, m: int,
                 batch_size: int = 1024,
                 n_buckets: int = 64) -> "ray.data.Dataset":
    """Inverted index ``(mmer, entries: list<struct<doc_id,start,end>>)``
    — entries sorted by (doc_id, start) for deterministic output (the
    reference's map-iteration order is nondeterministic; its own tests
    sort before comparing, /root/reference/ktio/src/fops.rs:15-25).

    Shuffle key = ``mmer % n_buckets`` (one Ray group per distinct
    minimizer would hit per-group overhead at 4^m/2 keys); each bucket
    builds its slice of the index with one vectorized pandas groupby."""
    import pandas as pd

    exploded = minimisers_exploded(ds, w, m, batch_size)

    def add_bucket(batch):
        import pyarrow as pa_
        b = (batch.column("mmer").to_numpy() % np.uint64(n_buckets))
        return batch.append_column("bucket", pa_.array(b.astype(np.int64)))
    bucketed = exploded.map_batches(add_bucket, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def collect(group: pd.DataFrame) -> pa.Table:
        # one sort + numpy run offsets + ListArray.from_arrays — no
        # per-minimizer Python list build (VERDICT r2 wrong #3; same
        # pattern as make_s2m_fn above)
        g = group.sort_values(["mmer", "doc_id", "start"])
        mmer = g["mmer"].to_numpy(np.uint64)
        brk = np.flatnonzero(mmer[1:] != mmer[:-1]) + 1
        offs = np.concatenate(([0], brk, [len(mmer)])).astype(np.int32)
        entries = pa.StructArray.from_arrays(
            [pa.array(g["doc_id"].to_numpy(), pa.string()),
             pa.array(g["start"].to_numpy(np.int32), pa.int32()),
             pa.array(g["end"].to_numpy(np.int32), pa.int32())],
            names=["doc_id", "start", "end"])
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), entries)
        return pa.table({"mmer": pa.array(mmer[offs[:-1]], pa.uint64()),
                         "entries": lst})
    return bucketed.groupby("bucket").map_groups(collect,
                                                 batch_format="pandas")
