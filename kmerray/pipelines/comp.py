"""`comp` pipelines — per-row composition features as Ray Data batch
transforms (the reference's flagship path,
/root/reference/composition/src/oligo.rs:88-229, re-expressed as
``read_parquet -> map_batches(pyarrow, zero-copy) -> write_parquet``).

All stages are stateless task transforms: the canonical index maps
(A1, /root/reference/kmer/src/kmer.rs:54-73) are memoized module
globals, rebuilt once per worker process, so no actor pool is needed.
Output row order is unspecified; identity is carried by ``doc_id``
(the reference's mmap row-offset ordering trick is unnecessary,
/root/reference/composition/src/oligo.rs:215-218).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..core.cgr import cgr_batch, oligo_cgr_points
from ..core.oligo import cfv_batch
from .arrow_util import list_column_to_numpy, matrix_to_fixed_list

# Long token rows make byte-heavy batches: 1k rows x ~200 tokens x 4B
# ~= 1 MB in, x8 for the float64 CFV out — sized so batch x concurrency
# stays far under worker heap at num_cpus=32.
DEFAULT_BATCH_SIZE = 1024


def read_sequences(sf_dir_or_path: str, columns: list[str] | None = None,
                   **kwargs) -> "ray.data.Dataset":
    """Read a sequences-table directory/file, pruning columns at the read."""
    import glob
    import os

    import pyarrow.parquet as _pq

    from ..sources.synth import ensure_sequences
    path = sf_dir_or_path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        # a dir whose shards carry a `tokens` column IS a sequences
        # table (e.g. `kmerray tokenize` output — Ray writes no
        # _SUCCESS marker); anything else (the driver's TPC-H sf
        # dirs) maps to our synthesized corpus for that scale.
        # (Round-2 fix: the old "_SUCCESS present?" trigger silently
        # replaced real user shard dirs with synthetic data.)
        if files and "tokens" in _pq.ParquetFile(files[0]).schema_arrow.names:
            path = files
        else:
            path = sorted(glob.glob(os.path.join(
                ensure_sequences(sf_dir_or_path), "*.parquet")))
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def _tokens(batch: pa.Table):
    return list_column_to_numpy(batch.column("tokens"))


def make_cfv_fn(k: int, canonical: bool = True, norm: bool = True,
                out_col: str = "cfv"):
    def add_cfv(batch: pa.Table) -> pa.Table:
        values, offsets = _tokens(batch)
        mat = cfv_batch(values, offsets, k, canonical=canonical, norm=norm)
        return batch.append_column(out_col, matrix_to_fixed_list(mat))
    return add_cfv


def cfv_pipeline(ds: "ray.data.Dataset", k: int = 4, canonical: bool = True,
                 norm: bool = True,
                 batch_size: int = DEFAULT_BATCH_SIZE) -> "ray.data.Dataset":
    """comp oligo: append a FixedSizeList<double>[kcount] ``cfv`` column;
    ``tokens`` passes through byte-identical (input_hint invariant)."""
    return ds.map_batches(make_cfv_fn(k, canonical, norm),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def make_cgr_fn(vecsize: float = 1.0, strict: bool = False):
    def add_cgr(batch: pa.Table) -> pa.Table:
        values, offsets = _tokens(batch)
        xs, ys, valid = cgr_batch(values, offsets, vecsize=vecsize,
                                  strict=strict)
        off32 = pa.array(offsets.astype(np.int32), pa.int32())
        points = pa.ListArray.from_arrays(
            off32, pa.StructArray.from_arrays(
                [pa.array(xs, pa.float64()), pa.array(ys, pa.float64())],
                names=["x", "y"]))
        batch = batch.append_column("cgr", points)
        return batch.append_column("cgr_valid", pa.array(valid))
    return add_cgr


def cgr_pipeline(ds: "ray.data.Dataset", vecsize: float = 1.0,
                 strict: bool = False,
                 batch_size: int = DEFAULT_BATCH_SIZE) -> "ray.data.Dataset":
    """comp cgr: per-base chaos-game walk as list<struct<x,y>>; rows with
    ambiguous tokens are flagged invalid (NaN points) instead of the
    reference's hard error when strict=False."""
    return ds.map_batches(make_cgr_fn(vecsize, strict),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def make_oligo_cgr_fn(k: int, vecsize: float, norm: bool = True):
    def add(batch: pa.Table) -> pa.Table:
        values, offsets = _tokens(batch)
        freqs = cfv_batch(values, offsets, k, canonical=True, norm=norm)
        xs, ys = oligo_cgr_points(k, float(vecsize))
        n = freqs.shape[0]
        kc = freqs.shape[1]
        entries = pa.FixedSizeListArray.from_arrays(
            pa.StructArray.from_arrays(
                [pa.array(np.tile(xs, n), pa.float64()),
                 pa.array(np.tile(ys, n), pa.float64()),
                 pa.array(freqs.ravel(), pa.float64())],
                names=["x", "y", "freq"]), kc)
        return batch.append_column("oligo_cgr", entries)
    return add


def oligo_cgr_pipeline(ds: "ray.data.Dataset", k: int = 4,
                       vecsize: float | None = None, norm: bool = True,
                       batch_size: int = DEFAULT_BATCH_SIZE
                       ) -> "ray.data.Dataset":
    """comp oligocgr: per canonical k-mer (x, y, freq) entries.  Default
    vecsize follows the CLI: k*k (/root/reference/kmertools/src/args.rs:266-269)."""
    if vecsize is None:
        vecsize = float(k * k)
    return ds.map_batches(make_oligo_cgr_fn(k, vecsize, norm),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def seq_stats(ds: "ray.data.Dataset") -> dict:
    """S4 pre-pass stats (/root/reference/ktio/src/seq.rs:69-95) — the
    reference needs a full extra pass to pre-size its mmap output; here
    it is one metadata-cheap aggregate, and no pipeline requires it."""
    import pyarrow.compute  # noqa: F401
    n = ds.count()
    total = ds.sum("n_tok") if n else 0
    return {"seq_count": n, "total_length": int(total)}
