"""`cov` — coverage-histogram pipeline (count table + broadcast lookup).

Two composed stages, mirroring
/root/reference/coverage/src/lib.rs:69-163:

1. build the global canonical k-mer count table (reuses `ctr`'s
   two-phase aggregate, G4);
2. score every row against it (J1 broadcast hash join with
   missing -> 0) — a stateful actor pool: each ``CovScorer`` actor
   loads the dictionary ONCE in ``__init__`` (from a Parquet path or a
   ``ray.put`` object ref), then answers vectorized ``searchsorted``
   lookups per batch.  The dictionary is never re-shipped per batch;
   at cluster scale each node holds one copy per actor.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..core.coverage import coverage_batch
from .arrow_util import list_column_to_numpy, matrix_to_fixed_list
from .counter import count_kmers


def load_count_table(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a counts Parquet dir/file into sorted parallel arrays."""
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True)) if os.path.isdir(path) else [path]
    tables = [pq.read_table(f, columns=["kmer", "cnt"]) for f in files]
    t = pa.concat_tables(tables)
    kmers = t.column("kmer").to_numpy().astype(np.uint64)
    cnts = t.column("cnt").to_numpy().astype(np.int64)
    order = np.argsort(kmers)
    return kmers[order], cnts[order]


class CovScorer:
    """Actor-pool stage: dictionary loaded once per actor (A3)."""

    def __init__(self, counts_source, k: int, bin_size: int, bin_count: int,
                 norm: bool = True, out_col: str = "coverage"):
        if isinstance(counts_source, ray.ObjectRef):
            self.kmers, self.cnts = ray.get(counts_source)
        elif isinstance(counts_source, str):
            self.kmers, self.cnts = load_count_table(counts_source)
        else:  # pre-built (kmers, counts) pair, e.g. in unit tests
            self.kmers, self.cnts = counts_source
        self.k = k
        self.bin_size = bin_size
        self.bin_count = bin_count
        self.norm = norm
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch.column("tokens"))
        mat = coverage_batch(values, offsets, self.k, self.kmers, self.cnts,
                             self.bin_size, self.bin_count, norm=self.norm)
        return batch.append_column(self.out_col, matrix_to_fixed_list(mat))


def coverage_pipeline(seq_ds: "ray.data.Dataset", counts_source,
                      k: int, bin_size: int, bin_count: int,
                      norm: bool = True, concurrency: int | tuple = 4,
                      batch_size: int = 1024,
                      num_cpus: float = 0.5) -> "ray.data.Dataset":
    """Append a FixedSizeList<double>[bin_count] ``coverage`` column.

    Scorer actors reserve fractional CPUs: a pool that books every
    whole CPU slot starves the upstream read and deadlocks the
    streaming executor on small clusters (observed on num_cpus=4)."""
    return seq_ds.map_batches(
        CovScorer, fn_constructor_args=(counts_source, k, bin_size,
                                        bin_count, norm),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=num_cpus)


def cov_end_to_end(seq_ds: "ray.data.Dataset", k: int, bin_size: int,
                   bin_count: int, counts_dir: str, norm: bool = True,
                   alt_ds: "ray.data.Dataset | None" = None,
                   concurrency: int | tuple = 4) -> "ray.data.Dataset":
    """build_table + compute_coverages in one run: counts built from
    ``alt_ds`` if given, else from the input itself
    (/root/reference/kmertools/src/args.rs:311-313)."""
    dict_input = alt_ds if alt_ds is not None else seq_ds
    count_kmers(dict_input, k).write_parquet(counts_dir)
    return coverage_pipeline(seq_ds, counts_dir, k, bin_size, bin_count,
                             norm=norm, concurrency=concurrency)
