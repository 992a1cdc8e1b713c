"""Zero-copy helpers between Arrow list columns and the NumPy kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_numpy(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat values, rebased int64 offsets) of a (chunked) list column.

    Handles sliced arrays: offsets are rebased to 0 and values trimmed
    to the slice, so kernels can treat the batch as one flat buffer.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    values = values[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    return values, offsets


def matrix_to_fixed_list(mat: np.ndarray) -> pa.FixedSizeListArray:
    """(nrows x width) float64 -> Arrow FixedSizeList<double>[width]."""
    flat = pa.array(np.ascontiguousarray(mat).ravel(), pa.float64())
    return pa.FixedSizeListArray.from_arrays(flat, mat.shape[1])


def explode_nonzero_fixedlist(col: str):
    """Batch fn: FixedSizeList column -> exploded nonzero
    ``(doc_id, bin, val)`` rows (shared by cov/asof histogram
    queries)."""
    def explode(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).combine_chunks()
        width = arr.type.list_size
        mat = arr.flatten().to_numpy().reshape(batch.num_rows, width)
        rows, bins = np.nonzero(mat)
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(rows)),
            "bin": pa.array(bins.astype(np.int64)),
            "val": pa.array(mat[rows, bins].astype(np.int64)),
        })
    return explode


def ragged_to_list(values: np.ndarray, offsets: np.ndarray,
                   pa_type) -> pa.ListArray:
    """Ragged rows -> Arrow list column (per-batch offsets fit int32)."""
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()),
        pa.array(values, pa_type))
