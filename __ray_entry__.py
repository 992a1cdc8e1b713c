"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: CFV extraction (comp
    oligo, k=4 canonical normalized) + point-in-time as-of coverage —
    returns a Dataset with (doc_id, tokens, n_tok, source, ts, cfv,
    asof_coverage, asof_day)."""
    import pyarrow as pa
    import ray

    from kmerray.pipelines.asof import (asof_coverage_pipeline,
                                        load_snapshot_index, snapshot_counts)
    from kmerray.pipelines.comp import cfv_pipeline, read_sequences

    sf_dir = "/root/testdata/sf0.001"
    ds = read_sequences(sf_dir)
    from kmerray.pipelines.asof import collect_snapshot_table
    index_ref = ray.put(load_snapshot_index(
        collect_snapshot_table(snapshot_counts(ds, 8))))
    out = cfv_pipeline(ds, k=4)
    return asof_coverage_pipeline(out, index_ref, 8, 2, 4, concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    from kmerray.queries import registry
    return registry()


def oracle_sql() -> dict[str, str]:
    from kmerray.queries import oracle_registry
    return oracle_registry()
