"""Per-partition checkpointed execution with lineage + metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; absent from the single-process reference — crash = rerun).

Layout under ``out_root``::

    part-00000/ ... parquet shards of partition 0 (written atomically:
                temp dir + rename)
    part-00000.manifest.json   lineage: input fragments, row counters,
                               wall time, params fingerprint
    MANIFEST.json              written when every partition is done

A rerun with ``resume=True`` skips every partition whose manifest and
``_SUCCESS`` marker exist and whose params fingerprint matches —
skipped partitions' outputs are byte-identical because every pipeline
here is a pure function of (input fragments, params).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field


def _fingerprint(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


def plan_partitions(input_files: list[str],
                    n_partitions: int) -> list[list[str]]:
    """Deterministic contiguous grouping of input fragments."""
    files = sorted(input_files)
    n_partitions = max(1, min(n_partitions, len(files)))
    step = (len(files) + n_partitions - 1) // n_partitions
    return [files[i:i + step] for i in range(0, len(files), step)]


@dataclass
class RunReport:
    completed: list[int] = field(default_factory=list)
    skipped: list[int] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


def run_partitioned(pipeline_fn, input_files: list[str], out_root: str,
                    n_partitions: int = 8, params: dict | None = None,
                    resume: bool = True) -> RunReport:
    """Run ``pipeline_fn(ray.data.Dataset) -> ray.data.Dataset`` over
    each partition of ``input_files``, writing one output directory per
    partition; finished partitions are skipped on resume."""
    import pyarrow.parquet as pq
    import ray.data

    params = params or {}
    fp = _fingerprint(params)
    parts = plan_partitions(input_files, n_partitions)
    os.makedirs(out_root, exist_ok=True)
    report = RunReport()

    for pid, files in enumerate(parts):
        out_dir = os.path.join(out_root, f"part-{pid:05d}")
        man_path = os.path.join(out_root, f"part-{pid:05d}.manifest.json")
        if resume and os.path.exists(man_path) and \
                os.path.exists(os.path.join(out_dir, "_SUCCESS")):
            with open(man_path) as fh:
                man = json.load(fh)
            if man.get("params_fp") == fp and man.get("inputs") == files:
                report.skipped.append(pid)
                report.metrics[pid] = man
                continue
        t0 = time.time()
        tmp_dir = out_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = ray.data.read_parquet(files)
        out = pipeline_fn(ds)
        out.write_parquet(tmp_dir)
        rows_out = sum(pq.ParquetFile(f).metadata.num_rows for f in
                       glob.glob(os.path.join(tmp_dir, "*.parquet")))
        rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
            fh.write("")
        os.rename(tmp_dir, out_dir)
        man = {"partition": pid, "inputs": files, "params_fp": fp,
               "params": params, "rows_in": rows_in, "rows_out": rows_out,
               "wall_sec": round(time.time() - t0, 3),
               "finished_at": time.time()}
        with open(man_path + ".tmp", "w") as fh:
            json.dump(man, fh, indent=1)
        os.rename(man_path + ".tmp", man_path)
        report.completed.append(pid)
        report.metrics[pid] = man

    done = len(report.completed) + len(report.skipped)
    if done == len(parts):
        with open(os.path.join(out_root, "MANIFEST.json"), "w") as fh:
            json.dump({"n_partitions": len(parts), "params_fp": fp,
                       "partitions": [f"part-{i:05d}" for i in
                                      range(len(parts))]}, fh, indent=1)
    return report
