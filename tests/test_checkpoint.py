"""Resume semantics: finished partitions are skipped; outputs are
identical across interrupted + resumed runs; param changes invalidate."""

import glob
import json
import os


from kmerray.pipelines.comp import cfv_pipeline
from kmerray.runtime.checkpoint import plan_partitions, run_partitioned


def pipeline(ds):
    return cfv_pipeline(ds, k=4)


def test_plan_partitions_deterministic():
    files = [f"f{i}" for i in range(10)]
    parts = plan_partitions(files, 3)
    assert sum(len(p) for p in parts) == 10
    assert parts == plan_partitions(list(reversed(files)), 3)


def test_run_and_resume(ray_session, tiny_corpus_dir, tmp_path):
    files = sorted(glob.glob(f"{tiny_corpus_dir}/*.parquet"))
    assert len(files) >= 2
    out = str(tmp_path / "cfv_out")

    r1 = run_partitioned(pipeline, files, out, n_partitions=2,
                         params={"k": 4})
    assert len(r1.completed) == 2 and not r1.skipped
    assert os.path.exists(os.path.join(out, "MANIFEST.json"))
    rows1 = {p: r1.metrics[p]["rows_out"] for p in r1.metrics}

    # resume: everything skipped, nothing rewritten
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "part-*/*.parquet"))}
    r2 = run_partitioned(pipeline, files, out, n_partitions=2,
                         params={"k": 4})
    assert r2.skipped == [0, 1] and not r2.completed
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m

    # simulate a crash in partition 1: delete its success marker
    os.remove(os.path.join(out, "part-00001", "_SUCCESS"))
    r3 = run_partitioned(pipeline, files, out, n_partitions=2,
                         params={"k": 4})
    assert r3.skipped == [0] and r3.completed == [1]
    assert r3.metrics[1]["rows_out"] == rows1[1]

    # param change invalidates everything
    r4 = run_partitioned(pipeline, files, out, n_partitions=2,
                         params={"k": 5})
    assert not r4.skipped and r4.completed == [0, 1]

    # lineage recorded
    with open(os.path.join(out, "part-00000.manifest.json")) as fh:
        man = json.load(fh)
    assert man["inputs"] and man["rows_in"] > 0 and man["rows_out"] > 0
