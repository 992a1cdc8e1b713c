"""Edge-case robustness: empty/tiny datasets, short rows, asof guards,
alt-input dictionaries."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from kmerray.pipelines.asof import snapshot_counts
from kmerray.pipelines.comp import cfv_pipeline, cgr_pipeline, seq_stats
from kmerray.pipelines.counter import count_kmers
from kmerray.pipelines.cov import cov_end_to_end
from kmerray.pipelines.minpipe import minimisers_exploded, s2m_pipeline
from kmerray.sources.synth import generate_sequences


def tiny_table(n):
    return generate_sequences(n)


def empty_table():
    return pa.table({
        "doc_id": pa.array([], pa.string()),
        "tokens": pa.array([], pa.list_(pa.int32())),
        "n_tok": pa.array([], pa.int32()),
        "source": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    })


def test_empty_dataset_pipelines(ray_session):
    ds = ray.data.from_arrow(empty_table())
    assert cfv_pipeline(ds, k=4).count() == 0
    assert count_kmers(ds, 8).count() == 0
    assert minimisers_exploded(ds, 8, 5).count() == 0
    assert cgr_pipeline(ds).count() == 0


def test_single_short_row(ray_session):
    t = pa.table({
        "doc_id": pa.array(["only"]),
        "tokens": pa.array([[0, 1]], pa.list_(pa.int32())),
        "n_tok": pa.array([2], pa.int32()),
        "source": pa.array(["s"]),
        "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    out = cfv_pipeline(ds, k=4).take_all()
    assert len(out) == 1
    assert sum(out[0]["cfv"]) == 0.0       # no 4-mer fits
    assert count_kmers(ds, 4).count() == 0
    assert s2m_pipeline(ds, 8, 5).take_all()[0]["minimisers"] == []


def test_seq_stats(ray_session):
    t = tiny_table(50)
    ds = ray.data.from_arrow(t)
    st = seq_stats(ds)
    assert st["seq_count"] == 50
    assert st["total_length"] == int(
        np.sum(t.column("n_tok").to_numpy()))


def test_asof_k_guard(ray_session):
    ds = ray.data.from_arrow(tiny_table(10))
    with pytest.raises(ValueError):
        snapshot_counts(ds, 29)


def test_cov_alt_input(ray_session, tmp_path):
    """--alt-input semantics: dictionary built from a DIFFERENT corpus
    (/root/reference/kmertools/src/args.rs:311-313)."""
    main_t = tiny_table(60)
    alt_t = tiny_table(40)
    ds = ray.data.from_arrow(main_t)
    alt = ray.data.from_arrow(alt_t)
    out = cov_end_to_end(ds, 6, 2, 4, str(tmp_path / "c1"),
                         alt_ds=alt, concurrency=1).take_all()
    assert len(out) == 60
    # dictionary from alt: counts differ from self-dictionary run
    out_self = cov_end_to_end(ds, 6, 2, 4, str(tmp_path / "c2"),
                              concurrency=1).take_all()
    a = {r["doc_id"]: tuple(r["coverage"]) for r in out}
    b = {r["doc_id"]: tuple(r["coverage"]) for r in out_self}
    assert a != b
