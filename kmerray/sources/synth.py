"""Deterministic synthetic `sequences` corpus (the BASELINE.json
input_hint table).

Schema: ``(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string, ts: timestamp[us])`` — pre-tokenized sequences in the
reference's SEQ_NT4 code space (0..3 bases, 4 = ambiguous N), plus the
ingest timestamp used only by the as-of / windowed graft.

Generated once per scale from a fixed seed (42) and cached as a
directory of Parquet shards under /tmp so the Ray pipelines and the
DuckDB oracle SQL read the *same bytes*.  Scale is keyed off the
sf-dir name (sf0.001 -> 1k docs, sf0.01 -> 10k, sf0.1 -> 100k), per
FIXTURES.md tiering.  Includes the adversarial rows FIXTURES.md
requires: all-ambiguous rows (zero CFV), rows shorter than k, poly-A
runs (skewed minimizer/k-mer keys), and timestamps exactly on daily
snapshot boundaries.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VERSION = 3
SOURCES = ["src-a", "src-b", "src-c"]
SOURCE_WEIGHTS = [0.5, 0.3, 0.2]
TS_BASE_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
TS_HORIZON_US = 30 * 86_400_000_000  # 30 days
DAY_US = 86_400_000_000
CACHE_ROOT = os.environ.get("KMERRAY_CACHE", "/tmp/kmerray_data")


def scale_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def n_docs_of(sf_dir: str) -> int:
    return max(1000, int(round(1_000_000 * scale_of(sf_dir))))


def generate_sequences(n_docs: int, seed: int = SEED,
                       mean_len: int = 160) -> pa.Table:
    """Pure in-memory generation — fully vectorized, deterministic."""
    rng = np.random.default_rng([seed, n_docs, mean_len])

    src_idx = rng.choice(len(SOURCES), size=n_docs, p=SOURCE_WEIGHTS)
    lo, hi = 20, 2 * mean_len - 20
    lengths = rng.integers(lo, hi + 1, size=n_docs)
    # skew: ~1% extra-long rows (dominant-row stress, SURVEY §4)
    long_rows = rng.random(n_docs) < 0.01
    lengths[long_rows] = lengths[long_rows] * 5
    # adversarial: every 101st row shorter than any k we use
    lengths[::101] = 3

    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])

    values = rng.integers(0, 4, size=total, dtype=np.int32)
    # ~1.5% ambiguous tokens
    values[rng.random(total) < 0.015] = 4
    # every 97th row: all-ambiguous
    for r in range(0, n_docs, 97):
        values[offsets[r]:offsets[r + 1]] = 4
    # every 89th row: poly-A first half (hot canonical keys / minimizers)
    for r in range(0, n_docs, 89):
        if r % 97 == 0:
            continue
        s, e = offsets[r], offsets[r + 1]
        values[s:s + (e - s) // 2] = 0

    # timestamps: monotone-ish per source with jitter
    ts = np.zeros(n_docs, dtype=np.int64)
    for s in range(len(SOURCES)):
        mask = src_idx == s
        cnt = int(mask.sum())
        if cnt == 0:
            continue
        gap = TS_HORIZON_US / (cnt + 1)
        base = TS_BASE_US + (np.arange(cnt) + 0.5) * gap
        jit = rng.uniform(-0.45 * gap, 0.45 * gap, size=cnt)
        ts[mask] = (base + jit).astype(np.int64)
    # every 50th row: ts exactly on a daily snapshot boundary
    # (leakage-probe rows, FIXTURES.md §4)
    bidx = np.arange(0, n_docs, 50)
    ts[bidx] = ((ts[bidx] - TS_BASE_US) // DAY_US) * DAY_US + TS_BASE_US

    doc_id = np.array([f"{SOURCES[s]}/{i:07d}"
                       for i, s in enumerate(src_idx)], dtype=object)

    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      pa.array(values, pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_id, pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
        "source": pa.array([SOURCES[s] for s in src_idx], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def ensure_sequences(sf_dir: str, n_docs: int | None = None,
                     mean_len: int = 160, tag: str | None = None,
                     n_files: int | None = None) -> str:
    """Generate-or-reuse the cached corpus for a scale; returns the
    directory of Parquet shards (glob ``<dir>/*.parquet``)."""
    if n_docs is None:
        n_docs = n_docs_of(sf_dir)
    if tag is None:
        tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT,
                           f"{tag}-n{n_docs}-l{mean_len}-v{VERSION}",
                           "sequences")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    table = generate_sequences(n_docs, mean_len=mean_len)
    # shard so Ray's read parallelizes across files
    if n_files is None:
        n_files = max(1, min(32, n_docs // 12_500))
    step = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(tmp_dir, f"part-{i:04d}.parquet"),
                           row_group_size=8192)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
        json.dump({"n_docs": n_docs, "seed": SEED, "version": VERSION,
                   "mean_len": mean_len}, fh)
    try:
        os.rename(tmp_dir, out_dir)        # atomic publish
    except OSError:
        if not os.path.exists(marker):     # genuine failure, not a race
            raise
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def generate_read_corpus(n_docs: int, seed: int = SEED,
                         mean_len: int = 1024,
                         genome_tokens: int = 2_000_000,
                         mutation_rate: float = 0.002) -> pa.Table:
    """Realistic bench corpus: each source has a fixed random 'genome';
    every doc is a slice of its source's genome with point mutations
    and occasional ambiguity — so canonical k-mers repeat with
    coverage ~ (corpus tokens / genome tokens), which is the workload
    `ctr`/`cov` exist for (a purely random corpus has no k-mer
    duplication at k>=12 and makes coverage vectors degenerate)."""
    rng = np.random.default_rng([seed, n_docs, mean_len, genome_tokens])
    genomes = [rng.integers(0, 4, size=genome_tokens, dtype=np.int32)
               for _ in SOURCES]

    src_idx = rng.choice(len(SOURCES), size=n_docs, p=SOURCE_WEIGHTS)
    lo, hi = mean_len // 2, 3 * mean_len // 2
    lengths = rng.integers(lo, hi + 1, size=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    values = np.empty(total, dtype=np.int32)
    starts = rng.integers(0, genome_tokens - hi - 1, size=n_docs)
    for i in range(n_docs):
        g = genomes[src_idx[i]]
        values[offsets[i]:offsets[i + 1]] = g[starts[i]:starts[i]
                                              + lengths[i]]
    # point mutations + ambiguity
    mut = rng.random(total) < mutation_rate
    values[mut] = rng.integers(0, 4, size=int(mut.sum()), dtype=np.int32)
    amb = rng.random(total) < 0.002
    values[amb] = 4

    ts = np.zeros(n_docs, dtype=np.int64)
    for s in range(len(SOURCES)):
        mask = src_idx == s
        cnt = int(mask.sum())
        if cnt == 0:
            continue
        gap = TS_HORIZON_US / (cnt + 1)
        base = TS_BASE_US + (np.arange(cnt) + 0.5) * gap
        ts[mask] = (base + rng.uniform(-0.45 * gap, 0.45 * gap,
                                       size=cnt)).astype(np.int64)

    doc_id = np.array([f"{SOURCES[s]}/{i:07d}"
                       for i, s in enumerate(src_idx)], dtype=object)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      pa.array(values, pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_id, pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
        "source": pa.array([SOURCES[s] for s in src_idx], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def ensure_read_corpus(tag: str, n_docs: int, mean_len: int = 1024,
                       genome_tokens: int = 2_000_000) -> str:
    out_dir = os.path.join(CACHE_ROOT,
                           f"{tag}-reads-n{n_docs}-l{mean_len}"
                           f"-g{genome_tokens}-v{VERSION}", "sequences")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    table = generate_read_corpus(n_docs, mean_len=mean_len,
                                 genome_tokens=genome_tokens)
    n_files = max(8, min(64, n_docs // 6_000))
    step = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part,
                           os.path.join(tmp_dir, f"part-{i:04d}.parquet"),
                           row_group_size=4096)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
        json.dump({"n_docs": n_docs, "seed": SEED, "version": VERSION,
                   "mean_len": mean_len, "genome": genome_tokens}, fh)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if not os.path.exists(marker):
            raise
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def generate_embeddings(n_vecs: int, dim: int = 64, n_clusters: int = 64,
                        seed: int = SEED) -> pa.Table:
    """Deterministic clustered embeddings (Gaussian blobs around unit
    centers) — the ANN / IVF bench workload shape (clusters make IVF
    cell-pruning meaningful; a uniform cloud would not)."""
    rng = np.random.default_rng([seed, n_vecs, dim])
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n_vecs)
    mat = centers[assign] + 0.15 * rng.normal(size=(n_vecs, dim))
    flat = pa.array(mat.astype(np.float32).ravel(), pa.float32())
    offs = pa.array((np.arange(n_vecs + 1) * dim).astype(np.int32),
                    pa.int32())
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64), pa.int64()),
        # plain list<float> — the driver's embeddings schema
        "embedding": pa.ListArray.from_arrays(offs, flat),
    })


def ensure_embeddings(tag: str, n_vecs: int, dim: int = 64) -> str:
    out_dir = os.path.join(CACHE_ROOT,
                           f"{tag}-emb-n{n_vecs}-d{dim}-v{VERSION}",
                           "embeddings")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    table = generate_embeddings(n_vecs, dim)
    n_files = max(4, min(32, n_vecs // 16_000))
    step = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part,
                           os.path.join(tmp_dir, f"part-{i:04d}.parquet"),
                           row_group_size=4096)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
        json.dump({"n_vecs": n_vecs, "dim": dim, "seed": SEED,
                   "version": VERSION}, fh)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if not os.path.exists(marker):
            raise
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


# ---------------------------------------------------------------------------
# bench-scale documents corpus (dedup / text-stage benchmarks)
# ---------------------------------------------------------------------------

_DOC_VOCAB_N = 50_000


def generate_documents(n_docs: int, seed: int = SEED,
                       mean_words: int = 150,
                       dup_frac: float = 0.02) -> pa.Table:
    """Deterministic text corpus with a Zipf-ish vocabulary and
    ``dup_frac`` planted near-duplicates (one word changed), the
    dedup/minhash/simhash workload shape."""
    rng = np.random.default_rng([seed, n_docs, 77])
    vocab = np.array([f"w{i:05d}" for i in range(_DOC_VOCAB_N)],
                     dtype=object)
    p = 1.0 / (np.arange(_DOC_VOCAB_N, dtype=np.float64) + 10.0)
    p /= p.sum()
    lens = np.maximum(20, rng.poisson(mean_words, n_docs))
    offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    words = vocab[rng.choice(_DOC_VOCAB_N, size=int(offs[-1]), p=p)]
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    n_dup = int(n_docs * dup_frac)
    for j in range(n_dup):
        src = int(rng.integers(0, n_docs - n_dup))
        w = texts[src].split(" ")
        w[int(rng.integers(0, len(w)))] = "XDUP"
        texts[n_docs - n_dup + j] = " ".join(w)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


# ---------------------------------------------------------------------------
# bench-scale events table (windowed feature-engineering benchmarks)
# ---------------------------------------------------------------------------


def generate_events(n_events: int, n_users: int,
                    span_days: int = 30, seed: int = SEED) -> pa.Table:
    """Deterministic events table mirroring the driver's schema
    (event_id, ts, user_id, event_type, value, props); user activity is
    Zipf-skewed so the session/history bucket shuffle sees hot keys."""
    rng = np.random.default_rng([seed, n_events, 91])
    base_us = 1_704_067_200_000_000            # 2024-01-01 epoch us
    ts = base_us + rng.integers(0, span_days * 86_400_000_000,
                                size=n_events)
    pu = 1.0 / (np.arange(n_users, dtype=np.float64) + 5.0)
    pu /= pu.sum()
    user = rng.choice(n_users, size=n_events, p=pu).astype(np.int64)
    etypes = np.array(["view", "click", "purchase", "signup", "error"],
                      dtype=object)
    value = np.round(rng.gamma(2.0, 25.0, size=n_events), 2)
    ks = np.char.mod("%d", rng.integers(0, 100, size=n_events))
    props = np.char.add(np.char.add('{"k": ', ks), "}")
    return pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64),
                             pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_events)]),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props.astype(object), pa.string()),
    })


def ensure_events(tag: str, n_events: int, n_users: int) -> str:
    out_dir = os.path.join(CACHE_ROOT,
                           f"{tag}-events-n{n_events}-u{n_users}"
                           f"-v{VERSION}", "events")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    table = generate_events(n_events, n_users)
    n_files = max(8, min(32, n_events // 64_000))
    step = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part,
                           os.path.join(tmp_dir, f"part-{i:04d}.parquet"),
                           row_group_size=16384)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
        json.dump({"n_events": n_events, "n_users": n_users,
                   "seed": SEED, "version": VERSION}, fh)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if not os.path.exists(marker):
            raise
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def ensure_documents(tag: str, n_docs: int, mean_words: int = 150) -> str:
    out_dir = os.path.join(CACHE_ROOT,
                           f"{tag}-docs-n{n_docs}-w{mean_words}"
                           f"-v{VERSION}", "documents")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    table = generate_documents(n_docs, mean_words=mean_words)
    n_files = max(8, min(32, n_docs // 8_000))
    step = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part,
                           os.path.join(tmp_dir, f"part-{i:04d}.parquet"),
                           row_group_size=4096)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as fh:
        json.dump({"n_docs": n_docs, "seed": SEED, "version": VERSION,
                   "mean_words": mean_words}, fh)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if not os.path.exists(marker):
            raise
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir
