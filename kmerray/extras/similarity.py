"""Similarity search over the `embeddings` table.

* Brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put``), each batch does one float64 matmul against it, local
  per-batch top-k candidates are merged in a tiny final reduction —
  the baseline and the exactness oracle.
* LSH-bucketed ANN: random-hyperplane signatures bucket the corpus;
  queries search only matching (and neighboring) buckets — the scale
  path, recall-tested against brute force.
* Embedding-cosine near-dup: all pairs above a cosine threshold via
  block matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding").combine_chunks()
    off = col.offsets.to_numpy().astype(np.int64)
    dim = off[1] - off[0]
    vals = col.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]]
    return vals.reshape(-1, dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def load_queries(path: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    t = t.filter(pa.compute.less(t.column("vec_id"), n_queries))
    return t.column("vec_id").to_numpy(), _emb_matrix(t)


def brute_force_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
                     query_mat: np.ndarray, k: int = 10
                     ) -> "ray.data.Dataset":
    """(qid, vec_id) of the top-k cosine neighbors per query.

    Per-batch: one (B x dim) @ (dim x Q) matmul -> local top-k rows;
    final exact top-k per query over the tiny candidate set (ties
    broken by vec_id for determinism)."""
    qn = _normalize(query_mat)
    ref = ray.put((query_ids, qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        em = _normalize(_emb_matrix(batch))
        scores = em @ qmat.T                     # (B x Q)
        vec_ids = batch.column("vec_id").to_numpy()
        kk = min(k, len(vec_ids))
        out = {"qid": [], "vec_id": [], "score": []}
        for qi, qid in enumerate(qids):
            s = scores[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk]
            out["qid"].extend([qid] * kk)
            out["vec_id"].extend(vec_ids[idx])
            out["score"].extend(s[idx])
        return pa.table({"qid": pa.array(out["qid"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "score": pa.array(out["score"], pa.float64())})

    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"],
                          ascending=[False, True]).head(k)
        return g[["qid", "vec_id"]]
    return cand.groupby("qid").map_groups(merge, batch_format="pandas")


def make_lsh_planes(dim: int, n_bits: int = 12, seed: int = 13):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def lsh_signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes) > 0
    return (bits @ (1 << np.arange(planes.shape[1]))).astype(np.int64)


def lsh_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
             query_mat: np.ndarray, k: int = 10, n_bits: int = 8,
             probe_hamming: int = 1, seed: int = 13) -> "ray.data.Dataset":
    """Approximate top-k: corpus bucketed by hyperplane signature; each
    query searches only buckets within Hamming ``probe_hamming`` of its
    own signature (multiprobe candidate pruning; recall vs brute force
    measured in tests — raise probe depth/lower bits for higher
    recall)."""
    from itertools import combinations
    dim = query_mat.shape[1]
    planes = make_lsh_planes(dim, n_bits, seed)
    qn = _normalize(query_mat)
    qsig = lsh_signature(qn, planes)
    masks = [0]
    for d in range(1, probe_hamming + 1):
        for bits in combinations(range(n_bits), d):
            masks.append(sum(1 << b for b in bits))
    accept: dict[int, list[int]] = {}
    for qi, s in enumerate(qsig):
        for mk in masks:
            accept.setdefault(int(s) ^ mk, []).append(qi)
    ref = ray.put((query_ids, qn, planes, accept))

    def local(batch: pa.Table) -> pa.Table:
        qids, qmat, pl, acc = ray.get(ref)
        em = _normalize(_emb_matrix(batch))
        sigs = lsh_signature(em, pl)
        vec_ids = batch.column("vec_id").to_numpy()
        out = {"qid": [], "vec_id": [], "score": []}
        for bkt in np.unique(sigs):
            qidxs = acc.get(int(bkt))
            if not qidxs:
                continue
            rows = np.flatnonzero(sigs == bkt)
            sub = em[rows] @ qmat[qidxs].T
            kk = min(k, len(rows))
            for ci, qi in enumerate(qidxs):
                s = sub[:, ci]
                idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(rows) \
                    else np.arange(len(rows))
                out["qid"].extend([qids[qi]] * len(idx))
                out["vec_id"].extend(vec_ids[rows[idx]])
                out["score"].extend(s[idx])
        return pa.table({"qid": pa.array(out["qid"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "score": pa.array(out["score"], pa.float64())})

    cand = ds.map_batches(local, batch_format="pyarrow",
                          zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"],
                          ascending=[False, True]).head(k)
        return g[["qid", "vec_id"]]
    return cand.groupby("qid").map_groups(merge, batch_format="pandas")


def cosine_near_dup_pairs(ds: "ray.data.Dataset", full_path: str,
                          threshold: float = 0.4) -> "ray.data.Dataset":
    """(a, b) pairs with cosine >= threshold: each batch matmuls against
    the broadcast full (normalized) matrix.  At 10^12 scale this stage
    runs per LSH bucket instead of against the full matrix; same batch
    kernel."""
    import pyarrow.parquet as pq
    t = pq.read_table(full_path)
    all_ids = t.column("vec_id").to_numpy()
    full = _normalize(_emb_matrix(t))
    ref = ray.put((all_ids, full))

    def pairs(batch: pa.Table) -> pa.Table:
        ids2, mat = ray.get(ref)
        em = _normalize(_emb_matrix(batch))
        vec_ids = batch.column("vec_id").to_numpy()
        s = em @ mat.T
        rows, cols = np.nonzero(s >= threshold)
        a = vec_ids[rows]
        b = ids2[cols]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})
    return ds.map_batches(pairs, batch_format="pyarrow",
                          zero_copy_batch=True)
