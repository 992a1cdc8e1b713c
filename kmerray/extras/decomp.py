"""Distributed PCA over an embedding column — the dimensionality-
reduction stage of a feature-engineering pipeline, expressed as the
classic two-pass moment reduction:

1. *moment pass*: each block emits ONE row of sufficient statistics
   (count, column sums, X^T X flattened) — d^2 + d + 1 doubles per
   block regardless of block size, so the driver-side combine is
   O(n_blocks), never O(rows);
2. the driver assembles the covariance (exact centering via
   ``XtX/n - mean mean^T`` scaled to the unbiased estimator), runs a
   d x d ``eigh`` (d is the embedding width — tiny), and fixes each
   component's sign deterministically (the max-|loading| coordinate is
   made positive, ties to the lowest index);
3. *projection pass*: components ride ``ray.put`` once and every
   block projects with one matmul.

Nothing about the corpus size reaches the driver except n_blocks
moment rows; at 100 TB the moment pass is a streaming reduction and
the projection is embarrassingly parallel.

No SQL oracle (eigendecomposition is not SQL-expressible); parity is
pytest-gated against a single-process numpy PCA on the same rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .similarity import _emb_matrix


def _moment_partial(batch: pa.Table) -> pa.Table:
    x = _emb_matrix(batch)
    return pa.table({
        "n": pa.array([x.shape[0]], pa.int64()),
        "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
        "xtx": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
    })


def fit_pca(ds: "ray.data.Dataset", n_components: int):
    """(mean, components) — components is (d, p), columns ordered by
    descending eigenvalue, sign-fixed."""
    parts = ds.map_batches(_moment_partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    d = len(s)
    xtx = np.sum([np.asarray(p["xtx"]) for p in parts], axis=0) \
        .reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    w = evecs[:, order]
    # deterministic sign: max-|loading| coordinate positive
    flip = w[np.argmax(np.abs(w), axis=0), np.arange(w.shape[1])] < 0
    w[:, flip] *= -1.0
    return mean, w


def pca_project(ds: "ray.data.Dataset", mean: np.ndarray,
                components: np.ndarray,
                concurrency=(1, 8)) -> "ray.data.Dataset":
    """(vec_id, proj list<double>) — centered projection onto the
    fitted components, broadcast once via ``ray.put``.

    ``concurrency`` is an autoscaling (min, max) range: a FIXED pool
    can reserve every CPU on a small cluster and starve the upstream
    read (observed as a scheduling stall on a 4-CPU test session)."""
    ref = ray.put((mean, components))

    class Project:
        def __init__(self):
            self.mean, self.w = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch)
            proj = (x - self.mean) @ self.w
            offs = np.arange(0, proj.size + 1, proj.shape[1],
                             dtype=np.int32)
            arr = pa.ListArray.from_arrays(pa.array(offs),
                                           pa.array(proj.ravel()))
            return pa.table({"vec_id": batch.column("vec_id"),
                             "proj": arr})

    return ds.map_batches(Project, concurrency=concurrency,
                          batch_format="pyarrow", zero_copy_batch=True)


def pca_pipeline(ds: "ray.data.Dataset",
                 n_components: int = 8) -> "ray.data.Dataset":
    mean, w = fit_pca(ds, n_components)
    return pca_project(ds, mean, w)


def _bottom_ids_table(ds: "ray.data.Dataset", c: int) -> pa.Table:
    """The c rows with the LOWEST vec_id — a reshard-stable,
    content-independent init set (per-block partial bottom-c, then one
    tiny merge; never a global sort)."""
    def bottom(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        take = np.argsort(ids, kind="stable")[:c]
        return b.take(pa.array(np.sort(take)))
    part = ds.map_batches(bottom, batch_format="pyarrow",
                          zero_copy_batch=True)
    rows = part.take_all()      # <= c rows per block, merged below
    t = pa.Table.from_pylist(rows)
    ids = np.asarray(t.column("vec_id").to_pylist())
    take = np.argsort(ids, kind="stable")[:c]
    return t.take(pa.array(np.sort(take)))


def kmeans_fit(ds: "ray.data.Dataset", n_clusters: int = 8,
               iters: int = 5,
               pre_materialized: bool = False) -> np.ndarray:
    """Distributed Lloyd's k-means over the embedding column.

    Deterministic init (the ``n_clusters`` lowest vec_ids), then
    ``iters`` synchronous rounds: each block emits ONE sufficient-
    statistics row (per-cluster counts + vector sums — O(k x d)
    doubles regardless of block size), the driver combines and
    updates.  Ties in the distance argmin go to the lowest cluster
    index; empty clusters keep their previous centroid.  At 100 TB
    each round is one streaming pass; nothing but k x d floats ever
    sits on the driver."""
    # the synchronous rounds below re-scan the input once per
    # iteration; materialize the slim (vec_id, embedding) projection
    # ONCE so iteration 2..n read object-store blocks instead of
    # re-executing the upstream read/transform (the embedding table
    # is orders of magnitude smaller than the doc corpus, and the
    # object store spills if it doesn't fit)
    if not pre_materialized:
        ds = ds.select_columns(["vec_id", "embedding"]).materialize()
    init = _bottom_ids_table(ds, n_clusters)
    cent = np.asarray(init.column("embedding").to_pylist(),
                      dtype=np.float64)

    for _ in range(iters):
        ref = ray.put(cent)

        def moment(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _emb_matrix(batch)
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) \
                + (c * c).sum(axis=1)
            a = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table({
                "counts": pa.array([counts], pa.list_(pa.int64())),
                "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
            })

        parts = ds.map_batches(moment, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        counts = np.sum([np.asarray(p["counts"]) for p in parts], axis=0)
        sums = np.sum([np.asarray(p["sums"]) for p in parts],
                      axis=0).reshape(cent.shape)
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cent


def kmeans_assign(ds: "ray.data.Dataset",
                  centroids: np.ndarray) -> "ray.data.Dataset":
    """(vec_id, cluster) — nearest (Euclidean) centroid per row, the
    centroid matrix broadcast once into an autoscaling actor pool."""
    ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.c = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch)
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ self.c.T) \
                + (self.c * self.c).sum(axis=1)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(np.argmin(d2, axis=1)
                                    .astype(np.int64)),
            })

    return ds.map_batches(Assign, concurrency=(1, 8),
                          batch_format="pyarrow", zero_copy_batch=True)


def kmeans_pipeline(ds: "ray.data.Dataset", n_clusters: int = 8,
                    iters: int = 5) -> "ray.data.Dataset":
    # one materialized slim projection serves fit iterations AND the
    # assignment pass (no re-execution of the upstream read)
    slim = ds.select_columns(["vec_id", "embedding"]).materialize()
    cent = kmeans_fit(slim, n_clusters, iters, pre_materialized=True)
    return kmeans_assign(slim, cent)


def assign_with_dist(ds: "ray.data.Dataset",
                     centroids: np.ndarray) -> "ray.data.Dataset":
    """(vec_id, cluster, d2) — like :func:`kmeans_assign` but keeps
    the squared distance to the winning centroid for downstream
    ranking."""
    ref = ray.put(centroids)

    class AssignDist:
        def __init__(self):
            self.c = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch)
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ self.c.T) \
                + (self.c * self.c).sum(axis=1)
            a = np.argmin(d2, axis=1)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64)),
                "d2": pa.array(d2[np.arange(len(a)), a]),
            })

    return ds.map_batches(AssignDist, concurrency=(1, 8),
                          batch_format="pyarrow", zero_copy_batch=True)


def cluster_representatives(ds: "ray.data.Dataset", n_clusters: int = 8,
                            iters: int = 5,
                            n_per: int = 5) -> "ray.data.Dataset":
    """Centroid-representative sampling: fit k-means, then keep the
    ``n_per`` embeddings NEAREST each centroid (ties to lowest
    vec_id) — the usual diversity-aware downsampling step (cluster the
    corpus, keep a bounded budget per cluster instead of a global
    top-k that collapses onto one dense mode).

    Scale: the fit is the streaming sufficient-statistics loop of
    :func:`kmeans_fit`; ranking is the partial-top-k-per-key +
    bucket-merge of :func:`~kmerray.extras.grouped.grouped_topk`
    (O(n_per x k x blocks) shuffle rows).  Output is the integer
    surface ``(cluster, vec_id)`` only — the float distance orders
    but is never emitted, so the oracle comparison is exact."""
    from .grouped import grouped_topk
    slim = ds.select_columns(["vec_id", "embedding"]).materialize()
    cent = kmeans_fit(slim, n_clusters, iters, pre_materialized=True)
    assigned = assign_with_dist(slim, cent)
    top = grouped_topk(assigned, key="cluster", score="d2", k=n_per,
                       tiebreak="vec_id", ascending=True)

    def shape(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cluster": b["cluster"].astype(np.int64),
                             "vec_id": b["vec_id"].astype(np.int64)})
    return top.map_batches(shape, batch_format="pandas")


def semdedup_survivors(ds: "ray.data.Dataset", n_clusters: int = 8,
                       iters: int = 5,
                       threshold: float = 0.4) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540, public method): k-means the embedding space,
    then WITHIN each cluster drop every vector that has a lower-id
    neighbor at cosine >= threshold.  The domination rule is
    per-pair and non-iterative (survivor iff no lower-id same-cluster
    neighbor above the bar), so it is deterministic and exactly
    SQL-expressible (NOT EXISTS), unlike transitive-closure grouping.

    Scale: the quadratic within-cluster comparison is the method's
    intended shape — n_clusters grows with the corpus (the paper runs
    ~50k clusters at LAION scale) so cluster populations stay bounded;
    the cluster shuffle is the only exchange, embeddings ride it
    once, and the per-group matmul is blocked so peak memory is
    O(block x cluster), not O(cluster^2)."""
    from .similarity import _normalize
    slim = ds.select_columns(["vec_id", "embedding"]).materialize()
    cent = kmeans_fit(slim, n_clusters, iters, pre_materialized=True)
    assigned = _assign_with_embedding(slim, cent)

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["vec_id"].to_numpy())
        ids = g["vec_id"].to_numpy()[order]
        m = _normalize(np.stack(g["embedding"].to_numpy())[order]
                       .astype(np.float64))
        n = len(ids)
        victim = np.zeros(n, bool)
        for s0 in range(0, n, 1024):          # blocked rows: i-range
            s1 = min(s0 + 1024, n)
            sim = m[s0:s1] @ m.T              # (block, n)
            hit = sim >= threshold
            # victim i iff any j < i hits (strict lower triangle)
            hit &= np.arange(n)[None, :] < np.arange(s0, s1)[:, None]
            victim[s0:s1] = hit.any(axis=1)
        keep = ~victim
        return pd.DataFrame({
            "vec_id": ids[keep].astype(np.int64),
            "cluster": np.full(int(keep.sum()),
                               int(g["cluster"].iloc[0]), np.int64)})

    return assigned.groupby("cluster").map_groups(
        dedup_group, batch_format="pandas")


def _assign_with_embedding(ds: "ray.data.Dataset",
                           centroids: np.ndarray) -> "ray.data.Dataset":
    """(vec_id, cluster, embedding) — nearest-centroid assignment that
    carries the embedding through for the within-cluster stage (one
    broadcast, one shuffle)."""
    ref = ray.put(centroids)

    class AssignEmb:
        def __init__(self):
            self.c = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .similarity import _emb_matrix
            x = _emb_matrix(batch)
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ self.c.T) \
                + (self.c * self.c).sum(axis=1)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(np.argmin(d2, axis=1)
                                    .astype(np.int64)),
                "embedding": batch.column("embedding"),
            })

    return ds.map_batches(AssignEmb, concurrency=(1, 8),
                          batch_format="pyarrow", zero_copy_batch=True)


PRUNE_FRAC = 0.5


def proto_prune(ds: "ray.data.Dataset", n_clusters: int = 8,
                iters: int = 5,
                frac: float = PRUNE_FRAC) -> "ray.data.Dataset":
    """SSL-prototypes data pruning (Sorscher et al. 2022,
    arXiv:2206.14486): prototypicality = distance to the assigned
    k-means centroid; in the abundant-data regime the EASY (most
    prototypical) examples are redundant, so keep the ``frac``
    HARDEST per cluster (largest distance, ties to lowest vec_id).
    Pruning per cluster (not globally) preserves coverage of every
    mode — the paper's key design point.

    Scale shape: the fit is :func:`kmeans_fit`'s streaming
    sufficient-statistics loop; assignment keeps the winning squared
    distance; per-cluster sizes come from ONE bincount-partial fold
    (driver sees blocks x k ints) giving each cluster's integer
    quota ``ceil(frac * n_c)``; the rank-and-cut is the grouped_topk
    partial-per-block + bucket-merge discipline with a PER-KEY k —
    each block pre-cuts to its own per-cluster quota so the exchange
    carries <= blocks x k x quota rows, never the corpus.

    Output: the integer surface ``(cluster, vec_id)`` of survivors —
    the float distance orders but is never emitted (the cluster_reps
    exactness contract)."""
    slim = ds.select_columns(["vec_id", "embedding"]).materialize()
    cent = kmeans_fit(slim, n_clusters, iters, pre_materialized=True)
    assigned = assign_with_dist(slim, cent).materialize()

    def counts(b: pa.Table) -> pa.Table:
        c = np.bincount(b.column("cluster").to_numpy(),
                        minlength=n_clusters).astype(np.int64)
        return pa.table({"cluster": pa.array(np.arange(n_clusters,
                                                       dtype=np.int64)),
                         "n": pa.array(c)})

    part = (assigned.map_batches(counts, batch_format="pyarrow")
            .to_pandas().groupby("cluster")["n"].sum())
    quota = {int(c): int(np.ceil(frac * int(n)))
             for c, n in part.items()}

    def blk_cut(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["cluster", "d2", "vec_id"],
                          ascending=[True, False, True])
        r = b.groupby("cluster").cumcount().to_numpy()
        q = b["cluster"].map(quota).to_numpy()
        return b[r < q]

    # per-block pre-cut, single small merge (<= blocks x k x quota
    # rows; at larger quotas swap the driver fold for the
    # grouped_topk bucket merge unchanged)
    pre = assigned.map_batches(blk_cut, batch_format="pandas",
                               zero_copy_batch=False).to_pandas()
    pre = pre.sort_values(["cluster", "d2", "vec_id"],
                          ascending=[True, False, True])
    r = pre.groupby("cluster").cumcount().to_numpy()
    q = pre["cluster"].map(quota).to_numpy()
    out = pre[r < q]
    import ray as _ray
    return _ray.data.from_pandas(pd.DataFrame({
        "cluster": out["cluster"].to_numpy(np.int64),
        "vec_id": out["vec_id"].to_numpy(np.int64)})
        .reset_index(drop=True))


def kcenter_select(ds: "ray.data.Dataset", k: int = 16) -> "ray.data.Dataset":
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal; the active-learning coreset of Sener & Savarese 2018,
    arXiv:1708.00489): seed = the LOWEST vec_id (reshard-stable, the
    kmeans_fit init discipline), then k-1 rounds of "pick the point
    farthest from the selected set" (ties to lowest vec_id), then one
    assignment pass counting how many points each center covers.

    Scale shape: the selected set never exceeds k rows, and each round
    is ONE streaming pass over the materialized slim projection
    against a SINGLE broadcast center — the running min-distance
    column ``mind2`` rides the dataset (updated in place per round, so
    round t compares against ONE new center, not all t), and the
    round's winner comes from per-block argmax partials (driver folds
    <= blocks rows).  The coverage pass emits per-block bincount
    partials (blocks x k ints).  2k streaming passes total over the
    embedding table (which is orders of magnitude smaller than the doc
    corpus); nothing corpus-sized ever reaches the driver.

    Float discipline: d2 uses the same kmeans kernel
    ``(x*x).sum(1) - 2 x@c + (c*c).sum()`` as the oracle generator's
    single-process reference; BLAS blocking can differ at the ~1-ulp
    level between block shapes, so selections diverge only if two
    points' min-distances coincide within ~1e-12 relative (the
    documented kmeans_assign caveat — does not occur on generic float
    embeddings).  Output is the integer surface (rank, vec_id,
    n_assigned) — no float is emitted."""
    slim = ds.select_columns(["vec_id", "embedding"]).materialize()
    seed = _bottom_ids_table(slim, 1)
    sel_ids = [int(seed.column("vec_id")[0].as_py())]
    sel_vecs = [np.asarray(seed.column("embedding")[0].as_py(),
                           dtype=np.float64)]

    state = slim
    for rnd in range(k - 1):
        c = sel_vecs[-1]
        ref = ray.put(c)
        first = rnd == 0

        def update(b: pa.Table, _ref=ref, _first=first) -> pa.Table:
            cc = ray.get(_ref)
            x = _emb_matrix(b)
            d2 = (x * x).sum(axis=1) - 2.0 * (x @ cc) + (cc * cc).sum()
            if _first:
                mind2 = d2
            else:
                mind2 = np.minimum(b.column("mind2").to_numpy(), d2)
            return pa.table({"vec_id": b.column("vec_id"),
                             "embedding": b.column("embedding"),
                             "mind2": pa.array(mind2)})

        state = state.map_batches(update, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

        def blockmax(b: pa.Table) -> pa.Table:
            ids = b.column("vec_id").to_numpy()
            m = b.column("mind2").to_numpy()
            i = int(np.lexsort((ids, -m))[0])
            return pa.table({
                "vec_id": pa.array([int(ids[i])], pa.int64()),
                "mind2": pa.array([float(m[i])], pa.float64()),
                "embedding": pa.array(
                    [b.column("embedding")[i].as_py()],
                    pa.list_(pa.float64()))})

        part = (state.map_batches(blockmax, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all())
        win = min(part, key=lambda r: (-r["mind2"], r["vec_id"]))
        sel_ids.append(int(win["vec_id"]))
        sel_vecs.append(np.asarray(win["embedding"], dtype=np.float64))

    cent = np.vstack(sel_vecs)
    cref = ray.put(cent)

    def cover(b: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        x = _emb_matrix(b)
        d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cc.T) \
            + (cc * cc).sum(axis=1)
        a = np.argmin(d2, axis=1)
        n = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table({"rank": pa.array(np.arange(k, dtype=np.int64)),
                         "n": pa.array(n)})

    part = (slim.map_batches(cover, batch_format="pyarrow",
                             zero_copy_batch=True)
            .to_pandas().groupby("rank")["n"].sum())
    out = pd.DataFrame({
        "rank": np.arange(k, dtype=np.int64),
        "vec_id": np.asarray(sel_ids, dtype=np.int64),
        "n_assigned": part.reindex(range(k), fill_value=0)
                          .to_numpy(np.int64)})
    return ray.data.from_pandas(out)
