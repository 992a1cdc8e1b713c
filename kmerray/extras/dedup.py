"""Deduplication stages for a training-data pipeline over `documents`:

* exact dedup — content-hash partition + per-group first (survivor =
  min doc_id);
* n-gram Jaccard near-dup — exact pairwise Jaccard over word 3-gram
  sets, distributed as gram-explode -> per-gram pair emission ->
  pair-count aggregation (SQL-checkable);
* MinHash + LSH — shingle -> minhash -> banded bucket groupby ->
  candidate pairs -> Jaccard verify (the scale path: candidates only);
* SimHash — 64-bit signature + banded blocking for Hamming<=d pairs;
* embedding cosine near-dup — see extras.similarity.

All shuffles are keyed by hash buckets/bands, never by raw document
content."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .text import fnv1a_bytes_batch

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup_survivors(ds: "ray.data.Dataset", col: str = "text",
                          n_buckets: int = 64) -> "ray.data.Dataset":
    """(doc_id) of the kept row per distinct content.

    Shuffle key = 64-bit content hash **bucketed** (``h % n_buckets``)
    — grouping by the raw hash would make one Ray group per distinct
    document; inside each bucket one vectorized pandas groupby on the
    raw content keeps min doc_id (raw-equality grouping, so a hash
    collision cannot merge distinct contents)."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            batch = batch.copy()
            h = fnv1a_bytes_batch(batch[col])
            batch["bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return batch

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby(col, as_index=False)["doc_id"].min()
        return keep[["doc_id"]]

    hashed = ds.map_batches(add_bucket, batch_format="pandas")
    return hashed.groupby("bucket").map_groups(survivors,
                                               batch_format="pandas")


# --------------------------------------------------------------------------
# word n-grams + exact Jaccard pairs
# --------------------------------------------------------------------------


def _grams_of(words: list[str], n: int) -> set[str]:
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def make_gram_explode_fn(n: int):
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            for g in _grams_of(t.split(" "), n):
                ids.append(d)
                grams.append(g)
        return pd.DataFrame({"doc_id": ids, "gram": grams})
    return explode


def ngram_jaccard_pairs(ds: "ray.data.Dataset", n: int = 3,
                        threshold: float = 0.2, n_buckets: int = 32,
                        stopgram_cap: int | None = None
                        ) -> "ray.data.Dataset":
    """Exact Jaccard >= threshold pairs over distinct word n-grams.

    grams-explode (bucketed by a gram hash) -> per-bucket vectorized
    self-merge emits per-gram co-occurring pairs -> pair-count sum =
    |intersection| -> join against broadcast per-doc distinct-gram
    counts for the union.  One shuffle keyed by the gram hash bucket —
    never by raw gram (per-gram Ray groups died of per-group overhead:
    47s -> ~5s at sf0.01).  At 10^12 scale the per-gram pair emission
    is bounded by dropping grams shared by > cap docs (stopword-gram
    guard), standard for this algorithm; unused at test scale."""
    import ray

    def explode_bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        out = make_gram_explode_fn(n)(batch)
        with np.errstate(over="ignore"):
            h = fnv1a_bytes_batch(out["gram"])
        out["bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    grams = ds.map_batches(explode_bucketed, batch_format="pandas")
    gram_counts = grams.groupby("doc_id").count()  # (doc_id, count())
    sizes = {r["doc_id"]: r["count()"] for r in gram_counts.take_all()}
    sizes_ref = ray.put(sizes)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if stopgram_cap is not None:
            # drop grams shared by more than `cap` docs: stopword grams
            # dominate pair emission quadratically while carrying no
            # near-dup signal (a gram lives in exactly one bucket, so
            # this per-bucket count is its exact global count)
            freq = g.groupby("gram")["doc_id"].transform("size")
            g = g[freq <= stopgram_cap]
        m = g[["gram", "doc_id"]].merge(g[["gram", "doc_id"]], on="gram")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
                .size().rename(columns={"doc_id_x": "a", "doc_id_y": "b",
                                        "size": "inter"}))
        # second-level shuffle key: the doc PAIR hash (a pair's partials
        # can span gram buckets)
        out["pairbucket"] = ((out["a"].astype(np.int64) * 1000003
                              + out["b"].astype(np.int64))
                             % n_buckets).astype(np.int64)
        return out

    # a gram lives in exactly one bucket, so per-bucket partial
    # intersections sum to the global intersection
    partial = grams.groupby("bucket").map_groups(bucket_pairs,
                                                 batch_format="pandas")

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        agg = batch.groupby(["a", "b"], as_index=False)["inter"].sum()
        szs = ray.get(sizes_ref)
        union = (agg["a"].map(szs) + agg["b"].map(szs) - agg["inter"])
        agg["jaccard"] = agg["inter"] / union
        keep = agg[agg["jaccard"] >= threshold]
        return keep[["a", "b", "jaccard"]]

    return partial.groupby("pairbucket").map_groups(
        finalize, batch_format="pandas")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MH_PRIME = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(gram_hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x+b) mod p over the shingle hash set."""
    if len(gram_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = gram_hashes.astype(np.uint64)[None, :]
    with np.errstate(over="ignore"):
        vals = (a[:, None] * x + b[:, None]) % _MH_PRIME
    return vals.min(axis=1)


def make_minhash_fn(n: int, num_perm: int, bands: int, seed: int = 7):
    a, b = _perm_params(num_perm, seed)
    rows_per_band = num_perm // bands

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            grams = list(_grams_of(t.split(" "), n))
            with np.errstate(over="ignore"):
                gh = fnv1a_bytes_batch(pd.Series(grams)) if grams else \
                    np.empty(0, np.uint64)
            s = minhash_signature(gh, a, b)
            for bi in range(bands):
                chunk = s[bi * rows_per_band:(bi + 1) * rows_per_band]
                h = np.uint64(0xCBF29CE484222325)
                with np.errstate(over="ignore"):
                    for v in chunk:
                        h = (h ^ v) * np.uint64(0x100000001B3)
                ids.append(d)
                band_ids.append(bi)
                band_hashes.append(np.int64(h >> np.uint64(1)))
        return pd.DataFrame({"doc_id": ids, "band": band_ids,
                             "band_hash": band_hashes})
    return sig


def minhash_lsh_candidates(ds: "ray.data.Dataset", n: int = 3,
                           num_perm: int = 64,
                           bands: int = 16) -> "ray.data.Dataset":
    """Candidate near-dup pairs: docs sharing any LSH band bucket."""
    sigs = ds.map_batches(make_minhash_fn(n, num_perm, bands),
                          batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
        return pd.DataFrame({"a": a, "b": b})

    cand = sigs.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)
    return cand.groupby(["a", "b"]).map_groups(dedup, batch_format="pandas")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over word hashes (sign of per-bit vote sums)."""
    out = np.empty(len(texts), dtype=np.uint64)
    bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        words = pd.Series(t.split(" "))
        with np.errstate(over="ignore"):
            hs = fnv1a_bytes_batch(words)
        bits = (hs[:, None] & bitcols[None, :]) != 0
        votes = bits.sum(axis=0) * 2 - len(hs)
        out[i] = np.sum(bitcols[votes > 0], dtype=np.uint64)
    return out


def make_simhash_fn(bands: int = 4):
    width = 64 // bands

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(batch["text"])
        recs = {"doc_id": [], "band": [], "key": [], "simhash": []}
        for d, h in zip(batch["doc_id"], sh):
            for bi in range(bands):
                key = (h >> np.uint64(bi * width)) & np.uint64(
                    (1 << width) - 1)
                recs["doc_id"].append(d)
                recs["band"].append(bi)
                recs["key"].append(np.int64(key))
                recs["simhash"].append(np.int64(h >> np.uint64(1)))
        return pd.DataFrame(recs)
    return f


def simhash_near_dup_pairs(ds: "ray.data.Dataset", max_hamming: int = 3,
                           bands: int = 4) -> "ray.data.Dataset":
    """Pairs with Hamming(simhash) <= max_hamming, blocked by exact
    match on any of ``bands`` 16-bit bands (guaranteed complete for
    max_hamming < bands by pigeonhole)."""
    sigs = ds.map_batches(make_simhash_fn(bands), batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].tolist()
        hs = sub["simhash"].to_numpy()
        out = {"a": [], "b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin((int(hs[i]) ^ int(hs[j])) & ((1 << 63) - 1)
                          ).count("1")
                if ham <= max_hamming:
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["hamming"].append(ham)
        return pd.DataFrame(out)

    cand = sigs.groupby(["band", "key"]).map_groups(pairs,
                                                    batch_format="pandas")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)
    return cand.groupby(["a", "b"]).map_groups(dedup, batch_format="pandas")


# --------------------------------------------------------------------------
# end-to-end near-dup dedup: candidates -> verify -> components -> survivors
# --------------------------------------------------------------------------


def verify_candidate_pairs(ds: "ray.data.Dataset",
                           candidates: "ray.data.Dataset", n: int = 3,
                           threshold: float = 0.8) -> "ray.data.Dataset":
    """Exact Jaccard check of LSH candidate pairs.

    The per-doc distinct gram-hash sets of *candidate docs only* are
    broadcast (`ray.put`) — candidates are a vanishing fraction of the
    corpus, which is the whole point of LSH; at larger candidate
    volumes this becomes a bucketed self-join like
    ``ngram_jaccard_pairs``."""
    import ray

    cand = candidates.to_pandas()
    if not len(cand):
        return candidates
    involved = set(cand["a"]) | set(cand["b"])

    def gram_sets(batch: pd.DataFrame) -> pd.DataFrame:
        rows = batch[batch["doc_id"].isin(involved)]
        recs = {"doc_id": [], "grams": []}
        for d, t in zip(rows["doc_id"], rows["text"]):
            gr = list(_grams_of(t.split(" "), n))
            with np.errstate(over="ignore"):
                gh = fnv1a_bytes_batch(pd.Series(gr)) if gr else \
                    np.empty(0, np.uint64)
            recs["doc_id"].append(d)
            recs["grams"].append(np.unique(gh))
        return pd.DataFrame(recs)

    sets = {}
    for r in ds.map_batches(gram_sets, batch_format="pandas").take_all():
        sets[r["doc_id"]] = np.asarray(r["grams"], dtype=np.uint64)
    sets_ref = ray.put(sets)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(sets_ref)
        keep = {"a": [], "b": [], "jaccard": []}
        for a, b in zip(batch["a"], batch["b"]):
            ga, gb = s.get(a), s.get(b)
            if ga is None or gb is None or (len(ga) == 0 and len(gb) == 0):
                continue
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                keep["a"].append(a)
                keep["b"].append(b)
                keep["jaccard"].append(j)
        return pd.DataFrame(keep)
    return candidates.map_batches(verify, batch_format="pandas")


def near_dup_survivors(ds: "ray.data.Dataset", n: int = 3,
                       num_perm: int = 64, bands: int = 16,
                       threshold: float = 0.8) -> "ray.data.Dataset":
    """Full near-dup dedup: MinHash-LSH candidates -> exact Jaccard
    verify -> connected components -> keep min doc_id per component.

    Components are resolved with union-find over the *verified edge
    set* on the driver — edges above a high Jaccard threshold are tiny
    relative to the corpus (the standard assumption; for adversarial
    edge volumes switch to iterated min-label propagation with the
    same survivor semantics)."""
    cands = minhash_lsh_candidates(ds, n=n, num_perm=num_perm, bands=bands)
    edges = verify_candidate_pairs(ds, cands, n=n,
                                   threshold=threshold).to_pandas()

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges.get("a", []), edges.get("b", [])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}

    import ray
    drop_ref = ray.put(drop)

    def survivors(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        return batch.loc[~batch["doc_id"].isin(d), ["doc_id"]]
    return ds.map_batches(survivors, batch_format="pandas")
