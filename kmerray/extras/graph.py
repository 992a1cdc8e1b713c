"""Graph centrality over relational event/order data: integer
fixed-point PageRank on the co-order item-transition graph.

Link-graph centrality is a first-class web-corpus curation signal
(Common-Crawl-derived corpora rank hosts by harmonic/PageRank
centrality to pick what to fetch and keep).  The classic float
PageRank is NOT reproducible across engines — per-node in-neighbor
sums accumulate in engine-specific order — so this op defines the
deterministic integer variant: ranks are ppm fixed-point int64, every
iteration is

    contrib(s -> t) = r(s) // out_deg(s)          (int64 floor div)
    r'(t) = (15 * SCALE) // 100
            + (85 * sum of in-contribs) // 100    (exact int64 sum)

which is order-invariant and bit-identical to the SQL unrolled CTE
twin.  Dangling-node mass (nodes with no out-edges) leaks — the
standard "no dangling redistribution" PageRank variant, documented
divergence from the stochastic-matrix formulation.

Scale shape (nothing node- or edge-sized ever lands on the driver):

* edge build = ONE order-keyed exchange (order rows span input
  blocks, so consecutive-linenumber pairing is inherently an
  exchange — the lag/sessionize discipline);
* node universe + out-degrees = ONE fused node-bucketed exchange of
  per-block distinct-part partials and per-edge-block degree
  partials;
* each iteration = 2 bucketed exchanges: ranks co-grouped with the
  src-bucketed edge table (contribs pre-summed per dst inside the
  bucket, so the second exchange carries at most one row per
  (bucket, dst)), then dst-bucketed fold with the node universe so
  in-degree-0 nodes keep the base rank.  Ranks re-materialize per
  iteration to cut lineage (the kmeans_fit loop discipline); edges
  and the node table materialize once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

PR_SCALE = 1_000_000           # ppm fixed point
PR_DAMP_NUM = 85               # damping 0.85 as an exact 85//100
PR_ITERS = 5
# broadcast-path bound: rank+deg+node int64 triples, ~1.6 GB at 50M
import os as _os
PR_BROADCAST_MAX_NODES = int(_os.environ.get(
    "KMERRAY_PR_BROADCAST_MAX_NODES", 50_000_000))


def _runs_starts(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sort order, run-start mask) for one int64 key column."""
    order = np.argsort(keys, kind="stable")
    s = keys[order]
    first = np.ones(len(s), dtype=bool)
    first[1:] = s[1:] != s[:-1]
    return order, first


def order_transition_edges(lineitem: "ray.data.Dataset",
                           n_buckets: int = 32) -> "ray.data.Dataset":
    """Directed item-transition edges: within each order (sorted by
    linenumber) every consecutive part pair emits ``src -> dst`` —
    the co-purchase graph.  One order-hash-bucketed exchange; edges
    come back bucketed by ``sb = src % n_buckets`` for the iteration
    joins."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ok": batch["l_orderkey"].astype(np.int64),
            "ln": batch["l_linenumber"].astype(np.int64),
            "pk": batch["l_partkey"].astype(np.int64),
            "ob": batch["l_orderkey"].astype(np.int64) % n_buckets})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["ok"].to_numpy()
        ln = g["ln"].to_numpy()
        pk = g["pk"].to_numpy()
        # partkey tiebreak: the synthetic lineitem carries duplicate
        # (orderkey, linenumber) pairs, so a bare linenumber sort
        # would leave the transition sequence engine-dependent
        order = np.lexsort((pk, ln, ok))
        ok, pk = ok[order], pk[order]
        same = ok[1:] == ok[:-1]
        src = pk[:-1][same]
        dst = pk[1:][same]
        return pd.DataFrame({"src": src, "dst": dst,
                             "sb": src % n_buckets})

    return (lineitem.map_batches(tag, batch_format="pandas")
            .groupby("ob").map_groups(pairs, batch_format="pandas"))


def pagerank(lineitem: "ray.data.Dataset", iters: int = PR_ITERS,
             n_buckets: int = 32,
             force: str | None = None) -> "ray.data.Dataset":
    """Integer fixed-point PageRank over the co-order item graph.

    Output: ``(node, rank, deg)`` — ``node`` = l_partkey, ``rank``
    the exact int64 ppm rank after ``iters`` iterations, ``deg`` the
    out-degree.  Bit-identical to the unrolled SQL CTE twin
    (kmerray/oracle.py pagerank_sql).

    Two size-routed iteration engines (the cov-dictionary auto-route
    discipline), identical results (pytest holds the parity):

    * ``broadcast`` (node count ≤ ``PR_BROADCAST_MAX_NODES``, default
      50M ≈ 1.6 GB of plasma-resident int64 triples): the rank/degree
      vector lives on the driver, per iteration the per-node contrib
      vector is ``ray.put`` once and one stateless ``map_batches``
      over the materialized edge table emits per-block dst-sum
      partials, merged by ONE node-bucketed exchange to ≤ node-sized
      rows before the driver folds them — the kmeans_fit
      sufficient-statistics loop; edges never re-shuffle.
    * ``exchange`` (``force="exchange"`` or above the bound): fully
      distributed — ranks ride a src-bucket co-group with the edge
      table, contribs pre-sum per dst in-bucket, then a dst-bucket
      fold with the node universe; nothing node- or edge-sized on
      the driver.  Ray Data's groupby cannot reuse a prior
      partitioning, so the edge table re-rides the exchange each
      iteration — beyond ~50M nodes a production deployment would
      shard the rank table (the cov sharded-actor discipline)
      instead of paying that re-shuffle."""
    base = (100 - PR_DAMP_NUM) * PR_SCALE // 100

    edges = order_transition_edges(lineitem, n_buckets).materialize()

    # --- node universe + out-degree: one fused node-bucket exchange
    def node_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pk = np.unique(batch["l_partkey"].to_numpy().astype(np.int64))
        return pd.DataFrame({
            "node": pk, "c": np.zeros(len(pk), dtype=np.int64),
            "kind": np.zeros(len(pk), dtype=np.int64),
            "nb": pk % n_buckets})

    def deg_partial(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["src"].to_numpy()
        u, cnt = np.unique(src, return_counts=True)
        return pd.DataFrame({
            "node": u, "c": cnt.astype(np.int64),
            "kind": np.ones(len(u), dtype=np.int64),
            "nb": u % n_buckets})

    def node_merge(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy()
        c = g["c"].to_numpy()
        order, first = _runs_starts(node)
        sn, sc = node[order], c[order]
        starts = np.flatnonzero(first)
        csum = np.zeros(len(sn) + 1, dtype=np.int64)
        np.cumsum(sc, out=csum[1:])
        ends = np.append(starts[1:], len(sn))
        return pd.DataFrame({
            "node": sn[starts],
            "deg": csum[ends] - csum[starts],
            "nb": sn[starts] % n_buckets})

    nodes = (lineitem.map_batches(node_partial, batch_format="pandas")
             .union(edges.map_batches(deg_partial,
                                      batch_format="pandas"))
             .groupby("nb").map_groups(node_merge,
                                       batch_format="pandas")
             .materialize())

    if force != "exchange" and \
            nodes.count() <= PR_BROADCAST_MAX_NODES:
        return _pagerank_broadcast(edges, nodes, iters, n_buckets,
                                   base)

    def init_rank(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["r"] = np.full(len(b), PR_SCALE, dtype=np.int64)
        return b[["node", "r", "deg", "nb"]]

    ranks = nodes.map_batches(init_rank,
                              batch_format="pandas").materialize()

    # edge rows and rank rows share one tagged schema for the
    # co-grouped src-bucket join (k=0 edge: a=src b=dst; k=1 rank:
    # a=node b=r c=deg)
    def edge_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": np.zeros(len(b), dtype=np.int64),
            "a": b["src"].astype(np.int64),
            "b": b["dst"].astype(np.int64),
            "c": np.zeros(len(b), dtype=np.int64),
            "bkt": b["sb"].astype(np.int64)})

    def rank_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": np.ones(len(b), dtype=np.int64),
            "a": b["node"].astype(np.int64),
            "b": b["r"].astype(np.int64),
            "c": b["deg"].astype(np.int64),
            "bkt": b["nb"].astype(np.int64)})

    edges_tagged = edges.map_batches(
        edge_tag, batch_format="pandas").materialize()

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy()
        is_r = k == 1
        node = g["a"].to_numpy()[is_r]
        r = g["b"].to_numpy()[is_r]
        d = g["c"].to_numpy()[is_r]
        order = np.argsort(node, kind="stable")
        node, r, d = node[order], r[order], d[order]
        src = g["a"].to_numpy()[~is_r]
        dst = g["b"].to_numpy()[~is_r]
        if len(src) == 0:
            return pd.DataFrame({
                "node": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int64),
                "nb": pd.Series([], dtype=np.int64)})
        idx = np.searchsorted(node, src)
        # every edge src has a rank row in its own bucket by
        # construction (sb == nb for the same id)
        co = r[idx] // d[idx]
        dorder, dfirst = _runs_starts(dst)
        sd, sc = dst[dorder], co[dorder]
        starts = np.flatnonzero(dfirst)
        csum = np.zeros(len(sd) + 1, dtype=np.int64)
        np.cumsum(sc, out=csum[1:])
        ends = np.append(starts[1:], len(sd))
        out_n = sd[starts]
        return pd.DataFrame({
            "node": out_n, "c": csum[ends] - csum[starts],
            "kind": np.ones(len(out_n), dtype=np.int64),
            "nb": out_n % n_buckets})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # node universe rows (kind 0, c = deg) + contrib partials
        kind = g["kind"].to_numpy()
        node = g["node"].to_numpy()
        c = g["c"].to_numpy()
        uni = kind == 0
        un = node[uni]
        ud = c[uni]
        uorder = np.argsort(un, kind="stable")
        un, ud = un[uorder], ud[uorder]
        cn, cc = node[~uni], c[~uni]
        summed = np.zeros(len(un), dtype=np.int64)
        if len(cn):
            idx = np.searchsorted(un, cn)
            np.add.at(summed, idx, cc)
        r = base + PR_DAMP_NUM * summed // 100
        return pd.DataFrame({"node": un, "r": r, "deg": ud,
                             "nb": un % n_buckets})

    def universe_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": b["node"].astype(np.int64),
            "c": b["deg"].astype(np.int64),
            "kind": np.zeros(len(b), dtype=np.int64),
            "nb": b["nb"].astype(np.int64)})

    universe = nodes.map_batches(universe_tag,
                                 batch_format="pandas").materialize()

    for _ in range(iters):
        parts = (edges_tagged
                 .union(ranks.map_batches(rank_tag,
                                          batch_format="pandas"))
                 .groupby("bkt")
                 .map_groups(contrib, batch_format="pandas"))
        ranks = (universe.union(parts)
                 .groupby("nb").map_groups(fold,
                                           batch_format="pandas")
                 .materialize())

    def out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"].astype(np.int64),
                             "rank": b["r"].astype(np.int64),
                             "deg": b["deg"].astype(np.int64)})

    return ranks.map_batches(out, batch_format="pandas")


def _pagerank_broadcast(edges: "ray.data.Dataset",
                        nodes: "ray.data.Dataset", iters: int,
                        n_buckets: int, base: int) -> "ray.data.Dataset":
    """Broadcast-iterate engine: the sorted (node, deg) vector is
    gathered once (arrow-block gather, bounded by the node-count
    route guard), each iteration ships ONE plasma-resident contrib
    vector and runs one stateless pass over the materialized edge
    table; per-block dst-sum partials merge through one node-bucketed
    exchange down to ≤ node-sized rows before the driver folds them
    (the kmeans_fit sufficient-statistics loop).  Edges never
    re-shuffle and ranks never ride an exchange."""
    tabs = [t for t in ray.get(nodes.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "deg": pd.Series([], dtype=np.int64)}))
    nt = pa.concat_tables(tabs)
    node = nt.column("node").to_numpy()
    deg = nt.column("deg").to_numpy()
    order = np.argsort(node, kind="stable")
    node, deg = node[order], deg[order]
    safe_deg = np.maximum(deg, 1)       # dangling rows never probed
    r = np.full(len(node), PR_SCALE, dtype=np.int64)

    def partial_factory(ref):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            n_, c_ = ray.get(ref)
            src = b["src"].to_numpy()
            dst = b["dst"].to_numpy()
            co = c_[np.searchsorted(n_, src)]
            dorder, dfirst = _runs_starts(dst)
            sd, sc = dst[dorder], co[dorder]
            starts = np.flatnonzero(dfirst)
            csum = np.zeros(len(sd) + 1, dtype=np.int64)
            np.cumsum(sc, out=csum[1:])
            ends = np.append(starts[1:], len(sd))
            out_n = sd[starts]
            return pd.DataFrame({
                "node": out_n, "c": csum[ends] - csum[starts],
                "nb": out_n % n_buckets})
        return fn

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gn = g["node"].to_numpy()
        gc = g["c"].to_numpy()
        gorder, gfirst = _runs_starts(gn)
        sn, sc = gn[gorder], gc[gorder]
        starts = np.flatnonzero(gfirst)
        csum = np.zeros(len(sn) + 1, dtype=np.int64)
        np.cumsum(sc, out=csum[1:])
        ends = np.append(starts[1:], len(sn))
        return pd.DataFrame({"node": sn[starts],
                             "c": csum[ends] - csum[starts]})

    for _ in range(iters):
        ref = ray.put((node, r // safe_deg))
        parts = (edges.map_batches(partial_factory(ref),
                                   batch_format="pandas")
                 .groupby("nb").map_groups(merge,
                                           batch_format="pandas"))
        acc = np.zeros(len(node), dtype=np.int64)
        for t in ray.get(parts.to_arrow_refs()):
            if not t.num_rows:
                continue
            pn = t.column("node").to_numpy()
            pc = t.column("c").to_numpy()
            np.add.at(acc, np.searchsorted(node, pn), pc)
        r = base + PR_DAMP_NUM * acc // 100

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node), "rank": pa.array(r),
        "deg": pa.array(deg)}))
