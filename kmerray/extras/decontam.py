"""Train/eval decontamination over the `documents` table: flag every
training doc that shares at least one word n-gram with a held-out
eval set.

This is the standard benchmark-contamination check a training-data
pipeline runs before every training job (n-gram overlap against the
eval suites).  The eval set here is carved deterministically out of
the corpus itself (``doc_id % EVAL_MOD == EVAL_REM``) so the SQL
oracle can rebuild it exactly; in production it would be read from
its own table.

Scale design: eval suites are SMALL relative to the corpus (MBs of
benchmarks vs TBs of training text), so this is the canonical
broadcast-semi-join — the distinct eval n-gram hash set is built
once with a tiny aggregation, ``ray.put`` once, and every
``map_batches`` task probes it with a sorted ``np.searchsorted``;
the corpus itself streams through untouched (no shuffle at all).
N-grams are keyed by mixing the adjacent 64-bit word hashes
(``((h1*phi ^ h2)*phi) ^ h3``), same ~1e-14 collision caveat as the
other gram operators; the oracle joins on the gram STRINGS, so a
green hash-match also certifies collision-freeness on this corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

import ray.data

from .text import _GRAM_MIX, content_hash64, flat_words

EVAL_MOD, EVAL_REM = 10, 7
NGRAM = 3


def _gram_keys(batch_texts, n: int = NGRAM):
    """(row ids, 64-bit gram keys) for all within-row word n-grams."""
    vals, offs = flat_words(batch_texts)
    rowid = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    wh = content_hash64(vals)
    gk = wh.copy()
    same = np.ones(len(wh), dtype=bool)
    for j in range(1, n):
        gk = (gk[:-1] * _GRAM_MIX) ^ wh[j:]
        same = same[:-1] & (rowid[: len(wh) - j] == rowid[j:])
    keep = same
    return rowid[: len(gk)][keep], gk[keep]


def _distinct_per_row(rowid: np.ndarray, keys: np.ndarray):
    order = np.lexsort((keys, rowid))
    sr, sk = rowid[order], keys[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (sr[1:] != sr[:-1]) | (sk[1:] != sk[:-1])
    return sr[first], sk[first]


def eval_gram_hashes(ds: "ray.data.Dataset", n: int = NGRAM) -> np.ndarray:
    """Sorted distinct n-gram hashes of the eval docs.  Per-batch
    uniques ride a tiny collect (eval sets are small by design).
    The eval mask is applied vectorized inside the batch fn (Ray's
    `filter(expr=...)` can't express modulo)."""
    def _grams(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"].to_numpy() % EVAL_MOD == EVAL_REM]
        _, gk = _gram_keys(b["text"], n)
        return pd.DataFrame({"gram": np.unique(gk)})

    out = ds.map_batches(_grams, batch_format="pandas")
    # arrow-block collect, NOT take_all(): Ray's per-row conversion is
    # ~100x slower than a zero-copy block gather at this size
    # (measured 225 s vs 1.4 s on 590k rows)
    import pyarrow as pa
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return np.array([], dtype=np.uint64)
    return np.unique(
        pa.concat_tables(tabs).column("gram").to_numpy().astype(np.uint64))


def decontam_pipeline(ds: "ray.data.Dataset",
                      n: int = NGRAM) -> "ray.data.Dataset":
    """Per non-eval doc: how many of its DISTINCT n-grams appear in
    the eval set, and the contaminated flag.

    Output: ``(doc_id, n_hits:int64, contaminated:bool)``."""
    eval_ref = ray.put(eval_gram_hashes(ds, n))

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eval_ref)
        b = (b[b["doc_id"].to_numpy() % EVAL_MOD != EVAL_REM]
             .reset_index(drop=True))
        rowid, gk = _gram_keys(b["text"], n)
        drow, dk = _distinct_per_row(rowid, gk)
        if len(ev):
            pos = np.searchsorted(ev, dk)
            hit = (pos < len(ev)) \
                & (ev[np.minimum(pos, len(ev) - 1)] == dk)
        else:                       # empty eval slice: nothing hits
            hit = np.zeros(len(dk), bool)
        hits = np.bincount(drow[hit], minlength=len(b)).astype(np.int64)
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_hits": hits,
                             "contaminated": hits > 0})

    return ds.map_batches(_score, batch_format="pandas")


def decontam_frac_pipeline(ds: "ray.data.Dataset",
                           n: int = NGRAM) -> "ray.data.Dataset":
    """GPT-3-appendix-C-style contamination REPORTING: per non-eval
    doc, the distinct-gram overlap count, the doc's distinct-gram
    total, and the overlap fraction — the surface a release report
    ranks and thresholds, where decontam_pipeline only flags.

    Same broadcast-probe design as decontam_pipeline (the eval gram
    set ships once via ``ray.put``; the corpus streams; zero
    shuffles).  ``frac`` is one IEEE double division of the two int64
    columns, so numpy and SQL produce the identical bits; docs with
    fewer than ``n`` words have no grams and report frac 0.0.

    Output: ``(doc_id, n_hits:int64, n_grams:int64, frac:double)``."""
    eval_ref = ray.put(eval_gram_hashes(ds, n))

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eval_ref)
        b = (b[b["doc_id"].to_numpy() % EVAL_MOD != EVAL_REM]
             .reset_index(drop=True))
        rowid, gk = _gram_keys(b["text"], n)
        drow, dk = _distinct_per_row(rowid, gk)
        if len(ev):
            pos = np.searchsorted(ev, dk)
            hit = (pos < len(ev)) \
                & (ev[np.minimum(pos, len(ev) - 1)] == dk)
        else:
            hit = np.zeros(len(dk), bool)
        hits = np.bincount(drow[hit], minlength=len(b)).astype(np.int64)
        totals = np.bincount(drow, minlength=len(b)).astype(np.int64)
        frac = np.where(totals > 0,
                        hits.astype(np.float64)
                        / np.maximum(totals, 1).astype(np.float64), 0.0)
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_hits": hits,
                             "n_grams": totals,
                             "frac": frac})

    return ds.map_batches(_score, batch_format="pandas")


def decontam_spans_pipeline(ds: "ray.data.Dataset",
                            n: int = NGRAM) -> "ray.data.Dataset":
    """Span-level decontamination (the Dolma-style upgrade to
    :func:`decontam_pipeline`): instead of dropping a contaminated
    doc, MASK exactly the words covered by any eval-matching n-gram
    (every position in a hit gram's [i, i+n) span becomes
    ``<MASKED>``) and keep the rest — the standard way to retain
    training text that merely quotes a benchmark.

    Same broadcast-probe scale shape as the doc-level op: eval gram
    hashes ``ray.put`` once, the corpus streams, zero shuffles.  The
    span mask is one diff-array cumsum over the FLAT batch word
    buffer (gram spans never cross rows, so row bounds are
    preserved), and the scrubbed text is reassembled with ONE Arrow
    ``binary_join`` — no per-row Python in the mask or join.

    Output: ``(doc_id, n_masked:int64, scrubbed:string)``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    eval_ref = ray.put(eval_gram_hashes(ds, n))

    def _scrub(b: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eval_ref)
        b = (b[b["doc_id"].to_numpy() % EVAL_MOD != EVAL_REM]
             .reset_index(drop=True))
        vals, offs = flat_words(b["text"])
        rowid, gk = _gram_keys(b["text"], n)
        # positional hits: gram starts whose key is in the eval set
        # (rowid from _gram_keys is per gram START, aligned with the
        # flat word index of that start)
        if len(ev):
            pos = np.searchsorted(ev, gk)
            hit = (pos < len(ev)) \
                & (ev[np.minimum(pos, len(ev) - 1)] == gk)
        else:                       # empty eval slice: nothing hits
            hit = np.zeros(len(gk), bool)
        # flat start index of each (kept) gram: _gram_keys keeps grams
        # in flat order, so reconstruct starts by scanning the same
        # validity mask it used
        wh_len = len(vals)
        same = np.ones(wh_len, dtype=bool)
        rid_full = np.repeat(np.arange(len(b)), np.diff(offs))
        for j in range(1, n):
            same = same[:-1] & (rid_full[: wh_len - j] == rid_full[j:])
        starts_flat = np.flatnonzero(same)
        assert len(starts_flat) == len(gk)
        hs = starts_flat[hit]
        # diff-array span mask over the flat buffer
        diff = np.zeros(wh_len + 1, np.int64)
        np.add.at(diff, hs, 1)
        np.add.at(diff, hs + n, -1)
        masked = np.cumsum(diff[:-1]) > 0
        replaced = np.where(masked, "<MASKED>", vals).astype(object)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(replaced, pa.string()))
        scrubbed = pc.binary_join(lists, " ")
        c = np.zeros(wh_len + 1, np.int64)
        np.cumsum(masked, out=c[1:])
        per_row = c[offs[1:]] - c[offs[:-1]]
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype(np.int64),
            "n_masked": per_row,
            "scrubbed": scrubbed.to_pandas()})

    return ds.map_batches(_scrub, batch_format="pandas")


# --- Bloom-prefilter decontamination: the memory-bounded scale path -

BLOOM_M = 1 << 20          # bitmap bits (128 KiB packed)
BLOOM_J = 4                # hash probes per key
_GRAM_B = 64               # gram-key exchange buckets
_DOC_B = 32                # doc-id merge buckets


def _bloom_positions(keys: np.ndarray, m: int, j: int) -> np.ndarray:
    """Double-hashed bit positions (Kirsch & Mitzenmacher 2006): the
    64-bit gram key supplies both strides, h2 forced odd so the probe
    sequence never degenerates."""
    h1 = keys % np.uint64(m)
    h2 = ((keys >> np.uint64(32)) | np.uint64(1)) % np.uint64(m)
    return np.concatenate([(h1 + np.uint64(i) * h2) % np.uint64(m)
                           for i in range(j)])


def bloom_build(ds: "ray.data.Dataset", n: int = NGRAM,
                m: int = BLOOM_M, j: int = BLOOM_J) -> np.ndarray:
    """Packed m-bit Bloom bitmap over the eval slice's distinct gram
    keys.  Each block contributes a FIXED m/8-byte partial regardless
    of corpus size (the HLL/count-min combiner discipline) and the OR
    merge is order/partition-invariant, so the driver folds
    O(blocks) x 128 KiB — never the gram set itself."""
    def part(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"].to_numpy() % EVAL_MOD == EVAL_REM]
        _, gk = _gram_keys(b["text"], n)
        bits = np.zeros(m, dtype=bool)
        if len(gk):
            bits[_bloom_positions(np.unique(gk), m, j)] = True
        return pd.DataFrame({"part": [np.packbits(bits).tobytes()]})

    parts = ds.map_batches(part, batch_format="pandas").take_all()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for r in parts:
        acc |= np.frombuffer(r["part"], dtype=np.uint8)
    return acc


def bloom_decontam_pipeline(ds: "ray.data.Dataset", n: int = NGRAM,
                            m: int = BLOOM_M,
                            j: int = BLOOM_J) -> "ray.data.Dataset":
    """Decontamination when the eval gram set itself is too big to
    broadcast (multi-suite eval unions at web-crawl gram counts) —
    the two-tier filter a 100-TB pipeline actually ships:

    1. a 128-KiB Bloom bitmap of the eval grams is broadcast instead
       of the gram set (:func:`bloom_build`; ~10^4x smaller);
    2. the probe pass drops every train gram the bitmap rejects —
       Bloom has NO false negatives, so nothing true is lost, and
       only the ~fp-rate survivors ride the exchange;
    3. the survivors are exact-confirmed against the true eval grams
       in ONE gram-key-bucketed exchange (no broadcast of the gram
       set, no all-to-all of the corpus grams — the shuffle carries
       eval grams + Bloom survivors only);
    4. per-doc hit partials fold in a doc-bucketed merge with a
       zero baseline so clean docs keep their row.

    Same output contract as :func:`decontam_pipeline` —
    ``(doc_id, n_hits:int64, contaminated:bool)`` — and the SAME SQL
    oracle certifies both paths (integer surface, no floats).
    """
    bloom_ref = ray.put(bloom_build(ds, n, m, j))

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        packed = ray.get(bloom_ref)
        bits = np.unpackbits(packed).view(bool)
        is_eval = b["doc_id"].to_numpy() % EVAL_MOD == EVAL_REM
        ev = b[is_eval]
        tr = b[~is_eval].reset_index(drop=True)
        frames = []
        _, egk = _gram_keys(ev["text"], n)
        egk = np.unique(egk)
        if len(egk):
            frames.append(pd.DataFrame({
                "gb": (egk % np.uint64(_GRAM_B)).astype(np.int64),
                "kind": np.zeros(len(egk), np.int64),
                "key": egk,
                "doc_id": np.full(len(egk), -1, np.int64)}))
        rowid, gk = _gram_keys(tr["text"], n)
        drow, dk = _distinct_per_row(rowid, gk)
        if len(dk):
            # Bloom prefilter: all j probes must hit
            ok = np.ones(len(dk), dtype=bool)
            pos = _bloom_positions(dk, m, j).reshape(j, -1)
            for i in range(j):
                ok &= bits[pos[i]]
            drow, dk = drow[ok], dk[ok]
        if len(dk):
            frames.append(pd.DataFrame({
                "gb": (dk % np.uint64(_GRAM_B)).astype(np.int64),
                "kind": np.ones(len(dk), np.int64),
                "key": dk,
                "doc_id": tr["doc_id"].to_numpy()[drow].astype(np.int64),
            }))
        if not frames:
            return pd.DataFrame({"gb": np.array([], np.int64),
                                 "kind": np.array([], np.int64),
                                 "key": np.array([], np.uint64),
                                 "doc_id": np.array([], np.int64)})
        return pd.concat(frames, ignore_index=True)

    def confirm(g: pd.DataFrame) -> pd.DataFrame:
        ev = np.unique(g.loc[g["kind"].to_numpy() == 0, "key"]
                       .to_numpy().astype(np.uint64))
        cand = g[g["kind"].to_numpy() == 1]
        keys = cand["key"].to_numpy().astype(np.uint64)
        if len(ev) and len(keys):
            p = np.searchsorted(ev, keys)
            hit = (p < len(ev)) & (ev[np.minimum(p, len(ev) - 1)] == keys)
        else:
            hit = np.zeros(len(keys), dtype=bool)
        hits = (cand.loc[hit, ["doc_id"]]
                .groupby("doc_id", as_index=False).size()
                .rename(columns={"size": "h"}))
        hits["h"] = hits["h"].astype(np.int64)
        hits["db"] = (hits["doc_id"].to_numpy() % _DOC_B).astype(np.int64)
        return hits[["db", "doc_id", "h"]]

    confirmed = (ds.map_batches(emit, batch_format="pandas")
                 .groupby("gb").map_groups(confirm,
                                           batch_format="pandas"))

    def baseline(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        ids = ids[ids % EVAL_MOD != EVAL_REM].astype(np.int64)
        return pd.DataFrame({"db": (ids % _DOC_B).astype(np.int64),
                             "doc_id": ids,
                             "h": np.zeros(len(ids), np.int64)})

    base = ds.map_batches(baseline, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", as_index=False)["h"].sum()
               .rename(columns={"h": "n_hits"}))
        out["n_hits"] = out["n_hits"].astype(np.int64)
        out["contaminated"] = out["n_hits"] > 0
        return out[["doc_id", "n_hits", "contaminated"]]

    return (confirmed.union(base)
            .groupby("db").map_groups(fold, batch_format="pandas"))
