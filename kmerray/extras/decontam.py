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
