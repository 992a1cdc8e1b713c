"""Sketch operators: distributed HyperLogLog distinct counting.

At 100 TB an exact distinct count per group is an all-to-all shuffle
of every key occurrence; the HLL sketch replaces it with one
streaming pass — each block emits a fixed 2^p-byte register vector
per group, merges are element-wise max (associative, commutative,
idempotent → order- and partitioning-independent), and the estimate
is a pure function of the merged registers.  The whole pipeline is
therefore DETERMINISTIC for a given corpus, which is what lets a
plain SQL-literal oracle gate it: an independent single-process HLL
(same published spec, different code) must produce bit-identical
registers and hence the identical estimate.

Spec pinned here (classic Flajolet et al. 2007 HLL, no sparse mode):
  - hash: splitmix64 of the int64 key (public mixer constants)
  - p bits of the hash index the register, rho = leading-zero count
    of the remaining (64-p) bits + 1
  - estimate: alpha_m * m^2 / sum(2^-reg), linear counting below
    2.5m with empty registers, no large-range correction (64-bit
    hash space makes it irrelevant at these cardinalities)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

HLL_P = 12
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixer; the same
    constants appear in the reference implementation of SplitMix and
    in xoshiro seeding)."""
    z = x.astype(np.uint64) + _SM_GAMMA
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def _registers(keys: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Dense register vector (2^p uint8) for a batch of int64 keys."""
    m = 1 << p
    h = splitmix64(keys.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rho = leading zeros of the remaining bits + 1 (the OR above
    # plants a stop bit so rho is capped at 64 - p + 1 exactly)
    cur = rest.copy()
    ones = np.uint64(1)
    # leading-zero count via float64 exponent is unsafe (53-bit
    # mantissa); do a 6-step binary clz — fully vectorized
    shift = 32
    lz = np.zeros(len(h), np.uint64)
    while shift >= 1:
        s = np.uint64(shift)
        mask = cur < (ones << np.uint64(64 - shift))
        lz[mask] += s
        with np.errstate(over="ignore"):
            cur[mask] = cur[mask] << s
        shift //= 2
    rho = (lz + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: "ray.data.Dataset", key: str, group: str,
                 p: int = HLL_P) -> "ray.data.Dataset":
    """Per-``group`` approximate distinct ``key`` count.

    Per-block partials emit one (group, registers) row (fixed
    2^p bytes regardless of block size — the combiner), ONE tiny
    group-keyed exchange max-merges them, and the estimate is
    computed inside the group body.  Nothing corpus-sized moves.

    Output: ``(<group>:string, est:double)`` — deterministic (max is
    order-independent), so the exact independent-fit oracle matches
    bit-for-bit."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out_g, out_r = [], []
        for g, sub in b.groupby(group, sort=False):
            regs = _registers(sub[key].to_numpy(np.int64), p)
            out_g.append(g)
            out_r.append(regs)
        return pd.DataFrame({group: np.array(out_g, object),
                             "regs": [r.tobytes() for r in out_r]})

    part = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << p, np.uint8)
        for blob in g["regs"]:
            np.maximum(acc, np.frombuffer(blob, np.uint8), out=acc)
        return pd.DataFrame({group: [g[group].iloc[0]],
                             "est": [_estimate(acc)]})

    return part.groupby(group).map_groups(merge, batch_format="pandas")


CMS_DEPTH = 4
CMS_WIDTH = 1024
# per-row salts for the d independent hash functions (splitmix64 of
# the salted key); arbitrary public constants, pinned as part of the
# spec so the independent oracle fit reproduces the registers exactly
CMS_SALTS = (0x0, 0x5DEECE66D, 0x2545F4914F6CDD1D, 0x9E3779B9)


def cms_registers(keys: np.ndarray, counts: np.ndarray,
                  depth: int = CMS_DEPTH,
                  width: int = CMS_WIDTH) -> np.ndarray:
    """Count-min register matrix (depth x width int64) for weighted
    keys: row j uses splitmix64(key ^ salt_j) % width.  Registers are
    SUMS, so the merge is element-wise addition — exact integers,
    order/partition-invariant."""
    regs = np.zeros((depth, width), np.int64)
    k = keys.astype(np.uint64)
    for j in range(depth):
        h = splitmix64(k ^ np.uint64(CMS_SALTS[j])) % np.uint64(width)
        np.add.at(regs[j], h.astype(np.int64), counts)
    return regs


def cms_estimate(regs: np.ndarray, keys: np.ndarray,
                 width: int = CMS_WIDTH) -> np.ndarray:
    """Point estimates: min over rows of the hashed register (the CM
    guarantee: est >= true, est <= true + eps*N w.h.p.)."""
    k = keys.astype(np.uint64)
    est = None
    for j in range(len(regs)):
        h = (splitmix64(k ^ np.uint64(CMS_SALTS[j]))
             % np.uint64(width)).astype(np.int64)
        e = regs[j][h]
        est = e if est is None else np.minimum(est, e)
    return est


def cms_word_counts(ds: "ray.data.Dataset",
                    depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> np.ndarray:
    """Distributed count-min over the corpus's word stream (Cormode &
    Muthukrishnan 2005): each block emits ONE fixed depth x width
    int64 partial built from its pre-collapsed word uniques, and the
    driver sums the tiny matrices — heavy-hitter count estimates with
    NO vocabulary shuffle and corpus-size-independent exchange (the
    register stream is blocks x 32 KB).

    Returns the merged register matrix."""
    from .text import _md5_word_hash, flat_words

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = flat_words(b["text"])
        uh, cnt = np.unique(_md5_word_hash(vals), return_counts=True)
        regs = cms_registers(uh, cnt.astype(np.int64), depth, width)
        return pd.DataFrame({"row": np.arange(depth, dtype=np.int64),
                             "regs": [r.tobytes() for r in regs]})

    out = ds.map_batches(partial, batch_format="pandas")
    import ray as _ray
    tabs = [t for t in _ray.get(out.to_arrow_refs()) if t.num_rows]
    regs = np.zeros((depth, width), np.int64)
    for t in tabs:
        rows = t.column("row").to_pylist()
        blobs = t.column("regs").to_pylist()
        for r, blob in zip(rows, blobs):
            regs[r] += np.frombuffer(blob, np.int64)
    return regs


# ---------------------------------------------------------------------------
# Misra-Gries certified heavy hitters
# ---------------------------------------------------------------------------

MG_M = 4096        # summary capacity (per block and at the merge)
MG_TOPK = 10


def mg_summary(words: np.ndarray, counts: np.ndarray,
               m: int = MG_M) -> tuple:
    """Collapse an exact (word, count) table to a Misra-Gries summary
    of at most ``m`` entries (Misra & Gries 1982 via the mergeable-
    summaries reduction of Agarwal et al. 2012): subtract ``delta`` =
    the (m+1)-th largest count and keep the strictly positive
    residuals.  Every kept residual underestimates the true count by
    at most ``delta``, and any dropped word had count <= ``delta``.

    Returns ``(words, residual_counts, delta)``."""
    if len(words) <= m:
        return words, counts, 0
    part = np.partition(counts, len(counts) - (m + 1))
    delta = int(part[len(counts) - (m + 1)])
    keep = counts > delta
    return words[keep], (counts[keep] - delta).astype(np.int64), delta


def mg_merge(parts: "pd.DataFrame", m: int = MG_M) -> tuple:
    """Fold per-block MG partials (columns ``word``/``c``; one
    sentinel row per block with ``word`` None carrying that block's
    subtracted delta) into a single summary.  Returns
    ``(merged: Series word->residual, D: int)`` where ``D`` bounds the
    total undercount: for EVERY word, ``true - D <= residual <= true``
    (absent words have residual 0), so any word with true count > D
    is guaranteed to survive."""
    sent = parts["word"].isna()
    d_blocks = int(parts.loc[sent, "c"].sum())
    merged = parts.loc[~sent].groupby("word")["c"].sum()
    d_merge = 0
    if len(merged) > m:
        vals = merged.to_numpy()
        part = np.partition(vals, len(vals) - (m + 1))
        d_merge = int(part[len(vals) - (m + 1)])
        merged = merged[merged > d_merge] - d_merge
    return merged, d_blocks + d_merge


def mg_topwords(ds: "ray.data.Dataset", k: int = MG_TOPK,
                m: int = MG_M) -> "pd.DataFrame":
    """Exact global top-``k`` words WITHOUT any word-keyed exchange —
    the heavy-hitter scale path past even :func:`word_counts`' vocab-
    sized shuffle (the bloom_decontam discipline applied to top-k):

    1. Each block emits a fixed <= (m+1)-row Misra-Gries partial (its
       exact block counts collapsed by :func:`mg_summary`) — the
       driver folds <= blocks x (m+1) rows, never the vocabulary.
    2. The fold's error certificate D bounds every undercount, so the
       survivor set provably contains every word with true count > D.
    3. The <= m candidates broadcast once (``ray.put``); a second
       streaming pass counts ONLY candidate occurrences per block and
       the driver folds <= blocks x |C| scalars — exact counts.
    4. Certificate check: if the exact k-th candidate count > D the
       top-k is PROVABLY exact (any non-candidate has true count
       <= D); on the (adversarially flat) corpora where it fails, fall
       back to :func:`..text.exact_topk_words`' vocab-exchange path —
       the op is therefore unconditionally exact.

    Ties break (cnt DESC, word ASC) — the cms gate's contract.
    Output: pandas ``(word, cnt:int64, rank:int64)``."""
    import ray as _ray
    from .text import exact_topk_words, flat_words

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = flat_words(b["text"])
        uniq, cnt = np.unique(vals, return_counts=True)
        w, c, d = mg_summary(uniq.astype(object), cnt.astype(np.int64), m)
        out = pd.DataFrame({"word": w, "c": c})
        sent = pd.DataFrame({"word": np.array([None], dtype=object),
                             "c": np.array([d], dtype=np.int64)})
        return pd.concat([out, sent], ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged, err = mg_merge(parts, m)
    cand = np.sort(merged.index.to_numpy(dtype=object))
    if len(cand) == 0:               # fully flat corpus: no survivors
        top = exact_topk_words(ds, k)
        return pd.DataFrame({
            "word": top["word"].to_numpy(object),
            "cnt": top["cnt"].to_numpy(np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64)})
    cand_ref = _ray.put(cand)

    def confirm(b: pd.DataFrame) -> pd.DataFrame:
        cs = _ray.get(cand_ref)
        vals, _ = flat_words(b["text"])
        idx = np.searchsorted(cs, vals)
        idx[idx == len(cs)] = 0
        hit = cs[idx] == vals
        u, c = np.unique(idx[hit], return_counts=True)
        return pd.DataFrame({"word": cs[u], "c": c.astype(np.int64)})

    ex = (ds.map_batches(confirm, batch_format="pandas").to_pandas()
            .groupby("word", as_index=False)["c"].sum())
    ex = ex.sort_values(["c", "word"], ascending=[False, True]).head(k)
    if len(ex) < k or int(ex["c"].iloc[-1]) <= err:
        top = exact_topk_words(ds, k)          # certificate failed
        return pd.DataFrame({
            "word": top["word"].to_numpy(object),
            "cnt": top["cnt"].to_numpy(np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64)})
    return pd.DataFrame({
        "word": ex["word"].to_numpy(object),
        "cnt": ex["c"].to_numpy(np.int64),
        "rank": np.arange(1, len(ex) + 1, dtype=np.int64)})
