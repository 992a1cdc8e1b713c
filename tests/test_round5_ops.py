"""Round-5 ops: C4 cleaning rules (incl. the terminal-punctuation
path the synthetic corpus can't exercise), CCNet-style block dedup,
and alpha-temperature resampling."""

import numpy as np
import pandas as pd
import pytest


def _pdf(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_c4_filter_full_rules(ray_session):
    """Planted punctuated multi-line docs drive every C4 rule:
    terminal punctuation, min words per line, the javascript line
    rule, lorem-ipsum / curly-brace / badword page rules, and the
    min-surviving-lines page rule."""
    import ray.data

    from kmerray.extras.text import c4_filter
    docs = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": [
            # 5 good lines + 1 unpunctuated -> kept, 5 survive
            "One good line here.\nAnother good line!\nIs this kept?\n"
            'He said "sure."\nFifth good line stays.\nno punct line',
            # all lines end mid-word -> dropped
            "no punctuation at all\nstill no punct",
            # javascript line dropped, 5 others survive -> kept
            "uses javascript right here.\nA second good line stays.\n"
            "three more words here.\nfour more words now.\n"
            "five more words again.\nsix more words too.",
            # lorem ipsum page -> dropped despite 6 good lines
            "lorem ipsum dolor sit amet.\ngood line number one.\n"
            "good line number two.\ngood line number three.\n"
            "good line number four.\ngood line number five.",
            # curly brace page -> dropped
            "curly { brace page here.\ngood line number one.\n"
            "good line number two.\ngood line number three.\n"
            "good line number four.\ngood line number five.",
            # badword page -> dropped
            "the badword appears right here.\ngood line number one.\n"
            "good line number two.\ngood line number three.\n"
            "good line number four.\ngood line number five.",
            # only 4 surviving lines -> dropped by min_lines=5
            "good line number one.\ngood line number two.\n"
            "good line number three.\ngood line number four.",
        ]})
    out = _pdf(c4_filter(ray.data.from_pandas(docs), line_delim="\n",
                         min_words_per_line=3, min_lines=5,
                         badwords=("badword",),
                         require_terminal_punct=True))
    assert out["keep"].tolist() == [1, 0, 1, 0, 0, 0, 0]
    assert out["n_kept"].tolist() == [5, 0, 5, 6, 6, 6, 4]
    # the javascript line is gone from the rewrite, the rest survive
    assert "javascript" not in out.loc[2, "clean_text"]
    assert out.loc[2, "clean_text"].count("\n") == 4
    # doc 0's unpunctuated trailing line is scrubbed
    assert not out.loc[0, "clean_text"].endswith("no punct line")


def test_c4_filter_trims_and_counts_like_sql(ray_session):
    """Space-padded lines are trimmed before every rule; the word
    count follows the SQL string_split convention (empty line = 1)."""
    import ray.data

    from kmerray.extras.text import c4_filter
    docs = pd.DataFrame({
        "doc_id": np.array([0], dtype=np.int64),
        "text": ["  padded good line here.  \n  tiny.  "]})
    out = _pdf(c4_filter(ray.data.from_pandas(docs), line_delim="\n",
                         min_words_per_line=3, min_lines=1,
                         badwords=(), require_terminal_punct=True))
    assert out.loc[0, "n_kept"] == 1  # 'tiny.' has 1 word < 3
    assert out.loc[0, "clean_text"] == "padded good line here."


def test_block_dedup_keeper_and_rewrite(ray_session):
    """Global first occurrence per distinct block survives — across
    docs AND for repeats inside one doc; docs reassemble from the
    surviving blocks in order."""
    import ray.data

    from kmerray.extras.dedup import block_dedup
    blk_a = "a b c"          # 3-word block with w=3
    blk_b = "d e f"
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [f"{blk_a} {blk_b}",        # doc 1: keeper of both
                 f"{blk_b} {blk_a}",        # doc 2: both dup -> empty
                 f"{blk_a} {blk_a} x y"]})  # doc 3: in-doc repeat too
    out = _pdf(block_dedup(ray.data.from_pandas(docs), w=3,
                           n_buckets=4))
    assert out["n_removed"].tolist() == [0, 2, 2]
    assert out.loc[0, "text2"] == f"{blk_a} {blk_b}"
    assert out.loc[1, "text2"] == ""
    assert out.loc[2, "text2"] == "x y"


def test_block_dedup_trailing_block_distinct(ray_session):
    """A short trailing block is NOT conflated with a full block that
    shares its prefix (the masked-fold property)."""
    import ray.data

    from kmerray.extras.dedup import block_dedup
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a b c d", "a b c"]})  # w=4: 'a b c d' vs tail 'a b c'
    out = _pdf(block_dedup(ray.data.from_pandas(docs), w=4,
                           n_buckets=2))
    assert out["n_removed"].tolist() == [0, 0]
    assert out["text2"].tolist() == ["a b c d", "a b c"]


def test_temperature_sample_rebalances(ray_session):
    """alpha<1 keeps a HIGHER fraction of the rare group than of the
    common group; alpha=1 keeps (about) the target fraction of each;
    decisions are deterministic."""
    import ray.data

    from kmerray.extras.sampling import temperature_sample
    rng = np.random.default_rng(7)
    n_common, n_rare = 4000, 250
    docs = pd.DataFrame({
        "doc_id": np.arange(n_common + n_rare, dtype=np.int64),
        "lang": ["en"] * n_common + ["sw"] * n_rare})
    ds = ray.data.from_pandas(docs)
    out = _pdf(temperature_sample(ds, alpha=0.3, target_frac=0.5))
    kept = out.groupby("lang").size()
    assert kept["sw"] / n_rare > kept["en"] / n_common
    # rare group rate capped at 100%
    assert out[out.lang == "sw"]["rate"].iloc[0] <= 1_000_000
    again = _pdf(temperature_sample(ds, alpha=0.3, target_frac=0.5))
    pd.testing.assert_frame_equal(out, again)
    flat = _pdf(temperature_sample(ds, alpha=1.0, target_frac=0.5))
    frac = len(flat) / len(docs)
    assert 0.45 < frac < 0.55


def test_incremental_dedup_admission(ray_session):
    """New-wave docs (odd ids) are admitted iff unseen in the old
    snapshot AND first within the wave."""
    import ray.data

    from kmerray.extras.dedup import incremental_dedup_survivors
    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "old only",        # 0 old
            "fresh one",       # 1 new, unseen -> admitted
            "shared text",     # 2 old
            "shared text",     # 3 new, in old -> rejected
            "old only",        # 4 old
            "wave dup",        # 5 new, first of wave -> admitted
            "old only",        # 6 old
            "wave dup",        # 7 new, later wave dup -> rejected
        ]})
    out = incremental_dedup_survivors(
        ray.data.from_pandas(docs), n_buckets=4).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 5]


def test_decontam_frac_counts(ray_session):
    """Per-doc distinct-gram totals and overlap fractions against a
    hand-computed eval slice (EVAL_MOD=10, EVAL_REM=7: doc 7 is the
    eval doc; docs shorter than the gram width report 0/0 -> 0.0)."""
    import ray.data

    from kmerray.extras.decontam import decontam_frac_pipeline
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 7, 13], dtype=np.int64),
        "text": [
            "a b c d",          # grams: abc bcd; abc hits eval
            "x y",              # too short: 0 grams
            "a b c q",          # EVAL doc: eval grams {abc, bcq}
            "b c q z",          # grams: bcq cqz; bcq hits
        ]})
    out = (decontam_frac_pipeline(ray.data.from_pandas(docs), n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 13]
    assert out["n_grams"].tolist() == [2, 0, 2]
    assert out["n_hits"].tolist() == [1, 0, 1]
    assert out["frac"].tolist() == [0.5, 0.0, 0.5]


def test_seed_centroid_topk_exact(ray_session):
    """The two-pass quantized-centroid ranking equals a direct numpy
    computation of the same integer contract (seed_mod=2: even
    vec_ids are the seed)."""
    import ray.data

    from kmerray.extras.similarity import seed_centroid_topk
    rng = np.random.default_rng(7)
    n, d = 40, 8
    m = rng.normal(size=(n, d))
    tbl = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [m[i].astype(np.float32).tolist()
                      for i in range(n)]})
    out = (seed_centroid_topk(ray.data.from_pandas(tbl), seed_mod=2,
                              k=5).to_pandas())
    # direct reference on the identical float64 path
    mm = m.astype(np.float32).astype(np.float64)
    amax = np.abs(mm).max(axis=1)
    codes = np.floor(127.0 * mm / np.where(amax > 0, amax, 1.0)[:, None]
                     + 0.5).astype(np.int64)
    cent = codes[::2].sum(axis=0)
    score = codes @ cent
    order = np.lexsort((np.arange(n), -score))[:5]
    assert out["vec_id"].tolist() == list(order)
    assert out["score"].tolist() == list(score[order])


def test_pack_emit_bins_and_concat(ray_session):
    """Planted word counts: bins follow the first-token rule over the
    global doc_id-order prefix sum; each shard is the ordered
    sep-join of its docs; token totals conserve."""
    import ray.data

    from kmerray.extras.scan import pack_emit
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["a b c",        # 3 tok, first tok at 0  -> bin 0
                 "d e",          # 2 tok, first tok at 3  -> bin 0
                 "f g h i",      # 4 tok, first tok at 5  -> bin 1
                 "j",            # 1 tok, first tok at 9  -> bin 1
                 "k l"],         # 2 tok, first tok at 10 -> bin 2
    })
    out = (pack_emit(ray.data.from_pandas(docs), budget=5, sep="|",
                     n_buckets=2)
           .to_pandas().sort_values("bin").reset_index(drop=True))
    assert out["bin"].tolist() == [0, 1, 2]
    assert out["n_docs"].tolist() == [2, 2, 1]
    assert out["n_tok"].tolist() == [5, 5, 2]
    assert out["packed"].tolist() == ["a b c|d e", "f g h i|j", "k l"]


def test_data_profile_metrics(ray_session):
    """Per-column profile over a planted frame with a null and a
    known timestamp range; merge across forced multi-block input."""
    import ray.data

    from kmerray.extras.profile import data_profile
    ev = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.to_datetime([1_000_000, 2_000_000, 3_000_000,
                              4_000_000, 5_000_000, 6_000_000],
                             unit="us"),
        "user_id": np.array([5, 3, 9, 1, 7, 4], dtype=np.int64),
        "event_type": ["b", "a", "c", "a", "b", "a"],
        "value": [2.5, np.nan, 1.5, 9.0, -3.25, 0.0],
        "props": ["{}", "{}", '{"k":1}', "{}", "{}", "{}"],
    })
    ds = ray.data.from_pandas([ev.iloc[:3], ev.iloc[3:]])
    out = data_profile(ds).to_pandas()
    out = out.set_index(["col", "metric"])
    assert out.loc[("event_id", "n_nonnull"), "val_num"] == 6.0
    assert out.loc[("value", "n_null"), "val_num"] == 1.0
    assert out.loc[("value", "min"), "val_num"] == -3.25
    assert out.loc[("value", "max"), "val_num"] == 9.0
    assert out.loc[("user_id", "min"), "val_num"] == 1.0
    assert out.loc[("user_id", "max"), "val_num"] == 9.0
    assert out.loc[("ts", "min"), "val_num"] == 1_000_000.0
    assert out.loc[("ts", "max"), "val_num"] == 6_000_000.0
    assert out.loc[("event_type", "min"), "val_str"] == "a"
    assert out.loc[("event_type", "max"), "val_str"] == "c"
    # byte order: '}' (0x7D) > '"' (0x22), so the plain '{}' is max
    assert out.loc[("props", "max"), "val_str"] == "{}"
    assert out.loc[("props", "min"), "val_str"] == '{"k":1}'
    assert len(out) == 6 * 4


def test_bigram_logprob_matches_scalar_reference(ray_session):
    """The two-dictionary distributed scorer equals a scalar
    Counter-based fit of the same interpolated formula; a one-word
    doc scores 0.0."""
    import collections
    import math

    import ray.data

    from kmerray.extras.text import bigram_logprob
    texts = ["a b a b c", "b c a", "a", "c c b a b"]
    docs = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                         "text": texts})
    out = _pdf(bigram_logprob(ray.data.from_pandas(docs), lam=0.75,
                              dp=6))

    uni = collections.Counter(w for t in texts for w in t.split(" "))
    tot = float(sum(uni.values()))
    big = collections.Counter(
        (ws[i], ws[i + 1]) for t in texts
        for ws in [t.split(" ")] for i in range(len(ws) - 1))

    def ref(t):
        ws = t.split(" ")
        if len(ws) < 2:
            return 0.0
        lps = [math.log(0.75 * (big[(a, b)] / uni[a])
                        + 0.25 * (uni[b] / tot))
               for a, b in zip(ws, ws[1:])]
        return round(sum(lps) / len(lps), 6)

    for i, t in enumerate(texts):
        assert out.loc[i, "avg_logprob"] == pytest.approx(ref(t),
                                                          abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_dedup_matches_bruteforce_random(ray_session, seed):
    """Random corpora with heavy duplication: the bucketed pipeline
    equals set-logic brute force at several bucket/block shapes."""
    import ray.data

    from kmerray.extras.dedup import incremental_dedup_survivors
    rng = np.random.default_rng(seed)
    n = 200
    texts = [f"doc {rng.integers(0, 40)}" for _ in range(n)]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})
    old = {t for i, t in enumerate(texts) if i % 2 == 0}
    expect, seen = [], set()
    for i, t in enumerate(texts):
        if i % 2 == 1 and t not in old and t not in seen:
            expect.append(i)
            seen.add(t)
    parts = [docs.iloc[:67], docs.iloc[67:150], docs.iloc[150:]]
    out = incremental_dedup_survivors(
        ray.data.from_pandas(parts),
        n_buckets=int(rng.integers(2, 9))).to_pandas()
    assert sorted(out["doc_id"].tolist()) == expect


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_emit_matches_scalar_random(ray_session, seed):
    """Random word counts and budgets: the two-exchange pipeline
    equals a scalar prefix-sum packing reference."""
    import ray.data

    from kmerray.extras.scan import pack_emit
    rng = np.random.default_rng(100 + seed)
    n = 120
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 9)))
             for _ in range(n)]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})
    budget = int(rng.integers(5, 40))
    cum = 0
    bins = {}
    for i, t in enumerate(texts):
        nt = t.count(" ") + 1
        b = cum // budget
        cum += nt
        e = bins.setdefault(b, {"n_docs": 0, "n_tok": 0, "txt": []})
        e["n_docs"] += 1
        e["n_tok"] += nt
        e["txt"].append(t)
    parts = [docs.iloc[:40], docs.iloc[40:41], docs.iloc[41:]]
    out = (pack_emit(ray.data.from_pandas(parts), budget=budget,
                     sep="<eos>", n_buckets=int(rng.integers(2, 7)))
           .to_pandas().sort_values("bin").reset_index(drop=True))
    assert out["bin"].tolist() == sorted(bins)
    for _, r in out.iterrows():
        e = bins[r["bin"]]
        assert r["n_docs"] == e["n_docs"]
        assert r["n_tok"] == e["n_tok"]
        assert r["packed"] == "<eos>".join(e["txt"])


def test_bigram_logprob_min_count_backoff(ray_session):
    """min_count=2 prunes singleton bigrams inside the distributed
    merge; pruned pairs score through the unigram backoff term only
    (cb treated as 0), matching the scalar reference."""
    import collections
    import math

    import ray.data

    from kmerray.extras.text import bigram_logprob
    texts = ["a b a b", "b a c", "c a"]
    docs = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                         "text": texts})
    out = _pdf(bigram_logprob(ray.data.from_pandas(docs), lam=0.75,
                              dp=6, min_count=2))

    uni = collections.Counter(w for t in texts for w in t.split(" "))
    tot = float(sum(uni.values()))
    big = collections.Counter(
        (ws[i], ws[i + 1]) for t in texts
        for ws in [t.split(" ")] for i in range(len(ws) - 1))

    def ref(t):
        ws = t.split(" ")
        lps = []
        for a, b in zip(ws, ws[1:]):
            cb = big[(a, b)] if big[(a, b)] >= 2 else 0
            lps.append(math.log(0.75 * (cb / uni[a])
                                + 0.25 * (uni[b] / tot)))
        return round(sum(lps) / len(lps), 6)

    for i, t in enumerate(texts):
        assert out.loc[i, "avg_logprob"] == pytest.approx(ref(t),
                                                          abs=1e-6)


def test_pmi_pairs_matches_scalar_counter(ray_session):
    """PMI against a direct Counter-based reference on a tiny corpus
    (min_count=2 so one pair survives per planted repeat)."""
    from collections import Counter

    import ray.data

    from kmerray.extras.text import pmi_pairs
    texts = ["a b a b a b c", "a b x y x y", "c c a b"]
    docs = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                         "text": texts})
    out = pmi_pairs(ray.data.from_pandas(docs), min_count=2, dp=4)\
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)

    uni = Counter()
    bi = Counter()
    n = 0
    for t in texts:
        ws = t.split(" ")
        uni.update(ws)
        n += len(ws)
        bi.update(zip(ws, ws[1:]))
    exp = []
    for (w1, w2), c12 in bi.items():
        if c12 >= 2:
            pmi = np.log(float(c12 * n) / float(uni[w1] * uni[w2]))
            exp.append((w1, w2, c12,
                        np.floor(pmi * 1e4 + 0.5) / 1e4))
    ref = pd.DataFrame(exp, columns=["w1", "w2", "c12", "pmi"])\
        .sort_values(["w1", "w2"]).reset_index(drop=True)
    assert len(out) == len(ref) > 0
    assert (out["w1"] == ref["w1"]).all()
    assert (out["w2"] == ref["w2"]).all()
    assert (out["c12"].to_numpy() == ref["c12"].to_numpy()).all()
    assert np.array_equal(out["pmi"].to_numpy(), ref["pmi"].to_numpy())


def test_kmer_novelty_matches_scalar(ray_session):
    """First-seen-day curve against a scalar dict reference, with
    docs deliberately out of day order and an ambiguous token break;
    randomized block splits exercise the bucket merge."""
    import ray.data

    from kmerray.core.encoding import canonical_flat_kmers
    from kmerray.pipelines.counter import kmer_novelty
    from kmerray.sources.synth import DAY_US, TS_BASE_US

    rng = np.random.default_rng(7)
    k = 4
    n_docs = 40
    toks = [rng.integers(0, 5, size=int(rng.integers(k, 40)))
            .astype(np.int32) for _ in range(n_docs)]
    days = rng.integers(0, 6, size=n_docs).astype(np.int64)
    ts = (TS_BASE_US + days * DAY_US
          + rng.integers(0, DAY_US, size=n_docs)).astype(np.int64)

    first = {}
    for t, d in zip(toks, days):
        offs = np.array([0, len(t)], dtype=np.int64)
        kms, _ = canonical_flat_kmers(t, offs, k)
        for km in kms.tolist():
            if km not in first or d < first[km]:
                first[km] = d
    daily = {}
    for d in first.values():
        daily[d] = daily.get(d, 0) + 1
    exp_days = sorted(daily)
    exp = pd.DataFrame({
        "day": np.array(exp_days, dtype=np.int64),
        "new_kmers": np.array([daily[d] for d in exp_days],
                              dtype=np.int64)})
    exp["vocab_size"] = exp["new_kmers"].cumsum()

    import pyarrow as pa
    offs = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum([len(t) for t in toks], out=offs[1:])
    tok_col = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(np.concatenate(toks), pa.int32()))
    tab = pa.table({"tokens": tok_col,
                    "ts": pa.array(ts, pa.timestamp("us"))})
    ds = ray.data.from_arrow([tab.slice(0, 13), tab.slice(13, 9),
                              tab.slice(22)])
    out = kmer_novelty(ds, k=k, n_buckets=5)
    assert np.array_equal(out["day"].to_numpy(), exp["day"].to_numpy())
    assert np.array_equal(out["new_kmers"].to_numpy(),
                          exp["new_kmers"].to_numpy())
    assert np.array_equal(out["vocab_size"].to_numpy(),
                          exp["vocab_size"].to_numpy())


@pytest.mark.parametrize("seed", [0, 1])
def test_weighted_priority_sample_matches_scalar(ray_session, seed):
    """DLT priority sampling vs a brute-force scalar reference:
    membership, tau, and the max(w, 1/tau) estimator weights must be
    identical across uneven block splits; the estimator's total must
    bracket the true total weight loosely (sanity, not a proof)."""
    import hashlib

    import ray.data

    from kmerray.extras.sampling import (WSAMPLE_SALT,
                                         weighted_priority_sample)

    rng = np.random.default_rng(seed)
    n, k = 200, 16
    ids = np.sort(rng.choice(100_000, size=n, replace=False))
    w = rng.integers(0, 5_000, size=n)      # zeros exercise the clamp

    def h64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little")

    rows = []
    for i, wt in zip(ids.tolist(), w.tolist()):
        wc = max(wt, 1)
        u = float(h64(f"{i}{WSAMPLE_SALT}")) * 2.0 ** -64
        rows.append((u / float(wc), i, wc))
    rows.sort()
    tau = rows[k][0]
    exp = pd.DataFrame({
        "doc_id": np.array([r[1] for r in rows[:k]], dtype=np.int64),
        "w": np.array([r[2] for r in rows[:k]], dtype=np.int64),
        "prio": np.array([r[0] for r in rows[:k]]),
    })
    exp["est"] = np.maximum(exp["w"].to_numpy().astype(np.float64),
                            1.0 / tau)

    df = pd.DataFrame({"doc_id": ids, "n_chars": w})
    cuts = np.sort(rng.choice(np.arange(1, n), size=3, replace=False))
    parts = np.split(df, cuts)
    ds = ray.data.from_pandas([p.reset_index(drop=True) for p in parts])
    out = (weighted_priority_sample(ds, k=k)
           .sort_values(["prio", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp.reset_index(drop=True))
    # DLT unbiasedness sanity: one draw, loose bracket only
    assert 0.1 * w.clip(1).sum() < out["est"].sum() \
        < 10 * w.clip(1).sum()


def test_weighted_priority_sample_small_n(ray_session):
    """n <= k: every row sampled, no tau -> est == w exactly."""
    import ray.data

    from kmerray.extras.sampling import weighted_priority_sample
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "n_chars": np.array([3, 0, 7, 2, 9])})
    out = weighted_priority_sample(ray.data.from_pandas(df), k=8)
    assert len(out) == 5
    assert np.array_equal(np.sort(out["w"].to_numpy()),
                          np.array([1, 2, 3, 7, 9]))
    assert np.array_equal(out["est"].to_numpy(),
                          out["w"].to_numpy().astype(np.float64))


@pytest.mark.parametrize("seed", [0, 3])
def test_sketch_quantiles_matches_scalar(ray_session, seed):
    """Bottom-k sketch vs a scalar reference (same hash, same rank
    rule), invariant to block splits; with k >= n the sketch must
    equal the exact quantiles."""
    import hashlib

    import ray.data

    from kmerray.extras.scan import SKQ_SALT, sketch_quantiles

    rng = np.random.default_rng(seed)
    n, k = 300, 64
    ids = np.array([f"d{i}" for i in rng.choice(10_000, n, False)],
                   dtype=object)
    ntok = rng.integers(1, 2_000, size=n)

    def h64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little")

    order = sorted(range(n), key=lambda i: (h64(ids[i] + SKQ_SALT),
                                            ids[i]))
    samp = np.sort(ntok[order[:k]])
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    exp = pd.DataFrame({
        "q": [f"{q:g}" for q in qs],
        "value": np.array([samp[int(np.ceil(q * k)) - 1] for q in qs],
                          dtype=np.int64)})

    df = pd.DataFrame({"doc_id": ids, "n_tok": ntok})
    cuts = np.sort(rng.choice(np.arange(1, n), size=4, replace=False))
    ds = ray.data.from_pandas(
        [p.reset_index(drop=True) for p in np.split(df, cuts)])
    out = sketch_quantiles(ds, qs=qs, k=k)
    pd.testing.assert_frame_equal(out, exp)

    # k >= n: the "sketch" is the whole population -> exact quantiles
    full = sketch_quantiles(ray.data.from_pandas(df), qs=qs, k=n + 10)
    sv = np.sort(ntok)
    exact = np.array([sv[int(np.ceil(q * n)) - 1] for q in qs],
                     dtype=np.int64)
    assert np.array_equal(full["value"].to_numpy(), exact)


def test_bloom_decontam_equals_broadcast(ray_session):
    """The Bloom-prefilter path must produce the broadcast path's
    exact surface (no false negatives by construction; false
    positives die in the exact confirm) on a corpus with planted
    eval overlaps, across uneven block splits."""
    import ray.data

    from kmerray.extras.decontam import (EVAL_MOD, EVAL_REM,
                                         bloom_decontam_pipeline,
                                         decontam_pipeline)

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(50)], dtype=object)
    n = 60
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 30))))
             for _ in range(n)]
    # plant: train doc 0 copies a 5-word span of an eval doc
    ev_id = int(np.flatnonzero(ids % EVAL_MOD == EVAL_REM)[0])
    texts[0] = texts[ev_id].split(" ", 1)[0] + " " + texts[ev_id]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    cuts = [17, 31, 44]
    ds = ray.data.from_pandas(
        [p.reset_index(drop=True) for p in np.split(df, cuts)])

    def norm(d):
        return (d.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))

    a = norm(decontam_pipeline(ds))
    b = norm(bloom_decontam_pipeline(ds))
    pd.testing.assert_frame_equal(a, b)
    assert a["contaminated"].any()      # the plant registered


def test_bloom_positions_deterministic_and_small_m(ray_session):
    """Tiny m forces false positives; the exact confirm must still
    kill them all (paths with m=64 bits == broadcast truth)."""
    import ray.data

    from kmerray.extras.decontam import (bloom_decontam_pipeline,
                                         decontam_pipeline)

    rng = np.random.default_rng(11)
    vocab = np.array([f"t{i}" for i in range(30)], dtype=object)
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(3, 12))))
                 for _ in range(40)]})
    ds = ray.data.from_pandas(df)
    a = (decontam_pipeline(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (bloom_decontam_pipeline(ds, m=64, j=2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_kmer_complexity_matches_scalar(ray_session):
    """Distinct/total canonical k-mer ratio vs a per-read scalar
    reference; homopolymer reads must collapse toward 1/n_kmers and
    sub-k reads must emit no row."""
    import pyarrow as pa
    import ray.data

    from kmerray.core.encoding import canonical_flat_kmers
    from kmerray.pipelines.counter import kmer_complexity

    rng = np.random.default_rng(5)
    k = 4
    toks = [rng.integers(0, 4, size=int(rng.integers(1, 60)))
            .astype(np.int32) for _ in range(30)]
    toks.append(np.zeros(40, dtype=np.int32))        # homopolymer A*40
    toks.append(np.array([1, 2], dtype=np.int32))    # shorter than k
    ids = np.array([f"r{i}" for i in range(len(toks))], dtype=object)

    exp = {}
    for i, t in enumerate(toks):
        offs = np.array([0, len(t)], dtype=np.int64)
        kms, _ = canonical_flat_kmers(t, offs, k)
        if len(kms):
            exp[ids[i]] = (len(kms), len(np.unique(kms)),
                           float(len(np.unique(kms))) / float(len(kms)))

    offs = np.zeros(len(toks) + 1, dtype=np.int32)
    np.cumsum([len(t) for t in toks], out=offs[1:])
    tab = pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offs), pa.array(np.concatenate(toks), pa.int32()))})
    ds = ray.data.from_arrow([tab.slice(0, 11), tab.slice(11)])
    out = (kmer_complexity(ds, k=k).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        n, d, c = exp[r["doc_id"]]
        assert (r["n_kmers"], r["n_distinct"]) == (n, d)
        assert r["complexity"] == c
    homo = out[out["doc_id"] == "r30"].iloc[0]
    assert homo["n_distinct"] == 1
    assert "r31" not in set(out["doc_id"])


@pytest.mark.parametrize("seed", [0, 2])
def test_vocab_coverage_matches_scalar(ray_session, seed):
    """Tie-level integer arithmetic vs a brute-force ranked cumsum
    (count DESC, word ASC), on a Zipf-ish corpus with heavy count
    ties, across block splits."""
    import ray.data

    from kmerray.extras.text import vocab_coverage

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(80)], dtype=object)
    pz = 1.0 / np.arange(1, 81)
    pz /= pz.sum()
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 40)),
                                 p=pz)) for _ in range(60)]
    from collections import Counter
    cnt = Counter(w for t in texts for w in t.split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    masses = np.cumsum([c for _, c in ranked])
    total = int(masses[-1])
    ps = (0.5, 0.75, 0.9, 0.95, 0.99)
    exp_v, exp_c = [], []
    for p in ps:
        need = int(np.ceil(p * total))
        rk = int(np.searchsorted(masses, need, side="left"))
        exp_v.append(rk + 1)
        exp_c.append(int(masses[rk]))

    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(
        [p.reset_index(drop=True) for p in np.split(df, [19, 33, 47])])
    out = vocab_coverage(ds, ps=ps)
    assert out["p"].tolist() == [f"{p:g}" for p in ps]
    assert out["vocab_size"].tolist() == exp_v
    assert out["covered"].tolist() == exp_c


def test_char_entropy_matches_scalar(ray_session):
    """Byte-histogram entropy vs a scalar Counter reference; empty
    docs emit no row; a homopolymer page scores 0 nats (keep=0) and
    natural-ish text clears the 2-nat bar."""
    import math
    from collections import Counter

    import ray.data

    from kmerray.extras.text import char_entropy

    texts = ["aaaaaaaaaaaaaaaa",                      # 0 nats, dropped
             "the quick brown fox jumps over the lazy dog",
             "",                                       # no row
             "abababababab",                           # ln 2 < 2.0
             "a b c d e f g h i j k l m n o p q r s"]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(
        [p.reset_index(drop=True) for p in np.split(df, [2, 3])])
    out = _pdf(char_entropy(ds))

    assert out["doc_id"].tolist() == [0, 1, 3, 4]
    for _, row in out.iterrows():
        t = texts[int(row["doc_id"])]
        cnt = Counter(t)
        n = len(t)
        ent = math.log(n) - sum(c * math.log(c)
                                for c in cnt.values()) / n
        ent = math.floor(ent * 1e4 + 0.5) / 1e4
        assert row["n_distinct"] == len(cnt)
        assert row["entropy"] == ent
        assert row["keep"] == int(ent >= 2.0)
    assert out.set_index("doc_id")["keep"].tolist() == [0, 1, 0, 1]


# ---------------------------------------------------------------------------
# Misra-Gries certified heavy hitters
# ---------------------------------------------------------------------------

def test_mg_summary_bounds():
    """Every survivor underestimates by exactly delta; drops <= delta;
    survivor count <= m."""
    from kmerray.extras.sketch import mg_summary
    rng = np.random.default_rng(7)
    cnt = rng.integers(1, 100, size=50).astype(np.int64)
    words = np.array([f"w{i}" for i in range(50)], dtype=object)
    w, c, d = mg_summary(words, cnt, m=8)
    assert len(w) <= 8 and d > 0
    lut = dict(zip(w, c))
    for word, true in zip(words, cnt):
        res = lut.get(word, 0)
        assert res <= true <= res + d


def test_mg_topwords_matches_scalar(ray_session):
    """Skewed corpus across uneven blocks: MG sketch path == Counter
    brute force with the (cnt DESC, word ASC) tie order."""
    from collections import Counter

    import ray.data

    from kmerray.extras.sketch import mg_topwords
    rng = np.random.default_rng(11)
    vocab = [f"tok{i:03d}" for i in range(200)]
    # Zipf-ish skew so the certificate holds even with m=32
    probs = 1.0 / np.arange(1, 201)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=int(n), p=probs))
             for n in rng.integers(5, 60, size=40)]
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                         "text": texts})
    ds = ray.data.from_pandas([docs.iloc[:7], docs.iloc[7:25],
                               docs.iloc[25:]])
    out = mg_topwords(ds, k=5, m=32)
    c = Counter(w for t in texts for w in t.split(" "))
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(out["word"]) == [w for w, _ in ref]
    assert list(out["cnt"]) == [n for _, n in ref]
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_mg_topwords_flat_fallback(ray_session):
    """Adversarially flat corpus with a tiny summary: the certificate
    must fail and the exact vocab-exchange fallback still returns the
    exact top-k."""
    from collections import Counter

    import ray.data

    from kmerray.extras.sketch import mg_topwords
    # 30 words, every count equal -> kth count can never exceed D
    texts = [" ".join(f"w{j:02d}" for j in range(30)) for _ in range(6)]
    docs = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                         "text": texts})
    ds = ray.data.from_pandas([docs.iloc[:2], docs.iloc[2:4],
                               docs.iloc[4:]])
    out = mg_topwords(ds, k=4, m=2)
    c = Counter(w for t in texts for w in t.split(" "))
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(out["word"]) == [w for w, _ in ref]
    assert list(out["cnt"]) == [n for _, n in ref]


# ---------------------------------------------------------------------------
# BM25 retrieval top-k
# ---------------------------------------------------------------------------

def test_bm25_matches_scalar(ray_session):
    """Brute-force scalar BM25 (math.log, per-doc loops) over uneven
    blocks == the distributed two-pass ranking, including the no-hit
    doc exclusion and the (score, doc_id) tie order."""
    import math

    import ray.data

    from kmerray.extras.text import bm25_topk
    texts = ["sort merge join sort sort", "window scan scan",
             "data data data key", "merge merge window",
             "the quick brown fox",          # no query terms at all
             "sort", "scan window scan window scan",
             "key customer filter data key"]
    docs = pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64),
                         "text": texts})
    queries = (("qa", ("sort", "merge")), ("qb", ("scan", "window")),
               ("qc", ("data", "key", "customer")))
    ds = ray.data.from_pandas([docs.iloc[:3], docs.iloc[3:5],
                               docs.iloc[5:]])
    out = bm25_topk(ds, queries=queries, k=3)

    # scalar reference
    toks = [t.split(" ") for t in texts]
    n, avgdl = len(toks), sum(len(t) for t in toks) / len(toks)
    k1, b, sc = 1.2, 0.75, 10 ** 4
    ref = []
    for qid, ts in queries:
        scored = []
        for d, tok in enumerate(toks):
            s, hit = 0.0, False
            for term in ts:
                tf = tok.count(term)
                if tf == 0:
                    continue
                hit = True
                df = sum(term in t for t in toks)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(tok) / avgdl))
            if hit:
                scored.append((math.floor(s * sc + 0.5) / sc, d))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for r, (s, d) in enumerate(scored[:3], 1):
            ref.append((qid, d, s, r))
    got = list(out.itertuples(index=False, name=None))
    assert got == ref


# ---------------------------------------------------------------------------
# two-pass digital normalization
# ---------------------------------------------------------------------------

def test_diginorm_matches_scalar(ray_session):
    """Per-read ceil-rank median of global canonical k-mer abundances
    vs a Counter-based scalar reference; the repeated read's median
    saturates above the cutoff, the unique reads stay below, sub-k
    reads emit no row."""
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from kmerray.core.encoding import canonical_flat_kmers
    from kmerray.pipelines.counter import diginorm

    rng = np.random.default_rng(9)
    k = 4
    toks = [rng.integers(0, 4, size=20).astype(np.int32)
            for _ in range(6)]
    toks += [toks[0].copy() for _ in range(5)]   # saturate read 0's kmers
    toks.append(np.array([1, 2, 3], dtype=np.int32))   # sub-k
    ids = np.array([f"r{i}" for i in range(len(toks))], dtype=object)

    # scalar reference
    glob = Counter()
    per = {}
    for i, t in enumerate(toks):
        offs = np.array([0, len(t)], dtype=np.int64)
        kms, _ = canonical_flat_kmers(t, offs, k)
        per[ids[i]] = kms
        glob.update(kms.tolist())
    exp = {}
    for rid, kms in per.items():
        if not len(kms):
            continue
        ab = sorted(glob[x] for x in kms.tolist())
        med = ab[(len(ab) + 1) // 2 - 1]
        exp[rid] = (len(ab), med, int(med <= 3))

    offs = np.zeros(len(toks) + 1, dtype=np.int32)
    np.cumsum([len(t) for t in toks], out=offs[1:])
    tab = pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offs), pa.array(np.concatenate(toks), pa.int32()))})
    ds = ray.data.from_arrow([tab.slice(0, 4), tab.slice(4, 5),
                              tab.slice(9)])
    out = (diginorm(ds, k=k, cutoff=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        n, med, keep = exp[r["doc_id"]]
        assert (r["n_kmers"], r["med_abund"], r["keep"]) == (n, med, keep)
    # the duplicated read family is flagged saturated
    assert out[out["doc_id"] == "r0"]["keep"].iloc[0] == 0
    assert out[out["doc_id"] == "r1"]["keep"].iloc[0] == 1


# ---------------------------------------------------------------------------
# Jensen-Shannon source divergence
# ---------------------------------------------------------------------------

def test_source_divergence_matches_scalar(ray_session):
    """Pairwise JSD vs a Counter/math scalar reference across uneven
    blocks: identical sources give 0, disjoint sources give ln(2),
    the one-sided-word guard matches."""
    import math
    from collections import Counter

    import ray.data

    from kmerray.extras.text import source_divergence
    docs = pd.DataFrame({
        "source": ["a", "a", "b", "b", "c"],
        "text": ["x y x z", "x y", "x y x z", "x y", "p q p q q"]})
    ds = ray.data.from_pandas([docs.iloc[:2], docs.iloc[2:4],
                               docs.iloc[4:]])
    out = source_divergence(ds, dp=6)

    cnt = {s: Counter() for s in "abc"}
    for _, r in docs.iterrows():
        cnt[r["source"]].update(r["text"].split(" "))

    def jsd(ca, cb):
        na, nb = sum(ca.values()), sum(cb.values())
        s = 0.0
        for w in set(ca) | set(cb):
            p, q = ca[w] / na, cb[w] / nb
            m = 0.5 * (p + q)
            t = 0.0
            if ca[w]:
                t += 0.5 * p * math.log(p / m)
            if cb[w]:
                t += 0.5 * q * math.log(q / m)
            s += t
        return math.floor(s * 1e6 + 0.5) / 1e6

    exp = {("a", "b"): jsd(cnt["a"], cnt["b"]),
           ("a", "c"): jsd(cnt["a"], cnt["c"]),
           ("b", "c"): jsd(cnt["b"], cnt["c"])}
    assert len(out) == 3
    for _, r in out.iterrows():
        assert r["jsd"] == exp[(r["s1"], r["s2"])]
    # identical distributions -> 0; fully disjoint vocab -> ln 2
    assert exp[("a", "b")] == 0.0
    assert abs(exp[("a", "c")] - math.log(2.0)) < 1e-6


# ---------------------------------------------------------------------------
# median/MAD robust outliers
# ---------------------------------------------------------------------------

def test_mad_outliers_matches_scalar(ray_session):
    """Ceil-rank median + MAD vs a sorted-list scalar reference across
    uneven blocks; a planted extreme value is flagged, the MAD=0
    constant group yields NaN rz with exact flags."""
    import ray.data

    from kmerray.extras.grouped import grouped_mad_outliers
    vals_a = [10, 12, 11, 10, 13, 11, 12, 1000]   # outlier 1000
    vals_b = [5, 5, 5, 5]                          # constant -> MAD 0
    docs = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "source": ["a"] * 8 + ["b"] * 4,
        "n_chars": np.array(vals_a + vals_b, dtype=np.int64)})
    ds = ray.data.from_pandas([docs.iloc[:5], docs.iloc[5:9],
                               docs.iloc[9:]])
    out = (grouped_mad_outliers(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def ref(vals):
        s = sorted(vals)
        med = s[(len(s) + 1) // 2 - 1]
        ad = sorted(abs(v - med) for v in vals)
        mad = ad[(len(ad) + 1) // 2 - 1]
        return med, mad

    med_a, mad_a = ref(vals_a)
    med_b, mad_b = ref(vals_b)
    for i, v in enumerate(vals_a):
        r = out.iloc[i]
        assert (r["med"], r["mad"]) == (med_a, mad_a)
        assert r["rz"] == (v - med_a) / mad_a
        assert r["outlier"] == int(abs(v - med_a) > 3 * mad_a)
    assert out.iloc[7]["outlier"] == 1          # the planted extreme
    assert out[out["doc_id"] < 7]["outlier"].sum() == 0
    for i, v in enumerate(vals_b):
        r = out.iloc[8 + i]
        assert (r["med"], r["mad"]) == (med_b, mad_b)
        assert np.isnan(r["rz"]) and r["outlier"] == 0
    assert mad_b == 0


# ---------------------------------------------------------------------------
# SSL-prototypes pruning
# ---------------------------------------------------------------------------

def test_proto_prune_matches_scalar(ray_session):
    """Hardest-fraction-per-cluster pruning vs a numpy brute-force
    reference (same deterministic fit, ceil quota per cluster, ties
    to lowest vec_id), across uneven blocks."""
    import pyarrow as pa
    import ray.data

    from kmerray.extras.decomp import kmeans_fit, proto_prune
    rng = np.random.default_rng(3)
    x = np.vstack([rng.normal(0, 1, (20, 6)),
                   rng.normal(5, 1, (15, 6))])
    tab = pa.table({
        "vec_id": pa.array(np.arange(35, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float64()))})
    ds = ray.data.from_arrow([tab.slice(0, 12), tab.slice(12, 9),
                              tab.slice(21)])
    out = (proto_prune(ds, n_clusters=2, iters=3, frac=0.4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    cent = kmeans_fit(ray.data.from_arrow(tab), n_clusters=2, iters=3)
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    win = d2[np.arange(35), a]
    exp = []
    for c in range(2):
        ids = np.flatnonzero(a == c)
        quota = int(np.ceil(0.4 * len(ids)))
        order = ids[np.lexsort((ids, -win[ids]))][:quota]
        exp += [(c, int(i)) for i in order]
    exp.sort(key=lambda t: t[1])
    got = list(out[["cluster", "vec_id"]]
               .itertuples(index=False, name=None))
    assert got == exp
    # both clusters respect their own quota
    assert out["cluster"].value_counts().to_dict() == {
        c: int(np.ceil(0.4 * int((a == c).sum()))) for c in range(2)}


# ---------------------------------------------------------------------------
# greedy k-center coreset
# ---------------------------------------------------------------------------

def test_kcenter_select_matches_scalar(ray_session):
    """Farthest-point traversal vs a numpy brute-force reference
    (seed = lowest vec_id, argmax ties to lowest vec_id, coverage
    ties to lowest rank), across uneven blocks and shuffled ids."""
    import pyarrow as pa
    import ray.data

    from kmerray.extras.decomp import kcenter_select
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (30, 5))
    ids = rng.permutation(30).astype(np.int64)  # ids not block-sorted
    tab = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float64()))})
    ds = ray.data.from_arrow([tab.slice(0, 11), tab.slice(11, 7),
                              tab.slice(18)])
    out = (kcenter_select(ds, k=4).to_pandas()
           .sort_values("rank").reset_index(drop=True))

    # brute reference (same d2 kernel)
    pos = int(np.argsort(ids, kind="stable")[0])
    sel = [pos]
    c = x[pos]
    mind2 = (x * x).sum(axis=1) - 2.0 * (x @ c) + (c * c).sum()
    for _ in range(3):
        p = int(np.lexsort((ids, -mind2))[0])
        sel.append(p)
        c = x[p]
        d2 = (x * x).sum(axis=1) - 2.0 * (x @ c) + (c * c).sum()
        mind2 = np.minimum(mind2, d2)
    cent = x[sel]
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    n = np.bincount(a, minlength=4)

    assert out["vec_id"].tolist() == [int(ids[p]) for p in sel]
    assert out["rank"].tolist() == [0, 1, 2, 3]
    assert out["n_assigned"].tolist() == n.tolist()
    assert int(out["n_assigned"].sum()) == 30


# ---------------------------------------------------------------------------
# Naive Bayes quality classifier
# ---------------------------------------------------------------------------

def test_nb_classify_matches_scalar(ray_session):
    """Add-one multinomial NB llr vs a Counter/math scalar reference:
    planted positive-distinctive vocabulary drives keep=1 on the
    target-lang docs and keep=0 on the rest, across uneven blocks."""
    import math
    from collections import Counter

    import ray.data

    from kmerray.extras.text import nb_classify

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "lang": ["en", "en", "en", "de", "de", "fr", "en", "de"],
        "text": [
            "alpha beta gamma alpha",
            "alpha beta beta",
            "gamma alpha beta",
            "zeta eta theta zeta",
            "eta theta zeta",
            "theta zeta eta eta",
            "alpha gamma gamma",
            "zeta theta",
        ]})
    ds = ray.data.from_pandas([docs.iloc[:3], docs.iloc[3:5],
                               docs.iloc[5:]])
    out = _pdf(nb_classify(ds, target_lang="en", dp=4))

    pos, allc = Counter(), Counter()
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        allc.update(ws)
        if r["lang"] == "en":
            pos.update(ws)
    nv = len(allc)
    npos = sum(pos.values())
    nneg = sum(allc.values()) - npos
    ref_llr, ref_keep = [], []
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        ts = [math.log((pos.get(w, 0) + 1) / float(npos + nv))
              - math.log((allc[w] - pos.get(w, 0) + 1)
                         / float(nneg + nv)) for w in ws]
        llr = math.floor(sum(ts) / max(len(ws), 1) * 1e4 + 0.5) / 1e4
        ref_llr.append(llr)
        ref_keep.append(int(llr > 0))
    assert out["llr"].tolist() == ref_llr
    assert out["keep"].tolist() == ref_keep
    # the planted vocabularies are disjoint: en docs keep, rest drop
    assert out["keep"].tolist() == [1, 1, 1, 0, 0, 0, 1, 0]


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------

def test_retention_cohorts_matches_scalar(ray_session):
    """Retention triangle vs a set/Counter scalar reference: planted
    multi-day users with duplicate same-day events, across uneven
    blocks (a user's rows deliberately split between blocks)."""
    from collections import Counter

    import ray.data

    from kmerray.extras.events import retention_cohorts

    DAY = 86_400_000_000
    # (user, day) activity incl. same-day dups and gaps
    act = [(1, 0), (1, 0), (1, 1), (1, 3),
           (2, 0), (2, 3),
           (3, 1), (3, 1), (3, 2),
           (4, 3)]
    ts = np.array([d * DAY + 1234 for _, d in act],
                  dtype="datetime64[us]")
    ev = pd.DataFrame({
        "user_id": np.array([u for u, _ in act], dtype=np.int64),
        "ts": ts})
    ds = ray.data.from_pandas([ev.iloc[:3], ev.iloc[3:6], ev.iloc[6:]])
    out = (retention_cohorts(ds)
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))

    days = {}
    for u, d in act:
        days.setdefault(u, set()).add(d)
    ref = Counter()
    for u, ds_ in days.items():
        c = min(ds_)
        for d in ds_:
            ref[(c, d - c)] += 1
    exp = pd.DataFrame(
        [(c, o, n) for (c, o), n in sorted(ref.items())],
        columns=["cohort_day", "day_offset", "n_users"])
    pd.testing.assert_frame_equal(out.astype(np.int64),
                                  exp.astype(np.int64))
    # sanity: every cohort has its offset-0 row covering all members
    assert set(out[out["day_offset"] == 0]["n_users"]) == {2, 1, 1}


# ---------------------------------------------------------------------------
# integer PageRank
# ---------------------------------------------------------------------------

def test_pagerank_matches_scalar(ray_session):
    """Integer fixed-point PageRank vs a dict/loop scalar reference
    on a hand-built order graph: dangling nodes, duplicate
    (order, linenumber) rows (partkey tiebreak), multi-edges, and
    rows split across blocks."""
    import ray.data

    from kmerray.extras.graph import (PR_DAMP_NUM, PR_SCALE,
                                      order_transition_edges, pagerank)

    li = pd.DataFrame({
        # order 1: chain 10 -> 11 -> 12; order 2: 12 -> 10 twice
        # (multi-edge via dup linenumber pair), order 3: singleton 13
        "l_orderkey":   np.array([1, 1, 1, 2, 2, 2, 3],
                                 dtype=np.int64),
        "l_linenumber": np.array([1, 2, 3, 1, 1, 2, 1],
                                 dtype=np.int64),
        "l_partkey":    np.array([10, 11, 12, 12, 10, 10, 13],
                                 dtype=np.int64)})
    ds = ray.data.from_pandas([li.iloc[:2], li.iloc[2:5], li.iloc[5:]])

    edges = (order_transition_edges(ds).to_pandas()
             .sort_values(["src", "dst"]).reset_index(drop=True))
    # order 2 sorts (1,10),(1,12),(2,10) -> edges 10->12, 12->10
    assert list(zip(edges["src"], edges["dst"])) == [
        (10, 11), (10, 12), (11, 12), (12, 10)]

    out = (pagerank(ds, iters=4).to_pandas()
           .sort_values("node").reset_index(drop=True))

    # scalar reference
    nodes = sorted(set(li["l_partkey"]))
    eds = [(10, 11), (10, 12), (11, 12), (12, 10)]
    deg = {n: sum(1 for s, _ in eds if s == n) for n in nodes}
    r = {n: PR_SCALE for n in nodes}
    base = (100 - PR_DAMP_NUM) * PR_SCALE // 100
    for _ in range(4):
        acc = {n: 0 for n in nodes}
        for s, t in eds:
            acc[t] += r[s] // deg[s]
        r = {n: base + PR_DAMP_NUM * acc[n] // 100 for n in nodes}
    assert out["node"].tolist() == nodes
    assert out["rank"].tolist() == [r[n] for n in nodes]
    assert out["deg"].tolist() == [deg[n] for n in nodes]
    # the dangling singleton 13 holds the bare base rank
    assert out.loc[out["node"] == 13, "rank"].iloc[0] == base
    # the forced fully-distributed engine agrees bit-for-bit
    out2 = (pagerank(ds, iters=4, force="exchange").to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


# ---------------------------------------------------------------------------
# exact k-NN graph
# ---------------------------------------------------------------------------

def test_knn_graph_matches_bruteforce(ray_session, tmp_path):
    """Streaming-block exact k-NN vs a full-matrix numpy reference:
    ranked by (rounded sim DESC, id ASC), self excluded, multiple
    row groups and block sizes smaller than the corpus; k >= n
    degenerates to the all-neighbors graph."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kmerray.extras.similarity import knn_graph

    rng = np.random.default_rng(5)
    n, d, k = 37, 8, 4
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    tab = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float32()))})
    path = str(tmp_path / "emb.parquet")
    pq.write_table(tab, path, row_group_size=9)

    out = (knn_graph(path, k=k, dp=6, block_rows=10).to_pandas()
           .sort_values(["vec_id", "rnk"]).reset_index(drop=True))

    m = x.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = np.floor(m @ m.T * 1e6 + 0.5) / 1e6
    rows = []
    for i in range(n):
        cand = [(-s[i, j], ids[j]) for j in range(n) if j != i]
        cand.sort()
        for r_, (negs, nbr) in enumerate(cand[:k], 1):
            rows.append((ids[i], nbr, -negs, r_))
    exp = pd.DataFrame(rows, columns=["vec_id", "nbr", "sim", "rnk"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    # k >= n: every other vector is a neighbor, ranks dense 1..n-1
    full = knn_graph(path, k=n + 3, dp=6, block_rows=10).to_pandas()
    assert len(full) == n * (n - 1)
    assert full.groupby("vec_id")["rnk"].max().eq(n - 1).all()


# ---------------------------------------------------------------------------
# URL-normalized dedup
# ---------------------------------------------------------------------------

def test_url_dedup_normalization_and_keeper(ray_session):
    """Scheme / userinfo / case / www / trailing-slash variants
    collapse to one normalized URL and only the lowest doc_id
    survives; URL-less docs always pass; only the FIRST URL counts;
    rows split across blocks."""
    import ray.data

    from kmerray.extras.pii import url_dedup_pipeline

    docs = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": [
            "see https://www.Site1.example/p/3/ today",       # keeper
            "see http://site1.example/p/3 again",             # dup
            "x HTTP is not a url here",                       # no URL
            "u http://bob@Site1.example/p/3/ mirror",         # dup
            "first https://a.example/x then https://site1.example/p/3",
            "other https://site2.example/p/3 page",           # distinct
            "plain words only",                               # no URL
        ]})
    ds = ray.data.from_pandas([docs.iloc[:2], docs.iloc[2:5],
                               docs.iloc[5:]])
    out = _pdf(url_dedup_pipeline(ds, n_buckets=4))
    assert out["keep"].tolist() == [1, 0, 1, 0, 1, 1, 1]
    assert out.loc[0, "url_norm"] == "site1.example/p/3"
    assert out.loc[3, "url_norm"] == "site1.example/p/3"
    # doc 4's FIRST url wins -> a.example/x, not the site1 dup
    assert out.loc[4, "url_norm"] == "a.example/x"
    assert out.loc[2, "url_norm"] == "" and out.loc[6, "url_norm"] == ""


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_ref(pay: bytes):
    """Sequential byte-at-a-time reference (mirrors oracle._ref_cdc)."""
    from kmerray.extras.cdc import CDC_MASK, GEAR, GEAR2
    M64 = (1 << 64) - 1
    mask = int(CDC_MASK)
    h, start = 0, 0
    out = []
    for i, b in enumerate(pay):
        h = ((h << 1) & M64) ^ int(GEAR[b])
        if (h & mask) == 0 or i == len(pay) - 1:
            ch = 0
            for k in range(start, i + 1):
                s = (k - start) & 63
                g = int(GEAR2[pay[k]])
                ch ^= ((g << s) & M64) | (g >> ((64 - s) & 63))
            out.append((start, i - start + 1,
                        ch - (1 << 64) if ch >= 1 << 63 else ch))
            start = i + 1
    return out


def test_cdc_chunks_matches_sequential(ray_session):
    """Vectorized 64-term XOR expansion == the sequential recurrence,
    across payloads batched together (fix-up correctness) incl. a
    payload shorter than the 64-byte window."""
    import pyarrow as pa
    import ray.data

    from kmerray.extras.cdc import cdc_chunks
    rng = np.random.default_rng(3)
    pays = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            for n in (700, 13, 250, 64)]
    tab = pa.table({
        "item_id": pa.array([f"i{k}" for k in range(len(pays))]),
        "payload": pa.array(pays, pa.binary())})
    out = (cdc_chunks(ray.data.from_arrow(tab)).to_pandas()
           .sort_values(["item_id", "chunk_idx"])
           .reset_index(drop=True))
    rows = []
    for k, p in enumerate(pays):
        for idx, (s, ln, ch) in enumerate(_cdc_ref(p)):
            rows.append((f"i{k}", idx, s, ln, ch))
    exp = pd.DataFrame(rows, columns=["item_id", "chunk_idx", "start",
                                      "length", "chash"]) \
        .sort_values(["item_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_cdc_insertion_shifts_one_chunk(ray_session):
    """The content-defined property: inserting bytes near the front
    changes only the chunks up to the first boundary after the edit —
    later chunk hashes are identical (offset-shifted), which is the
    whole point vs fixed-size chunking."""
    import pyarrow as pa
    import ray.data

    from kmerray.extras.cdc import cdc_chunks
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    edited = base[:10] + b"INSERTED" + base[10:]
    tab = pa.table({"item_id": pa.array(["a", "b"]),
                    "payload": pa.array([base, edited], pa.binary())})
    out = cdc_chunks(ray.data.from_arrow(tab)).to_pandas()
    ha = set(out[out.item_id == "a"]["chash"])
    hb = set(out[out.item_id == "b"]["chash"])
    shared = len(ha & hb)
    assert shared >= len(ha) - 3          # only the head chunks churn
    assert shared < len(ha | hb)          # but something did change


# ---------------------------------------------------------------------------
# blocklist phrase hits
# ---------------------------------------------------------------------------

def test_phrase_hits_matches_scalar(ray_session):
    """Substring (not token) counting vs a str.count scalar
    reference: multi-word phrases crossing token boundaries,
    self-overlapping phrase non-overlap rule, zero-hit rows absent."""
    import ray.data

    from kmerray.extras.text import phrase_hits

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["aaa b table scan c table scanner",
                 "spark sparkle spark",
                 "nothing here",
                 "batch batch batch"]})
    out = (phrase_hits(ray.data.from_pandas(
        [docs.iloc[:2], docs.iloc[2:]]), ("aa", "table scan", "spark",
                                          "batch batch"))
        .to_pandas().sort_values(["doc_id", "phrase"])
        .reset_index(drop=True))
    exp = []
    for _, r in docs.iterrows():
        for p in ("aa", "table scan", "spark", "batch batch"):
            n = r["text"].count(p)   # str.count = non-overlapping
            if n:
                exp.append((r["doc_id"], p, n))
    exp = pd.DataFrame(exp, columns=["doc_id", "phrase", "n"]) \
        .sort_values(["doc_id", "phrase"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # the non-overlap rule concretely: 'aa' in 'aaa' is 1,
    # 'batch batch' in 'batch batch batch' is 1, 'spark' catches
    # 'sparkle' (substring semantics)
    assert exp[exp.phrase == "aa"]["n"].tolist() == [1]
    assert exp[exp.phrase == "batch batch"]["n"].tolist() == [1]
    assert exp[exp.phrase == "spark"]["n"].tolist() == [3]


# ---------------------------------------------------------------------------
# source n-gram diversity
# ---------------------------------------------------------------------------

def test_source_ngram_diversity_matches_scalar(ray_session):
    """Type-token ratios vs a set/Counter scalar reference: repeated
    vs diverse sources, cross-doc gram dedup within a source, sub-n
    docs emit nothing, rows split across blocks."""
    import ray.data

    from kmerray.extras.text import source_ngram_diversity

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "source": ["rep", "rep", "div", "div", "tiny", "rep"],
        "text": ["a b c a b c a b c",      # repetitive
                 "a b c d",                # shares grams with doc 0
                 "p q r s t",              # all distinct
                 "u v w x",                # all distinct
                 "x y",                    # < 3 words -> no grams
                 "a b c"]})                # one gram, dup of doc 0's
    ds = ray.data.from_pandas([docs.iloc[:2], docs.iloc[2:4],
                               docs.iloc[4:]])
    out = (source_ngram_diversity(ds, n=3, n_buckets=4)
           .sort_values("source").reset_index(drop=True))

    ref = {}
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        grams = [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]
        tot, dis = ref.setdefault(r["source"], [0, set()])
        ref[r["source"]][0] += len(grams)
        dis.update(grams)
    exp = pd.DataFrame(
        [(s, t, len(d), len(d) / float(t))
         for s, (t, d) in sorted(ref.items()) if t > 0],
        columns=["source", "n_grams", "n_distinct", "ttr"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert "tiny" not in set(out["source"])
    rep = out[out.source == "rep"].iloc[0]
    div = out[out.source == "div"].iloc[0]
    assert rep["ttr"] < div["ttr"] == 1.0


def test_bm25_no_hit_corpus_returns_empty(ray_session):
    """A corpus sharing no term with any query returns the typed
    empty frame instead of crashing on Ray's schema-less gather (the
    bench-corpus regression)."""
    import ray.data

    from kmerray.extras.text import bm25_topk
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["w1 w2 w3", "w4 w5", "w6"]})
    out = bm25_topk(ray.data.from_pandas(docs),
                    queries=(("q0", ("absent", "missing")),))
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "doc_id", "score",
                                 "rank"]
