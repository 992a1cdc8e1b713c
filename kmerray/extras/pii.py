"""PII pattern counting + scrubbing — a standard training-data
hygiene stage (emails / URLs / phone numbers -> typed placeholder
tokens).

Stateless vectorized ``map_batches``: pandas ``str.count`` /
``str.replace`` run the compiled C regex engine over whole columns,
no per-row Python.  The corpus never shuffles — each doc is scored
and scrubbed independently, so at 100 TB this stage streams with
zero exchanges.

Patterns are deliberately restricted to constructs with identical
semantics in Python ``re`` and DuckDB's RE2 (character classes,
counted repetition, alternation of literal prefixes; no lookaround,
no backrefs), so the DuckDB oracle mirrors the engine exactly.
Scrub order is URL -> EMAIL -> PHONE (URLs may contain userinfo
'@'; placeholders contain no scrubbable substrings, so later passes
never touch earlier replacements).

The reference has no text-hygiene surface; this is a prompt-mandated
training-data extra (no reference counterpart to cite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# RE2-and-Python-identical patterns (see module docstring)
URL_PATTERN = r"https?://[A-Za-z0-9@._%+/-]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"

# scrub order matters and is part of the contract (docstring above)
SCRUB_STEPS = (
    (URL_PATTERN, "<URL>"),
    (EMAIL_PATTERN, "<EMAIL>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def pii_scrub_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc PII counts (on the ORIGINAL text) + scrubbed text."""
    out = batch[["doc_id"]].copy()
    text = batch["text"]
    out["n_urls"] = text.str.count(URL_PATTERN).astype("int64")
    out["n_emails"] = text.str.count(EMAIL_PATTERN).astype("int64")
    out["n_phones"] = text.str.count(PHONE_PATTERN).astype("int64")
    scrubbed = text
    for pat, token in SCRUB_STEPS:
        scrubbed = scrubbed.str.replace(pat, token, regex=True)
    out["scrubbed"] = scrubbed
    return out


def pii_scrub_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(pii_scrub_fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# deterministic web-text fixture (the sf documents corpus contains no
# PII-shaped strings, so the op gets its own injected corpus — same
# shared-cache pattern as the media/video/audio parquets)
# ---------------------------------------------------------------------------

_FILLER = ("the data line fast table row batch scan merge sort window "
           "group key value part query column stream join filter").split()


def synth_webtext_table(n_docs: int, seed: int = 45) -> pa.Table:
    rng = np.random.default_rng([seed, n_docs])
    ids, texts = [], []
    for i in range(n_docs):
        words = list(rng.choice(_FILLER, size=int(rng.integers(5, 40))))
        for _ in range(int(rng.integers(0, 4))):       # emails
            words.insert(int(rng.integers(0, len(words) + 1)),
                         f"user{rng.integers(1000)}"
                         f"@mail{rng.integers(100)}.example.com")
        for _ in range(int(rng.integers(0, 3))):       # urls
            words.insert(int(rng.integers(0, len(words) + 1)),
                         f"https://site{rng.integers(100)}.example/"
                         f"p/{rng.integers(10000)}")
        for _ in range(int(rng.integers(0, 3))):       # phones
            words.insert(int(rng.integers(0, len(words) + 1)),
                         f"{rng.integers(100, 1000)}-"
                         f"{rng.integers(100, 1000)}-"
                         f"{rng.integers(1000, 10000)}")
        if i % 23 == 0:      # url with userinfo '@' (order-of-scrub edge)
            words.append(f"http://u{rng.integers(100)}@host.example/x")
        if i % 31 == 0:      # adjacent pii, no filler between
            words.append("a@b.example.com https://c.example/d "
                         "555-123-4567")
        ids.append(i)
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


def ensure_webtext_parquet(n_docs: int = 400, seed: int = 45) -> str:
    from .multimodal import _ensure_cached_parquet
    return _ensure_cached_parquet(
        f"webtext-n{n_docs}-s{seed}-v1", "webtext.parquet",
        lambda: synth_webtext_table(n_docs, seed=seed),
        {"n_docs": n_docs, "seed": seed}, 128)


# optional userinfo@ before the host (both dialects support optional
# non-capturing groups); capture group 1 = the host
DOMAIN_PATTERN = r"https?://(?:[A-Za-z0-9._%+-]+@)?([A-Za-z0-9._-]+)"


def domain_stats_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-domain document counts from each doc's FIRST URL — the
    standard crawl-curation rollup (domain blocklists, per-domain
    caps).  Per-block value_counts partials ride a domain-keyed
    groupby: the key space is the distinct-domain set (bounded, and
    orders of magnitude below doc count on a real crawl), so the
    exchange stays tiny while the regex scan streams.

    Output: ``(domain:string, n_docs:int64)``."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dom = b["text"].str.extract(DOMAIN_PATTERN, expand=False).dropna()
        vc = dom.value_counts()
        return pd.DataFrame({"domain": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    part = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"domain": [g["domain"].iloc[0]],
                             "n_docs": [np.int64(g["n"].sum())]})

    return part.groupby("domain").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# URL-normalized dedup (the RefinedWeb curation stage: one page per
# normalized URL survives; Penedo et al. 2023 §3.2 run URL dedup
# before any content dedup because recrawls dominate raw CommonCrawl)
# ---------------------------------------------------------------------------

URL_CAPTURE = "(" + URL_PATTERN + ")"


def _normalize_urls(url: pd.Series) -> pd.Series:
    """Scheme / userinfo / case / www / trailing-slash normalization,
    in this exact operation order (the SQL twin mirrors it):
    strip scheme -> strip userinfo -> lowercase -> strip leading
    'www.' -> strip trailing '/'.  Userinfo strips BEFORE lowering
    (its charset is case-sensitive in both dialects)."""
    s = url.str.replace(r"^https?://", "", regex=True)
    s = s.str.replace(r"^[A-Za-z0-9._%+-]+@", "", regex=True)
    s = s.str.lower()
    s = s.str.replace(r"^www\.", "", regex=True)
    return s.str.rstrip("/")


def url_dedup_pipeline(ds: "ray.data.Dataset",
                       n_buckets: int = 32) -> "ray.data.Dataset":
    """Keep one doc per normalized first URL (lowest doc_id); docs
    without a URL always survive.  ONE url-hash-bucketed exchange of
    ``(doc_id, url)`` int/string pairs — the text never shuffles, and
    the hash only routes (a collision co-buckets two URLs, the
    in-bucket compare is on the string, so results are exact).

    Output: ``(doc_id, url_norm, keep)`` — ``url_norm`` '' for
    URL-less docs."""
    from .text import content_hash64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        url = b["text"].str.extract(URL_CAPTURE, expand=False)
        has = url.notna().to_numpy()
        norm = _normalize_urls(url[has]).to_numpy(object)
        h = content_hash64(norm) if len(norm) else \
            np.zeros(0, dtype=np.uint64)
        out_url = np.full(len(ids), "", dtype=object)
        out_url[has] = norm
        ub = ids % n_buckets                 # URL-less rows spread
        ub[has] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": ids, "url": out_url,
            "kind": has.astype(np.int64), "ub": ub})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        ids = g["doc_id"].to_numpy()
        keep = np.ones(len(g), dtype=np.int64)
        hasm = kind == 1
        if hasm.any():
            sub = g[hasm]
            mins = sub.groupby("url")["doc_id"].transform("min")
            keep[hasm] = (sub["doc_id"].to_numpy()
                          == mins.to_numpy()).astype(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "url_norm": g["url"].to_numpy(object),
                             "keep": keep})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("ub").map_groups(merge, batch_format="pandas"))


def synth_urltext_table(n_docs: int, seed: int = 77) -> pa.Table:
    """Deterministic corpus for the URL-dedup gate: most docs carry a
    first URL assembled from colliding variants (scheme / case /
    'www.' / trailing slash / userinfo) of a small host×path space,
    so normalization produces real duplicate groups; some docs carry
    a second URL (first-match edge) and some carry none."""
    rng = np.random.default_rng([seed, n_docs])
    ids, texts = [], []
    hosts = ["Site%d.example" % k for k in range(12)]
    for i in range(n_docs):
        words = list(rng.choice(_FILLER,
                                size=int(rng.integers(4, 20))))
        if rng.random() < 0.8:
            host = hosts[int(rng.integers(len(hosts)))]
            host = host.lower() if rng.random() < 0.5 else host
            url = "%s://%s%s%s/p/%d%s" % (
                "https" if rng.random() < 0.5 else "http",
                "u%d@" % rng.integers(9) if rng.random() < 0.1 else "",
                "www." if rng.random() < 0.4 else "",
                host, rng.integers(6),
                "/" if rng.random() < 0.3 else "")
            words.insert(int(rng.integers(0, len(words) + 1)), url)
            if rng.random() < 0.2:     # second URL: must be ignored
                words.append("https://other%d.example/q"
                             % rng.integers(100))
        ids.append(i)
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


def ensure_urltext_parquet(n_docs: int = 400, seed: int = 77) -> str:
    from .multimodal import _ensure_cached_parquet
    return _ensure_cached_parquet(
        f"urltext-n{n_docs}-s{seed}-v1", "urltext.parquet",
        lambda: synth_urltext_table(n_docs, seed=seed),
        {"n_docs": n_docs, "seed": seed}, 128)
