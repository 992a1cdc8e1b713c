"""DuckDB oracle-SQL builders for the driver's correctness gate.

Each builder returns ANSI-ish SQL (DuckDB dialect) computing the same
result as the matching Ray pipeline in ``kmerray.queries``, over the
same synthesized sequences Parquet (read via ``read_parquet``) and the
driver's pre-registered views (documents, embeddings, ...).  Column
names match the Ray outputs exactly (driver hashes after sorting
columns by name)."""

from __future__ import annotations

from .sources.synth import DAY_US, TS_BASE_US


def _seq(path: str) -> str:
    return f"read_parquet('{path}/*.parquet')"


def _kmer_terms(k: int):
    f = " + ".join(f"tokens[i+{j}]*{4 ** (k - 1 - j)}" for j in range(k))
    r = " + ".join(f"(3-tokens[i+{j}])*{4 ** j}" for j in range(k))
    valid = " AND ".join(f"tokens[i+{j}]<4" for j in range(k))
    return f, r, valid


def km_cte(path: str, k: int, extra_cols: str = "") -> str:
    """CTE `km`: one row per valid canonical k-mer occurrence."""
    f, r, valid = _kmer_terms(k)
    return f"""km AS (
  SELECT doc_id{extra_cols}, CAST(least({f}, {r}) AS BIGINT) AS kmer
  FROM {_seq(path)},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - {k - 1})) AS i) g
  WHERE {valid}
)"""


def kmer_counts_per_doc_sql(path: str, k: int) -> str:
    return f"""WITH {km_cte(path, k)}
SELECT doc_id, kmer, count(*) AS cnt FROM km GROUP BY doc_id, kmer"""


def global_counts_sql(path: str, k: int) -> str:
    return f"""WITH {km_cte(path, k)}
SELECT kmer, count(*) AS cnt FROM km GROUP BY kmer"""


def kmer_complexity_sql(path: str, k: int) -> str:
    """Mirror of pipelines.counter.kmer_complexity: distinct/total
    canonical k-mers per doc, ONE int64/int64 IEEE division."""
    return f"""WITH {km_cte(path, k)}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kmers,
       CAST(count(DISTINCT kmer) AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT kmer) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS complexity
FROM km GROUP BY doc_id"""


def diginorm_sql(path: str, k: int, cutoff: int = None) -> str:
    """Mirror of pipelines.counter.diginorm: per-read median canonical
    k-mer abundance vs the global table, exact ceil-rank median
    (1-based rank ceil(n/2) ascending), integer cutoff compare."""
    if cutoff is None:
        from .pipelines.counter import DIGINORM_CUTOFF
        cutoff = DIGINORM_CUTOFF
    return f"""WITH {km_cte(path, k)},
cnt AS (SELECT kmer, CAST(count(*) AS BIGINT) AS c
        FROM km GROUP BY kmer),
ab AS (SELECT km.doc_id, cnt.c FROM km JOIN cnt USING (kmer)),
r AS (SELECT doc_id, c,
             row_number() OVER (PARTITION BY doc_id ORDER BY c) AS rn,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      FROM ab)
SELECT doc_id, n AS n_kmers, c AS med_abund,
       CAST(c <= {cutoff} AS BIGINT) AS keep
FROM r WHERE rn = (n + 1) // 2"""


def cfv_norm_sql(path: str, k: int) -> str:
    """Nonzero normalized CFV entries (doc_id, col, freq): `col` is the
    canonical column index (rank of the canonical k-mer among all 4^k
    canonicalized values, /root/reference/kmer/src/kmer.rs:54-73)."""
    # rc of a packed kmer value v (not a window):
    rc = " + ".join(f"(3 - ((v // {4 ** j}) % 4)) * {4 ** (k - 1 - j)}"
                    for j in range(k))
    return f"""WITH {km_cte(path, k)},
allk AS (
  SELECT CAST(least(v, {rc}) AS BIGINT) AS canon
  FROM (SELECT unnest(generate_series(0, {4 ** k - 1})) AS v)
),
colmap AS (
  SELECT canon, CAST(row_number() OVER (ORDER BY canon) - 1 AS BIGINT) AS col
  FROM (SELECT DISTINCT canon FROM allk)
),
per AS (
  SELECT doc_id, kmer, count(*) AS cnt FROM km GROUP BY doc_id, kmer
),
tot AS (SELECT doc_id, sum(cnt) AS total FROM per GROUP BY doc_id)
SELECT p.doc_id, c.col,
       CAST(p.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS freq
FROM per p JOIN colmap c ON c.canon = p.kmer
JOIN tot t ON t.doc_id = p.doc_id"""


def cfv_raw_sql(path: str, k: int) -> str:
    """Raw-mode normalized CFV: col = the forward k-mer value itself
    (no canonical folding; /root/reference/composition/src/oligo.rs:250)."""
    f, _, valid = _kmer_terms(k)
    return f"""WITH km AS (
  SELECT doc_id, CAST({f} AS BIGINT) AS col
  FROM {_seq(path)},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - {k - 1})) AS i) g
  WHERE {valid}
),
per AS (SELECT doc_id, col, count(*) AS cnt FROM km GROUP BY doc_id, col),
tot AS (SELECT doc_id, sum(cnt) AS total FROM per GROUP BY doc_id)
SELECT p.doc_id, p.col,
       CAST(p.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS freq
FROM per p JOIN tot t ON t.doc_id = p.doc_id"""


def oligo_cgr_sql(path: str, k: int) -> str:
    """Oligo-CGR entries: canonical column map (as in cfv_norm) plus
    the per-canonical-kmer CGR endpoint, folded digit-by-digit with
    the exact (corner + acc)/2 operation order so the floats are
    bit-identical (same list_reduce trick as cgr_final_sql);
    vecsize = k*k (the CLI default, kmertools/src/args.rs:266-269)."""
    v = float(k * k)
    rc = " + ".join(f"(3 - ((v // {4 ** j}) % 4)) * {4 ** (k - 1 - j)}"
                    for j in range(k))
    # walk digits most-significant first; corner x = v if digit>=2,
    # corner y = v if digit in (1,2)  (A=(0,0) C=(0,v) G=(v,v) T=(v,0))
    xt = ", ".join(
        f"CAST(CASE WHEN ((canon // {4 ** (k - 1 - j)}) % 4) >= 2 "
        f"THEN {v} ELSE 0 END AS DOUBLE)" for j in range(k))
    yt = ", ".join(
        f"CAST(CASE WHEN ((canon // {4 ** (k - 1 - j)}) % 4) IN (1, 2) "
        f"THEN {v} ELSE 0 END AS DOUBLE)" for j in range(k))
    fold = f"(acc, t) -> (t + acc) / 2"
    return f"""WITH {km_cte(path, k)},
allk AS (
  SELECT CAST(least(v, {rc}) AS BIGINT) AS canon
  FROM (SELECT unnest(generate_series(0, {4 ** k - 1})) AS v)
),
colmap AS (
  SELECT canon, CAST(row_number() OVER (ORDER BY canon) - 1 AS BIGINT) AS col,
         list_reduce(list_prepend(CAST({v / 2.0} AS DOUBLE), [{xt}]),
                     {fold}) AS x,
         list_reduce(list_prepend(CAST({v / 2.0} AS DOUBLE), [{yt}]),
                     {fold}) AS y
  FROM (SELECT DISTINCT canon FROM allk)
),
per AS (
  SELECT doc_id, kmer, count(*) AS cnt FROM km GROUP BY doc_id, kmer
),
tot AS (SELECT doc_id, sum(cnt) AS total FROM per GROUP BY doc_id)
SELECT p.doc_id, c.col, c.x, c.y,
       CAST(p.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS freq
FROM per p JOIN colmap c ON c.canon = p.kmer
JOIN tot t ON t.doc_id = p.doc_id"""


def minimisers_sql(path: str, w: int, m: int) -> str:
    """(doc_id, mmer, start, end) minimizer runs — value-RLE over
    per-window minima with the reference's end-of-row drop quirk."""
    f, r, valid = _kmer_terms(m)
    W = w - m + 1
    return f"""WITH mm AS (
  SELECT doc_id, n_tok, i,
    CASE WHEN {valid} THEN CAST(least({f}, {r}) AS BIGINT) ELSE NULL END AS canon
  FROM {_seq(path)},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - {m - 1})) AS i) g
),
win AS (
  SELECT doc_id, n_tok, i AS j,
    min(canon) OVER w AS wmin,
    count(canon) OVER w AS nvalid,
    count(*) OVER w AS ntotal
  FROM mm
  WINDOW w AS (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING)
),
valid AS (
  SELECT doc_id, n_tok, j, wmin FROM win
  WHERE ntotal = {W} AND nvalid = {W}
),
runs AS (
  SELECT doc_id, n_tok, j, wmin,
    CASE WHEN lag(j) OVER (PARTITION BY doc_id ORDER BY j) = j - 1
          AND lag(wmin) OVER (PARTITION BY doc_id ORDER BY j) = wmin
         THEN 0 ELSE 1 END AS brk
  FROM valid
),
grp AS (
  SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY j) AS g FROM runs
),
agg AS (
  SELECT doc_id, any_value(n_tok) AS n_tok, g, any_value(wmin) AS wmin,
         min(j) AS j1, max(j) AS j2, count(*) AS cnt
  FROM grp GROUP BY doc_id, g
)
SELECT a.doc_id, a.wmin AS mmer,
       CAST(a.j1 - 1 AS BIGINT) AS start_pos,
       CAST(a.j2 - 1 + {w} AS BIGINT) AS end_pos
FROM agg a
LEFT JOIN valid p ON p.doc_id = a.doc_id AND p.j = a.j1 - 1
WHERE NOT (a.cnt = 1 AND a.j2 = a.n_tok - {w} + 1 AND p.j IS NOT NULL)"""


def m2s_index_counts_sql(path: str, w: int, m: int) -> str:
    return f"""WITH runs AS ({minimisers_sql(path, w, m)})
SELECT mmer, count(*) AS n_entries, count(DISTINCT doc_id) AS n_docs
FROM runs GROUP BY mmer"""


def whole_seq_minimiser_sql(path: str, m: int) -> str:
    return f"""WITH {km_cte(path, m)}
SELECT doc_id, CAST(min(kmer) AS BIGINT) AS mmer FROM km GROUP BY doc_id"""


def cov_hist_sql(path: str, k: int, bin_size: int, bin_count: int) -> str:
    """Unnormalized coverage histogram (nonzero bins) against the
    global dictionary built from the same corpus."""
    return f"""WITH {km_cte(path, k)},
dict AS (SELECT kmer, count(*) AS cnt FROM km GROUP BY kmer)
SELECT km.doc_id,
       least(d.cnt // {bin_size}, {bin_count - 1}) AS bin,
       count(*) AS val
FROM km JOIN dict d ON d.kmer = km.kmer
GROUP BY km.doc_id, bin"""


def asof_snapshots_sql(path: str, k: int) -> str:
    return f"""WITH {km_cte(path, k, ", source, ts")},
daily AS (
  SELECT source, kmer, (epoch_us(ts) - {TS_BASE_US}) // {DAY_US} AS day,
         count(*) AS cnt
  FROM km GROUP BY 1, 2, 3
)
SELECT source, kmer, day,
       CAST(sum(cnt) OVER (PARTITION BY source, kmer ORDER BY day) AS BIGINT)
         AS cum_cnt
FROM daily"""


def asof_cov_hist_sql(path: str, k: int, bin_size: int,
                      bin_count: int) -> str:
    """Point-in-time coverage histogram: every k-mer occurrence looks up
    the newest per-source snapshot with close <= row ts (ASOF join);
    missing/never-seen -> 0."""
    return f"""WITH {km_cte(path, k, ", source, ts")},
daily AS (
  SELECT source, kmer, (epoch_us(ts) - {TS_BASE_US}) // {DAY_US} AS day,
         count(*) AS cnt
  FROM km GROUP BY 1, 2, 3
),
snap AS (
  SELECT source, kmer, day,
         CAST(sum(cnt) OVER (PARTITION BY source, kmer ORDER BY day)
              AS BIGINT) AS cum_cnt
  FROM daily
),
occ AS (
  SELECT doc_id, source, kmer,
         (epoch_us(ts) - {TS_BASE_US}) // {DAY_US} - 1 AS eff
  FROM km
),
lookup AS (
  SELECT o.doc_id, coalesce(s.cum_cnt, 0) AS cnt
  FROM occ o ASOF LEFT JOIN snap s
    ON o.source = s.source AND o.kmer = s.kmer AND s.day <= o.eff
)
SELECT doc_id, least(cnt // {bin_size}, {bin_count - 1}) AS bin,
       count(*) AS val
FROM lookup GROUP BY doc_id, bin"""


def lag_lead_sql(path: str) -> str:
    return f"""SELECT doc_id,
  CAST(coalesce(lag(n_tok)  OVER w, -1) AS BIGINT) AS prev_n_tok,
  CAST(coalesce(lead(n_tok) OVER w, -1) AS BIGINT) AS next_n_tok
FROM {_seq(path)}
WINDOW w AS (PARTITION BY source ORDER BY ts, doc_id)"""


def sessionize_sql(path: str, gap_us: int) -> str:
    return f"""WITH g AS (
  SELECT doc_id, source, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
         THEN 1 ELSE 0 END AS brk
  FROM {_seq(path)}
  WINDOW w AS (PARTITION BY source ORDER BY ts, doc_id)
)
SELECT doc_id,
       CAST(sum(brk) OVER (PARTITION BY source ORDER BY ts, doc_id) AS BIGINT)
         AS session_seq
FROM g"""


# ---------------------------------------------------------------------------
# training-data extras over the driver's documents / embeddings views
# ---------------------------------------------------------------------------

STOPLIST_SQL = "('the','and','of','a','to','in','is','it')"


def doc_stats_sql() -> str:
    return f"""SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(list_filter(string_split(text, ' '),
       w -> w IN {STOPLIST_SQL})) AS BIGINT) AS stop_cnt
FROM documents"""


def quality_sql() -> str:
    """Mirror of extras.text.quality_fn with the exact same double
    operation order (clip = least(greatest(...))), so the floats are
    bit-identical; distinct words via list_distinct (the engine uses
    distinct 64-bit word hashes — equal up to a ~1e-14 collision)."""
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
s AS (
  SELECT doc_id,
    CAST(len(ws) AS DOUBLE) AS n,
    CAST(len(list_distinct(ws)) AS DOUBLE) AS d,
    CAST(len(list_filter(ws, x -> x IN {STOPLIST_SQL})) AS DOUBLE) AS st
  FROM w
)
SELECT doc_id,
  0.5 * (least(greatest(n / 50.0, 0.0), 1.0)
         * least(greatest(2.0 - n / 500.0, 0.0), 1.0))
  + 0.25 * least(greatest(d / n, 0.0), 1.0)
  + 0.25 * least(greatest((st / n) * 5.0, 0.0), 1.0) AS quality
FROM s"""


def lang_id_sql() -> str:
    """Mirror of extras.text.lang_id_fn: distinct hint-word hits per
    language, first-in-dict-order argmax, 'und' when all zero."""
    from .extras.text import _LANG_HINTS
    langs = list(_LANG_HINTS)
    score_cols = []
    for lang in langs:
        inlist = ", ".join(f"'{h}'" for h in sorted(_LANG_HINTS[lang]))
        score_cols.append(
            f"len(list_filter(ws, x -> x IN ({inlist}))) AS s_{lang}")
    all_scores = ", ".join(f"s_{lang}" for lang in langs)
    cases = []
    for i, lang in enumerate(langs):
        rest = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cond = " AND ".join(rest) if rest else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    return f"""WITH w AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
  FROM documents
),
s AS (
  SELECT doc_id, {", ".join(score_cols)} FROM w
)
SELECT doc_id,
  CASE WHEN greatest({all_scores}) = 0 THEN 'und'
       {" ".join(cases)}
       ELSE 'und' END AS lang_guess
FROM s"""


def token_counts_sql() -> str:
    """Mirror of extras.text.token_count_fn (RE2 char classes ==
    Python re for these patterns)."""
    from .extras.text import TOKEN_PATTERNS
    parts = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for p in TOKEN_PATTERNS)
    return f"""SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST({parts} AS BIGINT) AS n_bpe_tokens
FROM documents"""


def rep_stats_sql() -> str:
    """Mirror of extras.text.rep_stats_fn: duplicate-word fraction and
    top-2-gram fraction, same double operation order (int/int division
    after DOUBLE casts)."""
    return """WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
stats AS (
  SELECT doc_id, CAST(len(w) AS DOUBLE) AS n,
         CAST(len(list_distinct(w)) AS DOUBLE) AS d
  FROM words
),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g
),
gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
tp AS (SELECT doc_id, CAST(max(c) AS DOUBLE) AS mx,
              CAST(sum(c) AS DOUBLE) AS tot
       FROM gc GROUP BY 1)
SELECT s.doc_id,
  1.0 - d / n AS dup_word_frac,
  coalesce(mx / tot, 0.0) AS top_2gram_frac
FROM stats s LEFT JOIN tp ON s.doc_id = tp.doc_id"""


def chunk_windows_sql(window: int = 32, stride: int = 16) -> str:
    """Mirror of extras.chunking.chunk_windows_fn: generate_series
    starts every `stride`, trailing partial windows kept, re-joined
    window text compared exactly."""
    return f"""WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
)
SELECT doc_id,
  CAST((i - 1) / {stride} AS BIGINT) AS win_id,
  CAST(least({window}, len(w) - i + 1) AS BIGINT) AS n_win_tokens,
  array_to_string(array_slice(w, i, least(i + {window} - 1, len(w))),
                  ' ') AS win_text
FROM words,
     LATERAL (SELECT unnest(generate_series(1, len(w), {stride})) AS i) g"""


def stop_filter_sql() -> str:
    """Mirror of extras.chunking.stop_filter_fn (exact string
    equality on the rebuilt text)."""
    return f"""SELECT doc_id,
  array_to_string(list_filter(string_split(text, ' '),
                              x -> x NOT IN {STOPLIST_SQL}), ' ')
    AS clean_text,
  CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN {STOPLIST_SQL})) AS BIGINT) AS n_removed
FROM documents"""


def df_counts_sql() -> str:
    return """SELECT word, CAST(count(*) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
        AS word FROM documents)
GROUP BY word"""


def char_entropy_sql(dp: int = None, min_entropy: float = None) -> str:
    """Mirror of extras.text.char_entropy: per-doc char histogram
    entropy, tie-safe floor dp-rounding, keep compares the ROUNDED
    value (both engines round before thresholding)."""
    from .extras.text import ENT_DP, ENT_MIN
    dp = ENT_DP if dp is None else dp
    min_entropy = ENT_MIN if min_entropy is None else min_entropy
    sc = 10 ** dp
    return f"""WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE text <> ''
), g AS (
  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
  FROM ch GROUP BY doc_id, c
), t AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(n) AS DOUBLE) AS nn, SUM(n * ln(n)) AS s
  FROM g GROUP BY doc_id
), e AS (
  SELECT doc_id, n_distinct,
         floor((ln(nn) - s / nn) * {sc} + 0.5) / {sc} AS entropy
  FROM t)
SELECT doc_id, n_distinct, entropy,
       CAST(entropy >= {min_entropy!r} AS BIGINT) AS keep
FROM e"""


def mad_outliers_sql(n_mads: int = 3) -> str:
    """Mirror of extras.grouped.grouped_mad_outliers: exact ceil-rank
    median and MAD per source, ONE int/int IEEE division for rz,
    integer Hampel flag; MAD = 0 -> NaN."""
    return f"""WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars)
           AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM documents),
med AS (SELECT source, CAST(n_chars AS BIGINT) AS med, n
        FROM r WHERE rn = (n + 1) // 2),
dv AS (SELECT d.source, abs(d.n_chars - m.med) AS ad
       FROM documents d JOIN med m USING (source)),
r2 AS (SELECT source, ad,
              row_number() OVER (PARTITION BY source ORDER BY ad)
                AS rn,
              CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       FROM dv),
mad AS (SELECT source, CAST(ad AS BIGINT) AS mad
        FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.doc_id, m.med, x.mad,
       CASE WHEN x.mad = 0 THEN CAST('nan' AS DOUBLE)
            ELSE CAST(d.n_chars - m.med AS DOUBLE) / x.mad END AS rz,
       CAST(abs(d.n_chars - m.med) > {n_mads} * x.mad AS BIGINT)
         AS outlier
FROM documents d JOIN med m USING (source) JOIN mad x USING (source)"""


def source_divergence_sql(dp: int = None) -> str:
    """Mirror of extras.text.source_divergence: identical IEEE
    per-word term, arbitrary-order SUM absorbed by the tie-safe
    floor rounding of the FINAL pair scalar (the unigram_logprob
    discipline)."""
    from .extras.text import JSD_DP
    dp = JSD_DP if dp is None else dp
    sc = 10 ** dp
    p1 = "(CAST(c1 AS DOUBLE) / n1)"
    p2 = "(CAST(c2 AS DOUBLE) / n2)"
    m = f"(0.5 * ({p1} + {p2}))"
    return f"""WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word
  FROM documents),
wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
       FROM w GROUP BY source, word),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        FROM wc GROUP BY source),
pairs AS (SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
          FROM tot a JOIN tot b ON a.source < b.source),
vocab AS (SELECT DISTINCT word FROM wc),
grid AS (
  SELECT p.s1, p.s2, p.n1, p.n2,
         coalesce(w1.c, 0) AS c1, coalesce(w2.c, 0) AS c2
  FROM pairs p CROSS JOIN vocab v
  LEFT JOIN wc w1 ON w1.source = p.s1 AND w1.word = v.word
  LEFT JOIN wc w2 ON w2.source = p.s2 AND w2.word = v.word
  WHERE coalesce(w1.c, 0) + coalesce(w2.c, 0) > 0),
t AS (
  SELECT s1, s2,
         SUM(CASE WHEN c1 > 0
               THEN 0.5 * {p1} * ln({p1} / {m}) ELSE 0.0 END
           + CASE WHEN c2 > 0
               THEN 0.5 * {p2} * ln({p2} / {m}) ELSE 0.0 END) AS raw
  FROM grid GROUP BY s1, s2)
SELECT s1, s2, floor(raw * {float(sc)!r} + 0.5) / {float(sc)!r} AS jsd
FROM t"""


def bm25_topk_sql(queries=None, k: int = None, k1: float = None,
                  b: float = None, dp: int = None) -> str:
    """Mirror of extras.text.bm25_topk: identical IEEE expression tree
    per term (idf from the folded exact ints, the Robertson tf
    saturation), only the per-(query, doc) SUM order differs -> both
    engines round with the tie-safe floor convention and rank by
    (ROUNDED score DESC, doc_id ASC)."""
    from .extras.text import (BM25_B, BM25_DP, BM25_K1, BM25_QUERIES,
                              BM25_TOPK)
    queries = BM25_QUERIES if queries is None else queries
    k = BM25_TOPK if k is None else k
    k1 = BM25_K1 if k1 is None else k1
    b = BM25_B if b is None else b
    dp = BM25_DP if dp is None else dp
    sc = 10 ** dp

    def q(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(f"('{q(qid)}', '{q(t)}')"
                     for qid, ts in queries for t in ts)
    return f"""WITH qt(query_id, term) AS (VALUES {vals}),
dl AS (SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       FROM documents),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tot FROM dl),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
dfr AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM w WHERE term IN (SELECT term FROM qt) GROUP BY term),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM w WHERE term IN (SELECT term FROM qt)
       GROUP BY doc_id, term),
s AS (
  SELECT qt.query_id, tf.doc_id,
         SUM(ln(1.0 + (CAST(st.n AS DOUBLE) - dfr.df + 0.5)
                      / (dfr.df + 0.5))
             * (CAST(tf.tf AS DOUBLE) * ({k1!r} + 1.0))
             / (CAST(tf.tf AS DOUBLE)
                + {k1!r} * (1.0 - {b!r}
                            + {b!r} * CAST(dl.dl AS DOUBLE)
                              / (CAST(st.tot AS DOUBLE) / st.n)))) AS raw
  FROM tf JOIN qt USING (term) JOIN dfr USING (term)
       JOIN dl USING (doc_id), st
  GROUP BY qt.query_id, tf.doc_id),
r AS (SELECT query_id, doc_id,
             floor(raw * {sc} + 0.5) / {sc} AS score FROM s),
rk AS (SELECT query_id, doc_id, score,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       FROM r)
SELECT query_id, doc_id, score, rank FROM rk WHERE rank <= {k}"""


def mg_topwords_sql(k: int) -> str:
    """Mirror of extras.sketch.mg_topwords: the certified Misra-Gries
    two-pass result IS the exact top-k (the certificate guarantees
    it), so the oracle is the plain exact ranking with the same
    (cnt DESC, word ASC) tie order."""
    return f"""SELECT word, cnt, rank FROM (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         CAST(row_number() OVER (ORDER BY count(*) DESC, word)
              AS BIGINT) AS rank
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word)
WHERE rank <= {k}"""


def vocab_coverage_sql(ps=None) -> str:
    """Mirror of extras.text.vocab_coverage: min rank in
    (cnt DESC, word ASC) order whose running token mass reaches
    ceil(p * total); covered = the cumsum at that rank (min_by).
    The engine never ranks words — its tie-level integer arithmetic
    is provably the same rank; this window form is the readable
    certificate."""
    from .extras.text import VOCAB_PS
    ps = VOCAB_PS if ps is None else ps
    vals = ", ".join(f"('{p:g}', {p!r})" for p in ps)
    return f"""WITH wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
), r AS (
  SELECT cnt,
         SUM(cnt) OVER (ORDER BY cnt DESC, word) AS cum,
         row_number() OVER (ORDER BY cnt DESC, word) AS rn
  FROM wc
), t AS (SELECT SUM(cnt) AS total FROM wc),
pv(p, pf) AS (VALUES {vals})
SELECT pv.p AS p, CAST(min(r.rn) AS BIGINT) AS vocab_size,
       CAST(min_by(r.cum, r.rn) AS BIGINT) AS covered
FROM pv, r, t WHERE r.cum >= ceil(pv.pf * t.total)
GROUP BY pv.p"""


def top_quality_per_lang_sql(k: int = 3) -> str:
    """Grouped top-k over the bit-identical quality score: row_number
    PARTITION BY lang ORDER BY quality DESC, doc_id — the same
    (score DESC, tiebreak ASC) rule as extras.grouped.grouped_topk."""
    return f"""WITH q AS ({quality_sql()})
SELECT doc_id, lang, quality FROM (
  SELECT q.doc_id, d.lang, q.quality,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY q.quality DESC, q.doc_id) AS rn
  FROM q JOIN documents d ON q.doc_id = d.doc_id
) WHERE rn <= {k}"""


def events_hourly_sql(window_us: int = 3_600_000_000) -> str:
    """Mirror of extras.events.tumbling_window_agg: integer-cents sums
    are order-independent, so the aggregate hash-matches exactly."""
    return f"""SELECT user_id,
  CAST(floor(epoch_us(ts) / {window_us}) AS BIGINT) AS win,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2"""


def events_json_k_sql(field: str = "k") -> str:
    return f"""SELECT event_id,
  CAST(coalesce(nullif(regexp_extract(props, '"{field}": ([0-9]+)', 1),
                       ''), '-1') AS BIGINT) AS {field}
FROM events"""


def events_sessions_sql(gap_us: int = 6 * 3_600_000_000) -> str:
    """Mirror of extras.events.sessionized_user_stats: gaps-and-islands
    via lag + running sum, then session-level rollup.  Ties broken by
    event_id on both sides; integer-cents sums keep it order-free."""
    return f"""WITH o AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM o
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM s GROUP BY 1, 2"""


def events_history_sql() -> str:
    """Mirror of extras.events.user_history_features: strictly-before
    (exclusive) running count and cents sum per user."""
    return """SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS prior_n,
  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
       AS BIGINT) AS prior_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"""


def events_rolling_sql(n_prev: int = 3,
                       range_us: int = 3_600_000_000) -> str:
    """Mirror of extras.events.rolling_user_features: both standard
    window-frame kinds — ROWS n PRECEDING (ts, event_id order) and
    RANGE interval PRECEDING (ts order, peers included)."""
    return f"""SELECT event_id, user_id,
  CAST(count(*) OVER wr AS BIGINT) AS roll_n,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER wr AS BIGINT)
    AS roll_cents,
  CAST(count(*) OVER wt AS BIGINT) AS tw_n,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER wt AS BIGINT)
    AS tw_cents
FROM events
WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {n_prev} PRECEDING AND CURRENT ROW),
       wt AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN to_microseconds({range_us}) PRECEDING
                    AND CURRENT ROW)"""


def bigram_stats_sql(min_count: int = 5) -> str:
    """Mirror of extras.text.bigram_stats: adjacent-bigram counts with
    both unigram counts attached (the integer surface under PMI)."""
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bi AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c12
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g
  GROUP BY 1, 2 HAVING count(*) >= {min_count}
), uni AS (
  SELECT ws[i] AS w, CAST(count(*) AS BIGINT) AS c
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g
  GROUP BY 1
)
SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2
FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w"""


def dedup_exact_sql() -> str:
    return "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def ngram_dupes_sql(n: int = 3, threshold: float = 0.08) -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, {gram} AS gram
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1})) AS i) g
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {threshold}"""


def _exact_jaccard_edges_cte(n: int, threshold: float) -> str:
    """Shared CTE list: exact word-n-gram Jaccard >= threshold pairs
    over `documents` (the edge set of the near-dup graph)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, {gram} AS gram
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1})) AS i) g
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT i.a, i.b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a
  JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {threshold}
)"""


def near_dup_survivors_sql(n: int = 3, threshold: float = 0.8) -> str:
    """Survivors of the full near-dup pipeline: exact Jaccard edges at
    the verify threshold -> min-id connected components (recursive
    min-label closure) -> keep min doc_id per component.  Equals the
    engine's LSH->verify->components survivors because (a) verify makes
    LSH precision exact and (b) the query's banding params put LSH
    recall at J>=threshold at ~1-5e-8 per pair on the deterministic
    corpus (checked empirically at sf0.001/sf0.01)."""
    return f"""WITH RECURSIVE {_exact_jaccard_edges_cte(n, threshold)},
sym AS (
  SELECT a AS u, b AS v FROM edges
  UNION ALL
  SELECT b, a FROM edges
),
reach(node, lab) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.node, s.v FROM reach r JOIN sym s ON s.u = r.lab
),
comp AS (
  SELECT node, least(node, min(lab)) AS root FROM reach GROUP BY node
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> root)"""


def minhash_recall_sql(n: int = 3, threshold: float = 0.8) -> str:
    """Containment oracle for the LSH candidate stage: the Ray side
    returns ``exact_pairs(threshold) ∩ lsh_candidates``; it hash-equals
    this (all exact pairs) iff LSH missed none — banding isn't
    SQL-expressible, but its recall-1 containment is (VERDICT r2 next
    #6a)."""
    return f"""WITH {_exact_jaccard_edges_cte(n, threshold)}
SELECT a, b FROM edges"""


def ann_topk_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sc
  FROM q, embeddings e
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) AS rn
  FROM s
)
SELECT qid, vec_id FROM r WHERE rn <= {k}"""


def hard_negatives_sql(n_queries: int = 5, k: int = 10) -> str:
    """Mirror of extras.similarity.hard_negatives: ann_topk_sql with
    the different-label predicate applied before the rank."""
    return f"""WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe,
         label AS ql
  FROM embeddings WHERE vec_id < {n_queries}
),
s AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[]))
           AS sc
  FROM q, embeddings e WHERE e.label <> q.ql
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sc DESC, vec_id) AS rn
  FROM s
)
SELECT qid, vec_id FROM r WHERE rn <= {k}"""


def quantize_sql() -> str:
    """Mirror of extras.similarity.quantize_embeddings: identical
    operation order (127 * x / amax, then floor(.+0.5) — floor
    because numpy and SQL round() disagree on .5)."""
    return """WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> abs(x))) AS amax
  FROM embeddings
)
SELECT vec_id, CAST(i - 1 AS BIGINT) AS idx,
  CAST(floor(127 * v[i] / (CASE WHEN amax > 0 THEN amax ELSE 1.0 END)
             + 0.5) AS BIGINT) AS q,
  amax
FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g"""


def _ref_hll(events_path: str, p: int = 12):
    """Independent single-process HLL fit for the oracle literal:
    scalar-Python splitmix64 + bit_length rho per DISTINCT
    (event_type, user_id) — structurally different from the engine's
    vectorized occurrence-stream registers, same pinned spec, so the
    register vectors (exact ints) and hence the estimates coincide.
    The float estimate uses the same np.power/np.sum expression as
    the engine (the pinned estimator), rounded to 4 dp on both
    sides."""
    import numpy as np
    import pyarrow.parquet as pq
    t = pq.read_table(events_path, columns=["event_type", "user_id"])
    et = t.column("event_type").to_pylist()
    uid = t.column("user_id").to_pylist()
    per = {}
    for e, u in zip(et, uid):
        per.setdefault(e, set()).add(u)
    M = (1 << 64) - 1
    out = []
    for e in sorted(per):
        regs = [0] * (1 << p)
        for u in per[e]:
            z = (u + 0x9E3779B97F4A7C15) & M
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
            h = z ^ (z >> 31)
            idx = h >> (64 - p)
            rest = ((h << p) | (1 << (p - 1))) & M
            rho = 64 - rest.bit_length() + 1
            if rho > regs[idx]:
                regs[idx] = rho
        r = np.asarray(regs, np.uint8)
        m = float(len(r))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0,
                                              -r.astype(np.float64)))
        zeros = int((r == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out.append((e, round(float(est), 4), len(per[e])))
    return out


def _ref_cms_topwords(docs_path: str, k: int = 10):
    """Independent single-process count-min fit (scalar-Python word
    Counter + per-word register updates) for the oracle literal —
    same pinned spec (md5-lower-64 word hash, splitmix64(key^salt_j)
    % width), different code path from the engine's vectorized
    block partials.  Returns the corpus's exact top-k words (count
    desc, word asc) with their CM estimates and true counts."""
    import hashlib
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from .extras.sketch import CMS_DEPTH, CMS_SALTS, CMS_WIDTH
    wc = Counter()
    for txt in pq.read_table(docs_path, columns=["text"]).column(
            "text").to_pylist():
        wc.update(txt.split(" "))
    M = (1 << 64) - 1

    def mix(x):
        z = (x + 0x9E3779B97F4A7C15) & M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    regs = [[0] * CMS_WIDTH for _ in range(CMS_DEPTH)]
    hashes = {}
    for w, c in wc.items():
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16],
                           "little")
        hashes[w] = h
        for j in range(CMS_DEPTH):
            regs[j][mix(h ^ CMS_SALTS[j]) % CMS_WIDTH] += c
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = []
    for w, c in top:
        h = hashes[w]
        est = min(regs[j][mix(h ^ CMS_SALTS[j]) % CMS_WIDTH]
                  for j in range(CMS_DEPTH))
        out.append((w, est, c))
    return out


def _qlit(s: str) -> str:
    """SQL string literal with '' escaping (same convention as
    bpe_merges_sql's local q())."""
    return "'" + s.replace("'", "''") + "'"


def cms_topwords_sql(docs_path: str, k: int = 10) -> str:
    rows = ",\n  ".join(
        f"({_qlit(w)}, {est}, {c})" for w, est, c in
        _ref_cms_topwords(docs_path, k))
    return f"""SELECT word, CAST(est AS BIGINT) AS est,
       CAST(exact AS BIGINT) AS exact
FROM (VALUES
  {rows}) AS t(word, est, exact)"""


def hll_users_sql(events_path: str, p: int = 12) -> str:
    """The independently-fit per-type HLL estimates as literals, with
    the TRUE exact distinct count alongside so the sketch error is
    visible in the gated surface."""
    rows = ",\n  ".join(f"({_qlit(e)}, {est!r}, {exact})"
                         for e, est, exact in _ref_hll(events_path, p))
    return f"""SELECT event_type, CAST(est AS DOUBLE) AS est,
       CAST(exact AS BIGINT) AS exact
FROM (VALUES
  {rows}) AS t(event_type, est, exact)"""


def knn_graph_sql(k: int = 5, dp: int = 6) -> str:
    """Mirror of extras.similarity.knn_graph: exact all-vectors
    k-NN by (floor-dp-rounded cosine DESC, nbr ASC) — the rounding
    absorbs numpy-vs-DuckDB last-ulp sum-order differences."""
    scale = 10 ** dp
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
         floor(list_cosine_similarity(a.v, b.v) * {scale} + 0.5)
           / {scale} AS sim
  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
r AS (SELECT vec_id, nbr, sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, nbr) AS rnk
      FROM s)
SELECT vec_id, nbr, sim, CAST(rnk AS BIGINT) AS rnk FROM r
WHERE rnk <= {k}"""


def emb_near_dup_sql(threshold: float = 0.4) -> str:
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {threshold}"""


def media_features_sql(path: str) -> str:
    """Mirror of the multimodal fake-decode feature stage over the
    deterministic media parquet: frame byte j = payload[j % len], 16-bin
    byte histogram / frame size, mean = sum/size (exact int sums ->
    bit-identical doubles).  Per-byte access via hex() + strpos
    (DuckDB blobs have no direct byte indexer); entropy stays
    pytest-side (log2 operation order isn't worth pinning in SQL)."""
    hexmap = "0123456789ABCDEF"
    return f"""WITH m AS (
  SELECT item_id, media_type,
         CAST(width AS BIGINT) * CAST(height AS BIGINT) AS need,
         CAST(octet_length(payload) AS BIGINT) AS plen,
         hex(payload) AS h
  FROM read_parquet('{path}')
),
b AS (
  SELECT item_id, media_type, need,
         16 * (strpos('{hexmap}', substr(h, 2 * (i % plen) + 1, 1)) - 1)
         + strpos('{hexmap}', substr(h, 2 * (i % plen) + 2, 1)) - 1 AS byte
  FROM m,
       LATERAL (SELECT unnest(generate_series(0, need - 1)) AS i) g
),
mn AS (
  SELECT item_id, CAST(sum(byte) AS DOUBLE) / any_value(need) AS mean
  FROM b GROUP BY item_id
),
agg AS (
  SELECT item_id, any_value(media_type) AS media_type,
         any_value(need) AS need, byte // 16 AS bin, count(*) AS c
  FROM b GROUP BY item_id, byte // 16
)
SELECT a.item_id, a.media_type, CAST(a.bin AS BIGINT) AS bin,
       CAST(a.c AS DOUBLE) / a.need AS freq, mn.mean
FROM agg a JOIN mn ON mn.item_id = a.item_id"""


def frame_sample_sql(path: str, stride: int = 2) -> str:
    """Mirror of extras.multimodal.frame_sample_pipeline over the
    deterministic video parquet: payload = n_frames x (w*h) raw
    grayscale frames (trailing partial frame dropped), every
    ``stride``-th frame kept, mean = exact int byte sum / frame size
    (bit-identical doubles).  Per-byte access via hex() + strpos,
    same trick as media_features_sql."""
    hexmap = "0123456789ABCDEF"
    return f"""WITH m AS (
  SELECT item_id,
         CAST(width AS BIGINT) * CAST(height AS BIGINT) AS fsize,
         CAST(octet_length(payload) AS BIGINT)
           // (CAST(width AS BIGINT) * CAST(height AS BIGINT)) AS n_frames,
         hex(payload) AS h
  FROM read_parquet('{path}')
),
f AS (
  SELECT item_id, fsize, h,
         unnest(generate_series(0, n_frames - 1, {stride})) AS frame_idx
  FROM m WHERE n_frames > 0
),
b AS (
  SELECT item_id, frame_idx, fsize,
         16 * (strpos('{hexmap}',
               substr(h, 2 * (frame_idx * fsize + i) + 1, 1)) - 1)
         + strpos('{hexmap}',
               substr(h, 2 * (frame_idx * fsize + i) + 2, 1)) - 1 AS byte
  FROM f,
       LATERAL (SELECT unnest(generate_series(0, fsize - 1)) AS i) g
)
SELECT item_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(sum(byte) AS DOUBLE) / any_value(fsize) AS mean
FROM b GROUP BY item_id, frame_idx"""


def audio_energy_sql(path: str, win: int = 128, hop: int = 64) -> str:
    """Mirror of extras.multimodal.audio_energy_pipeline over the
    deterministic audio parquet: payload = little-endian int16 PCM
    (odd trailing byte dropped), hop-strided windows of ``win``
    samples, energy = exact int square-sum / win (bit-identical
    doubles).  Sample j = bytes 2j (lo) + 2j+1 (hi), sign via the
    high byte; per-byte access through hex() + strpos like
    media_features_sql."""
    hexmap = "0123456789ABCDEF"
    return f"""WITH m AS (
  SELECT item_id,
         CAST(octet_length(payload) AS BIGINT) // 2 AS n_samples,
         hex(payload) AS h
  FROM read_parquet('{path}')
),
w AS (
  SELECT item_id, h,
         unnest(generate_series(0, (n_samples - {win}) // {hop}))
           AS win_idx
  FROM m WHERE n_samples >= {win}
),
b AS (
  SELECT item_id, win_idx,
         16 * (strpos('{hexmap}',
               substr(h, 4 * (win_idx * {hop} + i) + 1, 1)) - 1)
         + strpos('{hexmap}',
               substr(h, 4 * (win_idx * {hop} + i) + 2, 1)) - 1 AS lo,
         16 * (strpos('{hexmap}',
               substr(h, 4 * (win_idx * {hop} + i) + 3, 1)) - 1)
         + strpos('{hexmap}',
               substr(h, 4 * (win_idx * {hop} + i) + 4, 1)) - 1 AS hi
  FROM w,
       LATERAL (SELECT unnest(generate_series(0, {win} - 1)) AS i) g
),
s AS (
  SELECT item_id, win_idx,
         lo + 256 * hi - CASE WHEN hi >= 128 THEN 65536 ELSE 0 END AS v
  FROM b
)
SELECT item_id, CAST(win_idx AS BIGINT) AS win_idx,
       CAST(sum(v * v) AS DOUBLE) / {win} AS energy
FROM s GROUP BY item_id, win_idx"""


def semdedup_sql(emb_path: str, n_clusters: int = 8, iters: int = 5,
                 threshold: float = 0.4) -> str:
    """Mirror of extras.decomp.semdedup_survivors: nearest literal
    reference centroid (same independent Lloyd's fit as
    kmeans_assign_sql, ties to lowest cluster), then NOT EXISTS a
    lower-id same-cluster neighbor at cosine >= threshold.  Same
    float caveats as kmeans_assign_sql / emb_near_dup_sql (both
    individually green under them)."""
    cent = _ref_kmeans_centroids(emb_path, n_clusters, iters)
    rows = ",\n  ".join(f"({i}, {_dlist(cent[i])})"
                        for i in range(n_clusters))
    return f"""WITH cent(cluster, cvec) AS (VALUES
  {rows}),
d AS (
  SELECT vec_id, cluster,
         list_distance(CAST(embedding AS DOUBLE[]), cvec) AS dist
  FROM embeddings, cent),
a AS (
  SELECT vec_id, cluster
  FROM (SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM d)
  WHERE rn = 1),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT hi.vec_id, CAST(hi.cluster AS BIGINT) AS cluster
FROM a hi
WHERE NOT EXISTS (
  SELECT 1 FROM a lo
  JOIN e el ON el.vec_id = lo.vec_id
  JOIN e eh ON eh.vec_id = hi.vec_id
  WHERE lo.cluster = hi.cluster AND lo.vec_id < hi.vec_id
    AND list_cosine_similarity(el.v, eh.v) >= {threshold})"""


def _ref_bpe_merges(docs_path: str, n_merges: int):
    """Independent single-process BPE fit (Sennrich et al. 2016) for
    the oracle literal: plain-Python word Counter over the parquet +
    a Counter-based merge loop — structurally different from the
    engine's distributed count pass + numpy-assisted loop, same
    deterministic rule (max count, ties to the lexicographically
    smallest pair)."""
    from collections import Counter

    import pyarrow.parquet as pq
    wc = Counter()
    for txt in pq.read_table(docs_path, columns=["text"]).column(
            "text").to_pylist():
        wc.update(txt.split(" "))
    seqs = {w: tuple(w) + ("</w>",) for w in wc}
    merges = []
    for rank in range(n_merges):
        pc_ = Counter()
        for w, seq in seqs.items():
            c = wc[w]
            for a, b in zip(seq, seq[1:]):
                pc_[(a, b)] += c
        if not pc_:
            break
        top = max(pc_.values())
        pair = min(p for p, c in pc_.items() if c == top)
        merges.append((rank, pair[0], pair[1], top))
        joined = pair[0] + pair[1]
        nxt = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            nxt[w] = tuple(out)
        seqs = nxt
    return merges


def bpe_merges_sql(docs_path: str, n_merges: int = 40) -> str:
    """The independently-fit merge table as a VALUES literal (the
    kmeans-oracle pattern: reference fit embedded, not engine
    output)."""
    merges = _ref_bpe_merges(docs_path, n_merges)
    def q(s):
        return "'" + s.replace("'", "''") + "'"
    rows = ",\n  ".join(
        f"({r}, {q(l)}, {q(rt)}, {c})" for r, l, rt, c in merges)
    return f"""SELECT CAST(rank AS BIGINT) AS rank, left_s AS "left",
       right_s AS "right", CAST(cnt AS BIGINT) AS cnt
FROM (VALUES
  {rows}) AS t(rank, left_s, right_s, cnt)"""


def feature_hash_sql(dim: int = 1024) -> str:
    """Mirror of extras.text.feature_hash: md5_number_lower word
    hash, index = hash % dim, sign from the top bit, zero-sum
    entries dropped."""
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
h AS (
  SELECT doc_id,
         CAST(md5_number_lower(word) % {dim} AS BIGINT) AS idx,
         CASE WHEN md5_number_lower(word) >= 9223372036854775808
              THEN -1 ELSE 1 END AS sign
  FROM w
)
SELECT doc_id, idx, CAST(sum(sign) AS BIGINT) AS val
FROM h GROUP BY doc_id, idx
HAVING sum(sign) <> 0"""


def source_overlap_sql() -> str:
    """Mirror of extras.text.source_overlap: distinct (source, word)
    self-joined on the word with source_a < source_b (engine counts
    via 64-bit hashes — equal up to ~vocab^2/2^64 collisions, the
    df_counts caveat)."""
    return """WITH d AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
  FROM documents
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS shared_words
FROM d a JOIN d b ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2"""


def gopher_filter_sql() -> str:
    """Mirror of extras.text.gopher_filter: the doc_stats/rep_stats
    exact surfaces joined, each rule a CASE bit (identical doubles ->
    deterministic threshold comparisons), keep = fail_mask == 0."""
    from .extras.text import GOPHER_RULES as R
    return f"""WITH s AS ({doc_stats_sql()}),
r AS ({rep_stats_sql()}),
j AS (
  SELECT s.doc_id, s.n_words,
         CAST(s.n_chars - s.n_words + 1 AS DOUBLE) / s.n_words AS awl,
         s.stop_cnt, r.dup_word_frac, r.top_2gram_frac
  FROM s JOIN r ON r.doc_id = s.doc_id),
m AS (
  SELECT doc_id,
    (CASE WHEN n_words < {R["min_words"]} THEN 1 ELSE 0 END)
    + (CASE WHEN n_words > {R["max_words"]} THEN 2 ELSE 0 END)
    + (CASE WHEN awl < {R["min_avg_word_len"]} THEN 4 ELSE 0 END)
    + (CASE WHEN awl > {R["max_avg_word_len"]} THEN 8 ELSE 0 END)
    + (CASE WHEN stop_cnt < {R["min_stop_hits"]} THEN 16 ELSE 0 END)
    + (CASE WHEN dup_word_frac > {R["max_dup_word_frac"]}
       THEN 32 ELSE 0 END)
    + (CASE WHEN top_2gram_frac > {R["max_top_2gram_frac"]}
       THEN 64 ELSE 0 END) AS fm
  FROM j)
SELECT doc_id, fm = 0 AS keep, CAST(fm AS BIGINT) AS fail_mask FROM m"""


def winnow_sql(w: int = 8) -> str:
    """Mirror of extras.text.winnow_fingerprints: per-doc word
    positions + md5_number_lower hashes, every width-``w`` window's
    rightmost-tie minimum, DISTINCT picks.  The signed fp view is the
    exact two's-complement of the UBIGINT hash (HUGEINT detour, no
    overflow)."""
    return f"""WITH words AS (
  SELECT doc_id, ws[i] AS word, CAST(i AS BIGINT) - 1 AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g
),
h AS (
  SELECT doc_id, pos, md5_number_lower(word) AS hv,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM words
),
win AS (
  SELECT a.doc_id, b.pos, b.hv,
         row_number() OVER (PARTITION BY a.doc_id, a.pos
                            ORDER BY b.hv, b.pos DESC) AS rn
  FROM h a JOIN h b ON b.doc_id = a.doc_id
       AND b.pos BETWEEN a.pos AND a.pos + {w - 1}
  WHERE a.pos + {w} <= a.n
)
SELECT DISTINCT doc_id, pos,
  CAST(CAST(hv AS HUGEINT)
       - CASE WHEN hv >= 9223372036854775808 THEN
           CAST(18446744073709551616 AS HUGEINT) ELSE 0 END
       AS BIGINT) AS fp
FROM win WHERE rn = 1"""


def domain_stats_sql(path: str) -> str:
    """Mirror of extras.pii.domain_stats_pipeline: first-URL host per
    doc (same optional-userinfo pattern, group 1), counted per
    domain.  regexp_extract returns '' on no match in DuckDB, which
    maps to the pandas dropna."""
    from .extras.pii import DOMAIN_PATTERN
    return f"""SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
FROM (SELECT regexp_extract(text, '{DOMAIN_PATTERN}', 1) AS domain
      FROM read_parquet('{path}'))
WHERE domain <> ''
GROUP BY domain"""


def ppl_buckets_sql(dp: int = 4, tiles: int = 3) -> str:
    """Mirror of extras.text.ppl_buckets: the dp-rounded unigram-LM
    logprob (identical to unigram_logprob_sql) + SQL ntile over the
    composite (logprob, doc_id) order."""
    return f"""SELECT doc_id, avg_logprob,
       CAST(ntile({tiles}) OVER (ORDER BY avg_logprob, doc_id)
            AS BIGINT) AS tile
FROM ({unigram_logprob_sql(dp)})"""


def ppl_buckets_scored_sql(tiles: int = 3) -> str:
    """Mirror of extras.text.ppl_buckets(score_col=...): the
    external-model-score path — here the deterministic stand-in score
    is the doc's n_chars (an upstream inference stage would attach
    real LM perplexities the same way); ntile over the composite
    (score, doc_id) order."""
    return f"""SELECT doc_id, CAST(n_chars AS DOUBLE) AS model_score,
       CAST(ntile({tiles}) OVER (ORDER BY CAST(n_chars AS DOUBLE),
                                 doc_id)
            AS BIGINT) AS tile
FROM documents"""


def _ref_cdc(path: str) -> list:
    """INDEPENDENT byte-at-a-time CDC fit (the sequential recurrence
    the engine's vectorized 64-term XOR expansion claims to equal):
    h = ((h << 1) & 2^64-1) ^ GEAR[b], cut after a masked zero or at
    payload end; chunk hash = XOR of rotl64(GEAR2[b], i mod 64)."""
    import pyarrow.parquet as pq

    from .extras.cdc import CDC_MASK, GEAR, GEAR2
    t = pq.read_table(path, columns=["item_id", "payload"])
    M64 = (1 << 64) - 1
    mask = int(CDC_MASK)
    rows = []
    for item, pay in zip(t.column("item_id").to_pylist(),
                         t.column("payload").to_pylist()):
        h, start, idx = 0, 0, 0
        for i, b in enumerate(pay):
            h = ((h << 1) & M64) ^ int(GEAR[b])
            if (h & mask) == 0 or i == len(pay) - 1:
                ch = 0
                for k in range(start, i + 1):
                    s = (k - start) & 63
                    g = int(GEAR2[pay[k]])
                    ch ^= ((g << s) & M64) | (g >> ((64 - s) & 63))
                if ch >= 1 << 63:
                    ch -= 1 << 64
                rows.append((item, idx, start, i - start + 1, ch))
                idx += 1
                start = i + 1
    return rows


def cdc_chunks_sql(path: str) -> str:
    """The independent sequential CDC fit embedded as literals —
    divergence anywhere in the engine's vectorized boundary or
    chunk-hash computation fails the hash."""
    rows = ",\n  ".join(
        f"({_qlit(it)}, {i}, {s}, {ln}, {ch})"
        for it, i, s, ln, ch in _ref_cdc(path))
    return f"""SELECT item_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       CAST(length AS BIGINT) AS length,
       CAST(chash AS BIGINT) AS chash
FROM (VALUES
  {rows}) AS t(item_id, chunk_idx, start, length, chash)"""


def cdc_digest_sql(path: str) -> str:
    """Per-item digest derived IN SQL from the independent chunk
    fit: count / bit_xor / byte total."""
    return f"""SELECT item_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(bit_xor(chash) AS BIGINT) AS xh,
       CAST(sum(length) AS BIGINT) AS tot
FROM ({cdc_chunks_sql(path)})
GROUP BY item_id"""


def url_dedup_sql(path: str) -> str:
    """Mirror of extras.pii.url_dedup_pipeline: first URL per doc,
    normalized scheme -> userinfo -> lower -> www -> trailing '/'
    in the engine's exact operation order (all patterns anchored, so
    DuckDB's replace-first and pandas' replace-all coincide); keep =
    no URL, or lowest doc_id in the normalized-URL group."""
    from .extras.pii import URL_CAPTURE
    return f"""WITH u AS (
  SELECT doc_id, regexp_extract(text, '{URL_CAPTURE}', 1) AS raw
  FROM read_parquet('{path}')),
n AS (SELECT doc_id,
  CASE WHEN raw = '' THEN NULL ELSE
    rtrim(regexp_replace(lower(regexp_replace(regexp_replace(
      raw, '^https?://', ''), '^[A-Za-z0-9._%+-]+@', '')),
      '^www\\.', ''), '/')
  END AS url FROM u)
SELECT doc_id, COALESCE(url, '') AS url_norm,
  CAST(CASE WHEN url IS NULL THEN TRUE
       ELSE doc_id = min(doc_id) OVER (PARTITION BY url) END
       AS BIGINT) AS keep
FROM n"""


def pii_scrub_sql(path: str) -> str:
    """Mirror of extras.pii.pii_scrub_pipeline: pattern counts on the
    original text + URL->EMAIL->PHONE ordered regexp_replace.  The
    patterns are restricted to RE2-and-Python-identical constructs
    (see extras/pii.py docstring), so counts and scrub output match
    exactly."""
    from .extras.pii import SCRUB_STEPS
    expr = "text"
    for pat, token in SCRUB_STEPS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    (url_p, _), (email_p, _), (phone_p, _) = SCRUB_STEPS
    return f"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{url_p}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(text, '{email_p}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{phone_p}')) AS BIGINT) AS n_phones,
  {expr} AS scrubbed
FROM read_parquet('{path}')"""


def cgr_final_sql(path: str) -> str:
    """Final CGR walk point per clean row (vecsize=1): the x/y
    recurrences are separable, so two left-folds with the exact
    (corner + marker)/2 operation order reproduce the engine's floats
    bit-for-bit."""
    return f"""SELECT doc_id,
  list_reduce(list_prepend(CAST(0.5 AS DOUBLE),
    list_transform(tokens,
      t -> CAST(CASE WHEN t >= 2 THEN 1.0 ELSE 0.0 END AS DOUBLE))),
    (acc, v) -> (v + acc) / 2) AS x,
  list_reduce(list_prepend(CAST(0.5 AS DOUBLE),
    list_transform(tokens,
      t -> CAST(CASE WHEN t = 1 OR t = 2 THEN 1.0 ELSE 0.0 END AS DOUBLE))),
    (acc, v) -> (v + acc) / 2) AS y
FROM {_seq(path)}
WHERE len(tokens) > 0 AND list_max(tokens) <= 3"""


def pack_bins_sql(path: str, budget: int) -> str:
    """Mirror of extras.scan.pack_bins: window cumsum in doc_id
    order; bin = first-token offset // budget."""
    return f"""SELECT doc_id, n_tok, cum_tok,
  (cum_tok - n_tok) // {budget} AS bin
FROM (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tok
  FROM {_seq(path)})"""


def tok_quantiles_sql(path: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Mirror of extras.scan.tok_quantiles: smallest n_tok whose
    cumulative count >= ceil(q * total), same IEEE double product."""
    vals = ", ".join(f"('{q:g}', {q!r})" for q in qs)
    return f"""WITH c AS (
  SELECT n_tok, count(*) AS cnt FROM {_seq(path)} GROUP BY n_tok
), s AS (
  SELECT n_tok, SUM(cnt) OVER (ORDER BY n_tok) AS cum FROM c
), t AS (SELECT SUM(cnt) AS total FROM c),
qv(q, qf) AS (VALUES {vals})
SELECT qv.q AS q, CAST(min(s.n_tok) AS BIGINT) AS value
FROM qv, s, t WHERE s.cum >= ceil(qv.qf * t.total)
GROUP BY qv.q"""


def sketch_quantiles_sql(path: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                         k: int = None, salt: str = None) -> str:
    """Mirror of extras.scan.sketch_quantiles: the EXACT bottom-k
    md5-priority sample via ORDER BY hash LIMIT k (doc_id tiebreak),
    then the tok_quantiles rank rule over the sample."""
    from .extras.scan import SKQ_K, SKQ_SALT
    k = SKQ_K if k is None else k
    salt = SKQ_SALT if salt is None else salt
    vals = ", ".join(f"('{q:g}', {q!r})" for q in qs)
    return f"""WITH samp AS (
  SELECT n_tok FROM (
    SELECT n_tok, md5_number_lower(doc_id || '{salt}') AS h, doc_id
    FROM {_seq(path)} ORDER BY h, doc_id LIMIT {k})
), c AS (SELECT n_tok, count(*) AS cnt FROM samp GROUP BY n_tok),
s AS (SELECT n_tok, SUM(cnt) OVER (ORDER BY n_tok) AS cum FROM c),
t AS (SELECT SUM(cnt) AS total FROM c),
qv(q, qf) AS (VALUES {vals})
SELECT qv.q AS q, CAST(min(s.n_tok) AS BIGINT) AS value
FROM qv, s, t WHERE s.cum >= ceil(qv.qf * t.total)
GROUP BY qv.q"""


def decontam_sql(n: int = 3, mod: int = 10, rem: int = 7) -> str:
    """Mirror of extras.decontam: distinct word n-gram overlap of
    each train doc (doc_id % mod != rem) vs the eval slice's gram
    set, joined on the gram STRINGS (certifying the Ray side's
    64-bit gram hashing collision-free on this corpus)."""
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT DISTINCT doc_id,
    array_to_string(array_slice(w, i, i + {n - 1}), ' ') AS gram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1}))
                   AS i) s
), ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {mod} = {rem}),
h AS (
  SELECT g.doc_id, count(*) AS n_hits FROM g JOIN ev USING (gram)
  WHERE g.doc_id % {mod} <> {rem} GROUP BY g.doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h USING (doc_id)
WHERE d.doc_id % {mod} <> {rem}"""


def decontam_spans_sql(n: int = 3, mod: int = 10, rem: int = 7) -> str:
    """Mirror of extras.decontam.decontam_spans_pipeline: positions
    covered by any eval-matching gram span are masked, text
    reassembled with ordered string_agg (gram join on STRINGS, same
    collision-certifying role as decontam_sql)."""
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
ev AS (
  SELECT DISTINCT array_to_string(array_slice(w, i, i + {n - 1}), ' ')
    AS gram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1}))
                   AS i) s
  WHERE doc_id % {mod} = {rem}
),
t AS (SELECT doc_id, w FROM w WHERE doc_id % {mod} <> {rem}),
hits AS (
  SELECT t.doc_id, i
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1}))
                   AS i) s
  WHERE array_to_string(array_slice(w, i, i + {n - 1}), ' ')
        IN (SELECT gram FROM ev)
),
posmask AS (
  SELECT t.doc_id, j, t.w[j] AS word,
         EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = t.doc_id
                 AND j BETWEEN h.i AND h.i + {n - 1}) AS m
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS j) s
)
SELECT doc_id,
  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
  string_agg(CASE WHEN m THEN '<MASKED>' ELSE word END,
             ' ' ORDER BY j) AS scrubbed
FROM posmask GROUP BY doc_id"""


def sample_split_sql() -> str:
    """Mirror of extras.sampling.sample_split_fn: DuckDB
    md5_number_lower == Python int.from_bytes(md5[8:16], 'little')."""
    from .extras.sampling import (DEFAULT_RATE, RATES, SPLIT_SALT,
                                  TRAIN_PCT, VAL_PCT)
    rate_case = ("CASE lang "
                 + " ".join(f"WHEN '{k}' THEN {v}"
                            for k, v in RATES.items())
                 + f" ELSE {DEFAULT_RATE} END")
    h = "md5_number_lower(CAST(doc_id AS VARCHAR))"
    hs = f"md5_number_lower(CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}')"
    return f"""SELECT doc_id, lang,
  CAST({h} % 1000 AS BIGINT) AS bucket,
  CASE WHEN {hs} % 100 < {TRAIN_PCT} THEN 'train'
       WHEN {hs} % 100 < {VAL_PCT} THEN 'val'
       ELSE 'test' END AS split
FROM documents
WHERE {h} % 1000 < {rate_case}"""


def tfidf_topk_sql(k: int = 3) -> str:
    """Mirror of extras.text.tfidf_topk: integer-only output; the
    float score (tf * ln(N/df)) orders the row_number only."""
    return f"""WITH tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
), df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf
          GROUP BY word),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT doc_id, word, tf, df FROM (
  SELECT tf.doc_id, tf.word, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(n.n / df.df) DESC,
                                     tf.word) AS rn
  FROM tf JOIN df USING (word), n
) WHERE rn <= {k}"""


def normalize_text_sql() -> str:
    """Mirror of extras.chunking.normalize_text_fn (character-class
    regex, identical under Python re and DuckDB RE2)."""
    return r"""SELECT doc_id,
  regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS norm_text,
  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_masked
FROM documents"""


def dedup_keep_best_sql() -> str:
    """Mirror of extras.dedup.exact_dedup_keep_best: one survivor per
    distinct text, highest quality (bit-exact score) then smallest
    doc_id."""
    return f"""WITH q AS ({quality_sql()})
SELECT doc_id FROM (
  SELECT d.doc_id,
         row_number() OVER (PARTITION BY d.text
                            ORDER BY q.quality DESC, d.doc_id) AS rn
  FROM documents d JOIN q USING (doc_id)
) WHERE rn = 1"""


# ---------------------------------------------------------------------------
# relational joins (extras.relational) — TPC-H-shaped tables
# ---------------------------------------------------------------------------

_REV_E4 = ("CAST(round(l_extendedprice * 100) AS BIGINT)"
           " * (100 - CAST(round(l_discount * 100) AS BIGINT))")


def pricing_summary_sql() -> str:
    """Mirror of extras.relational.pricing_summary.  All money sums
    are integer cents / e-4 units (prices carry exactly 2 decimals,
    so round() on both engines lands on the same integer regardless
    of the half-even vs half-away tie rule)."""
    return f"""SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_base_cents,
  CAST(SUM({_REV_E4}) AS BIGINT) AS sum_disc_e4,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""


def revenue_by_nation_sql() -> str:
    """Mirror of extras.relational.revenue_by_nation (lineitem |X|
    orders |X| customer |X| nation, revenue in e-4 units)."""
    return f"""SELECT n_name,
  CAST(SUM({_REV_E4}) AS BIGINT) AS revenue_e4,
  COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name"""


def high_qty_orders_sql(min_qty: float) -> str:
    """Mirror of extras.relational.high_qty_order_priorities (EXISTS
    semi-join)."""
    return f"""SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= {min_qty})
GROUP BY o_orderpriority"""


def cust_no_big_order_sql(min_total: float) -> str:
    """Mirror of extras.relational.customers_without_orders (NOT
    EXISTS anti-join above a totalprice threshold)."""
    return f"""SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice >= {min_total})"""


def shipping_priority_sql(segment: str = "BUILDING",
                          cutoff: str = "1998-06-01",
                          k: int = 10) -> str:
    """Mirror of extras.relational.shipping_priority (TPC-H Q3 shape,
    integer-e4 revenue, (revenue DESC, orderkey ASC) top-k)."""
    return f"""SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_date_us,
  o.o_orderpriority,
  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
       AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{cutoff}'
  AND l.l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, o.o_orderkey
LIMIT {k}"""


def pagerank_sql(iters: int = 5, scale: int = 1_000_000,
                 damp: int = 85) -> str:
    """Mirror of extras.graph.pagerank: integer fixed-point PageRank
    over the co-order item-transition graph, iterations unrolled as
    CTEs.  All arithmetic is int64 floor division / exact integer
    sums, so the engine and SQL agree bit-for-bit (sums CAST back to
    BIGINT — DuckDB promotes sum(BIGINT) to HUGEINT)."""
    base = (100 - damp) * scale // 100
    ctes = [f"""e AS (
  SELECT src, dst FROM (
    SELECT l_partkey AS src,
           lead(l_partkey) OVER (PARTITION BY l_orderkey
                                 ORDER BY l_linenumber, l_partkey)
             AS dst
    FROM lineitem) WHERE dst IS NOT NULL)""",
            "nodes AS (SELECT DISTINCT l_partkey AS node "
            "FROM lineitem)",
            "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS c "
            "FROM e GROUP BY src)",
            f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r "
            "FROM nodes)"]
    for t in range(iters):
        ctes.append(f"""r{t + 1} AS (
  SELECT n.node,
         {base} + {damp} * COALESCE(s.c, 0) // 100 AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(r{t}.r // d.c) AS BIGINT) AS c
    FROM e JOIN r{t} ON e.src = r{t}.node
           JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s USING (node))"""
        )
    return f"""WITH {','.join(ctes)}
SELECT rr.node, CAST(rr.r AS BIGINT) AS rank,
       COALESCE(d.c, CAST(0 AS BIGINT)) AS deg
FROM r{iters} rr LEFT JOIN deg d ON d.src = rr.node"""


def cust_order_rollup_sql() -> str:
    """Mirror of extras.relational.customer_order_rollup (LEFT OUTER
    join: customers with zero orders appear with zero counts)."""
    return """SELECT c.c_custkey, c.c_mktsegment,
  CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders,
  CAST(coalesce(o.s, 0) AS BIGINT) AS sum_cents
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s
  FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey"""


def group_sample_sql(n: int = 20) -> str:
    """Mirror of extras.sampling.group_sample: first n rows per lang in
    (md5_number_lower(doc_id), doc_id) order."""
    return f"""SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) WHERE rn <= {n}"""


def rank_by_len_sql(path: str, tiles: int = 10) -> str:
    """Mirror of extras.scan.rank_by_len: global row_number + ntile
    under ORDER BY (n_tok, doc_id)."""
    return f"""SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
  CAST(row_number() OVER w AS BIGINT) AS rnk,
  CAST(ntile({tiles}) OVER w AS BIGINT) AS tile
FROM {_seq(path)}
WINDOW w AS (ORDER BY n_tok, doc_id)"""


def events_dedup_sql() -> str:
    """Mirror of extras.events.drop_consecutive_dups."""
    return """SELECT event_id, user_id FROM (
  SELECT event_id, user_id,
    CAST(round(value * 100) AS BIGINT) AS c,
    lag(CAST(round(value * 100) AS BIGINT))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_c
  FROM events) WHERE prev_c IS NULL OR c != prev_c"""


# ---------------------------------------------------------------------------
# model-fit oracles: an INDEPENDENT single-process numpy reference fit
# (computed here, at oracle-build time, over the same parquet) is
# embedded into the SQL as literal constants; DuckDB then recomputes
# the per-row assignment / projection from those literals.  This gates
# BOTH halves of the distributed pipeline: the distributed fit must
# agree with the reference fit (else the per-row argmin / projection
# drifts), and the distributed apply must agree with SQL's arithmetic.
# ---------------------------------------------------------------------------


def _emb_xy(emb_path: str):
    import numpy as np
    import pyarrow.parquet as pq
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    col = t.column("embedding").combine_chunks()
    off = col.offsets.to_numpy()
    dim = int(off[1] - off[0])
    x = col.values.to_numpy().astype("float64").reshape(-1, dim)
    return ids, x


def _dlist(vec) -> str:
    """DOUBLE[] literal with full round-trip precision (repr is the
    shortest string that parses back to the same double)."""
    return "[" + ", ".join(repr(float(v)) for v in vec) + "]::DOUBLE[]"


def _ref_kmeans_centroids(emb_path: str, n_clusters: int,
                          iters: int):
    """Independent single-process Lloyd's reference fit
    (bottom-``n_clusters`` vec_id init, argmin ties to lowest index,
    empty clusters hold position) — shared by the kmeans / cluster-
    representative oracles."""
    import numpy as np
    ids, x = _emb_xy(emb_path)
    cent = x[np.argsort(ids, kind="stable")[:n_clusters]]
    for _ in range(iters):
        d2 = ((x * x).sum(axis=1)[:, None] - 2.0 * (x @ cent.T)
              + (cent * cent).sum(axis=1))
        a = np.argmin(d2, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=n_clusters)
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cent


def kmeans_assign_sql(emb_path: str, n_clusters: int = 8,
                      iters: int = 5) -> str:
    """Reference Lloyd's fit (bottom-``n_clusters`` vec_id init, argmin
    ties to lowest index, empty clusters hold position) run here in
    single-process numpy; the SQL assigns each row to the nearest
    literal centroid (ties to lowest cluster via the ORDER BY).

    Float caveat (documented, not hidden): the distributed fit sums
    block partials in a different order than this reference, so the
    centroids agree only to ~1 ulp; a row's assignment could differ iff
    two centroid distances coincide within ~1e-12 relative, which does
    not occur on generic float embeddings."""
    cent = _ref_kmeans_centroids(emb_path, n_clusters, iters)
    rows = ",\n  ".join(f"({i}, {_dlist(cent[i])})"
                        for i in range(n_clusters))
    return f"""WITH cent(cluster, cvec) AS (VALUES
  {rows}),
d AS (
  SELECT vec_id, cluster,
         list_distance(CAST(embedding AS DOUBLE[]), cvec) AS dist
  FROM embeddings, cent)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
FROM (SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM d)
WHERE rn = 1"""


def pca_check_sql(emb_path: str, n_components: int = 8,
                  dp: int = 4) -> str:
    """Reference two-pass PCA (exact covariance, eigh, deterministic
    sign fix) run here in numpy; the SQL projects each embedding onto
    the literal components.  Projection is linear, so centering folds
    into a constant: proj_j = ip(x, w_j) - ip(mean, w_j).  Both sides
    round to ``dp`` decimals — numpy and DuckDB sum in different
    orders, so raw doubles differ in the last ulp while the rounded
    values coincide (boundary-collision odds ~1e-7 for this table)."""
    import numpy as np
    _, x = _emb_xy(emb_path)
    n = len(x)
    mean = x.mean(axis=0)
    cov = (x.T @ x - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    w = evecs[:, order]
    flip = w[np.argmax(np.abs(w), axis=0), np.arange(w.shape[1])] < 0
    w[:, flip] *= -1.0
    rows = ",\n  ".join(
        f"({j}, {_dlist(w[:, j])}, {repr(float(mean @ w[:, j]))})"
        for j in range(n_components))
    return f"""WITH comp(comp, w, cj) AS (VALUES
  {rows})
SELECT vec_id, CAST(comp AS BIGINT) AS comp,
       round(list_inner_product(CAST(embedding AS DOUBLE[]), w) - cj,
             {dp}) AS val
FROM embeddings, comp"""


def cluster_reps_sql(emb_path: str, n_clusters: int = 8,
                     iters: int = 5, n_per: int = 5) -> str:
    """Centroid-representative sample: assign every row to the nearest
    literal reference centroid (kmeans_assign_sql semantics), then keep
    the n_per nearest rows per cluster (ties to lowest vec_id).  The
    engine ranks on squared distance, the SQL on list_distance — a
    monotone transform, so the order agrees except on exact ties,
    which vec_id breaks."""
    cent = _ref_kmeans_centroids(emb_path, n_clusters, iters)
    rows = ",\n  ".join(f"({i}, {_dlist(cent[i])})"
                        for i in range(n_clusters))
    return f"""WITH cent(cluster, cvec) AS (VALUES
  {rows}),
d AS (
  SELECT vec_id, cluster,
         list_distance(CAST(embedding AS DOUBLE[]), cvec) AS dist
  FROM embeddings, cent),
asg AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM d) WHERE rn = 1)
SELECT CAST(cluster AS BIGINT) AS cluster, vec_id FROM (
  SELECT cluster, vec_id,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY dist, vec_id) AS rn
  FROM asg) WHERE rn <= {n_per}"""


def proto_prune_sql(emb_path: str, n_clusters: int = 8,
                    iters: int = 5, frac: float = None) -> str:
    """Mirror of extras.decomp.proto_prune: assign to the literal
    reference centroids, keep the ceil(frac * n_c) FARTHEST per
    cluster (ties to lowest vec_id).  Engine ranks on squared
    distance, SQL on list_distance — monotone, ties broken by
    vec_id (the cluster_reps contract)."""
    from .extras.decomp import PRUNE_FRAC
    frac = PRUNE_FRAC if frac is None else frac
    cent = _ref_kmeans_centroids(emb_path, n_clusters, iters)
    rows = ",\n  ".join(f"({i}, {_dlist(cent[i])})"
                        for i in range(n_clusters))
    return f"""WITH cent(cluster, cvec) AS (VALUES
  {rows}),
d AS (
  SELECT vec_id, cluster,
         list_distance(CAST(embedding AS DOUBLE[]), cvec) AS dist
  FROM embeddings, cent),
asg AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM d) WHERE rn = 1)
SELECT CAST(cluster AS BIGINT) AS cluster, vec_id FROM (
  SELECT cluster, vec_id,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY dist DESC, vec_id) AS rn,
         CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n
  FROM asg)
WHERE rn <= CAST(ceil({frac!r} * n) AS BIGINT)"""


def _ref_kcenter(emb_path: str, k: int):
    """Independent single-process greedy k-center reference (seed =
    lowest vec_id, farthest-point traversal, argmax ties to lowest
    vec_id) — same d2 kernel as the distributed engine; shared by the
    kcenter oracle."""
    import numpy as np
    ids, x = _emb_xy(emb_path)
    pos = int(np.argsort(ids, kind="stable")[0])
    sel = [pos]
    c = x[pos]
    mind2 = (x * x).sum(axis=1) - 2.0 * (x @ c) + (c * c).sum()
    for _ in range(k - 1):
        p = int(np.lexsort((ids, -mind2))[0])
        sel.append(p)
        c = x[p]
        d2 = (x * x).sum(axis=1) - 2.0 * (x @ c) + (c * c).sum()
        mind2 = np.minimum(mind2, d2)
    return ids[sel], x[sel]


def kcenter_select_sql(emb_path: str, k: int = 16) -> str:
    """Mirror of extras.decomp.kcenter_select: the greedy selection is
    run here by an independent single-process reference (the
    _ref_kmeans_centroids discipline) and embedded as literal (rank,
    vec_id, centroid) rows; the SQL then re-derives the coverage
    assignment — each point's nearest selected center (list_distance,
    ties to lowest rank, matching the engine's argmin-ties-to-lowest-
    index) — and counts per center, so a divergence in EITHER the
    engine's greedy picks (vs the literals) or its distributed
    coverage pass (vs the SQL counts) fails the hash."""
    ids, vecs = _ref_kcenter(emb_path, k)
    rows = ",\n  ".join(
        f"(CAST({r} AS BIGINT), CAST({int(ids[r])} AS BIGINT), "
        f"{_dlist(vecs[r])})" for r in range(k))
    return f"""WITH cent(rank, cid, cvec) AS (VALUES
  {rows}),
d AS (
  SELECT e.vec_id, c.rank,
         list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec) AS dist
  FROM embeddings e, cent c),
asg AS (
  SELECT vec_id, rank FROM (
    SELECT vec_id, rank,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, rank) AS rn
    FROM d) WHERE rn = 1)
SELECT c.rank AS rank, c.cid AS vec_id,
       CAST(count(a.vec_id) AS BIGINT) AS n_assigned
FROM cent c LEFT JOIN asg a ON a.rank = c.rank
GROUP BY c.rank, c.cid"""


def dup_spans_sql(w: int = 5) -> str:
    """Duplicate-window-span stats: a window is "dup" iff its exact
    w-word string occurs in >= 2 distinct documents.  The engine keys
    windows by a 64-bit word-hash fold (collision odds ~1e-10 at this
    scale); the SQL compares the strings themselves."""
    return f"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, pos, pos + {w - 1}), ' ')
           AS gram
  FROM d, unnest(range(1, len(ws) - {w} + 2)) AS t(pos)),
dupg AS (
  SELECT gram FROM g GROUP BY gram
  HAVING count(DISTINCT doc_id) >= 2),
per AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(count(dg.gram) AS BIGINT) AS dup_windows
  FROM g LEFT JOIN dupg dg USING (gram) GROUP BY g.doc_id)
SELECT docs.doc_id,
       COALESCE(p.n_windows, 0) AS n_windows,
       COALESCE(p.dup_windows, 0) AS dup_windows,
       COALESCE(p.dup_windows, 0)
         / CAST(GREATEST(COALESCE(p.n_windows, 0), 1) AS DOUBLE)
         AS dup_frac
FROM documents docs LEFT JOIN per p ON docs.doc_id = p.doc_id"""


def dup_span_scrub_sql(w: int = 5) -> str:
    """Mirror of extras.dedup.dup_span_scrub: a window is dup iff its
    exact w-word string occurs in >= 2 distinct docs; the keeper (min
    doc_id) keeps every occurrence, every other doc drops all words
    covered by any dup-window span, text reassembled with ordered
    string_agg over the surviving positions.  The engine keys windows
    by the 64-bit word-hash fold; the SQL compares gram STRINGS
    (collision-certifying role, same as dup_spans_sql)."""
    return f"""WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos, pos + {w - 1}), ' ')
           AS gram
  FROM d, unnest(range(1, len(ws) - {w} + 2)) AS t(pos)),
gs AS (
  SELECT gram, min(doc_id) AS keeper
  FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN gs USING (gram)
  WHERE g.doc_id <> gs.keeper),
posmask AS (
  SELECT d.doc_id, j, d.ws[j] AS word,
         EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = d.doc_id
                 AND j BETWEEN h.pos AND h.pos + {w - 1}) AS m
  FROM d, unnest(range(1, len(ws) + 1)) AS t(j))
SELECT doc_id,
  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  COALESCE(string_agg(CASE WHEN NOT m THEN word END,
                      ' ' ORDER BY j), '') AS scrubbed
FROM posmask GROUP BY doc_id"""


def unigram_logprob_sql(dp: int = 4) -> str:
    """Mean unigram log-probability per doc under the corpus's own
    unigram LM.  Both engines round to ``dp`` decimals: sum order
    differs (numpy pairwise vs SQL aggregate), raw doubles agree only
    to the last ulp."""
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY word),
t AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM c)
SELECT doc_id, round(avg(ln(c.c / t.tot)), {dp}) AS avg_logprob
FROM w JOIN c USING (word), t
GROUP BY doc_id"""


def zscore_by_source_sql() -> str:
    """Per-source z-score of n_chars.  Identical IEEE op sequence from
    identical exact int64 moments -> bit-exact doubles, no rounding."""
    return """WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY source)
SELECT d.doc_id,
       CASE WHEN CAST(s2 AS DOUBLE) / cnt
              - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt)
              <= 0.0 THEN CAST('nan' AS DOUBLE)
       ELSE (CAST(d.n_chars AS DOUBLE) - CAST(s1 AS DOUBLE) / cnt)
       / sqrt(CAST(s2 AS DOUBLE) / cnt
              - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt))
       END AS z
FROM documents d JOIN s USING (source)"""


def retention_cohorts_sql(period_us: int = 86_400_000_000) -> str:
    """Mirror of extras.events.retention_cohorts: DISTINCT (user,
    period) activity pairs, per-user min-period cohort, integer
    offset counts — all-integer surface, exact on both engines."""
    return f"""WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {period_us} AS day
  FROM events),
c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id)
SELECT c.cohort AS cohort_day, d.day - c.cohort AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id)
GROUP BY 1, 2"""


def events_distinct_sql(window_us: int = 3_600_000_000) -> str:
    """Exact COUNT + COUNT(DISTINCT user) per (event_type, window)."""
    return f"""SELECT event_type,
  CAST(floor(epoch_us(ts) / {window_us}) AS BIGINT) AS win,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type, win"""


def events_funnel_sql(a: str = "view", b: str = "click",
                      c: str = "purchase") -> str:
    """Earliest a->b->c completion per user in strict (ts, event_id)
    order: first a, first b after it, first c after that."""
    return f"""WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
fa AS (SELECT user_id, min(rn) AS ra FROM e
       WHERE event_type = '{a}' GROUP BY user_id),
fb AS (SELECT e.user_id, min(rn) AS rb FROM e JOIN fa USING (user_id)
       WHERE event_type = '{b}' AND rn > ra GROUP BY e.user_id),
fc AS (SELECT e.user_id, min(rn) AS rc FROM e JOIN fb USING (user_id)
       WHERE event_type = '{c}' AND rn > rb GROUP BY e.user_id)
SELECT fc.user_id, e.t AS abc_ts_us
FROM fc JOIN e ON e.user_id = fc.user_id AND e.rn = fc.rc"""


def asof_backfill_sql(path: str, k: int, bin_size: int,
                      bin_count: int, lag_days: int) -> str:
    """Backfill twin of asof_cov_hist_sql: every occurrence looks up
    the snapshot as of ``lag_days`` before its ingest ts (the shifted
    effective day can go negative — no snapshot qualifies -> 0)."""
    return f"""WITH {km_cte(path, k, ", source, ts")},
daily AS (
  SELECT source, kmer, (epoch_us(ts) - {TS_BASE_US}) // {DAY_US} AS day,
         count(*) AS cnt
  FROM km GROUP BY 1, 2, 3
),
snap AS (
  SELECT source, kmer, day,
         CAST(sum(cnt) OVER (PARTITION BY source, kmer ORDER BY day)
              AS BIGINT) AS cum_cnt
  FROM daily
),
occ AS (
  SELECT doc_id, source, kmer,
         (epoch_us(ts) - {lag_days} * {DAY_US} - {TS_BASE_US})
           // {DAY_US} - 1 AS eff
  FROM km
),
lookup AS (
  SELECT o.doc_id, coalesce(s.cum_cnt, 0) AS cnt
  FROM occ o ASOF LEFT JOIN snap s
    ON o.source = s.source AND o.kmer = s.kmer AND s.day <= o.eff
)
SELECT doc_id, least(cnt // {bin_size}, {bin_count - 1}) AS bin,
       count(*) AS val
FROM lookup GROUP BY doc_id, bin"""


def grouped_quantiles_sql(qs=(0.25, 0.5, 0.75, 0.9)) -> str:
    """Per-lang exact n_chars quantiles: smallest value whose
    per-group running count >= ceil(q * group_total) — the same
    IEEE double product as extras.scan.grouped_quantiles."""
    vals = ", ".join(f"('{q:g}', {q!r})" for q in qs)
    return f"""WITH c AS (
  SELECT lang, n_chars AS v, count(*) AS cnt FROM documents
  GROUP BY lang, n_chars
), s AS (
  SELECT lang, v, SUM(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum
  FROM c
), t AS (SELECT lang, SUM(cnt) AS total FROM c GROUP BY lang),
qv(q, qf) AS (VALUES {vals})
SELECT s.lang, qv.q AS q, CAST(min(s.v) AS BIGINT) AS value
FROM qv, s JOIN t USING (lang)
WHERE s.cum >= ceil(qv.qf * t.total)
GROUP BY s.lang, qv.q"""


def dsir_weights_sql(target_lang: str = "en", dp: int = 4) -> str:
    """Mirror of extras.text.dsir_weights: mean per-word
    ``ln p_target - ln p_background``; target LM over the
    ``lang == target_lang`` slice, background over the whole corpus,
    unseen-in-target words at the add-one count floor (COALESCE 1).
    Tie-safe dp rounding: floor(x*10^dp + 0.5)/10^dp on BOTH engines
    (numpy round is half-even, DuckDB round is half-away — the
    quantize_embeddings convention sidesteps the disagreement)."""
    scale = 10 ** dp
    return f"""WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents),
cb AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY word),
ct AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w
       WHERE lang = '{target_lang}' GROUP BY word),
tb AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM cb),
tt AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM ct)
SELECT w.doc_id,
  floor(avg(ln(COALESCE(ct.c, 1) / tt.tot) - ln(cb.c / tb.tot))
        * {scale} + 0.5) / {scale}
    AS logweight
FROM w JOIN cb ON w.word = cb.word
       LEFT JOIN ct ON w.word = ct.word, tb, tt
GROUP BY w.doc_id"""


def source_diversity_sql(n: int = 3) -> str:
    """Mirror of extras.text.source_ngram_diversity: per-source
    n-gram type-token ratio, grams compared as STRINGS (the engine
    keys the 64-bit fold — dup_spans collision convention); ttr is
    one int/double IEEE division."""
    return f"""WITH d AS (
  SELECT source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT source,
         array_to_string(list_slice(ws, pos, pos + {n - 1}), ' ')
           AS gram
  FROM d, unnest(range(1, len(ws) - {n} + 2)) AS t(pos))
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
       count(DISTINCT gram) / CAST(count(*) AS DOUBLE) AS ttr
FROM g GROUP BY source"""


def phrase_hits_sql(phrases: tuple) -> str:
    """Mirror of extras.text.phrase_hits via the replace-length
    identity: both engines count leftmost non-overlapping substring
    occurrences."""
    vals = ", ".join(f"({_qlit(p)})" for p in phrases)
    return f"""SELECT doc_id, p AS phrase,
       CAST((length(text) - length(replace(text, p, '')))
            // length(p) AS BIGINT) AS n
FROM documents, (VALUES {vals}) AS ph(p)
WHERE length(text) - length(replace(text, p, '')) > 0"""


def nb_classify_sql(target_lang: str = "en", dp: int = 4) -> str:
    """Mirror of extras.text.nb_classify: add-one multinomial NB
    log-likelihood-ratio score per doc, positive class = the
    ``lang == target_lang`` slice.  Every per-word term is
    ``ln(int/double) - ln(int/double)`` on exact integer counts —
    identical IEEE expression both engines; the per-doc mean is
    tie-safe floor-dp-rounded and ``keep`` compares the ROUNDED
    value (the dsir_weights convention)."""
    scale = 10 ** dp
    rounded = f"floor(avg(t) * {scale} + 0.5) / {scale}"
    return f"""WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents),
cb AS (SELECT word, CAST(count(*) AS BIGINT) AS ca,
              CAST(count(*) FILTER (WHERE lang = '{target_lang}')
                   AS BIGINT) AS ct
       FROM w GROUP BY word),
v AS (SELECT CAST(count(*) AS BIGINT) AS nv,
             CAST(sum(ct) AS BIGINT) AS npos,
             CAST(sum(ca - ct) AS BIGINT) AS nneg FROM cb),
term AS (SELECT word,
    ln((ct + 1) / CAST(npos + nv AS DOUBLE))
  - ln((ca - ct + 1) / CAST(nneg + nv AS DOUBLE)) AS t
  FROM cb, v)
SELECT w.doc_id, {rounded} AS llr,
       CAST({rounded} > 0 AS BIGINT) AS keep
FROM w JOIN term USING (word)
GROUP BY w.doc_id"""


def quality_filter_sql(keep_frac: float = 0.5) -> str:
    """Mirror of extras.scan.quality_filter: survivors are the top
    ``floor(keep_frac * n)`` rows under ``ORDER BY (quality, doc_id)``
    over the bit-exact quality score."""
    return f"""WITH q AS ({quality_sql()}),
r AS (SELECT doc_id,
             row_number() OVER (ORDER BY quality, doc_id) AS rnk,
             count(*) OVER () AS n
      FROM q)
SELECT doc_id FROM r
WHERE rnk > n - CAST(floor({keep_frac!r} * n) AS BIGINT)"""


def temperature_sample_sql(key: str = "lang") -> str:
    """Mirror of extras.sampling.temperature_sample: per-group rate =
    floor(min(1, tf * (w/sw) * tot / n) * 1e6 + 0.5) with
    w = power(n/tot, alpha) — the exact operation order of the engine
    (see the float caveat there); keep decision is the portable
    md5_number_lower ppm idiom."""
    from .extras.sampling import TEMP_ALPHA, TEMP_SALT, TEMP_TARGET_FRAC
    h = (f"md5_number_lower(CAST(d.doc_id AS VARCHAR) || "
         f"'{TEMP_SALT}')")
    return f"""WITH c AS (
  SELECT {key}, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY {key}),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c),
p AS (SELECT {key}, n, power(n / t.tot, {TEMP_ALPHA!r}) AS w
      FROM c, t),
z AS (SELECT sum(w) AS sw FROM p),
r AS (SELECT {key}, n,
        CAST(floor(LEAST(1.0, {TEMP_TARGET_FRAC!r} * (w / z.sw)
                          * t.tot / n) * 1000000 + 0.5) AS BIGINT)
          AS rate
      FROM p, z, t)
SELECT d.doc_id, d.{key}, r.rate
FROM documents d JOIN r USING ({key})
WHERE CAST({h} % 1000000 AS BIGINT) < r.rate"""


def weighted_sample_sql(k: int = None, salt: str = None) -> str:
    """Mirror of extras.sampling.weighted_priority_sample (Duffield-
    Lund-Thorup priority sampling): u = hash / 2^64 (division by an
    exact power-of-two double — rounding-free, matching the engine's
    multiplication by 2^-64), prio and est are single IEEE divisions,
    order ties break on doc_id."""
    from .extras.sampling import WSAMPLE_K, WSAMPLE_SALT
    k = WSAMPLE_K if k is None else k
    salt = WSAMPLE_SALT if salt is None else salt
    u = (f"CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '{salt}') "
         f"AS DOUBLE) / 18446744073709551616.0")
    return f"""WITH s AS (
  SELECT doc_id, CAST(greatest(n_chars, 1) AS BIGINT) AS w,
         ({u}) / CAST(greatest(n_chars, 1) AS DOUBLE) AS prio
  FROM documents
), r AS (
  SELECT doc_id, w, prio,
         row_number() OVER (ORDER BY prio, doc_id) AS rn FROM s
), t AS (SELECT min(CASE WHEN rn = {k + 1} THEN prio END) AS tau FROM r)
SELECT doc_id, w, prio,
       CASE WHEN t.tau IS NULL THEN CAST(w AS DOUBLE)
            ELSE greatest(CAST(w AS DOUBLE), 1.0 / t.tau) END AS est
FROM r, t WHERE rn <= {k}"""


def block_dedup_sql(w: int = 8) -> str:
    """Mirror of extras.dedup.block_dedup: blocks are disjoint
    ``w``-word slices; the global first occurrence per distinct block
    TEXT (ORDER BY doc_id, idx) survives, docs reassemble from kept
    blocks in order.  The engine keys blocks by a 64-bit fold; this
    compares strings (collision-certifying, the dup_spans role)."""
    return f"""WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT doc_id, i AS idx,
         array_to_string(
           list_slice(ws, i * {w} + 1,
                      LEAST((i + 1) * {w}, len(ws))), ' ') AS blk
  FROM d, unnest(range(0, (len(ws) + {w - 1}) // {w})) AS t(i)),
r AS (
  SELECT doc_id, idx, blk,
         row_number() OVER (PARTITION BY blk
                            ORDER BY doc_id, idx) AS rn
  FROM b)
SELECT doc_id,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  COALESCE(string_agg(CASE WHEN rn = 1 THEN blk END,
                      ' ' ORDER BY idx), '') AS text2
FROM r GROUP BY doc_id"""


def c4_filter_sql(line_delim: str = "\n", min_words_per_line: int = 3,
                  min_lines: int = 5, badwords: tuple = None,
                  require_terminal_punct: bool = True) -> str:
    """Mirror of extras.text.c4_filter down to the rewritten
    clean_text.  Word counting follows the SQL split convention (an
    empty trimmed line counts 1 part); whole-word matches use the
    space-padded contains idiom, exactly as the engine."""
    from .extras.text import C4_BADWORDS
    if badwords is None:
        badwords = C4_BADWORDS
    d = line_delim.replace("'", "''")
    punct = ""
    if require_terminal_punct:
        punct = ("\n         AND (ln LIKE '%.' OR ln LIKE '%!' "
                 "OR ln LIKE '%?' OR ln LIKE '%\"')")
    bad = "".join(
        "\n        AND NOT contains(' ' || lower(d.text) || ' ', "
        f"' {b.replace(chr(39), chr(39) * 2)} ')" for b in badwords)
    return f"""WITH d AS (
  SELECT doc_id, text, string_split(text, '{d}') AS ls
  FROM documents),
l AS (
  SELECT doc_id, j, trim(ls[j], ' ') AS ln
  FROM d, unnest(range(1, len(ls) + 1)) AS t(j)),
k AS (
  SELECT doc_id, j, ln,
         (len(string_split(ln, ' ')) >= {min_words_per_line}
          AND NOT contains(' ' || lower(ln) || ' ', ' javascript '){punct})
           AS kp
  FROM l),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN kp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(string_agg(CASE WHEN kp THEN ln END,
                             '{d}' ORDER BY j), '') AS clean_text
  FROM k GROUP BY doc_id)
SELECT d.doc_id, a.n_lines, a.n_kept,
  CAST(CASE WHEN a.n_kept >= {min_lines}
        AND NOT contains(lower(d.text), 'lorem ipsum')
        AND NOT contains(d.text, '{{'){bad}
       THEN 1 ELSE 0 END AS BIGINT) AS keep,
  a.clean_text
FROM d JOIN agg a USING (doc_id)"""


def incremental_dedup_sql(split_mod: int = 2, new_rem: int = 1) -> str:
    """Mirror of extras.dedup.incremental_dedup_survivors: a NEW doc
    (doc_id % split_mod == new_rem) is admitted iff no OLD-snapshot
    doc shares its raw text and it is the min-doc_id new occurrence."""
    return f"""WITH n AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {split_mod} = {new_rem}
),
o AS (
  SELECT DISTINCT text FROM documents
  WHERE doc_id % {split_mod} <> {new_rem}
)
SELECT min(n.doc_id) AS doc_id
FROM n ANTI JOIN o USING (text)
GROUP BY n.text"""


def decontam_frac_sql(n: int = 3, mod: int = 10, rem: int = 7) -> str:
    """decontam_sql plus the per-doc distinct-gram total and the
    overlap fraction (one int64/int64 double division — bit-identical
    across engines; gram-less docs report 0.0)."""
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT DISTINCT doc_id,
    array_to_string(array_slice(w, i, i + {n - 1}), ' ') AS gram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - {n - 1}))
                   AS i) s
), ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {mod} = {rem}),
tot AS (
  SELECT doc_id, count(*) AS n_grams FROM g
  WHERE doc_id % {mod} <> {rem} GROUP BY doc_id
),
h AS (
  SELECT g.doc_id, count(*) AS n_hits FROM g JOIN ev USING (gram)
  WHERE g.doc_id % {mod} <> {rem} GROUP BY g.doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
       CASE WHEN coalesce(t.n_grams, 0) = 0 THEN 0.0
            ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE) / t.n_grams
       END AS frac
FROM documents d LEFT JOIN h USING (doc_id) LEFT JOIN tot t USING (doc_id)
WHERE d.doc_id % {mod} <> {rem}"""


def seed_topk_sql(seed_mod: int = 17, k: int = 100) -> str:
    """Mirror of extras.similarity.seed_centroid_topk: the
    quantize_sql int8 contract (identical 127 * x / amax then
    floor(.+0.5) operation order), per-dim int64 seed-code sums as
    the centroid, int64 dot as the score — integer-exact end to end,
    so the only float step is the one mul+div pair both engines
    already agree on (quantize_sql is individually green)."""
    return f"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> abs(x))) AS amax
  FROM embeddings
),
q AS (
  SELECT vec_id, generate_subscripts(v, 1) AS dim,
    CAST(floor(127 * unnest(v) / (CASE WHEN amax > 0 THEN amax
                                       ELSE 1.0 END)
               + 0.5) AS BIGINT) AS code
  FROM e
),
c AS (
  SELECT dim, SUM(code) AS cval FROM q
  WHERE vec_id % {seed_mod} = 0 GROUP BY dim
),
s AS (
  SELECT q.vec_id, CAST(SUM(q.code * c.cval) AS BIGINT) AS score
  FROM q JOIN c USING (dim) GROUP BY q.vec_id
),
r AS (
  SELECT vec_id, score,
         row_number() OVER (ORDER BY score DESC, vec_id) AS rn
  FROM s
)
SELECT vec_id, score FROM r WHERE rn <= {k}"""


def pack_emit_sql(budget: int, sep: str = "<eos>") -> str:
    """Mirror of extras.scan.pack_emit over documents: window cumsum
    of len(string_split(text,' ')) in doc_id order, first-token bin,
    ordered string_agg concat per bin."""
    s = sep.replace("'", "''")
    return f"""WITH t AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), sc AS (
  SELECT doc_id, text, n_tok,
    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum
  FROM t
)
SELECT (cum - n_tok) // {budget} AS bin,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tok,
  string_agg(text, '{s}' ORDER BY doc_id) AS packed
FROM sc GROUP BY 1"""


def data_profile_sql() -> str:
    """Mirror of extras.profile.data_profile over events: per-column
    n_nonnull / n_null / min / max, int64 and timestamp extrema
    through one IEEE int64->double conversion (epoch_us for ts),
    string extrema under DuckDB's binary collation (ASCII data)."""
    specs = [("event_id", "int"), ("ts", "ts"), ("user_id", "int"),
             ("event_type", "str"), ("value", "num"), ("props", "str")]
    qs = []
    for c, k in specs:
        qs.append(f"SELECT '{c}' AS col, 'n_nonnull' AS metric, "
                  f"CAST(count({c}) AS DOUBLE) AS val_num, "
                  f"'' AS val_str FROM events")
        qs.append(f"SELECT '{c}', 'n_null', "
                  f"CAST(count(*) - count({c}) AS DOUBLE), '' FROM events")
        if k == "ts":
            lo = f"CAST(epoch_us(min({c})) AS DOUBLE)"
            hi = f"CAST(epoch_us(max({c})) AS DOUBLE)"
            qs.append(f"SELECT '{c}', 'min', {lo}, '' FROM events")
            qs.append(f"SELECT '{c}', 'max', {hi}, '' FROM events")
        elif k == "str":
            qs.append(f"SELECT '{c}', 'min', 0.0, min({c}) FROM events")
            qs.append(f"SELECT '{c}', 'max', 0.0, max({c}) FROM events")
        else:
            qs.append(f"SELECT '{c}', 'min', "
                      f"CAST(min({c}) AS DOUBLE), '' FROM events")
            qs.append(f"SELECT '{c}', 'max', "
                      f"CAST(max({c}) AS DOUBLE), '' FROM events")
    return "\nUNION ALL\n".join(qs)


def bigram_logprob_sql(lam: float = 0.75, dp: int = 4,
                       min_count: int = 1) -> str:
    """Mirror of extras.text.bigram_logprob: interpolated
    Jelinek-Mercer 2-gram probability with the identical single
    mul/div/add sequence per bigram (lam = 0.75 and 0.25 are exactly
    representable), dp-rounded mean per doc, 0.0 for docs with fewer
    than two words.  Bigrams pruned by ``min_count`` score through
    the unigram backoff term (cb = 0), exercising the engine's
    distributed in-merge pruning path."""
    oml = 1.0 - lam
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
p AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1))
                   AS i) s
),
u AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cu
  FROM (SELECT unnest(string_split(text, ' ')) AS word
        FROM documents) GROUP BY word
),
t AS (SELECT CAST(sum(cu) AS DOUBLE) AS tot FROM u),
b AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
  FROM p GROUP BY w1, w2
  HAVING count(*) >= {min_count}
),
s AS (
  SELECT p.doc_id,
         round(avg(ln({lam!r}
                      * (CAST(coalesce(b.cb, 0) AS DOUBLE) / u1.cu)
                      + {oml!r} * (CAST(u2.cu AS DOUBLE) / t.tot))),
               {dp}) AS alp
  FROM p LEFT JOIN b USING (w1, w2)
         JOIN u u1 ON u1.word = p.w1
         JOIN u u2 ON u2.word = p.w2, t
  GROUP BY p.doc_id
)
SELECT d.doc_id, coalesce(s.alp, 0.0) AS avg_logprob
FROM documents d LEFT JOIN s USING (doc_id)"""


def kmer_novelty_sql(path: str, k: int) -> str:
    """Mirror of pipelines.counter.kmer_novelty: per-day first-seen
    canonical k-mer counts + cumulative dictionary size."""
    extra = f", (epoch_us(ts) - {TS_BASE_US}) // {DAY_US} AS day"
    return f"""WITH {km_cte(path, k, extra)},
firsts AS (SELECT kmer, min(day) AS day FROM km GROUP BY kmer),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS new_kmers
          FROM firsts GROUP BY day)
SELECT day, new_kmers,
       CAST(sum(new_kmers) OVER (ORDER BY day) AS BIGINT) AS vocab_size
FROM daily"""


def pmi_pairs_sql(min_count: int = 5, dp: int = 4) -> str:
    """Mirror of extras.text.pmi_pairs: exact-int64 ratio, one IEEE
    division, ln, tie-safe floor rounding (same contract both engines)."""
    s = 10 ** dp
    return f"""WITH bs AS ({bigram_stats_sql(min_count)}),
tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
        FROM documents)
SELECT w1, w2, c12,
       floor(ln(CAST(c12 * n AS DOUBLE) / CAST(c1 * c2 AS DOUBLE))
             * {s} + 0.5) / {float(s)} AS pmi
FROM bs, tot"""
