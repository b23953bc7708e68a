"""Text analysis operators for training-data curation.

Vectorized map_batches stages over the ``documents``-shaped corpus:
language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios — the spirit of the reference's pydantic validation +
whitelist projection gates, harvester/products/tasks/products.py:26-45),
token counting (analyzer tokens and a BPE-ish regex), and document
fingerprinting. Every operator has an exactly-equivalent DuckDB SQL
(``*_sql``) so the external driver can verify value-identical output.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer

EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that")
NL_STOPWORDS = ("de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet")

# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs, each with
# optional leading space (GPT-2-style shape, ASCII-only so RE2 ≡ re)
BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
_BPE_RE = re.compile(BPE_PATTERN)
_PUNCT_STRIP = "[A-Za-z0-9 ]"


def _stop_hits(text_arr: pa.Array, stopwords: tuple[str, ...]) -> np.ndarray:
    rows, codes, dictionary = analyzer.tokenize_flat(text_arr)
    if rows.size == 0:
        return np.zeros(len(text_arr), dtype=np.int64)
    is_stop = np.asarray(pc.is_in(dictionary, value_set=pa.array(stopwords)))
    hit = is_stop[codes]
    return np.bincount(rows[hit], minlength=len(text_arr)).astype(np.int64)


def analyze_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """One-pass quality metrics per document."""
    text = batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    text = pc.fill_null(text, "")
    n = len(text)
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
    n_tokens = analyzer.doc_token_counts(text)
    stop = _stop_hits(text, EN_STOPWORDS)
    punct_chars = np.asarray(
        pc.utf8_length(pc.replace_substring_regex(text, pattern=_PUNCT_STRIP, replacement="")),
        dtype=np.int64,
    )
    denom_t = np.maximum(n_tokens, 1).astype(np.float64)
    denom_c = np.maximum(n_chars, 1).astype(np.float64)
    stop_ratio = stop / denom_t
    punct_ratio = punct_chars / denom_c
    # quality: enough tokens, some stopwords (natural language), little punct noise
    quality = (
        np.minimum(n_tokens / 100.0, 1.0)
        * (1.0 - np.minimum(punct_ratio * 5.0, 1.0))
    )
    return pa.table(
        {
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "stop_ratio": pa.array(np.round(stop_ratio, 6), pa.float64()),
            "punct_ratio": pa.array(np.round(punct_ratio, 6), pa.float64()),
            "quality": pa.array(np.round(quality, 6), pa.float64()),
        }
    )


def analyze(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: analyze_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def analyze_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    stops = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         coalesce({text_col}, '') AS t,
         {tok} AS toks
  FROM {table}
)
SELECT doc_id,
       length(t) AS n_chars,
       len(toks) AS n_tokens,
       round(len(list_filter(toks, x -> x IN ({stops}))) * 1.0 / greatest(len(toks), 1), 6) AS stop_ratio,
       round(length(regexp_replace(t, '{_PUNCT_STRIP}', '', 'g')) * 1.0 / greatest(length(t), 1), 6) AS punct_ratio,
       round( least(len(toks) / 100.0, 1.0)
              * (1.0 - least((length(regexp_replace(t, '{_PUNCT_STRIP}', '', 'g')) * 1.0 / greatest(length(t), 1)) * 5.0, 1.0)), 6) AS quality
FROM base
""".strip()


def lang_id_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID clamped to {en, nl, unk}
    (language handling analog: harvester/core/utils/analyzers.py:6-14)."""
    text = pc.fill_null(batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col], "")
    en = _stop_hits(text, EN_STOPWORDS)
    nl = _stop_hits(text, NL_STOPWORDS)
    pred = np.where(en > nl, "en", np.where(nl > en, "nl", "unk"))
    return pa.table(
        {
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "lang_pred": pa.array(pred.tolist(), pa.string()),
        }
    )


def lang_id(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: lang_id_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lang_id_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    en = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    nl = ", ".join(f"'{s}'" for s in NL_STOPWORDS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         len(list_filter({tok}, x -> x IN ({en}))) AS en_hits,
         len(list_filter({tok}, x -> x IN ({nl}))) AS nl_hits
  FROM {table}
)
SELECT doc_id,
       CASE WHEN en_hits > nl_hits THEN 'en'
            WHEN nl_hits > en_hits THEN 'nl'
            ELSE 'unk' END AS lang_pred
FROM base
""".strip()


def bpe_token_count_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Token counting with a BPE-ish pre-tokenizer regex (count of matches)."""
    text = pc.fill_null(batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col], "")
    counts = np.fromiter(
        (len(_BPE_RE.findall(t)) for t in text.to_pylist()), dtype=np.int64, count=len(text)
    )
    return pa.table(
        {
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "bpe_tokens": pa.array(counts, pa.int64()),
        }
    )


def bpe_token_count(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: bpe_token_count_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bpe_token_count_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    return (
        f"SELECT {id_col} AS doc_id, "
        f"len(regexp_extract_all(coalesce({text_col}, ''), '{BPE_PATTERN}')) AS bpe_tokens "
        f"FROM {table}"
    )


def fingerprint_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Canonical document fingerprint: md5 of the space-joined analyzer token
    stream — invariant to whitespace/punctuation/case noise (the analog of
    the reference's sha1-of-sorted-properties content hash,
    harvester/core/models/datatypes/document.py:131-139)."""
    text = analyzer.normalize_text(batch[text_col])
    rows, codes, dictionary = analyzer.tokenize_flat(text)
    n = batch.num_rows
    # rows come back in ascending row order, so per-doc token streams are
    # contiguous slices of the flat decoded token array
    tok_arr = np.asarray(dictionary.take(pa.array(codes)).to_pylist(), dtype=object)
    bounds = np.searchsorted(rows, np.arange(1, n))
    fps = [
        hashlib.md5(" ".join(part).encode()).hexdigest()
        for part in np.split(tok_arr, bounds)
    ]
    return pa.table(
        {
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "fingerprint": pa.array(fps, pa.string()),
        }
    )


def fingerprint(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: fingerprint_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fingerprint_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return (
        f"SELECT {id_col} AS doc_id, md5(array_to_string({tok}, ' ')) AS fingerprint "
        f"FROM {table}"
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality rules)
# ---------------------------------------------------------------------------

# Flag thresholds (applied to the ROUNDED ratios on both engine and oracle
# side, so boundary docs cannot flip between them). Chosen to be
# non-degenerate on the synthetic corpora: both flags fire on a real
# fraction of docs, neither on all.
REP_DISTINCT_MIN = 0.45
REP_TOP_BIGRAM_MAX = 0.06
# the bigram rule only applies to docs long enough for the ratio to be
# meaningful (1/n_bigrams exceeds the threshold trivially on short docs)
REP_MIN_TOKENS = 20


def repetition_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc repetition statistics, fully vectorized and collision-free.

    Works on the analyzer's dictionary codes (no hashing): unigram counts
    per (doc, code), bigrams as code_i * V + code_{i+1}. Emits
    (doc_id, n_tokens, distinct_ratio, top_token_frac, top_bigram_frac,
    repetitive) — the excessive-repetition family of the Gopher/C4 quality
    rules (massive-web filtering), the scale analog of the reference's
    validation filter (harvester/products/tasks/products.py:26-45).
    """
    ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
    n_docs = len(ids)
    rows, codes, dictionary = analyzer.tokenize_flat(batch[text_col])
    rows = rows.astype(np.int64)
    codes = codes.astype(np.int64)

    n_tok = np.bincount(rows, minlength=n_docs).astype(np.int64)

    def _per_doc_distinct_and_top(r: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(#distinct values, max multiplicity) per doc over (r, c) pairs."""
        d = np.zeros(n_docs, np.int64)
        m = np.zeros(n_docs, np.int64)
        if not r.size:
            return d, m
        order = np.lexsort((c, r))
        r, c = r[order], c[order]
        new = np.empty(r.size, bool)
        new[0] = True
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, r.size))
        run_row = r[starts]
        np.add.at(d, run_row, 1)
        np.maximum.at(m, run_row, run_len)
        return d, m

    uni_d, uni_m = _per_doc_distinct_and_top(rows, codes)

    v = np.int64(len(dictionary))
    valid = rows[:-1] == rows[1:] if rows.size > 1 else np.empty(0, bool)
    brows = rows[:-1][valid] if rows.size > 1 else np.empty(0, np.int64)
    bcodes = (codes[:-1] * v + codes[1:])[valid] if rows.size > 1 else np.empty(0, np.int64)
    _, big_m = _per_doc_distinct_and_top(brows, bcodes)
    n_big = np.maximum(n_tok - 1, 0)

    with np.errstate(divide="ignore", invalid="ignore"):
        distinct_ratio = np.where(n_tok > 0, uni_d / np.maximum(n_tok, 1), 0.0).round(6)
        top_token = np.where(n_tok > 0, uni_m / np.maximum(n_tok, 1), 0.0).round(6)
        top_bigram = np.where(n_big > 0, big_m / np.maximum(n_big, 1), 0.0).round(6)
    repetitive = ((distinct_ratio < REP_DISTINCT_MIN) & (n_tok > 0)) | (
        (top_bigram > REP_TOP_BIGRAM_MAX) & (n_tok >= REP_MIN_TOKENS)
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "distinct_ratio": pa.array(distinct_ratio, pa.float64()),
            "top_token_frac": pa.array(top_token, pa.float64()),
            "top_bigram_frac": pa.array(top_bigram, pa.float64()),
            "repetitive": pa.array(repetitive),
        }
    )


def repetition(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: repetition_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def repetition_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}
),
uni AS (SELECT doc_id, unnest(ts) AS w FROM toks),
ucnt AS (SELECT doc_id, w, count(*) AS c FROM uni GROUP BY doc_id, w),
ustat AS (SELECT doc_id, sum(c) AS n, count(*) AS d, max(c) AS m FROM ucnt GROUP BY doc_id),
big AS (
  SELECT doc_id, unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS b
  FROM toks WHERE len(ts) >= 2
),
bcnt AS (SELECT doc_id, b, count(*) AS c FROM big GROUP BY doc_id, b),
bstat AS (SELECT doc_id, max(c) AS m, sum(c) AS n FROM bcnt GROUP BY doc_id),
j AS (
  SELECT t.doc_id,
         coalesce(u.n, 0) AS n_tokens,
         round(coalesce(u.d * 1.0 / u.n, 0), 6) AS distinct_ratio,
         round(coalesce(u.m * 1.0 / u.n, 0), 6) AS top_token_frac,
         round(coalesce(b.m * 1.0 / b.n, 0), 6) AS top_bigram_frac
  FROM toks t
  LEFT JOIN ustat u ON t.doc_id = u.doc_id
  LEFT JOIN bstat b ON t.doc_id = b.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, distinct_ratio, top_token_frac,
       top_bigram_frac,
       ((distinct_ratio < {REP_DISTINCT_MIN} AND n_tokens > 0)
        OR (top_bigram_frac > {REP_TOP_BIGRAM_MAX} AND n_tokens >= {REP_MIN_TOKENS})) AS repetitive
FROM j ORDER BY doc_id
""".strip()


def compression_ratio(ds, *, id_col: str = "doc_id", text_col: str = "text", level: int = 6):
    """Per-doc zlib compression ratio — the Dolma/CCNet-style quality proxy
    (highly compressible ≈ repetitive/templated text; near-incompressible ≈
    noise). No SQL analog exists (DuckDB has no deterministic compressor
    exposed), so the gate records a rows-only check; determinism across
    partitions/runs is guaranteed by zlib level pinning and covered by a
    unit test. One streaming map pass; the C compressor runs per row — no
    shuffle, bounded batch memory.

    The reference's analog surface is its quality/validation filtering
    (`/root/reference/harvester/products/tasks/products.py:26-45`);
    compression ratio is the content-agnostic scale generalization.
    """
    import zlib

    def score(t: pa.Table) -> pa.Table:
        text = pc.fill_null(
            t[text_col].combine_chunks()
            if isinstance(t[text_col], pa.ChunkedArray)
            else t[text_col],
            "",
        )
        raw = [s.encode() for s in text.to_pylist()]
        comp = np.array([len(zlib.compress(b, level)) for b in raw], dtype=np.float64)
        rawlen = np.maximum(np.array([len(b) for b in raw], dtype=np.float64), 1.0)
        return pa.table(
            {
                "doc_id": t[id_col].combine_chunks().cast(pa.int64()),
                "n_bytes": pa.array(rawlen.astype(np.int64), pa.int64()),
                "n_compressed": pa.array(comp.astype(np.int64), pa.int64()),
                "compression_ratio": pa.array(np.round(comp / rawlen, 6), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# the Gopher repetition-free quality gate's stopword list (Rae et al. 2021,
# Table A1: "contains at least 2 of ...")
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 90,
    mean_len_lo: int = 4,
    mean_len_hi: int = 5,
    min_stop_hits: int = 2,
) -> pa.Table:
    """Gopher document-quality rules (Rae et al. 2021 Table A1), the
    composite keep/drop filter over the per-rule signals `analyze` reports
    individually. Reference analog: the validation gates that route a
    harvested document to active/inactive state
    (`/root/reference/harvester/core/models/datatypes/document.py:84-118`) —
    here as the LM-curation rule set. Bounds adapt Gopher's web thresholds
    to this corpus's token statistics (the paper's 50..100k word bound is
    meaningless on ~54-token synthetic docs).

    Every rule is an exact integer comparison (mean word length ∈
    [lo, hi] ⇔ ``sum_len >= lo·n AND sum_len <= hi·n``), so engine and
    oracle agree bitwise with no float discipline needed.
    """
    text = batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    text = pc.fill_null(text, "")
    n = len(text)
    rows, codes, dictionary = analyzer.tokenize_flat(text)
    n_words = np.bincount(rows, minlength=n).astype(np.int64) if codes.size else np.zeros(n, np.int64)
    sum_len = np.zeros(n, np.int64)
    if codes.size:
        tok_lens = np.asarray(pc.utf8_length(dictionary), dtype=np.int64)
        np.add.at(sum_len, rows, tok_lens[codes])
    stop = _stop_hits(text, GOPHER_STOPS)
    r_min = n_words >= min_words
    r_max = n_words <= max_words
    r_mean = (sum_len >= mean_len_lo * n_words) & (sum_len <= mean_len_hi * n_words)
    r_stop = stop >= min_stop_hits
    keep = r_min & r_max & r_mean & r_stop
    mean_micro = np.where(
        n_words > 0, (sum_len * 1_000_000) // np.maximum(n_words, 1), 0
    )
    return pa.table(
        {
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_micro / 1e6, pa.float64()),
            "stop_hits": pa.array(stop, pa.int64()),
            "r_min_words": pa.array(r_min),
            "r_max_words": pa.array(r_max),
            "r_mean_len": pa.array(r_mean),
            "r_stopwords": pa.array(r_stop),
            "keep": pa.array(keep),
        }
    )


def gopher_rules(ds, **kw):
    return ds.map_batches(
        lambda t: gopher_rules_batch(t, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def gopher_rules_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 90,
    mean_len_lo: int = 4,
    mean_len_hi: int = 5,
    min_stop_hits: int = 2,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {tok} AS toks FROM {table}
),
per AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sum_len,
         CAST(len(list_filter(toks, x -> x IN ({stops}))) AS BIGINT) AS stop_hits
  FROM base
)
SELECT doc_id, n_words,
       CASE WHEN n_words > 0
            THEN CAST((sum_len * 1000000) // n_words AS BIGINT) / 1000000.0
            ELSE 0.0 END AS mean_word_len,
       stop_hits,
       n_words >= {min_words} AS r_min_words,
       n_words <= {max_words} AS r_max_words,
       (sum_len >= {mean_len_lo} * n_words AND sum_len <= {mean_len_hi} * n_words)
         AS r_mean_len,
       stop_hits >= {min_stop_hits} AS r_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND sum_len >= {mean_len_lo} * n_words AND sum_len <= {mean_len_hi} * n_words
        AND stop_hits >= {min_stop_hits}) AS keep
FROM per
ORDER BY doc_id
""".strip()


def winnow_batch(
    batch: pa.Table,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    algorithm) for one batch: md5 each k-token gram, slide a w-hash window,
    keep each window's minimum — any shared token run of length ≥ k+w−1 is
    guaranteed to surface a common fingerprint, at ~1/w the storage of the
    full gram set. The hash is the md5's first 16 hex chars: fixed-width
    lowercase hex is order-isomorphic to its uint64 value, so the SQL
    side's lexicographic string min equals the engine's vectorized
    ``np.minimum`` folds over w shifted uint64 views — the only per-gram
    Python work is the md5 itself. Docs with fewer than w grams contribute their
    single global-min fingerprint; docs shorter than k tokens contribute
    nothing. Emits batch-local DISTINCT (doc_id, fp) pairs."""
    ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
    rows, codes, dictionary = analyzer.tokenize_flat(batch[text_col])
    tok_arr = np.asarray(dictionary.take(pa.array(codes)).to_pylist(), dtype=object)
    bounds = np.searchsorted(rows, np.arange(1, len(ids)))
    out_ids: list[np.ndarray] = []
    out_fps: list[np.ndarray] = []
    for doc_id, toks in zip(ids, np.split(tok_arr, bounds)):
        n = len(toks)
        if n < k:
            continue
        grams = (" ".join(toks[i : i + k]) for i in range(n - k + 1))
        hs = np.fromiter(
            (
                int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
                for g in grams
            ),
            dtype=np.uint64,
            count=n - k + 1,
        )
        g = len(hs)
        if g < w:
            sel = hs.min(keepdims=True)
        else:
            sel = hs[: g - w + 1].copy()
            for j in range(1, w):
                np.minimum(sel, hs[j : j + g - w + 1], out=sel)
        sel = np.unique(sel)
        out_ids.append(np.full(len(sel), doc_id, np.int64))
        out_fps.append(sel)
    if not out_ids:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "fp": pa.array([], pa.string()),
        })
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
        "fp": pa.array(
            [f"{v:016x}" for v in np.concatenate(out_fps)], pa.string()
        ),
    })


def winnow_fingerprints(
    ds,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Distributed winnowing: one streaming pass emits per-doc fingerprint
    sets (already distinct inside the task — the w-fold dedup happens before
    anything crosses the wire); the result is the (doc_id, fp) posting set
    MOSS-style overlap joins run on. Returns rows sorted (doc_id, fp)."""
    parts = ds.map_batches(
        lambda t: winnow_batch(t, k=k, w=w, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "fp": pd.Series([], dtype=str),
        })
    return parts.sort_values(["doc_id", "fp"]).reset_index(drop=True)


def winnow_fingerprints_sql(
    table: str = "documents",
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: the same k-gram md5 stream and window-min selection via a
    ROWS window frame; a doc with fewer than w grams keeps its i=0 frame
    (the min over all its grams)."""
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
gpos AS (
  SELECT doc_id, ts, unnest(generate_series(0, len(ts) - {k})) AS i
  FROM toks WHERE len(ts) >= {k}
),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(md5(array_to_string(ts[CAST(i + 1 AS BIGINT):CAST(i + {k} AS BIGINT)], ' ')), 1, 16) AS h
  FROM gpos
),
wins AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM grams
)
SELECT DISTINCT doc_id, wmin AS fp
FROM wins WHERE i <= ng - {w} OR (ng < {w} AND i = 0)
ORDER BY doc_id, fp
""".strip()


def watermark_greenlist(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect: bool = True,
):
    """LLM watermark detection (Kirchenbauer et al. 2023, public): a
    soft-watermarked generator biases each token toward a "green list"
    seeded by the previous token's hash; the detector recounts. Here the
    green predicate is ``md5(prev || ' ' || cur) mod 4 == 0`` (γ = 1/4,
    context width 1 — md5 so the SQL oracle reproduces the exact hashes,
    the simhash rule), and the per-doc detection statistic is the exact
    z-score ``(4·g − T) / √(3T)`` over T = n_tokens − 1 scored positions
    (integer numerator; the one float op is the mirrored √ expression,
    rounded 4 — the recency rule). Human text z ≈ 0; watermarked text z
    grows as √T.

    Scale shape: embarrassingly parallel one-pass map_batches; the
    per-distinct-bigram md5 loop is bigram-vocabulary-bounded per batch
    (the simhash bound). Returns ``(doc_id, n_scored, n_green, z)`` by
    doc; z NULL when T = 0."""
    import math

    import pandas as pd

    def score(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n = batch.num_rows
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        T = np.zeros(n, np.int64)
        G = np.zeros(n, np.int64)
        if rows.size > 1:
            toks = dictionary.to_pandas().to_numpy(dtype=object)[codes]
            same = rows[1:] == rows[:-1]
            pr = rows[1:][same]
            bigrams = np.array(
                [f"{a} {b}" for a, b in zip(toks[:-1][same], toks[1:][same])],
                dtype=object,
            )
            uniq, inv = np.unique(bigrams, return_inverse=True)
            uh = np.empty(uniq.size, np.uint64)
            for i, v in enumerate(uniq):  # distinct-bigram-bounded loop
                uh[i] = int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
            green = (uh[inv] % np.uint64(4)) == 0
            np.add.at(T, pr, 1)
            np.add.at(G, pr, green.astype(np.int64))
        z = np.full(n, np.nan)
        pos = T > 0
        z[pos] = np.round(
            (4.0 * G[pos] - T[pos]) / np.sqrt(3.0 * T[pos].astype(np.float64)), 4
        )
        return pa.table({
            "doc_id": ids,
            "n_scored": pa.array(T, pa.int64()),
            "n_green": pa.array(G, pa.int64()),
            "z": pa.array(z, pa.float64()),
        })

    res = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    if not collect:
        return res  # per-doc stream — corpus-cardinality
    out = res.to_pandas()
    cols = ["doc_id", "n_scored", "n_green", "z"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values("doc_id").reset_index(drop=True)[cols]


def watermark_greenlist_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
flat AS (
  SELECT doc_id, unnest(ts) AS tok,
         CAST(generate_subscripts(ts, 1) AS BIGINT) AS pos
  FROM toks
),
pairs AS (
  SELECT doc_id,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS ptok, tok
  FROM flat
),
scored AS (
  SELECT doc_id, ptok || ' ' || tok AS bg FROM pairs WHERE ptok IS NOT NULL
),
g AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS t,
         CAST(count(*) FILTER (
           CAST(('0x' || substr(md5(bg), 1, 16)) AS UBIGINT) % 4 = 0
         ) AS BIGINT) AS gg
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id, coalesce(g.t, 0) AS n_scored, coalesce(g.gg, 0) AS n_green,
       CASE WHEN g.t > 0
            THEN round((4.0 * g.gg - g.t) / sqrt(3.0 * g.t), 4) + 0.0
            ELSE NULL END AS z
FROM (SELECT doc_id FROM toks) d LEFT JOIN g USING (doc_id)
ORDER BY d.doc_id
""".strip()


def doc_skyline(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pd.DataFrame":
    """Skyline (Pareto-front) query over per-doc (n_tokens, n_distinct):
    documents not strictly dominated on both axes — the maximal-documents
    view a curation UI shows (long AND lexically rich). Strict dominance:
    a ≻ b iff x_a ≥ x_b ∧ y_a ≥ y_b ∧ (x_a > x_b ∨ y_a > y_b); equal
    (x, y) pairs are mutually non-dominated and all kept.

    Scale shape: each block reduces to its LOCAL skyline (the skyline of
    a union equals the skyline of the unions' skylines — dominance is
    transitive), so the driver merges block-skyline-sized sets only. Both
    passes are the same vectorized group-max + prefix-max scan (no O(n²)
    anywhere; ties handled by the per-x-group max-y rule). Returns
    ``(doc_id, n_tokens, n_distinct)`` sorted by (n_tokens desc,
    n_distinct desc, doc_id)."""
    import pandas as pd

    def _skyline(ids: np.ndarray, x: np.ndarray, y: np.ndarray):
        # survivors: per equal-x group only max-y rows, and only where
        # that y exceeds the running max y of all strictly-greater x
        order = np.lexsort((ids, -y, -x))
        ids, x, y = ids[order], x[order], y[order]
        starts = np.flatnonzero(np.concatenate(([True], x[1:] != x[:-1])))
        gmax = y[starts]  # max y per x-group (y desc within group)
        prev_max = np.concatenate(([np.iinfo(np.int64).min],
                                   np.maximum.accumulate(gmax)[:-1]))
        keep_group = gmax > prev_max
        group_of = np.searchsorted(starts, np.arange(x.size), side="right") - 1
        keep = keep_group[group_of] & (y == gmax[group_of])
        return ids[keep], x[keep], y[keep]

    def local(t: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(t[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n = t.num_rows
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        ntok = np.bincount(rows, minlength=n).astype(np.int64)
        ndis = np.zeros(n, np.int64)
        if rows.size:
            key = rows.astype(np.int64) * (int(codes.max()) + 1) + codes
            uk = np.unique(key)
            np.add.at(ndis, (uk // (int(codes.max()) + 1)).astype(np.int64), 1)
        i, x, y = _skyline(ids, ntok, ndis)
        return pa.table({
            "doc_id": pa.array(i, pa.int64()),
            "n_tokens": pa.array(x, pa.int64()),
            "n_distinct": pa.array(y, pa.int64()),
        })

    parts = [
        b.to_pandas()
        for b in ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ]
    cols = ["doc_id", "n_tokens", "n_distinct"]
    if not parts:
        return pd.DataFrame(columns=cols)
    m = pd.concat(parts, ignore_index=True)
    i, x, y = _skyline(
        m["doc_id"].to_numpy(np.int64),
        m["n_tokens"].to_numpy(np.int64),
        m["n_distinct"].to_numpy(np.int64),
    )
    order = np.lexsort((i, -y, -x))
    return pd.DataFrame({
        "doc_id": i[order], "n_tokens": x[order], "n_distinct": y[order],
    })


def doc_skyline_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH m AS (
  SELECT {id_col} AS doc_id,
         CAST(len({tok}) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct({tok})) AS BIGINT) AS n_distinct
  FROM {table}
)
SELECT a.doc_id, a.n_tokens, a.n_distinct
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.n_tokens >= a.n_tokens AND b.n_distinct >= a.n_distinct
    AND (b.n_tokens > a.n_tokens OR b.n_distinct > a.n_distinct)
)
ORDER BY a.n_tokens DESC, a.n_distinct DESC, a.doc_id
""".strip()
