"""Keyword extraction: per-document TF-IDF top-k and corpus PMI collocations.

The reference fits sklearn vectorizers over harvested content to derive
corpus statistics (`/root/reference/harvester/core/analysis/text.py:45-71`)
and serves per-document "important terms" through OpenSearch significant-
text aggregations it merely configures. These are the two engine-side
equivalents a training-data pipeline actually runs:

- ``tfidf_keywords``: the k most characteristic terms of every document
  (tf × ln(N/df)) — used for topic tagging, near-dup triage and
  significant-term summaries.
- ``collocations_pmi``: corpus-level bigram collocations ranked by
  pointwise mutual information — the first step of phrase/compound
  detection (the engine-side analog of the reference's Dutch decompound
  word list, which is exactly such a phrase vocabulary, shipped static at
  `/root/reference/harvester/opensearch/config/decompound_word_list.nl.txt`).

Scale shape: corpus stats (df / unigram / bigram counts) are per-batch
partial tables folded once — vocabulary-bounded data never round-trips a
Ray groupby (CLAUDE.md round-1 rule); at vocabularies beyond driver memory
the fold becomes the bucketed filesystem partitioning the index build uses
(index/build.py phase 2). The per-document scoring pass broadcasts the df
vocabulary ONCE as sorted numpy arrays (``ray.put`` + searchsorted inside
``map_batches``), so the wide pass is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .. import analyzer

# sentinel "term" for per-batch doc counts: real tokens are [a-z0-9]+ runs,
# so a NUL-prefixed key can never collide with one
_NDOCS_KEY = "\x00n_docs"


def _fold_partials(parts: list[pd.DataFrame]) -> pd.DataFrame:
    if not parts:
        return pd.DataFrame({"term": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)})
    return pd.concat(parts, ignore_index=True).groupby("term", sort=False, as_index=False)["n"].sum()


def corpus_df(ds, *, text_col: str = "text") -> tuple[pd.DataFrame, int]:
    """(term → document frequency) table + total document count, via one
    streaming pass of per-batch partials folded on the driver."""

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        _, c, _ = analyzer.term_frequencies(rows, codes)
        # term_frequencies returns one row per (doc, term): bincount of the
        # term codes IS the per-batch document frequency
        df = np.bincount(c, minlength=len(dictionary)).astype(np.int64) if c.size else np.zeros(len(dictionary), np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        keep = df > 0
        return pa.table(
            {
                "term": pa.array(np.append(terms[keep], [_NDOCS_KEY]), pa.string()),
                "n": pa.array(np.append(df[keep], [len(batch)]), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    folded = _fold_partials(parts)
    is_n = folded["term"] == _NDOCS_KEY
    n_docs = int(folded.loc[is_n, "n"].sum())
    return folded[~is_n].reset_index(drop=True), n_docs


def tfidf_keywords(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> pd.DataFrame:
    """Top-``k`` TF-IDF terms per document: score = tf × ln(N/df), rounded
    to 4 decimals (BM25 score rule); rank ties broken by term ascending.
    Returns ``(doc_id, rank, term, tf, df, tfidf)`` sorted by (doc_id, rank).
    """
    df_tbl, n_docs = corpus_df(ds, text_col=text_col)
    vocab = df_tbl["term"].to_numpy(dtype=object).astype("U")
    dfs = df_tbl["n"].to_numpy(dtype=np.int64)
    order = np.argsort(vocab, kind="stable")
    ref = ray.put((vocab[order], dfs[order], n_docs))

    def score(batch: pa.Table) -> pa.Table:
        terms_sorted, dfs_sorted, n = ray.get(ref)
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        r, c, tf = analyzer.term_frequencies(rows, codes)
        if c.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], batch[id_col].type),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                }
            )
        batch_terms = dictionary.to_pandas().to_numpy(dtype=object).astype("U")
        pos = np.searchsorted(terms_sorted, batch_terms)
        df_of_code = dfs_sorted[np.clip(pos, 0, max(terms_sorted.size - 1, 0))]
        pair_df = df_of_code[c]
        s = np.round(tf.astype(np.float64) * np.log(np.float64(n) / pair_df), 4) + 0.0
        pair_terms = batch_terms[c]
        # per-doc rank by (score desc, term asc): one lexsort, run-length ranks
        order = np.lexsort((pair_terms, -s, r))
        r_s, s_s, t_s = r[order], s[order], pair_terms[order]
        starts = np.flatnonzero(np.diff(np.concatenate(([-1], r_s))))
        run_len = np.diff(np.append(starts, r_s.size))
        rank = np.arange(r_s.size, dtype=np.int64) - np.repeat(starts, run_len)
        keep = rank < k
        doc_ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[r_s[keep]], batch[id_col].type),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
                "term": pa.array(t_s[keep], pa.string()),
                "tf": pa.array(tf[order][keep], pa.int64()),
                "df": pa.array(pair_df[order][keep], pa.int64()),
                "tfidf": pa.array(s_s[keep], pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    cols = ["doc_id", "rank", "term", "tf", "df", "tfidf"]
    if out.empty:  # empty Dataset.to_pandas() drops columns
        return pd.DataFrame(columns=cols)
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def tfidf_keywords_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
flat AS (SELECT doc_id, unnest(ts) AS term FROM toks),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM flat GROUP BY 1, 2),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM flat GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) + 0.0 AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, tfidf
FROM ranked WHERE rank <= {k} ORDER BY doc_id, rank
""".strip()


def collocations_pmi(
    ds,
    *,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
) -> pd.DataFrame:
    """Top-``k`` adjacent-token bigrams by PMI = ln(c_ab·U² / (B·c_a·c_b)),
    U = total tokens, B = total bigrams, c_ab ≥ ``min_count``. The log's
    argument is an exact integer ratio converted to float once, so engine
    and oracle agree to the ulp before the 4-decimal rounding. Returns
    ``(w1, w2, n_pair, pmi)`` ordered by (pmi desc, w1, w2)."""

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        uni = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        out_t = [terms[uni > 0], np.array([_NDOCS_KEY], object)]
        out_n = [uni[uni > 0], np.array([codes.size], np.int64)]
        adj = rows[1:] == rows[:-1] if rows.size else np.zeros(0, bool)
        if adj.any():
            a, b = codes[:-1][adj], codes[1:][adj]
            pair_code = a.astype(np.int64) * len(dictionary) + b
            pc_u, pc_n = np.unique(pair_code, return_counts=True)
            w1 = terms[(pc_u // len(dictionary)).astype(np.int64)]
            w2 = terms[(pc_u % len(dictionary)).astype(np.int64)]
            # bigram partial key "w1 w2" — tokens contain no spaces
            out_t.append(np.char.add(np.char.add(w1.astype("U"), " "), w2.astype("U")).astype(object))
            out_n.append(pc_n.astype(np.int64))
        return pa.table(
            {
                "term": pa.array(np.concatenate(out_t), pa.string()),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    folded = _fold_partials(parts)
    terms = folded["term"].to_numpy(dtype=object)
    ns = folded["n"].to_numpy(dtype=np.int64)
    is_total = terms == _NDOCS_KEY
    is_pair = np.char.find(terms.astype("U"), " ") >= 0
    u_total = int(ns[is_total].sum())
    uni = {t: int(c) for t, c in zip(terms[~is_total & ~is_pair], ns[~is_total & ~is_pair])}
    pair_t, pair_n = terms[is_pair], ns[is_pair]
    b_total = int(pair_n.sum())
    rows = []
    for t, c_ab in zip(pair_t, pair_n):
        if c_ab < min_count:
            continue
        w1, w2 = t.split(" ")
        num = int(c_ab) * u_total * u_total
        den = b_total * uni[w1] * uni[w2]
        rows.append((w1, w2, int(c_ab), round(float(np.log(np.float64(num) / np.float64(den))), 4) + 0.0))
    out = pd.DataFrame(rows, columns=["w1", "w2", "n_pair", "pmi"])
    out = out.sort_values(["pmi", "w1", "w2"], ascending=[False, True, True], kind="stable")
    return out.head(k).reset_index(drop=True)


def collocations_pmi_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {tok} AS ts FROM {table}),
flat AS (SELECT unnest(ts) AS term FROM toks),
uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM flat GROUP BY 1),
u AS (SELECT CAST(count(*) AS BIGINT) AS u FROM flat),
pairs AS (
  SELECT unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS pair
  FROM toks WHERE len(ts) >= 2
),
pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY 1),
b AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pairs),
scored AS (
  SELECT split_part(pair, ' ', 1) AS w1, split_part(pair, ' ', 2) AS w2,
         pc.c_ab AS n_pair,
         round(ln(CAST(pc.c_ab * u.u * u.u AS DOUBLE)
                  / CAST(b.b * ua.c * ub.c AS DOUBLE)), 4) + 0.0 AS pmi
  FROM pc CROSS JOIN u CROSS JOIN b
  JOIN uni ua ON ua.term = split_part(pair, ' ', 1)
  JOIN uni ub ON ub.term = split_part(pair, ' ', 2)
  WHERE pc.c_ab >= {min_count}
)
SELECT w1, w2, n_pair, pmi FROM scored
ORDER BY pmi DESC, w1, w2 LIMIT {k}
""".strip()


def bpe_pair_counts(
    ds,
    *,
    text_col: str = "text",
    k: int = 100,
) -> pd.DataFrame:
    """The first iteration of BPE tokenizer training: corpus-wide counts of
    adjacent character pairs inside tokens (initial symbol state = single
    characters). The merge rule a real BPE trainer would apply is the
    top-count pair; we return the top-``k`` ranked (n desc, pair asc).

    Vectorized per batch: the token dictionary is joined into one byte
    buffer, adjacent in-token byte pairs are bincounted into a 65,536-cell
    grid weighted by token frequency — per-batch partials are the nonzero
    cells (≤ alphabet², tiny), folded once on the driver. Tokens are
    [a-z0-9]+ so bytes == characters. Returns ``(left_sym, right_sym, n)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        if len(dictionary) == 0:
            return pa.table(
                {"pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        cf = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        words = dictionary.to_pandas().to_numpy(dtype=object)
        buf = np.frombuffer(("\x00".join(words) + "\x00").encode(), np.uint8)
        word_id = np.cumsum(buf == 0) - (buf == 0)  # id of the word each byte belongs to
        a, b = buf[:-1], buf[1:]
        ok = (a != 0) & (b != 0)
        pair = a[ok].astype(np.int64) * 256 + b[ok]
        w = cf[word_id[:-1][ok]]
        counts = np.bincount(pair, weights=w, minlength=65536).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "pair": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["left_sym", "right_sym", "n"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby("pair", as_index=False)["n"].sum()
    pair = folded["pair"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "left_sym": [chr(p >> 8) for p in pair],
            "right_sym": [chr(p & 255) for p in pair],
            "n": folded["n"].to_numpy(np.int64),
        }
    )
    out = out.sort_values(["n", "left_sym", "right_sym"], ascending=[False, True, True], kind="stable")
    return out.head(k).reset_index(drop=True)


def bpe_pair_counts_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    k: int = 100,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {tok} AS ts FROM {table}),
words AS (SELECT unnest(ts) AS w FROM toks),
pairs AS (
  SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS p
  FROM words WHERE len(w) >= 2
),
counts AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1)
SELECT substr(p, 1, 1) AS left_sym, substr(p, 2, 1) AS right_sym, n
FROM counts ORDER BY n DESC, left_sym, right_sym LIMIT {k}
""".strip()


def bpe_learn_merges(
    ds,
    *,
    text_col: str = "text",
    n_merges: int = 6,
) -> pd.DataFrame:
    """BPE tokenizer TRAINING: learn the first ``n_merges`` merge rules over
    the corpus (the iterative step `bpe_pair_counts` only previews). This is
    how every production trainer (HF tokenizers, SentencePiece-BPE) splits
    the work: ONE distributed pass reduces the corpus to the word-frequency
    dictionary (vocabulary-bounded — the same partial-fold shape as
    ``corpus_cf``), then merge learning iterates on that dictionary locally,
    never re-reading the corpus. At 100 TB the corpus pass is the only part
    that scales with data; the merge loop scales with |vocab| · n_merges.

    Per step: count adjacent symbol pairs weighted by word frequency, pick
    the max (count desc, (left, right) asc — exact integer tie-break),
    rewrite every word by greedy left-to-right non-overlapping replacement,
    repeat. Returns ``(step, left_sym, right_sym, n)``, one row per merge.
    """
    wf = corpus_cf(ds, text_col=text_col)
    out, _ = _bpe_train(wf, n_merges)
    return out


def _bpe_train(
    wf: pd.DataFrame, n_merges: int
) -> tuple[pd.DataFrame, list[tuple[str, ...]]]:
    """Merge-learning loop over the word-frequency dictionary. Returns the
    merge table and the final symbol tuple per vocabulary word (aligned with
    ``wf`` row order) so encoding can reuse the trained state."""
    words: list[tuple[str, ...]] = [tuple(w) for w in wf["term"]]
    freq = wf["n"].to_numpy(np.int64)
    out: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(words, freq):
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + int(f)
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, left, right, n))
        merged = left + right
        new_words = []
        for syms in words:
            if left not in syms:
                new_words.append(syms)
                continue
            res: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_words.append(tuple(res))
        words = new_words
    table = pd.DataFrame(out, columns=["step", "left_sym", "right_sym", "n"]).astype(
        {"step": np.int64, "n": np.int64}
    )
    return table, words


def bpe_learn_merges_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    n_merges: int = 6,
) -> str:
    """Oracle for ``bpe_learn_merges``: the merge loop unrolled into CTE
    steps. Words are represented as paren-wrapped symbol strings
    ``(c)(o)(n)(v)`` so one ``replace('(l)(r)' → '(lr)')`` IS the greedy
    left-to-right non-overlapping merge (adjacent matches share no
    characters, and symbols are [a-z0-9]+ so parens can't false-match).
    Pair keys join with a TAB (sorts below every token char), making the
    string ORDER BY identical to the engine's (left, right) tuple
    tie-break."""
    parts = _bpe_sql_chain(table, text_col, n_merges)
    union = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, l AS left_sym, r AS right_sym, n FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY step"
    ).strip()


def _bpe_sql_chain(table: str, text_col: str, n_merges: int) -> list[str]:
    """Shared unrolled-CTE merge chain. Each ``w{i}`` carries
    ``(w, repr, freq)`` — the original word rides along so the encode oracle
    can map words to their post-merge representations; the learn oracle just
    ignores it."""
    tok = analyzer.sql_tokenize_expr(text_col)
    parts = [
        f"""toks AS (SELECT unnest({tok}) AS w FROM {table}),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY 1),
w0 AS (SELECT w, regexp_replace(w, '(.)', '(\\1)', 'g') AS repr, freq FROM wf)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""s{i} AS (
  SELECT string_split(trim(repr, '()'), ')(') AS syms, freq FROM w{i - 1}
),
cnt{i} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
    SELECT unnest([syms[j] || chr(9) || syms[j + 1] for j in range(1, len(syms))]) AS pair,
           freq
    FROM s{i} WHERE len(syms) >= 2
  ) GROUP BY 1
),
best{i} AS (
  SELECT string_split(pair, chr(9))[1] AS l, string_split(pair, chr(9))[2] AS r, n
  FROM cnt{i} ORDER BY n DESC, pair ASC LIMIT 1
),
w{i} AS (
  SELECT w, replace(repr, '(' || l || ')(' || r || ')', '(' || l || r || ')') AS repr, freq
  FROM w{i - 1} CROSS JOIN best{i}
)"""
        )
    return parts


def bpe_encode_counts(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> pd.DataFrame:
    """BPE tokenizer APPLICATION: per-document token counts under the
    tokenizer trained by ``bpe_learn_merges``. The expensive merge rewriting
    happens ONCE per distinct vocabulary word (vocabulary-bounded, local);
    the corpus-scale work is a single distributed pass that tokenizes each
    batch and maps its batch dictionary through a broadcast
    (sorted word array → token count) lookup — per-token cost is one int32
    fancy-index, the searchsorted runs on the batch DICTIONARY only. Two
    corpus passes total (train + encode), both streaming, zero shuffle.

    Returns ``(doc_id, n_tokens)`` for every document (0 for token-free
    docs), sorted by doc_id.
    """
    import ray

    wf = corpus_cf(ds, text_col=text_col)
    _, words = _bpe_train(wf, n_merges)
    vocab = wf["term"].to_numpy(dtype=object)
    ntok = np.fromiter((len(s) for s in words), np.int64, count=len(words))
    order = np.argsort(vocab)
    lookup_ref = ray.put((vocab[order], ntok[order]))

    def per_doc(batch: pa.Table) -> pa.Table:
        v, nt = ray.get(lookup_ref)
        text = analyzer.normalize_text(batch[text_col])
        row_ids, codes, dictionary = analyzer.tokenize_flat(text)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        dict_tokens = nt[np.searchsorted(v, terms)] if len(terms) else nt[:0]
        sums = np.bincount(
            row_ids, weights=dict_tokens[codes].astype(np.float64), minlength=len(batch)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch[id_col],
                "n_tokens": pa.array(sums, pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            per_doc, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "n_tokens": pd.Series(dtype=np.int64)}
        )
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def bpe_encode_counts_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
) -> str:
    """Oracle for ``bpe_encode_counts``: the shared merge chain's final
    ``w{n}`` maps each word to its paren representation; token count is the
    number of '(' markers. Per-doc counts via join on the unnested token
    stream, LEFT JOIN keeps token-free documents at 0."""
    tok = analyzer.sql_tokenize_expr(text_col)
    parts = _bpe_sql_chain(table, text_col, n_merges)
    parts.append(
        f"""wtok AS (
  SELECT w, CAST(length(repr) - length(replace(repr, '(', '')) AS BIGINT) AS nt
  FROM w{n_merges}
),
dt AS (SELECT {id_col} AS doc_id, unnest({tok}) AS w FROM {table}),
per_doc AS (
  SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM dt JOIN wtok USING (w) GROUP BY 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT d.{id_col} AS doc_id, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens
FROM {table} d LEFT JOIN per_doc p ON d.{id_col} = p.doc_id
ORDER BY doc_id"""
    ).strip()


def bpe_fertility_by_lang(
    ds,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    n_merges: int = 8,
) -> pd.DataFrame:
    """Tokenizer fertility (tokens per word) per language under the BPE
    tokenizer trained by ``bpe_learn_merges`` — the standard multilingual
    tokenizer-quality diagnostic (a language with high fertility is
    under-served by the learned merges). Same two-pass shape as
    ``bpe_encode_counts``; the second pass folds to one (lang → Σtokens,
    Σwords) pair per batch, so the driver merge is bounded by |langs|.

    Returns ``(lang, n_words, n_tokens, fertility)`` sorted by lang, with
    fertility = n_tokens/n_words as an exact half-away 1e-6 fixed-point
    quotient of the integer pair (the bucket_script integer-division
    pattern, so the oracle can mirror it byte-identically).
    """
    import ray

    wf = corpus_cf(ds, text_col=text_col)
    _, words = _bpe_train(wf, n_merges)
    vocab = wf["term"].to_numpy(dtype=object)
    ntok = np.fromiter((len(s) for s in words), np.int64, count=len(words))
    order = np.argsort(vocab)
    lookup_ref = ray.put((vocab[order], ntok[order]))

    def partials(batch: pa.Table) -> pa.Table:
        v, nt = ray.get(lookup_ref)
        text = analyzer.normalize_text(batch[text_col])
        row_ids, codes, dictionary = analyzer.tokenize_flat(text)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        dict_tokens = nt[np.searchsorted(v, terms)] if len(terms) else nt[:0]
        per_tok = dict_tokens[codes]
        langs = batch[lang_col].to_pandas().to_numpy(dtype=object)[row_ids]
        df = pd.DataFrame(
            {"lang": langs, "n_words": np.ones(per_tok.size, np.int64),
             "n_tokens": per_tok}
        ).groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return pd.DataFrame({
            "lang": pd.Series(dtype=object),
            "n_words": pd.Series(dtype=np.int64),
            "n_tokens": pd.Series(dtype=np.int64),
            "fertility": pd.Series(dtype=np.float64),
        })
    agg = (
        pd.concat(parts, ignore_index=True)
        .groupby("lang", as_index=False)
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    fert = [
        (2 * int(t) * 1_000_000 + int(w)) // (2 * int(w)) / 1e6
        for t, w in zip(agg["n_tokens"], agg["n_words"])
    ]
    agg["fertility"] = np.asarray(fert, np.float64)
    return agg.astype({"n_words": np.int64, "n_tokens": np.int64})


def bpe_fertility_by_lang_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    n_merges: int = 8,
) -> str:
    """Oracle for ``bpe_fertility_by_lang``: the shared merge chain's
    ``w{n}`` word→token-count map joined onto the per-language token
    stream; fertility via the exact integer half-away quotient."""
    tok = analyzer.sql_tokenize_expr(text_col)
    parts = _bpe_sql_chain(table, text_col, n_merges)
    parts.append(
        f"""wtok AS (
  SELECT w, CAST(length(repr) - length(replace(repr, '(', '')) AS BIGINT) AS nt
  FROM w{n_merges}
),
lt AS (SELECT {lang_col} AS lang, unnest({tok}) AS w FROM {table}),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM lt JOIN wtok USING (w) GROUP BY 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT lang, n_words, n_tokens,
       CAST((2 * n_tokens * 1000000 + n_words) // (2 * n_words) AS BIGINT) / 1000000.0
         AS fertility
FROM agg ORDER BY lang"""
    ).strip()


def unigram_nano_scores(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
):
    """Integer unigram-LM scores per document: a Dataset of ``(doc_id,
    n_tokens, total_nano [, keep_cols...])`` where ``total_nano = Σ_terms
    tf · floor(ln(cf_term/U)·1e9 + 0.5)`` — the exact-integer core shared
    by ``unigram_logprob`` (rounded-float view),
    ``ops/quantiles.perplexity_buckets`` (rank view) and ``doremi_weights``
    (per-domain fold, which passes its grouping column through
    ``keep_cols``). Two passes: cf fold, then a broadcast-vocabulary
    streaming scoring pass."""
    # pass 1: corpus collection frequencies + total token count
    def cf_partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        _, codes, dictionary = analyzer.tokenize_flat(text)
        cf = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        keep = cf > 0
        return pa.table(
            {
                "term": pa.array(np.append(terms[keep], [_NDOCS_KEY]), pa.string()),
                "n": pa.array(np.append(cf[keep], [int(codes.size)]), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(cf_partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    folded = _fold_partials(parts)
    is_u = folded["term"] == _NDOCS_KEY
    u_total = int(folded.loc[is_u, "n"].sum())
    vocab_tbl = folded[~is_u]
    vocab = vocab_tbl["term"].to_numpy(dtype=object).astype("U")
    cfs = vocab_tbl["n"].to_numpy(np.int64)
    order = np.argsort(vocab, kind="stable")
    # quantize each term's ln(cf/U) once — ln(cf·1.0/U) exactly as the oracle
    lp_nano = np.floor(
        np.log(cfs[order].astype(np.float64) / np.float64(u_total)) * 1e9 + 0.5
    ).astype(np.int64) if u_total else np.zeros(0, np.int64)
    ref = ray.put((vocab[order], lp_nano))

    def score(batch: pa.Table) -> pa.Table:
        terms_sorted, lp_sorted = ray.get(ref)
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n = batch.num_rows
        doc_ids = batch[id_col].combine_chunks()
        n_tok = np.bincount(rows, minlength=n).astype(np.int64) if rows.size else np.zeros(n, np.int64)
        totals = np.zeros(n, np.int64)
        if codes.size:
            batch_terms = dictionary.to_pandas().to_numpy(dtype=object).astype("U")
            pos = np.searchsorted(terms_sorted, batch_terms)
            lp_of_code = lp_sorted[np.clip(pos, 0, max(terms_sorted.size - 1, 0))]
            np.add.at(totals, rows, lp_of_code[codes])
        out = pa.table(
            {
                "doc_id": doc_ids,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "total_nano": pa.array(totals, pa.int64()),
            }
        )
        for c in keep_cols:
            out = out.append_column(c, batch[c].combine_chunks())
        return out

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def unigram_logprob(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Unigram-LM quality score per document — the engine-side analog of
    CCNet/KenLM perplexity filtering, with the corpus itself as the model:
    ``logprob = Σ_terms tf · ln(cf_term / U)`` and
    ``lp_per_token = logprob / doc_len`` (higher = more typical text;
    boilerplate scores high, lexical soup scores low).

    Oracle-exact float discipline: each term's ln(cf/U) is quantized ONCE
    to a nano-fixed-point integer (``unigram_nano_scores``); per-doc totals
    are integer sums (no order-dependent float accumulation), floats
    re-enter only in the final per-token division. Returns
    ``(doc_id, n_tokens, logprob, lp_per_token)`` rounded to 6."""
    out = unigram_nano_scores(ds, id_col=id_col, text_col=text_col).to_pandas()
    cols = ["doc_id", "n_tokens", "logprob", "lp_per_token"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    totals = out["total_nano"].to_numpy(np.int64)
    n_tok = out["n_tokens"].to_numpy(np.int64)
    lp = totals / 1e9
    per_tok = np.divide(lp, n_tok, out=np.zeros(len(out), np.float64), where=n_tok > 0)
    out["logprob"] = np.round(lp, 6) + 0.0
    out["lp_per_token"] = np.round(per_tok, 6) + 0.0
    return out.sort_values("doc_id").reset_index(drop=True)[cols]


def unigram_logprob_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
flat AS (SELECT doc_id, unnest(ts) AS term FROM toks),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM flat GROUP BY 1),
u AS (SELECT CAST(count(*) AS BIGINT) AS u FROM flat),
lp AS (
  SELECT term,
         CAST(floor(ln(cf * 1.0 / u.u) * 1e9 + 0.5) AS BIGINT) AS lp_nano
  FROM cf CROSS JOIN u
),
per_doc AS (
  SELECT f.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(lp.lp_nano) AS total_nano
  FROM flat f JOIN lp USING (term) GROUP BY f.doc_id
)
SELECT t.doc_id,
       coalesce(p.n_tokens, 0) AS n_tokens,
       round(coalesce(p.total_nano, 0) / 1e9, 6) + 0.0 AS logprob,
       CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
            ELSE round((p.total_nano / 1e9) / p.n_tokens, 6) + 0.0 END AS lp_per_token
FROM (SELECT doc_id FROM toks) t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
""".strip()


def dsir_weights(
    ds,
    *,
    target_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> pd.DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by how much more
    likely its tokens are under a TARGET-domain unigram LM than under the
    full-corpus source LM —
    ``log w = Σ_tokens [ln p_tgt(t) − ln p_src(t)]`` with add-one
    smoothing over the shared vocabulary, ``p_c(t) = (cf_c+1)/(U_c+V)``.
    Feed ``log_weight`` into ``ops/sampling.weighted_sample`` for the
    resampling half of the recipe. The target domain here is a language
    subset (the corpus's own metadata); any boolean doc predicate slots in
    the same way.

    Same two-pass discipline as ``unigram_logprob``: one corpus pass folds
    to a (term → cf_all, cf_target) table (vocabulary-bounded — BOTH LMs
    from one pass); each term's Δln is quantized ONCE to nano fixed-point;
    per-doc totals are exact integer sums; floats re-enter only at the
    final division. Returns ``(doc_id, n_tokens, log_weight,
    lw_per_token)`` rounded to 6, every doc included (0 when token-free).
    """
    import ray

    def cf_partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n_all = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        langs = batch[lang_col].to_pandas().to_numpy(dtype=object)
        tgt = codes[langs[rows] == target_lang] if codes.size else codes
        n_tgt = np.bincount(tgt, minlength=len(dictionary)).astype(np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        keep = n_all > 0
        return pa.table(
            {
                "term": pa.array(terms[keep], pa.string()),
                "n_all": pa.array(n_all[keep], pa.int64()),
                "n_tgt": pa.array(n_tgt[keep], pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            cf_partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype=np.int64),
        "n_tokens": pd.Series(dtype=np.int64),
        "log_weight": pd.Series(dtype=np.float64),
        "lw_per_token": pd.Series(dtype=np.float64),
    })
    if not parts:
        return empty
    cf = (
        pd.concat(parts, ignore_index=True)
        .groupby("term", as_index=False)[["n_all", "n_tgt"]]
        .sum()
    )
    if not len(cf):
        return empty
    u_all = int(cf["n_all"].sum())
    u_tgt = int(cf["n_tgt"].sum())
    v = int(len(cf))
    vocab = cf["term"].to_numpy(dtype=object).astype("U")
    order = np.argsort(vocab, kind="stable")
    lpt = np.log((cf["n_tgt"].to_numpy(np.float64) + 1.0) / np.float64(u_tgt + v))
    lps = np.log((cf["n_all"].to_numpy(np.float64) + 1.0) / np.float64(u_all + v))
    d_nano = np.floor((lpt - lps)[order] * 1e9 + 0.5).astype(np.int64)
    ref = ray.put((vocab[order], d_nano))

    def score(batch: pa.Table) -> pa.Table:
        terms_sorted, d_sorted = ray.get(ref)
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n = batch.num_rows
        n_tok = (
            np.bincount(rows, minlength=n).astype(np.int64)
            if rows.size else np.zeros(n, np.int64)
        )
        totals = np.zeros(n, np.int64)
        if codes.size:
            batch_terms = dictionary.to_pandas().to_numpy(dtype=object).astype("U")
            pos = np.searchsorted(terms_sorted, batch_terms)
            d_of_code = d_sorted[np.clip(pos, 0, max(terms_sorted.size - 1, 0))]
            np.add.at(totals, rows, d_of_code[codes])
        lw = totals / 1e9
        per_tok = np.divide(lw, n_tok, out=np.zeros(n, np.float64), where=n_tok > 0)
        return pa.table(
            {
                "doc_id": batch[id_col],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "log_weight": pa.array(np.round(lw, 6) + 0.0, pa.float64()),
                "lw_per_token": pa.array(np.round(per_tok, 6) + 0.0, pa.float64()),
            }
        )

    out = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def dsir_weights_sql(
    table: str = "documents",
    *,
    target_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> str:
    """Oracle for ``dsir_weights``: same one-pass (cf_all, cf_tgt) table,
    same once-quantized nano Δln per term, integer per-doc sums."""
    tok = analyzer.sql_tokenize_expr(text_col)
    tgt = target_lang.replace("'", "''")
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {lang_col} AS lang, {tok} AS ts FROM {table}),
flat AS (SELECT doc_id, lang, unnest(ts) AS term FROM toks),
cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_all,
         CAST(count(*) FILTER (WHERE lang = '{tgt}') AS BIGINT) AS n_tgt
  FROM flat GROUP BY 1
),
u AS (
  SELECT CAST(sum(n_all) AS BIGINT) AS u_all,
         CAST(sum(n_tgt) AS BIGINT) AS u_tgt,
         CAST(count(*) AS BIGINT) AS v
  FROM cf
),
d AS (
  SELECT term,
         CAST(floor((ln((n_tgt + 1) * 1.0 / (u_tgt + v))
                     - ln((n_all + 1) * 1.0 / (u_all + v))) * 1e9 + 0.5)
              AS BIGINT) AS d_nano
  FROM cf CROSS JOIN u
),
per_doc AS (
  SELECT f.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(d.d_nano) AS total_nano
  FROM flat f JOIN d USING (term) GROUP BY f.doc_id
)
SELECT t.doc_id,
       coalesce(p.n_tokens, 0) AS n_tokens,
       round(coalesce(p.total_nano, 0) / 1e9, 6) + 0.0 AS log_weight,
       CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
            ELSE round((p.total_nano / 1e9) / p.n_tokens, 6) + 0.0 END AS lw_per_token
FROM (SELECT doc_id FROM toks) t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
""".strip()


def fuzzy_token_pairs(
    ds,
    *,
    text_col: str = "text",
    min_len: int = 4,
    max_dist: int = 2,
) -> pd.DataFrame:
    """Similarity self-join over the corpus vocabulary: all token pairs at
    Levenshtein distance ≤ ``max_dist`` — the SymSpell deletion-
    neighborhood algorithm: any pair within distance d shares an entry of
    the ≤d-char-deletion neighborhoods, so grouping by deletion variant is
    a COMPLETE candidate blocking (no missed pairs). This is the scale
    path behind did_you_mean's prefix-bounded scan (index/extras.py:334):
    the neighborhood explosion is per-token (embarrassingly parallel) and
    candidates shuffle only (variant, token_id) pairs. Tokens shorter than
    ``min_len`` are skipped. Candidates are verified with a banded DP.
    Returns ``(tok_a, tok_b, dist)`` sorted pairs, dist ≥ 1."""
    df_tbl, _ = corpus_df(ds, text_col=text_col)
    vocab = sorted(t for t in df_tbl["term"] if len(t) >= min_len)

    def deletions(t: str, d: int) -> set:
        out = {t}
        frontier = {t}
        for _ in range(d):
            nxt = set()
            for w in frontier:
                for j in range(len(w)):
                    nxt.add(w[:j] + w[j + 1 :])
            out |= nxt
            frontier = nxt
        return out

    buckets: dict[str, list[int]] = {}
    for i, t in enumerate(vocab):
        for v in deletions(t, max_dist):
            buckets.setdefault(v, []).append(i)
    cand = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cand.add((members[x], members[y]))

    def lev(a: str, b: str) -> int:
        la, lb = len(a), len(b)
        if abs(la - lb) > max_dist:
            return max_dist + 1
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[lb]

    rows = []
    for i, j in cand:
        d = lev(vocab[i], vocab[j])
        if 1 <= d <= max_dist:
            rows.append((vocab[i], vocab[j], d))
    rows.sort()
    return pd.DataFrame(rows, columns=["tok_a", "tok_b", "dist"]).astype(
        {"dist": "int64"} if rows else {"tok_a": str, "tok_b": str, "dist": "int64"}
    )


def fuzzy_token_pairs_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    min_len: int = 4,
    max_dist: int = 2,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH vocab AS (
  SELECT DISTINCT unnest({tok}) AS t FROM {table}
),
v AS (SELECT t FROM vocab WHERE len(t) >= {min_len})
SELECT a.t AS tok_a, b.t AS tok_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) <= {max_dist}
ORDER BY tok_a, tok_b
""".strip()


def cooccurrence_pairs(
    ds,
    *,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
    max_doc_terms: int = 512,
) -> pd.DataFrame:
    """Document-level term co-occurrence counts: for every document, every
    unordered pair of DISTINCT terms it contains counts once — the
    precursor matrix of PMI embeddings / related-term suggestions (the
    whole-document sibling of ``collocations_pmi``'s adjacency window).

    Per batch the (doc, distinct-term) stream is pair-enumerated with the
    closed-form triangle decode (`ops/dedup.py:_group_pairs` — no Python
    per doc), pair partials fold once. Docs with more than
    ``max_doc_terms`` distinct terms are skipped (quadratic guard, same
    role as near-dup's ``max_bucket``; both sides apply it). Returns
    ``(w1, w2, n)`` top-``k`` by (n desc, pair), n ≥ ``min_count``."""
    from .dedup import _group_pairs

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        r, c, _ = analyzer.term_frequencies(rows, codes)  # distinct per doc
        if r.size == 0:
            return pa.table({"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        # r is grouped by row; within a row codes ascend (term_frequencies
        # sorts the composite key) → pairs come out with code_i < code_j
        counts = np.bincount(r.astype(np.int64))
        counts = counts[counts > 0]
        emit = counts <= max_doc_terms
        i, j = _group_pairs(counts, emit)
        terms = dictionary.to_pandas().to_numpy(dtype=object).astype("U")
        # code order is batch-dictionary order, not lexicographic — emit the
        # canonical (min,max) STRING pair so folds agree across batches
        a, b = terms[c[i]], terms[c[j]]
        swap = a > b
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        pair = np.char.add(np.char.add(lo, " "), hi)
        pu, pn = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(pu.astype(object), pa.string()),
                "n": pa.array(pn.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["w1", "w2", "n"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby("pair", as_index=False)["n"].sum()
    folded = folded[folded["n"] >= min_count]
    if folded.empty:
        return pd.DataFrame(columns=cols)
    split = folded["pair"].str.split(" ", n=1, expand=True)
    out = pd.DataFrame({"w1": split[0], "w2": split[1], "n": folded["n"].astype(np.int64)})
    out = out.sort_values(["n", "w1", "w2"], ascending=[False, True, True], kind="stable")
    return out.head(k).reset_index(drop=True)[cols]


def cooccurrence_pairs_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
    max_doc_terms: int = 512,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT row_number() OVER () AS rid, {tok} AS ts FROM {table}),
dt AS (SELECT DISTINCT rid, unnest(ts) AS term FROM toks),
sized AS (
  SELECT rid FROM dt GROUP BY rid HAVING count(*) <= {max_doc_terms}
),
pairs AS (
  SELECT a.term AS w1, b.term AS w2
  FROM dt a JOIN dt b ON a.rid = b.rid AND a.term < b.term
  JOIN sized s ON s.rid = a.rid
),
counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY w1, w2 HAVING count(*) >= {min_count}
)
SELECT w1, w2, n FROM counts ORDER BY n DESC, w1, w2 LIMIT {k}
""".strip()


def zipf_slope(
    ds,
    *,
    text_col: str = "text",
) -> pd.DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS slope of ln(frequency)
    against ln(rank) (rank 1 = most frequent; ties broken by term so the
    ranking is total) — natural language sits near −1; templated or
    synthetic text drifts off. Frequencies come from the usual vocabulary
    partial fold; each ln is nano-quantized BEFORE the sums, numerator and
    denominator are exact Python ints (DuckDB: HUGEINT). Returns one row
    ``(n_vocab, slope, intercept)`` (rounded 6)."""
    df_tbl = corpus_cf(ds, text_col=text_col)
    cols = ["n_vocab", "slope", "intercept"]
    if df_tbl.empty:
        return pd.DataFrame(columns=cols)
    srt = df_tbl.sort_values(["n", "term"], ascending=[False, True], kind="stable")
    cf = srt["n"].to_numpy(np.int64)
    n = int(cf.size)
    rank = np.arange(1, n + 1, dtype=np.int64)
    x = np.floor(np.log(rank.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    y = np.floor(np.log(cf.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int(np.dot(x.astype(np.float64), y.astype(np.float64)))
    sxx = int(np.dot(x.astype(np.float64), x.astype(np.float64)))
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    if den == 0:
        return pd.DataFrame({"n_vocab": [n], "slope": [None], "intercept": [None]})
    slope = float(num) / float(den)
    intercept = (float(sy) / 1e9 - slope * (float(sx) / 1e9)) / n
    return pd.DataFrame(
        {
            "n_vocab": np.array([n], np.int64),
            "slope": [round(slope, 6) + 0.0],
            "intercept": [round(intercept, 6) + 0.0],
        }
    )


def corpus_cf(ds, *, text_col: str = "text") -> pd.DataFrame:
    """(term → collection frequency) via the standard partial fold."""

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        _, codes, dictionary = analyzer.tokenize_flat(text)
        cf = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        keep = cf > 0
        return pa.table(
            {
                "term": pa.array(terms[keep], pa.string()),
                "n": pa.array(cf[keep], pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    return _fold_partials(parts)


def zipf_slope_sql(table: str = "documents", *, text_col: str = "text") -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(ts) AS term FROM (SELECT {tok} AS ts FROM {table}))
  GROUP BY term
),
ranked AS (
  SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY n DESC, term) AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS x,
         CAST(floor(ln(CAST(n AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS y
  FROM cf
),
agg AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_vocab,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0
       END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round((CAST(sy AS DOUBLE) / 1e9
                        - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
                          * (CAST(sx AS DOUBLE) / 1e9))
                       / CAST(n AS DOUBLE), 6) + 0.0
       END AS intercept
FROM agg
""".strip()


def burstiness(
    ds,
    *,
    text_col: str = "text",
    k: int = 50,
) -> pd.DataFrame:
    """Church–Gale burstiness of the top-``k`` collection-frequency terms:
    B = cf/df, the mean occurrence count per document that contains the
    term. Function words sit near 1 (spread evenly); topical terms repeat
    within their documents (B ≫ 1) — the classic signal separating content
    words from glue and flagging templated spam (whole vocabulary bursty).

    One streaming pass emits (term, cf, df) partials per batch; the fold is
    vocabulary-bounded (CLAUDE.md round-1 rule — never a Ray groupby for
    vocab-sized data). The ratio is the exact half-up integer division
    ``(2·cf·1e6 + df) // (2·df)`` on BOTH sides, so cf/df landing on an
    exact decimal half (the n/256 trap) cannot disagree. Rank by cf DESC,
    term ASC. Returns ``(rank, term, cf, df, burstiness)``.

    Reference analog: corpus vectorizer statistics
    (`/root/reference/harvester/core/analysis/text.py:45-71`)."""

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        nv = len(dictionary)
        cf = np.bincount(codes, minlength=nv).astype(np.int64)
        _, c, _ = analyzer.term_frequencies(rows, codes)
        df = np.bincount(c, minlength=nv).astype(np.int64) if c.size else np.zeros(nv, np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        keep = cf > 0
        return pa.table(
            {
                "term": pa.array(terms[keep], pa.string()),
                "cf": pa.array(cf[keep], pa.int64()),
                "df": pa.array(df[keep], pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["rank", "term", "cf", "df", "burstiness"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby("term", sort=False, as_index=False)[["cf", "df"]]
        .sum()
    )
    if folded.empty:
        return pd.DataFrame(columns=cols)
    srt = folded.sort_values(["cf", "term"], ascending=[False, True], kind="stable").head(k)
    cf_v = srt["cf"].to_numpy(np.int64)
    df_v = srt["df"].to_numpy(np.int64)
    b = np.array(
        [(2 * int(c) * 1_000_000 + int(d)) // (2 * int(d)) for c, d in zip(cf_v, df_v)],
        np.int64,
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(srt) + 1, dtype=np.int64),
            "term": srt["term"].to_numpy(object),
            "cf": cf_v,
            "df": df_v,
            "burstiness": b.astype(np.float64) / 1e6,
        }
    )


def burstiness_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH pairs AS (
  SELECT id, unnest(ts) AS term
  FROM (SELECT {id_col} AS id, {tok} AS ts FROM {table})
),
stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf,
         CAST(count(DISTINCT id) AS BIGINT) AS df
  FROM pairs GROUP BY term
),
top AS (
  SELECT row_number() OVER (ORDER BY cf DESC, term) AS rank, term, cf, df
  FROM stats QUALIFY rank <= {k}
)
SELECT CAST(rank AS BIGINT) AS rank, term, cf, df,
       CAST((2 * cf * 1000000 + df) // (2 * df) AS DOUBLE) / 1e6 AS burstiness
FROM top ORDER BY rank
""".strip()


def gini_vocab(ds, *, text_col: str = "text") -> pd.DataFrame:
    """Gini coefficient of the term-frequency distribution — how unequally
    token mass concentrates in the vocabulary (0 = uniform, →1 = a few
    terms own the corpus). The single-number companion to ``zipf_slope`` /
    ``vocab_coverage``: natural language sits high (stopwords dominate);
    a flat Gini flags synthetic or shuffled text. Uses the exact rank
    formula G = (2·Σ i·cᵢ − (n+1)·Σc) / (n·Σc) over counts sorted
    ascending — the i-weighted sum is invariant under tie permutation, so
    no tie-break is needed. All terms are exact Python ints (HUGEINT in
    SQL); the ratio is the half-up fixed division at 1e6. One corpus_cf
    partial fold, no shuffle. Returns ``(n_vocab, total_tokens, gini)``."""
    cf_tbl = corpus_cf(ds, text_col=text_col)
    cols = ["n_vocab", "total_tokens", "gini"]
    if cf_tbl.empty:
        return pd.DataFrame(columns=cols)
    c = np.sort(cf_tbl["n"].to_numpy(np.int64))
    nv = int(c.size)
    tot = int(c.sum())
    sic = sum((i + 1) * int(v) for i, v in enumerate(c))
    num = 2 * sic - (nv + 1) * tot
    den = nv * tot
    gini = ((2 * num * 1_000_000 + den) // (2 * den)) / 1e6 if den else None
    return pd.DataFrame(
        {
            "n_vocab": np.array([nv], np.int64),
            "total_tokens": np.array([tot], np.int64),
            "gini": [gini],
        }
    )


def gini_vocab_sql(table: str = "documents", *, text_col: str = "text") -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(ts) AS term FROM (SELECT {tok} AS ts FROM {table}))
  GROUP BY term
),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY n, term) AS HUGEINT) AS i,
         CAST(n AS HUGEINT) AS n
  FROM cf
),
a AS (SELECT CAST(count(*) AS HUGEINT) AS nv, sum(i * n) AS sic, sum(n) AS tot FROM r)
SELECT CAST(nv AS BIGINT) AS n_vocab, CAST(tot AS BIGINT) AS total_tokens,
       CASE WHEN nv * tot = 0 THEN NULL
            ELSE CAST((2 * (2 * sic - (nv + 1) * tot) * 1000000 + nv * tot)
                      // (2 * nv * tot) AS DOUBLE) / 1e6
       END AS gini
FROM a
""".strip()


def syllable_stats(
    ds,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Lexical-complexity profile per source: words, syllables (vowel-run
    count per token — the standard readability approximation behind
    Flesch/FK grading) and syllables-per-word. The reading-level signal a
    curation mix reads next to ``text_quality``: a source drifting toward
    long polysyllabic tokens reads differently than its peers. Syllables
    are counted ONCE per distinct batch token (dictionary-vectorized
    regex, never per occurrence); partials fold per (source) — sources ×
    1 cells, no shuffle. The ratio is the half-up fixed division at 1e6.
    Returns ``(source, n_docs, n_words, n_syllables, syll_per_word)``
    sorted by source."""

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        syl_of = (
            pd.Series(dictionary.to_pandas()).str.count(r"[aeiou]+").to_numpy(np.int64)
            if len(dictionary)
            else np.zeros(0, np.int64)
        )
        n = batch.num_rows
        words = np.bincount(rows, minlength=n).astype(np.int64) if rows.size else np.zeros(n, np.int64)
        sylls = (
            np.bincount(rows, weights=syl_of[codes], minlength=n).astype(np.int64)
            if rows.size else np.zeros(n, np.int64)
        )
        src = batch[source_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src, "w": words, "s": sylls})
        g = df.groupby("source", sort=False).agg(
            n_docs=("w", "size"), n_words=("w", "sum"), n_syllables=("s", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["source", "n_docs", "n_words", "n_syllables", "syll_per_word"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby("source", sort=True, as_index=False)[["n_docs", "n_words", "n_syllables"]]
        .sum()
    )
    folded["syll_per_word"] = [
        ((2 * int(s) * 1_000_000 + int(w)) // (2 * int(w))) / 1e6 if w else None
        for w, s in zip(folded["n_words"], folded["n_syllables"])
    ]
    for c in ("n_docs", "n_words", "n_syllables"):
        folded[c] = folded[c].astype(np.int64)
    return folded[cols]


def syllable_stats_sql(
    table: str = "documents",
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH docs AS (SELECT {source_col} AS source, {tok} AS ts FROM {table}),
per_doc AS (
  SELECT source, CAST(len(ts) AS BIGINT) AS w,
         CAST(coalesce((SELECT sum(len(regexp_extract_all(t.w2, '[aeiou]+')))
                        FROM unnest(ts) AS t(w2)), 0) AS BIGINT) AS s
  FROM docs
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS n_words,
         CAST(sum(s) AS BIGINT) AS n_syllables
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_words, n_syllables,
       CASE WHEN n_words = 0 THEN NULL
            ELSE CAST((2 * CAST(n_syllables AS HUGEINT) * 1000000 + n_words)
                      // (2 * CAST(n_words AS HUGEINT)) AS DOUBLE) / 1e6
       END AS syll_per_word
FROM agg ORDER BY source
""".strip()


def stylometry_delta(
    ds,
    *,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 30,
) -> pd.DataFrame:
    """Burrows' Delta between every pair of sources — the classic
    stylometry/authorship distance: z-score each source's relative
    frequency of the corpus's top-``k`` terms against the across-source
    mean/σ, then average |z₁ − z₂|. Two sources writing in the same
    register sit near 0; a styled outlier (template farm, different
    genre) stands off — the pairwise view behind ``source_kl``'s
    one-vs-corpus number.

    Exactness: relative frequencies fix to 1e9 integers per (source,
    term) (half-up); per-term mean/variance come from integer sums over
    sources (order-free); z = (S·F − ΣF)/√(S·ΣF² − (ΣF)²) is ONE mirrored
    float division, quantized to 1e6 ints before the pair sums; the final
    mean is a half-up integer division. Terms with zero across-source
    variance are excluded on both sides. Two streaming passes (corpus cf
    fold, then per-source counts of the broadcast top-k); pair arithmetic
    is sources²×k on the driver. Returns
    ``(source_a, source_b, n_terms, delta)`` for source_a < source_b."""
    cf_tbl = corpus_cf(ds, text_col=text_col)
    cols = ["source_a", "source_b", "n_terms", "delta"]
    if cf_tbl.empty:
        return pd.DataFrame(columns=cols)
    top = (
        cf_tbl.sort_values(["n", "term"], ascending=[False, True], kind="stable")
        .head(k)["term"]
        .to_numpy(dtype=object)
        .astype("U")
    )
    order = np.argsort(top, kind="stable")
    top_sorted = top[order]
    ref = ray.put(top_sorted)

    def partials(batch: pa.Table) -> pa.Table:
        tk = ray.get(ref)
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        src = batch[source_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        su, si = np.unique(src, return_inverse=True)
        ns = len(su)
        out_src, out_idx, out_n = [], [], []
        if codes.size:
            tot = np.bincount(si[rows], minlength=ns).astype(np.int64)
        else:
            tot = np.zeros(ns, np.int64)
        out_src.append(su)
        out_idx.append(np.full(ns, -1, np.int64))
        out_n.append(tot)
        if codes.size:
            dic = dictionary.to_pandas().to_numpy(dtype=object).astype("U")
            pos = np.searchsorted(tk, dic)
            pos = np.where((pos < tk.size) & (tk[np.minimum(pos, tk.size - 1)] == dic), pos, -1)
            tok_pos = pos[codes]
            sel = tok_pos >= 0
            if sel.any():
                key = si[rows[sel]] * tk.size + tok_pos[sel]
                cnt = np.bincount(key, minlength=ns * tk.size)
                nz = np.flatnonzero(cnt)
                out_src.append(su[nz // tk.size])
                out_idx.append((nz % tk.size).astype(np.int64))
                out_n.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "source": pa.array(np.concatenate(out_src), pa.string()),
                "idx": pa.array(np.concatenate(out_idx), pa.int64()),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby(["source", "idx"], sort=True, as_index=False)["n"].sum()
    totals = folded[folded["idx"] == -1].set_index("source")["n"]
    sources = sorted(totals.index)
    ns = len(sources)
    if ns < 2:
        return pd.DataFrame(columns=cols)
    # dense F grid: F[source][term] at 1e9 fixed-point
    fgrid = np.zeros((ns, top_sorted.size), dtype=object)
    counts = {(r.source, int(r.idx)): int(r.n) for r in folded[folded["idx"] >= 0].itertuples()}
    for a, s in enumerate(sources):
        n_tot = int(totals[s])
        for t in range(top_sorted.size):
            n = counts.get((s, t), 0)
            fgrid[a, t] = (2 * n * 1_000_000_000 + n_tot) // (2 * n_tot) if n_tot else 0
    z6 = np.zeros((ns, top_sorted.size), dtype=np.int64)
    keep = []
    import math

    for t in range(top_sorted.size):
        fs = [int(fgrid[a, t]) for a in range(ns)]
        sf = sum(fs)
        sff = sum(x * x for x in fs)
        var_num = ns * sff - sf * sf
        if var_num <= 0:
            continue
        keep.append(t)
        for a in range(ns):
            z = float(ns * fs[a] - sf) / math.sqrt(float(var_num))
            z6[a, t] = int(math.floor(z * 1e6 + 0.5))
    n_terms = len(keep)
    if n_terms == 0:
        return pd.DataFrame(columns=cols)
    rows_out = []
    for a in range(ns):
        for b in range(a + 1, ns):
            sd = sum(abs(int(z6[a, t]) - int(z6[b, t])) for t in keep)
            rows_out.append(
                (sources[a], sources[b], n_terms, ((2 * sd + n_terms) // (2 * n_terms)) / 1e6)
            )
    out = pd.DataFrame(rows_out, columns=cols)
    out["n_terms"] = out["n_terms"].astype(np.int64)
    return out


def stylometry_delta_sql(
    table: str = "documents",
    *,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 30,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH docs AS (SELECT {source_col} AS source, {tok} AS ts FROM {table}),
stok AS (SELECT source, unnest(ts) AS term FROM docs),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM stok GROUP BY term),
topk AS (SELECT term FROM cf ORDER BY n DESC, term LIMIT {k}),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tot FROM stok GROUP BY source),
nst AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS n
  FROM stok WHERE term IN (SELECT term FROM topk) GROUP BY 1, 2
),
grid AS (
  SELECT s.source, t.term, coalesce(x.n, 0) AS n, s.n_tot
  FROM ns s CROSS JOIN topk t LEFT JOIN nst x ON x.source = s.source AND x.term = t.term
),
f AS (
  SELECT source, term,
         (2 * CAST(n AS HUGEINT) * 1000000000 + n_tot) // (2 * CAST(n_tot AS HUGEINT)) AS fv
  FROM grid
),
stats AS (
  SELECT term, CAST(count(*) AS HUGEINT) AS s, sum(fv) AS sf, sum(fv * fv) AS sff
  FROM f GROUP BY term
),
z AS (
  SELECT f.source, f.term,
         CAST(floor(CAST(st.s * f.fv - st.sf AS DOUBLE)
                    / sqrt(CAST(st.s * st.sff - st.sf * st.sf AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS z6
  FROM f JOIN stats st USING (term)
  WHERE st.s * st.sff - st.sf * st.sf > 0
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_terms,
         sum(CAST(abs(a.z6 - b.z6) AS HUGEINT)) AS sd
  FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_terms,
       CAST((2 * sd + n_terms) // (2 * CAST(n_terms AS HUGEINT)) AS DOUBLE) / 1e6 AS delta
FROM pairs ORDER BY source_a, source_b
""".strip()


def vocab_coverage(
    ds,
    *,
    text_col: str = "text",
    ks: tuple[int, ...] = (10, 100, 1000, 10000),
) -> pd.DataFrame:
    """Vocabulary coverage curve: the fraction of all corpus tokens covered
    by the top-k most frequent terms, for each k — the number that sizes a
    tokenizer/stopword list (how big must the vocab be to cover 99%?).
    One cf partial fold; coverage is an exact integer ratio fixed-pointed
    at 1e6. Top-k ties at the boundary are broken by term ascending on
    both sides. Returns ``(k, n_terms, covered, total, coverage)``."""
    cf_tbl = corpus_cf(ds, text_col=text_col)
    cols = ["k", "n_terms", "covered", "total", "coverage"]
    if cf_tbl.empty:
        return pd.DataFrame(columns=cols)
    srt = cf_tbl.sort_values(["n", "term"], ascending=[False, True], kind="stable")
    cf = srt["n"].to_numpy(np.int64)
    total = int(cf.sum())
    cum = np.cumsum(cf)
    rows = []
    for k in ks:
        kk = min(k, cf.size)
        covered = int(cum[kk - 1]) if kk else 0
        rows.append(
            (
                int(k),
                int(kk),
                covered,
                total,
                float(np.floor(covered * 1e6 / total + 0.5) / 1e6) if total else 0.0,
            )
        )
    out = pd.DataFrame(rows, columns=cols)
    for c in ("k", "n_terms", "covered", "total"):
        out[c] = out[c].astype(np.int64)
    return out


def vocab_coverage_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    ks: tuple[int, ...] = (10, 100, 1000, 10000),
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    klist = ", ".join(str(k) for k in ks)
    return f"""
WITH cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(ts) AS term FROM (SELECT {tok} AS ts FROM {table}))
  GROUP BY term
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rn,
         sum(n) OVER (ORDER BY n DESC, term) AS cum
  FROM cf
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS nv FROM cf),
ks AS (SELECT unnest([{klist}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(least(ks.k, t.nv) AS BIGINT) AS n_terms,
       CAST(coalesce((SELECT max(cum) FROM ranked r WHERE r.rn <= ks.k), 0) AS BIGINT) AS covered,
       t.total,
       CASE WHEN t.total = 0 THEN 0.0
            ELSE floor(coalesce((SELECT max(cum) FROM ranked r WHERE r.rn <= ks.k), 0)
                       * 1e6 / t.total + 0.5) / 1e6 END AS coverage
FROM ks CROSS JOIN tot t ORDER BY k
""".strip()


def heaps_law(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    points: int = 64,
) -> pd.DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) = K·n^β, estimated as the
    OLS line of ln(cumulative distinct terms) against ln(cumulative tokens)
    sampled at ``points`` evenly-spaced document checkpoints in ``id_col``
    order. Natural corpora sit near β ≈ 0.5; templated/synthetic text runs
    flat (tiny β) — the companion diagnostic to ``zipf_slope`` and the
    number that forecasts tokenizer-vocab size at 1000× the corpus.

    One streaming pass emits two vocabulary/doc-bounded partials per batch:
    (term → min doc id) and (doc id → token count); the driver fold is
    O(vocab + n_docs) like ``corpus_cf`` (beyond driver memory the fold
    becomes the index build's bucketed filesystem partitioning). Each ln is
    nano-quantized BEFORE the sums (zipf_slope discipline), so numerator and
    denominator are exact integers on both sides. Checkpoints are positions
    ``pos % stride == 0`` plus the last doc, ``stride = ceil(n_docs/points)``.
    Returns one row ``(n_docs, n_points, beta, ln_k)`` (rounded 6).

    Reference analog: harvester fits corpus vectorizers for collection
    statistics (`/root/reference/harvester/core/analysis/text.py:45-71`);
    vocabulary-growth forecasting is the scale-planning view of the same
    statistic."""

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        nv = len(dictionary)
        fid = np.full(nv, np.iinfo(np.int64).max, np.int64)
        if codes.size:
            np.minimum.at(fid, codes, ids[rows])
        dlen = np.bincount(rows, minlength=len(batch)).astype(np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        return pa.table(
            {
                "term": pa.array(
                    np.append(terms, np.full(len(batch), None, object)), pa.string()
                ),
                "id": pa.array(np.append(fid, ids), pa.int64()),
                "n": pa.array(np.append(np.zeros(nv, np.int64), dlen), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    cols = ["n_docs", "n_points", "beta", "ln_k"]
    if not parts:
        return pd.DataFrame(columns=cols)
    allp = pd.concat(parts, ignore_index=True)
    vocab = allp[allp["term"].notna()].groupby("term", sort=False, as_index=False)["id"].min()
    docs = (
        allp[allp["term"].isna()][["id", "n"]]
        .groupby("id", sort=True, as_index=False)["n"]
        .sum()
    )
    n_docs = int(len(docs))
    if n_docs == 0:
        return pd.DataFrame(columns=cols)
    doc_ids = docs["id"].to_numpy(np.int64)
    cum_tok = np.cumsum(docs["n"].to_numpy(np.int64))
    # new-vocab count per doc position (1-based), cumulative
    fpos = np.searchsorted(doc_ids, vocab["id"].to_numpy(np.int64))
    cum_vocab = np.cumsum(np.bincount(fpos, minlength=n_docs).astype(np.int64))
    stride = max(1, -(-n_docs // points))
    pos = np.arange(1, n_docs + 1, dtype=np.int64)
    mask = ((pos % stride == 0) | (pos == n_docs)) & (cum_tok > 0) & (cum_vocab > 0)
    ct, cv = cum_tok[mask], cum_vocab[mask]
    n = int(ct.size)
    if n == 0:
        return pd.DataFrame(
            {"n_docs": np.array([n_docs], np.int64), "n_points": np.array([0], np.int64),
             "beta": [None], "ln_k": [None]}
        )
    x = np.floor(np.log(ct.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    y = np.floor(np.log(cv.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    sxx = sum(int(a) * int(a) for a in x)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    if den == 0:
        beta = None
        ln_k = None
    else:
        beta = round(float(num) / float(den), 6) + 0.0
        ln_k = round(
            (float(sy) / 1e9 - (float(num) / float(den)) * (float(sx) / 1e9)) / n, 6
        ) + 0.0
    return pd.DataFrame(
        {
            "n_docs": np.array([n_docs], np.int64),
            "n_points": np.array([n], np.int64),
            "beta": [beta],
            "ln_k": [ln_k],
        }
    )


def heaps_law_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    points: int = 64,
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS id, {tok} AS ts FROM {table}),
dl AS (SELECT id, CAST(len(ts) AS BIGINT) AS nt FROM toks),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              greatest(1, (CAST(count(*) AS BIGINT) + {points} - 1) // {points}) AS stride
       FROM dl),
ord AS (SELECT id, row_number() OVER (ORDER BY id) AS pos,
               sum(nt) OVER (ORDER BY id) AS cumtok
        FROM dl),
firsts AS (
  SELECT term, min(id) AS fid
  FROM (SELECT id, unnest(ts) AS term FROM toks) GROUP BY term
),
newv AS (SELECT fid AS id, CAST(count(*) AS BIGINT) AS nv FROM firsts GROUP BY fid),
cum AS (
  SELECT o.pos, o.cumtok,
         sum(coalesce(v.nv, 0)) OVER (ORDER BY o.pos) AS cumvocab
  FROM ord o LEFT JOIN newv v ON v.id = o.id
),
cps AS (
  SELECT CAST(floor(ln(CAST(cumtok AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS x,
         CAST(floor(ln(CAST(cumvocab AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS y
  FROM cum, nd
  WHERE (pos % nd.stride = 0 OR pos = nd.n_docs) AND cumtok > 0 AND cumvocab > 0
),
agg AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM cps
)
SELECT (SELECT n_docs FROM nd) AS n_docs,
       CAST(n AS BIGINT) AS n_points,
       CASE WHEN n = 0 OR n * sxx - sx * sx = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0
       END AS beta,
       CASE WHEN n = 0 OR n * sxx - sx * sx = 0 THEN NULL
            ELSE round((CAST(sy AS DOUBLE) / 1e9
                        - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
                          * (CAST(sx AS DOUBLE) / 1e9))
                       / CAST(n AS DOUBLE), 6) + 0.0
       END AS ln_k
FROM agg
""".strip()


def bigram_logprob(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Bigram-LM quality score per document (the KenLM-order-2 sibling of
    unigram_logprob, with the corpus as the model): add-one-smoothed
    conditional ``p(w2|w1) = (c(w1,w2)+1) / (c1(w1)+V)`` over each doc's
    adjacent-token bigrams, ``logprob = Σ ln p``. Repetitive boilerplate
    scores high, token soup scores low — a sharper repetition signal than
    unigram typicality.

    Same oracle-exact float discipline as unigram_logprob: each distinct
    BIGRAM's ln is quantized once to nano-fixed-point; per-doc totals are
    integer sums. One corpus pass emits unigram AND bigram partial counts
    (keys "w" / "w1 w2" — tokens never contain spaces), so V and c1 both
    derive from a single fold; the model broadcasts as sorted numpy arrays.
    Returns (doc_id, n_bigrams, logprob, lp_per_bigram) rounded to 6."""

    def _batch_bigrams(batch):
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        terms = dictionary.to_pandas().to_numpy(dtype=object).astype("U")
        if codes.size < 2:
            return rows, codes, terms, np.zeros(0, np.intp)
        same = rows[1:] == rows[:-1]
        left = np.flatnonzero(same)  # flat index of each bigram's first token
        return rows, codes, terms, left

    def count_pass(batch: pa.Table) -> pa.Table:
        rows, codes, terms, left = _batch_bigrams(batch)
        uni = np.bincount(codes, minlength=terms.size).astype(np.int64)
        keys = list(terms[uni > 0])
        ns = list(uni[uni > 0])
        if left.size:
            bg = np.char.add(np.char.add(terms[codes[left]], " "),
                             terms[codes[left + 1]])
            u, c = np.unique(bg, return_counts=True)
            keys += list(u)
            ns += list(c.astype(np.int64))
        return pa.table({
            "term": pa.array(keys, pa.string()),
            "n": pa.array(np.asarray(ns, np.int64), pa.int64()),
        })

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            count_pass, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    folded = _fold_partials(parts)
    is_bigram = folded["term"].str.contains(" ")
    v_total = int((~is_bigram).sum())
    bt = folded[is_bigram]
    bkeys = bt["term"].to_numpy(dtype=object).astype("U")
    cb = bt["n"].to_numpy(np.int64)
    w1 = np.array([k.split(" ")[0] for k in bkeys], dtype="U")
    c1_df = pd.DataFrame({"w1": w1, "n": cb}).groupby("w1")["n"].sum()
    c1 = c1_df.reindex(pd.Index(w1)).to_numpy(np.int64)
    order = np.argsort(bkeys, kind="stable")
    lp_nano = np.floor(
        np.log((cb[order] + 1).astype(np.float64)
               / (c1[order] + v_total).astype(np.float64)) * 1e9 + 0.5
    ).astype(np.int64)
    ref = ray.put((bkeys[order], lp_nano))

    def score(batch: pa.Table) -> pa.Table:
        keys_sorted, lp_sorted = ray.get(ref)
        rows, codes, terms, left = _batch_bigrams(batch)
        n = batch.num_rows
        doc_ids = batch[id_col].combine_chunks()
        nb = np.zeros(n, np.int64)
        totals = np.zeros(n, np.int64)
        if left.size:
            bg = np.char.add(np.char.add(terms[codes[left]], " "),
                             terms[codes[left + 1]])
            pos = np.searchsorted(keys_sorted, bg)
            lp = lp_sorted[np.clip(pos, 0, max(keys_sorted.size - 1, 0))]
            brows = rows[left]
            nb = np.bincount(brows, minlength=n).astype(np.int64)
            np.add.at(totals, brows, lp)
        lp_f = totals / 1e9
        per_bg = np.divide(lp_f, nb, out=np.zeros(n, np.float64), where=nb > 0)
        return pa.table({
            "doc_id": doc_ids,
            "n_bigrams": pa.array(nb, pa.int64()),
            "logprob": pa.array(np.round(lp_f, 6) + 0.0, pa.float64()),
            "lp_per_bigram": pa.array(np.round(per_bg, 6) + 0.0, pa.float64()),
        })

    out = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cols = ["doc_id", "n_bigrams", "logprob", "lp_per_bigram"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values("doc_id").reset_index(drop=True)[cols]


def bigram_logprob_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
pos AS (SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS i
        FROM toks),
big AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c) AS c1 FROM cb GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM pos),
lp AS (
  SELECT cb.w1, cb.w2,
         CAST(floor(ln((cb.c + 1) * 1.0 / (c1.c1 + v.v)) * 1e9 + 0.5)
              AS BIGINT) AS lp_nano
  FROM cb JOIN c1 USING (w1) CROSS JOIN v
),
per_doc AS (
  SELECT big.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         sum(lp.lp_nano) AS total_nano
  FROM big JOIN lp ON big.w1 = lp.w1 AND big.w2 = lp.w2
  GROUP BY big.doc_id
)
SELECT t.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       round(coalesce(p.total_nano, 0) / 1e9, 6) + 0.0 AS logprob,
       CASE WHEN coalesce(p.n_bigrams, 0) = 0 THEN 0.0
            ELSE round((p.total_nano / 1e9) / p.n_bigrams, 6) + 0.0 END
         AS lp_per_bigram
FROM (SELECT doc_id FROM toks) t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
""".strip()


def doremi_weights(
    ds,
    *,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """DoReMi-lite domain reweighting (Xie et al. 2023's intuition with the
    corpus's own unigram LM as the reference model): a domain whose
    per-token NLL EXCEEDS the corpus average is underfit/harder and gets
    upweighted proportionally to its excess loss —
    ``weight_d ∝ max(0, nll_d − nll_corpus)`` — the one-shot analog of
    DoReMi's Group-DRO update. Domains at or below the average get weight
    0 (drop-from-reweighting, not drop-from-corpus). Complements
    ``dsir_weights`` (per-DOC importance) with per-DOMAIN mixture weights
    for ``ops/sampling.source_mixture``.

    Scale shape: the per-doc integer scores stream out of
    ``unigram_nano_scores``; the per-domain fold is a driver-side sum over
    domain-cardinality partials (the vocabulary-fold rule). Exactness: NLL
    means are integer nano floor-divisions; the only float op is the final
    weight normalization, one mirrored division quantized to
    ``floor(x·1e6+0.5)/1e6``. Returns
    ``(domain, n_docs, n_tokens, mean_nll, weight)``."""
    scored = unigram_nano_scores(
        ds, id_col=id_col, text_col=text_col, keep_cols=(domain_col,)
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = (
            batch.select([domain_col, "n_tokens", "total_nano"])
            .group_by(domain_col)
            .aggregate(
                [("n_tokens", "count"), ("n_tokens", "sum"), ("total_nano", "sum")]
            )
        )
        return pa.table(
            {
                "domain": agg[domain_col],
                "n_docs": agg["n_tokens_count"].cast(pa.int64()),
                "n_tokens": agg["n_tokens_sum"].cast(pa.int64()),
                "total_nano": agg["total_nano_sum"].cast(pa.int64()),
            }
        )

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = ["domain", "n_docs", "n_tokens", "mean_nll", "weight"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    fold = parts.groupby("domain", as_index=False).sum()
    tok = fold["n_tokens"].to_numpy(np.int64)
    tot = fold["total_nano"].to_numpy(np.int64)
    # per-domain and corpus mean NLL at nano precision (exact integers)
    nll = np.where(tok > 0, (-tot) // np.maximum(tok, 1), 0)
    base = (-int(tot.sum())) // max(int(tok.sum()), 1)
    excess = np.maximum(nll - base, 0)
    tot_excess = int(excess.sum())
    w = (
        np.floor(excess / tot_excess * 1e6 + 0.5) / 1e6
        if tot_excess > 0
        else np.zeros(len(fold), np.float64)
    )
    out = pd.DataFrame(
        {
            "domain": fold["domain"],
            "n_docs": fold["n_docs"].astype(np.int64),
            "n_tokens": tok,
            "mean_nll": ((nll + 500) // 1000) / 1e6,
            "weight": w,
        }
    )
    return out.sort_values("domain").reset_index(drop=True)[cols]


def doremi_weights_sql(
    table: str = "documents",
    *,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: the unigram_logprob_sql chain grouped by domain, the same
    integer floor-division means and one mirrored normalization."""
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {domain_col} AS domain, {tok} AS ts FROM {table}
),
flat AS (SELECT doc_id, domain, unnest(ts) AS term FROM toks),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM flat GROUP BY 1),
u AS (SELECT CAST(count(*) AS BIGINT) AS u FROM flat),
lp AS (
  SELECT term,
         CAST(floor(ln(cf * 1.0 / u.u) * 1e9 + 0.5) AS BIGINT) AS lp_nano
  FROM cf CROSS JOIN u
),
per_doc AS (
  SELECT f.doc_id, f.domain,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(lp.lp_nano) AS total_nano
  FROM flat f JOIN lp USING (term) GROUP BY f.doc_id, f.domain
),
all_docs AS (
  SELECT t.doc_id, t.domain,
         coalesce(p.n_tokens, 0) AS n_tokens,
         coalesce(p.total_nano, 0) AS total_nano
  FROM toks t LEFT JOIN per_doc p USING (doc_id)
),
dom AS (
  SELECT domain,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         CAST(sum(total_nano) AS BIGINT) AS total_nano
  FROM all_docs GROUP BY domain
),
base AS (
  SELECT (-CAST(sum(total_nano) AS BIGINT)) // greatest(CAST(sum(n_tokens) AS BIGINT), 1) AS b
  FROM dom
),
ex AS (
  SELECT domain, n_docs, n_tokens,
         CASE WHEN n_tokens > 0 THEN (-total_nano) // n_tokens ELSE CAST(0 AS BIGINT) END AS nll,
         greatest(CASE WHEN n_tokens > 0 THEN (-total_nano) // n_tokens ELSE CAST(0 AS BIGINT) END
                  - (SELECT b FROM base), 0) AS excess
  FROM dom
),
tot AS (SELECT CAST(sum(excess) AS BIGINT) AS te FROM ex)
SELECT domain, n_docs, n_tokens,
       CAST((nll + 500) // 1000 AS BIGINT) / 1000000.0 AS mean_nll,
       CASE WHEN (SELECT te FROM tot) > 0
            THEN floor(excess / (SELECT te FROM tot) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS weight
FROM ex
ORDER BY domain
""".strip()

