"""Corpus-pair similarity: exact shingle-set Jaccard between sources.

The reference ships a corpus-comparison stage that fits vectorizer corpus
stats to judge how alike two collections are
(`/root/reference/harvester/core/processors/compare.py`); the
training-data version of that question is "how much n-gram mass do two
sources/snapshots share?" — used to spot mirrored sites, re-crawls and
licensing overlap before near-dup dedup is even run. This operator
computes the exact Jaccard similarity of the distinct-shingle sets of
every source pair.

Scale shape is `ops/dupgrams.py`'s: ONE all-to-all of distinct
``(shingle_hash, source)`` pairs into coarse hash buckets (never the
text), so each bucket holds every occurrence of its shingles and
contributes exact partial counts — per-source distinct-shingle totals and
per-pair intersection counts — enumerated with the closed-form triangle
decode (`ops/dedup.py:_group_pairs`, no per-group Python). Partials are
``O(sources² × buckets)`` rows, folded on the driver. 64-bit shingle
collisions are the standard accepted error vs the string-equality oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer
from .dedup import _batch_shingles, _dedup_doc_shingles, _group_pairs


def source_jaccard(
    ds,
    *,
    key: str = "source",
    text_col: str = "text",
    shingle_n: int = 5,
    n_partitions: int = 64,
) -> pd.DataFrame:
    """Exact Jaccard between the distinct-shingle sets of every pair of
    ``key`` values. Returns ``(source_a, source_b, n_a, n_b, n_common,
    jaccard)`` for intersecting pairs only, jaccard rounded to 6 decimals
    (CLAUDE.md ratio rule); pair order is lexicographic ``a < b``."""

    def explode(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        src = batch[key].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        sh_doc, sh_h = _dedup_doc_shingles(*_batch_shingles(text, shingle_n))
        s = src[sh_doc]
        # batch-local distinct (hash, source)
        uniq, inv = np.unique(s, return_inverse=True)
        order = np.lexsort((inv, sh_h))
        h, si = sh_h[order], inv[order]
        keep = np.ones(h.size, bool)
        keep[1:] = (h[1:] != h[:-1]) | (si[1:] != si[:-1])
        h, si = h[keep], si[keep]
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "src": pa.array(uniq[si], pa.string()),
                "bucket": pa.array((h % np.uint64(n_partitions)).astype(np.int32)),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_partials(group: pd.DataFrame) -> pa.Table:
        h = group["h"].to_numpy()
        srcs, si = np.unique(group["src"].to_numpy(), return_inverse=True)
        # cross-batch distinct (hash, source) inside the bucket
        order = np.lexsort((si, h))
        h, si = h[order], si[order]
        keep = np.ones(h.size, bool)
        keep[1:] = (h[1:] != h[:-1]) | (si[1:] != si[:-1])
        h, si = h[keep], si[keep]
        # per-source distinct totals
        tot = np.bincount(si, minlength=srcs.size).astype(np.int64)
        # per-shingle runs → all source pairs (si sorted ascending inside a run)
        starts = np.ones(h.size, bool)
        starts[1:] = h[1:] != h[:-1]
        run_id = np.cumsum(starts) - 1
        counts = np.bincount(run_id)
        i, j = _group_pairs(counts)
        pa_i, pa_j = si[i], si[j]
        pair_code = pa_i.astype(np.int64) * srcs.size + pa_j
        codes, ccnt = np.unique(pair_code, return_counts=True)
        out_a = np.concatenate([codes // srcs.size, np.arange(srcs.size)])
        out_b = np.concatenate([codes % srcs.size, np.full(srcs.size, -1)])
        out_n = np.concatenate([ccnt.astype(np.int64), tot])
        return pa.table(
            {
                "source_a": pa.array(srcs[out_a], pa.string()),
                # kind rows: source_b = "" marks a per-source total partial
                "source_b": pa.array(
                    np.where(out_b >= 0, srcs[np.maximum(out_b, 0)], ""), pa.string()
                ),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    parts = (
        pairs.groupby("bucket")
        .map_groups(bucket_partials, batch_format="pandas")
        .to_pandas()  # O(sources² × buckets) rows — driver fold like pagerank
    )
    totals: dict[str, int] = {}
    inter: dict[tuple[str, str], int] = {}
    for sa, sb, n in parts.itertuples(index=False):
        if sb == "":
            totals[sa] = totals.get(sa, 0) + int(n)
        else:
            inter[(sa, sb)] = inter.get((sa, sb), 0) + int(n)
    rows = []
    for (sa, sb), c in sorted(inter.items()):
        na, nb = totals[sa], totals[sb]
        rows.append(
            {
                "source_a": sa,
                "source_b": sb,
                "n_a": na,
                "n_b": nb,
                "n_common": c,
                "jaccard": round(c / (na + nb - c), 6),
            }
        )
    return pd.DataFrame(
        rows, columns=["source_a", "source_b", "n_a", "n_b", "n_common", "jaccard"]
    )


def source_jaccard_sql(
    table: str = "documents",
    *,
    key: str = "source",
    text_col: str = "text",
    shingle_n: int = 5,
) -> str:
    """Oracle: identical semantics by shingle *string* equality."""
    tok = analyzer.sql_tokenize_expr(text_col)
    n = shingle_n
    return f"""
WITH toks AS (
  SELECT {key} AS src, {tok} AS ts FROM {table}
),
sh0 AS (
  SELECT src,
         CASE WHEN len(ts) = 0 THEN []
              WHEN len(ts) < {n} THEN [array_to_string(ts, ' ')]
              ELSE list_distinct([array_to_string(ts[i : i + {n} - 1], ' ')
                                 for i in range(1, len(ts) - {n} + 2)])
         END AS shingles
  FROM toks
),
sh AS (SELECT DISTINCT src, unnest(shingles) AS s FROM sh0),
counts AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY src),
inter AS (
  SELECT a.src AS source_a, b.src AS source_b, CAST(count(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT i.source_a, i.source_b, ca.n AS n_a, cb.n AS n_b, i.n_common,
       round(i.n_common * 1.0 / (ca.n + cb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN counts ca ON ca.src = i.source_a
JOIN counts cb ON cb.src = i.source_b
ORDER BY source_a, source_b
""".strip()


def source_kl(
    ds,
    *,
    key: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """KL divergence D(P_source ‖ P_corpus) of each source's unigram
    distribution from the whole corpus's — the information-theoretic
    member of the corpus-comparison family (`source_jaccard` measures set
    overlap; this measures distributional drift, the signal used to spot
    a source whose content shifted between crawls).

    One streaming pass emits per-batch (source, term, cf) partials
    (vocabulary-bounded, folded once — same shape as `ops/keywords.py`);
    every per-term contribution ``cf_s/U_s · ln((cf_s/U_s)/(cf_c/U_c))``
    is computed from exact integer counts and quantized to nano units
    BEFORE the cross-term sum, so the engine's fold order cannot change
    the result and DuckDB reproduces it bit-for-bit. Returns
    ``(source, n_tokens, kl)`` (kl rounded to 6, nats), sorted by source.
    """
    import numpy as np
    import pandas as pd

    from .. import analyzer

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        src = batch[key].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        tok_src, si = np.unique(src[rows], return_inverse=True) if rows.size else (np.array([], object), np.zeros(0, np.int64))
        code = si.astype(np.int64) * max(len(dictionary), 1) + codes
        cu, cn = np.unique(code, return_counts=True)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        return pa.table(
            {
                "src": pa.array(tok_src[(cu // max(len(dictionary), 1)).astype(np.int64)], pa.string()),
                "term": pa.array(terms[(cu % max(len(dictionary), 1)).astype(np.int64)], pa.string()),
                "cf": pa.array(cn.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["source", "n_tokens", "kl"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["src", "term"], sort=False, as_index=False)["cf"]
        .sum()
    )
    corpus = folded.groupby("term", sort=False, as_index=False)["cf"].sum()
    u_c = int(corpus["cf"].sum())
    cf_c = dict(zip(corpus["term"], corpus["cf"]))
    u_s = folded.groupby("src", sort=True)["cf"].sum()
    rows_out = []
    for src_name, us in u_s.items():
        sub = folded[folded["src"] == src_name]
        us = int(us)
        # per-term contribution, nano-quantized BEFORE summation — identical
        # expression to the oracle: (cf_s/U_s)·ln((cf_s·U_c)/(cf_c·U_s))
        total = 0
        for term, cf_s in zip(sub["term"], sub["cf"]):
            cf_s = int(cf_s)
            contrib = (cf_s / us) * float(np.log((cf_s * u_c) / (cf_c[term] * us)))
            total += int(np.floor(contrib * 1e9 + 0.5))
        rows_out.append((src_name, us, round(total / 1e9, 6) + 0.0))
    return pd.DataFrame(rows_out, columns=cols)


def source_kl_sql(
    table: str = "documents",
    *,
    key: str = "source",
    text_col: str = "text",
) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {key} AS src, {tok} AS ts FROM {table}),
flat AS (SELECT src, unnest(ts) AS term FROM toks),
sc AS (SELECT src, term, CAST(count(*) AS BIGINT) AS cf_s FROM flat GROUP BY 1, 2),
cc AS (SELECT term, CAST(count(*) AS BIGINT) AS cf_c FROM flat GROUP BY 1),
us AS (SELECT src, CAST(count(*) AS BIGINT) AS u_s FROM flat GROUP BY 1),
uc AS (SELECT CAST(count(*) AS BIGINT) AS u_c FROM flat),
contrib AS (
  SELECT sc.src,
         CAST(floor((sc.cf_s * 1.0 / us.u_s)
                    * ln((sc.cf_s * uc.u_c) * 1.0 / (cc.cf_c * us.u_s))
                    * 1e9 + 0.5) AS BIGINT) AS nano
  FROM sc JOIN cc USING (term) JOIN us USING (src) CROSS JOIN uc
)
SELECT us.src AS source, us.u_s AS n_tokens,
       round(coalesce(sum(contrib.nano), 0) / 1e9, 6) + 0.0 AS kl
FROM us LEFT JOIN contrib ON contrib.src = us.src
GROUP BY us.src, us.u_s ORDER BY us.src
""".strip()


def source_profile(
    ds,
    *,
    key: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Per-source corpus profile: document/token counts, distinct
    vocabulary size, and mean token length — the at-a-glance table a
    curation run prints before deciding per-source sampling rates
    (`ops/sampling.py`). One streaming pass of per-batch partials:
    distinct (source, term) pairs carry the vocabulary (bounded by true
    vocab × sources), integer token/char totals carry the rest. Returns
    ``(source, n_docs, n_tokens, vocab, avg_token_len)`` (len rounded 6),
    sorted by source."""
    import numpy as np
    import pandas as pd

    from .. import analyzer

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        src = batch[key].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        tok_lens = np.char.str_len(terms.astype("U")).astype(np.int64)
        su, si_all = np.unique(src, return_inverse=True)
        ns = su.size
        n_docs = np.bincount(si_all, minlength=ns).astype(np.int64)
        if rows.size:
            si = si_all[rows]
            n_tok = np.bincount(si, minlength=ns).astype(np.int64)
            n_chars = np.bincount(si, weights=tok_lens[codes], minlength=ns).astype(np.int64)
            pair = np.unique(si.astype(np.int64) * max(len(terms), 1) + codes)
            p_src = (pair // max(len(terms), 1)).astype(np.int64)
            p_term = terms[(pair % max(len(terms), 1)).astype(np.int64)]
        else:
            n_tok = np.zeros(ns, np.int64)
            n_chars = np.zeros(ns, np.int64)
            p_src = np.empty(0, np.int64)
            p_term = np.empty(0, object)
        # two row kinds: per-source totals (term="") + distinct pairs
        return pa.table(
            {
                "src": pa.array(np.concatenate([su, su[p_src]]), pa.string()),
                "term": pa.array(
                    np.concatenate([np.full(ns, "", object), p_term]), pa.string()
                ),
                "n_docs": pa.array(np.concatenate([n_docs, np.zeros(p_src.size, np.int64)]), pa.int64()),
                "n_tok": pa.array(np.concatenate([n_tok, np.zeros(p_src.size, np.int64)]), pa.int64()),
                "n_chars": pa.array(np.concatenate([n_chars, np.zeros(p_src.size, np.int64)]), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["source", "n_docs", "n_tokens", "vocab", "avg_token_len"]
    if not parts:
        return pd.DataFrame(columns=cols)
    df = pd.concat(parts, ignore_index=True)
    tot = (
        df[df["term"] == ""]
        .groupby("src", sort=True, as_index=False)[["n_docs", "n_tok", "n_chars"]]
        .sum()
    )
    vocab = (
        df[df["term"] != ""][["src", "term"]]
        .drop_duplicates()
        .groupby("src", sort=True)
        .size()
    )
    tot["vocab"] = tot["src"].map(vocab).fillna(0).astype(np.int64)
    tot["avg_token_len"] = [
        round(c / t, 6) + 0.0 if t else 0.0
        for c, t in zip(tot["n_chars"], tot["n_tok"])
    ]
    out = tot.rename(columns={"src": "source", "n_tok": "n_tokens"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out[cols].reset_index(drop=True)


def source_profile_sql(
    table: str = "documents",
    *,
    key: str = "source",
    text_col: str = "text",
) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {key} AS src, {tok} AS ts FROM {table}),
flat AS (SELECT src, unnest(ts) AS term FROM toks),
tot AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(len(term)) AS BIGINT) AS n_chars,
         CAST(count(DISTINCT term) AS BIGINT) AS vocab
  FROM flat GROUP BY src
),
docs AS (SELECT src, CAST(count(*) AS BIGINT) AS n_docs FROM toks GROUP BY src)
SELECT d.src AS source, d.n_docs,
       coalesce(t.n_tokens, 0) AS n_tokens,
       coalesce(t.vocab, 0) AS vocab,
       CASE WHEN coalesce(t.n_tokens, 0) = 0 THEN 0.0
            ELSE round(t.n_chars * 1.0 / t.n_tokens, 6) + 0.0 END AS avg_token_len
FROM docs d LEFT JOIN tot t USING (src) ORDER BY source
""".strip()


def hapax_rate(
    ds,
    *,
    key: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Hapax-legomena rate per source: the share of each source's
    vocabulary that occurs exactly once — high hapax = fresh/noisy text,
    low hapax = templated boilerplate (a classic curation signal next to
    [[repetition]] metrics). Reuses the per-(source, term) cf partial fold
    of ``source_kl``. Rate is fixed-point /1e6. Returns
    ``(source, vocab, hapax, rate)`` sorted by source."""
    import numpy as np
    import pandas as pd

    from .. import analyzer

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        src = batch[key].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        if rows.size == 0:
            return pa.table(
                {"src": pa.array([], pa.string()), "term": pa.array([], pa.string()), "cf": pa.array([], pa.int64())}
            )
        su, si = np.unique(src[rows], return_inverse=True)
        code = si.astype(np.int64) * max(len(dictionary), 1) + codes
        cu, cn = np.unique(code, return_counts=True)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        return pa.table(
            {
                "src": pa.array(su[(cu // max(len(dictionary), 1)).astype(np.int64)], pa.string()),
                "term": pa.array(terms[(cu % max(len(dictionary), 1)).astype(np.int64)], pa.string()),
                "cf": pa.array(cn.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["source", "vocab", "hapax", "rate"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["src", "term"], sort=False, as_index=False)["cf"]
        .sum()
    )
    g = folded.groupby("src", sort=True)
    vocab = g.size()
    hapax = g["cf"].apply(lambda s: int((s == 1).sum()))
    out = pd.DataFrame(
        {
            "source": vocab.index.to_numpy(),
            "vocab": vocab.to_numpy(np.int64),
            "hapax": hapax.to_numpy(np.int64),
        }
    )
    out["rate"] = [
        float(np.floor(h * 1e6 / v + 0.5) / 1e6) if v else 0.0
        for h, v in zip(out["hapax"], out["vocab"])
    ]
    return out[cols].reset_index(drop=True)


def hapax_rate_sql(
    table: str = "documents",
    *,
    key: str = "source",
    text_col: str = "text",
) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {key} AS src, {tok} AS ts FROM {table}),
flat AS (SELECT src, unnest(ts) AS term FROM toks),
cf AS (SELECT src, term, count(*) AS c FROM flat GROUP BY 1, 2)
SELECT src AS source,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(count(*) FILTER (c = 1) AS BIGINT) AS hapax,
       floor(count(*) FILTER (c = 1) * 1e6 / count(*) + 0.5) / 1e6 AS rate
FROM cf GROUP BY src ORDER BY source
""".strip()


def ks_statistic(
    ds,
    *,
    key: str = "source",
    value_col: str = "n_chars",
    label_a: str = "src0",
    label_b: str = "src1",
) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between two sources'
    ``value_col`` distributions — the distribution-drift test that
    completes the corpus-comparison family (source_jaccard: set overlap;
    source_kl: unigram drift; this: numeric-column drift).

    D = max over observed values of |ECDF_a − ECDF_b|. ECDFs are exact
    integer step functions (cum counts over the merged sorted values), so
    D is an exact rational cumA·nB − cumB·nA over nA·nB — compared and
    emitted in integer space; only the final ratio is fixed-point /1e6.
    The two samples are a filtered two-group column pull (same bound as
    mann_whitney_u). Returns one row ``(n_a, n_b, d_num, ks)`` where
    ``d_num = max|cumA·nB − cumB·nA|`` (exact integer) and
    ks = d_num/(nA·nB)."""
    import numpy as np
    import pandas as pd

    vals = (
        ds.filter(expr=f"{key} == '{label_a}' or {key} == '{label_b}'")
        .select_columns([key, value_col])
        .to_pandas()
    )
    cols = ["n_a", "n_b", "d_num", "ks"]
    if vals.empty:
        return pd.DataFrame(columns=cols)
    v = vals[value_col].to_numpy(np.int64)
    is_a = (vals[key] == label_a).to_numpy()
    order = np.argsort(v, kind="stable")
    v_s, a_s = v[order], is_a[order]
    cum_a = np.cumsum(a_s.astype(np.int64))
    cum_b = np.cumsum((~a_s).astype(np.int64))
    # evaluate at run ends (last index of each distinct value)
    last = np.ones(v_s.size, bool)
    last[:-1] = v_s[1:] != v_s[:-1]
    n_a, n_b = int(cum_a[-1]), int(cum_b[-1])
    d_num = int(np.abs(cum_a[last] * n_b - cum_b[last] * n_a).max()) if n_a and n_b else 0
    ks = float(np.floor(d_num * 1e6 / (n_a * n_b) + 0.5) / 1e6) if n_a and n_b else 0.0
    return pd.DataFrame(
        {
            "n_a": np.array([n_a], np.int64),
            "n_b": np.array([n_b], np.int64),
            "d_num": np.array([d_num], np.int64),
            "ks": [ks],
        }
    )


def ks_statistic_sql(
    table: str = "documents",
    *,
    key: str = "source",
    value_col: str = "n_chars",
    label_a: str = "src0",
    label_b: str = "src1",
) -> str:
    return f"""
WITH sub AS (
  SELECT {key} AS g, {value_col} AS v FROM {table}
  WHERE {key} IN ('{label_a}', '{label_b}')
),
tot AS (
  SELECT CAST(count(*) FILTER (g = '{label_a}') AS BIGINT) AS n_a,
         CAST(count(*) FILTER (g = '{label_b}') AS BIGINT) AS n_b
  FROM sub
),
steps AS (
  SELECT v,
         CAST(count(*) FILTER (g = '{label_a}') AS BIGINT) AS ca,
         CAST(count(*) FILTER (g = '{label_b}') AS BIGINT) AS cb
  FROM sub GROUP BY v
),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
         sum(cb) OVER (ORDER BY v) AS cum_b
  FROM steps
),
d AS (
  SELECT CAST(max(abs(cum_a * t.n_b - cum_b * t.n_a)) AS BIGINT) AS d_num
  FROM ecdf CROSS JOIN tot t
)
SELECT t.n_a, t.n_b, d.d_num,
       CASE WHEN t.n_a = 0 OR t.n_b = 0 THEN 0.0
            ELSE floor(d.d_num * 1e6 / (t.n_a * t.n_b) + 0.5) / 1e6 END AS ks
FROM d CROSS JOIN tot t
""".strip()


def keyness_llr(
    ds,
    *,
    target_lang: str = "en",
    k: int = 50,
    text_col: str = "text",
    lang_col: str = "lang",
) -> pd.DataFrame:
    """Corpus-comparison keyness by Dunning's log-likelihood ratio (the
    statistic behind ES ``significant_text`` and every corpus-linguistics
    keyword list): G² per term between the target subcorpus (``lang ==
    target_lang``) and the rest, top-``k``. High-G² terms are what makes
    the target read differently from the background.

    One streaming pass folds to (term → cf_target, cf_rest) — the same
    vocabulary-bounded partial shape as ``keywords.dsir_weights``. The
    ranking key is ``floor(G²·1e6 + 0.5)`` as an exact BIGINT with term
    tie-break; G² uses the 2-cell observed-vs-expected form with 0·ln 0
    defined as 0, every float expression mirrored verbatim in the oracle.
    Returns ``(term, cf_target, cf_rest, llr)``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from harvester_ray import analyzer

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n_all = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        langs = batch[lang_col].to_pandas().to_numpy(dtype=object)
        tgt = codes[langs[rows] == target_lang] if codes.size else codes
        n_tgt = np.bincount(tgt, minlength=len(dictionary)).astype(np.int64)
        terms = dictionary.to_pandas().to_numpy(dtype=object)
        keep = n_all > 0
        return pa.table({
            "term": pa.array(terms[keep], pa.string()),
            "n_all": pa.array(n_all[keep], pa.int64()),
            "n_tgt": pa.array(n_tgt[keep], pa.int64()),
        })

    parts = [
        b.to_pandas()
        for b in ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    empty = pd.DataFrame({
        "term": pd.Series(dtype=object),
        "cf_target": pd.Series(dtype=np.int64),
        "cf_rest": pd.Series(dtype=np.int64),
        "llr": pd.Series(dtype=np.float64),
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
    a = cf["n_tgt"].to_numpy(np.int64)
    b = (cf["n_all"] - cf["n_tgt"]).to_numpy(np.int64)
    na = int(a.sum())
    nb = int(b.sum())
    if na == 0 or nb == 0:
        return empty
    af = a.astype(np.float64)
    bf = b.astype(np.float64)
    ab = (a + b).astype(np.float64)
    ea = np.float64(na) * ab / np.float64(na + nb)
    eb = np.float64(nb) * ab / np.float64(na + nb)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(a > 0, af * np.log(af / ea), 0.0)
        t2 = np.where(b > 0, bf * np.log(bf / eb), 0.0)
    g2_micro = np.floor(2.0 * (t1 + t2) * 1e6 + 0.5).astype(np.int64)
    out = pd.DataFrame({
        "term": cf["term"],
        "cf_target": a,
        "cf_rest": b,
        "g2_micro": g2_micro,
    })
    out = out.sort_values(
        ["g2_micro", "term"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    out["llr"] = out.pop("g2_micro").astype(np.float64) / 1e6
    return out[["term", "cf_target", "cf_rest", "llr"]]


def keyness_llr_sql(
    table: str = "documents",
    *,
    target_lang: str = "en",
    k: int = 50,
    text_col: str = "text",
    lang_col: str = "lang",
) -> str:
    """Oracle for ``keyness_llr``: identical 2-cell G² expression over the
    same integer (cf_target, cf_rest) table, same floor-1e6 ranking key."""
    from harvester_ray import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    tgt = target_lang.replace("'", "''")
    return f"""
WITH flat AS (
  SELECT {lang_col} AS lang, unnest({tok}) AS term FROM {table}
),
cf AS (
  SELECT term,
         CAST(count(*) FILTER (WHERE lang = '{tgt}') AS BIGINT) AS a,
         CAST(count(*) FILTER (WHERE lang <> '{tgt}') AS BIGINT) AS b
  FROM flat GROUP BY 1
),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM cf),
g AS (
  SELECT term, a, b,
         CAST(floor(2.0 * (
             (CASE WHEN a > 0
                   THEN a * ln(a / (CAST(na AS DOUBLE) * (a + b) / (na + nb)))
                   ELSE 0.0 END)
           + (CASE WHEN b > 0
                   THEN b * ln(b / (CAST(nb AS DOUBLE) * (a + b) / (na + nb)))
                   ELSE 0.0 END)
         ) * 1e6 + 0.5) AS BIGINT) AS g2_micro
  FROM cf CROSS JOIN tot
)
SELECT term, a AS cf_target, b AS cf_rest,
       CAST(g2_micro AS DOUBLE) / 1e6 AS llr
FROM g
-- mirror the engine's degenerate-subcorpus guard: with an empty target or
-- background subcorpus keyness is undefined and the engine returns no rows
WHERE (SELECT na FROM tot) > 0 AND (SELECT nb FROM tot) > 0
ORDER BY g2_micro DESC, term ASC LIMIT {k}
""".strip()


def source_ablation(
    ds,
    *,
    key: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 64,
) -> pd.DataFrame:
    """Leave-one-source-out contribution analysis: for every ``key`` value,
    what the corpus loses if that source is dropped — its share of docs and
    tokens, the number of vocabulary terms EXCLUSIVE to it (terms whose df
    outside the source is zero — irreplaceable coverage), and the corpus
    mean tokens/doc without it. The one-pass ablation table data-mixing
    decisions read before re-weighting or dropping a source (complements
    ``doremi_weights``/``source_mixture``, which decide HOW MUCH of each
    source to keep).

    Scale shape: one streaming pass emits batch-distinct (term, source)
    pairs plus per-source (n_docs, n_tokens) stat partials into the SAME
    term-hash bucket exchange (stat rows ride a source-hash bucket); each
    bucket folds cross-batch distinct pairs and single-source terms
    locally, so the driver sees O(sources × buckets) rows. Exactness: all
    counts are integers; the two ratio columns mirror one float expression
    verbatim and round to 6. Returns ``(source, n_docs, n_tokens,
    exclusive_terms, mean_tokens_without, delta_mean_tokens)`` sorted by
    source."""
    import zlib

    def explode(batch: pa.Table) -> pa.Table:
        src = (
            batch[key].combine_chunks().cast(pa.string())
            .to_numpy(zero_copy_only=False)
        )
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        terms = np.asarray(dictionary.to_pylist(), dtype=object)
        usrc, sinv = np.unique(src, return_inverse=True)
        # batch-local distinct (term_code, source_idx)
        pair = codes.astype(np.int64) * usrc.size + sinv[rows]
        upair = np.unique(pair)
        # hash the DICTIONARY (each distinct term once), scatter to pairs —
        # a term repeated across sources is never re-hashed
        term_h = np.fromiter(
            (zlib.crc32(t.encode()) % n_partitions for t in terms),
            dtype=np.int32, count=terms.size,
        )
        p_terms = terms[(upair // usrc.size).astype(np.int64)]
        p_src = usrc[(upair % usrc.size).astype(np.int64)]
        tbuck = term_h[(upair // usrc.size).astype(np.int64)]
        # per-source stat partials: docs from the batch, tokens from rows
        n_tok = np.bincount(sinv[rows], minlength=usrc.size).astype(np.int64)
        n_doc = np.bincount(sinv, minlength=usrc.size).astype(np.int64)
        # usrc is already batch-distinct — one hash per distinct source
        sbuck = np.fromiter(
            (zlib.crc32(s.encode()) % n_partitions for s in usrc),
            dtype=np.int32, count=usrc.size,
        )
        return pa.table({
            "term": pa.array(
                np.concatenate([p_terms, np.full(usrc.size, "", object)]),
                pa.string(),
            ),
            "src": pa.array(np.concatenate([p_src, usrc]), pa.string()),
            "docs": pa.array(
                np.concatenate([np.zeros(p_terms.size, np.int64), n_doc]),
                pa.int64(),
            ),
            "toks": pa.array(
                np.concatenate([np.zeros(p_terms.size, np.int64), n_tok]),
                pa.int64(),
            ),
            "bucket": pa.array(np.concatenate([tbuck, sbuck]), pa.int32()),
        })

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_stat = g["term"].to_numpy() == ""
        stats = g.loc[is_stat].groupby("src", as_index=False)[["docs", "toks"]].sum()
        tp = g.loc[~is_stat, ["term", "src"]].drop_duplicates()
        per_term = tp.groupby("term")["src"].agg(["nunique", "min"])
        excl = (
            per_term[per_term["nunique"] == 1]
            .groupby("min").size().rename("excl").reset_index()
            .rename(columns={"min": "src"})
        )
        out = stats.merge(excl, on="src", how="outer")
        for c in ("docs", "toks", "excl"):
            out[c] = out.get(c, 0)
        return out.fillna(0)[["src", "docs", "toks", "excl"]]

    parts = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = [
        "source", "n_docs", "n_tokens", "exclusive_terms",
        "mean_tokens_without", "delta_mean_tokens",
    ]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    fold = parts.groupby("src", as_index=False).sum()
    N, T = int(fold["docs"].sum()), int(fold["toks"].sum())
    n = fold["docs"].to_numpy(np.int64)
    t = fold["toks"].to_numpy(np.int64)
    without = np.where(N > n, (T - t) / np.maximum(N - n, 1), 0.0)
    full = T / N if N else 0.0
    out = pd.DataFrame({
        "source": fold["src"],
        "n_docs": n,
        "n_tokens": t,
        "exclusive_terms": fold["excl"].to_numpy(np.int64),
        "mean_tokens_without": np.round(without, 6),
        "delta_mean_tokens": np.round(np.where(N > n, without - full, 0.0), 6),
    })
    return out.sort_values("source").reset_index(drop=True)[cols]


def source_ablation_sql(
    table: str = "documents",
    *,
    key: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {key} AS source, {tok} AS ts FROM {table}),
stats AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(coalesce(sum(len(ts)), 0) AS BIGINT) AS n_tokens
  FROM toks GROUP BY source
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N, CAST(sum(n_tokens) AS BIGINT) AS T FROM stats),
flat AS (SELECT DISTINCT source, unnest(ts) AS term FROM toks),
excl AS (
  SELECT source, CAST(count(*) AS BIGINT) AS exclusive_terms
  FROM (
    SELECT term, min(source) AS source
    FROM flat GROUP BY term HAVING count(DISTINCT source) = 1
  ) GROUP BY source
)
SELECT s.source, s.n_docs, s.n_tokens,
       coalesce(e.exclusive_terms, 0) AS exclusive_terms,
       CASE WHEN t.N > s.n_docs
            THEN round((t.T - s.n_tokens) * 1.0 / (t.N - s.n_docs), 6)
            ELSE 0.0 END AS mean_tokens_without,
       CASE WHEN t.N > s.n_docs
            THEN round((t.T - s.n_tokens) * 1.0 / (t.N - s.n_docs) - t.T * 1.0 / t.N, 6)
            ELSE 0.0 END AS delta_mean_tokens
FROM stats s CROSS JOIN tot t LEFT JOIN excl e USING (source)
ORDER BY s.source
""".strip()
