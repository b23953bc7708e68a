"""Distributed exact order statistics + CCNet-style perplexity buckets.

``perplexity_buckets`` reproduces CCNet's head/middle/tail split (Wenzek et
al. 2020): score every document by per-token negative log-likelihood under
a corpus LM (here the corpus's own unigram model,
`ops/keywords.unigram_nano_scores` — same integer nano-fixed-point
discipline as ``unigram_logprob``), then assign each doc to the best third
(head), middle third, or worst third of the corpus distribution. The
reference's analog is its quality-tier routing of harvested documents
(state/validation gates, `/root/reference/harvester/core/models/datatypes/
document.py:84-118`); the bucket split is the scale generalization used to
curate LM training mixes.

Exact quantiles WITHOUT a global sort: the cutoffs are the k-th smallest
``(key, doc_id)`` pairs (k = ⌊N/3⌋ and ⌊2N/3⌋), found by iterative
histogram refinement — each round one streaming pass bincounts the
candidate key range into ≤2^16 bins (both cutoffs share each pass), the
target bin narrows the range 65536×, and as soon as a candidate bin's
population fits ``collect_cap`` the surviving pairs are collected and the
cutoff read off exactly. Two to three passes over a 24-byte-per-row
materialized score table replace an all-to-all sort of the corpus — at
10^10 docs nothing but bounded histograms ever reaches the driver. Bucket
assignment is then one embarrassingly-parallel comparison pass against the
two broadcast cutoff pairs.

Parity discipline: the ranking key is the exact integer
``(-total_nano) // n_tokens`` (nano-NLL per token; floor division of
non-negative BIGINTs matches DuckDB ``//``), ties broken by doc_id — the
oracle's ``row_number() OVER (ORDER BY key, doc_id)`` is a total order, so
bucket membership is byte-deterministic on both sides. The displayed
``nll_per_token`` is micro-quantized integer arithmetic
(``(key+500)//1000 / 1e6``), never float rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer
from .keywords import unigram_nano_scores

_MAX_BINS = 1 << 16


def kth_smallest_pairs(
    scored,
    ks: list[int],
    *,
    key_col: str = "key",
    id_col: str = "doc_id",
    collect_cap: int = 1 << 20,
) -> list[tuple[int, int] | None]:
    """Exact k-th smallest ``(key, id)`` pairs (1-based k, lexicographic
    order, non-negative int64 keys) of a Dataset, one histogram-refinement
    narrowing shared by all requested ks. ``None`` for k < 1; k > N raises.

    Each round is ONE streaming pass: every unresolved k bincounts its own
    candidate key range (≤``_MAX_BINS`` bins). A range whose population is
    ≤``collect_cap`` is resolved by collecting just those pairs. Key ties
    spanning a huge range are resolved by a final id-refinement round over
    the single tied key (same helper, id as the key), so no step ever
    collects more than ``collect_cap`` rows.
    """

    def hist_pass(specs):
        """specs: list of (qi, lo, hi, shift, eq_key or None). One pass
        emitting (qi, bin, c) partials, folded on the driver."""

        def part(batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch[key_col].combine_chunks().cast(pa.int64()))
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            out_q, out_b, out_c = [], [], []
            for qi, lo, hi, shift, eq_key in specs:
                v = ids if eq_key is not None else keys
                m = keys == eq_key if eq_key is not None else np.ones(keys.size, bool)
                vv = v[m & (v >= lo) & (v <= hi)]
                if vv.size == 0:
                    continue
                b = (vv - lo) >> shift
                c = np.bincount(b)
                nz = np.flatnonzero(c)
                out_q.append(np.full(nz.size, qi, np.int64))
                out_b.append(nz.astype(np.int64))
                out_c.append(c[nz].astype(np.int64))
            if not out_q:
                return pa.table(
                    {
                        "qi": pa.array([], pa.int64()),
                        "bin": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "qi": pa.array(np.concatenate(out_q), pa.int64()),
                    "bin": pa.array(np.concatenate(out_b), pa.int64()),
                    "c": pa.array(np.concatenate(out_c), pa.int64()),
                }
            )

        folded = scored.map_batches(part, batch_format="pyarrow").to_pandas()
        if folded.empty:
            return {}
        g = folded.groupby(["qi", "bin"], sort=True)["c"].sum()
        return {qi: grp.droplevel(0) for qi, grp in g.groupby(level=0)}

    def collect_pairs(lo, hi, eq_key):
        def filt(batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch[key_col].combine_chunks().cast(pa.int64()))
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            v = ids if eq_key is not None else keys
            m = (v >= lo) & (v <= hi)
            if eq_key is not None:
                m &= keys == eq_key
            return pa.table(
                {
                    "k": pa.array(keys[m], pa.int64()),
                    "i": pa.array(ids[m], pa.int64()),
                }
            )

        got = scored.map_batches(filt, batch_format="pyarrow").to_pandas()
        order = np.lexsort((got["i"].to_numpy(), got["k"].to_numpy()))
        return got["k"].to_numpy()[order], got["i"].to_numpy()[order]

    # global bounds + total population in one pass
    def bounds(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].combine_chunks().cast(pa.int64()))
        if keys.size == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        return pa.table(
            {
                "lo": pa.array([int(keys.min())], pa.int64()),
                "hi": pa.array([int(keys.max())], pa.int64()),
                "n": pa.array([keys.size], pa.int64()),
            }
        )

    b = scored.map_batches(bounds, batch_format="pyarrow").to_pandas()
    if b.empty or int(b["n"].sum()) == 0:
        if any(k >= 1 for k in ks):
            raise ValueError("k exceeds dataset size (empty input)")
        return [None] * len(ks)
    glo, ghi, total = int(b["lo"].min()), int(b["hi"].max()), int(b["n"].sum())
    if glo < 0:
        raise ValueError("keys must be non-negative")
    results: list[tuple[int, int] | None] = [None] * len(ks)
    # state per k: (lo, hi, rank_below, eq_key, pop)
    state = {}
    for qi, k in enumerate(ks):
        if k < 1:
            continue
        if k > total:
            raise ValueError(f"k={k} exceeds dataset size {total}")
        state[qi] = (glo, ghi, 0, None, total)

    while state:
        # resolve any candidate small enough to collect
        for qi in [q for q, s in state.items() if s[4] <= collect_cap]:
            lo, hi, rank_below, eq_key, _pop = state.pop(qi)
            kk, ii = collect_pairs(lo, hi, eq_key)
            j = ks[qi] - rank_below - 1
            results[qi] = (int(kk[j]), int(ii[j]))
        if not state:
            break
        specs = []
        for qi, (lo, hi, _rb, eq_key, _pop) in state.items():
            width = hi - lo + 1
            shift = 0
            while ((width - 1) >> shift) + 1 > _MAX_BINS:
                shift += 1
            specs.append((qi, lo, hi, shift, eq_key))
        hists = hist_pass(specs)
        for qi, lo, hi, shift, eq_key in specs:
            lo0, hi0, rank_below, eq0, _pop = state[qi]
            h = hists.get(qi)
            csum = h.cumsum()
            target = ks[qi] - rank_below
            pos = int(np.searchsorted(csum.to_numpy(), target, side="left"))
            bin_id = int(csum.index[pos])
            below = int(csum.iloc[pos - 1]) if pos > 0 else 0
            pop = int(h.loc[bin_id])
            nlo = lo + (bin_id << shift)
            nhi = min(hi, lo + ((bin_id + 1) << shift) - 1)
            rank_below += below
            if shift == 0 and eq_key is None and pop > collect_cap:
                # single key value, massively tied: refine on doc_id
                state[qi] = (0, (1 << 62), rank_below, nlo, pop)
            else:
                state[qi] = (nlo, nhi, rank_below, eq0, pop)

    return results


def perplexity_buckets(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect: bool = True,
):
    """Per-doc ``(doc_id, n_tokens, nll_per_token, bucket)`` with bucket ∈
    head/middle/tail by corpus thirds of per-token unigram NLL (head = most
    typical text). Zero-token docs score 0 (most head-ward), mirroring the
    oracle's LEFT JOIN. With ``collect=False`` the assignment stage is
    returned as a Dataset (unsorted) so pipelines can stream it straight
    to ``write_parquet`` — the per-doc rows never land on the driver; the
    cutoff selection itself stays histogram-refinement either way."""
    import ray

    def to_key(batch: pa.Table) -> pa.Table:
        n_tok = np.asarray(batch["n_tokens"].combine_chunks().cast(pa.int64()))
        tot = np.asarray(batch["total_nano"].combine_chunks().cast(pa.int64()))
        key = np.where(n_tok > 0, (-tot) // np.maximum(n_tok, 1), 0)
        # unigram_nano_scores normalizes the id column name to doc_id
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "key": pa.array(key, pa.int64()),
            }
        )

    scored = (
        unigram_nano_scores(ds, id_col=id_col, text_col=text_col)
        .map_batches(to_key, batch_format="pyarrow")
        .materialize()
    )
    n = scored.count()
    cols = ["doc_id", "n_tokens", "nll_per_token", "bucket"]
    if n == 0:
        if not collect:
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "nll_per_token": pa.array([], pa.float64()),
                "bucket": pa.array([], pa.string()),
            }))
        return pd.DataFrame(columns=cols)
    k1, k2 = n // 3, (2 * n) // 3
    c1, c2 = kth_smallest_pairs(scored, [k1, k2], id_col="doc_id")

    def assign(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["key"].combine_chunks())
        did = np.asarray(batch["doc_id"].combine_chunks())

        def le(cut):
            if cut is None:
                return np.zeros(key.size, bool)
            ck, ci = cut
            return (key < ck) | ((key == ck) & (did <= ci))

        in_head = le(c1)
        in_mid = le(c2)
        bucket = np.where(in_head, "head", np.where(in_mid, "middle", "tail"))
        micro = (key + 500) // 1000
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "nll_per_token": pa.array(micro / 1e6, pa.float64()),
                "bucket": pa.array(bucket, pa.string()),
            }
        )

    res = scored.map_batches(assign, batch_format="pyarrow")
    if not collect:
        return res
    out = res.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[cols]


def perplexity_buckets_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: the unigram_logprob_sql scoring chain, then a total-order
    row_number over (key, doc_id) cut at corpus thirds."""
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
),
scored AS (
  SELECT t.doc_id,
         coalesce(p.n_tokens, 0) AS n_tokens,
         CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((-p.total_nano) // p.n_tokens AS BIGINT) END AS key
  FROM (SELECT doc_id FROM toks) t LEFT JOIN per_doc p USING (doc_id)
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY key ASC, doc_id ASC) AS rn,
         count(*) OVER () AS n
  FROM scored
)
SELECT doc_id, n_tokens,
       CAST((key + 500) // 1000 AS BIGINT) / 1000000.0 AS nll_per_token,
       CASE WHEN 3 * rn <= n THEN 'head'
            WHEN 3 * rn <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
ORDER BY doc_id
""".strip()


def column_percentiles(
    ds,
    *,
    value_col: str = "value",
    id_col: str = "event_id",
    pcts: tuple[int, ...] = (50, 90, 99),
    scale: float = 1e6,
):
    """Exact corpus-scale percentiles of a numeric column WITHOUT a global
    sort: values micro-quantize to non-negative int64 keys
    (``floor(x·scale+0.5)``), each percentile p's value is the
    ``ceil(p·N/100)``-th smallest key (the discrete/lower quantile), found
    by the same histogram-refinement selection as ``perplexity_buckets`` —
    all requested percentiles share each streaming pass. Returns
    ``(pct, value)``; empty input → empty frame. The id column only breaks
    ties inside the selection helper; the reported value is tie-invariant."""
    import pandas as pd

    def to_key(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col].combine_chunks().cast(pa.float64()))
        return pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "key": pa.array(
                    np.floor(v * scale + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    scored = ds.map_batches(to_key, batch_format="pyarrow").materialize()
    n = scored.count()
    if n == 0:
        return pd.DataFrame(columns=["pct", "value"])
    ks = [(p * n + 99) // 100 for p in pcts]  # ceil(p·N/100)
    cuts = kth_smallest_pairs(scored, ks, id_col="doc_id")
    return pd.DataFrame(
        {
            "pct": np.asarray(pcts, np.int64),
            "value": [c[0] / scale for c in cuts],
        }
    )


def column_percentiles_sql(
    table: str = "events",
    *,
    value_col: str = "value",
    pcts: tuple[int, ...] = (50, 90, 99),
    scale: float = 1e6,
) -> str:
    """Oracle: the same micro-quantized discrete quantile via OFFSET."""
    arms = "\nUNION ALL\n".join(
        f"SELECT {p} AS pct, (SELECT k FROM q ORDER BY k "
        f"LIMIT 1 OFFSET (({p} * (SELECT n FROM t) + 99) // 100) - 1) / {scale!r} AS value"
        for p in pcts
    )
    return f"""
WITH q AS (
  SELECT CAST(floor({value_col} * {scale!r} + 0.5) AS BIGINT) AS k FROM {table}
),
t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q)
{arms}
ORDER BY pct
""".strip()
