"""Sequence packing: assign documents to fixed-capacity token bins.

Training-data pipelines concatenate documents into fixed-length model
contexts ("packing"); the deterministic, partition-independent variant is
virtual-concatenation packing — lay all docs end-to-end in doc_id order
and cut every ``capacity`` tokens: doc d starts at the exclusive prefix
sum of token counts before it, and its bin is ``start // capacity``. The
reference's analog is its fixed-size batch dispatch (100-doc index
batches, /root/reference/harvester/search/tasks/index.py:36-42); packing
is the token-budgeted generalization.

The interesting distributed primitive is the GLOBAL PREFIX SUM, which
``Dataset`` has no native operator for. Classic two-phase scan:

1. one streaming pass computes per-doc token counts and per-RANGE-BUCKET
   subtotals (doc_id hashed into ordered range buckets from a min/max
   pre-pass — ranges, not hashes, so bucket order == doc order);
2. the P subtotals (P rows, driver-side exclusive scan — O(P), never the
   data) become per-bucket base offsets; a bucketed shuffle then sorts
   each bucket locally and cumsums within it, adding its base.

Token counts are integers, so every sum is order-independent and the SQL
window-function oracle matches exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer


def pack_sequences(
    ds,
    *,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 64,
):
    """(doc_id, n_tok, start_tok, bin) per doc: exclusive global prefix sum
    of token counts in doc_id order, bin = start_tok // capacity."""
    lo = ds.min(id_col)
    hi = ds.max(id_col)
    span = max(hi - lo + 1, 1)

    def counts(t: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(t[text_col])
        rows, _, _ = analyzer.tokenize_flat(text)
        n = np.bincount(rows, minlength=len(text)).astype(np.int64)
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        bucket = ((ids - lo) * n_partitions // span).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok": pa.array(n, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    counted = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    counted = counted.materialize()  # two consumers: subtotals + the scan

    from ray.data.aggregate import Sum

    subtotals = counted.groupby("bucket").aggregate(Sum("n_tok", alias_name="s")).to_pandas()
    base = np.zeros(n_partitions, dtype=np.int64)
    if len(subtotals):
        base[subtotals["bucket"].to_numpy()] = subtotals["s"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(base)[:-1]])  # exclusive scan

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        ntok = g["n_tok"].to_numpy(dtype=np.int64)
        start = offsets[int(g["bucket"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(ntok)[:-1]]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tok": ntok,
                "start_tok": start,
                "bin": start // capacity,
            }
        )

    return counted.groupby("bucket").map_groups(scan, batch_format="pandas")


def pack_sequences_sql(
    table: str = "documents",
    *,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: identical packing via a window-function prefix sum."""
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id, len({tok}) AS n_tok FROM {table}
),
s AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM c
)
SELECT doc_id, n_tok, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // {capacity} AS BIGINT) AS bin
FROM s ORDER BY doc_id
""".strip()


def length_buckets(
    ds,
    *,
    boundaries: tuple[int, ...] = (16, 32, 48, 64),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Length-grouped batching diagnostics: bucket every document by token
    count into the smallest boundary that holds it and account the padding
    a pad-to-boundary batcher would waste (the length-bucketing trick of
    Khomenko et al. 2016 / fairseq's ``--max-tokens`` groups).

    Docs longer than the largest boundary form the overflow bucket, padded
    to that bucket's observed max length. All accounting is integer
    (counts, token sums, ``n_docs·boundary`` pad targets); the single
    waste ratio is one mirrored floor(x·1e6+0.5)/1e6 division.

    Scale shape: one streaming pass emits per-(block, bucket) partial
    sums — ≤ len(boundaries)+1 rows per block — folded on the driver.
    Returns (bucket_cap, n_docs, sum_tokens, pad_tokens, waste_ratio)
    ordered by bucket_cap.
    """
    import math

    bounds = np.asarray(sorted(boundaries), dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        import pyarrow.compute as pc

        n_tok = analyzer.doc_token_counts(pc.fill_null(text, ""))
        # bucket index: first boundary >= n_tok; len(bounds) = overflow
        bi = np.searchsorted(bounds, n_tok, side="left")
        uniq, inv = np.unique(bi, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sums = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(sums, inv, n_tok)
        mx = np.zeros(uniq.size, dtype=np.int64)
        np.maximum.at(mx, inv, n_tok)
        return pa.table({
            "bi": pa.array(uniq.astype(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "s": pa.array(sums, pa.int64()),
            "mx": pa.array(mx, pa.int64()),
        })

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    rows = []
    for bi, grp in parts.groupby("bi"):
        n = int(grp["n"].sum())
        s = int(grp["s"].sum())
        mx = int(grp["mx"].max())
        cap = int(bounds[bi]) if bi < bounds.size else mx
        pad = n * cap
        waste = math.floor((pad - s) / pad * 1e6 + 0.5) / 1e6 if pad else 0.0
        rows.append((cap, n, s, pad, waste))
    out = pd.DataFrame(
        rows, columns=["bucket_cap", "n_docs", "sum_tokens", "pad_tokens", "waste_ratio"]
    )
    return out.sort_values("bucket_cap").reset_index(drop=True)


def length_buckets_sql(
    table: str = "documents",
    *,
    boundaries: tuple[int, ...] = (16, 32, 48, 64),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: same smallest-boundary-≥-length assignment via a CASE
    ladder; overflow bucket capped at its own max length."""
    bounds = sorted(boundaries)
    ladder = " ".join(
        f"WHEN n_tok <= {b} THEN {b}" for b in bounds
    )
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, CAST(len({tok}) AS BIGINT) AS n_tok FROM {table}
),
bucketed AS (
  SELECT n_tok, CASE {ladder} ELSE NULL END AS cap FROM toks
),
fin AS (
  SELECT CASE WHEN cap IS NULL THEN max(n_tok) ELSE cap END AS bucket_cap,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
  FROM bucketed GROUP BY cap
)
SELECT bucket_cap, n_docs, sum_tokens,
       n_docs * bucket_cap AS pad_tokens,
       CASE WHEN n_docs * bucket_cap = 0 THEN 0.0
            ELSE floor(CAST(n_docs * bucket_cap - sum_tokens AS DOUBLE)
                       / CAST(n_docs * bucket_cap AS DOUBLE) * 1000000 + 0.5)
                 / 1000000
       END AS waste_ratio
FROM fin
ORDER BY bucket_cap
""".strip()


def span_corruption(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_mod: int = 5,
    collect: bool = True,
):
    """T5/UL2 span-corruption objective: mask ~1/``rate_mod`` of token
    positions, merge adjacent masked positions into spans, and emit the
    (input, target) pair — input with each span replaced by its sentinel
    ``<x_i>``, target as sentinel-prefixed span contents. The masking
    decision is a deterministic position hash
    ``((doc_id·1315423911 + pos·2654435761) mod 2³¹) mod rate_mod == 0``
    — no RNG, so any partition layout and the SQL oracle produce the
    identical corruption (the seed-free determinism every resumable
    100 TB pretrain-prep run needs). Embarrassingly parallel: one
    map_batches pass, no shuffle; gaps-and-islands span numbering mirrors
    the oracle's window functions. Returns
    ``(doc_id, n_tokens, n_masked, input_text, target_text)`` by doc."""
    from .. import analyzer

    P1, P2, M = 1315423911, 2654435761, 2**31

    def corrupt(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n = batch.num_rows
        toks = (
            dictionary.to_pandas().to_numpy(dtype=object)[codes]
            if codes.size else np.zeros(0, object)
        )
        starts = np.searchsorted(rows, np.arange(n + 1), side="left") if rows.size else np.zeros(n + 1, np.int64)
        pos = np.arange(rows.size, dtype=np.int64) - starts[rows] if rows.size else np.zeros(0, np.int64)
        # reduce mod M BEFORE multiplying: doc_id·P1 overflows int64 past
        # doc_id ≈ 7e9 (numpy wraps silently, DuckDB BIGINT raises); the
        # reduced form is value-identical for doc_id ≥ 0 and never overflows
        masked = (
            (((ids[rows] % M) * P1 % M + (pos % M) * P2 % M) % M) % rate_mod == 0
            if rows.size else np.zeros(0, bool)
        )
        prev_masked = np.zeros_like(masked)
        same_row = np.zeros_like(masked)
        if masked.size:
            prev_masked[1:] = masked[:-1]
            same_row[1:] = rows[1:] == rows[:-1]
        run_start = masked & ~(prev_masked & same_row)
        gs = np.cumsum(run_start.astype(np.int64)) if rows.size else np.zeros(0, np.int64)
        inputs, targets, n_tok, n_msk = [], [], [], []
        for r in range(n):
            a, b = int(starts[r]), int(starts[r + 1])
            base = int(gs[a] - run_start[a]) if b > a else 0
            in_p, tgt_p = [], []
            for i in range(a, b):
                if not masked[i]:
                    in_p.append(toks[i])
                else:
                    span = int(gs[i]) - 1 - base
                    if run_start[i]:
                        in_p.append(f"<x_{span}>")
                        tgt_p.append(f"<x_{span}> {toks[i]}")
                    else:
                        tgt_p.append(toks[i])
            inputs.append(" ".join(in_p))
            targets.append(" ".join(tgt_p))
            n_tok.append(b - a)
            n_msk.append(int(masked[a:b].sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(np.array(n_tok, np.int64), pa.int64()),
                "n_masked": pa.array(np.array(n_msk, np.int64), pa.int64()),
                "input_text": pa.array(inputs, pa.string()),
                "target_text": pa.array(targets, pa.string()),
            }
        )

    res = ds.map_batches(corrupt, batch_format="pyarrow", zero_copy_batch=True)
    if not collect:
        # Dataset mode: ~2x corpus text — stream to write_parquet, never
        # materialize on the driver (the chunk_documents(collect=False) rule)
        return res
    out = res.to_pandas()
    cols = ["doc_id", "n_tokens", "n_masked", "input_text", "target_text"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values("doc_id").reset_index(drop=True)[cols]


def span_corruption_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_mod: int = 5,
) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
flat AS (
  SELECT doc_id, unnest(ts) AS tok,
         CAST(generate_subscripts(ts, 1) - 1 AS BIGINT) AS pos
  FROM toks
),
m AS (
  SELECT *, (((doc_id % 2147483648) * 1315423911 % 2147483648
              + (pos % 2147483648) * 2654435761 % 2147483648)
             % 2147483648) % {rate_mod} = 0 AS masked
  FROM flat
),
r AS (
  SELECT *, CASE WHEN masked AND NOT coalesce(
                   lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
                 THEN 1 ELSE 0 END AS run_start
  FROM m
),
s AS (
  SELECT *, sum(run_start) OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS span
  FROM r
),
input_t AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_text
  FROM (
    SELECT doc_id, pos,
           CASE WHEN NOT masked THEN tok
                WHEN run_start = 1 THEN '<x_' || span || '>'
                ELSE NULL END AS piece
    FROM s
  ) WHERE piece IS NOT NULL GROUP BY doc_id
),
target_t AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS target_text
  FROM (
    SELECT doc_id, pos,
           CASE WHEN run_start = 1 THEN '<x_' || span || '> ' || tok ELSE tok END AS piece
    FROM s WHERE masked
  ) GROUP BY doc_id
),
stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(*) FILTER (masked) AS BIGINT) AS n_masked
  FROM s GROUP BY doc_id
)
SELECT d.doc_id, coalesce(st.n_tokens, 0) AS n_tokens,
       coalesce(st.n_masked, 0) AS n_masked,
       coalesce(i.input_text, '') AS input_text,
       coalesce(t.target_text, '') AS target_text
FROM (SELECT doc_id FROM toks) d
LEFT JOIN stats st USING (doc_id)
LEFT JOIN input_t i USING (doc_id)
LEFT JOIN target_t t USING (doc_id)
ORDER BY d.doc_id
""".strip()


def fim_split(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect: bool = True,
):
    """Fill-in-the-middle objective prep (the PSM transform behind
    code-model pretraining): split each document's token stream into
    (prefix, middle, suffix) at two cut points derived from a
    deterministic doc-id hash — c₁ = h₁ mod (n+1), c₂ = c₁ + h₂ mod
    (n−c₁+1) — so any partition layout, any resume, and the SQL oracle
    produce the identical split (the span_corruption determinism rule).
    Embarrassingly parallel, one map_batches pass. Returns
    ``(doc_id, n_tokens, prefix, middle, suffix)`` by doc."""
    from .. import analyzer

    P1, P2, M = 1315423911, 2654435761, 2**31

    def split(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n_rows = batch.num_rows
        toks = (
            dictionary.to_pandas().to_numpy(dtype=object)[codes]
            if codes.size else np.zeros(0, object)
        )
        starts = np.searchsorted(rows, np.arange(n_rows + 1), side="left") if rows.size else np.zeros(n_rows + 1, np.int64)
        pre, mid, suf, n_tok = [], [], [], []
        for r in range(n_rows):
            a, b = int(starts[r]), int(starts[r + 1])
            n = b - a
            did = int(ids[r])
            c1 = (((did % M) * P1) % M) % (n + 1)
            c2 = c1 + (((did % M) * P2) % M) % (n - c1 + 1)
            w = toks[a:b]
            pre.append(" ".join(w[:c1]))
            mid.append(" ".join(w[c1:c2]))
            suf.append(" ".join(w[c2:]))
            n_tok.append(n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(np.array(n_tok, np.int64), pa.int64()),
                "prefix": pa.array(pre, pa.string()),
                "middle": pa.array(mid, pa.string()),
                "suffix": pa.array(suf, pa.string()),
            }
        )

    res = ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
    if not collect:
        return res
    out = res.to_pandas()
    cols = ["doc_id", "n_tokens", "prefix", "middle", "suffix"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values("doc_id").reset_index(drop=True)[cols]


def fim_split_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
cuts AS (
  SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
         (((doc_id % 2147483648) * 1315423911) % 2147483648) % (CAST(len(ts) AS BIGINT) + 1) AS c1
  FROM toks
),
cuts2 AS (
  SELECT *, c1 + (((doc_id % 2147483648) * 2654435761) % 2147483648) % (n - c1 + 1) AS c2
  FROM cuts
)
SELECT doc_id, n AS n_tokens,
       coalesce(array_to_string(ts[1:c1], ' '), '') AS prefix,
       coalesce(array_to_string(ts[c1 + 1:c2], ' '), '') AS middle,
       coalesce(array_to_string(ts[c2 + 1:n], ' '), '') AS suffix
FROM cuts2 ORDER BY doc_id
""".strip()


def sentence_pack(
    ds,
    *,
    capacity: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_sentences: int = 1024,
    n_partitions: int = 64,
):
    """Sentence-ALIGNED packing: split each document on the literal
    ``'. '`` delimiter (two-char split mirrors exactly in SQL — RE2 on
    both sides has no lookbehind for a true boundary class, so the
    delimiter is the contract) and lay the sentences end-to-end in
    (doc_id, sentence_idx) order, cutting bins every ``capacity`` tokens
    at SENTENCE boundaries — the RAG-chunking variant of
    ``pack_sequences`` (no mid-sentence splits; a bin may under-fill).

    Composition: one flat_map explodes docs to sentences keyed
    ``sid = doc_id·max_sentences + idx`` (documented bound: docs with
    more than ``max_sentences`` '. '-pieces are rejected), then the
    existing two-phase global-prefix-sum machinery does the packing —
    bin = exclusive-prefix-sum // capacity, all integer, exact oracle.
    Returns (doc_id, sent_idx, n_tok, start_tok, bin) per sentence."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        text = t[text_col].combine_chunks()
        parts = pc.split_pattern(pc.fill_null(text, ""), ". ")
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        if (counts > max_sentences).any():
            raise ValueError(f"document exceeds max_sentences={max_sentences}")
        flat = pc.list_flatten(parts)
        doc_of = np.repeat(ids, counts)
        idx = np.arange(doc_of.size, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return pa.table({
            "sid": pa.array(doc_of * max_sentences + idx, pa.int64()),
            "sentence": flat.cast(pa.string()),
        })

    sents = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    packed = pack_sequences(
        sents, capacity=capacity, id_col="sid", text_col="sentence",
        n_partitions=n_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        # pack_sequences normalizes its id column name to doc_id — here it
        # carries the composite sid
        sid = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        return pa.table({
            "doc_id": pa.array(sid // max_sentences, pa.int64()),
            "sent_idx": pa.array(sid % max_sentences, pa.int64()),
            "n_tok": t["n_tok"].combine_chunks().cast(pa.int64()),
            "start_tok": t["start_tok"].combine_chunks().cast(pa.int64()),
            "bin": t["bin"].combine_chunks().cast(pa.int64()),
        })

    return packed.map_batches(finish, batch_format="pyarrow")


def sentence_pack_sql(
    table: str = "documents",
    *,
    capacity: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr("sentence")
    return f"""
WITH sents AS (
  SELECT {id_col} AS doc_id,
         CAST(generate_subscripts(pieces, 1) - 1 AS BIGINT) AS sent_idx,
         unnest(pieces) AS sentence
  FROM (SELECT {id_col}, string_split(coalesce({text_col}, ''), '. ') AS pieces FROM {table})
),
counted AS (
  SELECT doc_id, sent_idx, CAST(len({tok}) AS BIGINT) AS n_tok FROM sents
),
packed AS (
  SELECT doc_id, sent_idx, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id, sent_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM counted
)
SELECT doc_id, sent_idx, n_tok, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok // {capacity} AS BIGINT) AS bin
FROM packed ORDER BY doc_id, sent_idx
""".strip()
