"""Conversation prefix-cache reuse accounting (the KV-cache sharing model
of RadixAttention — Zheng et al., "SGLang: Efficient Execution of
Structured Language Model Programs", 2024 — and vLLM's automatic prefix
caching).

Serving-side signal over a transcript corpus: when requests replay
conversations, any two conversations that share their first *k* turns
verbatim share a radix-trie path, and a prefix-caching server computes each
distinct trie node's tokens ONCE.  Per depth k this operator reports how
many requests reach depth k, how many distinct prefixes exist, and the
token accounting: ``tokens_total`` (what a cache-less server would compute
at that depth across all requests), ``tokens_computed`` (one per distinct
prefix node), ``tokens_cached`` (their difference) and the hit ratio.  The
reference's analog is its request-cache discipline (replayable fetches,
`/root/reference/harvester/core/models/resources/http.py` cache-by-URI);
this is the token-granularity generalization an LLM-serving corpus needs.

Scale shape: two bounded exchanges.  Stage 1 buckets whole conversations
(crc32(conv_id), the `pipelines/transcripts` idiom) and computes, per
bucket, every turn's *prefix hash* with NO per-row Python: line hashes are
a rolling polynomial over the bucket's concatenated utf-8 buffer (one
global prefix scan — the `ops/substring` machinery), and the per-turn
cumulative prefix hash is the same polynomial trick applied again over the
line-hash sequence, segmented by conversation with one subtraction.  Only
(depth, prefix_hash, turn_tokens) ints leave stage 1.  Stage 2 buckets by
prefix hash so distinct-prefix counting is bucket-local run-length work,
emitting O(depths) partial rows per bucket; a final tiny groupby(depth)
folds them.  64-bit collisions are the standard accepted error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer
from ..pipelines.transcripts import _conv_offsets, _with_conv_bucket
from .substring import _BASE, _BASE_INV


def _poly_span_hashes(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Polynomial hash of values[start:end) for many spans, from ONE global
    prefix scan: H = (S[end]-S[start]) * B^-(N-end) with A[k]=v[k]*B^(N-1-k)."""
    n = values.size
    if n == 0:
        return np.zeros(starts.size, np.uint64)
    pw = np.empty(n, np.uint64)
    pw[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _BASE, np.uint64), out=pw[1:])
    a = values.astype(np.uint64) * pw[::-1]
    s = np.zeros(n + 1, np.uint64)
    np.cumsum(a, out=s[1:])
    ipw = np.empty(n + 1, np.uint64)
    ipw[0] = 1
    np.cumprod(np.full(n, _BASE_INV, np.uint64), out=ipw[1:])
    return (s[ends] - s[starts]) * ipw[n - ends]


def prefix_cache_stats(
    ds,
    *,
    n_buckets: int = 64,
    n_partitions: int = 64,
):
    """Per depth (1-based turn rank): (depth, n_requests, n_prefixes,
    tokens_total, tokens_computed, tokens_cached, hit_ratio).

    Prefix identity is the verbatim ``role: text`` turn sequence;
    ``turn_tokens`` is the analyzer token count of the turn's text.
    ``hit_ratio`` = cached/total quantized to 1e-6 by the exact integer
    half-up rule (0 when a depth's total is 0).
    """

    def bucket_prefixes(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        n = tbl.num_rows
        if n == 0:
            return pa.table(
                {
                    "pbucket": pa.array([], pa.int32()),
                    "depth": pa.array([], pa.int64()),
                    "p": pa.array([], pa.int64()),
                    "tt": pa.array([], pa.int64()),
                }
            )
        line = pc.binary_join_element_wise(
            tbl["role"].combine_chunks(),
            pc.fill_null(tbl["text"].combine_chunks(), ""),
            ": ",
        )
        # line hashes: polynomial over the bucket's flat utf-8 buffer
        arr = line.combine_chunks() if isinstance(line, pa.ChunkedArray) else line
        bufs = arr.buffers()
        offs32 = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        lo = int(offs32[0])
        byte_off = offs32.astype(np.int64) - lo
        h_line = _poly_span_hashes(data[lo : int(offs32[-1])], byte_off[:-1], byte_off[1:])
        # cumulative prefix hash per conversation: same trick one level up
        row = np.arange(n, dtype=np.int64)
        conv_start = np.repeat(off[:-1], np.diff(off))
        p = _poly_span_hashes(h_line, conv_start, row + 1)
        depth = row - conv_start + 1
        rows_tok, _, _ = analyzer.tokenize_flat(analyzer.normalize_text(tbl["text"]))
        tt = np.bincount(rows_tok, minlength=n).astype(np.int64)
        return pa.table(
            {
                "pbucket": pa.array((p % np.uint64(n_partitions)).astype(np.int32)),
                "depth": pa.array(depth, pa.int64()),
                "p": pa.array(p.view(np.int64), pa.int64()),
                "tt": pa.array(tt, pa.int64()),
            }
        )

    turns = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(bucket_prefixes, batch_format="pyarrow")
    )

    def bucket_partials(group: pd.DataFrame) -> pa.Table:
        depth = group["depth"].to_numpy()
        p = group["p"].to_numpy()
        tt = group["tt"].to_numpy()
        order = np.lexsort((p, depth))
        depth, p, tt = depth[order], p[order], tt[order]
        first = np.r_[True, (depth[1:] != depth[:-1]) | (p[1:] != p[:-1])]
        dmax = int(depth.max()) + 1
        n_requests = np.bincount(depth, minlength=dmax).astype(np.int64)
        tokens_total = np.bincount(depth, weights=tt, minlength=dmax).astype(np.int64)
        n_prefixes = np.bincount(depth[first], minlength=dmax).astype(np.int64)
        tokens_computed = np.bincount(
            depth[first], weights=tt[first], minlength=dmax
        ).astype(np.int64)
        present = np.flatnonzero(n_requests)
        return pa.table(
            {
                "depth": pa.array(present, pa.int64()),
                "n_requests": pa.array(n_requests[present], pa.int64()),
                "n_prefixes": pa.array(n_prefixes[present], pa.int64()),
                "tokens_total": pa.array(tokens_total[present], pa.int64()),
                "tokens_computed": pa.array(tokens_computed[present], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = turns.groupby("pbucket").map_groups(bucket_partials, batch_format="pandas")
    totals = partials.groupby("depth").aggregate(
        Sum("n_requests", alias_name="n_requests"),
        Sum("n_prefixes", alias_name="n_prefixes"),
        Sum("tokens_total", alias_name="tokens_total"),
        Sum("tokens_computed", alias_name="tokens_computed"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = np.asarray(batch["tokens_total"].combine_chunks().cast(pa.int64()))
        comp = np.asarray(batch["tokens_computed"].combine_chunks().cast(pa.int64()))
        cached = tot - comp
        denom = np.maximum(tot, 1)
        ratio = np.where(tot > 0, ((cached * 2_000_000 + denom) // (2 * denom)) / 1e6, 0.0)
        return pa.table(
            {
                "depth": batch["depth"].combine_chunks().cast(pa.int64()),
                "n_requests": batch["n_requests"].combine_chunks().cast(pa.int64()),
                "n_prefixes": batch["n_prefixes"].combine_chunks().cast(pa.int64()),
                "tokens_total": pa.array(tot, pa.int64()),
                "tokens_computed": pa.array(comp, pa.int64()),
                "tokens_cached": pa.array(cached, pa.int64()),
                "hit_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def prefix_cache_stats_sql(source: str) -> str:
    """Oracle: identical semantics by verbatim prefix-string equality
    (windowed cumulative string_agg).  ``source`` is a FROM-able table/CTE
    name with (conv_id, turn_idx, role, text)."""
    tok = analyzer.sql_tokenize_expr("text")
    return f"""
WITH pct AS (
  SELECT conv_id,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS depth,
         role || ': ' || text AS line,
         len({tok}) AS tt
  FROM {source}
),
pcp AS (
  SELECT depth, tt,
         string_agg(line, chr(30)) OVER (
           PARTITION BY conv_id ORDER BY depth
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS prefix
  FROM pct
),
pcd AS (
  SELECT depth, prefix,
         count(*) AS c,
         CAST(sum(tt) AS BIGINT) AS tot,
         CAST(any_value(tt) AS BIGINT) AS comp
  FROM pcp GROUP BY depth, prefix
)
SELECT depth,
       CAST(sum(c) AS BIGINT) AS n_requests,
       count(*) AS n_prefixes,
       CAST(sum(tot) AS BIGINT) AS tokens_total,
       CAST(sum(comp) AS BIGINT) AS tokens_computed,
       CAST(sum(tot) - sum(comp) AS BIGINT) AS tokens_cached,
       CASE WHEN sum(tot) = 0 THEN 0.0
            ELSE ((CAST(sum(tot) - sum(comp) AS BIGINT) * 2000000 + CAST(sum(tot) AS BIGINT))
                  // (2 * CAST(sum(tot) AS BIGINT))) / 1000000.0
       END AS hit_ratio
FROM pcd
GROUP BY depth
ORDER BY depth
""".strip()
