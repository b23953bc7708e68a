"""Exact duplicated-substring coverage (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022).

Sub-document exact dedup at *character* granularity: a codepoint window of
length ``min_len`` is duplicated when the identical string occurs at least
twice anywhere in the corpus (another doc or another offset of the same
doc), and a document's score is the fraction of its codepoints covered by
the union of its duplicated windows.  This is the signal the paper derives
from a corpus suffix array; here it is re-expressed shuffle-native so it
streams.  The reference's analog is its whole-document content-hash
hygiene (`/root/reference/harvester/core/models/datatypes/document.py:131-139`);
this is the sub-document generalization that catches spliced boilerplate
exact/near-dup dedup misses (sibling of the token-gram `dup_ngrams`
operator in `ops/dupgrams.py`, which scores *distinct-gram* fractions, not
positional coverage).

Scale shape: the duplicated-window set is corpus-sized, so nothing is
broadcast.  Pass 1 explodes one row per window position — (hash, doc_id,
start, n_chars), ints only, the text never leaves the map task — hashed
into ``n_partitions`` coarse buckets so every occurrence of a given window
string lands in one bucket; a vectorized run-length pass marks hashes with
global count ≥ 2 and emits only the duplicated (doc_id, start, n_chars)
rows.  Pass 2 buckets by doc and computes the interval-union length per
doc with one sorted diff (union = Σ min(next_start − start, L) + L per
doc).  Total exchanged volume is O(total codepoints) fixed-width ints in
pass 1 and only the duplicated positions in pass 2.  Window hashing is a
rolling polynomial over codepoints in Z/2^64 computed from ONE global
prefix scan per batch (no per-doc Python); 64-bit collisions are the
standard accepted error (same contract as `dup_ngrams`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Odd base => invertible mod 2^64, so windows hash via one global prefix
# cumsum: H(g) = (S[g+L] - S[g]) * B^{-(N-g-L)} with A[k] = c[k]*B^{N-1-k}.
_BASE = np.uint64(0x100000001B3)
_BASE_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _codepoints(text: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated codepoint buffer + int64 doc offsets (len n_docs+1).

    ASCII fast path reads the Arrow utf-8 buffer zero-copy; any batch with
    a high byte falls back to one utf-32 decode per *string* (not per
    window), so non-ASCII costs a copy, never a Python inner loop.
    """
    arr = text.combine_chunks()
    bufs = arr.buffers()
    n = len(arr)
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lo, hi = int(offsets[0]), int(offsets[-1])
    flat = data[lo:hi]
    if flat.size == 0 or flat.max() < 128:
        return flat.astype(np.uint64), (offsets.astype(np.int64) - lo)
    parts = [
        np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) if s else np.empty(0, np.uint32)
        for s in arr.to_pylist()
    ]
    lens = np.array([p.size for p in parts], dtype=np.int64)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=out_off[1:])
    return np.concatenate(parts).astype(np.uint64) if parts else np.empty(0, np.uint64), out_off


def _window_hashes(cp: np.ndarray, min_len: int) -> np.ndarray:
    """Hash of every length-L window of the concatenated buffer, one O(N)
    vectorized scan (valid per-doc starts are selected by the caller)."""
    n = cp.size
    pw = np.empty(n, np.uint64)
    pw[0] = 1
    np.cumprod(np.full(n - 1, _BASE, np.uint64), out=pw[1:]) if n > 1 else None
    a = cp * pw[::-1]  # c[k] * B^(N-1-k), wraps mod 2^64
    s = np.zeros(n + 1, np.uint64)
    np.cumsum(a, out=s[1:])
    starts = np.arange(0, n - min_len + 1, dtype=np.int64)
    ipw = np.empty(n + 1, np.uint64)
    ipw[0] = 1
    if n:
        np.cumprod(np.full(n, _BASE_INV, np.uint64), out=ipw[1:])
    return (s[starts + min_len] - s[starts]) * ipw[n - starts - min_len]


def substring_dup_coverage(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 30,
    n_partitions: int = 64,
    doc_buckets: int = 64,
):
    """Per-doc (doc_id, n_chars, covered, dup_frac) over docs with ≥ 1
    duplicated length-``min_len`` codepoint window.

    ``dup_frac`` = covered/n_chars quantized to 1e-6 by the exact integer
    half-up rule (CLAUDE.md: never float-round a ratio that can land on a
    decimal half): floor((covered*2e6 + n_chars) / (2*n_chars)) / 1e6.
    Docs shorter than ``min_len`` have no windows and produce no row.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        cp, off = _codepoints(batch[text_col])
        if cp.size < min_len:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "h": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        all_h = _window_hashes(cp, min_len)
        n_chars = np.diff(off)
        n_win = np.maximum(n_chars - min_len + 1, 0)
        doc_rep = np.repeat(np.arange(ids.size), n_win)
        # global start = doc offset + within-doc start
        within = np.arange(doc_rep.size) - np.repeat(
            np.concatenate(([0], np.cumsum(n_win)[:-1])), n_win
        )
        g = off[doc_rep] + within
        h = all_h[g]
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(n_partitions)).astype(np.int32)),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids[doc_rep], pa.int64()),
                "start": pa.array(within, pa.int64()),
                "n_chars": pa.array(n_chars[doc_rep], pa.int64()),
            }
        )

    windows = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def mark_dups(group: pd.DataFrame) -> pa.Table:
        h = group["h"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.ones(hs.size, bool)
        starts[1:] = hs[1:] != hs[:-1]
        run_id = np.cumsum(starts) - 1
        dup = (np.bincount(run_id)[run_id] >= 2)[np.argsort(order, kind="stable")]
        return pa.table(
            {
                "doc_id": pa.array(group["doc_id"].to_numpy()[dup], pa.int64()),
                "start": pa.array(group["start"].to_numpy()[dup], pa.int64()),
                "n_chars": pa.array(group["n_chars"].to_numpy()[dup], pa.int64()),
                "dbucket": pa.array(
                    (group["doc_id"].to_numpy()[dup] % doc_buckets).astype(np.int32)
                ),
            }
        )

    dups = windows.groupby("bucket").map_groups(mark_dups, batch_format="pandas")

    L = min_len

    def coverage(group: pd.DataFrame) -> pa.Table:
        d = group["doc_id"].to_numpy()
        s = group["start"].to_numpy()
        nc = group["n_chars"].to_numpy()
        order = np.lexsort((s, d))
        d, s, nc = d[order], s[order], nc[order]
        first = np.r_[True, d[1:] != d[:-1]]
        last = np.r_[d[1:] != d[:-1], True]
        # union of sorted equal-length intervals: min(next_start - start, L)
        # for every window with a same-doc successor, L for the last one
        contrib = np.full(d.size, L, np.int64)
        mid = ~last[:-1]
        contrib[:-1][mid] = np.minimum((s[1:] - s[:-1])[mid], L)
        docs = d[first]
        n_chars = nc[first]
        covered = np.add.reduceat(contrib, np.flatnonzero(first))
        frac = ((covered * 2_000_000 + n_chars) // (2 * n_chars)) / 1e6
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "covered": pa.array(covered, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return dups.groupby("dbucket").map_groups(coverage, batch_format="pandas")


def substring_dup_coverage_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 30,
) -> str:
    """Oracle: identical semantics by window *string* equality.  1-based
    `substring` offsets cancel out — only the union length is emitted."""
    L = min_len
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {text_col} AS text, length({text_col}) AS n_chars FROM {table}),
win0 AS (SELECT doc_id, n_chars, unnest(range(1, greatest(n_chars - {L} + 2, 1))) AS start, text FROM d),
win AS (SELECT doc_id, n_chars, start, substring(text, start, {L}) AS s FROM win0),
cnt AS (SELECT s, count(*) AS c FROM win GROUP BY s),
dup AS (SELECT w.doc_id, w.n_chars, w.start FROM win w JOIN cnt ON w.s = cnt.s WHERE cnt.c >= 2),
cov AS (SELECT doc_id, n_chars,
               least(coalesce(lead(start) OVER (PARTITION BY doc_id ORDER BY start) - start, {L}), {L}) AS contrib
        FROM dup)
SELECT doc_id,
       any_value(n_chars) AS n_chars,
       CAST(sum(contrib) AS BIGINT) AS covered,
       ((CAST(sum(contrib) AS BIGINT) * 2000000 + any_value(n_chars)) // (2 * any_value(n_chars))) / 1000000.0 AS dup_frac
FROM cov
GROUP BY doc_id
ORDER BY doc_id
""".strip()
