"""Broadcast phrase-dictionary tagging (the FlashText / Aho-Corasick
pattern — Singh, "Replace or Retrieve Keywords In Documents at Scale",
2017): tag every document with the dictionary phrases its token stream
contains, counting (overlapping) occurrences.

Curation use: topic/domain tagging, allow/deny-list routing, weak labels
for quality classifiers — the dictionary is tiny, the corpus is not.  The
reference's analog is its metadata-vocabulary broadcast lookup
(disciplines normalizer, `/root/reference/harvester/core/utils/...` via
`pipelines/relational.py:120` here); this is the free-text variant.

Scale shape: ZERO shuffle.  The dictionary is grouped by token length L
and hashed with the exact shingle machinery the corpus side uses
(`ops/dedup._batch_shingles`), then broadcast as sorted uint64 arrays;
each batch computes its rolling window hashes once per distinct L and
membership-tests them with one searchsorted — no per-row Python, text
never leaves the map task, output is (doc_id, phrase, n_hits) int/dict
rows.  64-bit collisions are the standard accepted error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import analyzer
from .dedup import _batch_shingles


def _phrase_table(phrases: tuple[str, ...]):
    """len → (sorted window-hash array, phrase index per hash), computed
    with the same tokenizer+hash the corpus batches use."""
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    toks = [analyzer.tokenize_query(p) for p in phrases]
    lens = np.array([len(t) for t in toks])
    if (lens == 0).any():
        raise ValueError("empty phrase after tokenization")
    for L in np.unique(lens):
        idx = np.flatnonzero(lens == L)
        hs = np.empty(idx.size, np.uint64)
        for j, pi in enumerate(idx):
            _, h = _batch_shingles(pa.array([" ".join(toks[pi])]), int(L))
            hs[j] = h[0]
        order = np.argsort(hs)
        by_len[int(L)] = (hs[order], idx[order].astype(np.int64))
    return by_len


def keyword_tags(
    ds,
    phrases: tuple[str, ...],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per (doc, phrase) with ≥1 hit: (doc_id, phrase, n_hits) — n_hits
    counts overlapping token-window occurrences."""
    import ray

    table_ref = ray.put(_phrase_table(tuple(phrases)))
    plist = list(phrases)

    def tag(batch: pa.Table) -> pa.Table:
        by_len = ray.get(table_ref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        text = analyzer.normalize_text(batch[text_col])
        out_doc, out_ph, out_n = [], [], []
        for L, (hs, pidx) in by_len.items():
            sh_doc, sh_h = _batch_shingles(text, L)
            if sh_h.size == 0:
                continue
            pos = np.searchsorted(hs, sh_h)
            np.clip(pos, 0, hs.size - 1, out=pos)
            hit = hs[pos] == sh_h
            if not hit.any():
                continue
            d = sh_doc[hit]
            ph = pidx[pos[hit]]
            # count hits per (doc, phrase)
            key = d * len(plist) + ph
            uk, cnt = np.unique(key, return_counts=True)
            out_doc.append(ids[(uk // len(plist)).astype(np.int64)])
            out_ph.append((uk % len(plist)).astype(np.int64))
            out_n.append(cnt.astype(np.int64))
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "phrase": pa.array([], pa.string()),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        doc = np.concatenate(out_doc)
        ph = np.concatenate(out_ph)
        n = np.concatenate(out_n)
        ph_arr = pa.array(plist, pa.string()).take(pa.array(ph, pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "phrase": ph_arr,
                "n_hits": pa.array(n, pa.int64()),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def keyword_tags_sql(
    table: str,
    phrases: tuple[str, ...],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: identical overlapping-window semantics by token-string
    equality (list comprehension with a filter per phrase)."""
    tok = analyzer.sql_tokenize_expr(text_col)
    branches = []
    for p in phrases:
        toks = analyzer.tokenize_query(p)
        L = len(toks)
        lit = " ".join(toks).replace("'", "''")
        plit = p.replace("'", "''")
        branches.append(
            f"SELECT doc_id, '{plit}' AS phrase, "
            f"len([i for i in range(1, len(ts) - {L} + 2) "
            f"if array_to_string(ts[i : i + {L} - 1], ' ') = '{lit}']) AS n_hits "
            f"FROM ktoks"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
WITH ktoks AS (
  SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}
)
SELECT doc_id, phrase, CAST(n_hits AS BIGINT) AS n_hits FROM (
{union}
) WHERE n_hits > 0
ORDER BY doc_id, phrase
""".strip()
