"""Federated search across multiple independent index roots with EXACT
global statistics — the multi-index / alias search surface of the
reference's OpenSearch deployment (its search API fans one query out over
the Edusources + Publinova indices and merges by score,
harvester/search/views/document.py:122-143). OpenSearch merges shard
results whose idfs come from per-shard stats unless dfs_query_then_fetch;
this implementation is the *exact* variant: df, n_docs and avgdl are
combined across sub-indexes from their manifests' integer (df, n_docs,
dl_sum) — so a query over K federated indexes is score-identical to the
same query over one index of the union corpus, which is what the oracle
asserts.

Doc-id spaces must be disjoint across members (they are corpus-global ids
here, exactly like the reference's product ids across indices).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import analyzer
from . import bm25
from .query import (
    ROUND_MARGIN,
    IndexReader,
    _empty_result,
    merge_topk,
    search_segment,
    tombstones_for_segment,
)


class FederatedReader:
    """Read-only search over the union of several index versions."""

    def __init__(self, roots: list[str]):
        if not roots:
            raise ValueError("need at least one index root")
        self.readers = [IndexReader(r) for r in roots]
        self.n_docs = int(sum(r.n_docs for r in self.readers))
        dl_sum = int(sum(int(r.manifest["dl_sum"]) for r in self.readers))
        # exact integer combination — identical to a single index built over
        # the union corpus (manifest stores the integer pair, never floats)
        self.avgdl = (dl_sum / self.n_docs) if self.n_docs else 0.0

    def df(self, terms: list[str]) -> dict[str, int]:
        out = {t: 0 for t in terms}
        for r in self.readers:
            for t, d in r.df(terms).items():
                out[t] += int(d)
        return out

    def search(self, query_text: str, k: int = 10, mode: str = "and") -> pa.Table:
        """Top-k BM25 over the union: per-segment local top-k with GLOBAL
        idf/avgdl, early-θ propagated across segments of ALL members (one
        fan-out, one merge — the same plan the per-index reader runs)."""
        terms = sorted(set(analyzer.tokenize_query(query_text)))
        if not terms:
            return _empty_result()
        dfs = self.df(terms)
        if mode == "and" and any(dfs[t] == 0 for t in terms):
            return _empty_result()
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return _empty_result()
        idf_map = {t: float(bm25.idf(self.n_docs, dfs[t])) for t in terms}
        parts = []
        theta = -np.inf
        for r in self.readers:
            for seg_meta in r.manifest["segments"]:
                seg = r._segment(seg_meta)
                exclude = tombstones_for_segment(
                    r._tomb_ids, r._tomb_vers,
                    seg_meta.get("created_version", r.manifest["_version"]),
                )
                d, s = search_segment(
                    seg, terms, idf_map, self.avgdl, k,
                    mode=mode, threshold=theta, exclude=exclude,
                )
                parts.append((d, s))
                if s.size >= k:
                    theta = max(theta, float(np.sort(s)[-k]) - ROUND_MARGIN)
        return merge_topk(parts, k)
