"""BM25 top-k query engine over the segment index.

Mirrors the reference's search semantics: ``simple_query_string`` with
``default_operator: "and"`` (harvester/core/models/search/query.py:80-86)
⇒ AND = posting-list intersection across query terms; OR mode scores the
union (used by block-max WAND). Scores are Okapi BM25, k1=1.2, b=0.75
(see bm25.py), ties broken (score desc, doc_id asc), matching the oracle.

Physical execution is document-partitioned fan-out — each segment computes
its local top-k with block-skip pruning, the driver (or a merge step) merges
heaps — the same plan OpenSearch runs across shards for the reference's
search API (harvester/search/views/document.py:122-143).

Two serving modes:
- ``IndexReader``      — in-process, for tests / single-node latency.
- ``QueryService``     — an actor pool; each actor holds a subset of
  segments' dictionaries + mmap'd postings loaded once in ``__init__``
  (the load-once-per-worker analog of SURVEY §2.3).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .. import analyzer
from . import bm25
from . import codec
from . import manifest as mf

RESULT_SCHEMA = pa.schema(
    [("rank", pa.int32()), ("doc_id", pa.int64()), ("score", pa.float64())]
)


def _empty_result() -> pa.Table:
    return RESULT_SCHEMA.empty_table()


class SegmentReader:
    """Loads one segment's term dictionary + doc lengths once (numpy column
    views, no per-term python materialization); postings are mmap'd and
    decoded lazily per query term, with a small LRU of decoded hot-term
    lists (the load-once-per-worker discipline of SURVEY §2.3)."""

    POSTINGS_CACHE = 256  # decoded term posting lists kept per segment

    def __init__(self, base_path: str):
        from collections import OrderedDict

        self.base = base_path
        terms = pq.read_table(base_path + ".terms.parquet")
        self._term_strings = terms["term"].combine_chunks()
        self._lookup = {t: i for i, t in enumerate(self._term_strings.to_pylist())}
        for col in ("df", "cf", "doc_off", "doc_nbytes", "tf_off", "tf_nbytes"):
            setattr(self, "_" + col, np.asarray(terms[col].combine_chunks(), dtype=np.int64))
        self._blocks: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for col in ("block_last_doc", "block_max_tf", "block_min_dl", "block_doc_off", "block_tf_off"):
            arr = terms[col].combine_chunks()
            self._blocks[col] = (
                np.asarray(arr.offsets, dtype=np.int64),
                np.asarray(arr.values, dtype=np.int64),
            )
        # underscore-prefixed columns (e.g. the ES-_source analog "_source")
        # are stored-on-disk-only: pruned at the read, never held in serving
        # memory, fetched per doc batch via stored_values()
        docs_schema = pq.read_schema(base_path + ".docs.parquet")
        self.stored_cols = [c for c in docs_schema.names if c.startswith("_")]
        live_cols = [c for c in docs_schema.names if not c.startswith("_")]
        docs = pq.read_table(base_path + ".docs.parquet", columns=live_cols)
        self.doc_ids = np.asarray(docs["doc_id"].combine_chunks(), dtype=np.int64)
        self.dl = np.asarray(docs["dl"].combine_chunks(), dtype=np.int64)
        # attribute columns (filtered search / recency boost), aligned to doc_ids
        self.attrs: dict[str, pa.Array] = {
            c: docs[c].combine_chunks()
            for c in docs.column_names
            if c not in ("doc_id", "dl")
        }
        self._bin = np.memmap(base_path + ".bin", dtype=np.uint8, mode="r")
        # positional stream (phrase queries): present only when the index was
        # built with store_positions — loaded lazily, never touched otherwise
        self.has_positions = "pos_off" in terms.column_names and os.path.exists(
            base_path + ".pos"
        )
        if self.has_positions:
            for col in ("pos_off", "pos_nbytes"):
                setattr(self, "_" + col, np.asarray(terms[col].combine_chunks(), dtype=np.int64))
            self._pos = np.memmap(base_path + ".pos", dtype=np.uint8, mode="r")
        self._cache: OrderedDict[str, tuple[np.ndarray, np.ndarray]] = OrderedDict()
        # term -> int32 positions of the term's postings in doc_ids order
        # (pure function of the immutable segment; lets hot queries skip
        # the per-query doc_lengths searchsorted and enables the dense
        # score-accumulation paths below)
        self._pos_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        # term -> (idf, avgdl, float64 per-posting BM25 scores): idf/avgdl
        # are manifest constants, so hot terms skip the dl-gather + score
        # recompute entirely (recomputed transparently if a caller passes
        # different stats, e.g. federated search)
        self._score_cache: OrderedDict[str, tuple[float, float, np.ndarray]] = OrderedDict()
        SCORE_CACHE = 32
        self._score_cache_cap = SCORE_CACHE
        # term -> int64 packed (local_doc << 31) | pos occurrence keys —
        # the phrase/proximity primitive, a pure function of the immutable
        # segment (the dense scored-postings discipline applied to the
        # positional family: varbyte decode + repeat + searchsorted were
        # dominating warm phrase latency at 64x). int64 per OCCURRENCE, so
        # a smaller cap than the per-posting caches.
        self._packed_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._packed_cache_cap = 64
        # (kind, terms...) -> (docs, ptf) phrase/proximity match results —
        # the Lucene/OpenSearch segment query-cache analog: a match is a
        # pure function of the immutable segment (tombstones and facet
        # filters apply AFTER, per query), so repeated phrases skip the
        # packed-key intersection entirely
        self._match_cache: OrderedDict[tuple, tuple[np.ndarray, np.ndarray]] = OrderedDict()
        self._match_cache_cap = 32
        # LRU observability (the soak serving leg reports hit rates)
        self.cache_hits = 0
        self.cache_misses = 0

    def entry(self, term: str) -> dict | None:
        """Lightweight per-term view: scalars + numpy block-metadata slices."""
        i = self._lookup.get(term)
        if i is None:
            return None
        row = {
            "idx": i,
            "df": int(self._df[i]),
            "doc_off": int(self._doc_off[i]),
            "doc_nbytes": int(self._doc_nbytes[i]),
            "tf_off": int(self._tf_off[i]),
            "tf_nbytes": int(self._tf_nbytes[i]),
        }
        off, vals = self._blocks["block_last_doc"]
        lo, hi = off[i], off[i + 1]
        row["block_last_doc"] = vals[lo:hi]
        for col in ("block_max_tf", "block_min_dl", "block_doc_off", "block_tf_off"):
            _, v = self._blocks[col]
            row[col] = v[lo:hi]
        return row

    def _slices(self, row: dict) -> tuple[memoryview, memoryview]:
        d0, dn = row["doc_off"], row["doc_nbytes"]
        t0, tn = row["tf_off"], row["tf_nbytes"]
        return (
            memoryview(self._bin[d0 : d0 + dn]),
            memoryview(self._bin[t0 : t0 + tn]),
        )

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Full decode → (doc_ids, tfs); hot terms served from the LRU."""
        hit = self._cache.get(term)
        if hit is not None:
            self.cache_hits += 1
            self._cache.move_to_end(term)
            return hit
        row = self.entry(term)
        if row is None:
            return None
        self.cache_misses += 1
        db, tb = self._slices(row)
        out = codec.decode_postings(db, tb)
        self._cache[term] = out
        if len(self._cache) > self.POSTINGS_CACHE:
            self._cache.popitem(last=False)
        return out

    def postings_positions(self, term: str) -> np.ndarray | None:
        """int32 positions of ``postings(term)[0]`` within ``doc_ids`` —
        cached (the 64x soak measured the per-query doc_lengths
        searchsorted + dl/score recompute dominating warm OR latency; the
        positions are immutable per segment so they are computed once)."""
        hit = self._pos_cache.get(term)
        if hit is not None:
            self._pos_cache.move_to_end(term)
            return hit
        p = self.postings(term)
        if p is None:
            return None
        idx = np.searchsorted(self.doc_ids, p[0]).astype(np.int32)
        self._pos_cache[term] = idx
        if len(self._pos_cache) > self.POSTINGS_CACHE:
            self._pos_cache.popitem(last=False)
        return idx

    def scored_postings(
        self, term: str, idf: float, avgdl: float
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """(positions-in-doc_ids, per-posting BM25 scores) for a term —
        both cached. The dense OR/AND paths are one gather-scatter per
        term on a hot cache."""
        idx = self.postings_positions(term)
        if idx is None:
            return None
        hit = self._score_cache.get(term)
        if hit is not None and hit[0] == idf and hit[1] == avgdl:
            self._score_cache.move_to_end(term)
            return idx, hit[2]
        _, f = self.postings(term)
        sc = bm25.score(
            f.astype(np.float64), self.dl[idx].astype(np.float64), idf, avgdl
        )
        self._score_cache[term] = (idf, avgdl, sc)
        if len(self._score_cache) > self._score_cache_cap:
            self._score_cache.popitem(last=False)
        return idx, sc

    def postings_for_candidates(
        self, row: dict, cand: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode only the blocks whose doc-id range can contain ``cand``
        (block-skip via last_doc metadata); consecutive needed blocks are
        decoded as single runs (one varbyte pass per run). Returns decoded
        (docs, tfs) of just those blocks, sorted."""
        last_doc = np.asarray(row["block_last_doc"], dtype=np.int64)
        need = np.unique(np.searchsorted(last_doc, cand))
        need = need[need < last_doc.size]
        if need.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        # if we'd touch most blocks anyway, one full decode is cheaper
        if need.size >= max(1, int(0.8 * last_doc.size)):
            db, tb = self._slices(row)
            return codec.decode_postings(db, tb)
        db, tb = self._slices(row)
        blocks = {
            "last_doc": last_doc,
            "doc_off": np.asarray(row["block_doc_off"], dtype=np.int64),
            "tf_off": np.asarray(row["block_tf_off"], dtype=np.int64),
        }
        # split needed block ids into maximal consecutive runs
        run_breaks = np.flatnonzero(np.diff(need) > 1) + 1
        docs_parts, tf_parts = [], []
        for run in np.split(need, run_breaks):
            d, t = codec.decode_block_run(db, tb, blocks, int(run[0]), int(run[-1]))
            docs_parts.append(d)
            tf_parts.append(t)
        return np.concatenate(docs_parts), np.concatenate(tf_parts)

    def terms_with_prefix(self, prefix: str, limit: int | None = None) -> list[str]:
        """Terms of this segment's dictionary starting with ``prefix``
        (dictionary is lexicographically sorted at build time —
        build.py:257-259 — so this is two binary searches + one slice; the
        wildcard/prefix expansion path of simple_query_string)."""
        import bisect

        arr = self._term_strings
        n = len(arr)

        class _View:
            def __getitem__(self, i):
                return arr[i].as_py()

            def __len__(self):
                return n

        v = _View()
        lo = bisect.bisect_left(v, prefix)
        # tokens are [a-z0-9]+ so chr(0x7f) upper-bounds every extension
        hi = bisect.bisect_left(v, prefix + "\x7f", lo=lo)
        if limit is not None:
            hi = min(hi, lo + limit)
        return arr.slice(lo, hi - lo).to_pylist()

    def all_postings(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Decode the ENTIRE segment in two vectorized varbyte passes.

        Returns ``(term_rows, df_s, doc_ids, tfs)``: the postings stream in
        encoder order, segmented per term — ``term_rows[k]`` is the row index
        into the (term-sorted) dictionary table of the k-th stream segment,
        whose ``df_s[k]`` postings are the next slice of the flat
        ``doc_ids``/``tfs`` arrays. The doc ids come from one segmented
        cumsum over the per-term delta-gaps; no per-term Python loop
        (compaction/corrections use this instead of per-term ``postings``)."""
        # terms.parquet is term-sorted; byte offsets follow stream order
        order = np.argsort(self._doc_off, kind="stable")
        df_s = self._df[order]
        if df_s.size == 0:
            z = np.empty(0, np.int64)
            return z, z, z, z
        d0 = int(self._doc_off.min())
        t0 = int(self._tf_off.min())
        gaps = codec.varbyte_decode(
            self._bin[d0 : d0 + int(self._doc_nbytes.sum())]
        ).astype(np.int64)
        tfs = codec.varbyte_decode(
            self._bin[t0 : t0 + int(self._tf_nbytes.sum())]
        ).astype(np.int64)
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(df_s)])
        run = np.cumsum(gaps)
        base = np.zeros(df_s.size, dtype=np.int64)
        base[1:] = run[offs[1:-1] - 1]
        doc_ids = run - np.repeat(base, df_s)
        return order, df_s, doc_ids, tfs

    @staticmethod
    def _abs_positions(gaps: np.ndarray, tfs: np.ndarray) -> np.ndarray:
        """Delta-gap position stream → absolute ordinals; gaps reset at each
        posting boundary (posting j owns tfs[j] consecutive gaps)."""
        run = np.cumsum(gaps)
        offs = np.cumsum(tfs)
        base = np.zeros(tfs.size, dtype=np.int64)
        base[1:] = run[offs[:-1] - 1]
        return run - np.repeat(base, tfs)

    def positions(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Decode a term's postings + positions → (doc_ids, tfs, positions)
        where ``positions`` is flat: posting j's tfs[j] ascending within-doc
        token ordinals are a contiguous slice. None if the term is absent or
        the segment has no positional stream."""
        if not self.has_positions:
            return None
        row = self.entry(term)
        if row is None:
            return None
        hit = self.postings(term)
        docs, tfs = hit
        i = row["idx"]
        p0, pn = int(self._pos_off[i]), int(self._pos_nbytes[i])
        gaps = codec.varbyte_decode(self._pos[p0 : p0 + pn]).astype(np.int64)
        return docs, tfs, self._abs_positions(gaps, tfs)

    def packed_positions(self, term: str) -> np.ndarray | None:
        """Sorted-unique int64 keys ``(local_doc << 31) | pos`` for every
        occurrence of ``term`` in this segment — cached. Ascending by
        construction (docs ascending, positions ascending within a doc) and
        unique ((doc, pos) pairs are distinct). None when the term is
        absent or the segment has no positional stream."""
        hit = self._packed_cache.get(term)
        if hit is not None:
            self.cache_hits += 1
            self._packed_cache.move_to_end(term)
            return hit
        res = self.positions(term)
        if res is None:
            return None
        self.cache_misses += 1
        _docs, tfs, pos = res
        local = self.postings_positions(term)
        keys = (np.repeat(local.astype(np.int64), tfs) << 31) | pos
        self._packed_cache[term] = keys
        if len(self._packed_cache) > self._packed_cache_cap:
            self._packed_cache.popitem(last=False)
        return keys

    def all_positions(self, tfs_stream: np.ndarray) -> np.ndarray:
        """Whole-segment position decode (one vectorized varbyte pass) in the
        same stream order as ``all_postings``; ``tfs_stream`` is that call's
        flat tf array (defines the per-posting gap-reset boundaries)."""
        gaps = codec.varbyte_decode(self._pos).astype(np.int64)
        return self._abs_positions(gaps, tfs_stream)

    def doc_lengths(self, docs: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids, docs)
        return self.dl[idx]

    def stored_values(self, col: str, docs: np.ndarray) -> pa.Array:
        """Fetch a stored-on-disk column (e.g. ``_source``) for specific doc
        ids — one pruned parquet column read, never cached in memory."""
        if col not in self.stored_cols:
            raise KeyError(
                f"stored column {col!r} absent — build with store_source=True"
            )
        tbl = pq.read_table(self.base + ".docs.parquet", columns=[col])
        idx = np.searchsorted(self.doc_ids, docs)
        return tbl[col].combine_chunks().take(pa.array(idx))

    def attr_values(self, col: str, docs: np.ndarray) -> np.ndarray:
        if col not in self.attrs:
            raise KeyError(
                f"attribute {col!r} not stored in this index — build with attr_cols=[{col!r}]"
            )
        idx = np.searchsorted(self.doc_ids, docs)
        return np.asarray(self.attrs[col].take(pa.array(idx)))

    def allowed_docs(self, filters: dict | None) -> np.ndarray | None:
        """Facet filters → sorted allowed doc-id array. Semantics mirror the
        reference API: OR within a field's value list, AND across fields
        (search/views/document.py:70-94). A field's spec may instead be a
        RANGE dict with ``gte``/``gt``/``lte``/``lt`` bounds (the ES
        ``range`` query in filter context), AND-combined. Filters do not
        affect scoring stats (OpenSearch filter-context parity)."""
        if not filters:
            return None
        _RANGE_OPS = {
            "gte": pc.greater_equal, "gt": pc.greater,
            "lte": pc.less_equal, "lt": pc.less,
        }
        mask = np.ones(self.doc_ids.size, dtype=bool)
        for col, spec in filters.items():
            if col not in self.attrs:
                raise KeyError(
                    f"filter field {col!r} not stored — build with attr_cols=[{col!r}]"
                )
            arr = self.attrs[col]
            if isinstance(spec, dict):
                ok = None
                for op, val in spec.items():
                    cmp = _RANGE_OPS[op](arr, pa.scalar(val, type=arr.type))
                    ok = cmp if ok is None else pc.and_(ok, cmp)
                if ok is None:
                    continue
            else:
                ok = pc.is_in(arr, value_set=pa.array(spec))
            mask &= np.asarray(pc.fill_null(ok, False))
        return self.doc_ids[mask]


# pruning-threshold safety margin: candidates within half a 4th-decimal ulp
# of the current k-th score can still round-tie with it and win the doc_id
# tie-break, so thresholds are slackened by one rounding quantum
ROUND_MARGIN = 1e-4


def _topk(docs: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k on the ORACLE's ordering key: 4-decimal-rounded
    score desc, doc_id asc. Selecting on the rounded score (scores are
    compared rounded everywhere downstream) makes k-boundary ties resolve
    identically to SQL's ``ORDER BY round(score,4) DESC, doc_id ASC`` —
    full-precision selection picks the larger raw score where two docs tie
    at 4 decimals, which is order-of-summation noise, not ranking signal.
    The pre-cut keeps the ENTIRE boundary tie class (everything rounding
    ≥ the rounded k-th), so the doc_id tie-break sees all contenders."""
    if docs.size == 0:
        return docs, scores
    r = np.round(scores, 4)
    if k < docs.size:
        kth = -np.partition(-r, k - 1)[k - 1]
        keep = r >= kth
        docs, scores, r = docs[keep], scores[keep], r[keep]
    order = np.lexsort((docs, -r))[:k]
    return docs[order], scores[order]


def recency_boost(seg: SegmentReader, docs: np.ndarray, recency: dict) -> np.ndarray:
    """Per-doc additive score feature (applied AFTER term scoring, which is
    why these queries take the exhaustive path in OR mode). Two kinds:

    - Lucene ``distance_feature`` date boost (default):
      ``boost * pivot/(pivot+|Δt|)`` — reference defaults pivot=90d,
      boost=1.15 (core/models/search/query.py:90-98); ``origin_us`` is
      passed explicitly (no wall clock).
    - ES ``rank_feature`` saturation (``kind="rank_feature"``): ``boost *
      f/(f+pivot)`` over the indexed doc length — the numeric-feature
      relevance signal, no attribute column needed."""
    if recency.get("kind") == "rank_feature":
        pivot = float(recency.get("pivot", 100.0))
        boost = float(recency.get("boost", 1.0))
        dl = seg.doc_lengths(docs).astype(np.float64)
        return boost * dl / (dl + pivot)
    ts = seg.attr_values(recency.get("ts_col", "ts"), docs)
    ts = ts.astype("datetime64[us]").astype(np.int64)
    origin = int(recency["origin_us"])
    pivot = float(recency.get("pivot_us", 90 * 86400 * 1_000_000))
    boost = float(recency.get("boost", 1.15))
    dist = np.abs(origin - ts).astype(np.float64)
    return boost * pivot / (pivot + dist)


def search_segment(
    seg: SegmentReader,
    terms: list[str],
    idf_map: dict[str, float],
    avgdl: float,
    k: int,
    mode: str = "and",
    threshold: float = -np.inf,
    exclude: np.ndarray | None = None,
    include: np.ndarray | None = None,
    recency: dict | None = None,
    min_should_match: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Local top-k for one segment. ``threshold`` lets callers pass a current
    global k-th score so OR/WAND mode can prune harder; ``exclude`` is the
    segment's tombstoned doc-id set and ``include`` the facet-filter allowed
    set, both applied BEFORE top-k selection so dead/filtered docs never
    crowd out live ones; ``recency`` adds the distance_feature date boost.
    ``min_should_match`` (OR mode) keeps only docs matching at least that
    many distinct query terms — it invalidates block-max upper bounds, so
    such queries always take the exhaustive path."""
    entries = {}
    for t in terms:
        row = seg.entry(t)
        if row is None:
            if mode == "and":
                return np.empty(0, np.int64), np.empty(0, np.float64)
        else:
            entries[t] = row
    if not entries:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    if mode == "and":
        # dense fast path: when the rarest term still covers a large slice
        # of the segment (head-term conjunctions — the 64x soak's p50
        # regime) or every term's position index is already hot, full
        # dense accumulation + count filter beats candidate-driven block
        # decode; contributions accumulate in the same sorted-term order,
        # so scores are bitwise identical to the candidate path.
        min_df = min(e["df"] for e in entries.values())
        if recency is None and (
            4 * min_df >= seg.doc_ids.size
            or all(t in seg._pos_cache for t in entries)
        ):
            n_seg = seg.doc_ids.size
            dense = np.zeros(n_seg, np.float64)
            counts = np.zeros(n_seg, np.int16)
            for t in sorted(entries):
                idx, sc = seg.scored_postings(t, idf_map[t], avgdl)
                dense[idx] += sc
                counts[idx] += 1
            nz = np.flatnonzero(counts == len(entries))
            cand = seg.doc_ids[nz]
            scores = dense[nz]
            if exclude is not None and exclude.size and cand.size:
                keep = ~np.isin(cand, exclude)
                cand, scores = cand[keep], scores[keep]
            if include is not None and cand.size:
                keep = np.isin(cand, include, assume_unique=True)
                cand, scores = cand[keep], scores[keep]
            return _topk(cand, scores, k)
        # intersect, driving from the rarest term; block-skip decode others
        order = sorted(entries, key=lambda t: entries[t]["df"])
        cand, _ = seg.postings(order[0])
        if exclude is not None and exclude.size and cand.size:
            cand = cand[~np.isin(cand, exclude)]
        if include is not None and cand.size:
            cand = np.intersect1d(cand, include, assume_unique=True)
        decoded = {}
        for t in order[1:]:
            if cand.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            d, f = seg.postings_for_candidates(entries[t], cand)
            idx = np.searchsorted(d, cand)
            idx_c = np.clip(idx, 0, max(d.size - 1, 0))
            hit = (d.size > 0) & (d[idx_c] == cand) if d.size else np.zeros(cand.size, bool)
            cand = cand[hit]
            decoded[t] = (d, f)
        if cand.size == 0:
            return cand, np.empty(0, np.float64)
        dl = seg.doc_lengths(cand).astype(np.float64)
        scores = np.zeros(cand.size, dtype=np.float64)
        for t in sorted(entries):  # fixed accumulation order → deterministic
            if t == order[0]:
                d, f = seg.postings(t)
            else:
                d, f = decoded[t]
            idx = np.searchsorted(d, cand)
            tf = f[idx].astype(np.float64)
            scores += bm25.score(tf, dl, idf_map[t], avgdl)
        if recency is not None:
            scores = scores + recency_boost(seg, cand, recency)
        return _topk(cand, scores, k)

    # mode == "or": exhaustive vectorized union when the lists are small
    # (decode cost ≈ one memcpy); block-max pruned union for long lists,
    # where skipping whole blocks actually pays for its bookkeeping.
    # filters/recency change per-doc scores, which would invalidate block-max
    # upper bounds → those queries always take the exhaustive path
    local_postings = sum(e["df"] for e in entries.values())
    if (
        include is not None
        or recency is not None
        or min_should_match is not None
        or local_postings <= OR_EXHAUSTIVE_THRESHOLD
    ):
        return or_exhaustive(
            seg, entries, idf_map, avgdl, k, exclude=exclude, include=include,
            recency=recency, min_should_match=min_should_match,
        )
    return block_max_union(seg, entries, idf_map, avgdl, k, threshold, exclude=exclude)


# below this many postings per segment, exhaustive scoring beats pruning
OR_EXHAUSTIVE_THRESHOLD = 500_000


def or_exhaustive(
    seg: SegmentReader,
    entries: dict[str, dict],
    idf_map: dict[str, float],
    avgdl: float,
    k: int,
    exclude: np.ndarray | None = None,
    include: np.ndarray | None = None,
    recency: dict | None = None,
    min_should_match: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact disjunctive top-k by full vectorized decode + sort/reduceat
    score aggregation. Accumulation is in sorted-term order per doc (stable
    argsort keeps per-doc contributions in append order) — the same order
    as AND mode and the oracle, so scores are bit-comparable."""
    # dense accumulation over the segment's doc space: one zeros(n) plus a
    # fancy-index add per term (a term's postings hit each doc at most
    # once, so no np.add.at is needed). Per-doc contributions land in
    # sorted-term order — bitwise identical to the old concatenate +
    # stable-argsort + reduceat fold, at a fraction of the cost (the 64x
    # soak measured 87%-df head terms paying ~6 ms/segment in the sort +
    # per-query doc_lengths searchsorted; this path is ~0.5 ms).
    n_seg = seg.doc_ids.size
    dense = np.zeros(n_seg, np.float64)
    matched = np.zeros(n_seg, bool)
    counts = (
        np.zeros(n_seg, np.int16)
        if (min_should_match is not None and min_should_match > 1)
        else None
    )
    for t in sorted(entries):
        idx, sc = seg.scored_postings(t, idf_map[t], avgdl)
        dense[idx] += sc
        matched[idx] = True
        if counts is not None:
            counts[idx] += 1
    nz = np.flatnonzero(matched)
    uniq = seg.doc_ids[nz]
    sums = dense[nz]
    if counts is not None and uniq.size:
        keep = counts[nz] >= min_should_match
        uniq, sums = uniq[keep], sums[keep]
    if exclude is not None and exclude.size and uniq.size:
        keep = ~np.isin(uniq, exclude)
        uniq, sums = uniq[keep], sums[keep]
    if include is not None and uniq.size:
        keep = np.isin(uniq, include, assume_unique=True)
        uniq, sums = uniq[keep], sums[keep]
    if recency is not None and uniq.size:
        sums = sums + recency_boost(seg, uniq, recency)
    return _topk(uniq, sums, k)


def block_max_union(
    seg: SegmentReader,
    entries: dict[str, dict],
    idf_map: dict[str, float],
    avgdl: float,
    k: int,
    threshold: float = -np.inf,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max pruned disjunctive top-k (block-max WAND family).

    Doc space is cut at every block boundary of every term; for each
    resulting interval the exact upper bound is the sum of the covering
    blocks' ``idf * ub(max_tf, min_dl)`` (bm25.block_upper_bound — exact, see
    codec.py). Intervals are processed in descending upper-bound order; once
    the bound falls below the running k-th score θ, every remaining interval
    is pruned and its blocks are never decoded. Equivalent to BMW's pivot
    skipping but interval-vectorized instead of cursor-per-posting, which is
    the right shape for numpy."""
    t_names = sorted(entries)
    blocks = []
    for ti, t in enumerate(t_names):
        row = entries[t]
        last = np.asarray(row["block_last_doc"], dtype=np.int64)
        ub = bm25.block_upper_bound(
            np.asarray(row["block_max_tf"], dtype=np.float64),
            np.asarray(row["block_min_dl"], dtype=np.float64),
            idf_map[t],
            avgdl,
        )
        first = np.empty_like(last)
        if last.size:
            first[0] = 0
            first[1:] = last[:-1] + 1
        blocks.append((first, last, ub))

    # interval boundaries across all terms
    cuts = np.unique(np.concatenate([b[1] for b in blocks] + [np.array([-1], np.int64)]))
    starts = cuts[:-1] + 1
    ends = cuts[1:]
    n_int = starts.size
    int_ub = np.zeros(n_int, dtype=np.float64)
    cover = []  # per term: block index covering each interval (-1 = none)
    for first, last, ub in blocks:
        bi = np.searchsorted(last, starts)
        ok = (bi < last.size) & (first[np.clip(bi, 0, max(last.size - 1, 0))] <= ends) if last.size else np.zeros(n_int, bool)
        contrib = np.where(ok, ub[np.clip(bi, 0, max(last.size - 1, 0))], 0.0)
        int_ub += contrib
        cover.append(np.where(ok, bi, -1))

    order = np.argsort(-int_ub, kind="stable")
    heap_docs = np.empty(0, np.int64)
    heap_scores = np.empty(0, np.float64)
    theta = threshold
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    slices: dict[int, tuple[memoryview, memoryview, dict]] = {}

    for ii in order:
        if int_ub[ii] <= theta and heap_docs.size >= k:
            break
        lo, hi = starts[ii], ends[ii]
        # gather exact postings for this interval from each covering block
        docs_parts, score_parts = [], []
        for ti, t in enumerate(t_names):
            bi = cover[ti][ii]
            if bi < 0:
                continue
            key = (ti, int(bi))
            if key not in decoded:
                if ti not in slices:
                    row = entries[t]
                    db, tb = seg._slices(row)
                    slices[ti] = (
                        db,
                        tb,
                        {
                            "last_doc": np.asarray(row["block_last_doc"], np.int64),
                            "doc_off": np.asarray(row["block_doc_off"], np.int64),
                            "tf_off": np.asarray(row["block_tf_off"], np.int64),
                        },
                    )
                db, tb, bmeta = slices[ti]
                decoded[key] = codec.decode_block(db, tb, bmeta, int(bi))
            d, f = decoded[key]
            sel = (d >= lo) & (d <= hi)
            if not sel.any():
                continue
            dsel = d[sel]
            dl = seg.doc_lengths(dsel).astype(np.float64)
            docs_parts.append(dsel)
            score_parts.append(bm25.score(f[sel].astype(np.float64), dl, idf_map[t], avgdl))
        if not docs_parts:
            continue
        alld = np.concatenate(docs_parts)
        alls = np.concatenate(score_parts)
        so = np.argsort(alld, kind="stable")
        alld, alls = alld[so], alls[so]
        uniq, start_idx = np.unique(alld, return_index=True)
        sums = np.add.reduceat(alls, start_idx)
        if exclude is not None and exclude.size and uniq.size:
            keep = ~np.isin(uniq, exclude)
            uniq, sums = uniq[keep], sums[keep]
        heap_docs = np.concatenate([heap_docs, uniq])
        heap_scores = np.concatenate([heap_scores, sums])
        if heap_docs.size > 4 * k:
            heap_docs, heap_scores = _topk(heap_docs, heap_scores, k)
        if heap_docs.size >= k:
            kth = np.partition(heap_scores, heap_scores.size - k)[heap_scores.size - k] if heap_scores.size > k else heap_scores.min()
            theta = max(theta, kth - ROUND_MARGIN)
    return _topk(heap_docs, heap_scores, k)


def parse_tombstones(manifest: dict) -> tuple[np.ndarray, np.ndarray]:
    """Manifest tombstones are ``[doc_id, version]`` pairs: the doc's
    occurrences in segments created BEFORE that version are dead (a modified
    doc is re-added by a newer segment and must keep matching there)."""
    tombs = manifest.get("tombstones", [])
    if not tombs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    arr = np.asarray(tombs, dtype=np.int64)
    if arr.ndim == 1:  # legacy flat id list: treat as tombstoned everywhere
        return arr, np.full(arr.size, np.iinfo(np.int64).max, dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def tombstones_for_segment(
    tomb_ids: np.ndarray, tomb_vers: np.ndarray, created_version: int
) -> np.ndarray:
    if tomb_ids.size == 0:
        return tomb_ids
    return np.unique(tomb_ids[tomb_vers > created_version])


def merge_topk(
    parts: list[tuple[np.ndarray, np.ndarray]], k: int
) -> pa.Table:
    if not parts:
        return _empty_result()
    docs = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    scores = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.float64)
    docs, scores = _topk(docs, scores, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, docs.size + 1, dtype=np.int32)),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )


class TermStats:
    """Global (term → df) lookup over the bucket-partitioned term-stats
    files. Only the bucket files a query's terms hash into are opened, and
    looked-up terms are cached (load-once analog of the reference's
    broadcast vocab lookups, SURVEY §2.3)."""

    # bucket files at or below this row count are loaded wholesale into an
    # in-memory dict (one parquet open per bucket, ever); larger buckets fall
    # back to filtered reads per query
    SMALL_BUCKET_ROWS = 2_000_000

    def __init__(self, termstats_dir: str, num_buckets: int | None):
        self.dir = termstats_dir
        self.num_buckets = num_buckets
        self._cache: dict[str, int] = {}
        self._bucket_loaded: set[int] = set()

    def _bucket_path(self, b: int) -> str:
        return os.path.join(self.dir, f"bucket-{b:05d}.parquet")

    def _load_bucket(self, b: int, wanted: list[str]) -> None:
        if b in self._bucket_loaded:
            return
        path = self._bucket_path(b)
        if not os.path.exists(path):
            self._bucket_loaded.add(b)
            return
        f = pq.ParquetFile(path)
        if f.metadata.num_rows <= self.SMALL_BUCKET_ROWS:
            tbl = f.read(columns=["term", "df"])
            self._cache.update(zip(tbl["term"].to_pylist(), (int(x) for x in tbl["df"].to_pylist())))
            self._bucket_loaded.add(b)
        else:  # huge vocab: filtered read for just the wanted terms
            tbl = pads.dataset(path).to_table(
                filter=pads.field("term").isin(wanted), columns=["term", "df"]
            )
            self._cache.update(zip(tbl["term"].to_pylist(), (int(x) for x in tbl["df"].to_pylist())))

    def df(self, terms: list[str]) -> dict[str, int]:
        import zlib

        missing = [t for t in terms if t not in self._cache]
        if missing:
            if self.num_buckets:
                by_bucket: dict[int, list[str]] = {}
                for t in missing:
                    by_bucket.setdefault(zlib.crc32(t.encode()) % self.num_buckets, []).append(t)
                for b, wanted in by_bucket.items():
                    self._load_bucket(b, wanted)
            else:  # legacy layout: scan the whole directory
                tbl = pads.dataset(self.dir).to_table(
                    filter=pads.field("term").isin(missing), columns=["term", "df"]
                )
                self._cache.update(zip(tbl["term"].to_pylist(), (int(x) for x in tbl["df"].to_pylist())))
            for t in missing:
                self._cache.setdefault(t, 0)
        return {t: self._cache[t] for t in terms}


class IndexReader:
    """In-process reader over an index version (default: CURRENT)."""

    def __init__(self, index_root: str, version: int | None = None):
        self.root = index_root
        self.manifest = mf.read_manifest(index_root, version)
        # queries must tokenize with the INDEX's analyzer (a v2 index
        # stores stems); extras/evaluate helpers still assume v1
        self.analyzer_version = self.manifest.get("analyzer", "v1")
        self.avgdl = float(self.manifest["avgdl"])
        self.n_docs = int(self.manifest["n_docs"])
        self._termstats = TermStats(
            os.path.join(index_root, self.manifest["termstats"]),
            self.manifest.get("num_buckets"),
        )
        self._segments: dict[str, SegmentReader] = {}
        self._tomb_ids, self._tomb_vers = parse_tombstones(self.manifest)

    def _segment(self, seg_meta: dict) -> SegmentReader:
        key = seg_meta["path"]
        if key not in self._segments:
            self._segments[key] = SegmentReader(os.path.join(self.root, key))
        return self._segments[key]

    def df(self, terms: list[str]) -> dict[str, int]:
        return self._termstats.df(terms)

    def search(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "and",
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
        must_not: str | None = None,
        min_should_match: int | None = None,
    ) -> pa.Table:
        """Top-k BM25. ``mode="and"`` = intersection semantics
        (simple_query_string default_operator:and parity); ``mode="or"`` =
        disjunctive block-max pruned scoring. ``filters`` are facet filters
        (OR within field, AND across fields, filter-context scoring);
        ``recency`` is the distance_feature date boost (see recency_boost).
        ``must_not`` is negated text (simple_query_string ``-term`` clauses,
        core/models/search/query.py analog): docs containing ANY of its
        terms are excluded before top-k, per segment, via the same exclude
        mask tombstones use. ``min_should_match`` (OR mode) keeps only docs
        matching at least that many distinct query terms."""
        terms = sorted(set(analyzer.tokenize_query(query_text, self.analyzer_version)))
        neg_terms = sorted(set(analyzer.tokenize_query(must_not, self.analyzer_version))) if must_not else []
        return self._search_terms(
            terms, k, mode, filters=filters, recency=recency,
            neg_terms=neg_terms, min_should_match=min_should_match,
        )

    def search_prefix(self, prefix: str, k: int = 10, max_expansions: int = 50) -> pa.Table:
        """Prefix (wildcard ``pre*``) top-k: expand against the segment
        dictionaries (sorted — two binary searches each), take the first
        ``max_expansions`` distinct terms in lexicographic order (Lucene
        MultiTermQuery rewrite cap), then score as a disjunction where each
        expanded term keeps its own idf."""
        pfx = analyzer.tokenize_query(prefix, self.analyzer_version)
        if len(pfx) != 1:
            raise ValueError("prefix must normalize to exactly one token")
        expanded: set[str] = set()
        for seg_meta in self.manifest["segments"]:
            expanded.update(self._segment(seg_meta).terms_with_prefix(pfx[0]))
        terms = sorted(expanded)[:max_expansions]
        if not terms:
            return _empty_result()
        return self._search_terms(terms, k, "or")

    def search_wildcard(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> pa.Table:
        """General wildcard top-k (ES ``wildcard`` query: ``*mid*``,
        ``*tail``, ``head*tail``): expand the pattern against the segment
        dictionaries with ONE vectorized Arrow kernel per segment
        (match_like over the term strings — no per-term Python), take the
        first ``max_expansions`` distinct terms lexicographically (Lucene
        MultiTermQuery rewrite cap), score as a disjunction with per-term
        idf. ``*`` is the only wildcard; the rest of the pattern is
        analyzed like a term."""
        raw = pattern.strip().lower()
        if not raw or raw.replace("*", "") == "":
            return _empty_result()
        # escape SQL-LIKE metacharacters, then map * → %
        like = raw.replace("%", "\\%").replace("_", "\\_").replace("*", "%")
        expanded: set[str] = set()
        for seg_meta in self.manifest["segments"]:
            seg = self._segment(seg_meta)
            hit = pc.match_like(seg._term_strings, like)
            expanded.update(seg._term_strings.filter(hit).to_pylist())
        terms = sorted(expanded)[:max_expansions]
        if not terms:
            return _empty_result()
        return self._search_terms(terms, k, "or")

    def search_regexp(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> pa.Table:
        """ES ``regexp`` query: the pattern is FULLY ANCHORED against each
        dictionary term (Lucene regexp semantics), expanded with one
        vectorized RE2 kernel per segment, capped at ``max_expansions``
        distinct terms lexicographically, scored as a disjunction with
        per-term idf. Both Arrow and DuckDB run RE2, so the oracle
        (``regexp_full_match``) sees the identical term set for any RE2
        pattern."""
        raw = pattern.strip().lower()
        if not raw:
            return _empty_result()
        anchored = f"^(?:{raw})$"
        expanded: set[str] = set()
        for seg_meta in self.manifest["segments"]:
            seg = self._segment(seg_meta)
            hit = pc.match_substring_regex(seg._term_strings, anchored)
            expanded.update(seg._term_strings.filter(hit).to_pylist())
        terms = sorted(expanded)[:max_expansions]
        if not terms:
            return _empty_result()
        return self._search_terms(terms, k, "or")

    def msearch(
        self,
        queries: list[str],
        k: int = 10,
        mode: str = "and",
    ) -> pa.Table:
        """Batched multi-query top-k (ES ``_msearch`` analog — the reference
        fires one bulk request per sync cycle, search/views/document.py).

        The point is AMORTIZATION, which is what makes offline query
        workloads (ranking evals, decontamination-by-search, percolation
        sweeps) viable at scale: the segment list is swept ONCE for all Q
        queries — each segment is opened once, the df lookup for the union
        of all query terms is ONE TermStats call (one bucket-file touch per
        hash bucket instead of per query), and a term shared by several
        queries is decoded once into the segment's postings LRU and reused.
        Per-query early-termination thresholds (θ) carry across segments
        exactly as in ``search``, so results are identical to Q independent
        ``search`` calls — asserted in tests.

        Returns one table (query, doc_id, score): each query's top-k stacked
        in input order. Duplicate query strings are evaluated once."""
        uniq_queries = list(dict.fromkeys(queries))
        qterms = {q: sorted(set(analyzer.tokenize_query(q, self.analyzer_version))) for q in uniq_queries}
        union_terms = sorted({t for ts in qterms.values() for t in ts})
        dfs = self.df(union_terms) if union_terms else {}
        idf_map = {
            t: float(bm25.idf(self.n_docs, dfs[t]))
            for t in union_terms
            if dfs[t] > 0
        }
        live: dict[str, list[str] | None] = {}
        for q, ts in qterms.items():
            if not ts or (mode == "and" and any(dfs[t] == 0 for t in ts)):
                live[q] = None
                continue
            lt = [t for t in ts if dfs[t] > 0]
            live[q] = lt or None
        parts: dict[str, list] = {q: [] for q in uniq_queries}
        theta = {q: -np.inf for q in uniq_queries}
        for seg_meta in self.manifest["segments"]:
            seg = self._segment(seg_meta)
            exclude = tombstones_for_segment(
                self._tomb_ids, self._tomb_vers,
                seg_meta.get("created_version", self.manifest["_version"]),
            )
            for q in uniq_queries:
                lt = live[q]
                if lt is None:
                    continue
                d, s = search_segment(
                    seg, lt, idf_map, self.avgdl, k,
                    mode=mode, threshold=theta[q], exclude=exclude,
                )
                parts[q].append((d, s))
                if s.size >= k:
                    kth = np.sort(s)[-k]
                    theta[q] = max(theta[q], kth - ROUND_MARGIN)
        empty = pa.table({
            "query": pa.array([], pa.string()),
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        })
        out = [empty]
        for q in uniq_queries:
            res = merge_topk(parts[q], k) if live[q] is not None else _empty_result()
            out.append(
                pa.table({
                    "query": pa.array([q] * res.num_rows, pa.string()),
                    "rank": res["rank"],
                    "doc_id": res["doc_id"],
                    "score": res["score"],
                })
            )
        return pa.concat_tables(out)

    def _search_terms(
        self,
        terms: list[str],
        k: int,
        mode: str,
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
        neg_terms: list[str] | None = None,
        min_should_match: int | None = None,
    ) -> pa.Table:
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
        for seg_meta in self.manifest["segments"]:
            seg = self._segment(seg_meta)
            exclude = tombstones_for_segment(
                self._tomb_ids, self._tomb_vers,
                seg_meta.get("created_version", self.manifest["_version"]),
            )
            if neg_terms:
                neg_parts = [exclude] if exclude.size else []
                for nt in neg_terms:
                    p = seg.postings(nt)
                    if p is not None and p[0].size:
                        neg_parts.append(p[0])
                if neg_parts:
                    exclude = np.unique(np.concatenate(neg_parts))
            d, s = search_segment(
                seg, terms, idf_map, self.avgdl, k, mode=mode, threshold=theta,
                exclude=exclude, include=seg.allowed_docs(filters), recency=recency,
                min_should_match=min_should_match,
            )
            parts.append((d, s))
            if s.size >= k and recency is None:
                kth = np.sort(s)[-k]
                theta = max(theta, kth - ROUND_MARGIN)
        return merge_topk(parts, k)

    def search_phrase(
        self,
        phrase: str,
        k: int = 10,
        filters: dict[str, list] | None = None,
    ) -> pa.Table:
        """Exact-phrase top-k (simple_query_string quoted-phrase parity,
        core/models/search/query.py:81-86): docs containing the query terms
        adjacently in order, BM25-scored with phrase frequency as tf and the
        phrase's own document frequency as df (Lucene PhraseQuery semantics).
        Requires an index built with ``store_positions=True``."""
        terms = analyzer.tokenize_query(phrase, self.analyzer_version)  # order + duplicates kept
        if not terms:
            return _empty_result()
        matches: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        df = 0
        for seg_meta in self.manifest["segments"]:
            seg = self._segment(seg_meta)
            if not seg.has_positions:
                raise ValueError(
                    "phrase search needs positions — build_index(store_positions=True)"
                )
            docs, ptf = phrase_match_segment(seg, terms)
            if docs.size == 0:
                continue
            exclude = tombstones_for_segment(
                self._tomb_ids, self._tomb_vers,
                seg_meta.get("created_version", self.manifest["_version"]),
            )
            if exclude.size:
                keep = ~np.isin(docs, exclude)
                docs, ptf = docs[keep], ptf[keep]
            df += int(docs.size)  # live docs with the phrase, pre-filter
            include = seg.allowed_docs(filters)
            if include is not None:
                keep = np.isin(docs, include)
                docs, ptf = docs[keep], ptf[keep]
            if docs.size:
                matches.append((docs, ptf, seg.doc_lengths(docs)))
        if not matches or df == 0:
            return _empty_result()
        term_idf = float(bm25.idf(self.n_docs, df))
        parts = [
            (docs, bm25.score(ptf, dl, term_idf, self.avgdl))
            for docs, ptf, dl in matches
        ]
        return merge_topk(parts, k)

    def search_proximity(
        self,
        phrase: str,
        k: int = 10,
        *,
        slop: int = 0,
        filters: dict[str, list] | None = None,
    ) -> pa.Table:
        """Ordered proximity top-k (ES ``match_phrase`` with ``slop``,
        ordered-span semantics): a doc matches where the query terms occur
        IN ORDER within a window of at most ``len(terms) + slop`` token
        positions. tf = number of distinct start positions that open at
        least one valid window (the minimal-completion chain — greedy next
        occurrence per term — is valid iff ANY chain is, so this equals
        the oracle's exists-chain count). Scored like ``search_phrase``:
        BM25 with span frequency as tf and span document frequency as df.
        Requires ``store_positions=True``."""
        terms = analyzer.tokenize_query(phrase, self.analyzer_version)
        if not terms:
            return _empty_result()
        matches: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        df = 0
        for seg_meta in self.manifest["segments"]:
            seg = self._segment(seg_meta)
            if not seg.has_positions:
                raise ValueError(
                    "proximity search needs positions — build_index(store_positions=True)"
                )
            docs, ptf = proximity_match_segment(seg, terms, slop)
            if docs.size == 0:
                continue
            exclude = tombstones_for_segment(
                self._tomb_ids, self._tomb_vers,
                seg_meta.get("created_version", self.manifest["_version"]),
            )
            if exclude.size:
                keep = ~np.isin(docs, exclude)
                docs, ptf = docs[keep], ptf[keep]
            df += int(docs.size)
            include = seg.allowed_docs(filters)
            if include is not None:
                keep = np.isin(docs, include)
                docs, ptf = docs[keep], ptf[keep]
            if docs.size:
                matches.append((docs, ptf, seg.doc_lengths(docs)))
        if not matches or df == 0:
            return _empty_result()
        term_idf = float(bm25.idf(self.n_docs, df))
        parts = [
            (docs, bm25.score(ptf, dl, term_idf, self.avgdl))
            for docs, ptf, dl in matches
        ]
        return merge_topk(parts, k)


def _cached_match(seg: SegmentReader, key: tuple, compute):
    hit = seg._match_cache.get(key)
    if hit is not None:
        seg.cache_hits += 1
        seg._match_cache.move_to_end(key)
        return hit
    out = compute()
    seg.cache_misses += 1
    seg._match_cache[key] = out
    if len(seg._match_cache) > seg._match_cache_cap:
        seg._match_cache.popitem(last=False)
    return out


def proximity_match_segment(
    seg: SegmentReader, terms: list[str], slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """Docs of one segment containing ``terms`` in order within a span of
    ``len(terms) + slop`` positions, with the span frequency (distinct valid
    start positions). Fully vectorized greedy chain over packed
    ``(local_doc << 31) | pos`` keys: for each candidate start, the minimal
    next-occurrence of each subsequent term is found with one searchsorted
    per term; the greedy chain minimizes the final position for a given
    start, so its span test is equivalent to the exists-any-chain test.
    Results are served from the segment's match cache."""
    return _cached_match(
        seg, ("prox", slop, *terms),
        lambda: _proximity_match_segment_uncached(seg, terms, slop),
    )


def _proximity_match_segment_uncached(
    seg: SegmentReader, terms: list[str], slop: int
) -> tuple[np.ndarray, np.ndarray]:
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    mask = (np.int64(1) << 31) - 1

    starts = seg.packed_positions(terms[0])
    if starts is None or starts.size == 0:
        return empty
    chain = starts
    for t in terms[1:]:
        keys = seg.packed_positions(t)
        if keys is None or keys.size == 0:
            return empty
        idx = np.searchsorted(keys, chain, side="right")
        ok = idx < keys.size
        nxt = keys[np.minimum(idx, keys.size - 1)]
        ok &= (nxt >> 31) == (chain >> 31)  # same doc
        starts, chain = starts[ok], nxt[ok]
        if starts.size == 0:
            return empty
    span = (chain & mask) - (starts & mask)  # >= n-1 by construction
    ok = span <= (len(terms) - 1 + slop)
    starts = starts[ok]
    if starts.size == 0:
        return empty
    uniq, ptf = np.unique(starts >> 31, return_counts=True)
    return seg.doc_ids[uniq], ptf.astype(np.int64)


def phrase_match_segment(
    seg: SegmentReader, terms: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """Docs of one segment containing ``terms`` as an exact adjacent phrase,
    with the phrase frequency. Vectorized adjacency: term i contributes keys
    ``(local_doc << 31) | (pos - i)``; a phrase occurrence is a key present
    for EVERY term, found by iterative sorted-set intersection. Positions are
    < 2^31 (1M-char truncation) and local doc indices < 2^31, so the packed
    key fits int64. Results are served from the segment's match cache."""
    return _cached_match(
        seg, ("phrase", *terms),
        lambda: _phrase_match_segment_uncached(seg, terms),
    )


def _phrase_match_segment_uncached(
    seg: SegmentReader, terms: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    mask = (np.int64(1) << 31) - 1
    keys: np.ndarray | None = None
    for i, t in enumerate(terms):
        packed = seg.packed_positions(t)
        if packed is None:
            return empty
        # (local << 31) | (pos - i) == packed - i whenever pos >= i (no
        # borrow into the doc field) — one vectorized subtract per term on
        # a warm cache instead of re-decoding positions per query
        if i == 0:
            k = packed
        else:
            k = packed[(packed & mask) >= i] - i
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if keys.size == 0:
            return empty
    start_local = (keys >> 31).astype(np.int64)
    uniq, ptf = np.unique(start_local, return_counts=True)
    return seg.doc_ids[uniq], ptf.astype(np.int64)


def match_one_segment(
    seg,
    terms: list[str],
    mode: str,
    exclude: np.ndarray | None,
    include: np.ndarray | None,
) -> np.ndarray:
    """Exact match enumeration for one segment (k=∞, no scoring): posting
    intersections (``and``, rarest-first with early exit) or unions
    (``or``), minus tombstones, intersected with the facet-filter allowed
    set. Shared by the in-process extras and the actor-pool serving path."""
    matched: np.ndarray | None = None
    for t in sorted(terms, key=lambda t: seg.entry(t)["df"] if seg.entry(t) else 0):
        p = seg.postings(t)
        d = p[0] if p else np.empty(0, np.int64)
        if matched is None:
            matched = d
        elif mode == "and":
            matched = np.intersect1d(matched, d, assume_unique=True)
        else:
            matched = np.union1d(matched, d)
        if mode == "and" and matched.size == 0:
            break
    if matched is None or matched.size == 0:
        return np.empty(0, np.int64)
    if exclude is not None and exclude.size:
        matched = matched[~np.isin(matched, exclude)]
    if include is not None:
        matched = np.intersect1d(matched, include, assume_unique=True)
    return matched


class QuerySegmentActor:
    """Actor holding a set of segments, loaded once (SURVEY §2.3 stateful
    stage). Use via ``QueryService``."""

    def __init__(self, index_root: str, seg_metas: list[dict], manifest: dict):
        tomb_ids, tomb_vers = parse_tombstones(manifest)
        cur_version = manifest.get("_version", 0)
        self.readers = []
        for m in seg_metas:
            reader = SegmentReader(os.path.join(index_root, m["path"]))
            exclude = tombstones_for_segment(
                tomb_ids, tomb_vers, m.get("created_version", cur_version)
            )
            self.readers.append((m, reader, exclude))
        # largest segment first: wave 1 of the cross-actor θ protocol scans
        # readers[0] only, so the biggest slice yields the tightest bound
        self.readers.sort(key=lambda r: -int(r[1].doc_ids.size))
        self.avgdl = float(manifest["avgdl"])

    def _search_readers(
        self,
        readers,
        terms: list[str],
        idf_map: dict[str, float],
        k: int,
        mode: str,
        filters: dict[str, list] | None,
        recency: dict | None,
        theta0: float = -np.inf,
    ) -> tuple[np.ndarray, np.ndarray]:
        parts = []
        theta = theta0
        for _, seg, exclude in readers:
            d, s = search_segment(
                seg, terms, idf_map, self.avgdl, k, mode=mode, threshold=theta,
                exclude=exclude, include=seg.allowed_docs(filters), recency=recency,
            )
            parts.append((d, s))
            # propagate the actor-local k-th score as a block-max pruning
            # threshold into this actor's remaining segments (same early-θ
            # the in-process reader uses)
            if s.size >= k and recency is None:
                kth = np.sort(s)[-k]
                theta = max(theta, kth - ROUND_MARGIN)
        docs = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.float64)
        return _topk(docs, scores, k)

    def search(
        self,
        terms: list[str],
        idf_map: dict[str, float],
        k: int,
        mode: str,
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self._search_readers(
            self.readers, terms, idf_map, k, mode, filters, recency
        )

    def search_many(
        self,
        batch: list[tuple[list, dict, int, str]],
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """ES ``_msearch`` analog, actor side: one RPC carries a whole
        batch of (terms, idf_map, k, mode) requests; the actor answers all
        of them over its segments. Amortizes the ~4.5 ms per-RPC floor and
        the driver's GIL across the batch (the r4 concurrency sweep
        measured the sequential path degrading past ~4 concurrent
        client threads for exactly those reasons)."""
        return [
            self._search_readers(self.readers, terms, idf_map, k, mode, None, None)
            for terms, idf_map, k, mode in batch
        ]

    def warm(self, terms: list[str], idf_map: dict[str, float], avgdl: float) -> int:
        """ES index-warmer analog: pre-populate the postings, position and
        score caches for ``terms`` across this actor's segments so the
        first client query pays no decode (the 64x soak measured cold p50
        5.3x warm). Returns the number of (segment, term) entries now
        hot."""
        n = 0
        for _, seg, _ in self.readers:
            for t in terms:
                if t in idf_map and seg.scored_postings(t, idf_map[t], avgdl) is not None:
                    n += 1
        return n

    def stats(self) -> dict:
        """Serving observability (the soak leg's per-actor memory + LRU
        evidence): resident set size from /proc plus the summed postings-
        cache counters across this actor's segment readers."""
        rss_kb = 0
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        rss_kb = int(line.split()[1])
                        break
        except OSError:
            pass
        return {
            "rss_kb": rss_kb,
            "n_segments": len(self.readers),
            "cache_hits": sum(r.cache_hits for _, r, _ in self.readers),
            "cache_misses": sum(r.cache_misses for _, r, _ in self.readers),
        }

    def search_first(
        self,
        terms: list[str],
        idf_map: dict[str, float],
        k: int,
        mode: str,
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Wave 1 of the cross-actor θ protocol: this actor's LARGEST
        segment only (readers are sorted by doc count at init, so wave 1
        covers the biggest slice of the corpus and yields the tightest
        global threshold)."""
        return self._search_readers(
            self.readers[:1], terms, idf_map, k, mode, filters, recency
        )

    def search_rest(
        self,
        terms: list[str],
        idf_map: dict[str, float],
        k: int,
        mode: str,
        theta0: float,
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Wave 2: the remaining segments, seeded with the GLOBAL k-th
        score from wave 1 (minus ROUND_MARGIN — the same tie-protection
        invariant as the local θ), so cold blocks across the whole pool are
        skipped from the first decoded segment on."""
        if len(self.readers) <= 1:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return self._search_readers(
            self.readers[1:], terms, idf_map, k, mode, filters, recency,
            theta0=theta0,
        )

    def phrase_match(
        self, terms: list[str], filters: dict[str, list] | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Per-actor phrase matches: (docs, phrase_tf, dl, df_pre_filter).
        Scoring happens on the driver once the global phrase df is known."""
        doc_parts, ptf_parts, dl_parts = [], [], []
        df = 0
        for _, seg, exclude in self.readers:
            docs, ptf = phrase_match_segment(seg, terms)
            if docs.size == 0:
                continue
            if exclude.size:
                keep = ~np.isin(docs, exclude)
                docs, ptf = docs[keep], ptf[keep]
            df += int(docs.size)
            include = seg.allowed_docs(filters)
            if include is not None:
                keep = np.isin(docs, include)
                docs, ptf = docs[keep], ptf[keep]
            if docs.size:
                doc_parts.append(docs)
                ptf_parts.append(ptf)
                dl_parts.append(seg.doc_lengths(docs))
        if not doc_parts:
            z = np.empty(0, np.int64)
            return z, z, z, df
        return (
            np.concatenate(doc_parts),
            np.concatenate(ptf_parts),
            np.concatenate(dl_parts),
            df,
        )

    def _matches(self, terms, mode, filters):
        for _, seg, exclude in self.readers:
            m = match_one_segment(
                seg, terms, mode, exclude, seg.allowed_docs(filters)
            )
            if m.size:
                yield seg, m

    def match_stats(
        self,
        terms: list[str],
        mode: str,
        filters: dict[str, list] | None,
        count_fields: list[str] | None,
    ) -> tuple[int, dict[str, dict[str, int]]]:
        """Actor-local results_total + per-field value counts over this
        actor's segments; the driver sums the partial dicts."""
        total = 0
        counts: dict[str, dict[str, int]] = {f: {} for f in (count_fields or [])}
        for seg, matched in self._matches(terms, mode, filters):
            total += int(matched.size)
            for f in counts:
                vals = seg.attr_values(f, matched)
                uniq, cnt = np.unique(vals, return_counts=True)
                for v, c in zip(uniq, cnt):
                    counts[f][str(v)] = counts[f].get(str(v), 0) + int(c)
        return total, counts

    def match_attr_page(
        self,
        terms: list[str],
        mode: str,
        filters: dict[str, list] | None,
        field: str,
        desc: bool,
        limit: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Actor-local top-``limit`` matches ordered by a stored attribute
        (ties doc_id asc): a page can only contain rows within the first
        ``limit`` of each shard's own ordering, so O(actors × limit) rows
        reach the driver merge (the per-shard from+size bound)."""
        doc_parts, val_parts = [], []
        for seg, matched in self._matches(terms, mode, filters):
            svals = np.asarray(seg.attr_values(field, matched))
            if matched.size > limit:
                codes = np.unique(svals, return_inverse=True)[1]
                sel = np.lexsort((matched, -codes if desc else codes))[:limit]
                matched, svals = matched[sel], svals[sel]
            doc_parts.append(matched)
            val_parts.append(svals)
        if not doc_parts:
            return np.empty(0, np.int64), np.empty(0, object)
        docs = np.concatenate(doc_parts)
        vals = np.concatenate(val_parts)
        if docs.size > limit:
            codes = np.unique(vals, return_inverse=True)[1]
            sel = np.lexsort((docs, -codes if desc else codes))[:limit]
            docs, vals = docs[sel], vals[sel]
        return docs, vals

    def prefix_vocab(
        self, prefix: str, min_len: int, max_len: int
    ) -> tuple[list[str], np.ndarray]:
        """(term, df) pairs from this actor's segments whose terms start
        with ``prefix`` and have length in [min_len, max_len] — the
        did_you_mean candidate set, enumerated from the sorted dictionary
        range only (never a vocabulary scan)."""
        agg: dict[str, int] = {}
        for _, seg, _ in self.readers:
            lo, hi = _term_prefix_range(seg, prefix)
            if hi <= lo:
                continue
            sl = seg._term_strings.slice(lo, hi - lo).to_pylist()
            dfs = seg._df[lo:hi]
            for t, d in zip(sl, dfs):
                if min_len <= len(t) <= max_len:
                    agg[t] = agg.get(t, 0) + int(d)
        terms = sorted(agg)
        return terms, np.fromiter((agg[t] for t in terms), dtype=np.int64,
                                  count=len(terms))


def _term_prefix_range(seg, prefix: str) -> tuple[int, int]:
    """[lo, hi) rows of the segment's sorted term dictionary starting with
    ``prefix`` — O(log V) binary search with scalar probes."""
    arr = seg._term_strings
    n = len(arr)

    def bisect(key: str) -> int:
        lo, hi = 0, n
        while lo < hi:
            mid = (lo + hi) // 2
            if arr[mid].as_py() < key:
                lo = mid + 1
            else:
                hi = mid
        return lo

    return bisect(prefix), bisect(prefix + "\U0010ffff")


class QueryService:
    """Distributed query serving: segments spread over an actor pool; search
    fans out and merges per-actor top-k heaps (the OpenSearch shard fan-out
    analog). Actors are created once and reused across queries."""

    def __init__(
        self,
        index_root: str,
        version: int | None = None,
        num_actors: int = 4,
        two_wave: bool = False,
    ):
        import ray

        self.two_wave = bool(two_wave)
        self.manifest = mf.read_manifest(index_root, version)
        self.analyzer_version = self.manifest.get("analyzer", "v1")
        self.avgdl = float(self.manifest["avgdl"])
        self.n_docs = int(self.manifest["n_docs"])
        self._termstats = TermStats(
            os.path.join(index_root, self.manifest["termstats"]),
            self.manifest.get("num_buckets"),
        )
        segs = self.manifest["segments"]
        num_actors = max(1, min(num_actors, len(segs)))
        groups: list[list[dict]] = [segs[i::num_actors] for i in range(num_actors)]
        actor_cls = ray.remote(num_cpus=1)(QuerySegmentActor)
        self.actors = [actor_cls.remote(index_root, g, self.manifest) for g in groups]

    def df(self, terms: list[str]) -> dict[str, int]:
        return self._termstats.df(terms)

    def msearch(
        self,
        queries: list[tuple[str, str]],
        k: int = 10,
    ) -> list[pa.Table]:
        """ES ``_msearch``: answer a batch of (query_text, mode) requests
        with ONE round-trip per actor for the whole batch instead of one
        per (query, actor). Results are per-query tables identical to
        ``search``'s. Throughput shape: RPC count drops from Q x A to A,
        and the driver touches only Q x A x k merged rows."""
        import ray

        prepped: list[tuple[list, dict, int, str] | None] = []
        for query_text, mode in queries:
            terms = sorted(set(analyzer.tokenize_query(query_text, self.analyzer_version)))
            if not terms:
                prepped.append(None)
                continue
            dfs = self.df(terms)
            if mode == "and" and any(dfs[t] == 0 for t in terms):
                prepped.append(None)
                continue
            live = [t for t in terms if dfs[t] > 0]
            if not live:
                prepped.append(None)
                continue
            idf_map = {t: float(bm25.idf(self.n_docs, dfs[t])) for t in live}
            prepped.append((live, idf_map, k, mode))
        batch = [p for p in prepped if p is not None]
        if not batch:
            return [_empty_result() for _ in queries]
        per_actor = ray.get([a.search_many.remote(batch) for a in self.actors])
        out: list[pa.Table] = []
        bi = 0
        for p in prepped:
            if p is None:
                out.append(_empty_result())
            else:
                out.append(merge_topk([pa_res[bi] for pa_res in per_actor], k))
                bi += 1
        return out

    def warm(self, query_texts: list[str]) -> int:
        """Pre-warm every actor's caches for the union of the queries'
        terms (deploy-time warmer; the reference's OpenSearch delegates
        the same to index warmers). Returns total (segment, term) entries
        made hot."""
        import ray

        terms = sorted({
            t for q in query_texts for t in analyzer.tokenize_query(q, self.analyzer_version)
        })
        if not terms:
            return 0
        dfs = self.df(terms)
        live = [t for t in terms if dfs[t] > 0]
        idf_map = {t: float(bm25.idf(self.n_docs, dfs[t])) for t in live}
        return sum(ray.get([
            a.warm.remote(live, idf_map, self.avgdl) for a in self.actors
        ]))

    def actor_stats(self) -> list[dict]:
        """Per-actor {rss_kb, n_segments, cache_hits, cache_misses}."""
        import ray

        return ray.get([a.stats.remote() for a in self.actors])

    def shutdown(self) -> None:
        """Release the actor pool's CPU reservations. Serving actors are
        created with num_cpus=1 and live until killed — on a cluster where
        they occupy every slot, any later Ray work (a Dataset read, a task)
        deadlocks waiting for a CPU. Call when done serving; the service is
        unusable afterwards."""
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def search(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "and",
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
    ) -> pa.Table:
        import ray

        terms = sorted(set(analyzer.tokenize_query(query_text, self.analyzer_version)))
        if not terms:
            return _empty_result()
        dfs = self.df(terms)
        if mode == "and" and any(dfs[t] == 0 for t in terms):
            return _empty_result()
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return _empty_result()
        idf_map = {t: float(bm25.idf(self.n_docs, dfs[t])) for t in terms}
        # two-wave cross-actor θ: wave 1 scans each actor's largest segment,
        # the driver derives the GLOBAL k-th score, wave 2 scans the rest
        # seeded with it. OFF by default — measured on the 600k-turn bench
        # index (interleaved A/B, same process, 2/4/8 actors): two-wave is
        # consistently ~4-5 ms SLOWER at every pool size, because with
        # round-robin segment assignment the segments are iid corpus samples,
        # so each actor's LOCAL θ after its own first (largest) segment is
        # already ≈ the global θ, while the extra fan-out round-trip costs a
        # fixed ~4.5 ms barrier. Opt in (QueryService(two_wave=True)) for
        # score-heterogeneous layouts — time- or source-partitioned segments
        # where one shard holds most of the top-k and local θs are weak.
        # Invalid bounds (recency reshapes scores) force single-wave.
        two_wave = (
            self.two_wave
            and recency is None
            and len(self.actors) > 1
            and len(self.manifest["segments"]) > len(self.actors)
        )
        if not two_wave:
            futures = [
                a.search.remote(terms, idf_map, k, mode, filters, recency)
                for a in self.actors
            ]
            return merge_topk(ray.get(futures), k)
        wave1 = ray.get([
            a.search_first.remote(terms, idf_map, k, mode, filters, recency)
            for a in self.actors
        ])
        scores1 = np.concatenate([p[1] for p in wave1]) if wave1 else np.empty(0)
        theta0 = -np.inf
        if scores1.size >= k:
            theta0 = float(np.sort(scores1)[-k] - ROUND_MARGIN)
        wave2 = ray.get([
            a.search_rest.remote(terms, idf_map, k, mode, theta0, filters, recency)
            for a in self.actors
        ])
        return merge_topk(wave1 + wave2, k)

    # -- async search (ES _async_search) ------------------------------------

    def submit(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "and",
        filters: dict[str, list] | None = None,
        recency: dict | None = None,
    ) -> str:
        """ES ``_async_search`` submit: start the per-actor fan-out and
        return a search id immediately. The in-flight Ray futures ARE the
        async state — no coordinator actor, no polling thread; ``status``
        peeks with a zero-timeout ``ray.wait``, ``get`` blocks and merges,
        ``cancel`` propagates ``ray.cancel`` to the actors."""
        if not hasattr(self, "_async"):
            self._async: dict[str, tuple] = {}
            self._async_seq = 0
        self._async_seq += 1
        sid = f"async-{self._async_seq}"
        terms = sorted(set(analyzer.tokenize_query(query_text, self.analyzer_version)))
        dfs = self.df(terms) if terms else {}
        live = [t for t in terms if dfs.get(t, 0) > 0]
        if not live or (mode == "and" and len(live) < len(terms)):
            self._async[sid] = ("done", _empty_result())
            return sid
        idf_map = {t: float(bm25.idf(self.n_docs, dfs[t])) for t in live}
        futures = [
            a.search.remote(live, idf_map, k, mode, filters, recency)
            for a in self.actors
        ]
        self._async[sid] = ("running", futures, k)
        return sid

    def status(self, search_id: str) -> dict:
        """``{"is_running": bool}`` — zero-timeout peek, never blocks."""
        import ray

        st = self._async_state(search_id)
        if st[0] == "done":
            return {"is_running": False}
        _, futures, _k = st
        _, pending = ray.wait(futures, num_returns=len(futures), timeout=0)
        return {"is_running": bool(pending)}

    def get(self, search_id: str) -> pa.Table:
        """Block until complete and merge. ES ``_async_search`` semantics:
        the result stays retrievable (repeated GETs return the cached merge)
        until the id is explicitly deleted — the futures tuple is replaced
        with ``("done", result)`` on first completion."""
        import ray

        st = self._async_state(search_id)
        if st[0] == "done":
            return st[1]
        _, futures, k = st
        result = merge_topk(ray.get(futures), k)
        self._async[search_id] = ("done", result)
        return result

    def delete(self, search_id: str) -> dict:
        """ES ``DELETE _async_search/<id>``: cancel if still running,
        release the state. Unknown/already-deleted ids return
        ``{"found": False}`` instead of raising (the ES 404 shape)."""
        import ray

        st = self._async.pop(search_id, None) if hasattr(self, "_async") else None
        if st is None:
            return {"acknowledged": False, "found": False}
        if st[0] != "done":
            for f in st[1]:
                ray.cancel(f, force=False)
        return {"acknowledged": True, "found": True}

    def cancel(self, search_id: str) -> dict:
        """Alias for :meth:`delete` (ES cancels via the DELETE endpoint)."""
        return self.delete(search_id)

    def _async_state(self, search_id: str):
        if not hasattr(self, "_async") or search_id not in self._async:
            raise KeyError(f"unknown async search id {search_id!r}")
        return self._async[search_id]

    def search_phrase(
        self,
        phrase: str,
        k: int = 10,
        filters: dict[str, list] | None = None,
    ) -> pa.Table:
        """Distributed exact-phrase top-k: actors enumerate matches + local
        stats in one fan-out; the driver computes the global phrase df, idf,
        and final BM25 scores (phrase df is a query-time aggregate, so
        scoring can't complete actor-locally)."""
        import ray

        terms = analyzer.tokenize_query(phrase, self.analyzer_version)
        if not terms:
            return _empty_result()
        parts = ray.get([a.phrase_match.remote(terms, filters) for a in self.actors])
        df = int(sum(p[3] for p in parts))
        if df == 0:
            return _empty_result()
        term_idf = float(bm25.idf(self.n_docs, df))
        scored = [
            (docs, bm25.score(ptf, dl, term_idf, self.avgdl))
            for docs, ptf, dl, _ in parts
            if docs.size
        ]
        return merge_topk(scored, k)

    def _live_terms(self, query_text: str, mode: str) -> list[str] | None:
        """Query terms with df>0, or None when an AND query is unmatchable."""
        terms = sorted(set(analyzer.tokenize_query(query_text, self.analyzer_version)))
        if not terms:
            return None
        dfs = self.df(terms)
        live = [t for t in terms if dfs.get(t, 0) > 0]
        if not live or (mode == "and" and len(live) < len(terms)):
            return None
        return live

    def match_counts(
        self,
        query_text: str,
        *,
        mode: str = "and",
        count_fields: list[str] | None = None,
        filters: dict[str, list] | None = None,
    ) -> dict:
        """Distributed ``results_total`` + ``include_filter_counts``: one
        fan-out, driver sums the per-actor partial count dicts."""
        import ray

        live = self._live_terms(query_text, mode)
        if live is None:
            return {"results_total": {"value": 0, "is_precise": True},
                    "filter_counts": {}}
        parts = ray.get([
            a.match_stats.remote(live, mode, filters, count_fields)
            for a in self.actors
        ])
        total = sum(p[0] for p in parts)
        counts: dict[str, dict[str, int]] = {f: {} for f in (count_fields or [])}
        for _, pc in parts:
            for f, vals in pc.items():
                for v, c in vals.items():
                    counts[f][v] = counts[f].get(v, 0) + c
        return {"results_total": {"value": total, "is_precise": True},
                "filter_counts": counts}

    def search_page(
        self,
        query_text: str,
        *,
        page: int = 1,
        page_size: int = 10,
        mode: str = "and",
        ordering: str | None = None,
        filters: dict[str, list] | None = None,
    ) -> pd.DataFrame:
        """Distributed paginated search, semantics identical to
        ``extras.search_page`` (relevance slice or attribute ordering)."""
        import ray

        if page < 1:
            raise ValueError("page is 1-based")
        lo, hi = (page - 1) * page_size, page * page_size
        if ordering is None:
            res = self.search(query_text, k=hi, mode=mode, filters=filters).to_pandas()
            out = res.iloc[lo:hi].reset_index(drop=True)
            out["rank"] = np.arange(lo + 1, lo + 1 + len(out), dtype=np.int32)
            return out
        desc = ordering.startswith("-")
        field = ordering[1:] if desc else ordering
        live = self._live_terms(query_text, mode)
        if live is None:
            return pd.DataFrame({"rank": pd.Series(dtype=np.int32),
                                 "doc_id": pd.Series(dtype=np.int64),
                                 field: pd.Series(dtype=object)})
        parts = ray.get([
            a.match_attr_page.remote(live, mode, filters, field, desc, hi)
            for a in self.actors
        ])
        docs = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        vals = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, object)
        codes = np.unique(vals, return_inverse=True)[1] if vals.size else np.empty(0, np.int64)
        order = np.lexsort((docs, -codes if desc else codes))
        sel = order[lo:hi]
        return pd.DataFrame({
            "rank": np.arange(lo + 1, lo + 1 + sel.size, dtype=np.int32),
            "doc_id": docs[sel],
            field: vals[sel],
        })

    def did_you_mean(
        self,
        query_text: str,
        *,
        max_edits: int = 2,
        prefix_length: int = 1,
    ) -> pd.DataFrame:
        """Distributed spelling suggestions: candidate (term, df) ranges are
        enumerated on the actors (each scans only its own segments' sorted
        dictionary prefix range), merged and ranked on the driver with the
        same rules as ``extras.did_you_mean``."""
        import ray

        from .extras import _best_suggestion

        tokens = sorted(set(analyzer.tokenize_query(query_text, self.analyzer_version)))
        if not tokens:
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "suggestion": pd.Series(dtype=object)})
        dfs = self.df(tokens)
        out = []
        for tok in tokens:
            if dfs.get(tok, 0) > 0 or len(tok) < prefix_length:
                out.append((tok, ""))
                continue
            parts = ray.get([
                a.prefix_vocab.remote(
                    tok[:prefix_length], len(tok) - max_edits, len(tok) + max_edits
                )
                for a in self.actors
            ])
            agg: dict[str, int] = {}
            for terms, part_dfs in parts:
                for t, d in zip(terms, part_dfs):
                    agg[t] = agg.get(t, 0) + int(d)
            out.append((tok, _best_suggestion(tok, agg, max_edits)))
        return pd.DataFrame(out, columns=["token", "suggestion"])


# ---------------------------------------------------------------------------
# Independent distributed brute-force scorer (the verification oracle path:
# map_batches scorer + sort(score desc).limit(k), SURVEY §2.6)
# ---------------------------------------------------------------------------


def brute_force_topk(
    ds,
    query_text: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "and",
) -> pa.Table:
    """Score every document with BM25 directly from the corpus — no index.

    Pass 1 (streaming): per-batch partials of (n_docs, dl_sum, df per query
    term) → driver-side reduce (tiny). Pass 2: per-batch exact scores →
    global ``sort(score desc, doc_id asc).limit(k)``. Independent of the
    index code path; used as the in-engine oracle.
    """
    terms = sorted(set(analyzer.tokenize_query(query_text)))
    if not terms:
        return _empty_result()
    term_arr = pa.array(terms)

    def stats_partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        dl_sum = int(rows.size)
        r, c, _tf = analyzer.term_frequencies(rows, codes)
        present = np.asarray(pc.is_in(dictionary, value_set=term_arr))
        dfs = []
        dict_list = dictionary.to_pylist()
        code_df = np.bincount(c, minlength=len(dict_list))
        for t in terms:
            try:
                ti = dict_list.index(t)
                dfs.append(int(code_df[ti]))
            except ValueError:
                dfs.append(0)
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "dl_sum": pa.array([dl_sum], pa.int64()),
                **{f"df_{i}": pa.array([dfs[i]], pa.int64()) for i in range(len(terms))},
            }
        )

    stats = ds.map_batches(stats_partials, batch_format="pyarrow").to_pandas()
    n_docs = int(stats["n_docs"].sum())
    dl_sum = int(stats["dl_sum"].sum())
    avgdl = dl_sum / n_docs if n_docs else 0.0
    dfs = {terms[i]: int(stats[f"df_{i}"].sum()) for i in range(len(terms))}
    if mode == "and" and any(dfs[t] == 0 for t in terms):
        return _empty_result()
    live_terms = [t for t in terms if dfs[t] > 0]
    if not live_terms:
        return _empty_result()
    idf_map = {t: float(bm25.idf(n_docs, dfs[t])) for t in live_terms}

    def score_batch(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        dl = np.bincount(rows, minlength=batch.num_rows).astype(np.float64)
        r, c, tf = analyzer.term_frequencies(rows, codes)
        dict_list = dictionary.to_pylist()
        scores = np.zeros(batch.num_rows, dtype=np.float64)
        nmatch = np.zeros(batch.num_rows, dtype=np.int64)
        for t in live_terms:
            try:
                ti = dict_list.index(t)
            except ValueError:
                continue
            sel = c == ti
            rr = r[sel]
            scores[rr] += bm25.score(tf[sel].astype(np.float64), dl[rr], idf_map[t], avgdl)
            nmatch[rr] += 1
        need = len(live_terms) if mode == "and" else 1
        keep = nmatch >= need
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], pa.int64()),
                "score": pa.array(scores[keep], pa.float64()),
                "neg_score": pa.array(-scores[keep], pa.float64()),
            }
        )

    scored = ds.map_batches(score_batch, batch_format="pyarrow")
    top = scored.sort(["neg_score", "doc_id"]).limit(k).to_pandas()
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32)),
            "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
            "score": pa.array(top["score"].to_numpy(), pa.float64()),
        }
    )
