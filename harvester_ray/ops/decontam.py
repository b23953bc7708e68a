"""Benchmark decontamination: flag corpus docs overlapping an eval set.

A training-data pipeline must drop documents that contain evaluation-set
content (n-gram collision decontamination, as in GPT-3 App. C / PaLM /
The Pile): build the set of word n-grams occurring in the benchmark, then
flag every corpus document sharing at least one. The reference's analog is
its set-membership hygiene (one live doc per identity, validation filters
`/root/reference/harvester/products/tasks/products.py:26-45`); the n-gram
overlap test is the scale generalization.

Shape for 100 TB: the benchmark side is SMALL by definition (eval sets are
MBs, not TBs) — its distinct n-gram hash set is collected once, sorted, and
broadcast via ``ray.put`` (CLAUDE.md rule: broadcast numpy arrays, not
dicts); the corpus side streams through one ``map_batches`` doing a
vectorized ``np.searchsorted`` membership test per batch. No shuffle, no
join, no driver materialization of corpus data.

Shingle hashing reuses the near-dup tokenizer/hash path (`ops/dedup.py`),
so engine and oracle share one n-gram definition; 64-bit hash collisions
(~n²/2⁶⁴) are the standard accepted error of hashed decontamination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from harvester_ray import analyzer
from harvester_ray.ops.dedup import _batch_shingles, _dedup_doc_shingles


def benchmark_ngram_hashes(bench_ds, *, text_col: str = "text", shingle_n: int = 5) -> np.ndarray:
    """Distinct word-``shingle_n``-gram hashes of the benchmark corpus.

    Runs distributed (per-batch shingling), then collects ONLY the uint64
    hash column — bounded by the benchmark's vocabulary, never the corpus.
    Returns a sorted unique uint64 array ready for ``np.searchsorted``.
    """

    def to_hashes(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        _, sh_h = _dedup_doc_shingles(*_batch_shingles(text, shingle_n))
        return pa.table({"h": pa.array(np.unique(sh_h).view(np.int64), pa.int64())})

    parts = bench_ds.map_batches(
        to_hashes, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(parts):
        return np.empty(0, dtype=np.uint64)
    return np.unique(parts["h"].to_numpy().view(np.uint64))


def decontaminate(
    corpus_ds,
    bench_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
):
    """Per-doc overlap with the benchmark n-gram set.

    Returns (doc_id, n_ngrams, n_contaminated, contaminated): distinct
    n-grams of the doc, how many occur in the benchmark, and the drop flag
    (any overlap). Callers filter ``contaminated == False`` for the clean
    corpus.
    """
    import ray

    bench_ref = ray.put(benchmark_ngram_hashes(bench_ds, text_col=text_col, shingle_n=shingle_n))

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        sh_doc, sh_h = _dedup_doc_shingles(*_batch_shingles(text, shingle_n))
        n = len(ids)
        n_ngrams = np.zeros(n, dtype=np.int64)
        n_hit = np.zeros(n, dtype=np.int64)
        if sh_doc.size:
            np.add.at(n_ngrams, sh_doc, 1)
            if bench.size:
                pos = np.searchsorted(bench, sh_h)
                pos[pos == bench.size] = 0
                hit = bench[pos] == sh_h
                np.add.at(n_hit, sh_doc[hit], 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_ngrams": pa.array(n_ngrams, pa.int64()),
                "n_contaminated": pa.array(n_hit, pa.int64()),
                "contaminated": pa.array(n_hit > 0),
            }
        )

    return corpus_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_sql(
    table: str = "documents",
    *,
    bench_pred: str = "doc_id % 13 = 0",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> str:
    """Oracle: same n-gram overlap by string equality (no hashing).

    ``bench_pred`` selects the benchmark rows out of ``table`` — the gate
    uses a deterministic id slice of the same corpus so both sides derive
    the benchmark identically.
    """
    tok = analyzer.sql_tokenize_expr(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(ts) = 0 THEN []
              WHEN len(ts) < {shingle_n} THEN [array_to_string(ts, ' ')]
              ELSE list_distinct([array_to_string(ts[i : i + {shingle_n} - 1], ' ')
                                 for i in range(1, len(ts) - {shingle_n} + 2)])
         END AS shingles
  FROM toks
),
bench AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh
  WHERE doc_id IN (SELECT {id_col} FROM {table} WHERE {bench_pred})
),
expl AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
),
hits AS (
  SELECT e.doc_id, count(*) AS n_hit
  FROM expl e JOIN bench b ON e.s = b.s
  GROUP BY e.doc_id
)
SELECT sh.doc_id,
       len(sh.shingles) AS n_ngrams,
       coalesce(h.n_hit, 0) AS n_contaminated,
       coalesce(h.n_hit, 0) > 0 AS contaminated
FROM sh LEFT JOIN hits h ON sh.doc_id = h.doc_id
ORDER BY sh.doc_id
""".strip()


def _phrase_hash(tokens: tuple[str, ...]) -> np.uint64:
    """The same polynomial-rolled 64-bit hash _batch_shingles computes for
    a window equal to this token sequence."""
    from harvester_ray.ops.dedup import _H64_MUL, _vocab_hash64

    th = _vocab_hash64(pa.array(list(tokens), pa.string()))
    h = th[0]
    for k in range(1, len(th)):
        h = h * _H64_MUL + th[k]
    return h


def phrase_decontaminate(
    corpus_ds,
    phrases: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact-phrase decontamination (the GPT-3/Llama 'exact match' mode,
    complementing ``decontaminate``'s fixed-n overlap): flag every corpus
    doc whose token stream contains any benchmark phrase VERBATIM at the
    phrase's own length — short exact strings (answer keys, prompts) don't
    need a global shingle n.

    Shape: phrases are benchmark-sized; their hashes broadcast per distinct
    length L, and the corpus streams through one ``map_batches`` doing one
    vectorized L-shingle pass per distinct L (|distinct lengths| is tiny).
    Returns (doc_id, n_hits, contaminated) — n_hits counts occurrences
    across all phrases. Hash collisions (~2^-64 per window) are the
    standard accepted error of hashed decontamination.
    """
    import ray

    from harvester_ray.ops.dedup import _batch_shingles

    tokenized = [tuple(analyzer.tokenize_query(p)) for p in phrases]
    by_len: dict[int, list[np.uint64]] = {}
    for t in tokenized:
        if t:
            by_len.setdefault(len(t), []).append(_phrase_hash(t))
    needles = {
        L: np.unique(np.asarray(hs, dtype=np.uint64))
        for L, hs in by_len.items()
    }
    needles_ref = ray.put(needles)

    def score(batch: pa.Table) -> pa.Table:
        nd = ray.get(needles_ref)
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        n_hits = np.zeros(len(ids), dtype=np.int64)
        for L, hs in nd.items():
            sh_doc, sh_h = _batch_shingles(text, L)
            if sh_doc.size == 0:
                continue
            pos = np.searchsorted(hs, sh_h)
            pos[pos == hs.size] = 0
            hit = hs[pos] == sh_h
            np.add.at(n_hits, sh_doc[hit], 1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return corpus_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def phrase_decontaminate_sql(
    table: str = "documents",
    *,
    phrase_docs: tuple[tuple[int, int], ...] = ((7, 6), (21, 4)),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for ``phrase_decontaminate`` with phrases derived from the
    corpus itself: for each ``(doc_id, L)`` in ``phrase_docs`` the phrase
    is that doc's first L tokens (both sides derive it identically).
    Occurrences counted by exact list equality per sliding window."""
    tok = analyzer.sql_tokenize_expr(text_col)
    needle_ctes = ",\n".join(
        f"n{i} AS (SELECT ts[1 : {L}] AS nt{i} FROM toks WHERE doc_id = {d})"
        for i, (d, L) in enumerate(phrase_docs)
    )
    joins = " ".join(f"CROSS JOIN n{i}" for i in range(len(phrase_docs)))
    hit_terms = " + ".join(
        f"len([i for i in range(1, len(ts) - {L} + 2)"
        f" if ts[i : i + {L} - 1] = nt{i}])"
        for i, (_d, L) in enumerate(phrase_docs)
    )
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
{needle_ctes}
SELECT doc_id,
       CAST({hit_terms} AS BIGINT) AS n_hits,
       ({hit_terms}) > 0 AS contaminated
FROM toks {joins} ORDER BY doc_id
""".strip()


def semantic_decontam(
    emb_ds,
    *,
    bench_mod: int = 97,
    tau: float = 0.9,
    scale: float = 1e4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Embedding-similarity decontamination: flag corpus vectors whose best
    cosine similarity against a benchmark (eval-set) embedding exceeds
    ``tau`` — the semantic sibling of the n-gram overlap test above, as in
    contamination audits of instruction-tuning sets (paraphrased eval
    leakage that exact n-grams miss). The reference analog is the same
    set-membership hygiene cited in this module's header.

    The benchmark here is the deterministic subset ``vec_id % bench_mod ==
    0`` of the same table (no external data); everything else is corpus.

    Shape for 100 TB: the benchmark side is SMALL by definition — its
    quantized matrix is broadcast once via ``ray.put``; the corpus streams
    through one ``map_batches`` doing an integer matmul per batch. No
    shuffle, no join.

    Oracle-exact discipline (the mmr_rerank rule): components quantize to
    ints at ``scale``; sim = dot/(√n_a·√n_b) from exact integer dot/norms
    with one mirrored float op order, quantized to 1e-6 ints BEFORE the
    max over benchmark rows (ties pick the lower bench id); ``tau`` must be
    a multiple of 1e-4 so the flag threshold is exact at sim6 precision.
    Returns (vec_id, bench_id, max_sim, contaminated) for corpus vectors,
    empty when the benchmark subset is empty (mirroring the oracle's inner
    join against an empty bench CTE).
    """
    import math

    import pandas as pd
    import ray

    tau6 = round(tau * 1e6)
    if abs(tau6 / 1e6 - tau) > 1e-9:
        raise ValueError("tau must be a multiple of 1e-4")

    from harvester_ray.ops.similarity import _batch_matrix

    def bench_only(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        return batch.filter(pa.array(ids % bench_mod == 0))

    bench = emb_ds.map_batches(bench_only, batch_format="pyarrow").to_pandas()
    cols = ["vec_id", "bench_id", "max_sim", "contaminated"]
    if bench.empty:
        return pd.DataFrame(columns=cols)
    bench = bench.sort_values(id_col)
    b_ids = bench[id_col].to_numpy(np.int64)
    bq = np.floor(
        np.stack(bench[vec_col].to_numpy()).astype(np.float64) * scale + 0.5
    ).astype(np.int64)
    b_norm = (bq * bq).sum(axis=1)
    bref = ray.put((b_ids, bq, b_norm))

    def score(batch: pa.Table) -> pa.Table:
        ids_b, bqm, bnn = ray.get(bref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        keep = ids % bench_mod != 0
        ids = ids[keep]
        if ids.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "bench_id": pa.array([], pa.int64()),
                    "max_sim": pa.array([], pa.float64()),
                    "contaminated": pa.array([], pa.bool_()),
                }
            )
        mat = _batch_matrix(batch, vec_col)[keep]
        qm = np.floor(mat * scale + 0.5).astype(np.int64)
        dots = qm @ bqm.T  # (B, n_bench) exact integer
        norms = (qm * qm).sum(axis=1)
        # one mirrored float expression: dot / (sqrt(na) * sqrt(nb))
        denom = np.sqrt(norms.astype(np.float64))[:, None] * np.sqrt(
            bnn.astype(np.float64)
        )[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom > 0, dots.astype(np.float64) / denom, 0.0)
        sim6 = np.floor(sim * 1e6 + 0.5).astype(np.int64)
        best = np.argmax(sim6, axis=1)  # first max = lowest bench id (sorted)
        best_s6 = sim6[np.arange(ids.size), best]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bench_id": pa.array(ids_b[best], pa.int64()),
                "max_sim": pa.array(best_s6 / 1e6, pa.float64()),
                "contaminated": pa.array(best_s6 >= tau6),
            }
        )

    out = emb_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values("vec_id").reset_index(drop=True)[cols]


def semantic_decontam_sql(
    table: str = "embeddings",
    *,
    bench_mod: int = 97,
    tau: float = 0.9,
    scale: float = 1e4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle for ``semantic_decontam``: identical integer quantization
    (mmr_rerank_sql's qz/flat/norms chain) and per-pair 1e-6 quantization
    before the per-corpus-vector argmax."""
    tau6 = round(tau * 1e6)
    sim = (
        "CASE WHEN na.n = 0 OR nb.n = 0 THEN CAST(0 AS BIGINT) "
        "ELSE CAST(floor(CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n AS DOUBLE)) * "
        "sqrt(CAST(nb.n AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) END"
    )
    return f"""
WITH qz AS (
  SELECT {id_col} AS vec_id,
         list_transform(CAST({vec_col} AS DOUBLE[]),
                        x -> CAST(floor(x * {scale!r} + 0.5) AS BIGINT)) AS qv
  FROM {table}
),
flat AS (
  SELECT vec_id, unnest(qv) AS e, generate_subscripts(qv, 1) AS i FROM qz
),
norms AS (SELECT vec_id, sum(e * e) AS n FROM flat GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS cid, b.vec_id AS bid, sum(a.e * b.e) AS dot
  FROM flat a JOIN flat b ON a.i = b.i
  WHERE a.vec_id % {bench_mod} != 0 AND b.vec_id % {bench_mod} = 0
  GROUP BY a.vec_id, b.vec_id
),
sims AS (
  SELECT d.cid, d.bid, {sim} AS sim6
  FROM dots d
  JOIN norms na ON na.vec_id = d.cid
  JOIN norms nb ON nb.vec_id = d.bid
)
SELECT cid AS vec_id, bid AS bench_id,
       sim6 / 1e6 AS max_sim,
       sim6 >= {tau6} AS contaminated
FROM sims
QUALIFY row_number() OVER (PARTITION BY cid ORDER BY sim6 DESC, bid ASC) = 1
ORDER BY cid
""".strip()
