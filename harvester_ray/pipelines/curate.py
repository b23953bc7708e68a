"""End-to-end training-data curation: filter → decontaminate → split → dedup.

The composition pipeline a 100-TB corpus actually runs before indexing or
training, assembled from the individual operators (each separately
oracle-verified) in the order a real curation stack applies them:

1. repetition filter   (ops/text_analysis.repetition — Gopher-style rules;
                        batch-local, zero shuffle)
2. decontamination     (ops/decontam — broadcast benchmark n-gram set;
                        zero shuffle)
3. split selection     (ops/sampling.assign_split — row-local hash; zero
                        shuffle)
4. near-dup dedup      (ops/dedup + ops/cluster — the only shuffling
                        stages, run LAST so the quadratic-ish candidate
                        work sees the smallest corpus)

The reference's lifecycle analog is the harvest chain: validation filter →
set-integrity guard → upsert-dedup → index push
(`/root/reference/harvester/products/tasks/products.py:26-45`,
`/root/reference/harvester/core/tasks/harvest/set.py:99-126`).

Stages 1-3 fuse into ONE ``map_batches`` pass over the corpus — a single
streaming read with three per-batch vectorized predicates — so the whole
pre-dedup pipeline is embarrassingly parallel with no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from harvester_ray.ops import cluster, decontam, dedup, sampling
from harvester_ray.ops.text_analysis import repetition_batch


def curate(
    docs_ds,
    bench_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    split: str = "train",
    splits: dict[str, float] | None = None,
    shingle_n_decontam: int = 5,
    shingle_n_dedup: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = None,
    dedup_method: str = "jaccard",
    pairing: str = "all",
    referenced_only: bool = False,
):
    """Curated-corpus Dataset: quality-filtered, decontaminated, one split,
    near-dup-deduplicated (min-id representative kept).

    ``max_bucket``: hot-shingle cap for the near-dup stage (passed through
    to ``near_dup_jaccard``). None = exact (every shared-shingle pair is a
    candidate) — right for gate-scale corpora; at 10M+ docs a Zipf-headed
    vocabulary makes common shingles pair quadratically (measured: 1.05B
    candidate rows from 1.2M short turns), so pass e.g. 256 to skip
    shingles shared more widely than that. Capped shingles are the
    non-discriminative head; recall loss is bounded to pairs whose EVERY
    shared shingle is that common.

    ``dedup_method``: "jaccard" (default) enumerates every shared-shingle
    pair — exact, right for gate-scale and high-entropy corpora, but on
    low-entropy text the candidate mass is O(corpus x max_bucket)
    (measured: 77M candidates from 1.2M Zipf-headed turns even at
    max_bucket=256). "minhash" uses LSH banding (a candidate must agree on
    rows_per_band consecutive minhashes, vastly more selective) with the
    same exact-Jaccard verify and threshold — the 10M+-doc path."""
    import ray

    bench_ref = ray.put(
        decontam.benchmark_ngram_hashes(
            bench_ds, text_col=text_col, shingle_n=shingle_n_decontam
        )
    )
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}

    def keep_stage(batch: pa.Table) -> pa.Table:
        # 1) repetition rules (batch-local)
        rep = repetition_batch(batch, id_col=id_col, text_col=text_col)
        mask = ~np.asarray(rep["repetitive"])
        batch = batch.filter(pa.array(mask))
        if batch.num_rows == 0:
            return batch
        # 2) benchmark overlap (broadcast set, vectorized membership)
        bench = ray.get(bench_ref)
        from harvester_ray.ops.dedup import _batch_shingles, _dedup_doc_shingles
        from harvester_ray import analyzer

        text = analyzer.normalize_text(batch[text_col])
        sh_doc, sh_h = _dedup_doc_shingles(
            *_batch_shingles(text, shingle_n_decontam)
        )
        hit = np.zeros(batch.num_rows, dtype=bool)
        if sh_doc.size and bench.size:
            pos = np.searchsorted(bench, sh_h)
            pos[pos == bench.size] = 0
            np.logical_or.at(hit, sh_doc[bench[pos] == sh_h], True)
        batch = batch.filter(pa.array(~hit))
        if batch.num_rows == 0:
            return batch
        # 3) split membership (row-local hash)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        names = list(splits)
        cuts = np.cumsum([splits[n] for n in names])
        cuts[-1] = 1.0 + 1e-9
        idx = np.searchsorted(cuts, sampling._hash_frac(ids, 12345), side="right")
        return batch.filter(pa.array(idx == names.index(split)))

    filtered = docs_ds.map_batches(
        keep_stage, batch_format="pyarrow", zero_copy_batch=True
    )
    # 4) near-dup dedup over the (much smaller) surviving corpus
    if dedup_method == "minhash":
        pairs = dedup.near_dup_minhash(
            filtered.select_columns([id_col, text_col]),
            shingle_n=shingle_n_dedup,
            threshold=jaccard_threshold,
            pairing=pairing,
            referenced_only=referenced_only,
        )
    else:
        pairs = dedup.near_dup_jaccard(
            filtered.select_columns([id_col, text_col]),
            shingle_n=shingle_n_dedup,
            threshold=jaccard_threshold,
            max_bucket=max_bucket,
        )
    return cluster.dedup_corpus(filtered, pairs, id_col=id_col)


def curate_sql(
    table: str = "documents",
    *,
    bench_pred: str = "doc_id % 13 = 0",
    splits: dict[str, float] | None = None,
    split: str = "train",
    shingle_n_decontam: int = 5,
    shingle_n_dedup: int = 3,
    jaccard_threshold: float = 0.8,
    cols: str = "doc_id, text, lang, source, n_chars",
) -> str:
    """Oracle: the same four stages composed from the per-operator SQL."""
    from harvester_ray.ops.text_analysis import repetition_sql

    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names])
    frac = sampling._sql_frac("doc_id", 12345)
    i = names.index(split)
    lo = 0.0 if i == 0 else cuts[i - 1]
    split_pred = (
        f"({frac} >= {lo} AND {frac} < {cuts[i]})"
        if i < len(names) - 1
        else f"({frac} >= {lo})"
    )
    filtered = f"""(
      SELECT {cols} FROM {table}
      WHERE doc_id IN (SELECT doc_id FROM ({repetition_sql(table)}) WHERE NOT repetitive)
        AND doc_id IN (SELECT doc_id FROM ({decontam.decontaminate_sql(table, bench_pred=bench_pred, shingle_n=shingle_n_decontam)}) WHERE NOT contaminated)
        AND {split_pred}
    )"""
    pairs_sql = dedup.ngram_jaccard_sql(
        filtered, shingle_n=shingle_n_dedup, threshold=jaccard_threshold
    )
    return cluster.dedup_corpus_sql(pairs_sql, filtered)
