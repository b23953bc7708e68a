"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Reference analogs: exact upsert-dedup keyed on content hash
(harvester/core/models/datatypes/document.py:131-139, 207-218;
harvester/core/processors/seed/resource.py:98-105). The near-dup family is
the 100 TB-scale extension a training-data pipeline needs.

Scale design: exact dedup is hash-partitioned (groupby on the content hash —
each group tiny); MinHash-LSH shuffles only (band_id, band_hash, doc_id)
triples, never documents; candidate verification re-reads only candidate
shingle sets. All hashes are process-independent (zlib.crc32 / md5), never
Python ``hash()``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer

_MERSENNE = (1 << 61) - 1


def _content_hash_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    text = pc.fill_null(batch[text_col], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in text.to_pylist()]
    return pa.table(
        {
            "text_hash": pa.array(hashes, pa.string()),
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
        }
    )


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: content-hash → hash-partitioned groupby → keep the first
    (min doc_id) per group. Returns (text_hash, doc_id) of survivors."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda t: _content_hash_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))


def exact_dedup_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    return (
        f"SELECT md5(coalesce({text_col}, '')) AS text_hash, min({id_col}) AS doc_id "
        f"FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def _shingle_hashes(tokens: list[str], n: int) -> np.ndarray:
    """crc32 of each word n-gram (deterministic across processes)."""
    if len(tokens) < n:
        joined = " ".join(tokens)
        return np.array([zlib.crc32(joined.encode())], dtype=np.uint64) if tokens else np.empty(0, np.uint64)
    return np.array(
        [zlib.crc32(" ".join(tokens[i : i + n]).encode()) for i in range(len(tokens) - n + 1)],
        dtype=np.uint64,
    )


def _doc_tokens(batch_text: pa.Array) -> list[list[str]]:
    rows, codes, dictionary = analyzer.tokenize_flat(batch_text)
    vocab = dictionary.to_pylist()
    n = len(batch_text)
    toks = np.asarray([vocab[c] for c in codes], dtype=object)
    bounds = np.searchsorted(rows, np.arange(1, n))
    return [list(part) for part in np.split(toks, bounds)]


_MINHASH_PRIME = (1 << 31) - 1  # Mersenne 2^31-1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MINHASH_PRIME, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MINHASH_PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod (2^31-1) over 32-bit shingle hashes.

    Fully vectorized: a < 2^31 and x < 2^32 keep a*x+b < 2^63 so the whole
    (P, S) product grid fits uint64 with no overflow."""
    if sh.size == 0:
        return np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = sh.astype(np.uint64)
    grid = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MINHASH_PRIME)
    return grid.min(axis=1)


def minhash_lsh_candidates(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
):
    """Stage 1+2 of MinHash-LSH: per-doc signatures → (band_id, band_hash,
    doc_id) rows → groupby band bucket → candidate pairs (a < b), deduped.

    Only O(docs × bands) tiny rows are shuffled. Returns a Dataset of
    (doc_a, doc_b).
    """
    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        out_band, out_hash, out_doc = [], [], []
        for i, toks in enumerate(_doc_tokens(text)):
            sig = minhash_signature(_shingle_hashes(toks, shingle_n), a, b)
            for bi in range(bands):
                seg = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                h = zlib.crc32(seg.tobytes())
                out_band.append(bi)
                out_hash.append(h)
                out_doc.append(ids[i])
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ai, bi = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bi]})

    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Count

    # dedupe pairs that collide in multiple bands
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def jaccard_verify_pairs(
    pairs_ds,
    docs_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
):
    """Stage 3: exact n-gram Jaccard on candidate pairs. The shingle-set
    lookup side is broadcast (ray.put) — correct while candidate docs fit a
    worker (at larger scale: semi-join candidates against the corpus and
    verify per bucket). Returns (doc_a, doc_b, jaccard) with
    jaccard >= threshold."""
    import ray

    def to_shingles(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        sh = [
            np.unique(_shingle_hashes(toks, shingle_n))
            for toks in _doc_tokens(text)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingles": pa.array([s.tolist() for s in sh], pa.list_(pa.uint64())),
            }
        )

    shingle_tbl = docs_ds.map_batches(to_shingles, batch_format="pyarrow").to_pandas()
    lookup = {
        int(d): np.asarray(s, dtype=np.uint64)
        for d, s in zip(shingle_tbl["doc_id"], shingle_tbl["shingles"])
    }
    ref = ray.put(lookup)

    def verify(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        da = np.asarray(batch["doc_a"].combine_chunks().cast(pa.int64()))
        db = np.asarray(batch["doc_b"].combine_chunks().cast(pa.int64()))
        out_a, out_b, out_j = [], [], []
        for x, y in zip(da, db):
            sa, sb = lk.get(int(x)), lk.get(int(y))
            if sa is None or sb is None or (sa.size == 0 and sb.size == 0):
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(int(x))
                out_b.append(int(y))
                out_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def near_dup_minhash(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
):
    """Full MinHash-LSH near-dup pipeline → (doc_a, doc_b, jaccard)."""
    cands = minhash_lsh_candidates(
        ds, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        num_perm=num_perm, bands=bands,
    )
    return jaccard_verify_pairs(
        cands, ds, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        threshold=threshold,
    )


def jaccard_candidates_exact(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_bucket: int | None = None,
):
    """Exact (non-approximate) candidate generation: inverted shingle buckets.

    Emits one (shingle_hash, doc_id) row per distinct shingle per doc, then a
    groupby(shingle) produces all pairs sharing ≥1 shingle — a complete
    candidate set for ANY Jaccard threshold > 0 (unlike MinHash bands, which
    are probabilistic). Shuffle volume is O(total distinct shingles), never
    documents. ``max_bucket`` (optional) skips pathological hot shingles
    (boilerplate n-grams) whose O(|bucket|²) pair blowup dominates at scale —
    a doc pair above a high threshold shares many shingles, so dropping a few
    hot buckets rarely loses true pairs (document the tradeoff when used).
    """
    import pandas as pd

    def to_shingle_rows(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        out_sh, out_doc = [], []
        for i, toks in enumerate(_doc_tokens(text)):
            sh = np.unique(_shingle_hashes(toks, shingle_n))
            out_sh.append(sh.astype(np.int64))
            out_doc.append(np.full(sh.size, ids[i], dtype=np.int64))
        if not out_sh:
            return pa.table(
                {"shingle": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "shingle": pa.array(np.concatenate(out_sh), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            }
        )

    rows = ds.map_batches(to_shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy())
        if ids.size < 2 or (max_bucket is not None and ids.size > max_bucket):
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ai, bi = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bi]})

    pairs = rows.groupby("shingle").map_groups(bucket_pairs, batch_format="pandas")
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_shared"))


def near_dup_jaccard(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
):
    """Exact n-gram Jaccard near-dup: complete shingle-bucket candidates →
    exact verification. Deterministically equal to the all-pairs oracle
    (``ngram_jaccard_sql``) at any threshold > 0."""
    cands = jaccard_candidates_exact(
        ds, id_col=id_col, text_col=text_col, shingle_n=shingle_n
    )
    return jaccard_verify_pairs(
        cands, ds, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        threshold=threshold,
    )


def ngram_jaccard_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> str:
    """Oracle: exact all-pairs word-n-gram Jaccard (O(n²) — oracle scale
    only). Shingles as strings; matches `_shingle_hashes` up to the hash."""
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
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.shingles, b.shingles)) AS inter,
         len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)) AS un
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.shingles) > 0 OR len(b.shingles) > 0
)
SELECT doc_a, doc_b, round(inter * 1.0 / un, 6) AS jaccard
FROM pairs WHERE un > 0 AND inter * 1.0 / un >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """64-bit SimHash over crc32 token hashes weighted by tf (vectorized
    bit-count accumulation)."""
    text = analyzer.normalize_text(batch[text_col])
    rows, codes, dictionary = analyzer.tokenize_flat(text)
    n = batch.num_rows
    ids = batch[id_col].combine_chunks().cast(pa.int64())
    vocab_hashes = np.array(
        [zlib.crc32(w.encode()) for w in dictionary.to_pylist()], dtype=np.uint64
    )
    # widen crc32 to 64 bits deterministically
    vocab_hashes = vocab_hashes * np.uint64(0x9E3779B97F4A7C15)
    r, c, tf = analyzer.term_frequencies(rows, codes)
    sums = np.zeros((n, 64), dtype=np.int64)
    if c.size:
        h = vocab_hashes[c]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = (2 * bits - 1) * tf[:, None]
        np.add.at(sums, r, contrib)
    out = (sums > 0).astype(np.uint64)
    sim = np.zeros(n, dtype=np.uint64)
    for bit in range(64):
        sim |= out[:, bit] << np.uint64(bit)
    return pa.table(
        {
            "doc_id": ids,
            "simhash": pa.array(sim.view(np.int64), pa.int64()),
        }
    )


def simhash(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: simhash_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def simhash_near_dups(ds, *, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup pairs by SimHash Hamming distance. Scale path: block on
    4 × 16-bit simhash chunks (any pair within distance 3 shares ≥1 chunk),
    groupby chunk, pairwise-verify within buckets."""
    sims = simhash(ds, id_col=id_col, text_col=text_col)

    def to_chunks(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["simhash"].combine_chunks()).view(np.uint64)
        ids = np.asarray(batch["doc_id"].combine_chunks())
        parts = []
        for k in range(4):
            chunk = ((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "chunk_id": pa.array(np.full(ids.size, k, np.int32)),
                        "chunk_val": pa.array(chunk, pa.int64()),
                        "doc_id": pa.array(ids, pa.int64()),
                        "simhash": pa.array(h.view(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    chunked = sims.map_batches(to_chunks, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().view(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64), "hamming": pd.Series([], dtype=np.int64)})
        ai, bi = np.triu_indices(ids.size, k=1)
        x = hs[ai] ^ hs[bi]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[ai][keep], "doc_b": ids[bi][keep], "hamming": ham[keep]})

    pairs = chunked.groupby(["chunk_id", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
):
    """Near-dup pairs by embedding cosine ≥ threshold. The comparison side is
    broadcast once (ray.put of the normalized matrix); each batch does one
    numpy matmul against it — O(n·d) per row, no shuffle. Scale path: LSH
    bucket (random hyperplanes) or IVF-partition both sides first."""
    import ray

    full = ds.to_pandas()
    ids_all = full[id_col].to_numpy(dtype=np.int64)
    mat = np.stack(full[vec_col].to_numpy())
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ref = ray.put((ids_all, mat.astype(np.float64)))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_b = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        vecs = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        n = np.linalg.norm(vecs, axis=1)
        n[n == 0] = 1.0
        vecs = vecs / n[:, None]
        all_ids, all_mat = ray.get(ref)
        sims = vecs @ all_mat.T
        bi, aj = np.nonzero(sims >= threshold)
        da, db_ = ids_b[bi], all_ids[aj]
        keep = da < db_
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db_[keep], pa.int64()),
                "cosine": pa.array(np.round(sims[bi, aj][keep], 6), pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def embedding_near_dups_sql(
    table: str = "embeddings",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> str:
    return f"""
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
       round(list_cosine_similarity(a.{vec_col}, b.{vec_col}), 6) AS cosine
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE list_cosine_similarity(a.{vec_col}, b.{vec_col}) >= {threshold}
ORDER BY doc_a, doc_b
""".strip()
