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


def doc_shingle_sets(
    docs_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    key_name: str = "doc_id",
    payload_name: str = "sh",
):
    """(doc_id, sh:binary) — each doc's sorted distinct shingle hashes packed
    as little-endian uint64 bytes. Binary (not list<uint64>) because Arrow's
    hash join only carries flat payload columns; np.frombuffer round-trips it
    zero-copy on the other side."""

    def to_shingles(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        blobs = [
            np.unique(_shingle_hashes(toks, shingle_n)).astype("<u8").tobytes()
            for toks in _doc_tokens(text)
        ]
        return pa.table(
            {
                key_name: pa.array(ids, pa.int64()),
                payload_name: pa.array(blobs, pa.binary()),
            }
        )

    return docs_ds.map_batches(to_shingles, batch_format="pyarrow", zero_copy_batch=True)


_VERIFY_SCHEMA = pa.schema(
    [("key", pa.int64()), ("other", pa.int64()), ("sh", pa.binary()), ("sh_x", pa.binary())]
)


def jaccard_verify_pairs(
    pairs_ds,
    docs_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
):
    """Stage 3: exact n-gram Jaccard on candidate pairs — fully distributed.

    Shingle sets are attached to candidates by co-partitioning, not by
    driver-side broadcast: the shingle table (doc_id, sh) and the candidate
    pairs are unioned under one schema and grouped by doc key twice — the
    first pass attaches doc_a's shingle blob to each pair, the second
    attaches doc_b's and computes the exact Jaccard inside the group. Each
    doc's shingle set crosses the wire once per pass regardless of how many
    candidates reference it; nothing is ever materialized on the driver.
    (Implementation note: this deliberately uses groupby/map_groups — Ray's
    sort-based exchange — rather than Dataset.join, whose hash-shuffle
    aggregator loses the schema of 0-row input blocks and a join *output*
    always contains empty partitions.) Returns (doc_a, doc_b, jaccard) with
    jaccard >= threshold.
    """
    sh = doc_shingle_sets(docs_ds, id_col=id_col, text_col=text_col, shingle_n=shingle_n)

    def doc_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t["doc_id"].combine_chunks().cast(pa.int64()),
                "other": pa.nulls(n, pa.int64()),
                "sh": t["sh"].combine_chunks(),
                "sh_x": pa.nulls(n, pa.binary()),
            },
            schema=_VERIFY_SCHEMA,
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t["doc_a"].combine_chunks().cast(pa.int64()),
                "other": t["doc_b"].combine_chunks().cast(pa.int64()),
                "sh": pa.nulls(n, pa.binary()),
                "sh_x": pa.nulls(n, pa.binary()),
            },
            schema=_VERIFY_SCHEMA,
        )

    def attach_a(g: pd.DataFrame) -> pa.Table:
        prs = g[g["other"].notna()]
        docs = g[g["other"].isna()]
        if not len(prs) or not len(docs):
            return _VERIFY_SCHEMA.empty_table()
        blob = docs["sh"].iloc[0]
        # re-key by doc_b for the second pass; carry doc_a's blob in sh_x
        return pa.table(
            {
                "key": pa.array(prs["other"].to_numpy(dtype=np.int64), pa.int64()),
                "other": pa.array(prs["key"].to_numpy(dtype=np.int64), pa.int64()),
                "sh": pa.nulls(len(prs), pa.binary()),
                "sh_x": pa.array([blob] * len(prs), pa.binary()),
            },
            schema=_VERIFY_SCHEMA,
        )

    def verify_b(g: pd.DataFrame) -> pa.Table:
        prs = g[g["sh_x"].notna()]
        docs = g[g["sh_x"].isna() & g["other"].isna()]
        out_a, out_b, out_j = [], [], []
        if len(prs) and len(docs):
            sb = np.frombuffer(docs["sh"].iloc[0], dtype="<u8")
            key = int(g["key"].iloc[0])
            for _, row in prs.iterrows():
                sa = np.frombuffer(row["sh_x"], dtype="<u8")
                if sa.size == 0 and sb.size == 0:
                    continue
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(int(row["other"]))
                    out_b.append(key)
                    out_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    doc_side = sh.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True)
    pair_side = pairs_ds.select_columns(["doc_a", "doc_b"]).map_batches(
        pair_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    stage1 = doc_side.union(pair_side).groupby("key").map_groups(attach_a, batch_format="pandas")
    stage2 = doc_side.union(stage1).groupby("key").map_groups(verify_b, batch_format="pandas")
    return stage2


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
    max_bucket: int | None = None,
):
    """Exact n-gram Jaccard near-dup: complete shingle-bucket candidates →
    exact verification. With ``max_bucket=None`` (default) this is
    deterministically equal to the all-pairs oracle (``ngram_jaccard_sql``)
    at any threshold > 0; at scale pass ``max_bucket`` (e.g. 256) to skip
    pathological boilerplate shingles whose O(|bucket|²) pair fan-out would
    otherwise pin one reducer — pairs above a high threshold share many
    shingles, so dropping a few hot buckets rarely loses true pairs."""
    cands = jaccard_candidates_exact(
        ds, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        max_bucket=max_bucket,
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


def _ids_and_normed(t: pa.Table, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
    vecs = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
    n = np.linalg.norm(vecs, axis=1)
    n[n == 0] = 1.0
    return ids, vecs / n[:, None]


def embedding_near_dups(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_digits: int = 4,
):
    """Exact near-dup pairs by embedding cosine ≥ threshold, as a distributed
    block-pair cross product: the dataset's Arrow blocks stay in the object
    store (``to_arrow_refs`` ships references, never rows, to the driver) and
    one Ray task per (block_i, block_j) pair with i ≤ j does a single float64
    matmul. Exact all-pairs semantics with O(B²) bounded tasks, no full-table
    ``to_pandas()`` and no whole-matrix broadcast; peak task memory is two
    blocks. The sub-quadratic approximate path is
    ``embedding_near_dups_lsh`` (hyperplane-bucketed).

    The threshold is applied to the cosine ROUNDED to ``round_digits`` on
    both engine and oracle side, so sub-ulp disagreement with DuckDB's
    ``list_cosine_similarity`` cannot flip boundary pairs.
    """
    import ray
    import ray.data as rd

    blocks = ds.map_batches(
        lambda t: t.select([id_col, vec_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = blocks.materialize().to_arrow_refs()

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ia, va = _ids_and_normed(ta, id_col, vec_col)
        ib, vb = _ids_and_normed(tb, id_col, vec_col)
        sims = np.round(va @ vb.T, round_digits)
        ai, bj = np.nonzero(sims >= threshold)
        da, db_ = ia[ai], ib[bj]
        if same:
            keep = da < db_  # each unordered pair appears twice in the self-product
            lo, hi, cs = da[keep], db_[keep], sims[ai, bj][keep]
        else:
            keep = da != db_  # cross-block: each pair appears once; canonicalize order
            da, db_, cs = da[keep], db_[keep], sims[ai, bj][keep]
            lo, hi = np.minimum(da, db_), np.maximum(da, db_)
        return pa.table(
            {
                "doc_a": pa.array(lo, pa.int64()),
                "doc_b": pa.array(hi, pa.int64()),
                "cosine": pa.array(cs, pa.float64()),
            }
        )

    futures = [
        block_pair.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return rd.from_arrow_refs(futures)


def embedding_near_dups_lsh(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 11,
    round_digits: int = 4,
):
    """Approximate near-dup pairs via random-hyperplane LSH — the 100 TB
    path. Each vector hashes to ``n_tables`` sign-pattern buckets
    (``n_planes`` hyperplanes per table); only pairs sharing ≥1 bucket are
    verified with an exact cosine, so nothing quadratic in the corpus ever
    runs. Shuffles only (table, bucket, doc_id, vec-bytes) rows. Recall vs
    the exact ``embedding_near_dups`` is probabilistic
    (1 - (1 - p^planes)^tables, p = 1 - angle/pi); measured in tests."""
    probe = ds.take(1)
    dim = len(probe[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def to_buckets(t: pa.Table) -> pa.Table:
        ids, vecs = _ids_and_normed(t, id_col, vec_col)
        out = []
        for ti in range(n_tables):
            bits = (vecs @ planes[ti].T) > 0  # (n, planes)
            buckets = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            out.append(
                pa.table(
                    {
                        "table_id": pa.array(np.full(ids.size, ti, np.int32)),
                        "bucket": pa.array(buckets, pa.int64()),
                        "doc_id": pa.array(ids, pa.int64()),
                        "vec": pa.array(
                            [v.astype("<f8").tobytes() for v in vecs], pa.binary()
                        ),
                    }
                )
            )
        return pa.concat_tables(out)

    rows = ds.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        if ids.size < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "cosine": pd.Series([], dtype=np.float64)}
            )
        mat = np.stack([np.frombuffer(b, dtype="<f8") for b in g["vec"]])
        sims = np.round(mat @ mat.T, round_digits)
        ai, bi = np.triu_indices(ids.size, k=1)
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {"doc_a": ids[ai][keep], "doc_b": ids[bi][keep], "cosine": sims[ai, bi][keep]}
        )

    pairs = rows.groupby(["table_id", "bucket"]).map_groups(bucket_pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    # dedupe pairs that collide in multiple tables
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("cosine", alias_name="cosine"))


def embedding_near_dups_sql(
    table: str = "embeddings",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_digits: int = 4,
) -> str:
    # CAST to DOUBLE[]: list_cosine_similarity over list<float> computes and
    # returns float32, which can never byte-match the engine's float64 path.
    cos = (
        f"list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]), "
        f"CAST(b.{vec_col} AS DOUBLE[]))"
    )
    return f"""
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
       round({cos}, {round_digits}) AS cosine
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE round({cos}, {round_digits}) >= {threshold}
ORDER BY doc_a, doc_b
""".strip()
