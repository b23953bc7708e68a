"""Deterministic sampling: hash splits and stratified mixture sampling.

Training-data pipelines need reproducible, partition-independent corpus
splits (train/val/test) and per-stratum downsampling (language/source
mixture weights) — assignments must be a pure function of the row identity,
never of block layout, worker count, or RNG state (the same discipline the
reference applies to identity: srn is computed, not assigned,
`/root/reference/harvester/core/models/datatypes/document.py:58-60`; its
test corpora are deterministic sequences,
`/root/reference/harvester/testing/utils/generators.py:13-28`).

Mechanism: Knuth multiplicative hashing on the integer id —
``frac = ((id * 2654435761 + salt) mod 2^32) / 2^32`` — exact integer
arithmetic that DuckDB reproduces verbatim, fully vectorized in numpy, no
shuffle (each row decides locally inside ``map_batches``). Valid for ids
< 2^31 (no int64 overflow in the product); beyond that, widen to a 128-bit
mix on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = 2654435761
_MOD = 1 << 32


def _hash_frac(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform-ish fraction in [0, 1) per id."""
    return ((ids * _KNUTH + salt) % _MOD).astype(np.float64) / _MOD


def _sql_frac(id_col: str, salt: int) -> str:
    return f"((({id_col} * {_KNUTH} + {salt}) % {_MOD}) * 1.0 / {_MOD})"


def assign_split(
    ds,
    *,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: int = 12345,
):
    """Add a ``split`` column: named ranges over the hash fraction.

    ``splits`` maps name → fraction (must sum to ≤ 1; remainder falls into
    the last split). Assignment order follows dict order, e.g.
    {"train": .8, "val": .1, "test": .1} → train = frac < .8,
    val = .8 ≤ frac < .9, test = rest.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names])
    cuts[-1] = 1.0 + 1e-9  # remainder → last split

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        frac = _hash_frac(ids, salt)
        idx = np.searchsorted(cuts, frac, side="right")
        labels = np.array(names, dtype=object)[idx]
        return t.append_column("split", pa.array(labels, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def split_summary_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: int = 12345,
    weight_col: str = "n_chars",
) -> str:
    """Oracle: per-split row count + weight sum with identical arithmetic."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names])
    frac = _sql_frac(id_col, salt)
    cases = " ".join(
        f"WHEN {frac} < {cuts[i]} THEN '{names[i]}'" for i in range(len(names) - 1)
    )
    return f"""
SELECT CASE {cases} ELSE '{names[-1]}' END AS split,
       count(*) AS n_docs,
       CAST(sum({weight_col}) AS BIGINT) AS sum_weight
FROM {table}
GROUP BY split ORDER BY split
""".strip()


def stratified_sample(
    ds,
    *,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: int = 777,
):
    """Keep each row with its stratum's probability, deterministically.

    The mixture-weights primitive: ``rates`` maps stratum value → keep
    fraction; unlisted strata use ``default_rate``. Row-local decision
    (hash fraction < rate), so the sample is stable under any
    repartitioning and needs no shuffle or global state.
    """
    keys = sorted(rates)
    key_arr = np.array(keys, dtype=object)
    rate_arr = np.array([rates[k] for k in keys], dtype=np.float64)

    def keep(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        strata = t[strata_col].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(key_arr, strata)
        pos_clip = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        matched = (
            (key_arr[pos_clip] == strata) if len(keys) else np.zeros(len(strata), bool)
        )
        rate = np.where(matched, rate_arr[pos_clip] if len(keys) else 0.0, default_rate)
        return t.filter(pa.array(_hash_frac(ids, salt) < rate))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds,
    *,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 424242,
):
    """Top-k weighted sample without replacement (Efraimidis–Spirakis).

    Each row gets key = u^(1/w) with u a deterministic hash-uniform of its
    id; the k largest keys form an exact weighted sample without
    replacement. Distributed as per-batch local top-k (map_batches) then a
    tiny driver merge of O(k × blocks) rows — the same bounded-merge shape
    as `knn_cosine`; no shuffle, no RNG state. Mirrors the reference's
    deterministic-identity discipline (srn is computed, not drawn,
    `/root/reference/harvester/core/models/datatypes/document.py:58-60`).

    Rows with weight ≤ 0 are excluded. Keys are computed in log space
    (log(u)/w) for numerical parity with the SQL oracle: DuckDB evaluates
    `ln(u)/w` with the same float64 operations, so ordering — and the
    rounded key — is bit-identical.
    """
    import pandas as pd

    def local_topk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        w = np.asarray(t[weight_col].combine_chunks().cast(pa.float64()))
        pos = w > 0
        ids, w = ids[pos], w[pos]
        # u in (0,1]: shift by +1 so u is never 0 → log is finite
        u = (((ids * _KNUTH + salt) % _MOD).astype(np.float64) + 1.0) / _MOD
        key = np.log(u) / w  # monotone in u^(1/w); larger = better
        if len(key) > k:
            top = np.argpartition(-key, k - 1)[:k]
            ids, key = ids[top], key[top]
        return pa.table({id_col: ids, "es_key": key})

    parts = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = parts.to_pandas()  # O(k × blocks) rows only
    df = df.sort_values(["es_key", id_col], ascending=[False, True]).head(k)
    out = df.reset_index(drop=True)
    out["es_key"] = out["es_key"].round(6)
    return pd.DataFrame({id_col: out[id_col], "es_key": out["es_key"]})


def weighted_sample_sql(
    table: str = "documents",
    *,
    k: int = 20,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: int = 424242,
) -> str:
    """Oracle: identical key arithmetic (ln((h+1)/2^32)/w), same tie-break."""
    u = f"((({id_col} * {_KNUTH} + {salt}) % {_MOD}) + 1.0) / {_MOD}"
    return f"""
SELECT {id_col}, round(ln({u}) / {weight_col}, 6) AS es_key
FROM {table}
WHERE {weight_col} > 0
ORDER BY ln({u}) / {weight_col} DESC, {id_col}
LIMIT {k}
""".strip()


def stratified_sample_sql(
    table: str = "documents",
    *,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: int = 777,
) -> str:
    """Oracle: identical per-stratum keep rule; returns surviving ids."""
    rates = rates or {}
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(rates.items()))
    rate = f"CASE {strata_col} {cases} ELSE {default_rate} END" if rates else str(default_rate)
    return f"""
SELECT {id_col}, {strata_col}
FROM {table}
WHERE {_sql_frac(id_col, salt)} < ({rate})
ORDER BY {id_col}
""".strip()


def source_mixture(
    ds,
    *,
    target_total: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 31337,
):
    """Temperature-smoothed source mixture (the multinomial-weights recipe
    training pipelines use to keep big sources from drowning small ones,
    alpha = 0.5): sampling weight w_s ∝ sqrt(n_s), per-doc keep rate
    rate_s = min(1, target_total·w_s / (Σw · n_s)), inclusion decided by
    the row-local Knuth hash — partition-independent and reproducible.

    Exact-parity construction: weights are quantized to integer nanos
    BEFORE normalization (w_q = floor(sqrt(n_s)·1e9 + 0.5)) so the only
    float steps are one IEEE-exact sqrt and two divisions mirrored
    verbatim in SQL — no cross-group float summation anywhere.

    Two streaming passes (count fold, then tagged count fold); per batch
    only per-source counters leave the tasks. Returns per-source
    (source, n_total, n_sampled)."""
    import pandas as pd
    import ray

    def count_pass(t: pa.Table) -> pa.Table:
        enc = t[source_col].combine_chunks().dictionary_encode()
        cnt = np.bincount(
            np.asarray(enc.indices), minlength=len(enc.dictionary)
        )
        return pa.table({
            "source": enc.dictionary,
            "n_s": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    counts = (
        ds.map_batches(count_pass, batch_format="pyarrow",
                       zero_copy_batch=True)
        .to_pandas()
        .groupby("source", as_index=False)["n_s"].sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    n_s = counts["n_s"].to_numpy(dtype=np.int64)
    w_q = np.floor(np.sqrt(n_s.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    denom_q = int(w_q.sum())
    rates = np.minimum(
        1.0, (target_total * w_q) / float(denom_q) / n_s
    )
    src_arr = counts["source"].to_numpy(dtype=object).astype(str)
    src_ref = ray.put(np.sort(src_arr))
    rate_ref = ray.put(rates[np.argsort(src_arr)])

    def sample_pass(t: pa.Table) -> pa.Table:
        srcs = ray.get(src_ref)
        rts = ray.get(rate_ref)
        vals = np.asarray(t[source_col].combine_chunks()).astype(str)
        idx = np.searchsorted(srcs, vals)
        ids = np.asarray(t[id_col].combine_chunks().cast(pa.int64()))
        kept = _hash_frac(ids, salt) < rts[idx]
        enc = t[source_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices)
        nd = len(enc.dictionary)
        tot = np.bincount(codes, minlength=nd)
        smp = np.bincount(codes[kept], minlength=nd)
        return pa.table({
            "source": enc.dictionary,
            "n_total": pa.array(tot.astype(np.int64), pa.int64()),
            "n_sampled": pa.array(smp.astype(np.int64), pa.int64()),
        })

    out = (
        ds.map_batches(sample_pass, batch_format="pyarrow",
                       zero_copy_batch=True)
        .to_pandas()
        .groupby("source", as_index=False)[["n_total", "n_sampled"]].sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["n_total"] = out["n_total"].astype(np.int64)
    out["n_sampled"] = out["n_sampled"].astype(np.int64)
    return out


def source_mixture_sql(
    table: str = "documents",
    *,
    target_total: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 31337,
) -> str:
    """Oracle for source_mixture: identical integer-quantized weights and
    mirrored float operation order."""
    frac = _sql_frac(f"t.{id_col}", salt)
    return f"""
WITH n AS (
  SELECT {source_col} AS source, CAST(count(*) AS BIGINT) AS n_s
  FROM {table} GROUP BY {source_col}
),
w AS (
  SELECT source, n_s,
         CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS w_q
  FROM n
),
d AS (SELECT sum(w_q) AS denom FROM w),
r AS (
  SELECT source, n_s,
         LEAST(1.0, (({target_total} * w_q) / CAST(d.denom AS DOUBLE)) / n_s)
           AS rate
  FROM w CROSS JOIN d
)
SELECT t.{source_col} AS source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE {frac} < r.rate) AS BIGINT) AS n_sampled
FROM {table} t JOIN r ON t.{source_col} = r.source
GROUP BY t.{source_col} ORDER BY t.{source_col}
""".strip()


def interleave_sources(
    ds,
    weights: dict[str, int],
    *,
    n: int,
    default_weight: int = 1,
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Deterministic weighted source interleave (the
    ``datasets.interleave_datasets`` analog with stride scheduling): source
    s emits its j-th row (doc-id order) at virtual time j/w_s; the merged
    stream orders by time, tie-broken by (source, doc_id). Weights are
    positive integers, so time keys are exact integers ``j · (L / w_s)``
    (L = lcm of weights) — no float scheduling drift, identical on any
    partitioning. Returns the stream's first ``n`` rows as
    (seq, source, doc_id).

    Scale shape: within a source the key grows with the row rank, so only
    each source's FIRST n rows can reach the global top-n — every group
    emits ≤ n rows regardless of corpus size."""
    import math

    import pandas as pd

    if any(w <= 0 or int(w) != w for w in weights.values()) or default_weight <= 0:
        raise ValueError("weights must be positive integers")
    lcm = math.lcm(default_weight, *(int(w) for w in weights.values())) if weights else default_weight

    def local(t: pa.Table) -> pa.Table:
        df = t.select([source_col, id_col]).to_pandas()
        df = df.sort_values([source_col, id_col], kind="mergesort")
        rn = df.groupby(source_col).cumcount().to_numpy() + 1
        w = (
            df[source_col].map(lambda s: int(weights.get(s, default_weight)))
            .to_numpy(dtype=np.int64)
        )
        df["key"] = rn * (lcm // w)
        df = df.sort_values(["key", source_col, id_col], kind="mergesort")
        # per-source pre-cut: only a source's first n rows can place, so at
        # most n · distinct-sources rows leave the group
        df = df[df.groupby(source_col).cumcount() < n]
        return pa.Table.from_pandas(df, preserve_index=False)

    # bucket rows by source so each source's ranks are computed once
    def add_bucket(t: pa.Table) -> pa.Table:
        import zlib

        enc = t[source_col].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        h = np.fromiter(
            (zlib.crc32(str(u).encode()) % 32 for u in uniq),
            dtype=np.int32, count=len(uniq),
        )
        codes = np.asarray(enc.indices)
        return t.append_column("bucket", pa.array(h[codes], pa.int32()))

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(local, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "seq": pd.Series(dtype=np.int64),
            "source": pd.Series(dtype=object),
            "doc_id": pd.Series(dtype=np.int64),
        })
    out = parts.sort_values(
        ["key", source_col, id_col], kind="mergesort"
    ).head(n).reset_index(drop=True)
    out["seq"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["doc_id"] = out[id_col].astype(np.int64)
    return out[["seq", "source", "doc_id"]]


def interleave_sources_sql(
    table: str = "documents",
    weights: dict[str, int] | None = None,
    *,
    n: int,
    default_weight: int = 1,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> str:
    """Oracle for interleave_sources: identical integer stride keys via a
    window rank and a CASE weight table."""
    import math

    weights = weights or {}
    lcm = math.lcm(default_weight, *(int(w) for w in weights.values())) if weights else default_weight
    cases = " ".join(
        f"WHEN '{s}' THEN {lcm // int(w)}" for s, w in sorted(weights.items())
    )
    stride = (
        f"CASE {source_col} {cases} ELSE {lcm // default_weight} END"
        if cases else f"{lcm // default_weight}"
    )
    return f"""
WITH rn AS (
  SELECT {source_col} AS source, {id_col} AS doc_id,
         row_number() OVER (PARTITION BY {source_col} ORDER BY {id_col}) AS rn
  FROM {table}
),
keyed AS (SELECT source, doc_id, rn * ({stride}) AS key FROM rn)
SELECT CAST(row_number() OVER (ORDER BY key, source, doc_id) AS BIGINT) AS seq,
       source, CAST(doc_id AS BIGINT) AS doc_id
FROM keyed ORDER BY key, source, doc_id LIMIT {n}
""".strip()
