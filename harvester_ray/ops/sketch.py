"""Distinct-count sketching: KMV (k-minimum-values) over a column.

At 100 TB, exact ``count(DISTINCT …)`` over a high-cardinality column
(users, terms, doc hashes) is a full shuffle of every distinct value; a KMV
sketch answers it with a fixed-size state: keep the k smallest 64-bit
hashes ever seen — then ``(k-1) / (kth_min / 2^64)`` estimates the
cardinality (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"). Sketches merge by unioning and re-taking the k smallest, so the
whole computation is one streaming map pass plus an O(k·blocks) merge —
no shuffle of the data.

Unlike HyperLogLog, KMV is *exactly reproducible in SQL*: the hash is the
first 16 hex chars of md5 (DuckDB: ``('0x' || substr(md5(v), 1, 16))
::UBIGINT``), so the driver gate verifies the sketch state itself — kth
minimum, retained-hash count, and the derived estimate — value-identically,
not just approximately. The reference's analog surface is its count-based
integrity/reporting layer (`/root/reference/harvester/core/logging.py:90-133`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TWO64 = float(1 << 64)


def _md5_64(values: list[str]) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int(hashlib.md5(v.encode()).hexdigest()[:16], 16)
    return out


def kmv_distinct(ds, col: str, *, k: int = 256):
    """KMV distinct-count sketch → 1-row Dataset-compatible DataFrame.

    Returns (n_kept, kth_min, estimate): retained hash count (= k unless
    the true cardinality is smaller — then the count IS exact), the kth
    minimum hash, and the cardinality estimate. ``estimate`` equals
    ``n_kept`` exactly when fewer than k distinct values exist.
    """
    import pandas as pd

    def batch_mins(t: pa.Table) -> pa.Table:
        vals = pc.drop_null(t[col].combine_chunks().cast(pa.string())).unique()
        h = np.unique(_md5_64(vals.to_pylist()))
        if h.size > k:
            h = h[:k]  # np.unique output is sorted — smallest k
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    parts = ds.map_batches(
        batch_mins, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    merged = np.unique(parts["h"].to_numpy().view(np.uint64)) if len(parts) else np.empty(0, np.uint64)
    if merged.size > k:
        merged = merged[:k]
    n_kept = int(merged.size)
    if n_kept == 0:
        return pd.DataFrame({"n_kept": [0], "kth_min": [0], "estimate": [0.0]})
    kth = int(merged[-1])
    estimate = (
        float(n_kept)
        if n_kept < k
        else round((k - 1) / (float(merged[k - 1]) / _TWO64), 4)
    )
    return pd.DataFrame(
        {
            "n_kept": [n_kept],
            "kth_min": np.array([kth], dtype=np.uint64).view(np.int64),
            "estimate": [estimate],
        }
    )


def _alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def _bitlen(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) for x > 0, exact (vectorized binary search — float
    log2 rounds wrong near powers of two above 2^53)."""
    r = np.zeros(x.shape, np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        x[m] >>= np.uint64(s)
    return r


def hll_distinct(ds, col: str, *, p: int = 6):
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) → 1 row.

    m = 2^p registers; register j = max over values of rho (leading-zero
    rank of the hash's low 64-p bits). Per batch only the m-entry register
    vector travels to the driver; merge is an elementwise max — one
    streaming map pass, no shuffle, O(m · blocks) driver work.

    Like `kmv_distinct`, the sketch STATE is exactly reproducible in SQL
    (same md5-derived hash, integer-exact rho via `bin()` length), so the
    gate verifies (rho_sum, rho_max, n_zero) value-identically and the
    estimate — pure float arithmetic over exact integer state, identical
    operation order both sides — to 2 decimals.
    """
    import pandas as pd

    m = 1 << p
    q = 64 - p
    mask = (np.uint64(1) << np.uint64(q)) - np.uint64(1)

    def batch_regs(t: pa.Table) -> pa.Table:
        vals = pc.drop_null(t[col].combine_chunks().cast(pa.string())).unique()
        regs = np.zeros(m, dtype=np.int64)
        if len(vals):
            h = _md5_64(vals.to_pylist())
            j = (h >> np.uint64(q)).astype(np.int64)
            rem = h & mask
            rho = np.where(rem == 0, q + 1, q - _bitlen(np.maximum(rem, 1)))
            np.maximum.at(regs, j, rho)
        return pa.table({"j": pa.array(np.arange(m), pa.int64()), "rho": pa.array(regs, pa.int64())})

    parts = ds.map_batches(
        batch_regs, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    regs = np.zeros(m, dtype=np.int64)
    if len(parts):
        np.maximum.at(regs, parts["j"].to_numpy(), parts["rho"].to_numpy())
    n_zero = int((regs == 0).sum())
    big_r = q + 1
    s_int = sum(1 << (big_r - int(r)) for r in regs)  # exact integer harmonic sum
    est = _alpha(m) * m * m * float(1 << big_r) / float(s_int)
    if est <= 2.5 * m and n_zero > 0:
        est = m * float(np.log(m / n_zero))
    return pd.DataFrame(
        {
            "m": [m],
            "rho_sum": [int(regs.sum())],
            "rho_max": [int(regs.max())],
            "n_zero": [n_zero],
            "estimate": [round(est, 2)],
        }
    )


def hll_distinct_sql(table: str, col: str, *, p: int = 6) -> str:
    """Oracle: identical register state and estimate arithmetic in SQL."""
    m = 1 << p
    q = 64 - p
    big_r = q + 1
    alpha = _alpha(m)
    return f"""
WITH hashes AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 16)) AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL
),
rhos AS (
  SELECT CAST(h >> {q} AS BIGINT) AS j,
         CASE WHEN (h & {(1 << q) - 1}::UBIGINT) = 0 THEN {q + 1}
              ELSE {q} - (length(bin(h & {(1 << q) - 1}::UBIGINT)) - 1) END AS rho
  FROM hashes
),
regs AS (
  SELECT r.range AS j, coalesce(max(rhos.rho), 0) AS rho
  FROM range({m}) r LEFT JOIN rhos ON rhos.j = r.range
  GROUP BY r.range
),
st AS (
  SELECT CAST(sum(rho) AS BIGINT) AS rho_sum,
         CAST(max(rho) AS BIGINT) AS rho_max,
         CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         CAST(sum(1::BIGINT << ({big_r} - rho)) AS HUGEINT) AS s_int
  FROM regs
)
SELECT {m}::BIGINT AS m, rho_sum, rho_max, n_zero,
       round(CASE WHEN ({alpha!r} * {m} * {m} * {float(1 << big_r)!r} / CAST(s_int AS DOUBLE)) <= {2.5 * m}
                   AND n_zero > 0
                  THEN {m} * ln({m} * 1.0 / n_zero)
                  ELSE {alpha!r} * {m} * {m} * {float(1 << big_r)!r} / CAST(s_int AS DOUBLE)
             END, 2) AS estimate
FROM st
""".strip()


def kmv_distinct_sql(table: str, col: str, *, k: int = 256) -> str:
    """Oracle: identical sketch state + estimate in SQL."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 16)) AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL
),
mins AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
st AS (
  SELECT count(*) AS n_kept, max(h) AS kth FROM mins
)
SELECT CAST(n_kept AS BIGINT) AS n_kept,
       CAST(CASE WHEN kth >= CAST(9223372036854775808 AS UBIGINT)
                 THEN CAST(kth AS HUGEINT) - CAST(18446744073709551616 AS HUGEINT)
                 ELSE CAST(kth AS HUGEINT) END AS BIGINT) AS kth_min,
       CASE WHEN n_kept < {k} THEN n_kept * 1.0
            ELSE round(({k} - 1) / (kth / 18446744073709551616.0), 4)
       END AS estimate
FROM st
""".strip()


def hll_distinct_by(ds, key: str, col: str, *, p: int = 6):
    """Per-group HyperLogLog distinct count — the mergeable-sketch shape of
    `hll_distinct` with a grouping key (approx "distinct X per user" at
    scales where exact per-key sets don't fit).

    Scale shape: each batch reduces its (key, value) pairs to nonzero
    register rows ``(key, j, rho)`` — at most ``groups_in_batch × m`` rows,
    independent of value cardinality — and ONE groupby(key) folds register
    partials with an elementwise max and finalizes the estimate. Groups
    never see raw values, only m-entry register vectors; hot keys cannot
    skew a reducer beyond m rows per block. State and estimate arithmetic
    are identical to the single-sketch gate (`hll_distinct_sql`), so the
    oracle verifies (rho_sum, rho_max, n_zero) exactly and the estimate to
    2 decimals.
    """
    import pandas as pd

    m = 1 << p
    q = 64 - p
    mask = (np.uint64(1) << np.uint64(q)) - np.uint64(1)

    def batch_regs(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        df = df.dropna(subset=[col]).drop_duplicates()
        if not len(df):
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        vals = df[col].astype(str).to_numpy()
        uniq, inv = np.unique(vals, return_inverse=True)
        h = _md5_64(list(uniq))[inv]
        j = (h >> np.uint64(q)).astype(np.int64)
        rem = h & mask
        rho = np.where(rem == 0, q + 1, q - _bitlen(np.maximum(rem, 1)))
        out = pd.DataFrame({key: df[key].to_numpy(), "j": j, "rho": rho})
        out = out.groupby([key, "j"], as_index=False)["rho"].max()
        return pa.table(
            {
                key: pa.array(out[key].to_numpy().astype(np.int64), pa.int64()),
                "j": pa.array(out["j"].to_numpy(), pa.int64()),
                "rho": pa.array(out["rho"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(batch_regs, batch_format="pyarrow", zero_copy_batch=True)
    big_r = q + 1
    alpha = _alpha(m)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, g["j"].to_numpy(), g["rho"].to_numpy())
        n_zero = int((regs == 0).sum())
        s_int = sum(1 << (big_r - int(r)) for r in regs)
        est = alpha * m * m * float(1 << big_r) / float(s_int)
        if est <= 2.5 * m and n_zero > 0:
            est = m * float(np.log(m / n_zero))
        return pd.DataFrame(
            {
                key: [int(g[key].iloc[0])],
                "m": [m],
                "rho_sum": [int(regs.sum())],
                "rho_max": [int(regs.max())],
                "n_zero": [n_zero],
                "estimate": [round(est, 2)],
            }
        )

    return parts.groupby(key).map_groups(finalize, batch_format="pandas")


def hll_distinct_by_sql(table: str, key: str, col: str, *, p: int = 6) -> str:
    """Grouped oracle: identical per-key register state and estimate."""
    m = 1 << p
    q = 64 - p
    big_r = q + 1
    alpha = _alpha(m)
    return f"""
WITH hashes AS (
  SELECT DISTINCT {key} AS k,
         CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 16)) AS UBIGINT) AS h
  FROM {table} WHERE {col} IS NOT NULL
),
rhos AS (
  SELECT k, CAST(h >> {q} AS BIGINT) AS j,
         CASE WHEN (h & {(1 << q) - 1}::UBIGINT) = 0 THEN {q + 1}
              ELSE {q} - (length(bin(h & {(1 << q) - 1}::UBIGINT)) - 1) END AS rho
  FROM hashes
),
keys AS (SELECT DISTINCT k FROM hashes),
regs AS (
  SELECT keys.k, r.range AS j, coalesce(max(rhos.rho), 0) AS rho
  FROM keys CROSS JOIN range({m}) r
  LEFT JOIN rhos ON rhos.k = keys.k AND rhos.j = r.range
  GROUP BY keys.k, r.range
),
st AS (
  SELECT k,
         CAST(sum(rho) AS BIGINT) AS rho_sum,
         CAST(max(rho) AS BIGINT) AS rho_max,
         CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         CAST(sum(1::BIGINT << ({big_r} - rho)) AS HUGEINT) AS s_int
  FROM regs GROUP BY k
)
SELECT k AS {key}, {m}::BIGINT AS m, rho_sum, rho_max, n_zero,
       round(CASE WHEN ({alpha!r} * {m} * {m} * {float(1 << big_r)!r} / CAST(s_int AS DOUBLE)) <= {2.5 * m}
                   AND n_zero > 0
                  THEN {m} * ln({m} * 1.0 / n_zero)
                  ELSE {alpha!r} * {m} * {m} * {float(1 << big_r)!r} / CAST(s_int AS DOUBLE)
             END, 2) AS estimate
FROM st
ORDER BY {key}
""".strip()


def kmv_overlap(
    ds,
    *,
    key_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    k: int = 256,
):
    """KMV set-overlap sketch: estimate the Jaccard similarity and
    intersection size of two keyed sets (rows where ``label_col`` equals
    ``label_a`` vs ``label_b``) without materializing either set.

    Per batch each side contributes its k smallest distinct md5-64 key
    hashes; the merged union sketch's k smallest hashes are an unbiased
    bottom-k sample of A ∪ B, so ``jaccard ≈ |sketch ∩ A ∩ B| / |sketch|``
    (Bar-Yossef et al.'s bottom-k estimator — merge is order-independent,
    results are partition-independent and reproducible in SQL). Returns one
    row ``(n_kept, n_common, union_est, jaccard_est, inter_est)``; when
    |A ∪ B| < k every count is exact."""
    import pandas as pd

    def batch_mins(t: pa.Table) -> pa.Table:
        lab = t[label_col].combine_chunks().cast(pa.string())
        out_h, out_s = [], []
        for side, lval in ((0, label_a), (1, label_b)):
            vals = pc.drop_null(
                pc.filter(t[key_col].combine_chunks(), pc.equal(lab, lval))
            ).cast(pa.string()).unique()
            h = np.unique(_md5_64(vals.to_pylist()))[:k]
            out_h.append(h)
            out_s.append(np.full(h.size, side, np.int8))
        return pa.table(
            {
                "h": pa.array(np.concatenate(out_h).view(np.int64), pa.int64()),
                "side": pa.array(np.concatenate(out_s), pa.int8()),
            }
        )

    parts = ds.map_batches(
        batch_mins, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"n_kept": [0], "n_common": [0], "union_est": [0.0], "jaccard_est": [0.0], "inter_est": [0.0]}
        )
    h = parts["h"].to_numpy().view(np.uint64)
    side = parts["side"].to_numpy()
    in_a = np.unique(h[side == 0])
    in_b = np.unique(h[side == 1])
    union = np.unique(h)[:k]
    n_kept = int(union.size)
    common = np.intersect1d(union, np.intersect1d(in_a, in_b, assume_unique=True), assume_unique=True)
    n_common = int(common.size)
    if n_kept == 0:
        union_est = 0.0
    elif n_kept < k:
        union_est = float(n_kept)
    else:
        union_est = round((k - 1) / (float(union[k - 1]) / _TWO64), 4)
    # floor(x+0.5) fixed-point on BOTH sides: n/n_kept can land on exact
    # decimal halves (x/256), where round-half-even and half-away disagree
    jacc = float(np.floor(n_common * 1e6 / n_kept + 0.5) / 1e6) if n_kept else 0.0
    return pd.DataFrame(
        {
            "n_kept": [n_kept],
            "n_common": [n_common],
            "union_est": [union_est],
            "jaccard_est": [jacc],
            "inter_est": [float(np.floor(jacc * union_est * 1e4 + 0.5) / 1e4)],
        }
    )


def kmv_overlap_sql(
    table: str,
    *,
    key_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    k: int = 256,
) -> str:
    """Oracle: identical union sketch + overlap counts in SQL."""
    h_expr = f"CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 16)) AS UBIGINT)"
    return f"""
WITH ha AS (
  SELECT DISTINCT {h_expr} AS h FROM {table}
  WHERE {key_col} IS NOT NULL AND {label_col} = '{label_a}'
),
hb AS (
  SELECT DISTINCT {h_expr} AS h FROM {table}
  WHERE {key_col} IS NOT NULL AND {label_col} = '{label_b}'
),
u AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) ORDER BY h LIMIT {k}),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept,
         CAST(count(*) FILTER (u.h IN (SELECT h FROM ha) AND u.h IN (SELECT h FROM hb)) AS BIGINT) AS n_common,
         max(u.h) AS kth
  FROM u
)
SELECT n_kept, n_common,
       CASE WHEN n_kept = 0 THEN 0.0
            WHEN n_kept < {k} THEN n_kept * 1.0
            ELSE round(({k} - 1) / (kth / 18446744073709551616.0), 4)
       END AS union_est,
       CASE WHEN n_kept = 0 THEN 0.0 ELSE floor(n_common * 1e6 / n_kept + 0.5) / 1e6 END AS jaccard_est,
       floor(
         (CASE WHEN n_kept = 0 THEN 0.0 ELSE floor(n_common * 1e6 / n_kept + 0.5) / 1e6 END)
         * (CASE WHEN n_kept = 0 THEN 0.0
                 WHEN n_kept < {k} THEN n_kept * 1.0
                 ELSE round(({k} - 1) / (kth / 18446744073709551616.0), 4) END) * 1e4 + 0.5) / 1e4 AS inter_est
FROM st
""".strip()


def cms_counts(
    ds,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
):
    """Count-Min Sketch frequency estimates: build a depth×width counter
    grid over the ``col`` stream (order-independent integer sums — batches
    emit nonzero-cell partials, folded once), then answer a point query
    for every distinct key: ``est = min_d counter[d][pos_d(key)]``. The
    guaranteed one-sided error (est ≥ exact) is part of the verified
    output. Positions use the same md5 double hashing as ops/bloom.py, so
    DuckDB reproduces the grid and the estimates exactly. Returns
    ``(key, exact, est, overcount)`` sorted by key — all integers, no
    float parity risk."""
    import pandas as pd

    from .bloom import _positions

    def partials(t: pa.Table) -> pa.Table:
        vals = t[col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(vals, return_counts=True)
        pos = _positions(uniq, width, depth)  # (n, depth)
        cell = np.arange(depth, dtype=np.int64)[None, :] * width + pos.astype(np.int64)
        grid = np.bincount(cell.ravel(), weights=np.repeat(counts, depth), minlength=depth * width).astype(np.int64)
        nz = np.flatnonzero(grid)
        # also ship per-key exact partials (key-bounded, the test set)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(nz.size, np.int8), np.ones(uniq.size, np.int8)])
                ),
                "a": pa.array(np.concatenate([nz, uniq]), pa.int64()),
                "n": pa.array(np.concatenate([grid[nz], counts.astype(np.int64)]), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["key", "exact", "est", "overcount"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby(["kind", "a"], as_index=False)["n"].sum()
    cells = folded[folded["kind"] == 0]
    exact = folded[folded["kind"] == 1]
    grid = np.zeros(depth * width, np.int64)
    grid[cells["a"].to_numpy(np.int64)] = cells["n"].to_numpy(np.int64)
    keys = exact["a"].to_numpy(np.int64)
    pos = _positions(keys, width, depth)
    cell = np.arange(depth, dtype=np.int64)[None, :] * width + pos.astype(np.int64)
    est = grid[cell].min(axis=1)
    out = pd.DataFrame(
        {
            "key": keys,
            "exact": exact["n"].to_numpy(np.int64),
            "est": est,
            "overcount": est - exact["n"].to_numpy(np.int64),
        }
    )
    return out.sort_values("key").reset_index(drop=True)


def cms_counts_sql(
    table: str,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> str:
    h1 = f"CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 16)) AS UBIGINT) % {width}"
    h2 = f"CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 17, 16)) AS UBIGINT) % {width}"
    return f"""
WITH keys AS (SELECT DISTINCT {col} AS key FROM {table}),
h AS (SELECT key, {h1} AS h1, {h2} AS h2 FROM keys),
pos AS (
  SELECT key, i, (h1 + i * h2) % {width} AS pos
  FROM h CROSS JOIN range({depth}) t(i)
),
counters AS (
  SELECT p.i, p.pos, CAST(count(*) AS BIGINT) AS c
  FROM {table} e JOIN pos p ON e.{col} = p.key
  GROUP BY p.i, p.pos
),
est AS (
  SELECT p.key, min(c.c) AS est
  FROM pos p JOIN counters c ON c.i = p.i AND c.pos = p.pos
  GROUP BY p.key
),
exact AS (SELECT {col} AS key, CAST(count(*) AS BIGINT) AS exact FROM {table} GROUP BY 1)
SELECT x.key, x.exact, e.est, e.est - x.exact AS overcount
FROM exact x JOIN est e USING (key) ORDER BY x.key
""".strip()


def misra_gries_partial(keys: np.ndarray, counts: np.ndarray, capacity: int):
    """Fold (key, count) pairs into a Misra-Gries summary of ≤ ``capacity``
    counters: whenever the counter set would exceed capacity, decrement
    every counter by the smallest member and drop zeros (the batched form
    of the classic one-at-a-time algorithm). Guarantee preserved: a key's
    summary count underestimates its true count by at most the total
    decrement, and any key with true count > N/(capacity+1) survives."""
    order = np.argsort(-counts, kind="mergesort")
    keys, counts = keys[order], counts[order]
    if keys.size <= capacity:
        return dict(zip(keys.tolist(), counts.astype(np.int64).tolist()))
    # batched MG trim (Agarwal/Cormode merge rule): subtract the
    # (capacity+1)-th largest count from every counter and keep positives.
    # Each trim removes ≥ (capacity+1)·dec total mass, so decrements summed
    # over any fold chain are ≤ N/(capacity+1) — every key with true count
    # above that bound survives. (Subtracting any more, e.g. spreading the
    # full evicted mass, breaks the survival guarantee.)
    dec = int(counts[capacity])
    kept = counts[:capacity] - dec
    keep = kept > 0
    return dict(zip(keys[:capacity][keep].tolist(),
                    kept[keep].astype(np.int64).tolist()))


def heavy_hitters(
    ds,
    col: str,
    *,
    n: int = 20,
    capacity: int = 1024,
):
    """Heavy hitters by Misra-Gries sketch + exact rescreen: pass 1 folds
    per-batch (key, count) partials into a bounded-memory MG summary
    (capacity counters per batch partial, merged on the driver by counter
    addition + one re-trim); pass 2 re-counts ONLY the sketch's surviving
    candidates exactly (broadcast candidate array + searchsorted bincount
    — no shuffle) and returns the top ``n`` by exact count.

    When every true top-n key has count > N/(capacity+1) (always true when
    capacity ≥ distinct keys, and for any Zipf-ish skew at reasonable
    capacity), the MG guarantee makes the result IDENTICAL to an exact
    groupby top-n — which is what the gate checks; the bounded-memory
    behavior under tiny capacity is unit-tested separately. This is the
    adversarial-cardinality path: a groupby over 10^10 distinct keys
    shuffles all of them; the sketch ships ``capacity`` counters per
    partial regardless."""
    import pandas as pd
    import ray

    def partial(t: pa.Table) -> pa.Table:
        arr = pc.cast(t[col].combine_chunks(), pa.string())
        enc = arr.dictionary_encode()
        cnt = np.bincount(np.asarray(enc.indices))
        keys = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        mg = misra_gries_partial(keys, cnt.astype(np.int64), capacity)
        return pa.table({
            "key": pa.array(list(mg.keys()), pa.string()),
            "cnt": pa.array(list(mg.values()), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = parts.groupby("key", as_index=False)["cnt"].sum()
    mg = misra_gries_partial(
        merged["key"].to_numpy(dtype=object),
        merged["cnt"].to_numpy(np.int64), capacity,
    )
    cand = np.array(sorted(mg.keys()), dtype=object)
    if cand.size == 0:
        return pd.DataFrame({"key": pd.Series(dtype=object),
                             "cnt": pd.Series(dtype=np.int64)})
    ref = ray.put(np.array([str(c) for c in cand], dtype=np.str_))

    def rescreen(t: pa.Table) -> pa.Table:
        cands = ray.get(ref)
        vals = np.asarray(
            pc.cast(t[col].combine_chunks(), pa.string()).to_pylist(),
            dtype=np.str_,
        )
        idx = np.searchsorted(cands, vals)
        np.clip(idx, 0, cands.size - 1, out=idx)
        hit = cands[idx] == vals
        cnt = np.bincount(idx[hit], minlength=cands.size)
        return pa.table({
            "ci": pa.array(np.arange(cands.size, dtype=np.int64)),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    exact = (
        ds.map_batches(rescreen, batch_format="pyarrow")
        .to_pandas()
        .groupby("ci", as_index=False)["cnt"].sum()
    )
    out = pd.DataFrame({
        "key": cand[exact["ci"].to_numpy()],
        "cnt": exact["cnt"].to_numpy(np.int64),
    })
    out = out[out["cnt"] > 0].sort_values(
        ["cnt", "key"], ascending=[False, True], kind="mergesort"
    ).head(n)
    return out.reset_index(drop=True)


def heavy_hitters_sql(table: str, col: str, *, n: int = 20) -> str:
    """Oracle: exact top-n by count (the MG+rescreen result whenever the
    sketch guarantee holds — see heavy_hitters)."""
    return f"""
SELECT CAST({col} AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
FROM {table} GROUP BY {col}
ORDER BY cnt DESC, key ASC LIMIT {n}
""".strip()
