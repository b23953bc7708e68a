"""PCA top-component projection over an embedding column.

The reference delegates every vector feature to OpenSearch
(harvester/search/views/similarity.py:70-110); principal-component
projection belongs to the LLM-data curation family this engine adds
(top-component removal / whitening per Mu & Viswanath 2018,
"All-but-the-Top") and shares the embeddings table with the kNN ops.

Exact-parity design (the pagerank/kmeans discipline): every embedding
component is quantized once to 1e-6 fixed-point BIGINT; the centered
scatter matrix is the all-integer ``n·(ΣqqT) − (Σq)(Σq)T``; the power
iteration renormalizes by TRUNCATING integer division by the max-|w|
component each step (DuckDB ``//`` truncates toward zero — mirrored by
:func:`_trunc_div`), so after a fixed number of iterations both sides
hold the identical integer direction vector. Projections rank by the
integer dot ``q·v`` (monotone in the centered score since n > 0); the
float appears only in the final display division, mirrored verbatim.

Scale story: pass 1 emits one (count, Σq, qqT) partial per block — d + d²
ints regardless of rows — folded on the driver (B × d² is tiny); the d×d
power iteration is driver-side exact-int math, O(iters·d²); pass 2 is a
streaming matvec against the broadcast direction with per-block local
top-k feeding the distributed `_topk_reduce_ds` merge. No stage holds
more than d² values per task; unchanged at 10^9 rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

SCALE = 10**6


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//``."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _quantize(mat: np.ndarray) -> np.ndarray:
    q = np.floor(mat * SCALE + 0.5)
    # int64 Gram safety: |q| < 2^21 keeps q·q sums exact for blocks < 2^20 rows
    if np.abs(q).max(initial=0.0) >= float(1 << 21):
        raise ValueError("embedding components exceed the fixed-point budget")
    return q.astype(np.int64)


def power_direction(
    cnt: int, sx: list[int], gram: list[list[int]], *, iters: int = 64
) -> list[int]:
    """Deterministic fixed-point power iteration on the exact integer
    scatter matrix ``C = cnt·gram − sx·sxT``. Pure Python ints throughout
    (entries overflow int64 at corpus scale). Returns the direction with
    max-|component| = SCALE (or the all-SCALE start if C is zero)."""
    d = len(sx)
    c = [[cnt * gram[i][j] - sx[i] * sx[j] for j in range(d)] for i in range(d)]
    v = [SCALE] * d
    for _ in range(iters):
        w = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            return v
        v = [_trunc_div(w[i] * SCALE, m) for i in range(d)]
    return v


def _fold_moments(ds, *, vec_col: str = "embedding"):
    """Streaming pass → exact (count, Σq, qqT) folded to Python ints on
    the driver (B × d² partial ints — never the rows). None if empty."""
    from .similarity import _batch_matrix

    def partials(batch: pa.Table) -> pa.Table:
        q = _quantize(_batch_matrix(batch, vec_col))
        return pa.table({
            "cnt": pa.array([q.shape[0]], pa.int64()),
            "sx": pa.array([q.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "g": pa.array([(q.T @ q).ravel().tolist()], pa.list_(pa.int64())),
        })

    parts = ds.map_batches(partials, batch_format="pyarrow").take_all()
    if not parts:
        return None
    d = len(parts[0]["sx"])
    cnt = sum(int(p["cnt"]) for p in parts)
    sx = [0] * d
    gram = [[0] * d for _ in range(d)]
    for p in parts:
        psx, pg = p["sx"], p["g"]
        for i in range(d):
            sx[i] += int(psx[i])
            row, base = gram[i], i * d
            for j in range(d):
                row[j] += int(pg[base + j])
    return cnt, sx, gram


def _display(num: int, den: int) -> float:
    """floor(num/den · 1e4 + 0.5)/1e4 with the exact SQL op order."""
    return math.floor(float(num) / float(den) * 10000.0 + 0.5) / 10000.0


def pca_project(
    path: str,
    *,
    k: int = 20,
    iters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Project every row onto the top principal component; return the k
    most-positive projections as (vec_id, pc1) — pc1 is the centered
    projection onto the max-normalized direction, in embedding units."""
    import ray

    from .similarity import _batch_matrix, _topk_reduce_ds

    ds = ray.data.read_parquet(path, columns=[id_col, vec_col])
    moments = _fold_moments(ds, vec_col=vec_col)
    if moments is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "pc1": pa.array([], pa.float64())})
    cnt, sx, gram = moments
    d = len(sx)
    v = power_direction(cnt, sx, gram, iters=iters)
    vref = ray.put(np.asarray(v, dtype=np.int64))

    def project(batch: pa.Table) -> pa.Table:
        vv = ray.get(vref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        a = _quantize(_batch_matrix(batch, vec_col)) @ vv
        kk = min(k, ids.size)
        sel = np.argpartition(-a, kk - 1)[:kk] if ids.size > kk else np.arange(ids.size)
        return pa.table({
            "query_id": pa.array(np.zeros(len(sel), dtype=np.int64), pa.int64()),
            "vec_id": pa.array(ids[sel], pa.int64()),
            "a_int": pa.array(a[sel].astype(np.float64), pa.float64()),
        })

    top = _topk_reduce_ds(
        ds.map_batches(project, batch_format="pyarrow"),
        k,
        value_col="a_int",
        round_decimals=None,
    )
    s = sum(sx[i] * v[i] for i in range(d))
    den = cnt * SCALE * SCALE
    pc1 = [
        _display(cnt * int(a) - s, den)
        for a in top["a_int"].to_pylist()
    ]
    return pa.table({
        "vec_id": top["vec_id"],
        "pc1": pa.array(pc1, pa.float64()),
    })


def _pca_chain_sql(
    table: str, iters: int, id_col: str, vec_col: str
) -> tuple[str, str]:
    """Shared WITH-prefix (quantize → integer scatter → unrolled power
    iteration); returns (prefix, name-of-final-direction-CTE)."""
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        # MATERIALIZED is load-bearing: w{t} is referenced twice (value +
        # MAX subquery); inlined, the chain re-expands exponentially per
        # iteration (measured: iters=8 DNF, iters=4 2.6s, iters=2 0.9s)
        steps.append(
            f"w{t} AS MATERIALIZED (SELECT cov.i AS i, SUM(c * v.val) AS wv\n"
            f"        FROM cov JOIN {prev} v ON v.i = cov.j GROUP BY cov.i),\n"
            f"v{t} AS MATERIALIZED (SELECT i, (wv * 1000000) // (SELECT MAX(abs(wv)) FROM w{t}) AS val FROM w{t})"
        )
        prev = f"v{t}"
    chain = ",\n".join(steps)
    prefix = f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS vid, i, CAST(floor(e * 1000000 + 0.5) AS BIGINT) AS q
  FROM (SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS e,
               generate_subscripts({vec_col}, 1) AS i FROM {table})
),
n AS (SELECT CAST(count(DISTINCT vid) AS HUGEINT) AS cnt FROM base),
sx AS (SELECT i, CAST(SUM(q) AS HUGEINT) AS s FROM base GROUP BY i),
g AS (SELECT a.i AS i, b.i AS j, SUM(CAST(a.q AS HUGEINT) * b.q) AS gg
      FROM base a JOIN base b ON a.vid = b.vid GROUP BY a.i, b.i),
cov AS MATERIALIZED (SELECT g.i, g.j, (SELECT cnt FROM n) * gg - sa.s * sb.s AS c
        FROM g JOIN sx sa ON sa.i = g.i JOIN sx sb ON sb.i = g.j),
v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS val FROM sx),
{chain}""".strip()
    return prefix, prev


def pca_sql(
    table: str = "embeddings",
    *,
    k: int = 20,
    iters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle: the identical quantize → integer scatter → truncating-div
    power iteration → integer projection chain, unrolled one CTE pair per
    iteration (the pagerank/bpe unrolled-chain discipline)."""
    prefix, prev = _pca_chain_sql(table, iters, id_col, vec_col)
    return f"""
{prefix},
proj AS (SELECT b.vid AS vec_id, SUM(CAST(b.q AS HUGEINT) * v.val) AS a
         FROM base b JOIN {prev} v USING (i) GROUP BY b.vid),
sv AS (SELECT SUM(sx.s * v.val) AS s FROM sx JOIN {prev} v USING (i))
SELECT vec_id,
       floor(CAST((SELECT cnt FROM n) * a - (SELECT s FROM sv) AS DOUBLE)
             / CAST((SELECT cnt FROM n) * 1000000000000 AS DOUBLE)
             * 10000 + 0.5) / 10000 AS pc1
FROM proj
ORDER BY a DESC, vec_id ASC
LIMIT {k}
""".strip()


def pca_residual_outliers(
    path: str,
    *,
    k: int = 20,
    iters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Embedding outliers after top-component removal (the curation use of
    Mu & Viswanath's All-but-the-Top: rows whose centered vector is least
    explained by PC1 — corrupted or off-distribution embeddings).

    Exact integer ranking key, no per-component residual needed: with
    centered c = n·q − Σq and direction v,
    ``key = (v·v)·‖c‖² − (c·v)²  (≥ 0 by Cauchy–Schwarz)``
    — the squared residual norm scaled by n²·(v·v). ‖c‖² expands to
    ``n²‖q‖² − 2n(q·Σq) + ‖Σq‖²`` whose pieces are all vectorized int64
    (q·Σq via a hi/lo 2³¹ split so no dot overflows); only the final
    per-row key assembly is Python-int (exceeds int64), and each block
    ships exactly its k best (key_hi, key_lo) pairs — base-2⁶² split, so
    lexicographic (hi, lo) order IS numeric order for the driver's
    O(k·blocks) merge. Display value = key / (n²·(v·v)·1e12) ≡ squared
    residual norm in embedding units, mirrored verbatim.
    """
    import ray

    from .similarity import _batch_matrix

    ds = ray.data.read_parquet(path, columns=[id_col, vec_col])
    moments = _fold_moments(ds, vec_col=vec_col)
    if moments is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "resid2": pa.array([], pa.float64())})
    cnt, sx, gram = moments
    d = len(sx)
    v = power_direction(cnt, sx, gram, iters=iters)
    s2 = sum(vi * vi for vi in v)          # v·v
    s = sum(sx[i] * v[i] for i in range(d))  # Σq·v
    sxsx = sum(x * x for x in sx)          # ‖Σq‖²
    hi31 = np.asarray([x >> 31 for x in sx], dtype=np.int64)
    lo31 = np.asarray([x & ((1 << 31) - 1) for x in sx], dtype=np.int64)
    vref = ray.put((np.asarray(v, dtype=np.int64), hi31, lo31))

    def block_topk(batch: pa.Table) -> pa.Table:
        vv, hi_arr, lo_arr = ray.get(vref)
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        q = _quantize(_batch_matrix(batch, vec_col))
        a = q @ vv                      # q·v, |·| ≤ 2^47
        normq = (q * q).sum(axis=1)     # ≤ 2^48
        qdot_hi = q @ hi_arr            # hi/lo split keeps both ≤ 2^58
        qdot_lo = q @ lo_arr
        keys = []
        for j in range(ids.size):
            qdotsx = (int(qdot_hi[j]) << 31) + int(qdot_lo[j])
            c2 = cnt * cnt * int(normq[j]) - 2 * cnt * qdotsx + sxsx
            ac = cnt * int(a[j]) - s
            keys.append(s2 * c2 - ac * ac)
        order = sorted(range(ids.size), key=lambda j: (-keys[j], ids[j]))[:k]
        sel_keys = [keys[j] for j in order]
        return pa.table({
            "vec_id": pa.array([int(ids[j]) for j in order], pa.int64()),
            "key_hi": pa.array([kk >> 62 for kk in sel_keys], pa.int64()),
            "key_lo": pa.array([kk & ((1 << 62) - 1) for kk in sel_keys], pa.int64()),
        })

    parts = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    keys = [
        ((int(h) << 62) + int(l), int(i))
        for h, l, i in zip(parts["key_hi"], parts["key_lo"], parts["vec_id"])
    ]
    keys.sort(key=lambda t: (-t[0], t[1]))
    den = cnt * cnt * s2 * (10**12)
    top = keys[:k]
    return pa.table({
        "vec_id": pa.array([i for _, i in top], pa.int64()),
        "resid2": pa.array([_display(kk, den) for kk, _ in top], pa.float64()),
    })


def pca_residual_sql(
    table: str = "embeddings",
    *,
    k: int = 20,
    iters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle: same chain + the closed-form residual key in HUGEINT."""
    prefix, prev = _pca_chain_sql(table, iters, id_col, vec_col)
    return f"""
{prefix},
s2 AS (SELECT SUM(val * val) AS v FROM {prev}),
sv AS (SELECT SUM(sx.s * v.val) AS s FROM sx JOIN {prev} v USING (i)),
sxsx AS (SELECT SUM(s * s) AS v FROM sx),
perdoc AS (
  SELECT b.vid AS vec_id,
         SUM(CAST(b.q AS HUGEINT) * v.val) AS a,
         SUM(CAST(b.q AS HUGEINT) * b.q) AS normq,
         SUM(CAST(b.q AS HUGEINT) * sx.s) AS qdotsx
  FROM base b JOIN {prev} v USING (i) JOIN sx USING (i)
  GROUP BY b.vid
),
keyed AS (
  SELECT vec_id,
         (SELECT v FROM s2)
           * ((SELECT cnt FROM n) * (SELECT cnt FROM n) * normq
              - 2 * (SELECT cnt FROM n) * qdotsx + (SELECT v FROM sxsx))
           - ((SELECT cnt FROM n) * a - (SELECT s FROM sv))
             * ((SELECT cnt FROM n) * a - (SELECT s FROM sv)) AS key
  FROM perdoc
)
SELECT vec_id,
       floor(CAST(key AS DOUBLE)
             / CAST((SELECT cnt FROM n) * (SELECT cnt FROM n)
                    * (SELECT v FROM s2) * 1000000000000 AS DOUBLE)
             * 10000 + 0.5) / 10000 AS resid2
FROM keyed
ORDER BY key DESC, vec_id ASC
LIMIT {k}
""".strip()


def srp_project(
    path: str,
    *,
    out_dim: int = 16,
    n_rows: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Signed-random-projection sketch (Achlioptas 2003 / Charikar 2002
    SimHash-style JL projection): project each quantized embedding through
    a deterministic ±1 matrix ``R[i][j] = +1 if (i·j·2654435761 + i·131 + j·137) % 4093 % 2 == 0 else −1``
    — a nonlinear arithmetic hash (the i·j term is essential: a LINEAR form
    mod 2 collapses to a checkerboard whose projections are rank-2; measured
    cosine correlation 0.12 vs 0.61 for this hash) that both engine and SQL evaluate verbatim,
    so the projected INTEGER vectors match exactly. The scale path for
    cosine sketching when PQ/IVF training is not worth it: one broadcast
    matrix, one int matmul per batch, d→out_dim compression.

    Returns the first ``n_rows`` docs (by id) with their projected vectors
    flattened as (vec_id, j, p) rows — list columns don't hash stably in
    the driver compare."""
    import ray

    from .similarity import _batch_matrix, _topk_reduce_ds

    ds = ray.data.read_parquet(path, columns=[id_col, vec_col])

    def project(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        keep = ids < n_rows
        if not keep.any():
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
            })
        q = _quantize(_batch_matrix(batch, vec_col))[keep]
        ids = ids[keep]
        d = q.shape[1]
        i_idx = np.arange(1, d + 1, dtype=np.int64)[:, None]
        j_idx = np.arange(1, out_dim + 1, dtype=np.int64)[None, :]
        r = np.where(
            (i_idx * j_idx * 2654435761 + i_idx * 131 + j_idx * 137) % 4093 % 2 == 0,
            1, -1,
        ).astype(np.int64)
        p = q @ r  # |p| ≤ d · 2^21
        nn = ids.size
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, out_dim), pa.int64()),
            "j": pa.array(np.tile(np.arange(1, out_dim + 1, dtype=np.int64), nn), pa.int64()),
            "p": pa.array(p.ravel(), pa.int64()),
        })

    out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["vec_id", "j"]).reset_index(drop=True)
    return pa.table({
        "vec_id": pa.array(out["vec_id"].to_numpy(np.int64), pa.int64()),
        "j": pa.array(out["j"].to_numpy(np.int64), pa.int64()),
        "p": pa.array(out["p"].to_numpy(np.int64), pa.int64()),
    })


def srp_sql(
    table: str = "embeddings",
    *,
    out_dim: int = 16,
    n_rows: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle: identical quantize + arithmetic-hash sign matrix via a
    range() cross join."""
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, i,
         CAST(floor(e * 1000000 + 0.5) AS BIGINT) AS q
  FROM (SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS e,
               generate_subscripts({vec_col}, 1) AS i FROM {table})
  WHERE {id_col} < {n_rows}
)
SELECT base.vec_id,
       r.j AS j,
       CAST(SUM(q * (CASE WHEN (base.i * r.j * 2654435761 + base.i * 131 + r.j * 137) % 4093 % 2 = 0
                          THEN 1 ELSE -1 END)) AS BIGINT) AS p
FROM base CROSS JOIN (SELECT unnest(range(1, {out_dim} + 1)) AS j) r
GROUP BY base.vec_id, r.j
ORDER BY base.vec_id, r.j
""".strip()
