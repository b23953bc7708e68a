"""Event-stream analytics: running totals, funnels, histograms, robust
outliers, ordered timelines.

The reference's Matomo-visits pipeline reduces a raw event stream into
per-entity engagement aggregates (`/root/reference/harvester/metadata/tasks.py`
sessionization; facet frequency refreshes in
`/root/reference/harvester/metadata/models/value.py:21-64`). These are the
remaining members of that analytics family a warehouse user expects:

- ``running_total``: per-key cumulative sum in event order — the window
  function ``sum() OVER (PARTITION BY … ORDER BY …)``. Cross-row float sums
  are order-sensitive, so values are quantized to integer micros first
  (CLAUDE.md fixed-point rule); the cumulative int is exact and the derived
  double is identical on both sides.
- ``funnel``: per-user earliest strictly-ordered completion of a stage
  sequence (view → click → purchase), reduced to per-stage user counts.
- ``value_histogram``: equi-width histogram per group over the exact global
  [min, max] — two streaming passes (exact min/max aggregate, then
  per-batch bincount partials folded once; bins × groups is tiny).
- ``outliers_mad``: robust per-group outliers by |x − median| > k·MAD —
  median/MAD need each group's full value set in one place (same exchange
  as value_quantiles; linear-interpolation medians are definitionally
  identical to DuckDB ``median``).
- ``user_timeline``: ordered ``string_agg`` per key — the ordered-
  aggregation primitive (reference analog: ContentContainer's ordered text
  assembly, `/root/reference/harvester/core/utils/contents.py:8-57`).

Scale notes: running_total / outliers_mad / user_timeline shuffle by their
group key (per-key data must co-locate; keys are users/types, groups are
small and skew-bounded); funnel reduces inside ``map_groups`` to one row
per (user, stage) and then a tiny stage-count aggregate; value_histogram
never shuffles raw rows at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray import analyzer

MICROS = 1_000_000.0


def _quantize(v: np.ndarray) -> np.ndarray:
    # floor(x·1e6 + 0.5): round-half-up, identical in DuckDB and numpy
    # (never use round-half — np half-even vs DuckDB half-away)
    return np.floor(v * MICROS + 0.5).astype(np.int64)


# --------------------------------------------------------------------------
# running total (window-function analog)
# --------------------------------------------------------------------------

def running_total(
    ds,
    *,
    key: str = "user_id",
    order_by: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    collect: bool = True,
):
    """Per-``key`` cumulative sum of ``value_col`` in ``order_by`` order.
    Returns ``(id_col, key, cum_micros, cum_value)`` sorted by (key, id).
    Output is input-sized: pass ``collect=False`` to get the streaming
    Dataset instead (write_parquet it; the driver sort is gate-only)."""

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        micros = np.cumsum(_quantize(g[value_col].to_numpy(np.float64)))
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key: g[key].to_numpy(),
                "cum_micros": micros,
                "cum_value": np.round(micros / MICROS, 6),
            }
        )

    res = ds.groupby(key).map_groups(cum, batch_format="pandas")
    if not collect:
        return res
    out = res.to_pandas()
    return out.sort_values([key, id_col]).reset_index(drop=True)


def running_total_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    order_by: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    ob = ", ".join(order_by)
    return f"""
SELECT {id_col}, {key},
       sum(CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT))
           OVER (PARTITION BY {key} ORDER BY {ob}) AS cum_micros,
       round(sum(CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT))
           OVER (PARTITION BY {key} ORDER BY {ob}) / 1e6, 6) AS cum_value
FROM {table} ORDER BY {key}, {id_col}
""".strip()


# --------------------------------------------------------------------------
# funnel analysis
# --------------------------------------------------------------------------

def funnel(
    ds,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-user earliest strictly-time-ordered completion of ``stages``;
    returns ``(stage, event_type, n_users)`` where n_users counts users
    reaching at least that stage (stage 1-indexed, monotone non-increasing).
    """
    from ray.data.aggregate import Count

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy()
        et = g[type_col].to_numpy()
        t_prev = None
        reached = 0
        for s in stages:
            mask = et == s if t_prev is None else (et == s) & (ts > t_prev)
            if not mask.any():
                break
            t_prev = ts[mask].min()
            reached += 1
        return pd.DataFrame({"stage": np.arange(1, reached + 1, dtype=np.int64)})

    per_user = ds.groupby(key).map_groups(depth, batch_format="pandas")
    counts = per_user.groupby("stage").aggregate(Count(alias_name="n_users")).to_pandas()
    out = pd.DataFrame({"stage": np.arange(1, len(stages) + 1, dtype=np.int64)})
    if counts.empty:
        counts = pd.DataFrame({"stage": pd.Series([], dtype=np.int64), "n_users": pd.Series([], dtype=np.int64)})
    out = out.merge(counts, on="stage", how="left")
    out["event_type"] = list(stages)
    out["n_users"] = out["n_users"].fillna(0).astype(np.int64)
    return out[["stage", "event_type", "n_users"]]


def funnel_sql(
    table: str = "events",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    ctes, selects = [], []
    for i, s in enumerate(stages):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {key}, min({ts_col}) AS t FROM {table} "
                f"WHERE {type_col} = '{s}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{key}, min(e.{ts_col}) AS t FROM {table} e "
                f"JOIN s{i - 1} p ON e.{key} = p.{key} AND e.{ts_col} > p.t "
                f"WHERE e.{type_col} = '{s}' GROUP BY 1)"
            )
        selects.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS stage, '{s}' AS event_type, "
            f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "SELECT * FROM (" + " UNION ALL ".join(selects) + ") ORDER BY stage"
    )


# --------------------------------------------------------------------------
# equi-width histogram
# --------------------------------------------------------------------------

def value_histogram(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    nbins: int = 20,
) -> pd.DataFrame:
    """Equi-width histogram of ``value_col`` per ``group_col`` over the
    exact global [min, max]. Two streaming passes; no raw-row shuffle.
    Returns ``(group, bin, bin_lo, n)``; the bin expression
    ``least(nbins-1, floor((v-mn)*nbins/(mx-mn)))`` is evaluated with the
    identical operation order in engine and oracle."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(value_col), Max(value_col))
    mn, mx = float(agg[f"min({value_col})"]), float(agg[f"max({value_col})"])
    span = mx - mn

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        g = t[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        b = (
            np.minimum(nbins - 1, np.floor((v - mn) * nbins / span)).astype(np.int64)
            if span > 0
            else np.zeros(v.size, np.int64)
        )
        gu, gi = np.unique(g, return_inverse=True)
        code = gi.astype(np.int64) * nbins + b
        cu, cn = np.unique(code, return_counts=True)
        return pa.table(
            {
                group_col: pa.array(gu[(cu // nbins).astype(np.int64)], pa.string()),
                "bin": pa.array(cu % nbins, pa.int64()),
                "n": pa.array(cn.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pd.DataFrame(columns=[group_col, "bin", "bin_lo", "n"])
    out = (
        pd.concat(parts, ignore_index=True)
        .groupby([group_col, "bin"], sort=True, as_index=False)["n"]
        .sum()
    )
    out["bin_lo"] = np.round(mn + out["bin"].to_numpy(np.float64) * span / nbins, 6)
    return out[[group_col, "bin", "bin_lo", "n"]].reset_index(drop=True)


def value_histogram_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    nbins: int = 20,
) -> str:
    return f"""
WITH bounds AS (SELECT min({value_col}) AS mn, max({value_col}) AS mx FROM {table}),
binned AS (
  SELECT {group_col},
         CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
              ELSE CAST(least({nbins} - 1,
                   floor(({value_col} - mn) * {nbins} / (mx - mn))) AS BIGINT)
         END AS bin
  FROM {table} CROSS JOIN bounds
)
SELECT b.{group_col}, b.bin,
       round(mn + b.bin * (mx - mn) / {nbins}, 6) AS bin_lo,
       CAST(count(*) AS BIGINT) AS n
FROM binned b CROSS JOIN bounds
GROUP BY b.{group_col}, b.bin, mn, mx
ORDER BY b.{group_col}, b.bin
""".strip()


# --------------------------------------------------------------------------
# robust outliers (median / MAD)
# --------------------------------------------------------------------------

def outliers_mad(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> pd.DataFrame:
    """Rows with |value − group median| > k · MAD (median absolute
    deviation). Medians use linear interpolation ≡ DuckDB ``median``; the
    comparison runs on raw float64 with the same expression on both sides.
    Returns ``(id, group, value, med, mad)`` (med/mad rounded to 6) sorted
    by id."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(np.float64)
        med = np.quantile(v, 0.5, method="linear")
        mad = np.quantile(np.abs(v - med), 0.5, method="linear")
        mask = np.abs(v - med) > k * mad
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy()[mask],
                group_col: g[group_col].to_numpy()[mask],
                value_col: v[mask],
                "med": round(float(med), 6),
                "mad": round(float(mad), 6),
            }
        )

    out = ds.groupby(group_col).map_groups(pick, batch_format="pandas").to_pandas()
    cols = [id_col, group_col, value_col, "med", "mad"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(id_col).reset_index(drop=True)[cols]


def outliers_mad_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> str:
    return f"""
WITH med AS (SELECT {group_col}, median({value_col}) AS med FROM {table} GROUP BY 1),
mad AS (
  SELECT e.{group_col}, median(abs(e.{value_col} - m.med)) AS mad
  FROM {table} e JOIN med m USING ({group_col}) GROUP BY 1
)
SELECT e.{id_col}, e.{group_col}, e.{value_col},
       round(m.med, 6) AS med, round(d.mad, 6) AS mad
FROM {table} e
JOIN med m USING ({group_col}) JOIN mad d USING ({group_col})
WHERE abs(e.{value_col} - m.med) > {k} * d.mad
ORDER BY e.{id_col}
""".strip()


# --------------------------------------------------------------------------
# group-wise OLS regression from mergeable integer sufficient statistics
# --------------------------------------------------------------------------

_REG_EPOCH = "2024-01-01"


def regression_by_group(
    ds,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> pd.DataFrame:
    """Per-group OLS of value vs time (slope in value-units per minute,
    ``x = minutes since 2024-01-01``): the ``regr_slope`` window-aggregate
    analog, built from mergeable sufficient statistics so it never
    shuffles rows — each batch emits exact integer partials
    (n, Σx, Σy, Σxy, Σxx) with x in whole minutes ≥ 0 and y in centi-units
    (values are 2-decimal), folded once on the driver; the final
    numerator/denominator are Python arbitrary-precision ints (DuckDB
    folds the same sums as HUGEINT). Float enters exactly once, in the
    final slope/intercept expressions, with the same operation order on
    both sides. Returns ``(group, n, slope, intercept)`` rounded to 6;
    slope is NULL when the group's x values are all equal."""
    base_us = int(pd.Timestamp(_REG_EPOCH).value // 1_000)

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        ts_us = (
            t[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))  # normalize ns/us inputs to micros
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        x = (ts_us - base_us) // 60_000_000  # whole minutes (floor ≡ date_diff)
        y = _quantize_centi(t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64))
        gu, gi = np.unique(g, return_inverse=True)
        ng = gu.size
        return pa.table(
            {
                group_col: pa.array(gu, pa.string()),
                "n": pa.array(np.bincount(gi, minlength=ng).astype(np.int64), pa.int64()),
                "sx": pa.array(np.bincount(gi, weights=x, minlength=ng).astype(np.int64), pa.int64()),
                "sy": pa.array(np.bincount(gi, weights=y, minlength=ng).astype(np.int64), pa.int64()),
                "sxy": pa.array(np.bincount(gi, weights=x * y, minlength=ng).astype(np.int64), pa.int64()),
                "sxx": pa.array(np.bincount(gi, weights=x * x, minlength=ng).astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = [group_col, "n", "slope", "intercept"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(group_col, sort=True, as_index=False)[["n", "sx", "sy", "sxy", "sxx"]]
        .sum()
    )
    rows = []
    for g, n, sx, sy, sxy, sxx in folded.itertuples(index=False):
        n, sx, sy, sxy, sxx = int(n), int(sx), int(sy), int(sxy), int(sxx)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            rows.append((g, n, None, None))
            continue
        slope = float(num) / float(den) / 100.0
        intercept = (float(sy) / 100.0 - slope * float(sx)) / n
        rows.append((g, n, round(slope, 6) + 0.0, round(intercept, 6) + 0.0))
    return pd.DataFrame(rows, columns=cols)


def _quantize_centi(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 100.0 + 0.5)  # float64 whole numbers — exact in bincount weights


def regression_by_group_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    return f"""
WITH p AS (
  SELECT {group_col},
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(date_diff('minute', TIMESTAMP '{_REG_EPOCH}', {ts_col}) AS HUGEINT)) AS sx,
         sum(CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)) AS sy,
         sum(CAST(date_diff('minute', TIMESTAMP '{_REG_EPOCH}', {ts_col}) AS HUGEINT)
             * CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)) AS sxy,
         sum(CAST(date_diff('minute', TIMESTAMP '{_REG_EPOCH}', {ts_col}) AS HUGEINT)
             * CAST(date_diff('minute', TIMESTAMP '{_REG_EPOCH}', {ts_col}) AS HUGEINT)) AS sxx
  FROM {table} GROUP BY {group_col}
)
SELECT {group_col}, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
       round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) + 0.0
       END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
       round((CAST(sy AS DOUBLE) / 100.0
              - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0)
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) + 0.0
       END AS intercept
FROM p ORDER BY {group_col}
""".strip()


# --------------------------------------------------------------------------
# ordered string aggregation
# --------------------------------------------------------------------------

def user_timeline(
    ds,
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
    sep: str = ">",
) -> pd.DataFrame:
    """Ordered ``string_agg`` per key: the full event-type sequence of each
    user in time order. Returns ``(key, n_events, timeline)`` sorted by key.
    """

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "n_events": np.array([len(g)], np.int64),
                "timeline": [sep.join(g[type_col].tolist())],
            }
        )

    out = ds.groupby(key).map_groups(agg, batch_format="pandas").to_pandas()
    return out.sort_values(key).reset_index(drop=True)


def user_timeline_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
    sep: str = ">",
) -> str:
    ob = ", ".join(order_by)
    return f"""
SELECT {key}, CAST(count(*) AS BIGINT) AS n_events,
       string_agg({type_col}, '{sep}' ORDER BY {ob}) AS timeline
FROM {table} GROUP BY {key} ORDER BY {key}
""".strip()


# --------------------------------------------------------------------------
# event transitions (window lag analog)
# --------------------------------------------------------------------------

def event_transitions(
    ds,
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
) -> pd.DataFrame:
    """Corpus-wide Markov transition counts: for every consecutive pair of
    events per key (in ``order_by`` order), count (prev_type, next_type) —
    the ``lag() OVER (PARTITION BY …)`` analog. Per-key pairs are formed
    inside ``map_groups`` (same exchange as running_total); the pair
    counts are a tiny vocabulary aggregate folded once. Returns
    ``(prev_type, next_type, n)`` sorted by the pair."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        et = g[type_col].to_numpy()
        if et.size < 2:
            return pd.DataFrame({"prev_type": [], "next_type": [], "n": []}).astype(
                {"prev_type": str, "next_type": str, "n": np.int64}
            )
        df = pd.DataFrame({"prev_type": et[:-1], "next_type": et[1:]})
        out = df.groupby(["prev_type", "next_type"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.groupby(key).map_groups(pairs, batch_format="pandas").to_pandas()
    cols = ["prev_type", "next_type", "n"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    return (
        parts.groupby(["prev_type", "next_type"], sort=True, as_index=False)["n"]
        .sum()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)[cols]
    )


def event_transitions_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
) -> str:
    ob = ", ".join(order_by)
    return f"""
WITH lagged AS (
  SELECT lag({type_col}) OVER (PARTITION BY {key} ORDER BY {ob}) AS prev_type,
         {type_col} AS next_type
  FROM {table}
)
SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type ORDER BY prev_type, next_type
""".strip()


# --------------------------------------------------------------------------
# pivot (crosstab)
# --------------------------------------------------------------------------

def pivot_hourly(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> pd.DataFrame:
    """Crosstab: hour-of-day rows × one count column per event type. The
    long-form (hour, type, n) aggregate is per-batch partials folded once
    (24 × |types| cells); the reshape to wide is driver-side on that tiny
    grid. Returns ``(hour, n_<type>…)`` with all 24 hours present."""

    def partial(t: pa.Table) -> pa.Table:
        ts_us = (
            t[ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        hour = (ts_us // 3_600_000_000) % 24
        et = t[type_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        gu, gi = np.unique(et, return_inverse=True)
        code = gi.astype(np.int64) * 24 + hour
        cu, cn = np.unique(code, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(gu[(cu // 24).astype(np.int64)], pa.string()),
                "hour": pa.array(cu % 24, pa.int64()),
                "n": pa.array(cn.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    grid = pd.DataFrame({"hour": np.arange(24, dtype=np.int64)})
    long = (
        pd.concat(parts, ignore_index=True).groupby(["event_type", "hour"], as_index=False)["n"].sum()
        if parts
        else pd.DataFrame({"event_type": [], "hour": [], "n": []})
    )
    for ty in types:
        sub = long[long["event_type"] == ty][["hour", "n"]].rename(columns={"n": f"n_{ty}"})
        grid = grid.merge(sub, on="hour", how="left")
        grid[f"n_{ty}"] = grid[f"n_{ty}"].fillna(0).astype(np.int64)
    return grid


def pivot_hourly_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER ({type_col} = '{t}') AS BIGINT) AS n_{t}" for t in types
    )
    return f"""
WITH hours AS (SELECT unnest(range(24)) AS hour),
agg AS (
  SELECT CAST(extract(hour FROM {ts_col}) AS BIGINT) AS hour, {type_col}
  FROM {table}
)
SELECT CAST(h.hour AS BIGINT) AS hour,
       {cols}
FROM hours h LEFT JOIN agg ON agg.hour = h.hour
GROUP BY h.hour ORDER BY h.hour
""".strip()


# --------------------------------------------------------------------------
# per-group z-score normalization
# --------------------------------------------------------------------------

def zscore_normalize(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    collect: bool = True,
):
    """Standardize ``value_col`` within each group: z = (v − mean)/std with
    the POPULATION std. Two streaming passes: exact integer moment partials
    (n, Σy, Σy²; y in centi-units) folded to per-group (mean, std), then a
    broadcast-free map pass is unnecessary — moments are a tiny table, so
    z is computed per row against merged moments inside one map_batches
    with the moments joined in. Float enters in mean/std/z only, same
    expression order as the oracle. Returns ``(id, group, value, z)``
    (z rounded to 4) sorted by id."""

    def moments(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        y = _quantize_centi(t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64))
        gu, gi = np.unique(g, return_inverse=True)
        ng = gu.size
        return pa.table(
            {
                group_col: pa.array(gu, pa.string()),
                "n": pa.array(np.bincount(gi, minlength=ng).astype(np.int64), pa.int64()),
                "sy": pa.array(np.bincount(gi, weights=y, minlength=ng).astype(np.int64), pa.int64()),
                "syy": pa.array(np.bincount(gi, weights=y * y, minlength=ng).astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = [id_col, group_col, value_col, "z"]
    if not parts:
        return pd.DataFrame(columns=cols)
    m = (
        pd.concat(parts, ignore_index=True)
        .groupby(group_col, sort=True, as_index=False)[["n", "sy", "syy"]]
        .sum()
    )
    groups_sorted = m[group_col].to_numpy(dtype=object).astype("U")
    means = np.empty(len(m), np.float64)
    stds = np.empty(len(m), np.float64)
    for i, (g, n, sy, syy) in enumerate(m.itertuples(index=False)):
        n, sy, syy = int(n), int(sy), int(syy)
        var_num = n * syy - sy * sy  # exact int; population var = num / (100²·n²)
        means[i] = float(sy) / 100.0 / n
        stds[i] = float(np.sqrt(float(var_num))) / 100.0 / n
    import ray

    ref = ray.put((groups_sorted, means, stds))

    def score(t: pa.Table) -> pa.Table:
        gs, mean_arr, std_arr = ray.get(ref)
        g = t[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False).astype("U")
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(gs, g)
        mean = mean_arr[idx]
        std = std_arr[idx]
        z = np.where(std > 0, np.round((v - mean) / np.where(std > 0, std, 1.0), 4) + 0.0, 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                group_col: t[group_col],
                value_col: t[value_col],
                "z": pa.array(z, pa.float64()),
            }
        )

    res = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    if not collect:
        return res
    out = res.to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)[cols]


def zscore_normalize_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    return f"""
WITH p AS (
  SELECT {group_col},
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)) AS sy,
         sum(CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)
             * CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)) AS syy
  FROM {table} GROUP BY {group_col}
),
st AS (
  SELECT {group_col},
         CAST(sy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS mean,
         sqrt(CAST(n * syy - sy * sy AS DOUBLE)) / 100.0 / CAST(n AS DOUBLE) AS std
  FROM p
)
SELECT e.{id_col}, e.{group_col}, e.{value_col},
       CASE WHEN st.std > 0
            THEN round((e.{value_col} - st.mean) / st.std, 4) + 0.0
            ELSE 0.0 END AS z
FROM {table} e JOIN st USING ({group_col})
ORDER BY e.{id_col}
""".strip()


# --------------------------------------------------------------------------
# ntile / percent_rank (rank-window analog)
# --------------------------------------------------------------------------

def ntile_buckets(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    n: int = 4,
    collect: bool = True,
):
    """Assign every row its n-tile within its group by
    ``(value, id)`` order — DuckDB ``ntile(n) OVER (PARTITION BY group
    ORDER BY value, id)`` semantics (first ``size mod n`` tiles get the
    extra row). Same grouped exchange as running_total. Returns
    ``(id, group, value, tile)`` sorted by id."""

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col], kind="stable")
        sz = len(g)
        base, rem = divmod(sz, n)
        sizes = np.full(n, base, np.int64)
        sizes[:rem] += 1
        tiles = np.repeat(np.arange(1, n + 1, dtype=np.int64), sizes)  # len == sz
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                group_col: g[group_col].to_numpy(),
                value_col: g[value_col].to_numpy(),
                "tile": tiles,
            }
        )

    res = ds.groupby(group_col).map_groups(tile, batch_format="pandas")
    if not collect:
        return res
    out = res.to_pandas()
    cols = [id_col, group_col, value_col, "tile"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(id_col).reset_index(drop=True)[cols]


def ntile_buckets_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    n: int = 4,
) -> str:
    return f"""
SELECT {id_col}, {group_col}, {value_col},
       CAST(ntile({n}) OVER (PARTITION BY {group_col}
                             ORDER BY {value_col}, {id_col}) AS BIGINT) AS tile
FROM {table} ORDER BY {id_col}
""".strip()


# --------------------------------------------------------------------------
# window frames: rolling mean + lag deltas
# --------------------------------------------------------------------------

def rolling_mean(
    ds,
    *,
    key: str = "user_id",
    order_by: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 4,
    collect: bool = True,
):
    """Per-key rolling mean over the trailing ``window`` rows (ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW). The frame sum is an exact integer
    (micros) difference of two cumsums; the mean divides by the actual
    frame length, so leading rows average over what exists. Returns
    ``(id, key, roll_mean)`` (rounded 6) sorted by (key, id)."""

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        q = _quantize(g[value_col].to_numpy(np.float64))
        c = np.concatenate(([0], np.cumsum(q)))
        n = q.size
        lo = np.maximum(0, np.arange(n) - window + 1)
        frame_sum = c[1:] - c[lo]
        frame_len = np.arange(n) - lo + 1
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key: g[key].to_numpy(),
                "roll_mean": np.round(frame_sum / 1e6 / frame_len, 6) + 0.0,
            }
        )

    res = ds.groupby(key).map_groups(roll, batch_format="pandas")
    if not collect:
        return res
    out = res.to_pandas()
    cols = [id_col, key, "roll_mean"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values([key, id_col]).reset_index(drop=True)[cols]


def rolling_mean_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    order_by: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 4,
) -> str:
    ob = ", ".join(order_by)
    frame = f"PARTITION BY {key} ORDER BY {ob} ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    return f"""
SELECT {id_col}, {key},
       round(sum(CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT)) OVER ({frame}) / 1e6
             / count(*) OVER ({frame}), 6) + 0.0 AS roll_mean
FROM {table} ORDER BY {key}, {id_col}
""".strip()


def event_gaps(
    ds,
    *,
    key: str = "user_id",
    order_by: tuple[str, str] = ("ts", "event_id"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    collect: bool = True,
):
    """Per-key inter-event gap (lag() delta): microseconds since the
    previous event of the same key; -1 for each key's first event (both
    sides use the same sentinel so NULL semantics can't diverge). Returns
    ``(id, key, gap_us)`` sorted by (key, id)."""

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        ts_us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        gap = np.concatenate(([np.int64(-1)], np.diff(ts_us)))
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key: g[key].to_numpy(),
                "gap_us": gap,
            }
        )

    res = ds.groupby(key).map_groups(gaps, batch_format="pandas")
    if not collect:
        return res
    out = res.to_pandas()
    cols = [id_col, key, "gap_us"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values([key, id_col]).reset_index(drop=True)[cols]


def event_gaps_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    order_by: tuple[str, str] = ("ts", "event_id"),
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    ob = ", ".join(order_by)
    return f"""
SELECT {id_col}, {key},
       coalesce(date_diff('microsecond',
                          lag({ts_col}) OVER (PARTITION BY {key} ORDER BY {ob}),
                          {ts_col}), -1) AS gap_us
FROM {table} ORDER BY {key}, {id_col}
""".strip()


# --------------------------------------------------------------------------
# set algebra between two keyed cohorts
# --------------------------------------------------------------------------

def user_set_ops(
    ds,
    *,
    key: str = "user_id",
    label_col: str = "event_type",
    label_a: str = "click",
    label_b: str = "purchase",
) -> pd.DataFrame:
    """Exact set algebra between two cohorts (keys having an ``label_a``
    event vs a ``label_b`` event): intersection / differences / union /
    Jaccard. Per batch each key contributes distinct (key, in_a, in_b)
    indicator rows; one groupby(key) max-fold yields the per-key membership
    bits, and the final combo counts are a four-cell fold (the sketch-free
    exact sibling of ``kmv_overlap``). Jaccard uses the fixed-point
    floor(x·1e6+0.5)/1e6 rule. Returns one row
    ``(n_a, n_b, n_both, n_a_only, n_b_only, n_union, jaccard)``."""
    from ray.data.aggregate import Max

    def indicators(t: pa.Table) -> pa.Table:
        lab = t[label_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        keys = t[key].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        mask = (lab == label_a) | (lab == label_b)
        keys, lab = keys[mask], lab[mask]
        ku, ki = np.unique(keys, return_inverse=True)
        in_a = np.zeros(ku.size, np.int64)
        in_b = np.zeros(ku.size, np.int64)
        np.maximum.at(in_a, ki, (lab == label_a).astype(np.int64))
        np.maximum.at(in_b, ki, (lab == label_b).astype(np.int64))
        return pa.table(
            {
                key: pa.array(ku, pa.int64()),
                "in_a": pa.array(in_a, pa.int64()),
                "in_b": pa.array(in_b, pa.int64()),
            }
        )

    per_key = (
        ds.map_batches(indicators, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))
        .to_pandas()
    )
    if per_key.empty:
        n_a = n_b = n_both = 0
    else:
        a = per_key["in_a"].to_numpy(np.int64)
        b = per_key["in_b"].to_numpy(np.int64)
        n_a, n_b = int(a.sum()), int(b.sum())
        n_both = int((a & b).sum())
    n_union = n_a + n_b - n_both
    jacc = float(np.floor(n_both * 1e6 / n_union + 0.5) / 1e6) if n_union else 0.0
    return pd.DataFrame(
        {
            "n_a": np.array([n_a], np.int64),
            "n_b": np.array([n_b], np.int64),
            "n_both": np.array([n_both], np.int64),
            "n_a_only": np.array([n_a - n_both], np.int64),
            "n_b_only": np.array([n_b - n_both], np.int64),
            "n_union": np.array([n_union], np.int64),
            "jaccard": [jacc],
        }
    )


def user_set_ops_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    label_col: str = "event_type",
    label_a: str = "click",
    label_b: str = "purchase",
) -> str:
    return f"""
WITH m AS (
  SELECT {key},
         max(CASE WHEN {label_col} = '{label_a}' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN {label_col} = '{label_b}' THEN 1 ELSE 0 END) AS in_b
  FROM {table} WHERE {label_col} IN ('{label_a}', '{label_b}')
  GROUP BY {key}
),
c AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(in_b) AS BIGINT) AS n_b,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM m
)
SELECT n_a, n_b, n_both,
       n_a - n_both AS n_a_only,
       n_b - n_both AS n_b_only,
       n_a + n_b - n_both AS n_union,
       CASE WHEN n_a + n_b - n_both = 0 THEN 0.0
            ELSE floor(n_both * 1e6 / (n_a + n_b - n_both) + 0.5) / 1e6
       END AS jaccard
FROM c
""".strip()


# --------------------------------------------------------------------------
# Pearson correlation between per-group hourly volume series
# --------------------------------------------------------------------------

def hourly_correlation(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> pd.DataFrame:
    """Pearson correlation between every pair of event types' hour-of-day
    volume series (n = 24 points): do types co-move over the day? Built on
    the pivot_hourly grid (bincount partials, no shuffle); r is computed
    from exact integer sums with float entering once —
    r = (nΣxy − ΣxΣy) / (sqrt(nΣxx − Σx²) · sqrt(nΣyy − Σy²)).
    Returns ``(type_a, type_b, r)`` (rounded 6) for type_a < type_b."""
    grid = pivot_hourly(ds, type_col=type_col, ts_col=ts_col, types=types)
    n = len(grid)
    series = {t: grid[f"n_{t}"].to_numpy(np.int64) for t in types}
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            x, y = series[ta], series[tb]
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int(np.dot(x, y))
            sxx, syy = int(np.dot(x, x)), int(np.dot(y, y))
            num = n * sxy - sx * sy
            da, db = n * sxx - sx * sx, n * syy - sy * sy
            if da == 0 or db == 0:
                rows.append((ta, tb, None))
                continue
            r = float(num) / (float(np.sqrt(float(da))) * float(np.sqrt(float(db))))
            rows.append((ta, tb, round(r, 6) + 0.0))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "r"])


def hourly_correlation_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER ({type_col} = '{t}') AS BIGINT) AS n_{t}" for t in types
    )
    pair_selects = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            pair_selects.append(
                f"""SELECT '{ta}' AS type_a, '{tb}' AS type_b,
       CASE WHEN 24 * sum(n_{ta} * n_{ta}) - sum(n_{ta}) * sum(n_{ta}) = 0
              OR 24 * sum(n_{tb} * n_{tb}) - sum(n_{tb}) * sum(n_{tb}) = 0 THEN NULL
            ELSE round(CAST(24 * sum(n_{ta} * n_{tb}) - sum(n_{ta}) * sum(n_{tb}) AS DOUBLE)
                 / (sqrt(CAST(24 * sum(n_{ta} * n_{ta}) - sum(n_{ta}) * sum(n_{ta}) AS DOUBLE))
                    * sqrt(CAST(24 * sum(n_{tb} * n_{tb}) - sum(n_{tb}) * sum(n_{tb}) AS DOUBLE))), 6) + 0.0
       END AS r
FROM grid"""
            )
    body = "\nUNION ALL\n".join(pair_selects)
    return f"""
WITH hours AS (SELECT unnest(range(24)) AS hour),
agg AS (
  SELECT CAST(extract(hour FROM {ts_col}) AS BIGINT) AS hour, {type_col}
  FROM {table}
),
grid AS (
  SELECT CAST(h.hour AS BIGINT) AS hour,
       {cols}
  FROM hours h LEFT JOIN agg ON agg.hour = h.hour
  GROUP BY h.hour
)
SELECT * FROM ({body}) ORDER BY type_a, type_b
""".strip()


def kendall_hourly(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> pd.DataFrame:
    """Kendall τ-b rank correlation between every pair of event types'
    hour-of-day volume series — the robust, outlier-immune companion to
    ``hourly_correlation`` (Pearson): do the types RANK their busy hours
    the same way, regardless of magnitude? Concordant/discordant/tie
    counts over the 276 hour pairs are exact integers on both sides; the
    τ-b denominator mirrors the autocorr discipline (sqrt(n0−t_a) ·
    sqrt(n0−t_b) — the same two-sqrt expression verbatim in SQL, never
    sqrt of the product). Built on the ``pivot_hourly`` grid (bincount
    partials, no shuffle; the raw events never leave their batches).
    Returns ``(type_a, type_b, concordant, discordant, tau)`` for
    type_a < type_b, rounded 6; NULL when either series is constant."""
    grid = pivot_hourly(ds, type_col=type_col, ts_col=ts_col, types=types)
    n = len(grid)
    n0 = n * (n - 1) // 2
    series = {t: grid[f"n_{t}"].to_numpy(np.int64) for t in types}
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            x, y = series[ta], series[tb]
            conc = disc = tie_a = tie_b = 0
            for p in range(n):
                dx = x[p] - x[p + 1 :]
                dy = y[p] - y[p + 1 :]
                prod = dx * dy
                conc += int((prod > 0).sum())
                disc += int((prod < 0).sum())
                tie_a += int((dx == 0).sum())
                tie_b += int((dy == 0).sum())
            da, db = n0 - tie_a, n0 - tie_b
            tau = (
                round(float(conc - disc) / (float(np.sqrt(float(da))) * float(np.sqrt(float(db)))), 6) + 0.0
                if da and db
                else None
            )
            rows.append((ta, tb, conc, disc, tau))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "concordant", "discordant", "tau"])
    out["concordant"] = out["concordant"].astype(np.int64)
    out["discordant"] = out["discordant"].astype(np.int64)
    return out


def kendall_hourly_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER ({type_col} = '{t}') AS BIGINT) AS n_{t}" for t in types
    )
    n0 = 24 * 23 // 2
    pair_selects = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            pair_selects.append(
                f"""SELECT '{ta}' AS type_a, '{tb}' AS type_b,
       CAST(sum(CASE WHEN (g1.n_{ta} - g2.n_{ta}) * (g1.n_{tb} - g2.n_{tb}) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       CAST(sum(CASE WHEN (g1.n_{ta} - g2.n_{ta}) * (g1.n_{tb} - g2.n_{tb}) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       CAST(sum(CASE WHEN g1.n_{ta} = g2.n_{ta} THEN 1 ELSE 0 END) AS BIGINT) AS tie_a,
       CAST(sum(CASE WHEN g1.n_{tb} = g2.n_{tb} THEN 1 ELSE 0 END) AS BIGINT) AS tie_b
FROM grid g1 JOIN grid g2 ON g1.hour < g2.hour"""
            )
    body = "\nUNION ALL\n".join(pair_selects)
    return f"""
WITH hours AS (SELECT unnest(range(24)) AS hour),
agg AS (
  SELECT CAST(extract(hour FROM {ts_col}) AS BIGINT) AS hour, {type_col}
  FROM {table}
),
grid AS (
  SELECT CAST(h.hour AS BIGINT) AS hour,
       {cols}
  FROM hours h LEFT JOIN agg ON agg.hour = h.hour
  GROUP BY h.hour
),
cmp AS ({body})
SELECT type_a, type_b, concordant, discordant,
       CASE WHEN {n0} - tie_a = 0 OR {n0} - tie_b = 0 THEN NULL
            ELSE round(CAST(concordant - discordant AS DOUBLE)
                       / (sqrt(CAST({n0} - tie_a AS DOUBLE))
                          * sqrt(CAST({n0} - tie_b AS DOUBLE))), 6) + 0.0
       END AS tau
FROM cmp ORDER BY type_a, type_b
""".strip()


def benford_value(ds, *, value_col: str = "value") -> pd.DataFrame:
    """Benford's-law leading-digit audit of a numeric column — the classic
    fabricated-data / unit-mixing detector: natural multiplicative data has
    P(d) = log₁₀(1 + 1/d); synthetic-uniform or truncated feeds drift flat.
    Values are micro-quantized (half-up, the shared _quantize) and the
    leading digit is taken from the integer's decimal string — never a
    float log10, whose boundary cells (10ᵏ) misclassify. Per-batch digit
    bincounts fold to 9 cells; ratio is the half-up fixed integer division
    at 1e6; the expected column mirrors ``ln(1+1/d)/ln(10)`` verbatim on
    both sides. Non-positive micro values are excluded. Returns
    ``(digit, n, ratio, expected)`` for digits 1–9 (empty if no positive
    values)."""
    import math

    def partials(batch: pa.Table) -> pa.Table:
        v = batch[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        micros = _quantize(v)
        micros = micros[micros > 0]
        if micros.size:
            d = micros.astype("U1").astype(np.int64)  # unicode cast truncates to 1st char
            counts = np.bincount(d, minlength=10)[1:10].astype(np.int64)
        else:
            counts = np.zeros(9, np.int64)
        return pa.table(
            {"digit": pa.array(np.arange(1, 10, dtype=np.int64)), "n": pa.array(counts)}
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["digit", "n", "ratio", "expected"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby("digit", sort=True, as_index=False)["n"].sum()
    tot = int(folded["n"].sum())
    if tot == 0:
        return pd.DataFrame(columns=cols)
    ns = [int(x) for x in folded["n"]]
    return pd.DataFrame(
        {
            "digit": np.arange(1, 10, dtype=np.int64),
            "n": np.array(ns, np.int64),
            "ratio": [((2 * n * 1_000_000 + tot) // (2 * tot)) / 1e6 for n in ns],
            "expected": [
                round(math.log(1.0 + 1.0 / d) / math.log(10.0), 6) + 0.0 for d in range(1, 10)
            ],
        }
    )


def benford_value_sql(table: str = "events", *, value_col: str = "value") -> str:
    return f"""
WITH m AS (
  SELECT CAST(floor({value_col} * 1000000.0 + 0.5) AS BIGINT) AS micros FROM {table}
),
pos AS (SELECT micros FROM m WHERE micros > 0),
cnt AS (
  SELECT CAST(substr(CAST(micros AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM pos GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS t FROM pos)
SELECT d.digit, coalesce(c.n, 0) AS n,
       CAST((2 * CAST(coalesce(c.n, 0) AS HUGEINT) * 1000000 + t.t)
            // (2 * t.t) AS DOUBLE) / 1e6 AS ratio,
       round(ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE)) / ln(10.0), 6) + 0.0 AS expected
FROM (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit) d
LEFT JOIN cnt c USING (digit) CROSS JOIN tot t
WHERE t.t > 0
ORDER BY d.digit
""".strip()


def anova_f(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
) -> pd.DataFrame:
    """One-way ANOVA F-statistic across groups — does the value's mean
    differ by event type more than within-type noise explains? The
    many-group extension of ``t_test``. Values quantize to centi-units;
    per-group (n, Σy, Σy²) partials come from one grouped reduce. Every
    sum-of-squares term is carried as a 1e6 fixed-point INTEGER — the
    per-group s²/n is the half-up division (2·s²·1e6 + n)//(2n), so
    SSB/SSW are exact ints on both sides (HUGEINT in SQL; Python ints
    here, since s² at corpus scale exceeds 2^63) — and F is one exact
    integer ratio rounded 6. Returns one row
    ``(n, k, ss_between, ss_within, f)`` with the SS columns descaled to
    natural centi² units (fp/1e10); F is NULL when k < 2 or SSW = 0."""

    def partials(batch: pa.Table) -> pa.Table:
        g = batch[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        y = _quantize_centi(
            batch[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        gu, gi = np.unique(g, return_inverse=True)
        n = np.bincount(gi).astype(np.int64)
        s = np.zeros(len(gu), np.int64)
        np.add.at(s, gi, y)
        # Σy² with Python-int arithmetic (float64 bincount weights lose
        # exactness past 2^53, i.e. |value| ≳ 9e5); shipped as decimal128
        ss_acc = np.zeros(len(gu), dtype=object)
        np.add.at(ss_acc, gi, y.astype(object) * y.astype(object))
        return pa.table(
            {
                "g": pa.array(gu, pa.string()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "ss": pa.array([int(x) for x in ss_acc], pa.decimal128(38, 0)),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["n", "k", "ss_between", "ss_within", "f"]
    if not parts:
        return pd.DataFrame(columns=cols)
    per = pd.concat(parts, ignore_index=True).groupby("g", sort=True, as_index=False)[["n", "s", "ss"]].sum()
    k = int(len(per))
    if k == 0:
        return pd.DataFrame(columns=cols)
    big_n = int(per["n"].sum())
    gs = int(per["s"].sum())
    gss = int(per["ss"].sum())
    sq = sum((2 * int(s) * int(s) * 1_000_000 + int(n)) // (2 * int(n)) for n, s in zip(per["n"], per["s"]))
    grand = (2 * gs * gs * 1_000_000 + big_n) // (2 * big_n)
    ssb = sq - grand
    ssw = gss * 1_000_000 - sq
    f = (
        round(float(ssb * (big_n - k)) / float(ssw * (k - 1)), 6) + 0.0
        if k > 1 and ssw > 0 and big_n > k
        else None
    )
    return pd.DataFrame(
        {
            "n": np.array([big_n], np.int64),
            "k": np.array([k], np.int64),
            "ss_between": [float(ssb) / 1e10],
            "ss_within": [float(ssw) / 1e10],
            "f": [f],
        }
    )


def anova_f_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    q = f"CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)"
    return f"""
WITH qv AS (SELECT {group_col} AS g, {q} AS y FROM {table}),
per AS (SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(y) AS s, sum(y * y) AS ss
        FROM qv GROUP BY g),
agg AS (
  SELECT CAST(count(*) AS HUGEINT) AS k,
         sum(n) AS bign, sum(s) AS gs, sum(ss) AS gss,
         sum((2 * s * s * 1000000 + n) // (2 * n)) AS sq
  FROM per
),
fp AS (
  SELECT k, bign,
         sq - (2 * gs * gs * 1000000 + bign) // (2 * bign) AS ssb,
         gss * 1000000 - sq AS ssw
  FROM agg
)
SELECT CAST(bign AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(ssb AS DOUBLE) / 1e10 AS ss_between,
       CAST(ssw AS DOUBLE) / 1e10 AS ss_within,
       CASE WHEN k > 1 AND ssw > 0 AND bign > k
            THEN round(CAST(ssb * (bign - k) AS DOUBLE) / CAST(ssw * (k - 1) AS DOUBLE), 6) + 0.0
            ELSE NULL END AS f
FROM fp
""".strip()


def events_heatmap(
    ds,
    *,
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Day-of-week × hour-of-day activity grid (the ops-dashboard
    seasonality heatmap; the weekly extension of ``pivot_hourly``).
    Weekday comes from pure epoch-day arithmetic ``((day + 3) % 7) + 1``
    (1 = Monday, matching ISO) mirrored verbatim in SQL — never a
    locale-dependent date function. One bincount partial per batch folds
    to 168 cells; the dense grid (zeros included) always has 168 rows.
    Returns ``(dow, hod, n)`` sorted by (dow, hod)."""

    def partials(batch: pa.Table) -> pa.Table:
        us = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        dow = ((us // 86_400_000_000 + 3) % 7).astype(np.int64)
        hod = ((us // 3_600_000_000) % 24).astype(np.int64)
        cnt = np.bincount(dow * 24 + hod, minlength=168).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(168, dtype=np.int64)), "n": pa.array(cnt)})

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["dow", "hod", "n"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby("cell", sort=True, as_index=False)["n"].sum()
    cells = np.arange(168, dtype=np.int64)
    n = np.zeros(168, np.int64)
    n[folded["cell"].to_numpy(np.int64)] = folded["n"].to_numpy(np.int64)
    return pd.DataFrame({"dow": cells // 24 + 1, "hod": cells % 24, "n": n})


def events_heatmap_sql(table: str = "events", *, ts_col: str = "ts") -> str:
    return f"""
WITH cells AS (
  SELECT ((epoch_us({ts_col}) // 86400000000 + 3) % 7) + 1 AS dow,
         (epoch_us({ts_col}) // 3600000000) % 24 AS hod
  FROM {table}
),
cnt AS (SELECT dow, hod, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
grid AS (
  SELECT CAST(d.range + 1 AS BIGINT) AS dow, CAST(h.range AS BIGINT) AS hod
  FROM range(7) d CROSS JOIN range(24) h
)
SELECT g.dow, g.hod, coalesce(c.n, 0) AS n
FROM grid g LEFT JOIN cnt c ON c.dow = g.dow AND c.hod = g.hod
ORDER BY g.dow, g.hod
""".strip()


def k_anonymity(
    ds,
    *,
    quasi_cols: tuple[str, ...] = ("user_id", "event_type"),
    k: int = 3,
) -> pd.DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the
    re-identification risk check a privacy review runs before release
    (``pii_scrub``'s statistical companion): how many equivalence classes
    have fewer than ``k`` rows, and what share of rows sits in them. One
    grouped count (quasi-id-bounded partials: per-batch group counts fold
    on the driver); all outputs are exact integers plus one half-up fixed
    ratio. Returns one row
    ``(n_groups, n_risky_groups, risky_rows, total_rows, risk_share)``."""

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.select(list(quasi_cols)).group_by(list(quasi_cols)).aggregate(
            [(quasi_cols[0], "count")]
        )
        return pa.table(
            {
                **{c: g[c] for c in quasi_cols},
                "n": g[f"{quasi_cols[0]}_count"].cast(pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["n_groups", "n_risky_groups", "risky_rows", "total_rows", "risk_share"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = pd.concat(parts, ignore_index=True).groupby(list(quasi_cols), sort=False, as_index=False)["n"].sum()
    sizes = folded["n"].to_numpy(np.int64)
    total = int(sizes.sum())
    if total == 0:
        return pd.DataFrame(columns=cols)
    risky = sizes < k
    risky_rows = int(sizes[risky].sum())
    return pd.DataFrame(
        {
            "n_groups": np.array([sizes.size], np.int64),
            "n_risky_groups": np.array([int(risky.sum())], np.int64),
            "risky_rows": np.array([risky_rows], np.int64),
            "total_rows": np.array([total], np.int64),
            "risk_share": [((2 * risky_rows * 1_000_000 + total) // (2 * total)) / 1e6],
        }
    )


def k_anonymity_sql(
    table: str = "events",
    *,
    quasi_cols: tuple[str, ...] = ("user_id", "event_type"),
    k: int = 3,
) -> str:
    qc = ", ".join(quasi_cols)
    return f"""
WITH g AS (SELECT {qc}, CAST(count(*) AS BIGINT) AS n FROM {table} GROUP BY {qc}),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(count(*) FILTER (n < {k}) AS BIGINT) AS n_risky_groups,
         CAST(coalesce(sum(n) FILTER (n < {k}), 0) AS BIGINT) AS risky_rows,
         CAST(sum(n) AS BIGINT) AS total_rows
  FROM g
)
SELECT n_groups, n_risky_groups, risky_rows, total_rows,
       CAST((2 * CAST(risky_rows AS HUGEINT) * 1000000 + total_rows)
            // (2 * CAST(total_rows AS HUGEINT)) AS DOUBLE) / 1e6 AS risk_share
FROM agg
""".strip()


def l_diversity(
    ds,
    *,
    group_cols: tuple[str, ...] = ("user_id", "event_type"),
    sensitive_col: str = "hod",
    l: int = 2,
) -> pd.DataFrame:
    """l-diversity audit — k-anonymity's companion: an equivalence class
    can be large yet still leak if its rows share too few SENSITIVE
    values (here: a user×type history squeezed into < l distinct hours of
    day pins WHEN they act). Counts groups whose distinct-sensitive count
    is below ``l`` and the rows they expose. Partials are per-batch
    distinct (group…, sensitive) tuples plus row counts — the fold is
    distinct-tuple bounded. Exact integers + one half-up fixed ratio.
    Returns one row
    ``(n_groups, n_homogeneous, exposed_rows, total_rows, exposed_share)``."""
    gcols = list(group_cols)

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.select(gcols + [sensitive_col]).group_by(
            gcols + [sensitive_col]
        ).aggregate([(group_cols[0], "count")])
        return pa.table(
            {
                **{c: g[c] for c in gcols},
                "s": g[sensitive_col],
                "n": g[f"{group_cols[0]}_count"].cast(pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["n_groups", "n_homogeneous", "exposed_rows", "total_rows", "exposed_share"]
    if not parts:
        return pd.DataFrame(columns=cols)
    pairs = pd.concat(parts, ignore_index=True).groupby(gcols + ["s"], sort=False, as_index=False)["n"].sum()
    per_g = pairs.groupby(gcols).agg(div=("s", "size"), rows=("n", "sum"))
    total = int(per_g["rows"].sum())
    if total == 0:
        return pd.DataFrame(columns=cols)
    homog = per_g["div"] < l
    exposed = int(per_g.loc[homog, "rows"].sum())
    return pd.DataFrame(
        {
            "n_groups": np.array([len(per_g)], np.int64),
            "n_homogeneous": np.array([int(homog.sum())], np.int64),
            "exposed_rows": np.array([exposed], np.int64),
            "total_rows": np.array([total], np.int64),
            "exposed_share": [((2 * exposed * 1_000_000 + total) // (2 * total)) / 1e6],
        }
    )


def l_diversity_sql(
    table: str = "events",
    *,
    group_cols: tuple[str, ...] = ("user_id", "event_type"),
    sensitive_expr: str = "CAST(extract(hour FROM ts) AS BIGINT)",
    l: int = 2,
) -> str:
    gc = ", ".join(group_cols)
    return f"""
WITH per_g AS (
  SELECT {gc},
         CAST(count(DISTINCT {sensitive_expr}) AS BIGINT) AS div,
         CAST(count(*) AS BIGINT) AS rows_n
  FROM {table} GROUP BY {gc}
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(count(*) FILTER (div < {l}) AS BIGINT) AS n_homogeneous,
         CAST(coalesce(sum(rows_n) FILTER (div < {l}), 0) AS BIGINT) AS exposed_rows,
         CAST(sum(rows_n) AS BIGINT) AS total_rows
  FROM per_g
)
SELECT n_groups, n_homogeneous, exposed_rows, total_rows,
       CAST((2 * CAST(exposed_rows AS HUGEINT) * 1000000 + total_rows)
            // (2 * CAST(total_rows AS HUGEINT)) AS DOUBLE) / 1e6 AS exposed_share
FROM agg
""".strip()


def theil_sen(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Theil–Sen robust rate per event type: the LOWER MEDIAN of all
    pairwise slopes (Sⱼ−Sᵢ)/(j−i) over the CUMULATIVE hourly count series
    — the outlier-immune events-per-bucket estimate (one traffic spike
    can't bend it, unlike the OLS slope; on the raw stationary series the
    median slope is degenerately 0). Slopes are double divisions of exact
    ints (identical both sides); the median is rank-selected (row
    (m+1)//2 under (slope, i, j) total order), NEVER interpolated —
    two-double lerp is where numpy and DuckDB can drift a ulp apart. Pair
    enumeration is hours²-bounded on the folded histogram (same
    driver-fold shape as change_point), never over raw events. Returns
    ``(event_type, n_buckets, n_pairs, slope)`` sorted by type; types
    with one bucket are omitted."""

    def partials(batch: pa.Table) -> pa.Table:
        hrs = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        t = pa.table({"t": batch[type_col], "hr": pa.array(hrs, pa.int64())})
        g = t.group_by(["t", "hr"]).aggregate([("hr", "count")])
        return pa.table(
            {"t": g["t"], "hr": g["hr"], "c": g["hr_count"].cast(pa.int64())}
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = [type_col, "n_buckets", "n_pairs", "slope"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["t", "hr"], sort=True, as_index=False)["c"]
        .sum()
    )
    rows = []
    for t, g in folded.groupby("t", sort=True):
        c = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(c.size)
        if n < 2:
            continue
        si, sj, sl = [], [], []
        for i in range(n - 1):
            j = np.arange(i + 1, n)
            si.append(np.full(j.size, i + 1, np.int64))
            sj.append(j + 1)
            sl.append((c[i + 1 :] - c[i]).astype(np.float64) / (j - i).astype(np.float64))
        i_a = np.concatenate(si)
        j_a = np.concatenate(sj)
        s_a = np.concatenate(sl)
        m = int(s_a.size)
        order = np.lexsort((j_a, i_a, s_a))
        med = float(s_a[order[(m + 1) // 2 - 1]])
        rows.append((t, n, m, med))
    if not rows:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(rows, columns=cols)
    out["n_buckets"] = out["n_buckets"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


def theil_sen_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    return f"""
WITH hb AS (
  SELECT {type_col} AS t, epoch_us({ts_col}) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
o AS (
  SELECT t, row_number() OVER (PARTITION BY t ORDER BY hr) AS pos,
         sum(c) OVER (PARTITION BY t ORDER BY hr) AS s,
         count(*) OVER (PARTITION BY t) AS n
  FROM hb
),
pairs AS (
  SELECT a.t, a.n, a.pos AS i, b.pos AS j,
         CAST(b.s - a.s AS DOUBLE) / CAST(b.pos - a.pos AS DOUBLE) AS slope
  FROM o a JOIN o b ON a.t = b.t AND a.pos < b.pos
),
ranked AS (
  SELECT t, n, slope,
         row_number() OVER (PARTITION BY t ORDER BY slope, i, j) AS rn,
         count(*) OVER (PARTITION BY t) AS m
  FROM pairs
)
SELECT t AS {type_col}, CAST(n AS BIGINT) AS n_buckets,
       CAST(m AS BIGINT) AS n_pairs, slope
FROM ranked WHERE rn = (m + 1) // 2 ORDER BY t
""".strip()


def psi_drift(
    ds,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 8,
) -> pd.DataFrame:
    """Population Stability Index between the early and late half of the
    stream — the standard production drift metric (PSI < 0.1 stable,
    > 0.25 shifted): split rows at the median epoch-hour, bin values by
    the EARLY half's octile edges, and sum (p−q)·ln(p/q) over bins with
    add-one smoothing. Octile edges of integer centi values are
    dyadic-exact (``n_bins`` must be a power of two — the
    variable_width_histogram seed rule); p and q are ratios of exact
    integers evaluated in one mirrored float expression; each bin's term
    nano-quantizes to an int BEFORE the sum (the unigram_logprob rule), so
    the total is an exact integer sum. Two streaming passes: a tiny
    epoch-hour histogram for the split, then a (segment, centi-value)
    histogram fold — iterations never re-read raw events. Returns one row
    per bin ``(bin, n_early, n_late, term)`` plus the shared ``psi``."""
    import math

    def hr_partials(batch: pa.Table) -> pa.Table:
        hrs = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        u, c = np.unique(hrs, return_counts=True)
        return pa.table({"hr": pa.array(u, pa.int64()), "w": pa.array(c.astype(np.int64), pa.int64())})

    hsel = [
        b.to_pandas()
        for b in ds.map_batches(hr_partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["bin", "n_early", "n_late", "term", "psi"]
    if not hsel:
        return pd.DataFrame(columns=cols)
    hh = pd.concat(hsel, ignore_index=True).groupby("hr", sort=True, as_index=False)["w"].sum()
    hv = hh["hr"].to_numpy(np.int64)
    hw = hh["w"].to_numpy(np.int64)
    total = int(hw.sum())
    if total == 0:
        return pd.DataFrame(columns=cols)
    cum = np.cumsum(hw)

    def elem(vals, cumw, r):
        return int(vals[np.searchsorted(cumw, r, side="right")])

    h = (total - 1) * 0.5
    g = int(np.floor(h))
    f = h - g
    a0 = elem(hv, cum, g)
    b0 = elem(hv, cum, min(g + 1, total - 1))
    median_hr = a0 + (b0 - a0) * f  # exact: ints + dyadic f

    def seg_partials(batch: pa.Table) -> pa.Table:
        hrs = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        early = hrs.astype(np.float64) <= median_hr
        v = _quantize_centi(
            batch[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        df = pd.DataFrame({"early": early.astype(np.int64), "v": v})
        gdf = df.groupby(["early", "v"], sort=False).size().reset_index(name="w")
        return pa.Table.from_pandas(gdf, preserve_index=False)

    parts = [
        b.to_pandas()
        for b in ds.map_batches(seg_partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    folded = pd.concat(parts, ignore_index=True).groupby(["early", "v"], sort=True, as_index=False)["w"].sum()
    ea = folded[folded["early"] == 1]
    la = folded[folded["early"] == 0]
    av, aw = ea["v"].to_numpy(np.int64), ea["w"].to_numpy(np.int64)
    lv, lw = la["v"].to_numpy(np.int64), la["w"].to_numpy(np.int64)
    na, nb = int(aw.sum()), int(lw.sum())
    if na == 0 or nb == 0:
        return pd.DataFrame(columns=cols)
    acum = np.cumsum(aw)
    edges = []
    for j in range(1, n_bins):
        h = (na - 1) * j / n_bins  # dyadic for power-of-two n_bins
        g = int(np.floor(h))
        f = h - g
        x = elem(av, acum, g)
        y = elem(av, acum, min(g + 1, na - 1))
        edges.append(x + (y - x) * f)
    edges = np.array(edges, np.float64)

    def bins_of(vals, weights):
        b = 1 + (vals[:, None].astype(np.float64) > edges[None, :]).sum(axis=1)
        return np.bincount(b, weights=weights, minlength=n_bins + 1)[1:].astype(np.int64)

    ca = bins_of(av, aw)
    cb = bins_of(lv, lw)
    terms = []
    for i in range(n_bins):
        p = float(ca[i] + 1) / float(na + n_bins)
        q = float(cb[i] + 1) / float(nb + n_bins)
        terms.append(int(math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)))
    psi = sum(terms) / 1e9
    return pd.DataFrame(
        {
            "bin": np.arange(1, n_bins + 1, dtype=np.int64),
            "n_early": ca,
            "n_late": cb,
            "term": np.array(terms, np.int64).astype(np.float64) / 1e9,
            "psi": [psi] * n_bins,
        }
    )


def psi_drift_sql(
    table: str = "events",
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 8,
) -> str:
    edge_cols = ", ".join(
        f"quantile_cont(cv, {j}.0 / {n_bins}) FILTER (early = 1) AS e{j}"
        for j in range(1, n_bins)
    )
    bin_expr = "1" + "".join(
        f" + CASE WHEN CAST(cv AS DOUBLE) > x.e{j} THEN 1 ELSE 0 END" for j in range(1, n_bins)
    )
    return f"""
WITH rows_t AS (
  SELECT epoch_us({ts_col}) // 3600000000 AS hr,
         CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT) AS cv
  FROM {table}
),
med AS (SELECT quantile_cont(hr, 0.5) AS m FROM rows_t),
seg AS (
  SELECT CASE WHEN CAST(hr AS DOUBLE) <= med.m THEN 1 ELSE 0 END AS early, cv
  FROM rows_t CROSS JOIN med
),
x AS (SELECT {edge_cols}, CAST(count(*) FILTER (early = 1) AS BIGINT) AS na,
             CAST(count(*) FILTER (early = 0) AS BIGINT) AS nb
      FROM seg),
binned AS (
  SELECT s.early, {bin_expr} AS bin FROM seg s CROSS JOIN x
),
grid AS (SELECT CAST(unnest(range(1, {n_bins + 1})) AS BIGINT) AS bin),
cnt AS (
  SELECT g.bin,
         CAST(coalesce(sum(CASE WHEN b.early = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_early,
         CAST(coalesce(sum(CASE WHEN b.early = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
  FROM grid g LEFT JOIN binned b ON b.bin = g.bin
  GROUP BY g.bin
),
terms AS (
  SELECT c.bin, c.n_early, c.n_late,
         CAST(floor(
           (CAST(c.n_early + 1 AS DOUBLE) / CAST(x.na + {n_bins} AS DOUBLE)
            - CAST(c.n_late + 1 AS DOUBLE) / CAST(x.nb + {n_bins} AS DOUBLE))
           * ln((CAST(c.n_early + 1 AS DOUBLE) / CAST(x.na + {n_bins} AS DOUBLE))
                / (CAST(c.n_late + 1 AS DOUBLE) / CAST(x.nb + {n_bins} AS DOUBLE)))
           * 1e9 + 0.5) AS BIGINT) AS t
  FROM cnt c CROSS JOIN x
)
SELECT bin, n_early, n_late,
       CAST(t AS DOUBLE) / 1e9 AS term,
       CAST(sum(t) OVER () AS DOUBLE) / 1e9 AS psi
FROM terms ORDER BY bin
""".strip()


def variable_width_histogram(
    ds,
    *,
    value_col: str = "value",
    k: int = 4,
    iters: int = 3,
) -> pd.DataFrame:
    """ES ``variable_width_histogram`` aggregation: ``k`` buckets whose
    boundaries adapt to the data — deterministic 1-D Lloyd clustering over
    the value distribution (the exact-regime stand-in for ES's streaming
    merge heuristic). Values centi-quantize; ONE streaming pass folds the
    (centi-value → count) weighted histogram (bounded by the value range ×
    100, so iterations never re-read the corpus — cheaper than the
    embedding k-means' per-iteration re-stream); seeds are quantile_cont
    at (2i+1)/(2k) over the integer centi values (eighth-quantiles of
    integers are dyadic-exact, the role_token_quantiles rule); ``iters``
    weighted Lloyd steps run on the folded histogram with integer
    distances |v·1e6 − c|, ties to the lower cluster, half-up fixed
    centroid updates, empty clusters keeping their centroid — mirrored by
    an unrolled-CTE oracle (the kmeans rule). Returns
    ``(cluster, n, min_value, max_value, centroid)`` for non-empty
    clusters ascending."""

    def partials(batch: pa.Table) -> pa.Table:
        v = _quantize_centi(
            batch[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()), "w": pa.array(c.astype(np.int64), pa.int64())})

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["cluster", "n", "min_value", "max_value", "centroid"]
    if not parts:
        return pd.DataFrame(columns=cols)
    hist = pd.concat(parts, ignore_index=True).groupby("v", sort=True, as_index=False)["w"].sum()
    if hist.empty:
        return pd.DataFrame(columns=cols)
    v = hist["v"].to_numpy(np.int64)
    w = hist["w"].to_numpy(np.int64)
    total = int(w.sum())
    cum = np.cumsum(w)

    def elem(r: int) -> int:  # value of the r-th (0-based) element of the sorted multiset
        return int(v[np.searchsorted(cum, r, side="right")])

    cents = []
    for i in range(k):
        h = (total - 1) * (2 * i + 1) / (2 * k)  # dyadic-exact for k a power of 2
        g = int(np.floor(h))
        f = h - g
        a = elem(g)
        b = elem(min(g + 1, total - 1))
        q = a + (b - a) * f  # exact: integer a,b and dyadic f
        cents.append(int(np.floor(q * 1e6 + 0.5)))
    cent = np.array(cents, np.int64)

    vfp = v * 1_000_000
    for _ in range(iters):
        d = np.abs(vfp[:, None] - cent[None, :])
        assign = np.argmin(d, axis=1)  # argmin ties → lowest index (both sides)
        new = cent.copy()
        for j in range(k):
            m = assign == j
            if m.any():
                W = int(w[m].sum())
                S = sum(int(a) * int(b) for a, b in zip(v[m], w[m]))
                # DuckDB `//` truncates toward zero; Python floors — mirror
                # truncation so negative-valued centroids stay bit-identical
                num, den = 2 * S * 1_000_000 + W, 2 * W
                new[j] = num // den if num >= 0 else -((-num) // den)
        cent = new

    d = np.abs(vfp[:, None] - cent[None, :])
    assign = np.argmin(d, axis=1)
    rows = []
    for j in range(k):
        m = assign == j
        if not m.any():
            continue
        rows.append(
            (
                j,
                int(w[m].sum()),
                float(v[m].min()) / 100.0,
                float(v[m].max()) / 100.0,
                float(cent[j]) / 1e8,
            )
        )
    out = pd.DataFrame(rows, columns=cols)
    out["cluster"] = out["cluster"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def variable_width_histogram_sql(
    table: str = "events",
    *,
    value_col: str = "value",
    k: int = 4,
    iters: int = 3,
) -> str:
    # c0 via VALUES built from scalar quantile subqueries
    seed_rows = ", ".join(
        f"({j}, (SELECT CAST(floor(quantile_cont(cv, {2 * j + 1}.0 / {2 * k}) * 1e6 + 0.5) AS BIGINT) FROM cv_t))"
        for j in range(k)
    )
    parts = [
        f"""WITH cv_t AS (SELECT CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT) AS cv FROM {table}),
h AS (SELECT cv AS v, CAST(count(*) AS BIGINT) AS w FROM cv_t GROUP BY cv),
c0 AS (SELECT CAST(c.col0 AS BIGINT) AS cluster, CAST(c.col1 AS BIGINT) AS c
       FROM (VALUES {seed_rows}) c)"""
    ]
    for it in range(iters):
        cprev, a, cnext = f"c{it}", f"a{it}", f"c{it + 1}"
        parts.append(
            f"""{a} AS (
  SELECT v, w, cluster FROM (
    SELECT h.v, h.w, c.cluster,
           row_number() OVER (PARTITION BY h.v ORDER BY abs(h.v * 1000000 - c.c), c.cluster) AS rn
    FROM h CROSS JOIN {cprev} c
  ) WHERE rn = 1
),
{cnext} AS (
  SELECT c.cluster, coalesce(n.c, c.c) AS c
  FROM {cprev} c LEFT JOIN (
    SELECT cluster,
           (2 * sum(CAST(v AS HUGEINT) * w) * 1000000 + sum(CAST(w AS HUGEINT)))
           // (2 * sum(CAST(w AS HUGEINT))) AS c
    FROM {a} GROUP BY cluster
  ) n ON n.cluster = c.cluster
)"""
        )
    parts.append(
        f"""afinal AS (
  SELECT v, w, cluster FROM (
    SELECT h.v, h.w, c.cluster,
           row_number() OVER (PARTITION BY h.v ORDER BY abs(h.v * 1000000 - c.c), c.cluster) AS rn
    FROM h CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT a.cluster, CAST(sum(a.w) AS BIGINT) AS n,
       CAST(min(a.v) AS DOUBLE) / 100.0 AS min_value,
       CAST(max(a.v) AS DOUBLE) / 100.0 AS max_value,
       CAST(any_value(c.c) AS DOUBLE) / 1e8 AS centroid
FROM afinal a JOIN c{iters} c ON c.cluster = a.cluster
GROUP BY a.cluster ORDER BY a.cluster""".strip()


def _tdiv2(x: int) -> int:
    # truncate-toward-zero halving — DuckDB's `//` truncates, Python's floors
    return x // 2 if x >= 0 else -((-x) // 2)


def holt_forecast(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Holt linear exponential smoothing over each event type's hourly
    count series, with a 1–3 hour forecast — the capacity-planning view
    (trend-aware, unlike ``moving_fn``'s flat window). α = β = 0.5 so
    every update is a halving; state is 1e6 fixed-point INTEGER and each
    halving is truncate-toward-zero division — exactly DuckDB's ``//`` —
    so the recursion stays bit-identical through ~700 steps where dyadic
    floats would exhaust the mantissa (the pagerank re-quantize rule).
    Init s₁ = y₁, b₁ = y₂ − y₁ (types with one bucket are omitted);
    update s_t = (y_t + s + b)/2, b_t = (s_t − s + b)/2. The oracle is a
    recursive CTE advancing all types in lockstep. Returns
    ``(event_type, n_buckets, level, trend, f1, f2, f3)`` sorted by type,
    where f_h = level + h·trend.

    Scale shape: the same driver-folded (type, hour, count) partials as
    ``change_point``; the sequential recursion runs on the folded series
    (hours-bounded), never over raw events."""

    def partials(batch: pa.Table) -> pa.Table:
        hrs = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        t = pa.table({"t": batch[type_col], "hr": pa.array(hrs, pa.int64())})
        g = t.group_by(["t", "hr"]).aggregate([("hr", "count")])
        return pa.table(
            {"t": g["t"], "hr": g["hr"], "c": g["hr_count"].cast(pa.int64())}
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = [type_col, "n_buckets", "level", "trend", "f1", "f2", "f3"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["t", "hr"], sort=True, as_index=False)["c"]
        .sum()
    )
    rows = []
    for t, g in folded.groupby("t", sort=True):
        c = g["c"].to_numpy(np.int64)
        n = int(c.size)
        if n < 2:
            continue
        s = int(c[0]) * 1_000_000
        b = (int(c[1]) - int(c[0])) * 1_000_000
        for i in range(1, n):
            s_new = _tdiv2(int(c[i]) * 1_000_000 + s + b)
            b = _tdiv2(s_new - s + b)
            s = s_new
        rows.append(
            (t, n, s / 1e6, b / 1e6, (s + b) / 1e6, (s + 2 * b) / 1e6, (s + 3 * b) / 1e6)
        )
    if not rows:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(rows, columns=cols)
    out["n_buckets"] = out["n_buckets"].astype(np.int64)
    return out


def holt_forecast_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    step = "(CAST(o2.c AS HUGEINT) * 1000000 + r.s + r.b) // 2"
    return f"""
WITH RECURSIVE hb AS (
  SELECT {type_col} AS t, epoch_us({ts_col}) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
o AS (
  SELECT t, c, row_number() OVER (PARTITION BY t ORDER BY hr) AS pos,
         count(*) OVER (PARTITION BY t) AS n
  FROM hb
),
ok AS (SELECT * FROM o WHERE n >= 2),
rec AS (
  SELECT y2.t, CAST(2 AS BIGINT) AS pos, y2.n,
         CAST(y2.c AS HUGEINT) * 1000000 AS s,
         CAST(y2.c - y1.c AS HUGEINT) * 1000000 AS b
  FROM ok y1 JOIN ok y2 ON y1.t = y2.t AND y1.pos = 1 AND y2.pos = 2
  UNION ALL
  SELECT r.t, r.pos + 1, r.n,
         {step} AS s,
         (({step}) - r.s + r.b) // 2 AS b
  FROM rec r JOIN ok o2 ON o2.t = r.t AND o2.pos = r.pos + 1
)
SELECT t AS {type_col}, CAST(n AS BIGINT) AS n_buckets,
       CAST(s AS DOUBLE) / 1e6 AS level,
       CAST(b AS DOUBLE) / 1e6 AS trend,
       CAST(s + b AS DOUBLE) / 1e6 AS f1,
       CAST(s + 2 * b AS DOUBLE) / 1e6 AS f2,
       CAST(s + 3 * b AS DOUBLE) / 1e6 AS f3
FROM rec WHERE pos = n ORDER BY t
""".strip()


def frequent_itemsets(
    ds,
    *,
    user_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
) -> pd.DataFrame:
    """Frequent item-set mining, pair order (the exact regime of the ES
    ``frequent_item_sets`` aggregation): for every unordered pair of event
    types, the number of users whose history contains BOTH — market-basket
    support, the input to association rules. One ``groupby(user)`` exchange
    co-locates each user's history (the partitioning assumption: a user's
    rows fit one group); per-user pair emission is distinct-type bounded,
    and the pair counts fold as vocabulary-sized partials (types² cells) —
    never a second shuffle. Supports are exact integers. Returns
    ``(type_a, type_b, support)`` with type_a < type_b, support ≥
    ``min_support``, ordered by support DESC then pair."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        items = sorted(set(g[item_col]))
        out = [(a, b) for i, a in enumerate(items) for b in items[i + 1 :]]
        return pd.DataFrame(out, columns=["type_a", "type_b"]) if out else pd.DataFrame(
            {"type_a": pd.Series([], dtype=object), "type_b": pd.Series([], dtype=object)}
        )

    def cnt(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["type_a", "type_b"]).aggregate([("type_a", "count")])
        return pa.table(
            {
                "type_a": g["type_a"],
                "type_b": g["type_b"],
                "n": g["type_a_count"].cast(pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.groupby(user_col)
        .map_groups(pairs, batch_format="pandas")
        .map_batches(cnt, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    cols = ["type_a", "type_b", "support"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["type_a", "type_b"], sort=False, as_index=False)["n"]
        .sum()
        .rename(columns={"n": "support"})
    )
    folded = folded[folded["support"] >= min_support]
    if folded.empty:
        return pd.DataFrame(columns=cols)
    folded["support"] = folded["support"].astype(np.int64)
    return (
        folded.sort_values(["support", "type_a", "type_b"], ascending=[False, True, True], kind="stable")
        .reset_index(drop=True)[cols]
    )


def frequent_itemsets_sql(
    table: str = "events",
    *,
    user_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
) -> str:
    return f"""
WITH ut AS (SELECT DISTINCT {user_col} AS u, {item_col} AS t FROM {table}),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS support
  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
)
SELECT type_a, type_b, support FROM pairs
WHERE support >= {min_support}
ORDER BY support DESC, type_a, type_b
""".strip()


# --------------------------------------------------------------------------
# trimmed mean + exact grouped count-distinct
# --------------------------------------------------------------------------

def trimmed_mean(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    trim: float = 0.1,
) -> pd.DataFrame:
    """Per-group trimmed mean: drop the lowest and highest
    ``floor(trim·n)`` rows (by (value, id) order — the unique tie-break
    keeps the trimmed SET deterministic) and average the integer-micros of
    the rest. Same grouped exchange as outliers_mad. Returns
    ``(group, n, n_trimmed, tmean)`` (rounded 6) sorted by group."""

    def tm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col], kind="stable")
        q = _quantize(g[value_col].to_numpy(np.float64))
        n = q.size
        k = int(np.floor(trim * n))
        kept = q[k : n - k] if n - 2 * k > 0 else q[0:0]
        total = int(kept.sum())
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n": np.array([n], np.int64),
                "n_trimmed": np.array([2 * k], np.int64),
                "tmean": [round(total / 1e6 / kept.size, 6) + 0.0 if kept.size else 0.0],
            }
        )

    out = ds.groupby(group_col).map_groups(tm, batch_format="pandas").to_pandas()
    cols = [group_col, "n", "n_trimmed", "tmean"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(group_col).reset_index(drop=True)[cols]


def trimmed_mean_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    trim: float = 0.1,
) -> str:
    return f"""
WITH ranked AS (
  SELECT {group_col},
         CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT) AS micros,
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}, {id_col}) AS rn,
         count(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table}
),
kept AS (
  SELECT {group_col}, micros, n,
         CAST(floor({trim} * n) AS BIGINT) AS k
  FROM ranked WHERE rn > floor({trim} * n) AND rn <= n - floor({trim} * n)
)
SELECT {group_col}, CAST(any_value(n) AS BIGINT) AS n,
       CAST(2 * any_value(k) AS BIGINT) AS n_trimmed,
       round(sum(micros) / 1e6 / count(*), 6) + 0.0 AS tmean
FROM kept GROUP BY {group_col} ORDER BY {group_col}
""".strip()


def distinct_users_by_type(
    ds,
    *,
    group_col: str = "event_type",
    key: str = "user_id",
) -> pd.DataFrame:
    """Exact COUNT(DISTINCT key) per group — two-level distinct
    aggregation: batches emit their local distinct (group, key) pairs
    (the combiner bounds shuffle volume at true-distinct cardinality),
    one groupby over the pair stream dedupes globally, a per-group count
    finishes. The exact sibling of `approx_distinct_by_user`'s HLL.
    Returns ``(group, n_users)`` sorted by group."""
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        k = t[key].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        gu, gi = np.unique(g, return_inverse=True)
        code = gi.astype(np.int64) * np.int64(1) << np.int64(40)
        code = code | k  # keys are < 2^40 by contract (doc'd); unique pairs
        cu = np.unique(code)
        return pa.table(
            {
                group_col: pa.array(gu[(cu >> np.int64(40)).astype(np.int64)], pa.string()),
                key: pa.array(cu & ((np.int64(1) << np.int64(40)) - 1), pa.int64()),
            }
        )

    out = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, key])
        .aggregate(Count(alias_name="_dup"))
        .groupby(group_col)
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    cols = [group_col, "n_users"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)[cols]


def distinct_users_by_type_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    key: str = "user_id",
) -> str:
    return f"""
SELECT {group_col}, CAST(count(DISTINCT {key}) AS BIGINT) AS n_users
FROM {table} GROUP BY {group_col} ORDER BY {group_col}
""".strip()


# --------------------------------------------------------------------------
# cohort retention + chi-square independence
# --------------------------------------------------------------------------

_EPOCH_DAY0 = "2024-01-01"


def cohort_retention(
    ds,
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    cohort_type: str = "signup",
) -> pd.DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    ``cohort_type`` event; for each (cohort_week, active_week ≥ cohort_week)
    count how many of that cohort had any event that week. One grouped
    exchange per user (min signup ts + distinct active weeks both reduce
    inside map_groups to ≤ weeks rows per user), then a tiny pair count.
    Weeks are days-since-epoch // 7 (epoch {epoch}). Returns
    ``(cohort_week, active_week, n_users)`` sorted by the pair; users with
    no cohort event are excluded.""".format(epoch=_EPOCH_DAY0)
    from ray.data.aggregate import Count

    base_us = int(pd.Timestamp(_EPOCH_DAY0).value // 1_000)

    def weeks(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        wk = (ts_us - base_us) // (7 * 86_400_000_000)
        et = g[type_col].to_numpy()
        is_c = et == cohort_type
        if not is_c.any():
            return pd.DataFrame({"cohort_week": pd.Series([], dtype=np.int64), "active_week": pd.Series([], dtype=np.int64)})
        cw = int(wk[is_c].min())
        aw = np.unique(wk[wk >= cw])
        return pd.DataFrame(
            {"cohort_week": np.full(aw.size, cw, np.int64), "active_week": aw}
        )

    out = (
        ds.groupby(key)
        .map_groups(weeks, batch_format="pandas")
        .groupby(["cohort_week", "active_week"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    cols = ["cohort_week", "active_week", "n_users"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort_week", "active_week"]).reset_index(drop=True)[cols]


def cohort_retention_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    cohort_type: str = "signup",
) -> str:
    wk = f"date_diff('day', TIMESTAMP '{_EPOCH_DAY0}', {ts_col}) // 7"
    return f"""
WITH cohort AS (
  SELECT {key}, min({wk}) AS cohort_week
  FROM {table} WHERE {type_col} = '{cohort_type}' GROUP BY {key}
),
active AS (
  SELECT DISTINCT e.{key}, c.cohort_week, {wk.replace(ts_col, 'e.' + ts_col)} AS active_week
  FROM {table} e JOIN cohort c USING ({key})
  WHERE {wk.replace(ts_col, 'e.' + ts_col)} >= c.cohort_week
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(active_week AS BIGINT) AS active_week,
       CAST(count(*) AS BIGINT) AS n_users
FROM active GROUP BY cohort_week, active_week
ORDER BY cohort_week, active_week
""".strip()


def chi_square_hour_type(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> pd.DataFrame:
    """Chi-square independence statistic for the hour-of-day × event-type
    contingency table (pivot_hourly grid): χ² = Σ (O·N − R·C)² / (N·R·C),
    each cell's contribution computed from exact integer marginals and
    nano-quantized before the sum (the fixed-point rule), so the statistic
    is bit-identical to the oracle. Returns one row
    ``(n, dof, chi2)``."""
    grid = pivot_hourly(ds, type_col=type_col, ts_col=ts_col, types=types)
    obs = grid[[f"n_{t}" for t in types]].to_numpy(np.int64)
    row_tot = obs.sum(axis=1)
    col_tot = obs.sum(axis=0)
    n = int(obs.sum())
    total = 0
    for r in range(obs.shape[0]):
        for c in range(obs.shape[1]):
            rr, cc = int(row_tot[r]), int(col_tot[c])
            if rr == 0 or cc == 0:
                continue
            num = (int(obs[r, c]) * n - rr * cc) ** 2
            den = n * rr * cc
            total += int(np.floor(float(num) / float(den) * 1e9 + 0.5))
    # dof over the OBSERVED table (rows/cols with data), matching the oracle
    dof = (int((row_tot > 0).sum()) - 1) * (int((col_tot > 0).sum()) - 1)
    return pd.DataFrame(
        {
            "n": np.array([n], np.int64),
            "dof": np.array([dof], np.int64),
            "chi2": [round(total / 1e9, 6) + 0.0],
        }
    )


def chi_square_hour_type_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> str:
    tlist = ", ".join(f"'{t}'" for t in types)
    return f"""
WITH cells AS (
  SELECT CAST(extract(hour FROM {ts_col}) AS BIGINT) AS hour, {type_col} AS ty,
         CAST(count(*) AS BIGINT) AS o
  FROM {table} WHERE {type_col} IN ({tlist})
  GROUP BY 1, 2
),
rows_t AS (SELECT hour, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY hour),
cols_t AS (SELECT ty, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY ty),
n_t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
-- the full grid including zero cells: cross join marginals
grid AS (
  SELECT r.hour, c.ty, r.r, c.c, coalesce(cl.o, 0) AS o, n.n
  FROM rows_t r CROSS JOIN cols_t c CROSS JOIN n_t n
  LEFT JOIN cells cl ON cl.hour = r.hour AND cl.ty = c.ty
),
contrib AS (
  SELECT CAST(floor(
           CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE)
           / CAST(n * r * c AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS nano,
         n
  FROM grid WHERE r > 0 AND c > 0
)
SELECT any_value(n) AS n,
       CAST((SELECT count(*) FROM rows_t) - 1 AS BIGINT)
       * CAST((SELECT count(*) FROM cols_t) - 1 AS BIGINT) AS dof,
       round(sum(nano) / 1e9, 6) + 0.0 AS chi2
FROM contrib
""".strip()


# --------------------------------------------------------------------------
# weighted median + journey trigrams
# --------------------------------------------------------------------------

def weighted_median(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    weight_col: str = "value",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Per-group weighted median: the smallest value (in (value, id) order)
    whose running weight reaches half the group's total weight. Weights are
    quantized to integer micros so the ≥ W/2 comparison is exact integer
    arithmetic on both sides (2·cum ≥ W avoids the half division). Returns
    ``(group, total_weight_micros, wmedian)`` sorted by group."""

    def wm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col], kind="stable")
        w = _quantize(g[weight_col].to_numpy(np.float64))
        total = int(w.sum())
        cum = np.cumsum(w)
        idx = int(np.searchsorted(2 * cum, total))  # first 2·cum ≥ total
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "total_weight_micros": np.array([total], np.int64),
                "wmedian": [float(g[value_col].iloc[idx])],
            }
        )

    out = ds.groupby(group_col).map_groups(wm, batch_format="pandas").to_pandas()
    cols = [group_col, "total_weight_micros", "wmedian"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(group_col).reset_index(drop=True)[cols]


def weighted_median_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    weight_col: str = "value",
    id_col: str = "event_id",
) -> str:
    q = f"CAST(floor({weight_col} * 1e6 + 0.5) AS BIGINT)"
    return f"""
WITH ranked AS (
  SELECT {group_col}, {value_col},
         sum({q}) OVER (PARTITION BY {group_col}
                        ORDER BY {value_col}, {id_col}) AS cum,
         sum({q}) OVER (PARTITION BY {group_col}) AS total
  FROM {table}
),
hit AS (
  SELECT {group_col}, total, {value_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY cum) AS rn
  FROM ranked WHERE 2 * cum >= total
)
SELECT {group_col}, CAST(total AS BIGINT) AS total_weight_micros,
       {value_col} AS wmedian
FROM hit WHERE rn = 1 ORDER BY {group_col}
""".strip()


def journey_trigrams(
    ds,
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
    k: int = 20,
) -> pd.DataFrame:
    """Top-``k`` three-step user journeys: counts of consecutive
    (a → b → c) event-type triples per key in time order — the n=3
    extension of ``event_transitions``. Returns ``(t1, t2, t3, n)``
    ranked by (n desc, triple)."""

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        et = g[type_col].to_numpy()
        if et.size < 3:
            return pd.DataFrame({"t1": [], "t2": [], "t3": [], "n": []}).astype(
                {"t1": str, "t2": str, "t3": str, "n": np.int64}
            )
        df = pd.DataFrame({"t1": et[:-2], "t2": et[1:-1], "t3": et[2:]})
        out = df.groupby(["t1", "t2", "t3"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.groupby(key).map_groups(triples, batch_format="pandas").to_pandas()
    cols = ["t1", "t2", "t3", "n"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    folded = parts.groupby(["t1", "t2", "t3"], as_index=False)["n"].sum()
    folded = folded.sort_values(["n", "t1", "t2", "t3"], ascending=[False, True, True, True], kind="stable")
    return folded.head(k).reset_index(drop=True)[cols]


def journey_trigrams_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
    k: int = 20,
) -> str:
    ob = ", ".join(order_by)
    return f"""
WITH lagged AS (
  SELECT lag({type_col}, 2) OVER (PARTITION BY {key} ORDER BY {ob}) AS t1,
         lag({type_col}, 1) OVER (PARTITION BY {key} ORDER BY {ob}) AS t2,
         {type_col} AS t3
  FROM {table}
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM lagged WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY t1, t2, t3 ORDER BY n DESC, t1, t2, t3 LIMIT {k}
""".strip()


def percent_rank(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    collect: bool = True,
):
    """SQL ``percent_rank()`` per group over (value, id) order:
    (rank − 1) / (n − 1), 0.0 for single-row groups. Rank and n are exact
    integers; the one float division uses the same expression on both
    sides (round 6). Returns ``(id, group, value, prank)`` sorted by id;
    ``collect=False`` returns the streaming Dataset."""

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col], kind="stable")
        n = len(g)
        rank = np.arange(1, n + 1, dtype=np.int64)
        prank = np.round((rank - 1) / max(n - 1, 1), 6) + 0.0
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                group_col: g[group_col].to_numpy(),
                value_col: g[value_col].to_numpy(),
                "prank": prank,
            }
        )

    res = ds.groupby(group_col).map_groups(pr, batch_format="pandas")
    if not collect:
        return res
    out = res.to_pandas()
    cols = [id_col, group_col, value_col, "prank"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(id_col).reset_index(drop=True)[cols]


def percent_rank_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    return f"""
SELECT {id_col}, {group_col}, {value_col},
       round(percent_rank() OVER (PARTITION BY {group_col}
                                  ORDER BY {value_col}, {id_col}), 6) + 0.0 AS prank
FROM {table} ORDER BY {id_col}
""".strip()


# --------------------------------------------------------------------------
# key-skew diagnostics
# --------------------------------------------------------------------------

def key_skew(
    ds,
    *,
    key: str = "user_id",
) -> pd.DataFrame:
    """Shuffle-planning diagnostics for a prospective partition key: how
    skewed is the key's row distribution? Reports the exact key count, the
    heaviest key's share, and the Gini coefficient of per-key row counts
    (0 = perfectly even, →1 = one key owns everything) — the numbers that
    decide whether a groupby on this key needs salting (index/stats.py's
    hot-term salting is the consumer of exactly this signal).

    Per-key counts come from one hash-partitioned groupby (the same
    exchange any groupby on this key would pay); the count VECTOR is
    key-bounded and reduced on the driver with exact integer sums:
    Gini = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending counts.
    Shares/gini are fixed-point floor(x·1e6+0.5)/1e6. Returns one row
    ``(n_keys, n_rows, max_count, max_share, gini)``."""
    from ray.data.aggregate import Count

    counts = ds.groupby(key).aggregate(Count(alias_name="n")).to_pandas()
    cols = ["n_keys", "n_rows", "max_count", "max_share", "gini"]
    if counts.empty:
        return pd.DataFrame(columns=cols)
    x = np.sort(counts["n"].to_numpy(np.int64))
    n = int(x.size)
    total = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    num = 2 * int(np.dot(i, x)) - (n + 1) * total
    gini = float(np.floor(num * 1e6 / (n * total) + 0.5) / 1e6) if total else 0.0
    mx = int(x[-1])
    share = float(np.floor(mx * 1e6 / total + 0.5) / 1e6) if total else 0.0
    return pd.DataFrame(
        {
            "n_keys": np.array([n], np.int64),
            "n_rows": np.array([total], np.int64),
            "max_count": np.array([mx], np.int64),
            "max_share": [share],
            "gini": [gini],
        }
    )


def key_skew_sql(table: str = "events", *, key: str = "user_id") -> str:
    return f"""
WITH counts AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {table} GROUP BY {key}),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n, n) AS i FROM counts
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS max_count,
         CAST(sum(i * n) AS BIGINT) AS si
  FROM ranked
)
SELECT n_keys, n_rows, max_count,
       floor(max_count * 1e6 / n_rows + 0.5) / 1e6 AS max_share,
       floor((2 * si - (n_keys + 1) * n_rows) * 1e6 / (n_keys * n_rows) + 0.5) / 1e6 AS gini
FROM s
""".strip()


# --------------------------------------------------------------------------
# distribution entropy + Wilson rate intervals
# --------------------------------------------------------------------------

def type_entropy(
    ds,
    *,
    group_col: str = "event_type",
) -> pd.DataFrame:
    """Shannon entropy (nats) of the ``group_col`` label distribution plus
    the normalized variant H/ln(k) — the class-balance health check a
    curation pipeline runs on its strata (ops/sampling.py's stratified
    rates are chosen from exactly this view). Counts are one tiny grouped
    aggregate; each −p·ln p term is nano-quantized before the sum
    (fixed-point rule). Returns one row ``(n, k, entropy, normalized)``."""
    from ray.data.aggregate import Count

    counts = ds.groupby(group_col).aggregate(Count(alias_name="n")).to_pandas()
    cols = ["n", "k", "entropy", "normalized"]
    if counts.empty:
        return pd.DataFrame(columns=cols)
    x = counts["n"].to_numpy(np.int64)
    total = int(x.sum())
    k = int(x.size)
    nano = 0
    for c in x:
        c = int(c)
        if c == 0:
            continue
        term = -(c / total) * float(np.log(c / total))
        nano += int(np.floor(term * 1e9 + 0.5))
    h = round(nano / 1e9, 6) + 0.0
    norm = (
        float(np.floor(nano / 1e9 / float(np.log(k)) * 1e6 + 0.5) / 1e6)
        if k > 1
        else 0.0
    )
    return pd.DataFrame(
        {
            "n": np.array([total], np.int64),
            "k": np.array([k], np.int64),
            "entropy": [h],
            "normalized": [norm],
        }
    )


def type_entropy_sql(table: str = "events", *, group_col: str = "event_type") -> str:
    return f"""
WITH counts AS (SELECT CAST(count(*) AS BIGINT) AS c FROM {table} GROUP BY {group_col}),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k FROM counts),
terms AS (
  SELECT CAST(floor(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1e9 + 0.5) AS BIGINT) AS nano,
         n, k
  FROM counts CROSS JOIN tot WHERE c > 0
)
SELECT any_value(n) AS n, any_value(k) AS k,
       round(sum(nano) / 1e9, 6) + 0.0 AS entropy,
       CASE WHEN any_value(k) > 1
            THEN floor(sum(nano) / 1e9 / ln(any_value(k)) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS normalized
FROM terms
""".strip()


def rate_wilson_ci(
    ds,
    *,
    group_col: str = "event_type",
    z: float = 1.96,
) -> pd.DataFrame:
    """Per-type rate among all events with a Wilson score interval —
    the uncertainty-aware version of events_facets' shares (what a
    monitoring pipeline alerts on). All inputs are exact integers; the
    Wilson formula is evaluated with one shared expression order and the
    bounds fixed-point-quantized at 1e6. Returns
    ``(group, n_type, n_total, rate, lo, hi)`` sorted by group."""
    from ray.data.aggregate import Count

    counts = ds.groupby(group_col).aggregate(Count(alias_name="n")).to_pandas()
    cols = [group_col, "n_type", "n_total", "rate", "lo", "hi"]
    if counts.empty:
        return pd.DataFrame(columns=cols)
    counts = counts.sort_values(group_col).reset_index(drop=True)
    total = int(counts["n"].sum())
    rows = []
    z2 = z * z
    for g, kk in counts.itertuples(index=False):
        kk = int(kk)
        p = kk / total
        denom = 1.0 + z2 / total
        center = (p + z2 / (2.0 * total)) / denom
        half = (
            z
            * float(np.sqrt(p * (1.0 - p) / total + z2 / (4.0 * total * total)))
            / denom
        )
        rows.append(
            (
                g,
                kk,
                total,
                float(np.floor(p * 1e6 + 0.5) / 1e6),
                float(np.floor((center - half) * 1e6 + 0.5) / 1e6),
                float(np.floor((center + half) * 1e6 + 0.5) / 1e6),
            )
        )
    return pd.DataFrame(rows, columns=cols)


def rate_wilson_ci_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    z: float = 1.96,
) -> str:
    z2 = f"({z} * {z})"
    return f"""
WITH counts AS (SELECT {group_col}, CAST(count(*) AS BIGINT) AS k FROM {table} GROUP BY 1),
tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM counts),
calc AS (
  SELECT {group_col}, k, n,
         k * 1.0 / n AS p,
         1.0 + {z2} / n AS denom,
         (k * 1.0 / n + {z2} / (2.0 * n)) / (1.0 + {z2} / n) AS center,
         {z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n + {z2} / (4.0 * n * n))
             / (1.0 + {z2} / n) AS half
  FROM counts CROSS JOIN tot
)
SELECT {group_col}, k AS n_type, n AS n_total,
       floor(p * 1e6 + 0.5) / 1e6 AS rate,
       floor((center - half) * 1e6 + 0.5) / 1e6 AS lo,
       floor((center + half) * 1e6 + 0.5) / 1e6 AS hi
FROM calc ORDER BY {group_col}
""".strip()


def equidepth_histogram(
    ds,
    *,
    value_col: str = "value",
    nbuckets: int = 10,
) -> pd.DataFrame:
    """Equi-depth histogram: bucket boundaries are the exact
    q = i/nbuckets quantiles (linear interpolation ≡ quantile_cont), then
    one streaming bincount pass assigns each row to the first bucket whose
    upper boundary is ≥ the value (boundary comparisons on identical
    float64 on both sides). Demonstrates the two-pass
    exact-quantile-then-scan shape; counts are ±0 exact, not approximate.
    Returns ``(bucket, hi, n)`` with hi rounded to 6."""
    vals = ds.select_columns([value_col])
    # pass 1: exact quantiles need the column in one place — the documented
    # tradeoff of exact equi-depth (value_quantiles holds per group; here
    # corpus-wide). For >memory columns use a mergeable quantile sketch.
    v = vals.to_pandas()[value_col].to_numpy(np.float64)
    if v.size == 0:
        return pd.DataFrame(columns=["bucket", "hi", "n"])
    qs = np.quantile(v, [i / nbuckets for i in range(1, nbuckets + 1)], method="linear")

    def assign(t: pa.Table) -> pa.Table:
        x = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(qs, x, side="left")  # first hi >= x
        b = np.minimum(b, nbuckets - 1)
        return pa.table(
            {
                "bucket": pa.array(np.arange(nbuckets, dtype=np.int64), pa.int64()),
                "n": pa.array(np.bincount(b, minlength=nbuckets).astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    folded = pd.concat(parts, ignore_index=True).groupby("bucket", as_index=False)["n"].sum()
    folded["hi"] = np.round(qs[folded["bucket"].to_numpy(np.int64)], 6)
    folded["n"] = folded["n"].astype(np.int64)
    return folded[["bucket", "hi", "n"]]


def equidepth_histogram_sql(
    table: str = "events",
    *,
    value_col: str = "value",
    nbuckets: int = 10,
) -> str:
    qlist = ", ".join(f"quantile_cont({value_col}, {i}.0 / {nbuckets})" for i in range(1, nbuckets + 1))
    return f"""
WITH qs AS (SELECT [{qlist}] AS q FROM {table}),
edges AS (
  SELECT i - 1 AS bucket, q[i] AS hi
  FROM qs CROSS JOIN range(1, {nbuckets} + 1) t(i)
),
assigned AS (
  SELECT least(
           (SELECT CAST(count(*) AS BIGINT) FROM edges e2 WHERE e2.hi < v.{value_col}),
           {nbuckets} - 1) AS bucket
  FROM {table} v
)
SELECT e.bucket, round(e.hi, 6) AS hi, CAST(coalesce(a.n, 0) AS BIGINT) AS n
FROM edges e LEFT JOIN (SELECT bucket, count(*) AS n FROM assigned GROUP BY 1) a
  ON a.bucket = e.bucket
ORDER BY e.bucket
""".strip()


def geometric_mean(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
) -> pd.DataFrame:
    """Per-group geometric mean, exp(Σ ln x / n), for positive values —
    the right average for multiplicative quantities (latency ratios,
    growth). Each ln term is nano-quantized before the cross-row sum
    (fixed-point rule) so the engine's partial-fold order can't shift the
    result; rows with value ≤ 0 are excluded on both sides. One streaming
    pass of per-batch (group, n, Σln_nano) partials. Returns
    ``(group, n, gmean)`` (rounded 6) sorted by group."""

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        ok = v > 0
        g, v = g[ok], v[ok]
        nano = np.floor(np.log(v) * 1e9 + 0.5)
        gu, gi = np.unique(g, return_inverse=True)
        return pa.table(
            {
                group_col: pa.array(gu, pa.string()),
                "n": pa.array(np.bincount(gi, minlength=gu.size).astype(np.int64), pa.int64()),
                "s": pa.array(np.bincount(gi, weights=nano, minlength=gu.size).astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = [group_col, "n", "gmean"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(group_col, sort=True, as_index=False)[["n", "s"]]
        .sum()
    )
    folded = folded[folded["n"] > 0]
    out = pd.DataFrame(
        {
            group_col: folded[group_col].to_numpy(),
            "n": folded["n"].to_numpy(np.int64),
            "gmean": [
                round(float(np.exp(s / 1e9 / n)), 6) + 0.0
                for n, s in zip(folded["n"], folded["s"])
            ],
        }
    )
    return out.reset_index(drop=True)[cols]


def geometric_mean_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    return f"""
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
       round(exp(sum(CAST(floor(ln({value_col}) * 1e9 + 0.5) AS BIGINT)) / 1e9
                 / count(*)), 6) + 0.0 AS gmean
FROM {table} WHERE {value_col} > 0
GROUP BY {group_col} ORDER BY {group_col}
""".strip()


def winsorize(
    ds,
    *,
    value_col: str = "value",
    id_col: str = "event_id",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    collect: bool = True,
):
    """Winsorization: clip ``value_col`` to its exact [lo_q, hi_q]
    quantiles (the outlier treatment that keeps rows instead of dropping
    them, unlike outliers_mad). Two passes: exact corpus quantiles, then a
    stateless clip map — the clip bound comparison runs on identical
    float64 on both sides. Returns ``(id, value, clipped)`` (clipped
    rounded 6) sorted by id; ``collect=False`` streams."""
    v = ds.select_columns([value_col]).to_pandas()[value_col].to_numpy(np.float64)
    cols = [id_col, value_col, "clipped"]
    if v.size == 0:
        return pd.DataFrame(columns=cols)
    lo = float(np.quantile(v, lo_q, method="linear"))
    hi = float(np.quantile(v, hi_q, method="linear"))

    def clip(t: pa.Table) -> pa.Table:
        x = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.round(np.minimum(hi, np.maximum(lo, x)), 6) + 0.0
        return pa.table(
            {
                id_col: t[id_col],
                value_col: t[value_col],
                "clipped": pa.array(c, pa.float64()),
            }
        )

    res = ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)
    if not collect:
        return res
    out = res.to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)[cols]


def winsorize_sql(
    table: str = "events",
    *,
    value_col: str = "value",
    id_col: str = "event_id",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> str:
    return f"""
WITH b AS (
  SELECT quantile_cont({value_col}, {lo_q}) AS lo,
         quantile_cont({value_col}, {hi_q}) AS hi
  FROM {table}
)
SELECT {id_col}, {value_col},
       round(least(hi, greatest(lo, {value_col})), 6) + 0.0 AS clipped
FROM {table} CROSS JOIN b ORDER BY {id_col}
""".strip()


def longest_streak(
    ds,
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
) -> pd.DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive same-type
    events in time order. Ties broken by earliest run start. One grouped
    exchange; run lengths are found with a vectorized boundary diff.
    Returns ``(key, event_type, streak)`` sorted by key."""

    def streak(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        et = g[type_col].to_numpy()
        starts = np.ones(et.size, bool)
        starts[1:] = et[1:] != et[:-1]
        run_id = np.cumsum(starts) - 1
        lens = np.bincount(run_id)
        best = int(np.argmax(lens))  # first max = earliest run
        first_idx = int(np.flatnonzero(starts)[best])
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                type_col: [et[first_idx]],
                "streak": np.array([lens[best]], np.int64),
            }
        )

    out = ds.groupby(key).map_groups(streak, batch_format="pandas").to_pandas()
    cols = [key, type_col, "streak"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(key).reset_index(drop=True)[cols]


def longest_streak_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
) -> str:
    ob = ", ".join(order_by)
    return f"""
WITH numbered AS (
  SELECT {key}, {type_col}, {order_by[0]}, {order_by[1]},
         row_number() OVER (PARTITION BY {key} ORDER BY {ob}) AS rn,
         row_number() OVER (PARTITION BY {key}, {type_col} ORDER BY {ob}) AS rt
  FROM {table}
),
runs AS (
  SELECT {key}, {type_col}, CAST(count(*) AS BIGINT) AS streak,
         min(rn) AS start_rn
  FROM numbered GROUP BY {key}, {type_col}, rn - rt
),
best AS (
  SELECT {key}, {type_col}, streak,
         row_number() OVER (PARTITION BY {key}
                            ORDER BY streak DESC, start_rn) AS pick
  FROM runs
)
SELECT {key}, {type_col}, streak FROM best WHERE pick = 1 ORDER BY {key}
""".strip()


def mann_whitney_u(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    label_a: str = "purchase",
    label_b: str = "click",
) -> pd.DataFrame:
    """Mann–Whitney U between two groups' value distributions — the
    nonparametric two-sample test (is one group's value stochastically
    larger?). All rank arithmetic is exact integers: doubled average
    ranks (2·minrank + ties − 1) are whole numbers, so R·2 and U·2 are
    BIGINTs on both sides; the AUC effect size U/(n_a·n_b) is fixed-point
    /1e6. Needs the two groups' values in one ranking — a filtered
    column pull (two-label subset), the same bound as value_quantiles.
    Returns one row ``(n_a, n_b, u2_a, auc)``."""
    vals = (
        ds.filter(expr=f"{group_col} == '{label_a}' or {group_col} == '{label_b}'")
        .select_columns([group_col, value_col])
        .to_pandas()
    )
    cols = ["n_a", "n_b", "u2_a", "auc"]
    if vals.empty:
        return pd.DataFrame(columns=cols)
    v = vals[value_col].to_numpy(np.float64)
    is_a = (vals[group_col] == label_a).to_numpy()
    order = np.argsort(v, kind="stable")
    v_s, a_s = v[order], is_a[order]
    starts = np.ones(v_s.size, bool)
    starts[1:] = v_s[1:] != v_s[:-1]
    run_id = np.cumsum(starts) - 1
    run_len = np.bincount(run_id)
    run_min_rank = np.concatenate(([0], np.cumsum(run_len)[:-1])) + 1
    rank2 = 2 * run_min_rank[run_id] + run_len[run_id] - 1  # doubled avg rank
    n_a = int(a_s.sum())
    n_b = int(v_s.size - n_a)
    r2_a = int(rank2[a_s].sum())
    u2_a = r2_a - n_a * (n_a + 1)
    auc = (
        float(np.floor(u2_a * 1e6 / (2 * n_a * n_b) + 0.5) / 1e6)
        if n_a and n_b
        else 0.0
    )
    return pd.DataFrame(
        {
            "n_a": np.array([n_a], np.int64),
            "n_b": np.array([n_b], np.int64),
            "u2_a": np.array([u2_a], np.int64),
            "auc": [auc],
        }
    )


def mann_whitney_u_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    label_a: str = "purchase",
    label_b: str = "click",
) -> str:
    return f"""
WITH sub AS (
  SELECT {group_col} AS g, {value_col} AS v FROM {table}
  WHERE {group_col} IN ('{label_a}', '{label_b}')
),
ranked AS (
  SELECT g,
         2 * rank() OVER (ORDER BY v) + count(*) OVER (PARTITION BY v) - 1 AS rank2
  FROM sub
),
agg AS (
  SELECT CAST(count(*) FILTER (g = '{label_a}') AS BIGINT) AS n_a,
         CAST(count(*) FILTER (g = '{label_b}') AS BIGINT) AS n_b,
         CAST(sum(rank2) FILTER (g = '{label_a}') AS BIGINT) AS r2_a
  FROM ranked
)
SELECT n_a, n_b,
       r2_a - n_a * (n_a + 1) AS u2_a,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
            ELSE floor((r2_a - n_a * (n_a + 1)) * 1e6 / (2 * n_a * n_b) + 0.5) / 1e6
       END AS auc
FROM agg
""".strip()


def spearman_by_group(
    ds,
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Per-group Spearman rank correlation between time order and value —
    the monotone-trend test (robust sibling of regression_by_group's OLS
    slope). Ranks use doubled average-rank integers (ties exact); the
    Pearson formula then runs on exact integer sums with float entering
    once. Same grouped exchange as value_quantiles. Returns
    ``(group, n, rho)`` (rounded 6) sorted by group; rho is NULL for
    groups where either ranking is constant."""

    def _rank2(x: np.ndarray, tiebreak: np.ndarray | None = None) -> np.ndarray:
        # doubled average ranks; ties on x only (tiebreak orders storage)
        order = np.argsort(x, kind="stable") if tiebreak is None else np.lexsort((tiebreak, x))
        xs = x[order]
        starts = np.ones(xs.size, bool)
        starts[1:] = xs[1:] != xs[:-1]
        run_id = np.cumsum(starts) - 1
        run_len = np.bincount(run_id)
        run_min = np.concatenate(([0], np.cumsum(run_len)[:-1])) + 1
        r2_sorted = 2 * run_min[run_id] + run_len[run_id] - 1
        out = np.empty(xs.size, np.int64)
        out[order] = r2_sorted
        return out

    def rho(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        v = g[value_col].to_numpy(np.float64)
        ids = g[id_col].to_numpy(np.int64)
        rx = _rank2(ts_us, ids)
        ry = _rank2(v, ids)
        n = int(rx.size)
        sx, sy = int(rx.sum()), int(ry.sum())
        sxy = int(np.dot(rx.astype(np.float64), ry.astype(np.float64)))
        sxx = int(np.dot(rx.astype(np.float64), rx.astype(np.float64)))
        syy = int(np.dot(ry.astype(np.float64), ry.astype(np.float64)))
        num = n * sxy - sx * sy
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        if da == 0 or db == 0:
            r = None
        else:
            r = round(float(num) / (float(np.sqrt(float(da))) * float(np.sqrt(float(db)))), 6) + 0.0
        return pd.DataFrame({group_col: [g[group_col].iloc[0]], "n": np.array([n], np.int64), "rho": [r]})

    out = ds.groupby(group_col).map_groups(rho, batch_format="pandas").to_pandas()
    cols = [group_col, "n", "rho"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(group_col).reset_index(drop=True)[cols]


def spearman_by_group_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    return f"""
WITH ranked AS (
  SELECT {group_col},
         CAST(2 * rank() OVER (PARTITION BY {group_col} ORDER BY {ts_col})
              + count(*) OVER (PARTITION BY {group_col}, {ts_col}) - 1 AS HUGEINT) AS rx,
         CAST(2 * rank() OVER (PARTITION BY {group_col} ORDER BY {value_col})
              + count(*) OVER (PARTITION BY {group_col}, {value_col}) - 1 AS HUGEINT) AS ry
  FROM {table}
),
agg AS (
  SELECT {group_col},
         CAST(count(*) AS HUGEINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
  FROM ranked GROUP BY {group_col}
)
SELECT {group_col}, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) + 0.0
       END AS rho
FROM agg ORDER BY {group_col}
""".strip()


def autocorr_lag1(
    ds,
    *,
    group_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
) -> pd.DataFrame:
    """Per-group lag-1 autocorrelation of values in event order: Pearson r
    between consecutive (yₜ, yₜ₊₁) pairs — the is-this-series-random probe
    (a near-zero value justifies treating values as i.i.d. for sampling).
    Values are quantized to integer centi-units; all sums are exact ints,
    float enters once. Same grouped exchange as running_total. Returns
    ``(group, n_pairs, r)`` (rounded 6) sorted by group; NULL when either
    side is constant."""

    def ac(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), kind="stable")
        y = _quantize_centi(g[value_col].to_numpy(np.float64))
        a, b = y[:-1], y[1:]
        n = int(a.size)
        if n == 0:
            return pd.DataFrame({group_col: [g[group_col].iloc[0]], "n_pairs": np.array([0], np.int64), "r": [None]})
        sx, sy = int(a.sum()), int(b.sum())
        sxy = int(np.dot(a, b))
        sxx, syy = int(np.dot(a, a)), int(np.dot(b, b))
        num = n * sxy - sx * sy
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        r = (
            round(float(num) / (float(np.sqrt(float(da))) * float(np.sqrt(float(db)))), 6) + 0.0
            if da and db
            else None
        )
        return pd.DataFrame({group_col: [g[group_col].iloc[0]], "n_pairs": np.array([n], np.int64), "r": [r]})

    out = ds.groupby(group_col).map_groups(ac, batch_format="pandas").to_pandas()
    cols = [group_col, "n_pairs", "r"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(group_col).reset_index(drop=True)[cols]


def autocorr_lag1_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    order_by: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
) -> str:
    ob = ", ".join(order_by)
    q = f"CAST(floor({value_col} * 100.0 + 0.5) AS HUGEINT)"
    return f"""
WITH lagged AS (
  SELECT {group_col},
         lag({q}) OVER (PARTITION BY {group_col} ORDER BY {ob}) AS a,
         {q} AS b
  FROM {table}
),
pairs AS (SELECT {group_col}, a, b FROM lagged WHERE a IS NOT NULL),
agg AS (
  SELECT {group_col}, CAST(count(*) AS HUGEINT) AS n,
         sum(a) AS sx, sum(b) AS sy,
         sum(a * b) AS sxy, sum(a * a) AS sxx, sum(b * b) AS syy
  FROM pairs GROUP BY {group_col}
)
SELECT g.{group_col}, CAST(coalesce(a.n, 0) AS BIGINT) AS n_pairs,
       CASE WHEN a.n IS NULL OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) + 0.0
       END AS r
FROM (SELECT DISTINCT {group_col} FROM {table}) g
LEFT JOIN agg a USING ({group_col})
ORDER BY g.{group_col}
""".strip()


def change_point(
    ds,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Change-point detection per event type (the engine-side analog of the
    OpenSearch/ES ``change_point`` pipeline aggregation the reference's
    dashboards lean on): over the ordered hourly count series c₁..cₙ, the
    bucket where the cumulative series deviates most from a uniform rate —
    argmax over interior positions i < n of the CUSUM/Kolmogorov deviation
    ``|n·Sᵢ − i·Sₙ|``. Deviation and its normalizer n·Sₙ stay exact Python
    ints (HUGEINT in SQL); the reported statistic is the half-up fixed
    ratio dev/(n·Sₙ) at 1e6 — never a float ranking key. Max ties break to
    the earliest bucket; types with a single bucket have no interior point
    and are omitted on both sides (``pos < n``).

    Scale shape: per-batch (type, hour, count) partials folded on the
    driver — bounded by types × hours, so raw events never cross a Ray
    groupby (CLAUDE.md tiny-pre-pass rule). Timestamps are cast to
    timestamp[us] before the int64 view (ns-vs-us trap). Returns
    ``(event_type, n_buckets, total, cp_pos, cp_hour, stat)`` sorted by
    type; cp_hour is the epoch-hour integer of the last bucket BEFORE the
    level shift."""

    def partials(batch: pa.Table) -> pa.Table:
        hrs = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        t = pa.table({"t": batch[type_col], "hr": pa.array(hrs, pa.int64())})
        g = t.group_by(["t", "hr"]).aggregate([("hr", "count")])
        return pa.table(
            {"t": g["t"], "hr": g["hr"], "c": g["hr_count"].cast(pa.int64())}
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = [type_col, "n_buckets", "total", "cp_pos", "cp_hour", "stat"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["t", "hr"], sort=True, as_index=False)["c"]
        .sum()
    )
    rows = []
    for t, g in folded.groupby("t", sort=True):
        hr = g["hr"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = int(c.size)
        if n < 2:
            continue
        S = np.cumsum(c)
        tot = int(S[-1])
        dev = [abs(n * int(S[i]) - (i + 1) * tot) for i in range(n - 1)]
        best = min(range(n - 1), key=lambda i: (-dev[i], i))
        den = n * tot
        stat = ((2 * dev[best] * 1_000_000 + den) // (2 * den)) / 1e6
        rows.append((t, n, tot, best + 1, int(hr[best]), stat))
    if not rows:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(rows, columns=cols)
    out["n_buckets"] = out["n_buckets"].astype(np.int64)
    out["total"] = out["total"].astype(np.int64)
    out["cp_pos"] = out["cp_pos"].astype(np.int64)
    out["cp_hour"] = out["cp_hour"].astype(np.int64)
    return out


def change_point_sql(
    table: str = "events",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    return f"""
WITH b AS (
  SELECT {type_col}, epoch_us({ts_col}) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
o AS (
  SELECT {type_col}, hr,
         row_number() OVER (PARTITION BY {type_col} ORDER BY hr) AS pos,
         sum(c) OVER (PARTITION BY {type_col} ORDER BY hr) AS s,
         sum(c) OVER (PARTITION BY {type_col}) AS tot,
         count(*) OVER (PARTITION BY {type_col}) AS n
  FROM b
),
d AS (
  SELECT {type_col}, hr, pos, n, tot,
         abs(CAST(n AS HUGEINT) * s - CAST(pos AS HUGEINT) * tot) AS dev
  FROM o WHERE pos < n
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY {type_col} ORDER BY dev DESC, pos) AS rk
  FROM d QUALIFY rk = 1
)
SELECT {type_col}, CAST(n AS BIGINT) AS n_buckets, CAST(tot AS BIGINT) AS total,
       CAST(pos AS BIGINT) AS cp_pos, CAST(hr AS BIGINT) AS cp_hour,
       CAST((2 * dev * 1000000 + CAST(n AS HUGEINT) * tot)
            // (2 * CAST(n AS HUGEINT) * tot) AS DOUBLE) / 1e6 AS stat
FROM best ORDER BY {type_col}
""".strip()


def rfm_scores(
    ds,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> pd.DataFrame:
    """RFM scoring: per key, quintiles of Recency (latest event time,
    later = better), Frequency (event count) and Monetary (integer-micros
    value total), combined into the classic 3-digit segment code. One
    grouped reduce to a key-bounded (key, last_ts, n, total) table, then
    three ntile assignments with (metric, key) tie-breaks so every tile is
    deterministic. Returns ``(key, r, f, m, rfm)`` sorted by key."""
    from ray.data.aggregate import Count, Max, Sum

    def pre(t: pa.Table) -> pa.Table:
        ts_us = t[ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                key: t[key],
                "ts_us": ts_us,
                "micros": pa.array(
                    _quantize(t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)),
                    pa.int64(),
                ),
            }
        )

    per_key = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .aggregate(
            Max("ts_us", alias_name="last_ts"),
            Count(alias_name="n"),
            Sum("micros", alias_name="total"),
        )
        .to_pandas()
    )
    cols = [key, "r", "f", "m", "rfm"]
    if per_key.empty:
        return pd.DataFrame(columns=cols)

    def tile(metric: np.ndarray, keys: np.ndarray) -> np.ndarray:
        order = np.lexsort((keys, metric))  # ascending; tile n = best
        sz = order.size
        base, rem = divmod(sz, n_tiles)
        sizes = np.full(n_tiles, base, np.int64)
        sizes[:rem] += 1
        t = np.repeat(np.arange(1, n_tiles + 1, dtype=np.int64), sizes)
        out = np.empty(sz, np.int64)
        out[order] = t
        return out

    ks = per_key[key].to_numpy(np.int64)
    r = tile(per_key["last_ts"].to_numpy(np.int64), ks)
    f = tile(per_key["n"].to_numpy(np.int64), ks)
    m = tile(per_key["total"].to_numpy(np.int64), ks)
    out = pd.DataFrame(
        {key: ks, "r": r, "f": f, "m": m, "rfm": r * 100 + f * 10 + m}
    )
    return out.sort_values(key).reset_index(drop=True)[cols]


def rfm_scores_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> str:
    return f"""
WITH per_key AS (
  SELECT {key},
         max({ts_col}) AS last_ts,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT)) AS total
  FROM {table} GROUP BY {key}
),
tiles AS (
  SELECT {key},
         CAST(ntile({n_tiles}) OVER (ORDER BY last_ts, {key}) AS BIGINT) AS r,
         CAST(ntile({n_tiles}) OVER (ORDER BY n, {key}) AS BIGINT) AS f,
         CAST(ntile({n_tiles}) OVER (ORDER BY total, {key}) AS BIGINT) AS m
  FROM per_key
)
SELECT {key}, r, f, m, r * 100 + f * 10 + m AS rfm
FROM tiles ORDER BY {key}
""".strip()


def abc_classification(
    ds,
    *,
    key: str = "user_id",
    value_col: str = "value",
    a_share: float = 0.8,
    b_share: float = 0.95,
) -> pd.DataFrame:
    """Pareto / ABC analysis: rank keys by total value (integer micros)
    descending and classify by cumulative share — A up to ``a_share`` of
    total value, B up to ``b_share``, C the tail. The cumulative-share
    comparison is exact integer cross-multiplication (cum·1e6 ≤ share·1e6
    ·total), no float boundaries. Returns per-class summary
    ``(class, n_keys, value_micros)`` (3 rows, classes always present)."""
    from ray.data.aggregate import Sum

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: t[key],
                "micros": pa.array(
                    _quantize(t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)),
                    pa.int64(),
                ),
            }
        )

    per_key = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .aggregate(Sum("micros", alias_name="total"))
        .to_pandas()
    )
    cols = ["class", "n_keys", "value_micros"]
    if per_key.empty:
        return pd.DataFrame(columns=cols)
    per_key = per_key.sort_values(["total", key], ascending=[False, True], kind="stable")
    tot = per_key["total"].to_numpy(np.int64)
    grand = int(tot.sum())
    cum = np.cumsum(tot)
    a_cut = int(round(a_share * 1e6))
    b_cut = int(round(b_share * 1e6))
    # integer cross-multiply: cum/grand <= cut/1e6  ⇔  cum*1e6 <= cut*grand
    # (Python ints — cum*1e6 overflows int64 at large totals; SQL: HUGEINT)
    a_lim, b_lim = a_cut * grand, b_cut * grand
    cls = np.array(
        ["A" if int(c) * 1_000_000 <= a_lim else ("B" if int(c) * 1_000_000 <= b_lim else "C") for c in cum],
        dtype=object,
    )
    out = (
        pd.DataFrame({"class": cls, "n": 1, "v": tot})
        .groupby("class", as_index=False)
        .agg(n_keys=("n", "sum"), value_micros=("v", "sum"))
    )
    base = pd.DataFrame({"class": ["A", "B", "C"]})
    out = base.merge(out, on="class", how="left").fillna(0)
    out["n_keys"] = out["n_keys"].astype(np.int64)
    out["value_micros"] = out["value_micros"].astype(np.int64)
    return out[cols]


def abc_classification_sql(
    table: str = "events",
    *,
    key: str = "user_id",
    value_col: str = "value",
    a_share: float = 0.8,
    b_share: float = 0.95,
) -> str:
    a_cut = int(round(a_share * 1e6))
    b_cut = int(round(b_share * 1e6))
    return f"""
WITH per_key AS (
  SELECT {key}, sum(CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT)) AS total
  FROM {table} GROUP BY {key}
),
ranked AS (
  SELECT total,
         sum(total) OVER (ORDER BY total DESC, {key}) AS cum,
         sum(total) OVER () AS grand
  FROM per_key
),
classed AS (
  SELECT CASE WHEN CAST(cum AS HUGEINT) * 1000000 <= CAST({a_cut} AS HUGEINT) * grand THEN 'A'
              WHEN CAST(cum AS HUGEINT) * 1000000 <= CAST({b_cut} AS HUGEINT) * grand THEN 'B'
              ELSE 'C' END AS class,
         total
  FROM ranked
),
base AS (SELECT unnest(['A', 'B', 'C']) AS class)
SELECT b.class,
       CAST(coalesce(count(c.total), 0) AS BIGINT) AS n_keys,
       CAST(coalesce(sum(c.total), 0) AS BIGINT) AS value_micros
FROM base b LEFT JOIN classed c ON c.class = b.class
GROUP BY b.class ORDER BY b.class
""".strip()


def extreme_events(
    ds,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Deterministic argmin/argmax per group: the event ids holding each
    group's max and min value, ties broken by smallest id (SQL arg_max's
    tie behavior is unspecified, so both sides use an explicit
    row_number rule). Returns ``(group, max_id, max_value, min_id,
    min_value)`` sorted by group."""

    def ext(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(np.float64)
        ids = g[id_col].to_numpy(np.int64)
        mx_order = np.lexsort((ids, -v))[0]
        mn_order = np.lexsort((ids, v))[0]
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "max_id": np.array([ids[mx_order]], np.int64),
                "max_value": [float(v[mx_order])],
                "min_id": np.array([ids[mn_order]], np.int64),
                "min_value": [float(v[mn_order])],
            }
        )

    out = ds.groupby(group_col).map_groups(ext, batch_format="pandas").to_pandas()
    cols = [group_col, "max_id", "max_value", "min_id", "min_value"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(group_col).reset_index(drop=True)[cols]


def extreme_events_sql(
    table: str = "events",
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    return f"""
WITH mx AS (
  SELECT {group_col}, {id_col} AS max_id, {value_col} AS max_value,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {value_col} DESC, {id_col}) AS rn
  FROM {table}
),
mn AS (
  SELECT {group_col}, {id_col} AS min_id, {value_col} AS min_value,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {value_col}, {id_col}) AS rn
  FROM {table}
)
SELECT mx.{group_col}, mx.max_id, mx.max_value, mn.min_id, mn.min_value
FROM mx JOIN mn ON mx.{group_col} = mn.{group_col} AND mx.rn = 1 AND mn.rn = 1
ORDER BY mx.{group_col}
""".strip()


def schema_profile(
    ds,
    *,
    columns: tuple[str, ...],
) -> pd.DataFrame:
    """Data-quality profile (the Deequ/Great-Expectations staple): per
    column, total rows, null count and exact distinct count. One streaming
    pass: each batch emits its null-count integers plus its local distinct
    VALUES per column (stringified — the distinct sets fold exactly, and
    their size is bounded by true column cardinality). Returns
    ``(column, n_total, n_null, n_distinct)`` in the given column order."""

    def partials(t: pa.Table) -> pa.Table:
        names, kinds, vals = [], [], []
        for col in columns:
            arr = t[col].combine_chunks()
            n_null = arr.null_count
            uniq = arr.drop_null().cast(pa.string()).unique().to_pylist()
            names += [col] * (2 + len(uniq))
            kinds += ["total", "null"] + ["v"] * len(uniq)
            vals += [str(len(t)), str(n_null)] + uniq
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "v": pa.array(vals, pa.string()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["column", "n_total", "n_null", "n_distinct"]
    if not parts:
        return pd.DataFrame(columns=cols)
    df = pd.concat(parts, ignore_index=True)
    rows = []
    for col in columns:
        sub = df[df["column"] == col]
        n_total = int(sub.loc[sub["kind"] == "total", "v"].astype(np.int64).sum())
        n_null = int(sub.loc[sub["kind"] == "null", "v"].astype(np.int64).sum())
        n_distinct = int(sub.loc[sub["kind"] == "v", "v"].nunique())
        rows.append((col, n_total, n_null, n_distinct))
    return pd.DataFrame(rows, columns=cols)


def schema_profile_sql(table: str = "events", *, columns: tuple[str, ...]) -> str:
    selects = []
    for col in columns:
        selects.append(
            f'''SELECT '{col}' AS "column",
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER ({col} IS NULL) AS BIGINT) AS n_null,
       CAST(count(DISTINCT CAST({col} AS VARCHAR)) AS BIGINT) AS n_distinct
FROM {table}'''
        )
    order = ", ".join(f"'{c}'" for c in columns)
    return (
        "SELECT * FROM (" + " UNION ALL ".join(selects)
        + f') ORDER BY list_position([{order}], "column")'
    )


def hot_keys(
    ds,
    *,
    key_col: str = "user_id",
    top_n: int = 10,
) -> pd.DataFrame:
    """Shuffle-skew diagnostic: the pre-flight check every 100 TB
    ``groupby`` deserves — per-key row counts, the ``top_n`` heaviest keys
    with their corpus share, and a suggested SALT factor per hot key
    (ceil(n·P/total) for P=64 target partitions: how many ways that key's
    rows must split so no partition exceeds the mean load). All integer
    arithmetic: share is the half-up 1e6 fixed-point division, salt is
    exact ceil division, so the oracle matches bit-for-bit.

    Fully distributed fold (key cardinality for user-id-like columns IS
    corpus-scale): per-batch (key, n) partials (pyarrow group_by combiner)
    → distributed ``groupby(key).sum`` → per-block local top-n + block
    total. The driver folds ≤ top_n rows per shuffle block plus one total
    per block — bounded, never key-cardinality. Returns
    ``(rank, key, n, share, salt)`` by rank."""
    P = 64
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        g = t.select([key_col]).group_by(key_col).aggregate([([], "count_all")])
        return pa.table({
            "key": g[key_col].combine_chunks().cast(pa.string()),
            "n": g["count_all"].combine_chunks().cast(pa.int64()),
        })

    def local_top(t: pa.Table) -> pa.Table:
        # after the per-key groupby every key lives in exactly one block,
        # so block-local top-n + block totals fold exactly on the driver
        k = t["key"].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        n = np.asarray(t["n"].combine_chunks().cast(pa.int64()))
        order = np.lexsort((k, -n))[:top_n]
        tot = np.zeros(order.size, np.int64)
        if order.size:
            tot[0] = int(n.sum())
        return pa.table({
            "key": pa.array(k[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
            "tot": pa.array(tot, pa.int64()),
        })

    folded = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(local_top, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    cols = ["rank", "key", "n", "share", "salt"]
    if folded.empty:
        return pd.DataFrame(columns=cols)
    total = int(folded["tot"].sum())
    if total == 0:
        return pd.DataFrame(columns=cols)
    order = np.lexsort((folded["key"].to_numpy(), -folded["n"].to_numpy(np.int64)))[:top_n]
    sel = folded.iloc[order].reset_index(drop=True)
    n = sel["n"].to_numpy(np.int64)
    share = np.array([(2 * int(x) * 1_000_000 + total) // (2 * total) for x in n], np.int64)
    # ceil via (a+b-1)//b on NONNEG operands — floor==trunc there, so
    # Python // and DuckDB // agree (the -(-a//b) form does not: trunc vs floor)
    salt = np.array([(int(x) * P + total - 1) // total for x in n], np.int64)
    return pd.DataFrame({
        "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
        "key": sel["key"],
        "n": n,
        "share": share / 1e6,
        "salt": salt,
    })


def hot_keys_sql(
    table: str = "events",
    *,
    key_col: str = "user_id",
    top_n: int = 10,
) -> str:
    return f"""
WITH per AS (
  SELECT CAST({key_col} AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS t FROM per),
ranked AS (
  SELECT row_number() OVER (ORDER BY n DESC, key ASC) AS rank, key, n
  FROM per
)
SELECT CAST(rank AS BIGINT) AS rank, key, n,
       CAST((2 * CAST(n AS HUGEINT) * 1000000 + t.t) // (2 * t.t) AS DOUBLE) / 1e6 AS share,
       CAST((CAST(n AS HUGEINT) * 64 + t.t - 1) // t.t AS BIGINT) AS salt
FROM ranked CROSS JOIN tot t
WHERE rank <= {top_n}
ORDER BY rank
""".strip()


def rate_limit_violations(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
    max_events: int = 5,
    collect: bool = True,
):
    """Sliding-window rate audit: for every event, the count of the SAME
    user's events in the half-open window ``(ts - window, ts]`` (inclusive
    of itself), flagging events where that count exceeds ``max_events`` —
    the API-throttling / abuse-detection primitive (the reference's Matomo
    sessionizer is the gap-based cousin; this is the count-based one).

    Exact by construction: pure integer timestamp arithmetic, two
    ``searchsorted`` passes per user bucket (events sorted by ts — the
    window count is ``i - bisect_left(ts, ts[i] - window + 1) + 1``), ties
    within a user at the same microsecond all count each other. One
    bucketed exchange on the user hash; each bucket sorts locally.
    Returns violating events ``(event_id, user_id, ts, window_count)``
    sorted by (user_id, ts, event_id)."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        b = analyzer.crc_bucket(t[user_col].cast(pa.string()), n_buckets)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, "event_id"], kind="mergesort")
        ts = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        uid = g[user_col].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        ends = np.append(starts[1:], len(g))
        out = np.empty(len(g), np.int64)
        for st, en in zip(starts, ends):  # per-USER loop; vectorized inside
            seg = ts[st:en]
            lo = np.searchsorted(seg, seg - (window_us - 1), side="left")
            hi = np.searchsorted(seg, seg, side="right")
            # hi - lo counts ALL same-microsecond peers (SQL RANGE frames
            # include peers of the current row, not just preceding ones)
            out[st:en] = hi - lo
        res = g.assign(window_count=out)
        return res[res["window_count"] > max_events][
            ["event_id", user_col, ts_col, "window_count"]
        ]

    res = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
    )
    if not collect:
        return res  # violations stream (unsorted) — corpus-proportional
    out = res.to_pandas()
    cols = ["event_id", user_col, ts_col, "window_count"]
    if out.empty or "event_id" not in out.columns:
        return pd.DataFrame(columns=cols)
    return out.sort_values([user_col, ts_col, "event_id"]).reset_index(drop=True)[cols]


def rate_limit_violations_sql(
    table: str = "events",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
    max_events: int = 5,
) -> str:
    return f"""
WITH counted AS (
  SELECT event_id, {user_col}, {ts_col},
         CAST(count(*) OVER (
           PARTITION BY {user_col} ORDER BY epoch_us({ts_col})
           RANGE BETWEEN {window_us - 1} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS window_count
  FROM {table}
)
SELECT event_id, {user_col}, {ts_col}, window_count
FROM counted WHERE window_count > {max_events}
ORDER BY {user_col}, {ts_col}, event_id
""".strip()


def touch_attribution(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    touch_type: str = "click",
    convert_type: str = "purchase",
    window_us: int = 7 * 24 * 3_600_000_000,
    collect: bool = True,
):
    """Marketing-style conversion attribution: for every ``convert_type``
    event, the FIRST and LAST ``touch_type`` event of the same user in the
    trailing window ``[ts − window, ts)`` (strictly earlier — same-
    microsecond touches are excluded on both sides, no tie ambiguity), and
    the touch count. First/last order is (ts, event_id). The windowed
    sibling of ``funnel``: funnel counts stage reachability, this assigns
    each conversion its credit events.

    One bucketed exchange on the user hash; per user the touch timestamps
    are binary-searched once per conversion (two vectorized searchsorted
    calls over the user's touch array — no row loop). Returns
    ``(event_id, user_id, ts, first_touch, last_touch, n_touches)`` for
    conversions with ≥1 touch, sorted by event_id."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        b = analyzer.crc_bucket(t[user_col].cast(pa.string()), n_buckets)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for _, u in g.groupby(user_col, sort=False):  # per-USER loop
            t = u[u["event_type"] == touch_type].sort_values(
                [ts_col, "event_id"], kind="mergesort"
            )
            c = u[u["event_type"] == convert_type]
            if t.empty or c.empty:
                continue
            tts = t[ts_col].to_numpy("datetime64[us]").astype(np.int64)
            tid = t["event_id"].to_numpy(np.int64)
            cts = c[ts_col].to_numpy("datetime64[us]").astype(np.int64)
            lo = np.searchsorted(tts, cts - window_us, side="left")
            hi = np.searchsorted(tts, cts, side="left")
            m = hi > lo
            if not m.any():
                continue
            out_rows.append(pd.DataFrame({
                "event_id": c["event_id"].to_numpy(np.int64)[m],
                user_col: c[user_col].to_numpy()[m],
                ts_col: c[ts_col].to_numpy()[m],
                "first_touch": tid[lo[m]],
                "last_touch": tid[hi[m] - 1],
                "n_touches": (hi - lo)[m].astype(np.int64),
            }))
        if not out_rows:
            return pd.DataFrame(columns=[
                "event_id", user_col, ts_col, "first_touch", "last_touch", "n_touches"
            ])
        return pd.concat(out_rows, ignore_index=True)

    res = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
    )
    if not collect:
        return res  # attributed conversions stream (unsorted)
    out = res.to_pandas()
    cols = ["event_id", user_col, ts_col, "first_touch", "last_touch", "n_touches"]
    if out.empty or "event_id" not in out.columns:
        return pd.DataFrame(columns=cols)
    return out.sort_values("event_id").reset_index(drop=True)[cols]


def touch_attribution_sql(
    table: str = "events",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    touch_type: str = "click",
    convert_type: str = "purchase",
    window_us: int = 7 * 24 * 3_600_000_000,
) -> str:
    win = (
        f"t.{user_col} = p.{user_col} AND t.event_type = '{touch_type}' "
        f"AND t.{ts_col} < p.{ts_col} "
        f"AND epoch_us(t.{ts_col}) >= epoch_us(p.{ts_col}) - {window_us}"
    )
    return f"""
WITH conv AS (SELECT * FROM {table} WHERE event_type = '{convert_type}')
SELECT p.event_id, p.{user_col}, p.{ts_col},
       (SELECT t.event_id FROM {table} t WHERE {win}
        ORDER BY t.{ts_col}, t.event_id LIMIT 1) AS first_touch,
       (SELECT t.event_id FROM {table} t WHERE {win}
        ORDER BY t.{ts_col} DESC, t.event_id DESC LIMIT 1) AS last_touch,
       (SELECT CAST(count(*) AS BIGINT) FROM {table} t WHERE {win}) AS n_touches
FROM conv p
WHERE EXISTS (SELECT 1 FROM {table} t WHERE {win})
ORDER BY p.event_id
""".strip()


def retention_matrix(
    ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 7 * 24 * 3_600_000_000,
    max_offset: int = 8,
) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-SEEN period
    (epoch-microseconds // period — pure integer, no calendar/tz
    surface), and for each offset k the count of cohort members active in
    period cohort+k. The classic product-analytics view; the reference's
    harvest-state watermark (core/models/harvest.py:13-41) is the same
    first-seen bookkeeping per source.

    Fully distributed fold (user cardinality IS corpus-scale): per-batch
    deduplicated (user, period, bucket=crc32(u)%64) partials → per-bucket
    ``map_groups`` (each user's rows land wholly in its bucket, so
    first-seen, offsets, and cohort membership are bucket-local) emitting
    tiny (cohort, offset, partial-count) rows. The driver folds only
    O(buckets × cohorts × offsets) count partials — never user rows (the
    ``_with_conv_bucket`` discipline from pipelines/transcripts.py).
    Retention is the half-up 1e6 fixed-point share. Returns
    ``(cohort_period, week_offset, n_cohort, n_active, retention)``
    sorted by (cohort_period, week_offset), offsets 0..max_offset with
    zero-activity offsets omitted (mirrored by the oracle's inner
    join)."""
    import zlib

    n_buckets = 64

    def partials(t: pa.Table) -> pa.Table:
        enc = t[user_col].combine_chunks().cast(pa.string()).dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        bh = np.fromiter(
            (zlib.crc32(x.encode()) % n_buckets for x in uniq),
            dtype=np.int32, count=len(uniq),
        )
        codes = np.asarray(enc.indices).astype(np.int64)
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        p = ts // period_us
        # batch-local (user, period) dedup on integer codes — no string concat
        pu, pinv = np.unique(p, return_inverse=True)
        _, idx = np.unique(codes * np.int64(pu.size) + pinv, return_index=True)
        u = enc.dictionary.to_numpy(zero_copy_only=False)[codes[idx]]
        return pa.table({
            "u": pa.array(u, pa.string()),
            "p": pa.array(p[idx], pa.int64()),
            "bucket": pa.array(bh[codes[idx]], pa.int32()),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        up = df.drop_duplicates(["u", "p"])
        c = up.groupby("u")["p"].transform("min")
        off = up["p"] - c
        keep = (off >= 0) & (off <= max_offset)
        act = (
            pd.DataFrame({"c": c[keep].to_numpy(np.int64), "off": off[keep].to_numpy(np.int64)})
            .groupby(["c", "off"]).size().reset_index(name="cnt")
        )
        act["kind"] = 0
        first = up.loc[up["p"] == c, ["u"]].assign(c=c[up["p"] == c].to_numpy(np.int64))
        sizes = (
            first.drop_duplicates("u").groupby("c").size().reset_index(name="cnt")
        )
        sizes["off"] = -1
        sizes["kind"] = 1
        out = pd.concat([act, sizes], ignore_index=True)
        return out[["kind", "c", "off", "cnt"]].astype(np.int64)

    parts = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["cohort_period", "week_offset", "n_cohort", "n_active", "retention"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    cohort_sizes = parts[parts["kind"] == 1].groupby("c")["cnt"].sum()
    counts = (
        parts[parts["kind"] == 0]
        .groupby(["c", "off"], as_index=False)["cnt"].sum()
        .rename(columns={"cnt": "n_active"})
    )
    rows = []
    for _, r in counts.iterrows():
        nc = int(cohort_sizes[r["c"]])
        na = int(r["n_active"])
        rows.append((
            int(r["c"]), int(r["off"]), nc, na,
            ((2 * na * 1_000_000 + nc) // (2 * nc)) / 1e6,
        ))
    out = pd.DataFrame(rows, columns=cols)
    return out.sort_values(["cohort_period", "week_offset"]).reset_index(drop=True)


def retention_matrix_sql(
    table: str = "events",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 7 * 24 * 3_600_000_000,
    max_offset: int = 8,
) -> str:
    return f"""
WITH up AS (
  SELECT DISTINCT CAST({user_col} AS VARCHAR) AS u,
         epoch_us({ts_col}) // {period_us} AS p
  FROM {table}
),
first AS (SELECT u, min(p) AS c FROM up GROUP BY u),
sizes AS (SELECT c, CAST(count(*) AS BIGINT) AS n_cohort FROM first GROUP BY c),
act AS (
  SELECT f.c, up.p - f.c AS off, CAST(count(*) AS BIGINT) AS n_active
  FROM up JOIN first f USING (u)
  WHERE up.p - f.c BETWEEN 0 AND {max_offset}
  GROUP BY f.c, up.p - f.c
)
SELECT CAST(a.c AS BIGINT) AS cohort_period, CAST(a.off AS BIGINT) AS week_offset,
       s.n_cohort, a.n_active,
       CAST((2 * CAST(a.n_active AS HUGEINT) * 1000000 + s.n_cohort)
            // (2 * CAST(s.n_cohort AS HUGEINT)) AS DOUBLE) / 1e6 AS retention
FROM act a JOIN sizes s USING (c)
ORDER BY cohort_period, week_offset
""".strip()


def seasonal_decompose(
    ds,
    *,
    ts_col: str = "ts",
    period: int = 24,
) -> pd.DataFrame:
    """Additive seasonal decomposition of the hourly event-count series
    (STL-lite): ``y = seasonal + trend + remainder`` with the classical
    estimators — seasonal = per-phase mean (phase = hour index mod
    ``period``), trend = the centered 2×period moving average. Every
    component is exact: counts are integers; the 2×24 MA's numerator
    ``y[t−12] + 2·Σ y[t−11..t+11] + y[t+12]`` is an integer divided by
    2·period with the half-up 1e6 fixed-point rule; the per-phase mean
    uses the same rule; remainder is a fixed-point subtraction. Hours
    with no events count 0 (the dense series over the observed range).
    Rows limited to hours where the trend is defined. Returns
    ``(hour_idx, phase, y, seasonal, trend, remainder)``.

    Scale shape: per-batch hour-count partials; the driver folds
    hour-cardinality rows (the events_hourly precedent — the series
    length is time-bounded, not data-bounded)."""

    def partials(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        h = ts // 3_600_000_000
        u, c = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(u, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ]
    cols = ["hour_idx", "phase", "y", "seasonal", "trend", "remainder"]
    if not parts:
        return pd.DataFrame(columns=cols)
    agg = pd.concat(parts, ignore_index=True).groupby("h", as_index=False)["n"].sum()
    if agg.empty:
        return pd.DataFrame(columns=cols)
    lo, hi = int(agg["h"].min()), int(agg["h"].max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[agg["h"].to_numpy(np.int64) - lo] = agg["n"].to_numpy(np.int64)
    T = y.size
    half = period // 2
    if T < period + 1:
        return pd.DataFrame(columns=cols)

    def fp_div(num: np.ndarray, den: int) -> np.ndarray:
        # half-up fixed-point division on NONNEG numerators
        return (2 * num * 1_000_000 + den) // (2 * den)

    # trend: centered 2xperiod MA, defined for t in [half, T-half-1]
    cs = np.concatenate(([0], np.cumsum(y)))
    t_idx = np.arange(half, T - half)
    inner = cs[t_idx + half] - cs[t_idx - half + 1]  # y[t-11..t+11]
    num = y[t_idx - half] + 2 * inner + y[t_idx + half]
    trend_fp = fp_div(num, 2 * period)
    # seasonal: per-phase mean over the FULL series
    phase = (np.arange(T, dtype=np.int64) + lo) % period
    s_sum = np.zeros(period, np.int64)
    s_cnt = np.zeros(period, np.int64)
    np.add.at(s_sum, phase, y)
    np.add.at(s_cnt, phase, 1)
    seas_fp = np.array([
        int((2 * int(s_sum[p]) * 1_000_000 + int(s_cnt[p])) // (2 * int(s_cnt[p])))
        for p in range(period)
    ], np.int64)
    ph_t = phase[t_idx]
    rows = pd.DataFrame({
        "hour_idx": t_idx + lo,
        "phase": ph_t,
        "y": y[t_idx],
        "seasonal": seas_fp[ph_t] / 1e6,
        "trend": trend_fp / 1e6,
        "remainder": (y[t_idx] * 1_000_000 - seas_fp[ph_t] - trend_fp) / 1e6,
    })
    return rows.reset_index(drop=True)


def seasonal_decompose_sql(
    table: str = "events",
    *,
    ts_col: str = "ts",
    period: int = 24,
) -> str:
    half = period // 2
    return f"""
WITH hc AS (
  SELECT epoch_us({ts_col}) // 3600000000 AS h, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
series AS (
  SELECT g.h, coalesce(hc.n, 0) AS y
  FROM (SELECT unnest(range((SELECT lo FROM bounds), (SELECT hi FROM bounds) + 1)) AS h) g
  LEFT JOIN hc USING (h)
),
tr AS (
  SELECT h, y,
         lag(y, {half}) OVER w + 2 * (sum(y) OVER (ORDER BY h
             ROWS BETWEEN {half - 1} PRECEDING AND {half - 1} FOLLOWING))
           + lead(y, {half}) OVER w AS num,
         count(*) OVER (ORDER BY h ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING) AS span
  FROM series WINDOW w AS (ORDER BY h)
),
seas AS (
  SELECT h % {period} AS phase,
         (2 * CAST(sum(y) AS HUGEINT) * 1000000 + count(*)) // (2 * count(*)) AS s_fp
  FROM series GROUP BY 1
)
SELECT t.h AS hour_idx, t.h % {period} AS phase, t.y,
       CAST(s.s_fp AS DOUBLE) / 1e6 AS seasonal,
       CAST((2 * CAST(t.num AS HUGEINT) * 1000000 + {2 * period})
            // (2 * {2 * period}) AS DOUBLE) / 1e6 AS trend,
       CAST(t.y * 1000000 - s.s_fp
            - (2 * CAST(t.num AS HUGEINT) * 1000000 + {2 * period}) // (2 * {2 * period})
            AS DOUBLE) / 1e6 AS remainder
FROM tr t JOIN seas s ON s.phase = t.h % {period}
WHERE t.span = {period + 1}
ORDER BY t.h
""".strip()


def ab_conversion_test(
    ds,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    n_variants: int = 2,
) -> pd.DataFrame:
    """Two-proportion A/B conversion test: users hash-split into variants
    (``user_id % n_variants`` — the deterministic assignment an
    experimentation layer would persist), conversion = the user emitted at
    least one ``convert_type`` event. Pooled two-proportion z:
    z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁)) — all counts exact integers,
    z one mirrored float expression rounded 6 (NULL when a variant is
    empty or the pooled rate degenerates). Per-batch (user, converted)
    partials; driver folds user-cardinality rows. Returns per-variant
    rows ``(variant, n_users, n_converted, rate)`` plus the z on every
    row (the window/rank oracle convention of repeating the scalar)."""

    def partials(t: pa.Table) -> pa.Table:
        u = t[user_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t[type_col].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
        conv = (et == convert_type).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        c = np.zeros(uu.size, np.int64)
        np.maximum.at(c, inv, conv)
        return pa.table({
            "u": pa.array(uu, pa.int64()),
            "c": pa.array(c, pa.int64()),
        })

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ]
    cols = ["variant", "n_users", "n_converted", "rate", "z"]
    if not parts:
        return pd.DataFrame(columns=cols)
    per = pd.concat(parts, ignore_index=True).groupby("u", as_index=False)["c"].max()
    per["variant"] = per["u"] % n_variants
    g = (
        per.groupby("variant")
        .agg(n_users=("c", "size"), n_converted=("c", "sum"))
        .reset_index()
        .sort_values("variant")
    )
    n = g["n_users"].to_numpy(np.int64)
    k = g["n_converted"].to_numpy(np.int64)
    var = g["variant"].to_numpy(np.int64)
    z = np.nan
    if n_variants == 2 and set(var.tolist()) == {0, 1}:
        n0, n1 = int(n[var == 0][0]), int(n[var == 1][0])
        k0, k1 = int(k[var == 0][0]), int(k[var == 1][0])
        N, K = n0 + n1, k0 + k1
        if 0 < K < N:
            p0, p1, ph = k0 / n0, k1 / n1, K / N
            import math

            # sign-aware fixed-point (floor(|x|*1e6+0.5), never round-half:
            # Python half-even vs DuckDB half-away — the CLAUDE.md trap)
            zraw = (p1 - p0) / math.sqrt(ph * (1.0 - ph) * (1.0 / n0 + 1.0 / n1))
            z = math.copysign(math.floor(abs(zraw) * 1e6 + 0.5), zraw) / 1e6 + 0.0
    rate = np.array(
        [(2 * int(ki) * 1_000_000 + int(ni)) // (2 * int(ni))
         for ki, ni in zip(k, n)], np.int64
    )
    return pd.DataFrame({
        "variant": var,
        "n_users": n,
        "n_converted": k,
        "rate": rate / 1e6,
        "z": [z] * len(g),
    }).reset_index(drop=True)


def ab_conversion_test_sql(
    table: str = "events",
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    n_variants: int = 2,
) -> str:
    return f"""
WITH per AS (
  SELECT {user_col} AS u,
         CAST(max(CASE WHEN {type_col} = '{convert_type}' THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM {table} GROUP BY 1
),
v AS (
  SELECT u % {n_variants} AS variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS n_converted
  FROM per GROUP BY 1
),
zr AS (
  SELECT
    CASE WHEN count(*) = 2 AND min(n_users) > 0
              AND sum(n_converted) > 0 AND sum(n_converted) < sum(n_users)
         THEN
           (CAST(max(CASE WHEN variant = 1 THEN n_converted END) AS DOUBLE)
              / CAST(max(CASE WHEN variant = 1 THEN n_users END) AS DOUBLE)
            - CAST(max(CASE WHEN variant = 0 THEN n_converted END) AS DOUBLE)
              / CAST(max(CASE WHEN variant = 0 THEN n_users END) AS DOUBLE))
           / sqrt((CAST(sum(n_converted) AS DOUBLE) / CAST(sum(n_users) AS DOUBLE))
                  * (1.0 - CAST(sum(n_converted) AS DOUBLE) / CAST(sum(n_users) AS DOUBLE))
                  * (1.0 / CAST(max(CASE WHEN variant = 0 THEN n_users END) AS DOUBLE)
                     + 1.0 / CAST(max(CASE WHEN variant = 1 THEN n_users END) AS DOUBLE)))
         ELSE NULL END AS zraw
  FROM v
),
-- sign-aware fixed-point quantization mirrored from the engine
zc AS (
  SELECT sign(zraw) * floor(abs(zraw) * 1e6 + 0.5) / 1e6 + 0.0 AS z FROM zr
)
SELECT v.variant, v.n_users, v.n_converted,
       CAST((2 * CAST(v.n_converted AS HUGEINT) * 1000000 + v.n_users)
            // (2 * CAST(v.n_users AS HUGEINT)) AS DOUBLE) / 1e6 AS rate,
       zc.z
FROM v CROSS JOIN zc
ORDER BY v.variant
""".strip()
