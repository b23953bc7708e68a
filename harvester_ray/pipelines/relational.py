"""Relational operator coverage over the TPC-H-ish test tables.

Each function is one pipeline from the SURVEY §2 operator inventory, written
Ray-Data-first (read-pruned columns → vectorized map_batches → groupby /
sort / join), with a matching oracle SQL in ``__ray_entry__``. These are the
generic engine capabilities behind the reference's aggregation, ordering,
faceting and merge semantics:

- grouped aggregates  ≙ facet frequency refresh (harvester/metadata/models/
  field.py:14-39) and report counts (harvester/core/logging.py:90-133)
- broadcast joins     ≙ metadata-vocab lookups (harvester/products/tasks/
  learning_materials.py:10-95)
- top-k sort/limit    ≙ field ordering + pagination (harvester/search/views/
  document.py:44-53,90-94)
- last-writer-wins    ≙ upsert dedup by identity (harvester/core/processors/
  seed/resource.py:98-105)
- sessionize/window   ≙ Matomo visitor sessionization (harvester/core/
  analysis/matomo.py)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with an explicit map-side combiner:
    each batch pre-aggregates to ≤6 partial rows (|returnflag×linestatus|)
    inside map_batches, so the groupby shuffle moves O(groups × blocks) rows
    instead of the whole table — the pre-aggregate-before-shuffle pattern the
    100 TB target requires for low-cardinality keys."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t["l_tax"]))
        t = t.append_column("disc_price", disc_price)
        t = t.append_column("charge", charge)
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("l_quantity", "sum"),
                    ("l_extendedprice", "sum"),
                    ("disc_price", "sum"),
                    ("charge", "sum"),
                    ("l_discount", "sum"),
                    ("l_quantity", "count"),
                ]
            )
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("charge_sum", alias_name="sum_charge"),
        Sum("l_discount_sum", alias_name="sum_disc"),
        Sum("l_quantity_count", alias_name="count_order"),
    )
    pdf = out.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame(
            {
                c: pd.Series(dtype="object" if c in ("l_returnflag", "l_linestatus") else "float64")
                for c in ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                          "sum_disc_price", "sum_charge", "sum_disc", "count_order"]
            }
        )
    pdf["avg_qty"] = pdf["sum_qty"] / pdf["count_order"]
    pdf["avg_price"] = pdf["sum_base_price"] / pdf["count_order"]
    pdf["avg_disc"] = pdf["sum_disc"] / pdf["count_order"]
    pdf = pdf.drop(columns=["sum_disc"])
    pdf = pdf[
        [
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "avg_disc",
            "count_order",
        ]
    ]
    return _round_floats(pdf, 4).sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)


def revenue_by_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation grouped revenue — the small side is
    broadcast ONCE as numpy arrays (``ray.put`` of a sorted key array +
    values; searchsorted lookup inside map_batches, no Python dict, no
    per-row .map), the big side streams, and the shuffle carries only the
    int nation key. Nation NAMES are attached to the 25 result rows on the
    driver — strings never enter the hot path."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    nk = cust["c_nationkey"].to_numpy(dtype=np.int64)
    order = np.argsort(ck)
    ref = ray.put((ck[order], nk[order]))

    def lookup(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        cks = np.asarray(t["o_custkey"].combine_chunks().cast(pa.int64()))
        idx = np.searchsorted(keys, cks)
        return pa.table(
            {
                "n_nationkey": pa.array(vals[idx], pa.int64()),
                "o_totalprice": t["o_totalprice"],
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)
    out = joined.groupby("n_nationkey").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    ).to_pandas()
    out = out.merge(
        nation.rename(columns={"n_nationkey": "n_nationkey", "n_name": "n_name"}),
        on="n_nationkey",
    )[["n_name", "revenue", "n_orders"]]
    return _round_floats(out, 4).sort_values("n_name").reset_index(drop=True)


def hash_join_order_lineitem(sf_dir: str):
    """lineitem ⋈ orders grouped revenue by order priority — broadcast form.

    The orders side is one ``ray.put`` of (sorted orderkey array, priority
    CODE int8 array): each lineitem batch pre-reduces revenue per orderkey,
    maps orderkey → priority code with a vectorized searchsorted, and
    re-reduces to ≤5 partial rows — so the shuffle moves O(5 × blocks) rows
    and the 5 priority STRINGS are attached on the driver. Correct while
    orders' key array fits a worker (~16 B/order); past that, use the
    hash-partitioned ``hash_join_order_lineitem_shuffle`` fallback."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).to_pandas()
    prio_cat = orders["o_orderpriority"].astype("category")
    prio_names = list(prio_cat.cat.categories)
    ok = orders["o_orderkey"].to_numpy(dtype=np.int64)
    order = np.argsort(ok)
    ref = ray.put((ok[order], prio_cat.cat.codes.to_numpy(dtype=np.int8)[order]))

    def partial(t: pa.Table) -> pa.Table:
        keys, codes = ray.get(ref)
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        lk = np.asarray(t["l_orderkey"].combine_chunks().cast(pa.int64()))
        code = codes[np.searchsorted(keys, lk)].astype(np.int32)
        t2 = pa.table({"prio_code": pa.array(code), "rev": r})
        agg = t2.group_by("prio_code").aggregate([("rev", "sum"), ("rev", "count")])
        return agg.rename_columns(["prio_code", "rev", "n_items"])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    out = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prio_code")
        .aggregate(Sum("rev", alias_name="revenue"), Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    out["o_orderpriority"] = out["prio_code"].map(lambda c: prio_names[c])
    out = out[["o_orderpriority", "revenue", "n_items"]]
    return _round_floats(out, 4).sort_values("o_orderpriority").reset_index(drop=True)


def hash_join_order_lineitem_shuffle(sf_dir: str):
    """Large-large fallback: lineitem ⋈ orders on orderkey via Dataset.join
    (hash-partitioned) — for when neither side's key array fits a worker."""
    from ray.data.aggregate import Sum

    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        """Per-batch pre-reduction by join key: lineitems of one order are
        adjacent in the input, so this shrinks the join's left side ~4×
        before any data moves (revenue sum + item count per orderkey)."""
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t2 = pa.table({"l_orderkey": t["l_orderkey"], "rev": r})
        agg = t2.group_by("l_orderkey").aggregate([("rev", "sum"), ("rev", "count")])
        return agg.rename_columns(["l_orderkey", "rev", "n_items"])

    li = li.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=max(8, ncpu),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def prio_partial(t: pa.Table) -> pa.Table:
        agg = t.group_by("o_orderpriority").aggregate([("rev", "sum"), ("n_items", "sum")])
        return agg.rename_columns(["o_orderpriority", "rev", "n_items"])

    out = (
        joined.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("rev", alias_name="revenue"), Sum("n_items", alias_name="n_items"))
    )
    return _round_floats(out.to_pandas(), 4).sort_values("o_orderpriority").reset_index(
        drop=True
    )


def topk_orders(sf_dir: str, k: int = 10):
    """Global top-k by sort(desc) + limit (field-ordering analog)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    return top.to_pandas()


def filter_revenue(sf_dir: str):
    """TPC-H-Q6-shaped: pushdown-friendly filter + global scalar aggregate."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"]
    )

    def fil(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev": rev})

    out = ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True).sum("rev")
    return pd.DataFrame({"revenue": [round(float(out or 0.0), 4)]})


def events_facets(sf_dir: str):
    """Facet frequency refresh analog: per-field terms aggregation."""
    from ray.data.aggregate import Count, Mean

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="frequency"), Mean("value", alias_name="avg_value")
    )
    return _round_floats(out.to_pandas(), 4).sort_values("event_type").reset_index(drop=True)


def events_hourly_window(sf_dir: str):
    """Tumbling event-time window: truncate ts to the hour inside
    map_batches (no shuffle) then grouped aggregate per (user, hour)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        # per-batch combiner (same pattern as q1): pre-aggregate to one row
        # per (user, hour) inside the batch so the shuffle moves
        # O(groups × blocks) rows, not every event
        hour = pc.floor_temporal(t["ts"], unit="hour")
        t2 = pa.table({"user_id": t["user_id"], "hour": hour, "value": t["value"]})
        agg = t2.group_by(["user_id", "hour"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return agg.rename_columns(["user_id", "hour", "n_events", "sum_value"])

    out = (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hour"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
    )
    pdf = _round_floats(out.to_pandas(), 4)
    return pdf.sort_values(["user_id", "hour"]).reset_index(drop=True)


def sessionize(sf_dir: str, gap_minutes: int = 30, n_buckets: int = 64):
    """Sessionization (Matomo-analysis analog, reference
    core/analysis/matomo.py): per user, split the event stream on >gap
    inactivity; emit (user_id, n_events, n_sessions).

    Bucketed shape (the transcripts.py:71 pattern): shuffle on
    ``user_id % n_buckets`` — O(n_buckets) Python group calls instead of
    one per user — then ONE vectorized scan per bucket: sort by
    (user_id, ts, event_id), run offsets where the user changes, and a
    single np.diff over the whole bucket (every run start is a new session;
    within a run a >gap step opens one). At 100× users the per-group Python
    overhead that dominated the map_groups-per-user version is gone; skew
    is bounded because buckets hold many users each."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two (bit-mask bucket)")
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["user_id"], np.int64(n_buckets - 1)), pa.int32()
        )
        return t.append_column("bucket", b)

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        tbl = pa.Table.from_pandas(g, preserve_index=False).sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        uid = tbl["user_id"].to_numpy()
        ts = tbl["ts"].combine_chunks().to_numpy()
        n = len(uid)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "n_sessions": pd.Series(dtype=np.int64),
            })
        # new_sess[i]=1 at each user-run start OR a >gap step within a run
        new_sess = np.ones(n, dtype=np.int64)
        same_user = uid[1:] == uid[:-1]
        new_sess[1:] = np.where(
            same_user, (np.diff(ts) > gap).astype(np.int64), 1
        )
        starts = np.concatenate(([0], np.flatnonzero(~same_user) + 1, [n]))
        cum = np.concatenate(([0], np.cumsum(new_sess)))
        return pd.DataFrame({
            "user_id": uid[starts[:-1]],
            "n_events": np.diff(starts),
            "n_sessions": cum[starts[1:]] - cum[starts[:-1]],
        })

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_sessions, batch_format="pandas")
    )
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


def last_event_per_user(sf_dir: str):
    """Last-writer-wins upsert semantics: keep each user's latest event
    (ts desc, event_id desc tie-break) — per-group pre-reduction inside
    map_batches first, then the grouped final reduce, so the shuffle moves
    ≤1 row per (user, batch)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def local_last(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["ts", "event_id"], kind="mergesort").groupby("user_id").tail(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_last(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"], kind="mergesort").tail(1)

    pre = ds.map_batches(local_last, batch_format="pyarrow")
    out = pre.groupby("user_id").map_groups(final_last, batch_format="pandas")
    return (
        out.to_pandas()[["user_id", "event_id", "ts", "event_type"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def q5_local_supplier(sf_dir: str, *, region: str = "ASIA", year: int = 1996):
    """TPC-H-Q5-shaped 6-table join — revenue per nation where customer and
    supplier share the nation, restricted to one region and order year —
    with ZERO shuffle joins: every dimension chain rides as a broadcast
    numpy pair and the fact table (lineitem) streams through one
    map_batches doing vectorized searchsorted lookups + a per-batch
    revenue combiner. Broadcast sizes at 100 TB: nation/region/supplier are
    trivially small; customer→nationkey and (date-filtered)
    orders→custkey are ~8-16 B/row — the documented limit is worker heap,
    past which the `hash_join_order_lineitem_shuffle` co-partition path
    applies table by table."""
    import ray
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    regdf = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    asia = nation.merge(regdf[regdf["r_name"] == region], left_on="n_regionkey", right_on="r_regionkey")
    nat_keys = np.sort(asia["n_nationkey"].to_numpy(dtype=np.int64))
    nat_names = (
        asia.set_index("n_nationkey").loc[nat_keys, "n_name"].tolist()
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    corder = np.argsort(ck)
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    sorder = np.argsort(sk)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    lo, hi = pd.Timestamp(f"{year}-01-01"), pd.Timestamp(f"{year + 1}-01-01")
    orders = orders[(orders["o_orderdate"] >= lo) & (orders["o_orderdate"] < hi)]
    ok = orders["o_orderkey"].to_numpy(dtype=np.int64)
    oorder = np.argsort(ok)

    ref = ray.put(
        (
            ok[oorder],
            orders["o_custkey"].to_numpy(dtype=np.int64)[oorder],
            ck[corder],
            cust["c_nationkey"].to_numpy(dtype=np.int64)[corder],
            sk[sorder],
            supp["s_nationkey"].to_numpy(dtype=np.int64)[sorder],
            nat_keys,
        )
    )

    def _lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
        pos = np.searchsorted(keys, probe)
        pos_c = np.minimum(pos, keys.size - 1) if keys.size else pos
        hit = (keys[pos_c] == probe) if keys.size else np.zeros(probe.size, bool)
        return vals[pos_c] if keys.size else probe, hit

    def partial(t: pa.Table) -> pa.Table:
        okk, ocust, ckk, cnat, skk, snat, nkeys = ray.get(ref)
        lk = np.asarray(t["l_orderkey"].combine_chunks().cast(pa.int64()))
        ls = np.asarray(t["l_suppkey"].combine_chunks().cast(pa.int64()))
        rev = np.asarray(t["l_extendedprice"].combine_chunks()) * (
            1.0 - np.asarray(t["l_discount"].combine_chunks())
        )
        custkey, hit_o = _lookup(okk, ocust, lk)
        c_nat, hit_c = _lookup(ckk, cnat, custkey)
        s_nat, hit_s = _lookup(skk, snat, ls)
        pos = np.searchsorted(nkeys, s_nat)
        pos_c = np.minimum(pos, nkeys.size - 1)
        in_region = nkeys[pos_c] == s_nat
        keep = hit_o & hit_c & hit_s & in_region & (c_nat == s_nat)
        nat = s_nat[keep]
        npos, inv = np.unique(nat, return_inverse=True)
        sums = np.bincount(inv, weights=rev[keep])
        return pa.table(
            {
                "n_nationkey": pa.array(npos, pa.int64()),
                "revenue": pa.array(sums, pa.float64()),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    agg = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_nationkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    name_of = dict(zip(nat_keys.tolist(), nat_names))
    agg["n_name"] = agg["n_nationkey"].map(name_of)
    agg["revenue"] = agg["revenue"].round(4)
    return (
        agg[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)
    )


def q5_local_supplier_sql(*, region: str = "ASIA", year: int = 1996) -> str:
    return f"""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{year}-01-01' AND o_orderdate < TIMESTAMP '{year + 1}-01-01'
GROUP BY n_name
ORDER BY n_name
""".strip()


def events_rollup(sf_dir: str):
    """GROUPING SETS rollup — (event_type, day), (event_type), () — in ONE
    distributed pass: the finest grouping runs with the q1 map-side
    combiner, and the coarser levels are derived from the finest result
    (O(types × days) rows) on the driver, so the raw table is scanned and
    shuffled exactly once instead of once per grouping set. Subtotal rows
    use the '<all>' marker (the reference's facet trees label totals the
    same way, /root/reference/harvester/metadata/models/field.py:14-39)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.date32())
        t2 = pa.table(
            {"event_type": t["event_type"], "day": day, "value": t["value"]}
        )
        agg = t2.group_by(["event_type", "day"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return agg.rename_columns(["event_type", "day", "value", "n"])

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(Sum("value", alias_name="sum_value"), Sum("n", alias_name="n_events"))
        .to_pandas()
    )
    finest["day"] = pd.to_datetime(finest["day"]).dt.strftime("%Y-%m-%d")
    by_type = (
        finest.groupby("event_type", as_index=False)
        .agg(sum_value=("sum_value", "sum"), n_events=("n_events", "sum"))
        .assign(day="<all>")
    )
    total = pd.DataFrame(
        {
            "event_type": ["<all>"],
            "day": ["<all>"],
            "sum_value": [finest["sum_value"].sum()],
            "n_events": [finest["n_events"].sum()],
        }
    )
    out = pd.concat([finest, by_type, total], ignore_index=True)
    out["sum_value"] = out["sum_value"].round(4)
    out["n_events"] = out["n_events"].astype(np.int64)
    return (
        out[["event_type", "day", "n_events", "sum_value"]]
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )


def events_rollup_sql() -> str:
    return """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(CAST(day AS VARCHAR), '<all>') AS day,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
ORDER BY event_type, day
""".strip()


def top_n_per_key(ds, *, key: str, order_by: list[str], ascending: list[bool], n: int):
    """Generic per-key top-N (the within-group ordering primitive behind the
    reference's priority-ranked file selection,
    /root/reference/harvester/products/models/datatypes/product.py:96-117,
    generalized to N). Map-side partial top-N per (key, batch) caps the
    shuffle at N rows per key per block; the grouped final reduce re-ranks
    the partials. Deterministic for any total order (callers include a
    unique tie-break column in ``order_by``)."""

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(order_by, ascending=ascending, kind="mergesort")
        return pa.Table.from_pandas(df.groupby(key).head(n), preserve_index=False)

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, ascending=ascending, kind="mergesort").head(n)

    pre = ds.map_batches(local_top, batch_format="pyarrow")
    return pre.groupby(key).map_groups(final_top, batch_format="pandas")


def top_events_per_user(sf_dir: str, n: int = 3):
    """Top-3 events per user by value (desc, event_id asc tie-break)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])
    out = top_n_per_key(
        ds, key="user_id", order_by=["value", "event_id"], ascending=[False, True], n=n
    )
    df = out.to_pandas()[["user_id", "event_id", "value"]]
    df["value"] = df["value"].round(4)
    return df.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def top_events_per_user_sql(n: int = 3) -> str:
    return f"""
SELECT user_id, event_id, round(value, 4) AS value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
)
WHERE rn <= {n}
ORDER BY user_id, event_id
""".strip()


def distinct_segments(sf_dir: str):
    """Distinct values of a column (dedup/unique analog)."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def state_counts(sf_dir: str):
    """Report-counts analog (harvester/core/logging.py:90-133): row counts
    per categorical state over two tables, unioned."""
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", columns=["o_orderstatus"]).groupby(
        "o_orderstatus"
    ).aggregate(Count(alias_name="n"))

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": pa.array(["orders"] * t.num_rows, pa.string()),
                "state": t["o_orderstatus"],
                "n": t["n"],
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_linestatus"]).groupby(
        "l_linestatus"
    ).aggregate(Count(alias_name="n"))

    def tag2(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": pa.array(["lineitem"] * t.num_rows, pa.string()),
                "state": t["l_linestatus"],
                "n": t["n"],
            }
        )

    a = orders.map_batches(tag, batch_format="pyarrow")
    b = li.map_batches(tag2, batch_format="pyarrow")
    return (
        a.union(b).to_pandas().sort_values(["entity", "state"]).reset_index(drop=True)
    )


def _round_floats(df: pd.DataFrame, digits: int) -> pd.DataFrame:
    for c in df.columns:
        if df[c].dtype == np.float64:
            df[c] = df[c].round(digits)
    return df


def value_quantiles(sf_dir: str):
    """Exact per-group quantiles (p25/p50/p75/p95 of value per event_type) —
    the percentile-aggregation sibling of events_facets. Grouped exact
    quantiles need each group's full value set in one place: groupby +
    map_groups (sort-based exchange) with a vectorized np.quantile per
    group; 'linear' interpolation is definitionally identical to DuckDB's
    quantile_cont, so results are value-identical, not approximate. Shuffle
    volume is the (event_type, value) pair stream — acceptable because the
    group count is tiny; for high-cardinality keys use a t-digest-style
    mergeable summary instead (documented tradeoff)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        qs = np.quantile(v, [0.25, 0.5, 0.75, 0.95], method="linear")
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p25": [round(qs[0], 4)],
                "p50": [round(qs[1], 4)],
                "p75": [round(qs[2], 4)],
                "p95": [round(qs[3], 4)],
            }
        )

    out = ds.groupby("event_type").map_groups(q, batch_format="pandas")
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


VALUE_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY event_type ORDER BY event_type
""".strip()


def orders_without_lineitems(sf_dir: str):
    """Broadcast anti-join: orders that no lineitem references (the
    orphan-detection data-quality audit — reference analog: the
    set-reconciliation checks in harvester/core/tasks/harvest/set.py:99-126
    that compare document sets between versions). The probe side (orders)
    streams; the build side's DISTINCT key set is collected once from a
    single-column pruned read and broadcast as one sorted numpy array
    (CLAUDE.md broadcast rule). Works while the distinct-key set fits a
    worker (orders-cardinality, not lineitem-cardinality); beyond that,
    hash-partition both sides on the key and anti-join per bucket (the
    join_shuffle_fallback exchange)."""
    import numpy as np
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def batch_keys(t: pa.Table) -> pa.Table:
        u = t["l_orderkey"].combine_chunks().unique()
        return pa.table({"k": u.cast(pa.int64())})

    parts = [
        b.to_pandas()
        for b in li.map_batches(batch_keys, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    keys = (
        np.unique(pd.concat(parts, ignore_index=True)["k"].to_numpy(np.int64))
        if parts
        else np.empty(0, np.int64)
    )
    ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        ok = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        if ks.size == 0:
            mask = np.ones(ok.size, bool)
        else:
            pos = np.searchsorted(ks, ok)
            mask = ks[np.clip(pos, 0, ks.size - 1)] != ok
        return t.filter(pa.array(mask))

    out = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
        .map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values("o_orderkey").reset_index(drop=True)[cols]


ORDERS_WITHOUT_LINEITEMS_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
ORDER BY o_orderkey
""".strip()


def global_sort_page(sf_dir: str, *, offset: int = 1000, page: int = 10):
    """Deep pagination into a full distributed sort: rows [offset,
    offset+page) of events ordered by (value DESC, event_id). The sort is
    Ray Data's range-partitioned exchange (sample → range-split → per-range
    sort) — the one all-to-all this operator fundamentally requires; only
    ``offset + page`` rows ever reach the driver via ``limit()``, so deep
    pages stay cheap as long as offset ≪ corpus (the same contract as the
    search API's from+size pagination, index/extras.py:search_page)."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = (
        ds.sort(["value", "event_id"], descending=[True, False])
        .limit(offset + page)
        .to_pandas()
    )
    return out.iloc[offset:].reset_index(drop=True)[["event_id", "event_type", "value"]]


GLOBAL_SORT_PAGE_SQL = """
SELECT event_id, event_type, value
FROM events ORDER BY value DESC, event_id LIMIT 10 OFFSET 1000
""".strip()


FULL_OUTER_EVENTS_CUSTOMERS_SQL = """
WITH e AS (
  SELECT user_id AS key, CAST(count(*) AS DOUBLE) AS n_events
  FROM events GROUP BY user_id
),
c AS (
  SELECT CAST(c_custkey AS BIGINT) AS key, c_acctbal
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT coalesce(e.key, c.key) AS key, e.n_events, c.c_acctbal
FROM e FULL OUTER JOIN c ON e.key = c.key
ORDER BY key
""".strip()


def events_customers_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER JOIN as a broadcast composition (small-side aggregated
    left ⟗ streaming right): inner matches + right-anti rows stream out of
    one map pass over the right side; left-anti rows come from the
    broadcast key set minus the (bounded) matched-key fold — the right
    table is never materialized on the driver. Mirrors the reference's
    set-reconciliation shape (carried ∖ incoming plus incoming ∖ carried,
    core/models/datatypes/set.py:69-85) generalized to keep both sides'
    payloads. Valid while the LEFT side's aggregate fits a worker
    (user-cardinality); two large sides instead hash-partition on the key
    and run the same union of inner/anti pieces per bucket
    (join_shuffle_fallback's exchange)."""
    import numpy as np
    import ray

    ev = _read(sf_dir, "events", columns=["user_id"])

    def user_counts(t: pa.Table) -> pa.Table:
        return (
            t.group_by("user_id").aggregate([([], "count_all")])
            .rename_columns(["key", "n"])
        )

    parts = ev.map_batches(user_counts, batch_format="pyarrow").to_pandas()
    left = parts.groupby("key", sort=True)["n"].sum()
    lkeys = left.index.to_numpy(np.int64)
    lvals = left.to_numpy(np.float64)
    ref = ray.put((lkeys, lvals))
    cache: dict[str, tuple] = {}

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def right_rows(t: pa.Table) -> pa.Table:
        if "b" not in cache:
            cache["b"] = ray.get(ref)
        ks, vs = cache["b"]
        ck = t["c_custkey"].combine_chunks().cast(pa.int64())
        ckn = np.asarray(ck)
        keep = ckn % 3 == 0
        ckn = ckn[keep]
        bal = np.asarray(t["c_acctbal"].combine_chunks())[keep]
        pos = np.searchsorted(ks, ckn)
        posc = np.clip(pos, 0, max(ks.size - 1, 0))
        hit = (ks.size > 0) & (ks[posc] == ckn) if ks.size else np.zeros(ckn.size, bool)
        n_ev = np.where(hit, vs[posc], np.nan)
        return pa.table({
            "key": pa.array(ckn, pa.int64()),
            "n_events": pa.array(n_ev, pa.float64()),
            "c_acctbal": pa.array(bal, pa.float64()),
        })

    right = cust.map_batches(right_rows, batch_format="pyarrow").to_pandas()

    def matched_keys(t: pa.Table) -> pa.Table:
        if "b" not in cache:
            cache["b"] = ray.get(ref)
        ks, _ = cache["b"]
        ckn = np.asarray(t["c_custkey"].combine_chunks().cast(pa.int64()))
        ckn = ckn[ckn % 3 == 0]
        return pa.table({"key": pa.array(np.intersect1d(ks, ckn), pa.int64())})

    mparts = cust.map_batches(matched_keys, batch_format="pyarrow").to_pandas()
    matched = (
        np.unique(mparts["key"].to_numpy(np.int64))
        if len(mparts)
        else np.empty(0, np.int64)
    )
    lonly = np.setdiff1d(lkeys, matched, assume_unique=True)
    left_rows = pd.DataFrame({
        "key": lonly,
        "n_events": lvals[np.searchsorted(lkeys, lonly)],
        "c_acctbal": np.full(lonly.size, np.nan),
    })
    out = pd.concat([right, left_rows], ignore_index=True)
    return out.sort_values("key").reset_index(drop=True)


def visits_to_rankings(sf_dir: str, gap_minutes: int = 30, n_buckets: int = 64):
    """Matomo download-query-ranking refresh (reference
    core/analysis/matomo.py:30-69, create_or_update_download_query_rankings):
    sessionize the visit log, keep visits with >= 3 actions containing a
    download, replay each visit's search -> result-view -> download state
    machine, and count hits per (query, document), emitting the reference's
    ranking keys ``edusources-<analyzer_lang>:<external_id>``.

    Event mapping (deterministic fixture over the events table, mirrored
    verbatim in the oracle): ``view`` = site-search action with keyword
    ``q<k%8>`` (``k%10==0`` models a categorised search -> query None),
    ``click`` = result-view of external_id ``(k*7)%600``, ``purchase`` =
    download of the same id, ``error``/``signup`` = unrelated actions that
    reset the state. ``k`` is the integer in the props JSON.

    The reference's sequential per-visit loop is re-expressed CLOSED-FORM so
    each bucket vectorizes: after the i-th search of a visit (a "span",
    query from that search), number the span's non-search actions 1..n;
    the state dies at the first unrelated action or result-view at even
    position; a download at an even position before death is a hit. This is
    provably the same DFA: odd positions set current_result, even positions
    must be the download that consumes it.

    Scale shape: one bucket shuffle on user_id (the sessionize pattern), a
    single vectorized scan per bucket, O(queries x documents-hit) partial
    counts per bucket, and the documents-language lookup reads only
    (doc_id, lang) and returns only the hit ids."""
    import ray

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two (bit-mask bucket)")
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "event_type", "props"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(t: pa.Table) -> pa.Table:
        # props is the fixture JSON '{"k": N}' — strip to the integer
        ki = pc.cast(
            pc.replace_substring_regex(t["props"], r"[^0-9]", ""), pa.int64()
        )
        b = pc.cast(pc.bit_wise_and(t["user_id"], np.int64(n_buckets - 1)),
                    pa.int32())
        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"],
            "ts": pc.cast(t["ts"], pa.timestamp("us")),
            "event_type": t["event_type"], "k": ki, "bucket": b,
        })

    def bucket_hits(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query": pd.Series(dtype=object),
                              "ext_id": pd.Series(dtype=np.int64),
                              "cnt": pd.Series(dtype=np.int64)})
        tbl = pa.Table.from_pandas(g, preserve_index=False).sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")])
        n = tbl.num_rows
        if n == 0:
            return empty
        uid = tbl["user_id"].to_numpy()
        ts = tbl["ts"].combine_chunks().to_numpy()
        et = np.asarray(tbl["event_type"].to_pandas(), dtype=object)
        k = tbl["k"].to_numpy()
        # --- visits: 30-min-gap sessions per user -----------------------
        new_visit = np.ones(n, dtype=bool)
        same_user = uid[1:] == uid[:-1]
        new_visit[1:] = ~same_user | (np.diff(ts) > gap)
        visit = np.cumsum(new_visit) - 1
        # --- visit filters: >=3 actions, contains a download ------------
        n_visits = visit[-1] + 1
        counts = np.bincount(visit, minlength=n_visits)
        is_dl = et == "purchase"
        dls = np.bincount(visit, weights=is_dl, minlength=n_visits)
        keep = (counts >= 3) & (dls >= 1)
        m = keep[visit]
        visit, et, k = visit[m], et[m], k[m]
        if visit.size == 0:
            return empty
        # --- spans: one per search action, keyed (visit, span) ----------
        is_s = et == "view"
        span = np.cumsum(is_s)
        skey = visit.astype(np.int64) * np.int64(visit.size + 1) + span
        s_rows = np.flatnonzero(is_s)
        if s_rows.size == 0:
            return empty
        s_keys = skey[s_rows]                      # ascending by construction
        s_query = np.where(k[s_rows] % 10 == 0, -1, k[s_rows] % 8)
        # --- body actions: non-search rows belonging to SOME span -------
        body = np.flatnonzero(~is_s)
        pos = np.searchsorted(s_keys, skey[body])
        valid = (pos < s_keys.size) & (s_keys[np.minimum(pos, s_keys.size - 1)]
                                       == skey[body])
        body, pos = body[valid], pos[valid]
        if body.size == 0:
            return empty
        # rn = 1-based position within the span (body is index-ordered and
        # skey is non-decreasing along it)
        bkey = skey[body]
        starts = np.flatnonzero(np.diff(np.concatenate(([-1], bkey)))) 
        rn = np.arange(body.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, body.size))) + 1
        bet = et[body]
        is_x = (bet == "error") | (bet == "signup")
        is_r = bet == "click"
        dead_here = is_x | (is_r & (rn % 2 == 0))
        # death rn per span: min rn among dead_here rows (inf when none)
        death = np.full(s_keys.size, np.iinfo(np.int64).max, dtype=np.int64)
        dh = np.flatnonzero(dead_here)
        if dh.size:
            np.minimum.at(death, pos[dh], rn[dh])
        hits = ((bet == "purchase") & (rn % 2 == 0) & (rn < death[pos])
                & (s_query[pos] >= 0))
        if not hits.any():
            return empty
        hq = s_query[pos[hits]]
        he = (k[body[hits]] * 7) % 600
        pair = hq * 600 + he
        uniq, cnt = np.unique(pair, return_counts=True)
        return pd.DataFrame({
            "query": np.asarray(["q" + str(q) for q in uniq // 600],
                                dtype=object),
            "ext_id": (uniq % 600).astype(np.int64),
            "cnt": cnt.astype(np.int64),
        })

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_hits, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame({"query": pd.Series(dtype=object),
                          "ranking_key": pd.Series(dtype=object),
                          "cnt": pd.Series(dtype=np.int64)})
    if parts.empty or "query" not in parts.columns:
        return empty
    agg = parts.groupby(["query", "ext_id"], as_index=False)["cnt"].sum()
    # --- language lookup: stream documents, return ONLY the hit ids -----
    ids_ref = ray.put(np.asarray(sorted(set(agg["ext_id"])), dtype=np.int64))

    def lang_of_hits(t: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        ids = t["doc_id"].to_numpy()
        p = np.searchsorted(want, ids)
        m = (p < want.size) & (want[np.minimum(p, want.size - 1)] == ids)
        return t.filter(pa.array(m))

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        lang_of_hits, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    lang = dict(zip(docs["doc_id"], docs["lang"]))
    found = agg[agg["ext_id"].isin(lang)].copy()  # missing docs -> not_found
    if found.empty:
        return empty
    clamp = found["ext_id"].map(
        lambda d: lang[d] if lang[d] in ("en", "nl") else "unk")
    found["ranking_key"] = ("edusources-" + clamp + ":"
                            + found["ext_id"].astype(str))
    out = found[["query", "ranking_key", "cnt"]].sort_values(
        ["query", "ranking_key"]).reset_index(drop=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def visits_to_rankings_sql(gap_minutes: int = 30) -> str:
    """Oracle for visits_to_rankings: identical closed-form DFA via window
    functions (span per search, death at first reset, hits at even rn)."""
    return f"""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS k
  FROM events
),
lagged AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev
),
visits AS (
  SELECT *, sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL {gap_minutes} MINUTE
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS visit_id
  FROM lagged
),
vfilt AS (
  SELECT user_id, visit_id FROM visits GROUP BY 1, 2
  HAVING count(*) >= 3
     AND count(*) FILTER (WHERE event_type = 'purchase') >= 1
),
va AS (
  SELECT v.* FROM visits v JOIN vfilt USING (user_id, visit_id)
),
spans AS (
  SELECT *, sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id, visit_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS span_id
  FROM va
),
spanq AS (
  SELECT user_id, visit_id, span_id,
         CASE WHEN k % 10 = 0 THEN NULL
              ELSE 'q' || CAST(k % 8 AS VARCHAR) END AS query
  FROM spans WHERE event_type = 'view'
),
body AS (
  SELECT user_id, visit_id, span_id, event_type, k,
         row_number() OVER (PARTITION BY user_id, visit_id, span_id
                            ORDER BY ts, event_id) AS rn
  FROM spans WHERE event_type <> 'view' AND span_id >= 1
),
death AS (
  SELECT user_id, visit_id, span_id,
         min(rn) FILTER (WHERE event_type IN ('error', 'signup')
                         OR (rn % 2 = 0 AND event_type = 'click')) AS death_rn
  FROM body GROUP BY 1, 2, 3
),
hits AS (
  SELECT q.query, (b.k * 7) % 600 AS ext_id
  FROM body b
  JOIN spanq q USING (user_id, visit_id, span_id)
  LEFT JOIN death d USING (user_id, visit_id, span_id)
  WHERE q.query IS NOT NULL AND b.event_type = 'purchase'
    AND b.rn % 2 = 0 AND (d.death_rn IS NULL OR b.rn < d.death_rn)
)
SELECT h.query,
       'edusources-' || (CASE WHEN doc.lang IN ('en', 'nl') THEN doc.lang
                              ELSE 'unk' END)
         || ':' || CAST(h.ext_id AS VARCHAR) AS ranking_key,
       CAST(count(*) AS BIGINT) AS cnt
FROM hits h JOIN documents doc ON doc.doc_id = h.ext_id
GROUP BY 1, 2
ORDER BY query, ranking_key
""".strip()


def report_dataset_version(sf_dir: str, n_sets: int = 8, name_mod: int = 5):
    """Dataset-version harvest report with the duplicate-name collection
    skip (reference core/logging.py:112-133, report_dataset_version): scan
    the version's collections in id order, report each collection NAME
    once (the first id wins; later same-named collections are skipped
    entirely), then report the dataset-level totals over the KEPT
    collections' documents only.

    Fixture mapping (mirrored verbatim in the oracle): collection id =
    doc_id % n_sets; collection name = 'set' || (id % name_mod) — ids
    name_mod..n_sets-1 duplicate earlier names and are skipped; document
    state from doc_id % 10 (0 => deleted, 1 => inactive, else active).

    Shape: one map_batches combiner folds each batch to <= n_sets x 3
    partial rows, the groupby moves O(sets x blocks) rows, the report
    frame is assembled on the driver from n_sets rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        coll = d % n_sets
        state = d % 10  # 0 deleted, 1 inactive, else active
        key = coll * 4 + np.where(state == 0, 1, np.where(state == 1, 2, 0))
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "coll": pa.array(uniq // 4, pa.int64()),
            "kind": pa.array(uniq % 4, pa.int64()),
            "n": pa.array(cnt, pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["coll", "kind"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = np.zeros((n_sets, 3), dtype=np.int64)  # active/deleted/inactive
    for r in agg.itertuples():
        counts[int(r.coll), int(r.kind) if r.kind < 3 else 0] += int(r.n)
    rows = []
    seen_names: set[str] = set()
    kept_tot = np.zeros(3, dtype=np.int64)
    for cid in range(n_sets):
        name = f"set{cid % name_mod}"
        if name in seen_names:
            continue  # the duplicate-name skip
        seen_names.add(name)
        act, dele, inact = counts[cid]
        rows.append(("collection", name, int(act + dele + inact),
                     int(dele), int(inact)))
        kept_tot += counts[cid]
    rows.append(("dataset_version", "all", int(kept_tot.sum()),
                 int(kept_tot[1]), int(kept_tot[2])))
    out = pd.DataFrame(rows, columns=["scope", "name", "total", "deleted",
                                      "inactive"])
    return out.sort_values(["scope", "name"]).reset_index(drop=True)


def report_dataset_version_sql(n_sets: int = 8, name_mod: int = 5) -> str:
    """Oracle for report_dataset_version: QUALIFY row_number() keeps the
    first collection id per name; dataset totals join back to kept ids."""
    return f"""
WITH docs AS (
  SELECT doc_id % {n_sets} AS coll,
         CASE WHEN doc_id % 10 = 0 THEN 'deleted'
              WHEN doc_id % 10 = 1 THEN 'inactive'
              ELSE 'active' END AS state
  FROM documents
),
kept AS (
  SELECT coll, 'set' || CAST(coll % {name_mod} AS VARCHAR) AS name
  FROM (SELECT DISTINCT coll FROM docs)
  QUALIFY row_number() OVER (
    PARTITION BY coll % {name_mod} ORDER BY coll) = 1
),
per_coll AS (
  SELECT k.name,
         CAST(count(*) AS BIGINT) AS total,
         CAST(count(*) FILTER (WHERE d.state = 'deleted') AS BIGINT) AS deleted,
         CAST(count(*) FILTER (WHERE d.state = 'inactive') AS BIGINT) AS inactive
  FROM docs d JOIN kept k USING (coll)
  GROUP BY k.name
)
SELECT 'collection' AS scope, name, total, deleted, inactive FROM per_coll
UNION ALL
SELECT 'dataset_version', 'all',
       CAST(sum(total) AS BIGINT), CAST(sum(deleted) AS BIGINT),
       CAST(sum(inactive) AS BIGINT)
FROM per_coll
ORDER BY scope, name
""".strip()
