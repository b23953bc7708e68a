"""Corpus term statistics via the explicit groupby-aggregate shuffle, with
salted repartitioning of hot terms.

The production index build computes term stats through map-side bucket
partitioning (build.py phase 2) because its partials are already unique per
(segment, term). This module implements the *general* shuffle-based path the
north_rule names — for callers that need term stats WITHOUT building an
index, and as the explicit demonstration of skew handling:

1. per-batch partial aggregation: ``(term, df_partial, cf_partial)`` — one
   row per distinct term per batch (the combiner; reference seed:
   harvester/core/analysis/text.py:45-71 fits sklearn vectorizers over the
   corpus, a driver-side equivalent),
2. **salting**: terms whose per-batch partial df exceeds ``hot_threshold``
   are heavy hitters (Zipf head / tool boilerplate). Their rows get
   ``salt = batch_fingerprint % n_salts`` so the shuffle spreads them over
   ``n_salts`` reducers instead of one,
3. first ``groupby(term, salt)`` aggregate, then a second tiny
   ``groupby(term)`` aggregate merges the salted sub-totals.

Verified against the same DuckDB oracle as the index's term stats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import analyzer


def term_stats_shuffle(
    ds,
    *,
    text_col: str = "text",
    n_salts: int = 8,
    hot_threshold: int = 1000,
):
    """→ Dataset of (term, df, cf) via salted groupby-aggregate shuffle."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        r, c, tf = analyzer.term_frequencies(rows, codes)
        if c.size == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "salt": pa.array([], pa.int32()),
                    "df": pa.array([], pa.int64()),
                    "cf": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(c, kind="stable")
        c_s, tf_s = c[order], tf[order]
        starts = np.flatnonzero(np.diff(np.concatenate(([-1], c_s))))
        term_ids = c_s[starts]
        df = np.diff(np.append(starts, c_s.size)).astype(np.int64)
        cf = np.add.reduceat(tf_s, starts).astype(np.int64)
        # salt heavy hitters: deterministic per-batch fingerprint spreads a
        # hot term's partials across n_salts reducer groups
        fingerprint = int(np.bitwise_xor.reduce(c_s.astype(np.uint64) * np.uint64(2654435761))) & 0x7FFFFFFF
        salt = np.where(df >= hot_threshold, fingerprint % n_salts, 0).astype(np.int32)
        return pa.table(
            {
                "term": dictionary.take(pa.array(term_ids)),
                "salt": pa.array(salt, pa.int32()),
                "df": pa.array(df, pa.int64()),
                "cf": pa.array(cf, pa.int64()),
            }
        )

    pre = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    salted = pre.groupby(["term", "salt"]).aggregate(
        Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
    )
    final = salted.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
    )
    return final
