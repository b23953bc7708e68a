"""Normalized-URL deduplication — keep one best document per canonical URL.

Reference analog: the reference keys every file on its URL (sha1-of-URL
identity, ``harvester/files/models/datatypes/file.py:61-139``; per-product
URL dedup in the fan-in join, mirrored here by pipelines/fanin.file_split).
The LLM-data extension is corpus-level canonical-URL dedup à la
CCNet/RefinedWeb: normalize each document's URL (case, scheme, ``www.``,
fragments, tracking params, trailing slash) and keep the highest-quality
document per canonical form.

Scale design: the exchange carries only ``(norm_url, doc_id, quality)``
triples — never text. Canonical URLs are corpus-cardinality, so the group
step follows the dupgrams pattern (crc32 bucket → one vectorized
whole-bucket reducer), not a per-URL Ray groupby.

Normalization semantics (documented simplifications, mirrored exactly by
``url_dedup_sql``): lowercase the whole URL; strip ``http(s)://``; strip
``#fragment``; strip a leading ``www.``; strip trailing slashes from the
path; drop ``utm_*`` / ``fbclid`` / ``gclid`` query params; sort the
remaining params.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray import analyzer

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def normalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization; only rows that carry a query string go
    through the (tiny, bounded) per-row param sort."""
    s = urls.fillna("").str.lower()
    s = s.str.replace(r"^https?://", "", regex=True)
    s = s.str.replace(r"#.*$", "", regex=True)
    base = s.str.replace(r"\?.*$", "", regex=True)
    query = s.str.extract(r"\?(.*)$", expand=False)
    base = base.str.replace(r"^www\.", "", regex=True)
    base = base.str.replace(r"/+$", "", regex=True)
    out = base.to_numpy(dtype=object)
    has_q = query.notna().to_numpy()
    if has_q.any():
        for i in np.flatnonzero(has_q):
            kept = sorted(
                p
                for p in query.iat[i].split("&")
                if p and not p.startswith(_TRACKING_PREFIXES)
            )
            if kept:
                out[i] = out[i] + "?" + "&".join(kept)
    return pd.Series(out, index=urls.index, dtype=object)


def url_dedup(
    ds,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str = "quality",
    n_buckets: int = 64,
):
    """Canonical-URL dedup: normalize → bucket by crc32(norm_url) → keep the
    (max quality, min id) row per canonical URL. Returns
    ``(norm_url, doc_id, quality, n_dups)`` — one row per canonical URL."""

    def project(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pandas()
        norm = normalize_urls(urls)
        norm_arr = pa.array(norm.to_numpy(dtype=object), pa.string())
        # distinct-URL hashing via the dictionary idiom (dup-heavy corpora
        # repeat canonical URLs — never hash per row)
        buckets = analyzer.crc_bucket(norm_arr, n_buckets)
        return pa.table(
            {
                "norm_url": norm_arr,
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "quality": batch[quality_col].combine_chunks().cast(pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    triples = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_best(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["norm_url", "quality", "doc_id"], ascending=[True, False, True]
        )
        first = ~g["norm_url"].duplicated()
        counts = g.groupby("norm_url", sort=False)["doc_id"].transform("size")
        out = g.loc[first, ["norm_url", "doc_id", "quality"]].copy()
        out["n_dups"] = counts[first].astype(np.int64)
        return out

    return triples.groupby("bucket").map_groups(bucket_best, batch_format="pandas")


def url_dedup_sql(
    url_source_sql: str,
    *,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> str:
    """Oracle over any subquery producing ``(id, url, quality)``. Mirrors
    ``normalize_urls`` step for step with DuckDB regex + list lambdas."""
    return f"""
WITH raw AS ({url_source_sql}),
st AS (
  SELECT {id_col} AS doc_id, {quality_col} AS quality,
         regexp_replace(regexp_replace(lower(url), '^https?://', ''), '#.*$', '') AS u1
  FROM raw
),
parts AS (
  SELECT doc_id, quality,
         regexp_replace(regexp_replace(regexp_replace(u1, '\\?.*$', ''), '^www\\.', ''), '/+$', '') AS base,
         CASE WHEN contains(u1, '?') THEN regexp_extract(u1, '\\?(.*)$', 1) END AS q
  FROM st
),
norm AS (
  SELECT doc_id, quality,
         CASE WHEN q IS NULL THEN base
              ELSE CASE WHEN len(kept) = 0 THEN base
                        ELSE base || '?' || array_to_string(kept, '&') END
         END AS norm_url
  FROM (
    SELECT *, list_sort(list_filter(string_split(q, '&'),
                 x -> len(x) > 0 AND NOT (starts_with(x, 'utm_')
                      OR starts_with(x, 'fbclid') OR starts_with(x, 'gclid')))) AS kept
    FROM parts
  )
)
SELECT norm_url, doc_id, quality,
       CAST(count(*) OVER (PARTITION BY norm_url) AS BIGINT) AS n_dups
FROM norm
QUALIFY row_number() OVER (PARTITION BY norm_url ORDER BY quality DESC, doc_id ASC) = 1
ORDER BY norm_url
""".strip()
