"""check_url prober — stateful actor-pool stage.

The reference probes file URLs with HEAD requests and records status /
redirect / content-type per file (harvester/files/tasks/metadata.py:11-61,
checkurl pipeline). This container has no network, so the PROBER is a
deterministic fake (status derived from the first 8 hex digits of the
URL's md5 — chosen over crc32 so the DuckDB oracle can mirror it exactly
and the gate is value-checked, not rows-only) behind the same seam a real
HTTP client would fill — the Ray plumbing (actor pool with per-actor
session state, batch shape, output schema, has_changed diffing) is real
and tested, mirroring ops/multimodal.py's honest-stub discipline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

PROBE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),
        ("redirect_url", pa.string()),
        ("content_type", pa.string()),
        ("is_not_found", pa.bool_()),
    ]
)

_STATUSES = np.array([200, 200, 200, 200, 200, 200, 301, 302, 404, 500], np.int32)
_CTYPES = ["text/html", "application/pdf", "image/png", "video/mp4"]


class UrlProber:
    """Callable class for ``map_batches(UrlProber, concurrency=N)``: the
    (fake) HTTP session is built once per actor in ``__init__``; ``__call__``
    probes one batch. Swap ``_head`` for a real client in production."""

    def __init__(self, *, timeout_s: float = 10.0):
        pa.set_cpu_count(1)
        self.timeout_s = timeout_s
        self.session = object()  # real impl: requests.Session() with retries

    def _head(self, url: str) -> tuple[int, str | None, str]:
        h = int(hashlib.md5(url.encode()).hexdigest()[:8], 16)
        status = int(_STATUSES[h % 10])
        redirect = url + "/moved" if status in (301, 302) else None
        ctype = _CTYPES[(h >> 4) % len(_CTYPES)]
        return status, redirect, ctype

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        rows = [self._head(u or "") for u in urls]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array([r[0] for r in rows], pa.int32()),
                "redirect_url": pa.array([r[1] for r in rows], pa.string()),
                "content_type": pa.array([r[2] for r in rows], pa.string()),
                "is_not_found": pa.array([r[0] == 404 for r in rows], pa.bool_()),
            },
            schema=PROBE_SCHEMA,
        )


def check_urls(ds, *, url_col: str = "url", concurrency: int = 4, batch_size: int = 64):
    """Probe every URL of a dataset through the actor pool. Small batches:
    each row is (in production) one network round-trip, so per-batch latency
    — not per-row CPU — sizes the batch."""
    sel = ds.map_batches(
        lambda t: pa.table({"url": t[url_col]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return sel.map_batches(
        UrlProber,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
