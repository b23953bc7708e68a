"""Thumbnail / preview generation — stateful actor-pool stage.

The reference shells out to youtube-dl / pdf2image / Pillow to produce
preview images per file, picking the generator by content type and emitting
one image per configured size (harvester/files/tasks/previews.py:8-102).
Those binaries aren't in this container, so the RENDERER is a deterministic
fake behind the same seam (mirroring ops/probe.py / ops/multimodal.py): the
generator dispatch, actor-pool shape, per-size fan-out and output layout are
real. Preview "paths" are content-addressed (md5 of the url), exactly how a
real object-store sink would name them — and SQL-expressible, so the stage
is oracle-checked at the driver gate, not just rows-only.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

PREVIEW_SIZES = ["400x300", "200x150"]

PREVIEW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("generator", pa.string()),
        ("size", pa.string()),
        ("preview_path", pa.string()),
        ("success", pa.bool_()),
    ]
)


def generator_for(content_type: str | None) -> str | None:
    """Mime dispatch (previews.py:24-44): video -> youtube_dl, pdf ->
    pdf2image, image -> pillow, everything else has no preview."""
    if not content_type:
        return None
    if content_type.startswith("video/"):
        return "youtube_dl"
    if content_type == "application/pdf":
        return "pdf2image"
    if content_type.startswith("image/"):
        return "pillow"
    return None


class PreviewStage:
    """``map_batches(PreviewStage, concurrency=N)``: the (fake) renderer
    processes are started once per actor in ``__init__``; ``__call__``
    expands each previewable file into one row per size. Swap ``_render``
    for the real subprocess/Pillow call in production."""

    def __init__(self, *, sizes: list[str] | None = None):
        pa.set_cpu_count(1)
        self.sizes = sizes or PREVIEW_SIZES
        self.renderer = object()  # real impl: subprocess pool / PIL context

    def _render(self, url: str, generator: str, size: str) -> tuple[str, bool]:
        stem = hashlib.md5(url.encode("utf-8")).hexdigest()
        return f"previews/{stem}-{size}.png", True

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        ctypes = batch["content_type"].to_pylist()
        out = {name: [] for name in PREVIEW_SCHEMA.names}
        for url, ctype in zip(urls, ctypes):
            gen = generator_for(ctype)
            if gen is None:
                continue
            for size in self.sizes:
                path, ok = self._render(url or "", gen, size)
                out["url"].append(url)
                out["generator"].append(gen)
                out["size"].append(size)
                out["preview_path"].append(path)
                out["success"].append(ok)
        return pa.table(out, schema=PREVIEW_SCHEMA)


def generate_previews(
    ds,
    *,
    url_col: str = "url",
    content_type_col: str = "content_type",
    sizes: list[str] | None = None,
    concurrency: int = 4,
    batch_size: int = 32,
):
    """Per-size preview rows for every previewable file. Small batches: each
    input row is (in production) a render subprocess, so per-batch latency,
    not per-row CPU, sizes the batch."""
    sel = ds.map_batches(
        lambda t: pa.table({"url": t[url_col], "content_type": t[content_type_col]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return sel.map_batches(
        PreviewStage,
        fn_constructor_kwargs={"sizes": sizes},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
