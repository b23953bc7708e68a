"""Per-record normalizer functions (SURVEY §2.2), vectorized over Arrow.

Each mirrors a reference semantic:

- ``parse_url``            — trim + spaces/%20 → '+'
  (harvester/sources/utils/base.py:12-19)
- ``normalize_copyright``  — CC URL/code → slug, "Public Domain" → pdm-10
  (harvester/sources/utils/base.py:21-40; whitelist
  harvester/harvester/settings/base.py:494-513)
- ``mime_to_technical_type`` — dict lookup with url-guess fallback
  (harvester/files/models/datatypes/file.py:158-173)
- ``parse_publisher_date`` / ``publisher_year`` — ISO date parse with
  defaults and year extraction (harvester/products/sources/sharekit.py:97-111)
- ``suggest_completion``   — title words + first 1000 text words, folded,
  non-alpha stripped (harvester/products/models/datatypes/product.py:169-180)
- ``whitelist_projection`` — keep only whitelisted output fields
  (harvester/files/models/datatypes/file.py:70-73)
- ``validate_state``       — required-field validation; failures marked
  ``inactive`` instead of dropped (harvester/products/tasks/products.py:26-45)
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COPYRIGHT_SLUG_RE = re.compile(
    r"(?:creativecommons\.org/(?:licenses|publicdomain)/|^)"
    r"(?P<slug>by-nc-nd|by-nc-sa|by-nd|by-nc|by-sa|by|zero|mark)"
    r"[/-]?(?P<version>\d\.\d)?",
    re.IGNORECASE,
)

# harvester/harvester/settings/base.py:494-513 (shape, not a copy)
KNOWN_COPYRIGHTS = {
    "cc-by-40", "cc-by-30", "cc-by-nc-40", "cc-by-nc-30", "cc-by-nc-nd-40",
    "cc-by-nc-nd-30", "cc-by-nc-sa-40", "cc-by-nc-sa-30", "cc-by-nd-40",
    "cc-by-nd-30", "cc-by-sa-40", "cc-by-sa-30", "cc0-10", "pdm-10", "yes", "no",
}

MIME_TO_TECHNICAL_TYPE = {
    "application/pdf": "document",
    "application/msword": "document",
    "text/html": "website",
    "image/png": "image",
    "image/jpeg": "image",
    "audio/mpeg": "audio",
    "video/mp4": "video",
    "application/zip": "archive",
}


def parse_url(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Trim whitespace; spaces and %20 become '+'
    (sources/utils/base.py:12-19)."""
    out = pc.utf8_trim_whitespace(pc.fill_null(arr, ""))
    out = pc.replace_substring(out, pattern="%20", replacement="+")
    return pc.replace_substring(out, pattern=" ", replacement="+")


def normalize_copyright(value: str | None) -> str | None:
    """CC URL or code → slug like ``cc-by-40`` (sources/utils/base.py:21-40)."""
    if not value:
        return None
    if value in KNOWN_COPYRIGHTS:
        return value
    if value.strip().lower() in ("public domain", "publiek domein"):
        return "pdm-10"
    m = COPYRIGHT_SLUG_RE.search(value)
    if not m:
        return None
    slug = m.group("slug").lower()
    version = (m.group("version") or "4.0").replace(".", "")
    if slug == "zero":
        return f"cc0-{version if m.group('version') else '10'}"
    if slug == "mark":
        return f"pdm-{version if m.group('version') else '10'}"
    return f"cc-{slug}-{version}"


def normalize_copyright_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array([normalize_copyright(v) for v in arr.to_pylist()], pa.string())


def mime_to_technical_type(
    mimes: pa.Array | pa.ChunkedArray, urls: pa.Array | pa.ChunkedArray | None = None
) -> pa.Array:
    """Dict lookup with a mimetypes.guess_type(url) fallback
    (files/models/datatypes/file.py:158-173). The dict is tiny → carried in
    the closure (broadcast-once per worker)."""
    import mimetypes

    if isinstance(mimes, pa.ChunkedArray):
        mimes = mimes.combine_chunks()
    url_list = urls.to_pylist() if urls is not None else [None] * len(mimes)
    out = []
    for m, u in zip(mimes.to_pylist(), url_list):
        if m in MIME_TO_TECHNICAL_TYPE:
            out.append(MIME_TO_TECHNICAL_TYPE[m])
            continue
        if u:
            guessed, _ = mimetypes.guess_type(u)
            out.append(MIME_TO_TECHNICAL_TYPE.get(guessed, "unknown"))
        else:
            out.append("unknown")
    return pa.array(out, pa.string())


DATE_RE = re.compile(r"(\d{4})-(\d{2})-(\d{2})")


def parse_publisher_date(value: str | None) -> str | None:
    """→ '%Y-%m-%d' or None (products/sources/sharekit.py:97-104)."""
    if not value:
        return None
    m = DATE_RE.search(value)
    return m.group(0) if m else None


def publisher_year(value: str | None, default: int = 1970) -> int:
    """Year extraction with 1970 default (products/sources/sharekit.py:106-111)."""
    d = parse_publisher_date(value)
    return int(d[:4]) if d else default


_NON_ALPHA = re.compile(r"[^a-zA-Z ]+")


def fold_ascii(text: str) -> str:
    """unidecode-style fold: NFKD + drop combining marks."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )


def suggest_completion(title: str | None, text: str | None) -> list[str]:
    """Title words + first 1000 text words, folded, non-alpha stripped
    (products/models/datatypes/product.py:169-180)."""
    words: list[str] = []
    if title:
        words += title.split()
    if text:
        words += text.split()[:1000]
    out = []
    for w in words:
        cleaned = _NON_ALPHA.sub("", fold_ascii(w))
        if cleaned:
            out.append(cleaned)
    return out


def whitelist_projection(ds, fields: list[str]):
    """Keep only whitelisted output columns (files/models/datatypes/
    file.py:70-73,175-180) — plain select_columns."""
    return ds.select_columns(fields)


def validate_state(
    batch: pa.Table, required: list[str], state_col: str = "state"
) -> pa.Table:
    """Rows missing any required field become state='inactive' instead of
    being dropped (products/tasks/products.py:26-45)."""
    ok = np.ones(batch.num_rows, dtype=bool)
    for f in required:
        col = batch[f]
        valid = pc.is_valid(col)
        if pa.types.is_string(col.type):
            valid = pc.and_(valid, pc.not_equal(pc.fill_null(col, ""), ""))
        ok &= np.asarray(valid)
    states = np.where(ok, "active", "inactive")
    if state_col in batch.column_names:
        batch = batch.drop_columns([state_col])
    return batch.append_column(state_col, pa.array(states.tolist(), pa.string()))
