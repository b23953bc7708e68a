"""PII scrubbing: redact emails / IPv4s / phone numbers from a text column.

Training corpora are scrubbed of personally identifiable strings before
indexing or model training; the reference's analog is its output-whitelist
projection (only vetted fields reach the search index,
`/root/reference/harvester/files/models/datatypes/file.py:70-73,175-180`).
Here the redaction itself is the operator: pattern → placeholder token,
plus per-doc match counts for audit metrics.

Implementation: a single stateless ``map_batches`` using Arrow's
``replace_substring_regex`` / ``count_substring_regex`` kernels — RE2, the
same regex engine DuckDB's ``regexp_replace`` uses, so engine and oracle
share byte-identical semantics, and the whole stage is vectorized C++ (no
per-row Python). Patterns are deliberately RE2-safe (no backrefs, no
lookaround) and ASCII-anchored.

Redaction order matters (emails contain dot-runs an IP pattern could
partially match): emails → phones → IPv4, identical in the SQL.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, pattern, replacement) in application order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phones", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ips", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def scrub_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    text = batch[text_col].combine_chunks()
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "doc_id": batch[id_col].combine_chunks().cast(pa.int64())
    }
    counts = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append((name, pc.count_substring_regex(text, pattern).cast(pa.int64())))
        text = pc.replace_substring_regex(text, pattern, repl)
    cols["clean_text"] = text
    for name, arr in counts:
        cols[f"n_{name}"] = arr
    return pa.table(cols)


def scrub(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda t: scrub_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def scrub_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle: same patterns through DuckDB's RE2 regexp_replace (global)."""
    redacted = text_col
    count_exprs = []
    for name, pattern, repl in PII_PATTERNS:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({redacted}, '{pattern}')) AS BIGINT) AS n_{name}"
        )
        redacted = f"regexp_replace({redacted}, '{pattern}', '{repl}', 'g')"
    counts = ", ".join(count_exprs)
    return f"""
SELECT {id_col} AS doc_id, {redacted} AS clean_text, {counts}
FROM {table} ORDER BY {id_col}
""".strip()
