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


def luhn_audit(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Checksum-validated card-number audit: PAN-like tokens (13–16 digit
    runs) that PASS the Luhn mod-10 check are real leak risks; lookalikes
    that fail are noise a regex-only scrubber would over-redact. Per doc:
    candidate count and Luhn-valid count.

    Vectorized shape: tokens come from the shared analyzer; the Luhn fold
    runs once per DISTINCT candidate token per batch (vocabulary-bounded,
    the simhash rule) on a digit matrix, then maps back via inverse
    indices. The oracle reproduces the exact fold with a list_transform
    lambda. Returns a Dataset of ``(doc_id, n_candidates, n_valid)``."""
    import re

    import numpy as np

    from .. import analyzer

    digit_run = re.compile(r"^[0-9]{13,16}$")

    def audit(batch: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(batch[text_col])
        rows, codes, dictionary = analyzer.tokenize_flat(text)
        n = batch.num_rows
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        n_cand = np.zeros(n, np.int64)
        n_valid = np.zeros(n, np.int64)
        if codes.size:
            vocab = dictionary.to_pylist()
            is_cand = np.array([bool(digit_run.match(t)) for t in vocab], bool)
            valid = np.zeros(len(vocab), bool)
            for vi in np.flatnonzero(is_cand):  # distinct-candidate loop
                d = np.frombuffer(vocab[vi].encode(), np.uint8) - ord("0")
                rev = d[::-1].astype(np.int64)
                dbl = rev.copy()
                dbl[1::2] *= 2
                dbl[dbl > 9] -= 9
                valid[vi] = int(dbl.sum()) % 10 == 0
            np.add.at(n_cand, rows, is_cand[codes].astype(np.int64))
            np.add.at(n_valid, rows, valid[codes].astype(np.int64))
        return pa.table({
            "doc_id": ids,
            "n_candidates": pa.array(n_cand, pa.int64()),
            "n_valid": pa.array(n_valid, pa.int64()),
        })

    return ds.map_batches(audit, batch_format="pyarrow", zero_copy_batch=True)


def luhn_audit_sql(table: str = "documents", *, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle: same tokens, Luhn as a list_transform fold — position p from
    the right doubles when odd (0-based), subtract 9 above 9, mod 10."""
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr(text_col)
    luhn = """
      list_sum(list_transform(range(1, len(t) + 1), i ->
        CASE WHEN (len(t) - i) % 2 = 1
             THEN CASE WHEN 2 * CAST(t[i] AS BIGINT) > 9
                       THEN 2 * CAST(t[i] AS BIGINT) - 9
                       ELSE 2 * CAST(t[i] AS BIGINT) END
             ELSE CAST(t[i] AS BIGINT) END)) % 10 = 0
    """.strip()
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {tok} AS ts FROM {table}),
flat AS (SELECT doc_id, unnest(ts) AS t FROM toks),
cand AS (
  SELECT doc_id, t, {luhn} AS ok
  FROM flat WHERE regexp_full_match(t, '[0-9]{{13,16}}')
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(count(*) FILTER (ok) AS BIGINT) AS n_valid
  FROM cand GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_candidates, 0) AS n_candidates,
       coalesce(a.n_valid, 0) AS n_valid
FROM (SELECT doc_id FROM toks) d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
""".strip()
