"""Percolator: reverse search — match a STREAM of documents against a
small set of STORED queries (the Elasticsearch/OpenSearch percolate API of
the reference's search stack; the reference registers alert-style saved
queries through the same OpenSearch surface its search views use,
harvester/search/views/document.py).

Ray-Data-first shape: the stored queries are the broadcast small side
(terms flattened into one sorted vocabulary + per-query term-id lists,
shipped once); documents stream through ONE ``map_batches`` pass with no
shuffle. Per batch everything is vectorized: one ``tokenize_flat`` call,
one searchsorted of the batch dictionary against the query vocabulary
(so matching cost scales with the batch's DISTINCT tokens, not its token
count), and one rows×V boolean membership matrix — V = distinct stored
query terms, which is broadcast-small by construction. AND semantics per
query (simple_query_string default_operator:and parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import analyzer


def _compile(queries: list[tuple[int, str]]) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Flatten stored queries into (sorted term vocabulary, per-query
    vocab-id arrays). Queries whose text tokenizes to nothing match no doc
    (ES percolator: an empty query is rejected at registration)."""
    term_sets = []
    vocab: set[str] = set()
    for qid, qtext in queries:
        terms = sorted(set(analyzer.tokenize_query(qtext)))
        term_sets.append((int(qid), terms))
        vocab.update(terms)
    vocab_arr = np.array(sorted(vocab), dtype=object)
    compiled = []
    for qid, terms in term_sets:
        if not terms:
            continue
        ids = np.searchsorted(vocab_arr, np.array(terms, dtype=object))
        compiled.append((qid, ids.astype(np.int64)))
    return vocab_arr, compiled


def percolate(
    ds,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect: bool = True,
):
    """For every document, the stored queries it satisfies (all query terms
    present). Returns (doc_id, query_id) pairs — sorted when ``collect``,
    else a streaming Dataset of the same rows."""
    vocab_arr, compiled = _compile(queries)
    out_schema = pa.schema([("doc_id", pa.int64()), ("query_id", pa.int64())])

    def match(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or not compiled:
            return out_schema.empty_table()
        row_ids, codes, dictionary = analyzer.tokenize_flat(batch[text_col])
        dict_np = np.asarray(dictionary.to_pandas(), dtype=object)
        idx = np.searchsorted(vocab_arr, dict_np)
        np.clip(idx, 0, max(len(vocab_arr) - 1, 0), out=idx)
        mapping = np.where(
            (len(vocab_arr) > 0) & (vocab_arr[idx] == dict_np), idx, -1
        ).astype(np.int64)
        present = np.zeros((n, len(vocab_arr)), dtype=bool)
        vid = mapping[codes]
        ok = vid >= 0
        present[row_ids[ok], vid[ok]] = True
        doc_ids = np.asarray(batch[id_col], dtype=np.int64)
        out_docs, out_qids = [], []
        for qid, ids in compiled:
            hit = present[:, ids].all(axis=1)
            if hit.any():
                out_docs.append(doc_ids[hit])
                out_qids.append(np.full(int(hit.sum()), qid, dtype=np.int64))
        if not out_docs:
            return out_schema.empty_table()
        return pa.table(
            {"doc_id": np.concatenate(out_docs), "query_id": np.concatenate(out_qids)}
        )

    res = ds.map_batches(match, batch_format="pyarrow")
    if not collect:
        return res
    out = res.to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "query_id": pd.Series(dtype=np.int64)})
    return out.sort_values(["doc_id", "query_id"]).reset_index(drop=True)


def percolate_sql(
    table: str,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: a (doc, query) pair matches when the count of the
    query's distinct terms present in the doc equals the query's term count."""
    tok = analyzer.sql_tokenize_expr(text_col)
    rows = []
    for qid, qtext in queries:
        for t in sorted(set(analyzer.tokenize_query(qtext))):
            rows.append(f"({int(qid)}, '" + t.replace("'", "''") + "')")
    if not rows:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS BIGINT) AS query_id WHERE 1=0")
    values = ",\n         ".join(rows)
    return f"""
WITH q(query_id, term) AS (
  VALUES {values}
),
need AS (
  SELECT query_id, count(*) AS n FROM q GROUP BY query_id
),
toks AS (
  SELECT DISTINCT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}
),
m AS (
  SELECT t.doc_id, q.query_id, count(*) AS c
  FROM toks t JOIN q USING (term)
  GROUP BY t.doc_id, q.query_id
)
SELECT m.doc_id, m.query_id
FROM m JOIN need USING (query_id)
WHERE m.c = need.n
ORDER BY m.doc_id, m.query_id
""".strip()
