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


def percolate_qs(
    ds,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect: bool = True,
):
    """Percolation over the FULL simple_query_string clause language
    (shared parse_query_string): a document satisfies a stored query when
    it holds every bare term, every quoted phrase adjacently, at least one
    token per ``prefix*``, and no negated term — the alert-routing shape
    where saved queries are as expressive as live ones.

    Per batch still one ``tokenize_flat``: bare/negated terms go through
    the same membership matrix as ``percolate``; prefixes reduce to a
    dictionary ``startswith`` (per distinct token, not per occurrence);
    phrase adjacency reuses the packed ``(row << 31) | (pos - i)`` key
    intersection of the index's phrase matcher, against the batch's own
    token stream. Returns (doc_id, query_id) pairs."""
    from ..index.extras import parse_query_string

    parsed = []
    vocab: set[str] = set()
    for qid, qtext in queries:
        c = parse_query_string(qtext)
        c["phrase_terms"] = [analyzer.tokenize_query(h) for h in c["phrases"]]
        if not (c["plain"] or c["phrase_terms"] or c["prefixes"]):
            continue  # negation-only / empty: rejected at registration
        parsed.append((int(qid), c))
        vocab.update(c["plain"])
        vocab.update(c["negs"])
    vocab_arr = np.array(sorted(vocab), dtype=object)
    out_schema = pa.schema([("doc_id", pa.int64()), ("query_id", pa.int64())])

    def match(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or not parsed:
            return out_schema.empty_table()
        row_ids, codes, dictionary = analyzer.tokenize_flat(batch[text_col])
        tok_pos = analyzer.token_positions(row_ids)
        dict_np = np.asarray(dictionary.to_pandas(), dtype=object)
        dict_u = dict_np.astype("U")
        code_lookup = {t: i for i, t in enumerate(dict_np)}
        idx = np.searchsorted(vocab_arr, dict_np) if len(vocab_arr) else np.zeros(0, np.int64)
        if len(vocab_arr):
            np.clip(idx, 0, len(vocab_arr) - 1, out=idx)
            mapping = np.where(vocab_arr[idx] == dict_np, idx, -1).astype(np.int64)
        else:
            mapping = np.full(len(dict_np), -1, np.int64)
        present = np.zeros((n, max(len(vocab_arr), 1)), dtype=bool)
        if codes.size and len(vocab_arr):
            vid = mapping[codes]
            ok = vid >= 0
            present[row_ids[ok], vid[ok]] = True
        doc_ids = np.asarray(batch[id_col], dtype=np.int64)

        def rows_with_prefix(pfx: str) -> np.ndarray:
            hit_codes = np.flatnonzero(np.char.startswith(dict_u, pfx))
            if hit_codes.size == 0 or codes.size == 0:
                return np.zeros(n, dtype=bool)
            m = np.isin(codes, hit_codes)
            out = np.zeros(n, dtype=bool)
            out[row_ids[m]] = True
            return out

        def rows_with_phrase(terms: list[str]) -> np.ndarray:
            keys = None
            for i, t in enumerate(terms):
                code = code_lookup.get(t)
                if code is None:
                    return np.zeros(n, dtype=bool)
                at = codes == code
                shifted = tok_pos[at] - i
                okp = shifted >= 0
                kk = (row_ids[at][okp].astype(np.int64) << 31) | shifted[okp]
                kk = np.unique(kk)
                keys = kk if keys is None else np.intersect1d(
                    keys, kk, assume_unique=True
                )
                if keys.size == 0:
                    return np.zeros(n, dtype=bool)
            out = np.zeros(n, dtype=bool)
            out[(keys >> 31).astype(np.int64)] = True
            return out

        out_docs, out_qids = [], []
        for qid, c in parsed:
            hit = np.ones(n, dtype=bool)
            for t in c["plain"]:
                v = int(np.searchsorted(vocab_arr, t))
                hit &= present[:, v]
            for t in c["negs"]:
                v = int(np.searchsorted(vocab_arr, t))
                hit &= ~present[:, v]
            for x in c["prefixes"]:
                if hit.any():
                    hit &= rows_with_prefix(x)
            for terms in c["phrase_terms"]:
                if hit.any():
                    hit &= rows_with_phrase(terms)
            if hit.any():
                out_docs.append(doc_ids[hit])
                out_qids.append(np.full(int(hit.sum()), qid, dtype=np.int64))
        if not out_docs:
            return out_schema.empty_table()
        return pa.table({
            "doc_id": np.concatenate(out_docs),
            "query_id": np.concatenate(out_qids),
        })

    res = ds.map_batches(match, batch_format="pyarrow")
    if not collect:
        return res
    out = res.to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "query_id": pd.Series(dtype=np.int64)})
    return out.sort_values(["doc_id", "query_id"]).reset_index(drop=True)


def percolate_qs_sql(
    table: str,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for percolate_qs: per stored query one candidate expression
    (INTERSECT of clause sets, EXCEPT negations), UNION ALL across the
    registry."""
    from ..index.extras import parse_query_string

    tok = analyzer.sql_tokenize_expr(text_col)
    ql = lambda ts: ", ".join("'" + t.replace("'", "''") + "'" for t in ts)
    legs = []
    for qid, qtext in queries:
        c = parse_query_string(qtext)
        phs = [analyzer.tokenize_query(h) for h in c["phrases"]]
        if not (c["plain"] or phs or c["prefixes"]):
            continue
        parts = []
        if c["plain"]:
            parts.append(
                f"SELECT doc_id FROM toks WHERE term IN ({ql(c['plain'])}) "
                f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(c['plain'])}"
            )
        for h in phs:
            quoted = ["'" + t.replace("'", "''") + "'" for t in h]
            joins = " ".join(
                f"JOIN pos p{j} ON p{j}.doc_id = p0.doc_id AND p{j}.i = p0.i + {j}"
                for j in range(1, len(h))
            )
            preds = " AND ".join(f"p{j}.term = {q}" for j, q in enumerate(quoted))
            parts.append(
                f"SELECT DISTINCT p0.doc_id FROM pos p0 {joins} WHERE {preds}"
            )
        for x in c["prefixes"]:
            esc = x.replace("'", "''")
            parts.append(
                f"SELECT DISTINCT doc_id FROM toks WHERE term LIKE '{esc}%'"
            )
        cand = "\nINTERSECT\n".join(parts)
        if c["negs"]:
            cand += (f"\nEXCEPT\nSELECT DISTINCT doc_id FROM toks "
                     f"WHERE term IN ({ql(c['negs'])})")
        legs.append(
            f"SELECT doc_id, CAST({int(qid)} AS BIGINT) AS query_id FROM "
            f"(\n{cand}\n)"
        )
    if not legs:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS BIGINT) AS query_id WHERE 1=0")
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, unnest({tok}) AS term FROM {table}),
pos AS (
  SELECT {id_col} AS doc_id, unnest({tok}) AS term,
         generate_subscripts({tok}, 1) AS i
  FROM {table}
)
SELECT doc_id, query_id FROM (
{union}
) ORDER BY doc_id, query_id
""".strip()
