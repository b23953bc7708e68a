"""Query-time synonym expansion + dictionary-driven decompounding.

The reference's only in-repo analysis asset is the Dutch decompound word
list (53,175 entries, `/root/reference/opensearch/config/
decompound_word_list.nl.txt`) wired into the OpenSearch analyzer via
`/root/reference/harvester/harvester/settings/base.py:308-309` — compound
words are split against a dictionary so "fietspad" matches "fiets" and
"pad". This module re-expresses that (plus the synonym-filter sibling) as
*query-time* expansion over our own index:

- ``decompound``: DP segmentation of an out-of-vocabulary query term into
  dictionary words (membership = df > 0 in the index's term stats — the
  live analog of the static word list). Deterministic: fewest parts wins,
  ties by leftmost-longest.
- ``expand_query``: per-term union of the original term, its synonyms
  (small broadcast map), and its compound parts.
- ``search_expanded``: expansion → OR-mode BM25 over the expanded term set
  (Lucene synonym/decompound filters put alternatives at the same
  position; with ``default_operator`` semantics preserved for original
  terms that exist, the OR expansion is the query-side equivalent).

Scale shape: expansion is driver-side string work on a handful of query
terms (df probes batch through the same TermStats lookup the query path
uses); nothing touches the corpus.
"""

from __future__ import annotations

from .. import analyzer


def decompound(
    df_lookup,
    term: str,
    *,
    min_part: int = 3,
    max_parts: int = 4,
) -> list[str]:
    """Split ``term`` into ≥2 dictionary words, or return [].

    ``df_lookup(terms) -> dict[term, df]`` is the dictionary membership
    oracle (an ``IndexReader.df`` bound method). DP over split points;
    among valid segmentations the fewest parts wins, ties broken by
    preferring the longest first part (leftmost-longest, the conventional
    decompounder behavior).
    """
    n = len(term)
    if n < 2 * min_part:
        return []
    subs = sorted(
        {term[i:j] for i in range(n) for j in range(i + min_part, n + 1)}
    )
    dfs = df_lookup(subs)
    present = {s for s in subs if dfs.get(s, 0) > 0}
    if not present:
        return []
    # best[i] = (n_parts, parts tuple) for term[i:]; prefer fewer parts,
    # then lexicographically smaller (-len first part) via longest-first scan
    INF = max_parts + 1
    best: list[tuple[int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[n] = (0, ())
    for i in range(n - min_part, -1, -1):
        for j in range(n, i + min_part - 1, -1):  # longest candidate first
            if i == 0 and j == n:
                continue  # the whole term is not a "part" of itself
            part = term[i:j]
            if part not in present or best[j] is None:
                continue
            cand_parts = best[j][0] + 1
            if cand_parts > max_parts:
                continue
            if best[i] is None or cand_parts < best[i][0]:
                best[i] = (cand_parts, (part,) + best[j][1])
    if best[0] is None or best[0][0] < 2:
        return []
    return list(best[0][1])


def expand_query(
    df_lookup,
    query_text: str,
    *,
    synonyms: dict[str, list[str]] | None = None,
    decompound_oov: bool = True,
) -> list[str]:
    """Expanded, ordered, distinct term list for a query.

    Synonyms apply to every term; decompounding applies only to
    out-of-vocabulary terms (df == 0) — in-vocab compounds already match
    directly, mirroring the analyzer's only_longest_match-style restraint.
    """
    synonyms = synonyms or {}
    terms = sorted(set(analyzer.tokenize_query(query_text)))
    dfs = df_lookup(terms) if terms else {}
    out: list[str] = []
    seen: set[str] = set()

    def add(t: str) -> None:
        if t not in seen:
            seen.add(t)
            out.append(t)

    for t in terms:
        add(t)
        for s in synonyms.get(t, []):
            add(s)
        if decompound_oov and dfs.get(t, 0) == 0:
            for p in decompound(df_lookup, t):
                add(p)
    return out


def search_expanded(
    reader,
    query_text: str,
    *,
    synonyms: dict[str, list[str]] | None = None,
    k: int = 10,
):
    """Synonym/decompound-expanded BM25 search (OR over the expanded set)."""
    expanded = expand_query(reader.df, query_text, synonyms=synonyms)
    if not expanded:
        from .query import _empty_result

        return _empty_result()
    return reader.search(" ".join(expanded), k=k, mode="or")
