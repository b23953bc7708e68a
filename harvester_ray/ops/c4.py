"""C4 line-level cleaning rules (Raffel et al., "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020 §2.2).

The standard web-corpus cleaning pass every large-scale training-data
pipeline runs before dedup/quality scoring.  Per LINE: keep only lines that
end in a terminal punctuation mark (. ! ? "), contain at least
``min_words`` words, and do not mention "javascript".  Per PAGE: drop the
page when fewer than ``min_kept_lines`` lines survive (the paper's
"fewer than 5 sentences" gate), when it contains the phrase "lorem ipsum",
a curly brace, or any word from a supplied bad-word list.  The reference's
analog is its HTML-strip + validation normalizers
(`/root/reference/harvester/core/models/datatypes/document.py` clean step
and the edu-level state filter family); this is the line-granularity web
variant those pipelines assume has already run upstream.

Scale shape: a pure per-batch map — no shuffle, no state.  Line splitting,
punctuation/word-count/substring tests and the per-page fold all run as
Arrow kernels (`pc.split_pattern`, `pc.match_substring_regex`,
`pc.count_substring_regex`, `pc.binary_join`) plus `np.bincount` over
parent indices; the only per-row Python is none.  At 100 TB this stage is
embarrassingly parallel and reads exactly two columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BAD_WORDS = ("unsafeword",)


def c4_clean(
    ds,
    *,
    id_col: str = "page_id",
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 5,
    bad_words: tuple[str, ...] = DEFAULT_BAD_WORDS,
):
    """Per-page (page_id, n_lines, n_kept, lorem, brace, badword,
    page_kept, kept_text): line filter + page gate in one vectorized map.

    ``kept_text`` is the surviving lines newline-joined ('' when none
    survive) — emitted for every page so the gate checks the exact
    retained text, not just counts.  Flags are int64 0/1.
    """

    def clean(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        n = len(text)
        lines_list = pc.split_pattern(text, "\n")
        lines = pc.list_flatten(lines_list)
        counts = pc.list_value_length(lines_list).to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n), counts)

        ends = pc.match_substring_regex(lines, '[.!?"]$')
        enough = pc.greater_equal(
            pc.count_substring_regex(lines, r"\S+"), pa.scalar(min_words)
        )
        js = pc.match_substring(lines, "javascript", ignore_case=True)
        kept = pc.and_(pc.and_(ends, enough), pc.invert(js))
        kept_np = kept.to_numpy(zero_copy_only=False)

        n_kept = np.bincount(parent[kept_np], minlength=n).astype(np.int64)
        kept_lines = lines.filter(kept)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(n_kept, out=offsets[1:])
        kept_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_lines), "\n"
        )

        lorem = pc.match_substring(text, "lorem ipsum", ignore_case=True)
        brace = pc.or_(pc.match_substring(text, "{"), pc.match_substring(text, "}"))
        low = pc.utf8_lower(text)
        bad = pa.array(np.zeros(n, bool))
        for w in bad_words:
            bad = pc.or_(bad, pc.match_substring(low, w))
        lorem_np = lorem.to_numpy(zero_copy_only=False)
        brace_np = brace.to_numpy(zero_copy_only=False)
        bad_np = bad.to_numpy(zero_copy_only=False)
        page_kept = (n_kept >= min_kept_lines) & ~lorem_np & ~brace_np & ~bad_np
        return pa.table(
            {
                "page_id": ids,
                "n_lines": pa.array(counts, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "lorem": pa.array(lorem_np.astype(np.int64), pa.int64()),
                "brace": pa.array(brace_np.astype(np.int64), pa.int64()),
                "badword": pa.array(bad_np.astype(np.int64), pa.int64()),
                "page_kept": pa.array(page_kept.astype(np.int64), pa.int64()),
                "kept_text": kept_text,
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def c4_clean_sql(
    source: str,
    *,
    id_col: str = "page_id",
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 5,
    bad_words: tuple[str, ...] = DEFAULT_BAD_WORDS,
) -> str:
    """Oracle: identical rules by per-line string tests.  ``source`` is a
    table name or `read_parquet('...')` expression."""
    bad_expr = " OR ".join(
        f"contains(lower(text), '{w}')" for w in bad_words
    ) or "FALSE"
    return f"""
WITH pages AS (SELECT {id_col} AS page_id, {text_col} AS text FROM {source}),
ln AS (
  SELECT page_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS ln_idx
  FROM pages
),
lf AS (
  SELECT page_id, line, ln_idx,
         (regexp_matches(line, '[.!?"]$')
          AND length(regexp_extract_all(line, '\\S+')) >= {min_words}
          AND NOT contains(lower(line), 'javascript')) AS kept
  FROM ln
),
agg AS (
  SELECT page_id,
         count(*) AS n_lines,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         coalesce(string_agg(line, chr(10) ORDER BY ln_idx) FILTER (WHERE kept), '') AS kept_text
  FROM lf GROUP BY page_id
),
pf AS (
  SELECT page_id,
         CAST(contains(lower(text), 'lorem ipsum') AS BIGINT) AS lorem,
         CAST((contains(text, '{{') OR contains(text, '}}')) AS BIGINT) AS brace,
         CAST(({bad_expr}) AS BIGINT) AS badword
  FROM pages
)
SELECT a.page_id, a.n_lines, a.n_kept, p.lorem, p.brace, p.badword,
       CAST((a.n_kept >= {min_kept_lines} AND p.lorem = 0 AND p.brace = 0 AND p.badword = 0) AS BIGINT) AS page_kept,
       a.kept_text
FROM agg a JOIN pf p USING (page_id)
ORDER BY a.page_id
""".strip()
