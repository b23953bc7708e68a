"""Assistant-refusal detection over conversation corpora (the SFT-data
hygiene filter: Ouyang et al., "Training language models to follow
instructions with human feedback", 2022 — and every public SFT-curation
recipe since — drop or down-weight conversations whose assistant turns are
canned refusals/apologies, since training on them teaches over-refusal).

Lexicon-based: an assistant turn is a refusal when its text contains any
marker phrase (case-insensitive substring — "i cannot", "i'm sorry",
"as an ai", …).  Per conversation this reports assistant-turn and refusal
counts plus the refusal rate; downstream `pipelines/curate` drops by
threshold.  The reference's analog is its validation-state normalizer
family (inactive-state filtering,
`/root/reference/harvester/core/models/datatypes/document.py` clean step);
this is the dialogue-content variant.

Scale shape: one vectorized marker scan per batch (Arrow
``match_substring`` kernels, no per-row Python) emitting map-side partial
counts per conversation, then ONE ``groupby(conv_id)`` fold of int rows —
text never crosses the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_MARKERS = (
    "i cannot",
    "i can't",
    "i am unable",
    "i'm sorry",
    "as an ai",
    "i won't",
)


def refusal_flags(
    ds,
    *,
    role_col: str = "role",
    text_col: str = "text",
    conv_col: str = "conv_id",
    markers: tuple[str, ...] = DEFAULT_MARKERS,
):
    """Per conversation: (conv_id, n_turns, n_assistant, n_refusals,
    refusal_rate) — rate = refusals/assistant-turns quantized to 1e-6 by
    the exact integer half-up rule (0 when a conversation has no assistant
    turns)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        conv = batch[conv_col].combine_chunks()
        role = batch[role_col].combine_chunks()
        low = pc.utf8_lower(pc.fill_null(batch[text_col].combine_chunks(), ""))
        is_asst = pc.equal(role, "assistant")
        hit = pa.array(np.zeros(len(low), bool))
        for m in markers:
            hit = pc.or_(hit, pc.match_substring(low, m))
        refusal = pc.and_(is_asst, hit)
        enc = conv.dictionary_encode()
        codes = np.asarray(enc.indices)
        n = len(enc.dictionary)
        return pa.table(
            {
                "conv_id": enc.dictionary,
                "n_turns": pa.array(np.bincount(codes, minlength=n).astype(np.int64)),
                "n_assistant": pa.array(
                    np.bincount(
                        codes, weights=is_asst.to_numpy(zero_copy_only=False), minlength=n
                    ).astype(np.int64)
                ),
                "n_refusals": pa.array(
                    np.bincount(
                        codes, weights=refusal.to_numpy(zero_copy_only=False), minlength=n
                    ).astype(np.int64)
                ),
            }
        )

    totals = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_assistant", alias_name="n_assistant"),
            Sum("n_refusals", alias_name="n_refusals"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        na = np.asarray(batch["n_assistant"].combine_chunks().cast(pa.int64()))
        nr = np.asarray(batch["n_refusals"].combine_chunks().cast(pa.int64()))
        denom = np.maximum(na, 1)
        rate = np.where(na > 0, ((nr * 2_000_000 + denom) // (2 * denom)) / 1e6, 0.0)
        return pa.table(
            {
                "conv_id": batch["conv_id"].combine_chunks(),
                "n_turns": batch["n_turns"].combine_chunks().cast(pa.int64()),
                "n_assistant": pa.array(na, pa.int64()),
                "n_refusals": pa.array(nr, pa.int64()),
                "refusal_rate": pa.array(rate, pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def refusal_flags_sql(
    source: str,
    *,
    role_col: str = "role",
    text_col: str = "text",
    conv_col: str = "conv_id",
    markers: tuple[str, ...] = DEFAULT_MARKERS,
) -> str:
    """Oracle: identical marker semantics by per-turn substring tests."""
    m_expr = " OR ".join(
        "contains(lower({t}), '{m}')".format(t=text_col, m=m.replace("'", "''"))
        for m in markers
    )
    return f"""
WITH rft AS (
  SELECT {conv_col} AS conv_id,
         CAST({role_col} = 'assistant' AS BIGINT) AS is_asst,
         CAST(({role_col} = 'assistant' AND ({m_expr})) AS BIGINT) AS is_refusal
  FROM {source}
),
rfa AS (
  SELECT conv_id,
         count(*) AS n_turns,
         CAST(sum(is_asst) AS BIGINT) AS n_assistant,
         CAST(sum(is_refusal) AS BIGINT) AS n_refusals
  FROM rft GROUP BY conv_id
)
SELECT conv_id, n_turns, n_assistant, n_refusals,
       CASE WHEN n_assistant = 0 THEN 0.0
            ELSE ((n_refusals * 2000000 + n_assistant) // (2 * n_assistant)) / 1000000.0
       END AS refusal_rate
FROM rfa
ORDER BY conv_id
""".strip()
