"""Transcript-table analytics: conversation-level operators over the
``(conv_id, turn_idx, role, text, tool, ts)`` transcript shape (the
north-rule input), each with a DuckDB oracle over the same Parquet.

The reference models a harvested record as a document with per-phase
derived metadata (harvester/core/models/datatypes/document.py:58-108);
for conversational transcripts the analogous derivations are per-
conversation: flattening turns into one training text, role/tool usage
profiles, turn-order transitions, last-K context windows. Everything here
follows the repo's two shuffle shapes:

- **order-free aggregations** (conv_stats, role_stats, tool_usage) are
  per-batch Arrow ``group_by`` partials folded on the driver — one
  streaming pass, no all-to-all; driver fold is bounded by the group
  cardinality (conversations / roles / tools), with the same hierarchical
  range-sharding extension corpus.assign_doc_ids documents for >10^7
  conversations.
- **order-dependent per-conversation ops** (conv_flatten, conv_tail,
  role_transitions) hash-bucket conversations into ``n_buckets`` groups
  and process each bucket as one vectorized Arrow table (sort by
  (conv_id, turn_idx) inside the bucket, run-length boundaries across
  conversations) — per-group Python overhead is paid per *bucket*, not
  per conversation, and a conversation never splits across buckets.

Float outputs follow the repo parity rule: derive every ratio from an
integer pair and quantize with floor(x*1e6+0.5)/1e6 on BOTH sides (never
``round``, whose half-rule differs between numpy and DuckDB).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import analyzer

__all__ = [
    "conv_flatten", "conv_flatten_sorted", "turn_overlap_sorted",
    "conv_stats", "role_stats", "tool_usage",
    "conv_tail", "role_transitions",
    "conv_flatten_sql", "conv_stats_sql", "role_stats_sql",
    "tool_usage_sql", "conv_tail_sql", "role_transitions_sql",
    "transcript_view_sql",
]


def _q6(x: np.ndarray | float):
    """floor(x*1e6+0.5)/1e6 — the only rounding rule both numpy and DuckDB
    agree on bit-for-bit (see CLAUDE.md parity traps)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


_Q6_SQL = "floor(({}) * 1e6 + 0.5) / 1e6"


def transcript_view_sql(parquet_glob: str) -> str:
    """FROM-able source for the transcript oracle SQL."""
    return f"read_parquet('{parquet_glob}')"


# ---------------------------------------------------------------------------
# bucketed per-conversation processing (order-dependent ops)
# ---------------------------------------------------------------------------

def _with_conv_bucket(ds, n_buckets: int):
    """Add ``bucket = crc32(conv_id) % n_buckets``. Hashing is per batch-
    local dictionary (unique conv ids), not per row — a 10^4-row batch of
    10-turn conversations hashes ~10^3 strings."""

    def add(t: pa.Table) -> pa.Table:
        enc = t["conv_id"].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        h = np.fromiter(
            (zlib.crc32(u.encode()) % n_buckets for u in uniq),
            dtype=np.int32, count=len(uniq),
        )
        codes = np.asarray(enc.indices)
        return t.append_column("bucket", pa.array(h[codes], pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _conv_offsets(tbl: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """Sort one bucket by (conv_id, turn_idx); return run offsets where the
    conversation changes (offsets[i]..offsets[i+1] = conversation i)."""
    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = tbl["conv_id"].combine_chunks()
    n = len(conv)
    if n == 0:
        return tbl, np.zeros(1, np.int64)
    neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
    starts = np.flatnonzero(np.asarray(neq.fill_null(True))) + 1
    offsets = np.concatenate(([0], starts, [n])).astype(np.int64)
    return tbl, offsets


def _flatten_conversations(tbl: pa.Table) -> pa.Table:
    """Flatten one table of whole conversations (any order) into one row
    per conversation: (conv_id, n_turns, n_chars, conv_md5)."""
    tbl, off = _conv_offsets(tbl)
    if tbl.num_rows == 0:
        return pa.table({
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "conv_md5": pa.array([], pa.string()),
        })
    line = pc.binary_join_element_wise(
        tbl["role"].combine_chunks(), tbl["text"].combine_chunks(), ": "
    )
    lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), line)
    flat = pc.binary_join(lists, "\n")
    md5 = [hashlib.md5(s.encode()).hexdigest() for s in flat.to_pylist()]
    conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
    return pa.table({
        "conv_id": conv,
        "n_turns": pa.array(np.diff(off), pa.int64()),
        "n_chars": pc.utf8_length(flat).cast(pa.int64()),
        "conv_md5": pa.array(md5, pa.string()),
    })


def conv_flatten(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Per conversation: flatten turns (sorted by turn_idx) into one
    ``role: text`` newline-joined training document; emit its length and
    md5 (the assembled text itself stays inside the tasks — only one
    bounded row per conversation reaches the driver)."""
    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(_flatten_conversations, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("conv_id").reset_index(drop=True)


def _process_sorted_conversations(files, fn, columns: list[str]) -> pa.Table:
    """Generic zero-shuffle driver for CONVERSATION-SORTED corpora: apply
    ``fn`` (a whole-conversations-table → one-row-per-conversation reducer,
    exactly the callables the bucketed ops hand to map_groups) per file on
    the file's interior conversations via one Ray task each, then repair
    the boundary conversations (first/last of each file — the only ones
    that can straddle adjacent files) in one bounded driver-local pass."""
    import ray

    @ray.remote
    def run(f: str):
        tbl = pq.read_table(f, columns=columns)
        if tbl.num_rows == 0:
            return fn(tbl), tbl
        conv = tbl["conv_id"]
        first, last = conv[0].as_py(), conv[-1].as_py()
        edge = pc.or_(pc.equal(conv, first), pc.equal(conv, last))
        return fn(tbl.filter(pc.invert(edge))), tbl.filter(edge)

    parts = ray.get([run.remote(f) for f in sorted(files)])
    interiors = [p[0] for p in parts]
    boundary = pa.concat_tables([p[1] for p in parts])
    return pa.concat_tables(interiors + [fn(boundary)])


def conv_flatten_sorted(files: list[str]) -> pd.DataFrame:
    """Shuffle-free conv_flatten for CONVERSATION-SORTED corpora — the
    standard layout this repo's own writers produce (synth shards, export
    partitions): conversations are contiguous in the global file order, so
    a conversation can straddle only a RUN of adjacent files.

    The bucketed conv_flatten pays one all-to-all to co-locate
    conversations (measured ~10s of an ~11s sf0.1 run); sorted inputs make
    that exchange pure waste. Here ONE Ray task per file flattens the
    file's INTERIOR conversations locally and returns the (bounded)
    boundary rows — the first and last conversation of the file, the only
    ones that may continue in a neighbor — and the driver repairs those in
    one local pass (≤ 2 small conversations per file; a conversation
    spanning a whole middle file arrives as that file's entire boundary).
    Result is value-identical to conv_flatten; asserted in tests on shards
    that split mid-conversation."""
    out = _process_sorted_conversations(
        files, _flatten_conversations, ["conv_id", "turn_idx", "role", "text"]
    ).to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


def conv_flatten_sql(src: str) -> str:
    return f"""
WITH flat AS (
  SELECT conv_id, count(*) AS n_turns,
         string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS flat
  FROM {src} GROUP BY conv_id
)
SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns,
       CAST(length(flat) AS BIGINT) AS n_chars, md5(flat) AS conv_md5
FROM flat ORDER BY conv_id
""".strip()


def sft_examples(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Supervised-fine-tuning example assembly: one training example per
    ASSISTANT turn — prompt = every prior turn flattened ``role: text`` and
    newline-joined, completion = that turn's text. The canonical
    transcript→SFT emission (each assistant reply supervised on its full
    left context).

    Assembled prompt text never leaves the tasks: each example row carries
    (prompt_chars, prompt_md5, completion_chars, completion_md5) only.
    Prefix assembly is sequential per conversation by nature; the Python
    cost is O(total prompt chars) per bucket, paid inside the bucketed
    map_groups like every order-dependent op here. Assistant turns at
    turn_idx 0 have no context and are skipped (parity: SQL's window frame
    yields NULL there)."""

    def emit(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int64()),
            "prompt_chars": pa.array([], pa.int64()),
            "prompt_md5": pa.array([], pa.string()),
            "completion_chars": pa.array([], pa.int64()),
            "completion_md5": pa.array([], pa.string()),
        })
        if tbl.num_rows == 0:
            return empty
        lines = pc.binary_join_element_wise(
            tbl["role"].combine_chunks(), tbl["text"].combine_chunks(), ": "
        ).to_pylist()
        roles = tbl["role"].combine_chunks().to_pylist()
        texts = tbl["text"].combine_chunks().to_pylist()
        convs = tbl["conv_id"].combine_chunks().to_pylist()
        tidx = np.asarray(tbl["turn_idx"].combine_chunks())
        rows_c, rows_t, rows_pc_, rows_pm, rows_cc, rows_cm = [], [], [], [], [], []
        for s, e in zip(off[:-1], off[1:]):
            prompt = ""
            for i in range(s, e):
                if roles[i] == "assistant" and prompt:
                    rows_c.append(convs[i])
                    rows_t.append(int(tidx[i]))
                    rows_pc_.append(len(prompt))
                    rows_pm.append(hashlib.md5(prompt.encode()).hexdigest())
                    rows_cc.append(len(texts[i]))
                    rows_cm.append(hashlib.md5(texts[i].encode()).hexdigest())
                prompt = prompt + ("\n" if prompt else "") + lines[i]
        if not rows_c:
            return empty
        return pa.table({
            "conv_id": pa.array(rows_c, pa.string()),
            "turn_idx": pa.array(rows_t, pa.int64()),
            "prompt_chars": pa.array(rows_pc_, pa.int64()),
            "prompt_md5": pa.array(rows_pm, pa.string()),
            "completion_chars": pa.array(rows_cc, pa.int64()),
            "completion_md5": pa.array(rows_cm, pa.string()),
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def sft_examples_sql(src: str) -> str:
    return f"""
WITH pre AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prompt
  FROM {src}
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(length(prompt) AS BIGINT) AS prompt_chars, md5(prompt) AS prompt_md5,
       CAST(length(text) AS BIGINT) AS completion_chars, md5(text) AS completion_md5
FROM pre
WHERE role = 'assistant' AND prompt IS NOT NULL
ORDER BY conv_id, turn_idx
""".strip()


def conv_tail(ds, *, k: int = 3, n_buckets: int = 64) -> pd.DataFrame:
    """Last ``k`` turns of every conversation (context-window truncation:
    keep the most recent turns, the shape used to cap prompt length when
    assembling training examples)."""

    def tail(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text_md5": pa.array([], pa.string()),
            })
        lens = np.diff(off)
        take = np.minimum(lens, k)
        # indices of each conversation's last `take` rows, vectorized
        reps = np.repeat(off[1:] - take, take)
        local = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(take) - take, take
        )
        idx = pa.array(reps + local, pa.int64())
        sub = tbl.take(idx)
        md5 = [hashlib.md5(s.encode()).hexdigest() for s in sub["text"].to_pylist()]
        return pa.table({
            "conv_id": sub["conv_id"].combine_chunks(),
            "turn_idx": sub["turn_idx"].combine_chunks(),
            "role": sub["role"].combine_chunks(),
            "text_md5": pa.array(md5, pa.string()),
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(tail, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def conv_tail_sql(src: str, *, k: int = 3) -> str:
    return f"""
SELECT conv_id, turn_idx, role, md5(text) AS text_md5 FROM (
  SELECT conv_id, turn_idx, role, text,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) AS rn
  FROM {src}
) WHERE rn <= {k}
ORDER BY conv_id, turn_idx
""".strip()


def conv_head_tail(ds, *, h: int = 2, t: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Middle truncation: keep each conversation's first ``h`` and last
    ``t`` turns and count what was dropped — the keep-the-system-prompt-
    and-the-recent-context shape (``conv_tail``'s sibling for prompts
    whose head carries instructions that must survive). A position in
    both windows counts as head. Same bucketed per-conversation pass as
    conv_tail. Returns ``(conv_id, turn_idx, role, segment, n_dropped)``
    for kept turns, sorted by (conv_id, turn_idx)."""

    def headtail(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "segment": pa.array([], pa.string()),
                "n_dropped": pa.array([], pa.int64()),
            })
        lens = np.diff(off)
        n_rows = tbl.num_rows
        conv_of = np.repeat(np.arange(lens.size), lens)
        pos = np.arange(n_rows, dtype=np.int64) - off[:-1][conv_of]
        ln = lens[conv_of]
        is_head = pos < h
        is_tail = pos >= ln - t
        keep = is_head | is_tail
        seg = np.where(is_head, "head", "tail")
        dropped = np.maximum(lens - h - t, 0)[conv_of]
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        sub = tbl.take(idx)
        return pa.table({
            "conv_id": sub["conv_id"].combine_chunks(),
            "turn_idx": sub["turn_idx"].combine_chunks(),
            "role": sub["role"].combine_chunks(),
            "segment": pa.array(seg[keep], pa.string()),
            "n_dropped": pa.array(dropped[keep], pa.int64()),
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(headtail, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({
            "conv_id": pd.Series([], dtype=str), "turn_idx": pd.Series([], dtype=np.int32),
            "role": pd.Series([], dtype=str), "segment": pd.Series([], dtype=str),
            "n_dropped": pd.Series([], dtype=np.int64),
        })
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def conv_head_tail_sql(src: str, *, h: int = 2, t: int = 2) -> str:
    return f"""
SELECT conv_id, turn_idx, role,
       CASE WHEN pos <= {h} THEN 'head' ELSE 'tail' END AS segment,
       CAST(greatest(n - {h} - {t}, 0) AS BIGINT) AS n_dropped
FROM (
  SELECT conv_id, turn_idx, role,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pos,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM {src}
) WHERE pos <= {h} OR pos > n - {t}
ORDER BY conv_id, turn_idx
""".strip()


def conv_fit_context(ds, *, budget: int = 48, n_buckets: int = 64) -> pd.DataFrame:
    """Token-budget context fitting: each conversation's maximal SUFFIX of
    turns whose total token count stays within ``budget`` — the
    budget-aware sibling of ``conv_tail`` (count-based) and the rule prompt
    assembly actually needs when turns vary in length. Token counts use the
    shared analyzer, so the engine and oracle count identically.

    The keep-set is provably a suffix (suffix sums are non-increasing in
    turn order), so the whole op is one vectorized pass per bucket: token
    counts → global cumsum → per-conversation suffix sums → mask. A
    conversation whose last turn alone busts the budget contributes no
    rows (both sides)."""

    def fit(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "role": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            })
        ntok = analyzer.doc_token_counts(tbl["text"])
        cs = np.cumsum(ntok)
        lens = np.diff(off)
        end_cs = np.repeat(cs[off[1:] - 1], lens)
        suffix = end_cs - (cs - ntok)
        keep = suffix <= budget
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        sub = tbl.take(idx)
        return pa.table({
            "conv_id": sub["conv_id"].combine_chunks(),
            "turn_idx": sub["turn_idx"].combine_chunks().cast(pa.int64()),
            "role": sub["role"].combine_chunks(),
            "n_tokens": pa.array(ntok[keep], pa.int64()),
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(fit, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def conv_fit_context_sql(src: str, *, budget: int = 48) -> str:
    tok = analyzer.sql_tokenize_expr("text")
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, len({tok}) AS n_tokens FROM {src}
),
s AS (
  SELECT *, sum(n_tokens) OVER (
    PARTITION BY conv_id ORDER BY turn_idx DESC ROWS UNBOUNDED PRECEDING
  ) AS sfx FROM t
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM s WHERE sfx <= {budget}
ORDER BY conv_id, turn_idx
""".strip()


def merge_consecutive_turns(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Role-alternation repair: collapse each run of consecutive same-role
    turns into one merged turn (texts newline-joined in turn order) — the
    normalization chat-template training needs before strict user/assistant
    alternation can be assumed. Emits one row per run: (conv_id, run_idx,
    role, n_merged, n_chars, text_md5); merged text stays inside the tasks.

    Vectorized per bucket: one (conv, role)-change boundary diff defines
    the runs, one Arrow list-gather + binary_join builds every merged text,
    run_idx is an arange minus per-conversation offsets."""

    def merge(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "run_idx": pa.array([], pa.int64()),
                "role": pa.array([], pa.string()),
                "n_merged": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "text_md5": pa.array([], pa.string()),
            })
        n = tbl.num_rows
        roles = np.asarray(tbl["role"].combine_chunks().to_pylist(), dtype=object)
        change = np.zeros(n, dtype=bool)
        change[off[:-1]] = True  # conversation starts
        change[1:] |= roles[1:] != roles[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        text = tbl["text"].combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(np.append(starts, n), pa.int32()), text
        )
        joined = pc.binary_join(lists, "\n")
        md5 = [hashlib.md5(s.encode()).hexdigest() for s in joined.to_pylist()]
        run_conv = tbl["conv_id"].combine_chunks().take(pa.array(starts, pa.int64()))
        # run_idx: position of the run within its conversation
        conv_first_run = np.searchsorted(starts, off[:-1])
        n_runs_per_conv = np.diff(np.append(conv_first_run, starts.size))
        run_idx = np.arange(starts.size, dtype=np.int64) - np.repeat(
            conv_first_run, n_runs_per_conv
        )
        return pa.table({
            "conv_id": run_conv,
            "run_idx": pa.array(run_idx, pa.int64()),
            "role": pa.array(roles[starts], pa.string()),
            "n_merged": pa.array(ends - starts, pa.int64()),
            "n_chars": pc.utf8_length(joined).cast(pa.int64()),
            "text_md5": pa.array(md5, pa.string()),
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["conv_id", "run_idx"]).reset_index(drop=True)


def merge_consecutive_turns_sql(src: str) -> str:
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
         row_number() OVER (PARTITION BY conv_id, role ORDER BY turn_idx) AS rr
  FROM {src}
),
g AS (
  SELECT conv_id, role, rn - rr AS grp, min(rn) AS first_rn,
         count(*) AS n_merged,
         string_agg(text, chr(10) ORDER BY turn_idx) AS joined
  FROM t GROUP BY conv_id, role, rn - rr
)
SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY first_rn) - 1
            AS BIGINT) AS run_idx,
       role, CAST(n_merged AS BIGINT) AS n_merged,
       CAST(length(joined) AS BIGINT) AS n_chars, md5(joined) AS text_md5
FROM g ORDER BY conv_id, run_idx
""".strip()


def role_transitions(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """(prev_role → role) turn-taking transition counts within
    conversations (who speaks after whom — the conversational analog of
    the events-table ``event_transitions``). Partial counts per bucket,
    16-cell fold on the driver."""

    def pairs(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        n = tbl.num_rows
        if n == 0:
            return pa.table({
                "prev_role": pa.array([], pa.string()),
                "role": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        enc = tbl["role"].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        nd = len(enc.dictionary)
        valid = np.ones(n, bool)
        valid[off[:-1]] = False  # first turn of each conversation has no prev
        key = codes[np.flatnonzero(valid) - 1] * nd + codes[valid]
        cnt = np.bincount(key, minlength=nd * nd)
        nz = np.flatnonzero(cnt)
        roles = enc.dictionary.to_pylist()
        return pa.table({
            "prev_role": pa.array([roles[k // nd] for k in nz], pa.string()),
            "role": pa.array([roles[k % nd] for k in nz], pa.string()),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:  # Dataset.to_pandas() on an empty result has NO columns
        return pd.DataFrame({"prev_role": pd.Series([], dtype=str),
                             "role": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["prev_role", "role"], sort=True, as_index=False)["n"].sum()
    return out.reset_index(drop=True)


def markov_entropy_rate(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Empirical entropy rate of the role turn-taking chain — how
    predictable is who speaks next? H = Σᵢⱼ (nᵢⱼ/N)·ln(nᵢ/nᵢⱼ) over the
    ``role_transitions`` count matrix (the MLE of the Markov chain's
    conditional entropy, in nats): a scripted user→assistant ping-pong
    scores near 0; free-for-all turn taking approaches ln(|roles|). Also
    emits each source role's conditional entropy H(next | prev=r). Counts
    come from the same 16-cell transition fold; every entropy term
    nano-quantizes through one mirrored float expression before the sums
    (the unigram_logprob rule). Returns per-role rows plus an ``__all__``
    total: ``(prev_role, n_out, h_cond)`` sorted with the total last."""
    import math

    tm = role_transitions(ds, n_buckets=n_buckets)
    cols = ["prev_role", "n_out", "h_cond"]
    if tm.empty:
        return pd.DataFrame(columns=cols)
    big_n = int(tm["n"].sum())
    rows = []
    total_fp = 0
    for prev, g in tm.groupby("prev_role", sort=True):
        n_i = int(g["n"].sum())
        h_fp = sum(
            int(math.floor((float(nij) / n_i) * math.log(float(n_i) / nij) * 1e9 + 0.5))
            for nij in g["n"]
        )
        rows.append((prev, n_i, h_fp / 1e9))
        total_fp += sum(
            int(math.floor((float(nij) / big_n) * math.log(float(n_i) / nij) * 1e9 + 0.5))
            for nij in g["n"]
        )
    rows.append(("__all__", big_n, total_fp / 1e9))
    out = pd.DataFrame(rows, columns=cols)
    out["n_out"] = out["n_out"].astype(np.int64)
    return out


def markov_entropy_rate_sql(src: str) -> str:
    return f"""
WITH lagd AS (
  SELECT role, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM {src}
),
tm AS (
  SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n
  FROM lagd WHERE prev_role IS NOT NULL GROUP BY prev_role, role
),
pr AS (SELECT prev_role, CAST(sum(n) AS BIGINT) AS n_i FROM tm GROUP BY prev_role),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM tm),
cond AS (
  SELECT t.prev_role, p.n_i AS n_out,
         CAST(sum(CAST(floor(
           (CAST(t.n AS DOUBLE) / p.n_i) * ln(CAST(p.n_i AS DOUBLE) / t.n) * 1e9 + 0.5
         ) AS BIGINT)) AS DOUBLE) / 1e9 AS h_cond
  FROM tm t JOIN pr p USING (prev_role)
  GROUP BY t.prev_role, p.n_i
),
rate AS (
  SELECT '__all__' AS prev_role, x.big_n AS n_out,
         CAST(sum(CAST(floor(
           (CAST(t.n AS DOUBLE) / x.big_n) * ln(CAST(p.n_i AS DOUBLE) / t.n) * 1e9 + 0.5
         ) AS BIGINT)) AS DOUBLE) / 1e9 AS h_cond
  FROM tm t JOIN pr p USING (prev_role) CROSS JOIN tot x
  GROUP BY x.big_n
)
SELECT prev_role, n_out, h_cond FROM (
  SELECT *, 0 AS ord FROM cond
  UNION ALL SELECT *, 1 AS ord FROM rate
) ORDER BY ord, prev_role
""".strip()


def tool_chains(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """(prev_tool → tool) transition counts over the tool-role turns of each
    conversation in turn order (which tool gets called after which — the
    agent-workflow analog of event_transitions). Non-tool turns between two
    calls don't break the chain."""

    def pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "prev_tool": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        n = tbl.num_rows
        if n == 0:
            return empty
        is_tool = np.asarray(pc.equal(tbl["role"].combine_chunks(), "tool"))
        sel = np.flatnonzero(is_tool)
        if sel.size < 2:
            return empty
        conv_idx = np.searchsorted(off, sel, side="right") - 1
        enc = tbl["tool"].combine_chunks().take(pa.array(sel, pa.int64())).dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        same_conv = conv_idx[1:] == conv_idx[:-1]
        nd = len(enc.dictionary)
        key = codes[:-1][same_conv] * nd + codes[1:][same_conv]
        if key.size == 0:
            return empty
        cnt = np.bincount(key, minlength=nd * nd)
        nz = np.flatnonzero(cnt)
        tools = enc.dictionary.to_pylist()
        return pa.table({
            "prev_tool": pa.array([tools[k // nd] for k in nz], pa.string()),
            "tool": pa.array([tools[k % nd] for k in nz], pa.string()),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"prev_tool": pd.Series([], dtype=str),
                             "tool": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["prev_tool", "tool"], sort=True, as_index=False)["n"].sum()
    return out.reset_index(drop=True)


def tool_chains_sql(src: str) -> str:
    return f"""
WITH calls AS (
  SELECT conv_id, turn_idx, tool FROM {src} WHERE role = 'tool'
),
lagd AS (
  SELECT tool, lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
  FROM calls
)
SELECT prev_tool, tool, count(*) AS n
FROM lagd WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool ORDER BY prev_tool, tool
""".strip()


def role_transitions_sql(src: str) -> str:
    return f"""
WITH lagd AS (
  SELECT role, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM {src}
)
SELECT prev_role, role, count(*) AS n
FROM lagd WHERE prev_role IS NOT NULL
GROUP BY prev_role, role ORDER BY prev_role, role
""".strip()


def flatten_text_ds(ds, conv_sorted: np.ndarray, *, n_buckets: int = 64):
    """Conversation-granularity corpus: one ``(doc_id, text)`` row per
    conversation, text = the role-prefixed newline join of its turns, and
    ``doc_id`` = the conversation's rank in sorted conv_id order
    (``conv_sorted`` — from :func:`harvester_ray.corpus.conv_counts_from_files`
    or any per-conversation count pass; broadcast once, searchsorted per
    bucket). Returns a streaming Dataset feeding an index build — the
    flattened text never reaches the driver."""
    import ray

    ref = ray.put(np.asarray(conv_sorted, dtype=np.str_))
    cache: dict[str, np.ndarray] = {}

    def flatten(tbl: pa.Table) -> pa.Table:
        if "c" not in cache:
            cache["c"] = ray.get(ref)
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            })
        line = pc.binary_join_element_wise(
            tbl["role"].combine_chunks(), tbl["text"].combine_chunks(), ": "
        )
        lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), line)
        flat = pc.binary_join(lists, "\n")
        convs = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64())).to_pandas(),
            dtype=np.str_,
        )
        doc_id = np.searchsorted(cache["c"], convs)
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": flat,
        })

    return (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(flatten, batch_format="pyarrow")
    )


def conv_doc_sql_head(glob: str) -> str:
    """CTE chain mirroring :func:`flatten_text_ds` — conversation docs with
    rank-in-sorted-order ids — for splicing under a BM25 oracle."""
    return (
        f"WITH tsrc AS (SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')), "
        "cflat AS (SELECT conv_id, string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS text "
        "FROM tsrc GROUP BY conv_id), "
        "cdoc AS (SELECT CAST(row_number() OVER (ORDER BY conv_id) - 1 AS BIGINT) AS doc_id, text FROM cflat)"
    )


def conv_windows(ds, *, k: int = 4, stride: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Sliding turn-windows per conversation (training-example assembly:
    window ``w`` covers turns ``[w*stride, w*stride+k)``; the last window
    may be partial; conversations shorter than ``k`` yield one window).
    Emits one bounded row per window — (conv_id, window_idx, start_turn,
    end_turn, n_turns, window_md5 of the newline-joined turn text)."""

    def windows(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "window_idx": pa.array([], pa.int64()),
            "start_turn": pa.array([], pa.int64()),
            "end_turn": pa.array([], pa.int64()),
            "n_turns": pa.array([], pa.int64()),
            "window_md5": pa.array([], pa.string()),
        })
        if tbl.num_rows == 0:
            return empty
        lens = np.diff(off)
        # windows per conversation: ceil((n-k)/stride) + 1, floored at 1
        n_w = (np.maximum(np.ceil((lens - k) / stride), 0) + 1).astype(np.int64)
        total = int(n_w.sum())
        if total == 0:
            return empty
        conv_of_w = np.repeat(np.arange(lens.size), n_w)
        widx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_w) - n_w, n_w
        )
        w_start = widx * stride
        w_len = np.minimum(k, lens[conv_of_w] - w_start)
        # flat row indices of every window member
        reps = np.repeat(off[:-1][conv_of_w] + w_start, w_len)
        local = np.arange(int(w_len.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(w_len) - w_len, w_len
        )
        texts = tbl["text"].combine_chunks().take(pa.array(reps + local, pa.int64()))
        w_off = np.concatenate(([0], np.cumsum(w_len))).astype(np.int64)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(w_off, pa.int32()), texts), "\n"
        )
        md5 = [hashlib.md5(s.encode()).hexdigest() for s in joined.to_pylist()]
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1][conv_of_w], pa.int64()))
        return pa.table({
            "conv_id": conv,
            "window_idx": pa.array(widx, pa.int64()),
            "start_turn": pa.array(w_start, pa.int64()),
            "end_turn": pa.array(w_start + w_len - 1, pa.int64()),
            "n_turns": pa.array(w_len, pa.int64()),
            "window_md5": pa.array(md5, pa.string()),
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(windows, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["conv_id", "window_idx"]).reset_index(drop=True)


def conv_windows_sql(src: str, *, k: int = 4, stride: int = 2) -> str:
    return f"""
WITH n AS (
  SELECT conv_id, count(*) AS n FROM {src} GROUP BY conv_id
),
gs AS (
  -- the table-function form of generate_series only takes constants in
  -- DuckDB; the scalar form returns a LIST and accepts expressions —
  -- build 0..global-max once and theta-join per conversation
  SELECT unnest(generate_series(0, (
    SELECT CAST(greatest(max(ceil((n - {k}) * 1.0 / {stride})), 0) AS BIGINT) FROM n
  ))) AS window_idx
),
w AS (
  SELECT n.conv_id, gs.window_idx
  FROM n JOIN gs
    ON gs.window_idx <= greatest(ceil((n.n - {k}) * 1.0 / {stride}), 0)
)
SELECT w.conv_id, w.window_idx,
       CAST(min(t.turn_idx) AS BIGINT) AS start_turn,
       CAST(max(t.turn_idx) AS BIGINT) AS end_turn,
       count(*) AS n_turns,
       md5(string_agg(t.text, chr(10) ORDER BY t.turn_idx)) AS window_md5
FROM w JOIN {src} t
  ON t.conv_id = w.conv_id
 AND t.turn_idx >= w.window_idx * {stride}
 AND t.turn_idx <  w.window_idx * {stride} + {k}
GROUP BY w.conv_id, w.window_idx
ORDER BY w.conv_id, w.window_idx
""".strip()


def turn_overlap(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Self-repetition signal for agent transcripts: token-set overlap of
    every adjacent turn pair within a conversation (an assistant that
    repeats itself produces high adjacent-turn Jaccard — the conversational
    analog of the Gopher repetition filters). Integer-only output per
    conversation — (n_pairs, inter_sum, union_sum) — so engine/oracle parity
    is exact with no float division anywhere; consumers derive
    inter_sum/union_sum as the repetition ratio.

    Fully vectorized per bucket: distinct (row, code) keys once, then one
    ``intersect1d`` of pair-tagged keys (left = turn j tagged pair j,
    right = turn j+1 tagged pair j) and bincounts — no per-pair loop."""
    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(_overlap_conversations, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({
            "conv_id": pd.Series([], dtype=str),
            "n_pairs": pd.Series([], dtype=np.int64),
            "inter_sum": pd.Series([], dtype=np.int64),
            "union_sum": pd.Series([], dtype=np.int64),
        })
    return out.sort_values("conv_id").reset_index(drop=True)


def turn_overlap_sorted(files: list[str]) -> pd.DataFrame:
    """Zero-shuffle turn_overlap for conversation-sorted corpora — the
    conv_flatten_sorted pattern applied to the heaviest per-byte transcript
    op: per-file tasks compute interior conversations, the driver repairs
    the bounded boundary set. Value-identical to turn_overlap (tested on
    mid-conversation shard cuts)."""
    out = _process_sorted_conversations(
        files, _overlap_conversations, ["conv_id", "turn_idx", "text"]
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "conv_id": pd.Series([], dtype=str),
            "n_pairs": pd.Series([], dtype=np.int64),
            "inter_sum": pd.Series([], dtype=np.int64),
            "union_sum": pd.Series([], dtype=np.int64),
        })
    return out.sort_values("conv_id").reset_index(drop=True)


def _overlap_conversations(tbl: pa.Table) -> pa.Table:
    """One table of whole conversations -> (conv_id, n_pairs, inter_sum,
    union_sum) adjacent-turn token-set overlaps (turn_overlap reducer)."""
    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "n_pairs": pa.array([], pa.int64()),
        "inter_sum": pa.array([], pa.int64()),
        "union_sum": pa.array([], pa.int64()),
    })
    tbl, off = _conv_offsets(tbl)
    n = tbl.num_rows
    if n < 2:
        return empty
    row_ids, codes, _ = analyzer.tokenize_flat(
        analyzer.normalize_text(tbl["text"])
    )
    keys = np.unique(
        (row_ids.astype(np.int64) << 32) | codes.astype(np.int64)
    )
    rows = (keys >> 32).astype(np.int64)
    sizes = np.bincount(rows, minlength=n)
    valid_pair = np.ones(n - 1, bool)
    valid_pair[off[1:-1] - 1] = False  # pairs spanning two conversations
    if not valid_pair.any():
        return empty
    lmask = np.zeros(n, bool)
    lmask[: n - 1] = valid_pair
    rmask = np.zeros(n, bool)
    rmask[1:] = valid_pair
    lsel = lmask[rows]
    rsel = rmask[rows]
    left = (rows[lsel] << 32) | (keys[lsel] & 0xFFFFFFFF)
    right = ((rows[rsel] - 1) << 32) | (keys[rsel] & 0xFFFFFFFF)
    inter_keys = np.intersect1d(left, right, assume_unique=True)
    inter = np.bincount((inter_keys >> 32).astype(np.int64), minlength=n - 1)
    union = sizes[:-1] + sizes[1:] - inter
    lens = np.diff(off)
    # conv index of pair j is the conv of row j; rows are conv-contiguous
    pj = np.flatnonzero(valid_pair)
    conv_idx = np.searchsorted(off, pj, side="right") - 1
    n_pairs = np.bincount(conv_idx, minlength=lens.size)
    inter_sum = np.bincount(conv_idx, weights=inter[pj], minlength=lens.size).astype(np.int64)
    union_sum = np.bincount(conv_idx, weights=union[pj], minlength=lens.size).astype(np.int64)
    nz = np.flatnonzero(n_pairs)
    conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1][nz], pa.int64()))
    return pa.table({
        "conv_id": conv,
        "n_pairs": pa.array(n_pairs[nz], pa.int64()),
        "inter_sum": pa.array(inter_sum[nz], pa.int64()),
        "union_sum": pa.array(union_sum[nz], pa.int64()),
    })


def turn_overlap_sql(src: str) -> str:
    tok = analyzer.sql_tokenize_expr("text")
    return f"""
WITH toksd AS (
  SELECT conv_id, turn_idx, list_distinct({tok}) AS s FROM {src}
),
lagd AS (
  SELECT conv_id, s,
         lag(s) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM toksd
),
pairs AS (
  SELECT conv_id,
         len(list_intersect(s, prev)) AS inter,
         len(s) + len(prev) - len(list_intersect(s, prev)) AS uni
  FROM lagd WHERE prev IS NOT NULL
)
SELECT conv_id, count(*) AS n_pairs,
       CAST(sum(inter) AS BIGINT) AS inter_sum,
       CAST(sum(uni) AS BIGINT) AS union_sum
FROM pairs GROUP BY conv_id ORDER BY conv_id
""".strip()


# ---------------------------------------------------------------------------
# order-free aggregations (partial-fold, no shuffle)
# ---------------------------------------------------------------------------

def conv_stats(ds) -> pd.DataFrame:
    """Per conversation: turn count, distinct roles, tool calls, total
    tokens (shared analyzer-v1 tokenizer) and duration (µs between first
    and last turn). One streaming pass of per-batch numpy ``reduceat``
    partials (sum / min / max / bitwise-OR role mask — all associative, so
    the driver fold over per-batch rows is exact)."""

    def partial(t: pa.Table) -> pa.Table:
        dl = np.asarray(
            analyzer.doc_token_counts(analyzer.normalize_text(t["text"])), np.int64
        )
        ts = np.asarray(
            t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        )
        is_tool = np.asarray(
            pc.equal(t["role"].combine_chunks(), "tool").cast(pa.int64())
        )
        renc = t["role"].combine_chunks().dictionary_encode()
        bit = np.array(
            [np.int64(1) << _role_bit(r) for r in renc.dictionary.to_pylist()],
            np.int64,
        )
        mask = bit[np.asarray(renc.indices)]
        cenc = t["conv_id"].combine_chunks().dictionary_encode()
        codes = np.asarray(cenc.indices).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sc)) + 1))
        ones = np.ones(t.num_rows, np.int64)
        return pa.table({
            "conv_id": cenc.dictionary.take(pa.array(sc[starts], pa.int64())),
            "n": pa.array(np.add.reduceat(ones, starts), pa.int64()),
            "n_tool_calls": pa.array(np.add.reduceat(is_tool[order], starts), pa.int64()),
            "total_tokens": pa.array(np.add.reduceat(dl[order], starts), pa.int64()),
            "ts_min": pa.array(np.minimum.reduceat(ts[order], starts), pa.int64()),
            "ts_max": pa.array(np.maximum.reduceat(ts[order], starts), pa.int64()),
            "role_mask": pa.array(np.bitwise_or.reduceat(mask[order], starts), pa.int64()),
        })

    main = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = main.groupby("conv_id", sort=True).agg(
        n_turns=("n", "sum"),
        n_tool_calls=("n_tool_calls", "sum"),
        total_tokens=("total_tokens", "sum"),
        ts_min=("ts_min", "min"),
        ts_max=("ts_max", "max"),
        role_mask=("role_mask", lambda s: int(np.bitwise_or.reduce(s.to_numpy()))),
    )
    out = agg.reset_index()
    out["n_roles"] = out["role_mask"].map(lambda m: bin(int(m)).count("1")).astype(np.int64)
    out["duration_us"] = out["ts_max"] - out["ts_min"]
    return out[
        ["conv_id", "n_turns", "n_roles", "n_tool_calls", "total_tokens", "duration_us"]
    ].reset_index(drop=True)


_ROLE_BITS = {"assistant": 0, "system": 1, "tool": 2, "user": 3}


def _role_bit(r: str) -> int:
    b = _ROLE_BITS.get(r)
    if b is None:  # unseen role name: stable fallback bit from its hash
        b = 4 + (zlib.crc32(r.encode()) % 56)
    return b


def conv_stats_sql(src: str) -> str:
    tok = analyzer.sql_tokenize_expr("text")
    return f"""
SELECT conv_id,
       count(*) AS n_turns,
       CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
       CAST(sum(len({tok})) AS BIGINT) AS total_tokens,
       date_diff('microsecond', min(ts), max(ts)) AS duration_us
FROM {src} GROUP BY conv_id ORDER BY conv_id
""".strip()


def role_stats(ds) -> pd.DataFrame:
    """Per role: turns, conversations touched, chars/tokens and mean turn
    length. Distinct (role, conv) pairs are pre-deduplicated per batch so
    the driver fold sees at most roles × conversations rows."""

    def partial(t: pa.Table) -> pa.Table:
        dl = analyzer.doc_token_counts(analyzer.normalize_text(t["text"]))
        return pa.table({
            "role": t["role"].combine_chunks(),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "total_chars": pc.utf8_length(t["text"].combine_chunks()).cast(pa.int64()),
            "total_tokens": pa.array(dl, pa.int64()),
        }).group_by("role").aggregate([
            ("n", "sum"), ("total_chars", "sum"), ("total_tokens", "sum")
        ])

    def partial_pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "role": t["role"].combine_chunks(),
            "conv_id": t["conv_id"].combine_chunks(),
        }).group_by(["role", "conv_id"]).aggregate([])

    main = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    pairs = ds.map_batches(partial_pairs, batch_format="pyarrow").to_pandas()

    agg = main.groupby("role", sort=True).agg(
        n_turns=("n_sum", "sum"),
        total_chars=("total_chars_sum", "sum"),
        total_tokens=("total_tokens_sum", "sum"),
    )
    nconvs = pairs.drop_duplicates().groupby("role", sort=True)["conv_id"].nunique()
    out = agg.reset_index()
    out["n_convs"] = nconvs.reindex(agg.index).to_numpy().astype(np.int64)
    out["avg_chars"] = _q6(out["total_chars"].to_numpy() / out["n_turns"].to_numpy())
    return out[
        ["role", "n_turns", "n_convs", "total_chars", "total_tokens", "avg_chars"]
    ].reset_index(drop=True)


def role_stats_sql(src: str) -> str:
    tok = analyzer.sql_tokenize_expr("text")
    avg = _Q6_SQL.format("CAST(sum(length(text)) AS DOUBLE) / count(*)")
    return f"""
SELECT role,
       count(*) AS n_turns,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len({tok})) AS BIGINT) AS total_tokens,
       {avg} AS avg_chars
FROM {src} GROUP BY role ORDER BY role
""".strip()


def curate_conversations(
    ds,
    *,
    min_turns: int = 2,
    max_overlap_pct: int = 10,
    max_tokens: int = 600,
) -> pd.DataFrame:
    """Conversation-level curation verdicts composing the quality signals:
    drop too-short conversations, self-repetitive ones (adjacent-turn
    overlap above ``max_overlap_pct`` — integer cross-multiply, no
    division) and over-long ones, with the first failing rule as the
    recorded reason (the transcript analog of pipelines/curate.py's
    document filters). Two streaming passes (stats + overlap), verdicts on
    the bounded per-conversation frames."""
    cs = conv_stats(ds).set_index("conv_id")
    ov = turn_overlap(ds).set_index("conv_id")
    j = cs.join(ov[["inter_sum", "union_sum"]], how="left").fillna(0)
    i = j["inter_sum"].astype(np.int64)
    u = j["union_sum"].astype(np.int64)
    reason = np.where(
        j["n_turns"] < min_turns, "short",
        np.where(
            i * 100 > u * max_overlap_pct, "repetitive",
            np.where(j["total_tokens"] > max_tokens, "too_long", "ok"),
        ),
    )
    out = pd.DataFrame({
        "conv_id": j.index,
        "n_turns": j["n_turns"].astype(np.int64).to_numpy(),
        "total_tokens": j["total_tokens"].astype(np.int64).to_numpy(),
        "inter_sum": i.to_numpy(),
        "union_sum": u.to_numpy(),
        "reason": reason,
        "keep": reason == "ok",
    })
    return out.sort_values("conv_id").reset_index(drop=True)


def curate_conversations_sql(
    src: str,
    *,
    min_turns: int = 2,
    max_overlap_pct: int = 10,
    max_tokens: int = 600,
) -> str:
    case = (
        f"CASE WHEN n_turns < {min_turns} THEN 'short' "
        f"WHEN inter_sum * 100 > union_sum * {max_overlap_pct} THEN 'repetitive' "
        f"WHEN total_tokens > {max_tokens} THEN 'too_long' ELSE 'ok' END"
    )
    return f"""
WITH cs AS ({conv_stats_sql(src)}),
ov AS ({turn_overlap_sql(src)}),
j AS (
  SELECT cs.conv_id, cs.n_turns, cs.total_tokens,
         CAST(coalesce(ov.inter_sum, 0) AS BIGINT) AS inter_sum,
         CAST(coalesce(ov.union_sum, 0) AS BIGINT) AS union_sum
  FROM cs LEFT JOIN ov ON cs.conv_id = ov.conv_id
)
SELECT conv_id, n_turns, total_tokens, inter_sum, union_sum,
       {case} AS reason,
       ({case}) = 'ok' AS keep
FROM j ORDER BY conv_id
""".strip()


def tool_usage(ds) -> pd.DataFrame:
    """Per tool: call count and conversations using it (tool rows only)."""

    def partial(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t["role"], "tool"))
        return pa.table({
            "tool": sel["tool"].combine_chunks(),
            "conv_id": sel["conv_id"].combine_chunks(),
        }).group_by(["tool", "conv_id"]).aggregate([([], "count_all")])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # no tool-role rows at all: keep the schema
        return pd.DataFrame({"tool": pd.Series([], dtype=str),
                             "n_calls": pd.Series([], dtype=np.int64),
                             "n_convs": pd.Series([], dtype=np.int64)})
    folded = parts.groupby(["tool", "conv_id"], sort=False, as_index=False)[
        "count_all"
    ].sum()
    out = folded.groupby("tool", sort=True).agg(
        n_calls=("count_all", "sum"), n_convs=("conv_id", "nunique")
    ).reset_index()
    out["n_calls"] = out["n_calls"].astype(np.int64)
    out["n_convs"] = out["n_convs"].astype(np.int64)
    return out


def tool_usage_sql(src: str) -> str:
    return f"""
SELECT tool, count(*) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM {src} WHERE role = 'tool'
GROUP BY tool ORDER BY tool
""".strip()


def role_violations(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Per-conversation protocol validation (the training-data analog of the
    reference's validation→inactive filter, SURVEY §2.2): count adjacent
    same-role turn pairs (``n_repeats`` — a speaker never follows themself
    in a well-formed chat transcript) and flag conversations whose first
    turn is not ``user`` (``bad_start``). One bucketed pass; per-conv sums
    via reduceat, no per-conversation Python."""

    def check(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "n_repeats": pa.array([], pa.int64()),
            "bad_start": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        n = tbl.num_rows
        if n == 0:
            return empty
        enc = tbl["role"].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        same = np.zeros(n, dtype=np.int64)
        same[1:] = codes[1:] == codes[:-1]
        same[off[:-1]] = 0  # conversation boundaries never pair
        n_repeats = np.add.reduceat(same, off[:-1])
        first_roles = enc.dictionary.take(
            pa.array(codes[off[:-1]], pa.int64())
        )
        bad_start = (
            ~np.asarray(pc.equal(first_roles, "user"))
        ).astype(np.int64)
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        return pa.table({
            "conv_id": conv,
            "n_repeats": pa.array(n_repeats, pa.int64()),
            "bad_start": pa.array(bad_start, pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(check, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                             "n_repeats": pd.Series([], dtype=np.int64),
                             "bad_start": pd.Series([], dtype=np.int64)})
    return parts.sort_values("conv_id").reset_index(drop=True)


def role_violations_sql(src: str) -> str:
    return f"""
WITH lagd AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM {src}
)
SELECT conv_id,
       CAST(sum(CASE WHEN prev_role = role THEN 1 ELSE 0 END) AS BIGINT) AS n_repeats,
       CAST(max(CASE WHEN prev_role IS NULL AND role <> 'user' THEN 1 ELSE 0 END) AS BIGINT) AS bad_start
FROM lagd
GROUP BY conv_id
ORDER BY conv_id
""".strip()


def conv_branches(ds, *, k: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Retry/branch detection: conversations that share an identical first-k
    -turn prefix (role + text, in turn order) are resampled generations or
    abandoned retries of the same dialogue — a conversation-level duplication
    signal exact-text dedup misses (the continuations differ).

    Two bucketed stages, both all-to-all on BOUNDED rows:
      1. conv-bucketed (order-dependent): per conversation, md5 of its first
         ``min(k, n_turns)`` turns flattened as ``role: text`` newline-joined
         — one bounded row per conversation leaves the stage, never text.
      2. prefix-bucketed (``crc32(prefix_md5) % n_buckets``): group rows by
         prefix hash, keep groups with >1 conversation. A hot prefix (one
         prompt retried millions of times) lands in ONE bucket but costs
         only its group's row count — the aggregate is count + min, never
         pairwise.

    Returns one row per duplicate-prefix group:
    ``(prefix_md5, n_convs, first_conv, prefix_turns)``."""

    def prefix_hash(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "prefix_md5": pa.array([], pa.string()),
            "prefix_turns": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return empty
        lens = np.diff(off)
        take = np.minimum(lens, k)
        reps = np.repeat(off[:-1], take)
        local = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(take) - take, take
        )
        sub = tbl.take(pa.array(reps + local, pa.int64()))
        line = pc.binary_join_element_wise(
            sub["role"].combine_chunks(), sub["text"].combine_chunks(), ": "
        )
        poff = np.concatenate(([0], np.cumsum(take)))
        lists = pa.ListArray.from_arrays(pa.array(poff, pa.int32()), line)
        flat = pc.binary_join(lists, "\n")
        md5 = [hashlib.md5(s.encode()).hexdigest() for s in flat.to_pylist()]
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        return pa.table({
            "conv_id": conv,
            "prefix_md5": pa.array(md5, pa.string()),
            "prefix_turns": pa.array(take, pa.int64()),
        })

    def add_hbucket(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in t["prefix_md5"].to_pylist()),
            dtype=np.int32, count=t.num_rows,
        )
        return t.append_column("hbucket", pa.array(h, pa.int32()))

    def groups(t: pa.Table) -> pa.Table:
        agg = (
            t.group_by("prefix_md5")
            .aggregate([
                ("conv_id", "count"),
                ("conv_id", "min"),
                ("prefix_turns", "min"),
            ])
            .rename_columns(["prefix_md5", "n_convs", "first_conv", "prefix_turns"])
        )
        agg = agg.filter(pc.greater(agg["n_convs"], 1))
        return pa.table({
            "prefix_md5": agg["prefix_md5"],
            "n_convs": agg["n_convs"].cast(pa.int64()),
            "first_conv": agg["first_conv"],
            "prefix_turns": agg["prefix_turns"],
        })

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(prefix_hash, batch_format="pyarrow")
        .map_batches(add_hbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hbucket")
        .map_groups(groups, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({
            "prefix_md5": pd.Series([], dtype=str),
            "n_convs": pd.Series([], dtype=np.int64),
            "first_conv": pd.Series([], dtype=str),
            "prefix_turns": pd.Series([], dtype=np.int64),
        })
    return out.sort_values("prefix_md5").reset_index(drop=True)


def conv_continuations(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Continuation stitching: conversation B CONTINUES conversation A when
    B's first turn text is exactly A's last turn text (the context-
    carryover pattern: a session restarted by replaying the tail of the
    previous one). Needed to reassemble logically-single dialogues that
    session resets split — sequence-level dedup treats them as distinct.

    Two bounded stages: per conversation emit ONE row (conv_id, first_md5,
    last_md5) from the conv-bucketed pass; then join first↔last hashes in
    hash-partitioned groups. Empty-text endpoints are excluded (both
    sides) — they would stitch everything to everything. Output
    (prev_conv, next_conv, link_md5), one row per stitch."""

    def endpoints(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "first_md5": pa.array([], pa.string()),
                "last_md5": pa.array([], pa.string()),
            })
        texts = tbl["text"].combine_chunks()
        first_t = texts.take(pa.array(off[:-1], pa.int64())).to_pylist()
        last_t = texts.take(pa.array(off[1:] - 1, pa.int64())).to_pylist()
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        fmd5 = [hashlib.md5(s.encode()).hexdigest() if s else "" for s in first_t]
        lmd5 = [hashlib.md5(s.encode()).hexdigest() if s else "" for s in last_t]
        return pa.table({
            "conv_id": conv,
            "first_md5": pa.array(fmd5, pa.string()),
            "last_md5": pa.array(lmd5, pa.string()),
        })

    eps = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(endpoints, batch_format="pyarrow")
        .to_pandas()
    )
    heads = eps[eps["first_md5"] != ""][["conv_id", "first_md5"]].rename(
        columns={"conv_id": "next_conv", "first_md5": "link_md5"}
    )
    tails = eps[eps["last_md5"] != ""][["conv_id", "last_md5"]].rename(
        columns={"conv_id": "prev_conv", "last_md5": "link_md5"}
    )
    out = tails.merge(heads, on="link_md5")
    out = out[out["prev_conv"] != out["next_conv"]]
    # driver-side join is over one bounded row per conversation; at corpus
    # scale the same join runs as a hash-bucketed Dataset join on link_md5
    return (
        out[["prev_conv", "next_conv", "link_md5"]]
        .sort_values(["prev_conv", "next_conv"])
        .reset_index(drop=True)
    )


def conv_continuations_sql(src: str) -> str:
    return f"""
WITH eps AS (
  SELECT conv_id,
         md5(min_by(text, turn_idx)) AS first_md5,
         min_by(text, turn_idx) AS first_text,
         md5(max_by(text, turn_idx)) AS last_md5,
         max_by(text, turn_idx) AS last_text
  FROM {src} GROUP BY conv_id
)
SELECT a.conv_id AS prev_conv, b.conv_id AS next_conv,
       a.last_md5 AS link_md5
FROM eps a JOIN eps b ON a.last_md5 = b.first_md5
WHERE a.conv_id != b.conv_id AND a.last_text != '' AND b.first_text != ''
ORDER BY prev_conv, next_conv
""".strip()


def preference_pairs(ds, *, k: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """DPO/RLHF preference-pair mining from retry branches: conversations
    sharing an identical first-``k``-turn prefix (the conv_branches
    duplicate-prefix signal) are alternative continuations of the same
    dialogue; the LONGEST continuation is taken as ``chosen`` (completed
    exchange — ties by conv_id asc) and every other branch pairs with it as
    ``rejected`` — the standard weak-supervision recipe for mining
    preference pairs out of assistant logs without human labels.

    Same two bounded bucketed stages as conv_branches (one row per
    conversation between them); a group of n branches emits n−1 pairs
    (linear, never pairwise-quadratic)."""

    def prefix_hash(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "prefix_md5": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return empty
        lens = np.diff(off)
        take = np.minimum(lens, k)
        reps = np.repeat(off[:-1], take)
        local = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(take) - take, take
        )
        sub = tbl.take(pa.array(reps + local, pa.int64()))
        line = pc.binary_join_element_wise(
            sub["role"].combine_chunks(), sub["text"].combine_chunks(), ": "
        )
        poff = np.concatenate(([0], np.cumsum(take)))
        lists = pa.ListArray.from_arrays(pa.array(poff, pa.int32()), line)
        flat = pc.binary_join(lists, "\n")
        md5 = [hashlib.md5(s.encode()).hexdigest() for s in flat.to_pylist()]
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        return pa.table({
            "conv_id": conv,
            "prefix_md5": pa.array(md5, pa.string()),
            "n_turns": pa.array(lens, pa.int64()),
        })

    def add_hbucket(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in t["prefix_md5"].to_pylist()),
            dtype=np.int32, count=t.num_rows,
        )
        return t.append_column("hbucket", pa.array(h, pa.int32()))

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            ["prefix_md5", "n_turns", "conv_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        sizes = df.groupby("prefix_md5", sort=False)["conv_id"].transform("size")
        df = df[sizes > 1]
        if df.empty:
            return pa.table({
                "prefix_md5": pa.array([], pa.string()),
                "chosen_conv": pa.array([], pa.string()),
                "chosen_turns": pa.array([], pa.int64()),
                "rejected_conv": pa.array([], pa.string()),
                "rejected_turns": pa.array([], pa.int64()),
            })
        first = ~df["prefix_md5"].duplicated()
        chosen = df[first].set_index("prefix_md5")
        rej = df[~first.to_numpy()]
        out = pd.DataFrame({
            "prefix_md5": rej["prefix_md5"].to_numpy(),
            "chosen_conv": chosen.loc[rej["prefix_md5"], "conv_id"].to_numpy(),
            "chosen_turns": chosen.loc[rej["prefix_md5"], "n_turns"]
            .to_numpy(np.int64),
            "rejected_conv": rej["conv_id"].to_numpy(),
            "rejected_turns": rej["n_turns"].to_numpy(np.int64),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(prefix_hash, batch_format="pyarrow")
        .map_batches(add_hbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hbucket")
        .map_groups(pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({
            "prefix_md5": pd.Series([], dtype=str),
            "chosen_conv": pd.Series([], dtype=str),
            "chosen_turns": pd.Series([], dtype=np.int64),
            "rejected_conv": pd.Series([], dtype=str),
            "rejected_turns": pd.Series([], dtype=np.int64),
        })
    return out.sort_values(["prefix_md5", "rejected_conv"]).reset_index(drop=True)


def preference_pairs_sql(src: str, *, k: int = 2) -> str:
    return f"""
WITH pref AS (
  SELECT conv_id,
         md5(string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx))
           AS prefix_md5
  FROM {src} WHERE turn_idx < {k} GROUP BY conv_id
),
cnt AS (SELECT conv_id, count(*) AS n_turns FROM {src} GROUP BY conv_id),
p AS (SELECT pref.conv_id, prefix_md5, n_turns FROM pref JOIN cnt USING (conv_id)),
g AS (
  SELECT *, count(*) OVER (PARTITION BY prefix_md5) AS n,
         row_number() OVER (
           PARTITION BY prefix_md5 ORDER BY n_turns DESC, conv_id ASC
         ) AS rn
  FROM p
)
SELECT c.prefix_md5, c.conv_id AS chosen_conv,
       CAST(c.n_turns AS BIGINT) AS chosen_turns,
       r.conv_id AS rejected_conv, CAST(r.n_turns AS BIGINT) AS rejected_turns
FROM g c JOIN g r ON r.prefix_md5 = c.prefix_md5 AND r.rn > 1
WHERE c.rn = 1 AND c.n > 1
ORDER BY c.prefix_md5, rejected_conv
""".strip()


def conv_branches_sql(src: str, *, k: int = 2) -> str:
    return f"""
WITH pref AS (
  SELECT conv_id, count(*) AS pn,
         md5(string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)) AS prefix_md5
  FROM {src} WHERE turn_idx < {k} GROUP BY conv_id
)
SELECT prefix_md5, CAST(count(*) AS BIGINT) AS n_convs,
       min(conv_id) AS first_conv, CAST(min(pn) AS BIGINT) AS prefix_turns
FROM pref GROUP BY prefix_md5 HAVING count(*) > 1
ORDER BY prefix_md5
""".strip()


def tool_loops(ds, *, min_run: int = 3, n_buckets: int = 64) -> pd.DataFrame:
    """Agent stuck-loop detection: maximal runs of consecutive tool CALLS
    (tool-role turns in turn order; non-tool turns between calls don't
    break the chain, the tool_chains convention) where the same tool is
    called ``min_run``+ times in a row — the resampled-generation /
    retry-storm signal a training pipeline drops or truncates. One
    vectorized boundary-diff pass per conversation bucket; only qualifying
    runs leave the tasks. Returns (conv_id, tool, run_len, start_turn)
    sorted by conv then start."""

    def runs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "run_len": pa.array([], pa.int64()),
            "start_turn": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return empty
        is_tool = np.asarray(pc.equal(tbl["role"].combine_chunks(), "tool"))
        sel = np.flatnonzero(is_tool)
        if sel.size == 0:
            return empty
        conv_idx = np.searchsorted(off, sel, side="right") - 1
        enc = (
            tbl["tool"].combine_chunks()
            .take(pa.array(sel, pa.int64()))
            .dictionary_encode()
        )
        codes = np.asarray(enc.indices).astype(np.int64)
        new_run = np.ones(sel.size, dtype=bool)
        new_run[1:] = (conv_idx[1:] != conv_idx[:-1]) | (codes[1:] != codes[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, sel.size))
        keep = lens >= min_run
        if not keep.any():
            return empty
        starts, lens = starts[keep], lens[keep]
        turn_idx = np.asarray(
            tbl["turn_idx"].combine_chunks().cast(pa.int64())
        )
        convs = tbl["conv_id"].combine_chunks()
        tools = enc.dictionary.to_pylist()
        return pa.table({
            "conv_id": convs.take(pa.array(sel[starts], pa.int64())),
            "tool": pa.array([tools[c] for c in codes[starts]], pa.string()),
            "run_len": pa.array(lens, pa.int64()),
            "start_turn": pa.array(turn_idx[sel[starts]], pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(runs, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "conv_id": pd.Series([], dtype=str),
            "tool": pd.Series([], dtype=str),
            "run_len": pd.Series([], dtype=np.int64),
            "start_turn": pd.Series([], dtype=np.int64),
        })
    return parts.sort_values(["conv_id", "start_turn"]).reset_index(drop=True)


def tool_loops_sql(src: str, *, min_run: int = 3) -> str:
    """Oracle for tool_loops: gaps-and-islands over the tool-call sequence
    (row_number difference is constant within a same-tool run)."""
    return f"""
WITH calls AS (
  SELECT conv_id, turn_idx, tool,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - row_number() OVER (PARTITION BY conv_id, tool ORDER BY turn_idx)
           AS island
  FROM {src} WHERE role = 'tool'
)
SELECT conv_id, tool,
       CAST(count(*) AS BIGINT) AS run_len,
       CAST(min(turn_idx) AS BIGINT) AS start_turn
FROM calls GROUP BY conv_id, tool, island
HAVING count(*) >= {min_run}
ORDER BY conv_id, start_turn
""".strip()


def role_token_quantiles(ds, *, qs=(0.25, 0.5, 0.75)) -> pd.DataFrame:
    """Per-role exact token-length quantiles over turns (the
    context-budgeting input: how long are user vs assistant vs tool turns).
    One tokenize pass emits only (role, n_tokens) pairs; grouped exact
    quantiles then need each role's lengths together (tiny groups count —
    sort-based exchange). np.quantile 'linear' ≡ DuckDB quantile_cont, and
    quarter-quantiles of integers are dyadic rationals → exact float
    equality, no rounding games."""
    from .. import analyzer

    def lens(t: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(t["text"])
        rows, codes, _ = analyzer.tokenize_flat(text)
        n = t.num_rows
        cnt = (
            np.bincount(rows, minlength=n).astype(np.int64)
            if rows.size else np.zeros(n, np.int64)
        )
        return pa.table({
            "role": t["role"],
            "n_tokens": pa.array(cnt, pa.int64()),
        })

    pairs = ds.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_tokens"].to_numpy(dtype=np.float64)
        out = {"role": [g["role"].iloc[0]],
               "n_turns": [np.int64(v.size)]}
        for p in qs:
            out[f"p{int(p * 100)}"] = [float(np.quantile(v, p, method="linear"))]
        return pd.DataFrame(out)

    out = pairs.groupby("role").map_groups(q, batch_format="pandas").to_pandas()
    out["n_turns"] = out["n_turns"].astype(np.int64)
    return out.sort_values("role").reset_index(drop=True)


def role_token_quantiles_sql(src: str, *, qs=(0.25, 0.5, 0.75)) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr("text")
    qcols = ",\n       ".join(
        f"quantile_cont(n_tokens, {p}) AS p{int(p * 100)}" for p in qs
    )
    return f"""
WITH lens AS (SELECT role, len({tok}) AS n_tokens FROM {src})
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       {qcols}
FROM lens GROUP BY role ORDER BY role
""".strip()


def verbosity_by_depth(ds, *, cap: int = 12) -> pd.DataFrame:
    """Mean turn length in tokens by role × turn depth — the drift profile
    a curation run reads before trimming: do assistant turns balloon deep
    into a conversation, do tool results dwarf everything? Depths ≥ ``cap``
    lump into one tail cell so the grid stays bounded. One tokenize pass
    emits (role, depth, count, token-sum) partials — roles × (cap+1) cells,
    no shuffle, raw turns never leave their batch. The mean is the half-up
    fixed integer division (2·s·1e6 + n)//(2n) on both sides. Returns
    ``(role, depth, n_turns, total_tokens, mean_tokens)`` sorted by
    (role, depth)."""
    from .. import analyzer

    def partials(t: pa.Table) -> pa.Table:
        text = analyzer.normalize_text(t["text"])
        rows, _, _ = analyzer.tokenize_flat(text)
        n = t.num_rows
        cnt = (
            np.bincount(rows, minlength=n).astype(np.int64)
            if rows.size else np.zeros(n, np.int64)
        )
        df = pd.DataFrame(
            {
                "role": t["role"].combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False),
                "depth": np.minimum(
                    t["turn_idx"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False),
                    cap,
                ),
                "nt": cnt,
            }
        )
        g = df.groupby(["role", "depth"], sort=False).agg(n=("nt", "size"), s=("nt", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cols = ["role", "depth", "n_turns", "total_tokens", "mean_tokens"]
    if not parts:
        return pd.DataFrame(columns=cols)
    folded = (
        pd.concat(parts, ignore_index=True)
        .groupby(["role", "depth"], sort=True, as_index=False)[["n", "s"]]
        .sum()
    )
    folded["mean_tokens"] = [
        ((2 * int(s) * 1_000_000 + int(n)) // (2 * int(n))) / 1e6
        for n, s in zip(folded["n"], folded["s"])
    ]
    folded["n_turns"] = folded["n"].astype(np.int64)
    folded["total_tokens"] = folded["s"].astype(np.int64)
    folded["depth"] = folded["depth"].astype(np.int64)
    return folded[cols]


def verbosity_by_depth_sql(src: str, *, cap: int = 12) -> str:
    from .. import analyzer

    tok = analyzer.sql_tokenize_expr("text")
    return f"""
WITH lens AS (
  SELECT role, least(CAST(turn_idx AS BIGINT), {cap}) AS depth,
         CAST(len({tok}) AS BIGINT) AS nt
  FROM {src}
),
agg AS (
  SELECT role, depth, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(nt) AS BIGINT) AS total_tokens
  FROM lens GROUP BY role, depth
)
SELECT role, depth, n_turns, total_tokens,
       CAST((2 * CAST(total_tokens AS HUGEINT) * 1000000 + n_turns)
            // (2 * CAST(n_turns AS HUGEINT)) AS DOUBLE) / 1e6 AS mean_tokens
FROM agg ORDER BY role, depth
""".strip()


def system_prompt_reuse(ds, *, min_convs: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Shared-first-turn detection (agent fleets reuse system prompts /
    boilerplate openers verbatim): fingerprint each conversation's first
    turn, report fingerprints shared by ≥ min_convs conversations. One
    bounded row per conversation leaves the tasks (md5 + conv count fold);
    text never reaches the driver. Returns (first_md5, n_convs,
    example_conv) with the lexicographically-first conv as the example."""
    import hashlib

    def firsts(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({
                "first_md5": pa.array([], pa.string()),
                "conv_id": pa.array([], pa.string()),
            })
        starts = off[:-1]
        convs = tbl["conv_id"].combine_chunks().take(pa.array(starts))
        texts = tbl["text"].combine_chunks().take(pa.array(starts)).to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return pa.table({
            "first_md5": pa.array(md5s, pa.string()),
            "conv_id": convs,
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(firsts, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "first_md5": pd.Series([], dtype=str),
            "n_convs": pd.Series([], dtype=np.int64),
            "example_conv": pd.Series([], dtype=str),
        })
    g = parts.groupby("first_md5", as_index=False).agg(
        n_convs=("conv_id", "size"), example_conv=("conv_id", "min")
    )
    g = g[g["n_convs"] >= min_convs].sort_values("first_md5")
    g["n_convs"] = g["n_convs"].astype(np.int64)
    return g.reset_index(drop=True)


def system_prompt_reuse_sql(src: str, *, min_convs: int = 2) -> str:
    return f"""
WITH firsts AS (
  SELECT conv_id, md5(text) AS first_md5
  FROM {src} QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) = 1
)
SELECT first_md5, CAST(count(*) AS BIGINT) AS n_convs,
       min(conv_id) AS example_conv
FROM firsts GROUP BY first_md5 HAVING count(*) >= {min_convs}
ORDER BY first_md5
""".strip()


def tool_latency(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Per-tool response latency: for each tool-role turn, the gap to the
    conversation's NEXT turn (when one exists) — the ops signal for slow
    tools in agent fleets. Exact integer µs sums per (tool) leave the
    tasks; the mean re-derives from the same integer pair on both sides
    (floor(sum/n·1e6+0.5)/1e6, the search_stats rule). Returns
    (tool, n_calls, sum_us, mean_us)."""

    def gaps(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "tool": pa.array([], pa.string()),
            "n_calls": pa.array([], pa.int64()),
            "sum_us": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        n = tbl.num_rows
        if n == 0:
            return empty
        ts = (
            tbl["ts"].combine_chunks()
            .cast(pa.timestamp("us")).cast(pa.int64())
        )
        ts = np.asarray(ts)
        is_tool = np.asarray(pc.equal(tbl["role"].combine_chunks(), "tool"))
        conv_end = np.zeros(n, dtype=bool)
        conv_end[off[1:] - 1] = True
        sel = np.flatnonzero(is_tool & ~conv_end)  # has a next turn in-conv
        if sel.size == 0:
            return empty
        delta = ts[sel + 1] - ts[sel]
        enc = (
            tbl["tool"].combine_chunks()
            .take(pa.array(sel, pa.int64()))
            .dictionary_encode()
        )
        codes = np.asarray(enc.indices).astype(np.int64)
        nd = len(enc.dictionary)
        cnt = np.bincount(codes, minlength=nd)
        sums = np.bincount(codes, weights=delta.astype(np.float64),
                           minlength=nd).astype(np.int64)
        return pa.table({
            "tool": enc.dictionary,
            "n_calls": pa.array(cnt.astype(np.int64), pa.int64()),
            "sum_us": pa.array(sums, pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(gaps, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "tool": pd.Series([], dtype=str),
            "n_calls": pd.Series([], dtype=np.int64),
            "sum_us": pd.Series([], dtype=np.int64),
            "mean_us": pd.Series([], dtype=np.float64),
        })
    g = parts.groupby("tool", as_index=False)[["n_calls", "sum_us"]].sum()
    g["n_calls"] = g["n_calls"].astype(np.int64)
    g["sum_us"] = g["sum_us"].astype(np.int64)
    g["mean_us"] = np.floor(
        g["sum_us"].to_numpy() * 1.0 / g["n_calls"].to_numpy() * 1e6 + 0.5
    ) / 1e6
    return g.sort_values("tool").reset_index(drop=True)


def tool_latency_sql(src: str) -> str:
    return f"""
WITH nxt AS (
  SELECT tool, role,
         epoch_us(lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           - epoch_us(ts) AS delta_us
  FROM {src}
),
calls AS (SELECT tool, delta_us FROM nxt
          WHERE role = 'tool' AND delta_us IS NOT NULL)
SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
       CAST(sum(delta_us) AS BIGINT) AS sum_us,
       floor(CAST(sum(delta_us) AS BIGINT) * 1.0 / count(*) * 1e6 + 0.5) / 1e6
         AS mean_us
FROM calls GROUP BY tool ORDER BY tool
""".strip()


def conv_final_roles(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Conversation-outcome signal: which role holds each conversation's
    LAST turn (ending on 'tool' = interrupted mid-action, on 'user' =
    abandoned, on 'assistant' = completed) — the cheap truncation filter a
    training pipeline applies before SFT emission. One bounded row per
    conversation; counts fold on the driver."""

    def lasts(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({"role": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ends = off[1:] - 1
        roles = tbl["role"].combine_chunks().take(pa.array(ends))
        enc = roles.dictionary_encode()
        cnt = np.bincount(np.asarray(enc.indices),
                          minlength=len(enc.dictionary))
        return pa.table({
            "role": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(lasts, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"role": pd.Series([], dtype=str),
                             "n_convs": pd.Series([], dtype=np.int64)})
    g = parts.groupby("role", as_index=False)["n"].sum()
    g = g.rename(columns={"n": "n_convs"}).sort_values("role")
    g["n_convs"] = g["n_convs"].astype(np.int64)
    return g.reset_index(drop=True)


def conv_final_roles_sql(src: str) -> str:
    return f"""
WITH lasts AS (
  SELECT conv_id, role FROM {src}
  QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) = 1
)
SELECT role, CAST(count(*) AS BIGINT) AS n_convs
FROM lasts GROUP BY role ORDER BY role
""".strip()


def conv_depth_histogram(ds, *, n_buckets: int = 64) -> pd.DataFrame:
    """Conversation-length distribution (dataset-card staple: how deep are
    the dialogues). One bounded count per conversation, then a tiny
    (n_turns → n_convs) fold. Returns (n_turns, n_convs) ascending."""

    def counts(tbl: pa.Table) -> pa.Table:
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return pa.table({"n_turns": pa.array([], pa.int64())})
        return pa.table({
            "n_turns": pa.array(np.diff(off).astype(np.int64), pa.int64()),
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(counts, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"n_turns": pd.Series([], dtype=np.int64),
                             "n_convs": pd.Series([], dtype=np.int64)})
    g = parts.groupby("n_turns", as_index=False).size()
    g = g.rename(columns={"size": "n_convs"}).sort_values("n_turns")
    g["n_turns"] = g["n_turns"].astype(np.int64)
    g["n_convs"] = g["n_convs"].astype(np.int64)
    return g.reset_index(drop=True)


def conv_depth_histogram_sql(src: str) -> str:
    return f"""
WITH c AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
           FROM {src} GROUP BY conv_id)
SELECT n_turns, CAST(count(*) AS BIGINT) AS n_convs
FROM c GROUP BY n_turns ORDER BY n_turns
""".strip()


def best_of_n(ds, *, k: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Best-of-n / rejection-sampling selection: among conversations sharing
    an identical first-``k``-turn prefix (the retry/branch groups
    ``conv_branches`` detects), keep ONE — the longest conversation (most
    turns = the attempt that ran to completion), ties to the lexicographically
    smallest conv_id. Singleton groups keep themselves, so the output IS the
    curated corpus selection (one winner per prefix group). Reference
    analog: the one-live-document-per-identity upsert rule
    (`/root/reference/harvester/core/models/datatypes/document.py:131-139`)
    applied at conversation granularity.

    Same two bounded exchanges as conv_branches: one (conv_id, prefix_md5,
    n_turns) row per conversation leaves stage 1; stage 2 groups by prefix
    hash with a vectorized whole-bucket argmax — a hot prefix costs its
    group's row count, never pairwise work.

    Returns ``(prefix_md5, n_convs, best_conv, best_turns)``."""

    def prefix_hash(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "prefix_md5": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
        })
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return empty
        lens = np.diff(off)
        take = np.minimum(lens, k)
        reps = np.repeat(off[:-1], take)
        local = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(take) - take, take
        )
        sub = tbl.take(pa.array(reps + local, pa.int64()))
        line = pc.binary_join_element_wise(
            sub["role"].combine_chunks(), sub["text"].combine_chunks(), ": "
        )
        poff = np.concatenate(([0], np.cumsum(take)))
        lists = pa.ListArray.from_arrays(pa.array(poff, pa.int32()), line)
        flat = pc.binary_join(lists, "\n")
        md5 = [hashlib.md5(s.encode()).hexdigest() for s in flat.to_pylist()]
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        return pa.table({
            "conv_id": conv,
            "prefix_md5": pa.array(md5, pa.string()),
            "n_turns": pa.array(lens.astype(np.int64), pa.int64()),
        })

    def add_hbucket(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in t["prefix_md5"].to_pylist()),
            dtype=np.int32, count=t.num_rows,
        )
        return t.append_column("hbucket", pa.array(h, pa.int32()))

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["prefix_md5", "n_turns", "conv_id"], ascending=[True, False, True]
        )
        first = ~g["prefix_md5"].duplicated()
        counts = g.groupby("prefix_md5", sort=False)["conv_id"].transform("size")
        out = g.loc[first, ["prefix_md5", "conv_id", "n_turns"]].copy()
        out.insert(1, "n_convs", counts[first].astype(np.int64))
        return out.rename(columns={"conv_id": "best_conv", "n_turns": "best_turns"})

    out = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(prefix_hash, batch_format="pyarrow")
        .map_batches(add_hbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hbucket")
        .map_groups(winners, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({
            "prefix_md5": pd.Series([], dtype=str),
            "n_convs": pd.Series([], dtype=np.int64),
            "best_conv": pd.Series([], dtype=str),
            "best_turns": pd.Series([], dtype=np.int64),
        })
    return out.sort_values("prefix_md5").reset_index(drop=True)


def best_of_n_sql(src: str, *, k: int = 2) -> str:
    return f"""
WITH pref AS (
  SELECT conv_id,
         md5(string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)) AS prefix_md5
  FROM {src} WHERE turn_idx < {k} GROUP BY conv_id
),
nt AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns FROM {src} GROUP BY conv_id)
SELECT p.prefix_md5,
       CAST(count(*) OVER (PARTITION BY p.prefix_md5) AS BIGINT) AS n_convs,
       p.conv_id AS best_conv,
       n.n_turns AS best_turns
FROM pref p JOIN nt n USING (conv_id)
QUALIFY row_number() OVER (PARTITION BY p.prefix_md5
                           ORDER BY n.n_turns DESC, p.conv_id ASC) = 1
ORDER BY p.prefix_md5
""".strip()


def conv_skeletons(ds, *, k: int = 6, min_convs: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Opening-flow template detection: the '>'-joined ROLE sequence of a
    conversation's first ``k`` turns is its skeleton; skeletons shared by
    ≥``min_convs`` conversations are scripted/templated flows (bot scripts,
    canned escalation paths) — a structure-level duplication signal text
    dedup misses entirely (the words differ, the choreography repeats).

    One bounded conv-bucketed pass emits a (skeleton, 1, conv_id) partial
    per conversation; skeleton cardinality is template-bounded (≤ |roles|^k),
    so partials fold on the driver (the vocabulary-fold rule) — no second
    shuffle. Returns ``(skeleton, n_convs, first_conv)``."""

    def skeletons(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "skeleton": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "first_conv": pa.array([], pa.string()),
        })
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return empty
        lens = np.diff(off)
        take = np.minimum(lens, k)
        reps = np.repeat(off[:-1], take)
        local = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(take) - take, take
        )
        sub = tbl.take(pa.array(reps + local, pa.int64()))
        poff = np.concatenate(([0], np.cumsum(take)))
        lists = pa.ListArray.from_arrays(
            pa.array(poff, pa.int32()), sub["role"].combine_chunks()
        )
        skel = pc.binary_join(lists, ">")
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        # batch-local partial: (skeleton, count, min conv)
        part = (
            pa.table({"skeleton": skel, "conv_id": conv})
            .group_by("skeleton")
            .aggregate([("conv_id", "count"), ("conv_id", "min")])
        )
        return pa.table({
            "skeleton": part["skeleton"],
            "n": part["conv_id_count"].cast(pa.int64()),
            "first_conv": part["conv_id_min"],
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(skeletons, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["skeleton", "n_convs", "first_conv"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    fold = parts.groupby("skeleton", as_index=False).agg(
        n_convs=("n", "sum"), first_conv=("first_conv", "min")
    )
    fold = fold[fold["n_convs"] >= min_convs]
    fold["n_convs"] = fold["n_convs"].astype(np.int64)
    return fold.sort_values("skeleton").reset_index(drop=True)[cols]


def conv_skeletons_sql(src: str, *, k: int = 6, min_convs: int = 2) -> str:
    return f"""
WITH sk AS (
  SELECT conv_id, string_agg(role, '>' ORDER BY turn_idx) AS skeleton
  FROM {src} WHERE turn_idx < {k} GROUP BY conv_id
)
SELECT skeleton, CAST(count(*) AS BIGINT) AS n_convs, min(conv_id) AS first_conv
FROM sk GROUP BY skeleton HAVING count(*) >= {min_convs}
ORDER BY skeleton
""".strip()


def conv_template_dedup(ds, *, min_convs: int = 2, n_buckets: int = 64) -> pd.DataFrame:
    """Structural conversation dedup: a conversation's TEMPLATE is the
    '|'-joined full-length sequence of ``role`` or ``role:tool`` tokens
    (tool-call identity included) — two conversations with the same template
    are re-runs of the same choreography even when every word differs, the
    duplication mode agent fleets produce when a script replays. Templates
    shared by ≥``min_convs`` conversations are reported with the
    lexicographically-first conversation as the canonical keeper. Distinct
    from ``conv_skeletons`` (role-only, first-k-turns template FREQUENCY):
    this is full-length and tool-discriminating — same roles with different
    tools are NOT duplicates.

    Scale shape: one conv-bucketed pass emits per-bucket (template, count,
    min conv) partials (pyarrow group_by inside the task — duplicate-heavy
    corpora collapse before the exchange); the driver folds
    distinct-template-cardinality partials, never per-conversation rows.
    Returns ``(template, n_convs, canonical_conv)``."""

    def templates(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "template": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "canonical_conv": pa.array([], pa.string()),
        })
        tbl, off = _conv_offsets(tbl)
        if tbl.num_rows == 0:
            return empty
        role = tbl["role"].combine_chunks()
        tool = tbl["tool"].combine_chunks()
        # role:tool where a tool is named, bare role otherwise
        joined = pc.binary_join_element_wise(role, tool.fill_null(""), ":")
        tok = pc.if_else(pc.is_null(tool), role, joined)
        lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), tok)
        tmpl = pc.binary_join(lists, "|")
        conv = tbl["conv_id"].combine_chunks().take(pa.array(off[:-1], pa.int64()))
        part = (
            pa.table({"template": tmpl, "conv_id": conv})
            .group_by("template")
            .aggregate([("conv_id", "count"), ("conv_id", "min")])
        )
        return pa.table({
            "template": part["template"],
            "n": part["conv_id_count"].cast(pa.int64()),
            "canonical_conv": part["conv_id_min"],
        })

    parts = (
        _with_conv_bucket(ds, n_buckets)
        .groupby("bucket")
        .map_groups(templates, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["template", "n_convs", "canonical_conv"]
    if parts.empty:
        return pd.DataFrame(columns=cols)
    fold = parts.groupby("template", as_index=False).agg(
        n_convs=("n", "sum"), canonical_conv=("canonical_conv", "min")
    )
    fold = fold[fold["n_convs"] >= min_convs]
    fold["n_convs"] = fold["n_convs"].astype(np.int64)
    return fold.sort_values("template").reset_index(drop=True)[cols]


def conv_template_dedup_sql(src: str, *, min_convs: int = 2) -> str:
    return f"""
WITH sk AS (
  SELECT conv_id,
         string_agg(role || CASE WHEN tool IS NOT NULL THEN ':' || tool ELSE '' END,
                    '|' ORDER BY turn_idx) AS template
  FROM {src} GROUP BY conv_id
)
SELECT template, CAST(count(*) AS BIGINT) AS n_convs,
       min(conv_id) AS canonical_conv
FROM sk GROUP BY template HAVING count(*) >= {min_convs}
ORDER BY template
""".strip()
