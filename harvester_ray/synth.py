"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Modeled on the reference's test-data discipline — sequence-numbered,
fully-seeded generators with round-robin low-cardinality fields
(harvester/testing/utils/generators.py:13-45, testing/constants.py:1-30) —
extended with a Zipfian vocabulary so document frequency is realistically
skewed (tool/role boilerplate tokens behave like near-stopwords, the skew
the index build must survive).

Everything derives from a single integer seed; no wall clock, no global
RNG. The same (seed, n_convs) always yields byte-identical Parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_P = np.array([0.35, 0.40, 0.20, 0.05])
TOOLS = np.array([f"tool_{i:02d}" for i in range(20)])
EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp

_VOCAB_SIZE = 30_000


def _vocabulary(rng: np.random.Generator) -> np.ndarray:
    """~30k pronounceable pseudo-words, deterministic from rng."""
    cons = np.array(list("bcdfghjklmnpqrstvwz"))
    vow = np.array(list("aeiou"))
    n = _VOCAB_SIZE
    syll = rng.integers(2, 5, size=n)
    words = []
    ci = rng.integers(0, len(cons), size=(n, 5))
    vi = rng.integers(0, len(vow), size=(n, 5))
    for i in range(n):
        w = "".join(cons[ci[i, j]] + vow[vi[i, j]] for j in range(syll[i]))
        words.append(w)
    # ensure uniqueness by suffixing duplicates with their index
    seen: set[str] = set()
    for i, w in enumerate(words):
        if w in seen:
            words[i] = f"{w}{i}"
        seen.add(words[i])
    return np.array(words)


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    *,
    mean_turns: int = 10,
    zipf_s: float = 1.1,
    with_edge_cases: bool = True,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _vocabulary(rng)
    # Zipfian term distribution over the vocab
    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()

    turns_per_conv = np.maximum(1, rng.poisson(mean_turns, size=n_convs)).astype(np.int64)
    if with_edge_cases and n_convs >= 3:
        turns_per_conv[2] = 1  # single-turn conversation
    n_rows = int(turns_per_conv.sum())

    conv_ids = np.repeat(
        np.array([f"conv-{c:08d}" for c in range(n_convs)]), turns_per_conv
    )
    turn_idx = (
        np.arange(n_rows, dtype=np.int64)
        - np.repeat(np.cumsum(turns_per_conv) - turns_per_conv, turns_per_conv)
    ).astype(np.int32)
    roles = ROLES[rng.choice(len(ROLES), size=n_rows, p=ROLE_P)]
    tool_vals = np.where(
        roles == "tool", TOOLS[rng.integers(0, len(TOOLS), size=n_rows)], None
    )

    # log-normal token counts, 5..500
    tok_counts = np.clip(rng.lognormal(3.0, 1.0, size=n_rows), 5, 500).astype(np.int64)
    total_toks = int(tok_counts.sum())
    flat = vocab[rng.choice(_VOCAB_SIZE, size=total_toks, p=probs)]
    bounds = np.cumsum(tok_counts)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]

    if with_edge_cases and n_rows > 12:
        texts[0] = ""  # empty text
        texts[1] = "the the and and of of"  # only near-stopwords
        texts[5] = texts[4]  # exact duplicate text across turns
        texts[6] = "<p>Hello <b>World</b></p> visit http://x.y/a%20b?q=1+2"
        texts[7] = "Café naïve coördinatie über façade"  # diacritics
        texts[8] = texts[8] + " " + "loremword " * 20

    ts = (
        EPOCH_US
        + np.repeat(np.arange(n_convs, dtype=np.int64) * 3_600_000_000, turns_per_conv)
        + turn_idx.astype(np.int64) * 30_000_000
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool_vals, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=SCHEMA,
    )


def transcripts_parquet(
    out_dir: str,
    n_convs: int = 100,
    seed: int = 42,
    *,
    mean_turns: int = 10,
    shards: int = 1,
) -> str:
    """Materialize a deterministic transcript corpus as Parquet under
    ``out_dir`` (cached: regenerated only if missing). Returns the path."""
    path = os.path.join(out_dir, f"transcripts-c{n_convs}-s{seed}-t{mean_turns}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    tbl = generate_transcripts(n_convs, seed, mean_turns=mean_turns)
    if shards <= 1:
        pq.write_table(tbl, os.path.join(path, "part-000.parquet"))
    else:
        n = tbl.num_rows
        step = (n + shards - 1) // shards
        for i in range(shards):
            pq.write_table(
                tbl.slice(i * step, step), os.path.join(path, f"part-{i:03d}.parquet")
            )
    with open(done, "w") as f:
        f.write("ok")
    return path
