"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Modeled on the reference's test-data discipline — sequence-numbered,
fully-seeded generators with round-robin low-cardinality fields
(harvester/testing/utils/generators.py:13-45, testing/constants.py:1-30) —
extended with a Zipfian vocabulary so document frequency is realistically
skewed (tool/role boilerplate tokens behave like near-stopwords, the skew
the index build must survive).

Everything derives from a single integer seed; no wall clock, no global
RNG. The same (seed, n_convs, mean_turns) always yields identical Parquet.
Generation is chunked (50k conversations per chunk, one sequential RNG) and
text assembly is Arrow-native (``pc.binary_join`` over a list array of vocab
takes) — a 9.6M-turn corpus generates in ~1 min instead of ~30 (the previous
Python ``" ".join`` over 4-byte-per-char numpy unicode arrays).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# bump whenever generator output changes for the same inputs (cache key)
GEN_VERSION = 3  # v3: streaming shard writer (expected-rows boundaries)

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
CONV_CHUNK = 50_000  # conversations generated per chunk (bounds peak memory)


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


def _edge_case_texts(texts: pa.Array) -> pa.Array:
    """Deterministic edge rows patched into the first chunk (empty text,
    near-stopwords, exact dup, HTML + URL, diacritics, repeated word)."""
    head = texts.slice(0, 16).to_pylist()
    head[0] = ""
    head[1] = "the the and and of of"
    head[5] = head[4]
    head[6] = "<p>Hello <b>World</b></p> visit http://x.y/a%20b?q=1+2"
    head[7] = "Café naïve coördinatie über façade"
    head[8] = head[8] + " " + "loremword " * 20
    return pa.concat_arrays([pa.array(head, pa.string()), texts.slice(16)])


def _iter_chunks(
    n_convs: int,
    seed: int,
    *,
    mean_turns: int = 10,
    zipf_s: float = 1.1,
    with_edge_cases: bool = True,
    conv_chunk: int = CONV_CHUNK,
):
    """Yield Arrow tables of consecutive conversations. One sequential RNG →
    fully deterministic for fixed (seed, n_convs, mean_turns, conv_chunk)."""
    rng = np.random.default_rng(seed)
    vocab = pa.array(_vocabulary(rng), pa.string())
    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    cdf[-1] = 1.0

    for c0 in range(0, n_convs, conv_chunk):
        nc = min(conv_chunk, n_convs - c0)
        turns_per_conv = np.maximum(1, rng.poisson(mean_turns, size=nc)).astype(np.int64)
        if with_edge_cases and c0 == 0 and nc >= 3:
            turns_per_conv[2] = 1  # single-turn conversation
        n_rows = int(turns_per_conv.sum())

        conv_ids = np.repeat(
            np.array([f"conv-{c:08d}" for c in range(c0, c0 + nc)]), turns_per_conv
        )
        turn_idx = (
            np.arange(n_rows, dtype=np.int64)
            - np.repeat(np.cumsum(turns_per_conv) - turns_per_conv, turns_per_conv)
        ).astype(np.int32)
        roles = ROLES[rng.choice(len(ROLES), size=n_rows, p=ROLE_P)]
        tool_vals = np.where(
            roles == "tool", TOOLS[rng.integers(0, len(TOOLS), size=n_rows)], None
        )

        # log-normal token counts, 5..500; token codes via inverse-CDF draw;
        # text assembly fully in Arrow: vocab.take(codes) → list → binary_join
        tok_counts = np.clip(rng.lognormal(3.0, 1.0, size=n_rows), 5, 500).astype(np.int64)
        total_toks = int(tok_counts.sum())
        codes = np.searchsorted(cdf, rng.random(total_toks), side="right")
        words = vocab.take(pa.array(codes, pa.int64()))
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(tok_counts, out=offsets[1:])
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), words)
        texts = pc.binary_join(lists, " ").cast(pa.string())

        if with_edge_cases and c0 == 0 and n_rows > 12:
            texts = _edge_case_texts(texts)

        ts = (
            EPOCH_US
            + np.repeat(np.arange(c0, c0 + nc, dtype=np.int64) * 3_600_000_000, turns_per_conv)
            + turn_idx.astype(np.int64) * 30_000_000
        )

        yield pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "turn_idx": pa.array(turn_idx, pa.int32()),
                "role": pa.array(roles, pa.string()),
                "text": texts,
                "tool": pa.array(tool_vals, pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            },
            schema=SCHEMA,
        )


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    *,
    mean_turns: int = 10,
    zipf_s: float = 1.1,
    with_edge_cases: bool = True,
) -> pa.Table:
    return pa.concat_tables(
        _iter_chunks(
            n_convs, seed, mean_turns=mean_turns, zipf_s=zipf_s,
            with_edge_cases=with_edge_cases,
        )
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
    ``out_dir`` (cached: regenerated only if missing). Returns the path.
    Large corpora stream chunk-by-chunk to ``shards`` row-balanced files
    without materializing the whole table."""
    # GEN_VERSION is part of the cache key: any change to the generator's
    # output for the same (seed, n_convs) must bump it, or stale /tmp corpora
    # from an older generator get silently reused in benchmarks.
    path = os.path.join(
        out_dir, f"transcripts-v{GEN_VERSION}-c{n_convs}-s{seed}-t{mean_turns}"
    )
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    if shards <= 1:
        chunks = list(_iter_chunks(n_convs, seed, mean_turns=mean_turns))
        tbl = pa.concat_tables(chunks) if len(chunks) > 1 else chunks[0]
        pq.write_table(tbl, os.path.join(path, "part-000.parquet"))
    else:
        # STREAM chunks straight into consecutive shard files — driver
        # memory is O(one chunk), never the corpus (the v2 generator
        # concatenated everything first, which at 64x bench scale would put
        # ~25 GB of text on the driver before writing a byte). Shard
        # boundaries target expected rows (n_convs x mean_turns); the global
        # row sequence is byte-identical to a full concat, so every
        # transcript oracle and the sorted-layout variants (consecutive
        # conversations per file, cuts possible mid-conversation) see the
        # same corpus.
        step = max(1, (n_convs * mean_turns + shards - 1) // shards)
        cur, written, writer = 0, 0, None
        for chunk in _iter_chunks(n_convs, seed, mean_turns=mean_turns):
            while chunk.num_rows:
                # the last shard absorbs any overflow (expected-rows step
                # can undershoot the actual total)
                take = (chunk.num_rows if cur == shards - 1
                        else min(step - written, chunk.num_rows))
                part = chunk.slice(0, take)
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(path, f"part-{cur:03d}.parquet"),
                        part.schema,
                    )
                writer.write_table(part)
                written += take
                chunk = chunk.slice(take)
                if written >= step and cur < shards - 1:
                    writer.close()
                    writer, cur, written = None, cur + 1, 0
        if writer is not None:
            writer.close()
    with open(done, "w") as f:
        f.write("ok")
    return path


# --------------------------------------------------------------------------
# Synthetic "web page" corpus for line-level cleaning operators (C4 rules).
# Same discipline as the transcript generator: one integer seed, no wall
# clock, identical Parquet for identical inputs. Pages are newline-joined
# lines drawn from a small set of shapes so every C4 rule fires on a
# non-trivial subset: clean sentences (terminal punctuation, >=3 words),
# no-punctuation fragments, short punctuated stubs, "javascript" notices,
# and page-level poison (lorem ipsum, curly braces, a planted bad word).
# --------------------------------------------------------------------------

WEBPAGE_GEN_VERSION = 1

_WP_WORDS = np.array(
    "content page article reader section update value story detail report "
    "notice result archive feature topic series review entry record item".split()
)


def generate_webpages(n_pages: int = 300, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    pages = []
    for pid in range(n_pages):
        n_lines = int(rng.integers(2, 12))
        lines = []
        for _ in range(n_lines):
            kind = rng.random()
            words = list(rng.choice(_WP_WORDS, size=int(rng.integers(3, 9))))
            if kind < 0.45:  # clean sentence
                lines.append(" ".join(words) + rng.choice([".", "!", "?", '"']))
            elif kind < 0.65:  # no terminal punctuation
                lines.append(" ".join(words))
            elif kind < 0.80:  # too short (under 3 words), punctuated
                lines.append(" ".join(words[: int(rng.integers(1, 3))]) + ".")
            else:  # javascript notice (punctuated, long enough)
                lines.append("please enable JavaScript to view the " + words[0] + ".")
        poison = rng.random()
        if poison < 0.06:
            lines.insert(int(rng.integers(0, len(lines))), "Lorem Ipsum dolor sit amet.")
        elif poison < 0.12:
            lines.insert(int(rng.integers(0, len(lines))), "function render() { return 1; }")
        elif poison < 0.17:
            lines.insert(int(rng.integers(0, len(lines))), "this page mentions unsafeword sadly.")
        pages.append("\n".join(lines))
    return pa.table(
        {
            "page_id": pa.array(range(n_pages), pa.int64()),
            "text": pa.array(pages, pa.string()),
        }
    )


def webpages_parquet(out_dir: str, n_pages: int = 300, seed: int = 7) -> str:
    """Materialize the web-page corpus under ``out_dir`` (cached). Pure
    pyarrow — callable from oracle_sql() without a Ray session."""
    path = os.path.join(
        out_dir, f"webpages-v{WEBPAGE_GEN_VERSION}-p{n_pages}-s{seed}"
    )
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    pq.write_table(generate_webpages(n_pages, seed), os.path.join(path, "part-000.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path
