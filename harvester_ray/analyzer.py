"""Versioned text analyzer: normalization + tokenization.

Analyzer identity is what makes BM25 scores reproducible across build, query
and oracle paths, so this module is the single source of truth for text
semantics, mirroring the reference's per-document normalization invariants:

- HTML tag stripping before indexing (reference strips Tika output with
  Django ``strip_tags``: harvester/files/models/datatypes/file.py:181-182).
- Giant-text cap: texts of >= 1,000,000 chars are truncated to their first
  10,000 whitespace-separated words (harvester/files/models/datatypes/
  file.py:183-185).
- Tokenization: lowercase + non-alphanumeric split (harvester/core/analysis/
  text.py:48-50 uses ``re.split(r"\\W+", text.lower())``; harvester/products/
  models/datatypes/product.py:176-180 strips non-alpha for suggestions).
  Analyzer v1 tokens are maximal ASCII ``[a-z0-9]+`` runs of the lowercased
  text — exactly mirrorable in DuckDB as
  ``regexp_extract_all(lower(text), '[a-z0-9]+')`` for oracle parity.
- Language clamp to {en, nl, unk} (harvester/core/utils/analyzers.py:6-14).

Everything here is vectorized over Arrow / numpy — no per-row Python in the
hot path except for the rare >=1M-char outlier rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ANALYZER_VERSION = "v1"
ANALYZER_VERSIONS = ("v1", "v2")

# ---------------------------------------------------------------------------
# analyzer v2: stopword + light-stemmer filters on top of the v1 chain.
# Reference analog: the OpenSearch nl/en language analyzers (stemmer +
# stopword token filters) configured for the reference's indices by the
# external search_client package (harvester/search/models/index.py:173-188).
# The filter tables ship as DATA so the DuckDB oracle mirrors them term for
# term (VERDICT r4 item 7's oracle strategy).
# ---------------------------------------------------------------------------

# Compact en+nl stopword list (subset of the classic Lucene english_stop /
# dutch_stop sets — small by design: every entry is mirrored into oracle SQL)
STOPWORDS_V2 = (
    # English (Lucene ENGLISH_STOP_WORDS_SET)
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
    # Dutch (head of the snowball dutch stop list)
    "de", "het", "een", "en", "van", "op", "te", "dat", "die", "der",
    "den", "met", "ze", "zij", "ook", "als", "aan", "bij", "nog", "om",
    "door", "over", "zo", "uit", "ik", "je", "hij", "wat", "werd", "naar",
)
_STOPSET_V2 = frozenset(STOPWORDS_V2)

# Ordered first-match-wins suffix rules, applied ONCE per token:
# (suffix, replacement, min_remaining_stem_chars). English rows follow
# Harman's S-stemmer plus light verbal endings; Dutch rows follow the
# Kraaij–Pohlmann light stemmer's plural/diminutive head. The "ss" row is
# a guard: -ss words must not lose their plural "s".
STEM_RULES_V2 = (
    ("sses", "ss", 2),
    ("ies", "y", 2),
    ("ss", "ss", 0),
    ("heden", "heid", 2),
    ("s", "", 3),
    ("ing", "", 3),
    ("ed", "", 3),
    ("ly", "", 3),
    ("en", "", 3),
)


def check_version(version: str) -> str:
    if version not in ANALYZER_VERSIONS:
        raise ValueError(f"unknown analyzer version {version!r}")
    return version


def stem_v2(tok: str) -> str:
    """First-match-wins single-pass suffix stem (the v2 rule table)."""
    for suf, repl, keep in STEM_RULES_V2:
        if tok.endswith(suf) and len(tok) - len(suf) >= keep:
            return tok[: len(tok) - len(suf)] + repl
    return tok

# Reference constants (files/models/datatypes/file.py:183-185)
MAX_TEXT_CHARS = 1_000_000
TRUNCATE_WORDS = 10_000

TOKEN_PATTERN = "[a-z0-9]+"
SPLIT_PATTERN = "[^a-z0-9]+"

# harvester/core/utils/analyzers.py:6-14 + settings/base.py:307
ANALYSER_LANGUAGES = ("en", "nl")
UNKNOWN_LANGUAGE = "unk"


def clamp_language(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Clamp a language column to {en, nl, unk} (core/utils/analyzers.py:6-14)."""
    arr = pc.fill_null(arr, UNKNOWN_LANGUAGE)
    known = pc.is_in(arr, value_set=pa.array(ANALYSER_LANGUAGES))
    return pc.if_else(known, arr, pa.scalar(UNKNOWN_LANGUAGE))


def strip_tags(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Remove ``<...>`` HTML/XML tags, replacing each with a space.

    Mirrors Django ``strip_tags`` as used on Tika output
    (files/models/datatypes/file.py:181-182); a space (not empty string)
    keeps word boundaries intact for the tokenizer.
    """
    return pc.replace_substring_regex(arr, pattern="<[^>]*>", replacement=" ")


def truncate_long_texts(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Apply the reference's giant-text rule: texts >= 1M chars keep only
    their first 10k whitespace words (files/models/datatypes/file.py:183-185).

    Vectorized length check; only offender rows (rare by construction) are
    processed in Python.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lengths = pc.utf8_length(pc.fill_null(arr, ""))
    offenders = np.flatnonzero(np.asarray(lengths) >= MAX_TEXT_CHARS)
    if offenders.size == 0:
        return arr
    values = arr.to_pylist()
    for i in offenders:
        values[i] = " ".join(values[i].split()[:TRUNCATE_WORDS])
    return pa.array(values, type=pa.string())


def normalize_text(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Full normalization: strip tags, cap giant texts. Deterministic and
    stable under re-application (idempotent for already-normalized text)."""
    out = strip_tags(pc.fill_null(arr, ""))
    return truncate_long_texts(out)


def apply_v2(
    row_ids: np.ndarray, codes: np.ndarray, dictionary: pa.Array
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """v2 token filters over a v1 flat stream: stopword drop, then the
    suffix stem — both computed on the batch DICTIONARY (distinct tokens,
    the vocabulary-bounded loop the house style allows); the stream itself
    sees one boolean gather and one int32 remap."""
    toks = dictionary.to_pylist()
    keep_dict = np.fromiter(
        (t not in _STOPSET_V2 for t in toks), dtype=bool, count=len(toks)
    )
    stemmed = pa.array([stem_v2(t) for t in toks], pa.string())
    enc = stemmed.dictionary_encode()
    remap = np.asarray(enc.indices, dtype=np.int32)
    mask = keep_dict[codes] if codes.size else np.empty(0, bool)
    return row_ids[mask], remap[codes[mask]], enc.dictionary


def tokenize_flat(
    arr: pa.Array | pa.ChunkedArray, version: str = "v1"
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Tokenize a string column into a flat token stream.

    Returns ``(row_ids, codes, dictionary)`` where ``row_ids[i]`` is the source
    row of flat token i, ``codes[i]`` is its id into ``dictionary`` (a
    ``pa.StringArray`` of distinct token strings for this batch). Empty-string
    artifacts of the split are removed. Fully vectorized (Arrow kernels +
    numpy); no Python loop over rows or tokens. ``version="v2"`` appends the
    stopword + stemmer filters (``apply_v2``).
    """
    check_version(version)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(arr, ""))
    token_lists = pc.split_pattern_regex(lowered, pattern=SPLIT_PATTERN)
    flat = pc.list_flatten(token_lists)
    lengths = np.asarray(pc.list_value_length(token_lists), dtype=np.int64)
    row_ids = np.repeat(np.arange(len(arr), dtype=np.int32), lengths)
    # dictionary-encode FIRST, then drop the '' artifact of the split by its
    # CODE — filtering int32 codes instead of take()-copying the flat string
    # array cuts the dominant memory traffic of this function (int32
    # throughout: batches are << 2^31 rows and per-batch vocab << 2^31)
    encoded = pc.dictionary_encode(flat)
    if isinstance(encoded, pa.ChunkedArray):
        encoded = encoded.combine_chunks()
    codes = np.asarray(encoded.indices, dtype=np.int32)
    dictionary = encoded.dictionary
    empty_pos = np.flatnonzero(np.asarray(pc.equal(dictionary, pa.scalar(""))))
    if empty_pos.size:
        keep = codes != np.int32(empty_pos[0])
        codes = codes[keep]
        row_ids = row_ids[keep]
    if version == "v2":
        return apply_v2(row_ids, codes, dictionary)
    return row_ids, codes, dictionary


def token_positions(row_ids: np.ndarray) -> np.ndarray:
    """Within-document ordinal (0-based) of each token in a flat stream.

    ``tokenize_flat`` emits tokens in document order with ``row_ids``
    non-decreasing, so the position of flat token i is its index within its
    row's run. Positions count the KEPT tokens (post empty-filter), matching
    the oracle tokenizer ``sql_tokenize_expr`` which never emits empties.
    Vectorized: one boundary diff + one gather."""
    n = row_ids.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(row_ids)) + 1))
    run_first = np.zeros(n, dtype=np.int64)
    run_first[starts] = starts
    np.maximum.accumulate(run_first, out=run_first)
    return np.arange(n, dtype=np.int64) - run_first


def doc_token_counts(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row token count (doc length |d| for BM25), vectorized."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    row_ids, _, _ = tokenize_flat(arr)
    return np.bincount(row_ids, minlength=len(arr)).astype(np.int64)


def term_frequencies(
    row_ids: np.ndarray, codes: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Aggregate a flat token stream into (row, code, tf) triples.

    Implemented as a vectorized sort + run-length encode over the
    ``(row, code)`` composite key; rows come back grouped by row then code.
    """
    if row_ids.size == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty
    # single composite-key sort: (row << 32) | code in one int64 array —
    # one in-place sort and one boundary diff instead of a two-key lexsort
    # plus two gathers (~2-3x less memory traffic on the hottest path)
    comp = row_ids.astype(np.int64)
    np.left_shift(comp, 32, out=comp)
    np.bitwise_or(comp, codes.astype(np.int64), out=comp)
    comp.sort()  # equal keys are indistinguishable — stability not needed
    boundary = np.empty(comp.size, dtype=bool)
    boundary[0] = True
    np.not_equal(comp[1:], comp[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    tf = np.diff(np.append(starts, comp.size)).astype(np.int64)
    keys = comp[starts]
    return (keys >> 32).astype(np.int64), (keys & 0xFFFFFFFF).astype(np.int64), tf


def analyze_table(tbl: pa.Table, *, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """ES ``_analyze`` API over a table: every token the indexer would emit,
    with its source row and 0-based ordinal — (id, pos, token) rows. Runs
    the full analyzer chain (tag strip → truncate → lower → split) through
    the same vectorized kernels the index build uses, so this IS the
    build-path tokenization, not a reimplementation."""
    ids = tbl[id_col].combine_chunks()
    row_ids, codes, dictionary = tokenize_flat(normalize_text(tbl[text_col]))
    pos = token_positions(row_ids)
    return pa.table({
        id_col: ids.take(pa.array(row_ids, pa.int64())),
        "pos": pa.array(pos, pa.int64()),
        "token": dictionary.take(pa.array(codes, pa.int32())),
    })


def tokenize_query(text: str, version: str = "v1") -> list[str]:
    """Tokenize a query string with the exact same analyzer as documents
    (simple_query_string parity: core/models/search/query.py:80-86).
    Version must match the index's manifest analyzer: a v2 index stores
    stems, so the query terms must stem identically."""
    import re

    check_version(version)
    toks = re.findall(TOKEN_PATTERN, text.lower())
    if version == "v2":
        toks = [stem_v2(t) for t in toks if t not in _STOPSET_V2]
    return toks


def _sql_stem_case_v2(var: str = "t") -> str:
    """One CASE expression mirroring ``stem_v2`` (ordered WHENs = the
    first-match-wins rule order)."""
    whens = []
    for suf, repl, keep in STEM_RULES_V2:
        cond = f"ends_with({var}, '{suf}') AND len({var}) >= {len(suf) + keep}"
        val = f"left({var}, len({var}) - {len(suf)})"
        if repl:
            val += f" || '{repl}'"
        whens.append(f"WHEN {cond} THEN {val}")
    return "CASE " + " ".join(whens) + f" ELSE {var} END"


def sql_tokenize_expr(col: str = "text", version: str = "v1") -> str:
    """The DuckDB expression exactly equivalent to analyzer
    normalize+tokenize (tag strip → lower → [a-z0-9]+ runs; v2 adds the
    stopword filter + stem CASE built from the SAME rule tables) — used by
    oracle SQL so engine and oracle share one tokenizer definition. The
    >=1M-char truncation rule is not expressed here (no such rows in
    oracle corpora; covered by unit tests)."""
    check_version(version)
    stripped = f"regexp_replace({col}, '<[^>]*>', ' ', 'g')"
    base = f"regexp_extract_all(lower({stripped}), '{TOKEN_PATTERN}')"
    if version == "v1":
        return base
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_V2)
    filtered = f"list_filter({base}, t -> t NOT IN ({stop_list}))"
    return f"list_transform({filtered}, t -> {_sql_stem_case_v2('t')})"


def crc_bucket(
    arr: pa.Array | pa.ChunkedArray, n_buckets: int
) -> np.ndarray:
    """``crc32(s) % n_buckets`` for a string column, hashing each DISTINCT
    value once via dictionary encoding and scattering through the codes
    (the ``_with_conv_bucket`` idiom from pipelines/transcripts.py — never
    a per-row Python hash loop). Returns an int32 array aligned with
    ``arr``."""
    import zlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    h = np.fromiter(
        (zlib.crc32(u.encode()) % n_buckets for u in uniq),
        dtype=np.int32, count=len(uniq),
    )
    codes = np.asarray(enc.indices)
    return h[codes] if len(codes) else np.empty(0, np.int32)
