"""Query-time synonym expansion + decompounding (index/synonyms.py)."""

from harvester_ray.index import synonyms


def _lookup(vocab):
    return lambda terms: {t: (1 if t in vocab else 0) for t in terms}


def test_decompound_two_parts():
    vocab = {"fiets", "pad", "fietspad" }
    # OOV check happens in expand_query; decompound itself just splits
    assert synonyms.decompound(_lookup(vocab), "fietspad") == ["fiets", "pad"]


def test_decompound_prefers_fewest_then_longest():
    vocab = {"voet", "bal", "voetbal", "len"}
    # "voetballen": voetbal+len (2 parts) beats voet+bal+len (3 parts)
    assert synonyms.decompound(_lookup(vocab), "voetballen") == ["voetbal", "len"]


def test_decompound_rejects_partial_cover():
    vocab = {"fiets"}
    assert synonyms.decompound(_lookup(vocab), "fietspad") == []
    assert synonyms.decompound(_lookup(vocab), "fiets") == []  # too short to split


def test_expand_query_synonyms_and_oov_decompound():
    vocab = {"fast", "big", "spark", "scan", "window"}
    out = synonyms.expand_query(
        _lookup(vocab),
        "sparkscan rapid",
        synonyms={"rapid": ["fast"]},
    )
    # sorted query terms: rapid, sparkscan; rapid is OOV but has no split
    assert out == ["rapid", "fast", "sparkscan", "spark", "scan"]


def test_expand_query_in_vocab_term_not_decompounded():
    vocab = {"handschoen", "hand", "schoen"}
    out = synonyms.expand_query(_lookup(vocab), "handschoen")
    assert out == ["handschoen"]  # already matches; no expansion noise
