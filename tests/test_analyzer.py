import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from harvester_ray import analyzer


def test_strip_tags():
    arr = pa.array(["<p>Hello <b>World</b></p>", "no tags", "<a href='x'>link</a>text"])
    out = analyzer.strip_tags(arr).to_pylist()
    assert out == [" Hello  World  ", "no tags", " link text"]


def test_truncate_long_texts():
    long_text = "word " * 300_000  # 1.5M chars
    arr = pa.array([long_text, "short"])
    out = analyzer.truncate_long_texts(arr).to_pylist()
    assert out[0] == " ".join(["word"] * analyzer.TRUNCATE_WORDS)
    assert out[1] == "short"


def test_tokenize_matches_reference_regex():
    texts = [
        "Hello, World-42 foo_bar",
        "",
        "   ",
        "Café naïve 123abc",
        "a%20b+c http://x.y/z?q=1",
    ]
    arr = pa.array(texts)
    rows, codes, dictionary = analyzer.tokenize_flat(arr)
    vocab = dictionary.to_pylist()
    got = [[] for _ in texts]
    for r, c in zip(rows, codes):
        got[r].append(vocab[c])
    expected = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    assert got == expected


def test_term_frequencies_matches_counter():
    texts = ["a b a c b a", "z z z", "", "q"]
    arr = pa.array(texts)
    rows, codes, dictionary = analyzer.tokenize_flat(arr)
    r, c, tf = analyzer.term_frequencies(rows, codes)
    vocab = dictionary.to_pylist()
    got: dict[tuple[int, str], int] = {}
    for ri, ci, t in zip(r, c, tf):
        got[(int(ri), vocab[ci])] = int(t)
    expected = {}
    for i, t in enumerate(texts):
        for w, n in Counter(t.split()).items():
            expected[(i, w)] = n
    assert got == expected


def test_doc_token_counts():
    arr = pa.array(["one two three", "", "a-b,c"])
    np.testing.assert_array_equal(analyzer.doc_token_counts(arr), [3, 0, 3])


def test_clamp_language():
    arr = pa.array(["en", "nl", "de", None, "fr"])
    assert analyzer.clamp_language(arr).to_pylist() == ["en", "nl", "unk", "unk", "unk"]


def test_query_tokenizer_same_as_doc_tokenizer():
    q = "Hello WORLD-42"
    assert analyzer.tokenize_query(q) == ["hello", "world", "42"]


def test_normalize_idempotent():
    arr = pa.array(["<p>x</p> y", "plain"])
    once = analyzer.normalize_text(arr)
    twice = analyzer.normalize_text(once)
    assert once.to_pylist() == twice.to_pylist()


def test_analyzer_v2_stem_and_stop():
    from harvester_ray import analyzer

    assert analyzer.stem_v2("stories") == "story"
    assert analyzer.stem_v2("glasses") == "glass"
    assert analyzer.stem_v2("class") == "class"      # -ss guard
    assert analyzer.stem_v2("mogelijkheden") == "mogelijkheid"
    assert analyzer.stem_v2("running") == "runn"     # single-pass, no recode
    assert analyzer.stem_v2("been") == "been"        # min-stem guard
    assert analyzer.tokenize_query("The cats and Dogs", "v2") == ["cat", "dog"]
    with pytest.raises(ValueError):
        analyzer.tokenize_query("x", "v3")


def test_analyzer_v2_flat_matches_sql():
    import duckdb

    from harvester_ray import analyzer

    texts = [
        "The Stories of running dogs", "de mogelijkheden en boeken",
        "", "<b>Classes</b> crossed 123s",
    ]
    r, c, d = analyzer.tokenize_flat(
        analyzer.normalize_text(pa.array(texts)), version="v2"
    )
    toks = d.take(pa.array(c, pa.int32())).to_pylist()
    eng = [[] for _ in texts]
    for ri, t in zip(r, toks):
        eng[ri].append(t)
    con = duckdb.connect()
    expr = analyzer.sql_tokenize_expr("t", version="v2")
    for i, txt in enumerate(texts):
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [txt]).fetchone()[0]
        assert got == eng[i], (txt, got, eng[i])


def test_v2_index_end_to_end(ray_session, tmp_path):
    """A v2 index stores stems: stopword-laden plural queries must hit, the
    manifest records the version, and the result must DIFFER from the same
    corpus under v1 (degeneracy probe)."""
    import ray.data as rd

    from harvester_ray.index import build as ib
    from harvester_ray.index import query as iq

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the spark engines run windows",
            "sparks and windowing galore windows",
            "nothing relevant here at all",
        ]),
    })
    r1 = str(tmp_path / "v1")
    r2 = str(tmp_path / "v2")
    ib.build_index(rd.from_arrow(docs), r1)
    ib.build_index(rd.from_arrow(docs), r2, analyzer_version="v2")
    rd1, rd2 = iq.IndexReader(r1), iq.IndexReader(r2)
    assert rd1.analyzer_version == "v1" and rd2.analyzer_version == "v2"
    v2 = rd2.search("the sparks windowing", k=10, mode="and").to_pandas()
    assert set(v2["doc_id"]) == {1, 2}  # stems merge spark/sparks, window*
    v1 = rd1.search("the sparks windowing", k=10, mode="and").to_pandas()
    assert set(v1["doc_id"]) != set(v2["doc_id"])  # not degenerate
