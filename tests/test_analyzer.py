import re
from collections import Counter

import numpy as np
import pyarrow as pa

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
