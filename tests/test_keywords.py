"""TF-IDF keywords + PMI collocations (ops/keywords.py)."""

import math

import numpy as np
import pyarrow as pa

from harvester_ray.ops import keywords


def _ds(texts, ids=None):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


TEXTS = [
    "spark streams data fast",
    "spark batch data",
    "rare unicorn spark",
    "data data data spark",
    "",  # token-less doc still counts toward N
]


def test_corpus_df(ray_session):
    df, n = keywords.corpus_df(_ds(TEXTS))
    assert n == 5
    m = dict(zip(df["term"], df["n"]))
    assert m["spark"] == 4 and m["data"] == 3 and m["unicorn"] == 1


def test_tfidf_scores_and_ranks(ray_session):
    out = keywords.tfidf_keywords(_ds(TEXTS), k=2)
    # doc 2: unicorn (tf=1, df=1) and rare (tf=1, df=1) beat spark (df=4)
    d2 = out[out["doc_id"] == 2].sort_values("rank")
    assert list(d2["term"]) == ["rare", "unicorn"]  # tie → term asc
    exp = round(1 * math.log(5 / 1), 4)
    assert list(d2["tfidf"]) == [exp, exp]
    # doc 3: data tf=3 df=3 → 3·ln(5/3) ranks above spark tf=1 df=4
    d3 = out[out["doc_id"] == 3].sort_values("rank")
    assert list(d3["term"]) == ["data", "spark"]
    # token-less doc emits no rows; every other doc has ≤ k rows
    assert (out["doc_id"] != 4).all()
    assert out.groupby("doc_id").size().max() <= 2


def test_tfidf_partition_independent(ray_session):
    a = keywords.tfidf_keywords(_ds(TEXTS * 8, ids=list(range(40))), k=3)
    b = keywords.tfidf_keywords(
        _ds(TEXTS * 8, ids=list(range(40))).repartition(7), k=3
    )
    assert a.equals(b)


def test_collocations_pmi(ray_session):
    texts = ["big apple pie"] * 6 + ["big data", "apple pie chart"] * 3
    out = keywords.collocations_pmi(_ds(texts), k=10, min_count=5)
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("apple", "pie") in pairs and ("big", "apple") in pairs
    # "apple pie" (9 of 21 bigrams) is a stronger collocation than chance
    row = out[(out["w1"] == "apple") & (out["w2"] == "pie")].iloc[0]
    assert row["n_pair"] == 9 and row["pmi"] > 0
    # min_count filters the 3-count pairs
    assert ("data", "big") not in pairs and ("pie", "chart") not in pairs


def test_collocations_partition_independent(ray_session):
    texts = ["alpha beta gamma alpha beta"] * 30
    a = keywords.collocations_pmi(_ds(texts), k=5, min_count=2)
    b = keywords.collocations_pmi(_ds(texts).repartition(6), k=5, min_count=2)
    assert a.equals(b)


def test_empty_corpus(ray_session):
    out = keywords.tfidf_keywords(_ds(["", ""]), k=3)
    assert len(out) == 0
    out2 = keywords.collocations_pmi(_ds(["", ""]), k=3, min_count=1)
    assert len(out2) == 0


def test_bpe_pair_counts(ray_session):
    out = keywords.bpe_pair_counts(_ds(["abab abab", "ab cd"]), k=10)
    m = {(r["left_sym"], r["right_sym"]): r["n"] for _, r in out.iterrows()}
    # "abab" ×2 tokens: pairs per occurrence ab,ba,ab → ab=2·2+1 (the "ab"
    # token adds one), ba=1·2
    assert m[("a", "b")] == 5 and m[("b", "a")] == 2 and m[("c", "d")] == 1
    # ranked by count desc then pair
    assert list(out.iloc[0][["left_sym", "right_sym"]]) == ["a", "b"]


def test_bpe_partition_independent(ray_session):
    texts = ["hello world " * 5] * 40
    a = keywords.bpe_pair_counts(_ds(texts), k=20)
    b = keywords.bpe_pair_counts(_ds(texts).repartition(7), k=20)
    assert a.equals(b)


def test_unigram_logprob(ray_session):
    import math

    out = keywords.unigram_logprob(_ds(["a a b", "a", ""]))
    # corpus tokens: a,a,b,a → cf(a)=3, cf(b)=1, U=4
    lp_a = math.floor(math.log(3 / 4) * 1e9 + 0.5)
    lp_b = math.floor(math.log(1 / 4) * 1e9 + 0.5)
    d0 = out[out["doc_id"] == 0].iloc[0]
    assert d0["n_tokens"] == 3
    assert d0["logprob"] == round((2 * lp_a + lp_b) / 1e9, 6)
    assert d0["lp_per_token"] == round((2 * lp_a + lp_b) / 1e9 / 3, 6)
    # empty doc present with zeros
    d2 = out[out["doc_id"] == 2].iloc[0]
    assert d2["n_tokens"] == 0 and d2["logprob"] == 0.0 and d2["lp_per_token"] == 0.0
    # typical text (common terms) scores higher per token than rare text
    assert out[out["doc_id"] == 1].iloc[0]["lp_per_token"] > d0["lp_per_token"]


def test_unigram_logprob_partition_independent(ray_session):
    texts = [f"tok{i % 17} tok{i % 5} filler common" for i in range(80)]
    a = keywords.unigram_logprob(_ds(texts))
    b = keywords.unigram_logprob(_ds(texts).repartition(9))
    assert a.equals(b)


def test_fuzzy_token_pairs(ray_session):
    out = keywords.fuzzy_token_pairs(
        _ds(["spark sparks shark spoon fork"]), min_len=4, max_dist=2
    )
    m = {(r["tok_a"], r["tok_b"]): r["dist"] for _, r in out.iterrows()}
    assert m[("spark", "sparks")] == 1  # insertion
    assert m[("shark", "spark")] == 1  # substitution
    assert m[("shark", "sparks")] == 2  # sub + insert
    assert ("fork", "spoon") not in m
    # completeness: different first chars still found (SymSpell property)
    out2 = keywords.fuzzy_token_pairs(_ds(["cats bats"]), min_len=4, max_dist=1)
    assert list(out2.itertuples(index=False)) and out2.iloc[0]["dist"] == 1


def test_cooccurrence_pairs(ray_session):
    texts = ["alpha beta gamma"] * 6 + ["alpha beta"] * 3
    out = keywords.cooccurrence_pairs(_ds(texts), k=10, min_count=2)
    m = {(r["w1"], r["w2"]): r["n"] for _, r in out.iterrows()}
    assert m[("alpha", "beta")] == 9
    assert m[("alpha", "gamma")] == 6 and m[("beta", "gamma")] == 6
    # repeated term within a doc counts once per doc (distinct-pair rule)
    out2 = keywords.cooccurrence_pairs(_ds(["x x y"] * 4), k=5, min_count=2)
    assert {(r["w1"], r["w2"]): r["n"] for _, r in out2.iterrows()} == {("x", "y"): 4}


def test_cooccurrence_partition_independent(ray_session):
    texts = [f"common tok{i % 7} other{i % 3}" for i in range(60)]
    a = keywords.cooccurrence_pairs(_ds(texts), k=20, min_count=2)
    b = keywords.cooccurrence_pairs(_ds(texts).repartition(8), k=20, min_count=2)
    assert a.equals(b)


def test_zipf_slope(ray_session):
    # construct an exact Zipf corpus: term i appears round(100/rank) times
    words = []
    for rank, t in enumerate(["alpha", "beta", "gamma", "delta"], start=1):
        words += [t] * (100 // rank)
    out = keywords.zipf_slope(_ds([" ".join(words)]))
    r = out.iloc[0]
    assert r["n_vocab"] == 4
    assert -1.15 < r["slope"] < -0.85  # near the Zipf exponent −1


def test_heaps_law(ray_session):
    # V(n) = n (every token new) → beta = 1, ln_k = 0 exactly
    docs = [" ".join(f"w{i*7+j}" for j in range(7)) for i in range(20)]
    out = keywords.heaps_law(_ds(docs), points=5)
    r = out.iloc[0]
    assert r["n_docs"] == 20 and r["n_points"] == 5
    assert r["beta"] == 1.0 and r["ln_k"] == 0.0
    # repeated single word → vocab flat at 1: beta = 0
    flat = keywords.heaps_law(_ds(["hello"] * 16), points=4)
    assert flat.iloc[0]["beta"] == 0.0


def test_burstiness(ray_session):
    # "a" bursts inside one doc (cf=4, df=1 → B=4); "b" spreads (B=1)
    out = keywords.burstiness(_ds(["a a a a", "b", "b", "b", "b"]), k=10)
    assert list(out["term"]) == ["a", "b"]  # cf tie (4,4) → term asc
    assert list(out["rank"]) == [1, 2]
    assert list(out["burstiness"]) == [4.0, 1.0]
    assert list(out["cf"]) == [4, 4] and list(out["df"]) == [1, 4]
    # half-up fixed-point: cf=3, df=2 → 1.5 exactly
    half = keywords.burstiness(_ds(["c c", "c"]), k=1)
    assert half.iloc[0]["burstiness"] == 1.5


def test_stylometry_delta(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "source": pa.array(["a", "b", "c"]),
            "text": pa.array(["x x y", "x x y", "y y x"]),  # c inverts the style
        }
    )
    out = keywords.stylometry_delta(rd.from_arrow(t), k=2).set_index(["source_a", "source_b"])
    assert out.loc[("a", "b")]["delta"] == 0.0  # identical style
    ac, bc = out.loc[("a", "c")]["delta"], out.loc[("b", "c")]["delta"]
    assert ac == bc and ac > 1.0  # the outlier stands off symmetrically
    assert all(out["n_terms"] == 2)


def test_syllable_stats(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b"]),
            # "hello"→2 vowel runs, "world"→1; "queue"→2 (ueue is one run? no: u-e-ue → "ueue" is one run)
            "text": pa.array(["hello world", "xyz", "aeiou bcd"]),
        }
    )
    out = keywords.syllable_stats(rd.from_arrow(t)).set_index("source")
    a = out.loc["a"]
    assert a["n_docs"] == 2 and a["n_words"] == 3
    assert a["n_syllables"] == 3  # hello(2) + world(1) + xyz(0)
    assert a["syll_per_word"] == 1.0
    b = out.loc["b"]
    assert b["n_words"] == 2 and b["n_syllables"] == 1  # "aeiou"=1 run, "bcd"=0
    assert b["syll_per_word"] == 0.5


def test_gini_vocab(ray_session):
    # uniform counts → G = 0 exactly
    out = keywords.gini_vocab(_ds(["a b c d", "a b c d"]))
    r = out.iloc[0]
    assert r["n_vocab"] == 4 and r["total_tokens"] == 8 and r["gini"] == 0.0
    # counts 1,1,6 ascending: G = (2·(1+2+18) − 4·8)/(3·8) = 10/24
    skew = keywords.gini_vocab(_ds(["x x x x x x y z"]))
    assert skew.iloc[0]["gini"] == ((2 * 10 * 1_000_000 + 24) // 48) / 1e6


def test_vocab_coverage(ray_session):
    words = ["big"] * 6 + ["mid"] * 3 + ["rare"]  # total 10 tokens
    out = keywords.vocab_coverage(_ds([" ".join(words)]), ks=(1, 2, 99))
    m = {r["k"]: r for _, r in out.iterrows()}
    assert m[1]["covered"] == 6 and m[1]["coverage"] == 0.6
    assert m[2]["covered"] == 9 and m[2]["coverage"] == 0.9
    assert m[99]["n_terms"] == 3 and m[99]["coverage"] == 1.0


def test_bpe_learn_merges_greedy_and_iterative(ray_session):
    # "aaa" f=2, "ab" f=1. Step 1: (a,a) counted at BOTH positions of
    # 'aaa' → 2·2 = 4 beats (a,b) = 1. Greedy rewrite: 'aaa' → (aa)(a),
    # NOT (a)(aa) and never (aa)(aa) — so step 2 sees ('aa','a') = 2
    # beating ('a','b') = 1: the composite symbol proves iteration.
    out = keywords.bpe_learn_merges(_ds(["aaa aaa", "ab"]), n_merges=2)
    assert list(out["step"]) == [1, 2]
    assert (out.iloc[0]["left_sym"], out.iloc[0]["right_sym"]) == ("a", "a")
    assert out.iloc[0]["n"] == 4
    assert (out.iloc[1]["left_sym"], out.iloc[1]["right_sym"]) == ("aa", "a")
    assert out.iloc[1]["n"] == 2


def test_bpe_learn_merges_matches_oracle_and_composes(ray_session):
    import duckdb
    import ray.data as rd

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.execute(
        keywords.bpe_learn_merges_sql("documents", n_merges=8)
    ).fetchdf()
    got = keywords.bpe_learn_merges(
        rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        ),
        n_merges=8,
    )
    assert got.values.tolist() == exp.values.tolist()
    # non-degeneracy: a later merge must consume an earlier merged symbol,
    # or the gate couldn't tell iterative training from a static top-k
    multi = (got["left_sym"].str.len() > 1) | (got["right_sym"].str.len() > 1)
    assert multi.any()


def test_bpe_learn_merges_partition_independent(ray_session):
    a = keywords.bpe_learn_merges(_ds(TEXTS), n_merges=3)
    b = keywords.bpe_learn_merges(_ds(TEXTS).repartition(5), n_merges=3)
    assert a.values.tolist() == b.values.tolist()


def test_bpe_encode_counts(ray_session):
    # merges learned on ["aaa aaa", "ab"]: step1 (a,a) → step2 (aa,a).
    # After 2 merges: 'aaa' = (aaa) → 1 token, 'ab' = (a)(b) → 2 tokens.
    out = keywords.bpe_encode_counts(
        _ds(["aaa aaa", "ab", ""], ids=[1, 2, 3]), n_merges=2
    )
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["n_tokens"]) == [2, 2, 0]
    # 0 merges: token count == char count of the tokenized words
    out0 = keywords.bpe_encode_counts(
        _ds(["aaa aaa", "ab"], ids=[1, 2]), n_merges=0
    )
    assert list(out0["n_tokens"]) == [6, 2]


def test_bpe_fertility_by_lang(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aaa aaa", "aaa ab", "xy xy"]),
            "lang": pa.array(["en", "en", "de"]),
        })
    )
    out = keywords.bpe_fertility_by_lang(ds, n_merges=2)
    # merges: step1 (a,a) n=6, step2 (aa,a) n=3 -> 'aaa'=1 tok, 'ab'=2, 'xy'=2
    assert list(out["lang"]) == ["de", "en"]
    assert list(out["n_words"]) == [2, 4]
    assert list(out["n_tokens"]) == [4, 5]
    assert list(out["fertility"]) == [2.0, 1.25]
    # partition independence
    out2 = keywords.bpe_fertility_by_lang(ds.repartition(3), n_merges=2)
    assert out.values.tolist() == out2.values.tolist()


def test_dsir_weights(ray_session):
    import math

    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["hund katze", "hund hund", "dog cat", ""]),
            "lang": pa.array(["de", "de", "en", "en"]),
        })
    )
    out = keywords.dsir_weights(ds, target_lang="en")
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    # token-free doc scores 0 and is kept
    assert out.iloc[3]["n_tokens"] == 0 and out.iloc[3]["log_weight"] == 0.0
    # target-language tokens must outweigh source-only tokens
    assert out.iloc[2]["log_weight"] > out.iloc[0]["log_weight"]
    # exact value: u_all=6, u_tgt=2, V=4; 'dog'/'cat': cf_all=1, cf_tgt=1
    d = math.floor((math.log(2 / 6) - math.log(2 / 10)) * 1e9 + 0.5)
    assert out.iloc[2]["log_weight"] == round(2 * d / 1e9, 6)
    # partition independence
    out2 = keywords.dsir_weights(ds.repartition(3), target_lang="en")
    assert out.values.tolist() == out2.values.tolist()


def _dom_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "source": pa.array([r[2] for r in rows]),
            }
        )
    )


def test_doremi_weights_upweights_hard_domain(ray_session):
    # domain "web" is all common tokens (low NLL); "code" has rare tokens
    rows = [(i, "common shared tokens here", "web") for i in range(8)]
    rows += [(10 + i, f"rare{i} unique{i} singleton{i}", "code") for i in range(4)]
    out = keywords.doremi_weights(_dom_ds(rows))
    assert list(out.columns) == ["domain", "n_docs", "n_tokens", "mean_nll", "weight"]
    assert list(out["domain"]) == ["code", "web"]
    code, web = out.iloc[0], out.iloc[1]
    assert code["n_docs"] == 4 and web["n_docs"] == 8
    # hard domain gets all the weight; easy domain at/below corpus mean → 0
    assert code["weight"] > 0 and web["weight"] == 0.0
    assert code["mean_nll"] > web["mean_nll"]
    # weights sum to ~1 when any domain has excess loss
    assert abs(out["weight"].sum() - 1.0) < 1e-5


def test_doremi_weights_uniform_corpus_all_zero(ray_session):
    rows = [(i, "same text every doc", f"d{i % 3}") for i in range(9)]
    out = keywords.doremi_weights(_dom_ds(rows))
    # identical per-token NLL everywhere → no excess anywhere → zero weights
    assert (out["weight"] == 0.0).all()
    assert out["n_docs"].sum() == 9


def test_doremi_weights_partition_independent(ray_session):
    rows = [(i, f"tok{i % 7} tok{i % 3} base text", f"d{i % 4}") for i in range(60)]
    a = keywords.doremi_weights(_dom_ds(rows))
    b = keywords.doremi_weights(_dom_ds(rows).repartition(9))
    assert a.equals(b)
