"""Benchmark n-gram decontamination (ops/decontam.py)."""

import pyarrow as pa

from harvester_ray.ops import decontam


def _ds(rows):
    import ray.data as rd

    ids, texts = zip(*rows) if rows else ((), ())
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(list(ids), pa.int64()), "text": pa.array(list(texts))})
    )


def test_overlap_counts_and_flags(ray_session):
    corpus = _ds(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench doc's 5-grams
            (2, "one two three four five six seven"),  # disjoint
            (3, "tiny doc"),  # shorter than n → single whole-text shingle
        ]
    )
    bench = _ds([(10, "alpha beta gamma delta epsilon"), (11, "tiny doc")])
    out = (
        decontam.decontaminate(corpus, bench, shingle_n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1: 2 distinct 5-grams, 1 shared with bench doc 10
    assert out.loc[0, ["n_ngrams", "n_contaminated"]].tolist() == [2, 1]
    assert bool(out.loc[0, "contaminated"])
    assert out.loc[1, "n_contaminated"] == 0 and not bool(out.loc[1, "contaminated"])
    # doc 3 == bench doc 11 verbatim (sub-n doc hashes as one whole-text gram)
    assert out.loc[2, ["n_ngrams", "n_contaminated"]].tolist() == [1, 1]


def test_empty_benchmark_flags_nothing(ray_session):
    corpus = _ds([(1, "a b c d e f g")])
    bench = _ds([(9, "")])  # no tokens → empty n-gram set
    out = decontam.decontaminate(corpus, bench, shingle_n=5).to_pandas()
    assert out["n_contaminated"].tolist() == [0]
    assert not out["contaminated"].any()


def test_phrase_decontaminate(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps",      # contains 'quick brown fox'
            "quick brown wolf runs fast",     # partial only -> clean
            "a quick brown fox and a quick brown fox again",  # 2 hits
            "",                               # token-free -> clean
        ]),
    }))
    out = (
        decontam.phrase_decontaminate(ds, ["Quick BROWN fox", "zz qq"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["n_hits"]) == [1, 0, 2, 0]
    assert list(out["contaminated"]) == [True, False, True, False]


def _emb_ds(rows):
    import ray.data as rd

    ids, vecs = zip(*rows) if rows else ((), ())
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(ids), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        )
    )


def test_semantic_decontam_flags_and_ties(ray_session):
    # bench = vec_id % 5 == 0 → {0, 5}; both bench vectors are identical, so
    # the argmax tie must resolve to the LOWER bench id (0).
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # sim 1.0 vs both → contaminated, bench_id 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal → sim 0.0
        (3, [0.8, 0.6, 0.0]),   # sim 0.8
    ]
    out = decontam.semantic_decontam(_emb_ds(rows), bench_mod=5, tau=0.75)
    assert out["vec_id"].tolist() == [1, 2, 3]
    assert out["bench_id"].tolist() == [0, 0, 0]
    assert out["max_sim"].tolist() == [1.0, 0.0, 0.8]
    assert out["contaminated"].tolist() == [True, False, True]


def test_semantic_decontam_empty_bench(ray_session):
    out = decontam.semantic_decontam(
        _emb_ds([(1, [1.0, 0.0]), (2, [0.0, 1.0])]), bench_mod=5, tau=0.5
    )
    assert out.empty
    assert list(out.columns) == ["vec_id", "bench_id", "max_sim", "contaminated"]
