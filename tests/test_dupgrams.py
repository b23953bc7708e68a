"""Duplicated-n-gram fraction (ops/dupgrams.py) + weighted sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import dupgrams, sampling


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_dup_fraction_basic(ray_session):
    # doc0 and doc1 share a 3-gram ("a b c"); doc2 is unique
    out = (
        dupgrams.dup_ngram_fraction(
            _docs(["a b c d", "x a b c", "p q r s"]), shingle_n=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_ngrams"]) == [2, 2, 2]
    assert list(out["n_dup"]) == [1, 1, 0]
    assert list(out["dup_frac"]) == [0.5, 0.5, 0.0]


def test_dup_fraction_partition_independent(ray_session):
    texts = [f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7} w{i} tail{i % 3}" for i in range(40)]
    a = dupgrams.dup_ngram_fraction(_docs(texts), shingle_n=3).to_pandas()
    b = dupgrams.dup_ngram_fraction(_docs(texts).repartition(9), shingle_n=3).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dup_fraction_short_and_empty_docs(ray_session):
    # "a b" (< n tokens) gets one fallback shingle; "" yields no row
    out = (
        dupgrams.dup_ngram_fraction(_docs(["a b", "a b", ""]), shingle_n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 1]
    assert list(out["dup_frac"]) == [1.0, 1.0]


def _weights(ws):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(ws)), pa.int64()),
                "w": pa.array(ws, pa.float64()),
            }
        )
    )


def test_weighted_sample_determinism_and_size(ray_session):
    ws = [float(1 + (i % 10)) for i in range(200)]
    a = sampling.weighted_sample(_weights(ws), k=15, weight_col="w")
    b = sampling.weighted_sample(_weights(ws).repartition(8), k=15, weight_col="w")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 15 and a["doc_id"].is_unique


def test_weighted_sample_favors_heavy(ray_session):
    # one dominant weight should essentially always be selected
    ws = [1.0] * 100 + [10000.0]
    out = sampling.weighted_sample(_weights(ws), k=5, weight_col="w")
    assert 100 in set(out["doc_id"])


def test_weighted_sample_excludes_nonpositive(ray_session):
    out = sampling.weighted_sample(_weights([0.0, -2.0, 3.0, 5.0]), k=10, weight_col="w")
    assert set(out["doc_id"]) == {2, 3}


def test_jaccard_candidates_cross_max_bucket(ray_session):
    """Hot-bucket cap: capped groups must only suppress their OWN pairs —
    the masked group's rows still occupy the sorted stream, so later
    groups' offsets must not shift (regression: zeroing n0/n1 corrupted
    the cumsum layout, emitting corpus x corpus garbage and dropping
    legitimate cross pairs)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import dedup

    hot = "hot hot hot"  # one 3-gram shared by 12 docs -> capped at 4
    corpus = pd.DataFrame({
        "doc_id": list(range(9)),
        "text": [hot] * 6 + ["zz yy xx", "aa bb cc", "dd ee ff"],
    })
    delta = pd.DataFrame({
        "doc_id": list(range(100, 109)),
        "text": [hot] * 6 + ["zz yy xx", "aa bb cc", "dd ee ff"],
    })
    cds = rd.from_arrow(pa.Table.from_pandas(corpus, preserve_index=False))
    dds = rd.from_arrow(pa.Table.from_pandas(delta, preserve_index=False))
    # n_partitions=1 forces every shingle group into ONE pandas group so a
    # capped group precedes emitted ones in the sorted stream
    got = (
        dedup.jaccard_candidates_cross(cds, dds, max_bucket=4, n_partitions=1)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert set(zip(got["doc_a"], got["doc_b"])) == {(6, 106), (7, 107), (8, 108)}
    assert (got["doc_a"] < 100).all() and (got["doc_b"] >= 100).all()
    assert (got["n_shared"] == 1).all()
    # uncapped: the hot bucket contributes all 6x6 cross pairs as well
    full = dedup.jaccard_candidates_cross(cds, dds, n_partitions=1).to_pandas()
    assert len(full) == 36 + 3
    assert (full["doc_a"] < 100).all() and (full["doc_b"] >= 100).all()


def test_near_dup_incremental_oracle(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import dedup

    corpus = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma delta eps zeta",
            "one two three four five six seven",
            "quick brown fox jumps over the lazy dog",
            "totally different content here now",
        ],
    })
    delta = pd.DataFrame({
        "doc_id": [100, 101, 102],
        "text": [
            "alpha beta gamma delta eps zeta",         # exact dup of 0
            "one two three four five six EIGHT",       # near-dup of 1
            "nothing in common with anything",          # fresh
        ],
    })
    cds = rd.from_arrow(pa.Table.from_pandas(corpus, preserve_index=False))
    dds = rd.from_arrow(pa.Table.from_pandas(delta, preserve_index=False))
    got = (
        dedup.near_dup_incremental(cds, dds, threshold=0.3)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus_side", corpus)
    con.register("delta_side", delta)
    exp = con.execute(dedup.ngram_jaccard_cross_sql(threshold=0.3)).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert set(zip(got["doc_a"], got["doc_b"])) == {(0, 100), (1, 101)}
    assert got.set_index("doc_b").loc[100, "jaccard"] == 1.0
    # no delta x delta or corpus x corpus pairs ever
    assert (got["doc_a"] < 100).all() and (got["doc_b"] >= 100).all()
    # partition-independence
    again = (
        dedup.near_dup_incremental(cds.repartition(3), dds.repartition(2), threshold=0.3)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again, check_dtype=False)
    # admission regime: a generous M reproduces the exact pair set; M=1
    # still finds each delta doc's best match (the planted dups rank first
    # on shared shingles)
    capped = (
        dedup.near_dup_incremental(cds, dds, threshold=0.3, top_m_per_delta=8)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, capped, check_dtype=False)
    one = (
        dedup.near_dup_incremental(cds, dds, threshold=0.3, top_m_per_delta=1)
        .to_pandas()
    )
    assert set(zip(one["doc_a"], one["doc_b"])) == {(0, 100), (1, 101)}
    # minhash candidate regime: the exact twin collides in every band, so
    # the verified pair set must include it; near-dup of 1 at j~0.66 also
    # collides with overwhelming probability at 16 bands x r=4
    mh = (
        dedup.near_dup_incremental(cds, dds, threshold=0.3, method="minhash")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert (0, 100) in set(zip(mh["doc_a"], mh["doc_b"]))
    got2 = set(zip(mh["doc_a"], mh["doc_b"]))
    assert got2 <= set(zip(got["doc_a"], got["doc_b"]))  # verify is exact
    # partition-independence of the banded path
    mh2 = (
        dedup.near_dup_incremental(
            cds.repartition(3), dds.repartition(2), threshold=0.3, method="minhash")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mh, mh2, check_dtype=False)


def test_verify_pairs_large_ids(ray_session):
    """Regression: doc ids above 2^53 (e.g. re-keyed delta ids with a high
    bit set) were mantissa-rounded when the verify exchange's nullable
    int64 ``other`` column became float64 in the pandas group, silently
    dropping pairs in the second-pass merge."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import dedup

    big = 1 << 62
    corpus = pd.DataFrame({
        "doc_id": [3, 5, 7],
        "text": [
            "alpha beta gamma delta epsilon",
            "one two three four five",
            "unique content entirely here",
        ],
    })
    delta = pd.DataFrame({
        "doc_id": [big | 3, big | 5],
        "text": [
            "alpha beta gamma delta epsilon",   # twin of 3
            "one two three four five",          # twin of 5
        ],
    })
    cds = rd.from_arrow(pa.Table.from_pandas(corpus, preserve_index=False))
    dds = rd.from_arrow(pa.Table.from_pandas(delta, preserve_index=False))
    for method in ("exact", "minhash"):
        out = (
            dedup.near_dup_incremental(cds, dds, threshold=0.8, method=method)
            .to_pandas().sort_values("doc_a").reset_index(drop=True)
        )
        assert list(out["doc_a"]) == [3, 5], method
        assert list(out["doc_b"]) == [big | 3, big | 5], method
        assert (out["jaccard"] == 1.0).all(), method
