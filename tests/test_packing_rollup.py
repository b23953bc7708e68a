"""Sequence packing (ops/packing.py), rollup + highlight extras."""

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import packing


def _docs(texts, ids=None):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_pack_prefix_sum_exact(ray_session):
    texts = ["a b c", "d e", "f", "g h i j"]  # 3,2,1,4 tokens
    out = (
        packing.pack_sequences(_docs(texts), capacity=4, n_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tok"]) == [3, 2, 1, 4]
    assert list(out["start_tok"]) == [0, 3, 5, 6]
    assert list(out["bin"]) == [0, 0, 1, 1]


def test_pack_partition_independence(ray_session):
    texts = [f"{'w ' * (i % 9 + 1)}".strip() for i in range(120)]
    a = packing.pack_sequences(_docs(texts), capacity=16, n_partitions=8).to_pandas()
    b = (
        packing.pack_sequences(_docs(texts).repartition(13), capacity=16, n_partitions=8)
        .to_pandas()
    )
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sparse_ids(ray_session):
    # non-contiguous ids: order is by id, ranges stay monotone
    out = (
        packing.pack_sequences(
            _docs(["a b", "c d", "e f"], ids=[5, 1000, 70]), capacity=3, n_partitions=16
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [5, 70, 1000]
    assert list(out["start_tok"]) == [0, 2, 4]


def test_events_rollup_consistency(ray_session):
    from harvester_ray.pipelines import relational

    out = relational.events_rollup("/root/testdata/sf0.001")
    total = out[(out.event_type == "<all>")]
    assert len(total) == 1
    finest = out[(out.event_type != "<all>") & (out.day != "<all>")]
    by_type = out[(out.event_type != "<all>") & (out.day == "<all>")]
    assert int(total.n_events.iloc[0]) == int(finest.n_events.sum()) == int(by_type.n_events.sum())
    assert abs(float(total.sum_value.iloc[0]) - float(finest.sum_value.sum())) < 1e-2


def test_q5_nonempty_and_matches_duckdb(ray_session):
    import duckdb

    from harvester_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.q5_local_supplier(sf)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    exp = con.execute(relational.q5_local_supplier_sql()).df()
    pd.testing.assert_frame_equal(out, exp)
    assert len(out) > 0


def test_highlight_wraps_terms(ray_session):
    import ray.data as rd

    from harvester_ray import analyzer
    from harvester_ray.index import build as ib
    from harvester_ray.index import query as iq
    from harvester_ray.index.extras import highlight_topk

    import tempfile, os

    docs = ["spark window table scan", "window spark merge", "unrelated words only"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(docs)})
    root = tempfile.mkdtemp(prefix="hltest-", dir="/tmp")
    ib.build_index(rd.from_arrow(t), root, input_desc="hltest")
    out = highlight_topk(iq.IndexReader(root), rd.from_arrow(t), "spark window", k=5)
    assert len(out) == 2
    assert all("<em>spark</em>" in s and "<em>window</em>" in s for s in out["snippet"])


def test_hybrid_search_fuses_signals(ray_session):
    import tempfile

    import ray.data as rd

    from harvester_ray.index import build as ib
    from harvester_ray.index import query as iq
    from harvester_ray.ops import similarity

    docs = ["spark window table", "window spark spark", "spark window window win"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(docs)})
    vecs = pa.array(
        [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]], pa.list_(pa.float32())
    )
    emb = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()), "embedding": vecs})
    root = tempfile.mkdtemp(prefix="hybtest-", dir="/tmp")
    ib.build_index(rd.from_arrow(t), root, input_desc="hybtest")
    out = similarity.hybrid_search(
        iq.IndexReader(root), rd.from_arrow(emb), "spark window", query_vec_id=0, k=3
    )
    assert list(out.columns) == ["doc_id", "score", "cosine", "hybrid"]
    assert len(out) == 3
    # doc 0 is the query vector itself: cosine 1.0
    assert out.set_index("doc_id").loc[0, "cosine"] == 1.0
    # fused ordering is monotone in the fused score
    assert list(out["hybrid"]) == sorted(out["hybrid"], reverse=True)


def test_compression_ratio_deterministic(ray_session):
    from harvester_ray.ops import text_analysis

    texts = ["abc " * 50, "x", "", "qwertyuiopasdfgh" * 3]
    a = (
        text_analysis.compression_ratio(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        text_analysis.compression_ratio(_docs(texts).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # repetitive text compresses far better than high-entropy text
    assert a.loc[0, "compression_ratio"] < a.loc[3, "compression_ratio"]


def test_rrf_fusion_rank_semantics(ray_session):
    import tempfile

    import duckdb
    import numpy as np
    import ray.data as rd

    from harvester_ray.index import build as ib
    from harvester_ray.index import query as iq
    from harvester_ray.ops import similarity

    docs = ["spark window table", "window spark spark", "spark window window win",
            "nothing relevant here"]
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()), "text": pa.array(docs)})
    vecs = pa.array(
        [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7], [0.99, 0.01]], pa.list_(pa.float32())
    )
    emb = pa.table({"vec_id": pa.array([0, 1, 2, 3], pa.int64()), "embedding": vecs})
    root = tempfile.mkdtemp(prefix="rrftest-", dir="/tmp")
    ib.build_index(rd.from_arrow(t), root, input_desc="rrftest")
    out = similarity.rrf_fusion(
        iq.IndexReader(root), rd.from_arrow(emb), "spark window",
        query_vec_id=0, k=4, k_cand=3,
    )
    assert list(out.columns) == ["doc_id", "rrf"]
    # doc 3 matches no query term (lexical miss) but is dense rank 2:
    # present with exactly the single-list contribution 1/(60+2)
    rrf3 = out.set_index("doc_id").loc[3, "rrf"]
    assert rrf3 == np.floor(1.0 / 62 * 1e6 + 0.5) / 1e6
    # fused order monotone; a doc in both lists beats any single-list doc here
    assert list(out["rrf"]) == sorted(out["rrf"], reverse=True)
    assert out["doc_id"].iloc[-1] == 3


def test_span_corruption(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import packing

    df = pd.DataFrame(
        {
            "doc_id": [0, 7, 9],
            "text": ["alpha beta gamma delta eps", "one two three four five six", ""],
        }
    )
    got = packing.span_corruption(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)))
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(packing.span_corruption_sql("documents")).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # doc 0: hash masks only pos 0 → one sentinel span
    r0 = got.iloc[0]
    assert r0["n_tokens"] == 5 and r0["n_masked"] == 1
    assert r0["input_text"] == "<x_0> beta gamma delta eps"
    assert r0["target_text"] == "<x_0> alpha"
    # empty doc → empty pair, zero counts
    r9 = got.iloc[2]
    assert r9["n_tokens"] == 0 and r9["input_text"] == "" and r9["target_text"] == ""
    # deterministic under repartition
    again = packing.span_corruption(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    )
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_fim_split(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import packing

    df = pd.DataFrame(
        {
            "doc_id": [0, 3, 11],
            "text": ["a b c d e f", "one two three", ""],
        }
    )
    got = packing.fim_split(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)))
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(packing.fim_split_sql("documents")).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # invariants: pieces rejoin to the token stream; empty doc → all empty
    for _, r in got.iterrows():
        joined = " ".join(p for p in (r["prefix"], r["middle"], r["suffix"]) if p)
        assert len(joined.split()) == r["n_tokens"]
    assert got.iloc[2]["prefix"] == "" and got.iloc[2]["n_tokens"] == 0
    # doc_id 0 hashes to c1 = 0: prefix empty, split still covers all tokens
    assert got.iloc[0]["prefix"] == ""


def test_span_corruption_large_doc_id_oracle(ray_session):
    # doc_id ≈ 1e10: doc_id·P1 would overflow int64 (numpy wraps silently,
    # DuckDB BIGINT raises) — the mod-before-multiply hash must keep both
    # sides in range and identical (ADVICE r3)
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import packing

    df = pd.DataFrame(
        {
            "doc_id": [10_000_000_007, 4_600_000_000_000],
            "text": ["alpha beta gamma delta eps zeta", "one two three four"],
        }
    )
    got = packing.span_corruption(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)))
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(packing.span_corruption_sql("documents")).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fim_split_large_doc_id_oracle(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import packing

    df = pd.DataFrame(
        {
            "doc_id": [10_000_000_007, 4_600_000_000_000],
            "text": ["a b c d e f g h", "one two three four five"],
        }
    )
    got = packing.fim_split(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)))
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(packing.fim_split_sql("documents")).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for _, r in got.iterrows():
        joined = " ".join(p for p in (r["prefix"], r["middle"], r["suffix"]) if p)
        assert len(joined.split()) == r["n_tokens"]


def test_collect_false_streams_datasets(ray_session):
    # VERDICT r3 item 3: the emission ops must offer a Dataset-returning
    # mode so pipelines can stream to write_parquet without driver-side
    # materialization; values must match the collected frame exactly
    import pandas as pd
    import pyarrow as pa
    import ray.data
    import ray.data as rd

    from harvester_ray.ops import packing, quantiles

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta gamma delta", "one two three", "x y", ""],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))

    for fn in (packing.span_corruption, packing.fim_split, quantiles.perplexity_buckets):
        collected = fn(ds)
        streamed = fn(ds, collect=False)
        assert isinstance(streamed, ray.data.Dataset)
        got = (
            streamed.to_pandas()
            .sort_values(list(collected.columns[:1]))
            .reset_index(drop=True)[list(collected.columns)]
        )
        pd.testing.assert_frame_equal(got, collected, check_dtype=False)


def test_sentence_pack_oracle(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import packing

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma. delta eps zeta. eta theta",
            "one two three four five six seven eight",
            "short. x. y. z",
            "",
        ],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        packing.sentence_pack(ds, capacity=5).to_pandas()
        .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(packing.sentence_pack_sql("documents", capacity=5)).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # sentence alignment: every bin boundary falls at a sentence start
    assert (got["start_tok"] // 5 == got["bin"]).all()
    # partition-independence
    again = (
        packing.sentence_pack(ds.repartition(3), capacity=5).to_pandas()
        .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again, check_dtype=False)
