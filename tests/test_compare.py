"""Corpus comparison ops (ops/compare.py)."""

import pyarrow as pa

from harvester_ray.ops import compare


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows]),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )


def test_source_profile(ray_session):
    out = compare.source_profile(_ds([("a", "xx yy xx"), ("a", ""), ("b", "zzz")]))
    m = {r["source"]: r for _, r in out.iterrows()}
    assert m["a"]["n_docs"] == 2 and m["a"]["n_tokens"] == 3 and m["a"]["vocab"] == 2
    assert m["a"]["avg_token_len"] == 2.0
    assert m["b"]["n_docs"] == 1 and m["b"]["vocab"] == 1 and m["b"]["avg_token_len"] == 3.0


def test_source_profile_partition_independent(ray_session):
    rows = [(f"s{i % 4}", f"tok{i % 9} word common text") for i in range(80)]
    a = compare.source_profile(_ds(rows))
    b = compare.source_profile(_ds(rows).repartition(7))
    assert a.equals(b)


def test_source_jaccard_identical_sources(ray_session):
    rows = [("a", "one two three four five six"), ("b", "one two three four five six")]
    out = compare.source_jaccard(_ds(rows), shingle_n=3)
    assert len(out) == 1 and out.iloc[0]["jaccard"] == 1.0


def test_source_kl_identical_is_zero(ray_session):
    rows = [("a", "x y z"), ("b", "x y z")]
    out = compare.source_kl(_ds(rows))
    assert (out["kl"] == 0.0).all()


def test_hapax_rate(ray_session):
    out = compare.hapax_rate(_ds([("a", "x x y"), ("b", "z")]))
    m = {r["source"]: r for _, r in out.iterrows()}
    # source a: vocab {x:2, y:1} → 1 hapax of 2
    assert m["a"]["vocab"] == 2 and m["a"]["hapax"] == 1 and m["a"]["rate"] == 0.5
    assert m["b"]["vocab"] == 1 and m["b"]["hapax"] == 1 and m["b"]["rate"] == 1.0


def test_ks_statistic(ray_session):
    import ray.data as rd

    def mk(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array([r[0] for r in rows]),
                    "n_chars": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        )

    # disjoint distributions → KS = 1
    rows = [("src0", v) for v in (1, 2, 3)] + [("src1", v) for v in (10, 11, 12)]
    out = compare.ks_statistic(mk(rows)).iloc[0]
    assert out["ks"] == 1.0 and out["n_a"] == 3 and out["n_b"] == 3
    # identical distributions → KS = 0
    rows2 = [("src0", v) for v in (5, 6)] + [("src1", v) for v in (5, 6)]
    assert compare.ks_statistic(mk(rows2)).iloc[0]["ks"] == 0.0
    # half-overlap: a={1,2}, b={2,3} → D = 1/2
    rows3 = [("src0", 1), ("src0", 2), ("src1", 2), ("src1", 3)]
    assert compare.ks_statistic(mk(rows3)).iloc[0]["ks"] == 0.5


def _ds_langs(texts, langs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        })
    )


def test_keyness_llr(ray_session):
    ds = _ds_langs(
        ["apple apple banana", "apple cherry", "dog dog dog cat", "dog fish"],
        ["en", "en", "de", "de"],
    )
    out = compare.keyness_llr(ds, target_lang="en", k=10)
    # 'apple' is target-exclusive and frequent, 'dog' rest-exclusive:
    # both must outrank the shared-profile terms; exclusive terms have
    # positive G2, a term split proportionally scores ~0
    top2 = set(out["term"].iloc[:2])
    assert top2 == {"apple", "dog"}
    assert (out["llr"] >= 0).all()
    row = out[out["term"] == "apple"].iloc[0]
    assert row["cf_target"] == 3 and row["cf_rest"] == 0
    # identical distributions => every llr == 0
    same = _ds_langs(["x y", "x y"], ["en", "de"])
    out0 = compare.keyness_llr(same, target_lang="en", k=10)
    assert (out0["llr"] == 0.0).all()

def test_keyness_llr_degenerate_subcorpus_matches_oracle(ray_session, tmp_path):
    """When the target (or background) subcorpus is empty the engine returns
    no rows; the SQL oracle must mirror that guard instead of emitting
    llr=0 rows (ADVICE r2)."""
    import duckdb

    texts = ["apple apple banana", "dog dog cat"]
    for langs, tgt in [(["de", "de"], "en"),   # na == 0
                       (["en", "en"], "en")]:  # nb == 0
        ds = _ds_langs(texts, langs)
        out = compare.keyness_llr(ds, target_lang=tgt, k=10)
        assert out.empty
        path = str(tmp_path / f"docs_{langs[0]}_{tgt}.parquet")
        pa.parquet.write_table(
            pa.table({"text": pa.array(texts), "lang": pa.array(langs)}), path)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
        sql_out = con.execute(
            compare.keyness_llr_sql("documents", target_lang=tgt, k=10)).df()
        assert len(sql_out) == 0


def test_source_ablation_exclusive_and_means(ray_session):
    rows = [
        ("a", "shared words here uniquea"),
        ("a", "shared words uniquea2 uniquea2"),
        ("b", "shared words here more"),
        ("b", "totally common words"),
        ("c", ""),                 # empty doc still counts in n_docs
        ("c", "uniquec shared"),
    ]
    out = compare.source_ablation(_ds(rows))
    m = {r["source"]: r for _, r in out.iterrows()}
    # exclusive vocab: a -> {uniquea, uniquea2}; b -> {more, totally, common}
    assert m["a"]["exclusive_terms"] == 2
    assert m["b"]["exclusive_terms"] == 3
    assert m["c"]["exclusive_terms"] == 1
    assert m["c"]["n_docs"] == 2 and m["c"]["n_tokens"] == 2
    # 17 tokens over 6 docs; without c: 15/4
    assert m["c"]["mean_tokens_without"] == round(15 / 4, 6)
    assert m["c"]["delta_mean_tokens"] == round(15 / 4 - 17 / 6, 6)


def test_source_ablation_single_source_guard(ray_session):
    out = compare.source_ablation(_ds([("only", "a b c"), ("only", "d e")]))
    r = out.iloc[0]
    # dropping the only source leaves no corpus: guarded to 0.0 both sides
    assert r["mean_tokens_without"] == 0.0 and r["delta_mean_tokens"] == 0.0


def test_source_ablation_partition_independent(ray_session):
    rows = [(f"s{i % 5}", f"tok{i % 11} tok{i % 6} shared words") for i in range(90)]
    a = compare.source_ablation(_ds(rows))
    b = compare.source_ablation(_ds(rows).repartition(9))
    assert a.equals(b)
