"""ES JSON query-DSL dispatcher: every DSL leaf must route to the native
operator and return the identical frame (dispatcher adds parsing only)."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from harvester_ray.index import build, dsl, extras, query

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    import pyarrow as pa

    root = str(tmp_path_factory.mktemp("dslidx"))

    def _with_req(b: pa.Table) -> pa.Table:
        n = b["n_chars"].to_numpy(zero_copy_only=False).astype("int64")
        return b.append_column("req", pa.array(1 + (n % 3)))

    ds = rd.read_parquet(
        DOCS, columns=["doc_id", "text", "source", "lang", "n_chars"]
    ).map_batches(_with_req, batch_format="pyarrow")
    build.build_index(
        ds, root, concurrency=2, attr_cols=["source", "lang", "req"],
        store_positions=True,
    )
    return query.IndexReader(root)


def _eq(a: pd.DataFrame, b: pd.DataFrame):
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def _r4(t):
    out = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
    if "score" in out.columns:
        out["score"] = out["score"].round(4)
        return out[["doc_id", "score"]]
    return out


def test_match_variants(idx):
    _eq(dsl.execute_dsl(idx, {"match": {"text": "table scan"}}),
        _r4(idx.search("table scan", k=10, mode="or")))
    _eq(dsl.execute_dsl(idx, {"match": {"text": {"query": "table scan", "operator": "and"}}}),
        _r4(idx.search("table scan", k=10, mode="and")))
    _eq(dsl.execute_dsl(idx, {"match": {"text": {"query": "dup the fast", "minimum_should_match": 2}}}),
        _r4(idx.search("dup the fast", k=10, mode="or", min_should_match=2)))
    _eq(dsl.execute_dsl(idx, {"match": {"text": {"query": "tabel", "fuzziness": 1}}}),
        _r4(extras.match_fuzzy(idx, "tabel", max_edits=1, k=10)))


def test_phrase_and_prefix_family(idx):
    _eq(dsl.execute_dsl(idx, {"match_phrase": {"text": "order fast"}}),
        _r4(idx.search_phrase("order fast", k=10)))
    _eq(dsl.execute_dsl(idx, {"match_phrase_prefix": {"text": "part s"}}),
        _r4(extras.search_match_phrase_prefix(idx, "part s", k=10)))
    _eq(dsl.execute_dsl(idx, {"match_bool_prefix": {"text": "dup s"}}),
        _r4(extras.search_match_bool_prefix(idx, "dup s", k=10)))
    _eq(dsl.execute_dsl(idx, {"prefix": {"text": {"value": "sc"}}}),
        _r4(idx.search_prefix("sc", k=10)))
    _eq(dsl.execute_dsl(idx, {"wildcard": {"text": {"value": "*can"}}}),
        _r4(idx.search_wildcard("*can", k=10)))
    _eq(dsl.execute_dsl(idx, {"regexp": {"text": {"value": "sc.n"}}}),
        _r4(idx.search_regexp("sc.n", k=10)))
    _eq(dsl.execute_dsl(idx, {"fuzzy": {"text": {"value": "tabel"}}}),
        _r4(extras.fuzzy_search(idx, "tabel", k=10)))


def test_span_family(idx):
    _eq(dsl.execute_dsl(idx, {"span_near": {
            "clauses": [{"span_term": {"text": "table"}},
                        {"span_term": {"text": "scan"}}], "slop": 3}}),
        extras.search_span_near(idx, "table scan", slop=3, k=10))
    _eq(dsl.execute_dsl(idx, {"span_first": {
            "match": {"span_term": {"text": "table"}}, "end": 3}}),
        _r4(extras.search_span_first(idx, "table", end=3, k=10)))
    _eq(dsl.execute_dsl(idx, {"span_not": {
            "include": {"span_term": {"text": "spark"}},
            "exclude": {"span_term": {"text": "window"}}, "dist": 3}}),
        _r4(extras.search_span_not(idx, "spark", "window", distance=3, k=10)))
    _eq(dsl.execute_dsl(idx, {"span_or": {
            "clauses": [{"span_term": {"text": "dup"}},
                        {"span_term": {"text": "batch"}}]}}),
        _r4(extras.search_span_or(idx, "dup batch", k=10)))
    _eq(dsl.execute_dsl(idx, {"span_multi": {
            "match": {"prefix": {"text": {"value": "s"}}}}}),
        _r4(extras.search_span_multi(idx, "s", k=10)))
    _eq(dsl.execute_dsl(idx, {"span_containing": {
            "big": {"span_near": {"clauses": [
                {"span_term": {"text": "spark"}},
                {"span_term": {"text": "window"}}], "slop": 4}},
            "little": {"span_term": {"text": "data"}}}}),
        _r4(extras.search_span_containing(
            idx, ("spark", "window"), "data", slop=4, mode="containing", k=10)))
    _eq(dsl.execute_dsl(idx, {"intervals": {"text": {"all_of": {
            "ordered": True, "max_gaps": 3,
            "intervals": [{"match": {"query": "spark"}},
                          {"match": {"query": "window"}}]}}}}),
        _r4(extras.search_intervals(idx, "spark window", max_gaps=3, k=10)))


def test_compound_queries(idx):
    _eq(dsl.execute_dsl(idx, {"bool": {
            "must": [{"match": {"text": "table"}}],
            "must_not": [{"match": {"text": "dup"}}],
            "filter": {"term": {"source": "src0"}}}}),
        _r4(idx.search("table", k=10, mode="and",
                       filters={"source": ["src0"]}, must_not="dup")))
    _eq(dsl.execute_dsl(idx, {"bool": {
            "must": [{"match": {"text": "table"}}],
            "should": [{"match": {"text": "dup"}}]}}),
        _r4(extras.search_bool(idx, must="table", should="dup", k=10)))
    _eq(dsl.execute_dsl(idx, {"boosting": {
            "positive": {"match": {"text": "table scan"}},
            "negative": {"match": {"text": "dup"}},
            "negative_boost": 0.5}}),
        _r4(extras.search_boosting(idx, "table scan", "dup",
                                   negative_boost=0.5, k=10)))
    _eq(dsl.execute_dsl(idx, {"pinned": {
            "ids": [7, 3], "organic": {"match": {"text": "table scan"}}}}),
        _r4(extras.search_pinned(idx, "table scan", [7, 3], k=10, mode="or")))
    _eq(dsl.execute_dsl(idx, {"terms_set": {"text": {
            "terms": ["dup", "spark", "window"],
            "minimum_should_match_field": "req"}}}),
        _r4(extras.search_terms_set(idx, ["dup", "spark", "window"],
                                    min_field="req", k=10)))
    _eq(dsl.execute_dsl(idx, {"simple_query_string": {
            "query": '"part filter" -dup big'}}),
        _r4(extras.search_query_string(idx, '"part filter" -dup big', k=10)))


def test_unsupported_raises(idx):
    with pytest.raises(ValueError):
        dsl.execute_dsl(idx, {"geo_distance": {}})
    with pytest.raises(ValueError):
        dsl.execute_dsl(idx, {"match": {"text": "a"}, "bool": {}})
    with pytest.raises(ValueError):
        dsl.execute_dsl(idx, {"bool": {"must": [{"term": {"source": "x"}}]}})
