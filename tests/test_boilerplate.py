"""Per-source boilerplate-span stripping (ops/boilerplate.py)."""

import pyarrow as pa

from harvester_ray.ops import boilerplate, spandedup


def _ds(rows):
    import ray.data as rd

    ids, srcs, texts = zip(*rows) if rows else ((), (), ())
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "source": pa.array(list(srcs), pa.string()),
                "text": pa.array(list(texts), pa.string()),
            }
        )
    )


BOILER = "cookie banner text"  # one 3-token span


def test_strips_frequent_span_per_source(ray_session):
    # source A: 4 docs, the banner span leads 3 of them (75% >= 50%)
    # source B: 2 docs, banner appears once (50% but df=1 < min_docs=2)
    rows = [
        (1, "A", f"{BOILER} alpha beta gamma"),
        (2, "A", f"{BOILER} delta epsilon zeta"),
        (3, "A", f"{BOILER} eta theta iota"),
        (4, "A", "kappa lambda mu nu xi omicron"),
        (5, "B", f"{BOILER} pi rho sigma"),
        (6, "B", "tau upsilon phi chi psi omega"),
    ]
    out = (
        boilerplate.boilerplate_strip(_ds(rows), pct=50, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 5, 6]
    # A's banner stripped everywhere (all occurrences, not first-kept)
    assert out.loc[0, "text_clean"] == "alpha beta gamma"
    assert out.loc[1, "text_clean"] == "delta epsilon zeta"
    assert out.loc[2, "text_clean"] == "eta theta iota"
    assert out["n_stripped"].tolist() == [1, 1, 1, 0, 0, 0]
    # B keeps its single banner (df=1 below min_docs)
    assert out.loc[4, "text_clean"].startswith("cookie banner text")
    assert out["n_spans"].tolist() == [2, 2, 2, 2, 2, 2]


def test_differs_from_span_dedup(ray_session):
    # span_dedup keeps the FIRST banner occurrence; boilerplate_strip
    # removes all of them — the op is not a rename of its sibling.
    rows = [
        (1, "A", f"{BOILER} alpha beta gamma"),
        (2, "A", f"{BOILER} delta epsilon zeta"),
    ]
    bp = (
        boilerplate.boilerplate_strip(_ds(rows), pct=50, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sd = (
        spandedup.span_dedup(_ds(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bp.loc[0, "text_clean"] == "alpha beta gamma"  # first copy gone too
    assert sd.loc[0, "text_dedup"].startswith("cookie banner text")


def test_all_stripped_doc_is_null(ray_session):
    rows = [
        (1, "A", BOILER),
        (2, "A", BOILER),
        (3, "A", "plain words here"),
    ]
    out = (
        boilerplate.boilerplate_strip(_ds(rows), pct=50, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "text_clean"] is None or out.loc[0, "text_clean"] != out.loc[0, "text_clean"]
    assert out.loc[2, "text_clean"] == "plain words here"


def test_empty_and_tokenless_docs(ray_session):
    out = (
        boilerplate.boilerplate_strip(_ds([(1, "A", ""), (2, "A", "one two three")]))
        .to_pandas()
        .reset_index(drop=True)
    )
    # zero-token doc absent (mirrors the oracle's unnest)
    assert out["doc_id"].tolist() == [2]
    empty = boilerplate.boilerplate_strip(_ds([])).to_pandas()
    assert len(empty) == 0
