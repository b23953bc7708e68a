"""ES JSON query-DSL dispatcher: one entry point that routes a query-DSL
dict onto the native operators, so a caller of the reference's OpenSearch
surface (harvester/search/views/document.py builds exactly these dicts)
can run the same JSON against this engine.

Each leaf type maps onto the operator that already has a value-checked
driver gate — the dispatcher adds NO new scoring semantics, only parsing:

  match, match_phrase, match_phrase_prefix, match_bool_prefix,
  simple_query_string / query_string, prefix, wildcard, regexp, fuzzy,
  terms_set, intervals, span_near, span_first, span_not, span_or,
  span_containing, span_within, dis_max, boosting, pinned,
  constant_score(exists), rank_feature, distance_feature, function_score
  (gauss decay), bool (must / should / must_not / filter with term, terms
  and range leaves).

Unsupported shapes raise ValueError rather than guessing.
"""

from __future__ import annotations

import pandas as pd

from .query import IndexReader


def _round4(tbl) -> pd.DataFrame:
    out = tbl.to_pandas() if not isinstance(tbl, pd.DataFrame) else tbl
    if "score" in out.columns:
        out["score"] = out["score"].round(4)
    return out[["doc_id", "score"]] if "score" in out.columns else out


def _filter_leaves(spec) -> dict:
    """bool.filter → the engine's facet-filter dict (term / terms / range
    collapse to value lists; range stays a range dict)."""
    filters: dict = {}
    clauses = spec if isinstance(spec, list) else [spec]
    for c in clauses:
        if "term" in c:
            ((f, v),) = c["term"].items()
            v = v["value"] if isinstance(v, dict) else v
            filters.setdefault(f, []).append(v)
        elif "terms" in c:
            ((f, vs),) = c["terms"].items()
            filters.setdefault(f, []).extend(vs)
        elif "range" in c:
            ((f, spec_r),) = c["range"].items()
            filters[f] = {"range": spec_r}
        else:
            raise ValueError(f"unsupported filter leaf: {sorted(c)}")
    return filters


KNOWN_KINDS = frozenset({
    "match", "match_phrase", "match_phrase_prefix", "match_bool_prefix",
    "term", "terms", "terms_set", "range", "exists", "ids",
    "prefix", "wildcard", "regexp", "fuzzy",
    "simple_query_string", "query_string",
    "bool", "boosting", "constant_score", "dis_max", "pinned",
    "function_score", "intervals",
    "span_term", "span_or", "span_not", "span_near", "span_first",
    "span_containing", "span_within", "span_multi",
})


def validate_query(dsl: dict) -> dict:
    """ES ``_validate/query``: structural validation WITHOUT execution —
    single top-level key, known leaf type, bool/boosting sub-clauses
    recursed. Returns ``{"valid": True}`` or ``{"valid": False, "error":
    str}``; never touches an index."""
    try:
        _validate_node(dsl)
        return {"valid": True}
    except (ValueError, KeyError, TypeError) as e:
        return {"valid": False, "error": f"{type(e).__name__}: {e}"}


def _validate_node(dsl) -> None:
    if not isinstance(dsl, dict) or len(dsl) != 1:
        raise ValueError("query DSL must be a dict with exactly one top-level key")
    (kind, body), = dsl.items()
    if kind not in KNOWN_KINDS:
        raise ValueError(f"unknown query type: {kind!r}")
    if not isinstance(body, dict):
        raise ValueError(f"{kind} body must be an object")
    if kind == "bool":
        for clause in ("must", "should", "must_not", "filter"):
            for sub in _as_list(body.get(clause, [])):
                _validate_node(sub)
    elif kind == "boosting":
        _validate_node(body["positive"])
        _validate_node(body["negative"])
    elif kind == "constant_score":
        _validate_node(body["filter"])
    elif kind == "dis_max":
        for sub in _as_list(body["queries"]):
            _validate_node(sub)
    elif kind == "pinned":
        body["ids"]
        _validate_node(body["organic"])
    elif kind in ("span_or", "span_near"):
        for sub in _as_list(body["clauses"]):
            _validate_node(sub)
    elif kind == "span_not":
        _validate_node(body["include"])
        _validate_node(body["exclude"])
    elif kind in ("span_containing", "span_within"):
        _validate_node(body["big"])
        _validate_node(body["little"])
    elif kind == "span_multi":
        body["match"]["prefix"]


def _as_list(x):
    return x if isinstance(x, list) else [x]


def execute_dsl(reader: IndexReader, dsl: dict, *, k: int = 10) -> pd.DataFrame:
    """Execute one ES query-DSL dict against the index. Returns the same
    (doc_id, score) frame the underlying operator's gate emits."""
    from . import extras

    if len(dsl) != 1:
        raise ValueError("query DSL must have exactly one top-level key")
    (kind, body), = dsl.items()

    if kind == "match":
        ((_field, spec),) = body.items()
        if isinstance(spec, str):
            spec = {"query": spec}
        q = spec["query"]
        if "fuzziness" in spec:
            return _round4(extras.match_fuzzy(
                reader, q, max_edits=int(spec["fuzziness"]), k=k))
        mode = "and" if spec.get("operator", "or").lower() == "and" else "or"
        msm = spec.get("minimum_should_match")
        return _round4(reader.search(
            q, k=k, mode=mode,
            min_should_match=int(msm) if msm is not None else None,
        ))
    if kind == "match_phrase":
        ((_f, spec),) = body.items()
        q = spec["query"] if isinstance(spec, dict) else spec
        return _round4(reader.search_phrase(q, k=k))
    if kind == "match_phrase_prefix":
        ((_f, spec),) = body.items()
        q = spec["query"] if isinstance(spec, dict) else spec
        return _round4(extras.search_match_phrase_prefix(reader, q, k=k))
    if kind == "match_bool_prefix":
        ((_f, spec),) = body.items()
        q = spec["query"] if isinstance(spec, dict) else spec
        return _round4(extras.search_match_bool_prefix(reader, q, k=k))
    if kind in ("simple_query_string", "query_string"):
        return _round4(extras.search_query_string(reader, body["query"], k=k))
    if kind == "prefix":
        ((_f, spec),) = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        return _round4(reader.search_prefix(v, k=k))
    if kind == "wildcard":
        ((_f, spec),) = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        return _round4(reader.search_wildcard(v, k=k))
    if kind == "regexp":
        ((_f, spec),) = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        return _round4(reader.search_regexp(v, k=k))
    if kind == "fuzzy":
        ((_f, spec),) = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        return _round4(extras.fuzzy_search(reader, v, k=k))
    if kind == "terms_set":
        ((field_ignored, spec),) = body.items()
        return _round4(extras.search_terms_set(
            reader, spec["terms"],
            min_field=spec["minimum_should_match_field"], k=k))
    if kind == "intervals":
        ((_f, spec),) = body.items()
        allof = spec["all_of"]
        if not allof.get("ordered", False):
            raise ValueError("intervals: only all_of(ordered=true) supported")
        terms = " ".join(
            iv["match"]["query"] for iv in allof["intervals"]
        )
        return _round4(extras.search_intervals(
            reader, terms, max_gaps=int(allof.get("max_gaps", 0)), k=k))
    if kind == "span_near":
        terms = " ".join(
            c["span_term"]["text"] for c in body["clauses"]
        )
        return _round4(extras.search_span_near(
            reader, terms, slop=int(body.get("slop", 0)), k=k))
    if kind == "span_first":
        return _round4(extras.search_span_first(
            reader, body["match"]["span_term"]["text"],
            end=int(body["end"]), k=k))
    if kind == "span_not":
        return _round4(extras.search_span_not(
            reader, body["include"]["span_term"]["text"],
            body["exclude"]["span_term"]["text"],
            distance=int(body.get("dist", 3)), k=k))
    if kind == "span_or":
        terms = " ".join(c["span_term"]["text"] for c in body["clauses"])
        return _round4(extras.search_span_or(reader, terms, k=k))
    if kind == "span_multi":
        pspec = body["match"]["prefix"]["text"]
        if isinstance(pspec, str):
            pspec = {"value": pspec}
        return _round4(extras.search_span_multi(
            reader, pspec["value"], k=k,
            max_expansions=int(pspec.get("max_expansions", 50))))
    if kind in ("span_containing", "span_within"):
        big = body["big"]["span_near"]
        t1, t2 = (c["span_term"]["text"] for c in big["clauses"])
        little = body["little"]["span_term"]["text"]
        return _round4(extras.search_span_containing(
            reader, (t1, t2), little, slop=int(big.get("slop", 0)),
            mode="containing" if kind == "span_containing" else "within",
            k=k))
    if kind == "dis_max":
        raise ValueError("dis_max runs over per-field indexes — use bm25f.search_dis_max")
    if kind == "boosting":
        return _round4(extras.search_boosting(
            reader, body["positive"]["match"]["text"],
            body["negative"]["match"]["text"],
            negative_boost=float(body.get("negative_boost", 0.5)), k=k))
    if kind == "pinned":
        return _round4(extras.search_pinned(
            reader, body["organic"]["match"]["text"], list(body["ids"]),
            k=k, mode="or"))
    if kind == "constant_score":
        flt = body["filter"]
        if "exists" in flt:
            return extras.search_exists(
                reader, flt["exists"]["field"],
                boost=float(body.get("boost", 1.0)), k=k)
        raise ValueError("constant_score: only exists filters supported")
    if kind == "function_score":
        inner = body["query"]["match"]
        ((_f, spec),) = inner.items()
        q = spec["query"] if isinstance(spec, dict) else spec
        ((ts_field, g),) = body["gauss"].items()
        return _round4(extras.search_function_score(
            reader, q, origin_us=int(g["origin_us"]),
            scale_us=int(g["scale_us"]), decay=float(g.get("decay", 0.5)),
            ts_field=ts_field, k=k))
    if kind == "bool":
        must = body.get("must", [])
        must = must if isinstance(must, list) else [must]
        should = body.get("should", [])
        should = should if isinstance(should, list) else [should]
        must_not = body.get("must_not", [])
        must_not = must_not if isinstance(must_not, list) else [must_not]

        def _texts(clauses):
            out = []
            for c in clauses:
                if "match" not in c:
                    raise ValueError(
                        f"bool: only match leaves in scoring context, got {sorted(c)}"
                    )
                ((_f, spec),) = c["match"].items()
                out.append(spec["query"] if isinstance(spec, dict) else spec)
            return " ".join(out)

        filters = _filter_leaves(body["filter"]) if "filter" in body else None
        if should and not must and not filters:
            return _round4(extras.search_bool(
                reader, must="", should=_texts(should),
                must_not=_texts(must_not), k=k))
        if should:
            return _round4(extras.search_bool(
                reader, must=_texts(must), should=_texts(should),
                must_not=_texts(must_not), k=k))
        # pure must (+ filter/must_not): the AND search path owns filters
        rng = None
        if filters:
            plain = {f: v for f, v in filters.items() if isinstance(v, list)}
            rng = {f: v["range"] for f, v in filters.items() if isinstance(v, dict)}
            filters = plain or None
            if rng:
                raise ValueError("bool: range filters not wired through dsl yet")
        return _round4(reader.search(
            _texts(must), k=k, mode="and", filters=filters,
            must_not=_texts(must_not) if must_not else None,
        ))
    raise ValueError(f"unsupported query DSL type: {kind!r}")
