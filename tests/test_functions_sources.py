import pyarrow as pa
import ray.data as rd

from harvester_ray.functions import normalizers as fn
from harvester_ray.sources import objective as obj


def test_parse_url():
    arr = pa.array(["  http://x.y/a b ", "http://x.y/a%20b", None])
    assert fn.parse_url(arr).to_pylist() == ["http://x.y/a+b", "http://x.y/a+b", ""]


def test_normalize_copyright():
    cases = {
        "https://creativecommons.org/licenses/by/4.0/": "cc-by-40",
        "https://creativecommons.org/licenses/by-nc-sa/3.0/nl/": "cc-by-nc-sa-30",
        "https://creativecommons.org/publicdomain/zero/1.0/": "cc0-10",
        "https://creativecommons.org/publicdomain/mark/1.0/": "pdm-10",
        "Public Domain": "pdm-10",
        "cc-by-40": "cc-by-40",
        "all rights reserved probably": None,
        None: None,
        "": None,
    }
    for value, expected in cases.items():
        assert fn.normalize_copyright(value) == expected, value


def test_mime_lookup_with_fallback():
    mimes = pa.array(["application/pdf", None, "application/x-unknown"])
    urls = pa.array([None, "http://x/y.mp4", "http://x/y.bin"])
    assert fn.mime_to_technical_type(mimes, urls).to_pylist() == [
        "document", "video", "unknown",
    ]


def test_dates():
    assert fn.parse_publisher_date("2023-04-05T10:00:00Z") == "2023-04-05"
    assert fn.parse_publisher_date("junk") is None
    assert fn.publisher_year("2023-04-05") == 2023
    assert fn.publisher_year(None) == 1970


def test_suggest_completion():
    out = fn.suggest_completion("Café titel!", "één twee2 drie <x>")
    assert out == ["Cafe", "titel", "een", "twee", "drie", "x"]


def test_validate_state():
    batch = pa.table(
        {"doc_id": pa.array([1, 2, 3]), "title": pa.array(["ok", "", None])}
    )
    out = fn.validate_state(batch, required=["title"])
    assert out["state"].to_pylist() == ["active", "inactive", "inactive"]


def test_reach_paths():
    rec = {"a": {"b": [{"c": 5}, {"c": 7}]}, "x": 1}
    assert obj.reach("$.a.b.1.c", rec) == 7
    assert obj.reach("$.a.b.9.c", rec) is None
    assert obj.reach("$.x", rec) == 1
    assert obj.reach("$.nope.deep", rec) is None


def test_objective_extractor_over_json_column():
    ds = rd.from_items(
        [
            {"event_id": 1, "props": '{"k": 42, "nested": {"v": "a"}}'},
            {"event_id": 2, "props": '{"k": 7}'},
            {"event_id": 3, "props": None},
        ]
    )
    OBJECTIVE = {
        "@": "$",
        "k": "$.k",
        "v": "$.nested.v",
        "k_doubled": lambda r: (r.get("k") or 0) * 2,
    }
    out = (
        obj.extract_json_column(ds, "props", OBJECTIVE, keep_cols=["event_id"])
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out["k"]) == [42, 7, None]
    assert list(out["v"]) == ["a", None, None]
    assert list(out["k_doubled"]) == [84, 14, 0]


def test_paged_source():
    def fetch(page: int):
        if page >= 3:
            return []
        return [{"id": page * 2 + i, "page": page} for i in range(2)]

    src = obj.PagedSource(fetch, n_pages=5)
    out = src.dataset().to_pandas().sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == [0, 1, 2, 3, 4, 5]
    assert list(out["page"]) == [0, 0, 1, 1, 2, 2]
