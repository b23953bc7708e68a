import hashlib

import pyarrow as pa
import ray.data as rd

from harvester_ray.ops import previews, translate


def test_generator_dispatch():
    assert previews.generator_for("video/mp4") == "youtube_dl"
    assert previews.generator_for("application/pdf") == "pdf2image"
    assert previews.generator_for("image/png") == "pillow"
    assert previews.generator_for("text/html") is None
    assert previews.generator_for(None) is None


def test_generate_previews_fanout():
    ds = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["http://x/a.mp4", "http://x/b.txt", "http://x/c.pdf"]),
                "content_type": pa.array(["video/mp4", "text/plain", "application/pdf"]),
            }
        )
    )
    out = previews.generate_previews(ds, concurrency=2).to_pandas()
    # b.txt has no generator; the two previewable files expand to 2 sizes each
    assert len(out) == 4
    assert set(out["generator"]) == {"youtube_dl", "pdf2image"}
    assert set(out["size"]) == set(previews.PREVIEW_SIZES)
    stem = hashlib.md5(b"http://x/a.mp4").hexdigest()
    got = out[(out["url"] == "http://x/a.mp4") & (out["size"] == "400x300")]
    assert got["preview_path"].iloc[0] == f"previews/{stem}-400x300.png"
    assert out["success"].all()


def test_translate_stage_cache_collapses_duplicates():
    stage = translate.TranslateStage(target="en")
    batch = pa.table(
        {
            "value": pa.array(["wiskunde", "natuurkunde", "wiskunde", None, "wiskunde"]),
            "language": pa.array(["nl"] * 5),
        }
    )
    out = stage(batch)
    assert out["translation"].to_pylist() == [
        "wiskunde (en)",
        "natuurkunde (en)",
        "wiskunde (en)",
        None,
        "wiskunde (en)",
    ]
    # the client was hit once per DISTINCT value, not once per row
    assert stage.client.calls == 2
    stage(batch)  # second batch: all cached
    assert stage.client.calls == 2


def test_translate_values_dataset():
    ds = rd.from_arrow(pa.table({"value": pa.array(["a", "b", "a"])}))
    out = translate.translate_values(ds, concurrency=2).to_pandas()
    assert sorted(out["translation"]) == ["a (en)", "a (en)", "b (en)"]
    assert (out["target"] == "en").all()
