

def test_length_buckets_accounting(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from harvester_ray.ops import packing

    texts = ["a b c", "a b c d e", "one " * 40, "x " * 70]  # 3,5,40,70 toks
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([t.strip() for t in texts], pa.string()),
    }))
    out = packing.length_buckets(ds, boundaries=(4, 8, 64))
    got = {int(r.bucket_cap): r for r in out.itertuples()}
    assert got[4].n_docs == 1 and got[4].sum_tokens == 3
    assert got[8].n_docs == 1 and got[8].sum_tokens == 5
    assert got[64].n_docs == 1 and got[64].sum_tokens == 40
    # overflow bucket: capped at its own max length (70)
    assert got[70].n_docs == 1 and got[70].pad_tokens == 70
    assert got[70].waste_ratio == 0.0
    assert got[4].waste_ratio == 0.25
