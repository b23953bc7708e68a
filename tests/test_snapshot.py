"""Snapshot/restore (index/snapshot.py): closure capture, incremental
repository reuse, atomic restore, result-identical reads."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from harvester_ray.index import build, incremental, manifest as mf, query, snapshot


DOCS = "/root/testdata/sf0.001/documents.parquet"


def _corpus(n=120, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["spark", "window", "batch", "stream", "query", "sort", "join",
             "scan", "table", "vector"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _search(root, q="spark window"):
    return query.IndexReader(root).search(q, k=20, mode="or").to_pandas()


@pytest.fixture(scope="module")
def roots(tmp_path_factory, ray_session):
    src = str(tmp_path_factory.mktemp("snap-src"))
    repo = str(tmp_path_factory.mktemp("snap-repo"))
    base = _corpus()
    build.build_index(rd.from_pandas(base), src, concurrency=2, input_desc="base")
    return src, repo, base


def test_snapshot_restore_identical(roots, tmp_path_factory):
    src, repo, _ = roots
    rec = snapshot.snapshot(src, repo)
    assert rec["copied"] > 0 and rec["reused"] == 0
    dest = str(tmp_path_factory.mktemp("snap-dest"))
    snapshot.restore(repo, rec["name"], dest)
    a, b = _search(src), _search(dest)
    pd.testing.assert_frame_equal(a, b)
    assert mf.current_version(dest) == mf.current_version(src)


def test_incremental_snapshot_reuses_files(roots, tmp_path_factory):
    src, repo, base = roots
    snapshot.snapshot(src, repo)
    delta = pd.DataFrame({
        "doc_id": np.array([0, 1, 200], dtype=np.int64),
        "text": ["updated spark text", "", "brand new stream doc"],
        "state": ["active", "deleted", "active"],
    })
    incremental.build_incremental(
        src, rd.from_pandas(delta), input_desc="delta", integrity_check=False
    )
    rec2 = snapshot.snapshot(src, repo)
    # carried-forward segments were already in the repo
    assert rec2["reused"] > 0
    assert rec2["copied"] > 0  # the delta segment + new manifest/termstats
    dest = str(tmp_path_factory.mktemp("snap-dest2"))
    snapshot.restore(repo, rec2["name"], dest)
    pd.testing.assert_frame_equal(_search(src), _search(dest))
    pd.testing.assert_frame_equal(_search(src, "stream"), _search(dest, "stream"))
    names = [r["name"] for r in snapshot.list_snapshots(repo)]
    assert rec2["name"] in names and len(names) == 2


def test_mget_batched_fetch(roots):
    """mget equals per-id get_document, handles missing ids and duplicates."""
    from harvester_ray.index import readback

    src, _, base = roots
    ids = [0, 3, 10**9, 3]
    got = readback.mget(src, ids)
    assert list(got["doc_id"]) == ids
    assert list(got["found"]) == [True, True, False, True]
    for _, row in got[got["found"]].iterrows():
        single = readback.get_document(src, int(row["doc_id"]))
        assert single is not None and single["dl"] == row["dl"]
    assert got.loc[2, "dl"] == -1 and got.loc[2, "created_version"] == -1


def test_aliases_retarget_and_pin(roots, tmp_path_factory):
    """Alias registry: atomic retarget across roots, version pinning,
    reader-through-alias equals direct reader."""
    from harvester_ray.index import manifest as mf, query, snapshot

    src, repo, _ = roots
    reg = str(tmp_path_factory.mktemp("aliasreg"))
    mf.set_alias(reg, "serving", src)
    root, ver = mf.resolve_alias(reg, "serving")
    a = query.IndexReader(root, ver).search("spark window", k=10, mode="or").to_pandas()
    b = query.IndexReader(src).search("spark window", k=10, mode="or").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # blue/green: restore a copy, flip the alias, reader follows atomically
    dest = str(tmp_path_factory.mktemp("alias-dest"))
    rec = snapshot.snapshot(src, repo, name="alias-snap")
    snapshot.restore(repo, "alias-snap", dest)
    mf.set_alias(reg, "serving", dest, version=rec["version"])
    root2, ver2 = mf.resolve_alias(reg, "serving")
    assert root2 == os.path.abspath(dest) and ver2 == rec["version"]
    c = query.IndexReader(root2, ver2).search("spark window", k=10, mode="or").to_pandas()
    pd.testing.assert_frame_equal(a, c)
    assert mf.delete_alias(reg, "serving")
    with pytest.raises(KeyError):
        mf.resolve_alias(reg, "serving")
    assert not mf.delete_alias(reg, "serving")


def test_cached_reader_hits_and_invalidates(roots, ray_session):
    from harvester_ray.index import incremental, readback

    src, _, _ = roots
    cr = readback.CachedReader(src, capacity=8)
    a = cr.search("spark window", k=10, mode="or")
    b = cr.search("spark window", k=10, mode="or")
    assert b is a  # served from cache
    assert (cr.hits, cr.misses) == (1, 1)
    # different args miss
    cr.search("spark window", k=5, mode="or")
    assert cr.misses == 2
    # a promote invalidates: fresh results reflect the delta
    import pandas as pd
    import ray.data as rd

    delta = pd.DataFrame({
        "doc_id": np.array([0], dtype=np.int64),
        "text": ["totally different uniquewordq text"],
        "state": ["active"],
    })
    incremental.build_incremental(src, rd.from_pandas(delta),
                                  input_desc="cache-delta",
                                  integrity_check=False)
    c = cr.search("spark window", k=10, mode="or")
    assert c is not a
    hit = cr.search("uniquewordq", k=5, mode="or").to_pandas()
    assert len(hit) == 1 and hit["doc_id"][0] == 0
    # LRU bound holds
    for i in range(20):
        cr.search(f"spark window {i}", k=3, mode="or")
    assert len(cr._cache) <= 8


def test_point_in_time_pinned_version(tmp_path, ray_session):
    """ES point-in-time analog: a reader pinned to a version sees identical
    results across later deltas and promotes (old segments are immutable;
    CURRENT moves, the pin does not)."""
    import pandas as pd
    import ray.data as rd

    from harvester_ray.index import build as ib
    from harvester_ray.index import incremental, query

    root = str(tmp_path / "pit")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    man = ib.build_index(ds, root)
    v1 = man["version"]
    pit = query.IndexReader(root, version=v1)
    before = pit.search("customer query big", k=10, mode="or").to_pandas()
    delta = pd.DataFrame([
        {"doc_id": 800001,
         "text": "customer query big " * 30,  # would dominate the ranking
         "state": "active"},
        {"doc_id": int(before["doc_id"].iloc[0]), "text": "", "state": "deleted"},
    ])
    incremental.build_incremental(root, rd.from_pandas(delta), integrity_check=False)
    # pinned reader: byte-identical results after the promote
    again = query.IndexReader(root, version=v1).search(
        "customer query big", k=10, mode="or"
    ).to_pandas()
    pd.testing.assert_frame_equal(before, again)
    # CURRENT sees the new world: top doc deleted, spam doc present
    cur = query.IndexReader(root).search(
        "customer query big", k=10, mode="or"
    ).to_pandas()
    assert int(before["doc_id"].iloc[0]) not in set(cur["doc_id"])
    assert 800001 in set(cur["doc_id"])


def test_rollover_flips_alias_on_condition(tmp_path, ray_session):
    import ray.data as rd

    from harvester_ray.index import build as ib
    from harvester_ray.index import manifest as mf

    a = str(tmp_path / "gen-000001")
    b = str(tmp_path / "gen-000002")
    reg = str(tmp_path / "registry")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    man = ib.build_index(ds, a)
    ib.build_index(rd.read_parquet(DOCS, columns=["doc_id", "text"]).limit(5), b)
    mf.set_alias(reg, "writes", a)
    # below threshold: no-op, alias untouched
    res = mf.rollover(reg, "writes", b, max_docs=man["n_docs"] + 1)
    assert res["rolled_over"] is False
    assert mf.resolve_alias(reg, "writes")[0] == os.path.abspath(a)
    # at threshold: atomic flip, old index intact
    res = mf.rollover(reg, "writes", b, max_docs=man["n_docs"])
    assert res["rolled_over"] is True and res["conditions"]["max_docs"]
    assert mf.resolve_alias(reg, "writes")[0] == os.path.abspath(b)
    assert mf.current_version(a) is not None  # old generation still readable


def test_prune_snapshots_retention(tmp_path, ray_session):
    """Retention keeps the newest N snapshots; shared content-addressed
    files survive as long as ANY kept snapshot references them, and a kept
    snapshot still restores to an identical index after pruning."""
    import ray.data as rd

    from harvester_ray.index import build, incremental, snapshot

    root = str(tmp_path / "idx")
    repo = str(tmp_path / "repo")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    build.build_index(ds, root)
    snapshot.snapshot(root, repo, name="s1")
    delta = pd.DataFrame([{"doc_id": 700001, "text": "alpha beta", "state": "active"}])
    incremental.build_incremental(root, rd.from_pandas(delta), integrity_check=False)
    rec2 = snapshot.snapshot(root, repo, name="s2")
    assert rec2["reused"] > 0  # carried segments shared between snapshots
    res = snapshot.prune_snapshots(repo, keep_last=1)
    assert res["deleted"] == ["s1"] and res["kept"] == ["s2"]
    names = [r["name"] for r in snapshot.list_snapshots(repo)]
    assert names == ["s2"]
    # s2 restores fine: every shared file survived the prune
    dest = str(tmp_path / "restored")
    snapshot.restore(repo, "s2", dest)
    out = query.IndexReader(dest).search("alpha beta", k=5, mode="and").to_pandas()
    assert 700001 in set(out["doc_id"])
