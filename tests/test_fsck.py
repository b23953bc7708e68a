"""Index integrity verification (index/fsck.py): healthy indexes pass,
every corruption class is detected."""

import json
import os

import pandas as pd
import pytest
import ray.data as rd

from harvester_ray.index import build, fsck, incremental, manifest as mf, query

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def idx(tmp_path):
    root = str(tmp_path / "fsck")
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    build.build_index(ds, root, store_positions=True)
    return root


def test_fsck_healthy_and_after_delta(idx, ray_session):
    rep = fsck.fsck(idx)
    assert rep["ok"], rep["errors"]
    delta = pd.DataFrame([
        {"doc_id": 900001, "text": "alpha beta gamma", "state": "active"},
        {"doc_id": 3, "text": "", "state": "deleted"},
    ])
    incremental.build_incremental(idx, rd.from_pandas(delta), integrity_check=False)
    rep = fsck.fsck(idx)
    assert rep["ok"], rep["errors"]  # exact corrections keep stats consistent


def test_fsck_detects_missing_file(idx, ray_session):
    man = mf.read_manifest(idx)
    victim = os.path.join(idx, man["segments"][0]["path"] + ".bin")
    os.remove(victim)
    rep = fsck.fsck(idx)
    assert not rep["ok"] and any("missing file" in e for e in rep["errors"])


def test_fsck_detects_stat_drift(idx, ray_session):
    # doctor the manifest's n_docs — the classic silent-corruption case
    ver = mf.current_version(idx)
    path = os.path.join(mf.version_dir(idx, ver), "manifest.json")
    man = json.load(open(path))
    man["n_docs"] += 7
    json.dump(man, open(path, "w"))
    rep = fsck.fsck(idx)
    assert not rep["ok"] and any("n_docs mismatch" in e for e in rep["errors"])
