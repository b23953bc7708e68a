"""Management CLI smoke test (harvester_ray/__main__.py) — one subprocess
per lifecycle step over a tiny corpus; the CLI owns its own Ray session."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _run(*args):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # CLI starts its own local session
    proc = subprocess.run(
        [sys.executable, "-m", "harvester_ray", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout.strip().splitlines()[-1]


@pytest.mark.slow
def test_cli_lifecycle(tmp_path):
    corpus = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [f"spark window doc {i}" if i % 2 else f"batch stream {i}"
                 for i in range(50)],
    })
    src = str(tmp_path / "corpus.parquet")
    corpus.to_parquet(src)
    root = str(tmp_path / "idx")
    out = json.loads(_run("build", src, root))
    assert out["n_docs"] == 50 and out["version"] == 1
    hits = json.loads(_run("search", root, "spark window", "--k", "3"))
    assert len(hits) == 3 and all("doc_id" in h for h in hits)
    stats = json.loads(_run("stats", root))
    assert stats["n_docs"] == 50
    repo = str(tmp_path / "repo")
    rec = json.loads(_run("snapshot", root, repo))
    dest = str(tmp_path / "restored")
    json.loads(_run("restore", repo, rec["name"], dest))
    hits2 = json.loads(_run("search", dest, "spark window", "--k", "3"))
    assert hits == hits2


@pytest.mark.slow
def test_cli_lifecycle_extensions(tmp_path):
    """reindex / delete-by-query / update-by-query / rollover /
    prune-snapshots command round-trip over a tiny _source-enabled index."""
    corpus = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"spark window doc {i}" if i % 2 else f"batch stream {i}"
                 for i in range(40)],
        "lang": ["en" if i % 4 else "de" for i in range(40)],
    })
    src = str(tmp_path / "corpus.parquet")
    corpus.to_parquet(src)
    root = str(tmp_path / "idx")
    # build can't set store_source from the CLI build cmd — build via delta
    # path? No: build it with the library through a python -c subprocess to
    # keep the session isolation, then drive everything else via the CLI.
    code = (
        "import ray, ray.data as rd; from harvester_ray.index import build; "
        f"ray.init(address='local', num_cpus=4, include_dashboard=False); "
        f"build.build_index(rd.read_parquet({src!r}), {root!r}, "
        "attr_cols=['lang'], store_source=True); ray.shutdown()"
    )
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd="/root/repo", env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]

    dest = str(tmp_path / "re")
    out = json.loads(_run("reindex", root, dest, "--filter", "lang=en"))
    assert out["n_docs"] == 30
    res = json.loads(_run("update-by-query", dest, "spark", "--append", " zzmark"))
    assert res["updated"] > 0
    hits = json.loads(_run("search", dest, "zzmark", "--k", "5", "--mode", "or"))
    assert len(hits) == 5
    res = json.loads(_run("delete-by-query", dest, "zzmark"))
    assert res["deleted"] == 20  # the 20 updated docs
    # update replaced 20 docs (20 tombstones) + 20 deletes = 40 total
    assert json.loads(_run("stats", dest))["tombstones"] == 40
    assert json.loads(_run("search", dest, "zzmark", "--k", "5", "--mode", "or")) == []

    repo = str(tmp_path / "repo")
    json.loads(_run("snapshot", dest, repo, "--name", "a"))
    json.loads(_run("snapshot", dest, repo, "--name", "b"))
    pr = json.loads(_run("prune-snapshots", repo, "--keep-last", "1"))
    assert pr["deleted"] == ["a"] and pr["kept"] == ["b"]

    reg = str(tmp_path / "registry")
    # point alias at dest, roll to root when doc threshold met
    code2 = (
        "from harvester_ray.index import manifest as mf; "
        f"mf.set_alias({reg!r}, 'writes', {dest!r})"
    )
    subprocess.run([sys.executable, "-c", code2], check=True, cwd="/root/repo",
                   timeout=60)
    ro = json.loads(_run("rollover", reg, "writes", root, "--max-docs", "1"))
    assert ro["rolled_over"] is True


def test_cli_search_dsl(tmp_path):
    """search-dsl: an ES _search JSON body through the CLI (query DSL +
    from/size + track_total_hits) matches the plain search command."""
    corpus = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": [f"spark window doc {i}" if i % 2 else f"batch stream {i}"
                 for i in range(30)],
    })
    src = str(tmp_path / "c.parquet")
    corpus.to_parquet(src)
    root = str(tmp_path / "idx")
    json.loads(_run("build", src, root))
    body = json.dumps({
        "query": {"match": {"text": {"query": "spark window", "operator": "and"}}},
        "size": 3, "track_total_hits": True,
    })
    resp = json.loads(_run("search-dsl", root, body))
    plain = json.loads(_run("search", root, "spark window", "--k", "3"))
    assert [h["_id"] for h in resp["hits"]["hits"]] == [h["doc_id"] for h in plain]
    assert resp["hits"]["total"]["value"] == 15
    # @file form
    bf = tmp_path / "body.json"
    bf.write_text(body)
    resp2 = json.loads(_run("search-dsl", root, f"@{bf}"))
    assert resp2 == resp


@pytest.mark.slow
def test_cli_update_and_cat_indices(tmp_path):
    corpus = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [f"spark window doc {i}" for i in range(20)],
        "source": [f"s{i % 3}" for i in range(20)],
    })
    src = str(tmp_path / "c.parquet")
    corpus.to_parquet(src)
    root = str(tmp_path / "idx")
    json.loads(_run("build", src, root, "--attrs", "source", "--store-source"))
    out = json.loads(_run("update", root, "4", '{"source": "patched"}'))
    assert out["result"] == "updated" and out["version"] == 2
    cat = json.loads(_run("cat-indices", root))
    assert len(cat) == 2 and cat[-1]["current"] and cat[-1]["n_docs"] == 20
    assert all(row["bytes"] > 0 for row in cat)
    ok = json.loads(_run("validate-query", '{"match": {"text": "spark"}}'))
    assert ok == {"valid": True}
    caps = json.loads(_run("field-caps", root))
    assert {"text", "dl", "source"} <= {r["field"] for r in caps}
