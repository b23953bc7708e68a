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
