"""Resumable partitioned export (state/export.py)."""

import os

import numpy as np
import pandas as pd
import ray.data as rd

from harvester_ray.state import export


def _corpus(n=200):
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i}" for i in range(n)],
    })


def test_export_complete_and_resume(tmp_path, ray_session):
    out = str(tmp_path / "exp")
    res = export.export_resumable(rd.from_pandas(_corpus()), out, n_partitions=8)
    assert res == {"written": 8, "skipped": 0}
    # every row lands exactly once, in its hash partition
    back = []
    for p in range(8):
        ds = export.read_partition(out, p)
        if ds is not None:
            back.append(ds.to_pandas())
    allb = pd.concat(back).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(allb, _corpus())
    # full resume: everything skips, nothing rewritten
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"p={p}", "_DONE")) for p in range(8)
    }
    res2 = export.export_resumable(rd.from_pandas(_corpus()), out, n_partitions=8)
    assert res2 == {"written": 0, "skipped": 8}
    for p in range(8):
        assert os.path.getmtime(os.path.join(out, f"p={p}", "_DONE")) == mtimes[p]


def test_export_partial_crash_resume(tmp_path, ray_session):
    """Simulate a crash: wipe three partitions' outputs; resume rebuilds
    exactly those and leaves finished partitions untouched."""
    import shutil

    out = str(tmp_path / "exp2")
    export.export_resumable(rd.from_pandas(_corpus()), out, n_partitions=8)
    for p in (1, 4, 6):
        shutil.rmtree(os.path.join(out, f"p={p}"))
    finished_files = {}
    for p in (0, 2, 3, 5, 7):
        pdir = os.path.join(out, f"p={p}")
        finished_files[p] = {
            f: os.path.getmtime(os.path.join(pdir, f)) for f in os.listdir(pdir)
        }
    res = export.export_resumable(rd.from_pandas(_corpus()), out, n_partitions=8)
    assert res == {"written": 3, "skipped": 5}
    for p, files in finished_files.items():
        pdir = os.path.join(out, f"p={p}")
        assert {f: os.path.getmtime(os.path.join(pdir, f)) for f in os.listdir(pdir)} == files
    back = []
    for p in range(8):
        ds = export.read_partition(out, p)
        if ds is not None:
            back.append(ds.to_pandas())
    allb = pd.concat(back).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(allb, _corpus())
