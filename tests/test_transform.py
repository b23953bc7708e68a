import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from harvester_ray.pipelines import transform

SF = "/root/testdata/sf0.001"


def _full_pivot() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    return con.execute(transform.transform_pivot_sql("events")).df()


@pytest.mark.parametrize("frac", [(1, 2), (9, 10), (0, 1), (1, 1)])
def test_incremental_equals_full_at_any_checkpoint(ray_session, tmp_path, frac):
    got = transform.transform_pivot(
        SF, str(tmp_path / f"dest-{frac[0]}-{frac[1]}"), checkpoint_frac=frac
    )
    want = _full_pivot()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_continuous_step_rewrites_only_changed_buckets(ray_session, tmp_path, monkeypatch):
    """Phase B must touch only bucket files whose keys changed."""
    dest = str(tmp_path / "dest")
    written = []
    real_write = transform.pq.write_table

    def spy(table, path, **kw):
        written.append(os.path.basename(path))
        return real_write(table, path, **kw)

    monkeypatch.setattr(transform.pq, "write_table", spy)
    transform.transform_pivot(SF, dest, n_buckets=16, checkpoint_frac=(9, 10))
    n_initial = 16
    phase_b = written[n_initial:]
    assert 0 < len(phase_b) < 16, (
        "continuous step should rewrite a strict, non-empty subset of buckets"
    )


def test_checkpoint_tail_is_nonempty_on_fixture(ray_session, tmp_path):
    """Degeneracy probe: at the gate's 9/10 watermark the continuous step
    must have real work (otherwise the gate only tests the initial run)."""
    import pyarrow.parquet as pq

    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"])["ts"]
    us = ts.cast("timestamp[us]").cast("int64").to_numpy()
    cut = us.min() + (us.max() - us.min()) * 9 // 10
    assert (us > cut).sum() > 0
