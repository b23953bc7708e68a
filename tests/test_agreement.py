import math

import numpy as np
import pandas as pd
import pyarrow as pa

from harvester_ray.ops import agreement


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_kappa_perfect_agreement(ray_session):
    # degenerate: every doc fails both raters -> den == 0 -> kappa 0.0
    out = agreement.rater_kappa(_docs(["x", "y", "z"]))
    assert out["kappa"].iloc[0] == 0.0
    assert out["n00"].iloc[0] == 3


def test_kappa_matches_closed_form(ray_session):
    rng = np.random.default_rng(5)
    words = ["the", "of", "and", "data", "model", "ray", "with", "to"]
    texts = [
        " ".join(rng.choice(words, size=int(n)))
        for n in rng.integers(2, 80, size=120)
    ]
    out = agreement.rater_kappa(_docs(texts))
    n11, n10, n01, n00 = (int(out[c].iloc[0]) for c in ("n11", "n10", "n01", "n00"))
    total = n11 + n10 + n01 + n00
    assert total == 120
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    den = total * total - chance
    want = math.floor((total * (n11 + n00) - chance) / den * 1e6 + 0.5) / 1e6 if den else 0.0
    assert out["kappa"].iloc[0] == want


def test_calibration_bins_totals_and_bounds(ray_session):
    rng = np.random.default_rng(9)
    words = ["the", "of", "and", "data", "model", "ray", "with", "to"]
    texts = [
        " ".join(rng.choice(words, size=int(n)))
        for n in rng.integers(2, 80, size=150)
    ]
    out = agreement.calibration_bins(_docs(texts))
    assert out["n_docs"].sum() == 150
    assert (out["n_pos"] <= out["n_docs"]).all()
    assert out["bin"].between(0, 9).all()
    assert out["pos_rate"].between(0, 1).all()
    # mean score must sit inside its own bin's range (inclusive edges)
    for r in out.itertuples():
        assert r.bin / 10 - 1e-6 <= r.mean_score <= (r.bin + 1) / 10 + 1e-6
