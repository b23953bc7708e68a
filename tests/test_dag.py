"""Task-DAG stage protocol: checks/depends_on semantics, Merkle-fingerprint
invalidation, per-partition checkpointed resume
(reference core/models/datatypes/base.py:17-77)."""

import json
import os

from harvester_ray.state import dag


def _specs(log_dir):
    def mk(name):
        def fn(payload, results):
            # visible side effect per execution, to count real (non-cached) runs
            with open(os.path.join(log_dir, f"{name}-{payload}-runs"), "a") as f:
                f.write("x")
            return {"task": name, "payload": payload, "deps": sorted(results)}

        return fn

    return [
        dag.TaskSpec("extract", mk("extract"), depends_on=["$.input"]),
        dag.TaskSpec("normalize", mk("normalize"), depends_on=["extract"]),
        dag.TaskSpec("audit", mk("audit"), depends_on=[]),  # input-independent
        dag.TaskSpec("publish", mk("publish"), depends_on=["normalize", "audit"],
                     checks=["allow_publish"]),
    ]


def _runs(log_dir, name, payload):
    p = os.path.join(log_dir, f"{name}-{payload}-runs")
    return len(open(p).read()) if os.path.exists(p) else 0


def test_checks_and_negation():
    assert dag.checks_pass(["a"], {"a": 1})
    assert not dag.checks_pass(["a"], {"a": 0})
    assert dag.checks_pass(["!a"], {"a": 0})
    assert not dag.checks_pass(["!a"], {"a": 1})


def test_resume_reruns_only_invalidated_stages(tmp_path):
    log = str(tmp_path / "log"); os.makedirs(log)
    runner = dag.DagRunner(_specs(log), str(tmp_path / "ckpt"))
    parts = {"p0": ("fp0-v1", "p0"), "p1": ("fp1-v1", "p1"), "p2": ("fp2-v1", "p2")}
    attrs = {"allow_publish": True}
    state = runner.run(parts, attrs=attrs, parallel=True)
    for pid in parts:
        assert all(state[pid][t]["success"] for t in ("extract", "normalize", "audit", "publish"))
        for t in ("extract", "normalize", "audit", "publish"):
            assert _runs(log, t, pid) == 1

    # full re-run with unchanged inputs: everything cache-hits
    state2 = runner.run(parts, attrs=attrs, parallel=False)
    for pid in parts:
        for t in ("extract", "normalize", "audit", "publish"):
            assert _runs(log, t, pid) == 1, f"{t}/{pid} re-ran without invalidation"
            assert state2[pid][t]["ran"] is False

    # edit ONE partition's input: only its input-dependent chain re-runs
    parts["p1"] = ("fp1-v2", "p1")
    state3 = runner.run(parts, attrs=attrs, parallel=True)
    assert _runs(log, "extract", "p1") == 2
    assert _runs(log, "normalize", "p1") == 2
    assert _runs(log, "publish", "p1") == 2  # downstream of normalize
    assert _runs(log, "audit", "p1") == 1  # input-independent: cached
    for pid in ("p0", "p2"):  # untouched partitions fully cached
        for t in ("extract", "normalize", "audit", "publish"):
            assert _runs(log, t, pid) == 1
    assert state3["p1"]["extract"]["ran"] is True
    assert state3["p0"]["extract"]["ran"] is False


def test_failed_check_gates_task_and_dependents(tmp_path):
    log = str(tmp_path / "log"); os.makedirs(log)
    runner = dag.DagRunner(_specs(log), str(tmp_path / "ckpt"))
    state = runner.run({"p0": ("fp", "p0")}, attrs={"allow_publish": False}, parallel=False)
    assert state["p0"]["publish"]["skipped"] is True
    assert _runs(log, "publish", "p0") == 0
    assert state["p0"]["normalize"]["success"]


def test_pending_tasks_reference_semantics(tmp_path):
    log = str(tmp_path / "log"); os.makedirs(log)
    runner = dag.DagRunner(_specs(log), str(tmp_path / "ckpt"))
    # nothing run yet: all tasks pending (deps counted as satisfiable this pass)
    assert runner.pending_tasks("p0", "fp-v1", {"allow_publish": True}) == [
        "extract", "normalize", "audit", "publish"
    ]
    runner.run({"p0": ("fp-v1", "p0")}, attrs={"allow_publish": True}, parallel=False)
    assert runner.pending_tasks("p0", "fp-v1", {"allow_publish": True}) == []
    # input change: exactly the input-dependent chain becomes pending
    assert runner.pending_tasks("p0", "fp-v2", {"allow_publish": True}) == [
        "extract", "normalize", "publish"
    ]


def test_cycle_detection():
    import pytest

    specs = [
        dag.TaskSpec("a", lambda p, r: 1, depends_on=["b"]),
        dag.TaskSpec("b", lambda p, r: 1, depends_on=["a"]),
    ]
    with pytest.raises(ValueError, match="cycle"):
        dag.toposort(specs)
