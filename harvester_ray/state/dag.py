"""Task-DAG stage protocol with partition checkpoints.

Re-expression of the reference's pluggable task protocol
(core/models/datatypes/base.py:17-77): pipeline stages are declared as named
tasks with ``depends_on`` (other task names, or ``"$.input"``-style property
paths meaning "the partition's input content") and ``checks`` (attribute
gates, ``"!"`` negation) — plus the reference's invalidate-on-change
semantics (base.py:66-77 ``invalidate_task`` / Document.invalidate_task):
when an input property a task depends on changes, that task and everything
downstream of it re-runs, and NOTHING else does.

Mechanism (Merkle fingerprints instead of mutable pipeline dicts): every
task run records ``fingerprint = sha1(task name, the input fingerprint if
the task depends on a property, and the FINGERPRINTS of its dependencies'
runs)``. On resume a task whose recorded fingerprint matches is skipped and
its cached result is reused; any input change flips the fingerprints of
exactly the dependent subgraph. Checkpoints are one JSON per partition
(atomic tmp→replace), so a killed run resumes per partition; partitions fan
out as parallel Ray tasks, each running its own DAG serially in
topological order.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable

PROPERTY_PREFIX = "$"


@dataclass
class TaskSpec:
    """One pipeline stage. ``fn(payload, results) -> JSON-serializable`` —
    ``results`` holds the outputs of every dependency task."""

    name: str
    fn: Callable[[Any, dict[str, Any]], Any]
    depends_on: list[str] = field(default_factory=list)
    checks: list[str] = field(default_factory=list)
    # bump to force re-run on code/config changes (part of the fingerprint)
    version: str = "1"


def checks_pass(checks: list[str], attrs: dict[str, Any]) -> bool:
    """Reference check semantics (base.py:24-30): every check attribute must
    be truthy; a ``!`` prefix negates."""
    for check in checks:
        negate = check.startswith("!")
        value = attrs.get(check[1:] if negate else check)
        if (not value and not negate) or (value and negate):
            return False
    return True


def toposort(tasks: list[TaskSpec]) -> list[TaskSpec]:
    by_name = {t.name: t for t in tasks}
    seen: dict[str, int] = {}  # 0 = visiting, 1 = done
    out: list[TaskSpec] = []

    def visit(name: str) -> None:
        state = seen.get(name)
        if state == 1:
            return
        if state == 0:
            raise ValueError(f"task dependency cycle through {name!r}")
        seen[name] = 0
        for dep in by_name[name].depends_on:
            if not dep.startswith(PROPERTY_PREFIX):
                if dep not in by_name:
                    raise ValueError(f"task {name!r} depends on unknown task {dep!r}")
                visit(dep)
        seen[name] = 1
        out.append(by_name[name])

    for t in tasks:
        visit(t.name)
    return out


def _fingerprint(task: TaskSpec, input_fp: str, dep_fps: list[str]) -> str:
    h = hashlib.sha1()
    h.update(task.name.encode())
    h.update(task.version.encode())
    if any(d.startswith(PROPERTY_PREFIX) for d in task.depends_on):
        h.update(input_fp.encode())
    for fp in dep_fps:
        h.update(fp.encode())
    return h.hexdigest()


def run_partition_dag(
    tasks: list[TaskSpec],
    payload: Any,
    input_fp: str,
    checkpoint_path: str,
    attrs: dict[str, Any] | None = None,
) -> dict[str, dict]:
    """Run one partition's DAG serially in topological order, reusing any
    checkpointed task whose Merkle fingerprint is unchanged. Returns the
    partition's task state: {task: {success, fingerprint, result, ran}}."""
    attrs = attrs or {}
    ordered = toposort(tasks)
    state: dict[str, dict] = {}
    if os.path.exists(checkpoint_path):
        with open(checkpoint_path) as f:
            state = json.load(f)
    results: dict[str, Any] = {}
    for task in ordered:
        dep_tasks = [d for d in task.depends_on if not d.startswith(PROPERTY_PREFIX)]
        deps_ok = all(state.get(d, {}).get("success") for d in dep_tasks)
        if not checks_pass(task.checks, attrs) or not deps_ok:
            state[task.name] = {"success": False, "skipped": True, "ran": False}
            continue
        fp = _fingerprint(task, input_fp, [state[d]["fingerprint"] for d in dep_tasks])
        prior = state.get(task.name)
        if prior and prior.get("success") and prior.get("fingerprint") == fp:
            prior["ran"] = False  # cache hit: invalidation did not reach here
            results[task.name] = prior.get("result")
            continue
        dep_results = {d: results.get(d) for d in dep_tasks}
        try:
            result = task.fn(payload, dep_results)
            state[task.name] = {
                "success": True,
                "fingerprint": fp,
                "result": result,
                "ran": True,
            }
            results[task.name] = result
        except Exception as e:  # recorded, dependents will skip
            state[task.name] = {
                "success": False,
                "error": f"{type(e).__name__}: {e}",
                "fingerprint": fp,
                "ran": True,
            }
    os.makedirs(os.path.dirname(checkpoint_path), exist_ok=True)
    tmp = checkpoint_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, checkpoint_path)
    return state


class DagRunner:
    """Partitioned DAG execution with resume: one checkpoint JSON per
    partition under ``checkpoint_dir``; partitions run as parallel Ray tasks
    (``num_cpus=1`` each). Editing one partition's input re-runs ONLY that
    partition's invalidated stages (tested)."""

    def __init__(self, tasks: list[TaskSpec], checkpoint_dir: str):
        toposort(tasks)  # validate up front
        self.tasks = tasks
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def _ckpt(self, pid: str) -> str:
        return os.path.join(self.checkpoint_dir, f"partition-{pid}.json")

    def run(
        self,
        partitions: dict[str, tuple[str, Any]],
        attrs: dict[str, Any] | None = None,
        parallel: bool = True,
    ) -> dict[str, dict[str, dict]]:
        """``partitions`` maps pid → (input_fingerprint, payload). Returns
        {pid: task_state}."""
        if not parallel:
            return {
                pid: run_partition_dag(self.tasks, payload, fp, self._ckpt(pid), attrs)
                for pid, (fp, payload) in partitions.items()
            }
        import ray

        task = ray.remote(num_cpus=1)(run_partition_dag)
        futures = {
            pid: task.remote(self.tasks, payload, fp, self._ckpt(pid), attrs)
            for pid, (fp, payload) in partitions.items()
        }
        return {pid: ray.get(f) for pid, f in futures.items()}

    def pending_tasks(self, pid: str, input_fp: str, attrs: dict[str, Any] | None = None) -> list[str]:
        """Reference ``get_pending_tasks`` semantics (base.py:17-44) against
        the partition's checkpoint: tasks that have not successfully run at
        the current fingerprint, whose checks pass and whose task
        dependencies are satisfied."""
        attrs = attrs or {}
        state: dict[str, dict] = {}
        path = self._ckpt(pid)
        if os.path.exists(path):
            with open(path) as f:
                state = json.load(f)
        pending = []
        fps: dict[str, str] = {}
        for task in toposort(self.tasks):
            dep_tasks = [d for d in task.depends_on if not d.startswith(PROPERTY_PREFIX)]
            dep_fps = [fps.get(d) or state.get(d, {}).get("fingerprint", "") for d in dep_tasks]
            fp = _fingerprint(task, input_fp, dep_fps)
            fps[task.name] = fp
            prior = state.get(task.name)
            has_run = bool(prior and prior.get("success") and prior.get("fingerprint") == fp)
            deps_met = all(
                state.get(d, {}).get("success") or d in pending for d in dep_tasks
            )
            if not has_run and checks_pass(task.checks, attrs) and deps_met:
                pending.append(task.name)
        return pending
