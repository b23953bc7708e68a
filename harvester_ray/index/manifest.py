"""Index versioning: manifests, atomic current-pointer promotion, retention.

The analog of the reference's immutable ``DatasetVersion`` snapshots with a
single ``is_current`` flip (harvester/core/models/datatypes/dataset.py:124-180,
harvester/core/tasks/harvest/dataset_version.py:47-66) and OpenSearch alias
promotion after a successful push (harvester/search/models/index.py:113-156).

Layout under an index root::

    index_root/
      CURRENT                  # text file holding the current version number
      v{N}/
        manifest.json          # stats, segment list, analyzer id, lineage, metrics
        segments/seg-*.{terms.parquet,docs.parquet,bin,done}
        staging/partials/      # phase-1 checkpoint (segment vocab partials)
        termstats/             # global (term, df, cf) parquet

All writes are write-temp-then-``os.replace`` so a crashed build never leaves
a half-written manifest or a torn CURRENT pointer, and a version becomes
visible only by the atomic pointer flip (promote == alias flip analog).
Retention mirrors the reference's keep-newest-K purge
(harvester/core/models/datatypes/dataset.py:83-102).
"""

from __future__ import annotations

import json
import os
import shutil


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(data)
    os.replace(tmp, path)


def version_dir(index_root: str, version: int) -> str:
    return os.path.join(index_root, f"v{version}")


def list_versions(index_root: str) -> list[int]:
    if not os.path.isdir(index_root):
        return []
    out = []
    for name in os.listdir(index_root):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def next_version(index_root: str) -> int:
    versions = list_versions(index_root)
    return (versions[-1] + 1) if versions else 1


def current_version(index_root: str) -> int | None:
    path = os.path.join(index_root, "CURRENT")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        text = f.read().strip()
    return int(text) if text else None


def promote(index_root: str, version: int) -> None:
    """Atomically flip the CURRENT pointer to ``version`` (alias-flip analog:
    only fully-finished versions may be promoted)."""
    manifest_path = os.path.join(version_dir(index_root, version), "manifest.json")
    if not os.path.exists(manifest_path):
        raise ValueError(f"cannot promote v{version}: no manifest at {manifest_path}")
    _atomic_write(os.path.join(index_root, "CURRENT"), str(version))


def write_manifest(index_root: str, version: int, manifest: dict) -> str:
    path = os.path.join(version_dir(index_root, version), "manifest.json")
    _atomic_write(path, json.dumps(manifest, indent=2, sort_keys=True))
    return path


def read_manifest(index_root: str, version: int | None = None) -> dict:
    if version is None:
        version = current_version(index_root)
        if version is None:
            raise FileNotFoundError(f"no CURRENT pointer in {index_root}")
    path = os.path.join(version_dir(index_root, version), "manifest.json")
    with open(path) as f:
        manifest = json.load(f)
    manifest["_version"] = version
    return manifest


def purge_stale_versions(index_root: str, keep: int = 3) -> list[int]:
    """Delete all but the newest ``keep`` versions, never the current one and
    never a version whose files are still referenced by a kept manifest
    (incremental versions carry segments forward by pointer)
    (retention analog: core/models/datatypes/dataset.py:83-102)."""
    versions = list_versions(index_root)
    cur = current_version(index_root)
    kept = set(versions[-keep:]) if keep > 0 else set()
    if cur is not None:
        kept.add(cur)
    referenced: set[int] = set()
    for v in kept:
        try:
            man = read_manifest(index_root, v)
        except FileNotFoundError:
            continue
        for seg in man.get("segments", []):
            top = seg["path"].split("/", 1)[0]
            if top.startswith("v") and top[1:].isdigit():
                referenced.add(int(top[1:]))
        ts = man.get("termstats", "")
        top = ts.split("/", 1)[0]
        if top.startswith("v") and top[1:].isdigit():
            referenced.add(int(top[1:]))
    purged = []
    for v in versions:
        if v in kept or v in referenced:
            continue
        shutil.rmtree(version_dir(index_root, v), ignore_errors=True)
        purged.append(v)
    return purged


# --- aliases ---------------------------------------------------------------
# OpenSearch levels indirection through ALIASES (the reference flips its
# `latest-<dataset>` alias to the freshly pushed physical index,
# harvester/search/models/index.py:113-156); CURRENT covers versioning
# WITHIN one index root, aliases cover naming ACROSS roots: a serving name
# like "products" can atomically retarget from one index root (+ optional
# pinned version) to another — blue/green reindex, A/B ranking, rollback.

def _alias_path(registry_dir: str) -> str:
    return os.path.join(registry_dir, "aliases.json")


def set_alias(registry_dir: str, name: str, index_root: str,
              version: int | None = None) -> dict:
    """Point ``name`` at (index_root, version). Atomic read-modify-replace;
    last writer wins, readers never observe a torn registry."""
    os.makedirs(registry_dir, exist_ok=True)
    path = _alias_path(registry_dir)
    reg = {}
    if os.path.exists(path):
        with open(path) as f:
            reg = json.load(f)
    reg[name] = {"root": os.path.abspath(index_root), "version": version}
    _atomic_write(path, json.dumps(reg, indent=1))
    return reg[name]


def delete_alias(registry_dir: str, name: str) -> bool:
    path = _alias_path(registry_dir)
    if not os.path.exists(path):
        return False
    with open(path) as f:
        reg = json.load(f)
    if name not in reg:
        return False
    del reg[name]
    _atomic_write(path, json.dumps(reg, indent=1))
    return True


def resolve_alias(registry_dir: str, name: str) -> tuple[str, int | None]:
    """→ (index_root, pinned_version_or_None). KeyError if undefined."""
    with open(_alias_path(registry_dir)) as f:
        reg = json.load(f)
    if name not in reg:
        raise KeyError(f"alias {name!r} not defined in {registry_dir}")
    a = reg[name]
    return a["root"], a["version"]


# --- single-writer build lock ----------------------------------------------
# the reference serializes concurrent pushes/merges with
# select_for_update(nowait) row locks (search/tasks/index.py:23-25,
# core/processors/pipeline/resource.py:119-135); the filesystem analog is
# an O_EXCL lock file carrying the writer's pid — a second writer fails
# fast (nowait semantics), a crashed writer's lock is stolen once its pid
# is gone, and resume-after-crash therefore needs no manual cleanup.

class BuildLockError(RuntimeError):
    """Another live process is already building this index root."""


class build_lock:
    def __init__(self, index_root: str):
        self.path = os.path.join(index_root, ".build.lock")
        self.root = index_root

    def __enter__(self):
        os.makedirs(self.root, exist_ok=True)
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    with open(self.path) as f:
                        pid = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    pid = 0
                if pid and os.path.exists(f"/proc/{pid}") and pid != os.getpid():
                    raise BuildLockError(
                        f"index {self.root!r} is being built by pid {pid}"
                    )
                # stale (crashed writer) or our own re-entry: steal it
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass
        return False


def rollover(
    registry_dir: str,
    alias: str,
    new_root: str,
    *,
    max_docs: int | None = None,
    max_versions: int | None = None,
) -> dict:
    """ES rollover API analog: evaluate size conditions against the index
    the alias currently targets; when ANY condition is met, atomically
    retarget the alias to ``new_root`` (which the caller has prepared —
    the write-index handoff). The old index is left intact for readers
    holding its root. Returns the ES-shaped response: per-condition
    verdicts plus ``rolled_over``."""
    old_root, pinned = resolve_alias(registry_dir, alias)
    man = read_manifest(old_root, pinned)
    conditions = {}
    if max_docs is not None:
        conditions["max_docs"] = int(man.get("n_docs", 0)) >= max_docs
    if max_versions is not None:
        conditions["max_versions"] = int(man.get("_version", 0)) >= max_versions
    rolled = bool(conditions) and any(conditions.values())
    if rolled:
        set_alias(registry_dir, alias, new_root, version=None)
    return {
        "old_index": old_root,
        "new_index": new_root if rolled else old_root,
        "rolled_over": rolled,
        "conditions": conditions,
    }
