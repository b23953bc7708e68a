"""Snapshot / restore of index versions into a repository directory.

The reference operates OpenSearch, whose snapshot API is the standard
backup/migration path for its indices (alias flips after restore mirror the
promote flow in harvester/search/models/index.py:113-156). Here the same
semantics over the version-manifest layout:

- A snapshot captures the FILE CLOSURE of one version's manifest: the
  manifest itself, its termstats directory, and every referenced segment
  file (``.terms.parquet``/``.docs.parquet``/``.bin``/``.pos``). Incremental
  versions reference carried-forward segments inside OLDER version
  directories — the closure walks the manifest, not the directory tree, so
  exactly the live files ship.
- Snapshots are INCREMENTAL the way ES's are: segment files are immutable
  and their root-relative path is unique (a rewrite lands in a new version
  directory), so the relpath is a content address — files already present
  in the repository are skipped, and a daily snapshot of a lightly-changed
  index copies only the delta.
- Restore materializes the closure into a destination root (preserving
  relative paths, so cross-version segment pointers keep resolving) and
  atomically flips CURRENT — the alias-flip analog; a reader never observes
  a half-restored index.

Scale: snapshot/restore is pure file I/O proportional to the delta, never
to corpus row count, and each file copy is independent — at cluster scale
the copy loop fans out as Ray tasks against shared storage; single-node it
is sequential shutil, which the tests exercise.
"""

from __future__ import annotations

import json
import os
import shutil

from . import manifest as mf


def _closure(index_root: str, man: dict) -> list[str]:
    """Root-relative paths of every file the manifest's version needs."""
    files = [os.path.join(f"v{man['_version']}", "manifest.json")]
    ts_dir = os.path.join(index_root, man["termstats"])
    for f in sorted(os.listdir(ts_dir)):
        files.append(os.path.join(man["termstats"], f))
    for seg in man["segments"]:
        base = seg["path"]
        for ext in (".terms.parquet", ".docs.parquet", ".bin", ".pos"):
            if os.path.exists(os.path.join(index_root, base + ext)):
                files.append(base + ext)
    return files


def snapshot(index_root: str, repo_dir: str, *, version: int | None = None,
             name: str | None = None) -> dict:
    """Copy one version's file closure into ``repo_dir`` (skipping files the
    repository already holds) and register a snapshot record. Returns the
    record: {name, version, files, copied, reused}."""
    man = mf.read_manifest(index_root, version)
    ver = int(man["_version"])
    name = name or f"snap-v{ver}"
    files_dir = os.path.join(repo_dir, "files")
    snaps_dir = os.path.join(repo_dir, "snapshots")
    os.makedirs(files_dir, exist_ok=True)
    os.makedirs(snaps_dir, exist_ok=True)
    files = _closure(index_root, man)
    to_copy = []
    reused = 0
    for rel in files:
        if os.path.exists(os.path.join(files_dir, rel)):
            reused += 1
        else:
            to_copy.append(rel)

    def _copy(rel: str) -> None:
        dst = os.path.join(files_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(os.path.join(index_root, rel), tmp)
        os.replace(tmp, dst)

    # each copy is independent: fan out as Ray tasks when a session exists
    # and the batch is big enough to amortize task overhead
    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(to_copy) >= 32:
        import ray

        task = ray.remote(num_cpus=0.5)(_copy)
        ray.get([task.remote(rel) for rel in to_copy])
    else:
        for rel in to_copy:
            _copy(rel)
    copied = len(to_copy)
    rec = {"name": name, "version": ver, "files": files,
           "copied": copied, "reused": reused}
    tmp = os.path.join(snaps_dir, name + ".json.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(snaps_dir, name + ".json"))
    return rec


def list_snapshots(repo_dir: str) -> list[dict]:
    snaps_dir = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(snaps_dir):
        return []
    out = []
    for f in sorted(os.listdir(snaps_dir)):
        if f.endswith(".json"):
            with open(os.path.join(snaps_dir, f)) as fh:
                out.append(json.load(fh))
    return out


def restore(repo_dir: str, name: str, dest_root: str) -> dict:
    """Materialize a snapshot into ``dest_root`` and atomically promote its
    version. Files already present (e.g. a partial earlier restore) are
    overwritten via temp+rename, so a crashed restore is re-runnable and
    CURRENT only flips after every file landed."""
    with open(os.path.join(repo_dir, "snapshots", name + ".json")) as f:
        rec = json.load(f)
    files_dir = os.path.join(repo_dir, "files")
    for rel in rec["files"]:
        dst = os.path.join(dest_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".tmp"
        shutil.copyfile(os.path.join(files_dir, rel), tmp)
        os.replace(tmp, dst)
    mf.promote(dest_root, rec["version"])
    return rec


def prune_snapshots(repo_dir: str, *, keep_last: int) -> dict:
    """SLM retention analog (ES snapshot lifecycle ``retention.max_count``):
    keep the newest ``keep_last`` snapshots (by registration version, then
    name), delete the rest, then garbage-collect repository files no kept
    snapshot references. Content-addressed sharing makes this safe: a file
    is deleted only when EVERY surviving snapshot stops referencing it.
    Returns {kept, deleted, files_removed}."""
    snaps = list_snapshots(repo_dir)
    order = sorted(snaps, key=lambda r: (r["version"], r["name"]))
    doomed = order[:-keep_last] if keep_last > 0 else order
    kept = order[len(doomed):]
    referenced = set()
    for r in kept:
        referenced.update(r["files"])
    files_dir = os.path.join(repo_dir, "files")
    snaps_dir = os.path.join(repo_dir, "snapshots")
    removed = 0
    for r in doomed:
        for rel in r["files"]:
            if rel in referenced:
                continue
            p = os.path.join(files_dir, rel)
            if os.path.exists(p):
                os.remove(p)
                removed += 1
        os.remove(os.path.join(snaps_dir, r["name"] + ".json"))
    return {
        "kept": [r["name"] for r in kept],
        "deleted": [r["name"] for r in doomed],
        "files_removed": removed,
    }
