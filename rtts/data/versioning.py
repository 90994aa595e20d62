"""Data versioning (SURVEY.md §3.1 #19: the reference tracks raw downloads
and preprocessed artifacts with DVC + a GCS remote).

Self-contained equivalent: content-addressed artifact tracking.
- ``snapshot(paths, lock_file)`` hashes artifacts into a lock file
  (path -> sha256, size, mtime) — the dvc.lock analog, committed to git.
- ``status(lock_file)`` reports added/changed/missing artifacts.
- ``push(lock_file, remote)`` / ``pull(lock_file, remote)`` copy blobs to
  or from a content-addressed store (``<remote>/objects/<hash>``).  Local
  directory remotes work everywhere; URL remotes raise the standard
  actionable offline error in this environment.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import shutil
from typing import Dict, Iterable, List, Tuple


def _sha256(path: pathlib.Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def snapshot(paths: Iterable[str], lock_file: str) -> Dict[str, dict]:
    """Hash every file (recursing into directories) into the lock file."""
    entries: Dict[str, dict] = {}
    for p in paths:
        root = pathlib.Path(p)
        files = [root] if root.is_file() else sorted(
            q for q in root.rglob("*") if q.is_file())
        for f in files:
            st = f.stat()
            entries[str(f)] = {
                "sha256": _sha256(f),
                "size": st.st_size,
            }
    lock = pathlib.Path(lock_file)
    lock.parent.mkdir(parents=True, exist_ok=True)
    with open(lock, "w") as fh:
        json.dump({"version": 1, "artifacts": entries}, fh, indent=1,
                  sort_keys=True)
    return entries


def _load_lock(lock_file: str) -> Dict[str, dict]:
    with open(lock_file) as f:
        return json.load(f)["artifacts"]


def status(lock_file: str) -> Dict[str, List[str]]:
    """-> {"missing": [...], "changed": [...], "clean": [...]}"""
    entries = _load_lock(lock_file)
    out: Dict[str, List[str]] = {"missing": [], "changed": [], "clean": []}
    for path, meta in entries.items():
        p = pathlib.Path(path)
        if not p.exists():
            out["missing"].append(path)
        elif p.stat().st_size != meta["size"] or _sha256(p) != meta["sha256"]:
            out["changed"].append(path)
        else:
            out["clean"].append(path)
    return out


def _remote_objects(remote: str) -> pathlib.Path:
    if "://" in remote and not remote.startswith("file://"):
        raise RuntimeError(
            f"remote {remote!r} needs network egress, unavailable in this "
            "environment — use a local/file:// remote directory")
    root = pathlib.Path(remote.removeprefix("file://"))
    obj = root / "objects"
    obj.mkdir(parents=True, exist_ok=True)
    return obj


def push(lock_file: str, remote: str) -> int:
    """Upload all lock-file artifacts into the remote blob store."""
    obj = _remote_objects(remote)
    n = 0
    for path, meta in _load_lock(lock_file).items():
        dst = obj / meta["sha256"]
        if not dst.exists():
            shutil.copyfile(path, dst)
            n += 1
    return n


def pull(lock_file: str, remote: str) -> Tuple[int, List[str]]:
    """Restore missing/changed artifacts from the remote store.
    Returns (restored_count, unavailable_paths)."""
    obj = _remote_objects(remote)
    restored, missing = 0, []
    st = status(lock_file)
    entries = _load_lock(lock_file)
    for path in st["missing"] + st["changed"]:
        blob = obj / entries[path]["sha256"]
        if not blob.exists():
            missing.append(path)
            continue
        pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(blob, path)
        restored += 1
    return restored, missing
