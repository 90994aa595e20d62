"""Checkpoint / resume (SURVEY.md §6.4).

Self-contained pytree checkpointing: each step writes an atomic directory
``step_<N>/`` containing the leaves as one ``.npz`` keyed by tree path plus
a JSON manifest (step, metric, format version).  Atomicity = write to a tmp
dir, then rename.  Retention keeps the top-k by validation metric plus the
latest (the reference's Lightning ModelCheckpoint posture).

Leaves are path-keyed (not positional), so a consumer can restore any
subtree — e.g. inference restores only ``params/...`` from a training
checkpoint that also carries ``opt_state/...`` (the reference's
"load model weights from a Lightning ckpt" use case).
"""

from __future__ import annotations

import json
import pathlib
import shutil
import threading
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _flatten_with_paths(tree: Any) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        key = _path_str(path)
        if key in out:
            raise ValueError(f"duplicate checkpoint key {key!r}")
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(directory: str | pathlib.Path, tree: Any, step: int,
                    metric: Optional[float] = None, keep: int = 3) -> str:
    base = pathlib.Path(directory)
    base.mkdir(parents=True, exist_ok=True)
    tmp = base / f".tmp_step_{step}"
    final = base / f"step_{step}"
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir()
    flat = _flatten_with_paths(tree)
    np.savez(tmp / "leaves.npz", **flat)
    meta = {
        "step": step,
        "metric": metric,
        "format_version": 2,
        "n_leaves": len(flat),
    }
    with open(tmp / "meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    if final.exists():
        shutil.rmtree(final)
    tmp.rename(final)
    _retain(base, keep)
    return str(final)


def _list_steps(base: pathlib.Path) -> List[Tuple[int, Optional[float], pathlib.Path]]:
    out = []
    for p in base.glob("step_*"):
        try:
            with open(p / "meta.json") as f:
                meta = json.load(f)
            out.append((int(meta["step"]), meta.get("metric"), p))
        except (OSError, ValueError, KeyError):
            continue
    return sorted(out)


def _retain(base: pathlib.Path, keep: int) -> None:
    steps = _list_steps(base)
    if len(steps) <= keep:
        return
    latest = steps[-1][2]
    with_metric = [s for s in steps if s[1] is not None]
    best = sorted(with_metric, key=lambda s: s[1])[: max(0, keep - 1)]
    keep_paths = {latest} | {p for _, _, p in best}
    for _, _, p in steps:
        if p not in keep_paths and len(keep_paths) < len(steps):
            shutil.rmtree(p, ignore_errors=True)


class AsyncCheckpointer:
    """Overlap checkpoint IO with training (SURVEY.md §6.4, production
    posture): ``save`` snapshots the tree to HOST memory synchronously —
    the only part that must see the live device buffers, since the train
    step donates and overwrites them — then hands the npz write, manifest
    and retention to a worker thread and returns.  At flagship scale the
    write is ~0.4 GB; overlapping it hides seconds per save.

    Saves serialize in submission order (a new ``save`` first joins the
    previous one).  Worker errors re-raise on the NEXT ``save``/``wait``.
    Call ``wait()`` (or use as a context manager) before reading the
    directory back — resume, eval-from-latest — or at trainer exit."""

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    def save(self, directory: str | pathlib.Path, tree: Any, step: int,
             metric: Optional[float] = None, keep: int = 3) -> None:
        self.wait()
        host = jax.device_get(tree)   # snapshot before buffers are donated

        def _write() -> None:
            try:
                save_checkpoint(directory, host, step, metric=metric,
                                keep=keep)
            except BaseException as e:  # surface on next save()/wait()
                self._err = e

        self._thread = threading.Thread(target=_write, daemon=True,
                                        name=f"ckpt-save-{step}")
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) lands; re-raise its
        error."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def __enter__(self) -> "AsyncCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        # don't mask an in-flight exception with a save error
        if exc == (None, None, None):
            self.wait()
        else:
            try:
                self.wait()
            except BaseException:
                pass


def latest_checkpoint(directory: str | pathlib.Path) -> Optional[str]:
    base = pathlib.Path(directory)
    if not base.exists():
        return None
    steps = _list_steps(base)
    return str(steps[-1][2]) if steps else None


def restore_checkpoint(path: str | pathlib.Path, example_tree: Any
                       ) -> Tuple[Any, int]:
    """Restore the (sub)tree matching ``example_tree``'s structure.

    Any leaf path present in the example must exist in the checkpoint;
    checkpoint-only paths are ignored (partial restore)."""
    p = pathlib.Path(path)
    with open(p / "meta.json") as f:
        meta = json.load(f)
    with np.load(p / "leaves.npz") as z:
        stored = {k: z[k] for k in z.files}
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(example_tree)
    leaves = []
    missing = []
    for path_k, example_leaf in paths_leaves:
        key = _path_str(path_k)
        if key not in stored:
            missing.append(key)
            continue
        arr = stored[key]
        if hasattr(example_leaf, "shape") and tuple(arr.shape) != tuple(
                np.shape(example_leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, expected "
                f"{np.shape(example_leaf)} — config/model mismatch?")
        leaves.append(arr)
    if missing:
        raise ValueError(
            f"checkpoint at {p} missing {len(missing)} leaves, e.g. "
            f"{missing[:3]} — config/model mismatch?")
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored, int(meta["step"])
