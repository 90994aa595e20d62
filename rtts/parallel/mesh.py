"""Device mesh construction and multi-host init (SURVEY.md §3.5, §6.8).

The reference had no first-party distributed code (Lightning DDP/NCCL only as
an unused option).  Here the SPMD mesh is first-class: a 2-D
``(data, model)`` mesh over ICI; shardings are expressed with
``NamedSharding``/``PartitionSpec`` and XLA inserts the collectives.

Single-chip runs use the same code path with a 1x1 mesh, so nothing is
special-cased — "pjit from day one".
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from rtts.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"

_initialized = False


def should_initialize(cfg: Optional[MeshConfig] = None,
                      env: Optional[dict] = None) -> bool:
    """Decide whether ``jax.distributed.initialize`` is needed.

    The decision must NOT consult ``jax.process_count()`` — before init that
    is always 1, so a guard built on it defeats itself.  Instead the signal
    is explicit: a coordinator address / process count in the MeshConfig, or
    the ``RTTS_MULTIHOST=1`` env opt-in (which defers to JAX's cluster
    auto-detection).  Generic cluster env vars are deliberately NOT sniffed:
    single-host TPU-VM images ship with e.g. TPU_WORKER_HOSTNAMES set.
    """
    env = os.environ if env is None else env
    if cfg is not None and (cfg.coordinator_address or cfg.num_processes > 1):
        return True
    return env.get("RTTS_MULTIHOST", "") not in ("", "0")


def initialize_distributed(cfg: Optional[MeshConfig] = None) -> None:
    """Multi-host init (idempotent). No-op on a single process.

    Call this from every entry point BEFORE the first backend use; with no
    coordinator configured (the single-host common case) it does nothing.
    When ``cfg.coordinator_address``/``num_processes`` are set (or cluster
    env vars are present), it runs ``jax.distributed.initialize``, passing
    explicit values when configured and letting JAX's cluster auto-detection
    fill the rest.
    """
    global _initialized
    if _initialized or not should_initialize(cfg):
        return
    kwargs = {}
    if cfg is not None:
        if cfg.coordinator_address:
            kwargs["coordinator_address"] = cfg.coordinator_address
        if cfg.num_processes > 1:
            kwargs["num_processes"] = cfg.num_processes
            kwargs["process_id"] = cfg.process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def current_mesh() -> Optional[Mesh]:
    """The ambient physical mesh set by ``with mesh:`` (None outside one).

    Single point of contact with the legacy thread-resources context so the
    rest of the codebase never touches the private API."""
    from jax._src import mesh as mesh_lib

    m = mesh_lib.thread_resources.env.physical_mesh
    return None if m.empty else m


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh — or (dcn, data, model) across slices.

    data_parallel == -1 means "all devices / (model_parallel * dcn)".  Axis
    order puts the model axis innermost so tensor-parallel collectives ride
    the fastest ICI links; the dcn axis is outermost so only data-parallel
    gradient reductions (infrequent, bandwidth-tolerant) cross slices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dcn = max(1, cfg.dcn_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // (mp * dcn)
    if dcn * dp * mp > n:
        raise ValueError(
            f"mesh {dcn}x{dp}x{mp} needs {dcn * dp * mp} devices, have {n}")
    if dcn > 1:
        # Across slices, group devices so each slice's chips are contiguous
        # along (data, model); jax orders devices by (slice, chip).
        grid = np.asarray(devices[: dcn * dp * mp]).reshape(dcn, dp, mp)
        return Mesh(grid, (cfg.dcn_axis, cfg.data_axis, cfg.model_axis))
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))
