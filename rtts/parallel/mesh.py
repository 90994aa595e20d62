"""Device mesh construction and multi-host init (SURVEY.md §3.5, §6.8).

The reference had no first-party distributed code (Lightning DDP/NCCL only as
an unused option).  Here the SPMD mesh is first-class: a 2-D
``(data, model)`` mesh over ICI; shardings are expressed with
``NamedSharding``/``PartitionSpec`` and XLA inserts the collectives.

Single-chip runs use the same code path with a 1x1 mesh, so nothing is
special-cased — "pjit from day one".
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from rtts.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None) -> None:
    """Multi-host init. No-op on a single process (the common case here)."""
    if jax.process_count() > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    data_parallel == -1 means "all devices / model_parallel".  Axis order puts
    the model axis innermost so tensor-parallel collectives ride the
    fastest ICI links."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, have {n}")
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))
