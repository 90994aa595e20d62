"""Sharding rules: PartitionSpecs for params, batches, and optimizer state.

Design (SURVEY.md §3.4): data-parallel is the first-class strategy — batch
axis sharded over ``data``; parameters replicated by default, with optional
tensor-parallel rules that shard d_ff / heads over ``model`` for larger
configs.  XLA emits the gradient psum from these annotations; no hand-written
collectives on the training path.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtts.parallel.mesh import DATA_AXIS, DCN_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis — and over the
    outermost DCN axis too when the mesh has one (cross-slice data
    parallelism: each slice sees its own batch shard; only the gradient
    psum crosses DCN, SURVEY.md §6.8)."""
    axes = tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)
    batch_axes = axes if len(axes) > 1 else (axes[0] if axes else None)
    return NamedSharding(mesh, P(batch_axes, *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def param_sharding_rules(path_str: str, ndim: int, tensor_parallel: bool) -> P:
    """Map a parameter (by pytree path string + rank) to a PartitionSpec.

    Without tensor parallelism everything is replicated.  With it, the FFN
    and attention projection matrices shard their wide axis over ``model``:
      - ffn in-projection  (d_model, d_ff): shard axis 1
      - ffn out-projection (d_ff, d_model): shard axis 0
      - qkv projections    (d_model, n_heads*head_dim): shard axis 1
      - attention output   (n_heads*head_dim, d_model): shard axis 0
    """
    if not tensor_parallel or ndim < 2:
        return P()
    p = path_str.lower()
    if ("ffn" in p or "feed_forward" in p) and ("w_in" in p or "wi" in p):
        return P(None, MODEL_AXIS)
    if ("ffn" in p or "feed_forward" in p) and ("w_out" in p or "wo" in p):
        return P(MODEL_AXIS, None)
    if any(k in p for k in ("w_qk", "w_q", "w_k", "w_v", "qkv")):
        return P(None, MODEL_AXIS)
    if "w_o" in p or "out_proj" in p:
        return P(MODEL_AXIS, None)
    return P()


def make_param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """Build a NamedSharding pytree matching ``params``."""

    def one(path, leaf):
        path_str = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        spec = param_sharding_rules(path_str, getattr(leaf, "ndim", 0), tensor_parallel)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def _zero_extend(spec: P, shape, dp: int) -> P:
    """Add the data axis to the first unsharded dim divisible by ``dp``."""
    dims = list(spec) + [None] * (len(shape) - len(spec))
    for i, (d, s) in enumerate(zip(dims, shape)):
        if d is None and s >= dp and s % dp == 0:
            dims[i] = DATA_AXIS
            break
    return P(*dims)


def opt_state_shardings(opt_state: Any, mesh: Mesh,
                        tensor_parallel: bool = False,
                        zero: bool = False) -> Any:
    """NamedShardings for an optax state tree (SURVEY.md §3.4 extended).

    The Adam moments mirror the param tree inside the state (``…/mu/<param
    path>``), so the TP param rules apply to them through the same
    path-substring match.  With ``zero`` (ZeRO-1 / optimizer state
    sharding), each moment additionally shards its first unsharded,
    dp-divisible axis over the ``data`` axis: every data-parallel rank
    materializes 1/dp of the optimizer state, and XLA emits the update
    all-gather from the shardings — memory scales, the training-step
    numerics are unchanged (tests/test_zero_sharding.py).  Step counts
    and other scalars replicate."""
    dp = mesh.shape.get(DATA_AXIS, 1)

    def one(path, leaf):
        path_str = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
        ndim = getattr(leaf, "ndim", 0)
        spec = param_sharding_rules(path_str, ndim, tensor_parallel)
        if zero and ndim >= 1 and dp > 1:
            spec = _zero_extend(spec, leaf.shape, dp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, opt_state)
