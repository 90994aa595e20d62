"""Sharded serving: tensor- and data-parallel AR decode (SURVEY.md §3.4
applied to the inference surface).

The decode step runs the same matmul set as the training step — QKV /
output projections, cross-attention, FFN — so the training-side TP rules
(`rtts/parallel/sharding.py`: wide axes over the ``model`` mesh axis)
apply to serving unchanged, and the request batch shards over ``data``
(and ``dcn`` when the mesh has one).  The KV caches inherit head-axis
sharding from the projections through XLA's sharding propagation: the
while_loop carry keeps them device-resident and sharded across steps, so
the only recurring cross-device traffic is the activation psum after the
row-sharded output/FFN matmuls, riding ICI.

No hand-written collectives: shard the inputs, jit the existing
`decode_greedy`, and let XLA place the reductions.  Exercised on a
virtual mesh in tests/test_serving_tp.py and as a driver dryrun phase
(__graft_entry__._dryrun_serving_tp).
"""

from __future__ import annotations

from typing import Any

import jax

from rtts.parallel.mesh import DATA_AXIS, DCN_AXIS
from rtts.parallel.sharding import (batch_sharding, make_param_shardings,
                                    replicated)


def shard_for_serving(params: Any, mesh, tensor_parallel: bool = True) -> Any:
    """Device-put model params with the serving sharding: TP rules when
    ``tensor_parallel`` (FFN + attention projections over ``model``),
    everything else replicated."""
    return jax.device_put(
        params, make_param_shardings(params, mesh, tensor_parallel))


def replicate_for_serving(params: Any, mesh) -> Any:
    """Replicate a param tree over the mesh (e.g. the vocoder, whose
    depthwise convs have no wide axis worth sharding — it scales by
    data-parallel batch instead)."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)


def data_parallel_size(mesh) -> int:
    """Number of ways the request batch is split (data × dcn axes)."""
    n = 1
    for ax in (DCN_AXIS, DATA_AXIS):
        if ax in mesh.axis_names:
            n *= mesh.shape[ax]
    return n


def shard_request_batch(tree: Any, mesh) -> Any:
    """Shard a pytree of batched request arrays over the data axis.  The
    leading dim of every leaf must be divisible by ``data_parallel_size``
    — pad the request list upstream (Synthesizer repeats the last row)."""
    dp = data_parallel_size(mesh)

    def one(x):
        if x.shape[0] % dp:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by data-parallel size "
                f"{dp}; pad the request batch first")
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree.map(one, tree)
