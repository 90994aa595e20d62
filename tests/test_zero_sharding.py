"""ZeRO-1 optimizer-state sharding (rtts/parallel/sharding.py
``opt_state_shardings``): Adam moments shard over the data axis (and
follow the TP param rules), the training step's numerics are unchanged,
and the state is genuinely distributed (not replicated)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import MeshConfig, OptimConfig
from rtts.models import reformer_tts as M
from rtts.parallel.mesh import make_mesh
from rtts.parallel.sharding import (batch_sharding, make_param_shardings,
                                    opt_state_shardings, replicated)
from rtts.text import vocab_size
from rtts.train.losses import make_stop_target, tts_loss
from rtts.train.optim import make_optimizer
from rtts.train.train_tts import make_train_step

from tests.test_model_lsh import lsh_cfg


def _setup():
    cfg = lsh_cfg(reversible=False)
    params = M.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(OptimConfig(warmup_steps=10, total_steps=100))
    opt_state = optimizer.init(params)
    B, L, T = 2, 32, 32
    batch = {
        "tokens": jax.random.randint(jax.random.PRNGKey(1), (B, L), 3,
                                     vocab_size()),
        "token_mask": jnp.ones((B, L), bool),
        "mel": jax.random.normal(jax.random.PRNGKey(2), (B, T, 20)) * 0.3,
        "mel_mask": jnp.ones((B, T), bool),
    }
    return cfg, params, optimizer, opt_state, batch


def _run_steps(cfg, params, optimizer, opt_state, batch, mesh, *,
               tp, zero, n_steps=2):
    with mesh:
        params = jax.device_put(
            params, make_param_shardings(params, mesh, tensor_parallel=tp))
        opt_state = jax.device_put(
            opt_state, opt_state_shardings(opt_state, mesh,
                                           tensor_parallel=tp, zero=zero))
        batch = {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                 for k, v in batch.items()}
        step = jax.jit(make_train_step(cfg, optimizer))
        losses = []
        for i in range(n_steps):
            params, opt_state, metrics = step(params, opt_state, batch,
                                              jax.random.fold_in(
                                                  jax.random.PRNGKey(5), i))
            losses.append(float(metrics["loss"]))
    return params, opt_state, losses


def test_zero_sharded_step_matches_replicated():
    cfg, params, optimizer, opt_state, batch = _setup()
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=2),
                     jax.devices()[:4])
    p_ref, _, loss_ref = _run_steps(cfg, params, optimizer, opt_state, batch,
                                    mesh, tp=False, zero=False)
    p_z, opt_z, loss_z = _run_steps(cfg, params, optimizer, opt_state, batch,
                                    mesh, tp=True, zero=True)
    np.testing.assert_allclose(loss_z, loss_ref, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        p_z, p_ref)
    # the moments must actually be distributed, not replicated
    sharded = [l for l in jax.tree.leaves(opt_z)
               if getattr(l, "ndim", 0) >= 1
               and not l.sharding.is_fully_replicated]
    assert sharded, "ZeRO produced no sharded optimizer leaves"


def test_zero_spec_prefers_unsharded_divisible_axis():
    from jax.sharding import PartitionSpec as P

    from rtts.parallel.sharding import _zero_extend

    # TP already takes axis 1 -> data lands on axis 0
    assert _zero_extend(P(None, "model"), (64, 128), 4) == P("data", "model")
    # indivisible leading axis -> falls through to the next one
    assert _zero_extend(P(), (3, 64), 4) == P(None, "data")
    # nothing divisible -> unchanged
    assert _zero_extend(P(), (3, 5), 4) == P(None, None)
