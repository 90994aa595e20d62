"""Mixed-precision (bfloat16 compute) path: forward + reversible backward
must run and produce finite grads — catches dtype plumbing regressions the
f32-only tests can't see (found live on TPU: vjp cotangent dtype mismatch
between f32 residual streams and bf16 sublayer outputs)."""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from rtts.models import reformer_tts as M
from rtts.train.losses import tts_loss

from tests.test_model_lsh import lsh_cfg, _batch, _loss_fn


def test_bf16_reversible_train_step_finite():
    cfg = dataclasses.replace(lsh_cfg(reversible=True),
                              compute_dtype="bfloat16")
    params = M.init(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    loss, grads = jax.jit(jax.value_and_grad(_loss_fn(cfg, batch)))(params)
    assert np.isfinite(float(loss))
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).sum()) > 0


def test_bf16_grads_close_to_f32():
    """bf16 compute should give gradients in the same direction as f32
    (cosine similarity) — a sanity check on the mixed-precision policy."""
    batch = _batch()
    params = M.init(jax.random.PRNGKey(0), lsh_cfg(reversible=True))
    cfg32 = lsh_cfg(reversible=True)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    _, g32 = jax.value_and_grad(_loss_fn(cfg32, batch))(params)
    _, g16 = jax.value_and_grad(_loss_fn(cfg16, batch))(params)
    f32, _ = jax.flatten_util.ravel_pytree(g32)
    f16, _ = jax.flatten_util.ravel_pytree(g16)
    cos = float(jnp.dot(f32, f16) /
                (jnp.linalg.norm(f32) * jnp.linalg.norm(f16) + 1e-9))
    assert cos > 0.99, cos

