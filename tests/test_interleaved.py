"""Interleaved per-layer attention kinds (reference attn_layers surface)."""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.config import AttentionConfig, ReformerStackConfig
from rtts.models.stack import _layer_kinds, stack_apply, stack_init


def _cfg(attn_layers):
    att = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1, hash_seed=1,
                          use_pallas=False)
    return ReformerStackConfig(num_layers=len(attn_layers), d_model=32,
                               d_ff=64, dropout=0.0, reversible=True,
                               causal=False, attention=att,
                               attn_layers=attn_layers)


def test_interleaved_local_lsh_runs_and_grads():
    cfg = _cfg(["local", "lsh", "local", "lsh"])
    params = stack_init(jax.random.PRNGKey(0), cfg, cross_attend=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    mask = jnp.ones((2, 64), bool)

    def loss(p):
        return jnp.sum(stack_apply(p, cfg, x, mask,
                                   rng=jax.random.PRNGKey(2)) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).sum()) > 0


def test_attn_layers_validation():
    with pytest.raises(ValueError, match="entries"):
        _layer_kinds(dataclasses.replace(_cfg(["lsh", "local"]), num_layers=3))
    with pytest.raises(ValueError, match="unknown attention kind"):
        _layer_kinds(_cfg(["lsh", "bogus"]))


def test_uniform_matches_attn_layers_of_same_kind():
    """attn_layers=["lsh"]*N must equal the plain kind="lsh" stack."""
    base = _cfg(["lsh", "lsh"])
    uniform = dataclasses.replace(base, attn_layers=None)
    params = stack_init(jax.random.PRNGKey(0), base, cross_attend=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    mask = jnp.ones((2, 64), bool)
    y1 = stack_apply(params, base, x, mask, rng=jax.random.PRNGKey(3))
    y2 = stack_apply(params, uniform, x, mask, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
