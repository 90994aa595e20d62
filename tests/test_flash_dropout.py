"""In-kernel attention-probs dropout for the flash kernel.

The keep mask is a counter-based hash of (seed, batch*head, row, col)
(rtts/ops/flash_attention.py module docstring): a pure function of
positions, so the FA2 backward and the reversible replay regenerate it
exactly.  The load-bearing test here is the EXACT-ORACLE one: a dense
jnp attention with the identical mask (``dropout_keep_mask``) must match
the kernel's output AND gradients — that pins the dropped-objective
backward math (ds = p * (r dP - Di)), not just statistics.

CPU: kernels run in interpret mode (plain XLA ops — the hash is jnp).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.attention.full import shared_qk_scores_mask
from rtts.ops.flash_attention import (
    dropout_keep_mask,
    dropout_seed_from_key,
    flash_attend,
)

B, H, D = 2, 2, 64


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _qkv(rng, lq=256, lk=256):
    q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    return q, k, v


def _mask(rng, lk=256):
    m = jnp.asarray(rng.random(size=(B, lk)) > 0.2)
    return m.at[:, 0].set(True)


def _oracle(q, k, v, kv_mask, causal, self_mask, scale, keep, rate):
    """Dense attention applying the EXACT kernel keep mask after softmax."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    pos_q = jnp.arange(lq)
    pos_k = jnp.arange(lk)
    km = kv_mask[:, None, :] if kv_mask is not None else None
    if self_mask:
        scores = shared_qk_scores_mask(
            scores, q_pos=pos_q[None, None, :], k_pos=pos_k[None, None, :],
            kv_mask=km, causal=causal)
    else:
        if km is not None:
            scores = jnp.where(km[..., None, :], scores, -1e9)
        if causal:
            scores = jnp.where(pos_q[:, None] >= pos_k[None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * keep.reshape(b, h, lq, lk) / (1.0 - rate)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


@pytest.mark.parametrize("causal,self_mask", [(False, False), (True, True)])
def test_flash_dropout_matches_dense_oracle(rng, causal, self_mask):
    q, k, v = _qkv(rng)
    mask = _mask(rng)
    rate = 0.3
    seed = jnp.uint32(0xDEADBEEF)
    keep = dropout_keep_mask(seed, B * H, 256, 256, rate)

    def flash_fn(q, k, v):
        return flash_attend(q, k, v, kv_mask=mask, causal=causal,
                            self_mask=self_mask, sm_scale=0.25,
                            dropout_rate=rate, dropout_seed=seed)

    def oracle_fn(q, k, v):
        return _oracle(q, k, v, mask, causal, self_mask, 0.25, keep, rate)

    out = flash_fn(q, k, v)
    ref = oracle_fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.0, atol=2e-5)

    # gradients of the dropped objective must match too
    g_flash = jax.grad(lambda q, k, v: jnp.sum(flash_fn(q, k, v) ** 2),
                       argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(oracle_fn(q, k, v) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=0.0, atol=5e-4)


def test_flash_dropout_rate_zero_is_identity(rng):
    q, k, v = _qkv(rng)
    mask = _mask(rng)
    base = flash_attend(q, k, v, kv_mask=mask, causal=True, sm_scale=0.25)
    zero = flash_attend(q, k, v, kv_mask=mask, causal=True, sm_scale=0.25,
                        dropout_rate=0.0,
                        dropout_seed=jnp.uint32(123))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero))


def test_flash_dropout_deterministic_in_seed(rng):
    q, k, v = _qkv(rng)
    kw = dict(causal=True, self_mask=True, sm_scale=0.25, dropout_rate=0.25)
    a1 = flash_attend(q, k, v, **kw, dropout_seed=jnp.uint32(7))
    a2 = flash_attend(q, k, v, **kw, dropout_seed=jnp.uint32(7))
    b1 = flash_attend(q, k, v, **kw, dropout_seed=jnp.uint32(8))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(b1))


def test_keep_mask_statistics():
    rate = 0.4
    keep = np.asarray(dropout_keep_mask(jnp.uint32(42), 4, 256, 256, rate))
    assert keep.shape == (4, 256, 256)
    # binomial(4*256*256, 0.6): std of the mean ~ 0.001 — 5 sigma band
    assert abs(keep.mean() - (1.0 - rate)) < 0.005
    # distinct masks across the batch*head axis
    assert not np.array_equal(keep[0], keep[1])


def test_flash_dropout_padded_lengths(rng):
    """Non-128-multiple lengths: the pad recursion must thread dropout
    through, and the mask must be a function of GLOBAL positions (the
    padded and notionally-unpadded calls agree on real rows/cols)."""
    lq, lk = 100, 260
    q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    mask = _mask(rng, lk=lk)
    rate = 0.3
    seed = jnp.uint32(5)
    out = flash_attend(q, k, v, kv_mask=mask, sm_scale=0.25,
                       dropout_rate=rate, dropout_seed=seed)
    keep = dropout_keep_mask(seed, B * H, lq, lk, rate)
    ref = _oracle(q, k, v, mask, False, False, 0.25, keep, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.0, atol=2e-5)


def test_stack_flash_dropout_rev_plain_grad_parity(rng):
    """attention_dropout > 0 with flash: true — the reversible backward
    must regenerate the identical in-kernel mask from the replayed aux
    rng: grads match the plain-residual stack to f32 tolerance."""
    import dataclasses

    from rtts.config import AttentionConfig, ReformerStackConfig
    from rtts.models.stack import stack_apply, stack_init

    att = AttentionConfig(kind="full", num_heads=2, head_dim=16,
                          attention_dropout=0.2, flash=True)
    cfg = ReformerStackConfig(num_layers=2, d_model=32, d_ff=64,
                              dropout=0.0, reversible=True, causal=True,
                              attention=att)
    cfg_plain = dataclasses.replace(cfg, reversible=False)
    params = stack_init(jax.random.PRNGKey(0), cfg, cross_attend=False)
    x = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)
    mask = jnp.ones((2, 64), bool)
    key = jax.random.PRNGKey(3)

    def loss(p, c):
        y = stack_apply(p, c, x, mask, rng=key, deterministic=False)
        return jnp.sum(y ** 2)

    l_rev = loss(params, cfg)
    l_plain = loss(params, cfg_plain)
    np.testing.assert_allclose(float(l_rev), float(l_plain), rtol=1e-6)
    g_rev = jax.grad(loss)(params, cfg)
    g_plain = jax.grad(loss)(params, cfg_plain)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_rev)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_plain)
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_p),
                               rtol=0.0, atol=1e-4)
