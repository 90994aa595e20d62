"""Flash (online-softmax) attention kernel vs the naive oracle.

SURVEY.md §5.3 item 1 (kernel-level parity): the Pallas flash kernel in
rtts/ops/flash_attention.py must reproduce the naive full-attention paths
in rtts/attention/full.py — same replace-semantics masking (-1e9 pad and
causal, -1e5 self), same softmax — in both the forward and the FA2
backward, on CPU via interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.attention.full import (
    attention_init,
    cross_attention,
    full_attention,
    shared_qk_self_attention,
)
from rtts.ops.flash_attention import (
    FLASH_AUTO_MIN_LEN,
    flash_attend,
    flash_supported,
    resolve_flash_impl,
)

B, H, D = 2, 2, 16


def _qkv(rng, lq=256, lk=256, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, H, lq, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, H, lk, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, H, lk, D)), dtype)
    return q, k, v


def _mask(rng, lk=256):
    lengths = rng.integers(lk // 2, lk, size=(B,))
    return jnp.arange(lk)[None, :] < jnp.asarray(lengths)[:, None]


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_flash_forward_matches_naive(rng, causal, with_mask):
    q, k, v = _qkv(rng)
    mask = _mask(rng) if with_mask else None
    ref = full_attention(q, k, v, kv_mask=mask, causal=causal, scale=0.25)
    out = flash_attend(q, k, v, kv_mask=mask, causal=causal, sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_cross_shape_lq_ne_lk(rng):
    q, _, _ = _qkv(rng, lq=256)
    _, k, v = _qkv(rng, lk=128)
    k, v = k[:, :, :128], v[:, :, :128]
    mask = _mask(rng, lk=128)
    ref = full_attention(q, k, v, kv_mask=mask, scale=D ** -0.5)
    out = flash_attend(q, k, v, kv_mask=mask, sm_scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_grads_match_naive(rng):
    q, k, v = _qkv(rng, lq=128, lk=128)
    mask = _mask(rng, lk=128)
    cot = jnp.asarray(rng.normal(size=(B, H, 128, D)), jnp.float32)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) * cot)
        return inner

    naive = lambda q, k, v: full_attention(q, k, v, kv_mask=mask,
                                           causal=True, scale=0.25)
    flash = lambda q, k, v: flash_attend(q, k, v, kv_mask=mask, causal=True,
                                         sm_scale=0.25)
    g_ref = jax.grad(loss(naive), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(flash), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_shared_qk_flash_matches_naive(rng, causal):
    """Full integration through the shared-QK sublayer: len-norm, self-mask,
    head split/merge and the output projection all on both paths."""
    key = jax.random.PRNGKey(0)
    params = attention_init(key, d_model=32, num_heads=H, head_dim=16,
                            shared_qk=True)
    x = jnp.asarray(rng.normal(size=(B, 128, 32)), jnp.float32)
    mask = _mask(rng, lk=128)
    ref = shared_qk_self_attention(params, x, mask=mask, causal=causal,
                                   num_heads=H, impl="naive")
    out = shared_qk_self_attention(params, x, mask=mask, causal=causal,
                                   num_heads=H, impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_shared_qk_flash_param_grads(rng):
    """Grads through the whole sublayer (w_qk gets both q- and k-side
    contributions through the length normalization; the self-mask diagonal
    is a replaced constant so its score-grad must be exactly zero)."""
    key = jax.random.PRNGKey(1)
    params = attention_init(key, d_model=32, num_heads=H, head_dim=16,
                            shared_qk=True)
    x = jnp.asarray(rng.normal(size=(B, 128, 32)), jnp.float32)
    mask = _mask(rng, lk=128)

    def loss(impl):
        def inner(p):
            out = shared_qk_self_attention(p, x, mask=mask, causal=True,
                                           num_heads=H, impl=impl)
            return jnp.mean(jnp.square(out))
        return inner

    g_ref = jax.grad(loss("naive"))(params)
    g_out = jax.grad(loss("flash"))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_out = jax.tree_util.tree_leaves(g_out)
    for a, b in zip(flat_out, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_cross_attention_flash_matches_naive(rng):
    key = jax.random.PRNGKey(2)
    params = attention_init(key, d_model=32, num_heads=H, head_dim=16,
                            shared_qk=False)
    x = jnp.asarray(rng.normal(size=(B, 256, 32)), jnp.float32)
    mem = jnp.asarray(rng.normal(size=(B, 128, 32)), jnp.float32)
    mask = _mask(rng, lk=128)
    ref = cross_attention(params, x, mem, memory_mask=mask, num_heads=H,
                          impl="naive")
    out = cross_attention(params, x, mem, memory_mask=mask, num_heads=H,
                          impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_isolated_token_attends_itself(rng):
    """A query whose every other target is masked falls back to itself
    (the -1e5 vs -1e9 asymmetry) — and its grads stay finite."""
    q, k, v = _qkv(rng, lq=128, lk=128)
    # batch row 0: only position 0 is a valid key
    mask = jnp.zeros((B, 128), bool).at[:, 0].set(True).at[1, :].set(True)
    ref = jax.jit(lambda *a: full_attention(*a, kv_mask=mask, causal=True,
                                            scale=1.0))(q, k, v)
    out = flash_attend(q, k, v, kv_mask=mask, causal=True, sm_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda q: jnp.sum(
        flash_attend(q, k, v, kv_mask=mask, causal=True, sm_scale=1.0)))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_flash_bf16_close(rng):
    q, k, v = _qkv(rng, lq=128, lk=128, dtype=jnp.bfloat16)
    ref = full_attention(q, k, v, causal=True, scale=0.25)
    out = flash_attend(q, k, v, causal=True, sm_scale=0.25)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.0, atol=2e-2)


def test_resolver_rules():
    assert resolve_flash_impl(False, 1024, 1024) == "naive"
    assert resolve_flash_impl(True, 1024, 1024) == "flash"
    # non-128-multiple shapes are fine (transparent padding)
    assert resolve_flash_impl(True, 1000, 1024) == "flash"
    with pytest.raises(ValueError):
        resolve_flash_impl("sometimes", 1024, 1024)
    # auto requires a TPU (this test process is CPU-pinned)
    assert resolve_flash_impl("auto", 4096, 4096) == "naive"
    assert flash_supported(64, 64)
    assert flash_supported(FLASH_AUTO_MIN_LEN, 128)


@pytest.mark.parametrize("lq,lk", [(192, 192), (256, 96), (100, 260)])
def test_flash_padded_lengths_match_naive(rng, lq, lk):
    """Non-128-multiple lengths: padded keys are masked off, padded query
    rows sliced off — outputs and grads must match the naive oracle."""
    q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    mask = _mask(rng, lk=lk)
    causal = lq == lk
    ref = full_attention(q, k, v, kv_mask=mask, causal=causal, scale=0.25)
    out = flash_attend(q, k, v, kv_mask=mask, causal=causal, sm_scale=0.25)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(lambda q: jnp.sum(full_attention(
        q, k, v, kv_mask=mask, causal=causal, scale=0.25) ** 2))(q)
    g_out = jax.grad(lambda q: jnp.sum(flash_attend(
        q, k, v, kv_mask=mask, causal=causal, sm_scale=0.25) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-5)


def test_stack_flash_knob_matches_naive(rng):
    """kind: full stack with flash forced vs off — outputs and grads agree
    (the reversible backward composes with the kernel's custom_vjp)."""
    import dataclasses

    from rtts.config import AttentionConfig, ReformerStackConfig
    from rtts.models.stack import stack_apply, stack_init

    def make(flash):
        return ReformerStackConfig(
            num_layers=2, d_model=32, d_ff=64, causal=True, dropout=0.0,
            reversible=True,
            attention=AttentionConfig(kind="full", num_heads=H, head_dim=16,
                                      flash=flash))

    key = jax.random.PRNGKey(3)
    params = stack_init(key, make(False), cross_attend=False)
    x = jnp.asarray(rng.normal(size=(B, 128, 32)), jnp.float32)
    mask = _mask(rng, lk=128)

    def run(flash, p):
        return stack_apply(p, make(flash), x, mask,
                           rng=jax.random.PRNGKey(0), deterministic=True)

    ref = run(False, params)
    out = run(True, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)

    g_ref = jax.grad(lambda p: jnp.mean(jnp.square(run(False, p))))(params)
    g_out = jax.grad(lambda p: jnp.mean(jnp.square(run(True, p))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_out),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
