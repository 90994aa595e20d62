"""Sort-gather formulations (BENCH.md r3 "LSH gather"): the one-hot MXU
permutation matmul must be exactly equivalent to the take_along_axis
gather — one matched element per one-hot row means no accumulation, so
outputs are bit-identical in f32 (and the measured 2.3x forward / matmul
backward is pure speed)."""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.attention.lsh import _sort_gather_mode, lsh_attention_core
from rtts.config import AttentionConfig


def _cfg(sort_gather, nh=2):
    return AttentionConfig(kind="lsh", num_heads=2, head_dim=16,
                           num_hashes=nh, chunk_length=16,
                           num_chunks_before=1, hash_seed=5,
                           sort_gather=sort_gather)


def _inputs(dtype=jnp.float32):
    b, h, l, d = 2, 2, 64, 16
    qk = jax.random.normal(jax.random.PRNGKey(0), (b, h, l, d), dtype)
    v = jax.random.normal(jax.random.PRNGKey(1), (b, h, l, d), dtype)
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 9])[:, None]
    return qk, v, mask


@pytest.mark.parametrize("nh", [1, 2])
@pytest.mark.parametrize("causal", [False, True])
def test_onehot_equals_take_f32(nh, causal):
    qk, v, mask = _inputs()
    rng = jax.random.PRNGKey(3)
    o1, _ = lsh_attention_core(qk, v, _cfg("take", nh), mask, causal, rng)
    o2, _ = lsh_attention_core(qk, v, _cfg("onehot", nh), mask, causal, rng)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-6, rtol=1e-6)


def test_onehot_close_to_take_bf16():
    qk, v, mask = _inputs(jnp.bfloat16)
    rng = jax.random.PRNGKey(3)
    o1, _ = lsh_attention_core(qk, v, _cfg("take"), mask, True, rng)
    o2, _ = lsh_attention_core(qk, v, _cfg("onehot"), mask, True, rng)
    # combine-weight product rounds once more in the onehot path
    # (refusion-class); the gather itself is exact
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(o2, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_grads_match_between_modes():
    qk, v, mask = _inputs()
    rng = jax.random.PRNGKey(3)

    def loss(mode):
        def f(args):
            q, vv = args
            out, _ = lsh_attention_core(q, vv, _cfg(mode), mask, True, rng)
            return jnp.sum(out ** 2)

        return jax.grad(f)((qk, v))

    g1, g2 = loss("take"), loss("onehot")
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               atol=1e-5, rtol=1e-5)


def test_auto_rule():
    a = AttentionConfig(sort_gather="auto")
    # flagship train shapes: 64*4*1024*1024*2B = 537 MB -> onehot
    assert _sort_gather_mode(a, 64, 4, 1024, jnp.bfloat16) == "onehot"
    # measured winners up to ~2 GB one-hot (L=2048/4096 sweeps)
    assert _sort_gather_mode(a, 16, 4, 4096, jnp.bfloat16) == "onehot"
    # longform 8k: 16*4*8192*8192*2B = 8.6 GB -> take
    assert _sort_gather_mode(a, 16, 4, 8192, jnp.bfloat16) == "take"
    assert _sort_gather_mode(AttentionConfig(sort_gather="take"),
                             1, 1, 64, jnp.float32) == "take"
    with pytest.raises(ValueError):
        _sort_gather_mode(AttentionConfig(sort_gather="bogus"),
                          1, 1, 64, jnp.float32)


def test_perm_take_grads_match_plain_take():
    """The permutation-aware gathers (backward = inverse gather, not
    scatter-add) must be value- AND grad-identical to take_along_axis."""
    from rtts.attention.lsh import _perm_round_take, _perm_rows_take

    rng = np.random.RandomState(0)
    bh, nh, l, w = 3, 2, 16, 5
    idx = np.stack([np.stack([rng.permutation(l) for _ in range(nh)])
                    for _ in range(bh)]).astype(np.int32)       # (bh,nh,l)
    inv = np.argsort(idx, axis=-1).astype(np.int32)
    x = jnp.asarray(rng.randn(bh, l, w), jnp.float32)
    ct = jnp.asarray(rng.randn(bh, nh * l, w), jnp.float32)

    def loss_perm(a):
        return (_perm_rows_take(a, jnp.asarray(idx), jnp.asarray(inv))
                * ct).sum()

    def loss_take(a):
        return (jnp.take_along_axis(
            a, jnp.asarray(idx.reshape(bh, nh * l))[..., None], axis=1)
            * ct).sum()

    np.testing.assert_allclose(float(loss_perm(x)), float(loss_take(x)),
                               rtol=1e-6)
    g_p = jax.grad(loss_perm)(x)
    g_t = jax.grad(loss_take)(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_t),
                               rtol=1e-6, atol=1e-6)

    # within-round variant on (B,H,nh,L,W)
    b, h = 2, 2
    idx4 = np.stack([np.stack([np.stack([rng.permutation(l)
                                         for _ in range(nh)])
                               for _ in range(h)])
                     for _ in range(b)]).astype(np.int32)
    inv4 = np.argsort(idx4, axis=-1).astype(np.int32)
    x4 = jnp.asarray(rng.randn(b, h, nh, l, w), jnp.float32)
    ct4 = jnp.asarray(rng.randn(b, h, nh, l, w), jnp.float32)

    def lp(a):
        return (_perm_round_take(a, jnp.asarray(idx4), jnp.asarray(inv4))
                * ct4).sum()

    def lt(a):
        return (jnp.take_along_axis(a, jnp.asarray(idx4)[..., None], axis=3)
                * ct4).sum()

    np.testing.assert_allclose(float(lp(x4)), float(lt(x4)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(lp)(x4)),
                               np.asarray(jax.grad(lt)(x4)),
                               rtol=1e-6, atol=1e-6)
