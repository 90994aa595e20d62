"""Pallas kernel equivalence tests (interpret mode on CPU — SURVEY.md §6.2:
the interpreter is the kernel sanitizer path).  Each kernel must match its
jnp reference to float tolerance, forward and backward."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.attention.full import _len_norm
from rtts.attention.lsh import (
    _look_adjacent,
    _sort_by_bucket,
    hash_vectors,
    lsh_attend_chunks,
    lsh_attention_core,
)
from rtts.config import AttentionConfig
from rtts.ops.lsh_attention import lsh_attend_chunks_pallas


def _chunked_inputs(key, b=2, h=2, nc=4, c=16, d=32, causal=False):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, nc, c, d))
    k = _len_norm(q) * (d ** -0.5)
    v = jax.random.normal(ks[1], (b, h, nc, c, d))
    # positions: a random permutation per (b, h) like a real bucket sort
    pos = jax.vmap(lambda kk: jax.random.permutation(kk, nc * c))(
        jax.random.split(ks[2], b * h)).reshape(b, h, nc, c).astype(jnp.int32)
    val = jax.random.bernoulli(ks[3], 0.9, (b, h, nc, c))
    return q, k, v, pos, val


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("before,after", [(1, 0), (0, 0), (1, 1)])
def test_pallas_attend_matches_reference(causal, before, after):
    q, k, v, pos, val = _chunked_inputs(jax.random.PRNGKey(0))
    ref_out, ref_lse = lsh_attend_chunks(q, k, v, pos, val, causal,
                                         before, after)
    pl_out, pl_lse = lsh_attend_chunks_pallas(q, k, v, pos, val, causal,
                                              before, after, interpret=True)
    np.testing.assert_allclose(np.asarray(pl_out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pl_lse), np.asarray(ref_lse),
                               atol=1e-5, rtol=1e-5)


def test_pallas_attend_gradients_match_reference():
    q, k, v, pos, val = _chunked_inputs(jax.random.PRNGKey(1))

    def loss_ref(q, k, v):
        out, lse = lsh_attend_chunks(q, k, v, pos, val, True, 1, 0)
        return jnp.sum(out ** 2) + jnp.sum(lse)

    def loss_pl(q, k, v):
        out, lse = lsh_attend_chunks_pallas(q, k, v, pos, val, True, 1, 0,
                                            interpret=True)
        return jnp.sum(out ** 2) + jnp.sum(lse)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_lsh_core_with_pallas_matches_reference_path():
    """Full LSH pipeline: pallas attend == jnp attend inside the real
    hash/sort/unsort/combine pipeline."""
    key = jax.random.PRNGKey(2)
    b, h, l, d = 2, 2, 128, 32
    qk = jax.random.normal(key, (b, h, l, d))
    v = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, d))
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 20])[:, None]
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=32, num_hashes=2,
                          chunk_length=32, num_chunks_before=1, hash_seed=7)
    out_ref, buckets = lsh_attention_core(qk, v, cfg, mask, True,
                                          jax.random.PRNGKey(7),
                                          attend_fn=lsh_attend_chunks)
    pl_fn = functools.partial(lsh_attend_chunks_pallas, interpret=True)
    out_pl, _ = lsh_attention_core(qk, v, cfg, mask, True,
                                   jax.random.PRNGKey(7), attend_fn=pl_fn)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_attend_under_jit():
    q, k, v, pos, val = _chunked_inputs(jax.random.PRNGKey(3))
    fn = jax.jit(functools.partial(lsh_attend_chunks_pallas, causal=False,
                                   before=1, after=0, interpret=True))
    out, lse = fn(q, k, v, pos, val)
    ref_out, _ = lsh_attend_chunks(q, k, v, pos, val, False, 1, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
