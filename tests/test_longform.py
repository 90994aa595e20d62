"""Long-form stress (BASELINE config 5 shape, CPU-sized): 8k-token LSH
encoder pass — exercises bucket auto-set, multi-chunk sort, and memory
behavior of reversible + chunked FFN at long length."""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.attention.lsh import auto_num_buckets, lsh_attention_core
from rtts.config import AttentionConfig, ReformerStackConfig
from rtts.models.stack import stack_apply, stack_init


def test_lsh_core_8k():
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=32, num_hashes=2,
                          chunk_length=64, num_chunks_before=1, hash_seed=3,
                          use_pallas=False)
    L = 8192
    assert auto_num_buckets(L, 64) == 256
    key = jax.random.PRNGKey(0)
    qk = jax.random.normal(key, (1, 2, L, 32))
    v = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, L, 32))
    out, buckets = jax.jit(
        lambda qk, v: lsh_attention_core(qk, v, cfg, None, True,
                                         jax.random.PRNGKey(3))
    )(qk, v)
    assert out.shape == (1, 2, L, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert buckets.shape == (1, 2, 2, L)


def test_reversible_stack_8k_grads():
    """Full stack at 8k with reversible + chunked FFN: grads finite.
    (The memory win is the point on TPU; on CPU this checks correctness.)"""
    att = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=1,
                          chunk_length=64, num_chunks_before=1, hash_seed=5,
                          use_pallas=False)
    cfg = ReformerStackConfig(num_layers=1, d_model=32, d_ff=64, dropout=0.0,
                              reversible=True, causal=False,
                              ffn_chunk_size=512, use_pallas_ffn=False,
                              attention=att)
    params = stack_init(jax.random.PRNGKey(0), cfg, cross_attend=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8192, 32))
    mask = jnp.ones((1, 8192), bool)

    def loss(p):
        return jnp.sum(stack_apply(p, cfg, x, mask,
                                   rng=jax.random.PRNGKey(2)) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
