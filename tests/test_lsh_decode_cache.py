"""LSH bucket-cache incremental decoding (SURVEY.md §3.2 incremental cache).

Properties tested:
- step function: when every cached key shares the query's bucket in every
  round, output == the plain full-attention step (mask is a no-op);
- when buckets differ, non-bucket keys are excluded;
- decode_greedy mode="kv_lsh" runs jitted on an LSH model and emits finite
  mel; mode="auto" dispatches by attention kind.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.attention.full import attention_init
from rtts.infer.decode import (
    _init_state,
    _self_attn_step,
    _self_attn_step_lsh,
    decode_greedy,
)
from rtts.models import reformer_tts as M
from rtts.text import vocab_size

from tests.test_model_lsh import lsh_cfg


def _step_inputs(seed=0, B=2, H=2, d=16, T=8, t=5):
    key = jax.random.PRNGKey(seed)
    p = attention_init(key, H * d, H, d, shared_qk=True)
    h_t = jax.random.normal(jax.random.fold_in(key, 1), (B, H * d))
    k_cache = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, d))
    v_cache = jax.random.normal(jax.random.fold_in(key, 3), (B, T, H, d))
    return p, h_t, k_cache, v_cache, jnp.asarray(t)


def test_all_same_bucket_equals_full_step():
    p, h_t, k_cache, v_cache, t = _step_inputs()
    B, T, H, d = k_cache.shape
    nh, nb = 2, 4
    out_full, k2, v2 = _self_attn_step(p, h_t, k_cache, v_cache, t, H, None)

    # rotations of zeros make argmax constant (bucket 0 for everyone)
    rotations = jnp.zeros((H, d, nh, nb // 2))
    b_cache = jnp.zeros((B, H, nh, T), jnp.int32)
    out_lsh, k3, v3, b3 = _self_attn_step_lsh(
        p, h_t, k_cache, v_cache, b_cache, rotations, t, H, None, nb)
    np.testing.assert_allclose(np.asarray(out_lsh), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k3), np.asarray(k2), atol=1e-6)


def test_other_bucket_keys_are_masked():
    p, h_t, k_cache, v_cache, t = _step_inputs()
    B, T, H, d = k_cache.shape
    nh, nb = 1, 4
    rotations = jnp.zeros((H, d, nh, nb // 2))  # query hashes to bucket 0
    # put every cached key in bucket 3 => only self is attendable
    b_cache = jnp.full((B, H, nh, T), 3, jnp.int32)
    out_lsh, _, _, _ = _self_attn_step_lsh(
        p, h_t, k_cache, v_cache, b_cache, rotations, t, H, None, nb)
    # expected: attention collapses onto the current token's value
    from rtts.nn.layers import dense
    from rtts.infer.decode import _proj_heads

    v_t = _proj_heads(p["w_v"], h_t, H, None)
    expected = dense(p["w_o"], v_t.reshape(B, -1), None)
    np.testing.assert_allclose(np.asarray(out_lsh), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_decode_greedy_kv_lsh_runs():
    cfg = lsh_cfg(reversible=False)
    params = M.init(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 3, vocab_size())
    tmask = jnp.ones((2, 64), bool)
    memory = M.encode(params, cfg, tokens, tmask)

    @jax.jit
    def run(p, m, mm):
        return decode_greedy(p, cfg, m, mm, max_frames=32,
                             stop_threshold=2.0, mode="auto")

    mel, lengths, _ = run(params, memory, tmask)
    assert mel.shape == (2, 32, 20)
    assert np.isfinite(np.asarray(mel)).all()
    # and it genuinely restricted attention: differs from kv_full decode
    mel_full, _, _ = jax.jit(
        lambda p, m, mm: decode_greedy(p, cfg, m, mm, max_frames=32,
                                       stop_threshold=2.0, mode="kv_full")
    )(params, memory, tmask)
    assert float(jnp.abs(mel - mel_full).max()) > 1e-6
