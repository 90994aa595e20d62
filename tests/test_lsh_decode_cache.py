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
        p, h_t, k_cache, v_cache, b_cache, rotations, t, H, None)
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
        p, h_t, k_cache, v_cache, b_cache, rotations, t, H, None)
    # expected: attention collapses onto the current token's value
    from rtts.nn.layers import dense
    from rtts.infer.decode import _proj_heads

    v_t = _proj_heads(p["w_v"], h_t, H, None)
    expected = dense(p["w_o"], v_t.reshape(B, -1), None)
    np.testing.assert_allclose(np.asarray(out_lsh), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_chunk_ring_equals_full_prefix_mask_no_overflow():
    """When no bucket ever exceeds the ring capacity, the O(chunk) ring
    gathers exactly the set of keys the full-prefix bucket mask admits, so
    both modes see identical (query, key) pairs per round."""
    import functools

    from rtts.infer.decode import _self_attn_step_lsh_chunk

    p, h_t, k_cache, v_cache, t = _step_inputs(T=8, t=0)
    B, T, H, d = k_cache.shape
    nh, nb, cap = 2, 4, T  # cap == T: nothing can overflow
    rotations = jax.random.normal(jax.random.PRNGKey(9), (H, d, nh, nb // 2))

    # drive BOTH modes through t = 0..T-1 with the same per-step inputs
    hs = jax.random.normal(jax.random.PRNGKey(10), (T, B, H * d))
    kc_m = jnp.zeros_like(k_cache)
    vc_m = jnp.zeros_like(v_cache)
    bc = jnp.full((B, H, nh, T), -1, jnp.int32)
    kc_r = jnp.zeros_like(k_cache)
    vc_r = jnp.zeros_like(v_cache)
    ring = {"idx": jnp.full((B, H, nh, nb, cap), -1, jnp.int32),
            "cnt": jnp.zeros((B, H, nh, nb), jnp.int32)}
    mask_step = jax.jit(functools.partial(
        _self_attn_step_lsh, num_heads=H, cdt=None))
    ring_step = jax.jit(functools.partial(
        _self_attn_step_lsh_chunk, num_heads=H, cdt=None))
    for ti in range(T):
        tt = jnp.asarray(ti)
        out_m, kc_m, vc_m, bc = mask_step(p, hs[ti], kc_m, vc_m, bc,
                                          rotations, tt)
        out_r, kc_r, vc_r, ring = ring_step(p, hs[ti], kc_r, vc_r, ring,
                                            rotations, tt)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_m),
                                   atol=2e-5, rtol=2e-5)


def test_chunk_ring_evicts_oldest():
    """With capacity 1 and constant-bucket rotations, the step can only see
    the immediately preceding token (+ itself) — older keys are evicted."""
    import functools

    from rtts.infer.decode import _proj_heads, _self_attn_step_lsh_chunk
    from rtts.nn.layers import dense
    from rtts.attention.full import _len_norm

    p, h_t, k_cache, v_cache, t = _step_inputs(T=8, t=0)
    B, T, H, d = k_cache.shape
    nh, nb, cap = 1, 2, 1
    rotations = jnp.zeros((H, d, nh, nb // 2))  # everyone -> bucket 0
    hs = jax.random.normal(jax.random.PRNGKey(11), (T, B, H * d))
    kc = jnp.zeros_like(k_cache)
    vc = jnp.zeros_like(v_cache)
    ring = {"idx": jnp.full((B, H, nh, nb, cap), -1, jnp.int32),
            "cnt": jnp.zeros((B, H, nh, nb), jnp.int32)}
    step = jax.jit(functools.partial(_self_attn_step_lsh_chunk,
                                     num_heads=H, cdt=None))
    outs = []
    for ti in range(3):
        out, kc, vc, ring = step(p, hs[ti], kc, vc, ring, rotations,
                                 jnp.asarray(ti))
        outs.append(out)
    # at t=2 only position 1 is in the ring (0 was evicted): the output is
    # softmax over {key_1 (score), self (-1e5)} ~= value of token 1
    v1 = _proj_heads(p["w_v"], hs[1], H, None)
    expected = dense(p["w_o"], v1.reshape(B, -1), None)
    np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_decode_greedy_kv_lsh_chunk_runs_and_matches_kv_lsh():
    cfg = lsh_cfg(reversible=False)
    params = M.init(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 3, vocab_size())
    tmask = jnp.ones((2, 64), bool)
    memory = M.encode(params, cfg, tokens, tmask)

    run = lambda mode: jax.jit(
        lambda p, m, mm: decode_greedy(p, cfg, m, mm, max_frames=32,
                                       stop_threshold=2.0, mode=mode)
    )(params, memory, tmask)
    mel_chunk, lengths, _ = run("kv_lsh_chunk")
    assert np.isfinite(np.asarray(mel_chunk)).all()
    # ring capacity (chunk 16 * lookback) >= 32 frames: no bucket can
    # overflow, so the O(chunk) path must match the full-prefix mask mode
    mel_mask, _, _ = run("kv_lsh")
    np.testing.assert_allclose(np.asarray(mel_chunk), np.asarray(mel_mask),
                               atol=1e-4, rtol=1e-4)


def test_auto_mode_is_cost_aware():
    """auto = kv_lsh_chunk only when the prefix dwarfs the ring working
    set (measured: the ring cache is slower at short max_frames)."""
    from rtts.infer.decode import _auto_mode

    cfg = lsh_cfg(reversible=False)   # chunk 16, nh 2, before 1 -> cap 32
    assert _auto_mode(cfg, 32) == "kv_full"
    # r3 calibrated crossover: ~10x the nh*C ring working set (= 640 here)
    assert _auto_mode(cfg, 512) == "kv_full"
    assert _auto_mode(cfg, 1024) == "kv_lsh_chunk"
    import dataclasses
    full_dec = dataclasses.replace(
        cfg, decoder=dataclasses.replace(
            cfg.decoder, attention=dataclasses.replace(
                cfg.decoder.attention, kind="full")))
    assert _auto_mode(full_dec, 8192) == "kv_full"


def test_decode_greedy_kv_lsh_runs():
    cfg = lsh_cfg(reversible=False)
    params = M.init(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 3, vocab_size())
    tmask = jnp.ones((2, 64), bool)
    memory = M.encode(params, cfg, tokens, tmask)

    @jax.jit
    def run(p, m, mm):
        return decode_greedy(p, cfg, m, mm, max_frames=32,
                             stop_threshold=2.0, mode="kv_lsh")

    mel, lengths, _ = run(params, memory, tmask)
    assert mel.shape == (2, 32, 20)
    assert np.isfinite(np.asarray(mel)).all()
    # and it genuinely restricted attention: differs from kv_full decode
    mel_full, _, _ = jax.jit(
        lambda p, m, mm: decode_greedy(p, cfg, m, mm, max_frames=32,
                                       stop_threshold=2.0, mode="kv_full")
    )(params, memory, tmask)
    assert float(jnp.abs(mel - mel_full).max()) > 1e-6
