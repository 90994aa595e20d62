"""Reduction factor (r frames per decoder step): training/incremental
parity, greedy decode, and trainability at r=2."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rtts.infer.decode import decode_greedy, decode_teacher_check
from rtts.models import reformer_tts as M
from rtts.train.losses import make_stop_target, tts_loss
from rtts.text import vocab_size

from tests.test_model_m1 import tiny_cfg


def r2_cfg():
    return dataclasses.replace(tiny_cfg(), reduction_factor=2)


def test_r2_teacher_parity():
    cfg = r2_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    B, L, T = 2, 16, 24
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, L), 3, vocab_size())
    tmask = jnp.ones((B, L), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, T, 20)) * 0.5
    memory = M.encode(params, cfg, tokens, tmask)
    full_mask = jnp.ones((B, T), bool)
    teacher_in = M.shift_mel(mel, 2)
    pre_ref, _, stop_ref = M.decode_train(params, cfg, teacher_in, full_mask,
                                          memory, tmask)
    pre_inc, stop_inc = decode_teacher_check(params, cfg, memory, tmask,
                                             teacher_in)
    np.testing.assert_allclose(np.asarray(pre_inc), np.asarray(pre_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop_inc), np.asarray(stop_ref),
                               atol=2e-4, rtol=1e-3)


def test_r2_greedy_decode():
    cfg = r2_cfg()
    params = M.init(jax.random.PRNGKey(1), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 3, vocab_size())
    tmask = jnp.ones((2, 16), bool)

    @jax.jit
    def run(p, tok, msk):
        memory = M.encode(p, cfg, tok, msk)
        return decode_greedy(p, cfg, memory, msk, max_frames=32)

    mel, lengths, _ = run(params, tokens, tmask)
    assert mel.shape == (2, 32, 20)
    assert (np.asarray(lengths) % 2 == 0).all()  # lengths at group granularity
    assert np.isfinite(np.asarray(mel)).all()


def test_r2_overfits():
    import optax

    cfg = r2_cfg()
    params = M.init(jax.random.PRNGKey(3), cfg)
    B, L, T = 1, 16, 32
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B, L), 3, vocab_size())
    tmask = jnp.ones((B, L), bool)
    t = jnp.linspace(0, 1, T)[None, :, None]
    mel = jnp.sin(2 * np.pi * (jnp.arange(20)[None, None, :] + 1) * t)
    mmask = jnp.ones((B, T), bool)
    stop_t = make_stop_target(mmask)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, rng):
        def loss_fn(p):
            pre, post, stop = M.forward(p, cfg, tokens, tmask, mel, mmask,
                                        rng=rng, deterministic=False)
            return tts_loss(pre, post, stop, mel, stop_t, mmask)[0]
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rng = jax.random.PRNGKey(5)
    first = None
    for i in range(50):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first, (first, float(loss))


def test_r2_recompute_matches_incremental():
    """The reference-faithful recompute oracle must step one GROUP (r
    frames) per trip with group-shifted teacher input; the pre-fix 1-frame
    shift let group g see its own frames (causality violation) for r > 1."""
    from rtts.infer.decode import decode_greedy_recompute

    cfg = r2_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    B, L = 2, 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, L), 3, vocab_size())
    tmask = jnp.ones((B, L), bool)
    memory = M.encode(params, cfg, tokens, tmask)
    res_i = decode_greedy(params, cfg, memory, tmask, max_frames=16,
                          stop_threshold=2.0)
    res_r = decode_greedy_recompute(params, cfg, memory, tmask, max_frames=16,
                                    stop_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(res_i.lengths),
                                  np.asarray(res_r.lengths))
    np.testing.assert_allclose(np.asarray(res_r.mel_post),
                               np.asarray(res_i.mel_post),
                               atol=5e-4, rtol=1e-3)

    import pytest

    with pytest.raises(ValueError, match="multiple"):
        decode_greedy_recompute(params, cfg, memory, tmask, max_frames=15)
