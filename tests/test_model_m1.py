"""M1 end-to-end slice tests: tiny full-softmax ReformerTTS (BASELINE config 0).

- forward shapes + finiteness
- reversible two-stream == plain two-stream (outputs and gradients)
- incremental KV-cached decode == teacher-forced parallel decode
- greedy decode runs under jit and emits lengths
- overfit a single sentence until mel loss drops (SURVEY.md §5.3 item 5)
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.config import AttentionConfig, ReformerStackConfig, ReformerTTSConfig
from rtts.infer.decode import decode_greedy, decode_teacher_check
from rtts.models import reformer_tts as M
from rtts.train.losses import make_stop_target, tts_loss
from rtts.text import vocab_size


def tiny_cfg(reversible=False, dropout=0.0, prenet_dropout=0.0, d=32):
    att = AttentionConfig(kind="full", num_heads=2, head_dim=d // 2)
    stack = dict(d_model=d, d_ff=2 * d, dropout=dropout, reversible=reversible)
    return ReformerTTSConfig(
        vocab_size=vocab_size(), d_model=d, n_mels=20,
        encoder=ReformerStackConfig(num_layers=2, causal=False, attention=att, **stack),
        decoder=ReformerStackConfig(num_layers=2, causal=True, attention=att, **stack),
        dec_prenet_hidden=16, dec_prenet_dropout=prenet_dropout,
        postnet_channels=16, max_pos=256, compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(42)
    B, L, T = 2, 16, 24
    tokens = jax.random.randint(key, (B, L), 3, vocab_size())
    tmask = jnp.arange(L)[None, :] < jnp.asarray([L, L - 4])[:, None]
    mel = jax.random.normal(key, (B, T, 20)) * 0.5
    mmask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 6])[:, None]
    return tokens, tmask, mel, mmask


def test_forward_shapes(batch):
    tokens, tmask, mel, mmask = batch
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    pre, post, stop = M.forward(params, cfg, tokens, tmask, mel, mmask)
    assert pre.shape == mel.shape and post.shape == mel.shape
    assert stop.shape == mmask.shape
    for x in (pre, post, stop):
        assert np.isfinite(np.asarray(x)).all()


def test_reversible_matches_plain_forward_and_grad(batch):
    tokens, tmask, mel, mmask = batch
    cfg_p, cfg_r = tiny_cfg(False), tiny_cfg(True)
    params = M.init(jax.random.PRNGKey(0), cfg_p)

    def loss(c):
        def fn(p):
            pre, post, stop = M.forward(p, c, tokens, tmask, mel, mmask,
                                        rng=jax.random.PRNGKey(7), deterministic=False)
            return tts_loss(pre, post, stop, mel, make_stop_target(mmask), mmask)[0]
        return fn

    lp, gp = jax.value_and_grad(loss(cfg_p))(params)
    lr, gr = jax.value_and_grad(loss(cfg_r))(params)
    np.testing.assert_allclose(lp, lr, rtol=1e-5)
    flat_p, _ = jax.flatten_util.ravel_pytree(gp)
    flat_r, _ = jax.flatten_util.ravel_pytree(gr)
    scale = float(jnp.max(jnp.abs(flat_p))) + 1e-8
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_p),
                               atol=5e-4 * scale, rtol=2e-3)


def test_incremental_decode_matches_teacher_forced(batch):
    tokens, tmask, mel, mmask = batch
    cfg = tiny_cfg()  # prenet dropout 0 so both paths are deterministic
    params = M.init(jax.random.PRNGKey(1), cfg)
    memory = M.encode(params, cfg, tokens, tmask)
    full_mask = jnp.ones_like(mmask)  # incremental path has no pad frames
    teacher_in = M.shift_mel(mel)
    pre_ref, _, stop_ref = M.decode_train(params, cfg, teacher_in, full_mask,
                                          memory, tmask)
    pre_inc, stop_inc = decode_teacher_check(params, cfg, memory, tmask, teacher_in)
    np.testing.assert_allclose(np.asarray(pre_inc), np.asarray(pre_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop_inc), np.asarray(stop_ref),
                               atol=2e-4, rtol=1e-3)


def test_greedy_decode_jits_and_stops(batch):
    tokens, tmask, _, _ = batch
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(2), cfg)

    @jax.jit
    def run(p, tok, msk):
        memory = M.encode(p, cfg, tok, msk)
        return decode_greedy(p, cfg, memory, msk, max_frames=32)

    mel, lengths, stop_logits = run(params, tokens, tmask)
    assert mel.shape == (2, 32, 20)
    assert lengths.shape == (2,)
    assert (lengths >= 1).all() and (lengths <= 32).all()
    assert np.isfinite(np.asarray(mel)).all()


def test_overfit_one_sentence():
    import optax

    cfg = tiny_cfg()
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
    for i in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first, (first, float(loss))


def test_teacher_check_parity_with_trained_like_ln(batch):
    """Regression: _init_mem_kv must project cross K/V from RAW memory
    (training's f_cross LNs only the decoder stream).  With freshly
    initialized LN params the distinction is invisible (scale 1 / bias 0 on
    final_ln'd memory is near-identity), so perturb the cross layers' LN to
    emulate a trained checkpoint — the pre-fix code diverged ~50% here."""
    tokens, tmask, mel, mmask = batch
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(1), cfg)
    layers = list(params["decoder"]["layers"])
    for i in range(1, len(layers), 2):
        f = dict(layers[i]["f"])
        ln = dict(f["ln"])
        ln["scale"] = ln["scale"] * 1.7 + 0.3
        ln["bias"] = ln["bias"] + 0.5
        f["ln"] = ln
        layers[i] = {**layers[i], "f": f}
    params = {**params,
              "decoder": {**params["decoder"], "layers": layers}}
    memory = M.encode(params, cfg, tokens, tmask)
    teacher_in = M.shift_mel(mel)
    pre_ref, _, stop_ref = M.decode_train(
        params, cfg, teacher_in, jnp.ones_like(mmask), memory, tmask)
    pre_inc, stop_inc = decode_teacher_check(params, cfg, memory, tmask,
                                             teacher_in)
    np.testing.assert_allclose(np.asarray(pre_inc), np.asarray(pre_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop_inc), np.asarray(stop_ref),
                               atol=2e-4, rtol=1e-3)
