"""Guided-attention loss (beyond-reference, opt-in; SURVEY.md §6.5 lists
alignment as the project's primary observability — this knob optimizes it
directly): soft-diagonal penalty on decoder cross-attention probabilities
captured through the ``attn_sink`` side-channel.

- weight-matrix semantics: diagonal alignments pay ~0, off-diagonal ~1
- sink capture: forward outputs identical with and without the sink;
  per-layer prob shapes and row-stochasticity
- train step: gal metric present, finite, and its gradient flows
- guard rails: reversible and pipelined stacks reject the sink
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.models import reformer_tts as M
from rtts.models.stack import stack_apply
from rtts.train.losses import guided_attention_loss
from tests.test_model_m1 import batch, tiny_cfg  # noqa: F401 (fixture)


def _diag_probs(b, h, tg, lk, n_groups, n_tok, anti=False):
    """One-hot alignment following (or reversing) the per-example diagonal."""
    probs = np.zeros((b, h, tg, lk), np.float32)
    for i in range(b):
        for t in range(n_groups[i]):
            frac = t / max(1, n_groups[i] - 1)
            if anti:
                frac = 1.0 - frac
            n = int(round(frac * (n_tok[i] - 1)))
            probs[i, :, t, n] = 1.0
        # padded rows attend uniformly (masked out by the loss)
        probs[i, :, n_groups[i]:] = 1.0 / lk
    return jnp.asarray(probs)


def _masks(b, tg, lk, n_groups, n_tok):
    tok = jnp.arange(lk)[None, :] < jnp.asarray(n_tok)[:, None]
    mel = jnp.arange(tg)[None, :] < jnp.asarray(n_groups)[:, None]
    return tok, mel


def test_weight_matrix_semantics():
    b, h, tg, lk = 2, 2, 16, 16
    n_groups, n_tok = [16, 10], [16, 12]
    tok, mel = _masks(b, tg, lk, n_groups, n_tok)
    diag = guided_attention_loss(
        [_diag_probs(b, h, tg, lk, n_groups, n_tok)], tok, mel)
    anti = guided_attention_loss(
        [_diag_probs(b, h, tg, lk, n_groups, n_tok, anti=True)], tok, mel)
    uniform = guided_attention_loss(
        [jnp.full((b, h, tg, lk), 1.0 / lk)], tok, mel)
    assert float(diag) < 0.12
    assert float(anti) > 0.7  # the anti-diagonal crosses the diagonal once
    assert float(diag) < float(uniform) < float(anti)
    # two identical layers average to the same value
    two = guided_attention_loss(
        [_diag_probs(b, h, tg, lk, n_groups, n_tok)] * 2, tok, mel)
    np.testing.assert_allclose(float(two), float(diag), rtol=1e-6)


def test_sink_capture_parity_and_shapes(batch):  # noqa: F811
    tokens, tmask, mel, mmask = batch
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    base = M.forward(params, cfg, tokens, tmask, mel, mmask)
    sink = []
    out = M.forward(params, cfg, tokens, tmask, mel, mmask, attn_sink=sink)
    for a, b in zip(base, out):  # same naive math => bit-identical
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(sink) == cfg.decoder.num_layers
    nh = cfg.decoder.attention.num_heads
    for probs in sink:
        assert probs.shape[0] == tokens.shape[0]
        assert probs.shape[1] == nh
        assert probs.shape[3] == tokens.shape[1]
        rows = np.asarray(jnp.sum(probs, axis=-1))
        np.testing.assert_allclose(rows, 1.0, atol=1e-5)


def test_sink_works_under_jit(batch):  # noqa: F811
    tokens, tmask, mel, mmask = batch
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def gal(p):
        sink = []
        M.forward(p, cfg, tokens, tmask, mel, mmask, attn_sink=sink)
        return guided_attention_loss(sink, tmask, mmask,
                                     cfg.reduction_factor,
                                     cfg.guided_attention_sigma)

    v = gal(params)
    assert np.isfinite(float(v)) and 0.0 <= float(v) <= 1.0
    g = jax.grad(lambda p: gal(p))(params)
    leaves = [np.asarray(x) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(x).all() for x in leaves)
    # the penalty must actually pull on the cross-attention projections
    gq = np.asarray(g["decoder"]["layers"][1]["f"]["attn"]["w_q"]["w"])
    assert np.abs(gq).max() > 0.0


def test_train_step_logs_and_optimizes_gal(batch):  # noqa: F811
    from rtts.config import OptimConfig
    from rtts.train.optim import make_optimizer
    from rtts.train.train_tts import make_train_step

    tokens, tmask, mel, mmask = batch
    cfg = dataclasses.replace(tiny_cfg(), guided_attention_weight=5.0)
    params = M.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, schedule="constant",
                                     warmup_steps=1))
    step = jax.jit(make_train_step(cfg, opt))
    opt_state = opt.init(params)
    b = {"tokens": tokens, "token_mask": tmask, "mel": mel, "mel_mask": mmask}
    gal = []
    for i in range(12):
        params, opt_state, metrics = step(params, opt_state, b,
                                          jax.random.PRNGKey(i))
        gal.append(float(metrics["loss_guided_attn"]))
    assert all(np.isfinite(gal))
    assert gal[-1] < gal[0]  # the penalty is being optimized


def test_decay_anneals_weight_to_zero(batch):  # noqa: F811
    from rtts.config import OptimConfig
    from rtts.train.optim import make_optimizer
    from rtts.train.train_tts import make_train_step

    tokens, tmask, mel, mmask = batch
    cfg = dataclasses.replace(tiny_cfg(), guided_attention_weight=5.0,
                              guided_attention_decay_steps=10)
    params = M.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(OptimConfig(learning_rate=0.0, schedule="constant",
                                     warmup_steps=1))
    step = jax.jit(make_train_step(cfg, opt))
    b = {"tokens": tokens, "token_mask": tmask, "mel": mel, "mel_mask": mmask}
    os0 = opt.init(params)
    # lr=0 keeps params identical, so the two calls differ only by `step`
    _, _, m0 = step(params, os0, b, jax.random.PRNGKey(7),
                    jnp.asarray(0, jnp.int32))
    _, _, m10 = step(params, opt.init(params), b, jax.random.PRNGKey(7),
                     jnp.asarray(10, jnp.int32))
    base10 = (float(m10["loss_mel_pre"]) + float(m10["loss_mel_post"])
              + float(m10["loss_stop"]))
    assert float(m10["loss"]) == pytest.approx(base10, rel=1e-6)  # weight 0
    base0 = (float(m0["loss_mel_pre"]) + float(m0["loss_mel_post"])
             + float(m0["loss_stop"]))
    assert float(m0["loss"]) == pytest.approx(
        base0 + 5.0 * float(m0["loss_guided_attn"]), rel=1e-6)


def test_reversible_stack_rejects_sink(batch):  # noqa: F811
    tokens, tmask, mel, mmask = batch
    cfg = tiny_cfg(reversible=True)
    params = M.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="reversible"):
        M.forward(params, cfg, tokens, tmask, mel, mmask, attn_sink=[])


def test_pipelined_stack_rejects_sink():
    cfg = tiny_cfg()
    dec = dataclasses.replace(cfg.decoder, pipeline_axis="model")
    x = jnp.zeros((2, 8, cfg.d_model))
    with pytest.raises(ValueError, match="pipeline"):
        stack_apply({}, dec, x, None, memory=jnp.zeros((2, 4, cfg.d_model)),
                    attn_sink=[])
