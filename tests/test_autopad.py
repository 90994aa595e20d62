"""Autopadder semantics (SURVEY.md §3.2 'Input autopadding'): non-chunk-
aligned inputs are padded inside the model and outputs truncated back —
and padding must not change the valid outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.models import reformer_tts as M
from rtts.text import vocab_size

from tests.test_model_lsh import lsh_cfg


def test_autopad_encoder_and_decoder_shapes():
    cfg = lsh_cfg(reversible=False)  # chunk 16, ffn_chunk 16
    params = M.init(jax.random.PRNGKey(0), cfg)
    B, L, T = 2, 50, 37  # deliberately not multiples of 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, L), 3, vocab_size())
    tmask = jnp.ones((B, L), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, T, 20))
    mmask = jnp.ones((B, T), bool)
    pre, post, stop = M.forward(params, cfg, tokens, tmask, mel, mmask)
    assert pre.shape == (B, T, 20)
    assert stop.shape == (B, T)
    assert np.isfinite(np.asarray(post)).all()


def test_autopad_matches_explicit_padding():
    """Model-internal autopad == feeding pre-padded inputs with masks."""
    cfg = lsh_cfg(reversible=False)
    params = M.init(jax.random.PRNGKey(0), cfg)
    B, L = 2, 40  # pads to 48
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, L), 3, vocab_size())
    tmask = jnp.ones((B, L), bool)
    mem_auto = M.encode(params, cfg, tokens, tmask)

    L_pad = 48
    tokens_p = jnp.pad(tokens, ((0, 0), (0, L_pad - L)))
    tmask_p = jnp.pad(tmask, ((0, 0), (0, L_pad - L)))
    mem_manual = M.encode(params, cfg, tokens_p, tmask_p)[:, :L]
    np.testing.assert_allclose(np.asarray(mem_auto), np.asarray(mem_manual),
                               atol=1e-5, rtol=1e-5)


def _full_cfg():
    """Full-attention variant of lsh_cfg: exact pad-width invariance only
    holds with kind=full — under LSH, pad keys shift the sorted chunk
    boundaries, so valid rows see (masked-equivalent but) different
    neighbor sets at different pad widths.  This is structural to chunked
    LSH (same in HF Reformer), not a masking bug."""
    import dataclasses

    cfg = lsh_cfg(reversible=False)
    full = lambda s: dataclasses.replace(
        s, attention=dataclasses.replace(s.attention, kind="full"))
    return dataclasses.replace(cfg, encoder=full(cfg.encoder),
                               decoder=full(cfg.decoder))


def test_encoder_invariant_to_pad_width():
    """Batch-padding invariance (prenet mask contract): the SAME tokens
    padded to two very different widths produce identical memory rows.
    Guards the encoder_prenet re-zeroing — its convs reach past the mask,
    so without it the last valid positions absorb pad content."""
    cfg = _full_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    n = 24
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, n), 3, vocab_size())
    mems = []
    for L in (32, 96):
        t = jnp.zeros((1, L), jnp.int32).at[:, :n].set(tokens)
        m = jnp.arange(L)[None] < n
        mems.append(np.asarray(M.encode(params, cfg, t, m)[0, :n]))
    np.testing.assert_allclose(mems[0], mems[1], atol=1e-5, rtol=1e-5)


def test_teacher_forced_invariant_to_pad_width():
    """Same contract through the decoder + postnet (frame_mask): mel_post
    and stop logits at valid frames must not depend on how far the batch
    was padded."""
    cfg = _full_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    n_tok, n_mel = 24, 40
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, n_tok), 3,
                                vocab_size())
    tmask = jnp.ones((1, n_tok), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, n_mel, 20))
    outs = []
    for T in (48, 112):
        mi = jnp.zeros((1, T, 20)).at[:, :n_mel].set(mel)
        mm = jnp.arange(T)[None] < n_mel
        pre, post, stop = M.forward(params, cfg, tokens, tmask,
                                    M.shift_mel(mi), mm)
        outs.append((np.asarray(post)[0, :n_mel],
                     np.asarray(stop)[0, :n_mel]))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5, rtol=1e-5)
