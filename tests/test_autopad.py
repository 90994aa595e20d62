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
