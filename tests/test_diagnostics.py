"""Attention observability: the diagnostic replay must be EXACT vs the
training stack, and the captured cross-attention must be a softmax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.infer.diagnostics import _replay, alignment_map
from rtts.models import reformer_tts as M
from rtts.text import vocab_size

from tests.test_model_lsh import lsh_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = lsh_cfg(reversible=True)
    params = M.init(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 3,
                                vocab_size())
    tmask = jnp.ones((2, 64), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 32, cfg.n_mels))
    mmask = jnp.ones((2, 32), bool)
    return cfg, params, tokens, tmask, mel, mmask


def test_replay_matches_training_stack(setup):
    """The replayed decoder hidden state reproduces the reversible stack's
    output (same math, same rng), so captured probs are the real ones."""
    cfg, params, tokens, tmask, mel, mmask = setup
    probs, y = _replay(params, cfg, tokens, tmask, mel, mmask)
    # reference: decode_train's pre-head hidden = mel_head^-1 is not
    # available, so compare through the mel head projection
    from rtts.models.reformer_tts import _dtype, shift_mel
    from rtts.nn.layers import dense

    memory = M.encode(params, cfg, tokens, tmask, deterministic=True)
    pre, _, _ = M.decode_train(params, cfg, shift_mel(mel), mmask, memory,
                               tmask, deterministic=True)
    cdt = _dtype(cfg.compute_dtype)
    pre_replay = dense(params["mel_head"], y.astype(cdt),
                       cdt).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(pre_replay), np.asarray(pre),
                               atol=1e-4, rtol=1e-4)


def test_cross_probs_are_softmax(setup):
    cfg, params, tokens, tmask, mel, mmask = setup
    probs, _ = _replay(params, cfg, tokens, tmask, mel, mmask)
    assert len(probs) == cfg.decoder.num_layers
    for p in probs:
        p = np.asarray(p)
        assert p.shape[:2] == (2, cfg.decoder.attention.num_heads)
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
        assert (p >= 0).all()


def test_alignment_map_shape(setup):
    cfg, params, tokens, tmask, mel, mmask = setup
    a = np.asarray(alignment_map(params, cfg, tokens, tmask, mel, mmask))
    assert a.shape[0] == 2 and a.shape[1] == 32  # (B, T_groups, L_padded)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
