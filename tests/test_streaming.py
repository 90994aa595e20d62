"""Streaming vocoder inference: chunked output must EXACTLY match the
single-pass output (same noise, overlap covers the receptive field) —
BASELINE config 3 (vocoder fused behind the decoder, streaming chunks)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.models import squeezewave as SW

from tests.test_squeezewave import small_cfg
from tests.test_denoiser import _noisy_params


def test_streaming_matches_single_pass():
    cfg = small_cfg()
    params = _noisy_params(cfg, scale=0.02)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 48, cfg.n_mels))
    rng = jax.random.PRNGKey(7)
    full = SW.infer(params, cfg, mel, rng=rng)
    stream = SW.infer_streaming(params, cfg, mel, rng=rng, chunk_frames=16)
    assert stream.shape == full.shape
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-3)


def test_streaming_handles_ragged_tail():
    cfg = small_cfg()
    params = _noisy_params(cfg, scale=0.02)
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 23, cfg.n_mels))
    full = SW.infer(params, cfg, mel, rng=jax.random.PRNGKey(1))
    stream = SW.infer_streaming(params, cfg, mel, rng=jax.random.PRNGKey(1),
                                chunk_frames=16)
    assert stream.shape == full.shape
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-3)


def test_receptive_field():
    cfg = small_cfg()  # 6 flows, 3 wn layers, kernel 3
    assert SW.receptive_field_squeezed(cfg) == 6 * 3 * 1
