import jax
import numpy as np

from rtts.infer.denoiser import Denoiser, denoise, estimate_bias_spectrum
from rtts.models import squeezewave as SW

from tests.test_squeezewave import small_cfg


def _noisy_params(cfg, scale=0.05):
    """Freshly-initialized flows are exact identities (zero end convs), so
    the bias is literally silent; jitter the params like a trained model."""
    params = SW.init(jax.random.PRNGKey(0), cfg)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.PRNGKey(1)
    out = []
    for i, leaf in enumerate(leaves):
        out.append(leaf + scale * jax.random.normal(
            jax.random.fold_in(key, i), leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def test_denoiser_reduces_bias_energy():
    cfg = small_cfg()
    params = _noisy_params(cfg)
    den = Denoiser(params, cfg, strength=1.0)
    assert den.bias.shape == (513,)
    assert np.isfinite(np.asarray(den.bias)).all()

    # denoising the bias signal itself should strip most of its energy
    import jax.numpy as jnp

    mel = jnp.full((1, 16, cfg.n_mels), -11.5127)
    bias_audio = np.asarray(SW.infer(params, cfg, mel, sigma=0.0)[0])
    cleaned = den(bias_audio)
    assert cleaned.shape == bias_audio.shape
    e_before = float(np.mean(bias_audio ** 2))
    e_after = float(np.mean(cleaned ** 2))
    assert e_after < 0.5 * e_before, (e_before, e_after)


def test_denoise_preserves_signal():
    """A strong tone well above the bias floor survives mild denoising."""
    cfg = small_cfg()
    params = _noisy_params(cfg)
    bias = estimate_bias_spectrum(params, cfg)
    t = np.arange(16 * cfg.hop_length) / 22050
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    import jax.numpy as jnp

    out = np.asarray(denoise(jnp.asarray(tone), bias, strength=0.05))
    corr = np.corrcoef(out[256:-256], tone[256:-256])[0, 1]
    assert corr > 0.95, corr
