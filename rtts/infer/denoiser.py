"""Vocoder bias-removal denoiser (SURVEY.md §3.1 #13, WaveGlow lineage).

Flow vocoders emit a characteristic bias noise (the model's output on
zero conditioning).  The denoiser estimates that bias spectrum once —
by running the vocoder on a zero mel with sigma=0 — and performs
spectral subtraction on generated audio: magnitude minus a scaled bias
profile, phase kept, overlap-add resynthesis.  Fully jitted.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from rtts.audio.griffin import istft
from rtts.audio.stft import _frame, _hann
from rtts.config import SqueezeWaveConfig


def _complex_stft(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    win = jnp.asarray(_hann(n_fft))
    frames = _frame(x, n_fft, hop, center=True)
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1)


def estimate_bias_spectrum(voc_params, cfg: SqueezeWaveConfig,
                           n_frames: int = 88, n_fft: int = 1024,
                           hop: int = 256) -> jnp.ndarray:
    """(n_fft//2+1,) mean magnitude of the vocoder's zero-mel output."""
    from rtts.models.squeezewave import infer

    # zero mel in log domain == a constant very quiet frame; use the log
    # floor the audio frontend produces for silence
    mel = jnp.full((1, n_frames, cfg.n_mels), -11.5127)  # log(1e-5)
    bias_audio = infer(voc_params, cfg, mel, sigma=0.0,
                       rng=jax.random.PRNGKey(0))[0]
    mag = jnp.abs(_complex_stft(bias_audio, n_fft, hop))
    return jnp.mean(mag, axis=0)


def denoise(audio: jnp.ndarray, bias_spectrum: jnp.ndarray,
            strength: float = 0.05, n_fft: int = 1024,
            hop: int = 256) -> jnp.ndarray:
    """Spectral-subtract the bias profile from (T,) audio."""
    spec = _complex_stft(audio, n_fft, hop)
    mag = jnp.abs(spec)
    phase = spec / jnp.maximum(mag, 1e-8)
    mag = jnp.maximum(mag - strength * bias_spectrum[None, :], 0.0)
    out = istft(mag * phase, n_fft, hop)
    return out[: audio.shape[0]]


class Denoiser:
    """Convenience wrapper caching the bias spectrum for a vocoder."""

    def __init__(self, voc_params, cfg: SqueezeWaveConfig,
                 strength: float = 0.05):
        self.cfg = cfg
        self.strength = strength
        self.bias = estimate_bias_spectrum(voc_params, cfg)
        self._jit = jax.jit(lambda a: denoise(a, self.bias, self.strength))

    def __call__(self, audio) -> np.ndarray:
        return np.asarray(self._jit(jnp.asarray(audio)))
