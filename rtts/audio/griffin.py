"""ISTFT + Griffin-Lim phase recovery (jitted).

Stand-in mel->waveform path used before/alongside the SqueezeWave vocoder
(SURVEY.md §8 M1), and generally useful for debugging spectrogram outputs.
Mel inversion uses the (clamped) pseudo-inverse of the mel filterbank.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rtts.audio.stft import _hann, mel_filterbank
from rtts.config import AudioConfig


def _istft_centered(spec_complex: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Inverse STFT (hann synthesis), keeping the center padding.
    spec: (frames, bins) complex -> (n_fft + hop*(frames-1),) signal."""
    win = jnp.asarray(_hann(n_fft))
    frames = jnp.fft.irfft(spec_complex, n=n_fft, axis=-1) * win
    num_frames = frames.shape[0]
    out_len = n_fft + hop * (num_frames - 1)
    idx = (np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((out_len,)).at[idx].add(frames.reshape(-1))
    norm = jnp.zeros((out_len,)).at[idx].add(jnp.tile(win * win, (num_frames,)))
    return sig / jnp.maximum(norm, 1e-8)


def istft(spec_complex: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Inverse STFT -> exactly hop * num_frames samples (center convention)."""
    num_frames = spec_complex.shape[0]
    sig = _istft_centered(spec_complex, n_fft, hop)
    return jax.lax.dynamic_slice_in_dim(
        jnp.pad(sig, (0, hop)), n_fft // 2, hop * num_frames)


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop: int,
    n_iter: int = 32,
    seed: int = 0,
) -> jnp.ndarray:
    """Phase recovery from |STFT| (frames, bins) -> waveform (hop*frames,)."""
    key = jax.random.PRNGKey(seed)
    angle = jax.random.uniform(key, magnitude.shape, minval=-np.pi, maxval=np.pi)
    spec = magnitude * jnp.exp(1j * angle)
    win = jnp.asarray(_hann(n_fft))
    num_frames = magnitude.shape[0]
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]

    def body(_, spec):
        x = _istft_centered(spec, n_fft, hop)  # stay in centered domain
        frames = x[idx] * win
        new_spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        phase = new_spec / jnp.maximum(jnp.abs(new_spec), 1e-8)
        return magnitude * phase

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, hop)


def mel_to_audio(log_mel: jnp.ndarray, cfg: AudioConfig, n_iter: int = 32) -> jnp.ndarray:
    """(T, n_mels) log-mel -> waveform via pinv(mel basis) + Griffin-Lim."""
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    inv = np.linalg.pinv(basis)  # (bins, n_mels)
    mel = jnp.exp(log_mel)
    mag = jnp.maximum(mel @ jnp.asarray(inv.T), 0.0)
    return griffin_lim(mag, cfg.n_fft, cfg.hop_length, n_iter)
