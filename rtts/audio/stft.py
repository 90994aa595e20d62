"""Jitted STFT -> mel-spectrogram front-end.

Capability parity: the reference computes log-mel spectrograms with
librosa/torchaudio (tacotron params: n_fft 1024, hop 256, win 1024, 80 mels —
SURVEY.md §4.4).  Here the whole front-end compiles to XLA.

TPU-first design: an FFT of length 1024 is fine on TPU, but the *matmul* DFT
formulation (frames @ [cos|sin] bases) maps straight onto the MXU and fuses
with the mel projection into two back-to-back matmuls — for n_fft=1024 and
n_mels=80 this is the faster layout, and it is the default.  The rfft path is
kept for cross-checking.

Mel filterbank follows the slaney-normalized convention (librosa default) so
golden tests against librosa/torch fixtures line up.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import AudioConfig


def hz_to_mel(f):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) slaney-normalized triangular filterbank."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization: each filter integrates to ~ constant energy
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann(win_length: int) -> np.ndarray:
    # periodic hann, matching torch.hann_window / librosa default for STFT
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int, center: bool) -> jnp.ndarray:
    """(..., T) -> (..., frames, n_fft) via gather of a static index grid."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    t = x.shape[-1]
    num_frames = 1 + (t - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def _dft_bases(n_fft: int, win: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: (n_fft, n_bins) cos and -sin matrices."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    method: str = "matmul",
) -> jnp.ndarray:
    """|STFT| of (..., T) -> (..., frames, n_fft//2+1).

    method="matmul": frames @ DFT bases (two MXU matmuls).
    method="fft":    jnp.fft.rfft (oracle path / cross-check).
    """
    win = _hann(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    frames = _frame(x, n_fft, hop_length, center)
    if method == "fft":
        spec = jnp.fft.rfft(frames * jnp.asarray(win), n=n_fft, axis=-1)
        return jnp.abs(spec)
    cos_b, sin_b = _dft_bases(n_fft, win)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    return jnp.sqrt(re * re + im * im + 1e-12)


def log_mel_spectrogram(
    x: jnp.ndarray,
    cfg: AudioConfig,
    mel_basis: Optional[jnp.ndarray] = None,
    method: str = "matmul",
) -> jnp.ndarray:
    """(..., T) waveform -> (..., frames, n_mels) log-mel. Jit-friendly."""
    if mel_basis is None:
        mel_basis = jnp.asarray(
            mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
        )
    mag = stft_magnitude(x, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.center, method)
    mel = mag @ mel_basis.T
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def make_mel_fn(cfg: AudioConfig, method: str = "matmul") -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return a jitted waveform->log-mel function with the basis baked in."""
    basis = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )

    @jax.jit
    def mel_fn(x: jnp.ndarray) -> jnp.ndarray:
        return log_mel_spectrogram(x, cfg, mel_basis=basis, method=method)

    return mel_fn
