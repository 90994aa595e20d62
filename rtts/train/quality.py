"""Objective quality scalars for eval-time observability (SURVEY.md §6.5
— the reference's primary observability was eval-time quality artifacts;
VERDICT r3 item 6 adds numeric companions so fidelity regressions show up
in the metrics JSONL, not just in PNGs).

Three scalars, each cheap and jit-friendly where it runs inside the eval
step:

- ``mel_cepstral_distortion`` — MCD (dB) between predicted and target
  log-mels on DCT-II cepstra (c1..cK, c0/energy excluded).  This is the
  standard MCD formula applied to mel-spectrogram cepstra rather than
  SPTK mceps — absolute values are not comparable to SPTK-based papers,
  but the scalar moves monotonically with spectral fidelity and is
  consistent across this repo's checkpoints/modes.
- ``stop_length_mae`` — mean |predicted length − true length| in frames
  from the teacher-forced stop head (the stop-timing accuracy scalar).
- ``attention_diagonality`` — band-mass of the head-averaged decoder
  cross-attention around the ideal monotone text↔frame line, plus
  ``attention_focus`` (mean max row prob).  Computed from the exact
  teacher-forced replay (rtts/infer/diagnostics.py).
- ``multi_resolution_stft_distance`` — waveform-domain fidelity between a
  rendered/vocoded prediction and ground-truth AUDIO (VERDICT r4 item 3:
  the reference's primary observability was rendered audio judged by ear
  — SURVEY.md §6.5; this is its numeric companion).  Spectral convergence
  + log-magnitude L1 averaged over three STFT resolutions (the Parallel
  WaveGAN / MR-STFT auxiliary-loss formulation), host-side numpy.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _dct_basis(n_mels: int, n_coeffs: int) -> jnp.ndarray:
    """Orthonormal DCT-II basis (n_mels, n_coeffs + 1): column k is the
    k-th cepstral analysis vector (k=0 kept so callers can slice it off)."""
    n = jnp.arange(n_mels, dtype=jnp.float32)
    k = jnp.arange(n_coeffs + 1, dtype=jnp.float32)
    basis = jnp.cos(jnp.pi * (n[:, None] + 0.5) * k[None, :] / n_mels)
    scale = jnp.where(k == 0, jnp.sqrt(1.0 / n_mels),
                      jnp.sqrt(2.0 / n_mels))
    return basis * scale[None, :]


def mel_cepstral_distortion(pred: jnp.ndarray, target: jnp.ndarray,
                            mask: jnp.ndarray,
                            n_coeffs: int = 13) -> jnp.ndarray:
    """MCD (dB) over valid frames.  pred/target (B, T, n_mels) natural-log
    mels; mask (B, T) frame validity.

    MCD_t = (10/ln10) * sqrt(2 * sum_{k=1..K} (c_pred,k - c_tgt,k)^2),
    averaged over valid frames (Kubichek's formula on cepstra c1..cK)."""
    basis = _dct_basis(pred.shape[-1], n_coeffs)
    diff = (pred.astype(jnp.float32)
            - target.astype(jnp.float32)) @ basis      # (B, T, K+1)
    sq = jnp.sum(jnp.square(diff[..., 1:]), axis=-1)   # drop c0 (energy)
    per_frame = jnp.sqrt(jnp.maximum(2.0 * sq, 1e-12))
    m = mask.astype(jnp.float32)
    const = 10.0 / jnp.log(10.0)
    return const * jnp.sum(per_frame * m) / jnp.maximum(jnp.sum(m), 1.0)


def stop_length_mae(stop_logits: jnp.ndarray, mel_mask: jnp.ndarray,
                    threshold: float = 0.5) -> jnp.ndarray:
    """Mean |pred_len − true_len| (frames) from teacher-forced stop logits.

    pred_len = first frame whose stop probability crosses ``threshold``
    (+1 — the stop frame itself plays), clamped to T when the head never
    fires — the same rule ``decode_greedy`` applies at serving time, so
    this scalar is the teacher-forced proxy for serving stop timing."""
    t = stop_logits.shape[1]
    fired = jax.nn.sigmoid(stop_logits.astype(jnp.float32)) > threshold
    idx = jnp.arange(t)
    first = jnp.min(jnp.where(fired, idx[None, :], t), axis=1)
    pred_len = jnp.minimum(first + 1, t)
    true_len = jnp.sum(mel_mask.astype(jnp.int32), axis=1)
    return jnp.mean(jnp.abs(pred_len - true_len).astype(jnp.float32))


# (n_fft, hop, win): the standard MR-STFT triple — fine / coarse / mid
# time-frequency trade-offs so neither transient smearing nor tonal error
# can hide from all three.
_MRSTFT_RESOLUTIONS = ((512, 128, 240), (1024, 256, 600), (2048, 512, 1200))


def _stft_mag(x: np.ndarray, n_fft: int, hop: int, win: int) -> np.ndarray:
    """|STFT| of a 1-D signal: hann-windowed frames, no centering.
    Returns (n_frames, n_fft//2 + 1); empty when the signal is shorter
    than one window."""
    x = np.asarray(x, np.float64)
    if len(x) < win:
        return np.zeros((0, n_fft // 2 + 1))
    n_frames = 1 + (len(x) - win) // hop
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    window = np.hanning(win)
    return np.abs(np.fft.rfft(x[idx] * window, n=n_fft, axis=-1))


def multi_resolution_stft_distance(
        pred_wav: np.ndarray, true_wav: np.ndarray,
        resolutions=_MRSTFT_RESOLUTIONS) -> dict:
    """Waveform-domain distance between predicted and ground-truth audio.

    Both inputs are 1-D float waveforms (any common scale); they are
    trimmed to the shorter length.  Returns::

        {"spectral_convergence": mean_r ||S_t - S_p||_F / ||S_t||_F,
         "log_stft_l1":          mean_r mean |log S_t - log S_p|,
         "mr_stft":              sum of the two}

    all averaged over ``resolutions`` (skipping any the signals are too
    short for).  0 for identical signals; insensitive to constant phase
    shifts of the reconstruction (magnitude-only), which is what makes it
    usable with Griffin-Lim renders as well as vocoded audio.
    """
    n = min(len(pred_wav), len(true_wav))
    p = np.asarray(pred_wav[:n], np.float64)
    t = np.asarray(true_wav[:n], np.float64)
    scs, mags = [], []
    for n_fft, hop, win in resolutions:
        sp = _stft_mag(p, n_fft, hop, win)
        st = _stft_mag(t, n_fft, hop, win)
        if st.shape[0] == 0:
            continue
        denom = np.sqrt(np.sum(st ** 2))
        scs.append(float(np.sqrt(np.sum((st - sp) ** 2))
                         / max(denom, 1e-9)))
        eps = 1e-7
        mags.append(float(np.mean(np.abs(np.log(st + eps)
                                         - np.log(sp + eps)))))
    if not scs:
        return {"spectral_convergence": float("nan"),
                "log_stft_l1": float("nan"), "mr_stft": float("nan")}
    sc, mag = float(np.mean(scs)), float(np.mean(mags))
    return {"spectral_convergence": sc, "log_stft_l1": mag,
            "mr_stft": sc + mag}


def attention_diagonality(align: np.ndarray, n_frames: int, n_tokens: int,
                          band_frac: float = 0.12
                          ) -> Tuple[float, float]:
    """(diagonality, focus) of one head-averaged cross-attention map.

    align: (T_rows, L_cols) row-normalized probs (rows may be mel GROUPS
    under a reduction factor — only the first ``n_frames`` rows /
    ``n_tokens`` cols are scored).  diagonality = mean row mass inside a
    band of half-width ``band_frac * n_tokens`` around the ideal monotone
    line l*(t) = t * (L-1)/(T-1); focus = mean max row prob (how peaky
    the alignment is).  Both in [0, 1]; a trained, aligned model pushes
    both up, an untrained one sits near L_band/L and 1/L."""
    a = np.asarray(align, np.float64)[:n_frames, :n_tokens]
    t_n, l_n = a.shape
    if t_n == 0 or l_n == 0:
        return 0.0, 0.0
    # rows were normalized over the PADDED token axis; renormalize over
    # the valid slice so padding attention doesn't deflate the score
    row_sum = a.sum(axis=1, keepdims=True)
    a = a / np.maximum(row_sum, 1e-9)
    ideal = (np.arange(t_n) * (l_n - 1) / max(t_n - 1, 1))[:, None]
    radius = max(1.0, band_frac * l_n)
    band = np.abs(np.arange(l_n)[None, :] - ideal) <= radius
    diagonality = float((a * band).sum(axis=1).mean())
    focus = float(a.max(axis=1).mean())
    return diagonality, focus
