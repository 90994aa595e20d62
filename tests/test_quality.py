"""Objective quality scalars (rtts/train/quality.py — SURVEY.md §6.5,
VERDICT r3 item 6): MCD, stop-timing accuracy, attention diagonality."""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.train.quality import (
    attention_diagonality,
    mel_cepstral_distortion,
    stop_length_mae,
)


def _mels(key, b=2, t=40, m=80):
    return jax.random.normal(key, (b, t, m))


def test_mcd_zero_on_identical_and_monotone():
    key = jax.random.PRNGKey(0)
    mel = _mels(key)
    mask = jnp.ones(mel.shape[:2], bool)
    assert float(mel_cepstral_distortion(mel, mel, mask)) < 1e-3
    n1 = mel + 0.1 * jax.random.normal(jax.random.PRNGKey(1), mel.shape)
    n2 = mel + 0.5 * jax.random.normal(jax.random.PRNGKey(1), mel.shape)
    d1 = float(mel_cepstral_distortion(n1, mel, mask))
    d2 = float(mel_cepstral_distortion(n2, mel, mask))
    assert 0 < d1 < d2


def test_mcd_masked_frames_ignored():
    key = jax.random.PRNGKey(0)
    mel = _mels(key)
    mask = jnp.arange(mel.shape[1])[None, :] < 20
    mask = jnp.broadcast_to(mask, mel.shape[:2])
    # corrupt ONLY masked-out frames: MCD must not move
    noisy = mel.at[:, 20:].add(100.0)
    base = float(mel_cepstral_distortion(mel, mel, mask))
    same = float(mel_cepstral_distortion(noisy, mel, mask))
    assert abs(same - base) < 1e-6


def test_mcd_energy_offset_excluded():
    """A constant offset across all mel bins lives in c0 (energy), which
    Kubichek's formula excludes."""
    key = jax.random.PRNGKey(0)
    mel = _mels(key)
    mask = jnp.ones(mel.shape[:2], bool)
    assert float(mel_cepstral_distortion(mel + 3.0, mel, mask)) < 1e-3


def test_stop_length_mae_exact():
    t = 32
    # logits: row 0 fires at frame 9 (pred_len 10), row 1 never fires
    logits = jnp.full((2, t), -10.0)
    logits = logits.at[0, 9].set(10.0)
    mask = jnp.arange(t)[None, :] < jnp.asarray([[12], [32]])[:, 0][:, None]
    # true lens 12 and 32; preds 10 and 32 -> MAE = (2 + 0) / 2 = 1
    got = float(stop_length_mae(logits, mask, threshold=0.5))
    assert got == 1.0


def test_attention_diagonality_extremes():
    t, l = 40, 20
    # perfect monotone alignment: each frame row one-hot at the ideal token
    ideal = np.round(np.arange(t) * (l - 1) / (t - 1)).astype(int)
    diag = np.zeros((t, l))
    diag[np.arange(t), ideal] = 1.0
    d_hi, f_hi = attention_diagonality(diag, t, l)
    assert d_hi > 0.99 and f_hi > 0.99
    # uniform attention: low band mass (~band width / L), focus 1/L
    uni = np.full((t, l), 1.0 / l)
    d_lo, f_lo = attention_diagonality(uni, t, l)
    assert d_lo < 0.5 and abs(f_lo - 1.0 / l) < 1e-6
    assert d_hi > d_lo


def test_attention_diagonality_ignores_padding():
    t, l = 20, 30
    n_tok = 10
    ideal = np.round(np.arange(t) * (n_tok - 1) / (t - 1)).astype(int)
    a = np.zeros((t, l))
    a[np.arange(t), ideal] = 0.6
    a[:, n_tok:] = 0.4 / (l - n_tok)   # mass leaked onto padding tokens
    d, f = attention_diagonality(a, t, n_tok)
    # after renormalization over the valid slice the map is one-hot again
    assert d > 0.99 and f > 0.99


def test_mr_stft_zero_for_identical_and_orders_degradation():
    from rtts.train.quality import multi_resolution_stft_distance

    rng = np.random.default_rng(0)
    t = np.sin(2 * np.pi * 440 * np.arange(22050) / 22050).astype(np.float32)
    same = multi_resolution_stft_distance(t, t)
    assert same["spectral_convergence"] < 1e-9
    assert same["log_stft_l1"] < 1e-9
    assert same["mr_stft"] < 1e-9
    # mild noise < heavy noise < unrelated noise (monotone in degradation)
    mild = multi_resolution_stft_distance(
        t + 0.01 * rng.standard_normal(t.shape), t)
    heavy = multi_resolution_stft_distance(
        t + 0.3 * rng.standard_normal(t.shape), t)
    other = multi_resolution_stft_distance(
        rng.standard_normal(t.shape).astype(np.float32), t)
    assert 0 < mild["mr_stft"] < heavy["mr_stft"] < other["mr_stft"]


def test_mr_stft_phase_shift_insensitive_and_length_trim():
    from rtts.train.quality import multi_resolution_stft_distance

    n = 22050
    x = np.sin(2 * np.pi * 220 * np.arange(n) / 22050)
    shifted = np.sin(2 * np.pi * 220 * np.arange(n) / 22050 + 1.3)
    d = multi_resolution_stft_distance(shifted, x)
    # magnitude-only: constant phase ~free on the energy term (the log-mag
    # term stays noisy on a pure tone's near-zero bins — that's fine)
    assert d["spectral_convergence"] < 0.05
    # different lengths: trimmed, not an error
    d2 = multi_resolution_stft_distance(x[: n // 2], x)
    assert np.isfinite(d2["mr_stft"])
    # too short for every window -> NaN, not a crash
    d3 = multi_resolution_stft_distance(x[:16], x[:16])
    assert np.isnan(d3["mr_stft"])
