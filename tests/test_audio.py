"""Audio front-end golden tests.

STFT is checked against torch.stft (torch CPU is the in-repo fixture
generator per SURVEY.md §5.3 item 4); mel filterbank against structural
properties of the slaney convention; resampling against scipy.signal.
"""

import numpy as np

import jax.numpy as jnp

from rtts.audio import (
    log_mel_spectrogram,
    make_mel_fn,
    mel_filterbank,
    read_wav,
    resample_poly,
    stft_magnitude,
    write_wav,
)
from rtts.config import AudioConfig


def _test_signal(sr=22050, seconds=0.5, rng=None):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1760 * t)
    if rng is not None:
        x = x + 0.01 * rng.standard_normal(x.shape)
    return x.astype(np.float32)


def test_stft_matches_torch(rng):
    import torch

    x = _test_signal(rng=rng)
    cfg = AudioConfig()
    ours = np.asarray(
        stft_magnitude(jnp.asarray(x), cfg.n_fft, cfg.hop_length, cfg.win_length, method="matmul")
    )
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).abs().numpy().T  # torch gives (bins, frames); ours is (frames, bins)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_stft_matmul_matches_fft_path(rng):
    x = _test_signal(rng=rng)
    cfg = AudioConfig()
    a = np.asarray(stft_magnitude(jnp.asarray(x), cfg.n_fft, cfg.hop_length, cfg.win_length, method="matmul"))
    b = np.asarray(stft_magnitude(jnp.asarray(x), cfg.n_fft, cfg.hop_length, cfg.win_length, method="fft"))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_mel_filterbank_structure():
    fb = mel_filterbank(22050, 1024, 80, fmin=0.0, fmax=8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()
    # filters are band-limited below fmax
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs > 8100].sum() == 0


def test_log_mel_shapes_and_batching(rng):
    x = _test_signal(rng=rng)
    cfg = AudioConfig()
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg))
    assert mel.shape[1] == cfg.n_mels
    assert np.isfinite(mel).all()
    # batched input maps over leading dims
    xb = jnp.stack([jnp.asarray(x)] * 3)
    melb = np.asarray(log_mel_spectrogram(xb, cfg))
    assert melb.shape == (3,) + mel.shape
    np.testing.assert_allclose(melb[0], mel, atol=1e-4, rtol=1e-5)


def test_make_mel_fn_jits(rng):
    cfg = AudioConfig()
    fn = make_mel_fn(cfg)
    x = jnp.asarray(_test_signal(rng=rng))
    mel = np.asarray(fn(x))
    assert mel.shape[1] == cfg.n_mels


def test_wav_round_trip(tmp_path, rng):
    x = _test_signal(rng=rng)
    p = tmp_path / "t.wav"
    write_wav(p, x, 22050)
    y, sr = read_wav(p)
    assert sr == 22050
    assert y.shape == x.shape
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.0 / 16384)


def test_resample_against_scipy(rng):
    from scipy.signal import resample_poly as scipy_resample

    x = _test_signal(sr=44100, rng=rng)
    ours = resample_poly(x, 44100, 22050)
    ref = scipy_resample(x.astype(np.float64), 1, 2).astype(np.float32)
    assert abs(len(ours) - len(ref)) <= 2
    n = min(len(ours), len(ref))
    # compare away from edges (different edge handling)
    sl = slice(500, n - 500)
    err = np.abs(ours[sl] - ref[sl]).mean()
    assert err < 5e-3


def test_resample_preserves_tone_frequency():
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample_poly(x, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 2000)
    assert abs(peak_hz - 1000) < 10
