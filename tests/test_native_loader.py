"""Native C++ loader/DSP tests: build, parity with the Python path, and the
prefetch batch pipeline (SURVEY.md §3.3 native-equivalents contract)."""

import numpy as np
import pytest

from rtts.config import DatasetConfig, TextConfig
from rtts.data import native_loader as nl


pytestmark = pytest.mark.skipif(not nl.available(),
                                reason=f"native build failed: {nl.build_error()}")


def test_clip_write_read_round_trip(tmp_path):
    tokens = np.arange(17, dtype=np.int32)
    mel = np.random.default_rng(0).standard_normal((23, 8)).astype(np.float32)
    audio = np.random.default_rng(1).standard_normal(23 * 64).astype(np.float32)
    p = tmp_path / "c.rclip"
    nl.write_clip(str(p), tokens, mel, audio)
    t2, m2, a2 = nl.read_clip(str(p))
    np.testing.assert_array_equal(t2, tokens)
    np.testing.assert_array_equal(m2, mel)
    np.testing.assert_array_equal(a2, audio)


def test_native_wav_matches_python(tmp_path, rng):
    from rtts.audio.wav import read_wav, write_wav

    x = (0.4 * np.sin(np.linspace(0, 700, 4000))).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 22050)
    py_audio, py_sr = read_wav(p)
    na_audio, na_sr = nl.wav_read(str(p))
    assert na_sr == py_sr
    np.testing.assert_allclose(na_audio, py_audio, atol=1e-6)


def test_native_resample_matches_python():
    from rtts.audio.resample import resample_poly

    t = np.arange(44100) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    py = resample_poly(x, 44100, 22050)
    na = nl.resample(x, 44100, 22050)
    assert abs(len(py) - len(na)) <= 2
    n = min(len(py), len(na))
    sl = slice(500, n - 500)
    assert np.abs(py[sl] - na[sl]).mean() < 1e-3


def test_native_trim_matches_python():
    from rtts.data.preprocess import trim_silence as py_trim

    sr = 22050
    sig = np.concatenate([np.zeros(sr // 4),
                          0.5 * np.sin(np.linspace(0, 800 * np.pi, sr // 2)),
                          np.zeros(sr // 4)]).astype(np.float32)
    py = py_trim(sig, sr)
    na = nl.trim_silence(sig, sr)
    assert abs(len(py) - len(na)) <= sr // 50


def _make_clips(tmp_path, n=6, n_mels=8, hop=64):
    paths = []
    metas = []
    rng = np.random.default_rng(0)
    for i in range(n):
        frames = 10 + 3 * i
        tokens = rng.integers(3, 50, size=5 + i).astype(np.int32)
        mel = rng.standard_normal((frames, n_mels)).astype(np.float32)
        audio = rng.standard_normal(frames * hop).astype(np.float32)
        p = tmp_path / f"c{i}.rclip"
        nl.write_clip(str(p), tokens, mel, audio)
        paths.append(str(p))
        metas.append((tokens, mel, audio))
    return paths, metas


def test_loader_fill_batch(tmp_path):
    paths, metas = _make_clips(tmp_path)
    loader = nl.NativeClipLoader(paths, n_workers=2)
    loader.prefetch([0, 1, 2])
    batch = loader.fill_batch([0, 2], t_pad=16, m_pad=32, n_mels=8)
    assert batch["tokens"].shape == (2, 16)
    assert batch["mel"].shape == (2, 32, 8)
    t0, m0, _ = metas[0]
    np.testing.assert_array_equal(batch["tokens"][0][:len(t0)], t0)
    assert batch["token_mask"][0].sum() == len(t0)
    np.testing.assert_array_equal(batch["mel"][0][:m0.shape[0]], m0)
    assert batch["mel_mask"][0].sum() == m0.shape[0]
    # padding is zero
    assert (batch["mel"][0][m0.shape[0]:] == 0).all()


def test_loader_fill_crops(tmp_path):
    paths, metas = _make_clips(tmp_path, hop=64)
    loader = nl.NativeClipLoader(paths, n_workers=2)
    out = loader.fill_crops([1, 3], [2, 0], frames=4, hop=64, n_mels=8)
    _, m1, a1 = metas[1]
    np.testing.assert_array_equal(out["mel"][0], m1[2:6])
    np.testing.assert_array_equal(out["audio"][0], a1[2 * 64:6 * 64])


def test_dataset_native_path_matches_python(tmp_path):
    """TextMelDataset with num_workers>0 must produce identical batches to
    the pure-python collate."""

    from rtts.data.dataset import Manifest, TextMelDataset

    paths, metas = _make_clips(tmp_path, n_mels=8, hop=64)
    clips = []
    for i, (p, (t, m, a)) in enumerate(zip(paths, metas)):
        clips.append({"utt_id": f"c{i}", "clip": p, "text": "x",
                      "n_tokens": len(t), "n_frames": m.shape[0],
                      "n_samples": len(a)})
    man = Manifest(22050, 64, 8, clips)
    cfg_py = DatasetConfig(num_workers=0, mel_pad_to_multiple=16,
                           max_mel_len=64,
                           text=TextConfig(pad_to_multiple=16))
    cfg_na = DatasetConfig(num_workers=2, mel_pad_to_multiple=16,
                           max_mel_len=64,
                           text=TextConfig(pad_to_multiple=16))
    b_py = list(TextMelDataset(man, cfg_py).batches(3, shuffle=False))
    b_na = list(TextMelDataset(man, cfg_na).batches(3, shuffle=False))
    assert len(b_py) == len(b_na)
    for x, y in zip(b_py, b_na):
        for k in x:
            np.testing.assert_array_equal(np.asarray(x[k]), np.asarray(y[k]),
                                          err_msg=k)
