"""Deployment export round-trip (rtts/infer/export.py).

The serialized StableHLO artifacts must reproduce the live Synthesizer on
the same inputs up to refusion-class f32 differences (weights are baked
as constants, so XLA folds/fuses differently than the live jit): the TTS
graph IS Synthesizer._decode with the weights baked, and the vocoder
graph IS squeezewave.infer with PRNGKey(0) noise (the mel_to_audio
default)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtts.config import Config, from_dict, to_dict
from rtts.infer.export import ExportedSynthesizer, export_synthesizer
from rtts.infer.synthesize import Synthesizer
from rtts.models import reformer_tts as M
from rtts.models import squeezewave as SW

from tests.test_model_m1 import tiny_cfg

TEXTS = ["hello world", "a longer test sentence here", "ok"]


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    model_cfg = tiny_cfg(d=32)
    cfg = from_dict(Config, {
        "model": to_dict(model_cfg),
        "dataset": {"audio": {"n_mels": model_cfg.n_mels}},
        "vocoder": {"n_mels": model_cfg.n_mels, "n_flows": 2, "n_group": 16,
                    "n_early_every": 4, "n_early_size": 4, "wn_layers": 2,
                    "wn_channels": 16, "hop_length": 16,
                    "audio_segment_length": 256},
    })
    tts_params = M.init(jax.random.PRNGKey(0), cfg.model)
    voc_params = SW.init(jax.random.PRNGKey(1), cfg.vocoder)
    synth = Synthesizer(cfg, tts_params, voc_params, max_frames=16)
    out = str(tmp_path_factory.mktemp("export"))
    manifest = export_synthesizer(synth, out, batch_sizes=(2,), token_len=64)
    return out, synth, manifest


def test_manifest_written(export_dir):
    out, _, manifest = export_dir
    with open(os.path.join(out, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest
    assert on_disk["batch_sizes"] == [2]
    assert "tts_b2" in on_disk["artifacts"]
    assert "vocoder_b2" in on_disk["artifacts"]
    for meta in on_disk["artifacts"].values():
        assert os.path.exists(os.path.join(out, meta["file"]))


def test_tts_artifact_matches_live_synthesizer(export_dir):
    out, synth, _ = export_dir
    exp = ExportedSynthesizer(out)
    texts = TEXTS[:2]
    mel_live, len_live = synth.text_to_mel(texts, seed=3)
    mel_exp, len_exp = exp.text_to_mel(texts, seed=3)
    np.testing.assert_array_equal(len_live, len_exp)
    # refusion-class tolerance: constants-baked graph fuses differently
    np.testing.assert_allclose(mel_live, mel_exp, rtol=1e-5, atol=1e-4)


def test_vocoder_batched_matches_sw_infer(export_dir):
    out, synth, _ = export_dir
    exp = ExportedSynthesizer(out)
    rng = np.random.default_rng(0)
    lens = [10, 7]
    mels = [rng.standard_normal((ln, synth.cfg.model.n_mels)
                                ).astype(np.float32) for ln in lens]
    wavs = exp.vocode(mels)
    padded = np.stack([np.pad(m, ((0, synth.max_frames - m.shape[0]),
                                  (0, 0))) for m in mels])
    ref = np.asarray(SW.infer(synth.vocoder_params, synth.cfg.vocoder,
                              jnp.asarray(padded)))
    hop = synth.cfg.vocoder.hop_length
    for w, r, ln in zip(wavs, ref, lens):
        np.testing.assert_allclose(w, r[: ln * hop], rtol=1e-5, atol=1e-5)


def test_vocoder_b1_roundtrip(export_dir):
    out, synth, _ = export_dir
    out1 = out + "_b1"
    export_synthesizer(synth, out1, batch_sizes=(1,), token_len=64)
    exp = ExportedSynthesizer(out1)
    rng = np.random.default_rng(0)
    length = 10
    mel = rng.standard_normal((length, synth.cfg.model.n_mels)
                              ).astype(np.float32)
    wav_exp = exp.mel_to_audio(mel, length)
    padded = np.pad(mel, ((0, synth.max_frames - length), (0, 0)))
    wav_ref = np.asarray(SW.infer(synth.vocoder_params, synth.cfg.vocoder,
                                  jnp.asarray(padded)[None]))[0]
    hop = synth.cfg.vocoder.hop_length
    np.testing.assert_allclose(wav_exp, wav_ref[: length * hop],
                               rtol=1e-5, atol=1e-5)


def test_e2e_call_chunks_and_is_deterministic(export_dir):
    out, _, _ = export_dir
    exp = ExportedSynthesizer(out)
    # 3 texts through batch-2 artifacts: two chunks, last one padded
    wavs = exp(TEXTS, seed=5)
    wavs2 = exp(TEXTS, seed=5)
    assert len(wavs) == 3
    for w, w2 in zip(wavs, wavs2):
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()
        np.testing.assert_array_equal(w, w2)


def test_long_text_truncates_at_token_budget(export_dir):
    """encode_batch clamps at max_len=token_len (the same static-budget
    contract the live Synthesizer serves under) — over-long text must
    serve, not crash."""
    out, _, _ = export_dir
    exp = ExportedSynthesizer(out)
    mel, lengths = exp.text_to_mel(["x " * 200])
    assert mel.shape[0] == 1 and int(lengths[0]) >= 1


def test_format_version_mismatch_rejected(export_dir, tmp_path):
    out, _, manifest = export_dir
    import shutil
    bad = tmp_path / "bad_export"
    shutil.copytree(out, bad)
    m = dict(manifest)
    m["format_version"] = 999
    with open(bad / "manifest.json", "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format"):
        ExportedSynthesizer(str(bad))


def test_mesh_sharded_export_roundtrips(export_dir, tmp_path):
    """VERDICT r3 item 5: a Synthesizer(mesh=...) exports via
    gather-to-replicated — the artifact must reproduce the single-device
    Synthesizer's output (weights identical after gathering; only
    refusion-class f32 differences remain)."""
    from rtts.config import MeshConfig
    from rtts.parallel.mesh import make_mesh

    out, synth, _ = export_dir
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    sharded = Synthesizer(synth.cfg, synth.tts_params, synth.vocoder_params,
                          max_frames=16, mesh=mesh)
    sdir = str(tmp_path / "sharded_export")
    manifest = export_synthesizer(sharded, sdir, batch_sizes=(2,),
                                  token_len=64)
    assert manifest["artifacts"]
    exp = ExportedSynthesizer(sdir)
    mel_exp, len_exp = exp.text_to_mel(TEXTS[:2], seed=3)
    mel_ref, len_ref = synth.text_to_mel(TEXTS[:2], seed=3)
    assert (len_exp == len_ref).all()
    m = (np.arange(mel_ref.shape[1])[None, :] < len_ref[:, None])[..., None]
    np.testing.assert_allclose(mel_exp * m, mel_ref * m, atol=2e-4, rtol=2e-3)

    with pytest.raises(ValueError, match="gather_sharded"):
        export_synthesizer(sharded, str(tmp_path / "rej"),
                           gather_sharded=False)


def test_pick_batch_prefers_smallest_covering_size(export_dir):
    out, _, _ = export_dir
    exp = ExportedSynthesizer(out)
    exp.manifest["batch_sizes"] = [1, 4, 16]
    assert exp._pick_batch(1) == 1
    assert exp._pick_batch(3) == 4
    assert exp._pick_batch(16) == 16
    assert exp._pick_batch(40) == 16   # chunking handles the overflow
