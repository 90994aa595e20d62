"""Trainer smoke tests: few-step runs of both harnesses on the synthetic
corpus, checkpoint resume, and data-parallel consistency over the virtual
8-device mesh (SURVEY.md §5.3 items 5-6)."""

import json

import numpy as np
import pytest

from rtts.config import (
    AttentionConfig,
    Config,
    DatasetConfig,
    ExperimentConfig,
    LoggingConfig,
    MeshConfig,
    OptimConfig,
    ReformerStackConfig,
    ReformerTTSConfig,
    SqueezeWaveConfig,
    CheckpointConfig,
)
from rtts.data.corpus import generate_corpus
from rtts.data.preprocess import preprocess_corpus


def _cfg(data_dir: str, dp: int = 1, mp: int = 1, zero: bool = False
         ) -> Config:
    att = AttentionConfig(kind="lsh", num_heads=2, head_dim=16,
                          num_hashes=2, chunk_length=16)
    stack = dict(d_model=32, d_ff=64, dropout=0.0, attention=att)
    from rtts.text import vocab_size

    return Config(
        dataset=DatasetConfig(data_dir=data_dir, batch_size=4,
                              val_fraction=0.25),
        model=ReformerTTSConfig(
            vocab_size=vocab_size(), d_model=32, n_mels=80,
            encoder=ReformerStackConfig(num_layers=1, causal=False,
                                        reversible=False, **stack),
            decoder=ReformerStackConfig(num_layers=1, causal=True,
                                        reversible=False, **stack),
            dec_prenet_hidden=16, postnet_channels=16, max_pos=2048,
            compute_dtype="float32"),
        vocoder=SqueezeWaveConfig(n_flows=2, n_group=64, n_early_every=2,
                                  n_early_size=16, wn_layers=2,
                                  wn_channels=32, audio_segment_length=4096,
                                  compute_dtype="float32"),
        experiment=ExperimentConfig(
            seed=0,
            optim=OptimConfig(learning_rate=1e-3, warmup_steps=10,
                              schedule="constant"),
            mesh=MeshConfig(data_parallel=dp, model_parallel=mp,
                            zero_sharding=zero),
            checkpoint=CheckpointConfig(save_every_steps=4, keep=2),
            logging=LoggingConfig(log_every_steps=2, eval_every_steps=4),
            eval_batches=1),
    )


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("train")
    data_dir = str(root / "data")
    cfg = _cfg(data_dir)
    generate_corpus(root, n_utterances=8)
    preprocess_corpus(cfg.dataset, str(root / "transcripts.txt"))
    return root, data_dir


def test_train_tts_runs_and_resumes(prepared, tmp_path):
    from rtts.train.train_tts import train_tts

    root, data_dir = prepared
    cfg = _cfg(data_dir)
    work = tmp_path / "tts"
    m1 = train_tts(cfg, str(work), max_steps=4)
    assert np.isfinite(m1["loss"])
    # metrics jsonl written
    lines = [json.loads(l) for l in open(work / "metrics.jsonl")]
    assert any("train/loss" in l for l in lines)
    assert any("val/loss" in l for l in lines)
    # objective quality scalars ride every eval (VERDICT r3 item 6)
    val = next(l for l in lines if "val/loss" in l)
    for key in ("val/mcd", "val/stop_len_mae", "val/attn_diagonality",
                "val/attn_focus", "val/mr_stft_gl",
                "val/spectral_convergence_gl"):
        assert key in val and np.isfinite(val[key]), (key, val)
    assert 0.0 <= val["val/attn_diagonality"] <= 1.0
    assert val["val/mr_stft_gl"] > 0.0  # untrained model vs real audio
    # checkpoint exists; resume continues from step 4
    ckpts = list((work / "checkpoints").glob("step_*"))
    assert ckpts
    m2 = train_tts(cfg, str(work), max_steps=6)
    assert np.isfinite(m2["loss"])
    # artifacts written
    assert list((work / "artifacts").glob("mel_step*.png"))


def test_train_vocoder_runs(prepared, tmp_path):
    from rtts.train.train_vocoder import train_vocoder

    root, data_dir = prepared
    cfg = _cfg(data_dir)
    work = tmp_path / "voc"
    m = train_vocoder(cfg, str(work), max_steps=4)
    assert np.isfinite(m["loss_vocoder"])
    assert list((work / "checkpoints").glob("step_*"))
    # waveform-domain fidelity scalar rides the vocoder eval (VERDICT r4
    # item 3): vocoded held-out crops vs ground-truth audio
    lines = [json.loads(l) for l in open(work / "metrics.jsonl")]
    val = next(l for l in lines if "val/mr_stft" in l)
    for key in ("val/mr_stft", "val/spectral_convergence",
                "val/log_stft_l1"):
        assert np.isfinite(val[key]), (key, val)


def test_data_parallel_matches_single_device(prepared, tmp_path):
    """Same seed, dp=1 vs dp=8: identical loss trajectory (SURVEY §5.3.6)."""
    from rtts.train.train_tts import train_tts

    root, data_dir = prepared
    m1 = train_tts(_cfg(data_dir, dp=1), str(tmp_path / "a"), max_steps=3)
    m4 = train_tts(_cfg(data_dir, dp=4), str(tmp_path / "b"), max_steps=3)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-4)


def test_tp_zero_trainer_matches_dp(prepared, tmp_path):
    """TP (model_parallel=2) + ZeRO-1 moments through the REAL trainer:
    loss trajectory matches the dp-only run, and the mid-run checkpoint
    (sharded opt_state gathered at save) restores cleanly."""
    from rtts.train.train_tts import train_tts

    root, data_dir = prepared
    m_dp = train_tts(_cfg(data_dir, dp=4), str(tmp_path / "dp"), max_steps=5)
    work = tmp_path / "tpz"
    m_tz = train_tts(_cfg(data_dir, dp=2, mp=2, zero=True), str(work),
                     max_steps=5)
    np.testing.assert_allclose(float(m_tz["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    # resume from the step-4 checkpoint under the same sharding
    m_res = train_tts(_cfg(data_dir, dp=2, mp=2, zero=True), str(work),
                      max_steps=6)
    assert np.isfinite(float(m_res["loss"]))
