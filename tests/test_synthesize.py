"""End-to-end text -> wav smoke (untrained params: checks shapes/finiteness
and that the full pipeline composes — SURVEY.md §5.3 item 5)."""

import numpy as np

import jax

from rtts.config import Config, from_dict, to_dict
from rtts.infer.synthesize import Synthesizer
from rtts.models import reformer_tts as M

from tests.test_model_m1 import tiny_cfg


def test_text_to_wav_smoke():
    model_cfg = tiny_cfg(d=32)
    cfg = from_dict(Config, {"model": to_dict(model_cfg),
                             "dataset": {"audio": {"n_mels": model_cfg.n_mels}}})
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    syn = Synthesizer(cfg, params, max_frames=16)
    wavs = syn(["hello world"])
    assert len(wavs) == 1
    assert wavs[0].ndim == 1
    assert len(wavs[0]) > 0
    assert np.isfinite(wavs[0]).all()
