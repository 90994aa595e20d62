"""Variable-length serving batching (VERDICT r2 item 5; SURVEY.md §4.3).

``Synthesizer.serve_to_mel`` buckets requests by predicted mel length and
decodes each bucket at its own max_frames; under-budgeted requests
escalate to the full budget.  The aggregate-throughput win is measured on
TPU (`bench --which serving`); here: budget quantization, order
preservation, escalation semantics, and equality with the pad-to-max path
on a uniform workload.
"""

import dataclasses

import jax
import numpy as np

from rtts.config import Config, from_dict, to_dict
from rtts.infer.synthesize import Synthesizer
from rtts.models import reformer_tts as M

from tests.test_model_m1 import tiny_cfg


def _cfg(stop_threshold=2.0, reduction_factor=1):
    model_cfg = tiny_cfg(d=32)
    model_cfg = dataclasses.replace(model_cfg, stop_threshold=stop_threshold,
                                    reduction_factor=reduction_factor)
    return from_dict(Config, {"model": to_dict(model_cfg),
                              "dataset": {"audio": {"n_mels": 20}}})


def _synth(cfg, max_frames=128):
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    return Synthesizer(cfg, params, max_frames=max_frames)


def test_predict_frames_quantization():
    syn = _synth(_cfg(), max_frames=512)
    texts = ["hi", "a much longer sentence that needs many more frames ok"]
    budgets = syn.predict_frames(texts, frames_per_token=8.0, min_frames=64)
    assert len(budgets) == 2
    for b in budgets:
        assert b % 64 == 0
        assert 64 <= b <= 512
    assert budgets[1] > budgets[0]

    # reduction factor folds into the quantum
    syn_r = _synth(_cfg(reduction_factor=3), max_frames=576)
    for b in syn_r.predict_frames(texts):
        assert b % 3 == 0 and b % 64 == 0


def test_serve_to_mel_orders_and_trims():
    syn = _synth(_cfg(), max_frames=128)
    texts = ["aaaa", "a somewhat longer request here", "bb",
             "the longest request in this tiny workload by far ok then"]
    mels, lengths = syn.serve_to_mel(texts, frames_per_token=4.0,
                                     min_frames=32, escalate=False)
    assert len(mels) == len(texts)
    for m, li in zip(mels, lengths):
        assert m.shape == (li, syn.cfg.model.n_mels)
        assert np.isfinite(m).all()


def test_serve_escalates_truncated_requests():
    """stop_threshold 2.0 => stop never fires => every request hits its
    budget cap and (with escalate=True) re-decodes at max_frames."""
    syn = _synth(_cfg(stop_threshold=2.0), max_frames=96)
    texts = ["hi", "bb"]
    mels, lengths = syn.serve_to_mel(texts, frames_per_token=2.0,
                                     min_frames=32, escalate=True)
    # escalated to the full budget
    assert all(li == 96 for li in lengths)
    # budgets quantize up to the 64-frame quantum
    mels_f, lengths_f = syn.serve_to_mel(texts, frames_per_token=2.0,
                                         min_frames=32, escalate=False)
    assert all(li == 64 for li in lengths_f)


def test_uniform_bucket_matches_pad_to_max():
    """A single-bucket workload must produce exactly the plain batched
    decode's output (same tokens, same max_frames, same jit)."""
    syn = _synth(_cfg(stop_threshold=2.0), max_frames=64)
    texts = ["same length a", "same length b"]
    mels, lengths = syn.serve_to_mel(texts, frames_per_token=50.0,
                                     min_frames=64, escalate=False)
    ref_mel, ref_len = syn.text_to_mel(texts)
    for i in range(len(texts)):
        np.testing.assert_array_equal(lengths[i], ref_len[i])
        np.testing.assert_array_equal(mels[i], ref_mel[i, :ref_len[i]])


def test_serve_produces_waveforms():
    syn = _synth(_cfg(), max_frames=64)
    wavs = syn.serve(["one", "two longer text"], frames_per_token=4.0,
                     min_frames=32)
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()


def test_serve_continuous_to_mel_shapes_and_parity():
    """The continuous path (capacity-classed serve_pool behind the
    Synthesizer API) returns per-request trimmed mels, and a request whose
    budget fills a whole class matches the fused scheduler directly."""
    from rtts.infer.serving import serve_pool
    from rtts.text import encode_batch

    syn = _synth(_cfg(stop_threshold=2.0), max_frames=128)
    texts = ["aaaa", "a somewhat longer request here", "bb",
             "the longest request in this tiny workload by far ok then"]
    mels, lengths = syn.serve_continuous_to_mel(
        texts, frames_per_token=4.0, min_frames=32, slots=2,
        segment_frames=32, escalate=False)
    assert len(mels) == len(texts)
    for m, li in zip(mels, lengths):
        assert li > 0 and m.shape == (li, syn.cfg.model.n_mels)
        assert np.isfinite(m).all()

    # plumbing parity: same budgets through serve_pool directly
    tcfg = syn.cfg.dataset.text
    budgets = syn.predict_frames(texts, frames_per_token=4.0, min_frames=32)
    tokens, mask = encode_batch(texts, cleaner=tcfg.cleaner,
                                pad_to_multiple=tcfg.pad_to_multiple,
                                max_len=tcfg.max_len, level=tcfg.level)
    dmels, lens = serve_pool(syn.tts_params, syn.cfg.model, tokens, mask,
                             budgets, class_caps=(64, 128), slots=2,
                             segment_frames=32, rng=jax.random.PRNGKey(0))
    for i in range(len(texts)):
        assert lengths[i] == int(lens[i])
        np.testing.assert_array_equal(mels[i], np.asarray(dmels[i])[:lens[i]])


def test_serve_continuous_escalates():
    """stop never fires (threshold 2.0) => budget-capped lengths escalate
    to max_frames when requested."""
    syn = _synth(_cfg(stop_threshold=2.0), max_frames=128)
    texts = ["hi", "bb"]
    mels, lengths = syn.serve_continuous_to_mel(
        texts, frames_per_token=2.0, min_frames=32, slots=2,
        segment_frames=32, escalate=True)
    assert all(li == 128 for li in lengths)
    mels_f, lengths_f = syn.serve_continuous_to_mel(
        texts, frames_per_token=2.0, min_frames=32, slots=2,
        segment_frames=32, escalate=False)
    assert all(li == 64 for li in lengths_f)


def test_serve_continuous_batched_vocode():
    """One vocoder dispatch per capacity class.  The flow draws different
    noise z than the per-utterance exact path, so waveforms are compared
    structurally (shape = true length x hop, finite, deterministic across
    calls), not sample-wise."""
    from rtts.config import SqueezeWaveConfig
    from rtts.models import squeezewave as SW

    cfg = _cfg(stop_threshold=2.0)
    vcfg = SqueezeWaveConfig(
        n_mels=20, n_flows=4, n_group=32, n_early_every=2, n_early_size=8,
        wn_layers=2, wn_channels=32, wn_kernel_size=3, hop_length=64,
        audio_segment_length=1024, compute_dtype="float32")
    cfg = dataclasses.replace(cfg, vocoder=vcfg)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    vparams = SW.init(jax.random.PRNGKey(1), vcfg)
    syn = Synthesizer(cfg, params, vocoder_params=vparams, max_frames=128)

    texts = ["aaaa", "a somewhat longer request here ok then indeed"]
    kw = dict(frames_per_token=4.0, min_frames=32, slots=2,
              segment_frames=32)
    wav_b = syn.serve_continuous(texts, vocode="batched", **kw)
    wav_e = syn.serve_continuous(texts, vocode="exact", **kw)
    _, lengths = syn.serve_continuous_to_mel(texts, **kw)

    hop = vcfg.hop_length
    for wb, we, li in zip(wav_b, wav_e, lengths):
        assert wb.shape == we.shape == (li * hop,)
        assert np.isfinite(wb).all() and np.isfinite(we).all()

    # deterministic: same call, same audio
    wav_b2 = syn.serve_continuous(texts, vocode="batched", **kw)
    for w1, w2 in zip(wav_b, wav_b2):
        np.testing.assert_array_equal(w1, w2)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        syn.serve_continuous(texts, vocode="nope", **kw)
