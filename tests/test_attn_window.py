"""Inference-time monotonic cross-attention windowing (beyond-reference,
opt-in guard against attention looping/skipping on free-running decode —
rtts/infer/decode.py::decode_greedy attn_window).

- a window covering the whole memory is bit-identical to no window
- a tight window runs in every KV mode, finite outputs, and survives the
  staged buffer growth
- validation: w_fwd < 1, unroll > 1 reject with actionable errors
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.infer.decode import decode_greedy
from rtts.models import reformer_tts as M
from tests.test_model_m1 import batch, tiny_cfg  # noqa: F401 (fixture)


def _memory(cfg, params, batch):  # noqa: F811
    tokens, tmask, _, _ = batch
    mem = M.encode(params, cfg, tokens, tmask, deterministic=True)
    return mem, tmask


def test_wide_window_is_identity(batch):  # noqa: F811
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    mem, tmask = _memory(cfg, params, batch)
    L = mem.shape[1]
    base = decode_greedy(params, cfg, mem, tmask, max_frames=32,
                         rng=jax.random.PRNGKey(3), staged=False)
    wide = decode_greedy(params, cfg, mem, tmask, max_frames=32,
                         rng=jax.random.PRNGKey(3), staged=False,
                         attn_window=(L, L))
    np.testing.assert_array_equal(np.asarray(base.mel_post),
                                  np.asarray(wide.mel_post))
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(wide.lengths))


@pytest.mark.parametrize("mode", ["kv_full", "kv_lsh", "kv_lsh_chunk"])
def test_tight_window_all_modes(batch, mode):  # noqa: F811
    from tests.test_model_m1 import tiny_cfg as _tc

    cfg = _tc()
    if mode != "kv_full":
        import dataclasses

        from rtts.config import AttentionConfig

        att = AttentionConfig(kind="lsh", num_heads=2, head_dim=16,
                              num_hashes=2, chunk_length=8)
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, attention=att))
    params = M.init(jax.random.PRNGKey(0), cfg)
    mem, tmask = _memory(cfg, params, batch)
    out = decode_greedy(params, cfg, mem, tmask, max_frames=32,
                        rng=jax.random.PRNGKey(3), mode=mode, staged=False,
                        attn_window=(1, 2))
    assert np.isfinite(np.asarray(out.mel_post)).all()
    assert (np.asarray(out.lengths) > 0).all()


def test_window_survives_staged_growth(batch):  # noqa: F811
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    mem, tmask = _memory(cfg, params, batch)
    fixed = decode_greedy(params, cfg, mem, tmask, max_frames=32,
                          rng=jax.random.PRNGKey(3), staged=False,
                          attn_window=(2, 3))
    staged = decode_greedy(params, cfg, mem, tmask, max_frames=32,
                           rng=jax.random.PRNGKey(3), staged=True,
                           stage_min=8, attn_window=(2, 3))
    # staged changes f32 softmax reduction sizes (refusion class) in the
    # SELF-attention path; the tracker itself must keep lengths identical
    np.testing.assert_allclose(np.asarray(fixed.mel_post),
                               np.asarray(staged.mel_post), atol=2e-2)


def test_window_validation(batch):  # noqa: F811
    cfg = tiny_cfg()
    params = M.init(jax.random.PRNGKey(0), cfg)
    mem, tmask = _memory(cfg, params, batch)
    with pytest.raises(ValueError, match="w_fwd"):
        decode_greedy(params, cfg, mem, tmask, max_frames=32,
                      attn_window=(1, 0))
    with pytest.raises(ValueError, match="unroll"):
        decode_greedy(params, cfg, mem, tmask, max_frames=32,
                      unroll=2, attn_window=(1, 2))


def test_streaming_accepts_window():
    from tests.test_streaming_synth import _setup
    from rtts.infer.streaming import StreamingSynthesizer

    cfg, params, _ = _setup()
    ss = StreamingSynthesizer(cfg, params, None, max_frames=32,
                              attn_window=(2, 3))
    chunks = list(ss.stream(["hello world"], chunk_frames=8))
    assert chunks and all(np.isfinite(c).all() for c in chunks)
    with pytest.raises(ValueError, match="w_fwd"):
        StreamingSynthesizer(cfg, params, None, max_frames=32,
                             attn_window=(2, 0))


def test_synthesizer_accepts_window(batch):  # noqa: F811
    from rtts.config import Config, DatasetConfig
    from rtts.infer.synthesize import Synthesizer

    cfg = Config(dataset=DatasetConfig(), model=tiny_cfg())
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    synth = Synthesizer(cfg, params, max_frames=32, staged=False,
                        attn_window=(2, 3))
    mels, lengths = synth.text_to_mel(["hi there", "ok"])
    assert np.isfinite(mels).all() and (lengths > 0).all()
