"""End-to-end streaming synthesis: chunked decode+postnet+vocoder must
reproduce the non-streaming pipeline on the emitted region (BASELINE
config 3 fully realized)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config, from_dict, to_dict
from rtts.infer.decode import decode_greedy
from rtts.infer.streaming import StreamingSynthesizer
from rtts.models import reformer_tts as M
from rtts.models import squeezewave as SW
from rtts.models.reformer_tts import postnet_apply

from tests.test_model_m1 import tiny_cfg
from tests.test_squeezewave import small_cfg as voc_small_cfg


def _setup(max_frames=32):
    model_cfg = dataclasses.replace(tiny_cfg(d=32), n_mels=16)
    voc_cfg = dataclasses.replace(voc_small_cfg(), n_mels=16, n_group=32,
                                  hop_length=64)
    cfg = from_dict(Config, {
        "model": to_dict(model_cfg),
        "vocoder": to_dict(voc_cfg),
        "dataset": {"audio": {"n_mels": 16}},
    })
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    voc_params = SW.fold_weightnorm(SW.init(jax.random.PRNGKey(1),
                                            cfg.vocoder))
    return cfg, params, voc_params


def test_streamed_mel_matches_full_pipeline():
    cfg, params, _ = _setup()
    ss = StreamingSynthesizer(cfg, params, None, max_frames=32)
    chunks = list(ss.stream(["hello world"], chunk_frames=8))
    streamed = np.concatenate(chunks, axis=1)

    # reference: full decode + postnet over the whole buffer (unmasked)
    from rtts.text import encode_batch

    tokens, tmask = encode_batch(["hello world"],
                                 cleaner=cfg.dataset.text.cleaner,
                                 pad_to_multiple=cfg.dataset.text.pad_to_multiple)
    memory = M.encode(params, cfg.model, jnp.asarray(tokens),
                      jnp.asarray(tmask))
    # rebuild the raw mel by running the same state machine via decode_greedy
    # internals: use stop_threshold identical (cfg default)
    from rtts.infer.decode import (_init_mem_kv, _init_state, _make_step_fn,
                                   _dtype, DecodeState)

    cdt = _dtype(cfg.model.compute_dtype)
    mem_k, mem_v = _init_mem_kv(params, cfg.model, memory.astype(cdt), cdt)
    rng = jax.random.PRNGKey(0)
    step = _make_step_fn(params, cfg.model, mem_k, mem_v, jnp.asarray(tmask),
                         rng, cfg.model.stop_threshold)
    state = _init_state(params, cfg.model, 1, 32)
    state = jax.lax.while_loop(
        lambda s: (s.t < 32) & ~jnp.all(s.done), step, state)
    post = postnet_apply(params["postnet"], cfg.model,
                         state.mel.astype(cdt), None, True, cdt)
    full = np.asarray(state.mel + post.astype(jnp.float32))

    n = streamed.shape[1]
    np.testing.assert_allclose(streamed, full[:, :n], atol=1e-4, rtol=1e-3)


def test_streamed_audio_matches_full_vocoder():
    cfg, params, voc_params = _setup()
    ss = StreamingSynthesizer(cfg, params, voc_params, max_frames=32)
    chunks = list(ss.stream(["hi there"], chunk_frames=8, seed=3))
    audio_streamed = np.concatenate(chunks, axis=1)
    n_frames = audio_streamed.shape[1] // cfg.vocoder.hop_length

    # reference: identical mel (mel-only stream) then single-pass vocoder
    # with the SAME global z (reconstruct it the way stream() draws it)
    ss2 = StreamingSynthesizer(cfg, params, None, max_frames=32)
    mel = np.concatenate(list(ss2.stream(["hi there"], chunk_frames=8)),
                         axis=1)[:, :n_frames]
    rng = jax.random.PRNGKey(3)
    sq_per_frame = cfg.vocoder.hop_length // cfg.vocoder.n_group
    z_full = jax.random.normal(jax.random.fold_in(rng, 77),
                               (1, 32 * sq_per_frame, cfg.vocoder.n_group)
                               ) * cfg.vocoder.sigma
    from rtts.models.squeezewave import _infer_chunk

    audio_full = np.asarray(_infer_chunk(
        voc_params, jnp.asarray(mel), z_full[:, :n_frames * sq_per_frame],
        cfg=cfg.vocoder))
    np.testing.assert_allclose(audio_streamed, audio_full,
                               atol=1e-3, rtol=1e-2)


def test_stream_chunk_shapes():
    cfg, params, voc_params = _setup()
    ss = StreamingSynthesizer(cfg, params, voc_params, max_frames=32)
    sizes = [c.shape[1] for c in ss.stream(["test"], chunk_frames=8)]
    assert sum(sizes) % cfg.vocoder.hop_length == 0
    assert all(s > 0 for s in sizes)
    assert hasattr(ss, "last_lengths")


def test_streamed_mel_kv_local_mode_matches_batch():
    """Streaming with mode='kv_local' on a local-attention decoder routes
    through the windowed ring cache and must reproduce batch decode_greedy
    (kv_local) on the emitted region at f32."""
    from tests.test_kv_local import local_cfg

    model_cfg = local_cfg()
    cfg = from_dict(Config, {
        "model": to_dict(model_cfg),
        "dataset": {"audio": {"n_mels": model_cfg.n_mels}},
    })
    params = M.init(jax.random.PRNGKey(0), model_cfg)
    texts = ["hello world"]
    ss = StreamingSynthesizer(cfg, params, None, max_frames=32,
                              mode="kv_local")
    smel = np.concatenate(list(ss.stream(texts, chunk_frames=8)), axis=1)

    from rtts.text import encode_batch

    tokens, tmask = encode_batch(
        texts, pad_to_multiple=cfg.dataset.text.pad_to_multiple)
    memory = M.encode(params, model_cfg, jnp.asarray(tokens),
                      jnp.asarray(tmask), deterministic=True)
    bmel, blen, _ = decode_greedy(params, model_cfg, memory,
                                  jnp.asarray(tmask), max_frames=32,
                                  mode="kv_local")
    T = min(smel.shape[1], int(blen[0]))
    np.testing.assert_allclose(smel[0, :T], np.asarray(bmel)[0, :T],
                               atol=1e-5, rtol=1e-5)


def test_streamed_mel_lsh_chunk_mode_matches_batch():
    """Streaming with mode='kv_lsh_chunk' on an LSH decoder routes through
    the O(chunk) ring cache and must reproduce batch decode_greedy
    (kv_lsh_chunk) on the emitted region at f32."""
    from tests.test_model_lsh import lsh_cfg

    model_cfg = lsh_cfg(reversible=False)
    cfg = from_dict(Config, {
        "model": to_dict(model_cfg),
        "dataset": {"audio": {"n_mels": model_cfg.n_mels}},
    })
    params = M.init(jax.random.PRNGKey(0), model_cfg)
    texts = ["hello world"]
    ss = StreamingSynthesizer(cfg, params, None, max_frames=32,
                              mode="kv_lsh_chunk")
    smel = np.concatenate(list(ss.stream(texts, chunk_frames=8)), axis=1)

    from rtts.text import encode_batch

    tokens, tmask = encode_batch(
        texts, pad_to_multiple=cfg.dataset.text.pad_to_multiple)
    memory = M.encode(params, model_cfg, jnp.asarray(tokens),
                      jnp.asarray(tmask), deterministic=True)
    bmel, blen, _ = decode_greedy(params, model_cfg, memory,
                                  jnp.asarray(tmask), max_frames=32,
                                  mode="kv_lsh_chunk")
    T = min(smel.shape[1], int(blen[0]))
    np.testing.assert_allclose(smel[0, :T], np.asarray(bmel)[0, :T],
                               atol=1e-5, rtol=1e-5)
