"""Sharded serving (SURVEY.md §3.4 on the inference surface): the AR
decode loop jitted over a (data, model) mesh — TP param sharding + DP
request sharding — must match the single-device decode.

The KV caches live in the while_loop carry; XLA propagates the head-axis
sharding from the projections into them, so these tests also pin that no
resharding-induced numerical drift appears across decode steps."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.config import MeshConfig
from rtts.infer.decode import decode_greedy
from rtts.models import reformer_tts as M
from rtts.parallel.mesh import make_mesh
from rtts.parallel.serving import (data_parallel_size, replicate_for_serving,
                                   shard_for_serving, shard_request_batch)
from rtts.text import vocab_size

from tests.test_model_lsh import lsh_cfg


def _mesh():
    return make_mesh(MeshConfig(data_parallel=2, model_parallel=2),
                     jax.devices()[:4])


def _setup():
    cfg = lsh_cfg(reversible=False)  # heads=2 -> divisible by model=2
    params = M.init(jax.random.PRNGKey(0), cfg)
    B, L = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, L), 3,
                                vocab_size())
    tmask = jnp.ones((B, L), bool)
    memory = M.encode(params, cfg, tokens, tmask)
    return cfg, params, memory, tmask


@pytest.mark.parametrize("mode", ["kv_full", "kv_lsh_chunk"])
def test_tp_decode_matches_single_device(mode):
    cfg, params, memory, tmask = _setup()
    run = functools.partial(decode_greedy, cfg=cfg, max_frames=32,
                            rng=jax.random.PRNGKey(7), mode=mode)
    ref = run(params, memory=memory, memory_mask=tmask)

    mesh = _mesh()
    p_s = shard_for_serving(params, mesh, tensor_parallel=True)
    mem_s, tm_s = shard_request_batch((memory, tmask), mesh)
    out = jax.jit(lambda p, m, t: run(p, memory=m, memory_mask=t))(
        p_s, mem_s, tm_s)

    np.testing.assert_allclose(np.asarray(out.mel_post), np.asarray(ref.mel_post),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(out.stop_logits),
                               np.asarray(ref.stop_logits),
                               atol=1e-4, rtol=1e-4)


def test_synthesizer_mesh_matches_and_pads_batch():
    """Synthesizer(mesh=...) == meshless Synthesizer, including the
    pad-to-data-parallel path (3 texts over dp=2)."""
    from rtts.config import apply_overrides, from_dict, Config
    from rtts.infer.synthesize import Synthesizer

    data = apply_overrides({}, [
        "model.d_model=32", "model.n_mels=20",
        f"model.vocab_size={vocab_size()}",
        "model.encoder.num_layers=1", "model.encoder.d_model=32",
        "model.encoder.d_ff=64", "model.encoder.attention.num_heads=2",
        "model.encoder.attention.head_dim=16",
        "model.decoder.num_layers=1", "model.decoder.d_model=32",
        "model.decoder.d_ff=64", "model.decoder.attention.num_heads=2",
        "model.decoder.attention.head_dim=16",
        "model.decoder.causal=true", "model.compute_dtype=float32",
        "dataset.audio.n_mels=20",
    ])
    cfg = from_dict(Config, data)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    texts = ["hello world", "a second line", "third"]

    ref_mel, ref_len = Synthesizer(cfg, params, max_frames=32).text_to_mel(
        texts)
    mesh = _mesh()
    assert data_parallel_size(mesh) == 2
    syn = Synthesizer(cfg, params, max_frames=32, mesh=mesh)
    mel, lengths = syn.text_to_mel(texts)

    assert mel.shape == ref_mel.shape  # padding row trimmed
    np.testing.assert_array_equal(lengths, ref_len)
    np.testing.assert_allclose(mel, ref_mel, atol=1e-4, rtol=1e-4)


def test_shard_request_batch_rejects_indivisible():
    mesh = _mesh()
    with pytest.raises(ValueError, match="not divisible"):
        shard_request_batch(jnp.zeros((3, 8)), mesh)


def test_replicate_for_serving_places_on_all_devices():
    mesh = _mesh()
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate_for_serving(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_serve_batch_tp_matches_single_device():
    """The fused continuous-batching scheduler (whole request queue in one
    while_loop) runs with TP-sharded params: admission arithmetic and
    output scatters replicate, the matmuls shard — outputs match."""
    from rtts.infer.serving import serve_batch

    cfg = lsh_cfg(reversible=False)
    params = M.init(jax.random.PRNGKey(0), cfg)
    N, L = 6, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (N, L), 3,
                                vocab_size())
    tmask = jnp.ones((N, L), bool)
    budgets = jnp.array([32, 16, 32, 16, 32, 16], jnp.int32)
    run = functools.partial(serve_batch, cfg=cfg, capacity_frames=32,
                            slots=2, segment_frames=16,
                            rng=jax.random.PRNGKey(3))
    ref_mel, ref_len = run(params, tokens=tokens, token_mask=tmask,
                           budgets=budgets)

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=2),
                     jax.devices()[:2])
    p_s = shard_for_serving(params, mesh, tensor_parallel=True)
    out_mel, out_len = jax.jit(
        lambda p: run(p, tokens=tokens, token_mask=tmask, budgets=budgets))(
            p_s)
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))
    np.testing.assert_allclose(np.asarray(out_mel), np.asarray(ref_mel),
                               atol=1e-4, rtol=1e-4)
