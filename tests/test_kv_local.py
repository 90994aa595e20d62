"""kv_local windowed serving for local-attention decoders (VERDICT r4 #4).

The training-side local (sliding-chunk) attention lets position t attend
chunks [t//c - before .. t//c] causally (rtts/attention/local.py).
kv_local serves that EXACT window from a fixed ring of W = c*(1+before)
keys — unlike kv_full, which exposes the whole prefix (a superset the
model never saw in training).  Tests pin:

- teacher-forced kv_local == decode_train on a local decoder (ring wraps
  3x at these shapes, so the wrap path is exercised)
- the kv_full superset genuinely DIFFERS on the same decoder (the window
  matters — without this the parity test would pass vacuously)
- mixed attn_layers (local + full) route per-layer
- mode="auto" resolves local decoders to kv_local
- greedy decode runs under jit with finite output
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.config import AttentionConfig, ReformerStackConfig, ReformerTTSConfig
from rtts.infer.decode import _auto_mode, decode_greedy, decode_teacher_check
from rtts.models import reformer_tts as M
from rtts.text import vocab_size

CHUNK, BEFORE = 4, 1   # W = 8 slots; T=24 groups wraps the ring 3x


def local_cfg(attn_layers=None, dec_kind="local", d=32):
    enc_att = AttentionConfig(kind="full", num_heads=2, head_dim=d // 2)
    dec_att = AttentionConfig(kind=dec_kind, num_heads=2, head_dim=d // 2,
                              chunk_length=CHUNK, num_chunks_before=BEFORE)
    stack = dict(d_model=d, d_ff=2 * d, dropout=0.0, reversible=False)
    return ReformerTTSConfig(
        vocab_size=vocab_size(), d_model=d, n_mels=20,
        encoder=ReformerStackConfig(num_layers=2, causal=False,
                                    attention=enc_att, **stack),
        decoder=ReformerStackConfig(num_layers=2, causal=True,
                                    attention=dec_att,
                                    attn_layers=attn_layers, **stack),
        dec_prenet_hidden=16, dec_prenet_dropout=0.0,
        postnet_channels=16, max_pos=256, compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(3)
    B, L, T = 2, 16, 24
    tokens = jax.random.randint(key, (B, L), 3, vocab_size())
    tmask = jnp.arange(L)[None, :] < jnp.asarray([L, L - 4])[:, None]
    mel = jax.random.normal(key, (B, T, 20)) * 0.5
    return tokens, tmask, mel


def _teacher_pair(cfg, batch, mode):
    tokens, tmask, mel = batch
    params = M.init(jax.random.PRNGKey(1), cfg)
    memory = M.encode(params, cfg, tokens, tmask)
    full_mask = jnp.ones(mel.shape[:2], bool)
    teacher_in = M.shift_mel(mel)
    pre_ref, _, stop_ref = M.decode_train(params, cfg, teacher_in, full_mask,
                                          memory, tmask)
    pre_inc, stop_inc = decode_teacher_check(params, cfg, memory, tmask,
                                             teacher_in, mode=mode)
    return pre_ref, stop_ref, pre_inc, stop_inc


def test_kv_local_matches_teacher_forced(batch):
    cfg = local_cfg()
    pre_ref, stop_ref, pre_inc, stop_inc = _teacher_pair(cfg, batch,
                                                         "kv_local")
    np.testing.assert_allclose(np.asarray(pre_inc), np.asarray(pre_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop_inc), np.asarray(stop_ref),
                               atol=2e-4, rtol=1e-3)


def test_kv_full_superset_differs_on_local_decoder(batch):
    cfg = local_cfg()
    pre_ref, _, pre_full, _ = _teacher_pair(cfg, batch, "kv_full")
    # positions past the first window see extra (pre-window) keys under
    # kv_full — if this ever matched, the kv_local parity test above
    # would be vacuous
    diff = float(np.abs(np.asarray(pre_full) - np.asarray(pre_ref)).max())
    assert diff > 1e-3, f"kv_full unexpectedly matches local training ({diff})"


def test_kv_local_mixed_attn_layers(batch):
    cfg = local_cfg(attn_layers=["local", "full"])
    pre_ref, stop_ref, pre_inc, stop_inc = _teacher_pair(cfg, batch,
                                                         "kv_local")
    np.testing.assert_allclose(np.asarray(pre_inc), np.asarray(pre_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop_inc), np.asarray(stop_ref),
                               atol=2e-4, rtol=1e-3)


def test_auto_mode_resolves_local():
    assert _auto_mode(local_cfg(), max_frames=64) == "kv_local"
    assert _auto_mode(local_cfg(attn_layers=["local", "full"]),
                      max_frames=64) == "kv_local"
    # mixed lsh+local routes to kv_local too (r5 decision: fidelity
    # drift is checkpoint noise in both modes, kv_local is faster —
    # PARITY.md "local serving", BENCH.md r5)
    assert _auto_mode(local_cfg(attn_layers=["local", "lsh"]),
                      max_frames=64) == "kv_local"


def test_greedy_kv_local_jits_and_stops(batch):
    tokens, tmask, _ = batch
    cfg = local_cfg()
    params = M.init(jax.random.PRNGKey(2), cfg)

    @jax.jit
    def run(p, tok, msk):
        memory = M.encode(p, cfg, tok, msk)
        return decode_greedy(p, cfg, memory, msk, max_frames=32,
                             mode="kv_local")

    mel, lengths, _ = run(params, tokens, tmask)
    assert mel.shape == (2, 32, 20)
    assert (lengths >= 1).all() and (lengths <= 32).all()
    assert np.isfinite(np.asarray(mel)).all()


def test_kv_local_requires_a_local_layer(batch):
    tokens, tmask, _ = batch
    cfg = local_cfg(dec_kind="full")
    params = M.init(jax.random.PRNGKey(2), cfg)
    memory = M.encode(params, cfg, tokens, tmask)
    with pytest.raises(ValueError, match="kv_local"):
        decode_greedy(params, cfg, memory, tmask, max_frames=32,
                      mode="kv_local")
