"""Attention-probs dropout (SURVEY.md §3.2 config row, the reference
lineage's LSHAttention/ReformerAttention dropout).

Contract under test:
- rate 0 / deterministic: bit-identical to the pre-dropout code path.
- active dropout changes outputs and is rng-keyed (different keys differ).
- the reversible backward replays the SAME mask (aux-rng derivation), so
  reversible and plain autograd agree at p > 0 — the hard requirement that
  made the knob worth wiring (VERDICT r2 item 3).
- the seq-parallel LSH path rejects the knob explicitly (no silent no-op).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.attention.full import shared_qk_self_attention
from rtts.attention.local import local_self_attention
from rtts.attention.lsh import lsh_self_attention
from rtts.config import AttentionConfig, ReformerStackConfig, ReformerTTSConfig
from rtts.models import reformer_tts as M
from rtts.text import vocab_size
from rtts.train.losses import make_stop_target, tts_loss


def _attn_cfg(kind="lsh", p=0.5):
    return AttentionConfig(kind=kind, num_heads=2, head_dim=16, num_hashes=2,
                           chunk_length=16, num_chunks_before=1,
                           attention_dropout=p)


def _params_x(l=64, d=32, heads=2, head_dim=16, shared_qk=True):
    from rtts.attention.full import attention_init

    k = jax.random.PRNGKey(0)
    params = attention_init(k, d, heads, head_dim, shared_qk=shared_qk)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, l, d))
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 10])[:, None]
    return params, x, mask


def test_full_fallback_dropout_zero_is_identity():
    params, x, mask = _params_x()
    base = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                    num_heads=2)
    # rate set but no key (deterministic) -> identity
    same = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                    num_heads=2, dropout_rate=0.5,
                                    dropout_rng=None)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    # key given but rate 0 -> identity
    same2 = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                     num_heads=2, dropout_rate=0.0,
                                     dropout_rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same2))


def test_full_fallback_dropout_active_and_keyed():
    params, x, mask = _params_x()
    base = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                    num_heads=2)
    d1 = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                  num_heads=2, dropout_rate=0.5,
                                  dropout_rng=jax.random.PRNGKey(3))
    d2 = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                  num_heads=2, dropout_rate=0.5,
                                  dropout_rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(base), np.asarray(d1))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    # same key reproduces the same mask (the replay property)
    d1b = shared_qk_self_attention(params, x, mask=mask, causal=True,
                                   num_heads=2, dropout_rate=0.5,
                                   dropout_rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))


def test_lsh_dropout_deterministic_default_unchanged():
    params, x, mask = _params_x()
    cfg0 = _attn_cfg(p=0.0)
    cfgp = _attn_cfg(p=0.5)
    out0, _ = lsh_self_attention(params, x, mask, False, cfg0,
                                 jax.random.PRNGKey(2))
    # deterministic=True (default): the knob must not change anything
    outp, _ = lsh_self_attention(params, x, mask, False, cfgp,
                                 jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(outp))


def test_lsh_dropout_active_changes_output():
    params, x, mask = _params_x()
    cfgp = _attn_cfg(p=0.5)
    out_det, _ = lsh_self_attention(params, x, mask, False, cfgp,
                                    jax.random.PRNGKey(2))
    out_drop, _ = lsh_self_attention(params, x, mask, False, cfgp,
                                     jax.random.PRNGKey(2),
                                     deterministic=False)
    assert not np.allclose(np.asarray(out_det), np.asarray(out_drop))
    # replay: same rng -> same output
    out_drop2, _ = lsh_self_attention(params, x, mask, False, cfgp,
                                      jax.random.PRNGKey(2),
                                      deterministic=False)
    np.testing.assert_array_equal(np.asarray(out_drop), np.asarray(out_drop2))


def test_lsh_dropout_independent_of_hash_seed():
    """Fixed hash_seed keeps hashing deterministic but dropout still varies
    with the caller rng (the dropout key derives from the caller's rng)."""
    params, x, mask = _params_x()
    cfg = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1,
                          attention_dropout=0.5, hash_seed=11)
    a, _ = lsh_self_attention(params, x, mask, False, cfg,
                              jax.random.PRNGKey(2), deterministic=False)
    b, _ = lsh_self_attention(params, x, mask, False, cfg,
                              jax.random.PRNGKey(3), deterministic=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_local_dropout_active():
    params, x, mask = _params_x()
    cfg = _attn_cfg(kind="local", p=0.5)
    det = local_self_attention(params, x, mask, True, cfg)
    drop = local_self_attention(params, x, mask, True, cfg,
                                rng=jax.random.PRNGKey(2),
                                deterministic=False)
    assert not np.allclose(np.asarray(det), np.asarray(drop))


# ---------------------------------------------------------------------------
# model-level: reversible replay at p > 0
# ---------------------------------------------------------------------------


def _model_cfg(reversible, attn_dropout=0.3):
    att = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1,
                          attention_dropout=attn_dropout)
    stack = dict(d_model=32, d_ff=64, dropout=0.0, reversible=reversible,
                 ffn_chunk_size=16, attention=att)
    return ReformerTTSConfig(
        vocab_size=vocab_size(), d_model=32, n_mels=20,
        encoder=ReformerStackConfig(num_layers=2, causal=False, **stack),
        decoder=ReformerStackConfig(num_layers=2, causal=True, **stack),
        dec_prenet_hidden=16, dec_prenet_dropout=0.0,
        postnet_channels=16, max_pos=256, compute_dtype="float32",
    )


def _batch():
    key = jax.random.PRNGKey(9)
    B, L, T = 2, 64, 64
    tokens = jax.random.randint(key, (B, L), 3, vocab_size())
    tmask = jnp.arange(L)[None, :] < jnp.asarray([L, L - 12])[:, None]
    mel = jax.random.normal(key, (B, T, 20)) * 0.5
    mmask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 8])[:, None]
    return tokens, tmask, mel, mmask


def _loss_fn(cfg, batch):
    tokens, tmask, mel, mmask = batch

    def fn(p):
        pre, post, stop = M.forward(p, cfg, tokens, tmask, mel, mmask,
                                    rng=jax.random.PRNGKey(21),
                                    deterministic=False)
        return tts_loss(pre, post, stop, mel, make_stop_target(mmask), mmask)[0]

    return fn


def test_reversible_grads_match_plain_with_attention_dropout():
    """The reversible backward reruns f/g with the same aux rngs; the
    dropout masks must replay exactly or gradients diverge."""
    batch = _batch()
    params = M.init(jax.random.PRNGKey(0), _model_cfg(True))
    lr, gr = jax.value_and_grad(_loss_fn(_model_cfg(True), batch))(params)
    lp, gp = jax.value_and_grad(_loss_fn(_model_cfg(False), batch))(params)
    np.testing.assert_allclose(float(lr), float(lp), rtol=1e-5)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    fp, _ = jax.flatten_util.ravel_pytree(gp)
    assert np.isfinite(np.asarray(fr)).all()
    scale = float(jnp.max(jnp.abs(fp))) + 1e-8
    np.testing.assert_allclose(np.asarray(fr), np.asarray(fp),
                               atol=5e-4 * scale, rtol=2e-3)


def test_model_dropout_changes_loss():
    batch = _batch()
    cfg_p = _model_cfg(False, attn_dropout=0.5)
    cfg_0 = _model_cfg(False, attn_dropout=0.0)
    params = M.init(jax.random.PRNGKey(0), cfg_p)
    lp = float(_loss_fn(cfg_p, batch)(params))
    l0 = float(_loss_fn(cfg_0, batch)(params))
    assert lp != l0


def test_positional_dropout_statistics_and_scaling():
    """The counter-hash keep mask drops ~rate of entries and the survivors
    scale by 1/keep — mean is preserved in expectation."""
    from rtts.attention.lsh import dropout_lane, positional_dropout

    rate = 0.3
    b, h, nc, c, w = 2, 2, 4, 32, 64
    probs = jnp.ones((b, h, nc, c, w))
    q_pos = jnp.arange(nc * c).reshape(1, 1, nc, c) * jnp.ones(
        (b, h, 1, 1), jnp.int32)
    k_pos = jnp.arange(nc * w).reshape(1, 1, nc, w) * jnp.ones(
        (b, h, 1, 1), jnp.int32)
    lane = dropout_lane(b, h, jnp.arange(nc), nc)
    out = np.asarray(positional_dropout(
        probs, q_pos, k_pos, lane, jnp.uint32(1234), rate))
    vals = np.unique(out)
    assert all(v == 0.0 or abs(v - 1.0 / (1.0 - rate)) < 1e-5 for v in vals)
    drop_frac = (out == 0).mean()
    assert abs(drop_frac - rate) < 0.02
    assert abs(out.mean() - 1.0) < 0.05


def test_lsh_dropout_with_explicit_attend_fn_forces_jnp_stage():
    """An explicitly passed attend_fn (e.g. the Pallas kernel, which has no
    dropout kwargs) must not get dropout kwargs partial-bound onto it —
    active dropout forces the jnp attend stage instead of TypeError-ing."""
    from rtts.attention.lsh import lsh_attention_core

    cfg = _attn_cfg(p=0.5)
    l, d = 64, 32
    qk = jax.random.normal(jax.random.PRNGKey(0), (1, 2, l, 16))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, l, 16))

    def kernel_without_dropout_kwargs(q, k, vv, q_pos, k_valid, causal,
                                      before, after, mv, smv):
        raise AssertionError("must not be called when dropout is active")

    out, _ = lsh_attention_core(
        qk, v, cfg, None, True, jax.random.PRNGKey(2),
        attend_fn=kernel_without_dropout_kwargs,
        dropout_rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out)).all()


def test_lsh_rng_none_skips_dropout():
    """rng=None + deterministic=False must SKIP dropout (as local.py does),
    not apply a constant PRNGKey(0)-derived mask every call."""
    from rtts.attention.full import attention_init

    cfg = _attn_cfg(p=0.5)
    params = attention_init(jax.random.PRNGKey(0), 32, 2, 16, shared_qk=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    out_det, _ = lsh_self_attention(params, x, None, True, cfg,
                                    rng=None, deterministic=True)
    out_nd, _ = lsh_self_attention(params, x, None, True, cfg,
                                   rng=None, deterministic=False)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_nd))


def test_sort_key_overflow_raises():
    """Factorized bucket counts big enough to wrap the int32 sort key must
    raise at trace time, not silently attend across unrelated buckets."""
    from rtts.attention.lsh import lsh_attention_core
    from rtts.config import AttentionConfig

    cfg = AttentionConfig(kind="lsh", num_heads=1, head_dim=8, num_hashes=1,
                          chunk_length=16, num_buckets=[65536, 65536])
    qk = jnp.zeros((1, 1, 1024, 8))
    v = jnp.zeros((1, 1, 1024, 8))
    with pytest.raises(ValueError, match="overflow"):
        lsh_attention_core(qk, v, cfg, None, True, jax.random.PRNGKey(0))
