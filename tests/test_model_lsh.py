"""Model-level LSH integration: the full-thesis-config mechanisms together —
LSH attention + reversible residuals + chunked FFN (BASELINE configs 1-2,
tiny shapes)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from rtts.config import AttentionConfig, ReformerStackConfig, ReformerTTSConfig
from rtts.models import reformer_tts as M
from rtts.train.losses import make_stop_target, tts_loss
from rtts.text import vocab_size


def lsh_cfg(reversible=True, ffn_chunk=16):
    att = AttentionConfig(kind="lsh", num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1)
    stack = dict(d_model=32, d_ff=64, dropout=0.0, reversible=reversible,
                 ffn_chunk_size=ffn_chunk, attention=att)
    return ReformerTTSConfig(
        vocab_size=vocab_size(), d_model=32, n_mels=20,
        encoder=ReformerStackConfig(num_layers=2, causal=False, **stack),
        decoder=ReformerStackConfig(num_layers=2, causal=True, **stack),
        dec_prenet_hidden=16, dec_prenet_dropout=0.0,
        postnet_channels=16, max_pos=256, compute_dtype="float32",
    )


def _batch():
    key = jax.random.PRNGKey(9)
    B, L, T = 2, 64, 64  # long enough to engage real LSH chunking
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


def test_lsh_model_forward_backward_finite():
    cfg = lsh_cfg(reversible=True)
    params = M.init(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    loss, grads = jax.jit(jax.value_and_grad(_loss_fn(cfg, batch)))(params)
    assert np.isfinite(float(loss))
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).sum()) > 0


def test_lsh_reversible_grads_match_plain():
    """Reversible backward (with bucket-cache reuse) == standard autograd."""
    batch = _batch()
    params = M.init(jax.random.PRNGKey(0), lsh_cfg(True))
    lr, gr = jax.value_and_grad(_loss_fn(lsh_cfg(True), batch))(params)
    lp, gp = jax.value_and_grad(_loss_fn(lsh_cfg(False), batch))(params)
    np.testing.assert_allclose(float(lr), float(lp), rtol=1e-5)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    fp, _ = jax.flatten_util.ravel_pytree(gp)
    scale = float(jnp.max(jnp.abs(fp))) + 1e-8
    np.testing.assert_allclose(np.asarray(fr), np.asarray(fp),
                               atol=5e-4 * scale, rtol=2e-3)


def test_ffn_chunking_is_invisible():
    """ffn_chunk_size changes memory shape, not math."""
    batch = _batch()
    params = M.init(jax.random.PRNGKey(0), lsh_cfg(False, ffn_chunk=16))
    l1 = _loss_fn(lsh_cfg(False, ffn_chunk=16), batch)(params)
    l2 = _loss_fn(lsh_cfg(False, ffn_chunk=0), batch)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
