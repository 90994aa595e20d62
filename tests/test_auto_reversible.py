"""Shape-aware reversibility resolution (``reversible: "auto"``).

Both residual schemes run the identical two-stream forward
(rtts/reversible/rev.py) — "auto" only decides whether the backward
reconstructs activations (reversible, O(1) memory in depth) or stores
them (plain, no sublayer recompute).  The rule follows the measured
tradeoff (BENCH.md "reversible vs plain"): plain while the estimated
plain-path transient HBM fits ``auto_plain_budget_mb``, reversible
above — same doctrine as ``kind: "auto"``.
"""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from rtts.config import (
    AttentionConfig,
    ReformerStackConfig,
    _plain_transient_mb,
    from_dict,
    resolve_reversible,
)
from rtts.models.stack import stack_apply, stack_init


def _cfg(reversible, budget_mb=4096, kind="full"):
    att = AttentionConfig(kind=kind, num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1, hash_seed=3)
    return ReformerStackConfig(num_layers=2, d_model=32, d_ff=64,
                               dropout=0.0, reversible=reversible,
                               auto_plain_budget_mb=budget_mb, causal=True,
                               attention=att)


def test_resolve_rule():
    cfg = _cfg("auto")
    # bool passes through untouched regardless of shapes
    assert resolve_reversible(_cfg(True), 1024, 8192) is True
    assert resolve_reversible(_cfg(False), 1024, 8192) is False
    # tiny shapes fit any sane budget -> plain
    assert resolve_reversible(cfg, 2, 64) is False
    # huge shapes blow the budget -> reversible
    assert resolve_reversible(cfg, 256, 8192) is True
    # the budget knob moves the boundary
    assert resolve_reversible(_cfg("auto", budget_mb=0), 2, 64) is True


def test_resolve_rejects_unknown_string():
    cfg = _cfg("sometimes")
    try:
        resolve_reversible(cfg, 2, 64)
    except ValueError as e:
        assert "auto" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown reversible")


def test_estimate_scales_with_shapes_and_kind():
    cfg_full = _cfg("auto", kind="full")
    cfg_lsh = _cfg("auto", kind="lsh")
    # full attention's estimate is quadratic in L, LSH's ~linear
    full_1k = _plain_transient_mb(cfg_full, 8, 1024)
    full_2k = _plain_transient_mb(cfg_full, 8, 2048)
    lsh_1k = _plain_transient_mb(cfg_lsh, 8, 1024)
    lsh_2k = _plain_transient_mb(cfg_lsh, 8, 2048)
    assert full_2k > 2.5 * full_1k
    assert lsh_2k < 2.5 * lsh_1k
    # cross-attention adds a positive term
    assert _plain_transient_mb(cfg_full, 8, 1024, 256) > full_1k
    # batch scales linearly
    assert abs(_plain_transient_mb(cfg_full, 16, 1024) - 2 * full_1k) < 1e-6


def test_estimate_is_flash_aware():
    """With the flash kernel owning the full path the L^2 probs never
    materialize — plain residuals store only O(L*d) custom_vjp residuals,
    so the estimate must drop from quadratic to ~linear (else reversible
    "auto" recomputes sublayers to save memory that was never spent)."""
    naive = _cfg("auto", kind="full")
    flash = dataclasses.replace(
        naive, attention=dataclasses.replace(naive.attention, flash=True))
    n_2k, f_2k = (_plain_transient_mb(c, 8, 2048) for c in (naive, flash))
    assert f_2k < n_2k / 8
    # ~linear in L under flash
    assert _plain_transient_mb(flash, 8, 4096) < 2.5 * f_2k
    # cross-attention term shrinks too
    assert (_plain_transient_mb(flash, 8, 2048, 2048)
            < _plain_transient_mb(naive, 8, 2048, 2048) / 8)
    # attention-probs dropout runs IN-KERNEL (counter-hash mask, zero
    # stored bytes) — it no longer forces the naive path, so the flash
    # estimate must be unchanged by the knob
    dropped = dataclasses.replace(
        flash, attention=dataclasses.replace(flash.attention,
                                             attention_dropout=0.1))
    assert _plain_transient_mb(dropped, 8, 2048) == f_2k


def test_auto_forward_is_bit_identical_to_reversible():
    """Plain and reversible run the same op sequence forward — resolution
    must not change outputs, only the backward's memory scheme."""
    cfg_auto = _cfg("auto")               # small shape -> resolves plain
    cfg_rev = _cfg(True)
    params = stack_init(jax.random.PRNGKey(0), cfg_auto, cross_attend=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32))
    mask = jnp.ones((2, 48), bool)
    y_auto = stack_apply(params, cfg_auto, x, mask, rng=jax.random.PRNGKey(2))
    y_rev = stack_apply(params, cfg_rev, x, mask, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_rev))


def test_auto_grads_close_to_reversible():
    cfg_auto = _cfg("auto")
    cfg_rev = _cfg(True)
    params = stack_init(jax.random.PRNGKey(0), cfg_auto, cross_attend=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32))
    mask = jnp.ones((2, 48), bool)

    def loss(p, cfg):
        return jnp.sum(stack_apply(p, cfg, x, mask,
                                   rng=jax.random.PRNGKey(2)) ** 2)

    g_auto = jax.grad(loss)(params, cfg_auto)
    g_rev = jax.grad(loss)(params, cfg_rev)
    fa, _ = jax.flatten_util.ravel_pytree(g_auto)
    fr, _ = jax.flatten_util.ravel_pytree(g_rev)
    assert np.isfinite(np.asarray(fa)).all()
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fr),
                               rtol=1e-4, atol=1e-5)


def test_yaml_accepts_auto_and_bool():
    c = from_dict(ReformerStackConfig, {"reversible": "auto"})
    assert c.reversible == "auto"
    c = from_dict(ReformerStackConfig, {"reversible": False})
    assert c.reversible is False
    # dot-path overrides parse both spellings
    from rtts.config import apply_overrides
    d = apply_overrides({}, ["encoder.reversible=auto"])
    assert d["encoder"]["reversible"] == "auto"
    d = apply_overrides({}, ["encoder.reversible=false"])
    assert d["encoder"]["reversible"] is False


# -- ffn_chunk_size="auto" (coupled to the reversible resolution) ----------


def test_resolve_ffn_chunk_rule():
    import pytest

    from rtts.config import AUTO_FFN_CHUNK, resolve_ffn_chunk

    # ints pass through
    assert resolve_ffn_chunk(_cfg(True), 2, 64) == 0
    c128 = dataclasses.replace(_cfg(True), ffn_chunk_size=128)
    assert resolve_ffn_chunk(c128, 2, 64) == 128
    # auto: plain shapes -> unchunked; reversible shapes -> AUTO_FFN_CHUNK
    auto = dataclasses.replace(_cfg("auto"), ffn_chunk_size="auto")
    assert resolve_ffn_chunk(auto, 2, 64) == 0
    assert resolve_ffn_chunk(auto, 256, 8192) == AUTO_FFN_CHUNK
    # auto with explicit reversible=True chunks everywhere
    auto_rev = dataclasses.replace(_cfg(True), ffn_chunk_size="auto")
    assert resolve_ffn_chunk(auto_rev, 2, 64) == AUTO_FFN_CHUNK
    with pytest.raises(ValueError, match="auto"):
        resolve_ffn_chunk(dataclasses.replace(_cfg(True),
                                              ffn_chunk_size="always"),
                          2, 64)
    with pytest.raises(ValueError, match=">= 0"):
        resolve_ffn_chunk(dataclasses.replace(_cfg(True),
                                              ffn_chunk_size=-1), 2, 64)


def test_ffn_chunk_auto_forward_matches_explicit():
    """auto == unchunked bit-exactly at plain shapes; == 256-chunked
    bit-exactly when forced reversible (chunking is memory shape, not
    math — both identities must hold through the stack)."""
    from rtts.config import AUTO_FFN_CHUNK

    base = _cfg("auto")
    key = jax.random.PRNGKey(0)
    # seq len divisible by AUTO_FFN_CHUNK so every variant is legal
    x = jax.random.normal(jax.random.PRNGKey(1), (2, AUTO_FFN_CHUNK, 32))

    def run(cfg):
        params = stack_init(jax.random.PRNGKey(2), cfg, cross_attend=False)
        return np.asarray(stack_apply(params, cfg, x, mask=None,
                                      deterministic=True))

    out_auto = run(dataclasses.replace(base, ffn_chunk_size="auto"))
    out_plain = run(dataclasses.replace(base, ffn_chunk_size=0))
    np.testing.assert_array_equal(out_auto, out_plain)

    rev = _cfg(True)
    out_auto_r = run(dataclasses.replace(rev, ffn_chunk_size="auto"))
    out_chunk_r = run(dataclasses.replace(rev,
                                          ffn_chunk_size=AUTO_FFN_CHUNK))
    np.testing.assert_array_equal(out_auto_r, out_chunk_r)


def test_longform_8k_resolves_plain_fast_path():
    """BENCH.md r4 '8k step sweep': the longform config's raised plain
    budget must resolve plain residuals + unchunked FFN at its shipped
    (b2, 8192) shape and at (b1, 16384), and fall back to reversible +
    chunked FFN at shapes whose estimated transient exceeds the budget
    (b8 x 8192)."""
    from rtts.config import load_config, resolve_ffn_chunk, resolve_reversible

    cfg = load_config("configs/longform_8k.yaml", ["model.vocab_size=10"])
    dec = cfg.model.decoder
    assert resolve_reversible(dec, 2, 8192, 256) is False
    assert resolve_ffn_chunk(dec, 2, 8192, 256) == 0
    assert resolve_reversible(dec, 1, 16384, 256) is False
    assert resolve_reversible(dec, 8, 8192, 256) is True
    assert resolve_ffn_chunk(dec, 8, 8192, 256) > 0


def test_use_pallas_auto_resolution():
    """use_pallas='auto' selects the fused chunk-attend only on TPU and
    only from 8192 positions (BENCH.md r4: kernel wins at 8k, loses at
    1k); off-TPU it must resolve the jnp attend (interpret mode is for
    explicitly-requested tests, not speed)."""
    from rtts.attention.lsh import _pick_attend_fn, lsh_attend_chunks
    from rtts.config import AttentionConfig

    auto = AttentionConfig(kind="lsh")
    assert auto.use_pallas == "auto"
    # CPU (this suite): auto never selects the kernel at any length
    assert _pick_attend_fn(auto, 8192) is lsh_attend_chunks
    assert _pick_attend_fn(auto, 1024) is lsh_attend_chunks
    # explicit true keeps the interpret-mode test path
    on = AttentionConfig(kind="lsh", use_pallas=True)
    assert _pick_attend_fn(on, 64) is not lsh_attend_chunks
    import pytest as _pytest
    with _pytest.raises(ValueError, match="use_pallas"):
        _pick_attend_fn(AttentionConfig(kind="lsh", use_pallas="always"), 64)
