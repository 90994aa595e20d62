"""Length-aware attention kind resolution (``kind: "auto"``).

Encodes the measured v5e training crossover (BENCH.md "Training
attention": full softmax 1.9-4.1x faster up to 4k frames; LSH 6.7x at
8k) as a config default instead of a docs footnote — VERDICT r2 item 1a.
Resolution is static under jit, per (padded) sequence length.
"""

import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from rtts.config import AttentionConfig, ReformerStackConfig, resolve_attention_kind
from rtts.models.stack import stack_apply, stack_init


def test_resolve_rule():
    a = AttentionConfig(kind="auto", auto_full_max_len=4096)
    assert resolve_attention_kind(a, 512) == "full"
    assert resolve_attention_kind(a, 4096) == "full"
    assert resolve_attention_kind(a, 4097) == "lsh"
    assert resolve_attention_kind(a, 8192) == "lsh"
    # non-auto kinds pass through untouched
    for k in ("full", "lsh", "local"):
        assert resolve_attention_kind(
            AttentionConfig(kind=k), 10_000) == k


def test_resolve_rule_default_is_flash_aware():
    """auto_full_max_len: None resolves from the config alone (BENCH.md r3
    flash train sweep + r4 32k cell): 32768 when the flash kernel can own
    the full path, 4096 when it cannot (flash disabled).  Deliberately
    platform-independent — the same config + length must pick the same
    attention semantics on TPU and CPU.  Attention-probs dropout runs
    in-kernel, so it does not lower the limit."""
    from rtts.config import (AUTO_FULL_MAX_LEN_FLASH, AUTO_FULL_MAX_LEN_NAIVE,
                             auto_full_limit)

    for flash_capable in (AttentionConfig(kind="auto"),   # flash: auto
                          AttentionConfig(kind="auto", attention_dropout=0.1)):
        assert auto_full_limit(flash_capable) == AUTO_FULL_MAX_LEN_FLASH
        assert resolve_attention_kind(flash_capable, 8192) == "full"
        assert resolve_attention_kind(flash_capable, 32768) == "full"
        assert resolve_attention_kind(flash_capable, 32769) == "lsh"

    blocked = AttentionConfig(kind="auto", flash=False)
    assert auto_full_limit(blocked) == AUTO_FULL_MAX_LEN_NAIVE
    assert resolve_attention_kind(blocked, 4096) == "full"
    assert resolve_attention_kind(blocked, 8192) == "lsh"

    # an explicit value always wins
    pinned = AttentionConfig(kind="auto", auto_full_max_len=2048)
    assert auto_full_limit(pinned) == 2048
    assert resolve_attention_kind(pinned, 4096) == "lsh"


def _stack_cfg(kind, auto_max=64):
    att = AttentionConfig(kind=kind, num_heads=2, head_dim=16, num_hashes=2,
                          chunk_length=16, num_chunks_before=1,
                          hash_seed=3, auto_full_max_len=auto_max)
    return ReformerStackConfig(num_layers=2, d_model=32, d_ff=64,
                               dropout=0.0, reversible=True, causal=True,
                               attention=att)


def _x(l):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, l, 32))
    mask = jnp.arange(l)[None, :] < jnp.asarray([l, l - 5])[:, None]
    return x, mask


def test_auto_below_crossover_is_full():
    """Same params, short sequence: auto output == kind=full output."""
    cfg_auto = _stack_cfg("auto", auto_max=64)
    cfg_full = _stack_cfg("full", auto_max=64)
    params = stack_init(jax.random.PRNGKey(0), cfg_auto, cross_attend=False)
    x, mask = _x(48)  # 48 <= 64 -> full
    y_auto = stack_apply(params, cfg_auto, x, mask, rng=jax.random.PRNGKey(2))
    y_full = stack_apply(params, cfg_full, x, mask, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_full))


def test_auto_above_crossover_is_lsh():
    cfg_auto = _stack_cfg("auto", auto_max=32)
    cfg_lsh = _stack_cfg("lsh", auto_max=32)
    params = stack_init(jax.random.PRNGKey(0), cfg_auto, cross_attend=False)
    x, mask = _x(64)  # 64 > 32 -> lsh
    y_auto = stack_apply(params, cfg_auto, x, mask, rng=jax.random.PRNGKey(2))
    y_lsh = stack_apply(params, cfg_lsh, x, mask, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_lsh))
    # and it is NOT the full-attention output (the kinds genuinely differ
    # at this length)
    cfg_full = _stack_cfg("full", auto_max=32)
    y_full = stack_apply(params, cfg_full, x, mask, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(y_auto), np.asarray(y_full))


def test_auto_grads_work_both_sides():
    cfg_auto = _stack_cfg("auto", auto_max=32)
    params = stack_init(jax.random.PRNGKey(0), cfg_auto, cross_attend=False)
    for l in (32, 64):
        x, mask = _x(l)

        def loss(p):
            return jnp.sum(stack_apply(p, cfg_auto, x, mask,
                                       rng=jax.random.PRNGKey(2)) ** 2)

        g = jax.grad(loss)(params)
        flat, _ = jax.flatten_util.ravel_pytree(g)
        assert np.isfinite(np.asarray(flat)).all()
        assert float(jnp.abs(flat).sum()) > 0


def test_auto_mode_decode_follows_resolution():
    from rtts.infer.decode import _auto_mode
    from tests.test_model_m1 import tiny_cfg

    cfg = tiny_cfg()
    # auto kind, short decode -> full side -> kv_full
    att = dataclasses.replace(cfg.decoder.attention, kind="auto",
                              auto_full_max_len=4096, num_hashes=2,
                              chunk_length=16)
    cfg_auto = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, attention=att))
    assert _auto_mode(cfg_auto, 512) == "kv_full"
    # past the crossover the lsh cost model applies (ring cache wins when
    # the prefix dwarfs the ring working set)
    att_long = dataclasses.replace(att, auto_full_max_len=64)
    cfg_long = dataclasses.replace(
        cfg_auto, decoder=dataclasses.replace(cfg_auto.decoder,
                                              attention=att_long))
    assert _auto_mode(cfg_long, 8192) == "kv_lsh_chunk"


def test_autopad_treats_auto_as_chunked():
    from rtts.models.reformer_tts import _pad_multiple

    cfg = _stack_cfg("auto")
    assert _pad_multiple(cfg) % cfg.attention.chunk_length == 0
