"""Decode-mode equivalence: the fast incremental KV path must match the
reference-faithful recompute path (full attention), and the recompute path
must run LSH decoding with its exact bucketed pattern."""

import jax
import jax.numpy as jnp
import numpy as np

from rtts.infer.decode import decode_greedy, decode_greedy_recompute
from rtts.models import reformer_tts as M
from rtts.text import vocab_size

from tests.test_model_m1 import tiny_cfg
from tests.test_model_lsh import lsh_cfg


def _memory(cfg, seed=0, B=2, L=16):
    params = M.init(jax.random.PRNGKey(seed), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, L), 3,
                                vocab_size())
    tmask = jnp.ones((B, L), bool)
    memory = M.encode(params, cfg, tokens, tmask)
    return params, memory, tmask


def test_recompute_matches_incremental_full_attention():
    cfg = tiny_cfg()  # prenet dropout 0 => both paths deterministic
    params, memory, tmask = _memory(cfg)
    mel_i, len_i, _ = decode_greedy(params, cfg, memory, tmask,
                                    max_frames=16, stop_threshold=2.0)
    mel_r, len_r, _ = decode_greedy_recompute(params, cfg, memory, tmask,
                                              max_frames=16,
                                              stop_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(len_i), np.asarray(len_r))
    np.testing.assert_allclose(np.asarray(mel_r), np.asarray(mel_i),
                               atol=5e-4, rtol=1e-3)


def test_unroll_block_matches_eager_kv_full():
    """kv_full unroll>1 is BLOCK decoding (deferred cache writes, one
    batched update per buffer per trip).  Score VALUES match the eager
    step exactly; only the f32 softmax reduction length differs
    (refusion-class), so outputs agree tightly but not bit-for-bit —
    including a non-divisor request (snapped to a divisor) and natural
    early stopping (dead trailing steps in a trip must not write)."""
    cfg = tiny_cfg()
    params, memory, tmask = _memory(cfg)
    for thr in (2.0, 0.3):  # forced full-length + natural stops
        mel_1, len_1, stop_1 = decode_greedy(params, cfg, memory, tmask,
                                             max_frames=16,
                                             stop_threshold=thr)
        for unroll in (3, 4, 16, 64):
            mel_k, len_k, stop_k = decode_greedy(
                params, cfg, memory, tmask, max_frames=16,
                stop_threshold=thr, unroll=unroll)
            if thr > 1.0:
                np.testing.assert_array_equal(np.asarray(len_1),
                                              np.asarray(len_k))
            else:
                # a stop logit ON the threshold may flip by one step
                assert np.abs(np.asarray(len_1).astype(np.int64)
                              - np.asarray(len_k)).max() <= 1
            common = np.minimum(np.asarray(len_1), np.asarray(len_k))
            m = (np.arange(mel_1.shape[1])[None, :]
                 < common[:, None])[..., None]
            np.testing.assert_allclose(np.asarray(mel_1) * m,
                                       np.asarray(mel_k) * m,
                                       atol=2e-3, rtol=1e-2)
            np.testing.assert_allclose(
                np.asarray(stop_1) * m[..., 0],
                np.asarray(stop_k) * m[..., 0], atol=2e-3)


def test_unroll_is_output_identical_lsh_chunk():
    cfg = lsh_cfg(reversible=True)
    params, memory, tmask = _memory(cfg, B=2, L=64)
    run = lambda u: jax.jit(
        lambda p, m, mm: decode_greedy(p, cfg, m, mm, max_frames=32,
                                       stop_threshold=2.0,
                                       mode="kv_lsh_chunk", unroll=u)
    )(params, memory, tmask)
    mel_1, len_1, _ = run(1)
    mel_5, len_5, _ = run(5)
    np.testing.assert_array_equal(np.asarray(len_1), np.asarray(len_5))
    np.testing.assert_array_equal(np.asarray(mel_1), np.asarray(mel_5))


def test_staged_matches_fixed_kv_full():
    """Staged (geometrically grown) KV buffers must reproduce the
    fixed-size loop: same lengths, mel within f32 reduction-size rounding
    amplified by AR feedback (loose but diagnostic tolerance)."""
    cfg = tiny_cfg()
    params, memory, tmask = _memory(cfg)
    for thr in (2.0, 0.3):
        mel_f, len_f, _ = decode_greedy(params, cfg, memory, tmask,
                                        max_frames=32, stop_threshold=thr)
        mel_s, len_s, _ = decode_greedy(params, cfg, memory, tmask,
                                        max_frames=32, stop_threshold=thr,
                                        staged=True, stage_min=8)
        if thr > 1.0:
            # forced full-length: lengths must agree exactly
            np.testing.assert_array_equal(np.asarray(len_f),
                                          np.asarray(len_s))
        else:
            # natural stops: staged changes f32 softmax reduction sizes
            # (documented refusion-class numerics), so a stop logit
            # sitting ON the threshold may flip by one step — allow it
            assert np.abs(np.asarray(len_f).astype(np.int64)
                          - np.asarray(len_s)).max() <= 1
        # compare mel over the region both runs consider valid (a 1-step
        # length flip zero-masks that frame in only one of the two)
        common = np.minimum(np.asarray(len_f), np.asarray(len_s))
        m = (np.arange(mel_f.shape[1])[None, :]
             < common[:, None])[..., None]
        np.testing.assert_allclose(np.asarray(mel_f) * m,
                                   np.asarray(mel_s) * m,
                                   atol=5e-4, rtol=1e-3)


def test_staged_matches_fixed_lsh_modes():
    cfg = lsh_cfg(reversible=True)
    params, memory, tmask = _memory(cfg, B=2, L=64)
    for mode in ("kv_lsh", "kv_lsh_chunk"):
        run = lambda st: jax.jit(
            lambda p, m, mm: decode_greedy(p, cfg, m, mm, max_frames=32,
                                           stop_threshold=2.0, mode=mode,
                                           staged=st, stage_min=8)
        )(params, memory, tmask)
        mel_f, len_f, _ = run(False)
        mel_s, len_s, _ = run(True)
        np.testing.assert_array_equal(np.asarray(len_f), np.asarray(len_s))
        np.testing.assert_allclose(np.asarray(mel_f), np.asarray(mel_s),
                                   atol=5e-4, rtol=1e-3)


def test_recompute_decodes_lsh_model():
    cfg = lsh_cfg(reversible=True)
    params, memory, tmask = _memory(cfg, B=2, L=64)
    # 32 frames = 2 LSH chunks of 16 -> exercises the bucketed path
    mel, lengths, _ = jax.jit(
        lambda p, m, mm: decode_greedy_recompute(p, cfg, m, mm,
                                                 max_frames=32,
                                                 stop_threshold=2.0)
    )(params, memory, tmask)
    assert mel.shape == (2, 32, 20)
    assert np.isfinite(np.asarray(mel)).all()
    assert (np.asarray(lengths) == 32).all()


def test_precast_weights_bit_identical():
    """decode_greedy pre-casts >=2-D f32 weights to bf16 before the loop
    (BENCH.md: 2x decode — XLA does not hoist the in-loop casts itself).
    Feeding params that were ALREADY pre-cast must be bit-identical, and
    the helper must leave 1-D leaves (LN scales, biases) f32."""
    import dataclasses

    from rtts.infer.decode import _precast_weights

    cfg = dataclasses.replace(tiny_cfg(), compute_dtype="bfloat16")
    params, memory, tmask = _memory(cfg)
    cast = _precast_weights(params, jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(cast)
    assert any(l.dtype == jnp.bfloat16 for l in leaves if l.ndim >= 2)
    assert all(l.dtype == jnp.float32 for l in leaves if l.ndim == 1)
    # f32 compute dtype: no-op
    assert _precast_weights(params, jnp.float32) is params

    mel_a, len_a, stop_a = decode_greedy(params, cfg, memory, tmask,
                                         max_frames=16, stop_threshold=2.0)
    mel_b, len_b, stop_b = decode_greedy(cast, cfg, memory, tmask,
                                         max_frames=16, stop_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(len_a), np.asarray(len_b))
    np.testing.assert_array_equal(np.asarray(mel_a), np.asarray(mel_b))
    np.testing.assert_array_equal(np.asarray(stop_a), np.asarray(stop_b))


def test_f8_kv_cache_close_to_bf16():
    """Opt-in f8 KV-cache serving (cfg.kv_cache_dtype="float8_e4m3fn"):
    halves the dominant per-step HBM stream (BENCH.md cost model).  Must
    run every decode mode finite and stay close to the full-precision
    decode on untrained weights; the default ("compute") path must be
    byte-identical to before the knob existed."""
    import dataclasses

    cfg16 = dataclasses.replace(tiny_cfg(), compute_dtype="bfloat16")
    cfg8 = dataclasses.replace(cfg16, kv_cache_dtype="float8_e4m3fn")
    params, memory, tmask = _memory(cfg16)

    mel16, len16, _ = decode_greedy(params, cfg16, memory, tmask,
                                    max_frames=16, stop_threshold=2.0)
    mel8, len8, _ = decode_greedy(params, cfg8, memory, tmask,
                                  max_frames=16, stop_threshold=2.0)
    assert np.isfinite(np.asarray(mel8)).all()
    # untrained weights, AR feedback: loose but diagnostic bound
    err = float(np.abs(np.asarray(mel8) - np.asarray(mel16)).max())
    assert err < 0.2, err
    np.testing.assert_array_equal(np.asarray(len16), np.asarray(len8))

    # LSH modes run finite with f8 caches
    lcfg = dataclasses.replace(lsh_cfg(reversible=True),
                               kv_cache_dtype="float8_e4m3fn")
    lp, lmem, lmask = _memory(lcfg, B=2, L=64)
    for mode in ("kv_lsh", "kv_lsh_chunk"):
        mel, lengths, _ = jax.jit(
            lambda p, m, mm, _mode=mode: decode_greedy(
                p, lcfg, m, mm, max_frames=32, stop_threshold=2.0,
                mode=_mode)
        )(lp, lmem, lmask)
        assert np.isfinite(np.asarray(mel)).all(), mode
