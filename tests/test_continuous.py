"""Continuous-batching serving engine (SURVEY.md §4.3; CLAUDE.md round-2
future work "continuous/variable-length serving batching").

Correctness anchors:
- All-slots-admitted-at-t=0 with budget == capacity reproduces
  ``decode_greedy(mode="kv_full", staged=False)`` (same buffer layout,
  same masks, same prenet key schedule).
- A RECYCLED slot (admitted at t > 0, ring-rotated cache indices) matches
  a fresh decode of the same request to f32 refusion tolerance.
- Streaming admission: requests submitted mid-flight complete with the
  right lengths; slot bookkeeping never loses or duplicates a request.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtts.config import Config, from_dict, to_dict
from rtts.infer.decode import decode_greedy
from rtts.infer.serving import ServingEngine
from rtts.models import reformer_tts as M

from tests.test_model_m1 import tiny_cfg

TOKEN_LEN = 16


def _cfg(stop_threshold=2.0, reduction_factor=1):
    model_cfg = tiny_cfg(d=32)  # prenet_dropout=0 -> fully deterministic
    model_cfg = dataclasses.replace(model_cfg, stop_threshold=stop_threshold,
                                    reduction_factor=reduction_factor)
    return from_dict(Config, {"model": to_dict(model_cfg),
                              "dataset": {"audio": {"n_mels": 20},
                                          "text": {"max_len": TOKEN_LEN}}})


def _tokens(seed, n=1):
    key = jax.random.PRNGKey(seed)
    tokens = jax.random.randint(key, (n, TOKEN_LEN), 3,
                                _cfg().model.vocab_size)
    return np.asarray(tokens), np.ones((n, TOKEN_LEN), bool)


def _engine(cfg, params, **kw):
    kw.setdefault("slots", 2)
    kw.setdefault("capacity_frames", 64)
    kw.setdefault("segment_frames", 16)
    kw.setdefault("token_len", TOKEN_LEN)
    kw.setdefault("suppress_dispatch_warning", True)
    return ServingEngine(cfg, params, **kw)


def test_engine_matches_decode_greedy_pinned():
    """Slots admitted together at t=0, run to capacity: engine output ==
    decode_greedy(kv_full, staged=False) on the same batch."""
    cfg = _cfg(stop_threshold=2.0)  # stop never fires -> budget force-stop
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    cap = 64
    tokens, mask = _tokens(7, n=2)

    eng = _engine(cfg, params, slots=2, capacity_frames=cap, seed=0)
    ids = [eng.submit_tokens(tokens[i:i + 1], mask[i:i + 1])
           for i in range(2)]
    results = eng.run_until_drained()

    memory = M.encode(params, cfg.model, jnp.asarray(tokens),
                      jnp.asarray(mask), deterministic=True)
    ref = decode_greedy(params, cfg.model, memory, jnp.asarray(mask),
                        max_frames=cap, rng=jax.random.PRNGKey(0),
                        mode="kv_full", staged=False)
    ref_mel = np.asarray(ref.mel_post)
    ref_len = np.asarray(ref.lengths)

    for i, rid in enumerate(ids):
        mel, length = results[rid]
        assert length == ref_len[i] == cap
        np.testing.assert_allclose(mel, ref_mel[i], atol=1e-5, rtol=0)


def test_recycled_slot_matches_fresh_decode():
    """Requests decoded in a recycled slot (ring offsets > 0) match a
    fresh decode_greedy at their own budget."""
    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    eng = _engine(cfg, params, slots=2, capacity_frames=64,
                  segment_frames=16, seed=0)
    budgets = [16, 32, 48, 16]
    toks = [_tokens(100 + i) for i in range(4)]
    ids = [eng.submit_tokens(t, m, budget_frames=b)
           for (t, m), b in zip(toks, budgets)]
    results = eng.run_until_drained()
    assert sorted(results) == sorted(ids)

    for rid, (t, m), b in zip(ids, toks, budgets):
        mel, length = results[rid]
        assert length == b
        memory = M.encode(params, cfg.model, jnp.asarray(t), jnp.asarray(m),
                          deterministic=True)
        ref = decode_greedy(params, cfg.model, memory, jnp.asarray(m),
                            max_frames=b, rng=jax.random.PRNGKey(0),
                            mode="kv_full", staged=False)
        # the engine's prenet keys fold the GLOBAL step, so a slot admitted
        # at t>0 sees a different (deterministic) key schedule; with
        # prenet_dropout=0 the trajectories are identical up to the ring
        # rotation's f32 reduction order
        np.testing.assert_allclose(mel, np.asarray(ref.mel_post)[0],
                                   atol=2e-4, rtol=0)


def test_streaming_admission_and_lengths():
    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    eng = _engine(cfg, params, slots=2, capacity_frames=64,
                  segment_frames=16)
    t0, m0 = _tokens(1)
    first = [eng.submit_tokens(t0, m0, budget_frames=16) for _ in range(2)]
    eng.step()  # both first requests finish (budget 16 == one segment)
    t1, m1 = _tokens(2)
    late = [eng.submit_tokens(t1, m1, budget_frames=32) for _ in range(3)]
    results = eng.run_until_drained()
    assert sorted(results) == sorted(first + late)
    for rid in first:
        assert results[rid][1] == 16
    for rid in late:
        assert results[rid][1] == 32
    for rid, (mel, length) in results.items():
        assert mel.shape == (length, cfg.model.n_mels)
        assert np.isfinite(mel).all()
    assert eng.idle and not eng.results


def test_stop_head_fires():
    """With a permissive threshold the stop head ends the utterance on the
    first step."""
    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    eng = _engine(cfg, params, stop_threshold=0.0)
    t, m = _tokens(3)
    rid = eng.submit_tokens(t, m)
    results = eng.run_until_drained()
    assert results[rid][1] == cfg.model.reduction_factor


def test_reduction_factor_groups():
    cfg = _cfg(stop_threshold=2.0, reduction_factor=2)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    eng = _engine(cfg, params, capacity_frames=64, segment_frames=16)
    t, m = _tokens(4)
    rid = eng.submit_tokens(t, m, budget_frames=24)
    results = eng.run_until_drained()
    mel, length = results[rid]
    assert length == 24  # ceil(24/2)*2
    assert mel.shape == (24, cfg.model.n_mels)


def test_serve_batch_matches_decode_greedy():
    """N <= slots, budget == capacity: the fused scheduler reduces to the
    plain batched decode (one admission at t=0, no recycling)."""
    from rtts.infer.serving import serve_batch

    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    cap = 64
    tokens, mask = _tokens(7, n=2)
    mel, lengths = serve_batch(
        params, cfg.model, jnp.asarray(tokens), jnp.asarray(mask),
        budgets=jnp.asarray([cap, cap]), capacity_frames=cap, slots=2,
        segment_frames=16, rng=jax.random.PRNGKey(0))

    memory = M.encode(params, cfg.model, jnp.asarray(tokens),
                      jnp.asarray(mask), deterministic=True)
    ref = decode_greedy(params, cfg.model, memory, jnp.asarray(mask),
                        max_frames=cap, rng=jax.random.PRNGKey(0),
                        mode="kv_full", staged=False)
    assert np.array_equal(np.asarray(lengths), np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref.mel_post),
                               atol=1e-5, rtol=0)


def test_serve_batch_matches_engine():
    """The fused scheduler and the segment engine produce the same
    results on a recycling workload (more requests than slots)."""
    from rtts.infer.serving import serve_batch

    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    budgets = [16, 32, 48, 16, 32]
    toks = [_tokens(100 + i) for i in range(5)]
    tokens = np.concatenate([t for t, _ in toks])
    masks = np.concatenate([m for _, m in toks])

    mel, lengths = serve_batch(
        params, cfg.model, jnp.asarray(tokens), jnp.asarray(masks),
        budgets=jnp.asarray(budgets), capacity_frames=64, slots=2,
        segment_frames=16, rng=jax.random.PRNGKey(0))
    lengths = np.asarray(lengths)

    eng = _engine(cfg, params, slots=2, capacity_frames=64,
                  segment_frames=16, seed=0)
    ids = [eng.submit_tokens(t, m, budget_frames=b)
           for (t, m), b in zip(toks, budgets)]
    results = eng.run_until_drained()

    # identical admission order (both fill free slots in slot order from
    # the queue head), so slot assignments and offsets line up exactly
    for i, rid in enumerate(ids):
        e_mel, e_len = results[rid]
        assert lengths[i] == e_len == budgets[i]
        np.testing.assert_allclose(np.asarray(mel)[i, :e_len], e_mel,
                                   atol=1e-5, rtol=0)
        assert np.all(np.asarray(mel)[i, e_len:] == 0.0)


def test_serve_batch_stop_head():
    from rtts.infer.serving import serve_batch

    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    tokens, mask = _tokens(9, n=3)
    mel, lengths = serve_batch(
        params, cfg.model, jnp.asarray(tokens), jnp.asarray(mask),
        budgets=jnp.asarray([64, 64, 64]), capacity_frames=64, slots=2,
        segment_frames=16, stop_threshold=0.0)
    # permissive threshold: every request stops on its first frame
    assert np.all(np.asarray(lengths) == cfg.model.reduction_factor)


def test_serve_pool_routes_and_matches():
    """Pool = serve_batch per capacity class; each request matches a fresh
    decode at its own budget and lands in the right class capacity."""
    from rtts.infer.serving import serve_pool

    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    budgets = [16, 48, 32, 64, 16]
    toks = [_tokens(200 + i) for i in range(5)]
    tokens = np.concatenate([t for t, _ in toks])
    masks = np.concatenate([m for _, m in toks])

    mels, lengths = serve_pool(params, cfg.model, tokens, masks, budgets,
                               class_caps=(32, 64), slots=2,
                               segment_frames=16, rng=jax.random.PRNGKey(0))
    assert list(lengths) == budgets
    for i, b in enumerate(budgets):
        cap = 32 if b <= 32 else 64
        assert mels[i].shape == (cap, cfg.model.n_mels)
        ref = decode_greedy(
            params, cfg.model,
            M.encode(params, cfg.model, jnp.asarray(toks[i][0]),
                     jnp.asarray(toks[i][1]), deterministic=True),
            jnp.asarray(toks[i][1]), max_frames=b,
            rng=jax.random.fold_in(jax.random.PRNGKey(0), cap),
            mode="kv_full", staged=False)
        # same request, own-budget fresh decode: identical up to ring
        # rotation + capacity-sized softmax reduction order
        np.testing.assert_allclose(np.asarray(mels[i])[:b],
                                   np.asarray(ref.mel_post)[0], atol=2e-4,
                                   rtol=0)
        assert np.all(np.asarray(mels[i])[b:] == 0.0)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        serve_pool(params, cfg.model, tokens, masks, [128],
                   class_caps=(32, 64), slots=2)


def test_engine_warns_dispatch_bound():
    """ServingEngine is 0.36x the batch path on dispatch-bound backends
    (BENCH.md 'continuous'): constructing it without acknowledgement must
    warn and point at serve_continuous/serve_pool."""
    import warnings

    cfg = _cfg()
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    with pytest.warns(UserWarning, match="serve_pool"):
        ServingEngine(cfg, params, slots=2, capacity_frames=64,
                      segment_frames=16, token_len=TOKEN_LEN)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _engine(cfg, params)  # suppressed path stays silent


def test_shape_validation():
    cfg = _cfg(reduction_factor=2)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    with pytest.raises(ValueError):
        ServingEngine(cfg, params, capacity_frames=63)  # not a multiple of r
    cfg1 = _cfg()
    params1 = M.init(jax.random.PRNGKey(0), cfg1.model)
    eng = _engine(cfg1, params1)
    with pytest.raises(ValueError):
        eng.submit_tokens(np.ones((1, 8), np.int32), np.ones((1, 8), bool))


def test_recycled_slot_row_is_zero_beyond_length():
    """fetch=False contract: a recycled slot's device row must be ZERO past
    the new utterance's length — the previous occupant's frames may not
    leak into the padding region fed to a batched vocoder."""
    cfg = _cfg(stop_threshold=2.0)
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    eng = _engine(cfg, params, slots=1, capacity_frames=64,
                  segment_frames=16)
    ta, ma = _tokens(7)
    tb, mb = _tokens(8)
    rid_a = eng.submit_tokens(ta, ma, budget_frames=48)  # long occupant
    rid_b = eng.submit_tokens(tb, mb, budget_frames=16)  # short, recycled
    results = eng.run_until_drained(fetch=False)
    row_b, len_b = results[rid_b]
    assert len_b == 16
    row_b = np.asarray(row_b)
    assert row_b.shape[0] == 64
    assert np.abs(row_b[:len_b]).max() > 0          # real frames inside
    np.testing.assert_array_equal(row_b[len_b:], 0.0)
    row_a, len_a = results[rid_a]
    np.testing.assert_array_equal(np.asarray(row_a)[len_a:], 0.0)


def test_zero_args_rejected():
    """slots/capacity/segment of 0 must raise, not loop forever."""
    from rtts.infer.serving import serve_batch

    cfg = _cfg()
    params = M.init(jax.random.PRNGKey(0), cfg.model)
    for kw in ({"segment_frames": 0}, {"capacity_frames": 0}, {"slots": 0}):
        with pytest.raises(ValueError):
            _engine(cfg, params, **kw)
    t, m = _tokens(1)
    with pytest.raises(ValueError):
        serve_batch(params, cfg.model, jnp.asarray(t), jnp.asarray(m),
                    jnp.asarray([16]), capacity_frames=64, slots=0)
