"""Gradient accumulation (OptimConfig.accumulate_steps, SURVEY.md §3.1 #14:
the reference's Lightning trainer exposes accumulate_grad_batches; here the
same semantics ride optax.MultiSteps inside make_optimizer)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rtts.config import OptimConfig
from rtts.train.optim import make_optimizer


def _grads_like(params, seed):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape, l.dtype)
                  for k, l in zip(keys, leaves)])


def test_accumulated_update_equals_mean_grad_step():
    """k micro-batches through accumulate_steps=k == ONE inner-optimizer
    step on the mean gradient (Lightning accumulate_grad_batches
    semantics: clipping + LR schedule act on the accumulated gradient)."""
    cfg = OptimConfig(learning_rate=1e-2, schedule="constant",
                      grad_clip_norm=1.0)
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0,
              "b": jnp.ones((3,), jnp.float32)}
    g1, g2, g3 = (_grads_like(params, s) for s in (1, 2, 3))
    mean_g = jax.tree.map(lambda a, b, c: (a + b + c) / 3.0, g1, g2, g3)

    inner = make_optimizer(cfg)
    s0 = inner.init(params)
    ref_updates, _ = inner.update(mean_g, s0, params)
    ref_params = optax.apply_updates(params, ref_updates)

    acc = make_optimizer(dataclasses.replace(cfg, accumulate_steps=3))
    s = acc.init(params)
    p = params
    for i, g in enumerate((g1, g2, g3)):
        updates, s = acc.update(g, s, p)
        p = optax.apply_updates(p, updates)
        if i < 2:  # identity updates until the cycle completes
            np.testing.assert_array_equal(np.asarray(p["w"]),
                                          np.asarray(params["w"]))
    for k in params:
        np.testing.assert_allclose(np.asarray(p[k]),
                                   np.asarray(ref_params[k]),
                                   rtol=1e-6, atol=1e-7)


def test_multisteps_state_checkpoint_roundtrip(tmp_path):
    """The MultiSteps state (counters + grad accumulator) round-trips the
    path-keyed npz checkpoint format, including mid-cycle."""
    from rtts.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg = OptimConfig(learning_rate=1e-2, schedule="constant",
                      accumulate_steps=2)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    opt = make_optimizer(cfg)
    state = opt.init(params)
    updates, state = opt.update(_grads_like(params, 5), state, params)
    params = optax.apply_updates(params, updates)  # mid-cycle (mini_step=1)

    save_checkpoint(tmp_path, {"params": params, "opt_state": state}, step=1)
    template = {"params": params, "opt_state": opt.init(params)}
    restored, step = restore_checkpoint(str(tmp_path / "step_1"), template)
    assert step == 1
    flat_a = jax.tree_util.tree_leaves(state)
    flat_b = jax.tree_util.tree_leaves(restored["opt_state"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming from the restored state completes the cycle identically
    g = _grads_like(params, 6)
    u1, _ = opt.update(g, state, params)
    u2, _ = opt.update(g, restored["opt_state"], params)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_runs_with_accumulation(tmp_path):
    """The real TTS trainer runs with accumulate_steps=2 (micro-steps drive
    the loop; the optimizer applies every second micro-batch) and resumes
    from its checkpoint."""
    from test_train_harness import _cfg
    from rtts.data.corpus import generate_corpus
    from rtts.data.preprocess import preprocess_corpus
    from rtts.train.train_tts import train_tts

    root = tmp_path / "corpus"
    root.mkdir()
    data_dir = str(root / "data")
    cfg = _cfg(data_dir)
    generate_corpus(root, n_utterances=8)
    preprocess_corpus(cfg.dataset, str(root / "transcripts.txt"))
    cfg = dataclasses.replace(
        cfg, experiment=dataclasses.replace(
            cfg.experiment,
            optim=dataclasses.replace(cfg.experiment.optim,
                                      accumulate_steps=2)))
    work = tmp_path / "tts"
    m1 = train_tts(cfg, str(work), max_steps=4)
    assert np.isfinite(float(m1["loss"]))
    m2 = train_tts(cfg, str(work), max_steps=6)  # resume mid-cycle state
    assert np.isfinite(float(m2["loss"]))


def test_lr_at_step_tracks_schedule_and_accumulation():
    from rtts.train.optim import lr_at_step, make_schedule

    cfg = OptimConfig(learning_rate=1e-3, schedule="noam", warmup_steps=10,
                      total_steps=100)
    # warmup is monotonically increasing up to the peak at warmup_steps
    lrs = [lr_at_step(cfg, s) for s in range(0, 11)]
    assert all(b >= a for a, b in zip(lrs, lrs[1:]))
    assert abs(lrs[10] - 1e-3) < 1e-9
    # beyond warmup: inverse-sqrt decay
    assert lr_at_step(cfg, 40) < lr_at_step(cfg, 11)

    # with accumulation the schedule advances once per k micro-steps
    import dataclasses
    acc = dataclasses.replace(cfg, accumulate_steps=4)
    assert lr_at_step(acc, 39) == lr_at_step(cfg, 9)

    # constant schedule: plain float
    const = OptimConfig(learning_rate=5e-4, schedule="constant")
    assert lr_at_step(const, 123) == 5e-4
    assert isinstance(make_schedule(const), float)
