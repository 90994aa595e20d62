"""Optimizer + LR schedule factory (SURVEY.md §3.1 #14: Adam with a
Noam/warmup schedule and gradient clipping)."""

from __future__ import annotations

import optax

from rtts.config import OptimConfig


def make_schedule(cfg: OptimConfig):
    if cfg.schedule == "constant":
        return cfg.learning_rate
    if cfg.schedule == "noam":
        # linear warmup to peak lr, then inverse-sqrt decay (Noam shape)
        warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        return optax.join_schedules([warmup, _inv_sqrt(cfg)],
                                    [cfg.warmup_steps])
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def _inv_sqrt(cfg: OptimConfig):
    def sched(step):
        return cfg.learning_rate * (cfg.warmup_steps / (step + cfg.warmup_steps)) ** 0.5

    return sched


def lr_at_step(cfg: OptimConfig, step: int) -> float:
    """Effective learning rate at a given TRAIN step (for logging).

    With gradient accumulation the inner chain (and so the schedule's
    update counter) advances once per ``accumulate_steps`` micro-batches,
    which is exactly how ``optax.MultiSteps`` counts it.  At micro-steps
    in between this reports the lr of the cycle's UPCOMING inner update
    (forward-looking): the rate the gradient being accumulated right now
    will be applied at, not the last one already applied."""
    sched = make_schedule(cfg)
    if not callable(sched):
        return float(sched)
    updates = step // max(1, cfg.accumulate_steps)
    # call with a traced-style scalar: join_schedules evaluates EVERY branch
    # (selecting afterwards), and the inverse-sqrt branch divides by zero on
    # python ints at count 0 — jnp semantics give inf there, unselected
    import jax.numpy as jnp

    return float(sched(jnp.asarray(updates)))


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.optimizer == "adam":
        chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2,
                                         eps=cfg.eps))
    elif cfg.optimizer == "adamw":
        chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2,
                                         eps=cfg.eps))
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    elif cfg.optimizer == "sgd":
        pass
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain.append(optax.scale_by_learning_rate(sched))
    opt = optax.chain(*chain)
    if cfg.accumulate_steps > 1:
        # MultiSteps accumulates the running MEAN gradient across
        # accumulate_steps micro-batches and applies the inner chain once
        # per cycle (identity updates in between) — clipping and the LR
        # schedule therefore see the accumulated gradient / update count,
        # the Lightning accumulate_grad_batches semantics the reference
        # inherits (SURVEY.md §3.1 #14).  The wrapped state is a plain
        # pytree (counters + grad accumulator mirroring the param tree),
        # so checkpointing and the TP/ZeRO sharding rules apply unchanged.
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.accumulate_steps)
    return opt
