"""Same-process A/B: reversible vs plain residuals in the train step.

BENCH.md's memory table shows reversible+chunked-FFN cuts transient HBM
4.8x (1.05 vs 4.68 GB at flagship b8x1024) — that is what the 8k config
needs.  But at short/mid lengths the memory fits anyway, and the
reversible backward re-runs every sublayer (recompute ~ +1x forward
FLOPs) while the plain path instead STORES the activations (the full
attention probs are (B,H,L,L) f32 — pure HBM traffic on this
bandwidth-limited backend).  Which one wins is a length/batch-dependent
empirical question; this probe answers it so a `reversible: auto`
default can follow the measurement (same doctrine as `kind: auto`).

Both paths run the identical f/g sublayers with identical aux rngs —
the forward is the same op sequence (rtts/reversible/rev.py), so this
is a pure speed/memory A/B, not a fidelity choice.

Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/probe_rev_plain.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import optax

from rtts.bench import _sync, _build, flagship_bench_config, _compiled_flops, _mfu
from rtts.models import reformer_tts as M
from rtts.train.losses import make_stop_target, tts_loss
from rtts.train.optim import make_optimizer
from rtts.utils.profiling import enable_compilation_cache

REPEATS = 5
POINTS = [  # (batch, mel_len)
    (8, 256),
    (8, 512),
    (8, 1024),
    (8, 2048),
    (2, 4096),
    (32, 512),
]


def _with_reversible(cfg, flag: bool):
    model = cfg.model
    model = dataclasses.replace(
        model,
        encoder=dataclasses.replace(model.encoder, reversible=flag),
        decoder=dataclasses.replace(model.decoder, reversible=flag),
    )
    return dataclasses.replace(cfg, model=model)


def _make_step(cfg, tokens, tmask, mel, mmask):
    optimizer = make_optimizer(cfg.experiment.optim)

    @jax.jit
    def step(p, s, rng):
        def loss_fn(p):
            pre, post, stop = M.forward(p, cfg.model, tokens, tmask, mel,
                                        mmask, rng=rng, deterministic=False)
            return tts_loss(pre, post, stop, mel, make_stop_target(mmask),
                            mmask)[0]
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    return optimizer, step


def _transient_mb(step, *args):
    try:
        mem = step.lower(*args).compile().memory_analysis()
        return mem.temp_size_in_bytes / 1e6
    except Exception:
        return float("nan")


def main():
    enable_compilation_cache()
    base = flagship_bench_config()
    print(f"platform={jax.devices()[0].platform}")
    print("batch,mel_len,rev_ms,plain_ms,plain_over_rev,"
          "rev_mfu,plain_mfu,rev_temp_mb,plain_temp_mb")
    for batch, mel_len in POINTS:
        token_len = max(64, mel_len // 4)
        tokens = jax.random.randint(jax.random.PRNGKey(1),
                                    (batch, token_len), 3,
                                    base.model.vocab_size)
        tmask = jnp.ones((batch, token_len), bool)
        mel = jax.random.normal(jax.random.PRNGKey(2),
                                (batch, mel_len, base.model.n_mels))
        mmask = jnp.ones((batch, mel_len), bool)
        rng = jax.random.PRNGKey(3)

        results = {}
        states = {}
        for name, flag in (("rev", True), ("plain", False)):
            cfg = _with_reversible(base, flag)
            params = _build(cfg)
            optimizer, step = _make_step(cfg, tokens, tmask, mel, mmask)
            opt_state = optimizer.init(params)
            p, s, _ = _sync(step(params, opt_state, rng))  # compile+warm
            states[name] = (step, p, s)
            results[name] = {
                "flops": _compiled_flops(step, p, s, rng),
                "temp_mb": _transient_mb(step, p, s, rng),
                "times": [],
            }
        # interleave timings so chip contention hits both variants equally
        for i in range(REPEATS):
            for name in ("rev", "plain"):
                step, p, s = states[name]
                t0 = time.perf_counter()
                p, s, _ = _sync(step(p, s, jax.random.fold_in(rng, i)))
                results[name]["times"].append(time.perf_counter() - t0)
                states[name] = (step, p, s)
        rev_t = min(results["rev"]["times"])
        plain_t = min(results["plain"]["times"])
        rev_mfu = _mfu(results["rev"]["flops"], rev_t) or float("nan")
        plain_mfu = _mfu(results["plain"]["flops"], plain_t) or float("nan")
        print(f"{batch},{mel_len},{rev_t*1e3:.1f},{plain_t*1e3:.1f},"
              f"{rev_t/plain_t:.2f},{rev_mfu:.3f},{plain_mfu:.3f},"
              f"{results['rev']['temp_mb']:.0f},"
              f"{results['plain']['temp_mb']:.0f}")


if __name__ == "__main__":
    main()
