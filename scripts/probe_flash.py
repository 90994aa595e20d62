"""Same-process A/B: flash (online-softmax Pallas) vs naive full attention.

Two levels, mirroring how the depthwise/attend kernels were judged
(BENCH.md "measured, and acted on"):

1. kernel: the shared-QK full-softmax sublayer, forward and forward+
   backward, naive vs flash at flagship widths over a length sweep.
2. train: the REAL flagship train step (fwd+bwd+Adam) with the flash knob
   on/off, including the long-length points where naive full attention
   collapses (its (B,H,L,L) f32 scores are pure HBM traffic) and the 8k
   point against the LSH path that currently owns it — plus a
   reversible-vs-plain cross: flash's custom_vjp saves only O(L*d)
   residuals, which moves the reversible/plain crossover too.

Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_flash.py \
        [kernel|train|all]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import optax

from rtts.attention.full import attention_init, shared_qk_self_attention
from rtts.bench import (_build, _compiled_flops, _mfu, _sync, _time_loop,
                        flagship_bench_config)
from rtts.models import reformer_tts as M
from rtts.train.losses import make_stop_target, tts_loss
from rtts.train.optim import make_optimizer
from rtts.utils.profiling import enable_compilation_cache

REPEATS = 5


def _attn_cfg(cfg, *, kind=None, flash=None, reversible=None, dropout=None):
    def fix_stack(stack):
        a = stack.attention
        if kind is not None:
            a = dataclasses.replace(a, kind=kind)
        if flash is not None:
            a = dataclasses.replace(a, flash=flash)
        if dropout is not None:
            a = dataclasses.replace(a, attention_dropout=dropout)
        kw = {"attention": a}
        if reversible is not None:
            kw["reversible"] = reversible
        return dataclasses.replace(stack, **kw)

    model = dataclasses.replace(cfg.model,
                                encoder=fix_stack(cfg.model.encoder),
                                decoder=fix_stack(cfg.model.decoder))
    return dataclasses.replace(cfg, model=model)


def probe_accuracy():
    """First time the kernel meets real Mosaic hardware (tests ran the CPU
    interpreter): check fwd + grads vs the naive path before timing."""
    import numpy as np

    print("== accuracy: flash vs naive on-device (b2 h4 L512 d64) ==")
    params = attention_init(jax.random.PRNGKey(0), 512, 4, 64, shared_qk=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512), jnp.float32)
    mask = jnp.arange(512)[None, :] < jnp.array([512, 389])[:, None]

    def run(impl):
        def loss(xx):
            return jnp.sum(shared_qk_self_attention(
                params, xx, mask=mask, causal=True, num_heads=4,
                compute_dtype=jnp.bfloat16,
                impl=impl).astype(jnp.float32) ** 2)
        val, grad = jax.value_and_grad(loss)(x)
        return float(val), np.asarray(grad, np.float32)

    v_n, g_n = run("naive")
    v_f, g_f = run("flash")
    rel_v = abs(v_f - v_n) / max(abs(v_n), 1e-9)
    rel_g = float(np.max(np.abs(g_f - g_n))) / max(
        float(np.max(np.abs(g_n))), 1e-9)
    print(f"loss rel diff {rel_v:.2e}   grad max rel diff {rel_g:.2e}",
          flush=True)
    if rel_v > 1e-2 or rel_g > 5e-2:
        raise SystemExit(f"flash-vs-naive mismatch on hardware: "
                         f"{rel_v:.3e}/{rel_g:.3e}")


def probe_kernel():
    print("== kernel: shared-QK full sublayer, naive vs flash "
          "(b8 h8 d512, bf16, causal) ==")
    params = attention_init(jax.random.PRNGKey(0), 512, 8, 64, shared_qk=True)
    for L in (512, 1024, 2048, 4096):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, L, 512),
                              jnp.float32)

        def fwd(impl):
            def f(x, p):
                return shared_qk_self_attention(
                    p, x, mask=None, causal=True, num_heads=8,
                    compute_dtype=jnp.bfloat16, impl=impl).astype(x.dtype)
            return f

        def fwdbwd(impl):
            def f(x, p):
                return jax.grad(lambda xx: jnp.sum(
                    shared_qk_self_attention(
                        p, xx, mask=None, causal=True, num_heads=8,
                        compute_dtype=jnp.bfloat16, impl=impl)))(x)
            return f

        iters = max(4, 4096 // L * 4)
        row = {}
        for tag, mk in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            t_naive = _time_loop(mk("naive"), x, (params,), iters=iters,
                                 repeats=REPEATS)
            t_flash = _time_loop(mk("flash"), x, (params,), iters=iters,
                                 repeats=REPEATS)
            row[tag] = (t_naive, t_flash)
        print(f"L={L:5d}  fwd naive {row['fwd'][0]*1e3:7.2f} ms  "
              f"flash {row['fwd'][1]*1e3:7.2f} ms  "
              f"({row['fwd'][0]/row['fwd'][1]:4.2f}x)   "
              f"fwd+bwd naive {row['fwd+bwd'][0]*1e3:7.2f} ms  "
              f"flash {row['fwd+bwd'][1]*1e3:7.2f} ms  "
              f"({row['fwd+bwd'][0]/row['fwd+bwd'][1]:4.2f}x)", flush=True)


def _make_step(cfg, batch, token_len, mel_len):
    params = _build(cfg)
    optimizer = make_optimizer(cfg.experiment.optim)
    opt_state = optimizer.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, token_len),
                                3, cfg.model.vocab_size)
    tmask = jnp.ones((batch, token_len), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (batch, mel_len, cfg.model.n_mels))
    mmask = jnp.ones((batch, mel_len), bool)

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

    return step, params, opt_state


def _time_step(step, params, opt_state):
    rng = jax.random.PRNGKey(3)
    p, s, _ = _sync(step(params, opt_state, rng))
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        p, s, loss = _sync(step(p, s, jax.random.fold_in(rng, i)))
        times.append(time.perf_counter() - t0)
    try:
        mem = step.lower(params, opt_state, rng).compile().memory_analysis()
        temp_mb = mem.temp_size_in_bytes / 1e6
    except Exception:
        temp_mb = float("nan")
    flops = _compiled_flops(step, params, opt_state, rng)
    return min(times), temp_mb, flops, float(loss)


TRAIN_POINTS = [(8, 1024), (8, 2048), (2, 4096), (2, 8192), (1, 16384),
                (1, 32768)]


def probe_train(points=None):
    base = flagship_bench_config()
    points = points if points is not None else TRAIN_POINTS
    print("== train step: flagship fwd+bwd+Adam, kind=full naive vs flash "
          "(reversible true), + plain-residual flash, + 8k LSH reference ==")
    for batch, mel_len in points:
        token_len = 256
        variants = [
            ("full naive rev", dict(kind="full", flash=False,
                                    reversible=True)),
            ("full flash rev", dict(kind="full", flash=True,
                                    reversible=True)),
            ("full flash plain", dict(kind="full", flash=True,
                                      reversible=False)),
        ]
        if mel_len >= 4096:
            variants.append(("lsh (shipped long)", dict(kind="lsh",
                                                        flash=False,
                                                        reversible=True)))
        if mel_len >= 8192:
            # naive full at 8k needs ~17 GB of scores; skip it (BENCH.md
            # already measured its collapse at 2.9k f/s)
            variants = [v for v in variants if v[0] != "full naive rev"]
        for name, kw in variants:
            cfg = _attn_cfg(base, **kw)
            if mel_len > 1024:
                cfg = dataclasses.replace(
                    cfg, model=dataclasses.replace(cfg.model,
                                                   max_pos=mel_len))
            try:
                step, p0, s0 = _make_step(cfg, batch, token_len, mel_len)
                dt, temp_mb, flops, loss = _time_step(step, p0, s0)
                fps = batch * mel_len / dt
                print(f"b{batch} x {mel_len:5d}  {name:18s} "
                      f"{dt*1e3:8.1f} ms  {fps:9,.0f} f/s  "
                      f"temp {temp_mb:7.0f} MB  MFU "
                      f"{(_mfu(flops, dt) or 0)*100:5.2f}%  loss {loss:.3f}",
                      flush=True)
            except Exception as e:
                print(f"b{batch} x {mel_len:5d}  {name:18s} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
            finally:
                del step, p0, s0


def probe_blocks():
    """Sweep flash (block_q, block_k) at flagship widths: the kernel defaults
    to 512x512 via _pick_block; this measures whether another tile shape is
    faster at the shapes the train step actually runs."""
    from rtts.ops.flash_attention import flash_attend

    print("== flash block-size sweep (h8 d512 bf16 causal+self, "
          "fwd+bwd) ==")
    for L in (1024, 2048, 4096, 8192):
        B = 8 if L <= 4096 else 2
        q = jax.random.normal(jax.random.PRNGKey(1), (B, 8, L, 64),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, 8, L, 64),
                              jnp.bfloat16)
        iters = max(4, 4096 // L * 4)
        results = []
        for bq in (256, 512, 1024, 2048):
            for bk in (256, 512, 1024, 2048):
                if bq > L or bk > L:
                    continue

                def f(q, v):
                    def loss(qq):
                        return jnp.sum(flash_attend(
                            qq, qq, v, causal=True, self_mask=True,
                            sm_scale=0.125, block_q=bq, block_k=bk
                        ).astype(jnp.float32))
                    return jax.grad(loss)(q)

                try:
                    dt = _time_loop(f, q, (v,), iters=iters, repeats=REPEATS)
                except Exception as e:
                    print(f"L={L} bq={bq} bk={bk} FAILED {type(e).__name__}",
                          flush=True)
                    continue
                results.append((dt, bq, bk))
                print(f"L={L:5d} B={B}  bq={bq:4d} bk={bk:4d}  "
                      f"{dt*1e3:7.2f} ms", flush=True)
        if results:
            best = min(results)
            ref = next((r for r in results if r[1] == r[2] == min(512, L)),
                       best)
            print(f"L={L:5d}  BEST bq={best[1]} bk={best[2]} "
                  f"{best[0]*1e3:.2f} ms  (default {ref[0]*1e3:.2f} ms, "
                  f"{ref[0]/best[0]:.2f}x)", flush=True)


def probe_dropout():
    """The BENCH.md attention-probs dropout A/B: in-kernel counter-hash
    dropout vs the old dropout-forces-naive fallback, on the shipped
    flagship step (b8 x 1024)."""
    base = flagship_bench_config()
    print("== train step: flagship b8 x 1024, attention-probs dropout ==")
    for name, kw in (
        ("flash, dropout 0.0", dict(kind="full", flash=True, dropout=0.0)),
        ("flash, dropout 0.1 (in-kernel)",
         dict(kind="full", flash=True, dropout=0.1)),
        ("naive, dropout 0.1 (old fallback)",
         dict(kind="full", flash=False, dropout=0.1)),
    ):
        cfg = _attn_cfg(base, **kw)
        step, p0, s0 = _make_step(cfg, 8, 256, 1024)
        dt, temp_mb, flops, loss = _time_step(step, p0, s0)
        print(f"{name:34s} {dt*1e3:7.1f} ms  {8*1024/dt:9,.0f} f/s  "
              f"temp {temp_mb:7.0f} MB  loss {loss:.3f}", flush=True)
        del step, p0, s0


if __name__ == "__main__":
    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("accuracy", "kernel", "all"):
        probe_accuracy()
    if which in ("kernel", "all"):
        probe_kernel()
    if which in ("train", "all"):
        probe_train()
    if which in ("dropout", "all"):
        probe_dropout()
    if which == "blocks":
        probe_blocks()
