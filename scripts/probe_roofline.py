"""Complete bytes+FLOPs roofline attribution of the flagship train step
(VERDICT r4 #2 — closes the r2 "train-step byte diet" item with numbers).

For every part of the b8x512 and b8x1024 steps this reports:
  measured ms | GFLOP | MB accessed | t_MXU | t_HBM | roofline ms | ach %
where t_MXU = FLOPs / peak (197 TF bf16 on v5e), t_HBM = bytes / the
SAME-PROCESS measured copy bandwidth, roofline = max(t_MXU, t_HBM), and
ach % = roofline / measured (100% = the part runs at the hardware limit
for its own byte/FLOP counts).

Byte counts come from XLA cost analysis of the compiled (post-fusion)
HLO — the closest available proxy for actual HBM traffic — plus the
analytic byte counts of flash-attention Mosaic calls (opaque to XLA;
see rtts/ops/flash_attention.py::track_flops).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_roofline.py
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "scripts")
from probe_flash import _make_step, _time_step  # noqa: E402

from rtts.bench import (  # noqa: E402
    _build,
    _device_peak_flops,
    _sync,
    _time_loop,
    flagship_bench_config,
)
from rtts.models import reformer_tts as M  # noqa: E402
from rtts.ops.flash_attention import track_flops  # noqa: E402
from rtts.train.losses import make_stop_target, tts_loss  # noqa: E402
from rtts.train.optim import make_optimizer  # noqa: E402
from rtts.utils.profiling import enable_compilation_cache  # noqa: E402


def cost_of(fn, *args):
    """(flops, hbm_bytes) of the compiled fn: XLA cost analysis plus the
    flash tracker's analytic counts for Mosaic custom calls."""
    with track_flops() as t:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    d = ca if isinstance(ca, dict) else ca[0]
    return (float(d.get("flops", 0.0)) + t.flops,
            float(d.get("bytes accessed", 0.0)) + t.bytes)


def measure_bw():
    """Same-process effective HBM copy bandwidth (read+write bytes/s)."""
    x = jnp.zeros((64, 1024, 1024), jnp.float32)          # 268 MB

    def cp(v):
        return v + 1.0

    dt = _time_loop(cp, x, iters=8, repeats=5)
    return 2.0 * x.size * 4 / dt


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    peak = _device_peak_flops() or 197e12
    bw = measure_bw()
    print(f"peak bf16 {peak/1e12:.0f} TF/s, measured copy BW "
          f"{bw/1e9:.1f} GB/s (read+write)", flush=True)

    for B, TOK, MEL in ((8, 128, 512), (8, 256, 1024)):
        print(f"\n=== b{B} x {MEL} (tokens {TOK}) ===", flush=True)
        run_shape(B, TOK, MEL, peak, bw)


def report(name, dt, fl, by, peak, bw):
    t_mxu = fl / peak
    t_hbm = by / bw
    roof = max(t_mxu, t_hbm)
    print(f"{name:30s} {dt*1e3:8.2f} ms {fl/1e9:9.1f} GF {by/1e6:9.0f} MB"
          f"  mxu {t_mxu*1e3:6.2f}  hbm {t_hbm*1e3:6.2f}"
          f"  roof {roof*1e3:6.2f} ms  ach {100*roof/dt:5.1f}%",
          flush=True)
    return roof


def run_shape(B, TOK, MEL, peak, bw):
    cfg = flagship_bench_config()
    params = _build(cfg)
    cdt = jnp.bfloat16
    mcfg = cfg.model

    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, TOK), 3,
                                mcfg.vocab_size)
    tmask = jnp.ones((B, TOK), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, MEL, mcfg.n_mels))
    mmask = jnp.ones((B, MEL), bool)
    rng = jax.random.PRNGKey(3)

    # ---- full step --------------------------------------------------------
    step, p0, s0 = _make_step(cfg, B, TOK, MEL)
    dt_step, _, _, _ = _time_step(step, p0, s0)
    fl, by = cost_of(getattr(step, "__wrapped__", step), p0, s0, rng)
    roof_full = report("full train step", dt_step, fl, by, peak, bw)
    print(f"{'':30s} headroom vs roofline: "
          f"{100*(1 - roof_full/dt_step):.1f}%", flush=True)
    del step, p0, s0

    # ---- fwd+bwd vs optimizer decomposition --------------------------------
    def loss_of(mel_in, p):
        pre, post, stop = M.forward(p, mcfg, tokens, tmask, mel_in,
                                    mmask, rng=rng, deterministic=False)
        return tts_loss(pre, post, stop, mel_in,
                        make_stop_target(mmask), mmask)[0]

    def vg(mel_in, p):
        return jax.grad(lambda mm: loss_of(mm, p))(mel_in)

    dt = _time_loop(vg, mel, (params,), iters=8, repeats=5)
    fl, by = cost_of(vg, mel, params)
    report("loss fwd+bwd (wrt mel)", dt, fl, by, peak, bw)

    optimizer = make_optimizer(cfg.experiment.optim)
    opt_state = optimizer.init(params)

    def opt_only(g, p, s):
        upd, s2 = optimizer.update(g, s)
        return optax.apply_updates(p, upd)

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    dt = _time_loop(opt_only, grads, (params, opt_state), iters=16, repeats=5)
    fl, by = cost_of(opt_only, grads, params, opt_state)
    report("optimizer update+apply", dt, fl, by, peak, bw)

    # ---- fine parts --------------------------------------------------------
    def enc(p, x_tokens):
        def f(pp):
            memory = M.encode(pp, mcfg, x_tokens, tmask, rng=rng,
                              deterministic=False)
            return jnp.sum(memory.astype(jnp.float32) ** 2)
        return jax.grad(f)(p)

    dt = _time_loop(enc, params, (tokens,), iters=8, repeats=5)
    fl, by = cost_of(enc, params, tokens)
    report("encoder stack fwd+bwd", dt, fl, by, peak, bw)

    def post(mel_in, p):
        def f(mm):
            return jnp.sum(M.postnet_apply(p["postnet"], mcfg, mm,
                                           rng=rng, deterministic=False,
                                           compute_dtype=cdt,
                                           frame_mask=mmask
                                           ).astype(jnp.float32) ** 2)
        return jax.grad(f)(mel_in)

    dt = _time_loop(post, mel, (params,), iters=8, repeats=5)
    fl, by = cost_of(post, mel, params)
    report("postnet fwd+bwd", dt, fl, by, peak, bw)

    # one decoder self-attn sublayer fwd+bwd at the shipped impl choice
    from rtts.attention.full import (
        attention_init,
        cross_attention,
        shared_qk_self_attention,
    )
    from rtts.nn.layers import layer_norm, layer_norm_init
    from rtts.ops.flash_attention import resolve_flash_impl

    st = mcfg.decoder
    a = st.attention
    n_groups = MEL // mcfg.reduction_factor
    ap = attention_init(jax.random.PRNGKey(9), st.d_model, a.num_heads,
                        a.head_dim, shared_qk=True)
    lnp = layer_norm_init(st.d_model)
    h = jax.random.normal(jax.random.PRNGKey(10), (B, n_groups, st.d_model))
    impl = resolve_flash_impl(a.flash, n_groups, n_groups)

    def attn(hh, p, lp):
        def f(v):
            y = shared_qk_self_attention(
                p, layer_norm(lp, v), causal=st.causal,
                num_heads=a.num_heads, compute_dtype=cdt, impl=impl)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f)(hh)

    dt = _time_loop(attn, h, (ap, lnp), iters=16, repeats=5)
    fl, by = cost_of(attn, h, ap, lnp)
    report(f"one dec self-attn ({impl})", dt, fl, by, peak, bw)
    print(f"{'':30s} x{st.num_layers} layers: {dt*st.num_layers*1e3:.2f} ms",
          flush=True)

    # one FFN sublayer fwd+bwd (shipped: unchunked under plain residuals)
    from rtts.reversible.ffn import chunked_ffn, ffn_init

    fp = ffn_init(jax.random.PRNGKey(7), st.d_model, st.d_ff)
    x = jax.random.normal(jax.random.PRNGKey(8), (B, n_groups, st.d_model))

    def ffn(xx, p):
        def f(v):
            return jnp.sum(chunked_ffn(
                p, v, chunk_size=0, act=st.ffn_activation,
                compute_dtype=cdt).astype(jnp.float32) ** 2)
        return jax.grad(f)(xx)

    dt = _time_loop(ffn, x, (fp,), iters=16, repeats=5)
    fl, by = cost_of(ffn, x, fp)
    report("one FFN sublayer", dt, fl, by, peak, bw)
    print(f"{'':30s} x{2*st.num_layers} sublayers: "
          f"{dt*2*st.num_layers*1e3:.2f} ms", flush=True)

    # one cross-attn sublayer fwd+bwd
    memory = jax.random.normal(jax.random.PRNGKey(11), (B, TOK, st.d_model))
    cp = attention_init(jax.random.PRNGKey(12), st.d_model, a.num_heads,
                        a.head_dim, shared_qk=False)
    cross_impl = resolve_flash_impl(a.flash, n_groups, TOK)

    def cross(hh, p, lp, mem):
        def f(v):
            y = cross_attention(p, layer_norm(lp, v), mem,
                                memory_mask=tmask, num_heads=a.num_heads,
                                compute_dtype=cdt, impl=cross_impl)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(f)(hh)

    dt = _time_loop(cross, h, (cp, lnp, memory), iters=16, repeats=5)
    fl, by = cost_of(cross, h, cp, lnp, memory)
    report("one cross-attn sublayer", dt, fl, by, peak, bw)
    print(f"{'':30s} x{st.num_layers} layers: {dt*st.num_layers*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
