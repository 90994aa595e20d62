"""Where does the flagship train step's time go?

Same-process timing of the full step vs its parts at the shipped shapes
(b8 x 1024 tokens 256, base.yaml, flash plain).  The flash sweep says
decoder self-attention is ~15 ms of the ~78 ms step and the analytic
FLOPs put the MXU-perfect floor near ~11 ms — this probe attributes the
rest (FFN, postnet convs, prenets/losses, optimizer, backward overhead)
so optimization keeps following evidence.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_step_parts.py
"""

import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "scripts")
from probe_flash import _make_step, _time_step  # noqa: E402

from rtts.bench import _build, _time_loop, flagship_bench_config
from rtts.models import reformer_tts as M
from rtts.train.losses import make_stop_target, tts_loss
from rtts.train.optim import make_optimizer
from rtts.utils.profiling import enable_compilation_cache

B, TOK, MEL = 8, 256, 1024


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    cfg = flagship_bench_config()
    params = _build(cfg)
    cdt = jnp.bfloat16

    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, TOK), 3,
                                cfg.model.vocab_size)
    tmask = jnp.ones((B, TOK), bool)
    mel = jax.random.normal(jax.random.PRNGKey(2), (B, MEL, cfg.model.n_mels))
    mmask = jnp.ones((B, MEL), bool)
    rng = jax.random.PRNGKey(3)

    def report(name, dt):
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)

    # 1. full train step (fwd+bwd+Adam)
    step, p0, s0 = _make_step(cfg, B, TOK, MEL)
    dt_step, temp_mb, _, _ = _time_step(step, p0, s0)
    report("full train step", dt_step)
    print(f"{'':34s} temp {temp_mb:.0f} MB", flush=True)

    # 1b. full step with UNCHUNKED FFN (ffn_chunk_size=0 both stacks):
    # plain residuals don't need the chunk's remat; lax.map serializes
    import dataclasses

    def no_chunk(stack):
        return dataclasses.replace(stack, ffn_chunk_size=0)

    cfg_u = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, encoder=no_chunk(cfg.model.encoder),
        decoder=no_chunk(cfg.model.decoder)))
    step_u, pu, su = _make_step(cfg_u, B, TOK, MEL)
    dt_u_step, temp_u, _, _ = _time_step(step_u, pu, su)
    report("full step, ffn_chunk 0", dt_u_step)
    print(f"{'':34s} temp {temp_u:.0f} MB", flush=True)
    del step_u, pu, su

    # (a bf16 residual-stream variant was probed here and REJECTED:
    # 77.1 vs 70.6 ms — the f32<->bf16 round-trips around the f32 LN
    # internals break XLA fusion and cost more than the stream bytes
    # save; BENCH.md r3 "step parts")

    # 2. loss forward only (_time_loop chains x-shaped carries: broadcast
    # the scalar loss back onto the mel carry)
    def loss_of(mel_in, p):
        pre, post, stop = M.forward(p, cfg.model, tokens, tmask, mel_in,
                                    mmask, rng=rng, deterministic=False)
        return tts_loss(pre, post, stop, mel_in,
                        make_stop_target(mmask), mmask)[0]

    def fwd_loss(mel_in, p):
        return mel_in * 0.999 + loss_of(mel_in, p) * 1e-6

    report("loss forward only",
           _time_loop(fwd_loss, mel, (params,), iters=8, repeats=5))

    # 3. value_and_grad (no optimizer)
    def vg(mel_in, p):
        return jax.grad(lambda mm: loss_of(mm, p))(mel_in)

    report("loss fwd+bwd (no optim)",
           _time_loop(vg, mel, (params,), iters=8, repeats=5))

    # 4. optimizer alone (update+apply on a grads-shaped tree)
    optimizer = make_optimizer(cfg.experiment.optim)
    opt_state = optimizer.init(params)

    def opt_only(g, p, s):
        upd, s2 = optimizer.update(g, s)
        return optax.apply_updates(p, upd)   # params-shaped == grads-shaped

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    report("optimizer update+apply",
           _time_loop(opt_only, grads, (params, opt_state),
                      iters=16, repeats=5))

    # 5. encoder fwd+bwd (params are the carry: grads are params-shaped)
    def enc(p, x_tokens):
        def f(pp):
            memory = M.encode(pp, cfg.model, x_tokens, tmask, rng=rng,
                              deterministic=False)
            return jnp.sum(memory.astype(jnp.float32) ** 2)
        return jax.grad(f)(p)

    report("encoder stack fwd+bwd",
           _time_loop(enc, params, (tokens,), iters=8, repeats=5))

    # 6. postnet fwd+bwd
    def post(mel_in, p):
        def f(mm):
            return jnp.sum(M.postnet_apply(p["postnet"], cfg.model, mm,
                                           rng=rng, deterministic=False,
                                           compute_dtype=cdt,
                                           frame_mask=mmask
                                           ).astype(jnp.float32) ** 2)
        return jax.grad(f)(mel_in)

    report("postnet fwd+bwd",
           _time_loop(post, mel, (params,), iters=8, repeats=5))

    # 7. one decoder FFN sublayer fwd+bwd: shipped chunking (lax.map +
    # remat over 256-frame chunks) vs one unchunked matmul
    from rtts.reversible.ffn import chunked_ffn, ffn_init

    st = cfg.model.decoder
    fp = ffn_init(jax.random.PRNGKey(7), st.d_model, st.d_ff)
    x = jax.random.normal(jax.random.PRNGKey(8), (B, MEL, st.d_model))

    def ffn(chunk):
        def g(xx, p):
            def f(v):
                return jnp.sum(chunked_ffn(
                    p, v, chunk_size=chunk, act=st.ffn_activation,
                    compute_dtype=cdt).astype(jnp.float32) ** 2)
            return jax.grad(f)(xx)
        return g

    from rtts.config import AUTO_FFN_CHUNK

    chunk = (AUTO_FFN_CHUNK if st.ffn_chunk_size == "auto"
             else st.ffn_chunk_size)
    dt_c = _time_loop(ffn(chunk), x, (fp,), iters=16, repeats=5)
    dt_u = _time_loop(ffn(0), x, (fp,), iters=16, repeats=5)
    report(f"one FFN sublayer (chunk {chunk})", dt_c)
    report("one FFN sublayer (unchunked)", dt_u)
    report("  -> x12 layers, chunked", dt_c * 12)
    report("  -> x12 layers, unchunked", dt_u * 12)


if __name__ == "__main__":
    main()
