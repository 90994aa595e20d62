"""Postnet probe (r5 roofline follow-up): the postnet is the ONE train-step
part measured under its own byte-roofline (48.7% ach at b8x512 — BENCH.md
r5 roofline table).  Its convs are k=5 full-channel conv1d; this A/Bs the
shipped `lax.conv_general_dilated` lowering against a shifted-matmul
formulation (k explicit MXU matmuls over T-shifted slices), conv-alone and
full-postnet fwd+bwd, same-process.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_postnet.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtts.bench import _time_loop, flagship_bench_config  # noqa: E402
from rtts.models import reformer_tts as M  # noqa: E402
from rtts.nn.conv import conv1d, conv1d_init  # noqa: E402
from rtts.utils.profiling import enable_compilation_cache  # noqa: E402


def conv1d_mm(params, x, compute_dtype=None):
    """SAME-padding conv1d as k shifted matmuls (MXU-native formulation)."""
    w = params["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    k = w.shape[0]
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    t = x.shape[1]
    y = None
    for j in range(k):
        xs = jax.lax.dynamic_slice_in_dim(xp, j, t, axis=1)
        term = jnp.einsum("btc,cd->btd", xs, w[j])
        y = term if y is None else y + term
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    cfg = flagship_bench_config()
    mcfg = cfg.model
    cdt = jnp.bfloat16
    B, T = 8, 512

    # conv alone (the 512->512 middle-layer shape), fwd+bwd wrt x
    p = conv1d_init(jax.random.PRNGKey(0), 512, 512, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 512))

    def mk(fn):
        def g(xx, pp):
            return jax.grad(lambda v: jnp.sum(
                fn(pp, v, compute_dtype=cdt).astype(jnp.float32) ** 2))(xx)
        return g

    # numeric parity first (bf16 matmul class)
    a = conv1d(p, x, compute_dtype=cdt).astype(jnp.float32)
    b = conv1d_mm(p, x, compute_dtype=cdt).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"conv parity rel-max|d| {err:.2e}", flush=True)

    for name, fn in (("lax.conv", conv1d), ("shifted-mm", conv1d_mm)):
        dt = _time_loop(mk(fn), x, (p,), iters=16, repeats=5)
        print(f"conv 512x512 k5 fwd+bwd [{name}]: {dt*1e3:.3f} ms", flush=True)

    # full postnet fwd+bwd, shipped vs patched conv
    params = M.init(jax.random.PRNGKey(2), mcfg)
    mel = jax.random.normal(jax.random.PRNGKey(3), (B, T, mcfg.n_mels))
    mmask = jnp.ones((B, T), bool)
    rng = jax.random.PRNGKey(4)

    def post(fn):
        def g(mm, pp):
            import rtts.models.reformer_tts as RM
            import rtts.nn.conv as C
            orig = C.conv1d, RM.conv1d
            C.conv1d = RM.conv1d = fn
            try:
                def f(v):
                    return jnp.sum(RM.postnet_apply(
                        pp["postnet"], mcfg, v, rng=rng, deterministic=False,
                        compute_dtype=cdt, frame_mask=mmask
                    ).astype(jnp.float32) ** 2)
                return jax.grad(f)(mm)
            finally:
                C.conv1d, RM.conv1d = orig
        return g

    for name, fn in (("lax.conv", conv1d), ("shifted-mm", conv1d_mm)):
        dt = _time_loop(post(fn), mel, (params,), iters=16, repeats=5)
        print(f"postnet fwd+bwd [{name}]: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
