"""Same-process A/B: bf16 vs f8 KV rings inside the continuous-batching
schedulers.

BENCH.md's continuous section ends on "the remaining gap to the oracles is
CACHE BYTES": the fused scheduler reads full-capacity KV rings every step,
and both staged-read probes lost to XLA's buffer handling.  The f8 cache
(``model.kv_cache_dtype: float8_e4m3fn``, measured +18-24% in
``decode_greedy`` where cache reads dominate) halves exactly those ring
bytes — and flows through ``serve_batch`` unchanged because the ring step
uses the same ``_kv_dtype``/``_to_kv`` machinery as the decode loop.

Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/probe_f8_continuous.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtts.bench import _serving_params, _sync, _build, flagship_bench_config
from rtts.infer.serving import serve_pool, serve_batch
from rtts.utils.profiling import enable_compilation_cache

REPEATS = 5
SLOTS = 8
SEG = 64


def main():
    enable_compilation_cache()
    cfg = flagship_bench_config()
    cfg_f8 = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, kv_cache_dtype="float8_e4m3fn"))
    params = _serving_params(cfg, _build(cfg))

    lengths_pool = [128, 256, 512, 1024]
    per_group = 8
    token_len = 128
    rng = np.random.RandomState(0)
    workload = [l for l in lengths_pool for _ in range(per_group)]
    rng.shuffle(workload)
    n = len(workload)
    tokens = np.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (n, token_len), 3, cfg.model.vocab_size),
        np.int32)
    masks = np.ones((n, token_len), bool)
    useful_a = sum(workload)

    # scenario B: unpredictable stops, everyone at the top capacity
    true_b = (64 * rng.randint(2, 1024 // 64 + 1, size=n)).tolist()
    useful_b = sum(true_b)

    fused = jax.jit(serve_batch, static_argnames=(
        "cfg", "capacity_frames", "slots", "segment_frames",
        "stop_threshold"))

    def run_pool(mcfg):
        t0 = time.perf_counter()
        serve_pool(params, mcfg, tokens, masks, workload,
                   class_caps=tuple(lengths_pool), slots=SLOTS,
                   segment_frames=SEG, stop_threshold=2.0,
                   rng=jax.random.PRNGKey(0))
        return time.perf_counter() - t0

    def run_fused(mcfg):
        t0 = time.perf_counter()
        out = fused(params, mcfg, jnp.asarray(tokens), jnp.asarray(masks),
                    jnp.asarray(true_b, jnp.int32), capacity_frames=1024,
                    slots=SLOTS, segment_frames=SEG, stop_threshold=2.0,
                    rng=jax.random.PRNGKey(0))
        _sync(out)
        return time.perf_counter() - t0

    arms = {
        "pool_bf16": lambda: run_pool(cfg.model),
        "pool_f8": lambda: run_pool(cfg_f8.model),
        "fused_bf16": lambda: run_fused(cfg.model),
        "fused_f8": lambda: run_fused(cfg_f8.model),
    }
    for name, fn in arms.items():   # warm every compile path
        t = fn()
        print(f"warm {name}: {t:.3f}s", flush=True)

    best = {k: float("inf") for k in arms}
    for rep in range(REPEATS):      # interleaved
        for name, fn in arms.items():
            best[name] = min(best[name], fn())
        print(f"rep {rep}: " + "  ".join(
            f"{k}={best[k]:.3f}s" for k in arms), flush=True)

    print("\n== results (best-of, same process, interleaved) ==")
    print(f"scenario A pool: bf16 {useful_a / best['pool_bf16']:.0f} f/s, "
          f"f8 {useful_a / best['pool_f8']:.0f} f/s, "
          f"speedup {best['pool_bf16'] / best['pool_f8']:.3f}x")
    print(f"scenario B fused: bf16 {useful_b / best['fused_bf16']:.0f} f/s, "
          f"f8 {useful_b / best['fused_f8']:.0f} f/s, "
          f"speedup {best['fused_bf16'] / best['fused_f8']:.3f}x")


if __name__ == "__main__":
    main()
