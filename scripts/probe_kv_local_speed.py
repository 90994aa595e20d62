"""kv_local vs kv_full decode speed on the local/LSH-interleaved decoder
(VERDICT r4 #4 — the speed half of the ship-or-reject decision;
fidelity half: scripts/eval_decode_fidelity.py on the same checkpoint).

kv_local keeps a W-slot ring per local layer (W = chunk*(1+before)) so
each step's self-attention reads O(W) cache rows; kv_full reads the
whole O(T) prefix.  The decode cost model (BENCH.md r2) is
bandwidth-bound, so the expected win grows with max_frames.  Same
process, interleaved A/B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_kv_local_speed.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rtts.bench import _sync  # noqa: E402
from rtts.config import load_config  # noqa: E402
from rtts.models import reformer_tts as M  # noqa: E402
from rtts.infer.decode import decode_greedy  # noqa: E402
from rtts.utils.profiling import enable_compilation_cache  # noqa: E402


def time_mode(fn, reps=5):
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    import dataclasses

    from rtts.text import vocab_size

    cfg = load_config("configs/parity_local.yaml")
    mcfg = dataclasses.replace(cfg.model, vocab_size=vocab_size())
    B, TOK = 4, 64
    key = jax.random.PRNGKey(0)
    params = M.init(key, mcfg)
    tokens = jax.random.randint(jax.random.fold_in(key, 1), (B, TOK), 3,
                                mcfg.vocab_size)
    tmask = jnp.ones((B, TOK), bool)

    import functools

    @functools.partial(jax.jit, static_argnames=("mode", "mf"))
    def dec(p, mode, mf):
        memory = M.encode(p, mcfg, tokens, tmask, deterministic=True)
        mel, stops, lens = decode_greedy(p, mcfg, memory, tmask,
                                         max_frames=mf, mode=mode,
                                         stop_threshold=2.0)
        return mel

    for mf in (512, 2048, 4096):
        rows = {}
        for mode in ("kv_full", "kv_local"):
            dt = time_mode(lambda m=mode: dec(params, m, mf))
            rows[mode] = dt
        # interleaved second pass (A/B discipline: alternate, keep best)
        for mode in ("kv_full", "kv_local"):
            dt = time_mode(lambda m=mode: dec(params, m, mf))
            rows[mode] = min(rows[mode], dt)
        r = rows["kv_full"] / rows["kv_local"]
        print(f"max_frames {mf:5d}: kv_full {rows['kv_full']*1e3:8.1f} ms | "
              f"kv_local {rows['kv_local']*1e3:8.1f} ms | "
              f"kv_local speedup {r:.2f}x", flush=True)


if __name__ == "__main__":
    main()
