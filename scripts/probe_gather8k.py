"""Probe: 8k-longform LSH sort-gather variants (VERDICT r3 item 1).

The one-hot MXU permutation wins 2.6x at 537 MB but decays (1.14x at
1.1 GB, 1.07x at 2.1 GB) and the 8.6 GB 8k operand was never measured
(auto rule keeps 8k on take_along_axis).  This probe measures, at the
longform_8k dims (b2 h8 d64 nh4 L8192 c64, packed qk+v width 128 bf16):

  take          shipped take_along_axis row gather
  oh_full       one einsum, full (bh, nh*L, L) one-hot   [8.6 GB]
  oh_round      lax.map over hash rounds, (bh, L, L) one-hot each [2.1 GB]
  oh_chunk4k    lax.map over destination chunks of 4096   [1.1 GB]
  oh_chunk2k    ... of 2048                               [537 MB]
  width sweep   take_along_axis at row widths 64/128/256/512 cols
                (is the 9 GB/s effective bandwidth row-transaction-bound?)

fwd = gather only; fwd+bwd = gather + its cotangent (scatter-add for
take, transposed matmul for one-hot) via jax.grad of a quadratic loss.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/rtts_jax_cache \
      python scripts/probe_gather8k.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, H, NH, L, D = 2, 8, 4, 8192, 64
W = 2 * D          # packed qk+v row width
BH = B * H
S = NH * L


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])
    return x


def time_loop(fn, x, extra=(), iters=8, repeats=4):
    loop = jax.jit(lambda x0, *rest: jax.lax.fori_loop(
        0, iters, lambda i, xx: fn(xx, *rest), x0))
    _sync(loop(x, *extra))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(loop(x, *extra))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


# --- gather variants: packed (BH, L, W) , idx (BH, S) -> (BH, S, W) ----------

def g_take(packed, idx):
    return jnp.take_along_axis(packed, idx[..., None], axis=1)


def g_oh_full(packed, idx):
    oh = (idx[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
          ).astype(packed.dtype)
    return jnp.einsum("bsl,blw->bsw", oh, packed)


def g_oh_round(packed, idx):
    idx_r = idx.reshape(BH, NH, L).transpose(1, 0, 2)    # (NH, BH, L)

    def one(ir):
        oh = (ir[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
              ).astype(packed.dtype)
        return jnp.einsum("bsl,blw->bsw", oh, packed)

    out = jax.lax.map(one, idx_r)                        # (NH, BH, L, W)
    return out.transpose(1, 0, 2, 3).reshape(BH, S, W)


def g_oh_chunk(packed, idx, sc):
    idx_c = idx.reshape(BH, S // sc, sc).transpose(1, 0, 2)  # (K, BH, sc)

    def one(ic):
        oh = (ic[..., None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
              ).astype(packed.dtype)
        return jnp.einsum("bsl,blw->bsw", oh, packed)

    out = jax.lax.map(one, idx_c)                        # (K, BH, sc, W)
    return out.transpose(1, 0, 2, 3).reshape(BH, S, W)


def main():
    print(f"devices: {jax.devices()}  dims b{B} h{H} nh{NH} L{L} d{D}")
    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (BH, L, W), jnp.bfloat16)
    # realistic permutation: per-(bh, round) random perm of L
    rows = []
    for i in range(BH):
        per = [np.random.RandomState(1000 + i * NH + r).permutation(L)
               for r in range(NH)]
        rows.append(np.concatenate(per))
    idx = jnp.asarray(np.stack(rows), jnp.int32)         # (BH, S)

    variants = {
        "take": g_take,
        "oh_round": g_oh_round,
        "oh_chunk4k": functools.partial(g_oh_chunk, sc=4096),
        "oh_chunk2k": functools.partial(g_oh_chunk, sc=2048),
        "oh_full": g_oh_full,
    }
    out_bytes = BH * S * W * 2
    print(f"gather output {out_bytes / 1e6:.0f} MB")
    results = {}
    for name, fn in variants.items():
        # fwd: keep a data dependency on EVERY output row (sum over rounds
        # folds (BH,S,W) back to packed shape for loop chaining)
        def fwd(p, ix, f=fn):
            g = f(p, ix).reshape(BH, NH, L, W)
            return p + 0.001 * g.sum(axis=1).astype(p.dtype)

        def fwdbwd(p, ix, f=fn):
            loss = lambda q: (f(q, ix).astype(jnp.float32) ** 2).sum()
            return p - 0.001 * jax.grad(loss)(p).astype(p.dtype)

        try:
            t_f = time_loop(fwd, packed, (idx,))
            t_fb = time_loop(fwdbwd, packed, (idx,))
            results[name] = (t_f, t_fb)
            print(f"{name:12s} fwd {t_f * 1e3:8.2f} ms "
                  f"({out_bytes / t_f / 1e9:6.1f} GB/s)   "
                  f"fwd+bwd {t_fb * 1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # width sweep: is take_along_axis row-transaction-bound?
    print("\nwidth sweep (take_along_axis, same S rows):")
    for w in (64, 128, 256, 512):
        pw = jax.random.normal(key, (BH, L, w), jnp.bfloat16)

        def fwd_w(p, ix):
            g = jnp.take_along_axis(p, ix[..., None], axis=1)
            return p + 0.001 * g.reshape(BH, NH, L, w).sum(axis=1).astype(
                p.dtype)

        t = time_loop(fwd_w, pw, (idx,))
        by = BH * S * w * 2
        print(f"  width {w:4d} ({by / 1e6:6.0f} MB): {t * 1e3:7.2f} ms "
              f"({by / t / 1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
