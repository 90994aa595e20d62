"""Reversible residual sequence with O(1) activation memory in depth.

Capability parity (SURVEY.md §3.2 "Reversible residual layers", §4.5): two
streams
    Y1 = X1 + f(X2)        (attention sublayer)
    Y2 = X2 + g(Y1)        (feed-forward / cross-attention sublayer)
run forward without saving intermediates; the backward pass reconstructs
    X2 = Y2 - g(Y1),   X1 = Y1 - f(X2)
layer-by-layer in reverse, re-running f and g under ``jax.vjp``.

TPU-native translation of the reference's torch autograd.Function machinery:
- torch's per-layer CUDA-RNG seed stashing for dropout replay dissolves into
  stateless PRNG keys threaded through ``aux`` — replaying is free.
- LSH bucket caching (the reference re-uses forward buckets in backward to
  avoid re-hash divergence) maps to the ``cache`` value each f returns in
  forward and receives in backward.
- The whole thing is a ``jax.custom_vjp``: only (Y1, Y2, caches, aux) are
  saved as residuals; XLA sees a single fused forward with no stashed
  activations.

f signature: f(params, x, memory, aux_layer, cache) -> (out, cache)
g signature: g(params, y, memory, aux_layer) -> out

``memory`` is differentiable context (encoder output for cross-attention;
may be None).  ``aux_layer`` is non-differentiable context (masks, PRNG
keys); cotangents for it are float0.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes


def _zero_cot(x):
    """Zero cotangent matching jax's convention (float0 for non-inexact)."""
    aval = jax.typeof(x)
    if dtypes.issubdtype(aval.dtype, jnp.inexact):
        return jnp.zeros(aval.shape, aval.dtype)
    return np.zeros(aval.shape, dtypes.float0)


def _add_cot(a, b):
    def one(x, y):
        if isinstance(x, np.ndarray) and x.dtype == dtypes.float0:
            return x
        return x + y

    return jax.tree.map(one, a, b)


def make_reversible(layer_fns: Sequence[Tuple[Callable, Callable]]):
    """Build a reversible-sequence function for a static list of (f, g) pairs.

    Returns run(params_list, x1, x2, memory, aux_list) -> (y1, y2), where
    params_list and aux_list have one entry per layer.
    """
    layer_fns = tuple(layer_fns)

    def _fwd_only(params_list, x1, x2, memory, aux_list):
        caches = []
        for (f, g), p, aux in zip(layer_fns, params_list, aux_list):
            fx, cache = f(p["f"], x2, memory, aux, None)
            y1 = x1 + fx
            y2 = x2 + g(p["g"], y1, memory, aux)
            x1, x2 = y1, y2
            caches.append(cache)
        return x1, x2, caches

    @jax.custom_vjp
    def run(params_list, x1, x2, memory, aux_list):
        y1, y2, _ = _fwd_only(params_list, x1, x2, memory, aux_list)
        return y1, y2

    def run_fwd(params_list, x1, x2, memory, aux_list):
        y1, y2, caches = _fwd_only(params_list, x1, x2, memory, aux_list)
        return (y1, y2), (params_list, y1, y2, memory, aux_list, caches)

    def run_bwd(res, cts):
        params_list, y1, y2, memory, aux_list, caches = res
        dy1, dy2 = cts
        dparams: List[Any] = [None] * len(layer_fns)
        dmemory = jax.tree.map(_zero_cot, memory)
        for i in range(len(layer_fns) - 1, -1, -1):
            f, g = layer_fns[i]
            p, aux, cache = params_list[i], aux_list[i], caches[i]

            # -- g sublayer: reconstruct X2 and backprop through g ----------
            def g_fn(pg, y1_, mem_):
                return g(pg, y1_, mem_, aux)

            gy, vjp_g = jax.vjp(g_fn, p["g"], y1, memory)
            x2 = y2 - gy
            # stream cotangents ride f32; sublayers may emit bf16 — match
            # the vjp's expected cotangent dtype, accumulate back in f32
            dpg, dy1_from_g, dmem_g = vjp_g(dy2.astype(gy.dtype))
            dy1 = dy1 + dy1_from_g.astype(dy1.dtype)
            dmemory = _add_cot(dmemory, dmem_g)

            # -- f sublayer: reconstruct X1, re-run f with cached state -----
            def f_fn(pf, x2_, mem_):
                out, _ = f(pf, x2_, mem_, aux, cache)
                return out

            fx, vjp_f = jax.vjp(f_fn, p["f"], x2, memory)
            x1 = y1 - fx
            dpf, dx2_from_f, dmem_f = vjp_f(dy1.astype(fx.dtype))
            dx2 = dy2 + dx2_from_f.astype(dy2.dtype)
            dmemory = _add_cot(dmemory, dmem_f)

            dparams[i] = {"f": dpf, "g": dpg}
            y1, y2 = x1, x2
            dy1, dy2 = dy1, dx2
        daux = jax.tree.map(_zero_cot, aux_list)
        return (dparams, dy1, dy2, dmemory, daux)

    run.defvjp(run_fwd, run_bwd)
    return run


def reversible_sequence(layer_fns, params_list, x, memory, aux_list,
                        reversible: bool = True):
    """Run a stack of (f, g) residual pairs over x: (B, L, D).

    reversible=True: two-stream scheme (input duplicated, output = stream
    mean — the reference duplicates [h; h] entering the stack and reduces at
    the end, SURVEY.md §3.2 "Stream plumbing").
    reversible=False: ordinary single-stream residuals with the same f/g
    (identical math when f/g are deterministic; used for small models and as
    the gradient-parity oracle in tests).
    """
    if reversible:
        run = make_reversible(layer_fns)
        y1, y2 = run(params_list, x, x, memory, aux_list)
        return (y1 + y2) * 0.5
    h1, h2 = x, x
    for (f, g), p, aux in zip(layer_fns, params_list, aux_list):
        h1 = h1 + f(p["f"], h2, memory, aux, None)[0]
        h2 = h2 + g(p["g"], h1, memory, aux)
    return (h1 + h2) * 0.5
