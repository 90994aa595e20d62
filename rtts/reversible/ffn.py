"""Chunked feed-forward: bound activation memory over the sequence axis.

Capability parity (SURVEY.md §3.2 "Chunked feed-forward"): LN -> dense(d ->
d_ff) -> act -> dense(d_ff -> d), applied over ``chunk_size`` slices of the
sequence so peak activations are O(chunk * d_ff) instead of O(L * d_ff).

TPU-first: chunking is a ``lax.map`` over a reshaped chunk axis (serialized
by XLA => bounded live range), each chunk a pair of MXU matmuls; a
``jax.checkpoint`` wrapper drops the d_ff-wide intermediate from the backward
residuals as well.  With chunk_size == 0 the plain fused path is used (XLA
already fuses LN + matmul + act + matmul well — chunking only matters when
L * d_ff threatens HBM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtts.nn.layers import activation, dense, dense_init, layer_norm, layer_norm_init


def ffn_init(key, d_model: int, d_ff: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "ln": layer_norm_init(d_model, dtype),
        "w_in": dense_init(k1, d_model, d_ff, dtype=dtype),
        "w_out": dense_init(k2, d_ff, d_model, dtype=dtype),
    }


def _ffn_body(params, x: jnp.ndarray, act_name: str, compute_dtype=None) -> jnp.ndarray:
    h = layer_norm(params["ln"], x)
    h = activation(act_name)(dense(params["w_in"], h, compute_dtype))
    return dense(params["w_out"], h, compute_dtype)


def chunked_ffn(
    params,
    x: jnp.ndarray,
    chunk_size: int = 0,
    act: str = "gelu",
    compute_dtype=None,
) -> jnp.ndarray:
    """x: (B, L, D) -> (B, L, D). Pre-LN FFN, optionally chunked over L."""
    if chunk_size <= 0 or x.shape[-2] <= chunk_size:
        return _ffn_body(params, x, act, compute_dtype)
    b, l, d = x.shape
    if l % chunk_size != 0:
        raise ValueError(f"seq len {l} not a multiple of ffn chunk {chunk_size}")
    n = l // chunk_size
    xs = x.reshape(b, n, chunk_size, d).transpose(1, 0, 2, 3)  # (n, B, c, D)
    body = jax.checkpoint(lambda c: _ffn_body(params, c, act, compute_dtype))
    ys = jax.lax.map(body, xs)
    return ys.transpose(1, 0, 2, 3).reshape(b, l, d)
