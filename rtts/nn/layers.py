"""Core functional layers over plain pytrees of arrays.

Design stance (SURVEY.md §8): no module framework — params are nested dicts,
layers are ``*_init(key, ...) -> params`` + pure ``apply(params, x) -> y``
pairs.  This keeps every transform (jit / grad / vmap / shard_map / scan)
trivially applicable and the whole framework self-contained.

Dtype policy: params live in ``param_dtype`` (float32); compute casts inputs
to the params' dtype of the caller-chosen compute dtype at the model level.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# -- dense --------------------------------------------------------------------


def dense_init(key, d_in: int, d_out: int, use_bias: bool = True, dtype=jnp.float32):
    # LeCun-normal fan-in init (jax default for dense layers)
    scale = 1.0 / math.sqrt(d_in)
    w = jax.random.normal(key, (d_in, d_out), dtype) * scale
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def dense(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w = params["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = x @ w
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


# -- layer norm ---------------------------------------------------------------


def layer_norm_init(d: int, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # normalize in float32 for stability regardless of compute dtype
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# -- embedding ----------------------------------------------------------------


def embedding_init(key, vocab: int, d: int, dtype=jnp.float32):
    return {"table": jax.random.normal(key, (vocab, d), dtype) * (d ** -0.5)}


def embedding(params, ids: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    table = params["table"]
    if compute_dtype is not None:
        table = table.astype(compute_dtype)
    return jnp.take(table, ids, axis=0)


# -- dropout ------------------------------------------------------------------


def dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    """Stateless dropout.  ``deterministic=True`` (eval) or rate==0 is identity.

    Replaces the reference's CUDA-RNG seed stashing for reversible recompute
    (SURVEY.md §3.3 last row): passing the same key reproduces the same mask.
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# -- activations --------------------------------------------------------------


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
}


def activation(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; options: {sorted(ACTIVATIONS)}")


# -- decoder prenet MLP (bottleneck with always-on dropout) --------------------


def prenet_mlp_init(key, d_in: int, d_hidden: int, d_out: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": dense_init(k1, d_in, d_hidden, dtype=dtype),
        "fc2": dense_init(k2, d_hidden, d_out, dtype=dtype),
    }


def prenet_mlp(params, x, key, rate: float, always_dropout: bool = True,
               deterministic: bool = False, compute_dtype=None):
    """Transformer-TTS decoder prenet: 2-layer ReLU MLP whose dropout stays
    active even at inference (the standard trick for AR mel stability;
    Transformer-TTS lineage, SURVEY.md §3.1 #8)."""
    det = deterministic and not always_dropout
    k1, k2 = jax.random.split(key) if key is not None else (None, None)
    h = jax.nn.relu(dense(params["fc1"], x, compute_dtype))
    h = dropout(k1, h, rate, det)
    h = jax.nn.relu(dense(params["fc2"], h, compute_dtype))
    h = dropout(k2, h, rate, det)
    return h
