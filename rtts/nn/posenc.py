"""Positional encodings: scaled sinusoidal and axial factorized embeddings.

Capability parity:
- ``ScaledPositionalEncoding`` — sinusoidal table times a learnable scalar
  alpha (Transformer-TTS convention; SURVEY.md §3.1 #8).
- Axial positional embeddings — position space factorized into a 2-D grid
  ``axial_pos_shape=(d1, d2)`` with two learnable factors whose feature dims
  sum to d_model, broadcast and reshaped to the sequence (SURVEY.md §3.2
  "Axial positional embeddings"): O(sqrt(L)) parameters for long sequences.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) interleaved sin/cos table."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    dim = np.arange(0, d_model, 2, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, dim / d_model)
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(angle)
    table[:, 1::2] = np.cos(angle[:, : d_model // 2])
    return table


def scaled_posenc_init(max_len: int, d_model: int, dtype=jnp.float32):
    return {
        "alpha": jnp.ones((), dtype),
        # table is a constant buffer (kept in params pytree for simplicity;
        # excluded from weight decay by being named 'table')
        "table": jnp.asarray(sinusoidal_table(max_len, d_model), dtype),
    }


def scaled_posenc(params, x: jnp.ndarray, offset: int = 0) -> jnp.ndarray:
    """x: (..., L, d) -> x + alpha * PE[offset:offset+L]."""
    L = x.shape[-2]
    pe = jax.lax.dynamic_slice_in_dim(params["table"], offset, L, axis=0)
    return x + params["alpha"].astype(x.dtype) * pe.astype(x.dtype)


def axial_posenc_init(key, shape: Tuple[int, int], dims: Tuple[int, int], dtype=jnp.float32):
    d1, d2 = shape
    f1, f2 = dims
    k1, k2 = jax.random.split(key)
    return {
        "ax1": jax.random.normal(k1, (d1, 1, f1), dtype) * 0.02,
        "ax2": jax.random.normal(k2, (1, d2, f2), dtype) * 0.02,
    }


def axial_posenc(params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, d) with L <= d1*d2 -> x + axial embedding (truncated to L)."""
    ax1, ax2 = params["ax1"], params["ax2"]
    d1, _, f1 = ax1.shape
    _, d2, f2 = ax2.shape
    L = x.shape[-2]
    if L > d1 * d2:
        raise ValueError(f"sequence {L} exceeds axial capacity {d1 * d2}")
    emb = jnp.concatenate(
        [jnp.broadcast_to(ax1, (d1, d2, f1)), jnp.broadcast_to(ax2, (d1, d2, f2))],
        axis=-1,
    ).reshape(d1 * d2, f1 + f2)
    return x + emb[:L].astype(x.dtype)
