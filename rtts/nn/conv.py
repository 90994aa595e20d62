"""1-D convolutions (standard / grouped / depthwise) on (batch, time, chan).

Capability parity: the reference leans on ATen conv1d for encoder prenet,
postnet, and SqueezeWave's depthwise-separable WN convs (SURVEY.md §3.1 #8,
#11, §3.3 row 1).  Implemented on ``lax.conv_general_dilated`` with NTC
layout — XLA:TPU lowers this onto the MXU; a fused Pallas depthwise variant
lives in rtts/ops for the vocoder hot path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def conv1d_params_shape(d_in: int, d_out: int, kernel: int, groups: int = 1):
    return (kernel, d_in // groups, d_out)


def conv1d_init(key, d_in: int, d_out: int, kernel: int, groups: int = 1,
                use_bias: bool = True, dtype=jnp.float32):
    fan_in = (d_in // groups) * kernel
    scale = 1.0 / math.sqrt(fan_in)
    w = jax.random.normal(key, conv1d_params_shape(d_in, d_out, kernel, groups), dtype) * scale
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def conv1d(params, x: jnp.ndarray, stride: int = 1, padding: str = "SAME",
           groups: int = 1, dilation: int = 1, causal: bool = False,
           compute_dtype=None) -> jnp.ndarray:
    """x: (batch, time, d_in) -> (batch, time', d_out).

    ``causal=True`` left-pads so output[t] sees only inputs <= t.
    """
    w = params["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    kernel = w.shape[0]
    if causal:
        pad = (kernel - 1) * dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        padding = "VALID"
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=groups,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y
