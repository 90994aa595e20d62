"""Depthwise 1-D convolution Pallas kernel (SqueezeWave WN hot op).

SqueezeWave's WN runs depthwise-separable convs on squeezed audio — short
time axis (L = samples / n_group), wide channel axis.  The depthwise stage
is bandwidth-bound elementwise work (K multiply-adds per element, K small);
this kernel computes it as K shifted fused multiply-adds over a VMEM block,
one grid step per batch row, with SAME zero padding resolved by row masks
instead of a padded HBM copy.

Layout note: operates on (B, L, C) with C as the lane axis — C is the wide
dim in SqueezeWave (wn_channels), so lanes stay full.

Backward recomputes via jax.vjp of the XLA reference conv (remat pattern).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtts.nn.conv import conv1d


def _dw_kernel(x_ref, w_ref, b_ref, out_ref, *, kernel_size: int):
    # accumulate in f32 (also required: Mosaic's dynamic_rotate only
    # supports 32-bit element types, so bf16 inputs are upcast first)
    x = x_ref[0].astype(jnp.float32)             # (L, C)
    l = x.shape[0]
    acc = jnp.zeros_like(x)
    half = (kernel_size - 1) // 2
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    for k in range(kernel_size):
        off = k - half
        # x shifted so out[t] += w[k] * x[t + off]; rolled rows out of range
        # are masked to zero (SAME zero padding)
        shifted = pltpu.roll(x, (-off) % l, 0)  # roll requires shift >= 0
        valid = (row + off >= 0) & (row + off < l)
        acc = acc + jnp.where(valid, shifted, 0.0) * w_ref[k].astype(jnp.float32)
    out_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _dw_pallas_raw(x, w, b, interpret):
    """x: (B, L, C); w: (K, C); b: (C,)"""
    bsz, l, c = x.shape
    k = w.shape[0]
    kernel = functools.partial(_dw_kernel, kernel_size=k)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, l, c), x.dtype),
        interpret=interpret,
    )(x, w, b[None])


def _ref_dw(x, w3, b):
    # w3: (K, 1, C) grouped-conv layout
    c = x.shape[-1]
    return conv1d({"w": w3, "b": b}, x, padding="SAME", groups=c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dw_with_vjp(x, w3, b, interpret):
    return _dw_pallas_raw(x, w3[:, 0, :], b, interpret)


def _dw_fwd(x, w3, b, interpret):
    return _dw_pallas_raw(x, w3[:, 0, :], b, interpret), (x, w3, b)


def _dw_bwd(interpret, res, ct):
    x, w3, b = res
    _, vjp = jax.vjp(_ref_dw, x, w3, b)
    return vjp(ct)


_dw_with_vjp.defvjp(_dw_fwd, _dw_bwd)


def depthwise_conv1d_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                            interpret: Optional[bool] = None) -> jnp.ndarray:
    """x (B, L, C), w (K, 1, C) [conv1d grouped layout], b (C,) -> (B, L, C).

    SAME padding, stride 1 — the SqueezeWave WN depthwise stage."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _dw_with_vjp(x, w, b, bool(interpret))
