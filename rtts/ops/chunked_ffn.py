"""Fused chunked feed-forward Pallas kernel: LN -> dense(d->f) -> act ->
dense(f->d) in one VMEM-resident pass per sequence block.

The jnp path (rtts/reversible/ffn.py) relies on XLA fusion but still
round-trips the (chunk, d_ff) intermediate through HBM between the two
matmuls at larger shapes; this kernel keeps the intermediate in VMEM.
Block size over the flattened (B*L) row axis is the memory knob — the
direct Pallas expression of the reference's ``chunk_size_feed_forward``
(SURVEY.md §3.2 "Chunked feed-forward").

Weights are held resident in VMEM across grid steps (constant index_map),
so the kernel is valid while (d*f + f*d) * 4B fits the VMEM budget —
checked at call time with a jnp fallback.

Backward: recompute via jax.vjp of the jnp reference (remat), same pattern
as the LSH kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtts.nn.layers import activation

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom of the ~16MB per core


def _ffn_kernel(x_ref, scale_ref, bias_ref, win_ref, bin_ref, wout_ref,
                bout_ref, out_ref, *, act: str, eps: float, mxu_dtype):
    x = x_ref[:].astype(jnp.float32)                       # (R, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + eps)
    h = h * scale_ref[0] + bias_ref[0]                     # (R, d)
    # MXU multiplies in the configured compute dtype, f32 accumulation
    h = h.astype(mxu_dtype)
    mid = jnp.dot(h, win_ref[:].astype(mxu_dtype),
                  preferred_element_type=jnp.float32)
    mid = mid + bin_ref[0]
    mid = activation(act)(mid).astype(mxu_dtype)
    out = jnp.dot(mid, wout_ref[:].astype(mxu_dtype),
                  preferred_element_type=jnp.float32)
    out_ref[:] = (out + bout_ref[0]).astype(out_ref.dtype)


def _ffn_pallas_raw(x2d, ln_scale, ln_bias, w_in, b_in, w_out, b_out,
                    act: str, row_block: int, interpret: bool, eps: float,
                    mxu_dtype=jnp.float32):
    n, d = x2d.shape
    f = w_in.shape[1]
    grid = (pl.cdiv(n, row_block),)
    kernel = functools.partial(_ffn_kernel, act=act, eps=eps,
                               mxu_dtype=mxu_dtype)
    vec = lambda dim: pl.BlockSpec((1, dim), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d),
            full((d, f)), vec(f),
            full((f, d)), vec(d),
        ],
        out_specs=pl.BlockSpec((row_block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        interpret=interpret,
    )(x2d, ln_scale[None], ln_bias[None], w_in, b_in[None], w_out,
      b_out[None])


def _ref_ffn(params, x, act):
    from rtts.reversible.ffn import _ffn_body

    return _ffn_body(params, x, act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _ffn_with_vjp(params, x, act, row_block, interpret, mxu_dtype_name):
    return _ffn_forward(params, x, act, row_block, interpret, mxu_dtype_name)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _ffn_forward(params, x, act, row_block, interpret, mxu_dtype_name):
    b, l, d = x.shape
    x2d = x.reshape(b * l, d)
    out = _ffn_pallas_raw(
        x2d, params["ln"]["scale"], params["ln"]["bias"],
        params["w_in"]["w"], params["w_in"]["b"],
        params["w_out"]["w"], params["w_out"]["b"],
        act, row_block, interpret, 1e-5, _DTYPES[mxu_dtype_name])
    return out.reshape(b, l, d)


def _ffn_fwd(params, x, act, row_block, interpret, mxu_dtype_name):
    out = _ffn_forward(params, x, act, row_block, interpret, mxu_dtype_name)
    return out, (params, x)


def _ffn_bwd(act, row_block, interpret, mxu_dtype_name, res, ct):
    params, x = res
    # the kernel emits x.dtype; the jnp reference may promote dtype via the
    # f32 weights — pin its output dtype so the cotangent types line up
    _, vjp = jax.vjp(lambda p, xx: _ref_ffn(p, xx, act).astype(x.dtype),
                     params, x)
    dp, dx = vjp(ct)
    return dp, dx


_ffn_with_vjp.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_fits_vmem(d: int, f: int, row_block: int, bytes_per: int = 4) -> bool:
    weights = (d * f + f * d) * bytes_per
    acts = row_block * (2 * d + f) * bytes_per
    return weights + acts < _VMEM_BUDGET


def chunked_ffn_pallas(params, x: jnp.ndarray, act: str = "gelu",
                       row_block: int = 256,
                       interpret: Optional[bool] = None,
                       mxu_dtype: str = "bfloat16") -> jnp.ndarray:
    """Drop-in fused FFN: x (B, L, D) -> (B, L, D).  MXU multiplies run in
    ``mxu_dtype`` with f32 accumulation; LN and the output stay f32-exact.
    Falls back to the jnp path when shapes don't fit the VMEM budget or
    rows don't tile."""
    b, l, d = x.shape
    f = params["w_in"]["w"].shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n = b * l
    if n % row_block != 0:
        row_block = next((rb for rb in (128, 64, 32, 16, 8)
                          if n % rb == 0), None)
    if row_block is None or not ffn_fits_vmem(d, f, row_block):
        return _ref_ffn(params, x, act)
    return _ffn_with_vjp(params, x, act, row_block, bool(interpret),
                         mxu_dtype)
