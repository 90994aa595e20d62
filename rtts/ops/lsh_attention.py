"""Fused LSH chunk-attend Pallas kernel.

This is the hot stage of the LSH pipeline (SURVEY.md §4.1 HOT LOOP): after
hashing and bucket-sorting, each chunk of ``c`` sorted queries attends its
own chunk plus ``before``/``after`` neighbor chunks.  The jnp reference
(rtts/attention/lsh.py::lsh_attend_chunks) materializes the full
(B, H, nc, c, kc) score tensor in HBM; this kernel keeps scores, masks, and
the softmax entirely in VMEM, writing back only the (c, d) output block and
the (c,) logsumexp per chunk — an O(c*kc) -> O(c*d) HBM traffic reduction
on the attention stage.

Grid: one program per (flattened batch*head*chunk).  Block shapes
(c, d) / (kc, d) are MXU/VPU aligned for c, d multiples of (8, 128)-tiles;
the matmuls hit the MXU via jnp.dot with float32 accumulation.

Gradients: forward runs the kernel; backward recomputes via jax.vjp of the
jnp reference attend (standard remat — bit-compatible because both share
the same masking semantics).  A fused backward kernel is a later
optimization.

Masking semantics are identical to the reference path: key-invalid -> -1e9,
causal (original positions) -> -1e9, self-attention -> -1e5.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend_kernel(q_ref, k_ref, v_ref, qpos_ref, kpos_ref, kval_ref,
                   out_ref, lse_ref, *, causal: bool, mask_value: float,
                   self_mask_value: float):
    q = q_ref[0]            # (c, d)
    k = k_ref[0]            # (kc, d)
    v = v_ref[0]            # (kc, d)
    q_pos = qpos_ref[0]     # (1, c) int32
    k_pos = kpos_ref[0]     # (1, kc) int32
    k_val = kval_ref[0]     # (1, kc) int32 (1 = valid)

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    valid = k_val == 1                       # (1, kc) broadcasts over rows
    scores = jnp.where(valid, scores, mask_value)
    qp = q_pos[0][:, None]                   # (c, 1)
    kp = k_pos                               # (1, kc)
    if causal:
        scores = jnp.where(qp >= kp, scores, mask_value)
    scores = jnp.where(qp == kp, self_mask_value, scores)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0] = (m + jnp.log(s)).reshape(1, -1)
    probs = (e / s).astype(v.dtype)
    out_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _attend_pallas_raw(q, k_adj, v_adj, q_pos, k_pos, k_valid, causal,
                       mask_value, self_mask_value, interpret):
    """q: (N, c, d); k_adj/v_adj: (N, kc, d); positions int32; valid int32.
    Returns (out (N, c, d), lse (N, c))."""
    n, c, d = q.shape
    kc = k_adj.shape[1]
    kernel = functools.partial(_attend_kernel, causal=causal,
                               mask_value=mask_value,
                               self_mask_value=self_mask_value)
    out_shape = (
        jax.ShapeDtypeStruct((n, c, d), q.dtype),
        jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
    )
    grid = (n,)
    # TPU tiling: make every block's trailing dims equal the array dims
    # (positions carried as (n, 1, len) so the (1, len) block is exact)
    block = lambda shape: pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            block((c, d)),
            block((kc, d)),
            block((kc, d)),
            block((1, c)),
            block((1, kc)),
            block((1, kc)),
        ],
        out_specs=(block((c, d)), block((1, c))),
        out_shape=out_shape,
        interpret=interpret,
    )(q, k_adj, v_adj, q_pos[:, None, :], k_pos[:, None, :],
      k_valid[:, None, :])
    return out, lse[:, 0, :]


def _ref_attend(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                mask_value, self_mask_value):
    from rtts.attention.lsh import lsh_attend_chunks

    return lsh_attend_chunks(q_c, k_c, v_c, pos_c, val_c, causal, before,
                             after, mask_value, self_mask_value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _attend_with_vjp(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                     mask_value, self_mask_value, interpret):
    return _forward(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                    mask_value, self_mask_value, interpret)


def _forward(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
             mask_value, self_mask_value, interpret):
    from rtts.attention.lsh import _look_adjacent

    b, h, nc, c, d = q_c.shape
    k_adj = _look_adjacent(k_c, before, after)
    v_adj = _look_adjacent(v_c, before, after)
    k_pos = _look_adjacent(pos_c[..., None], before, after)[..., 0]
    k_val = _look_adjacent(val_c[..., None].astype(jnp.int32), before,
                           after)[..., 0]
    kc = k_adj.shape[-2]
    out, lse = _attend_pallas_raw(
        q_c.reshape(b * h * nc, c, d),
        k_adj.reshape(b * h * nc, kc, d),
        v_adj.reshape(b * h * nc, kc, d),
        pos_c.reshape(b * h * nc, c).astype(jnp.int32),
        k_pos.reshape(b * h * nc, kc).astype(jnp.int32),
        k_val.reshape(b * h * nc, kc),
        causal, mask_value, self_mask_value, interpret)
    return out.reshape(b, h, nc, c, d), lse.reshape(b, h, nc, c)


def _fwd_rule(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
              mask_value, self_mask_value, interpret):
    out = _forward(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                   mask_value, self_mask_value, interpret)
    return out, (q_c, k_c, v_c, pos_c, val_c)


def _bwd_rule(causal, before, after, mask_value, self_mask_value, interpret,
              res, cts):
    q_c, k_c, v_c, pos_c, val_c = res

    def ref(q, k, v):
        return _ref_attend(q, k, v, pos_c, val_c, causal, before, after,
                           mask_value, self_mask_value)

    _, vjp = jax.vjp(ref, q_c, k_c, v_c)
    dq, dk, dv = vjp(cts)
    return dq, dk, dv, None, None


_attend_with_vjp.defvjp(_fwd_rule, _bwd_rule)


def lsh_attend_chunks_pallas(q_c, k_c, v_c, pos_c, val_c, causal,
                             before, after, mask_value=-1e9,
                             self_mask_value=-1e5, interpret=False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for rtts.attention.lsh.lsh_attend_chunks."""
    return _attend_with_vjp(q_c, k_c, v_c, pos_c, val_c, bool(causal),
                            int(before), int(after), float(mask_value),
                            float(self_mask_value), bool(interpret))
