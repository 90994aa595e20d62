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


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------


def _attend_bwd_kernel(q_ref, k_ref, v_ref, qpos_ref, kpos_ref, kval_ref,
                       dout_ref, dlse_ref, dq_ref, dk_ref, dv_ref, *,
                       causal: bool, mask_value: float,
                       self_mask_value: float):
    """Recompute the masked softmax in VMEM and produce dQ/dK/dV directly.

    Softmax backward with BOTH cotangents (output and logsumexp):
        dS = P * (dP - rowsum(dP * P)) + P * dlse
    where dP = dO @ V^T.  Gradient gating through the masking `where`s:
    hard-masked entries have P == 0 (so dS == 0 automatically), but the
    SELF entries were overwritten with a constant (-1e5): P_self > 0 while
    d(score)/d(inputs) == 0, so dS at self entries is zeroed explicitly.
    The V path does not pass through the `where`s, so dV keeps all entries.
    """
    q = q_ref[0].astype(jnp.float32)            # (c, d)
    k = k_ref[0].astype(jnp.float32)            # (kc, d)
    v = v_ref[0].astype(jnp.float32)            # (kc, d)
    q_pos = qpos_ref[0]                          # (1, c)
    k_pos = kpos_ref[0]                          # (1, kc)
    k_val = kval_ref[0]                          # (1, kc)
    dout = dout_ref[0].astype(jnp.float32)       # (c, d)
    dlse = dlse_ref[0]                           # (1, c) f32

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    valid = k_val == 1
    scores = jnp.where(valid, scores, mask_value)
    qp = q_pos[0][:, None]
    kp = k_pos
    if causal:
        scores = jnp.where(qp >= kp, scores, mask_value)
    self_m = qp == kp
    scores = jnp.where(self_m, self_mask_value, scores)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)   # (c, kc)

    dv_ref[0] = jnp.dot(p.T, dout, preferred_element_type=jnp.float32
                        ).astype(dv_ref.dtype)
    dp = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) + p * dlse[0][:, None]
    ds = jnp.where(self_m, 0.0, ds)              # constant-overwritten slots
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32
                        ).astype(dq_ref.dtype)
    dk_ref[0] = jnp.dot(ds.T, q, preferred_element_type=jnp.float32
                        ).astype(dk_ref.dtype)


def _attend_bwd_pallas_raw(q, k_adj, v_adj, q_pos, k_pos, k_valid, dout,
                           dlse, causal, mask_value, self_mask_value,
                           interpret):
    n, c, d = q.shape
    kc = k_adj.shape[1]
    kernel = functools.partial(_attend_bwd_kernel, causal=causal,
                               mask_value=mask_value,
                               self_mask_value=self_mask_value)
    block = lambda shape: pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            block((c, d)), block((kc, d)), block((kc, d)),
            block((1, c)), block((1, kc)), block((1, kc)),
            block((c, d)), block((1, c)),
        ],
        out_specs=(block((c, d)), block((kc, d)), block((kc, d))),
        out_shape=(
            jax.ShapeDtypeStruct((n, c, d), q.dtype),
            jax.ShapeDtypeStruct((n, kc, d), k_adj.dtype),
            jax.ShapeDtypeStruct((n, kc, d), v_adj.dtype),
        ),
        interpret=interpret,
    )(q, k_adj, v_adj, q_pos[:, None, :], k_pos[:, None, :],
      k_valid[:, None, :], dout, dlse[:, None, :])


def _unlook_adjacent(x_adj: jnp.ndarray, before: int, after: int,
                     c: int) -> jnp.ndarray:
    """VJP of _look_adjacent: split the expanded key axis back into the
    window slices and roll each gradient slice back to its source chunk."""
    if before == 0 and after == 0:
        return x_adj
    slices = jnp.split(x_adj, before + after + 1, axis=-2)
    out = None
    for s, off in zip(slices, range(-before, after + 1)):
        # forward used roll(x, shift=-off); vjp rolls by +off
        contrib = jnp.roll(s, shift=off, axis=-3)
        out = contrib if out is None else out + contrib
    return out


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
    from rtts.attention.lsh import _look_adjacent

    q_c, k_c, v_c, pos_c, val_c = res
    dout, dlse = cts
    b, h, nc, c, d = q_c.shape
    k_adj = _look_adjacent(k_c, before, after)
    v_adj = _look_adjacent(v_c, before, after)
    k_pos = _look_adjacent(pos_c[..., None], before, after)[..., 0]
    k_val = _look_adjacent(val_c[..., None].astype(jnp.int32), before,
                           after)[..., 0]
    kc = k_adj.shape[-2]
    n = b * h * nc
    dq, dk_adj, dv_adj = _attend_bwd_pallas_raw(
        q_c.reshape(n, c, d),
        k_adj.reshape(n, kc, d),
        v_adj.reshape(n, kc, d),
        pos_c.reshape(n, c).astype(jnp.int32),
        k_pos.reshape(n, kc).astype(jnp.int32),
        k_val.reshape(n, kc),
        dout.reshape(n, c, d),
        dlse.reshape(n, c).astype(jnp.float32),
        causal, mask_value, self_mask_value, interpret)
    dq = dq.reshape(b, h, nc, c, d)
    dk = _unlook_adjacent(dk_adj.reshape(b, h, nc, kc, d), before, after, c)
    dv = _unlook_adjacent(dv_adj.reshape(b, h, nc, kc, d), before, after, c)
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
