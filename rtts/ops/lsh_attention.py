"""Fused LSH chunk-attend Pallas kernel.

This is the hot stage of the LSH pipeline (SURVEY.md §4.1 HOT LOOP): after
hashing and bucket-sorting, each chunk of ``c`` sorted queries attends its
own chunk plus ``before``/``after`` neighbor chunks.

Why a kernel at all: the jnp reference
(rtts/attention/lsh.py::lsh_attend_chunks) materializes BOTH the
adjacency-expanded keys/values (2-3x K/V copies via roll+concat) AND the
full (B, H, nc, c, kc) float32 score tensor in HBM — at flagship shapes the
scores alone are ~0.5 GB of read+write traffic.

Kernel structure (v4 — see BENCH.md for the measured history: v1's
one-chunk-per-program grid was launch-overhead bound; v2 serialized on
in-kernel dynamic slices; v3's window concatenation forced the
positions/validity streams into (…, c, 1)-shaped blocks whose tile padding
made their DMAs ~25x slower than the math):
- grid (B*H, nc / CB): each program owns CB consecutive sorted chunks.
- each neighbor offset comes in as its OWN set of host-rolled streams
  (roll by -off on the chunk axis — XLA emits cheap copies), so every
  block is a plain (1, CB, c, d) / (1, CB, c) tile-aligned slab with an
  affine index map and NOTHING is ever concatenated or sliced on a tiled
  dimension inside the kernel.
- the softmax is accumulated ACROSS offsets flash-attention style
  (running max / sum / weighted output), entirely in VMEM, in float32;
  only the (CB, c, d) output and (CB, c) logsumexp leave the kernel.

Masking semantics are identical to the reference path: key-invalid -> -1e9,
causal (original positions) -> -1e9, self-attention -> -1e5.  MXU matmuls
accumulate in float32 (measured 10x closer to an f32-highest oracle than
XLA's bf16 einsum path).

Backward: a fused kernel with the same per-offset streams recomputes the
joint softmax (multi-pass over the resident score blocks) and emits dQ
plus per-offset dK/dV, un-rolled and summed host-side.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scoped-VMEM ceiling for the kernels (v5e has 128M physical)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

# chunk block: 8 keeps the (1, CB, c) position blocks tile-legal
# (second-minor divisible by 8) while amortizing program launches
_CB = 8


def _offsets(before: int, after: int):
    return list(range(-before, after + 1))


def _attend_kernel(*refs, n_off: int, causal: bool, mask_value: float,
                   self_mask_value: float):
    """refs: q, qpos, then per offset (k, v, kpos, kval); outs (out, lse)."""
    q_ref, qpos_ref = refs[0], refs[1]
    out_ref, lse_ref = refs[-2], refs[-1]
    q = q_ref[0]                                     # (cb, c, d)
    qp = qpos_ref[0]                                 # (cb, c)

    m = None
    s = None
    acc = None
    for o in range(n_off):
        k = refs[2 + 4 * o][0]
        v = refs[3 + 4 * o][0]
        kp = refs[4 + 4 * o][0]
        kv = refs[5 + 4 * o][0]
        sc = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (cb, c, c)
        sc = jnp.where((kv == 1)[:, None, :], sc, mask_value)
        if causal:
            sc = jnp.where(qp[:, :, None] >= kp[:, None, :], sc, mask_value)
        sc = jnp.where(qp[:, :, None] == kp[:, None, :], self_mask_value, sc)
        m_o = jnp.max(sc, axis=-1, keepdims=True)    # (cb, c, 1)
        if m is None:
            m = m_o
            e = jnp.exp(sc - m)
            s = jnp.sum(e, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            m_new = jnp.maximum(m, m_o)
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(sc - m_new)
            s = s * alpha + jnp.sum(e, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m = m_new
    lse_ref[0] = m + jnp.log(s)                      # (cb, c, 1)
    out_ref[0] = (acc / s).astype(out_ref.dtype)


def _roll_chunks(x, off):
    """chunk i of the result = chunk i+off of x (wrapping)."""
    return x if off == 0 else jnp.roll(x, -off, axis=1)


def _attend_pallas_raw(q, k, v, q_pos, k_pos, k_valid, causal, before,
                       after, mask_value, self_mask_value, interpret):
    """q/k/v: (N, nc, c, d) chunk rows (N = B*H); positions/valid
    (N, nc, c) int32.  Returns (out (N, nc, c, d), lse (N, nc, c))."""
    n, nc, c, d = q.shape
    cb = _CB
    offs = _offsets(before, after)
    kernel = functools.partial(
        _attend_kernel, n_off=len(offs), causal=causal,
        mask_value=mask_value, self_mask_value=self_mask_value)
    nb = nc // cb
    blk = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (i, j, 0, 0)) if len(shape) == 4
        else (lambda i, j: (i, j, 0)), memory_space=pltpu.VMEM)
    b3 = blk((1, cb, c, d))
    b2 = blk((1, cb, c))
    b1 = blk((1, cb, c, 1))
    args = [q, q_pos]
    specs = [b3, b2]
    for off in offs:
        args += [_roll_chunks(k, off), _roll_chunks(v, off),
                 _roll_chunks(k_pos, off), _roll_chunks(k_valid, off)]
        specs += [b3, b3, b2, b2]
    out, lse = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=specs,
        out_specs=(b3, b1),
        out_shape=(jax.ShapeDtypeStruct((n, nc, c, d), q.dtype),
                   jax.ShapeDtypeStruct((n, nc, c, 1), jnp.float32)),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return out, lse[..., 0]


def _ref_attend(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                mask_value, self_mask_value):
    from rtts.attention.lsh import lsh_attend_chunks

    return lsh_attend_chunks(q_c, k_c, v_c, pos_c, val_c, causal, before,
                             after, mask_value, self_mask_value)


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------


def _attend_bwd_kernel(*refs, n_off: int, causal: bool, mask_value: float,
                       self_mask_value: float):
    """refs: q, qpos, per-offset (k, v, kpos, kval), dout, dlse;
    outs: dq, then per-offset (dk_o, dv_o).

    Softmax backward with BOTH cotangents (output and logsumexp):
        dS = P * (dP - rowsum(dP * P)) + P * dlse
    where dP = dO @ V^T.  Hard-masked entries have P == 0 (dS == 0
    automatically); SELF entries were overwritten with a constant (-1e5):
    P_self > 0 while d(score)/d(inputs) == 0, so dS is zeroed there.  The
    V path does not pass through the `where`s, so dV keeps all entries.
    The joint softmax over all offsets is recomputed in VMEM (pass 1:
    masked scores + joint max; pass 2: probabilities + rowsum; pass 3:
    gradients)."""
    q_ref, qpos_ref = refs[0], refs[1]
    dout_ref = refs[2 + 4 * n_off]
    dlse_ref = refs[3 + 4 * n_off]
    dq_ref = refs[4 + 4 * n_off]
    q = q_ref[0].astype(jnp.float32)
    qp = qpos_ref[0]
    dout = dout_ref[0].astype(jnp.float32)
    dlse = dlse_ref[0]                               # (cb, c, 1)

    scs = []
    selfs = []
    m = None
    for o in range(n_off):
        k = refs[2 + 4 * o][0].astype(jnp.float32)
        kp = refs[4 + 4 * o][0]
        kv = refs[5 + 4 * o][0]
        sc = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        sc = jnp.where((kv == 1)[:, None, :], sc, mask_value)
        if causal:
            sc = jnp.where(qp[:, :, None] >= kp[:, None, :], sc, mask_value)
        self_m = qp[:, :, None] == kp[:, None, :]
        sc = jnp.where(self_m, self_mask_value, sc)
        scs.append(sc)
        selfs.append(self_m)
        m_o = jnp.max(sc, axis=-1, keepdims=True)
        m = m_o if m is None else jnp.maximum(m, m_o)

    s = None
    for o in range(n_off):
        e = jnp.exp(scs[o] - m)
        scs[o] = e
        se = jnp.sum(e, axis=-1, keepdims=True)
        s = se if s is None else s + se

    row = None
    dps = []
    for o in range(n_off):
        p = scs[o] / s
        scs[o] = p
        v = refs[3 + 4 * o][0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            dout, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dps.append(dp)
        r_o = jnp.sum(dp * p, axis=-1, keepdims=True)
        row = r_o if row is None else row + r_o

    dq = None
    for o in range(n_off):
        p = scs[o]
        ds = p * (dps[o] - row) + p * dlse
        ds = jnp.where(selfs[o], 0.0, ds)
        k = refs[2 + 4 * o][0].astype(jnp.float32)
        dq_o = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq = dq_o if dq is None else dq + dq_o
        refs[5 + 4 * n_off + 2 * o][0] = jax.lax.dot_general(
            ds.transpose(0, 2, 1), q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(q_ref.dtype)
        refs[6 + 4 * n_off + 2 * o][0] = jax.lax.dot_general(
            p.transpose(0, 2, 1), dout, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(q_ref.dtype)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _attend_bwd_pallas_raw(q, k, v, q_pos, k_pos, k_valid, dout,
                           dlse, causal, before, after, mask_value,
                           self_mask_value, interpret):
    n, nc, c, d = q.shape
    cb = _CB
    offs = _offsets(before, after)
    kernel = functools.partial(
        _attend_bwd_kernel, n_off=len(offs), causal=causal,
        mask_value=mask_value, self_mask_value=self_mask_value)
    blk = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (i, j, 0, 0)) if len(shape) == 4
        else (lambda i, j: (i, j, 0)), memory_space=pltpu.VMEM)
    b3 = blk((1, cb, c, d))
    b2 = blk((1, cb, c))
    b1 = blk((1, cb, c, 1))
    args = [q, q_pos]
    specs = [b3, b2]
    for off in offs:
        args += [_roll_chunks(k, off), _roll_chunks(v, off),
                 _roll_chunks(k_pos, off), _roll_chunks(k_valid, off)]
        specs += [b3, b3, b2, b2]
    args += [dout, dlse[..., None]]
    specs += [b3, b1]
    out_specs = tuple([b3] * (1 + 2 * len(offs)))
    out_shape = [jax.ShapeDtypeStruct((n, nc, c, d), q.dtype)]
    for _ in offs:
        out_shape += [jax.ShapeDtypeStruct((n, nc, c, d), k.dtype),
                      jax.ShapeDtypeStruct((n, nc, c, d), v.dtype)]
    res = pl.pallas_call(
        kernel,
        grid=(n, nc // cb),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    dq = res[0]
    dk = None
    dv = None
    for i, off in enumerate(offs):
        # forward rolled inputs by -off; vjp rolls the grads back by +off
        dk_o = res[1 + 2 * i] if off == 0 else jnp.roll(res[1 + 2 * i], off,
                                                        axis=1)
        dv_o = res[2 + 2 * i] if off == 0 else jnp.roll(res[2 + 2 * i], off,
                                                        axis=1)
        dk = dk_o if dk is None else dk + dk_o
        dv = dv_o if dv is None else dv + dv_o
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _attend_with_vjp(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                     mask_value, self_mask_value, interpret):
    return _forward(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                    mask_value, self_mask_value, interpret)


def _forward(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
             mask_value, self_mask_value, interpret):
    b, h, nc, c, d = q_c.shape
    n = b * h
    out, lse = _attend_pallas_raw(
        q_c.reshape(n, nc, c, d),
        k_c.reshape(n, nc, c, d),
        v_c.reshape(n, nc, c, d),
        pos_c.reshape(n, nc, c).astype(jnp.int32),
        pos_c.reshape(n, nc, c).astype(jnp.int32),
        val_c.reshape(n, nc, c).astype(jnp.int32),
        causal, before, after, mask_value, self_mask_value, interpret)
    return out.reshape(b, h, nc, c, d), lse.reshape(b, h, nc, c)


def _fwd_rule(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
              mask_value, self_mask_value, interpret):
    out = _forward(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                   mask_value, self_mask_value, interpret)
    return out, (q_c, k_c, v_c, pos_c, val_c)


def _bwd_rule(causal, before, after, mask_value, self_mask_value, interpret,
              res, cts):
    q_c, k_c, v_c, pos_c, val_c = res
    dout, dlse = cts
    b, h, nc, c, d = q_c.shape
    n = b * h
    pos = pos_c.reshape(n, nc, c).astype(jnp.int32)
    dq, dk, dv = _attend_bwd_pallas_raw(
        q_c.reshape(n, nc, c, d),
        k_c.reshape(n, nc, c, d),
        v_c.reshape(n, nc, c, d),
        pos, pos,
        val_c.reshape(n, nc, c).astype(jnp.int32),
        dout.reshape(n, nc, c, d),
        dlse.reshape(n, nc, c).astype(jnp.float32),
        causal, before, after, mask_value, self_mask_value, interpret)
    shape = (b, h, nc, c, d)
    return (dq.reshape(shape), dk.reshape(shape), dv.reshape(shape),
            None, None)


_attend_with_vjp.defvjp(_fwd_rule, _bwd_rule)


def lsh_attend_chunks_pallas(q_c, k_c, v_c, pos_c, val_c, causal,
                             before, after, mask_value=-1e9,
                             self_mask_value=-1e5, interpret=False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for rtts.attention.lsh.lsh_attend_chunks.

    Falls back to the jnp path when the chunk count doesn't tile into
    blocks of _CB (= 8, the tile-legal minimum for the position blocks)."""
    b, h, nc, c, d = q_c.shape
    if nc % _CB != 0:
        return _ref_attend(q_c, k_c, v_c, pos_c, val_c, causal, before,
                           after, mask_value, self_mask_value)
    return _attend_with_vjp(q_c, k_c, v_c, pos_c, val_c, bool(causal),
                            int(before), int(after), float(mask_value),
                            float(self_mask_value), bool(interpret))
