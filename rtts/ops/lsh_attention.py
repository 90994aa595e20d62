"""Fused LSH chunk-attend Pallas kernel.

This is the hot stage of the LSH pipeline (SURVEY.md §4.1 HOT LOOP): after
hashing and bucket-sorting, each chunk of ``c`` sorted queries attends its
own chunk plus ``before``/``after`` neighbor chunks.

Why a kernel at all: the jnp reference
(rtts/attention/lsh.py::lsh_attend_chunks) materializes BOTH the
adjacency-expanded keys/values (2-3x K/V copies via roll+concat) AND the
full (B, H, nc, c, kc) float32 score tensor in HBM — at flagship shapes the
scores alone are ~0.5 GB of read+write traffic, which is where all the XLA
path's time goes (measured bandwidth-bound).

Kernel structure (v3; v1's one-chunk-per-program grid was overhead
dominated and v2's VMEM-resident rows serialized on dynamic slices —
both LOST to XLA; measured in BENCH.md):
- grid (B*H, nc / CB): each program owns CB consecutive sorted chunks.
- the neighbor chunks come in as two extra K/V BLOCKS fetched through
  (j±1 mod nblocks) BlockSpec index maps — the modulo also realizes
  _look_adjacent's circular wraparound, so there is NO adjacency
  materialization in HBM and no dynamic slicing in the kernel.
- per-chunk windows are assembled with static slices and attended with ONE
  batched dot_general over the CB chunks (MXU, f32 accumulation).
- scores, masks, softmax live entirely in VMEM; only the (CB, c, d) output
  and (CB, c) logsumexp blocks are written back.
HBM traffic: Q + 3K + 3V + O + lse, fully pipelined by the grid.

Masking semantics are identical to the reference path: key-invalid -> -1e9,
causal (original positions) -> -1e9, self-attention -> -1e5.  MXU matmuls
accumulate in float32.

Backward: a fused kernel with the same row-resident structure recomputes
the masked softmax in VMEM and emits dQ directly plus dK/dV in the
adjacency-expanded layout (reduced back by ``_unlook_adjacent`` — one
cheap HBM pass, still no score-tensor traffic).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _build_windows(prev, main, nxt, before, after):
    """Per-chunk neighbor windows from three consecutive chunk blocks.

    prev/main/nxt: (cb, c, ...) — the program's cb chunks plus its two
    neighbor BLOCKS (fetched via (j±1) mod nblocks BlockSpec index maps,
    which also realizes the circular wraparound of _look_adjacent).
    Returns (cb, w*c, ...) where chunk i's window is chunks
    [i-before .. i+after] in _look_adjacent order.  All slices are static:
    offset ``off`` contributes ext[cb+off : 2*cb+off]."""
    cb = main.shape[0]
    ext = jnp.concatenate([prev, main, nxt], axis=0)      # (3cb, c, ...)
    parts = [jax.lax.slice_in_dim(ext, cb + off, 2 * cb + off, axis=0)
             for off in range(-before, after + 1)]
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _attend_kernel(q_ref, k_ref, kp_ref, kn_ref, v_ref, vp_ref, vn_ref,
                   qpos_ref, kpos_ref, kpp_ref, kpn_ref,
                   kval_ref, kvp_ref, kvn_ref,
                   out_ref, lse_ref, *, before: int, after: int,
                   causal: bool, mask_value: float, self_mask_value: float):
    q = q_ref[0]                                      # (cb, c, d)
    k_win = _build_windows(kp_ref[0], k_ref[0], kn_ref[0], before, after)
    v_win = _build_windows(vp_ref[0], v_ref[0], vn_ref[0], before, after)
    # positions/validity ride a trailing singleton dim so the chunk axis is
    # untiled (Mosaic: slicing/concat must not offset a tiled dimension)
    kp = _build_windows(kpp_ref[0], kpos_ref[0], kpn_ref[0], before,
                        after)[..., 0]                # (cb, wc)
    kv = _build_windows(kvp_ref[0], kval_ref[0], kvn_ref[0], before,
                        after)[..., 0]
    qp = qpos_ref[0][..., 0]                          # (cb, c)

    # one batched MXU matmul over the cb chunks: (cb, c, d) x (cb, wc, d)
    scores = jax.lax.dot_general(
        q, k_win, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (cb, c, wc)
    scores = jnp.where((kv == 1)[:, None, :], scores, mask_value)
    if causal:
        scores = jnp.where(qp[:, :, None] >= kp[:, None, :], scores,
                           mask_value)
    scores = jnp.where(qp[:, :, None] == kp[:, None, :], self_mask_value,
                       scores)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0] = m + jnp.log(s)                       # (cb, c, 1)
    probs = (e / s).astype(v_win.dtype)
    out_ref[0] = jax.lax.dot_general(
        probs, v_win, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


# scoped-VMEM ceiling for the kernels (v5e has 128M physical; the batched
# dot_general's window assembly scales with cb, so the default 16M is tight)
_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pick_cb(nc: int, before: int, after: int) -> int:
    # larger cb amortizes program launches; scoped VMEM grows ~linearly in
    # cb (~4M/chunk at c=d=64 bf16), kept under _VMEM_LIMIT by the cap
    for cb in (8, 4, 2, 1):
        if nc % cb == 0 and cb >= before and cb >= after:
            return cb
    return 0


def _attend_pallas_raw(q, k, v, q_pos, k_pos, k_valid, causal, before,
                       after, mask_value, self_mask_value, interpret):
    """q/k/v: (N, nc, c, d) chunk rows (N = B*H); positions/valid
    (N, nc, c) int32.  Returns (out (N, nc, c, d), lse (N, nc, c))."""
    n, nc, c, d = q.shape
    cb = _pick_cb(nc, before, after)
    kernel = functools.partial(
        _attend_kernel, before=before, after=after, causal=causal,
        mask_value=mask_value, self_mask_value=self_mask_value)
    nb = nc // cb
    grid = (n, nb)
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    m3 = blk((1, cb, c, d), lambda i, j: (i, j, 0, 0))
    p3 = blk((1, cb, c, d), lambda i, j: (i, (j + nb - 1) % nb, 0, 0))
    n3 = blk((1, cb, c, d), lambda i, j: (i, (j + 1) % nb, 0, 0))
    m1 = blk((1, cb, c, 1), lambda i, j: (i, j, 0, 0))
    p1 = blk((1, cb, c, 1), lambda i, j: (i, (j + nb - 1) % nb, 0, 0))
    n1 = blk((1, cb, c, 1), lambda i, j: (i, (j + 1) % nb, 0, 0))
    qp4 = q_pos[..., None]
    kp4 = k_pos[..., None]
    kv4 = k_valid[..., None]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[m3, m3, p3, n3, m3, p3, n3,
                  m1, m1, p1, n1, m1, p1, n1],
        out_specs=(m3, m1),
        out_shape=(jax.ShapeDtypeStruct((n, nc, c, d), q.dtype),
                   jax.ShapeDtypeStruct((n, nc, c, 1), jnp.float32)),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(q, k, k, k, v, v, v, qp4, kp4, kp4, kp4, kv4, kv4, kv4)
    return out, lse[..., 0]


def _ref_attend(q_c, k_c, v_c, pos_c, val_c, causal, before, after,
                mask_value, self_mask_value):
    from rtts.attention.lsh import lsh_attend_chunks

    return lsh_attend_chunks(q_c, k_c, v_c, pos_c, val_c, causal, before,
                             after, mask_value, self_mask_value)


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------


def _attend_bwd_kernel(q_ref, k_ref, kp_ref, kn_ref, v_ref, vp_ref, vn_ref,
                       qpos_ref, kpos_ref, kpp_ref, kpn_ref,
                       kval_ref, kvp_ref, kvn_ref, dout_ref, dlse_ref,
                       dq_ref, dk_ref, dv_ref, *, before: int, after: int,
                       causal: bool, mask_value: float,
                       self_mask_value: float):
    """Recompute the masked softmax in VMEM and produce dQ directly plus
    dK/dV in the adjacency-expanded (wc = (1+before+after)*c) layout.

    Softmax backward with BOTH cotangents (output and logsumexp):
        dS = P * (dP - rowsum(dP * P)) + P * dlse
    where dP = dO @ V^T.  Gradient gating through the masking `where`s:
    hard-masked entries have P == 0 (so dS == 0 automatically), but the
    SELF entries were overwritten with a constant (-1e5): P_self > 0 while
    d(score)/d(inputs) == 0, so dS at self entries is zeroed explicitly.
    The V path does not pass through the `where`s, so dV keeps all entries.
    """
    q = q_ref[0].astype(jnp.float32)                  # (cb, c, d)
    k_win = _build_windows(kp_ref[0], k_ref[0], kn_ref[0], before, after
                           ).astype(jnp.float32)      # (cb, wc, d)
    v_win = _build_windows(vp_ref[0], v_ref[0], vn_ref[0], before, after
                           ).astype(jnp.float32)
    kp = _build_windows(kpp_ref[0], kpos_ref[0], kpn_ref[0], before,
                        after)[..., 0]
    kv = _build_windows(kvp_ref[0], kval_ref[0], kvn_ref[0], before,
                        after)[..., 0]
    qp = qpos_ref[0][..., 0]
    dout = dout_ref[0].astype(jnp.float32)            # (cb, c, d)
    dlse = dlse_ref[0][..., 0]                        # (cb, c) f32

    bdot = lambda a, b, ca, cb_: jax.lax.dot_general(
        a, b, (((ca,), (cb_,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    scores = bdot(q, k_win, 2, 2)                     # (cb, c, wc)
    scores = jnp.where((kv == 1)[:, None, :], scores, mask_value)
    if causal:
        scores = jnp.where(qp[:, :, None] >= kp[:, None, :], scores,
                           mask_value)
    self_m = qp[:, :, None] == kp[:, None, :]
    scores = jnp.where(self_m, self_mask_value, scores)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)        # (cb, c, wc)

    # dV = P^T @ dO  per chunk: contract the c axis
    dv_ref[0] = bdot(p.transpose(0, 2, 1), dout, 2, 1).astype(dv_ref.dtype)
    dp = bdot(dout, v_win, 2, 2)                      # (cb, c, wc)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) + p * dlse[:, :, None]
    ds = jnp.where(self_m, 0.0, ds)                   # constant-overwritten
    dq_ref[0] = bdot(ds, k_win, 2, 1).astype(dq_ref.dtype)
    dk_ref[0] = bdot(ds.transpose(0, 2, 1), q, 2, 1).astype(dk_ref.dtype)


def _attend_bwd_pallas_raw(q, k, v, q_pos, k_pos, k_valid, dout,
                           dlse, causal, before, after, mask_value,
                           self_mask_value, interpret):
    n, nc, c, d = q.shape
    wc = (1 + before + after) * c
    cb = _pick_cb(nc, before, after)
    kernel = functools.partial(
        _attend_bwd_kernel, before=before, after=after, causal=causal,
        mask_value=mask_value, self_mask_value=self_mask_value)
    nb = nc // cb
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    m3 = blk((1, cb, c, d), lambda i, j: (i, j, 0, 0))
    p3 = blk((1, cb, c, d), lambda i, j: (i, (j + nb - 1) % nb, 0, 0))
    n3 = blk((1, cb, c, d), lambda i, j: (i, (j + 1) % nb, 0, 0))
    m1 = blk((1, cb, c, 1), lambda i, j: (i, j, 0, 0))
    p1 = blk((1, cb, c, 1), lambda i, j: (i, (j + nb - 1) % nb, 0, 0))
    n1 = blk((1, cb, c, 1), lambda i, j: (i, (j + 1) % nb, 0, 0))
    mk = blk((1, cb, wc, d), lambda i, j: (i, j, 0, 0))
    qp4 = q_pos[..., None]
    kp4 = k_pos[..., None]
    kv4 = k_valid[..., None]
    return pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[m3, m3, p3, n3, m3, p3, n3,
                  m1, m1, p1, n1, m1, p1, n1, m3, m1],
        out_specs=(m3, mk, mk),
        out_shape=(
            jax.ShapeDtypeStruct((n, nc, c, d), q.dtype),
            jax.ShapeDtypeStruct((n, nc, wc, d), k.dtype),
            jax.ShapeDtypeStruct((n, nc, wc, d), v.dtype),
        ),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(q, k, k, k, v, v, v, qp4, kp4, kp4, kp4, kv4, kv4, kv4, dout,
      dlse[..., None])


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


def _rows(x, n):
    b, h, nc = x.shape[:3]
    return x.reshape((n,) + x.shape[2:])


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
    dq, dk_adj, dv_adj = _attend_bwd_pallas_raw(
        q_c.reshape(n, nc, c, d),
        k_c.reshape(n, nc, c, d),
        v_c.reshape(n, nc, c, d),
        pos, pos,
        val_c.reshape(n, nc, c).astype(jnp.int32),
        dout.reshape(n, nc, c, d),
        dlse.reshape(n, nc, c).astype(jnp.float32),
        causal, before, after, mask_value, self_mask_value, interpret)
    kc = (1 + before + after) * c
    dq = dq.reshape(b, h, nc, c, d)
    dk = _unlook_adjacent(dk_adj.reshape(b, h, nc, kc, d), before, after, c)
    dv = _unlook_adjacent(dv_adj.reshape(b, h, nc, kc, d), before, after, c)
    return dq, dk, dv, None, None


_attend_with_vjp.defvjp(_fwd_rule, _bwd_rule)


def lsh_attend_chunks_pallas(q_c, k_c, v_c, pos_c, val_c, causal,
                             before, after, mask_value=-1e9,
                             self_mask_value=-1e5, interpret=False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for rtts.attention.lsh.lsh_attend_chunks.

    Falls back to the jnp path when no chunk blocking fits (chunk count
    not divisible by a block >= the neighbor window radius)."""
    b, h, nc, c, d = q_c.shape
    if _pick_cb(nc, before, after) == 0:
        return _ref_attend(q_c, k_c, v_c, pos_c, val_c, causal, before,
                           after, mask_value, self_mask_value)
    return _attend_with_vjp(q_c, k_c, v_c, pos_c, val_c, bool(causal),
                            int(before), int(after), float(mask_value),
                            float(self_mask_value), bool(interpret))
