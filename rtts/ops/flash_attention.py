"""Flash (online-softmax) attention Pallas kernel for the FULL-attention path.

Why this exists: the naive full-softmax path (`rtts/attention/full.py`)
materializes the (B, H, L, L) float32 score/prob tensors in HBM — at the
flagship b8/h8/L1024 train shapes that is ~268 MB per layer per pass, and it
is exactly why full attention collapses between 4k and 8k frames in the
BENCH.md length sweep.  This kernel tiles Q x KV into VMEM-resident blocks
and maintains the online-softmax running statistics (m, l, acc) in VMEM
scratch, so no L^2 tensor ever touches HBM (SURVEY.md §3.3 "Pallas kernels";
the kernel structure follows the public JAX TPU flash-attention pattern:
grid = (batch*heads, q blocks, kv blocks) with the kv dimension innermost
and lane-replicated (block_q, 128) statistics).

Unlike the retired LSH chunk-attend kernel (bandwidth-bound: BENCH.md
"Pallas kernels vs plain XLA"), this op REMOVES bytes instead of moving
them — it reads Q/K/V once and writes O once — so the "Pallas DMA reaches
half of XLA bandwidth" ceiling does not bound it; it is MXU-bound.

Semantics are bit-compatible with the oracle in `rtts/attention/full.py`
(replace-style masking, applied to f32 scores BEFORE softmax):

- pad keys:      score := mask_value   (-1e9)   where kv_mask is False
- causal:        score := mask_value   (-1e9)   where q_pos <  k_pos
- self (shared QK): score := self_mask_value (-1e5) where q_pos == k_pos
  (the Reformer shared-QK rule: a token never attends itself unless it has
  no other target — SURVEY.md §3.2 "Masking")

Backward (training) is the flash-attention-2 scheme: the forward saves the
per-row logsumexp (lse = m + log l); two kernels recompute the probability
tiles from (q, k, lse) and accumulate dK/dV (grid over kv blocks, q inner)
and dQ (grid over q blocks, kv inner).  Score gradients are exactly zero at
masked positions: exp(-1e9 - lse) underflows to 0.0 in f32, and the
self-mask positions (whose score is the CONSTANT -1e5) are explicitly
zeroed.  Attention-probs dropout is NOT supported here — the resolver
falls back to the naive path whenever a dropout rng is live.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9
SELF_MASK_VALUE = -1e5
_NEG_INIT = -1e30      # finite init for the running max: avoids exp(-inf+inf)
_LANES = 128

# "auto" uses flash from this many positions: below it the naive path's
# score tensor is small enough that XLA's fused softmax wins on dispatch
# overhead.  Measured on the v5e (scripts/probe_flash.py kernel sweep,
# BENCH.md r3 "Flash attention"): at L=512 flash is 0.98x fwd / 0.88x
# fwd+bwd (loses), at L=1024 it is 1.26x / 1.51x and the win grows with
# length (3.55x / 2.94x at 4096) — crossover between 512 and 1024.
FLASH_AUTO_MIN_LEN = 1024

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


# -- trace-time FLOP accounting ------------------------------------------------
# XLA's cost analysis cannot see inside a Mosaic custom call, so a compiled
# step that routes attention through this kernel under-reports its FLOPs —
# and the bench's MFU drops exactly when the fast path engages.  The kernels
# record their analytic matmul FLOPs into any installed tracker at TRACE time
# (rtts/bench.py::_compiled_flops lowers the step inside one).  Recording is
# skipped in interpret mode: there the kernel body runs as ordinary XLA ops
# that cost analysis already counts.

_FLOP_TRACKERS: list = []


class track_flops:
    """Context manager collecting analytic FLOPs of flash kernels traced
    (not executed) inside the block, as ``.flops``."""

    def __enter__(self) -> "track_flops":
        self.flops = 0.0
        _FLOP_TRACKERS.append(self)
        return self

    def __exit__(self, *exc) -> None:
        _FLOP_TRACKERS.remove(self)


def _record_flops(f: float) -> None:
    for t in _FLOP_TRACKERS:
        t.flops += f


def _matmul_flops(bh: int, l_q: int, l_k: int, dh: int, bq: int, bk: int,
                  causal: bool) -> float:
    """FLOPs of ONE (l_q x l_k x dh) matmul pass over the EXECUTED tiles.

    Causal grids skip whole (qi, ki) tiles via the block predicate; count
    the tiles that actually run (q_offset assumed 0 — the bench never
    measures MFU on the sequence-parallel path, whose per-rank offsets
    would only shift tiles between ranks, not change the global total)."""
    n_q, n_k = l_q // bq, l_k // bk
    if causal:
        n_exec = sum(min(n_k, ((qi + 1) * bq - 1) // bk + 1)
                     for qi in range(n_q))
    else:
        n_exec = n_q * n_k
    return 2.0 * bh * n_exec * bq * bk * dh


def flash_supported(l_q: int, l_k: int) -> bool:
    """Any positive static lengths work: non-128-multiples are transparently
    padded (masked keys / sliced query rows) inside ``flash_attend``."""
    return l_q >= 1 and l_k >= 1


def resolve_flash_impl(knob, l_q: int, l_k: int,
                       dropout_rng: Optional[jax.Array] = None) -> str:
    """Resolve the AttentionConfig.flash knob to 'flash' | 'naive'.

    true   -> flash (raises if attention dropout is live; runs in
              interpret mode off-TPU — the test path)
    false  -> naive
    "auto" -> flash on TPU, no live dropout, and at least
              FLASH_AUTO_MIN_LEN positions on one side (measured crossover)
    """
    if knob in (False, None):
        return "naive"
    if knob is True:
        if dropout_rng is not None:
            raise ValueError(
                "flash: true cannot apply attention-probs dropout; set "
                "attention_dropout: 0 or flash: auto/false")
        return "flash"
    if knob == "auto":
        if dropout_rng is not None:
            return "naive"
        if jax.devices()[0].platform != "tpu":
            return "naive"
        if max(l_q, l_k) < FLASH_AUTO_MIN_LEN:
            return "naive"
        return "flash"
    raise ValueError(f"flash knob must be true, false or 'auto', got {knob!r}")


def _pick_block(length: int, preferred: int = 512) -> int:
    for cand in (preferred, 256, 128):
        if cand <= length and length % cand == 0:
            return cand
    # flash_supported guarantees length % 128 == 0
    raise ValueError(f"no flash block size divides sequence length {length}")


def _apply_masks(s, valid, qi, ki, bq, bk, causal, self_mask,
                 mask_value, self_mask_value, q_off):
    """Replace-semantics masking on a (bq, bk) f32 score tile.

    ``q_off`` shifts query positions to their GLOBAL ids — the
    sequence-parallel path attends a local query shard against gathered
    global keys, so causal/self comparisons must use rank*shard + row
    (rtts/parallel/seq_parallel.py).  0 on the single-device path."""
    s = jnp.where(valid, s, mask_value)
    if causal or self_mask:
        rows = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                + qi * bq + q_off)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
        if causal:
            s = jnp.where(rows >= cols, s, mask_value)
        if self_mask:
            s = jnp.where(rows == cols, self_mask_value, s)
    return s


def _self_zero(ds, qi, ki, bq, bk, q_off):
    """Zero score-grads on the diagonal (its score is a replaced constant)."""
    rows = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            + qi * bq + q_off)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
    return jnp.where(rows == cols, 0.0, ds)


def _head_broadcast(t, dh):
    """(bq, 128) lane-replicated stat -> (bq, dh)."""
    if dh % _LANES == 0:
        return jnp.tile(t, (1, dh // _LANES))
    return t[:, :dh]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mf_ref, qo_ref, o_ref, *rest, causal,
                self_mask, sm_scale, mask_value, self_mask_value, n_k,
                save_lse):
    if save_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        (m_scr, l_scr, acc_scr) = rest
        lse_ref = None
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    bq, dh = q_ref.shape[1], q_ref.shape[2]
    bk = k_ref.shape[1]
    # global-position offset of query row 0 (f32 carrier: exact for ints
    # < 2^24, and f32 keeps the custom_vjp cotangent plumbing trivial)
    q_off = qo_ref[0].astype(jnp.int32)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INIT, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _run():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s = s * sm_scale
        s = _apply_masks(s, mf_ref[0] > 0.5, qi, ki, bq, bk, causal,
                         self_mask, mask_value, self_mask_value, q_off)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]            # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)            # (bq, 128)
        p = jnp.exp(s - jnp.tile(m_next, (1, bk // _LANES)))
        alpha = jnp.exp(m_prev - m_next)
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=1)[:, None] + l_corr   # (bq, 128)
        m_scr[...] = m_next
        l_scr[...] = l_next
        l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        acc_scr[...] *= _head_broadcast(l_corr * l_inv, dh)
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] += pv * _head_broadcast(l_inv, dh)

    if causal:
        pl.when(q_off + (qi + 1) * bq - 1 >= ki * bk)(_run)
    else:
        _run()

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)
        if lse_ref is not None:
            l_fin = l_scr[...]
            lse_ref[0] = m_scr[...] + jnp.log(
                jnp.where(l_fin == 0.0, 1.0, l_fin))


def _fwd_impl(q3, k3, v3, mf, qo, heads, causal, self_mask, sm_scale,
              mask_value, self_mask_value, bq, bk, interpret, save_lse):
    bh, l_q, dh = q3.shape
    l_k = k3.shape[1]
    n_k = l_k // bk
    grid = (bh, l_q // bq, n_k)
    if not interpret:
        # QK^T + PV
        _record_flops(2.0 * _matmul_flops(bh, l_q, l_k, dh, bq, bk, causal))
    kernel = functools.partial(
        _fwd_kernel, causal=causal, self_mask=self_mask, sm_scale=sm_scale,
        mask_value=mask_value, self_mask_value=self_mask_value, n_k=n_k,
        save_lse=save_lse)
    out_shape = [jax.ShapeDtypeStruct((bh, l_q, dh), q3.dtype)]
    out_specs = [pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0))]
    scratch = [
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, dh), jnp.float32),
    ]
    if save_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((bh, l_q, _LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, bq, _LANES), lambda b, qi, ki: (b, qi, 0)))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, qi, ki: (b, ki, 0)),
            # mask rides as (B, 1, Lk): a (1, 1, bk) block's last-two dims
            # are (1, bk) == (array dim, 128-multiple) — the (1, bk) 2-D
            # layout trips Mosaic's sublane tiling rule (CLAUDE.md).
            pl.BlockSpec((1, 1, bk), lambda b, qi, ki: (b // heads, 0, ki)),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # q_offset scalar
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_COMPILER_PARAMS.vmem_limit_bytes,
        ),
        interpret=interpret,
    )(q3, k3, v3, mf, qo)
    if save_lse:
        return outs[0], outs[1]
    return outs[0], None


# ---------------------------------------------------------------------------
# backward: dK/dV (grid over kv blocks, q inner) and dQ (q blocks, kv inner)
# ---------------------------------------------------------------------------


def _recompute_tile(q_ref, k_ref, mf_ref, lse_ref, qi, ki, causal, self_mask,
                    sm_scale, mask_value, self_mask_value, q_off):
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    s = _apply_masks(s, mf_ref[0] > 0.5, qi, ki, bq, bk, causal, self_mask,
                     mask_value, self_mask_value, q_off)
    p = jnp.exp(s - jnp.tile(lse_ref[0], (1, bk // _LANES)))
    return p


def _score_grads(p, o_ref, do_ref, v_ref, qi, ki, self_mask, sm_scale, q_off):
    bq, bk = p.shape
    do = do_ref[0]
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(o_ref[0].astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1)[:, None]
    ds = p * (dp - di)
    if self_mask:
        ds = _self_zero(ds, qi, ki, bq, bk, q_off)
    if sm_scale != 1.0:
        ds = ds * sm_scale
    return ds


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, mf_ref, qo_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, causal, self_mask,
                sm_scale, mask_value, self_mask_value, n_q):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    q_off = qo_ref[0].astype(jnp.int32)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[...] = jnp.zeros(dv_acc.shape, jnp.float32)

    def _run():
        p = _recompute_tile(q_ref, k_ref, mf_ref, lse_ref, qi, ki, causal,
                            self_mask, sm_scale, mask_value, self_mask_value,
                            q_off)
        do = do_ref[0]
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = _score_grads(p, o_ref, do_ref, v_ref, qi, ki, self_mask,
                          sm_scale, q_off)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(q_off + (qi + 1) * bq - 1 >= ki * bk)(_run)
    else:
        _run()

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, mf_ref, qo_ref,
               dq_ref, dq_acc, *, causal, self_mask, sm_scale, mask_value,
               self_mask_value, n_k):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    q_off = qo_ref[0].astype(jnp.int32)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)

    def _run():
        p = _recompute_tile(q_ref, k_ref, mf_ref, lse_ref, qi, ki, causal,
                            self_mask, sm_scale, mask_value, self_mask_value,
                            q_off)
        ds = _score_grads(p, o_ref, do_ref, v_ref, qi, ki, self_mask,
                          sm_scale, q_off)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(q_off + (qi + 1) * bq - 1 >= ki * bk)(_run)
    else:
        _run()

    @pl.when(ki == n_k - 1)
    def _store():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_impl(q3, k3, v3, mf, qo, out, lse, do, heads, causal, self_mask,
              sm_scale, mask_value, self_mask_value, bq, bk, interpret):
    bh, l_q, dh = q3.shape
    l_k = k3.shape[1]
    n_q = l_q // bq
    n_k = l_k // bk
    if not interpret:
        # dkv kernel: QK^T recompute, dp, dv, dk; dq kernel: QK^T, dp, dq
        _record_flops(7.0 * _matmul_flops(bh, l_q, l_k, dh, bq, bk, causal))

    common = dict(causal=causal, self_mask=self_mask, sm_scale=sm_scale,
                  mask_value=mask_value, self_mask_value=self_mask_value)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_q=n_q, **common),
        grid=(bh, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, ki, qi: (b, qi, 0)),      # q
            pl.BlockSpec((1, bk, dh), lambda b, ki, qi: (b, ki, 0)),      # k
            pl.BlockSpec((1, bk, dh), lambda b, ki, qi: (b, ki, 0)),      # v
            pl.BlockSpec((1, bq, dh), lambda b, ki, qi: (b, qi, 0)),      # o
            pl.BlockSpec((1, bq, dh), lambda b, ki, qi: (b, qi, 0)),      # do
            pl.BlockSpec((1, bq, _LANES), lambda b, ki, qi: (b, qi, 0)),  # lse
            pl.BlockSpec((1, 1, bk),
                         lambda b, ki, qi: (b // heads, 0, ki)),          # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # q_off
        ],
        out_specs=[
            pl.BlockSpec((1, bk, dh), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, dh), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k3.shape, k3.dtype),
            jax.ShapeDtypeStruct(v3.shape, v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_COMPILER_PARAMS.vmem_limit_bytes,
        ),
        interpret=interpret,
    )(q3, k3, v3, out, do, lse, mf, qo)

    (dq,) = pl.pallas_call(
        functools.partial(_dq_kernel, n_k=n_k, **common),
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0)),      # q
            pl.BlockSpec((1, bk, dh), lambda b, qi, ki: (b, ki, 0)),      # k
            pl.BlockSpec((1, bk, dh), lambda b, qi, ki: (b, ki, 0)),      # v
            pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0)),      # o
            pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0)),      # do
            pl.BlockSpec((1, bq, _LANES), lambda b, qi, ki: (b, qi, 0)),  # lse
            pl.BlockSpec((1, 1, bk),
                         lambda b, qi, ki: (b // heads, 0, ki)),          # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # q_off
        ],
        out_specs=[pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0))],
        out_shape=[jax.ShapeDtypeStruct(q3.shape, q3.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_COMPILER_PARAMS.vmem_limit_bytes,
        ),
        interpret=interpret,
    )(q3, k3, v3, out, do, lse, mf, qo)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def _flash(q3, k3, v3, mf, qo, heads, causal, self_mask, sm_scale, mask_value,
           self_mask_value, bq, bk, interpret):
    out, _ = _fwd_impl(q3, k3, v3, mf, qo, heads, causal, self_mask, sm_scale,
                       mask_value, self_mask_value, bq, bk, interpret,
                       save_lse=False)
    return out


def _flash_fwd(q3, k3, v3, mf, qo, heads, causal, self_mask, sm_scale,
               mask_value, self_mask_value, bq, bk, interpret):
    out, lse = _fwd_impl(q3, k3, v3, mf, qo, heads, causal, self_mask,
                         sm_scale, mask_value, self_mask_value, bq, bk,
                         interpret, save_lse=True)
    return out, (q3, k3, v3, mf, qo, out, lse)


def _flash_bwd(heads, causal, self_mask, sm_scale, mask_value,
               self_mask_value, bq, bk, interpret, res, do):
    q3, k3, v3, mf, qo, out, lse = res
    dq, dk, dv = _bwd_impl(q3, k3, v3, mf, qo, out, lse, do, heads, causal,
                           self_mask, sm_scale, mask_value, self_mask_value,
                           bq, bk, interpret)
    return dq, dk, dv, jnp.zeros_like(mf), jnp.zeros_like(qo)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attend(
    q: jnp.ndarray,                      # (B, H, Lq, dh)
    k: jnp.ndarray,                      # (B, H, Lk, dh)
    v: jnp.ndarray,                      # (B, H, Lk, dh)
    kv_mask: Optional[jnp.ndarray] = None,   # (B, Lk) bool key validity
    *,
    causal: bool = False,
    self_mask: bool = False,
    sm_scale: float = 1.0,
    mask_value: float = MASK_VALUE,
    self_mask_value: float = SELF_MASK_VALUE,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    q_offset=0,
) -> jnp.ndarray:
    """Masked softmax attention without materializing the L^2 score tensor.

    ``q_offset`` (int or traced int scalar) is the GLOBAL position of query
    row 0: causal/self comparisons run on ``q_offset + row`` vs the key's
    global index.  The sequence-parallel full path passes ``rank * shard``
    so each device's query shard masks correctly against the gathered keys
    (rtts/parallel/seq_parallel.py); 0 elsewhere.

    Numerically equivalent (refusion-class f32 reduction differences) to
    `full_attention` / the score part of `shared_qk_self_attention` in
    `rtts/attention/full.py`; differentiable via the FA2 backward.

    Non-128-multiple lengths are handled by transparent padding: extra KEY
    rows enter with kv_mask=False (so no query ever sees them) and extra
    QUERY rows are sliced off the output — original positions, causal and
    self comparisons are untouched, so semantics are exact.  The training
    buckets quantize mel lengths to 64-multiples (DatasetConfig
    .mel_pad_to_multiple), so this is what lets every bucket >= the auto
    threshold use the kernel.
    """
    b, h, l_q, dh = q.shape
    l_k = k.shape[2]
    l_qp = -(-l_q // _LANES) * _LANES
    l_kp = -(-l_k // _LANES) * _LANES
    if l_qp != l_q or l_kp != l_k:
        if kv_mask is None:
            kv_mask = jnp.ones((b, l_k), bool)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, l_qp - l_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, l_kp - l_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, l_kp - l_k), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, l_kp - l_k)))
        out = flash_attend(
            q, k, v, kv_mask, causal=causal, self_mask=self_mask,
            sm_scale=sm_scale, mask_value=mask_value,
            self_mask_value=self_mask_value, block_q=block_q,
            block_k=block_k, interpret=interpret, q_offset=q_offset)
        return out[:, :, :l_q]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bq = block_q or _pick_block(l_q)
    bk = block_k or _pick_block(l_k)
    q3 = q.reshape(b * h, l_q, dh)
    k3 = k.reshape(b * h, l_k, dh)
    v3 = v.reshape(b * h, l_k, dh)
    if kv_mask is None:
        mf = jnp.ones((b, 1, l_k), jnp.float32)
    else:
        mf = kv_mask.astype(jnp.float32).reshape(b, 1, l_k)
    qo = jnp.asarray(q_offset, jnp.float32).reshape(1)
    out = _flash(q3, k3, v3, mf, qo, h, bool(causal), bool(self_mask),
                 float(sm_scale), float(mask_value), float(self_mask_value),
                 bq, bk, bool(interpret))
    return out.reshape(b, h, l_q, dh)
