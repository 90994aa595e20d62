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
zeroed.

Attention-probs dropout runs IN-KERNEL (so dropout configs keep the flash
speed and memory profile instead of falling back to naive full): the keep
decision is a pure counter-based hash of (seed, batch*head, global row,
global col) — ``_keep_tile`` — regenerated tile-wise in the forward and in
both backward kernels, so the FA2 recompute and the reversible-layer replay
see the exact same mask with zero stored bytes.  Inverted-dropout scaling
(p * keep / keep_prob) applies to the PV accumulation only; the softmax
statistics (m, l, lse) are those of the UNDROPPED distribution, matching
the oracle semantics softmax -> dropout -> @V.  The backward is exact for
the dropped objective: dv uses the dropped probs, and score grads become
ds = p * (keep/keep_prob * dP - Di) with Di = rowsum(o * do) unchanged
(o already contains the dropout).  The mask is a different — equally
valid — sample than the naive path's jax.random.bernoulli draw, so
flash-vs-naive A/Bs at p > 0 compare distributions, not bits;
``dropout_keep_mask`` builds the dense mask for exact-oracle tests.
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
    (not executed) inside the block, as ``.flops`` — and their analytic
    HBM bytes as ``.bytes`` (XLA cost analysis cannot see inside a Mosaic
    custom call; the roofline probe needs both sides)."""

    def __enter__(self) -> "track_flops":
        self.flops = 0.0
        self.bytes = 0.0
        _FLOP_TRACKERS.append(self)
        return self

    def __exit__(self, *exc) -> None:
        _FLOP_TRACKERS.remove(self)


def _record_flops(f: float) -> None:
    for t in _FLOP_TRACKERS:
        t.flops += f


def _record_bytes(b: float) -> None:
    for t in _FLOP_TRACKERS:
        t.bytes += b


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


# -- in-kernel attention-probs dropout ----------------------------------------
# Counter-based keep mask: a 32-bit avalanche hash ("lowbias32") of
# (seed, batch*head, global row, global col) thresholded on its top 24 bits.
# Pure function of positions => the forward kernel, both backward kernels,
# and the reversible-layer recompute regenerate the identical mask from the
# same seed without storing a single mask byte.

_DROP_BITS = 24


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 avalanche finalizer (uint32 -> uint32)."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _i32c(c: int) -> jnp.ndarray:
    """An int32 constant with the bits of the uint32 ``c`` (two's complement)."""
    return jnp.int32(c if c < (1 << 31) else c - (1 << 32))


def _keep_tile(seed_i32, bh, rows, cols, drop_thr: int) -> jnp.ndarray:
    """Keep indicators in {0.0, 1.0} (f32) for broadcastable int32 position
    grids.  ``drop_thr`` is the static 24-bit keep threshold
    (round(keep_prob * 2^24)); multiplies wrap mod 2^32 by design.

    Mosaic constraints shape this: no i32<->u32 converts and scalar bitcast
    is unsupported (tpu.bitcast is vector-only), so the position mixing runs
    in wrapping int32 (bit-identical to uint32 mod 2^32) and only the final
    VECTOR is bitcast to uint32 for the shift-heavy avalanche."""
    u_i32 = (rows * _i32c(0x85EBCA6B) + cols * _i32c(0xC2B2AE35)
             + jnp.asarray(bh, jnp.int32) * _i32c(0x27D4EB2F)
             + jnp.asarray(seed_i32, jnp.int32))
    h = _mix32(jax.lax.bitcast_convert_type(u_i32, jnp.uint32))
    top = jax.lax.bitcast_convert_type(h >> jnp.uint32(32 - _DROP_BITS),
                                       jnp.int32)  # < 2^24, bits identical
    return (top < drop_thr).astype(jnp.float32)


def _drop_threshold(rate: float) -> int:
    """Static 24-bit keep threshold for a dropout rate (0 => disabled)."""
    if rate <= 0.0:
        return 0
    if rate >= 1.0:
        raise ValueError(f"dropout_rate must be < 1, got {rate}")
    return int(round((1.0 - rate) * (1 << _DROP_BITS)))


def dropout_keep_mask(seed, n_bh: int, l_q: int, l_k: int, rate: float,
                      q_offset: int = 0) -> jnp.ndarray:
    """Dense (n_bh, l_q, l_k) f32 keep mask — the EXACT mask the kernels
    regenerate tile-wise; the jnp oracle for flash-dropout tests."""
    thr = _drop_threshold(rate)
    seed_i32 = jax.lax.bitcast_convert_type(_seed_as_u32(jnp.asarray(seed)),
                                            jnp.int32)
    rows = (jnp.arange(l_q, dtype=jnp.int32) + q_offset)[None, :, None]
    cols = jnp.arange(l_k, dtype=jnp.int32)[None, None, :]
    bh = jnp.arange(n_bh, dtype=jnp.int32)[:, None, None]
    return _keep_tile(seed_i32, bh, rows, cols, thr)


def _seed_as_u32(seed) -> jnp.ndarray:
    s = jnp.asarray(seed)
    if s.dtype == jnp.uint32:
        return s
    if s.dtype == jnp.int32:
        return jax.lax.bitcast_convert_type(s, jnp.uint32)
    return s.astype(jnp.uint32)


def _seed_to_smem(seed) -> jnp.ndarray:
    """Pack a uint32 seed into two exact 16-bit halves as (2,) f32 — like
    the q_offset carrier, f32 keeps the custom_vjp cotangent plumbing
    trivial (ints would need float0 handling) and 16-bit halves are exact
    in f32."""
    s = _seed_as_u32(seed)
    return jnp.stack([(s >> jnp.uint32(16)).astype(jnp.float32),
                      (s & jnp.uint32(0xFFFF)).astype(jnp.float32)])


def _seed_from_smem(sd_ref) -> jnp.ndarray:
    """Int32 scalar with the seed's bits (f32 halves are exact 16-bit).

    Stays in int32 throughout: Mosaic has no f32->u32 convert and scalar
    bitcasts are vector-only; ``hi << 16`` wrapping into the sign bit is
    exactly the uint32 bit pattern ``_keep_tile`` expects."""
    hi = sd_ref[0].astype(jnp.int32)
    lo = sd_ref[1].astype(jnp.int32)
    return hi * jnp.int32(1 << 16) + lo


def dropout_seed_from_key(key: jax.Array) -> jnp.ndarray:
    """A uint32 scalar kernel seed from a JAX PRNG key (per-layer keys come
    from the aux rng plumbing, so layers never share a mask)."""
    return jax.random.bits(key, (), jnp.uint32)


def flash_supported(l_q: int, l_k: int) -> bool:
    """Any positive static lengths work: non-128-multiples are transparently
    padded (masked keys / sliced query rows) inside ``flash_attend``."""
    return l_q >= 1 and l_k >= 1


def resolve_flash_impl(knob, l_q: int, l_k: int) -> str:
    """Resolve the AttentionConfig.flash knob to 'flash' | 'naive'.

    true   -> flash (runs in interpret mode off-TPU — the test path)
    false  -> naive
    "auto" -> flash on TPU with at least FLASH_AUTO_MIN_LEN positions on
              one side (measured crossover)

    Attention-probs dropout no longer forces naive: the kernel applies it
    in-kernel from a counter-based hash (module docstring).
    """
    if knob in (False, None):
        return "naive"
    if knob is True:
        return "flash"
    if knob == "auto":
        if jax.devices()[0].platform != "tpu":
            return "naive"
        if max(l_q, l_k) < FLASH_AUTO_MIN_LEN:
            return "naive"
        return "flash"
    raise ValueError(f"flash knob must be true, false or 'auto', got {knob!r}")


def _pick_block(length: int, preferred: int = 1024) -> int:
    """Largest block from the preferred chain that divides ``length``.

    1024x1024 tiles measured fastest at every swept length (BENCH.md r3
    "flash block-size sweep": 1.08x/1.10x/1.23x/1.19x over the earlier
    512x512 default at L=1k/2k/4k/8k fwd+bwd; 2048 tiles were within ~2%
    at 8k but no better below) — bigger tiles amortize the per-grid-step
    overhead on the single-core v5e and keep the MXU fed; the (bq, bk)
    f32 score tile at 1024^2 is 4 MB, comfortably inside the 64 MB VMEM
    budget alongside the streamed operand tiles."""
    for cand in (preferred, 512, 256, 128):
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


def _fwd_kernel(q_ref, k_ref, v_ref, mf_ref, qo_ref, sd_ref, o_ref, *rest,
                causal, self_mask, sm_scale, mask_value, self_mask_value,
                n_k, save_lse, drop_thr, drop_scale):
    if save_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        (m_scr, l_scr, acc_scr) = rest
        lse_ref = None
    bh_id = pl.program_id(0)
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
        p_v = p
        if drop_thr:
            # dropout applies to the PV accumulation only: (m, l, lse)
            # stay those of the undropped softmax (oracle semantics)
            rows = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                    + qi * bq + q_off)
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
            keep = _keep_tile(_seed_from_smem(sd_ref), bh_id,
                              rows, cols, drop_thr)
            p_v = p * (keep * drop_scale)
        pv = jax.lax.dot_general(p_v.astype(v_ref.dtype), v_ref[0],
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


def _fwd_impl(q3, k3, v3, mf, qo, sd, heads, causal, self_mask, sm_scale,
              mask_value, self_mask_value, bq, bk, interpret, save_lse,
              drop_thr, drop_scale):
    bh, l_q, dh = q3.shape
    l_k = k3.shape[1]
    n_k = l_k // bk
    grid = (bh, l_q // bq, n_k)
    if not interpret:
        # QK^T + PV
        _record_flops(2.0 * _matmul_flops(bh, l_q, l_k, dh, bq, bk, causal))
        # HBM traffic: Q, K, V streamed in once; O (+ f32 lse row) out
        esz = q3.dtype.itemsize
        _record_bytes(esz * bh * dh * (l_q + 2 * l_k + l_q)
                      + (4.0 * bh * l_q if save_lse else 0.0))
    kernel = functools.partial(
        _fwd_kernel, causal=causal, self_mask=self_mask, sm_scale=sm_scale,
        mask_value=mask_value, self_mask_value=self_mask_value, n_k=n_k,
        save_lse=save_lse, drop_thr=drop_thr, drop_scale=drop_scale)
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
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dropout seed scalar
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_COMPILER_PARAMS.vmem_limit_bytes,
        ),
        interpret=interpret,
    )(q3, k3, v3, mf, qo, sd)
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


def _score_grads(p, o_ref, do_ref, v_ref, qi, ki, self_mask, sm_scale, q_off,
                 rscale=None):
    """``rscale`` (keep/keep_prob tile) folds in-kernel dropout into the
    softmax backward: with a_ij = p_ij * r_ij the chain rule gives
    ds = p * (r * dP - Di), and Di = rowsum(o * do) already equals
    sum_k p_ik r_ik dP_ik because o contains the dropout."""
    bq, bk = p.shape
    do = do_ref[0]
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rscale is not None:
        dp = dp * rscale
    di = jnp.sum(o_ref[0].astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1)[:, None]
    ds = p * (dp - di)
    if self_mask:
        ds = _self_zero(ds, qi, ki, bq, bk, q_off)
    if sm_scale != 1.0:
        ds = ds * sm_scale
    return ds


def _bwd_rscale(sd_ref, bh_id, qi, ki, bq, bk, q_off, drop_thr, drop_scale):
    """Regenerate the forward's keep/keep_prob tile (None when dropout off).

    ``bh_id`` must be read via pl.program_id at kernel top-level by the
    caller — program_id is unavailable inside a pl.when body in interpret
    mode."""
    if not drop_thr:
        return None
    rows = (jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            + qi * bq + q_off)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
    keep = _keep_tile(_seed_from_smem(sd_ref), bh_id, rows, cols, drop_thr)
    return keep * drop_scale


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, mf_ref, qo_ref,
                sd_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, causal, self_mask,
                sm_scale, mask_value, self_mask_value, n_q, drop_thr,
                drop_scale):
    bh_id = pl.program_id(0)
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
        rscale = _bwd_rscale(sd_ref, bh_id, qi, ki, bq, bk, q_off, drop_thr,
                             drop_scale)
        do = do_ref[0]
        p_v = p if rscale is None else p * rscale
        dv_acc[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = _score_grads(p, o_ref, do_ref, v_ref, qi, ki, self_mask,
                          sm_scale, q_off, rscale)
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
               sd_ref, dq_ref, dq_acc, *, causal, self_mask, sm_scale,
               mask_value, self_mask_value, n_k, drop_thr, drop_scale):
    bh_id = pl.program_id(0)
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
        rscale = _bwd_rscale(sd_ref, bh_id, qi, ki, bq, bk, q_off, drop_thr,
                             drop_scale)
        ds = _score_grads(p, o_ref, do_ref, v_ref, qi, ki, self_mask,
                          sm_scale, q_off, rscale)
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


def _bwd_impl(q3, k3, v3, mf, qo, sd, out, lse, do, heads, causal, self_mask,
              sm_scale, mask_value, self_mask_value, bq, bk, interpret,
              drop_thr, drop_scale):
    bh, l_q, dh = q3.shape
    l_k = k3.shape[1]
    n_q = l_q // bq
    n_k = l_k // bk
    if not interpret:
        # dkv kernel: QK^T recompute, dp, dv, dk; dq kernel: QK^T, dp, dq
        _record_flops(7.0 * _matmul_flops(bh, l_q, l_k, dh, bq, bk, causal))
        # two kernels each stream Q, K, V, dO in; dK+dV resp. dQ out
        esz = q3.dtype.itemsize
        _record_bytes(esz * bh * dh * (2 * (2 * l_q + 2 * l_k) + 2 * l_k + l_q)
                      + 2 * 4.0 * bh * l_q)

    common = dict(causal=causal, self_mask=self_mask, sm_scale=sm_scale,
                  mask_value=mask_value, self_mask_value=self_mask_value,
                  drop_thr=drop_thr, drop_scale=drop_scale)

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
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
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
    )(q3, k3, v3, out, do, lse, mf, qo, sd)

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
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
        ],
        out_specs=[pl.BlockSpec((1, bq, dh), lambda b, qi, ki: (b, qi, 0))],
        out_shape=[jax.ShapeDtypeStruct(q3.shape, q3.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_COMPILER_PARAMS.vmem_limit_bytes,
        ),
        interpret=interpret,
    )(q3, k3, v3, out, do, lse, mf, qo, sd)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16))
def _flash(q3, k3, v3, mf, qo, sd, heads, causal, self_mask, sm_scale,
           mask_value, self_mask_value, bq, bk, interpret, drop_thr,
           drop_scale):
    out, _ = _fwd_impl(q3, k3, v3, mf, qo, sd, heads, causal, self_mask,
                       sm_scale, mask_value, self_mask_value, bq, bk,
                       interpret, save_lse=False, drop_thr=drop_thr,
                       drop_scale=drop_scale)
    return out


def _flash_fwd(q3, k3, v3, mf, qo, sd, heads, causal, self_mask, sm_scale,
               mask_value, self_mask_value, bq, bk, interpret, drop_thr,
               drop_scale):
    out, lse = _fwd_impl(q3, k3, v3, mf, qo, sd, heads, causal, self_mask,
                         sm_scale, mask_value, self_mask_value, bq, bk,
                         interpret, save_lse=True, drop_thr=drop_thr,
                         drop_scale=drop_scale)
    return out, (q3, k3, v3, mf, qo, sd, out, lse)


def _flash_bwd(heads, causal, self_mask, sm_scale, mask_value,
               self_mask_value, bq, bk, interpret, drop_thr, drop_scale,
               res, do):
    q3, k3, v3, mf, qo, sd, out, lse = res
    dq, dk, dv = _bwd_impl(q3, k3, v3, mf, qo, sd, out, lse, do, heads,
                           causal, self_mask, sm_scale, mask_value,
                           self_mask_value, bq, bk, interpret, drop_thr,
                           drop_scale)
    return (dq, dk, dv, jnp.zeros_like(mf), jnp.zeros_like(qo),
            jnp.zeros_like(sd))


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
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Masked softmax attention without materializing the L^2 score tensor.

    ``q_offset`` (int or traced int scalar) is the GLOBAL position of query
    row 0: causal/self comparisons run on ``q_offset + row`` vs the key's
    global index.  The sequence-parallel full path passes ``rank * shard``
    so each device's query shard masks correctly against the gathered keys
    (rtts/parallel/seq_parallel.py); 0 elsewhere.

    ``dropout_rate`` > 0 (with a ``dropout_seed`` — uint32 scalar, e.g.
    ``dropout_seed_from_key(rng)``) applies attention-probs dropout
    in-kernel (module docstring): deterministic in the seed, identical in
    forward/backward/recompute, zero mask bytes stored.

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
            block_k=block_k, interpret=interpret, q_offset=q_offset,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed)
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
    drop_thr = _drop_threshold(dropout_rate)
    if drop_thr and dropout_seed is None:
        raise ValueError("flash_attend: dropout_rate > 0 needs dropout_seed")
    sd = _seed_to_smem(dropout_seed if drop_thr else 0)
    drop_scale = 1.0 / (1.0 - dropout_rate) if drop_thr else 1.0
    out = _flash(q3, k3, v3, mf, qo, sd, h, bool(causal), bool(self_mask),
                 float(sm_scale), float(mask_value), float(self_mask_value),
                 bq, bk, bool(interpret), drop_thr, drop_scale)
    return out.reshape(b, h, l_q, dh)
