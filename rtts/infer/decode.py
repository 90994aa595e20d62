"""Autoregressive mel decoding as a jit-compiled loop (SURVEY.md §4.3).

This is the primary-metric hot path (mel frames/sec/chip).  Two designs:

1. ``decode_greedy`` — incremental KV-cached decode: each decoder layer
   caches its (shared-QK, V) projections in static (B, T_max, H, d) buffers;
   each step projects one frame, appends via dynamic_update_slice, and
   attends over the valid prefix.  O(T) per step instead of the reference's
   full per-step re-run (the reference TTS loop re-runs the decoder stack on
   the whole prefix each frame — SURVEY.md §4.3 "no LSH KV-cache").  Runs
   under ``lax.while_loop`` so generation stops as soon as every batch row
   has fired its stop token — no wasted steps.  Exact for full-softmax
   attention; for LSH-trained models it is the standard serving choice
   because causal shared-QK full attention is a strict superset of the
   LSH-restricted pattern (every bucketed key is visible to the query).

2. ``decode_teacher_check`` — step-by-step decode fed with ground-truth
   frames; must reproduce ``decode_train`` outputs exactly.  This is the
   parity test for the incremental path.

The incremental step replicates the two-stream reversible recurrence
(h1 += f(h2); h2 += g(h1); output = mean) so outputs match training
numerics whether the stack was trained reversible or not.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtts.attention.full import MASK_VALUE, SELF_MASK_VALUE, _len_norm
from rtts.config import ReformerTTSConfig
from rtts.models.reformer_tts import _dtype, postnet_apply
from rtts.nn.layers import dense, layer_norm, prenet_mlp


# ---------------------------------------------------------------------------
# incremental sublayer primitives
# ---------------------------------------------------------------------------


def _precast_weights(params, cdt):
    """Cast every >=2-D float32 leaf (matmul weights, embeddings, pos
    tables) to the compute dtype ONCE, before the decode loop.

    Bit-identical to the in-loop casts: ``dense`` and the step fn already
    cast these leaves to ``cdt`` at every use, so hoisting the cast out of
    the ``while_loop`` changes no step's numerics — but XLA does NOT hoist
    it by itself (the loop-invariant bf16 copies would inflate live
    memory, so it re-reads the f32 weights and converts every step).
    Measured on v5e (BENCH.md): 2.05x decode at flagship b8x512.  1-D
    leaves (LN scale/bias, biases) stay f32 for the f32 reductions.

    The result rides through ``optimization_barrier``: without it XLA
    re-materializes the converts inside each stage loop of staged
    decoding (measured: 19.6k vs 17.0k frames/s at b8x512 staged).  The
    barrier forces every cast to materialize once, up front."""
    if cdt == jnp.float32:
        return params

    def c(x):
        # duck-typed: leaves may be jax Arrays, tracers, or numpy arrays
        # (checkpoint loads), all of which expose dtype/ndim
        if getattr(x, "ndim", 0) >= 2 and getattr(x, "dtype", None) == jnp.float32:
            return jnp.asarray(x, dtype=cdt)
        return x

    casted = jax.tree_util.tree_map(c, params)
    try:
        return jax.lax.optimization_barrier(casted)
    except TypeError:
        # non-array leaves (e.g. python scalars in exotic trees): skip the
        # barrier rather than fail
        return casted


def _kv_dtype(cfg: ReformerTTSConfig, cdt):
    """Storage dtype for the decode KV caches + cross-attn memory.

    "compute" (default) = ``cdt`` (bit-identical to round-1 behavior).
    "float8_e4m3fn" halves cache bytes — the dominant per-step HBM read
    of AR decoding on this bandwidth-bound backend (BENCH.md cost model).
    The caches are loop-carried, so the f8->compute upcast cannot be
    hoisted out of the decode loop and fuses into the attention einsum's
    operand read: per-step traffic is the f8 bytes (unlike weight
    quantization, where XLA materializes the dequantized copy — probed
    and rejected, BENCH.md)."""
    name = getattr(cfg, "kv_cache_dtype", "compute")
    if name in ("compute", None, ""):
        return cdt
    if name == "float8_e4m3fn":
        return jnp.float8_e4m3fn
    return _dtype(name)


def _to_kv(x, kdt):
    """Cast a K/V value to the cache storage dtype, saturating instead of
    overflowing: e4m3fn has no inf, so a magnitude above ~464 converts to
    NaN (verified on this backend) and one outlier activation would
    silently poison the whole decode.  No-op clamp for >=16-bit dtypes."""
    if kdt == jnp.float8_e4m3fn and x.dtype != kdt:
        x = jnp.clip(x, -448.0, 448.0)
    return x.astype(kdt)


def _proj_heads(params_w, x, num_heads, cdt):
    """(B, D) -> (B, H, d)"""
    y = dense(params_w, x, cdt)
    b, di = y.shape
    return y.reshape(b, num_heads, di // num_heads)


def _self_attn_step(p, h_t, k_cache, v_cache, t, num_heads, cdt):
    """One-frame shared-QK causal self-attention over the cached prefix.

    h_t: (B, D) LN'd input frame.  k_cache stores keys already normalized
    and 1/sqrt(d)-scaled at insertion time (len-norm is per-vector, so
    normalizing once beats re-normalizing the whole cache every step — the
    dominant per-step FLOPs otherwise).  Returns (out (B, D), new caches).
    """
    qk_t = _proj_heads(p["w_qk"], h_t, num_heads, cdt)   # (B, H, d)
    v_t = _proj_heads(p["w_v"], h_t, num_heads, cdt)
    d = qk_t.shape[-1]
    # Storage dtype travels with the buffers (f8 when cfg.kv_cache_dtype
    # asks for it); the upcast at read fuses into the einsum.  Quantized
    # caches store the len-normed key UNSCALED (component rms ~1) and
    # fold the 1/sqrt(d) into the query instead — pre-scaled keys have
    # rms d**-0.5, which at d=64 pushes ~10% of components into the
    # e4m3 subnormal range (quantum 2^-9).  The default (storage ==
    # compute dtype) keeps the pre-scaled layout bit-identically.
    quant = k_cache.dtype != qk_t.dtype
    k_t = _len_norm(qk_t) if quant else _len_norm(qk_t) * (d ** -0.5)
    q_s = qk_t * (d ** -0.5) if quant else qk_t
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, _to_kv(k_t[:, None], k_cache.dtype), t, axis=1)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, _to_kv(v_t[:, None], v_cache.dtype), t, axis=1)
    scores = jnp.einsum("bhd,bthd->bht", q_s,
                        k_cache.astype(cdt)).astype(jnp.float32)
    t_max = k_cache.shape[1]
    pos = jnp.arange(t_max)[None, None, :]
    scores = jnp.where(pos > t, MASK_VALUE, scores)      # causal/validity
    scores = jnp.where(pos == t, SELF_MASK_VALUE, scores)  # no self-attend
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bthd->bhd", probs.astype(cdt),
                     v_cache.astype(cdt))
    out = out.reshape(out.shape[0], -1)
    return dense(p["w_o"], out, cdt), k_cache, v_cache


def _self_attn_step_local(p, h_t, k_cache, v_cache, t, num_heads, cdt,
                          chunk, before):
    """One-frame shared-QK LOCAL (sliding-chunk) self-attention over a
    ring of the last ``W = chunk * (1 + before)`` keys (VERDICT r4 #4).

    Training semantics (rtts/attention/local.py, SURVEY.md §3.2 "Local
    attention"): the query at position t attends chunks
    ``[t//chunk - before .. t//chunk]`` causally with the shared-QK self
    penalty — the window start moves at CHUNK granularity, so a ring of
    capacity W always holds every key the query may legally see, and the
    serve-time pattern matches training EXACTLY (kv_full is a superset
    that also exposes the pre-window prefix the model never attended in
    training).  Per-step work is O(W), independent of the decode length.

    k_cache/v_cache: (B, W, H, d) rings; position p lives in slot
    ``p mod W``.  Slot s currently holds position ``t - ((t - s) mod W)``
    (never-written slots resolve to negative positions and are masked).
    """
    qk_t = _proj_heads(p["w_qk"], h_t, num_heads, cdt)   # (B, H, d)
    v_t = _proj_heads(p["w_v"], h_t, num_heads, cdt)
    d = qk_t.shape[-1]
    # quantized caches: unscaled normed keys + query-side 1/sqrt(d)
    # (see _self_attn_step — avoids the e4m3 subnormal range)
    quant = k_cache.dtype != qk_t.dtype
    k_t = _len_norm(qk_t) if quant else _len_norm(qk_t) * (d ** -0.5)
    q_s = qk_t * (d ** -0.5) if quant else qk_t
    w_cap = k_cache.shape[1]
    slot = jnp.mod(t, w_cap)
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, _to_kv(k_t[:, None], k_cache.dtype), slot, axis=1)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, _to_kv(v_t[:, None], v_cache.dtype), slot, axis=1)
    scores = jnp.einsum("bhd,bwhd->bhw", q_s,
                        k_cache.astype(cdt)).astype(jnp.float32)
    s_idx = jnp.arange(w_cap)[None, None, :]
    pos = t - jnp.mod(t - s_idx, w_cap)
    win_start = jnp.maximum(0, (t // chunk - before) * chunk)
    scores = jnp.where(pos < win_start, MASK_VALUE, scores)
    scores = jnp.where(pos == t, SELF_MASK_VALUE, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhw,bwhd->bhd", probs.astype(cdt),
                     v_cache.astype(cdt))
    out = out.reshape(out.shape[0], -1)
    return dense(p["w_o"], out, cdt), k_cache, v_cache


def _local_spec(cfg: ReformerTTSConfig, n_groups: int):
    """Per-self-layer ring specs for kv_local: ``(chunk, before, W)`` for
    layers whose resolved kind is 'local', None otherwise.  Non-local
    layers in a mixed ``attn_layers`` decoder keep the full-prefix cache
    (exact for 'full'; the documented superset for 'lsh')."""
    from rtts.config import resolve_attention_kind
    from rtts.models.stack import _layer_kinds

    a = cfg.decoder.attention
    kinds = [resolve_attention_kind(a, n_groups) if k == "auto" else k
             for k in _layer_kinds(cfg.decoder)]
    w_cap = min(a.chunk_length * (1 + a.num_chunks_before), n_groups)
    return tuple(
        (a.chunk_length, a.num_chunks_before, w_cap) if k == "local"
        else None
        for k in kinds)


def _self_attn_step_lsh(p, h_t, k_cache, v_cache, b_cache, rotations, t,
                        num_heads, cdt):
    """LSH-cached incremental self-attention (SURVEY.md §3.2 "Incremental
    decoding cache", TPU reformulation of the HF bucket-cache scheme).

    Instead of gathering the query's bucket-chunk from a re-sorted cache
    (per-step sorts are hostile to TPU), the cache stores each key's bucket
    ids; the step attends over the whole prefix with a per-round
    bucket-equality mask — the ideal LSH pattern (the chunking in training
    is a batching artifact of the sorted layout).  Multi-round outputs are
    combined with the same exp(lse - logsumexp) rule as training.

    b_cache: (B, H, nh, T) int32; rotations: (H, d, nh, nb/2).
    Returns (out (B, D), new caches)."""
    qk_t = _proj_heads(p["w_qk"], h_t, num_heads, cdt)   # (B, H, d)
    v_t = _proj_heads(p["w_v"], h_t, num_heads, cdt)
    d = qk_t.shape[-1]
    # quantized caches: unscaled normed keys + query-side 1/sqrt(d)
    # (see _self_attn_step — avoids the e4m3 subnormal range)
    quant = k_cache.dtype != qk_t.dtype
    k_t = _len_norm(qk_t) if quant else _len_norm(qk_t) * (d ** -0.5)
    q_s = qk_t * (d ** -0.5) if quant else qk_t

    # hash the new token with the decode-fixed rotations
    rotated = jnp.einsum("bhd,hdnr->bhnr",
                         jax.lax.stop_gradient(qk_t).astype(jnp.float32),
                         rotations)
    rotated = jnp.concatenate([rotated, -rotated], axis=-1)
    bucket_t = jnp.argmax(rotated, axis=-1).astype(jnp.int32)  # (B, H, nh)

    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, _to_kv(k_t[:, None], k_cache.dtype), t, axis=1)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, _to_kv(v_t[:, None], v_cache.dtype), t, axis=1)
    b_cache = jax.lax.dynamic_update_slice_in_dim(
        b_cache, bucket_t[:, :, :, None], t, axis=3)

    scores = jnp.einsum("bhd,bthd->bht", q_s,
                        k_cache.astype(cdt)).astype(jnp.float32)
    t_max = k_cache.shape[1]
    pos = jnp.arange(t_max)[None, None, :]
    scores = jnp.where(pos > t, MASK_VALUE, scores)          # causal
    scores = jnp.where(pos == t, SELF_MASK_VALUE, scores)    # self penalty
    # per-round bucket mask: (B,H,nh,T); the current token is always an
    # allowed (self-penalty) target so no round is ever fully masked
    same_bucket = b_cache == bucket_t[..., None]
    allow_self = jnp.arange(t_max)[None, None, None, :] == t
    scores_r = jnp.where(same_bucket | allow_self, scores[:, :, None, :],
                         MASK_VALUE)
    lse = jax.nn.logsumexp(scores_r, axis=-1)                # (B,H,nh)
    probs = jnp.exp(scores_r - lse[..., None])
    out_r = jnp.einsum("bhnt,bthd->bhnd", probs.astype(cdt),
                       v_cache.astype(cdt))
    w = jnp.exp(lse - jax.nn.logsumexp(lse, axis=-1, keepdims=True))
    out = jnp.einsum("bhn,bhnd->bhd", w.astype(out_r.dtype), out_r)
    out = out.reshape(out.shape[0], -1)
    return dense(p["w_o"], out, cdt), k_cache, v_cache, b_cache


def _self_attn_step_lsh_chunk(p, h_t, k_cache, v_cache, ring, rotations, t,
                              num_heads, cdt):
    """O(chunk) LSH incremental attention (SURVEY.md §3.2 "Incremental
    decoding cache", the true O(chunk)-per-step variant).

    TPU reformulation of the HF bucket-chunk gather: instead of re-sorting
    the cache every step (hostile to TPU), a per-(head, round, bucket)
    ring buffer stores the POSITIONS of the most recent ``C`` keys hashed
    into each bucket.  The step hashes the query, gathers only its bucket's
    C cached keys per round (plus itself with the training self-penalty),
    and combines rounds with the same exp(lse - logsumexp) rule as
    training.  In the training layout a query's chunk + lookback chunks
    are exactly its nearest same-bucket predecessors in the stable
    position-ordered sort, so "most recent C same-bucket keys" is the
    faithful serving analog; when no bucket ever exceeds C the result is
    bit-identical to the full-prefix bucket-mask mode (tested).

    ring: {"idx": (B,H,nh,NB,C) int32 positions (-1 = empty),
           "cnt": (B,H,nh,NB) int32 insert counters}.
    Per-step cost: O(nh * C * d) attention FLOPs + O(nh) scatter, vs
    O(T * d) for the full-prefix modes."""
    qk_t = _proj_heads(p["w_qk"], h_t, num_heads, cdt)   # (B, H, d)
    v_t = _proj_heads(p["w_v"], h_t, num_heads, cdt)
    d = qk_t.shape[-1]
    # quantized caches: unscaled normed keys + query-side 1/sqrt(d)
    # (see _self_attn_step — avoids the e4m3 subnormal range)
    quant = k_cache.dtype != qk_t.dtype
    k_t = _len_norm(qk_t) if quant else _len_norm(qk_t) * (d ** -0.5)
    q_s = qk_t * (d ** -0.5) if quant else qk_t

    rotated = jnp.einsum("bhd,hdnr->bhnr",
                         jax.lax.stop_gradient(qk_t).astype(jnp.float32),
                         rotations)
    rotated = jnp.concatenate([rotated, -rotated], axis=-1)
    bucket_t = jnp.argmax(rotated, axis=-1).astype(jnp.int32)  # (B, H, nh)

    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, _to_kv(k_t[:, None], k_cache.dtype), t, axis=1)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, _to_kv(v_t[:, None], v_cache.dtype), t, axis=1)

    idx, cnt = ring["idx"], ring["cnt"]
    b, h, nh, nb, cap = idx.shape

    # gather the query's bucket row per round BEFORE inserting self
    # (self joins as an explicit extra column with the -1e5 penalty)
    row = jnp.take_along_axis(
        idx, bucket_t[..., None, None], axis=3)[:, :, :, 0]     # (B,H,nh,C)
    valid = row >= 0
    pos = jnp.where(valid, row, 0)

    # gather k/v from the linear (B,T,H,d) caches at the ring positions
    flat = pos.reshape(b, h, nh * cap).transpose(0, 2, 1)       # (B,nhC,H)
    k_g = jnp.take_along_axis(k_cache, flat[..., None], axis=1).astype(cdt)
    v_g = jnp.take_along_axis(v_cache, flat[..., None], axis=1).astype(cdt)
    k_g = k_g.transpose(0, 2, 1, 3).reshape(b, h, nh, cap, d)
    v_g = v_g.transpose(0, 2, 1, 3).reshape(b, h, nh, cap, d)

    scores = jnp.einsum("bhd,bhncd->bhnc", q_s, k_g).astype(jnp.float32)
    scores = jnp.where(valid, scores, MASK_VALUE)
    self_col = jnp.full(scores.shape[:-1] + (1,), SELF_MASK_VALUE,
                        jnp.float32)
    scores = jnp.concatenate([scores, self_col], axis=-1)       # (B,H,nh,C+1)
    # self column goes through the storage-dtype roundtrip so the chunk
    # mode stays bit-identical to kv_lsh (which reads self back from the
    # quantized cache) when no bucket overflows the ring
    v_self = _to_kv(v_t, v_cache.dtype).astype(cdt)
    vals = jnp.concatenate(
        [v_g, jnp.broadcast_to(v_self[:, :, None, None, :], (b, h, nh, 1, d))],
        axis=3)
    lse = jax.nn.logsumexp(scores, axis=-1)                     # (B,H,nh)
    probs = jnp.exp(scores - lse[..., None])
    out_r = jnp.einsum("bhnc,bhncd->bhnd", probs.astype(vals.dtype), vals)
    w = jnp.exp(lse - jax.nn.logsumexp(lse, axis=-1, keepdims=True))
    out = jnp.einsum("bhn,bhnd->bhd", w.astype(out_r.dtype), out_r)
    out = out.reshape(out.shape[0], -1)

    # insert self into its bucket's ring (oldest slot evicted on overflow)
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(h)[None, :, None]
    ri = jnp.arange(nh)[None, None, :]
    c_cur = jnp.take_along_axis(cnt, bucket_t[..., None], axis=3)[..., 0]
    slot = c_cur % cap
    idx = idx.at[bi, hi, ri, bucket_t, slot].set(t)
    cnt = cnt.at[bi, hi, ri, bucket_t].add(1)
    return (dense(p["w_o"], out, cdt), k_cache, v_cache,
            {"idx": idx, "cnt": cnt})


def _cross_attn_step(p, h_t, mem_k, mem_v, memory_mask, num_heads, cdt,
                     window=None, align_pos=None):
    """One-frame cross-attention. mem_k/mem_v: (B, L, H, d) precomputed.

    ``window=(w_back, w_fwd)`` with ``align_pos`` (B,) int32 restricts the
    attended tokens to [align_pos - w_back, align_pos + w_fwd] — the
    classic TTS inference-time monotonic windowing that prevents the
    free-running decoder from jumping back (looping) or skipping ahead.
    Returns (out, argmax) where argmax (B,) int32 is the head-averaged
    attention peak (None when not windowing) for the monotonic tracker.
    """
    q = _proj_heads(p["w_q"], h_t, num_heads, cdt)
    d = q.shape[-1]
    # mem_k/mem_v may be stored f8 (cfg.kv_cache_dtype): the upcast fuses
    # into the einsum read and, like the weight casts, XLA does not hoist
    # it out of the decode loop — per-step traffic stays at the f8 bytes
    scores = jnp.einsum("bhd,blhd->bhl", q,
                        mem_k.astype(cdt)).astype(jnp.float32) * (d ** -0.5)
    if memory_mask is not None:
        scores = jnp.where(memory_mask[:, None, :], scores, MASK_VALUE)
    if window is not None:
        w_back, w_fwd = window
        l_idx = jnp.arange(scores.shape[-1])[None, :]
        in_win = ((l_idx >= align_pos[:, None] - w_back)
                  & (l_idx <= align_pos[:, None] + w_fwd))
        scores = jnp.where(in_win[:, None, :], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhl,blhd->bhd", probs.astype(cdt), mem_v.astype(cdt))
    out = dense(p["w_o"], out.reshape(out.shape[0], -1), cdt)
    if window is None:
        return out, None
    return out, jnp.argmax(jnp.mean(probs, axis=1), axis=-1).astype(jnp.int32)


def _ffn_step(p, y_t, act_name, cdt):
    from rtts.nn.layers import activation

    h = layer_norm(p["ln"], y_t)
    h = activation(act_name)(dense(p["w_in"], h, cdt))
    return dense(p["w_out"], h, cdt)


# ---------------------------------------------------------------------------
# decode state
# ---------------------------------------------------------------------------


class DecodeState(NamedTuple):
    t: jnp.ndarray                 # scalar int32 step
    done: jnp.ndarray              # (B,) bool
    lengths: jnp.ndarray           # (B,) int32 — first-stop frame counts
    prev_frame: jnp.ndarray        # (B, n_mels)
    mel: jnp.ndarray               # (B, T_max, n_mels)
    stop_logits: jnp.ndarray       # (B, T_max)
    k_caches: Any                 # tuple over self-attn layers (normalized K)
    v_caches: Any
    b_caches: Any                  # tuple of bucket caches (LSH mode) or ()
    align_pos: Any = ()            # (B,) int32 alignment tracker when
    #                                attn_window is active, else () (empty)


class DecodeResult(NamedTuple):
    """Uniform return contract for every greedy decode entry point
    (VERDICT r2 item 9: one signature across serving and faithful modes)."""

    mel_post: jnp.ndarray          # (B, T_max, n_mels) float32, length-masked
    lengths: jnp.ndarray           # (B,) int32 — first-stop frame counts
    stop_logits: jnp.ndarray       # (B, T_max) float32


def _init_mem_kv(params, cfg: ReformerTTSConfig, memory, cdt):
    """Precompute cross-attention K/V per decoder cross layer (stored in
    cfg.kv_cache_dtype — f8 halves the per-step cross-attention read).

    K/V project from the RAW encoder memory, exactly as training's
    ``f_cross`` does (stack.py: the cross layer's ``ln`` normalizes the
    DECODER stream — the query side — not the memory).  An earlier version
    applied that LN to the memory here; it hid inside parity tolerances
    only because freshly-initialized LN params (scale 1, bias 0) on
    already-final_ln'd memory are near-identity — on a trained checkpoint
    it diverged the cached decode ~50% from training numerics."""
    num_heads = cfg.decoder.attention.num_heads
    kdt = _kv_dtype(cfg, cdt)
    mem_k, mem_v = [], []
    layers = params["decoder"]["layers"]
    b, l, _ = memory.shape
    # layer layout from stack_init(cross_attend=True): [self, cross] * L
    for i in range(1, len(layers), 2):
        p = layers[i]["f"]
        k = dense(p["attn"]["w_k"], memory, cdt).reshape(b, l, num_heads, -1)
        v = dense(p["attn"]["w_v"], memory, cdt).reshape(b, l, num_heads, -1)
        mem_k.append(_to_kv(k, kdt))
        mem_v.append(_to_kv(v, kdt))
    return tuple(mem_k), tuple(mem_v)


def _stack_substep(params, cfg: ReformerTTSConfig, x_t, cdt,
                   self_attn_fn, cross_fn):
    """Two-stream recurrence over decoder layers for ONE frame — the
    single implementation shared by the eager step (_decoder_step) and
    block decoding (_make_block_step_fn), parameterized by how
    self-attention is applied:

        self_attn_fn(ci, attn_params, hh) -> out
        cross_fn(xi, attn_params, hh) -> out

    (hh is the pre-LN'd stream; the callbacks own cache side effects.)"""
    dcfg = cfg.decoder
    layers = params["decoder"]["layers"]
    # residual streams ride f32, matching stack_apply's cast at stack entry
    # (CLAUDE.md convention): bf16 sublayer outputs promote on the add, so
    # the cached decode accumulates exactly like training instead of
    # rounding every residual to bf16
    h1 = h2 = x_t.astype(jnp.float32)
    ci = 0  # self-attn cache index
    xi = 0  # cross layer index
    for li, lp in enumerate(layers):
        hh = layer_norm(lp["f"]["ln"], h2)
        if li % 2 == 1:
            out = cross_fn(xi, lp["f"]["attn"], hh)
            xi += 1
        else:
            out = self_attn_fn(ci, lp["f"]["attn"], hh)
            ci += 1
        h1 = h1 + out
        h2 = h2 + _ffn_step(lp["g"], h1, dcfg.ffn_activation, cdt)
    y = (h1 + h2) * 0.5
    return layer_norm(params["decoder"]["final_ln"], y)


def _decoder_step(params, cfg: ReformerTTSConfig, x_t, state: DecodeState,
                  mem_k, mem_v, memory_mask, cdt, rotations=None,
                  window=None, local_spec=None):
    """Run one frame through the decoder stack (two-stream recurrence).

    x_t: (B, D) post-prenet+posenc frame.  ``rotations`` non-None selects
    the LSH bucket-cache attention.  ``local_spec`` (per-self-layer
    ``(chunk, before, W)`` or None, see ``_local_spec``) routes flagged
    layers through the windowed ring cache.  ``window`` non-None applies
    monotonic cross-attention windowing around ``state.align_pos`` (see
    ``_cross_attn_step``); the returned tracker is the LAST cross layer's
    attention peak (the layer the alignment diagnostics read).  Returns
    (out (B,D), k_caches, v_caches, b_caches, align_peak-or-None)."""
    num_heads = cfg.decoder.attention.num_heads
    k_caches = list(state.k_caches)
    v_caches = list(state.v_caches)
    b_caches = list(state.b_caches)
    peak = [None]

    def self_attn(ci, p, h):
        if local_spec is not None and local_spec[ci] is not None:
            chunk, before, _ = local_spec[ci]
            out, k_caches[ci], v_caches[ci] = _self_attn_step_local(
                p, h, k_caches[ci], v_caches[ci], state.t, num_heads, cdt,
                chunk, before)
        elif rotations is not None and isinstance(b_caches[ci], dict):
            out, k_caches[ci], v_caches[ci], b_caches[ci] = \
                _self_attn_step_lsh_chunk(
                    p, h, k_caches[ci], v_caches[ci], b_caches[ci],
                    rotations[ci], state.t, num_heads, cdt)
        elif rotations is not None:
            out, k_caches[ci], v_caches[ci], b_caches[ci] = \
                _self_attn_step_lsh(
                    p, h, k_caches[ci], v_caches[ci], b_caches[ci],
                    rotations[ci], state.t, num_heads, cdt)
        else:
            out, k_caches[ci], v_caches[ci] = _self_attn_step(
                p, h, k_caches[ci], v_caches[ci], state.t, num_heads, cdt)
        return out

    def cross(xi, p, h):
        out, amax = _cross_attn_step(p, h, mem_k[xi], mem_v[xi], memory_mask,
                                     num_heads, cdt, window=window,
                                     align_pos=(state.align_pos
                                                if window is not None
                                                else None))
        peak[0] = amax
        return out

    y = _stack_substep(params, cfg, x_t, cdt, self_attn, cross)
    return y, tuple(k_caches), tuple(v_caches), tuple(b_caches), peak[0]


def _pos_table(params, cfg: ReformerTTSConfig):
    """(max_pos, D) positional table + scalar alpha for per-step slicing."""
    if cfg.pos_encoding == "axial":
        p = params["dec_pos"]
        ax1, ax2 = p["ax1"], p["ax2"]
        d1, _, f1 = ax1.shape
        _, d2, f2 = ax2.shape
        table = jnp.concatenate(
            [jnp.broadcast_to(ax1, (d1, d2, f1)),
             jnp.broadcast_to(ax2, (d1, d2, f2))], axis=-1,
        ).reshape(d1 * d2, f1 + f2)
        return table, jnp.ones((), table.dtype)
    return params["dec_pos"]["table"], params["dec_pos"]["alpha"]


def _make_step_fn(params, cfg: ReformerTTSConfig, mem_k, mem_v, memory_mask,
                  rng, stop_threshold, teacher_mel=None, rotations=None,
                  attn_window=None, local_spec=None):
    cdt = _dtype(cfg.compute_dtype)
    pos_table, pos_alpha = _pos_table(params, cfg)
    r = cfg.reduction_factor
    n_mels = cfg.n_mels

    def step(state: DecodeState) -> DecodeState:
        t = state.t                      # group index (== frame index if r=1)
        # prenet (always-on dropout — fresh key per step)
        k_t = jax.random.fold_in(rng, t)
        h = prenet_mlp(params["dec_prenet"], state.prev_frame.astype(cdt), k_t,
                       cfg.dec_prenet_dropout, always_dropout=True,
                       deterministic=True, compute_dtype=cdt)
        pe = jax.lax.dynamic_slice_in_dim(pos_table, t, 1, axis=0)[0]
        h = h + pos_alpha.astype(h.dtype) * pe.astype(h.dtype)
        y, k_caches, v_caches, b_caches, peak = _decoder_step(
            params, cfg, h, state, mem_k, mem_v, memory_mask, cdt,
            rotations=rotations, window=attn_window, local_spec=local_spec)
        group = dense(params["mel_head"], y, cdt).astype(jnp.float32)
        frames = group.reshape(-1, r, n_mels)            # (B, r, n_mels)
        stop_logit = dense(params["stop_head"], y, cdt)[..., 0].astype(jnp.float32)

        # ``live`` gates the observable writes so that trailing steps inside
        # an unrolled while_loop trip (executed after every row is done,
        # where unroll=1 would already have exited) leave the buffers
        # bit-identical to the unroll=1 run.  Teacher forcing always writes.
        live = (~jnp.all(state.done)) | (teacher_mel is not None)
        cur_mel = jax.lax.dynamic_slice_in_dim(state.mel, t * r, r, axis=1)
        mel = jax.lax.dynamic_update_slice_in_dim(
            state.mel, jnp.where(live, frames, cur_mel), t * r, axis=1)
        cur_stop = jax.lax.dynamic_slice_in_dim(
            state.stop_logits, t * r, r, axis=1)
        stop_rep = jnp.repeat(stop_logit[:, None], r, axis=1)
        stop_logits = jax.lax.dynamic_update_slice_in_dim(
            state.stop_logits, jnp.where(live, stop_rep, cur_stop),
            t * r, axis=1)
        newly_done = jax.nn.sigmoid(stop_logit) > stop_threshold
        done = state.done | newly_done
        lengths = jnp.where(state.done, state.lengths, (t + 1) * r)
        if teacher_mel is not None:
            # the next step consumes the next teacher group (clamped slice
            # is harmless on the final step)
            nxt = jax.lax.dynamic_slice_in_dim(
                teacher_mel, (t + 1) * r, r, axis=1)
            next_frame = nxt.reshape(nxt.shape[0], r * n_mels)
        else:
            next_frame = group
        if attn_window is not None:
            # monotonic tracker: never retreats; frozen once a row stops
            align = jnp.where(state.done | ~live, state.align_pos,
                              jnp.maximum(state.align_pos, peak))
        else:
            align = state.align_pos
        return DecodeState(t + 1, done, lengths, next_frame, mel,
                           stop_logits, k_caches, v_caches, b_caches, align)

    return step


def _self_attn_block_substep(p, h_t, k_cache, v_cache, flight_k, flight_v,
                             t, num_heads, cdt):
    """Full-attention substep with DEFERRED cache writes (block decoding).

    ``flight_k``/``flight_v`` hold the current trip's earlier entries
    (python lists of (B, H, d), statically sized) — positions t-j..t-1
    when this call serves position t.  The cache still ends at the trip
    start, so cache scores mask everything from the trip start on and the
    in-flight entries supply those positions instead; concatenated in
    position order, the score vector holds the same values as the
    eager-write step (softmax reduction length differs by the masked
    tail — refusion-class numerics, same as staged decoding).  Returns
    (out, k_entry, v_entry) — entries already in storage dtype, for ONE
    batched dynamic_update_slice per buffer per trip (multiple updates to
    the same carried buffer defeat XLA's in-place aliasing — BENCH.md
    "Decode-loop unrolling")."""
    qk_t = _proj_heads(p["w_qk"], h_t, num_heads, cdt)   # (B, H, d)
    v_t = _proj_heads(p["w_v"], h_t, num_heads, cdt)
    d = qk_t.shape[-1]
    quant = k_cache.dtype != qk_t.dtype
    k_t = _len_norm(qk_t) if quant else _len_norm(qk_t) * (d ** -0.5)
    q_s = qk_t * (d ** -0.5) if quant else qk_t
    # storage-dtype roundtrip so values equal what a cache read-back gives
    k_store = _to_kv(k_t, k_cache.dtype)
    v_store = _to_kv(v_t, v_cache.dtype)

    j = len(flight_k)                       # position within the trip
    trip_start = t - j
    scores_c = jnp.einsum("bhd,bthd->bht", q_s,
                          k_cache.astype(cdt)).astype(jnp.float32)
    pos = jnp.arange(k_cache.shape[1])[None, None, :]
    # cache rows from the trip start on are stale — the flight covers them
    scores_c = jnp.where(pos >= trip_start, MASK_VALUE, scores_c)

    prev_k = jnp.stack(flight_k + [k_store], axis=1)     # (B, j+1, H, d)
    prev_v = jnp.stack(flight_v + [v_store], axis=1)
    scores_f = jnp.einsum("bhd,bjhd->bhj", q_s,
                          prev_k.astype(cdt)).astype(jnp.float32)
    # self-position penalty, exactly as the eager step's pos == t branch
    scores_f = scores_f.at[..., -1].set(SELF_MASK_VALUE)

    scores = jnp.concatenate([scores_c, scores_f], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    t_max = k_cache.shape[1]
    out = (jnp.einsum("bht,bthd->bhd", probs[..., :t_max].astype(cdt),
                      v_cache.astype(cdt))
           + jnp.einsum("bhj,bjhd->bhd", probs[..., t_max:].astype(cdt),
                        prev_v.astype(cdt)))
    out = out.reshape(out.shape[0], -1)
    return dense(p["w_o"], out, cdt), k_store, v_store


def _make_block_step_fn(params, cfg: ReformerTTSConfig, mem_k, mem_v,
                        memory_mask, rng, stop_threshold, block: int):
    """Body advancing ``block`` decoder steps per while_loop trip
    (kv_full mode only): per-step work is identical to _make_step_fn's,
    but each KV cache / mel / stop buffer receives ONE batched
    dynamic_update_slice per trip — preserving XLA's in-place buffer
    aliasing (the naive k-steps-per-trip unroll copies the caches every
    extra step) while amortizing the measured ~55 µs fixed per-trip cost
    k-fold (BENCH.md "Decode-loop unrolling").

    The layer recurrence is SHARED with the eager path (_stack_substep);
    only the per-frame IO (prenet/posenc, mel/stop heads, live gating,
    lengths) is restated here for the k-step structure — changes to that
    logic in _make_step_fn must be mirrored, and the unroll>1 parity
    test (test_unroll_block_matches_eager_kv_full) is the tripwire."""
    cdt = _dtype(cfg.compute_dtype)
    pos_table, pos_alpha = _pos_table(params, cfg)
    r = cfg.reduction_factor
    n_mels = cfg.n_mels
    num_heads = cfg.decoder.attention.num_heads

    def body(state: DecodeState) -> DecodeState:
        t0 = state.t
        n_self = len(state.k_caches)
        flight_k = [[] for _ in range(n_self)]
        flight_v = [[] for _ in range(n_self)]
        prev_frame = state.prev_frame
        done = state.done
        lengths = state.lengths
        groups, stops, lives = [], [], []
        for j in range(block):
            t = t0 + j
            key = jax.random.fold_in(rng, t)
            h = prenet_mlp(params["dec_prenet"], prev_frame.astype(cdt), key,
                           cfg.dec_prenet_dropout, always_dropout=True,
                           deterministic=True, compute_dtype=cdt)
            pe = jax.lax.dynamic_slice_in_dim(pos_table, t, 1, axis=0)[0]
            h = h + pos_alpha.astype(h.dtype) * pe.astype(h.dtype)

            def self_attn(ci, p, hh, _t=t):
                out, k_e, v_e = _self_attn_block_substep(
                    p, hh, state.k_caches[ci], state.v_caches[ci],
                    flight_k[ci], flight_v[ci], _t, num_heads, cdt)
                flight_k[ci].append(k_e)
                flight_v[ci].append(v_e)
                return out

            def cross(xi, p, hh):
                return _cross_attn_step(p, hh, mem_k[xi], mem_v[xi],
                                        memory_mask, num_heads, cdt)[0]

            y = _stack_substep(params, cfg, h, cdt, self_attn, cross)

            group = dense(params["mel_head"], y, cdt).astype(jnp.float32)
            stop_logit = dense(params["stop_head"], y,
                               cdt)[..., 0].astype(jnp.float32)
            lives.append(~jnp.all(done))
            groups.append(group)
            stops.append(stop_logit)
            newly_done = jax.nn.sigmoid(stop_logit) > stop_threshold
            lengths = jnp.where(done, lengths, (t0 + j + 1) * r)
            done = done | newly_done
            prev_frame = group

        # ---- single batched write per buffer ----
        k_caches = tuple(
            jax.lax.dynamic_update_slice_in_dim(
                state.k_caches[ci], jnp.stack(flight_k[ci], axis=1), t0,
                axis=1)
            for ci in range(n_self))
        v_caches = tuple(
            jax.lax.dynamic_update_slice_in_dim(
                state.v_caches[ci], jnp.stack(flight_v[ci], axis=1), t0,
                axis=1)
            for ci in range(n_self))

        frames = jnp.concatenate(
            [g.reshape(-1, r, n_mels) for g in groups], axis=1)  # (B,k*r,M)
        stop_rep = jnp.concatenate(
            [jnp.repeat(s[:, None], r, axis=1) for s in stops], axis=1)
        live_mask = jnp.repeat(jnp.stack(lives), r)              # (k*r,)
        cur_mel = jax.lax.dynamic_slice_in_dim(state.mel, t0 * r,
                                               block * r, axis=1)
        mel = jax.lax.dynamic_update_slice_in_dim(
            state.mel,
            jnp.where(live_mask[None, :, None], frames, cur_mel),
            t0 * r, axis=1)
        cur_stop = jax.lax.dynamic_slice_in_dim(state.stop_logits, t0 * r,
                                                block * r, axis=1)
        stop_logits = jax.lax.dynamic_update_slice_in_dim(
            state.stop_logits,
            jnp.where(live_mask[None, :], stop_rep, cur_stop), t0 * r,
            axis=1)
        return DecodeState(t0 + block, done, lengths, prev_frame, mel,
                           stop_logits, k_caches, v_caches, state.b_caches,
                           state.align_pos)

    return body


def _init_state(params, cfg: ReformerTTSConfig, batch: int, max_frames: int,
                lsh_cache: bool = False, ring_buckets: int = 0,
                ring_capacity: int = 0, track_align: bool = False,
                local_spec=None):
    cdt = _dtype(cfg.compute_dtype)
    kdt = _kv_dtype(cfg, cdt)
    a = cfg.decoder.attention
    n_self = cfg.decoder.num_layers
    r = cfg.reduction_factor
    if max_frames % r != 0:
        raise ValueError(f"max_frames {max_frames} not a multiple of "
                         f"reduction_factor {r}")
    n_groups = max_frames // r

    def cache_len(ci):
        # kv_local layers carry a fixed W-slot ring, not the full prefix
        if local_spec is not None and local_spec[ci] is not None:
            return local_spec[ci][2]
        return n_groups

    qk = tuple(jnp.zeros((batch, cache_len(i), a.num_heads, a.head_dim),
                         kdt) for i in range(n_self))
    v = tuple(jnp.zeros((batch, cache_len(i), a.num_heads, a.head_dim),
                        kdt) for i in range(n_self))
    if ring_buckets > 0:
        # O(chunk) mode: per-(head, round, bucket) position ring buffers
        b = tuple(
            {"idx": jnp.full((batch, a.num_heads, a.num_hashes,
                              ring_buckets, ring_capacity), -1, jnp.int32),
             "cnt": jnp.zeros((batch, a.num_heads, a.num_hashes,
                               ring_buckets), jnp.int32)}
            for _ in range(n_self))
    elif lsh_cache:
        # bucket ids are >= 0, so -1 never spuriously matches pre-fill
        b = tuple(jnp.full((batch, a.num_heads, a.num_hashes, n_groups),
                           -1, jnp.int32) for _ in range(n_self))
    else:
        b = tuple(() for _ in range(n_self))
    return DecodeState(
        t=jnp.asarray(0, jnp.int32),
        done=jnp.zeros((batch,), bool),
        lengths=jnp.full((batch,), max_frames, jnp.int32),
        prev_frame=jnp.zeros((batch, cfg.n_mels * r), jnp.float32),
        mel=jnp.zeros((batch, max_frames, cfg.n_mels), jnp.float32),
        stop_logits=jnp.zeros((batch, max_frames), jnp.float32),
        k_caches=qk,
        v_caches=v,
        b_caches=b,
        align_pos=(jnp.zeros((batch,), jnp.int32) if track_align else ()),
    )


def _grow_state(state: DecodeState, cfg: ReformerTTSConfig,
                new_groups: int, local_spec=None) -> DecodeState:
    """Pad the time axes of the decode buffers out to ``new_groups``.

    Used by staged decoding: the KV caches are the dominant per-step HBM
    read (BENCH.md cost model — each step re-reads the whole cache), so
    early steps run against small buffers that are grown geometrically.
    Pad values are the same as _init_state's (zeros; -1 for kv_lsh bucket
    ids so padding never matches a real bucket); ring buffers in the
    kv_lsh_chunk mode are position-indexed, not time-sized, and carry
    over unchanged, as do kv_local's fixed W-slot rings (the ring slot is
    ``pos mod W`` — resizing W mid-decode would scramble it)."""
    r = cfg.reduction_factor

    def pad_to(x, axis, new, fill=0):
        n = new - x.shape[axis]
        if n <= 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, n)
        return jnp.pad(x, widths, constant_values=fill)

    def is_ring(ci):
        return local_spec is not None and local_spec[ci] is not None

    k = tuple(c if is_ring(i) else pad_to(c, 1, new_groups)
              for i, c in enumerate(state.k_caches))
    v = tuple(c if is_ring(i) else pad_to(c, 1, new_groups)
              for i, c in enumerate(state.v_caches))
    b = tuple(bc if isinstance(bc, (dict, tuple)) else
              pad_to(bc, 3, new_groups, -1)
              for bc in state.b_caches)
    return state._replace(
        mel=pad_to(state.mel, 1, new_groups * r),
        stop_logits=pad_to(state.stop_logits, 1, new_groups * r),
        k_caches=k, v_caches=v, b_caches=b)


def _stage_sizes(n_groups: int, stage_min: int) -> Tuple[int, ...]:
    """Geometric (x2) buffer schedule ending at n_groups; total KV read
    drops to ~2/3 of the fixed-size loop's."""
    sizes = [n_groups]
    s = n_groups
    while s % 2 == 0 and s // 2 >= stage_min:
        s //= 2
        sizes.append(s)
    return tuple(reversed(sizes))


# rotation-key namespace: fold_in(rng, t) keys the per-step prenet dropout,
# so the rotation fold constant must be unreachable by any step index t
# (t < max_frames << 2^31); 999 collided with decode step 999
_ROT_KEY = 0x7FFFFFFF


def _decode_rotations(cfg: ReformerTTSConfig, rng, max_frames: int):
    """Per-self-layer hash rotations for LSH-cached decoding."""
    from rtts.attention.lsh import auto_num_buckets

    from rtts.attention.lsh import total_buckets

    a = cfg.decoder.attention
    # the decoder runs at the GROUP rate (T/r): auto-bucket from groups,
    # exactly as training's LSH sees x.shape[1] groups — frames would give
    # r-times too many buckets for reduction_factor > 1
    n_groups = max_frames // cfg.reduction_factor
    nb = a.num_buckets or auto_num_buckets(n_groups, a.chunk_length)
    # decode draws fresh rotations, so a factorized training spec maps to a
    # plain LSH with the same total bucket count here
    nb = total_buckets(nb)
    if a.hash_seed is not None:
        rng = jax.random.PRNGKey(a.hash_seed)
    keys = jax.random.split(rng, cfg.decoder.num_layers)
    rots = tuple(
        jax.random.normal(keys[i], (a.num_heads, a.head_dim, a.num_hashes,
                                    nb // 2), jnp.float32)
        for i in range(cfg.decoder.num_layers))
    return rots, nb


def _auto_staged(n_groups: int) -> bool:
    """The staged="auto" rule, shared with the bench FLOPs model
    (rtts/bench.py::_decode_flops) so the modeled stage schedule always
    matches the executed one.  Evidence threshold (BENCH.md staged
    sweep, pre-cast bf16 weights): staging wins +15-44% at every
    measured shape from 256 groups up (b8x256..b32x1024) except b32x512
    (-1.8%, noise)."""
    return n_groups >= 256


def _auto_mode(cfg: ReformerTTSConfig, max_frames: int) -> str:
    """Pick the serving cache by measured cost model.

    kv_lsh_chunk's per-step attention touches nh*C keys plus per-layer
    gather/scatter overhead; kv_full touches the whole n_groups prefix in
    one dense einsum.  Calibrated by the round-3 same-process sweep
    (BENCH.md r3 "decode crossover", base cfg nh4 cap128 b2):
    chunk/full throughput ratio 0.20 @1k, 0.69 @2k, 0.83 @4k, 1.50 @8k —
    log-interpolated crossover ~5.1k groups = ~10x the nh*C ring working
    set (the old factor-2 guess was 5x too eager; a 2k-frame request
    would have paid a 31%% slowdown)."""
    from rtts.config import resolve_attention_kind
    from rtts.models.stack import _layer_kinds

    a = cfg.decoder.attention
    n_groups = max_frames // cfg.reduction_factor
    kinds = set(resolve_attention_kind(a, n_groups) if k == "auto" else k
                for k in _layer_kinds(cfg.decoder))
    if "local" in kinds:
        # kv_local whenever the stack has local layers (pure OR mixed):
        # it is the training-faithful window AND O(W) per step on those
        # layers vs kv_full's O(T) superset; non-local layers route
        # per-layer (full -> exact prefix, lsh -> the same superset
        # kv_full would use).  Measured (PARITY.md "local serving",
        # BENCH.md r5 "kv_local"): fidelity drift vs recompute is
        # checkpoint noise in both modes (ordering flips between the 2k
        # and 6k arms), speed is 1.07x/1.38x/1.66x at 512/2048/4096
        # frames on the mixed [local,lsh]x2 decoder.
        return "kv_local"
    if "lsh" not in kinds:
        return "kv_full"
    if kinds != {"lsh"}:
        return "kv_full"   # mixed lsh+full: serve through the superset
    ring_cap = min(
        a.chunk_length * (1 + a.num_chunks_before + a.num_chunks_after),
        n_groups)
    return ("kv_lsh_chunk" if n_groups > 10 * a.num_hashes * ring_cap
            else "kv_full")


def decode_greedy(
    params,
    cfg: ReformerTTSConfig,
    memory: jnp.ndarray,
    memory_mask: jnp.ndarray,
    max_frames: int,
    rng: Optional[jax.Array] = None,
    stop_threshold: Optional[float] = None,
    mode: str = "kv_full",
    unroll: int = 1,
    staged="auto",
    stage_min: int = 128,
    attn_window: Optional[Tuple[int, int]] = None,
) -> "DecodeResult":
    """Greedy AR decode -> DecodeResult(mel_post (B,T_max,n_mels), lengths (B,), stop_logits).

    attn_window: optional (w_back, w_fwd) monotonic cross-attention window
    in TOKENS: each step the decoder may only attend to encoder positions
    within [peak - w_back, peak + w_fwd] of a per-example alignment
    tracker that follows the last cross layer's attention peak and never
    retreats — the classic TTS inference guard against looping (attention
    jumping back => repeated speech) and skipping.  Opt-in; adds one (B,)
    int32 to the loop carry.  Incompatible with unroll > 1 (the block
    path does not thread the tracker).

    mode: "kv_full"      — full-attention KV cache (standard serving)
          "kv_lsh"       — LSH bucket-mask attention over the whole prefix
                           (training-faithful pattern, O(T) per step)
          "kv_lsh_chunk" — LSH ring-buffer cache: O(chunk) per step —
                           gathers only the query's bucket's most recent
                           keys per round (SURVEY.md §3.2 incremental
                           cache; equals kv_lsh whenever no bucket
                           overflows the ring)
          "kv_local"     — sliding-chunk ring cache for local-attention
                           layers: the training-exact window
                           [t//c - before .. t//c] chunks, O(W) per step
                           (W = chunk*(1+before)); non-local layers in a
                           mixed attn_layers decoder keep their full
                           cache
          "auto"         — kv_lsh_chunk for LSH decoders WHEN it saves
                           work (see _auto_mode), kv_local for local
                           decoders, else kv_full

    unroll: decoder steps executed per while_loop trip.  For kv_full
    this uses BLOCK decoding: each trip runs k steps with deferred
    cache writes — per-layer in-flight K/V entries ride as statically
    sized registers and each KV/mel/stop buffer receives ONE batched
    dynamic_update_slice per trip, preserving XLA's in-place aliasing
    (the naive k-writes-per-trip unroll copies the caches every extra
    step: measured +33%/+88% wall at k=2/4).  Numerics: the in-flight
    scores concatenate after the cache scores in position order, so the
    score VALUES match the eager step exactly but the f32 softmax
    reduction length differs — refusion-class differences (same class
    as staged), lengths within one step near the stop threshold.  For
    the LSH modes the trip is a plain k-step replay (bit-identical,
    tested).  Snapped down to the largest divisor of the group count;
    early-stop granularity coarsens to ``unroll`` steps.  MEASURED on
    the tunneled v5e (BENCH.md): still a mild LOSS (−6% at k=2, −18%
    at k=4 — far better than the copying unroll it replaces, but the
    fixed per-trip cost does not amortize away); default 1.

    staged: run the loop in log-spaced stages with geometrically growing
    KV/mel buffers (x2 from ``stage_min`` groups).  Every step re-reads
    its whole cache — the dominant HBM traffic (BENCH.md cost model) —
    so capping early steps' buffers cuts total cache reads to ~2/3.
    Static shapes per stage (one while_loop each); numerics differ from
    the fixed-size loop only by f32 softmax reduction size (same class
    as an XLA refusion), early stop is preserved.  Measured with
    pre-cast bf16 weights (BENCH.md): +15-44% frames/s at every shape
    from 256 groups up — "auto" (default) enables it from 256 groups.

    Jit-compatible: call under jax.jit with static max_frames."""
    cdt = _dtype(cfg.compute_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if stop_threshold is None:
        stop_threshold = cfg.stop_threshold
    if mode == "auto":
        mode = _auto_mode(cfg, max_frames)
    if max_frames % cfg.reduction_factor != 0:
        # validate here: _init_state only ever sees sizes[0]*r (always a
        # multiple), so without this check an invalid max_frames would
        # surface as an opaque shape mismatch at the final frame mask
        raise ValueError(f"max_frames {max_frames} not a multiple of "
                         f"reduction_factor {cfg.reduction_factor}")
    if mode not in ("kv_full", "kv_lsh", "kv_lsh_chunk", "kv_local"):
        raise ValueError(f"unknown decode mode {mode!r} (want kv_full, "
                         "kv_lsh, kv_lsh_chunk, kv_local or auto)")
    batch = memory.shape[0]
    params = _precast_weights(params, cdt)
    mem_k, mem_v = _init_mem_kv(params, cfg, memory.astype(cdt), cdt)
    rotations, nb = (None, 0)
    if mode in ("kv_lsh", "kv_lsh_chunk"):
        rotations, nb = _decode_rotations(cfg, jax.random.fold_in(rng, _ROT_KEY),
                                          max_frames)
    local_spec = None
    if mode == "kv_local":
        local_spec = _local_spec(cfg, max_frames // cfg.reduction_factor)
        if not any(s is not None for s in local_spec):
            raise ValueError(
                "kv_local needs at least one decoder self-attention layer "
                "with resolved kind 'local' (attention.kind or attn_layers)"
                " — this decoder has none; use mode='auto'")
    if attn_window is not None:
        w_back, w_fwd = attn_window
        if w_back < 0 or w_fwd < 1:
            raise ValueError(
                f"attn_window must satisfy w_back >= 0 and w_fwd >= 1 "
                f"(the tracker must be able to advance), got {attn_window}")
        if unroll > 1:
            raise ValueError("attn_window is incompatible with unroll > 1 "
                             "(block decoding does not thread the "
                             "alignment tracker)")
    step = _make_step_fn(params, cfg, mem_k, mem_v, memory_mask, rng,
                         stop_threshold, rotations=rotations,
                         attn_window=attn_window, local_spec=local_spec)
    a = cfg.decoder.attention
    n_groups = max_frames // cfg.reduction_factor
    if staged == "auto":
        # kv_lsh_chunk's per-step gather is O(C), so staging only trims
        # its linear mel/stop/k/v writes (still wins at 8k, measured)
        staged = _auto_staged(n_groups)
    sizes = _stage_sizes(n_groups, stage_min) if staged else (n_groups,)
    # snap unroll to a divisor of the first stage's step count (later
    # stages are power-of-two multiples of it, so it divides those too)
    unroll = max(1, min(int(unroll), sizes[0]))
    while sizes[0] % unroll:       # largest divisor <= requested
        unroll -= 1
    ring_cap = a.chunk_length * (1 + a.num_chunks_before + a.num_chunks_after)
    state = _init_state(
        params, cfg, batch, sizes[0] * cfg.reduction_factor,
        lsh_cache=(mode == "kv_lsh"),
        ring_buckets=(nb if mode == "kv_lsh_chunk" else 0),
        ring_capacity=min(ring_cap, n_groups),
        track_align=attn_window is not None,
        local_spec=local_spec)

    if unroll > 1 and mode == "kv_full":
        # block decoding: one batched cache write per trip (keeps XLA's
        # in-place aliasing), k trips' fixed cost amortized
        body = _make_block_step_fn(params, cfg, mem_k, mem_v, memory_mask,
                                   rng, stop_threshold, block=unroll)
    else:
        def body(s: DecodeState) -> DecodeState:
            for _ in range(unroll):
                s = step(s)
            return s

    for size in sizes:
        if size * cfg.reduction_factor > state.mel.shape[1]:
            state = _grow_state(state, cfg, size, local_spec=local_spec)

        def cond(s: DecodeState, _cap=size):
            return (s.t < _cap) & ~jnp.all(s.done)

        state = jax.lax.while_loop(cond, body, state)
    # postnet over the full buffer (masked by lengths downstream)
    residual = postnet_apply(params["postnet"], cfg, state.mel.astype(cdt),
                             None, True, cdt).astype(jnp.float32)
    mel_post = state.mel + residual
    frame_mask = jnp.arange(max_frames)[None, :] < state.lengths[:, None]
    mel_post = mel_post * frame_mask[..., None]
    return DecodeResult(mel_post, state.lengths, state.stop_logits)


def decode_greedy_recompute(
    params,
    cfg: ReformerTTSConfig,
    memory: jnp.ndarray,
    memory_mask: jnp.ndarray,
    max_frames: int,
    rng: Optional[jax.Array] = None,
    stop_threshold: Optional[float] = None,
) -> "DecodeResult":
    """Reference-faithful AR loop: re-runs the FULL decoder stack on the
    padded prefix every step (the reference's TTS loop has no LSH KV-cache —
    SURVEY.md §4.3), so it works with any self-attention kind including LSH
    with its exact bucketed pattern.  O(T^2) in decoder passes; use
    ``decode_greedy`` (incremental KV cache) for serving throughput.

    Returns the same ``DecodeResult`` as decode_greedy — callers can A/B the
    faithful mode against serving modes element-for-element.

    max_frames must be a multiple of the decoder LSH chunk length.
    """
    from rtts.models.reformer_tts import decode_train

    if rng is None:
        rng = jax.random.PRNGKey(0)
    if stop_threshold is None:
        stop_threshold = cfg.stop_threshold
    batch = memory.shape[0]
    cdt = _dtype(cfg.compute_dtype)
    r = cfg.reduction_factor
    if max_frames % r:
        raise ValueError(f"max_frames {max_frames} not a multiple of "
                         f"reduction_factor {r}")
    n_groups = max_frames // r

    def step(carry):
        # one decoder GROUP (r frames) per trip: decode_train consumes
        # group-shifted input (shift_mel semantics — a 1-frame shift would
        # leak a group's own frames into its input for r > 1)
        g, done, lengths, mel, stop_buf = carry
        mel_in = jnp.concatenate(
            [jnp.zeros_like(mel[:, :r]), mel[:, :-r]], axis=1)
        mel_mask = jnp.arange(max_frames)[None, :] < (g + 1) * r
        mel_mask = jnp.broadcast_to(mel_mask, (batch, max_frames))
        pre, _, stop_logits = decode_train(
            params, cfg, mel_in, mel_mask, memory, memory_mask,
            rng=jax.random.fold_in(rng, g), deterministic=True)
        frames = jax.lax.dynamic_slice_in_dim(pre, g * r, r, axis=1)
        stop_g = jax.lax.dynamic_slice_in_dim(stop_logits, g * r, r, axis=1)
        mel = jax.lax.dynamic_update_slice_in_dim(mel, frames, g * r, axis=1)
        stop_buf = jax.lax.dynamic_update_slice_in_dim(
            stop_buf, stop_g.astype(jnp.float32), g * r, axis=1)
        # decode_train repeats the per-group stop logit over its r frames
        newly_done = jax.nn.sigmoid(stop_g[:, -1]) > stop_threshold
        lengths = jnp.where(done, lengths, (g + 1) * r)
        return g + 1, done | newly_done, lengths, mel, stop_buf

    def cond(carry):
        g, done = carry[0], carry[1]
        return (g < n_groups) & ~jnp.all(done)

    carry = (jnp.asarray(0, jnp.int32), jnp.zeros((batch,), bool),
             jnp.full((batch,), max_frames, jnp.int32),
             jnp.zeros((batch, max_frames, cfg.n_mels), jnp.float32),
             jnp.zeros((batch, max_frames), jnp.float32))
    t, done, lengths, mel, stop_buf = jax.lax.while_loop(cond, step, carry)
    residual = postnet_apply(params["postnet"], cfg, mel.astype(cdt),
                             None, True, cdt).astype(jnp.float32)
    mel_post = mel + residual
    frame_mask = jnp.arange(max_frames)[None, :] < lengths[:, None]
    return DecodeResult(mel_post * frame_mask[..., None], lengths, stop_buf)


def decode_teacher_check(
    params,
    cfg: ReformerTTSConfig,
    memory: jnp.ndarray,
    memory_mask: jnp.ndarray,
    teacher_input: jnp.ndarray,   # (B, T, n_mels) — same input decode_train sees
    mode: str = "kv_full",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the incremental path fed with teacher frames; returns
    (mel_pre (B,T,n_mels), stop_logits (B,T)) for parity tests against
    decode_train (deterministic prenet dropout is disabled in both via
    rate=0 configs in the test).  ``mode="kv_local"`` exercises the
    windowed ring cache — exact vs a local-attention decode_train."""
    cdt = _dtype(cfg.compute_dtype)
    b, t_total, _ = teacher_input.shape
    # pre-cast here too: the exact-equality test vs decode_train (which
    # keeps its per-use casts) then doubles as the bit-exactness proof
    # for _precast_weights
    params = _precast_weights(params, cdt)
    mem_k, mem_v = _init_mem_kv(params, cfg, memory.astype(cdt), cdt)
    local_spec = (_local_spec(cfg, t_total // cfg.reduction_factor)
                  if mode == "kv_local" else None)
    step = _make_step_fn(params, cfg, mem_k, mem_v, memory_mask,
                         jax.random.PRNGKey(0), 10.0,
                         teacher_mel=teacher_input, local_spec=local_spec)
    r = cfg.reduction_factor
    state = _init_state(params, cfg, b, t_total, local_spec=local_spec)
    state = state._replace(
        prev_frame=teacher_input[:, :r].reshape(b, r * cfg.n_mels))

    def body(i, s):
        return step(s)

    state = jax.lax.fori_loop(0, t_total // r, body, state)
    return state.mel, state.stop_logits
