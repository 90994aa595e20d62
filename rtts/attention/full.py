"""Full softmax attention: the fallback path and the test oracle.

Two flavors:

1. ``full_attention`` / ``cross_attention`` — standard multi-head attention
   (separate Q/K/V, 1/sqrt(d) scaling).  Used for decoder->encoder
   cross-attention, which the reference runs as ordinary attention (the
   Reformer tricks apply to self-attention only — SURVEY.md §2 L3->L2).

2. ``shared_qk_self_attention`` — the Reformer self-attention semantics with
   hashing disabled (the reference's "seq_len <= chunk_length" full-softmax
   fallback, SURVEY.md §3.2 "Full-attention fallback"): one shared QK
   projection (no bias), keys = L2-normalized queries scaled by
   1/sqrt(head_dim), self-attention-to-self forbidden with a milder penalty
   (-1e5) than the causal/pad mask (-1e9) so a token with no other target
   still attends itself.  This is bit-for-bit the contract the LSH kernel
   must match when seq fits in one chunk, which makes it the equivalence
   oracle for the LSH tests (SURVEY.md §5.3 item 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rtts.nn.layers import dense, dense_init, dropout

MASK_VALUE = -1e9
SELF_MASK_VALUE = -1e5


def attention_init(key, d_model: int, num_heads: int, head_dim: int,
                   shared_qk: bool, dtype=jnp.float32):
    """Params for one attention block. Shared-QK saves the separate K proj."""
    ks = jax.random.split(key, 4)
    d_inner = num_heads * head_dim
    p = {
        "w_v": dense_init(ks[2], d_model, d_inner, use_bias=False, dtype=dtype),
        "w_o": dense_init(ks[3], d_inner, d_model, use_bias=False, dtype=dtype),
    }
    if shared_qk:
        p["w_qk"] = dense_init(ks[0], d_model, d_inner, use_bias=False, dtype=dtype)
    else:
        p["w_q"] = dense_init(ks[0], d_model, d_inner, use_bias=False, dtype=dtype)
        p["w_k"] = dense_init(ks[1], d_model, d_inner, use_bias=False, dtype=dtype)
    return p


def _flash_dropout(dropout_rate: float, dropout_rng):
    """(rate, seed) for flash_attend: in-kernel counter-hash dropout when a
    key is live (a different — equally valid — sample than the naive path's
    bernoulli draw), identity otherwise."""
    if dropout_rate > 0.0 and dropout_rng is not None:
        from rtts.ops.flash_attention import dropout_seed_from_key

        return dropout_rate, dropout_seed_from_key(dropout_rng)
    return 0.0, None


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "naive",
    probs_sink: Optional[list] = None,
) -> jnp.ndarray:
    """Masked softmax attention on (B, H, L, d) tensors.

    Softmax runs in float32 (logsumexp-stable) regardless of input dtype.
    ``dropout_rate`` > 0 (with a key) applies attention-probs dropout — the
    reference lineage's attention regularizer (SURVEY.md §3.2 config row).
    ``impl="flash"`` routes through the Pallas online-softmax kernel (no
    L^2 score tensor in HBM; rtts/ops/flash_attention.py), where dropout
    runs in-kernel from a counter-based hash seeded off the same key.
    ``probs_sink``: a Python list to append the float32 PRE-dropout
    probability tensor (B, H, Lq, Lk) to (guided-attention loss capture);
    forces the naive path, since flash never materializes the probs.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    if probs_sink is not None:
        impl = "naive"
    if impl == "flash":
        from rtts.ops.flash_attention import flash_attend

        rate, seed = _flash_dropout(dropout_rate, dropout_rng)
        return flash_attend(q, k, v, kv_mask=kv_mask, causal=causal,
                            self_mask=False, sm_scale=scale,
                            dropout_rate=rate, dropout_seed=seed)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, MASK_VALUE)
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        qi = jnp.arange(lq)[:, None]
        ki = jnp.arange(lk)[None, :]
        logits = jnp.where(qi >= ki, logits, MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    if probs_sink is not None:
        probs_sink.append(probs)
    probs = dropout(dropout_rng, probs, dropout_rate,
                    deterministic=dropout_rng is None)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def cross_attention(
    params,
    x: jnp.ndarray,
    memory: jnp.ndarray,
    memory_mask: Optional[jnp.ndarray] = None,
    num_heads: int = 8,
    compute_dtype=None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "naive",
    probs_sink: Optional[list] = None,
) -> jnp.ndarray:
    """Standard decoder->encoder attention: x (B,Lq,D), memory (B,Lk,D).

    ``probs_sink``: optional list collecting the (B, H, Lq, Lk) float32
    pre-dropout attention probabilities (see ``full_attention``)."""
    q = _split_heads(dense(params["w_q"], x, compute_dtype), num_heads)
    k = _split_heads(dense(params["w_k"], memory, compute_dtype), num_heads)
    v = _split_heads(dense(params["w_v"], memory, compute_dtype), num_heads)
    out = full_attention(q, k, v, kv_mask=memory_mask, causal=False,
                         dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                         impl=impl, probs_sink=probs_sink)
    return dense(params["w_o"], _merge_heads(out), compute_dtype)


def _len_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """L2-normalize the head dim (variance-based, reference semantics)."""
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


def shared_qk_scores_mask(
    scores: jnp.ndarray,
    q_pos: jnp.ndarray,
    k_pos: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    causal: bool,
    mask_value: float = MASK_VALUE,
    self_mask_value: float = SELF_MASK_VALUE,
) -> jnp.ndarray:
    """Apply pad/causal/self masks to shared-QK scores by *original position*.

    Shared between the full fallback and the LSH kernel (where positions
    arrive permuted by the bucket sort, so masking must use original ids —
    SURVEY.md §3.2 "Masking").

    scores: (..., Lq, Lk) float32; q_pos: (..., Lq); k_pos: (..., Lk);
    kv_mask: (..., Lk) bool validity of keys.
    """
    if kv_mask is not None:
        scores = jnp.where(kv_mask[..., None, :], scores, mask_value)
    if causal:
        scores = jnp.where(
            q_pos[..., :, None] >= k_pos[..., None, :], scores, mask_value
        )
    # forbid attending to self (shared QK makes the diagonal trivially the
    # max); milder value so an isolated token can still fall back to itself
    self_mask = q_pos[..., :, None] == k_pos[..., None, :]
    scores = jnp.where(self_mask, self_mask_value, scores)
    return scores


def shared_qk_self_attention(
    params,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    num_heads: int = 8,
    compute_dtype=None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "naive",
) -> jnp.ndarray:
    """Reformer full-softmax fallback self-attention (see module docstring).

    x: (B, L, D); mask: (B, L) bool validity.  ``dropout_rate``/``dropout_rng``
    apply attention-probs dropout (identity when the key is None).
    ``impl="flash"`` uses the Pallas online-softmax kernel with the exact
    same replace-semantics masks (-1e9 pad/causal, -1e5 self); the length
    normalization and 1/sqrt(d) key scaling stay out here so gradients chain
    through them identically on both paths.
    """
    qk = _split_heads(dense(params["w_qk"], x, compute_dtype), num_heads)
    v = _split_heads(dense(params["w_v"], x, compute_dtype), num_heads)
    d = qk.shape[-1]
    q = qk
    k = _len_norm(qk) * (d ** -0.5)
    if impl == "flash":
        from rtts.ops.flash_attention import flash_attend

        rate, seed = _flash_dropout(dropout_rate, dropout_rng)
        out = flash_attend(q, k, v, kv_mask=mask, causal=causal,
                           self_mask=True, sm_scale=1.0,
                           dropout_rate=rate, dropout_seed=seed)
        return dense(params["w_o"], _merge_heads(out), compute_dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    L = x.shape[1]
    pos = jnp.arange(L)
    kv_mask = mask[:, None, :] if mask is not None else None
    scores = shared_qk_scores_mask(
        scores,
        q_pos=pos[None, None, :],
        k_pos=pos[None, None, :],
        kv_mask=kv_mask,
        causal=causal,
    )
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(dropout_rng, probs, dropout_rate,
                    deterministic=dropout_rng is None)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return dense(params["w_o"], _merge_heads(out), compute_dtype)
