"""TTS composite loss (SURVEY.md §3.1 #10): masked MSE on mel before and
after postnet + BCE on the stop token with positive-class weighting (stop
frames are rare — one per utterance)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over valid frames only. pred/target (B,T,C), mask (B,T)."""
    m = mask[..., None].astype(jnp.float32)
    se = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)) * m
    return jnp.sum(se) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask[..., None].astype(jnp.float32)
    ae = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)) * m
    return jnp.sum(ae) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)


def stop_bce(stop_logits: jnp.ndarray, stop_target: jnp.ndarray,
             mask: jnp.ndarray, pos_weight: float) -> jnp.ndarray:
    """Weighted binary cross-entropy on stop logits. All (B, T)."""
    z = stop_logits.astype(jnp.float32)
    y = stop_target.astype(jnp.float32)
    # numerically stable BCE-with-logits, positive class weighted
    log_p = jax.nn.log_sigmoid(z)
    log_not_p = jax.nn.log_sigmoid(-z)
    per = -(pos_weight * y * log_p + (1.0 - y) * log_not_p)
    m = mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def tts_loss(
    mel_pre: jnp.ndarray,
    mel_post: jnp.ndarray,
    stop_logits: jnp.ndarray,
    mel_target: jnp.ndarray,
    stop_target: jnp.ndarray,
    mel_mask: jnp.ndarray,
    stop_pos_weight: float = 8.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    l_pre = masked_mse(mel_pre, mel_target, mel_mask)
    l_post = masked_mse(mel_post, mel_target, mel_mask)
    l_stop = stop_bce(stop_logits, stop_target, mel_mask, stop_pos_weight)
    total = l_pre + l_post + l_stop
    return total, {
        "loss": total,
        "loss_mel_pre": l_pre,
        "loss_mel_post": l_post,
        "loss_stop": l_stop,
        "mel_l1": masked_l1(mel_post, mel_target, mel_mask),
    }


def guided_attention_loss(
    probs_list,
    token_mask: jnp.ndarray,          # (B, L) bool
    mel_mask: jnp.ndarray,            # (B, T) bool, frame rate
    reduction_factor: int = 1,
    sigma: float = 0.2,
) -> jnp.ndarray:
    """Soft-diagonal guided-attention penalty (Tachibana et al. 2017).

    ``probs_list``: per-cross-layer attention probabilities, each
    (B, H, T_groups_padded, L_tokens) float32 — the ``attn_sink`` capture
    from the teacher-forced forward (rtts/models/reformer_tts.py).

    For each example the penalty weight over (decoder group t, token n) is
    ``w[t, n] = 1 - exp(-(n/N - t/T)^2 / (2 sigma^2))`` with N/T the TRUE
    token/group counts, so a perfectly diagonal alignment pays ~0 and mass
    parked far off-diagonal pays ~1.  Each attention row sums to 1, so the
    per-row penalty ``sum_n A[t, n] * w[t, n]`` is in [0, 1]; the loss is
    its mean over valid rows, heads, and layers — scale-free in batch
    shape, so the knob's weight means the same thing at any padding.
    """
    n_tok = jnp.sum(token_mask.astype(jnp.float32), axis=1)          # (B,)
    n_frames = jnp.sum(mel_mask.astype(jnp.int32), axis=1)
    r = max(1, reduction_factor)
    n_groups = ((n_frames + r - 1) // r).astype(jnp.float32)         # (B,)

    total = jnp.float32(0.0)
    for probs in probs_list:
        _, _, tg, lk = probs.shape
        t = jnp.arange(tg, dtype=jnp.float32)[None, :, None]         # (1,T,1)
        n = jnp.arange(lk, dtype=jnp.float32)[None, None, :]         # (1,1,L)
        tt = (t + 0.5) / jnp.maximum(n_groups, 1.0)[:, None, None]
        nn = (n + 0.5) / jnp.maximum(n_tok, 1.0)[:, None, None]
        w = 1.0 - jnp.exp(-jnp.square(nn - tt) / (2.0 * sigma * sigma))
        valid_t = t < n_groups[:, None, None]                        # (B,T,1)
        valid_n = n < n_tok[:, None, None]                           # (B,1,L)
        w = jnp.where(valid_t & valid_n, w, 0.0)                     # (B,T,L)
        row_pen = jnp.sum(probs.astype(jnp.float32) * w[:, None], axis=-1)
        rows = jnp.maximum(jnp.sum(valid_t[..., 0]), 1.0) * probs.shape[1]
        total = total + jnp.sum(row_pen) / rows
    return total / jnp.float32(max(1, len(probs_list)))


def make_stop_target(mel_mask: jnp.ndarray) -> jnp.ndarray:
    """Stop target = 1 at the last valid frame of each utterance."""
    lengths = jnp.sum(mel_mask.astype(jnp.int32), axis=1)
    t = jnp.arange(mel_mask.shape[1])[None, :]
    return (t == (lengths - 1)[:, None]).astype(jnp.float32)
