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


def make_stop_target(mel_mask: jnp.ndarray) -> jnp.ndarray:
    """Stop target = 1 at the last valid frame of each utterance."""
    lengths = jnp.sum(mel_mask.astype(jnp.int32), axis=1)
    t = jnp.arange(mel_mask.shape[1])[None, :]
    return (t == (lengths - 1)[:, None]).astype(jnp.float32)
