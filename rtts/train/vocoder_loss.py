"""SqueezeWave flow negative log-likelihood (SURVEY.md §3.1 #12):

    L = sum(z^2) / (2 sigma^2) - sum(log s) - sum(log|det W|)

normalized by the total number of audio samples (z elements), the WaveGlow
convention the reference follows."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp


def squeezewave_loss(
    z: jnp.ndarray,
    log_s_list: List[jnp.ndarray],
    log_det_w_list: List[jnp.ndarray],
    sigma: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    z = z.astype(jnp.float32)
    n = z.size
    z_term = jnp.sum(z * z) / (2.0 * sigma * sigma)
    log_s_term = sum(jnp.sum(ls.astype(jnp.float32)) for ls in log_s_list)
    # log_det terms are per-flow scalars already scaled by squeezed length;
    # scale by batch (each batch row contributes the same W determinant)
    batch = z.shape[0]
    log_det_term = sum(ld for ld in log_det_w_list) * batch
    loss = (z_term - log_s_term - log_det_term) / n
    return loss, {
        "loss_vocoder": loss,
        "z_rms": jnp.sqrt(jnp.mean(z * z)),
        "log_s_mean": log_s_term / n,
        "log_det_mean": log_det_term / n,
    }
