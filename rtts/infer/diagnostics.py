"""Diagnostic forwards exposing attention probabilities (SURVEY.md §6.5:
the reference's primary observability is eval-time artifacts; alignment
heatmaps are the classic TTS diagnostic for encoder-decoder attention).

The training forward never materializes attention probabilities (the
reversible stack recomputes activations and the LSH kernel keeps scores in
VMEM), so this module REPLAYS the teacher-forced decoder with the same
parameters and the same two-stream residual arithmetic, capturing the
cross-attention softmax of every cross layer.  The replay is exact: the
reversible and plain stacks compute identical math forward
(rtts/reversible/rev.py::reversible_sequence), and the replay mirrors
decode_train's input preparation (shift, reduction grouping, autopad,
deterministic prenet) step for step.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from rtts.attention.full import MASK_VALUE, _merge_heads, _split_heads
from rtts.config import ReformerTTSConfig
from rtts.models import reformer_tts as M
from rtts.models.reformer_tts import _autopad, _dtype, _pad_multiple, _posenc
from rtts.models.stack import make_stack_layer_fns
from rtts.nn.layers import dense, layer_norm, prenet_mlp


def _cross_probs(p, x, memory, memory_mask, num_heads, cdt
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cross_attention (rtts/attention/full.py) with the softmax exposed.
    Returns (out (B, T, D), probs (B, H, T, L))."""
    h = layer_norm(p["ln"], x)
    q = _split_heads(dense(p["attn"]["w_q"], h, cdt), num_heads)
    k = _split_heads(dense(p["attn"]["w_k"], memory, cdt), num_heads)
    v = _split_heads(dense(p["attn"]["w_v"], memory, cdt), num_heads)
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits * (d ** -0.5)
    if memory_mask is not None:
        logits = jnp.where(memory_mask[:, None, None, :], logits, MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return dense(p["attn"]["w_o"], _merge_heads(out), cdt), probs


def decoder_cross_attention(
    params, cfg: ReformerTTSConfig,
    tokens: jnp.ndarray, token_mask: jnp.ndarray,
    mel_target: jnp.ndarray, mel_mask: jnp.ndarray,
) -> List[jnp.ndarray]:
    """Teacher-forced replay -> per-cross-layer attention probabilities,
    each (B, H, T_groups, L_tokens) float32.  Deterministic (eval use)."""
    return _replay(params, cfg, tokens, token_mask, mel_target, mel_mask)[0]


def _replay(params, cfg: ReformerTTSConfig, tokens, token_mask,
            mel_target, mel_mask):
    cdt = _dtype(cfg.compute_dtype)
    memory = M.encode(params, cfg, tokens, token_mask, deterministic=True)
    mel_input = M.shift_mel(mel_target, cfg.reduction_factor)

    # input preparation mirrors decode_train (rng defaults included)
    r = cfg.reduction_factor
    if r > 1:
        pad = (-mel_input.shape[1]) % r
        if pad:
            mel_input = jnp.pad(mel_input, ((0, 0), (0, pad), (0, 0)))
            mel_mask = jnp.pad(mel_mask, ((0, 0), (0, pad)))
        b_, tp, n_ = mel_input.shape
        mel_input = mel_input.reshape(b_, tp // r, r * n_)
        mel_mask = mel_mask.reshape(b_, tp // r, r).any(-1)
    mel_input, mel_mask, orig_g = _autopad(
        mel_input, mel_mask, _pad_multiple(cfg.decoder))
    h = prenet_mlp(params["dec_prenet"], mel_input.astype(cdt),
                   jax.random.PRNGKey(1), cfg.dec_prenet_dropout,
                   always_dropout=True, deterministic=True,
                   compute_dtype=cdt)
    h = _posenc(cfg, params["dec_pos"], h)
    h = h * mel_mask[..., None].astype(h.dtype)

    # two-stream replay of the decoder stack, cross probs captured
    dcfg = cfg.decoder
    layer_fns = make_stack_layer_fns(dcfg, cross_attend=True,
                                     deterministic=True, compute_dtype=cdt)
    n = len(layer_fns)
    layer_keys = jax.random.split(jax.random.PRNGKey(2), n * 2)
    h1 = h2 = h.astype(jnp.float32)
    probs_out: List[jnp.ndarray] = []
    for i, ((f, g), p) in enumerate(zip(layer_fns, params["decoder"]["layers"])):
        aux = {"mask": mel_mask, "memory_mask": token_mask,
               "rng_f": layer_keys[2 * i], "rng_g": layer_keys[2 * i + 1]}
        if i % 2 == 1:  # cross pair: capture probabilities
            out, probs = _cross_probs(p["f"], h2, memory, token_mask,
                                      dcfg.attention.num_heads, cdt)
            probs_out.append(probs[:, :, :orig_g])
            h1 = h1 + out.astype(jnp.float32)
        else:
            h1 = h1 + f(p["f"], h2, memory, aux, None)[0].astype(jnp.float32)
        h2 = h2 + g(p["g"], h1, memory, aux).astype(jnp.float32)
    y = layer_norm(params["decoder"]["final_ln"], (h1 + h2) * 0.5)
    return probs_out, y[:, :orig_g]


def alignment_map(params, cfg: ReformerTTSConfig,
                  tokens, token_mask, mel_target, mel_mask,
                  layer: int = -1) -> jnp.ndarray:
    """Head-averaged cross-attention of one layer -> (B, T_groups, L)."""
    probs = decoder_cross_attention(params, cfg, tokens, token_mask,
                                    mel_target, mel_mask)
    return probs[layer].mean(axis=1)
