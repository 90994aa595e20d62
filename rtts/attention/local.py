"""Local (sliding-chunk) self-attention (SURVEY.md §3.2 "Local attention").

Chunked attention over the natural sequence order — no hashing, no sort:
chunk i attends chunks [i - num_chunks_before, ..., i, ..., i + num_chunks_after].
Shares the chunk-attend core (and therefore the exact masking semantics and
the Pallas kernel) with the LSH path; it is the LSH pipeline with the
identity permutation and a single round.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rtts.attention.full import (
    _len_norm,
    _merge_heads,
    _split_heads,
    shared_qk_self_attention,
)
from rtts.attention.lsh import lsh_attend_chunks
from rtts.config import AttentionConfig
from rtts.nn.layers import dense


def local_attention_core(qk, v, cfg: AttentionConfig, mask, causal,
                         attend_fn=lsh_attend_chunks,
                         dropout_rng=None):
    b, h, l, d = qk.shape
    c = cfg.chunk_length
    if l % c != 0:
        raise ValueError(f"seq len {l} not a multiple of chunk {c}")
    nc = l // c
    pos = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None, None],
                           (b, h, l))
    valid = (jnp.broadcast_to(mask[:, None, :], (b, h, l))
             if mask is not None else jnp.ones((b, h, l), bool))
    q_c = qk.reshape(b, h, nc, c, d)
    k_c = (_len_norm(qk) * (d ** -0.5)).reshape(b, h, nc, c, d)
    v_c = v.reshape(b, h, nc, c, d)
    # dropout kwargs only when active: keeps alternate attend_fns (the
    # Pallas kernel has no dropout support) signature-compatible
    drop_kwargs = ({"dropout_rate": cfg.attention_dropout,
                    "dropout_rng": dropout_rng}
                   if dropout_rng is not None else {})
    out, _ = attend_fn(q_c, k_c, v_c, pos.reshape(b, h, nc, c),
                       valid.reshape(b, h, nc, c), causal,
                       cfg.num_chunks_before, cfg.num_chunks_after,
                       cfg.mask_value, cfg.self_mask_value,
                       **drop_kwargs)
    return out.reshape(b, h, l, d)


def local_self_attention(
    params,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    causal: bool,
    cfg: AttentionConfig,
    compute_dtype=None,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Shared-QK sliding-chunk self-attention sublayer. (B,L,D) -> (B,L,D)."""
    l = x.shape[1]
    drop_rng = (jax.random.fold_in(rng, 7)
                if (rng is not None and not deterministic
                    and cfg.attention_dropout > 0.0)
                else None)
    if l <= cfg.chunk_length:
        return shared_qk_self_attention(params, x, mask=mask, causal=causal,
                                        num_heads=cfg.num_heads,
                                        compute_dtype=compute_dtype,
                                        dropout_rate=cfg.attention_dropout,
                                        dropout_rng=drop_rng)
    qk = _split_heads(dense(params["w_qk"], x, compute_dtype), cfg.num_heads)
    v = _split_heads(dense(params["w_v"], x, compute_dtype), cfg.num_heads)
    out = local_attention_core(qk, v, cfg, mask, causal, dropout_rng=drop_rng)
    return dense(params["w_o"], _merge_heads(out), compute_dtype)
