"""Reformer stacks: wire attention + chunked-FFN sublayers into reversible
(f, g) residual pairs (SURVEY.md §2 L2/L3).

Encoder layer  = one pair:  (f = self-attention, g = chunked FFN).
Decoder layer  = two pairs: (f = self-attention, g = chunked FFN) then
                            (f = cross-attention, g = chunked FFN) —
the reversible enc-dec arrangement of the reformer lineage: every sublayer
sits in a residual slot, so the whole decoder is reversible too.

All sublayers are pre-LN.  Attention kind per config: "full" (shared-QK
softmax fallback), "lsh" (bucketed kernel), "local" (sliding chunks).
Sublayer f returns (out, cache); for LSH the cache is the forward hash
buckets, re-used in the reversible backward (SURVEY.md §4.5).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from rtts.attention.full import (
    attention_init,
    cross_attention,
    shared_qk_self_attention,
)
from rtts.config import ReformerStackConfig
from rtts.nn.layers import dropout, layer_norm, layer_norm_init
from rtts.reversible.ffn import chunked_ffn, ffn_init
from rtts.reversible.rev import reversible_sequence


def _self_attention(kind: str, params, x, mask, causal, cfg: ReformerStackConfig,
                    rng, deterministic, compute_dtype, cache):
    a = cfg.attention
    if kind == "auto":
        from rtts.config import resolve_attention_kind

        kind = resolve_attention_kind(a, x.shape[1])
    drop_rng = (jax.random.fold_in(rng, 7)
                if (rng is not None and not deterministic
                    and a.attention_dropout > 0.0)
                else None)
    if kind == "full":
        from rtts.ops.flash_attention import resolve_flash_impl

        if cfg.seq_parallel_axis and x.shape[1] > a.chunk_length:
            from rtts.parallel.seq_parallel import (
                full_self_attention_seq_parallel,
            )

            out = full_self_attention_seq_parallel(
                params, x, mask=mask, causal=causal, cfg=a,
                compute_dtype=compute_dtype, axis=cfg.seq_parallel_axis,
                dropout_rate=a.attention_dropout, dropout_rng=drop_rng,
            )
            return out, None
        out = shared_qk_self_attention(
            params, x, mask=mask, causal=causal,
            num_heads=a.num_heads, compute_dtype=compute_dtype,
            dropout_rate=a.attention_dropout, dropout_rng=drop_rng,
            impl=resolve_flash_impl(a.flash, x.shape[1], x.shape[1]),
        )
        return out, None
    if kind == "lsh":
        if cfg.seq_parallel_axis and x.shape[1] > a.chunk_length:
            # distributed sequence axis: same hash draw AND same
            # position-keyed dropout mask as the single-device path =>
            # identical output (tested); hash + mask recompute in the
            # reversible backward is deterministic, so no bucket cache
            from rtts.parallel.seq_parallel import (
                lsh_self_attention_seq_parallel,
            )

            out = lsh_self_attention_seq_parallel(
                params, x, mask=mask, causal=causal, cfg=a, rng=rng,
                compute_dtype=compute_dtype, axis=cfg.seq_parallel_axis,
                exchange=cfg.seq_parallel_exchange,
                deterministic=deterministic,
            )
            return out, None
        from rtts.attention.lsh import lsh_self_attention

        return lsh_self_attention(
            params, x, mask=mask, causal=causal, cfg=a,
            rng=rng, compute_dtype=compute_dtype, cache=cache,
            deterministic=deterministic,
        )
    if kind == "local":
        from rtts.attention.local import local_self_attention

        out = local_self_attention(
            params, x, mask=mask, causal=causal, cfg=a,
            compute_dtype=compute_dtype, rng=rng,
            deterministic=deterministic,
        )
        return out, None
    raise ValueError(f"unknown attention kind {kind!r}")


def make_stack_layer_fns(
    cfg: ReformerStackConfig,
    cross_attend: bool,
    deterministic: bool,
    compute_dtype,
) -> List[Tuple[Any, Any]]:
    """Build the static (f, g) callables for one stack.

    aux per pair: dict(mask, memory_mask, rng_f, rng_g) — non-differentiable
    context threaded through the reversible custom_vjp.
    """
    a = cfg.attention
    kinds = _layer_kinds(cfg)

    def make_f_self(kind):
        def f_self(params, x, memory, aux, cache):
            h = layer_norm(params["ln"], x)
            out, new_cache = _self_attention(
                kind, params["attn"], h, aux["mask"], cfg.causal, cfg,
                aux["rng_f"], deterministic, compute_dtype, cache,
            )
            out = dropout(jax.random.fold_in(aux["rng_f"], 1), out,
                          cfg.dropout, deterministic)
            return out, new_cache

        return f_self

    def f_cross(params, x, memory, aux, cache):
        from rtts.ops.flash_attention import resolve_flash_impl

        h = layer_norm(params["ln"], x)
        drop_rng = (jax.random.fold_in(aux["rng_f"], 7)
                    if (not deterministic and a.attention_dropout > 0.0)
                    else None)
        out = cross_attention(
            params["attn"], h, memory, memory_mask=aux["memory_mask"],
            num_heads=a.num_heads, compute_dtype=compute_dtype,
            dropout_rate=a.attention_dropout, dropout_rng=drop_rng,
            impl=resolve_flash_impl(a.flash, h.shape[1], memory.shape[1]),
            probs_sink=aux.get("attn_sink"),
        )
        out = dropout(jax.random.fold_in(aux["rng_f"], 1), out, cfg.dropout,
                      deterministic)
        return out, None

    def g_ffn(params, y, memory, aux):
        from rtts.config import resolve_ffn_chunk

        # "auto" resolves from the SAME static shapes the residual scheme
        # resolves from (stack_apply's resolve_reversible call sees the
        # identical (batch, seq, mem) triple), so chunking engages exactly
        # when the remat is buying reversible-regime memory
        chunk = resolve_ffn_chunk(
            cfg, y.shape[0], y.shape[1],
            memory.shape[1] if memory is not None else None)
        if cfg.use_pallas_ffn and jax.devices()[0].platform == "tpu":
            from rtts.ops.chunked_ffn import chunked_ffn_pallas

            row_block = chunk if chunk > 0 else 256
            mxu = ("bfloat16" if compute_dtype == jnp.bfloat16
                   else "float32")
            out = chunked_ffn_pallas(params, y, cfg.ffn_activation,
                                     row_block=row_block, mxu_dtype=mxu)
        else:
            out = chunked_ffn(params, y, chunk,
                              cfg.ffn_activation, compute_dtype)
        return dropout(aux["rng_g"], out, cfg.dropout, deterministic)

    pairs: List[Tuple[Any, Any]] = []
    for li in range(cfg.num_layers):
        pairs.append((make_f_self(kinds[li]), g_ffn))
        if cross_attend:
            pairs.append((f_cross, g_ffn))
    return pairs


def _layer_kinds(cfg: ReformerStackConfig) -> List[str]:
    """Per-layer self-attention kinds (interleaved attn_layers support)."""
    if cfg.attn_layers is None:
        return [cfg.attention.kind] * cfg.num_layers
    if len(cfg.attn_layers) != cfg.num_layers:
        raise ValueError(
            f"attn_layers has {len(cfg.attn_layers)} entries for "
            f"{cfg.num_layers} layers")
    for k in cfg.attn_layers:
        if k not in ("full", "lsh", "local", "auto"):
            raise ValueError(f"unknown attention kind {k!r} in attn_layers")
    return list(cfg.attn_layers)


def stack_init(key, cfg: ReformerStackConfig, cross_attend: bool,
               dtype=jnp.float32) -> Dict[str, Any]:
    a = cfg.attention
    layers = []
    n_pairs_per_layer = 2 if cross_attend else 1
    keys = jax.random.split(key, cfg.num_layers * n_pairs_per_layer * 2 + 1)
    ki = 0
    for _ in range(cfg.num_layers):
        # self-attention pair
        layers.append({
            "f": {
                "ln": layer_norm_init(cfg.d_model, dtype),
                "attn": attention_init(keys[ki], cfg.d_model, a.num_heads,
                                       a.head_dim, shared_qk=True, dtype=dtype),
            },
            "g": ffn_init(keys[ki + 1], cfg.d_model, cfg.d_ff, dtype),
        })
        ki += 2
        if cross_attend:
            layers.append({
                "f": {
                    "ln": layer_norm_init(cfg.d_model, dtype),
                    "attn": attention_init(keys[ki], cfg.d_model, a.num_heads,
                                           a.head_dim, shared_qk=False, dtype=dtype),
                },
                "g": ffn_init(keys[ki + 1], cfg.d_model, cfg.d_ff, dtype),
            })
            ki += 2
    return {
        "layers": layers,
        "final_ln": layer_norm_init(cfg.d_model, dtype),
    }


def stack_apply(
    params,
    cfg: ReformerStackConfig,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    memory: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    compute_dtype=None,
    attn_sink: Optional[list] = None,
) -> jnp.ndarray:
    """Run the stack on x: (B, L, D) -> (B, L, D).

    ``attn_sink``: optional Python list that collects each cross-attention
    layer's float32 probability tensor (B, H, L, Lm) during tracing
    (guided-attention loss; rtts/train/losses.py).  Requires the plain
    residual path — the captured tracers cannot cross the reversible
    custom_vjp or the pipeline shard_map/scan boundaries.
    """
    cross_attend = memory is not None
    if attn_sink is not None and cfg.pipeline_axis:
        raise ValueError(
            "guided attention (attn_sink) cannot capture cross-attention "
            "probabilities through the pipeline scan; disable "
            "pipeline_axis or guided_attention_weight for this stack")
    if cfg.pipeline_axis:
        from rtts.parallel.pipeline import pipeline_stack_apply

        y = pipeline_stack_apply(
            params, cfg, x, mask, memory, memory_mask, rng,
            deterministic, compute_dtype)
        return layer_norm(params["final_ln"], y)
    layer_fns = make_stack_layer_fns(cfg, cross_attend, deterministic, compute_dtype)
    n = len(layer_fns)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    layer_keys = jax.random.split(rng, n * 2)
    aux_list = [
        {
            "mask": mask,
            "memory_mask": memory_mask,
            "rng_f": layer_keys[2 * i],
            "rng_g": layer_keys[2 * i + 1],
            **({"attn_sink": attn_sink} if attn_sink is not None else {}),
        }
        for i in range(n)
    ]
    # residual streams ride in float32: the reversible backward reconstructs
    # X2 = Y2 - g(Y1) by subtraction, and bf16 streams would accumulate
    # reconstruction error across layers.  Sublayer matmuls still run in the
    # configured compute dtype (casts happen inside f/g); the bf16 sublayer
    # outputs promote back to f32 on the residual add.  (A bf16-stream knob
    # was probed for the plain regime and REJECTED: +9% step time — the
    # casts break fusion; BENCH.md r3 "step parts".)
    from rtts.config import resolve_reversible

    rev = resolve_reversible(
        cfg, x.shape[0], x.shape[1],
        memory.shape[1] if memory is not None else None)
    if attn_sink is not None and rev:
        raise ValueError(
            "guided attention (attn_sink) requires plain residuals — the "
            "captured probabilities cannot cross the reversible custom_vjp "
            "boundary; set reversible: false on this stack (resolved "
            f"reversible=True at shape {tuple(x.shape)})")
    y = reversible_sequence(
        layer_fns, params["layers"], x.astype(jnp.float32), memory, aux_list,
        reversible=rev,
    )
    return layer_norm(params["final_ln"], y)
