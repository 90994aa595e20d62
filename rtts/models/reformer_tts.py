"""ReformerTTS acoustic model: text -> mel seq2seq (SURVEY.md §3.1 #8).

Topology (Transformer-TTS lineage with Reformer stacks):

  tokens --embed--> EncoderPreNet(conv x N) --+alpha*posenc--> encoder stack
  mel[t-1] --DecoderPreNet(MLP)--> +alpha*posenc --> causal decoder stack
      (self-attention + cross-attention over encoder memory)
  decoder out --> mel head (B,T,n_mels) + stop head (B,T)
  mel_post = mel_pre + PostConvNet(mel_pre)

Everything is a pure function over a params pytree; the AR inference loop
lives in rtts/infer as a jit-compiled scan (SURVEY.md §4.3).

TPU-first notes: encoder prenet uses LayerNorm (not BatchNorm) — batch
statistics would force cross-device syncs under data parallelism for no
fidelity gain at these scales; all convs run in NTC layout on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rtts.config import ReformerTTSConfig
from rtts.models.stack import stack_apply, stack_init
from rtts.nn.conv import conv1d, conv1d_init
from rtts.nn.layers import (
    dense,
    dense_init,
    dropout,
    embedding,
    embedding_init,
    layer_norm,
    layer_norm_init,
    prenet_mlp,
    prenet_mlp_init,
)
from rtts.nn.posenc import axial_posenc, axial_posenc_init, scaled_posenc, scaled_posenc_init


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init(key: jax.Array, cfg: ReformerTTSConfig) -> Dict[str, Any]:
    if cfg.vocab_size <= 0:
        raise ValueError("cfg.vocab_size must be set (use rtts.text.vocab_size())")
    pdtype = _dtype(cfg.param_dtype)
    ks = jax.random.split(key, 12)

    enc_prenet = []
    for i in range(cfg.enc_prenet_layers):
        enc_prenet.append({
            "conv": conv1d_init(jax.random.fold_in(ks[1], i), cfg.d_model,
                                cfg.d_model, cfg.enc_prenet_kernel, dtype=pdtype),
            "ln": layer_norm_init(cfg.d_model, pdtype),
        })

    postnet = []
    for i in range(cfg.postnet_layers):
        d_in = cfg.n_mels if i == 0 else cfg.postnet_channels
        d_out = cfg.n_mels if i == cfg.postnet_layers - 1 else cfg.postnet_channels
        postnet.append({
            "conv": conv1d_init(jax.random.fold_in(ks[2], i), d_in, d_out,
                                cfg.postnet_kernel, dtype=pdtype),
            "ln": layer_norm_init(d_out, pdtype),
        })

    if cfg.pos_encoding == "axial":
        enc_pos = axial_posenc_init(ks[3], cfg.axial_pos_shape, cfg.axial_pos_dims, pdtype)
        dec_pos = axial_posenc_init(ks[4], cfg.axial_pos_shape, cfg.axial_pos_dims, pdtype)
    else:
        enc_pos = scaled_posenc_init(cfg.max_pos, cfg.d_model, pdtype)
        dec_pos = scaled_posenc_init(cfg.max_pos, cfg.d_model, pdtype)

    return {
        "embed": embedding_init(ks[0], cfg.vocab_size, cfg.d_model, pdtype),
        "enc_prenet": enc_prenet,
        "enc_pos": enc_pos,
        "encoder": stack_init(ks[5], cfg.encoder, cross_attend=False, dtype=pdtype),
        "dec_prenet": prenet_mlp_init(ks[6], cfg.n_mels * cfg.reduction_factor,
                                      cfg.dec_prenet_hidden,
                                      cfg.d_model, pdtype),
        "dec_pos": dec_pos,
        "decoder": stack_init(ks[7], cfg.decoder, cross_attend=True, dtype=pdtype),
        "mel_head": dense_init(ks[8], cfg.d_model,
                               cfg.n_mels * cfg.reduction_factor, dtype=pdtype),
        "stop_head": dense_init(ks[9], cfg.d_model, 1, dtype=pdtype),
        "postnet": postnet,
    }


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def _pad_multiple(cfg_stack) -> int:
    """Sequence-length divisor the stack requires (Autopadder semantics —
    SURVEY.md §3.2 'Input autopadding': chunked attention and chunked FFN
    need multiple-of-chunk lengths; inputs are padded here at call time and
    outputs truncated back)."""
    import math

    a = cfg_stack.attention
    # "auto" pads to the chunk multiple regardless of how it resolves:
    # alignment is harmless for full attention and required if the length
    # lands on the LSH side of the crossover
    m = a.chunk_length if a.kind in ("lsh", "local", "auto") else 1
    c = cfg_stack.ffn_chunk_size
    if c == "auto":
        # chunking MAY engage (shape-dependent): pad to the auto chunk so
        # either resolution divides the padded length
        from rtts.config import AUTO_FFN_CHUNK

        m = math.lcm(m, AUTO_FFN_CHUNK)
    elif c > 0:
        m = math.lcm(m, c)
    return m


def _autopad(x: jnp.ndarray, mask: jnp.ndarray, multiple: int):
    """Pad (B, L, ...) x and (B, L) mask to a multiple. Returns
    (x_pad, mask_pad, orig_len)."""
    l = x.shape[1]
    if multiple <= 1 or l % multiple == 0:
        return x, mask, l
    pad = multiple - l % multiple
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    x = jnp.pad(x, widths)
    mask = jnp.pad(mask, [(0, 0), (0, pad)])
    return x, mask, l


def _posenc(cfg: ReformerTTSConfig, params, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.pos_encoding == "axial":
        return axial_posenc(params, x)
    return scaled_posenc(params, x)


def encoder_prenet(params, cfg: ReformerTTSConfig, h: jnp.ndarray,
                   rng: Optional[jax.Array], deterministic: bool,
                   compute_dtype,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``mask`` (B, L) bool re-zeroes pad positions before and after every
    conv (same contract as postnet_apply's frame_mask): PAD_ID has a
    learned nonzero embedding and the SAME convs reach ~6 positions, so
    without it the last valid memory positions depend on HOW MUCH padding
    the batch happened to append — the same text would encode differently
    across batch shapes."""
    m = None if mask is None else mask[..., None].astype(h.dtype)
    if m is not None:
        h = h * m
    for i, layer in enumerate(params):
        h = conv1d(layer["conv"], h, compute_dtype=compute_dtype)
        h = layer_norm(layer["ln"], h)
        h = jax.nn.relu(h)
        if rng is not None:
            h = dropout(jax.random.fold_in(rng, i), h, cfg.enc_prenet_dropout,
                        deterministic)
        if m is not None:
            # at the END of the layer (LN bias + relu make zeroed rows
            # nonzero again): every conv then sees exactly-zero pads
            h = h * m.astype(h.dtype)
    return h


def postnet_apply(params, cfg: ReformerTTSConfig, mel: jnp.ndarray,
                  rng: Optional[jax.Array], deterministic: bool,
                  compute_dtype, frame_mask: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
    """Conv residual refiner: returns the residual to add to mel.

    ``frame_mask`` (B, T) bool, when given, re-zeroes every layer's
    activations beyond the mask: the convs have biases, so without it a
    zero-PADDED input grows nonzero pad-region activations after layer 1
    that bleed back into the last valid frames — with it, a run padded to
    any length is mathematically identical to running at the exact masked
    length (the serving engine's per-utterance postnet relies on this).
    """
    h = mel
    n = len(params)
    fm = None if frame_mask is None else frame_mask[..., None].astype(mel.dtype)
    if fm is not None:
        h = h * fm
    for i, layer in enumerate(params):
        h = conv1d(layer["conv"], h, compute_dtype=compute_dtype)
        if i < n - 1:
            h = layer_norm(layer["ln"], h)
            h = jnp.tanh(h)
            if rng is not None:
                h = dropout(jax.random.fold_in(rng, i), h, cfg.postnet_dropout,
                            deterministic)
        if fm is not None:
            h = h * fm.astype(h.dtype)
    return h


def encode(params, cfg: ReformerTTSConfig, tokens: jnp.ndarray,
           token_mask: jnp.ndarray, rng: Optional[jax.Array] = None,
           deterministic: bool = True) -> jnp.ndarray:
    """tokens (B, L) int32 -> encoder memory (B, L, D)."""
    cdt = _dtype(cfg.compute_dtype)
    r0, r1, r2 = (jax.random.split(rng, 3) if rng is not None
                  else (None, None, jax.random.PRNGKey(0)))
    tokens, token_mask, orig_len = _autopad(
        tokens[..., None], token_mask, _pad_multiple(cfg.encoder))
    tokens = tokens[..., 0]
    h = embedding(params["embed"], tokens, compute_dtype=cdt)
    h = encoder_prenet(params["enc_prenet"], cfg, h, r0, deterministic, cdt,
                       mask=token_mask)
    h = _posenc(cfg, params["enc_pos"], h)
    h = h * token_mask[..., None].astype(h.dtype)
    out = stack_apply(params["encoder"], cfg.encoder, h, token_mask,
                      rng=r2, deterministic=deterministic, compute_dtype=cdt)
    return out[:, :orig_len]


def decode_train(
    params, cfg: ReformerTTSConfig,
    mel_input: jnp.ndarray,        # (B, T, n_mels) teacher-forced (shifted)
    mel_mask: jnp.ndarray,         # (B, T) bool
    memory: jnp.ndarray,
    memory_mask: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    attn_sink: Optional[list] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Teacher-forced decoder pass -> (mel_pre, mel_post, stop_logits).

    ``attn_sink``: optional list capturing each decoder cross-attention
    layer's probabilities (B, H, T_groups_padded, L_tokens) float32 —
    consumed by the guided-attention loss (rtts/train/losses.py).  The
    query axis is the PADDED group axis; the loss masks by true lengths.
    """
    cdt = _dtype(cfg.compute_dtype)
    r = cfg.reduction_factor
    r0, r1, r2 = (jax.random.split(rng, 3) if rng is not None
                  else (jax.random.PRNGKey(1), None, jax.random.PRNGKey(2)))
    orig_t = mel_input.shape[1]
    frame_mask0 = mel_mask          # frame-rate mask, pre-grouping/pad
    if r > 1:
        # group r frames per decoder step (Tacotron-lineage reduction):
        # the decoder runs at the group rate T/r
        pad = (-orig_t) % r
        if pad:
            mel_input = jnp.pad(mel_input, ((0, 0), (0, pad), (0, 0)))
            mel_mask = jnp.pad(mel_mask, ((0, 0), (0, pad)))
        b_, tp, n_ = mel_input.shape
        mel_input = mel_input.reshape(b_, tp // r, r * n_)
        mel_mask = mel_mask.reshape(b_, tp // r, r).any(-1)
    mel_input, mel_mask, orig_g = _autopad(
        mel_input, mel_mask, _pad_multiple(cfg.decoder))
    h = prenet_mlp(params["dec_prenet"], mel_input.astype(cdt), r0,
                   cfg.dec_prenet_dropout, always_dropout=True,
                   deterministic=deterministic, compute_dtype=cdt)
    h = _posenc(cfg, params["dec_pos"], h)
    h = h * mel_mask[..., None].astype(h.dtype)
    h = stack_apply(params["decoder"], cfg.decoder, h, mel_mask,
                    memory=memory, memory_mask=memory_mask, rng=r2,
                    deterministic=deterministic, compute_dtype=cdt,
                    attn_sink=attn_sink)
    h = h[:, :orig_g]
    mel_pre = dense(params["mel_head"], h, cdt).astype(jnp.float32)
    stop_logits = dense(params["stop_head"], h, cdt)[..., 0].astype(jnp.float32)
    if r > 1:
        b_, g_, _ = mel_pre.shape
        mel_pre = mel_pre.reshape(b_, g_ * r, cfg.n_mels)[:, :orig_t]
        stop_logits = jnp.repeat(stop_logits, r, axis=1)[:, :orig_t]
    # frame_mask keeps pad-region decoder garbage out of the postnet convs:
    # without it the last ~postnet-receptive-field valid frames (exactly
    # where stop behavior is learned) depend on batch padding, a
    # train/serve mismatch — serving's postnet always masks
    residual = postnet_apply(params["postnet"], cfg, mel_pre.astype(cdt), r1,
                             deterministic, cdt,
                             frame_mask=frame_mask0).astype(jnp.float32)
    mel_post = mel_pre + residual
    return mel_pre, mel_post, stop_logits


def shift_mel(mel: jnp.ndarray, reduction_factor: int = 1) -> jnp.ndarray:
    """Teacher forcing input: prepend zero 'go' frame(s), drop the last.
    With reduction r>1 the decoder consumes groups of r frames, so the
    input shifts by a whole group."""
    r = reduction_factor
    go = jnp.zeros_like(mel[:, :r])
    return jnp.concatenate([go, mel[:, :-r]], axis=1)


def forward(
    params, cfg: ReformerTTSConfig,
    tokens: jnp.ndarray, token_mask: jnp.ndarray,
    mel_target: jnp.ndarray, mel_mask: jnp.ndarray,
    rng: Optional[jax.Array] = None, deterministic: bool = True,
    attn_sink: Optional[list] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full teacher-forced forward -> (mel_pre, mel_post, stop_logits)."""
    r_enc, r_dec = (jax.random.split(rng) if rng is not None else (None, None))
    memory = encode(params, cfg, tokens, token_mask, r_enc, deterministic)
    return decode_train(params, cfg,
                        shift_mel(mel_target, cfg.reduction_factor), mel_mask,
                        memory, token_mask, r_dec, deterministic,
                        attn_sink=attn_sink)
