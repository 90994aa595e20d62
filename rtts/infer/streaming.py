"""Streaming text->wav synthesis: the vocoder runs fused behind the AR
decoder in chunks (BASELINE config 3), yielding audio with bounded latency.

Pipeline per chunk of K mel frames:
  1. ``decode_segment`` (jitted): advance the KV-cached decoder state by
     K/r groups (stops early when every utterance fires its stop token);
  2. postnet applied to the new frames WITH left/right context so interior
     outputs equal the full-utterance postnet (conv receptive field);
  3. SqueezeWave inverse flows on the chunk's mel window with
     receptive-field context and a globally-drawn noise tensor — kept
     samples are exactly the full-pass output (see
     squeezewave.infer_streaming);
  4. yield the finished audio samples.

The decode state machine is identical to ``decode_greedy`` with
fixed-size buffers (same step function, state carried across jit
boundaries), so streamed mel equals the ``staged=False`` non-streaming
decode bit-for-bit at float32; postnet/vocoder context windows make the
audio equal in the interior and differ only by edge effects at the final
utterance boundary (tested).  NOTE: ``decode_greedy``'s default
``staged="auto"`` grows its buffers from 256 groups, which changes f32
softmax reduction sizes (refusion-class numerics) — at >=256 decoded
groups the batch Synthesizer's default output therefore differs from the
streamed (fixed-buffer) mel by that same class; compare against
``staged=False`` for the bit-exact invariant.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config, ReformerTTSConfig
from rtts.infer.decode import (
    _ROT_KEY,
    DecodeState,
    _decode_rotations,
    _dtype,
    _init_mem_kv,
    _init_state,
    _make_step_fn,
    _precast_weights,
)
from rtts.models.reformer_tts import postnet_apply


def _postnet_context(cfg: ReformerTTSConfig) -> int:
    """One-sided postnet receptive field in mel frames."""
    return cfg.postnet_layers * (cfg.postnet_kernel - 1) // 2


class StreamingSynthesizer:
    """Incremental text->wav: iterate over audio chunks as they decode.

    Usage:
        ss = StreamingSynthesizer(cfg, tts_params, voc_params)
        for audio_chunk in ss.stream(["hello world"], chunk_frames=64):
            play(audio_chunk)  # (B, chunk_frames * hop) per iteration
    """

    def __init__(self, cfg: Config, tts_params, vocoder_params=None,
                 max_frames: int = 1024, mode: str = "kv_full",
                 attn_window=None):
        """``mode``: AR decode cache — kv_full (default; the streaming
        exactness tests pin this path), kv_lsh, kv_lsh_chunk, or auto
        (kv_lsh_chunk when the decoder self-attention kind is lsh).

        ``attn_window=(w_back, w_fwd)``: monotonic cross-attention
        windowing, same semantics as decode_greedy/Synthesizer (opt-in);
        the tracker rides the decode state across segments."""
        self.cfg = cfg
        # one-time bf16 weight cast, OUTSIDE the jit, shared by every
        # stream() call and segment (see decode._precast_weights)
        self.tts_params = _precast_weights(
            tts_params, _dtype(cfg.model.compute_dtype))
        # fold at load (see Synthesizer): _infer_chunk duck-types on the
        # param structure, so unfolded params would invert 1x1s on-device
        # per chunk
        if vocoder_params is not None:
            from rtts.models.squeezewave import ensure_folded

            vocoder_params = ensure_folded(vocoder_params)
        self.vocoder_params = vocoder_params
        self.max_frames = max_frames
        mcfg = cfg.model
        if mode == "auto":
            from rtts.infer.decode import _auto_mode

            mode = _auto_mode(mcfg, max_frames)
        self.mode = mode
        self.attn_window = (tuple(attn_window) if attn_window is not None
                            else None)
        if self.attn_window is not None:
            wb, wf = self.attn_window
            if wb < 0 or wf < 1:
                raise ValueError(
                    f"attn_window must satisfy w_back >= 0 and w_fwd >= 1 "
                    f"(the tracker must be able to advance), "
                    f"got {attn_window}")
        if max_frames % mcfg.reduction_factor != 0:
            raise ValueError("max_frames must be a multiple of reduction_factor")

        self._encode = jax.jit(self._encode_impl)
        self._segment = jax.jit(self._segment_impl,
                                static_argnames=("n_groups",))
        self._postnet = jax.jit(self._postnet_impl)
        if vocoder_params is not None:
            from rtts.models.squeezewave import _infer_chunk

            # instance-lifetime jit: a per-stream() jit instance would
            # retrace/recompile the vocoder chunk EVERY call — measured
            # seconds of time-to-first-audio on the tunneled backend
            # (BENCH.md r4 "latency")
            self._voc_fn = jax.jit(
                functools.partial(_infer_chunk, cfg=cfg.vocoder))

    # -- jitted pieces ------------------------------------------------------

    def _encode_impl(self, params, tokens, token_mask):
        from rtts.models import reformer_tts as M

        return M.encode(params, self.cfg.model, tokens, token_mask,
                        deterministic=True)

    def _segment_impl(self, params, state, mem_k, mem_v, memory_mask, rng,
                      n_groups):
        cfg = self.cfg.model
        rotations, nb = (None, 0)
        if self.mode in ("kv_lsh", "kv_lsh_chunk"):
            rotations, nb = _decode_rotations(
                cfg, jax.random.fold_in(rng, _ROT_KEY), self.max_frames)
        step = _make_step_fn(params, cfg, mem_k, mem_v, memory_mask, rng,
                             cfg.stop_threshold, rotations=rotations,
                             attn_window=self.attn_window,
                             local_spec=self._local_spec())
        target = state.t + n_groups
        total = self.max_frames // cfg.reduction_factor

        def cond(s: DecodeState):
            return (s.t < jnp.minimum(target, total)) & ~jnp.all(s.done)

        return jax.lax.while_loop(cond, step, state)

    def _local_spec(self):
        """kv_local's per-layer ring specs (None for the other modes)."""
        if self.mode != "kv_local":
            return None
        from rtts.infer.decode import _local_spec

        return _local_spec(self.cfg.model,
                           self.max_frames // self.cfg.model.reduction_factor)

    def _postnet_impl(self, params, mel_window):
        cdt = _dtype(self.cfg.model.compute_dtype)
        residual = postnet_apply(params["postnet"], self.cfg.model,
                                 mel_window.astype(cdt), None, True, cdt)
        return mel_window + residual.astype(jnp.float32)

    # -- the stream ---------------------------------------------------------

    def stream(self, texts, chunk_frames: int = 64, seed: int = 0
               ) -> Iterator[np.ndarray]:
        """Yield (B, chunk_samples) audio arrays until all utterances stop.

        The final chunk may be shorter.  Total audio length per utterance is
        available as ``self.last_lengths`` (frames) after exhaustion."""
        cfg = self.cfg.model
        vcfg = self.cfg.vocoder
        r = cfg.reduction_factor
        if chunk_frames % r != 0:
            raise ValueError("chunk_frames must be a multiple of reduction_factor")
        tcfg = self.cfg.dataset.text
        from rtts.text import encode_batch

        tokens, tmask = encode_batch(list(texts), cleaner=tcfg.cleaner,
                                     pad_to_multiple=tcfg.pad_to_multiple,
                                     max_len=tcfg.max_len, level=tcfg.level)
        tokens, tmask = jnp.asarray(tokens), jnp.asarray(tmask)
        cdt = _dtype(cfg.compute_dtype)
        params = self.tts_params   # pre-cast once in __init__
        memory = self._encode(params, tokens, tmask)
        mem_k, mem_v = _init_mem_kv(params, cfg, memory.astype(cdt), cdt)
        rng = jax.random.PRNGKey(seed)
        a = cfg.decoder.attention
        ring_cap = a.chunk_length * (1 + a.num_chunks_before
                                     + a.num_chunks_after)
        nb = 0
        if self.mode == "kv_lsh_chunk":
            nb = _decode_rotations(cfg, jax.random.fold_in(rng, _ROT_KEY),
                                   self.max_frames)[1]
        state = _init_state(
            params, cfg, memory.shape[0], self.max_frames,
            lsh_cache=(self.mode == "kv_lsh"),
            ring_buckets=(nb if self.mode == "kv_lsh_chunk" else 0),
            ring_capacity=min(ring_cap,
                              self.max_frames // cfg.reduction_factor),
            track_align=self.attn_window is not None,
            local_spec=self._local_spec())

        # vocoder context bookkeeping
        pn_ctx = _postnet_context(cfg)
        if self.vocoder_params is not None:
            from rtts.models.squeezewave import receptive_field_squeezed

            sq_per_frame = vcfg.hop_length // vcfg.n_group
            voc_ctx = -(-receptive_field_squeezed(vcfg) // sq_per_frame)
            l_total = self.max_frames * sq_per_frame
            z_full = jax.random.normal(jax.random.fold_in(rng, 77),
                                       (memory.shape[0], l_total,
                                        vcfg.n_group)) * vcfg.sigma
            voc_fn = self._voc_fn   # instance jit (see __init__)

        # host-side buffer of FINAL post-netted mel frames.  Windows are
        # always sliced from state.mel (which holds zeros past the decoded
        # region, exactly like the full-pipeline buffer), so every finalized
        # value is bit-equal to the non-streaming path.
        batch = memory.shape[0]
        mel_post_buf = np.zeros((batch, self.max_frames, cfg.n_mels),
                                np.float32)
        pn_done = 0        # frames of mel_post_buf finalized
        emitted = 0        # frames already yielded as audio/mel
        T = self.max_frames
        while True:
            remaining = min(chunk_frames, T - int(np.asarray(state.t)) * r)
            if remaining > 0:
                state = self._segment(params, state, mem_k, mem_v, tmask,
                                      rng, n_groups=max(1, remaining // r))
            t_frames = int(np.asarray(state.t)) * r
            finished = bool(np.asarray(jnp.all(state.done))) or t_frames >= T

            # 1) extend the finalized post-netted region.  The postnet is
            # non-causal (pn_ctx frames each side): a frame is final once
            # decode has moved pn_ctx past it — or immediately when done
            # (the buffer past t is zeros in both pipelines).
            pn_target = min(T, t_frames + pn_ctx) if finished \
                else max(pn_done, t_frames - pn_ctx)
            if pn_target > pn_done:
                lo = max(0, pn_done - pn_ctx)
                hi = min(T, pn_target + pn_ctx)
                win = jax.lax.dynamic_slice_in_dim(state.mel, lo, hi - lo,
                                                   axis=1)
                post = np.asarray(self._postnet(params, win))
                mel_post_buf[:, pn_done:pn_target] = \
                    post[:, pn_done - lo:pn_target - lo]
                pn_done = pn_target

            # 2) emit: vocode (or yield mel) everything whose vocoder
            # context is finalized
            ready = pn_done if finished else max(emitted, pn_done - (
                voc_ctx if self.vocoder_params is not None else 0))
            ready = min(ready, T)
            if ready > emitted:
                if self.vocoder_params is not None:
                    vlo = max(0, emitted - voc_ctx)
                    vhi = min(pn_done, ready + voc_ctx)
                    win = jnp.asarray(mel_post_buf[:, vlo:vhi])
                    z_c = z_full[:, vlo * sq_per_frame:vhi * sq_per_frame]
                    audio = voc_fn(self.vocoder_params, win, z_c)
                    keep_lo = (emitted - vlo) * vcfg.hop_length
                    keep_hi = keep_lo + (ready - emitted) * vcfg.hop_length
                    yield np.asarray(audio[:, keep_lo:keep_hi])
                else:
                    yield mel_post_buf[:, emitted:ready].copy()
                emitted = ready
            # termination: once finished, pn_target (and hence `ready`)
            # saturates at min(T, t_frames + pn_ctx) for both the mel-only
            # and the vocoded path — everything final has been emitted.
            if finished and emitted >= min(T, t_frames + pn_ctx):
                break
        self.last_lengths = np.asarray(state.lengths)
