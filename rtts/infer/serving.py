"""Continuous-batching serving engine (SURVEY.md §4.3 serving surface).

``Synthesizer.serve`` (bucketed variable-length batching) manages SHAPES,
but its batches are still synchronous: every request in a bucket decodes
until the whole bucket stops, and requests can only be grouped when they
are all known up front.  ``ServingEngine`` removes that coupling — the
missing half of "continuous/variable-length serving batching"
(CLAUDE.md round-2 future work):

- A fixed batch of ``slots`` decodes in lock-step (one global step ``t``,
  so every cache write is a single shared ``dynamic_update_slice`` — the
  layout XLA aliases in place), but each slot carries its OWN request:
  an admission offset ``o_i`` makes slot ``i`` attend only to cache
  entries whose global position lies in ``[o_i, t]``.
- KV caches are RING buffers of ``capacity`` groups.  A shared
  ``pos_buf`` records each ring row's global position; masking against
  ``pos_buf`` (not the raw index) makes wraparound transparent.  A slot
  is force-stopped at its budget (``<= capacity``), so a live slot's
  window can never be overwritten.
- The loop runs in SEGMENTS of ``segment_frames`` steps per jit call
  (amortizing dispatch latency, ~25 ms on the tunneled backend); at
  segment boundaries the host harvests finished slots and admits queued
  requests into them.  Admission = one jitted call that encodes the
  text, projects its cross-attention K/V, and writes slot row ``i``.

Numerics: a slot admitted at ``o_i = 0`` with ``capacity == n_groups``
reproduces ``decode_greedy(mode="kv_full", staged=False)`` BIT-EXACTLY
(same buffer layout, same masks, same key schedule — tested).  A
recycled slot (``o_i > 0``) computes the same masked softmax over the
same values at rotated ring indices; only the f32 reduction order
differs (refusion-class, same class as staged decoding).

Postnet: applied per finished utterance on a zero-padded buffer
(length quantized for compile caching).  This differs from
``decode_greedy`` only inside the postnet's receptive field of the
stop boundary, where decode_greedy convolves over post-stop AR garbage
and the engine convolves over zeros.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config, ReformerTTSConfig
from rtts.infer.decode import (
    DecodeResult,
    _cross_attn_step,
    _dtype,
    _init_mem_kv,
    _kv_dtype,
    _len_norm,
    _pos_table,
    _precast_weights,
    _proj_heads,
    _stack_substep,
    _to_kv,
)
from rtts.attention.full import MASK_VALUE, SELF_MASK_VALUE
from rtts.models import reformer_tts as tts_model
from rtts.models.reformer_tts import postnet_apply
from rtts.nn.layers import dense, prenet_mlp


def _self_attn_step_ring(p, h_t, k_cache, v_cache, pos_buf, offsets, t,
                         num_heads, cdt):
    """One-frame shared-QK self-attention over a RING cache with per-slot
    admission offsets.

    Identical math to ``decode._self_attn_step`` except (a) the write
    position is ``t % capacity`` and (b) validity is decided per slot by
    the entry's recorded global position: ``offsets[i] <= pos_buf < t``
    (strict: the current entry gets the training self-penalty instead).
    When ``t < capacity`` and ``offsets == 0`` this is bit-identical to
    the linear cache step (write index == t, pos_buf == iota where
    written, -1 elsewhere -> same mask)."""
    qk_t = _proj_heads(p["w_qk"], h_t, num_heads, cdt)   # (B, H, d)
    v_t = _proj_heads(p["w_v"], h_t, num_heads, cdt)
    d = qk_t.shape[-1]
    quant = k_cache.dtype != qk_t.dtype
    k_t = _len_norm(qk_t) if quant else _len_norm(qk_t) * (d ** -0.5)
    q_s = qk_t * (d ** -0.5) if quant else qk_t
    cap = k_cache.shape[1]
    w = t % cap
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, _to_kv(k_t[:, None], k_cache.dtype), w, axis=1)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, _to_kv(v_t[:, None], v_cache.dtype), w, axis=1)
    pos_buf = jax.lax.dynamic_update_slice_in_dim(
        pos_buf, t[None].astype(pos_buf.dtype), w, axis=0)
    scores = jnp.einsum("bhd,bthd->bht", q_s,
                        k_cache.astype(cdt)).astype(jnp.float32)
    pos = pos_buf[None, None, :]                          # (1, 1, cap)
    own = (pos >= offsets[:, None, None]) & (pos <= t)    # per-slot window
    scores = jnp.where(own, scores, MASK_VALUE)
    scores = jnp.where(pos == t, SELF_MASK_VALUE, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bthd->bhd", probs.astype(cdt),
                     v_cache.astype(cdt))
    out = out.reshape(out.shape[0], -1)
    return dense(p["w_o"], out, cdt), k_cache, v_cache, pos_buf


class EngineState(NamedTuple):
    """Device-resident engine state carried across segments."""

    t: jnp.ndarray             # scalar int32 — global step
    done: jnp.ndarray          # (B,) bool — finished/empty slots
    offsets: jnp.ndarray       # (B,) int32 — admission step per slot
    budgets: jnp.ndarray       # (B,) int32 — per-slot max groups
    lengths: jnp.ndarray       # (B,) int32 — frames at first stop
    prev_frame: jnp.ndarray    # (B, r*n_mels)
    pos_buf: jnp.ndarray       # (capacity,) int32 — global pos per ring row
    k_caches: Any              # tuple over self layers: (B, cap, H, d)
    v_caches: Any
    mem_k: Any                 # tuple over cross layers: (B, L, H, d)
    mem_v: Any
    memory_mask: jnp.ndarray   # (B, L) bool


def _make_segment_fn(cfg: ReformerTTSConfig, segment: int, stop_threshold):
    """Jitted: advance the engine up to ``segment`` steps (early-exits when
    every slot is done).  Returns (state, frames (B, segment*r, n_mels),
    stops (B, segment), steps_run)."""
    cdt = _dtype(cfg.compute_dtype)
    r = cfg.reduction_factor
    n_mels = cfg.n_mels
    num_heads = cfg.decoder.attention.num_heads

    def run(params, state: EngineState, rng):
        pos_table, pos_alpha = _pos_table(params, cfg)
        max_pos = pos_table.shape[0]

        def step(carry):
            i, state, frames, stops = carry
            t = state.t
            p_rel = t - state.offsets                     # (B,) slot position
            key = jax.random.fold_in(rng, t)
            h = prenet_mlp(params["dec_prenet"],
                           state.prev_frame.astype(cdt), key,
                           cfg.dec_prenet_dropout, always_dropout=True,
                           deterministic=True, compute_dtype=cdt)
            pe = jnp.take(pos_table, jnp.clip(p_rel, 0, max_pos - 1), axis=0)
            h = h + pos_alpha.astype(h.dtype) * pe.astype(h.dtype)

            k_caches = list(state.k_caches)
            v_caches = list(state.v_caches)
            pos_box = [state.pos_buf]

            def self_attn(ci, p, hh):
                # pos_buf is shared by all layers: only the first layer's
                # step writes it (every layer writes the same value)
                out, k_caches[ci], v_caches[ci], pb = _self_attn_step_ring(
                    p, hh, k_caches[ci], v_caches[ci], pos_box[0],
                    state.offsets, t, num_heads, cdt)
                pos_box[0] = pb
                return out

            def cross(xi, p, hh):
                return _cross_attn_step(p, hh, state.mem_k[xi],
                                        state.mem_v[xi], state.memory_mask,
                                        num_heads, cdt)

            y = _stack_substep(params, cfg, h, cdt, self_attn, cross)
            group = dense(params["mel_head"], y, cdt).astype(jnp.float32)
            stop_logit = dense(params["stop_head"], y,
                               cdt)[..., 0].astype(jnp.float32)

            frames = jax.lax.dynamic_update_slice_in_dim(
                frames, group.reshape(-1, r, n_mels), i * r, axis=1)
            stops = jax.lax.dynamic_update_slice_in_dim(
                stops, stop_logit[:, None], i, axis=1)
            newly = jax.nn.sigmoid(stop_logit) > stop_threshold
            newly = newly | (p_rel + 1 >= state.budgets)  # budget force-stop
            lengths = jnp.where(state.done, state.lengths, (p_rel + 1) * r)
            state = state._replace(
                t=t + 1, done=state.done | newly, lengths=lengths,
                prev_frame=group, pos_buf=pos_box[0],
                k_caches=tuple(k_caches), v_caches=tuple(v_caches))
            return i + 1, state, frames, stops

        def cond(carry):
            i, state = carry[0], carry[1]
            return (i < segment) & ~jnp.all(state.done)

        frames0 = jnp.zeros((state.done.shape[0], segment * r, n_mels),
                            jnp.float32)
        stops0 = jnp.zeros((state.done.shape[0], segment), jnp.float32)
        i, state, frames, stops = jax.lax.while_loop(
            cond, step, (jnp.asarray(0, jnp.int32), state, frames0, stops0))
        return state, frames, stops, i

    return run


class _Slot(NamedTuple):
    request_id: int
    frames: List[np.ndarray]   # harvested raw (pre-postnet) frame chunks


class ServingEngine:
    """Slot-recycling continuous-batching text->mel(->wav) server.

    Usage::

        eng = ServingEngine(cfg, params, slots=8, capacity_frames=1024)
        ids = [eng.submit(text) for text in texts]
        results = eng.run_until_drained()   # {id: (mel_post, length)}

    or incrementally: ``submit`` any time, call ``step()`` repeatedly;
    each call advances one segment and returns newly finished requests.

    The decode cache is the full-attention KV cache (the standard serving
    choice — see ``decode_greedy``); LSH-trained checkpoints serve through
    it like they do in ``Synthesizer`` (the causal full pattern is a
    superset of the LSH-restricted one)."""

    def __init__(self, cfg: Config, tts_params, vocoder_params=None,
                 slots: int = 8, capacity_frames: int = 1024,
                 segment_frames: int = 64, token_len: Optional[int] = None,
                 stop_threshold: Optional[float] = None, seed: int = 0):
        mcfg = cfg.model
        r = mcfg.reduction_factor
        if capacity_frames % r:
            raise ValueError(f"capacity_frames {capacity_frames} not a "
                             f"multiple of reduction_factor {r}")
        if segment_frames % r:
            raise ValueError(f"segment_frames {segment_frames} not a "
                             f"multiple of reduction_factor {r}")
        self.cfg = cfg
        self.cdt = _dtype(mcfg.compute_dtype)
        self.params = _precast_weights(tts_params, self.cdt)
        if vocoder_params is not None:
            from rtts.models.squeezewave import ensure_folded

            vocoder_params = ensure_folded(vocoder_params)
        self.vocoder_params = vocoder_params
        self.slots = slots
        self.capacity = capacity_frames // r          # groups
        self.segment = segment_frames // r            # groups per jit call
        tcfg = cfg.dataset.text
        self.token_len = token_len or tcfg.max_len or 128
        self.rng = jax.random.PRNGKey(seed)
        thr = mcfg.stop_threshold if stop_threshold is None else stop_threshold
        self._segment_fn = jax.jit(
            _make_segment_fn(mcfg, self.segment, thr))
        self._admit_fn = jax.jit(self._admit_impl)
        self._postnet_fn = jax.jit(self._postnet_impl)

        self.state = self._init_state()
        self.queue: List[Tuple[int, np.ndarray, np.ndarray, int]] = []
        self.live: Dict[int, _Slot] = {}              # slot index -> meta
        self.results: Dict[int, Tuple[np.ndarray, int]] = {}
        self._next_id = 0

    # ------------------------------------------------------------- state --
    def _init_state(self) -> EngineState:
        mcfg = self.cfg.model
        a = mcfg.decoder.attention
        kdt = _kv_dtype(mcfg, self.cdt)
        B, C, L = self.slots, self.capacity, self.token_len
        cache = (B, C, a.num_heads, a.head_dim)
        n_self = mcfg.decoder.num_layers
        mem_shape = (B, L, a.num_heads, a.head_dim)
        return EngineState(
            t=jnp.asarray(0, jnp.int32),
            done=jnp.ones((B,), bool),                # all slots empty
            offsets=jnp.zeros((B,), jnp.int32),
            budgets=jnp.full((B,), C, jnp.int32),
            lengths=jnp.zeros((B,), jnp.int32),
            prev_frame=jnp.zeros((B, mcfg.n_mels * mcfg.reduction_factor),
                                 jnp.float32),
            pos_buf=jnp.full((C,), -1, jnp.int32),
            k_caches=tuple(jnp.zeros(cache, kdt) for _ in range(n_self)),
            v_caches=tuple(jnp.zeros(cache, kdt) for _ in range(n_self)),
            mem_k=tuple(jnp.zeros(mem_shape, kdt) for _ in range(n_self)),
            mem_v=tuple(jnp.zeros(mem_shape, kdt) for _ in range(n_self)),
            memory_mask=jnp.zeros((B, L), bool),
        )

    def _admit_impl(self, params, state: EngineState, slot, tokens,
                    token_mask, budget):
        """Encode one request and install it in ``slot`` (traced index)."""
        mcfg = self.cfg.model
        memory = tts_model.encode(params, mcfg, tokens, token_mask,
                                  rng=None, deterministic=True)
        mk, mv = _init_mem_kv(params, mcfg, memory.astype(self.cdt), self.cdt)
        return state._replace(
            done=state.done.at[slot].set(False),
            offsets=state.offsets.at[slot].set(state.t),
            budgets=state.budgets.at[slot].set(budget),
            lengths=state.lengths.at[slot].set(0),
            prev_frame=state.prev_frame.at[slot].set(0.0),
            mem_k=tuple(m.at[slot].set(n[0]) for m, n in
                        zip(state.mem_k, mk)),
            mem_v=tuple(m.at[slot].set(n[0]) for m, n in
                        zip(state.mem_v, mv)),
            memory_mask=state.memory_mask.at[slot].set(token_mask[0]),
        )

    def _postnet_impl(self, params, mel, frame_mask):
        mcfg = self.cfg.model
        residual = postnet_apply(params["postnet"], mcfg,
                                 mel.astype(self.cdt), None, True,
                                 self.cdt,
                                 frame_mask=frame_mask).astype(jnp.float32)
        return mel + residual

    # -------------------------------------------------------------- API --
    def submit(self, text: str, budget_frames: Optional[int] = None) -> int:
        """Queue a text request; returns its id.  ``budget_frames`` caps the
        utterance (default: full ring capacity)."""
        from rtts.text import encode_batch

        tcfg = self.cfg.dataset.text
        tokens, mask = encode_batch([text], cleaner=tcfg.cleaner,
                                    pad_to_multiple=1,
                                    max_len=self.token_len, level=tcfg.level)
        tokens = np.asarray(tokens)
        mask = np.asarray(mask)
        pad = self.token_len - tokens.shape[1]
        if pad > 0:
            tokens = np.pad(tokens, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return self.submit_tokens(tokens, mask, budget_frames)

    def submit_tokens(self, tokens: np.ndarray, token_mask: np.ndarray,
                      budget_frames: Optional[int] = None) -> int:
        """Queue a pre-tokenized request ((1, token_len) int32 + mask)."""
        r = self.cfg.model.reduction_factor
        if tokens.shape != (1, self.token_len):
            raise ValueError(f"tokens must be (1, {self.token_len}), "
                             f"got {tokens.shape}")
        budget = self.capacity if budget_frames is None else \
            min(self.capacity, -(-budget_frames // r))
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, tokens, token_mask, budget))
        return rid

    @property
    def idle(self) -> bool:
        return not self.queue and not self.live

    def _fill_slots(self) -> None:
        done = np.asarray(self.state.done)
        for slot in range(self.slots):
            if not self.queue:
                break
            if slot in self.live or not done[slot]:
                continue
            rid, tokens, mask, budget = self.queue.pop(0)
            self.state = self._admit_fn(
                self.params, self.state, jnp.asarray(slot, jnp.int32),
                jnp.asarray(tokens), jnp.asarray(mask),
                jnp.asarray(budget, jnp.int32))
            self.live[slot] = _Slot(rid, [])

    def step(self) -> List[int]:
        """Admit queued requests, run one segment, harvest finishers.
        Returns the request ids completed by this call."""
        self._fill_slots()
        if not self.live:
            return []
        self.state, frames, stops, steps = self._segment_fn(
            self.params, self.state, self.rng)
        n = int(steps) * self.cfg.model.reduction_factor
        frames_np = np.asarray(frames[:, :n])
        done = np.asarray(self.state.done)
        lengths = np.asarray(self.state.lengths)
        finished: List[int] = []
        for slot, meta in list(self.live.items()):
            meta.frames.append(frames_np[slot])
            if done[slot]:
                mel = np.concatenate(meta.frames, axis=0)[: lengths[slot]]
                self.results[meta.request_id] = (
                    self._finish(mel), int(lengths[slot]))
                finished.append(meta.request_id)
                del self.live[slot]
        return finished

    def _finish(self, mel: np.ndarray) -> np.ndarray:
        """Postnet over the trimmed utterance, zero-padded to a quantized
        length so the jit cache stays small.  ``frame_mask`` makes the
        padded run identical to running at the exact length (the convs
        have biases — see postnet_apply), so every request's postnet sees
        exactly its own frames and zeros: no post-stop AR garbage in the
        receptive field (unlike decode_greedy's full-buffer postnet)."""
        T = mel.shape[0]
        if T == 0:
            return mel
        Tq = max(64, 1 << math.ceil(math.log2(T)))
        pad = np.zeros((Tq - T, mel.shape[1]), mel.dtype)
        fmask = jnp.arange(Tq)[None, :] < T
        post = self._postnet_fn(self.params,
                                jnp.asarray(np.concatenate([mel, pad]))[None],
                                fmask)
        return np.asarray(post)[0, :T]

    def run_until_drained(self) -> Dict[int, Tuple[np.ndarray, int]]:
        """Process the queue to completion; returns {id: (mel, length)}."""
        while not self.idle:
            self.step()
        out, self.results = self.results, {}
        return out

    def mel_to_audio(self, mel: np.ndarray) -> np.ndarray:
        from rtts.infer.synthesize import Synthesizer

        return Synthesizer.mel_to_audio(self, mel)  # shares the impl
