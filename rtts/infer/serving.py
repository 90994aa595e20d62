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

Postnet: one batched masked apply over the slot rows per boundary
(``frame_mask`` zeroes everything past each row's length).  This
differs from ``decode_greedy`` only inside the postnet's receptive
field of the stop boundary, where decode_greedy convolves over
post-stop AR garbage and the engine convolves over zeros.

Three entry points, measured in ``bench --which continuous``:

- ``ServingEngine`` — host-driven online variant (streaming arrivals);
  pays one dispatch per segment boundary, which dominates on the
  tunneled backend (~25 ms each) but not on a directly-attached chip.
- ``serve_batch`` — the whole request queue scheduled inside ONE
  compiled ``while_loop``: admission is pure arithmetic (cumsum rank of
  free slots), frames scatter straight into per-request output rows,
  finished rows get the masked postnet in-graph.  Zero host round-trips.
- ``serve_pool`` — ``serve_batch`` per power-of-two capacity class:
  bucketing's cache economy (short requests attend over short rings)
  plus continuous batching's slot recycling.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config, ReformerTTSConfig
from rtts.infer.decode import (
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


def _ring_decode_frame(params, cfg: ReformerTTSConfig, prev_frame, offsets,
                       t, rng, k_caches, v_caches, pos_buf, mem_k, mem_v,
                       memory_mask, pos_table, pos_alpha, cdt):
    """One decoder frame over ring KV caches with per-slot admission
    offsets — the slot step shared by ``ServingEngine``'s segment loop and
    the fused ``serve_batch`` scheduler (their numerics-match guarantee is
    this shared body, not hand-kept duplication).  Returns
    (group, stop_logit, k_caches, v_caches, pos_buf)."""
    num_heads = cfg.decoder.attention.num_heads
    p_rel = t - offsets
    key = jax.random.fold_in(rng, t)
    h = prenet_mlp(params["dec_prenet"], prev_frame.astype(cdt), key,
                   cfg.dec_prenet_dropout, always_dropout=True,
                   deterministic=True, compute_dtype=cdt)
    max_pos = pos_table.shape[0]
    pe = jnp.take(pos_table, jnp.clip(p_rel, 0, max_pos - 1), axis=0)
    h = h + pos_alpha.astype(h.dtype) * pe.astype(h.dtype)

    k_list, v_list = list(k_caches), list(v_caches)
    # pos_buf is shared by all layers: only the running step's writes
    # mutate it (every layer writes the same value)
    pos_box = [pos_buf]

    def self_attn(ci, p, hh):
        out, k_list[ci], v_list[ci], pb = _self_attn_step_ring(
            p, hh, k_list[ci], v_list[ci], pos_box[0], offsets, t,
            num_heads, cdt)
        pos_box[0] = pb
        return out

    def cross(xi, p, hh):
        return _cross_attn_step(p, hh, mem_k[xi], mem_v[xi], memory_mask,
                                num_heads, cdt)[0]

    y = _stack_substep(params, cfg, h, cdt, self_attn, cross)
    group = dense(params["mel_head"], y, cdt).astype(jnp.float32)
    stop_logit = dense(params["stop_head"], y,
                       cdt)[..., 0].astype(jnp.float32)
    return group, stop_logit, tuple(k_list), tuple(v_list), pos_box[0]


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
    mel_out: jnp.ndarray       # (B, (cap+1)*r, n_mels) — slot-local frames;
                               # group index `cap` is the spare written by
                               # already-done slots


def _make_segment_fn(cfg: ReformerTTSConfig, segment: int, stop_threshold):
    """Jitted: advance the engine up to ``segment`` steps (early-exits when
    every slot is done).  Frames accumulate in ``state.mel_out`` on the
    DEVICE — each slot's whole utterance lives in its row since admission,
    so the host transfers nothing per segment (measured on the tunneled
    v5e: the per-segment frame fetch was ~100 ms/segment, 5x the decode
    compute).  Returns (state, done, lengths) — the latter two duplicated
    as outputs so the host's only per-segment fetch is a few bytes."""
    cdt = _dtype(cfg.compute_dtype)
    r = cfg.reduction_factor
    n_mels = cfg.n_mels

    def run(params, state: EngineState, rng):
        pos_table, pos_alpha = _pos_table(params, cfg)
        B = state.done.shape[0]
        cap = state.pos_buf.shape[0]
        rows = jnp.arange(B)[:, None]

        def step(carry):
            i, state = carry
            t = state.t
            p_rel = t - state.offsets                     # (B,) slot position
            group, stop_logit, k_caches, v_caches, pos_buf = \
                _ring_decode_frame(params, cfg, state.prev_frame,
                                   state.offsets, t, rng, state.k_caches,
                                   state.v_caches, state.pos_buf,
                                   state.mem_k, state.mem_v,
                                   state.memory_mask, pos_table, pos_alpha,
                                   cdt)

            # already-done slots write their garbage to the spare group
            # `cap` so an unharvested utterance is never overwritten
            g = jnp.where(state.done, cap, jnp.clip(p_rel, 0, cap - 1))
            cols = g[:, None] * r + jnp.arange(r)[None, :]
            mel_out = state.mel_out.at[rows, cols].set(
                group.reshape(B, r, n_mels), unique_indices=True)

            newly = jax.nn.sigmoid(stop_logit) > stop_threshold
            newly = newly | (p_rel + 1 >= state.budgets)  # budget force-stop
            lengths = jnp.where(state.done, state.lengths, (p_rel + 1) * r)
            state = state._replace(
                t=t + 1, done=state.done | newly, lengths=lengths,
                prev_frame=group, pos_buf=pos_buf,
                k_caches=k_caches, v_caches=v_caches,
                mel_out=mel_out)
            return i + 1, state

        def cond(carry):
            i, state = carry[0], carry[1]
            return (i < segment) & ~jnp.all(state.done)

        i, state = jax.lax.while_loop(
            cond, step, (jnp.asarray(0, jnp.int32), state))
        return state, state.done, state.lengths

    return run


class _Slot(NamedTuple):
    request_id: int


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
                 stop_threshold: Optional[float] = None, seed: int = 0,
                 suppress_dispatch_warning: bool = False):
        mcfg = cfg.model
        r = mcfg.reduction_factor
        if slots < 1 or capacity_frames < r or segment_frames < r:
            raise ValueError(
                f"slots/capacity_frames/segment_frames must be positive "
                f"(>= reduction_factor {r}); got {slots}/{capacity_frames}/"
                f"{segment_frames} — a zero value would loop forever")
        if capacity_frames % r:
            raise ValueError(f"capacity_frames {capacity_frames} not a "
                             f"multiple of reduction_factor {r}")
        if segment_frames % r:
            raise ValueError(f"segment_frames {segment_frames} not a "
                             f"multiple of reduction_factor {r}")
        if not suppress_dispatch_warning:
            import warnings

            warnings.warn(
                "ServingEngine pays one host dispatch per segment boundary; "
                "on dispatch-bound backends (e.g. this repo's tunneled TPU, "
                "~25 ms/dispatch) it measured 0.36x the pad-to-max baseline "
                "(BENCH.md 'continuous'). For offline/known-up-front request "
                "sets use Synthesizer.serve_continuous / serve_pool (fused, "
                "zero host round-trips). ServingEngine is only the right "
                "choice for ONLINE streaming arrivals on a directly-attached "
                "chip. Pass suppress_dispatch_warning=True to acknowledge.",
                UserWarning, stacklevel=2)
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

        self.reset()

    def reset(self) -> None:
        """Drop all state/queue/results but KEEP the compiled functions —
        lets benchmarks and long-lived servers reuse warm jit caches."""
        self.state = self._init_state()
        self.queue: List[Tuple[int, np.ndarray, np.ndarray, int]] = []
        self.live: Dict[int, _Slot] = {}              # slot index -> meta
        self.results: Dict[int, Tuple[np.ndarray, int]] = {}
        self._next_id = 0
        # (done_dev, lengths_dev, {slot: meta at dispatch}) per segment
        # still awaiting its harvest — see step()'s double-buffering
        self._inflight: collections.deque = collections.deque()

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
            mel_out=jnp.zeros(
                (B, (C + 1) * mcfg.reduction_factor, mcfg.n_mels),
                jnp.float32),
        )

    def _admit_impl(self, params, state: EngineState, tokens, token_mask,
                    budgets, install):
        """Encode a full slot-batch of candidate requests and install the
        rows where ``install`` is True — ONE dispatch per segment boundary
        regardless of how many slots free up (per-request admission calls
        would pay the ~25 ms tunnel dispatch each).

        tokens/token_mask: (slots, L) — row i is the request destined for
        slot i (dummy rows where install[i] is False)."""
        mcfg = self.cfg.model
        memory = tts_model.encode(params, mcfg, tokens, token_mask,
                                  rng=None, deterministic=True)
        mk, mv = _init_mem_kv(params, mcfg, memory.astype(self.cdt), self.cdt)

        def pick(new, old):
            return jnp.where(
                install.reshape((-1,) + (1,) * (old.ndim - 1)), new, old)

        return state._replace(
            done=jnp.where(install, False, state.done),
            offsets=jnp.where(install, state.t, state.offsets),
            budgets=jnp.where(install, budgets, state.budgets),
            lengths=jnp.where(install, 0, state.lengths),
            prev_frame=pick(0.0, state.prev_frame),
            mem_k=tuple(pick(n, m) for m, n in zip(state.mem_k, mk)),
            mem_v=tuple(pick(n, m) for m, n in zip(state.mem_v, mv)),
            memory_mask=pick(token_mask, state.memory_mask),
        )

    def _postnet_impl(self, params, mel, frame_mask):
        mcfg = self.cfg.model
        residual = postnet_apply(params["postnet"], mcfg,
                                 mel.astype(self.cdt), None, True,
                                 self.cdt,
                                 frame_mask=frame_mask).astype(jnp.float32)
        # mask the OUTPUT too: a recycled slot's mel_out row still holds its
        # previous occupant's frames past the new utterance's length, and the
        # fetch=False contract promises zero beyond each length
        return (mel + residual) * frame_mask[..., None]

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
        if not self.queue:
            return
        # occupancy is host-side bookkeeping (``self.live``), NOT a device
        # fetch: reading state.done here would block on the in-flight
        # segment and serialize the pipeline step() builds (a harvested
        # slot is by construction done on-device)
        tokens = np.zeros((self.slots, self.token_len), np.int32)
        # dummy (non-installed) rows keep an all-True mask so the batched
        # encode never sees a fully-masked attention row
        masks = np.ones((self.slots, self.token_len), bool)
        budgets = np.zeros((self.slots,), np.int32)
        install = np.zeros((self.slots,), bool)
        admitted: List[Tuple[int, int]] = []   # (slot, request_id)
        for slot in range(self.slots):
            if not self.queue:
                break
            if slot in self.live:
                continue
            rid, tok, msk, budget = self.queue.pop(0)
            tokens[slot] = tok[0]
            masks[slot] = msk[0]
            budgets[slot] = budget
            install[slot] = True
            admitted.append((slot, rid))
        if not admitted:
            return
        self.state = self._admit_fn(
            self.params, self.state, jnp.asarray(tokens), jnp.asarray(masks),
            jnp.asarray(budgets), jnp.asarray(install))
        for slot, rid in admitted:
            self.live[slot] = _Slot(rid)

    def step(self) -> List[int]:
        """Admit queued requests, dispatch one segment, harvest the
        segment dispatched by the PREVIOUS call.  Returns the request ids
        completed by this call.

        Double-buffered (VERDICT r4 #8): the done/lengths fetch for
        segment k — a blocking host round-trip, ~25 ms on the tunneled
        backend — happens only AFTER segment k+1 is dispatched, so
        scheduling overlaps device compute instead of serializing with
        it.  Safe because a done slot parks its writes in the spare group
        and an all-done segment early-exits (see _make_segment_fn); a
        speculative segment can therefore never corrupt an unharvested
        utterance.  Completions surface one step() call late; drain loops
        key on the returned ids / ``idle``, which see every request
        exactly once.

        The only per-segment device->host traffic is the tiny done/lengths
        fetch (the scheduling decision); frames accumulate on-device in
        ``state.mel_out`` and finished utterances get one batched masked
        postnet dispatch per boundary — results stay device-resident until
        ``fetch`` (the tunneled backend moves ~12 MB/s, so shipping every
        segment's frames to the host was 5x the decode compute)."""
        self._fill_slots()
        if self.live:
            self.state, done_d, lengths_d = self._segment_fn(
                self.params, self.state, self.rng)
            self._inflight.append((done_d, lengths_d, dict(self.live)))
        if not self._inflight:
            return []
        if self.live and len(self._inflight) < 2:
            return []          # pipeline filling: keep one segment in flight
        done_d, lengths_d, live_at = self._inflight.popleft()
        done = np.asarray(done_d)
        lengths = np.asarray(lengths_d)
        # harvest only slots still occupied by the SAME request they held
        # when that segment was dispatched (a slot can be harvested and
        # re-admitted while a later segment is in flight)
        fin = [(slot, meta) for slot, meta in live_at.items()
               if done[slot] and self.live.get(slot) == meta]
        if not fin:
            return []
        # one postnet over the whole slot batch; per-row frame_mask makes
        # each row identical to an exact-length run (see postnet_apply) and
        # zeroes rows beyond their length (incl. unfinished slots' rows,
        # which are not consumed)
        T = self.capacity * self.cfg.model.reduction_factor
        fmask = (jnp.arange(T)[None, :]
                 < jnp.asarray(lengths, jnp.int32)[:, None])
        post = self._postnet_fn(self.params, self.state.mel_out[:, :T], fmask)
        finished: List[int] = []
        for slot, meta in fin:
            # device-resident row; trimmed at fetch time
            self.results[meta.request_id] = (post[slot], int(lengths[slot]))
            finished.append(meta.request_id)
            del self.live[slot]
        return finished

    @staticmethod
    def fetch(result: Tuple[Any, int]) -> np.ndarray:
        """(device_row, length) -> trimmed np mel (length, n_mels)."""
        row, length = result
        return np.asarray(row[:length])

    def run_until_drained(self, fetch: bool = True
                          ) -> Dict[int, Tuple[Any, int]]:
        """Process the queue to completion; returns {id: (mel, length)}.
        ``fetch=False`` leaves mels device-resident (full-capacity rows,
        zero beyond length) for callers that feed them back to on-device
        consumers (e.g. the vocoder)."""
        while not self.idle:
            self.step()
        out, self.results = self.results, {}
        if fetch:
            out = {rid: (self.fetch(v), v[1]) for rid, v in out.items()}
        return out

    def mel_to_audio(self, mel: np.ndarray) -> np.ndarray:
        from rtts.infer.synthesize import Synthesizer

        return Synthesizer.mel_to_audio(self, mel)  # shares the impl


# ---------------------------------------------------------------------------
# fused continuous scheduler: the whole queue in ONE dispatch
# ---------------------------------------------------------------------------


class _BatchState(NamedTuple):
    t: jnp.ndarray             # scalar int32 global step
    next_req: jnp.ndarray      # scalar int32 — head of the request queue
    req_idx: jnp.ndarray       # (S,) int32 — request served by each slot
    done: jnp.ndarray          # (S,) bool
    offsets: jnp.ndarray       # (S,) int32
    budgets_s: jnp.ndarray     # (S,) int32 groups
    prev_frame: jnp.ndarray    # (S, r*n_mels)
    pos_buf: jnp.ndarray       # (C,) int32
    k_caches: Any              # tuple: (S, C, H, d)
    v_caches: Any
    mem_k_s: Any               # tuple: (S, L, H, d) — per-slot cross K/V
    mem_v_s: Any
    mmask_s: jnp.ndarray       # (S, L) bool
    out: jnp.ndarray           # (N + S, C*r, n_mels) — row N+s = slot s spare
    lengths: jnp.ndarray       # (N + S,) int32


def serve_batch(params, cfg: ReformerTTSConfig, tokens: jnp.ndarray,
                token_mask: jnp.ndarray, budgets: jnp.ndarray,
                capacity_frames: int, slots: int = 8,
                segment_frames: int = 64,
                stop_threshold: Optional[float] = None,
                rng: Optional[jax.Array] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Continuous-batching decode of a whole request list in ONE compiled
    computation — the fused counterpart of ``ServingEngine``.

    The per-segment engine pays a host round-trip per segment plus a
    device->host frame transfer (measured on the tunneled v5e: ~25 ms
    dispatch + ~100 ms/segment transfer — 5x the decode compute).  Here
    the scheduler itself is traced: requests are encoded up front in one
    batch, a ``while_loop`` admits them into free slots every
    ``segment_frames`` steps (pure arithmetic — rank-of-free-slot via
    cumsum), the decode scatters each slot's frames directly into its
    request's output row, and finished rows get the masked postnet
    in-graph.  Host sees exactly one dispatch for the entire queue.

    Numerics match ``ServingEngine`` (same ring-cache step, same masked
    postnet = exact-length run); a request admitted at t=0 with
    budget == capacity matches ``decode_greedy(kv_full, staged=False)``.

    tokens/token_mask: (N, L); budgets: (N,) int32 FRAMES (clamped to
    capacity, rounded up to the reduction factor).
    Returns (mel_post (N, capacity_frames, n_mels) — zero beyond each
    length, device-resident — and lengths (N,) int32).

    jit-compatible; shapes are static in (N, L, capacity, slots, segment).
    """
    cdt = _dtype(cfg.compute_dtype)
    kdt = _kv_dtype(cfg, cdt)
    r = cfg.reduction_factor
    if slots < 1 or capacity_frames < r or segment_frames < r:
        raise ValueError(
            f"slots/capacity_frames/segment_frames must be positive "
            f"(>= reduction_factor {r}); got {slots}/{capacity_frames}/"
            f"{segment_frames} — a zero value would compile an infinite "
            f"while_loop")
    if capacity_frames % r:
        raise ValueError(f"capacity_frames {capacity_frames} not a multiple "
                         f"of reduction_factor {r}")
    if segment_frames % r:
        raise ValueError(f"segment_frames {segment_frames} not a multiple "
                         f"of reduction_factor {r}")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    thr = cfg.stop_threshold if stop_threshold is None else stop_threshold
    C = capacity_frames // r
    S = slots
    seg = segment_frames // r
    N, L = tokens.shape
    a = cfg.decoder.attention
    num_heads = a.num_heads
    n_mels = cfg.n_mels
    params = _precast_weights(params, cdt)

    # encode ALL requests in one batch; per-request cross K/V stay in HBM
    # and admission copies just the admitted rows into the slot buffers
    # (a per-STEP gather from (N, ...) would pay the slow-gather path)
    memory = tts_model.encode(params, cfg, tokens, token_mask, rng=None,
                              deterministic=True)
    mem_k_all, mem_v_all = _init_mem_kv(params, cfg, memory.astype(cdt), cdt)
    budgets_g = jnp.clip((budgets + r - 1) // r, 1, C).astype(jnp.int32)

    pos_table, pos_alpha = _pos_table(params, cfg)
    cache = (S, C, num_heads, a.head_dim)
    state = _BatchState(
        t=jnp.asarray(0, jnp.int32),
        next_req=jnp.asarray(0, jnp.int32),
        req_idx=N + jnp.arange(S, dtype=jnp.int32),   # spare rows
        done=jnp.ones((S,), bool),
        offsets=jnp.zeros((S,), jnp.int32),
        budgets_s=jnp.ones((S,), jnp.int32),
        prev_frame=jnp.zeros((S, n_mels * r), jnp.float32),
        pos_buf=jnp.full((C,), -1, jnp.int32),
        k_caches=tuple(jnp.zeros(cache, kdt)
                       for _ in range(cfg.decoder.num_layers)),
        v_caches=tuple(jnp.zeros(cache, kdt)
                       for _ in range(cfg.decoder.num_layers)),
        mem_k_s=tuple(jnp.zeros((S, L, num_heads, a.head_dim), kdt)
                      for _ in range(cfg.decoder.num_layers)),
        mem_v_s=tuple(jnp.zeros((S, L, num_heads, a.head_dim), kdt)
                      for _ in range(cfg.decoder.num_layers)),
        mmask_s=jnp.ones((S, L), bool),
        out=jnp.zeros((N + S, C * r, n_mels), jnp.float32),
        lengths=jnp.zeros((N + S,), jnp.int32),
    )
    spare = N + jnp.arange(S, dtype=jnp.int32)

    def admit(state: _BatchState) -> _BatchState:
        free = state.done
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        cand = state.next_req + rank
        take = free & (cand < N)
        src = jnp.where(take, cand, 0)

        def rows(all_x, slot_x):
            new = jnp.take(all_x, src, axis=0)
            sel = take.reshape((-1,) + (1,) * (slot_x.ndim - 1))
            return jnp.where(sel, new, slot_x)

        return state._replace(
            next_req=state.next_req + jnp.sum(take),
            req_idx=jnp.where(take, src, state.req_idx),
            done=state.done & ~take,
            offsets=jnp.where(take, state.t, state.offsets),
            budgets_s=jnp.where(take, jnp.take(budgets_g, src), state.budgets_s),
            prev_frame=jnp.where(take[:, None], 0.0, state.prev_frame),
            mem_k_s=tuple(rows(al, sl) for al, sl in
                          zip(mem_k_all, state.mem_k_s)),
            mem_v_s=tuple(rows(al, sl) for al, sl in
                          zip(mem_v_all, state.mem_v_s)),
            mmask_s=rows(token_mask, state.mmask_s),
        )

    def step(_, state: _BatchState) -> _BatchState:
        t = state.t
        p_rel = t - state.offsets
        group, stop_logit, k_caches, v_caches, pos_buf = _ring_decode_frame(
            params, cfg, state.prev_frame, state.offsets, t, rng,
            state.k_caches, state.v_caches, state.pos_buf,
            state.mem_k_s, state.mem_v_s, state.mmask_s, pos_table,
            pos_alpha, cdt)

        # already-done slots scatter into their spare row; a slot whose stop
        # fires THIS step still writes its final real frame (done is the
        # pre-step flag)
        wr = jnp.where(state.done, spare, state.req_idx)
        cols = jnp.clip(p_rel, 0, C - 1)[:, None] * r + jnp.arange(r)[None, :]
        out = state.out.at[wr[:, None], cols].set(
            group.reshape(S, r, n_mels), unique_indices=True)

        newly = jax.nn.sigmoid(stop_logit) > thr
        newly = newly | (p_rel + 1 >= state.budgets_s)
        fin = newly & ~state.done
        lw = jnp.where(fin, state.req_idx, spare)
        lengths = state.lengths.at[lw].set(
            jnp.where(fin, (p_rel + 1) * r, 0), unique_indices=True)
        return state._replace(
            t=t + 1, done=state.done | newly, prev_frame=group,
            pos_buf=pos_buf, k_caches=k_caches,
            v_caches=v_caches, out=out, lengths=lengths)

    def boundary(state: _BatchState) -> _BatchState:
        state = admit(state)
        return jax.lax.fori_loop(0, seg, step, state)

    def cond(state: _BatchState):
        return (state.next_req < N) | ~jnp.all(state.done)

    state = jax.lax.while_loop(cond, boundary, state)

    lengths = state.lengths[:N]
    out = state.out[:N]
    fmask = jnp.arange(C * r)[None, :] < lengths[:, None]
    residual = postnet_apply(params["postnet"], cfg, out.astype(cdt), None,
                             True, cdt, frame_mask=fmask).astype(jnp.float32)
    mel_post = (out + residual) * fmask[..., None]
    return mel_post, lengths


# ---------------------------------------------------------------------------
# capacity-classed pool: bucketed cache economy + continuous recycling
# ---------------------------------------------------------------------------


_serve_batch_jit = jax.jit(
    serve_batch,
    static_argnames=("cfg", "capacity_frames", "slots", "segment_frames",
                     "stop_threshold"))


def _hashable_cfg(cfg: ReformerTTSConfig) -> ReformerTTSConfig:
    """jit static args must hash; a YAML list num_buckets is the one
    unhashable field in the tree — normalize it to a tuple."""
    import dataclasses

    def fix(stack):
        nb = stack.attention.num_buckets
        if isinstance(nb, list):
            return dataclasses.replace(
                stack, attention=dataclasses.replace(stack.attention,
                                                     num_buckets=tuple(nb)))
        return stack

    return dataclasses.replace(cfg, encoder=fix(cfg.encoder),
                               decoder=fix(cfg.decoder))


def serve_pool(params, cfg: ReformerTTSConfig, tokens: np.ndarray,
               token_mask: np.ndarray, budgets,
               class_caps: Tuple[int, ...] = (128, 256, 512, 1024),
               slots: int = 8, segment_frames: int = 64,
               stop_threshold: Optional[float] = None,
               rng: Optional[jax.Array] = None
               ) -> Tuple[List[Any], np.ndarray]:
    """Capacity-classed continuous batching: route each request to the
    smallest capacity class covering its budget, then run the fused
    scheduler (``serve_batch``) once per class.

    This combines the two serving wins that are individually insufficient:
    bucketed batching's cache economy (a 128-frame request attends over a
    128-row ring, not the global max) and continuous batching's slot
    recycling (within a class, arrival order and per-request stop times
    don't couple requests).  One dispatch per non-empty class.

    Returns ([per-request device mel (cap_c frames, n_mels)], lengths np).
    Rows are zero beyond each length; mels stay device-resident (feed them
    to the vocoder or ``np.asarray`` to fetch).
    """
    cfg = _hashable_cfg(cfg)
    budgets = np.asarray(budgets, np.int32)
    caps = sorted(class_caps)
    if budgets.max(initial=0) > caps[-1]:
        raise ValueError(f"budget {int(budgets.max())} exceeds the largest "
                         f"class capacity {caps[-1]}")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    N = len(budgets)
    mels: List[Any] = [None] * N
    lengths = np.zeros((N,), np.int32)
    # dispatch every class first (jax dispatch is async), THEN fetch the
    # lengths — blocking on class k before dispatching k+1 would serialize
    # device work that is independent across classes
    pending: List[Tuple[List[int], Any, Any]] = []
    for ci, cap in enumerate(caps):
        lo = caps[ci - 1] if ci else 0
        idx = [i for i in range(N) if lo < budgets[i] <= cap]
        if not idx:
            continue
        mel_c, len_c = _serve_batch_jit(
            params, cfg, jnp.asarray(tokens[idx]),
            jnp.asarray(token_mask[idx]), jnp.asarray(budgets[idx]),
            capacity_frames=cap, slots=slots,
            segment_frames=min(segment_frames, cap),
            stop_threshold=stop_threshold, rng=jax.random.fold_in(rng, cap))
        pending.append((idx, mel_c, len_c))
    for idx, mel_c, len_c in pending:
        len_np = np.asarray(len_c)
        for j, i in enumerate(idx):
            mels[i] = mel_c[j]
            lengths[i] = len_np[j]
    return mels, lengths
