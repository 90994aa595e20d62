"""End-to-end text -> wav inference API (SURVEY.md §3.1 #16, §4.3).

``Synthesizer`` packages the tokenizer, encoder, jitted AR decode loop, and
vocoder behind the reference's public inference surface: give it text,
receive a waveform.  The decode function is compiled once per
(batch, token_len, max_frames) bucket and cached.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config
from rtts.infer.decode import _dtype, _precast_weights, decode_greedy
from rtts.models import reformer_tts as tts_model
from rtts.text import encode_batch


class Synthesizer:
    def __init__(self, cfg: Config, tts_params, vocoder_params=None,
                 max_frames: int = 1024, mode: str = "auto",
                 unroll: int = 1, staged="auto", mesh=None,
                 tensor_parallel: bool = True, attn_window=None):
        """``mode`` selects the AR decode cache (see decode_greedy).
        Default "auto" applies a measured cost model: kv_lsh_chunk for
        LSH decoders when the prefix dwarfs the ring working set (1.78x
        at 8k frames; fidelity on par with kv_full — which cached mode
        wins is checkpoint noise, PARITY.md), else
        kv_full (PARITY.md "Serving parity", BENCH.md).  ``unroll`` runs
        k decoder steps per while_loop trip (block decoding for kv_full:
        same score values, refusion-class output differences; see
        decode_greedy).  Default 1: on the tunneled v5e even the
        aliasing-preserving block scheme is a mild measured LOSS
        (BENCH.md), left available for directly-attached deployments.  ``staged`` grows the KV buffers
        geometrically over the decode ("auto": on from 256 frames —
        +15-44% frames/s, measured; see decode_greedy).

        ``mesh`` (jax.sharding.Mesh) serves over multiple chips: TTS
        params shard by the training TP rules (``tensor_parallel``),
        request batches shard over the data axis (padded by repeating
        the last request up to the data-parallel size), and vocoder
        params replicate (it scales by batch).  Same numerics as
        single-device up to cross-partition reduction order
        (rtts/parallel/serving.py; tests/test_serving_tp.py).

        ``attn_window=(w_back, w_fwd)`` (tokens) applies monotonic
        cross-attention windowing during the AR decode — the classic
        inference guard against attention looping/skipping on long or
        out-of-distribution text (see decode_greedy; opt-in)."""
        self.cfg = cfg
        self.mesh = mesh
        # one-time bf16 cast of matmul weights, OUTSIDE the jit: the
        # in-graph cast is bit-identical but XLA re-materializes it per
        # stage loop under staged decoding (BENCH.md — 11.5k vs 18.0k
        # frames/s at b8x512); pre-cast jit ARGUMENTS sidestep that and
        # also amortize the cast across calls
        self.tts_params = _precast_weights(
            tts_params, _dtype(cfg.model.compute_dtype))
        # fold weight-norm + precompute 1x1 inverses at LOAD: an unfolded
        # checkpoint would otherwise silently pay an on-device matrix
        # inverse per flow per call (SURVEY.md §8 hard-part 6)
        if vocoder_params is not None:
            from rtts.models.squeezewave import ensure_folded

            vocoder_params = ensure_folded(vocoder_params)
        if mesh is not None:
            from rtts.parallel.serving import (replicate_for_serving,
                                               shard_for_serving)

            self.tts_params = shard_for_serving(self.tts_params, mesh,
                                                tensor_parallel)
            if vocoder_params is not None:
                vocoder_params = replicate_for_serving(vocoder_params, mesh)
        self.vocoder_params = vocoder_params
        self.max_frames = max_frames
        self.mode = mode
        self.unroll = unroll
        self.staged = staged
        self.attn_window = (tuple(attn_window) if attn_window is not None
                            else None)
        self._decode_jit = jax.jit(
            functools.partial(self._decode, cfg.model, mode, unroll, staged,
                              self.attn_window),
            static_argnames=("max_frames",),
        )

    @staticmethod
    def _decode(model_cfg, mode, unroll, staged, attn_window, params, tokens,
                token_mask, rng, max_frames):
        memory = tts_model.encode(params, model_cfg, tokens, token_mask,
                                  rng=None, deterministic=True)
        return decode_greedy(params, model_cfg, memory, token_mask,
                             max_frames=max_frames, rng=rng, mode=mode,
                             unroll=unroll, staged=staged,
                             attn_window=attn_window)

    def text_to_mel(self, texts: Sequence[str], seed: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (mel (B, T_max, n_mels) float32, lengths (B,) int32)"""
        tcfg = self.cfg.dataset.text
        tokens, mask = encode_batch(texts, cleaner=tcfg.cleaner,
                                    pad_to_multiple=tcfg.pad_to_multiple,
                                    max_len=tcfg.max_len, level=tcfg.level)
        tokens, mask = jnp.asarray(tokens), jnp.asarray(mask)
        n = tokens.shape[0]
        if self.mesh is not None:
            from rtts.parallel.serving import (data_parallel_size,
                                               shard_request_batch)

            # pad the batch to the data-parallel size by repeating the
            # last request (all-pad rows would decode degenerately)
            dp = data_parallel_size(self.mesh)
            extra = (-n) % dp
            if extra:
                tokens = jnp.concatenate([tokens, jnp.tile(tokens[-1:],
                                                           (extra, 1))])
                mask = jnp.concatenate([mask, jnp.tile(mask[-1:],
                                                       (extra, 1))])
            tokens, mask = shard_request_batch((tokens, mask), self.mesh)
        mel, lengths, _ = self._decode_jit(
            self.tts_params, tokens, mask,
            jax.random.PRNGKey(seed), max_frames=self.max_frames)
        return np.asarray(mel)[:n], np.asarray(lengths)[:n]

    def mel_to_audio(self, mel: np.ndarray, length: Optional[int] = None,
                     streaming_chunk: int = 0) -> np.ndarray:
        """One utterance (T, n_mels) -> waveform. Uses the SqueezeWave
        vocoder when params are loaded, else Griffin-Lim.
        ``streaming_chunk`` > 0 vocodes in chunks of that many mel frames
        (identical output, bounded latency/memory)."""
        if length is not None:
            mel = mel[:length]
        if self.vocoder_params is not None:
            from rtts.models.squeezewave import infer as sw_infer
            from rtts.models.squeezewave import infer_streaming

            if streaming_chunk > 0:
                audio = infer_streaming(self.vocoder_params, self.cfg.vocoder,
                                        jnp.asarray(mel)[None],
                                        chunk_frames=streaming_chunk)[0]
            else:
                audio = sw_infer(self.vocoder_params, self.cfg.vocoder,
                                 jnp.asarray(mel)[None])[0]
            return np.asarray(audio)
        from rtts.audio.griffin import mel_to_audio as gl_mel_to_audio

        # Griffin-Lim needs complex FFT — run on CPU (unsupported on some
        # TPU backends); it's the no-vocoder fallback path, not the hot path
        with jax.default_device(jax.devices("cpu")[0]):
            return np.asarray(gl_mel_to_audio(jnp.asarray(mel),
                                              self.cfg.dataset.audio))

    def __call__(self, texts: Sequence[str], seed: int = 0) -> List[np.ndarray]:
        mel, lengths = self.text_to_mel(texts, seed)
        return [self.mel_to_audio(mel[i], int(lengths[i])) for i in range(len(texts))]

    # -- variable-length serving batching (SURVEY.md §4.3 serving loop) -----

    def _frame_quantum(self) -> int:
        """Frame budgets and capacity classes quantize to lcm(64, r): 64 is
        the chunk/stage alignment, r the reduction factor (a serve_batch
        capacity must divide by r).  One definition shared by
        ``predict_frames`` and ``serve_continuous_to_mel``."""
        r = self.cfg.model.reduction_factor
        return 64 * r // math.gcd(64, r)

    def predict_frames(self, texts: Sequence[str],
                       frames_per_token: float = 8.0,
                       min_frames: int = 64) -> List[int]:
        """Per-request mel-frame budgets from token counts.

        The decode loop pads every request in a batch to the batch's
        max_frames and runs until ALL rows stop, so mixed-length traffic
        wastes decode steps on the longest request.  Budgets quantize to a
        multiple of 64 (chunk/stage alignment) and of the reduction
        factor; ``frames_per_token`` should slightly OVERestimate the
        trained speech rate — underestimates are caught and escalated by
        ``serve_to_mel``."""
        from rtts.text import token_lengths

        tcfg = self.cfg.dataset.text
        m = self._frame_quantum()
        out = []
        for n_tok in token_lengths(texts, cleaner=tcfg.cleaner,
                                   level=tcfg.level):
            b = max(min_frames, int(math.ceil(frames_per_token * n_tok)))
            b = min(self.max_frames, -(-b // m) * m)
            out.append(b)
        return out

    def serve_to_mel(self, texts: Sequence[str], seed: int = 0,
                     frames_per_token: float = 8.0, min_frames: int = 64,
                     escalate: bool = True
                     ) -> Tuple[List[np.ndarray], List[int]]:
        """Variable-length batched synthesis: bucket requests by predicted
        mel length, decode each bucket at its own max_frames (compile cache
        keyed on the bucket shape), escalate under-budgeted requests to the
        full budget.  Returns per-request (mel (T_i, n_mels), length).

        ``escalate=False`` accepts budget-truncated outputs (bench /
        fixed-latency serving)."""
        budgets = self.predict_frames(texts, frames_per_token, min_frames)
        groups: dict = {}
        for i, b in enumerate(budgets):
            groups.setdefault(b, []).append(i)

        mels: List[Optional[np.ndarray]] = [None] * len(texts)
        lengths: List[int] = [0] * len(texts)
        needs_full: List[int] = []
        for budget, idxs in sorted(groups.items()):
            mel, lens = self._decode_group([texts[i] for i in idxs], budget,
                                           seed)
            for j, i in enumerate(idxs):
                li = int(lens[j])
                # lengths == budget means the stop head never fired before
                # the cap: the budget may have truncated the utterance
                if escalate and li >= budget and budget < self.max_frames:
                    needs_full.append(i)
                else:
                    mels[i] = mel[j, :li]
                    lengths[i] = li
        if needs_full:
            mel, lens = self._decode_group([texts[i] for i in needs_full],
                                           self.max_frames, seed)
            for j, i in enumerate(needs_full):
                li = int(lens[j])
                mels[i] = mel[j, :li]
                lengths[i] = li
        return mels, lengths  # type: ignore[return-value]

    def _decode_group(self, texts: Sequence[str], max_frames: int, seed: int):
        tcfg = self.cfg.dataset.text
        tokens, mask = encode_batch(texts, cleaner=tcfg.cleaner,
                                    pad_to_multiple=tcfg.pad_to_multiple,
                                    max_len=tcfg.max_len, level=tcfg.level)
        mel, lens, _ = self._decode_jit(
            self.tts_params, jnp.asarray(tokens), jnp.asarray(mask),
            jax.random.PRNGKey(seed), max_frames=max_frames)
        return np.asarray(mel), np.asarray(lens)

    def serve(self, texts: Sequence[str], seed: int = 0,
              frames_per_token: float = 8.0, min_frames: int = 64
              ) -> List[np.ndarray]:
        """Variable-length batched text->wav (see serve_to_mel)."""
        mels, lengths = self.serve_to_mel(texts, seed, frames_per_token,
                                          min_frames)
        return [self.mel_to_audio(m) for m in mels]

    # -- continuous batching (slot recycling inside a compiled scheduler) ----

    def serve_continuous_to_mel(self, texts: Sequence[str], seed: int = 0,
                                frames_per_token: float = 8.0,
                                min_frames: int = 64, slots: int = 8,
                                segment_frames: int = 64,
                                escalate: bool = True, fetch: bool = True
                                ) -> Tuple[List[Any], List[int]]:
        """Continuous-batching synthesis via the capacity-classed pool
        (``rtts.infer.serving.serve_pool``): requests route to the smallest
        power-of-two capacity class covering their predicted length, and
        within a class a compiled scheduler recycles decode slots the step
        a request stops — arrival order and per-request stop times don't
        couple requests, unlike the synchronous buckets of ``serve_to_mel``
        (measured: see BENCH.md "continuous").  Returns per-request
        (mel (T_i, n_mels) np.float32, length).

        ``fetch=False`` returns DEVICE-resident rows at their class
        capacity (zero beyond each length) for on-device consumers — the
        batched vocoder path stacks same-capacity rows without a host
        round-trip."""
        from rtts.infer.serving import serve_pool

        tcfg = self.cfg.dataset.text
        budgets = self.predict_frames(texts, frames_per_token, min_frames)
        tokens, mask = encode_batch(texts, cleaner=tcfg.cleaner,
                                    pad_to_multiple=tcfg.pad_to_multiple,
                                    max_len=tcfg.max_len, level=tcfg.level)
        # power-of-two capacity classes, rounded up to the same quantum as
        # predict_frames; the top class covers max_frames even when
        # max_frames itself is off-quantum
        r = self.cfg.model.reduction_factor
        m = self._frame_quantum()
        top = -(-self.max_frames // m) * m
        caps = tuple(sorted({-(-c // m) * m for c in
                             (128, 256, 512, 1024, 2048, 4096, 8192)
                             if -(-c // m) * m < top} | {top}))
        seg = max(r, segment_frames - segment_frames % r)

        def run(tok, msk, bud):
            dmels, lens = serve_pool(
                self.tts_params, self.cfg.model, tok, msk, bud,
                class_caps=caps, slots=slots, segment_frames=seg,
                rng=jax.random.PRNGKey(seed))
            return dmels, lens

        dmels, lens = run(tokens, mask, budgets)
        mels: List[Any] = [None] * len(texts)
        lengths: List[int] = [0] * len(texts)
        needs_full: List[int] = []
        for i in range(len(texts)):
            li = int(lens[i])
            if (escalate and li >= budgets[i]
                    and budgets[i] < self.max_frames):
                needs_full.append(i)   # budget may have truncated the stop
            else:
                # slice on DEVICE before fetching: transferring the full
                # class-capacity row costs cap/li times the bytes on the
                # slow device->host path
                mels[i] = np.asarray(dmels[i][:li]) if fetch else dmels[i]
                lengths[i] = li
        if needs_full:
            dmels, lens = run(tokens[needs_full], mask[needs_full],
                              [self.max_frames] * len(needs_full))
            for j, i in enumerate(needs_full):
                li = int(lens[j])
                mels[i] = np.asarray(dmels[j][:li]) if fetch else dmels[j]
                lengths[i] = li
        return mels, lengths

    def serve_continuous(self, texts: Sequence[str], seed: int = 0,
                         frames_per_token: float = 8.0, min_frames: int = 64,
                         slots: int = 8, segment_frames: int = 64,
                         vocode: str = "batched") -> List[np.ndarray]:
        """Continuous-batching text->wav (see serve_continuous_to_mel).

        ``vocode="batched"`` stacks same-capacity-class mel rows and runs
        ONE vocoder dispatch per class, on device end to end; audio is
        sliced to each true length.  ``vocode="exact"`` runs each
        utterance trimmed through ``mel_to_audio`` (one dispatch per
        request, bit-identical to ``__call__``).  The two draw different
        flow noise ``z`` (per-class rows vs per-utterance), so waveforms
        differ SAMPLE-wise while being identically distributed — inherent
        to any batched flow vocoder.  Conditioning differences from the
        zero padding are confined to the receptive field of the stop
        boundary (``squeezewave.receptive_field_squeezed``)."""
        if vocode not in ("batched", "exact"):
            raise ValueError(f"vocode must be 'batched' or 'exact', "
                             f"got {vocode!r}")
        if vocode == "exact" or self.vocoder_params is None:
            mels, _ = self.serve_continuous_to_mel(
                texts, seed, frames_per_token, min_frames, slots,
                segment_frames)
            return [self.mel_to_audio(m) for m in mels]

        from rtts.models.squeezewave import infer as sw_infer

        rows, lengths = self.serve_continuous_to_mel(
            texts, seed, frames_per_token, min_frames, slots, segment_frames,
            fetch=False)
        hop = self.cfg.vocoder.hop_length
        by_cap: dict = {}
        for i, row in enumerate(rows):
            by_cap.setdefault(int(row.shape[0]), []).append(i)
        wavs: List[Optional[np.ndarray]] = [None] * len(texts)
        for cap, idxs in sorted(by_cap.items()):
            audio = sw_infer(self.vocoder_params, self.cfg.vocoder,
                             jnp.stack([rows[i] for i in idxs]))
            audio = np.asarray(audio)
            for j, i in enumerate(idxs):
                wavs[i] = audio[j, : lengths[i] * hop]
        return wavs  # type: ignore[return-value]


def synthesize(cfg: Config, tts_params, texts: Sequence[str],
               vocoder_params=None, max_frames: int = 1024, seed: int = 0,
               mode: str = "auto"):
    return Synthesizer(cfg, tts_params, vocoder_params, max_frames,
                       mode=mode)(texts, seed)
