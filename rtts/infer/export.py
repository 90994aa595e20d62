"""Deployment artifacts: the serving graphs serialized via ``jax.export``.

SURVEY.md §4.3 describes the reference's serving surface as a live
framework process (model code + checkpoint on the box).  This module takes
the TPU-native rebuild one step further: the two serving graphs —

  - tokens -> (mel, lengths): the full autoregressive decode, encoder +
    cached greedy loop under ``lax.while_loop`` (``Synthesizer._decode``)
  - mel -> waveform: the folded SqueezeWave inverse flows

serialize to self-contained StableHLO artifacts with the CHECKPOINT
WEIGHTS BAKED IN as constants.  A deployment box reloads them with
``ExportedSynthesizer`` and serves text -> wav with no rtts model code, no
config tree and no checkpoint files — only the pure-Python text frontend
(whose knobs ride in the manifest) and the jax runtime.  Artifacts are
shape-specialized (StableHLO is static-shape by design — the same property
everything jitted in this framework already has) and, where the installed
jax supports multi-platform export, lowered for BOTH cpu and tpu so one
artifact serves on either (validated on the real v5e: a cpu+tpu artifact
executes on-chip and matches the live Synthesizer to ~7e-7 — r3 session
log).

Determinism contract: the TTS graph takes an explicit ``seed`` operand
(the decode loop's PRNG stream); the vocoder graph bakes ``PRNGKey(0)``
for its flow noise z — exactly what ``Synthesizer.mel_to_audio`` uses.
The exported pipeline is deterministic and matches the live
``Synthesizer`` up to refusion-class f32 differences (weights enter the
exported graph as CONSTANTS, which lets XLA fold/fuse differently than
the live jit where they are arguments); tests/test_export.py pins both
properties.

Layout of an export directory::

    manifest.json                     shapes + text-frontend + audio params
    tts_b{B}.stablehlo                per exported batch size
    vocoder_b{B}.stablehlo            (absent when no vocoder params)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtts.config import Config

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _export_fn(fn, *specs):
    """``jax.export.export`` with multi-platform lowering when supported."""
    from jax import export as jexport

    jfn = jax.jit(fn)
    try:
        return jexport.export(jfn, platforms=("cpu", "tpu"))(*specs)
    except Exception:
        # older/newer API or a lowering rule missing for the non-native
        # platform: fall back to the current platform only
        return jexport.export(jfn)(*specs)


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def export_synthesizer(
    synth,
    out_dir: str,
    batch_sizes: Sequence[int] = (1,),
    token_len: Optional[int] = None,
    gather_sharded: bool = True,
) -> Dict[str, Any]:
    """Serialize a live ``Synthesizer``'s serving graphs into ``out_dir``.

    One TTS artifact per batch size in ``batch_sizes`` (tokens are padded
    to ``token_len``, default the text frontend's ``max_len``), plus one
    vocoder artifact per batch size when vocoder params are loaded
    (input shape (B, max_frames, n_mels) — ``ExportedSynthesizer`` pads
    each mel row to max_frames and slices the waveform to length*hop, the
    same zero-pad contract the batched continuous-vocoder path uses).
    Returns the manifest dict (also written to ``manifest.json``).

    A mesh-sharded ``Synthesizer`` exports via GATHER-TO-REPLICATED
    (VERDICT r3 item 5): every param shard is gathered to host and baked
    into a portable single-device artifact — the exported graph computes
    the same decode the sharded Synthesizer runs, up to cross-partition
    f32 reduction order (tested on the virtual 8-device mesh).  Gathering
    needs fully-addressable arrays, i.e. a single-process mesh; on a
    multihost mesh (or with ``gather_sharded=False``) the actionable
    rejection below fires instead."""
    cfg: Config = synth.cfg
    gathered_tts, gathered_voc = None, None
    if getattr(synth, "mesh", None) is not None:
        err = ("export_synthesizer cannot bake these sharded params into a "
               "portable artifact — rebuild the Synthesizer without mesh= "
               "for export, or export from a single-process mesh where "
               "gather-to-replicated applies")
        if not gather_sharded:
            raise ValueError(err + " (gather_sharded=False)")
        try:
            gathered_tts = jax.tree.map(
                lambda a: np.asarray(jax.device_get(a)), synth.tts_params)
            if synth.vocoder_params is not None:
                gathered_voc = jax.tree.map(
                    lambda a: np.asarray(jax.device_get(a)),
                    synth.vocoder_params)
        except Exception as e:
            raise ValueError(
                err + f" (gather failed: {e} — not fully addressable; "
                "multihost mesh?)") from e
    tcfg = cfg.dataset.text
    token_len = int(token_len or tcfg.max_len)
    if tcfg.pad_to_multiple and token_len % tcfg.pad_to_multiple:
        raise ValueError(f"token_len={token_len} not a multiple of "
                         f"pad_to_multiple={tcfg.pad_to_multiple}")
    os.makedirs(out_dir, exist_ok=True)

    manifest: Dict[str, Any] = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "token_len": token_len,
        "max_frames": int(synth.max_frames),
        "n_mels": int(cfg.model.n_mels),
        "batch_sizes": sorted(int(b) for b in batch_sizes),
        "text": {
            "cleaner": tcfg.cleaner,
            "level": tcfg.level,
            "pad_to_multiple": int(tcfg.pad_to_multiple),
            "max_len": int(tcfg.max_len),
        },
        "audio": {
            "sample_rate": int(cfg.dataset.audio.sample_rate),
            "hop_length": int(cfg.vocoder.hop_length),
            # STFT/mel frontend params: the Griffin-Lim fallback for
            # TTS-only exports rebuilds its mel basis from these
            "stft": {
                "sample_rate": int(cfg.dataset.audio.sample_rate),
                "n_fft": int(cfg.dataset.audio.n_fft),
                "hop_length": int(cfg.dataset.audio.hop_length),
                "win_length": int(cfg.dataset.audio.win_length),
                "n_mels": int(cfg.dataset.audio.n_mels),
                "fmin": float(cfg.dataset.audio.fmin),
                "fmax": (None if cfg.dataset.audio.fmax is None
                         else float(cfg.dataset.audio.fmax)),
                "log_floor": float(cfg.dataset.audio.log_floor),
                "center": bool(cfg.dataset.audio.center),
            },
        },
        "artifacts": {},
    }

    tts_params = (gathered_tts if gathered_tts is not None
                  else synth.tts_params)
    model_cfg = cfg.model
    decode = synth._decode  # staticmethod: (model_cfg, mode, unroll, staged,
    #                 attn_window, params, tokens, mask, rng, max_frames)
    mode, unroll, staged = synth.mode, synth.unroll, synth.staged
    window = synth.attn_window  # baked into the exported decode graph

    def tts_fn(tokens, mask, seed):
        rng = jax.random.PRNGKey(seed)
        mel, lengths, stop = decode(model_cfg, mode, unroll, staged, window,
                                    tts_params, tokens, mask, rng,
                                    max_frames=synth.max_frames)
        return mel, lengths

    for b in manifest["batch_sizes"]:
        exp = _export_fn(
            tts_fn,
            _spec((b, token_len), jnp.int32),
            _spec((b, token_len), jnp.bool_),
            _spec((), jnp.int32),
        )
        name = f"tts_b{b}.stablehlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        manifest["artifacts"][f"tts_b{b}"] = {
            "file": name,
            "platforms": list(exp.platforms),
        }

    if synth.vocoder_params is not None:
        from rtts.models.squeezewave import infer as sw_infer

        voc_params = (gathered_voc if gathered_voc is not None
                      else synth.vocoder_params)
        voc_cfg = cfg.vocoder

        def voc_fn(mel):
            # PRNGKey(0) flow noise: the exact default mel_to_audio uses
            return sw_infer(voc_params, voc_cfg, mel)

        for b in manifest["batch_sizes"]:
            exp = _export_fn(
                voc_fn, _spec((b, synth.max_frames, cfg.model.n_mels),
                              jnp.float32))
            name = f"vocoder_b{b}.stablehlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            manifest["artifacts"][f"vocoder_b{b}"] = {
                "file": name,
                "platforms": list(exp.platforms),
            }

    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


class ExportedSynthesizer:
    """Text -> wav from an export directory: no model code, no checkpoint.

    Loads the manifest + StableHLO artifacts written by
    ``export_synthesizer`` and mirrors the live ``Synthesizer``'s serving
    semantics: requests are chunked to the largest exported batch size
    (the last chunk padded by repeating its final request), tokens pad to
    the artifact's static ``token_len``, mels pad to ``max_frames`` for
    the vocoder and waveforms slice to ``length * hop``."""

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported export format "
                f"{self.manifest.get('format_version')!r} at {path}")
        self._path = path
        self._loaded: Dict[str, Any] = {}

    def _artifact(self, key: str):
        if key not in self._loaded:
            from jax import export as jexport

            meta = self.manifest["artifacts"].get(key)
            if meta is None:
                raise KeyError(
                    f"artifact {key!r} not in export (have: "
                    f"{sorted(self.manifest['artifacts'])})")
            with open(os.path.join(self._path, meta["file"]), "rb") as f:
                data = f.read()
            self._loaded[key] = jexport.deserialize(bytearray(data))
        return self._loaded[key]

    @property
    def batch_sizes(self) -> List[int]:
        return list(self.manifest["batch_sizes"])

    def _encode(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        from rtts.text import encode_batch

        t = self.manifest["text"]
        tl = self.manifest["token_len"]
        # encode_batch clamps/truncates at max_len=token_len — the same
        # static-budget contract the live Synthesizer serves under
        ids, mask = encode_batch(texts, cleaner=t["cleaner"],
                                 pad_to_multiple=t["pad_to_multiple"],
                                 max_len=tl, level=t["level"])
        pad = tl - ids.shape[1]
        if pad:
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return ids, mask

    def text_to_mel(self, texts: Sequence[str], seed: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (mel (N, max_frames, n_mels) f32, lengths (N,) i32)."""
        ids, mask = self._encode(texts)
        b = self._pick_batch(len(texts))
        mels, lens = [], []
        for lo in range(0, len(texts), b):
            chunk_ids = ids[lo:lo + b]
            chunk_mask = mask[lo:lo + b]
            n = chunk_ids.shape[0]
            if n < b:  # repeat the last request up to the batch size
                reps = [chunk_ids[-1:]] * (b - n)
                chunk_ids = np.concatenate([chunk_ids] + reps)
                chunk_mask = np.concatenate([chunk_mask]
                                            + [mask[lo + n - 1:lo + n]]
                                            * (b - n))
            mel, ln = self._artifact(f"tts_b{b}").call(
                jnp.asarray(chunk_ids), jnp.asarray(chunk_mask),
                jnp.int32(seed))
            mels.append(np.asarray(mel)[:n])
            lens.append(np.asarray(ln)[:n])
        return np.concatenate(mels), np.concatenate(lens)

    def _vocoder_batch(self) -> Optional[int]:
        """Smallest exported vocoder batch size (None when the export is
        TTS-only — vocode then falls back to Griffin-Lim)."""
        sizes = [b for b in self.batch_sizes
                 if f"vocoder_b{b}" in self.manifest["artifacts"]]
        return sizes[0] if sizes else None

    def _griffin_lim(self, mels, lengths) -> List[np.ndarray]:
        """TTS-only exports: invert mels with the manifest's STFT params
        (no model code involved — pinv(mel basis) + Griffin-Lim)."""
        from rtts.audio.griffin import mel_to_audio as gl_mel_to_audio
        from rtts.config import AudioConfig

        acfg = AudioConfig(**self.manifest["audio"]["stft"])
        out = []
        with jax.default_device(jax.devices("cpu")[0]):
            for m, ln in zip(mels, lengths):
                m = np.asarray(m, np.float32)[: int(ln)]
                out.append(np.asarray(gl_mel_to_audio(jnp.asarray(m), acfg)))
        return out

    def vocode(self, mels: Sequence[np.ndarray],
               lengths: Optional[Sequence[int]] = None) -> List[np.ndarray]:
        """Utterances [(T_i, n_mels)] -> waveforms [(length_i * hop,)].

        Batches through the smallest exported vocoder artifact: each row
        zero-pads to max_frames (the batched-vocode contract —
        conditioning differences confined to the receptive field of the
        stop boundary) and short final chunks pad with zero rows.  Flow
        noise z comes from the artifact's baked PRNGKey(0), so a given
        (artifact batch size, row position) is deterministic."""
        b = self._vocoder_batch()
        if lengths is None:
            lengths = [m.shape[0] for m in mels]
        if b is None:
            return self._griffin_lim(mels, lengths)
        frames = self.manifest["max_frames"]
        hop = self.manifest["audio"]["hop_length"]
        rows = []
        # clamp to the artifact's static frame budget: a longer mel
        # (external caller) truncates rather than crashing on a negative pad
        lengths = [min(int(ln), frames) for ln in lengths]
        for m, ln in zip(mels, lengths):
            m = np.asarray(m, np.float32)[:ln]
            rows.append(np.pad(m, ((0, frames - m.shape[0]), (0, 0))))
        wavs: List[np.ndarray] = []
        art = self._artifact(f"vocoder_b{b}")
        for lo in range(0, len(rows), b):
            chunk = rows[lo:lo + b]
            n = len(chunk)
            if n < b:
                chunk = chunk + [np.zeros_like(rows[0])] * (b - n)
            audio = np.asarray(art.call(jnp.asarray(np.stack(chunk))))
            wavs.extend(audio[j, : int(lengths[lo + j]) * hop]
                        for j in range(n))
        return wavs

    def mel_to_audio(self, mel: np.ndarray, length: Optional[int] = None
                     ) -> np.ndarray:
        """One utterance (T, n_mels) -> waveform (length * hop,)."""
        return self.vocode([mel], None if length is None else [length])[0]

    def _pick_batch(self, n: int) -> int:
        sizes = self.batch_sizes
        for b in sizes:
            if b >= n:
                return b
        return sizes[-1]

    def __call__(self, texts: Sequence[str], seed: int = 0
                 ) -> List[np.ndarray]:
        mel, lengths = self.text_to_mel(texts, seed)
        return self.vocode(list(mel), [int(x) for x in lengths])
