"""Dataset preprocessing: wav -> (token ids, log-mel) arrays + manifest
(SURVEY.md §3.1 #4, §4.4).

The reference's stages: video -> audio (ffmpeg), resample to 22.05 kHz, cut
clips, trim silence, compute log-mel, save one tensor file per clip plus a
manifest.  Here:

- media extraction stays a host-side subprocess wrapper (``extract_audio``,
  gated on ffmpeg being present — offline-only, no TPU equivalent needed);
- resampling uses the polyphase resampler (rtts/audio/resample.py);
- silence trimming is an energy gate;
- log-mel runs through the jitted XLA front-end, batched per file;
- one ``.npz`` per clip + a JSON manifest with lengths for bucketing.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

from rtts.audio.resample import resample_poly
from rtts.audio.stft import make_mel_fn
from rtts.audio.wav import read_wav
from rtts.config import DatasetConfig
from rtts.text.tokenizer import text_to_ids


def extract_audio(video_path: str, wav_path: str, sample_rate: int = 22050) -> None:
    """Video -> mono wav via ffmpeg subprocess (host-side, offline stage)."""
    cmd = ["ffmpeg", "-y", "-i", video_path, "-ac", "1", "-ar",
           str(sample_rate), str(wav_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except FileNotFoundError as e:
        raise RuntimeError(
            "ffmpeg not available — media extraction is an offline stage; "
            "provide wav inputs directly") from e


def trim_silence(audio: np.ndarray, sample_rate: int, threshold_db: float = -40.0,
                 frame_ms: float = 20.0) -> np.ndarray:
    """Energy-gate silence trim at both ends."""
    frame = max(1, int(sample_rate * frame_ms / 1000))
    n_frames = len(audio) // frame
    if n_frames == 0:
        return audio
    x = audio[: n_frames * frame].reshape(n_frames, frame)
    rms_db = 10.0 * np.log10(np.mean(x * x, axis=1) + 1e-10)
    keep = np.nonzero(rms_db > threshold_db)[0]
    if len(keep) == 0:
        return audio
    start, end = keep[0] * frame, (keep[-1] + 1) * frame
    return audio[start:end]


def parse_transcript_line(ln: str) -> Tuple[str, Optional[str],
                                            Optional[float], Optional[float],
                                            str]:
    """One transcript line -> (utt_id, source, start_s, end_s, text).

    Three accepted layouts (reference behavior per SURVEY.md §4.4: the
    pipeline slices long recordings into utterance clips by transcript
    timing):
      ``utt|text``                    — pre-cut per-utterance wav
      ``utt|start|end|text``          — cut [start, end) s from recording.wav
      ``utt|source.wav|start|end|text`` — cut from a named long recording
    Timings are seconds (float).  Text containing '|' only survives in the
    last field, which is never split further."""
    parts = ln.split("|")
    if len(parts) < 2:
        raise ValueError(f"malformed transcript line: {ln!r}")
    if len(parts) == 2:
        return parts[0], None, None, None, parts[1]

    def _is_time(s: str) -> bool:
        try:
            float(s)
            return True
        except ValueError:
            return False

    if len(parts) >= 4 and _is_time(parts[1]) and _is_time(parts[2]):
        return (parts[0], None, float(parts[1]), float(parts[2]),
                "|".join(parts[3:]))
    if len(parts) >= 5 and _is_time(parts[2]) and _is_time(parts[3]):
        return (parts[0], parts[1], float(parts[2]), float(parts[3]),
                "|".join(parts[4:]))
    # 2-field layout whose text happens to contain '|'
    return parts[0], None, None, None, "|".join(parts[1:])


class _SourceCache:
    """Long recordings loaded+resampled once, sliced many times."""

    def __init__(self, base: pathlib.Path, acfg, use_native: bool):
        self.base = base
        self.acfg = acfg
        self.use_native = use_native
        self._cache = {}

    def load(self, name: str) -> np.ndarray:
        if name not in self._cache:
            from rtts.data import native_loader

            path = self.base / name
            if self.use_native:
                audio, sr = native_loader.wav_read(str(path))
                if sr != self.acfg.sample_rate:
                    audio = native_loader.resample(audio, sr,
                                                   self.acfg.sample_rate)
            else:
                audio, sr = read_wav(path)
                if sr != self.acfg.sample_rate:
                    audio = resample_poly(audio, sr, self.acfg.sample_rate)
            self._cache[name] = np.asarray(audio, np.float32)
        return self._cache[name]

    def cut(self, name: str, start_s: float, end_s: float) -> np.ndarray:
        audio = self.load(name)
        sr = self.acfg.sample_rate
        lo = max(0, int(round(start_s * sr)))
        hi = min(len(audio), int(round(end_s * sr)))
        if hi <= lo:
            raise ValueError(
                f"empty cut [{start_s}, {end_s})s from {name} "
                f"({len(audio) / sr:.2f}s long)")
        return audio[lo:hi]


def preprocess_corpus(cfg: DatasetConfig, transcripts_path: str,
                      out_dir: Optional[str] = None,
                      default_source: str = "recording.wav") -> str:
    """Transcript lines -> per-clip files (token ids + log-mel + audio) and
    a manifest json.  Returns manifest path.

    Lines may reference pre-cut wavs (``utt|text`` -> wavs/utt.wav) or carry
    transcript timings over long recordings (see parse_transcript_line), in
    which case the utterance is cut out of the recording first — the
    reference pipeline's alignment stage (SURVEY.md §4.4)."""
    acfg = cfg.audio
    base = pathlib.Path(transcripts_path).parent
    out = pathlib.Path(out_dir or (pathlib.Path(cfg.data_dir) / "clips"))
    out.mkdir(parents=True, exist_ok=True)
    mel_fn = make_mel_fn(acfg)

    from rtts.data import native_loader

    use_native = native_loader.available()
    sources = _SourceCache(base, acfg, use_native)
    entries = []
    with open(transcripts_path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for ln in lines:
        utt_id, source, start_s, end_s, text = parse_transcript_line(ln)
        if start_s is not None:
            audio = sources.cut(source or default_source, start_s, end_s)
            if use_native:
                audio = native_loader.trim_silence(audio, acfg.sample_rate)
            else:
                audio = trim_silence(audio, acfg.sample_rate)
        else:
            wav_path = base / "wavs" / f"{utt_id}.wav"
            # native C++ path (wav decode, polyphase resample, trim) when
            # built; pure-python otherwise — identical-format clips
            if use_native:
                audio, sr = native_loader.wav_read(str(wav_path))
                if sr != acfg.sample_rate:
                    audio = native_loader.resample(audio, sr, acfg.sample_rate)
                audio = native_loader.trim_silence(audio, acfg.sample_rate)
            else:
                audio, sr = read_wav(wav_path)
                if sr != acfg.sample_rate:
                    audio = resample_poly(audio, sr, acfg.sample_rate)
                audio = trim_silence(audio, acfg.sample_rate)
        # align audio length to hop so mel frames cover it exactly
        n_frames = max(1, len(audio) // acfg.hop_length)
        audio = audio[: n_frames * acfg.hop_length]
        mel = np.asarray(mel_fn(audio), dtype=np.float32)[:n_frames]
        if cfg.text.level == "phoneme":
            from rtts.text.g2p import text_to_phonemes
            from rtts.text.phonemes import phonemes_to_ids

            tokens = np.asarray(
                phonemes_to_ids(text_to_phonemes(text, cfg.text.cleaner)),
                dtype=np.int32)
        else:
            tokens = np.asarray(text_to_ids(text, cfg.text.cleaner),
                                dtype=np.int32)
        clip_path = out / f"{utt_id}.rclip"
        native_loader.write_clip(str(clip_path), tokens, mel,
                                 audio.astype(np.float32))
        entries.append({
            "utt_id": utt_id,
            "clip": str(clip_path),
            "text": text,
            "n_tokens": int(len(tokens)),
            "n_frames": int(mel.shape[0]),
            "n_samples": int(len(audio)),
        })
    manifest = {
        "sample_rate": acfg.sample_rate,
        "hop_length": acfg.hop_length,
        "n_mels": acfg.n_mels,
        "clips": entries,
    }
    mpath = pathlib.Path(cfg.data_dir) / cfg.manifest
    mpath.parent.mkdir(parents=True, exist_ok=True)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)
    return str(mpath)
