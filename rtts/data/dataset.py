"""Dataset classes + static-shape batching (SURVEY.md §3.1 #6).

Two dataset views over the preprocessed manifest:

- ``TextMelDataset`` — (token ids, log-mel) pairs for TTS training, with a
  pad-collate that rounds every batch to chunk multiples (LSH alignment) and
  returns explicit masks.
- ``MelAudioDataset`` — (mel window, audio crop) pairs for vocoder training:
  random fixed-length audio crops with the matching mel window (the
  reference's SpectrogramToSpeechDataset behavior).

TPU-first: batches are bucketed by (token_len, mel_len) so jit sees a small
fixed set of shapes (no recompile storms — SURVEY.md §8 hard-part 4).  The
optional native C++ loader (rtts/data/native_loader.py) prefetches clip
files off the Python thread.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from rtts.config import DatasetConfig
from rtts.text.symbols import PAD_ID


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m if m > 1 else n


@dataclass
class Manifest:
    sample_rate: int
    hop_length: int
    n_mels: int
    clips: List[dict]

    @classmethod
    def load(cls, path) -> "Manifest":
        with open(path) as f:
            d = json.load(f)
        return cls(d["sample_rate"], d["hop_length"], d["n_mels"], d["clips"])


def split_manifest(man: Manifest, val_fraction: float, seed: int
                   ) -> Tuple[Manifest, Manifest]:
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(man.clips))
    n_val = max(1, int(len(man.clips) * val_fraction))
    val_ids = set(idx[:n_val].tolist())
    tr = [c for i, c in enumerate(man.clips) if i not in val_ids]
    va = [c for i, c in enumerate(man.clips) if i in val_ids]
    return (Manifest(man.sample_rate, man.hop_length, man.n_mels, tr),
            Manifest(man.sample_rate, man.hop_length, man.n_mels, va))


class ClipStore:
    """Loads clip files (.rclip or legacy .npz), with a small LRU-ish cache."""

    def __init__(self, max_cached: int = 512):
        self._cache: Dict[str, dict] = {}
        self._max = max_cached

    def load(self, path: str) -> dict:
        hit = self._cache.get(path)
        if hit is not None:
            return hit
        if str(path).endswith(".rclip"):
            from rtts.data.native_loader import read_clip

            tokens, mel, audio = read_clip(path)
            d = {"tokens": tokens, "mel": mel, "audio": audio}
        else:
            with np.load(path) as z:
                d = {k: z[k] for k in z.files}
        if len(self._cache) >= self._max:
            self._cache.pop(next(iter(self._cache)))
        self._cache[path] = d
        return d


class TextMelDataset:
    """(tokens, mel) view with bucketed static-shape batching."""

    def __init__(self, man: Manifest, cfg: DatasetConfig,
                 store: Optional[ClipStore] = None):
        self.man = man
        self.cfg = cfg
        self.store = store or ClipStore()

    def __len__(self) -> int:
        return len(self.man.clips)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        c = self.man.clips[i]
        d = self.store.load(c["clip"])
        return d["tokens"], d["mel"]

    def _bucket_shape(self, items: Sequence[Tuple[np.ndarray, np.ndarray]]
                      ) -> Tuple[int, int]:
        tok = max(len(t) for t, _ in items)
        mel = max(m.shape[0] for _, m in items)
        t_pad = _round_up(tok, self.cfg.text.pad_to_multiple)
        m_pad = min(_round_up(mel, self.cfg.mel_pad_to_multiple),
                    self.cfg.max_mel_len)
        return t_pad, m_pad

    def collate(self, items: Sequence[Tuple[np.ndarray, np.ndarray]]
                ) -> Dict[str, np.ndarray]:
        t_pad, m_pad = self._bucket_shape(items)
        n_mels = items[0][1].shape[1]
        b = len(items)
        tokens = np.full((b, t_pad), PAD_ID, np.int32)
        tmask = np.zeros((b, t_pad), bool)
        mel = np.zeros((b, m_pad, n_mels), np.float32)
        mmask = np.zeros((b, m_pad), bool)
        for r, (t, m) in enumerate(items):
            t = t[:t_pad]
            m = m[:m_pad]
            tokens[r, :len(t)] = t
            tmask[r, :len(t)] = True
            mel[r, :m.shape[0]] = m
            mmask[r, :m.shape[0]] = True
        return {"tokens": tokens, "token_mask": tmask,
                "mel": mel, "mel_mask": mmask}

    def _native_loader(self):
        """Build (once) the C++ prefetching loader when configured and the
        clips are in rclip format; None -> pure-python path."""
        if getattr(self, "_nl", False) is not False:
            return self._nl
        self._nl = None
        if self.cfg.num_workers > 0 and self.man.clips and \
                str(self.man.clips[0]["clip"]).endswith(".rclip"):
            try:
                from rtts.data.native_loader import NativeClipLoader, available

                if available():
                    self._nl = NativeClipLoader(
                        [c["clip"] for c in self.man.clips],
                        n_workers=self.cfg.num_workers)
            except Exception:
                self._nl = None
        return self._nl

    def _bucket_shape_from_manifest(self, chunk: Sequence[int]):
        tok = max(self.man.clips[i]["n_tokens"] for i in chunk)
        mel = max(self.man.clips[i]["n_frames"] for i in chunk)
        t_pad = _round_up(tok, self.cfg.text.pad_to_multiple)
        m_pad = min(_round_up(mel, self.cfg.mel_pad_to_multiple),
                    self.cfg.max_mel_len)
        return t_pad, m_pad

    def batches(self, batch_size: int, seed: int = 0, shuffle: bool = True,
                drop_last: bool = False, loop: bool = False
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Length-bucketed batch iterator: sort by mel length, slice into
        batches, shuffle batch order — minimizes padding and shape count.

        With ``cfg.num_workers > 0`` and the native library built, batches
        are collated in C++ with the next batch prefetched off-thread."""
        order = sorted(range(len(self)),
                       key=lambda i: self.man.clips[i]["n_frames"])
        chunks = [order[i:i + batch_size]
                  for i in range(0, len(order), batch_size)]
        if drop_last and chunks and len(chunks[-1]) < batch_size:
            chunks = chunks[:-1]
        rng = np.random.default_rng(seed)
        nl = self._native_loader()
        while True:
            idx = rng.permutation(len(chunks)) if shuffle else np.arange(len(chunks))
            for pos, ci in enumerate(idx):
                chunk = chunks[ci]
                if nl is not None:
                    if pos + 1 < len(idx):
                        nl.prefetch(chunks[idx[pos + 1]])
                    t_pad, m_pad = self._bucket_shape_from_manifest(chunk)
                    yield nl.fill_batch(chunk, t_pad, m_pad, self.man.n_mels)
                else:
                    yield self.collate([self[i] for i in chunk])
            if not loop:
                return


class EpochBatcher:
    """Deterministic step -> batch mapping for bit-exact mid-epoch resume.

    The epoch permutation is derived from (seed, epoch), so
    ``batch_at(step)`` returns exactly the batch a fresh run would see at
    that global step — the loader needs NO checkpoint state beyond the step
    counter the trainer already saves (SURVEY.md §6.4; the reference's
    Lightning resume restarts the epoch stream, this is strictly stronger).
    Native C++ prefetch is preserved (next batch enqueued per call)."""

    def __init__(self, ds: "TextMelDataset", batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = False):
        self.ds = ds
        self.seed = seed
        self.shuffle = shuffle
        order = sorted(range(len(ds)),
                       key=lambda i: ds.man.clips[i]["n_frames"])
        self.chunks = [order[i:i + batch_size]
                       for i in range(0, len(order), batch_size)]
        if drop_last and self.chunks and len(self.chunks[-1]) < batch_size:
            self.chunks = self.chunks[:-1]
        self._perm_epoch = -1
        self._perm = None

    def steps_per_epoch(self) -> int:
        return len(self.chunks)

    def _epoch_perm(self, epoch: int) -> np.ndarray:
        if epoch != self._perm_epoch:
            if self.shuffle:
                rng = np.random.default_rng((self.seed, epoch))
                self._perm = rng.permutation(len(self.chunks))
            else:
                self._perm = np.arange(len(self.chunks))
            self._perm_epoch = epoch
        return self._perm

    def _chunk_at(self, step: int) -> List[int]:
        epoch, pos = divmod(step, len(self.chunks))
        return self.chunks[self._epoch_perm(epoch)[pos]]

    def batch_at(self, step: int) -> Dict[str, np.ndarray]:
        chunk = self._chunk_at(step)
        nl = self.ds._native_loader()
        if nl is not None:
            nl.prefetch(self._chunk_at(step + 1))
            t_pad, m_pad = self.ds._bucket_shape_from_manifest(chunk)
            return nl.fill_batch(chunk, t_pad, m_pad, self.ds.man.n_mels)
        return self.ds.collate([self.ds[i] for i in chunk])


class MelAudioDataset:
    """(mel window, audio crop) pairs for vocoder training."""

    def __init__(self, man: Manifest, cfg: DatasetConfig, segment_samples: int,
                 store: Optional[ClipStore] = None):
        self.man = man
        self.cfg = cfg
        self.hop = man.hop_length
        if segment_samples % self.hop != 0:
            raise ValueError("segment length must be a multiple of hop")
        self.segment = segment_samples
        self.frames = segment_samples // self.hop
        self.store = store or ClipStore()
        # only clips long enough for one crop
        self.usable = [c for c in man.clips
                       if c["n_samples"] >= self.segment]
        if not self.usable:
            raise ValueError("no clip long enough for the crop length")

    def _native_loader(self):
        if getattr(self, "_nl", False) is not False:
            return self._nl
        self._nl = None
        if self.cfg.num_workers > 0 and self.usable and \
                str(self.usable[0]["clip"]).endswith(".rclip"):
            try:
                from rtts.data.native_loader import NativeClipLoader, available

                if available():
                    self._nl = NativeClipLoader(
                        [c["clip"] for c in self.usable],
                        n_workers=self.cfg.num_workers)
            except Exception:
                self._nl = None
        return self._nl

    def sample(self, rng: np.random.Generator, batch_size: int
               ) -> Dict[str, np.ndarray]:
        picks = [int(rng.integers(len(self.usable))) for _ in range(batch_size)]
        offsets = []
        for p in picks:
            max_f = self.usable[p]["n_frames"] - self.frames
            offsets.append(int(rng.integers(0, max_f + 1)))
        nl = self._native_loader()
        if nl is not None:
            return nl.fill_crops(picks, offsets, self.frames, self.hop,
                                 self.man.n_mels)
        mels, audios = [], []
        for p, f0 in zip(picks, offsets):
            d = self.store.load(self.usable[p]["clip"])
            mels.append(d["mel"][f0:f0 + self.frames])
            s0 = f0 * self.hop
            audios.append(d["audio"][s0:s0 + self.segment])
        return {"mel": np.stack(mels).astype(np.float32),
                "audio": np.stack(audios).astype(np.float32)}

    def batches(self, batch_size: int, seed: int = 0
                ) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(seed)
        while True:
            yield self.sample(rng, batch_size)
