"""ctypes bindings + lazy build for the native C++ loader/DSP library
(native/rtts_native.cc — SURVEY.md §3.3: first-party equivalent of the
reference's native data-path substrate).

Build: g++ -O2 -shared -fPIC, cached under native/build/ keyed by a source
hash.  Everything degrades gracefully: ``available()`` is False when the
toolchain or build is missing and callers fall back to the pure-Python
path (the datasets check this).
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent.parent / "native" / "rtts_native.cc"
_BUILD_DIR = _SRC.parent / "build"

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build_library() -> Optional[pathlib.Path]:
    if not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so_path = _BUILD_DIR / f"rtts_native_{tag}.so"
    if so_path.exists():
        return so_path
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(_SRC), "-o", str(so_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        global _build_error
        _build_error = getattr(e, "stderr", b"") or str(e)
        return None
    return so_path


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _build_library()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        c = ctypes
        lib.rtts_loader_create.restype = c.c_void_p
        lib.rtts_loader_create.argtypes = [c.POINTER(c.c_char_p), c.c_int,
                                           c.c_int, c.c_int64]
        lib.rtts_loader_destroy.argtypes = [c.c_void_p]
        lib.rtts_loader_prefetch.argtypes = [c.c_void_p,
                                             c.POINTER(c.c_int), c.c_int]
        lib.rtts_loader_fill_batch.restype = c.c_int
        lib.rtts_loader_fill_batch.argtypes = [
            c.c_void_p, c.POINTER(c.c_int), c.c_int, c.c_int, c.c_int,
            c.c_int, c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
            c.POINTER(c.c_float), c.POINTER(c.c_uint8)]
        lib.rtts_loader_fill_crops.restype = c.c_int
        lib.rtts_loader_fill_crops.argtypes = [
            c.c_void_p, c.POINTER(c.c_int), c.POINTER(c.c_int), c.c_int,
            c.c_int, c.c_int, c.c_int, c.POINTER(c.c_float),
            c.POINTER(c.c_float)]
        lib.rtts_wav_read_pcm16.restype = c.c_int64
        lib.rtts_wav_read_pcm16.argtypes = [c.c_char_p,
                                            c.POINTER(c.POINTER(c.c_float)),
                                            c.POINTER(c.c_int)]
        lib.rtts_free.argtypes = [c.c_void_p]
        lib.rtts_resample.restype = c.c_int64
        lib.rtts_resample.argtypes = [c.POINTER(c.c_float), c.c_int64,
                                      c.c_int, c.c_int,
                                      c.POINTER(c.POINTER(c.c_float))]
        lib.rtts_trim_silence.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int, c.c_float, c.c_float,
            c.POINTER(c.c_int64), c.POINTER(c.c_int64)]
        lib.rtts_clip_write.restype = c.c_int
        lib.rtts_clip_write.argtypes = [
            c.c_char_p, c.POINTER(c.c_int32), c.c_int,
            c.POINTER(c.c_float), c.c_int, c.c_int,
            c.POINTER(c.c_float), c.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    return str(_build_error) if _build_error else None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def write_clip(path: str, tokens: np.ndarray, mel: np.ndarray,
               audio: np.ndarray) -> None:
    lib = _load()
    tokens = np.ascontiguousarray(tokens, np.int32)
    mel = np.ascontiguousarray(mel, np.float32)
    audio = np.ascontiguousarray(audio, np.float32)
    if lib is not None:
        rc = lib.rtts_clip_write(
            str(path).encode(), tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(tokens), _fptr(mel), mel.shape[0], mel.shape[1], _fptr(audio),
            len(audio))
        if rc == 0:
            return
    # pure-python fallback, identical byte layout
    import struct

    with open(path, "wb") as f:
        f.write(b"RCLP")
        f.write(struct.pack("<5I", 1, len(tokens), mel.shape[0],
                            mel.shape[1], len(audio)))
        f.write(tokens.tobytes())
        f.write(mel.tobytes())
        f.write(audio.tobytes())


def read_clip(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure-python rclip reader (for the fallback ClipStore path)."""
    import struct

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"RCLP":
            raise ValueError(f"{path}: not an rclip file")
        ver, n_tokens, n_frames, n_mels, n_samples = struct.unpack(
            "<5I", f.read(20))
        if ver != 1:
            raise ValueError(f"{path}: unsupported rclip version {ver}")
        tokens = np.frombuffer(f.read(4 * n_tokens), np.int32)
        mel = np.frombuffer(f.read(4 * n_frames * n_mels),
                            np.float32).reshape(n_frames, n_mels)
        audio = np.frombuffer(f.read(4 * n_samples), np.float32)
    return tokens, mel, audio


def wav_read(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    rate = ctypes.c_int()
    n = lib.rtts_wav_read_pcm16(str(path).encode(), ctypes.byref(out),
                                ctypes.byref(rate))
    if n < 0:
        raise IOError(f"native wav read failed for {path}")
    data = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.rtts_free(out)
    return data, rate.value


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.rtts_resample(_fptr(x), len(x), orig_sr, target_sr,
                          ctypes.byref(out))
    y = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.rtts_free(out)
    return y


def trim_silence(x: np.ndarray, sample_rate: int, threshold_db: float = -40.0,
                 frame_ms: float = 20.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.rtts_trim_silence(_fptr(x), len(x), sample_rate, threshold_db,
                          frame_ms, ctypes.byref(start), ctypes.byref(end))
    return x[start.value:end.value]


class NativeClipLoader:
    """Threaded prefetching clip loader over .rclip files."""

    def __init__(self, paths: Sequence[str], n_workers: int = 4,
                 cache_bytes: int = 1 << 30):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {build_error()}")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths])
        self._handle = lib.rtts_loader_create(arr, len(paths), n_workers,
                                              cache_bytes)
        self._n = len(paths)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.rtts_loader_destroy(self._handle)
            self._handle = None

    def prefetch(self, indices: Sequence[int]) -> None:
        idx = np.ascontiguousarray(indices, np.int32)
        self._lib.rtts_loader_prefetch(self._handle, _iptr(idx), len(idx))

    def fill_batch(self, indices: Sequence[int], t_pad: int, m_pad: int,
                   n_mels: int) -> dict:
        bsz = len(indices)
        idx = np.ascontiguousarray(indices, np.int32)
        tokens = np.empty((bsz, t_pad), np.int32)
        tmask = np.empty((bsz, t_pad), np.uint8)
        mel = np.empty((bsz, m_pad, n_mels), np.float32)
        mmask = np.empty((bsz, m_pad), np.uint8)
        rc = self._lib.rtts_loader_fill_batch(
            self._handle, _iptr(idx), bsz, t_pad, m_pad, n_mels,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _fptr(mel),
            mmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"native batch fill failed (rc={rc})")
        return {"tokens": tokens, "token_mask": tmask.astype(bool),
                "mel": mel, "mel_mask": mmask.astype(bool)}

    def fill_crops(self, indices: Sequence[int], frame_offsets: Sequence[int],
                   frames: int, hop: int, n_mels: int) -> dict:
        bsz = len(indices)
        idx = np.ascontiguousarray(indices, np.int32)
        offs = np.ascontiguousarray(frame_offsets, np.int32)
        mel = np.empty((bsz, frames, n_mels), np.float32)
        audio = np.empty((bsz, frames * hop), np.float32)
        rc = self._lib.rtts_loader_fill_crops(
            self._handle, _iptr(idx), _iptr(offs), bsz, frames, hop, n_mels,
            _fptr(mel), _fptr(audio))
        if rc != 0:
            raise IOError(f"native crop fill failed (rc={rc})")
        return {"mel": mel, "audio": audio}
