from rtts.audio.stft import (
    mel_filterbank,
    stft_magnitude,
    log_mel_spectrogram,
    make_mel_fn,
)
from rtts.audio.wav import read_wav, write_wav
from rtts.audio.resample import resample_poly

__all__ = [
    "mel_filterbank",
    "stft_magnitude",
    "log_mel_spectrogram",
    "make_mel_fn",
    "read_wav",
    "write_wav",
    "resample_poly",
]
