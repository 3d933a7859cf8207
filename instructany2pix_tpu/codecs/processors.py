"""Raw-media preprocessors for the codec layer.

  * ImageVAEProcessor — resize/center-crop → [-1,1] array (reference
    vae/image_vqvae.py:465-479; flips are train-time augmentation and
    off by default here).
  * AudioVAEProcessor — waveform → log-mel spectrogram in [-1,1]
    (reference vae/audio_vqvae.py:364-377 + modules/extract_spec.py
    TRANSFORMS). The reference shells out to ffmpeg + librosa; here the
    mel pipeline is pure JAX/numpy STFT so it runs on-device. Audio
    *file decode* still needs an external decoder; pass PCM float
    arrays in.
"""

from __future__ import annotations

import numpy as np


class ImageVAEProcessor:
    def __init__(self, size: int = 256):
        self.size = size

    def __call__(self, image) -> np.ndarray:
        from .image_io import load_image, resize_center_crop

        arr = load_image(image) if isinstance(image, (str, bytes)) else np.asarray(image)
        arr = resize_center_crop(arr, self.size)
        return arr.astype(np.float32) / 127.5 - 1.0


def hann_window(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-style mel filterbank (librosa-compatible shapes)."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3 * f / 200.0
        log_region = f >= 1000
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0), mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    weights = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lower = (fft_freqs - freqs[i]) / max(freqs[i + 1] - freqs[i], 1e-10)
        upper = (freqs[i + 2] - fft_freqs) / max(freqs[i + 2] - freqs[i + 1], 1e-10)
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2 : n_mels + 2] - freqs[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def log_mel_spectrogram(
    wav: np.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
) -> np.ndarray:
    """(T,) waveform → (n_mels, frames) log-mel, matching the SpecVQGAN
    frontend's shape conventions (80 × ~848 for 10 s @22050)."""
    win = hann_window(n_fft)
    pad = n_fft // 2
    wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(wav) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = wav[idx] * win[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # power
    mel = mel_filterbank(sr, n_fft, n_mels) @ spec.T
    return np.log10(np.maximum(mel, 1e-5)).astype(np.float32)


class AudioVAEProcessor:
    """waveform → normalized log-mel in [-1,1] (reference
    vae/audio_vqvae.py:364-377 normalizes specs into [-1,1])."""

    def __init__(self, sample_rate: int = 22050, n_mels: int = 80, duration: float = 9.85):
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.duration = duration

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        target = int(self.sample_rate * self.duration)
        if len(wav) < target:
            wav = np.pad(wav, (0, target - len(wav)))
        wav = wav[:target]
        mel = log_mel_spectrogram(wav, self.sample_rate, n_mels=self.n_mels)
        lo, hi = -5.0, np.log10(np.maximum(mel.max(), 1e-5)) if mel.size else 1.0
        mel = np.clip(mel, lo, None)
        mel = 2.0 * (mel - lo) / max(float(mel.max() - lo), 1e-5) - 1.0
        return mel.astype(np.float32)
