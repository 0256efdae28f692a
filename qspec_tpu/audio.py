"""Audio frontend: WAV ingestion + Whisper log-mel spectrograms.

Reference surface: the processor side of Whisper serving
(vllm feeds WhisperFeatureExtractor outputs into models/whisper.py);
zero-egress, so the mel pipeline is implemented here directly —
OpenAI-whisper's exact recipe (n_fft 400, hop 160, Hann window, slaney
mel filterbank, log10 with an 8 dB floor, (x + 4) / 4 scaling).
"""

from __future__ import annotations

import io

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


def read_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> mono float32 waveform at 16 kHz."""
    import wave

    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != SAMPLE_RATE:
        from scipy.signal import resample_poly
        from math import gcd
        g = gcd(sr, SAMPLE_RATE)
        x = resample_poly(x, SAMPLE_RATE // g, sr // g).astype(np.float32)
    return x


def mel_filterbank(n_mels: int, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]
    (librosa.filters.mel equivalent, htk=False)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                       / np.log(6.4) * 27.0, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0
                                                 * (m - 15.0)), f)
        return f

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2),
                                    n_mels + 2))
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, c, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(c - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - c, 1e-9)
        fb[i] = np.maximum(0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)           # slaney area normalization
    return fb


def log_mel_spectrogram(wav: np.ndarray, n_mels: int = 80,
                        max_frames: int | None = None) -> np.ndarray:
    """float32 waveform @16 kHz -> [T, n_mels] log-mel features
    (OpenAI-whisper audio.py semantics; T = len(wav) // HOP)."""
    x = np.asarray(wav, np.float32)
    if max_frames is not None:
        x = x[:max_frames * HOP]
        if x.shape[0] < max_frames * HOP:
            x = np.pad(x, (0, max_frames * HOP - x.shape[0]))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    xp = np.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = 1 + (xp.shape[0] - N_FFT) // HOP
    idx = (np.arange(N_FFT)[None, :]
           + HOP * np.arange(n_frames)[:, None])
    frames = xp[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2   # [T+1, n_fft//2+1]
    spec = spec[:-1]                                    # whisper drops last
    mel = spec @ mel_filterbank(n_mels).T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def wav_to_features(data: bytes, n_mels: int = 80,
                    max_frames: int | None = None) -> np.ndarray:
    return log_mel_spectrogram(read_wav(data), n_mels=n_mels,
                               max_frames=max_frames)
