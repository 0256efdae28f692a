"""Audio frontend parity: our in-process log-mel pipeline vs HF's
WhisperFeatureExtractor (the processor the reference feeds into its
whisper model)."""

import io
import wave as wave_mod

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from qspec_tpu.audio import (log_mel_spectrogram, read_wav,  # noqa: E402
                             wav_to_features)


def _sine_wav(seconds=1.0, hz=440, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    x = (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
    pcm = (x * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue(), x


def test_log_mel_matches_whisper_feature_extractor():
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    want = fe(x, sampling_rate=16000,
              return_tensors="np").input_features[0].T   # [T, 80]
    got = log_mel_spectrogram(x, n_mels=80, max_frames=want.shape[0])
    np.testing.assert_allclose(got, want[:got.shape[0]], atol=2e-3,
                               rtol=1e-3)


def test_wav_roundtrip_and_features():
    data, x = _sine_wav()
    wav = read_wav(data)
    np.testing.assert_allclose(wav, x, atol=1e-3)
    feats = wav_to_features(data, n_mels=16)
    assert feats.shape[1] == 16 and feats.shape[0] == len(x) // 160
    assert np.isfinite(feats).all()
