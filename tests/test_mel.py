"""Log-mel frontend vs an independent scipy/numpy reference."""

import numpy as np
import pytest
import scipy.signal

from wise_tpu.ops.mel import (
    hz_to_mel,
    log_mel_spectrogram,
    mel_filterbank,
    mel_to_hz,
)


def test_mel_scale_round_trip():
    f = np.array([0.0, 100.0, 440.0, 1000.0, 8000.0, 14000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6)
    np.testing.assert_allclose(
        mel_to_hz(hz_to_mel(f, htk=True), htk=True), f, rtol=1e-6
    )


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(44100, 1024, 64, fmin=50.0, fmax=14000.0)
    assert fb.shape == (64, 513)
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()
    # filters are band-limited: no energy above fmax bin
    freqs = np.linspace(0, 22050, 513)
    dead = freqs > 14001
    assert fb[:, dead].sum() == 0


def test_spectrogram_against_scipy():
    sr, n_fft, hop = 16000, 512, 160
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(sr)).astype(
        np.float32
    )
    out = np.asarray(
        log_mel_spectrogram(
            wav[None], sr=sr, n_fft=n_fft, hop_length=hop, n_mels=64,
            fmin=0.0, fmax=8000.0,
        )
    )[0]
    assert out.shape == (sr // hop + 1, 64)

    # scipy reference: same framing (centre reflect pad, periodic hann)
    window = np.hanning(n_fft + 1)[:-1]
    padded = np.pad(wav, n_fft // 2, mode="reflect")
    n_frames = sr // hop + 1
    ref_power = np.empty((n_frames, n_fft // 2 + 1))
    for i in range(n_frames):
        seg = padded[i * hop : i * hop + n_fft] * window
        spec = np.fft.rfft(seg)
        ref_power[i] = np.abs(spec) ** 2
    fb = mel_filterbank(sr, n_fft, 64, 0.0, 8000.0)
    ref = 10.0 * np.log10(np.maximum(ref_power @ fb.T, 1e-10))
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_peak_frequency_lands_in_right_mel_bin():
    sr = 16000
    t = np.arange(sr) / sr
    for freq in (200.0, 1000.0, 4000.0):
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
        out = np.asarray(
            log_mel_spectrogram(
                wav[None], sr=sr, n_fft=512, hop_length=160, n_mels=64,
                fmin=0.0, fmax=8000.0,
            )
        )[0]
        mean_spec = out.mean(axis=0)
        peak_bin = int(np.argmax(mean_spec))
        # centre frequencies of mel bins
        mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 66)
        centers = mel_to_hz(mel_pts)[1:-1]
        assert abs(centers[peak_bin] - freq) / freq < 0.25


def test_batch_and_jit_stability():
    rng = np.random.default_rng(1)
    wavs = rng.standard_normal((3, 8000)).astype(np.float32)
    a = np.asarray(log_mel_spectrogram(wavs, sr=16000, n_fft=512, hop_length=160))
    b = np.asarray(log_mel_spectrogram(wavs, sr=16000, n_fft=512, hop_length=160))
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] == 3
