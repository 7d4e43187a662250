"""Log-mel spectrogram as a fused XLA computation (matmul-based DFT).

TPU-native replacement for the librosa/torchlibrosa mel frontend that the
reference's CLAP extractor depends on (SURVEY.md §2b; msclap pulls
torchlibrosa, reference requirements.txt). Design: framing is a reshape of a
strided gather, the DFT is two real matmuls against fixed cos/sin bases
(MXU work, no FFT kernel needed at these sizes), and the mel projection is
one more matmul — XLA fuses the whole chain.

The GEMM-native NDFT formulation follows the approach surveyed in MelT
(arXiv:2606.01009): at speech/audio frame sizes, expressing the DFT as dense
matmuls beats FFT kernels on systolic-array accelerators and fuses with the
downstream mel projection.

Conventions follow librosa defaults as used by CLAP/HTSAT: hann window,
centre padding (reflect), power spectrum, Slaney mel filterbank + Slaney
normalisation, log10 dynamic compression (ref=1.0, amin=1e-10, top_db None).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        mels,
    )


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        freqs,
    )


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """(n_mels, n_fft//2+1) float32, librosa-compatible triangular filters."""
    fmax = fmax if fmax is not None else sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def _dft_bases(n_fft: int) -> tuple:
    """Real/imag DFT bases for the positive-frequency half, with the hann
    window folded in: (n_fft, n_bins) each."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)
    k = np.arange(n_bins)
    ang = -2.0 * np.pi * np.outer(t, k) / n_fft
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann, matches librosa
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "n_mels", "fmin", "fmax", "htk"),
)
def log_mel_spectrogram(
    waveform: jax.Array,
    sr: int = 44100,
    n_fft: int = 1024,
    hop_length: int = 320,
    n_mels: int = 64,
    fmin: float = 50.0,
    fmax: float = 14000.0,
    htk: bool = False,
) -> jax.Array:
    """waveform (B, T) float32 -> (B, frames, n_mels) float32 log-mel.

    frames = T // hop_length + 1 (centre-padded, librosa framing).
    """
    if waveform.ndim == 1:
        waveform = waveform[None]
    b, t = waveform.shape
    pad = n_fft // 2
    x = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = t // hop_length + 1

    # Framing WITHOUT a gather (measured 45% of the CLAP encode step as a
    # strided gather on v5e): pad to whole hops, reshape to hop-sized
    # chunks, and build each frame from k = ceil(n_fft/hop) shifted chunk
    # slices — frame f is chunks[f..f+k-1] truncated to n_fft, so the
    # whole (B, frames, n_fft) tensor is slices+concat, which XLA lowers
    # to linear copies instead of 31M random loads.
    k = -(-n_fft // hop_length)  # ceil
    total = (n_frames + k) * hop_length
    x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    chunks = x.reshape(b, n_frames + k, hop_length)
    pieces = []
    for j in range(k):
        width = min(hop_length, n_fft - j * hop_length)
        pieces.append(chunks[:, j : j + n_frames, :width])
    frames = jnp.concatenate(pieces, axis=2)  # (B, frames, n_fft)

    # HIGH (3-pass bf16 ≈ f32) instead of HIGHEST (6-pass): measured 6x
    # cheaper on the ADC matvec for no test-visible accuracy change, and
    # the tower consumes the mel in bf16 anyway.
    cos_b, sin_b = _dft_bases(n_fft)
    re = jnp.einsum(
        "bfn,nk->bfk", frames, jnp.asarray(cos_b),
        precision=jax.lax.Precision.HIGH,
    )
    im = jnp.einsum(
        "bfn,nk->bfk", frames, jnp.asarray(sin_b),
        precision=jax.lax.Precision.HIGH,
    )
    power = re * re + im * im  # (B, frames, n_bins)

    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk))
    mel = jnp.einsum(
        "bfk,mk->bfm", power, fb, precision=jax.lax.Precision.HIGH
    )
    log_mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    return log_mel
