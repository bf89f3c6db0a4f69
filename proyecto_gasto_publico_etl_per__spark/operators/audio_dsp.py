"""Audio DSP features for the multimodal ingest lane — pure numpy.

Round 11: a real log-mel spectrogram pipeline (frame → Hann window →
rFFT power → HTK mel filterbank → log10), the footprint audio curation
actually keys on (near-dup audio fingerprints, silence/energy quality
cuts, language/music discrimination features).  Everything here is
ALGORITHMIC — the mel scale is the closed-form HTK formula, the
filterbank triangles are derived from it, the DFT is numpy's — so the
whole path is verifiable in-container against naive reference
implementations (tests/test_audio_dsp.py), unlike codec table data.

Runs per-row inside Arrow batches on executors (the multimodal
convention): framing and the filterbank are vectorized numpy; nothing
here touches the driver.
"""

from __future__ import annotations

import numpy as np


def hz_to_mel(f):
    """HTK mel scale: m = 2595 · log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: float, fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft//2 + 1): filter i
    rises from mel point i to i+1 and falls to i+2, the points equally
    spaced on the mel axis between fmin and fmax (HTK convention,
    unnormalized peaks = 1)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    if not 0 <= fmin < fmax <= sample_rate / 2.0 + 1e-9:
        raise ValueError(f"bad mel band edges [{fmin}, {fmax}]")
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bin_freqs = np.arange(n_bins, dtype=np.float64) * sample_rate / n_fft
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for i in range(n_mels):
        lo, mid, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (bin_freqs - lo) / max(mid - lo, 1e-12)
        down = (hi - bin_freqs) / max(hi - mid, 1e-12)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def frame_signal(
    samples: np.ndarray, n_fft: int, hop: int
) -> np.ndarray:
    """Overlapping frames, shape (n_frames, n_fft); the tail that
    doesn't fill a frame is dropped (no padding — deterministic and
    edge-artifact-free for feature use).  A signal shorter than one
    frame yields zero frames."""
    samples = np.asarray(samples, dtype=np.float64)
    if n_fft <= 0 or hop <= 0:
        raise ValueError("n_fft and hop must be positive")
    n = (len(samples) - n_fft) // hop + 1
    if n <= 0:
        return np.zeros((0, n_fft), dtype=np.float64)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    return samples[idx]


def log_mel_spectrogram(
    samples,
    sample_rate: float,
    n_fft: int = 256,
    hop: int = 128,
    n_mels: int = 16,
    fmin: float = 0.0,
    fmax: float | None = None,
    eps: float = 1e-10,
) -> np.ndarray:
    """Log-mel spectrogram, shape (n_frames, n_mels): Hann-windowed
    rFFT power per frame × mel filterbank, then log10(· + eps).
    Multi-channel input should be mixed down by the caller
    (``decode_audio`` returns interleaved samples; see
    ``mel_fingerprint``)."""
    frames = frame_signal(samples, n_fft, hop)
    if frames.shape[0] == 0:
        return np.zeros((0, n_mels), dtype=np.float64)
    window = np.hanning(n_fft)
    spec = np.fft.rfft(frames * window[None, :], axis=1)
    power = (spec.real**2 + spec.imag**2) / n_fft
    fb = mel_filterbank(n_mels, n_fft, sample_rate, fmin, fmax)
    return np.log10(power @ fb.T + eps)


def mel_fingerprint(
    payload_samples: list[float],
    sample_rate: float,
    n_channels: int = 1,
    n_mels: int = 16,
    n_fft: int = 256,
    hop: int = 128,
) -> list[float]:
    """Fixed-size audio fingerprint for near-dup / quality use: the
    per-mel-band MEAN and STD of the log-mel spectrogram over the whole
    clip (2·n_mels floats, duration-invariant).  Interleaved
    multi-channel input is mixed down to mono first.  Deterministic —
    the embedding-style column the similarity operators consume."""
    s = np.asarray(payload_samples, dtype=np.float64)
    if n_channels > 1 and len(s) >= n_channels:
        s = s[: len(s) - (len(s) % n_channels)]
        s = s.reshape(-1, n_channels).mean(axis=1)
    m = log_mel_spectrogram(
        s, sample_rate, n_fft=n_fft, hop=hop, n_mels=n_mels
    )
    if m.shape[0] == 0:
        return [0.0] * (2 * n_mels)
    return [float(x) for x in np.concatenate([m.mean(0), m.std(0)])]
