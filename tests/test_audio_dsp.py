"""Log-mel spectrogram DSP (`operators/audio_dsp.py`, round 11):
everything algorithmic, so every stage is pinned against a naive
reference implementation — mel scale closed form, filterbank geometry,
framing, windowed-DFT power (naive O(n²) DFT cross-check), tone
localization, and the fingerprint's invariances."""

from __future__ import annotations

import sys
import wave
from io import BytesIO
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import (  # noqa: E402
    audio_dsp,
    multimodal,
)


def test_mel_scale_closed_form_and_inverse():
    f = np.array([0.0, 700.0, 1000.0, 4000.0])
    m = audio_dsp.hz_to_mel(f)
    assert m[0] == 0.0
    assert abs(m[1] - 2595.0 * np.log10(2.0)) < 1e-12  # f=700 → log10(2)
    back = audio_dsp.mel_to_hz(m)
    assert np.allclose(back, f, atol=1e-9)


def test_filterbank_geometry():
    fb = audio_dsp.mel_filterbank(8, 128, 8000.0)
    assert fb.shape == (8, 65)
    assert (fb >= 0).all() and fb.max() <= 1.0 + 1e-12
    # triangles: each filter has a single contiguous support
    for row in fb:
        nz = np.flatnonzero(row > 0)
        assert len(nz) > 0
        assert (np.diff(nz) == 1).all()
    # coverage: interior bins between the first and last band edge are
    # touched by at least one filter
    support = fb.sum(0)
    assert (support[2:60] > 0).all()
    with pytest.raises(ValueError, match="band edges"):
        audio_dsp.mel_filterbank(8, 128, 8000.0, fmin=5000.0, fmax=4000.0)


def test_frame_signal_shapes_and_values():
    s = np.arange(20.0)
    fr = audio_dsp.frame_signal(s, n_fft=8, hop=4)
    assert fr.shape == (4, 8)
    assert (fr[0] == s[:8]).all()
    assert (fr[1] == s[4:12]).all()
    assert audio_dsp.frame_signal(s[:5], 8, 4).shape == (0, 8)
    with pytest.raises(ValueError):
        audio_dsp.frame_signal(s, 0, 4)


def test_windowed_power_matches_naive_dft():
    rng = np.random.default_rng(1)
    s = rng.standard_normal(64)
    m = audio_dsp.log_mel_spectrogram(
        s, 64.0, n_fft=64, hop=64, n_mels=4, eps=0.0
    )
    # naive reference: explicit DFT sum, same window/filterbank
    w = np.hanning(64)
    x = s * w
    naive = np.array(
        [
            abs(sum(x[n] * np.exp(-2j * np.pi * k * n / 64) for n in range(64)))
            ** 2
            / 64
            for k in range(33)
        ]
    )
    fb = audio_dsp.mel_filterbank(4, 64, 64.0)
    ref = np.log10(fb @ naive)
    assert np.allclose(m[0], ref, atol=1e-9)


def test_pure_tone_lands_in_the_right_mel_band():
    sr, n_fft = 8000.0, 256
    t = np.arange(4096) / sr
    for freq in (300.0, 1500.0, 3500.0):
        tone = np.sin(2 * np.pi * freq * t)
        m = audio_dsp.log_mel_spectrogram(
            tone, sr, n_fft=n_fft, hop=128, n_mels=12
        )
        band_energy = m.mean(0)
        peak = int(band_energy.argmax())
        # expected: a filter with near-max response at the tone bin (a
        # tone can land on the crossover point of two triangles — e.g.
        # 300 Hz splits 0.499/0.501 here — where leakage decides the
        # winner, so any band within 10% of the max response is correct)
        fb = audio_dsp.mel_filterbank(12, n_fft, sr)
        tone_bin = int(round(freq * n_fft / sr))
        resp = fb[:, tone_bin]
        assert resp[peak] >= 0.9 * resp.max(), (freq, peak, resp)


def test_mel_fingerprint_invariances():
    sr = 8000.0
    t = np.arange(4096) / sr
    tone = np.sin(2 * np.pi * 440.0 * t)
    fp = audio_dsp.mel_fingerprint(tone.tolist(), sr, n_mels=8)
    assert len(fp) == 16
    # duration invariance: a CONTINUOUS tone twice as long barely moves
    # the stats (concatenating a clip with itself would seam a phase
    # discontinuity — a real transient, not an invariance failure)
    t2 = np.arange(8192) / sr
    fp2 = audio_dsp.mel_fingerprint(
        np.sin(2 * np.pi * 440.0 * t2).tolist(), sr, n_mels=8
    )
    assert np.allclose(fp, fp2, atol=0.05)
    # stereo mixdown of identical channels == the mono fingerprint
    stereo = np.repeat(tone, 2)
    fps = audio_dsp.mel_fingerprint(
        stereo.tolist(), sr, n_channels=2, n_mels=8
    )
    assert np.allclose(fp, fps, atol=1e-9)
    # an empty clip yields the zero fingerprint, not an error
    assert audio_dsp.mel_fingerprint([], sr, n_mels=8) == [0.0] * 16


def _wav(samples: np.ndarray, sr: int = 8000) -> bytes:
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def test_audio_features_dim6_plus_carries_mel_tail():
    sr = 8000
    t = np.arange(4096) / sr
    payload = _wav(0.5 * np.sin(2 * np.pi * 1000.0 * t), sr)
    base = multimodal.audio_features(payload, dim=5)
    wide = multimodal.audio_features(payload, dim=9)
    assert wide[:5] == base  # tiers are prefix-stable
    assert len(wide) == 9
    assert any(abs(v) > 1e-6 for v in wide[5:])  # mel tail is real signal
    # two different tones produce different mel tails at equal rms tiers
    other = multimodal.audio_features(
        _wav(0.5 * np.sin(2 * np.pi * 300.0 * t), sr), dim=9
    )
    assert other[5:] != wide[5:]
