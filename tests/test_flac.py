"""Round-trip tests for the stdlib FLAC decoder (`operators/flac.py`)
against the test-side reference encoder (`tests/flac_ref.py`).  FLAC is
LOSSLESS, so every assertion is exact sample equality — no tolerances.
No Spark session and no audio codec required."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from proyecto_gasto_publico_etl_per__spark.operators import multimodal  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.operators.flac import (  # noqa: E402
    flac_decode,
)
from flac_ref import flac_encode  # noqa: E402


def _tone(n: int, period: int = 37, amp: int = 12000) -> list[int]:
    return [
        int(amp * math.sin(2 * math.pi * i / period)) for i in range(n)
    ]


def _ints(decoded: dict, bps: int = 16) -> list[int]:
    scale = 1 << (bps - 1)
    return [round(x * scale) for x in decoded["samples"]]


def test_verbatim_mono_roundtrip_exact():
    src = _tone(300)
    d = flac_decode(flac_encode([src], block_size=128, mode="verbatim"))
    assert d["sample_rate"] == 8000
    assert d["n_channels"] == 1
    assert _ints(d) == src  # lossless, multi-frame (300 > 128)


def test_constant_subframe():
    src = [-421] * 200
    d = flac_decode(flac_encode([src], mode="constant"))
    assert _ints(d) == src


@pytest.mark.parametrize("mode", ["fixed0", "fixed1", "fixed2", "lpc1"])
def test_predictor_subframes_exact(mode):
    """FIXED orders 0-2 and the trivial LPC (coef [1], shift 0 — the
    LPC decode path with a hand-checkable predictor) all reconstruct
    exactly through Rice-coded residuals."""
    src = _tone(256, period=23)
    d = flac_decode(flac_encode([src], block_size=256, mode=mode))
    assert _ints(d) == src


def test_escape_partition_roundtrip():
    src = [(-1) ** i * (i % 17) for i in range(128)]
    d = flac_decode(
        flac_encode([src], block_size=128, mode="fixed1", escape_raw=12)
    )
    assert _ints(d) == src


def test_wasted_bits_roundtrip():
    src = [x * 4 for x in _tone(128, amp=7000)]  # 2 shared low zero bits
    d = flac_decode(
        flac_encode([src], block_size=128, mode="verbatim", wasted=2)
    )
    assert _ints(d) == src


def test_stereo_independent_and_mid_side_exact():
    left = _tone(200, period=31)
    right = [v // 3 + 100 for v in left]
    plain = flac_decode(
        flac_encode([left, right], block_size=100, stereo="independent")
    )
    ms = flac_decode(
        flac_encode([left, right], block_size=100, stereo="mid_side")
    )
    assert plain["n_channels"] == ms["n_channels"] == 2
    assert _ints(plain) == _ints(ms)  # decorrelation is exact
    # interleaved L,R
    assert _ints(ms)[0::2] == left and _ints(ms)[1::2] == right


def test_decode_audio_dispatches_flac_and_matches_wav():
    """multimodal.decode_audio routes fLaC magic to the stdlib decoder,
    and the result matches the SAME samples decoded through the WAV
    path — two containers, one signal."""
    import io
    import struct
    import wave

    src = _tone(150)
    flac_d = multimodal.decode_audio(flac_encode([src], sample_rate=8000))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack(f"<{len(src)}h", *src))
    wav_d = multimodal.decode_audio(buf.getvalue())
    assert flac_d["sample_rate"] == wav_d["sample_rate"] == 8000
    assert flac_d["samples"] == wav_d["samples"]


def test_malformed_flac_raises():
    with pytest.raises(ValueError):
        flac_decode(b"fLaC")  # truncated metadata
    with pytest.raises(ValueError):
        flac_decode(b"not flac at all")
    good = flac_encode([_tone(64)], block_size=64)
    with pytest.raises(ValueError):
        flac_decode(good[:-20])  # truncated mid-frame


def test_audio_features_on_flac_payload():
    src = _tone(128)
    feats = multimodal.audio_features(flac_encode([src]), dim=5)
    assert feats[0] == 8000.0 and feats[1] == 1.0 and feats[2] == 128.0
    assert 0.0 < feats[3] < 1.0  # rms of a tone
    assert 0.0 < feats[4] < 0.5  # zero-crossing rate


# --- property test: exactness holds across the signal/knob space ------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 400),
    bps=st.sampled_from([8, 12, 16, 20]),
    block_size=st.sampled_from([32, 64, 256]),
    mode=st.sampled_from(
        ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "lpc1"]
    ),
    stereo=st.sampled_from(["mono", "independent", "mid_side"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, bps, block_size, mode, stereo, seed):
    """Lossless means EXACT for every signal: random lengths (including
    a 1-sample stream and non-multiple-of-block sizes), every subframe
    type, 8-20 bps, mono and both stereo layouts."""
    import random

    rng = random.Random(seed)
    # a predictor needs its warmup to fit in the LAST block too (no
    # real encoder picks order >= remaining samples) — degrade tiny
    # tails to verbatim like an encoder's subframe chooser would
    order = {"fixed0": 0, "fixed1": 1, "fixed2": 2, "lpc1": 1}.get(mode, 0)
    if order and (n % block_size or n) and min(
        n % block_size or block_size, n
    ) <= order:
        mode = "verbatim"
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if mode == "constant":
        v = rng.randint(lo, hi)
        chans = [[v] * n]
    else:
        chans = [[rng.randint(lo, hi) for _ in range(n)]]
    if stereo != "mono":
        if mode == "constant":
            chans.append([rng.randint(lo, hi)] * n)
        else:
            chans.append([rng.randint(lo, hi) for _ in range(n)])
    payload = flac_encode(
        chans, bps=bps, block_size=block_size, mode=mode,
        stereo="mid_side" if stereo == "mid_side" else "independent",
    )
    d = flac_decode(payload)
    assert d["n_channels"] == len(chans)
    got = _ints(d, bps)
    expect = [chans[c][i] for i in range(n) for c in range(len(chans))]
    assert got == expect
