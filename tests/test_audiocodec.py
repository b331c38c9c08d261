"""Stdlib WAV codec (functions/audiocodec.py) + AudioDecodeStage tiers:
real RIFF/WAVE 16-bit PCM decode with exact PCM round trip, header-only
sniffing, deterministic fake tier for unrecognized bytes, strict
refusal."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_filter_timestamp_format_ray.functions.audiocodec import (
    decode_wav,
    encode_wav,
    sniff_wav_meta,
)
from embulk_filter_timestamp_format_ray.stages.multimodal import (
    AudioDecodeStage,
    decode_audio,
)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(5)
    pcm = rng.integers(-32768, 32768, size=(220, 2), dtype=np.int16)
    payload = encode_wav(pcm, 44_100, channels=2)
    rate, ch, nf, out = decode_wav(payload)
    assert (rate, ch, nf) == (44_100, 2, 220)
    assert np.array_equal(out, pcm)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2), st.integers(1, 500), st.integers(8000, 48000),
       st.integers(0, 2**32 - 1))
def test_wav_roundtrip_fuzz(ch, nf, rate, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(nf, ch), dtype=np.int16)
    payload = encode_wav(pcm, rate, channels=ch)
    assert sniff_wav_meta(payload) == (rate, ch, nf)
    r, c, n, out = decode_wav(payload)
    assert (r, c, n) == (rate, ch, nf)
    assert np.array_equal(out, pcm)


def test_sniff_rejects_non_wav():
    assert sniff_wav_meta(None) is None
    assert sniff_wav_meta(b"") is None
    assert sniff_wav_meta(b"RIFFxxxxNOPE") is None
    assert sniff_wav_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32) is None


def test_encode_refuses_ragged_channels():
    with pytest.raises(ValueError, match="not divisible"):
        encode_wav(np.zeros(5, np.int16), 8000, channels=2)


def test_stage_real_and_fake_tiers():
    good = encode_wav(np.full(40, 123, np.int16), 8000, channels=1)
    batch = pa.table({
        "audio_bytes": pa.array([good, b"not audio", None], pa.binary())})
    out = AudioDecodeStage()(batch)
    assert out.column("audio_format").to_pylist() == ["WAV", "FAKE", "FAKE"]
    assert out.column("sample_rate").to_pylist()[0] == 8000
    assert out.column("n_frames").to_pylist()[0] == 40
    assert out.column("duration_ms").to_pylist()[0] == 40 * 1000 // 8000
    assert out.column("mean_abs").to_pylist() == [123, 0, 0]
    # the fake tier is deterministic: same bytes -> same pseudo-metadata
    again = AudioDecodeStage()(batch)
    assert out.equals(again)


def test_stage_strict_refuses_unrecognized():
    batch = pa.table({"audio_bytes": pa.array([b"junk"], pa.binary())})
    with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        AudioDecodeStage(strict=True)(batch)


def test_decode_audio_actor_pool(ray_session):
    import ray.data

    payloads = [encode_wav(np.full((10 + i) * (1 + i % 2), (i * 7) % 2000,
                                   np.int16), 8000 + i * 1000, 1 + i % 2)
                for i in range(6)]
    ds = ray.data.from_arrow(pa.table({
        "idx": pa.array(range(6), pa.int64()),
        "audio_bytes": pa.array(payloads, pa.binary())}))
    out = decode_audio(ds, concurrency=(1, 2), batch_size=2,
                       strict=True).to_pandas().sort_values("idx")
    assert out["audio_format"].tolist() == ["WAV"] * 6
    assert out["sample_rate"].tolist() == [8000 + i * 1000 for i in range(6)]
    assert out["n_channels"].tolist() == [1 + i % 2 for i in range(6)]
    assert out["n_frames"].tolist() == [10 + i for i in range(6)]
    assert out["mean_abs"].tolist() == [(i * 7) % 2000 for i in range(6)]
