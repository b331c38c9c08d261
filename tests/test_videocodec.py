"""Stdlib Y4M codec + VideoDecodeStage (functions/videocodec.py).

The codec is pure-function; stage tests ride the shared Ray session."""

import numpy as np
import pyarrow as pa
import pytest

from embulk_filter_timestamp_format_ray.functions.videocodec import (
    decode_y4m,
    encode_y4m,
    sniff_y4m_meta,
)


def test_roundtrip_mono():
    frames = np.arange(3 * 4 * 6, dtype=np.uint8).reshape(3, 24)
    payload = encode_y4m(frames, width=6, height=4, fps_num=30, fps_den=1,
                         colorspace="Cmono")
    w, h, fn, fd, cs, y = decode_y4m(payload)
    assert (w, h, fn, fd, cs) == (6, 4, 30, 1, "Cmono")
    assert np.array_equal(y, frames)


def test_roundtrip_420_and_sniff():
    frames = np.full((5, 16 * 8), 77, dtype=np.uint8)
    payload = encode_y4m(frames, width=16, height=8, fps_num=24, fps_den=1,
                         colorspace="C420jpeg")
    w, h, fn, fd, cs, y = decode_y4m(payload)
    assert (w, h, cs, len(y)) == (16, 8, "C420jpeg", 5)
    assert np.array_equal(y, frames)
    assert sniff_y4m_meta(payload) == (16, 8, 24, 1, "C420jpeg", 5)


def test_fractional_fps_and_422():
    frames = np.zeros((2, 10 * 4), dtype=np.uint8)
    payload = encode_y4m(frames, width=10, height=4, fps_num=30000,
                         fps_den=1001, colorspace="C422")
    assert sniff_y4m_meta(payload)[2:4] == (30000, 1001)
    assert decode_y4m(payload)[5].shape == (2, 40)


def test_rejections():
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFFxxxx")
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(np.zeros((1, 15)), width=5, height=3,
                   colorspace="C420jpeg")
    good = encode_y4m(np.zeros((2, 24), np.uint8), width=6, height=4)
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-3])
    interlaced = good.replace(b" Ip ", b" It ", 1)
    with pytest.raises(ValueError, match="interlaced"):
        decode_y4m(interlaced)


def test_video_decode_stage_tiers(ray_session):
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        decode_video,
    )

    y4m = encode_y4m(np.full((4, 8 * 8), 200, np.uint8), width=8, height=8,
                     fps_num=20, fps_den=1)
    t = pa.table({"vid": pa.array([0, 1], pa.int64()),
                  "video_bytes": pa.array([y4m, b"\x00mp4junk"],
                                          pa.binary())})
    out = decode_video(ray.data.from_arrow(t), strict=False,
                       concurrency=(1, 2)).to_pandas().sort_values("vid")
    real = out.iloc[0]
    assert (real["video_format"], real["width"], real["height"],
            real["n_frames"], real["mean_y"]) == ("Y4M", 8, 8, 4, 200)
    assert real["duration_ms"] == 4 * 1000 // 20
    assert out.iloc[1]["video_format"] == "FAKE"
    assert out.iloc[1]["mean_y"] == 0

    with pytest.raises(Exception):  # strict tier refuses non-Y4M payloads
        decode_video(ray.data.from_arrow(t), strict=True,
                     concurrency=(1, 2)).take_all()


def test_frame_sample_real_y4m_tier(ray_session):
    """FrameSampleStage samples every-Nth over the REAL Y4M frame count
    (header-only sniff) and keeps the stub len//1024 rule for other bytes."""
    import ray.data

    from embulk_filter_timestamp_format_ray.stages.multimodal import (
        FrameSampleStage,
    )

    y4m = encode_y4m(np.zeros((10, 4 * 4), np.uint8), width=4, height=4)
    t = pa.table({"vid": pa.array([0, 1], pa.int64()),
                  "video_bytes": pa.array([y4m, b"x" * 4096], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every_n": 4},
        batch_format="pyarrow", concurrency=(1, 1),
    ).to_pandas().sort_values("vid")
    assert list(out.iloc[0]["frame_offsets"]) == [0, 4, 8]   # 10 real frames
    assert list(out.iloc[1]["frame_offsets"]) == [0]         # 4096//1024=4
