"""Audio (RIFF/WAVE) + video (frame container) multimodal stages.

The WAV codec is real (pure-numpy PCM16 RIFF writer/parser); the video
container is the minimal length-prefixed frame format whose SAMPLER is
the operator under test (real codecs need external libs, out of this
sandbox). Synthetic square waves make every audio feature closed-form:
RMS of a square wave equals its amplitude exactly, independent of
where the signal is truncated.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opentelemetry_collector_contrib_ray.stages.multimodal import (
    AudioFeatures,
    VideoFrameSampler,
    decode_video,
    decode_wav,
    encode_bmp,
    encode_video,
    encode_wav,
    synth_video_table,
    synth_wav_table,
)


def test_wav_roundtrip_exact():
    pcm = (np.sin(np.arange(1000) / 7.0) * 12000).astype(np.int16)
    buf = encode_wav(pcm, 16000)
    out, rate = decode_wav(buf)
    assert rate == 16000
    assert np.array_equal(out, pcm)


def test_wav_decode_walks_extra_chunks():
    """Chunk-walking decode: an extra LIST chunk between fmt and data
    (common in real encoders) must not break parsing."""
    import struct

    pcm = np.array([100, -100, 200], dtype=np.int16)
    canonical = encode_wav(pcm, 8000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = fmt_chunk + extra + data_chunk
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = decode_wav(buf)
    assert rate == 8000 and np.array_equal(out, pcm)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not a wave file at all....")


def test_wav_stereo_averages_to_mono():
    import struct

    pcm = np.array([100, 300, -100, -300], dtype="<i2")  # L,R,L,R
    data = pcm.tobytes()
    buf = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    out, rate = decode_wav(buf)
    assert np.array_equal(out, np.array([200, -200], dtype=np.int16))


def test_audio_features_square_wave_closed_forms():
    tbl = synth_wav_table(40)
    out = AudioFeatures()(tbl)
    amp = out["amp"].to_numpy(zero_copy_only=False).astype(np.float64)
    half = out["half_period"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = out["n_samples_in"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert out["decoded"].to_numpy(zero_copy_only=False).all()
    assert np.array_equal(out["sample_rate"].to_numpy(zero_copy_only=False),
                          np.full(40, 8000, np.int32))
    assert np.array_equal(out["n_samples"].to_numpy(zero_copy_only=False), n)
    assert np.array_equal(
        out["duration_ms"].to_numpy(zero_copy_only=False), n * 1000 // 8000
    )
    # square wave: RMS == amplitude and peak == amplitude, exactly
    assert np.array_equal(out["rms"].to_numpy(zero_copy_only=False), amp)
    assert np.array_equal(
        out["peak"].to_numpy(zero_copy_only=False).astype(np.float64), amp
    )
    # sign changes at each half-period boundary in [1, n)
    assert np.array_equal(
        out["zero_crossings"].to_numpy(zero_copy_only=False), (n - 1) // half
    )


def test_video_container_roundtrip():
    frames = [b"abc", b"", b"0123456789"]
    assert decode_video(encode_video(frames)) == frames
    with pytest.raises(ValueError):
        decode_video(b"nope")


def test_frame_sampler_decodes_only_sampled_frames():
    tbl = synth_video_table(12)
    out = VideoFrameSampler(every_n=2)(tbl)
    df = out.to_pandas()
    for i in range(12):
        item = df[df["item_id"] == f"vid-{i:06d}"]
        nf = 4 + i % 6
        assert set(item["frame_idx"]) == set(range(0, nf, 2))
        assert (item["n_frames"] == nf).all()
        # frame f: constant green (f*29+i)%256, constant blue f%256
        for _, row in item.iterrows():
            f = int(row["frame_idx"])
            assert row["mean_g"] == (f * 29 + i) % 256
            assert row["mean_b"] == f % 256


def test_audio_video_actor_stage_on_dataset():
    """The stages run as real actor-pool map_batches stages."""
    ds = ray.data.from_arrow(synth_wav_table(32))
    out = ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
    )
    assert out.count() == 32
    vds = ray.data.from_arrow(synth_video_table(8))
    vout = vds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": 3},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 2),
    )
    rows = vout.to_pandas()
    expected = sum(len(range(0, 4 + i % 6, 3)) for i in range(8))
    assert len(rows) == expected
