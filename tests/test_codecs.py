"""Real uncompressed-media codecs: decoded features must match
closed-form values for synthesized signals, and the Spark mapInPandas
paths must carry them end to end."""

from __future__ import annotations

import numpy as np
import pytest

from dsp_spark.operators import codecs
from dsp_spark.operators.multimodal import extract_features, resize_media


def _sine_wav(freq=440, rate=8000, seconds=2.0, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    pcm = (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    return codecs.encode_wav(pcm, rate), pcm


def _gradient_ppm(w=64, h=32):
    x = np.linspace(0, 255, w, dtype=np.uint8)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = x  # red ramp
    img[:, :, 1] = 128  # flat green
    img[:, :, 2] = x[::-1]  # reversed blue ramp
    return codecs.encode_ppm(img), img


def test_wav_roundtrip_features_match_closed_form():
    blob, pcm = _sine_wav()
    m = codecs.decode_wav(blob)
    assert m["sample_rate"] == 8000 and m["n_channels"] == 1
    assert m["n_samples"] == 16000
    assert m["duration_s"] == pytest.approx(2.0)
    # sine RMS = amp/sqrt(2); quantized to int16 so allow 1% slack
    assert m["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    assert m["peak"] == pytest.approx(0.5, rel=0.01)
    # a 440 Hz sine crosses zero 2*440 times/second
    assert m["zero_cross_rate"] == pytest.approx(2 * 440 / 8000, rel=0.01)


def test_wav_stereo_and_chunk_walk():
    t = np.arange(800) / 8000.0
    left = (0.25 * 32767 * np.sin(2 * np.pi * 100 * t)).astype(np.int16)
    stereo = np.stack([left, -left], axis=1)  # cancels to silence in mono
    m = codecs.decode_wav(codecs.encode_wav(stereo, 8000))
    assert m["n_channels"] == 2 and m["n_samples"] == 800
    assert m["rms"] == pytest.approx(0.0, abs=1e-4)


def test_wav_rejects_non_pcm():
    blob, _ = _sine_wav()
    bad = bytearray(blob)
    bad[20] = 3  # audio format = IEEE float
    with pytest.raises(ValueError, match="PCM16"):
        codecs.decode_wav(bytes(bad))


def test_wav_malformed_headers_raise_valueerror_not_crashes():
    """The quarantine contract is ValueError for EVERY malformed blob —
    never ZeroDivisionError or struct.error escaping into the task."""
    blob, _ = _sine_wav()
    zero_ch = bytearray(blob)
    zero_ch[22] = zero_ch[23] = 0  # n_channels = 0
    with pytest.raises(ValueError, match="invalid fmt"):
        codecs.decode_wav(bytes(zero_ch))
    zero_rate = bytearray(blob)
    zero_rate[24:28] = b"\x00\x00\x00\x00"  # sample_rate = 0
    with pytest.raises(ValueError, match="invalid fmt"):
        codecs.decode_wav(bytes(zero_rate))
    # fmt chunk truncated to 8 bytes
    short = (
        blob[:16]
        + (8).to_bytes(4, "little")
        + blob[20:28]
        + blob[36:]
    )
    with pytest.raises(ValueError):
        codecs.decode_wav(short)


def test_ppm_stats_match_image():
    blob, img = _gradient_ppm()
    m = codecs.decode_ppm(blob)
    assert (m["width"], m["height"]) == (64, 32)
    assert m["mean_r"] == pytest.approx(img[:, :, 0].mean())
    assert m["mean_g"] == pytest.approx(128.0)
    assert m["mean_b"] == pytest.approx(img[:, :, 2].mean())


def test_ppm_header_with_comment():
    blob, img = _gradient_ppm(8, 4)
    with_comment = blob.replace(b"P6\n", b"P6\n# made by a test\n", 1)
    assert codecs.decode_ppm(with_comment)["width"] == 8


def test_ppm_resize_exact_nearest_neighbor():
    blob, img = _gradient_ppm(64, 32)
    out = codecs.resize_ppm(blob, 16, 8)
    m = codecs.decode_ppm(out)
    assert (m["width"], m["height"]) == (16, 8)
    ys = ((np.arange(8) * 2 + 1) * 32) // 16
    xs = ((np.arange(16) * 2 + 1) * 64) // 32
    expect = img[ys][:, xs]
    got = np.frombuffer(out, dtype=np.uint8, count=16 * 8 * 3, offset=len(out) - 16 * 8 * 3)
    assert np.array_equal(got.reshape(8, 16, 3), expect)


def test_spark_wav_feature_extraction(spark):
    blob, _ = _sine_wav()
    df = spark.createDataFrame([(1, bytearray(blob))], "id bigint, media binary")
    row = extract_features(
        df, id_col="id", media_col="media", media_type="wav"
    ).collect()[0]
    assert row.media_type == "wav" and row.n_bytes == len(blob)
    assert row.f0 == pytest.approx(2.0)  # duration
    assert row.f1 == pytest.approx(0.5 / np.sqrt(2), rel=0.01)  # rms


def test_spark_ppm_resize_pipeline(spark):
    blob, img = _gradient_ppm()
    df = spark.createDataFrame([(7, bytearray(blob))], "id bigint, media binary")
    out = resize_media(
        df, id_col="id", media_col="media", width=16, height=8, media_type="ppm"
    ).collect()[0]
    assert (out.out_w, out.out_h) == (16, 8)
    m = codecs.decode_ppm(bytes(out.media))
    assert (m["width"], m["height"]) == (16, 8)
