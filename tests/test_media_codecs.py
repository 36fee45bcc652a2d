"""Pure-stdlib media codecs (operators/media_codecs.py): PNG round-trips
through every filter type, WAV PCM round-trips, header parsers for the
five sniffable formats, and the real decoder through the Spark
mapInPandas path."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import (
    decode_png_pixels,
    decode_wav_samples,
    encode_png,
    encode_wav,
    parse_bmp_meta,
    parse_gif_meta,
    parse_jpeg_meta,
    parse_png_meta,
    parse_wav_meta,
    sniff_media_meta,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(channels, filter_type):
    arr = RNG.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    payload = encode_png(arr, filter_type=filter_type)
    meta = parse_png_meta(payload)
    assert (meta["width"], meta["height"]) == (17, 13)
    out = decode_png_pixels(payload)
    assert out.shape == (13, 17, channels)
    assert np.array_equal(out, arr)


def test_png_gradient_compresses_and_roundtrips():
    # smooth data exercises the filters as they're used in practice
    y, x = np.mgrid[0:32, 0:48]
    arr = np.stack([(x * 5) % 256, (y * 7) % 256, (x + y) % 256],
                   axis=-1).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png_pixels(encode_png(arr, ft)), arr)


def test_png_rejects_unsupported():
    arr = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    p = bytearray(encode_png(arr))
    p[24] = 16  # bit depth
    with pytest.raises(ValueError, match="8-bit"):
        decode_png_pixels(bytes(p))
    with pytest.raises(ValueError, match="not a PNG"):
        parse_png_meta(b"\x89PNX" + b"\x00" * 40)


def test_wav_roundtrip_stereo():
    samples = RNG.integers(-32768, 32767, size=(4410, 2), dtype=np.int16)
    payload = encode_wav(samples, 44100)
    meta = parse_wav_meta(payload)
    assert meta["sample_rate"] == 44100
    assert meta["n_frames"] == 4410
    assert meta["duration_ms"] == 100
    out, rate = decode_wav_samples(payload)
    assert rate == 44100
    assert np.array_equal(out, samples)


def test_wav_8bit_decode():
    # 8-bit PCM is stored unsigned; decoder recenters at 0
    raw = np.array([0, 128, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 3) + raw.tobytes() + b"\x00")
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav_samples(payload)
    assert rate == 8000
    assert out.ravel().tolist() == [-128, 0, 127]


def _mini_jpeg(w, h):
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 8 + 3, 8, h, w, 1)
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" \
        + sof + b"\xff\xd9"


def test_header_parsers_and_sniff():
    jpeg = _mini_jpeg(640, 480)
    assert parse_jpeg_meta(jpeg)["width"] == 640
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert parse_gif_meta(gif) == sniff_media_meta(gif)
    assert parse_gif_meta(gif)["height"] == 200
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 8
    m = parse_bmp_meta(bmp)
    assert (m["width"], m["height"]) == (100, 50)  # top-down abs()
    # sniff dispatches each format and never raises on garbage
    png = encode_png(np.zeros((2, 2), dtype=np.uint8))
    wav = encode_wav(np.zeros(8, dtype=np.int16), 16000)
    assert sniff_media_meta(png)["format"] == "png"
    assert sniff_media_meta(jpeg)["format"] == "jpeg"
    assert sniff_media_meta(wav)["format"] == "wav"
    assert sniff_media_meta(b"\x00garbage")["format"] == "unknown"
    assert sniff_media_meta(b"\xff\xd8\xff\xd9")["format"] == "unknown"
    assert sniff_media_meta(None)["format"] == "unknown"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 2, 3, 4]),
       st.sampled_from([0, 1, 2, 3, 4]), st.integers(0, 2**32 - 1))
def test_property_png_roundtrip(h, w, ch, filter_type, seed):
    """ANY 8-bit image round-trips through every filter type, including
    1-pixel edges where the left/up neighbors are all zero."""
    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch), dtype=np.uint8)
    assert np.array_equal(
        decode_png_pixels(encode_png(arr, filter_type)), arr)


def test_resize_png_nearest_and_bilinear():
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import resize_png

    # 2x nearest upscale replicates pixels exactly
    arr = RNG.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    up = decode_png_pixels(resize_png(encode_png(arr), 14, 10))
    assert up.shape == (10, 14, 3)
    assert np.array_equal(up, np.repeat(np.repeat(arr, 2, 0), 2, 1))
    # constant image stays constant under bilinear
    flat = np.full((9, 9, 1), 77, dtype=np.uint8)
    bi = decode_png_pixels(resize_png(encode_png(flat), 4, 13, "bilinear"))
    assert bi.shape == (13, 4, 1) and (bi == 77).all()
    with pytest.raises(ValueError, match="nearest|bilinear"):
        resize_png(encode_png(flat), 2, 2, "bicubic")


def test_real_resize_through_spark(spark):
    """decode_media + resize_images with the REAL codecs: blobs come out as
    valid PNGs at the target size and meta reflects the new dimensions."""
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import resize_png
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
        decode_media, real_media_meta, resize_images)

    arrs = {i: RNG.integers(0, 256, size=(6 + i, 9, 3), dtype=np.uint8)
            for i in range(3)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in arrs.items()],
        "id long, blob binary")
    staged = decode_media(df, decode_fn=real_media_meta)
    out = resize_images(staged, 4, 3, resize_fn=resize_png).collect()
    for r in out:
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 3
        decoded = decode_png_pixels(bytes(r["blob"]))
        assert decoded.shape == (3, 4, 3)


def test_resample_wav_linear():
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import resample_wav

    # a 100 Hz sine resampled 16k -> 8k keeps its duration and frequency
    t = np.arange(16000) / 16000.0
    sine = (np.sin(2 * np.pi * 100 * t) * 20000).astype(np.int16)
    payload = encode_wav(sine, 16000)
    out = resample_wav(payload, 8000)
    meta = parse_wav_meta(out)
    assert meta["sample_rate"] == 8000
    assert meta["duration_ms"] == 1000
    samples, rate = decode_wav_samples(out)
    # the resampled sine still crosses zero ~200 times/second
    x = samples.ravel().astype(np.int64)
    zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
    assert 195 <= zc <= 205
    # same-rate input passes through byte-identical
    assert resample_wav(payload, 16000) == payload


def test_wav_features_sine():
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import wav_features

    t = np.arange(16000) / 16000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 16384).astype(np.int16)
    rms, zcr, centroid, rolloff, peak, dur, rate, silence = \
        wav_features(encode_wav(sine, 16000))
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01   # amplitude 0.5 sine
    assert abs(zcr - 880 / 16000) < 0.005       # 2 crossings per cycle
    assert abs(centroid - 440) < 5              # pure tone centroid
    assert 430 <= rolloff <= 460
    assert dur == 1.0 and rate == 16000.0 and silence < 0.01
    # silence is silent
    silent = wav_features(encode_wav(np.zeros(1000, np.int16), 8000))
    assert silent[0] == 0.0 and silent[7] == 1.0


def test_png_features_statistics():
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import (
        media_features, png_features)

    flat = np.full((10, 20, 3), 128, dtype=np.uint8)
    f = png_features(encode_png(flat))
    assert abs(f[0] - 128 / 255) < 0.01  # brightness
    assert f[1] == 0.0 and f[2] == 0.0   # no contrast, no edges
    assert f[3] == 0.0                   # single-bin entropy
    assert f[4] == 2.0                   # aspect 20/10
    # checkerboard maximizes edge density, noise maximizes entropy
    cb = (np.indices((8, 8)).sum(axis=0) % 2 * 255).astype(np.uint8)
    fcb = png_features(encode_png(cb))
    assert fcb[2] > 0.9 and abs(fcb[3] - 1.0) < 0.05
    # dispatch: PNG vs WAV vs garbage
    assert media_features(encode_png(flat)) == f
    assert len(media_features(encode_wav(np.zeros(100, np.int16), 8000))) == 8
    assert media_features(b"garbage bytes") is None


def test_real_features_through_spark(spark):
    """extract_features with the real DSP/image hook: fixed-width vectors
    for decodable blobs, NULL for garbage."""
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import media_features
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import extract_features

    t = np.arange(8000) / 8000.0
    rows = [
        (1, bytearray(encode_png(RNG.integers(0, 256, (8, 8, 3),
                                              dtype=np.uint8)))),
        (2, bytearray(encode_wav((np.sin(2 * np.pi * 200 * t) * 10000)
                                 .astype(np.int16), 8000))),
        (3, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r["id"]: r["features"]
           for r in extract_features(df, feature_fn=media_features).collect()}
    assert len(out[1]) == 8 and len(out[2]) == 8
    assert abs(out[2][2] - 200) < 5  # spectral centroid of the 200 Hz tone
    assert out[3] is None


def test_resample_audio_through_spark(spark):
    """resample_audio: audio rows transform with meta updated, non-audio
    rows pass through byte-identical."""
    from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import decode_wav_samples
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
        decode_media, real_media_meta, resample_audio)

    wav = encode_wav(np.zeros(22050, dtype=np.int16), 22050)
    png = encode_png(np.zeros((4, 4), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(png))], "id long, blob binary")
    out = {r["id"]: r for r in
           resample_audio(decode_media(df, decode_fn=real_media_meta),
                          16000).collect()}
    assert out[1]["meta"]["sample_rate"] == 16000
    assert out[1]["meta"]["n_frames"] == 16000
    samples, rate = decode_wav_samples(bytes(out[1]["blob"]))
    assert rate == 16000 and len(samples) == 16000
    assert bytes(out[2]["blob"]) == png  # image untouched


def test_media_pipeline_example(spark):
    """The end-to-end multimodal example runs green with the real codecs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "media_pipeline",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "media_pipeline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = mod.synth_blobs(30)
    assert len(rows) == 30  # the example's main() asserts its own counts


def test_real_decoder_through_spark(spark):
    """The real sniffing decoder runs through the same mapInPandas path as
    the fakes: mixed-format blobs, one corrupt, all classified."""
    from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
        decode_media, real_media_meta)

    blobs = [
        (1, bytearray(encode_png(RNG.integers(0, 256, (8, 6, 3),
                                              dtype=np.uint8)))),
        (2, bytearray(encode_wav(np.zeros(1600, dtype=np.int16), 16000))),
        (3, bytearray(_mini_jpeg(32, 16))),
        (4, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(blobs, "id long, blob binary")
    out = {r["id"]: r["meta"].asDict()
           for r in decode_media(df, decode_fn=real_media_meta).collect()}
    assert out[1]["format"] == "png" and out[1]["width"] == 6
    assert out[2]["format"] == "wav" and out[2]["duration_ms"] == 100
    assert out[3]["format"] == "jpeg" and out[3]["height"] == 16
    assert out[4]["format"] == "unknown"
