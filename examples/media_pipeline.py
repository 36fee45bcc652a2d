"""Multimodal training-data pipeline over binary media columns, end to end
with the REAL pure-stdlib codecs (operators/media_codecs.py): sniff + parse
metadata, gate on it, resize images, resample audio, extract numeric
features - all through the Arrow-batched mapInPandas plumbing, no
PIL/ffmpeg.

The blobs here are synthesized PNG/WAV payloads (the containers testdata
tables are text/embeddings); on a real corpus the same code reads a
`binary` column straight from parquet.  Corrupt blobs flow to a dirty-side
DataFrame instead of killing the job - the same side-channel contract the
ingest serializers use.

Run: python examples/media_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.media_codecs import (
    encode_png, encode_wav, media_features, resize_png)
from aliyun_maxcompute_data_collectors_spark.operators.multimodal import (
    decode_media, extract_features, real_media_meta, resample_audio,
    resize_images)
from aliyun_maxcompute_data_collectors_spark.session import get_spark


def synth_blobs(n: int = 60):
    """Deterministic mixed-media corpus: PNGs of varied sizes, WAV tones of
    varied rates, and a few corrupt rows."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            arr = rng.integers(0, 256, size=(16 + i % 24, 20, 3),
                               dtype=np.uint8)
            rows.append((i, "img", bytearray(encode_png(arr))))
        elif kind == 1:
            rate = 16000 if i % 2 else 22050
            t = np.arange(rate // 4) / rate
            tone = (np.sin(2 * np.pi * (100 + i) * t) * 12000).astype(np.int16)
            rows.append((i, "aud", bytearray(encode_wav(tone, rate))))
        else:
            rows.append((i, "bad", bytearray(b"corrupt payload %d" % i)))
    return rows


def main() -> None:
    spark = get_spark("media-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.createDataFrame(synth_blobs(),
                               "id long, hint string, blob binary")

    # 1. decode metadata with the real sniffing parser (mapInPandas)
    staged = decode_media(df, decode_fn=real_media_meta)

    # 2. dirty side channel: unknowns route out, the clean set continues
    dirty = staged.where(F.col("meta.format") == "unknown")
    clean = staged.where(F.col("meta.format") != "unknown")

    # 3. metadata gates stay JVM-side (no decode): drop tiny images
    images = clean.where((F.col("meta.media_type") == "image")
                         & (F.col("meta.width") >= 8)
                         & (F.col("meta.height") >= 8))
    audio = clean.where(F.col("meta.media_type") == "audio")

    # 4. real pixel/DSP transforms through the pluggable mapInPandas hooks
    thumbs = resize_images(images, 8, 8, resize_fn=resize_png)

    resampled = resample_audio(audio, 16000)

    # 5. numeric features for downstream similarity/quality models
    feats = extract_features(clean, feature_fn=media_features)

    n_dirty, n_img, n_aud = dirty.count(), thumbs.count(), resampled.count()
    print(f"dirty={n_dirty} images_resized={n_img} audio_resampled={n_aud}")
    got = feats.where(F.col("features").isNotNull()).count()
    print(f"feature vectors: {got}")
    assert n_dirty == 20 and n_img == 20 and n_aud == 20 and got == 40
    spark.stop()


if __name__ == "__main__":
    main()
