"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch shape, partitioning, UDF signatures)
is real and tested; the codec layer supports the deterministic SYNF frame
format natively and STUBS everything else (png/jpeg/audio decoders are not
available in this container) behind either a deterministic fake or
NotImplementedError — exactly the seam where Pillow/ffmpeg would slot in on
a production cluster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import kernels as K

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_N_FEATURES = 16


def decode_frame(data: bytes) -> np.ndarray:
    """Decode a binary media payload to a grayscale uint8 frame.

    SYNF decodes natively; PNG/JPEG are stubbed: real deployments drop a
    Pillow/libjpeg decode here.
    """
    if data[:4] == K.SYNF_MAGIC:
        return K.decode_synf(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n" or data[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "png/jpeg decode requires an image codec not present in this "
            "container; SYNF is the supported deterministic format"
        )
    raise ValueError("unknown media format")


def frame_features(img: np.ndarray, n: int = _N_FEATURES) -> np.ndarray:
    """Deterministic toy feature vector: n horizontal-band mean intensities
    (stands in for a CNN embedding; same signature, same batch shape)."""
    h = img.shape[0]
    bands = np.array_split(np.arange(h), n)
    return np.array([float(img[b].mean()) if len(b) else 0.0 for b in bands], np.float32)


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {c.name: [] for c in MEDIA_META_SCHEMA.fields}
        for ref, blob in zip(pdf["media_ref"], pdf["image"]):
            data = bytes(blob)
            try:
                img = decode_frame(data)
                fmt, w, h = "synf", img.shape[1], img.shape[0]
                feats = frame_features(img).tolist()
            except (NotImplementedError, ValueError):
                fmt, w, h, feats = "unsupported", -1, -1, [0.0] * _N_FEATURES
            out["media_ref"].append(ref)
            out["format"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["n_bytes"].append(len(data))
            out["features"].append(feats)
        yield pd.DataFrame(out)


def media_metadata(media: DataFrame) -> DataFrame:
    """media(media_ref, image binary, …) → typed metadata + features.

    One Arrow crossing, whole table scan-shaped: at 10^12 scale this runs as
    a narrow map stage with no shuffle.
    """
    return media.select("media_ref", "image").mapInPandas(
        _meta_batches, MEDIA_META_SCHEMA
    )


def resize_frames(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decode → bilinear resize → re-encode (SYNF); the standard image
    normalization stage of a multimodal training pipeline."""
    schema = StructType(
        [
            StructField("media_ref", StringType()),
            StructField("image", media.schema["image"].dataType),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, imgs = [], []
            for ref, blob in zip(pdf["media_ref"], pdf["image"]):
                img = decode_frame(bytes(blob))
                imgs.append(K.encode_synf(K.resize_bilinear(img, out_h, out_w)))
                refs.append(ref)
            yield pd.DataFrame({"media_ref": refs, "image": imgs})

    return media.select("media_ref", "image").mapInPandas(fn, schema)
