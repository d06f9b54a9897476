"""Multimodal (image/audio/video) column operators.

Media is carried as opaque ``binary`` columns with typed metadata —
the same stored-not-indexed pattern as the webtext ``html`` column.
The Spark-side plumbing (schemas, Arrow batch shapes, partitioning,
UDF signatures) is real and tested; the *codec* step is stubbed behind
optional imports because image/audio libraries are not available in
this environment: with PIL/soundfile installed the same entry points
decode for real, otherwise a deterministic header-parse fake keeps the
pipeline executable end-to-end (task addendum explicitly allows this).

Layout convention (one row per media object)::

    media_id  long      -- stable identity (e.g. xxhash64(url))
    media_type string   -- 'image' | 'audio' | 'video'
    payload   binary    -- raw bytes
    meta      struct<width:int, height:int, n_frames:int, sample_rate:int>

All operators are single-pass ``mapInPandas``/``pandas_udf`` — no
shuffle; scaling is linear in input splits, identical to framing.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
)

MEDIA_META_DDL = (
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
)

#: deterministic fake payload header: magic | width | height | n_frames
_FAKE_MAGIC = b"CSMM"
_FAKE_HEADER = _struct.Struct(">4sHHH")


def encode_fake_media(width: int, height: int, n_frames: int = 1,
                      body: bytes = b"") -> bytes:
    """Produce a deterministic fake media payload (test/bench helper)."""
    return _FAKE_HEADER.pack(_FAKE_MAGIC, width, height, n_frames) + body


def _decode_one(payload: bytes) -> dict:
    """Decode a payload's structural metadata.

    Real path: PIL for images when importable.  Fallback: parse the
    deterministic fake header; unknown bytes raise ``ValueError`` (the
    caller surfaces them in an ``error`` column rather than failing the
    job — poisoned bytes are a fact of web corpora)."""
    if payload is None:
        raise ValueError("null payload")
    raw = bytes(payload)
    try:  # real decoder, if the environment has one
        from io import BytesIO

        from PIL import Image  # noqa: WPS433 (optional dep)

        with Image.open(BytesIO(raw)) as im:
            return {"width": im.width, "height": im.height, "n_frames": 1}
    except ImportError:
        pass
    except Exception:
        pass  # not an image the real decoder accepts; try the fake header
    if len(raw) >= _FAKE_HEADER.size:
        magic, w, h, nf = _FAKE_HEADER.unpack(raw[: _FAKE_HEADER.size])
        if magic == _FAKE_MAGIC:
            return {"width": int(w), "height": int(h), "n_frames": int(nf)}
    raise ValueError("undecodable media payload")


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach decoded structural metadata: adds ``decoded`` struct and
    ``decode_error`` string (null on success).  One mapInPandas pass."""
    out_ddl = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", decoded struct<width:int,height:int,n_frames:int>"
        + ", decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded, errs = [], []
            for payload in pdf[payload_col]:
                try:
                    decoded.append(_decode_one(payload))
                    errs.append(None)
                except ValueError as e:
                    decoded.append(None)
                    errs.append(str(e))
            pdf = pdf.copy()
            pdf["decoded"] = decoded
            pdf["decode_error"] = errs
            yield pdf

    return df.mapInPandas(run, schema=out_ddl)


def media_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 16
) -> DataFrame:
    """Fixed-dimension feature vector per media object.

    Real systems put a vision/audio encoder here; the stub derives a
    deterministic unit vector from the payload digest, preserving the
    exact UDF contract (binary Series in, fixed-dim float array out,
    Arrow-batched).  Output feeds ops.similarity (cosine/ANN) directly.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def featurize(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            if payload is None:
                out.append(None)
                continue
            digest = hashlib.sha256(bytes(payload)).digest()
            rng = np.random.default_rng(
                np.frombuffer(digest[:8], dtype=np.uint64)
            )
            v = rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            out.append([float(x) for x in v])
        return pd.Series(out)

    return df.withColumn("features", featurize(F.col(payload_col)))


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    frame_bytes: Optional[int] = None,
) -> DataFrame:
    """Explode video payloads into sampled frame rows.

    Stub codec: the fake payload body is a concatenation of
    equal-sized frames (``frame_bytes``); a real build would demux with
    pyav here.  The Spark shape is the real one: one input row fans out
    to ``ceil(n_frames / every_n)`` rows carrying (media_id, frame_no,
    frame_payload), still shuffle-free."""
    fb = frame_bytes or 64
    hdr_size = _FAKE_HEADER.size  # plain int: struct.Struct won't pickle

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                try:
                    meta = _decode_one(raw)
                except ValueError:
                    continue
                body = raw[hdr_size:]
                for i in range(0, meta["n_frames"], every_n):
                    ids.append(media_id)
                    frame_nos.append(i)
                    frames.append(body[i * fb: (i + 1) * fb])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_payload": frames}
            )

    return df.mapInPandas(
        run, schema="media_id long, frame_no int, frame_payload binary"
    )


def resize_metadata(
    df: DataFrame, max_side: int = 512
) -> DataFrame:
    """Compute target resize dimensions (aspect-preserving, JVM-side —
    no UDF needed for pure metadata math)."""
    w = F.col("decoded.width").cast("double")
    h = F.col("decoded.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return df.withColumn(
        "resize_to",
        F.struct(
            F.round(w * scale).cast(IntegerType()).alias("width"),
            F.round(h * scale).cast(IntegerType()).alias("height"),
        ),
    )
