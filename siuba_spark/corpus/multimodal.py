"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition-preserving
UDF signatures) is real and tested; the actual media decode is STUBBED —
this container has no image/audio libraries — behind
``decoder="fake"`` (deterministic, hash-derived metadata, so tests have
stable oracle-able output) or ``decoder="real"`` → NotImplementedError.

At scale: binary payloads stay columnar in Arrow batches end-to-end;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory;
decode parallelism == partition count, no shuffle is introduced.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.pipe import verb
from ..plans.tbl import SparkTbl

__all__ = ["attach_binary_meta", "decode_images", "sample_frames",
           "resize_images", "extract_features", "IMAGE_META_SCHEMA"]

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


@verb
def attach_binary_meta(tbl: SparkTbl, col: str, out: str = "meta"):
    """Cheap metadata that needs no decode: byte length + magic-bytes
    format sniff, pure built-ins."""
    c = F.col(col)
    fmt = (F.when(F.hex(F.substring(c, 1, 2)) == "FFD8", "jpeg")
           .when(F.hex(F.substring(c, 1, 4)) == "89504E47", "png")
           .otherwise("unknown"))
    meta = F.struct(F.lit(None).cast("int").alias("width"),
                    F.lit(None).cast("int").alias("height"),
                    fmt.alias("format"),
                    F.length(c).cast("long").alias("n_bytes"))
    return tbl.evolve(df=tbl.df.withColumn(out, meta))


def _fake_decode(payload: bytes):
    """Deterministic fake decode: metadata derived from a content hash."""
    h = hashlib.sha256(payload or b"").digest()
    return int.from_bytes(h[0:2], "big") % 2048 + 1, int.from_bytes(h[2:4], "big") % 2048 + 1


@verb
def decode_images(tbl: SparkTbl, col: str = "image", decoder: str = "fake",
                  out: str = "decoded"):
    """Decode binary images to (width, height, format, n_bytes) metadata
    via Arrow-batched mapInPandas.  ``decoder='real'`` is a stub — no
    imaging libraries in this container."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decoding requires PIL/opencv, not available here; "
            "use decoder='fake' for plumbing tests"
        )
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields) + [T.StructField(out, IMAGE_META_SCHEMA)])

    def batches(it):
        import pandas as pd
        for pdf in it:
            metas = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                w, h = _fake_decode(b)
                metas.append({"width": w, "height": h, "format": "fake",
                              "n_bytes": len(b)})
            pdf[out] = metas
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))


@verb
def sample_frames(tbl: SparkTbl, col: str = "video", every_n: int = 10,
                  out: str = "frames", decoder: str = "fake"):
    """Frame sampling stub: emits deterministic frame descriptors (index +
    hash-derived pseudo-content); real codec path not available here."""
    if decoder == "real":
        raise NotImplementedError("video codecs not available in this container")
    frame_schema = T.ArrayType(T.StructType([
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hash", T.StringType()),
    ]))
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields) + [T.StructField(out, frame_schema)])

    def batches(it):
        for pdf in it:
            frames = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                n = max(1, len(b) // max(every_n, 1))
                frames.append([
                    {"frame_idx": i,
                     "frame_hash": hashlib.md5(b + i.to_bytes(4, "big")).hexdigest()[:12]}
                    for i in range(min(n, 8))
                ])
            pdf[out] = frames
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))


@verb
def resize_images(tbl: SparkTbl, col: str = "image", width: int = 224,
                  height: int = 224, out: str = "resized", decoder: str = "fake"):
    """Resize stub over mapInPandas: emits a deterministic payload of the
    target size derived from the source bytes (``decoder='real'`` needs
    PIL/opencv — not in this container).  The Spark plumbing (binary in,
    binary out, Arrow batches, no shuffle) is the real scale path."""
    if decoder == "real":
        raise NotImplementedError("image resize requires PIL/opencv")
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields) + [T.StructField(out, T.BinaryType())])
    n_bytes = max(1, (width * height) // 64)  # deterministic fake size

    def batches(it):
        for pdf in it:
            payloads = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                seed = hashlib.sha256(b + f"{width}x{height}".encode()).digest()
                payloads.append((seed * (n_bytes // len(seed) + 1))[:n_bytes])
            pdf[out] = payloads
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))


@verb
def extract_features(tbl: SparkTbl, col: str = "image", dim: int = 64,
                     out: str = "embedding", decoder: str = "fake"):
    """Feature extraction stub: binary payload → fixed-dim float embedding
    (hash-derived, deterministic, unit-normalized).  Output plugs straight
    into the similarity operators (`brute_force_topk`, `cosine_near_dups`),
    so the multimodal → dedup pipeline is runnable end to end; swap the
    body for a real model under ``decoder='real'``."""
    if decoder == "real":
        raise NotImplementedError("feature extraction requires a model runtime")
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields)
                              + [T.StructField(out, T.ArrayType(T.FloatType()))])

    def batches(it):
        import math
        for pdf in it:
            vecs = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                raw = []
                h = hashlib.sha256(b).digest()
                while len(raw) < dim:
                    h = hashlib.sha256(h).digest()
                    raw.extend(v / 255.0 - 0.5 for v in h)
                raw = raw[:dim]
                norm = math.sqrt(sum(v * v for v in raw)) or 1.0
                vecs.append([float(v / norm) for v in raw])
            pdf[out] = vecs
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))
