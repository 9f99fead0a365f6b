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

__all__ = ["attach_binary_meta", "decode_images", "decode_audio",
           "decode_video", "sample_frames", "resize_images",
           "extract_features", "parse_image_header", "parse_audio_header",
           "parse_video_header",
           "IMAGE_META_SCHEMA", "AUDIO_META_SCHEMA", "VIDEO_META_SCHEMA"]

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])

AUDIO_META_SCHEMA = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
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


# JPEG start-of-frame markers that carry dimensions (C0-CF minus DHT C4,
# JPG C8, DAC CC — the same set every header sniffer uses)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(b: bytes):
    """(width, height, format) from PNG IHDR / JPEG SOFn / GIF headers —
    pure Python, no codec libraries, per the published container formats
    (PNG spec 11.2.2, JPEG ISO 10918-1 B.2.2, GIF89a spec 18)."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"), "png")
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"), "gif")
    if b[:2] == b"\xff\xd8":
        pos = 2
        while pos + 3 < len(b):
            if b[pos] != 0xFF:
                pos += 1  # padding/entropy bytes between segments
                continue
            marker = b[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no payload
                pos += 2
                continue
            seg_len = int.from_bytes(b[pos + 2:pos + 4], "big")
            if marker in _JPEG_SOF and pos + 9 <= len(b):
                return (int.from_bytes(b[pos + 7:pos + 9], "big"),
                        int.from_bytes(b[pos + 5:pos + 7], "big"), "jpeg")
            pos += 2 + seg_len
        return (None, None, "jpeg")
    return (None, None, "unknown")


@verb
def decode_images(tbl: SparkTbl, col: str = "image", decoder: str = "fake",
                  out: str = "decoded"):
    """Decode binary images to (width, height, format, n_bytes) metadata
    via Arrow-batched mapInPandas.

    ``decoder='headers'`` is a REAL decoder: it parses PNG IHDR, JPEG
    SOFn, and GIF logical-screen headers in pure Python over the Arrow
    batches (no codec libraries needed).  ``decoder='fake'`` keeps the
    deterministic hash-derived metadata for plumbing tests;
    ``decoder='real'`` (full pixel decode) needs PIL/opencv, not in this
    container."""
    if decoder == "real":
        raise NotImplementedError(
            "full pixel decoding requires PIL/opencv, not available here; "
            "use decoder='headers' for real dimension extraction or "
            "decoder='fake' for plumbing tests"
        )
    if decoder not in ("fake", "headers"):
        raise ValueError(f"unknown decoder {decoder!r}")
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields) + [T.StructField(out, IMAGE_META_SCHEMA)])

    def batches(it):
        for pdf in it:
            metas = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                if decoder == "headers":
                    w, h, fmt = parse_image_header(b)
                else:
                    w, h = _fake_decode(b)
                    fmt = "fake"
                metas.append({"width": w, "height": h, "format": fmt,
                              "n_bytes": len(b)})
            pdf[out] = metas
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))


def parse_audio_header(b: bytes):
    """(sample_rate, channels, bits_per_sample, n_samples, format) from
    WAV/RIFF fmt+data chunks or a FLAC STREAMINFO block — pure Python per
    the published container formats (RIFF WAVE: MS/IBM 1991 spec; FLAC:
    format spec §STREAMINFO).  Returns Nones + 'unknown' for anything
    else."""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        pos, rate, ch, bits, data_len = 12, None, None, None, None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            clen = int.from_bytes(b[pos + 4:pos + 8], "little")
            if cid == b"fmt " and pos + 24 <= len(b):
                ch = int.from_bytes(b[pos + 10:pos + 12], "little")
                rate = int.from_bytes(b[pos + 12:pos + 16], "little")
                bits = int.from_bytes(b[pos + 22:pos + 24], "little")
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        n = (data_len // (ch * bits // 8)
             if None not in (data_len, ch, bits) and ch and bits else None)
        return rate, ch, bits, n, "wav"
    if b[:4] == b"fLaC" and len(b) >= 26:
        # METADATA_BLOCK_STREAMINFO directly follows the marker: bytes
        # 18-20 hold rate(20b)|channels-1(3b)|bits-1(5b)|total(36b)
        sixty4 = int.from_bytes(b[18:26], "big")
        rate = sixty4 >> 44
        ch = ((sixty4 >> 41) & 0x7) + 1
        bits = ((sixty4 >> 36) & 0x1F) + 1
        n = sixty4 & 0xFFFFFFFFF
        return rate, ch, bits, (n or None), "flac"
    return None, None, None, None, "unknown"


@verb
def decode_audio(tbl: SparkTbl, col: str = "audio", decoder: str = "headers",
                 out: str = "decoded"):
    """Audio metadata via Arrow-batched ``mapInPandas`` — the audio twin of
    ``decode_images``.

    ``decoder='headers'`` is REAL: WAV/RIFF chunk walking and FLAC
    STREAMINFO bit-unpacking in pure Python over the Arrow batches.
    ``decoder='fake'`` derives deterministic metadata from a content hash
    (stable plumbing tests); ``decoder='real'`` (sample decode) needs
    soundfile/ffmpeg, not in this container."""
    if decoder == "real":
        raise NotImplementedError(
            "sample decoding requires soundfile/ffmpeg, not available here; "
            "use decoder='headers' for real header extraction")
    if decoder not in ("fake", "headers"):
        raise ValueError(f"unknown decoder {decoder!r}")
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields)
                              + [T.StructField(out, AUDIO_META_SCHEMA)])

    def batches(it):
        for pdf in it:
            metas = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                if decoder == "headers":
                    rate, ch, bits, n, fmt = parse_audio_header(b)
                else:
                    h = hashlib.sha256(b).digest()
                    rate = [8000, 16000, 22050, 44100][h[0] % 4]
                    ch = h[1] % 2 + 1
                    bits, fmt = 16, "fake"
                    n = int.from_bytes(h[2:5], "big")
                dur = (n / rate) if (n and rate) else None
                metas.append({"sample_rate": rate, "channels": ch,
                              "bits_per_sample": bits, "n_samples": n,
                              "duration_s": dur, "n_bytes": len(b),
                              "format": fmt})
            pdf[out] = metas
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))


VIDEO_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    b[start:end] (size==1 → 64-bit largesize; size==0 → to end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(b[pos:pos + 4], "big")
        btype = b[pos + 4:pos + 8]
        head = 8
        if size == 1 and pos + 16 <= end:
            size = int.from_bytes(b[pos + 8:pos + 16], "big")
            head = 16
        elif size == 0:
            size = end - pos
        if size < head:
            return
        yield btype, pos + head, min(pos + size, end)
        pos += size


def parse_video_header(b: bytes):
    """(width, height, duration_s, n_tracks, format) from an MP4/MOV
    (ISO base media file format) box walk — pure Python per ISO/IEC
    14496-12: ftyp sniff, then moov/mvhd for timescale+duration and each
    trak/tkhd for the 16.16-fixed width/height (video tracks are the ones
    with nonzero dimensions).  Returns Nones + 'unknown' otherwise."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None, None, None, None, "unknown"
    width = height = None
    duration_s = None
    n_tracks = 0
    for btype, s, e in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in _mp4_boxes(b, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                ver = b[cs]
                if ver == 1 and ce - cs >= 32:
                    timescale = int.from_bytes(b[cs + 20:cs + 24], "big")
                    dur = int.from_bytes(b[cs + 24:cs + 32], "big")
                else:
                    timescale = int.from_bytes(b[cs + 12:cs + 16], "big")
                    dur = int.from_bytes(b[cs + 16:cs + 20], "big")
                if timescale:
                    duration_s = dur / timescale
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, ts, te in _mp4_boxes(b, cs, ce):
                    if ttype != b"tkhd":
                        continue
                    ver = b[ts]
                    off = ts + (96 if ver == 1 else 84) - 8
                    if off + 8 <= te:
                        w = int.from_bytes(b[off:off + 4], "big") >> 16
                        h = int.from_bytes(b[off + 4:off + 8], "big") >> 16
                        if w and h:
                            width, height = w, h
    return width, height, duration_s, (n_tracks or None), "mp4"


@verb
def decode_video(tbl: SparkTbl, col: str = "video", decoder: str = "headers",
                 out: str = "decoded"):
    """Video metadata via Arrow-batched ``mapInPandas`` — the video twin
    of ``decode_images``/``decode_audio``.

    ``decoder='headers'`` is REAL: an MP4/MOV box walk (mvhd duration,
    tkhd dimensions) in pure Python over the Arrow batches.
    ``decoder='fake'`` derives deterministic metadata from a content hash;
    ``decoder='real'`` (frame decode) needs ffmpeg, not in this
    container."""
    if decoder == "real":
        raise NotImplementedError(
            "frame decoding requires ffmpeg, not available here; use "
            "decoder='headers' for real container metadata")
    if decoder not in ("fake", "headers"):
        raise ValueError(f"unknown decoder {decoder!r}")
    in_schema = tbl.df.schema
    out_schema = T.StructType(list(in_schema.fields)
                              + [T.StructField(out, VIDEO_META_SCHEMA)])

    def batches(it):
        for pdf in it:
            metas = []
            for payload in pdf[col]:
                b = bytes(payload) if payload is not None else b""
                if decoder == "headers":
                    w, h, dur, n_tracks, fmt = parse_video_header(b)
                else:
                    hh = hashlib.sha256(b).digest()
                    w = [320, 640, 1280, 1920][hh[0] % 4]
                    h = [240, 480, 720, 1080][hh[0] % 4]
                    dur = (hh[1] % 300) + 1.0
                    n_tracks, fmt = 2, "fake"
                metas.append({"width": w, "height": h, "duration_s": dur,
                              "n_tracks": n_tracks, "format": fmt,
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
