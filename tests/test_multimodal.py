"""Multimodal plumbing tests: binary payload columns, typed metadata, and
the Arrow-batched mapInPandas decode / resize / frame-sample / embedding
stages (stubbed codecs, real Spark plumbing)."""

from __future__ import annotations

import zlib

import pytest

from pyspark.sql import functions as F

from nyc_taxi_dataset_analysis_apache_hive_spark.operators import multimodal
from nyc_taxi_dataset_analysis_apache_hive_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def media(docs):
    return multimodal.synth_media_from_docs(docs)


def test_media_schema(media):
    # simpleString compares names+types, ignoring nullability flags
    assert media.schema.simpleString() == multimodal.MEDIA_SCHEMA.simpleString()


def test_catalog_is_deterministic_and_typed(media, docs):
    n = docs.count()
    assert media.count() == n
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == set(multimodal.KINDS)
    # payload is the utf-8 text bytes; meta fields follow the doc_id formula
    row = media.filter(F.col("media_id") == 3).first()
    doc = docs.filter(F.col("doc_id") == 3).first()
    assert bytes(row["payload"]) == doc["text"].encode("utf-8")
    assert row["kind"] == multimodal.KINDS[3 % 3]
    assert row["meta"]["width"] == 64 + (3 % 16) * 32


def test_media_features_match_python_recompute(media):
    feats = {r["media_id"]: r for r in multimodal.media_features(media).collect()}
    sample = media.limit(20).collect()
    assert len(feats) == media.count()
    for row in sample:
        b = bytes(row["payload"])
        f = feats[row["media_id"]]
        assert f["n_bytes"] == len(b)
        assert f["crc32"] == (zlib.crc32(b) & 0xFFFFFFFF)
        assert f["first_byte"] == (b[0] if b else -1)
        assert 0.0 <= f["byte_entropy"] <= 8.0


def test_media_features_preserve_partitioning(media):
    reparted = media.repartition(7)
    out = multimodal.media_features(reparted)
    # mapInPandas is a narrow map: partition count must be preserved
    assert out.rdd.getNumPartitions() == 7
    assert out.count() == media.count()


def test_resize_only_images_exact_size(media):
    w, h = 32, 16
    out = multimodal.resize_images(media, w, h).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert (r["width"], r["height"], r["resized"]) == (w, h, True)
        assert len(bytes(r["payload"])) == w * h


def test_frame_sample_slices_cover_payload(media):
    frames = multimodal.sample_frames(media, n_frames=4)
    by_media: dict[int, list] = {}
    for r in frames.collect():
        by_media.setdefault(r["media_id"], []).append(r)
    videos = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert set(by_media) == set(videos)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
        # slices reassemble the original payload exactly
        assert b"".join(bytes(r["frame_payload"]) for r in rows) == videos[mid]
        assert all(r["n_bytes"] == len(bytes(r["frame_payload"])) for r in rows)


def test_embeddings_stable_and_normalized(media):
    emb1 = {
        r["media_id"]: r["embedding"]
        for r in multimodal.media_embeddings(media.repartition(3), dim=8).collect()
    }
    emb2 = {
        r["media_id"]: r["embedding"]
        for r in multimodal.media_embeddings(media.repartition(11), dim=8).collect()
    }
    assert emb1 == emb2  # partitioning-independent determinism
    v = next(iter(emb1.values()))
    assert len(v) == 8
    assert sum(x * x for x in v) == pytest.approx(1.0, rel=1e-9)


def test_real_codec_path_is_marked_not_implemented(media):
    """Kinds whose library is not importable raise the marked
    integration-point error (every stage is optional-import wired:
    Pillow/image, soundfile/audio, PyAV/video)."""
    if not multimodal.codec_support()["video"]:
        with pytest.raises(Exception, match="codec integration point"):
            multimodal.sample_frames(media, use_real_codecs=True).collect()
    if not multimodal.codec_support()["image"]:
        with pytest.raises(Exception, match="codec integration point"):
            multimodal.media_features(
                media.filter(F.col("kind") == "image"), use_real_codecs=True
            ).collect()


def test_real_codec_contract_all_stages(media):
    """Wiring real codecs must be a drop-in: every Python stage exposes the
    same marked integration point, and flipping the flag cannot change the
    Spark-side plumbing (schema, filtered input kind, batch shape).  The
    raise-assertion is gated per stage on the required library being
    ABSENT -- with Pillow installed the image stages run for real instead
    (covered by the feature tests below)."""
    support = multimodal.codec_support()
    stages = [
        ("image", lambda m, real: multimodal.media_features(m, use_real_codecs=real)),
        ("image", lambda m, real: multimodal.resize_images(m, 8, 8, use_real_codecs=real)),
        ("video", lambda m, real: multimodal.sample_frames(m, 2, use_real_codecs=real)),
    ]
    for needs, stage in stages:
        fake_df = stage(media, False)
        real_df = stage(media, True)
        # plumbing invariant: identical schema either way (analysis-time,
        # no execution needed)
        assert real_df.schema == fake_df.schema
        if support[needs]:
            continue
        # the integration point raises ONE message carrying both the marker
        # and the wiring instructions (single job launch per stage)
        with pytest.raises(Exception, match="codec integration point") as ei:
            real_df.collect()
        assert "mapInPandas plumbing" in str(ei.value)


@pytest.mark.skipif(
    not multimodal.codec_support()["image"], reason="Pillow not installed"
)
def test_real_image_codecs_feature(spark):
    """Runs only where Pillow imports: real PNG payloads decode, resize to
    the requested pixel dims, and feature-extract over DECODED pixel bytes
    (not the compressed container)."""
    import io

    from PIL import Image

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", bytearray(png_bytes(16, 8, (255, 0, 0))), None),
        (2, "image", bytearray(png_bytes(4, 4, (0, 128, 255))), None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    feats = {
        r["media_id"]: r
        for r in multimodal.media_features(media, use_real_codecs=True).collect()
    }
    # solid-color image -> decoded pixel stream has <=3 distinct byte
    # values -> entropy <= log2(3); the PNG container bytes would not
    assert feats[1]["byte_entropy"] <= 1.585
    assert feats[1]["first_byte"] == 255  # first decoded byte: R of red
    assert feats[1]["n_bytes"] == len(bytes(rows[0][2]))  # container fact

    resized = {
        r["media_id"]: r
        for r in multimodal.resize_images(
            media, 6, 5, use_real_codecs=True
        ).collect()
    }
    for mid, r in resized.items():
        with Image.open(io.BytesIO(bytes(r["payload"]))) as img:
            assert img.size == (6, 5)


@pytest.mark.skipif(
    not multimodal.codec_support()["video"], reason="PyAV not installed"
)
def test_real_video_codec_feature(spark):
    """Runs only where PyAV imports: a real encoded container decodes and
    frame-samples to n_frames rgb24 payloads of w*h*3 bytes each."""
    import io

    import av
    import numpy as np

    w, h, total = 8, 6, 10
    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height, stream.pix_fmt = w, h, "yuv420p"
        for i in range(total):
            arr = np.full((h, w, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)

    media = spark.createDataFrame(
        [(1, "video", bytearray(buf.getvalue()), None)], multimodal.MEDIA_SCHEMA
    )
    frames = multimodal.sample_frames(media, n_frames=4, use_real_codecs=True)
    rows = frames.collect()
    assert len(rows) == 4
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    for r in rows:
        assert r["n_bytes"] == w * h * 3  # decoded rgb24, not container bytes


def test_resize_null_payload_propagates_null_dims(spark):
    """NULL-payload image rows follow the stage NULL policy everywhere:
    payload, width, AND height come back NULL with resized=False (r9
    advice finding -- dims used to claim the target size for a resize
    that never happened)."""
    media = multimodal.synth_media_from_docs(
        spark.createDataFrame(
            [(0, None, "en", "src0", None), (3, "hello world", "en", "src0", 11)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    out = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 4).collect()}
    assert set(out) == {0, 3}  # both doc_ids % 3 == 0 -> image kind
    nul, ok = out[0], out[3]
    assert nul["payload"] is None and not nul["resized"]
    assert nul["width"] is None and nul["height"] is None
    assert ok["resized"] and (ok["width"], ok["height"]) == (8, 4)
    assert len(bytes(ok["payload"])) == 32
