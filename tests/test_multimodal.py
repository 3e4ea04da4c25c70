"""Multimodal column plumbing tests (crawlspark.multimodal): payload
determinism, fake-decode schema/dtypes, resize bounds, frame sampling,
and the clearly-marked real-codec stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark import multimodal as mm

REFS = [f"full/ref{i:04d}" for i in range(60)]


@pytest.fixture(scope="module")
def media(spark):
    refs = spark.createDataFrame([(r,) for r in REFS], "media_ref string")
    return mm.attach_payloads(refs).cache()


def test_payload_deterministic():
    k1, p1 = mm.synth_payload("full/abc")
    k2, p2 = mm.synth_payload("full/abc")
    assert (k1, p1) == (k2, p2)
    assert p1[:4] == mm.MAGIC
    assert k1 in mm.KINDS


def test_attach_schema_and_kinds(media):
    assert media.schema == mm.MEDIA_SCHEMA
    rows = media.collect()
    assert len(rows) == len(REFS)
    kinds = {r["media_kind"] for r in rows}
    assert kinds <= set(mm.KINDS) and len(kinds) == 3  # all kinds appear
    for r in rows:
        assert r["byte_len"] == len(r["payload"])


def test_decode_meta(media):
    meta = mm.decode_media(media, codec="fake")
    assert meta.schema == mm.META_SCHEMA
    rows = {r["media_ref"]: r for r in meta.collect()}
    assert len(rows) == len(REFS)
    for r in rows.values():
        if r["media_kind"] == "image":
            assert r["format"] == "png" and r["duration_ms"] == 0
            assert r["width"] >= 64 and r["height"] >= 64
        elif r["media_kind"] == "audio":
            assert r["format"] == "wav" and r["width"] == 441
        else:
            assert r["format"] == "mp4" and r["duration_ms"] >= 2000
        assert len(r["checksum"]) == 16


def test_decode_deterministic_across_runs(media):
    a = mm.decode_media(media, codec="fake").orderBy("media_ref").collect()
    b = mm.decode_media(media, codec="fake").orderBy("media_ref").collect()
    assert a == b


def test_real_codec_is_marked_stub(media):
    with pytest.raises(Exception) as ei:
        mm.decode_media(media, codec="real").count()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_resize_bounds(media):
    out = mm.decode_media(mm.resize_images(media, max_side=128), "fake")
    rows = out.collect()
    assert rows and all(r["media_kind"] == "image" for r in rows)
    for r in rows:
        assert max(r["width"], r["height"]) <= 128
        assert min(r["width"], r["height"]) >= 1


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=1000, max_frames=8)
    assert frames.schema == mm.FRAME_SCHEMA
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("media_kind") == "video").count()
    assert set(pdf["media_ref"].unique()) == {
        r["media_ref"] for r in
        media.filter(F.col("media_kind") == "video").collect()}
    g = pdf.groupby("media_ref")["frame_idx"]
    assert (g.min() == 0).all() and (g.max() <= 7).all()
    # dense 0..n-1 per video
    assert all(sorted(v) == list(range(len(v)))
               for v in pdf.groupby("media_ref")["frame_idx"].apply(list))
    assert n_videos == pdf["media_ref"].nunique()
