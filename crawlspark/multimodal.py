"""Multimodal (image/audio/video) column plumbing — SURVEY §2.1 O2 scale-out.

The reference stores media via Scrapy's FilesPipeline/ImagesPipeline
[S:scrapy/pipelines/files.py::FilesPipeline, scrapy/pipelines/images.py::
ImagesPipeline]: bodies under ``full/<sha1(url)>.<ext>``, items carry
``{url, path, checksum}``. At 100 TB the Spark-side representation is an
opaque ``binary`` payload column plus TYPED metadata columns, processed in
Arrow-batched ``mapInPandas`` — never per-row Python, never driver-side.

The container has no image/audio codecs (no PIL/ffmpeg), so the *decode*
step is stubbed two ways, clearly marked:

  * ``decode_media(..., codec="real")``  -> raises ``NotImplementedError``
    (the real-cluster path would call PIL/torchaudio/pyav inside the same
    mapInPandas body — batch shape and output schema are identical).
  * ``decode_media(..., codec="fake")``  -> deterministic fake decoder that
    parses the self-describing synthetic payload header (below). This keeps
    the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
    batch shape — real and testable.

Synthetic payload format (deterministic in ``media_ref``, seed-free):
  bytes 0..3   magic  b"CSMM"
  byte  4      kind   0=image 1=audio 2=video
  bytes 5..6   width  (uint16 BE)   | sample-rate/100 for audio
  bytes 7..8   height (uint16 BE)   | channels for audio
  bytes 9..12  duration_ms (uint32 BE, 0 for images)
  bytes 13..   sha256(media_ref) tail (opaque "compressed body")
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MAGIC = b"CSMM"
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("media_kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("byte_len", IntegerType()),
])

META_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("media_kind", StringType()),
    StructField("byte_len", IntegerType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("checksum", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_ms", LongType()),
    StructField("frame_payload", BinaryType()),
])


# ------------------------------------------------------------------ #
# deterministic synthetic payloads (the "opaque binary" column)
# ------------------------------------------------------------------ #
def synth_payload(media_ref: str) -> tuple[str, bytes]:
    """(kind, payload) — pure function of media_ref, no RNG."""
    h = hashlib.sha256(media_ref.encode("utf-8")).digest()
    kind_i = h[0] % 3
    if kind_i == 0:  # image
        w, ht, dur = 64 + h[1] * 8, 64 + h[2] * 8, 0
    elif kind_i == 1:  # audio: width=sr/100, height=channels
        w, ht, dur = 441, 1 + h[2] % 2, 1000 + int.from_bytes(h[3:5], "big")
    else:  # video
        w, ht, dur = 320 + (h[1] % 4) * 160, 240 + (h[2] % 4) * 120, \
            2000 + int.from_bytes(h[3:5], "big") * 4
    body = (h * ((64 + h[6]) // len(h) + 1))[: 64 + h[6]]
    payload = MAGIC + bytes([kind_i]) + struct.pack(">HHI", w, ht, dur) + body
    return KINDS[kind_i], payload


def attach_payloads(refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """media_ref table -> MEDIA_SCHEMA table (binary column materialized
    executor-side in Arrow batches; at 100 TB this is the parquet/Iceberg
    blob-fetch stage, partitioned by hash(media_ref))."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [synth_payload(r) for r in pdf[ref_col]]
            yield pd.DataFrame({
                "media_ref": pdf[ref_col].to_numpy(),
                "media_kind": [k for k, _ in rows],
                "payload": [p for _, p in rows],
                "byte_len": pd.array([len(p) for _, p in rows],
                                     dtype="int32"),
            })
    return refs.repartition(ref_col).mapInPandas(gen, MEDIA_SCHEMA)


# ------------------------------------------------------------------ #
# decode / feature-extract (the stubbed codec boundary)
# ------------------------------------------------------------------ #
def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {k: [] for k in ("format", "width", "height", "duration_ms",
                           "checksum")}
    for payload in pdf["payload"]:
        b = bytes(payload)
        if b[:4] != MAGIC:
            raise ValueError("corrupt synthetic payload")
        w, ht, dur = struct.unpack(">HHI", b[5:13])
        out["format"].append({0: "png", 1: "wav", 2: "mp4"}[b[4]])
        out["width"].append(w)
        out["height"].append(ht)
        out["duration_ms"].append(dur)
        out["checksum"].append(hashlib.sha256(b).hexdigest()[:16])
    res = pdf[["media_ref", "media_kind", "byte_len"]].copy()
    res["format"] = out["format"]
    res["width"] = pd.array(out["width"], dtype="int32")
    res["height"] = pd.array(out["height"], dtype="int32")
    res["duration_ms"] = pd.array(out["duration_ms"], dtype="int64")
    res["checksum"] = out["checksum"]
    return res


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """MEDIA_SCHEMA -> META_SCHEMA via mapInPandas.

    codec="real" is the production path: same signature, same schema, body
    would call PIL.Image.open / soundfile / pyav per Arrow batch. Not
    implementable in this container — STUB, clearly marked.
    """
    if codec == "real":
        def gen_real(batches):
            raise NotImplementedError(
                "real codec path requires PIL/soundfile/pyav (absent in "
                "sandbox); use codec='fake' — identical schema & batching")
            yield  # pragma: no cover
        return media.mapInPandas(gen_real, META_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)
    return media.mapInPandas(gen, META_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: filter kind=image, rewrite header dims to the
    scaled size (fake transform standing in for PIL thumbnail); payload tail
    untouched. Output schema == MEDIA_SCHEMA (closed under composition)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_payloads, lens = [], []
            for payload in pdf["payload"]:
                b = bytearray(bytes(payload))
                w, ht, dur = struct.unpack(">HHI", bytes(b[5:13]))
                scale = min(1.0, max_side / max(w, ht))
                b[5:13] = struct.pack(">HHI", max(1, int(w * scale)),
                                      max(1, int(ht * scale)), dur)
                new_payloads.append(bytes(b))
                lens.append(len(b))
            out = pdf[["media_ref", "media_kind"]].copy()
            out["payload"] = new_payloads
            out["byte_len"] = pd.array(lens, dtype="int32")
            yield out
    return media.filter(F.col("media_kind") == "image") \
        .mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame with
    a deterministic fake frame payload (sha256(ref, idx)); real path would
    pyav-decode inside the same batch loop."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, mss, pays = [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                dur = struct.unpack(">I", b[9:13])[0]
                n = min(max_frames, max(1, dur // every_ms))
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    pays.append(hashlib.sha256(
                        f"{ref}#{i}".encode()).digest())
            yield pd.DataFrame({
                "media_ref": refs,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame_ms": pd.array(mss, dtype="int64"),
                "frame_payload": pays,
            })
    return media.filter(F.col("media_kind") == "video") \
        .mapInPandas(gen, FRAME_SCHEMA)
