"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. The actual media decode is STUBBED: the
container has no image/audio libs, so ``decode_image``/``resample_audio``
raise ``NotImplementedError`` with the production entry point, and the
metadata path uses a deterministic header parse over the real bytes
(length, digest, header-derived dims) so every stage downstream of
decode exercises true data flow.

At 100 TB this layout is the standard one: payloads stay as parquet
binary chunks co-partitioned with their metadata; ``mapInPandas``
streams Arrow batches so one task never holds more than
``maxRecordsPerBatch`` payloads; filters on the typed metadata columns
(media_type, width, n_bytes) push down to the scan without touching
bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                     "sha string, width int, height int, n_frames int")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload column per document
    (the test substrate standing in for real image/audio bytes): a
    12-byte header (magic, width, height, frames as 3-digit ascii
    fields) + the utf-8 text body."""
    width = 100 + F.col("n_chars") % 640
    height = 100 + (F.col("n_chars") * 7) % 480
    frames = 1 + F.col("n_chars") % 4
    header = F.concat(F.lit("IMG"),
                      F.lpad(width.cast("string"), 3, "0"),
                      F.lpad(height.cast("string"), 3, "0"),
                      F.lpad(frames.cast("string"), 3, "0"))
    media_type = F.when(F.col("doc_id") % 3 == 0, "image/png") \
                  .when(F.col("doc_id") % 3 == 1, "audio/wav") \
                  .otherwise("video/mp4")
    # spread by row, not by file layout: the downstream decode UDF is
    # the expensive stage, and document tables arrive as few splits
    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(par, "doc_id").select(
        "doc_id", media_type.alias("media_type"),
        F.encode(F.concat(header, F.col("text")), "utf-8").alias("payload"))


def media_metadata(media: DataFrame) -> DataFrame:
    """Parse typed metadata from the payload bytes with mapInPandas
    (Arrow batches; one output row per input row). This is the shape a
    real decoder plugs into — replace the header parse with
    PIL/libav/ffmpeg calls and keep the schema."""
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int64"),
                "sha": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": payloads.map(
                    lambda b: int(bytes(b)[3:6].decode())).astype("int32"),
                "height": payloads.map(
                    lambda b: int(bytes(b)[6:9].decode())).astype("int32"),
                "n_frames": payloads.map(
                    lambda b: int(bytes(b)[9:12].decode())).astype("int32"),
            })

    return media.mapInPandas(parse, MEDIA_META_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — image decode to pixel arrays. Production: mapInPandas
    over payload bytes with PIL/turbojpeg per Arrow batch, yielding
    (doc_id, y, x, rgb array) or resized thumbnail binary."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; wire PIL.Image.open(io.BytesIO(b)) into the "
        "media_metadata mapInPandas pattern")


def resample_audio(media: DataFrame, rate_hz: int = 16000) -> DataFrame:
    """STUB — audio resample. Production: mapInPandas with soundfile/
    librosa per batch, yielding (doc_id, sample_idx, pcm array)."""
    raise NotImplementedError(
        "audio decode requires an audio library not present in this "
        "container; wire soundfile.read into the media_metadata "
        "mapInPandas pattern")


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling WITHOUT decode: one output row per sampled frame
    index, derived from the typed n_frames metadata — the explode stays
    JVM-side; only the (later, stubbed) per-frame decode would touch
    bytes."""
    meta = media_metadata(media)
    return meta.select(
        "doc_id", "media_type", "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
                  ).alias("frame_idx"))
