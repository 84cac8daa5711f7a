"""Multimodal (image / audio / video) columns as opaque binary + metadata.

Training-data-pipeline extension beyond the reference's raster tile store
(``RAS/data/AccumuloRasterStore.scala`` keeps serialized image chunks as
values with typed metadata in the key/CQ — the same shape re-expressed as a
DataFrame of ``payload: binary`` + typed metadata columns).

The actual codec step is STUBBED — this container has no imaging/audio
libraries. ``decode_payload`` raises ``NotImplementedError`` unless the
deterministic fake codec is requested; everything around it — schema,
``mapInPandas`` batch iteration, Arrow batch shapes, per-partition streaming
without materializing whole partitions — is real and tested, so swapping in
PIL/libsndfile later touches exactly one function.

Operators:
* :func:`synth_media`        — deterministic fake media table (no external data)
* :func:`media_features`     — payload -> fixed-length float feature vector
  (``mapInPandas``; one numpy pass per Arrow batch)
* :func:`resize_images`      — payload -> payload' + updated (width, height)
* :func:`sample_frames`      — video rows -> one row per sampled frame
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)


def decode_payload(payload: bytes, kind: str, fake: bool = True) -> np.ndarray:
    """Decode one media payload to an ndarray.

    STUB: with ``fake=True`` (default, the only mode usable in this
    container) the "decoded" array is a deterministic function of the bytes;
    with ``fake=False`` this is the seam where a real codec (PIL, soundfile,
    pyav) plugs in.
    """
    if not fake:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "pass fake=True or plug a codec in here"
        )
    a = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    return a.astype(np.float32)


def synth_media(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table derived from the row id (fully distributed,
    no driver materialization, no external data)."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int"))
    # payload: repeat of the id's decimal digits — opaque, deterministic bytes
    payload = F.encode(F.repeat(F.concat(i.cast("string"), F.lit("|")), 64), "UTF-8")
    return df.select(
        i.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (i % 640 + 16).cast("int").alias("width"),
        (i % 480 + 16).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0)).alias("sample_rate"),
        F.when(kind == "video", (i % 120 + 1).cast("int")).otherwise(F.lit(0)).alias("n_frames"),
    )


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-item feature vector: (media_id, kind, feat array<float>).

    ``mapInPandas`` streams Arrow batches; each batch does ONE vectorized
    numpy pass (pad/reshape + fold) — no per-row python beyond the byte
    buffer handoff. At 100 TB this partitions freely: no shuffle, the UDF
    is a map.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                a = decode_payload(payload, kind)
                pad = (-len(a)) % dim
                if pad:
                    a = np.pad(a, (0, pad))
                # accumulate the fold in float64 (exact for byte sums), then
                # round once to float32 — reproducible independent of batch
                # shape, and SQL-oracle-expressible (sum/n then cast)
                feats.append(
                    a.reshape(-1, dim).mean(axis=0, dtype=np.float64).astype(np.float32)
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feat": feats}
            )

    return media.mapInPandas(extract, "media_id long, kind string, feat array<float>")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads (stubbed: deterministic byte fold to w*h bytes);
    non-image rows pass through untouched. Schema preserved."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            resized = []
            for payload in out.loc[is_img, "payload"]:
                a = decode_payload(payload, "image").astype(np.uint8)
                reps = int(np.ceil(target / max(1, len(a))))
                resized.append(np.tile(a, reps)[:target].tobytes())
            out.loc[is_img, "payload"] = pd.Series(resized, index=out.index[is_img], dtype=object)
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            yield out

    return media.mapInPandas(resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video rows -> one row per sampled frame index (frame payload stubbed
    as a deterministic slice). Non-video rows are dropped. The fan-out stays
    executor-side (``mapInPandas`` yields more rows than it consumes)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, nf in zip(vids["media_id"], vids["payload"], vids["n_frames"]):
                a = decode_payload(payload, "video").astype(np.uint8)
                for fi in range(0, int(nf), every_n):
                    lo = (fi * 7) % max(1, len(a) - 8)
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["frame"].append(a[lo : lo + 8].tobytes())
            yield pd.DataFrame(rows)

    return media.mapInPandas(frames, "media_id long, frame_idx int, frame binary")
