"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction run as Arrow-batched
``mapInPandas`` stages. Image decode has a GUARDED OPTIONAL real path
(Pillow, when importable — ``_pil_image_features``) and always falls
back to deterministic content-hash features for missing libs /
non-image kinds / undecodable bytes, so the Spark-side plumbing —
schema, batching, partitioning — is real and oracle-checkable either
way; audio/video decode would slot into the same fallback shape
(torchaudio/ffmpeg).

Scale notes: binary payloads dominate partition size — callers should
set ``spark.sql.files.maxPartitionBytes`` down (or repartition by count)
so a batch of decoded frames fits executor memory; the mapInPandas
iterator yields per-Arrow-batch, never materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms long"

FEATURE_DIM = 16


def synth_media(df: DataFrame, id_col: str, payload_from: str, kind: str = "image") -> DataFrame:
    """Wrap an existing column's bytes as a media column set (test aid)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(payload_from).cast("string"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _pil_image_features(payload: bytes) -> np.ndarray:
    """Real image decode path, used only when Pillow is importable AND
    the payload is a decodable image: grayscale-resize to a 4x4 grid
    and return the FEATURE_DIM cell intensities in [0, 1]. Raises
    ImportError when PIL is absent, any decode error otherwise — both
    fall back to the content-hash features below."""
    import io

    import PIL.Image  # optional dependency; absent in this container

    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return np.asarray(img, dtype=np.float64).reshape(FEATURE_DIM) / 255.0


def _decode_one(payload: bytes, kind: str) -> np.ndarray:
    """Decoder with a guarded optional real path.

    Images go through Pillow when it is importable and the bytes
    decode (``_pil_image_features``); everything else — PIL missing,
    non-image kinds, undecodable bytes (e.g. the synthetic gate
    fixtures) — uses the deterministic content-hash features: the
    FEATURE_DIM md5 digest bytes scaled to [0, 1], stable across runs
    AND restatable relationally, so the driver oracle checks the
    mapInPandas plumbing end-to-end without media libraries. The gates
    stay green with or without Pillow installed because their
    synthetic payloads are not decodable images.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media kind: {kind}")
    if kind == "image":
        try:
            return _pil_image_features(payload)
        except Exception:  # noqa: BLE001 — ImportError or undecodable bytes
            pass
    digest = __import__("hashlib").md5(payload).digest()
    return np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """media -> (media_id, kind, features array<double>) via mapInPandas.

    The iterator-of-batches shape keeps peak memory to one Arrow batch;
    decode work parallelizes per input partition.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(op, schema="media_id long, kind string, features array<double>")


def resize(media: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Image-resize plan: aspect-preserving fit into (max_w, max_h).

    Target geometry is computed JVM-side from the metadata columns (no
    decode needed to *plan* a resize); the pixel work runs through the
    same mapInPandas stub shape as extract_features — STUBBED here
    (no image libs in this container): the payload passes through
    unchanged and ``resized`` marks rows a real decoder would touch.
    Swap ``_resize_one`` for PIL's ``Image.thumbnail`` in production.
    """
    scale = F.least(
        F.lit(max_w) / F.col("width").cast("double"),
        F.lit(max_h) / F.col("height").cast("double"),
        F.lit(1.0),
    )
    planned = media.where(F.col("kind") == "image").select(
        "media_id",
        "kind",
        "payload",
        "mime",
        "width",
        "height",
        scale.alias("scale"),
        F.greatest(F.floor(F.col("width") * scale).cast("int"), F.lit(1)).alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale).cast("int"), F.lit(1)).alias("out_h"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "kind", "mime", "out_w", "out_h"]].copy()
            # STUB: a real decoder would re-encode at (out_w, out_h);
            # the plumbing (batch shape, passthrough payload) is real
            out["payload"] = pdf["payload"]
            out["resized"] = pdf["scale"] < 1.0
            yield out

    return planned.mapInPandas(
        op,
        schema="media_id long, kind string, mime string, out_w int, out_h int, "
        "payload binary, resized boolean",
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp.

    The *timestamps* are computed JVM-side (sequence/explode); actual
    frame decode would plug into extract_features per sampled row.
    """
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("ts_ms"),
        )
    )


def audio_chunk_plan(
    media: DataFrame, window_ms: int = 2000, hop_ms: int = 1000
) -> DataFrame:
    """Fixed-window audio chunking PLAN from typed metadata alone —
    the audio analog of :func:`resize`'s geometry pass: cut points are
    pure JVM arithmetic over (sample_rate, duration_ms), no decode
    (the container has no audio libs; the byte work would ride the
    same mapInPandas shape as extract_features). Each clip yields
    hop-strided windows ``[k*hop, k*hop + window)`` fully inside its
    duration; clips shorter than one window yield a single clamped
    chunk ``[0, duration)``. Sample indexes are floor(ms * rate /
    1000) — what a slicing decoder would seek to.

    Input columns: media_id, sample_rate (Hz), duration_ms.
    Output: (media_id, chunk_idx, start_ms, end_ms, start_sample,
    end_sample), one row per window — explode(sequence(...)), shuffle-
    free.
    """
    if window_ms <= 0 or hop_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")
    # clips with non-positive duration yield NO chunks (a degenerate
    # inverted [0, -n) window would hand negative sample indexes to a
    # downstream slicing decoder with no signal anything was wrong)
    media = media.where(F.col("duration_ms") > 0)
    dur = F.col("duration_ms").cast("long")
    n_chunks = (
        F.when(dur >= window_ms, F.floor((dur - window_ms) / hop_ms) + 1)
        .otherwise(F.lit(1))
        .cast("long")
    )
    start = F.col("chunk_idx") * hop_ms
    end = F.least(start + window_ms, F.col("duration_ms").cast("long"))
    sr = F.col("sample_rate").cast("long")
    return (
        media.select(
            "media_id",
            "sample_rate",
            "duration_ms",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "chunk_idx",
            start.alias("start_ms"),
            end.alias("end_ms"),
            F.floor(start * sr / 1000).cast("long").alias("start_sample"),
            F.floor(end * sr / 1000).cast("long").alias("end_sample"),
        )
    )
