"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side contract — schema convention, batch iteration, partition
sizing — is real and tested, and so is the decode for the formats that
need nothing beyond stdlib + numpy: PNG, BMP, and PPM images and PCM WAV
audio decode natively (operators/media_codecs.py) into a deterministic
grid-luminance / windowed-RMS feature vector. JPEG and other
codec-library formats are gated behind an optional pillow import that
raises a clear ``NotImplementedError`` in this container. ``fake=True``
selects the legacy md5 pseudo-decoder for payloads that are not real
media (e.g. text-derived fixture bytes).

Scale notes: media blobs dominate partition size — repartition so that
``rows_per_partition × avg_blob`` stays under executor memory, and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (the default 10k
batches of multi-MB images would OOM the Python worker).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema fragment: payload + typed metadata
MEDIA_FIELDS = [
    T.StructField("media_type", T.StringType()),  # image|audio|video
    T.StructField("payload", T.BinaryType()),
    T.StructField(
        "meta",
        T.StructType(
            [
                T.StructField("mime", T.StringType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("duration_ms", T.IntegerType()),
            ]
        ),
    ),
]

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture helper: synthesize a deterministic binary payload + metadata
    from a text column so the multimodal path can run on the stock tables."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _pseudo_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: md5 bytes → FEATURE_DIM
    floats in [0, 1). Stable across runs/partitions."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


#: FEATURE_DIM = _GRID**2 cells: features are per-cell mean luminance
_GRID = 4


def image_grid_features(pixels, grid: int = _GRID) -> list[float]:
    """(h, w, c) uint8 array → grid² mean-luminance floats in [0, 1],
    row-major over a grid×grid partition of the image. Deterministic,
    resolution-independent, and cheap enough for Arrow-batch workers."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    # Rec. 601 luma for RGB(A); single-channel images pass through
    if a.shape[2] >= 3:
        luma = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    else:
        luma = a[:, :, 0]
    h, w = luma.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = []
    for gy in range(grid):
        for gx in range(grid):
            cell = luma[ys[gy] : max(ys[gy + 1], ys[gy] + 1),
                        xs[gx] : max(xs[gx + 1], xs[gx] + 1)]
            out.append(float(cell.mean()) / 255.0)
    return out


def audio_rms_features(
    samples, n_windows: int = FEATURE_DIM
) -> list[float]:
    """(n, channels) float samples → RMS energy per equal time window,
    channel-averaged: the standard cheap audio fingerprint."""
    import numpy as np

    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    edges = np.linspace(0, len(mono), n_windows + 1).astype(int)
    return [
        float(np.sqrt(np.mean(np.square(mono[edges[i] : edges[i + 1]]))))
        if edges[i + 1] > edges[i]
        else 0.0
        for i in range(n_windows)
    ]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload to FEATURE_DIM features. PNG/BMP/PPM decode
    natively (media_codecs.py, stdlib+numpy only); JPEG is pillow-gated.
    ``fake=True`` selects the md5 pseudo-decoder for non-media fixture
    bytes."""
    if fake:
        return _pseudo_features(payload)
    from .media_codecs import decode_image_bytes

    return image_grid_features(decode_image_bytes(payload))


def extract_features(
    df: DataFrame, fake: bool = True, batch_rows: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads via
    mapInPandas. The batch iterator shape is the real production contract;
    only the per-payload decode is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # bounded sub-batches keep peak memory at
            # batch_rows × avg_payload even if Arrow hands us more
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                # NULL payloads (missing media) yield NULL features, not
                # a worker crash — one bad row must not kill the batch
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"],
                        "media_type": chunk["media_type"],
                        "payload_bytes": chunk["payload"].map(
                            lambda p: None if p is None else len(p)
                        ),
                        "feature": chunk["payload"].map(
                            lambda p: None
                            if p is None
                            else decode_image(bytes(p), fake=fake)
                        ),
                    }
                )

    # no auto-repartition here: spawning one Python worker per core costs
    # more than the fake decode saves at test scale; real media corpora
    # arrive multi-file (already partitioned), and callers can repartition
    # when a single giant file needs spreading
    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an audio payload to FEATURE_DIM windowed-RMS features. PCM
    WAV decodes natively (stdlib ``wave``); compressed codecs would need
    soundfile/torchaudio. ``fake=True`` selects the md5 pseudo-decoder."""
    if fake:
        return _pseudo_features(payload)
    from .media_codecs import decode_wav, sniff_format

    fmt = sniff_format(payload)
    if fmt != "wav":
        raise ValueError(f"unrecognized audio payload (format={fmt!r})")
    samples, _rate = decode_wav(payload)
    return audio_rms_features(samples)


def sample_frames(
    df: DataFrame, frame_interval_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode each media row
    into (doc_id, frame_idx, frame_ts_ms) rows at ``frame_interval_ms``
    spacing over ``meta.duration_ms``, capped at ``max_frames``. The
    per-frame pixel decode would ride mapInPandas exactly like
    :func:`extract_features`; the explode itself is pure column algebra so
    the frame fan-out (the part that multiplies data volume 30-100x at
    corpus scale) stays JVM-side and partition-parallel."""
    n_frames = F.least(
        F.greatest(
            (F.coalesce(F.col("meta.duration_ms"), F.lit(0))
             / F.lit(frame_interval_ms)).cast("int"),
            F.lit(1),
        ),
        F.lit(max_frames),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            (i * frame_interval_ms).cast("int").alias("frame_ts_ms"),
        ),
    )
    return (
        df.withColumn("__frame", F.explode(frames))
        .select(
            "doc_id",
            "media_type",
            F.col("__frame.frame_idx").alias("frame_idx"),
            F.col("__frame.frame_ts_ms").alias("frame_ts_ms"),
            "payload",
        )
    )


_FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_frame_features(
    df: DataFrame,
    frame_indices: list[int] | None = None,
    batch_rows: int = 64,
) -> DataFrame:
    """REAL per-frame decode for video payloads (concatenated-BMP
    container, media_codecs.split_concatenated_bmps): each sampled frame
    decodes to its grid-luminance feature inside the Arrow batch worker,
    one output row per (doc, frame). ``frame_indices=None`` decodes every
    frame.

    The row fan-out happens *inside* mapInPandas (bounded by
    len(frame_indices) per doc), so partition sizing follows the input
    docs; at corpus scale the caller repartitions by the expected
    decoded volume, exactly like extract_features."""
    from .media_codecs import decode_bmp, split_concatenated_bmps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out_id, out_idx, out_n, out_feat = [], [], [], []
                for doc_id, payload in zip(chunk["doc_id"], chunk["payload"]):
                    if payload is None:
                        continue
                    frames = split_concatenated_bmps(bytes(payload))
                    wanted = (
                        range(len(frames))
                        if frame_indices is None
                        else [i for i in frame_indices if i < len(frames)]
                    )
                    for i in wanted:
                        out_id.append(doc_id)
                        out_idx.append(i)
                        out_n.append(len(frames))
                        out_feat.append(
                            image_grid_features(decode_bmp(frames[i]))
                        )
                # object dtype keeps Arrow's list<float> conversion happy
                # when a chunk produces zero rows (an empty float64 ndarray
                # column is not convertible to a list type)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_id, dtype="int64"),
                        "frame_idx": pd.Series(out_idx, dtype="int32"),
                        "n_frames": pd.Series(out_n, dtype="int32"),
                        "feature": pd.Series(out_feat, dtype="object"),
                    }
                )

    return df.mapInPandas(run, schema=_FRAME_FEATURE_SCHEMA)


def resize_metadata(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Plan a resize: compute target dims preserving aspect ratio — pure
    column math on metadata; the pixel work would ride the same
    mapInPandas path as extract_features."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(max_side) / F.greatest(w, F.lit(1)),
        F.lit(max_side) / F.greatest(h, F.lit(1)),
        F.lit(1.0),
    )
    return df.withColumn(
        "resize_to",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def extract_mp4_frame_features(
    df: DataFrame,
    frame_indices: list[int] | None = None,
    batch_rows: int = 64,
) -> DataFrame:
    """REAL per-frame decode for mp4 payloads: the native ISO-BMFF demux
    (media_codecs.parse_mp4 — box walk + stsc×stco×stsz sample-table
    resolution) locates each sampled frame's byte range, the 'rgb '
    sample format decodes natively, and each frame emits its
    grid-luminance feature. Same output contract and partitioning notes
    as :func:`extract_frame_features` (the concatenated-BMP container);
    compressed-codec tracks (avc1/…) demux identically but raise the
    gated decoder error at pixel time."""
    from .media_codecs import decode_mp4_frame, parse_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out_id, out_idx, out_n, out_feat = [], [], [], []
                for doc_id, payload in zip(chunk["doc_id"], chunk["payload"]):
                    if payload is None:
                        continue
                    raw = bytes(payload)
                    track = parse_mp4(raw)
                    wanted = (
                        range(track.n_samples)
                        if frame_indices is None
                        else [i for i in frame_indices if i < track.n_samples]
                    )
                    for i in wanted:
                        out_id.append(doc_id)
                        out_idx.append(i)
                        out_n.append(track.n_samples)
                        out_feat.append(
                            image_grid_features(decode_mp4_frame(raw, track, i))
                        )
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_id, dtype="int64"),
                        "frame_idx": pd.Series(out_idx, dtype="int32"),
                        "n_frames": pd.Series(out_n, dtype="int32"),
                        "feature": pd.Series(out_feat, dtype="object"),
                    }
                )

    return df.mapInPandas(run, schema=_FRAME_FEATURE_SCHEMA)


def resize_nearest(pixels, target_h: int, target_w: int):
    """REAL nearest-neighbor resize of an (h, w, c) uint8 array — pure
    numpy index arithmetic (the same sample grid PIL's NEAREST uses:
    src_index = floor(dst_index * src / dst)), deterministic on every
    platform. The pixel half of what resize_metadata plans."""
    import numpy as np

    a = np.asarray(pixels)
    h, w = a.shape[:2]
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return a[rows][:, cols]


_RESIZE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_resized_features(
    df: DataFrame,
    target_h: int,
    target_w: int,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode → REAL nearest-neighbor resize → grid features, all inside
    the Arrow batch worker (payloads never leave the executor). Same
    partitioning contract as extract_features."""
    from .media_codecs import decode_image_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out_id, out_feat = [], []
                for doc_id, payload in zip(chunk["doc_id"], chunk["payload"]):
                    if payload is None:
                        continue
                    img = decode_image_bytes(bytes(payload))
                    small = resize_nearest(img, target_h, target_w)
                    out_id.append(doc_id)
                    out_feat.append(image_grid_features(small))
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_id, dtype="int64"),
                        "out_h": pd.Series(
                            [target_h] * len(out_id), dtype="int32"
                        ),
                        "out_w": pd.Series(
                            [target_w] * len(out_id), dtype="int32"
                        ),
                        "feature": pd.Series(out_feat, dtype="object"),
                    }
                )

    return df.mapInPandas(run, schema=_RESIZE_FEATURE_SCHEMA)
