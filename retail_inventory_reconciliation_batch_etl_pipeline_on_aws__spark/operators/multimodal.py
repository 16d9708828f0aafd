"""Multimodal column plumbing (SURVEY.md SS2.11).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; per-item decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so payload bytes never cross a row-at-a-time
Python boundary. The decode step itself is STUBBED (media libs are not
in this container): ``decode_image`` raises, and the query path uses
``extract_binary_features`` -- deterministic byte-level features with the
same schema/partitioning/batch shape the real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor -- what a real image decoder
#: would produce (dims from header parse, features from the model stub).
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, byte_checksum bigint"


def decode_image(payload: bytes) -> "object":
    """Real decoder hook. Media libraries (PIL/ffmpeg) are not available
    in this environment -- clearly-marked stub per the build contract."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg; not available in this "
        "container -- extract_binary_features provides the deterministic "
        "fake used by tests and the oracle"
    )


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of the
    text -- stands in for image/audio bytes loaded from object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_binary_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level 'features' (length, first byte, additive
    checksum mod 2^31) exercise the real plumbing -- binary column in
    Arrow batches, pandas transform, typed struct out -- while the model
    call is stubbed. Swap the body for a real decoder+encoder without
    touching the plan.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_checksum": payloads.map(
                        lambda b: sum(b) % 2147483647
                    ).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, FEATURE_SCHEMA)


#: resize output: payload bytes + the metadata struct a real decoder
#: would parse from the image header
RESIZED_SCHEMA = (
    "doc_id bigint, resized binary, width int, height int, channels int"
)

#: frame sampling output: one row per sampled frame, ordered by index
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_bytes bigint"


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched image resize over binary payloads (decode STUBBED).

    The real body is decode -> resample -> re-encode via PIL; this
    container has no media libs, so the stub emits a deterministic
    fake -- payload truncated/cycled to exactly width*height*3 bytes --
    preserving everything the plan cares about: binary-in/binary-out
    through Arrow batches, typed metadata columns, per-batch (not
    per-row) Python dispatch.
    """
    target = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            fake = payloads.map(
                lambda b: bytes((b * (target // max(len(b), 1) + 1))[:target])
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "resized": fake,
                    "width": width,
                    "height": height,
                    "channels": 3,
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame sampling as a one-to-many Arrow-batched transform
    (decode STUBBED): each payload yields ``n_frames`` evenly-spaced
    'frames' (deterministic byte slices standing in for ffmpeg keyframe
    extraction). The exploded output shape -- one row per (doc, frame),
    stable frame_idx ordering -- is exactly what a downstream embedding
    stage partitions on.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    lo = min(i * step, n - 1)
                    frames.append(bytes(payload[lo : lo + step]))
                    ids.append(doc_id)
                    idxs.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_bytes": pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, FRAME_SCHEMA)
