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
