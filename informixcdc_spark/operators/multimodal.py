"""Multimodal columns: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column that stays columnar (parquet/Arrow) end to end, with a
typed metadata struct alongside; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so bytes
never round-trip through row-at-a-time Python.

The heavy codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
actual decode step is stubbed: :func:`decode_stub` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces
a deterministic fake feature vector — the Spark-side plumbing (schema,
batch shape, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance

#: metadata schema carried next to every binary payload
META_SCHEMA = "doc_id BIGINT, n_bytes INT, head_checksum INT, kind STRING"

#: feature-extraction output schema (decode stage)
FEATURE_SCHEMA = "doc_id BIGINT, n_bytes INT, feature ARRAY<FLOAT>"


def to_binary_payload(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap a column as an opaque binary payload (here: utf-8 bytes of
    text standing in for image/audio bytes)."""
    return rebalance(df).select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(payload_col), "utf-8").alias("payload"),
    )


def payload_metadata(binary_df: DataFrame) -> DataFrame:
    """Typed metadata from the raw bytes — Arrow-batched mapInPandas
    (this is the real plumbing the stubbed decoders plug into)."""

    def _meta(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(b) for b in payloads],
                    "head_checksum": [sum(b[:4]) for b in payloads],
                    "kind": [
                        "low" if b[:1] and b[:1] <= b"m" else "high" for b in payloads
                    ],
                }
            )

    return binary_df.mapInPandas(_meta, schema=META_SCHEMA)


def decode_stub(
    binary_df: DataFrame, n_features: int = 8, fake: bool = False
) -> DataFrame:
    """The decode/feature-extract stage (image decode, audio resample,
    video frame-sample would slot in here).

    With ``fake=True``: a deterministic per-payload pseudo-feature (byte
    histogram moments), so pipelines are testable without codecs.
    Without: raises, documenting the missing-native-codec boundary.
    """

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) unavailable in this environment; "
                    "run with fake=True for the deterministic test decoder"
                )
            feats, nbytes = [], []
            for b in pdf["payload"]:
                raw = bytes(b)
                nbytes.append(len(raw))
                feats.append(
                    [
                        float(sum(raw[j::n_features]) % 997)
                        for j in range(n_features)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return binary_df.mapInPandas(_decode, schema=FEATURE_SCHEMA)
