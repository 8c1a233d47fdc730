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


#: frame-sample output: one row PER SAMPLED FRAME (1→N mapInPandas shape)
FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_len INT, checksum INT"


def frame_sample(
    binary_df: DataFrame, frame_sz: int = 64, every_n: int = 3
) -> DataFrame:
    """Video-style frame sampling over an opaque payload: split into
    fixed-size frames, keep every ``every_n``-th, emit one OUTPUT ROW per
    sampled frame — the 1→N expansion shape a real frame decoder needs
    (mapInPandas yields more rows than it consumes; no driver involvement,
    no explode of a materialized array)."""

    def _sample(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n_frames = (len(raw) + frame_sz - 1) // frame_sz
                for fi in range(0, n_frames, every_n):
                    chunk = raw[fi * frame_sz : (fi + 1) * frame_sz]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    lens.append(len(chunk))
                    sums.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "checksum": pd.Series(sums, dtype="int32"),
                }
            )

    return binary_df.mapInPandas(_sample, schema=FRAME_SCHEMA)


#: resize output: payload replaced by the resized fake raster
RESIZE_SCHEMA = "doc_id BIGINT, width INT, height INT, payload BINARY"


def resize_stub(
    binary_df: DataFrame, width: int = 4, height: int = 4, fake: bool = False
) -> DataFrame:
    """Image-resize stage. Real decode/resample needs PIL/ffmpeg (absent
    in this container — NotImplementedError documents the boundary);
    ``fake=True`` runs a deterministic stand-in (stride subsampling of the
    payload to width·height bytes) so the Spark plumbing — schema, batch
    shape, binary-in/binary-out — is real and tested."""

    def _resize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "run with fake=True for the deterministic test resizer"
                )
            out = []
            for b in pdf["payload"]:
                raw = bytes(b)
                n = width * height
                stride = max(1, len(raw) // n)
                out.append(raw[::stride][:n].ljust(n, b"\x00"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(out), dtype="int32"),
                    "height": pd.Series([height] * len(out), dtype="int32"),
                    "payload": out,
                }
            )

    return binary_df.mapInPandas(_resize, schema=RESIZE_SCHEMA)
