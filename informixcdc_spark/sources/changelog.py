"""Change-log directory source/sink.

The reference pumps its byte stream from a smart-large-object channel
(``ifx_lo_read``, ``ext/_informixcdcmodule.ec:2339-2341``) and tests by
replaying a recorded capture file (``:176-199``). Our transport is an
append-only directory of parquet files with the changelog schema —
``spark.read`` for batch, ``spark.readStream`` for streaming, with
``maxFilesPerTrigger`` as the deterministic-replay knob (one file ≙ one
server message batch; the reference's ``max_records`` analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from informixcdc_spark.cdc.model import changelog_schema


def write_changelog(df: DataFrame, path: str, n_files: int = 1, mode: str = "append") -> None:
    """Append a changelog batch as ``n_files`` parquet files (each file is
    an atomically-visible arrival unit for the streaming reader)."""
    df.coalesce(n_files).write.mode(mode).parquet(path)


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    row_struct: StructType,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming read with a fixed schema (streams can't infer)."""
    reader = spark.readStream.schema(changelog_schema(row_struct))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
