"""Sources/sinks: change-log directories for batch and streaming reads."""

from informixcdc_spark.sources.changelog import (
    read_changelog,
    read_changelog_stream,
    write_changelog,
)

__all__ = ["read_changelog", "read_changelog_stream", "write_changelog"]
