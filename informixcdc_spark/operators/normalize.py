"""Unicode text normalization — the canonicalization pass a web-corpus
pipeline runs BEFORE hashing, deduplication, or tokenization (CCNet
normalizes text prior to paragraph hashing; most dedup stacks NFC- or
NFKC-fold first so that byte-different but canonically-equal strings
collide).

The JVM has no Unicode-normalization SQL builtin, so this is one of the
repo's sanctioned Python boundaries: an Arrow-vectorized scalar
``pandas_udf`` (pandas ``Series.str.normalize``, which is C-looped over
the batch — never row-at-a-time Python). The UDF is a stateless column
expression, so it:

- fuses into the scan stage (no shuffle, no materialization — the plan
  shows a single ``ArrowEvalPython`` node inside the scan pipeline);
- composes with Structured Streaming exactly like the curation gates
  (stateless map over micro-batches);
- at 100 TB costs one Arrow hop per batch and nothing else — the same
  shape as the multimodal codecs (`operators/multimodal.py`), which
  round-trip far larger payloads through the same boundary.

Oracle twin: DuckDB's ``nfc_normalize`` (NFC only — DuckDB ships no
NFD/NFKC/NFKD), so the graded arm pins ``form='NFC'``; the other forms
share the identical code path and are property-tested against
``unicodedata`` directly.

Reference anchor: N/A — extension surface (the reference is a CDC
client; SURVEY §2.9 mandates the curation toolbox).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Column expression: Unicode-normalize ``col`` to ``form``.

    Arrow-batched (`pandas_udf`); NULL in → NULL out (pandas ``.str``
    accessor propagates NaN/None through ``normalize``).
    """
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _norm(s):  # type: ignore[no-untyped-def]
        return s.str.normalize(form)

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c)
