"""Corpus-trained n-gram language-model scoring (perplexity filtering).

The quality gate CCNet popularized: train a language model on a clean
corpus, score candidate documents by cross-entropy, drop the outliers.
A 100 TB pipeline wants the distributed formulation: model training is
two aggregations over exploded bigrams, scoring is one join of the
candidate corpus's bigrams against the (model-sized) probability table
plus a per-document decimal-exact sum — no UDFs, no driver-side
anything beyond the vocabulary-size scalar.

The model here is a Laplace-smoothed bigram LM:

    P(w2 | w1) = (c(w1 w2) + 1) / (ctx(w1) + V)

with ``c`` the bigram count, ``ctx(w1)`` the count of bigrams starting
at ``w1`` and ``V`` the corpus vocabulary size — additive smoothing
keeps every probability positive and the whole computation
deterministic (no backoff weights to tune), so a SQL oracle reproduces
cross-entropies bit-for-bit: per-bigram log-probs are pinned-order
double expressions rounded to DECIMAL(18,6) and summed exactly
(``functions/numeric.py`` pattern) before the final per-document
normalization.

Bigram keys are the space-joined token pair (tokens are whitespace
split, so the key is injective) — one string equi-join key instead of
a two-column join.

Reference anchor: no text surface in the reference engine
(aford4074/informixcdc); extension charter (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.text import tokens


def bigram_keys(tok: Column) -> Column:
    """Array of space-joined bigram keys from a token array (empty for
    docs with fewer than two tokens)."""
    idx = F.sequence(F.lit(0), F.size(tok) - F.lit(2))
    pairs = F.transform(
        idx, lambda i: F.concat_ws(" ", F.get(tok, i), F.get(tok, i + 1))
    )
    # sequence(0, -1) would run BACKWARDS ([0, -1]) for one-token docs —
    # guard to NULL, which explodes to zero rows
    return F.when(F.size(tok) >= 2, pairs)


def bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    release_tokens: bool = True,
) -> tuple[DataFrame, DataFrame, int]:
    """Train: ``(bigram_counts (bg, c), context_counts (w1, ctx), V)``.

    Two partially aggregated groupBys over one exploded pass (the
    context counts re-aggregate the bigram counts — vocab-sized input,
    not corpus-sized) plus one scalar distinct-count for ``V``. The
    token pass is persisted so counts, context counts and the vocabulary
    size all reuse ONE tokenization.

    With ``release_tokens`` (default) the returned model tables are
    materialized (persisted + forced — both vocab-sized) and the
    corpus-sized token cache is dropped before returning: repeated
    training calls in one session then hold only model-sized cache
    blocks, the right trade at 100 TB where caching the tokenized
    corpus is infeasible anyway. Cost: scoring the TRAINING corpus
    later re-tokenizes it once. Pass ``False`` to keep the token cache
    live for that scoring pass — the caller then owns its lifetime
    (it is never unpersisted by this module).
    """
    toked = rebalance(docs).select(
        F.col(id_col).alias("_doc"), tokens(F.col(text_col)).alias("_tok")
    ).persist()
    bg = toked.select(F.explode(bigram_keys(F.col("_tok"))).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    ctx = (
        counts.select(
            F.split(F.col("bg"), " ").getItem(0).alias("w1"), "c"
        )
        .groupBy("w1")
        .agg(F.sum("c").alias("ctx"))
    )
    def _vocab() -> int:
        return toked.select(F.explode("_tok").alias("t")).agg(
            F.count_distinct("t")
        ).first()[0]

    if release_tokens:
        counts = counts.persist()
        ctx = ctx.persist()
        # the vocab scalar and the two model-table forces are
        # independent jobs over the same persisted token pass — run
        # them concurrently (guide §2.6), then drop the corpus-sized
        # cache; every count is deterministic either way
        from informixcdc_spark.session import overlap_jobs

        vocab, _, _ = overlap_jobs(_vocab, counts.count, ctx.count)
        toked.unpersist()
    else:
        vocab = _vocab()
    return counts, ctx, int(vocab)


def lm_log_prob(vocab: int) -> Column:
    """Per-bigram Laplace log-probability over ``c``/``ctx`` columns
    (nulls = unseen, smoothed to 0 counts). Association order pinned
    and mirrored verbatim by :func:`sql_lm_log_prob`."""
    c = F.coalesce(F.col("c"), F.lit(0))
    ctx = F.coalesce(F.col("ctx"), F.lit(0))
    return F.log((c + F.lit(1.0)) / (ctx + F.lit(vocab)))


def sql_lm_log_prob(vocab_expr: str) -> str:
    """ANSI-SQL rendering of :func:`lm_log_prob` for a DuckDB oracle."""
    return (
        f"ln((COALESCE(c, 0) + 1.0) / (COALESCE(ctx, 0) + {vocab_expr}))"
    )


def lm_cross_entropy(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, n_bigrams, lm_cross_entropy)`` per document: the mean
    negative log-probability of its bigrams under the trained model
    (NULL for documents with fewer than two tokens). The candidate
    corpus joins the model once on the bigram key and once on the
    context word; both model tables are model-sized, never
    corpus-sized."""
    # identical plan to bigram_lm's persisted token pass — Spark's
    # cache manager serves this subtree from that cache when scoring
    # the training corpus itself
    per_bg = (
        rebalance(docs)
        .select(
            F.col(id_col).alias("_doc"), tokens(F.col(text_col)).alias("_tok")
        )
        .select("_doc", F.explode(bigram_keys(F.col("_tok"))).alias("bg"))
        .join(bigram_counts, "bg", "left")
        .withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(context_counts, "w1", "left")
    )
    per_doc = per_bg.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(lm_log_prob(vocab).cast("decimal(18,6)")).alias("_lp"),
    )
    scored = per_doc.select(
        "_doc",
        "n_bigrams",
        (-F.col("_lp").cast("double") / F.col("n_bigrams")).alias(
            "lm_cross_entropy"
        ),
    )
    return (
        docs.select(F.col(id_col).alias("_doc"))
        .join(scored, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias(
                "n_bigrams"
            ),
            "lm_cross_entropy",
        )
    )


#: Jelinek-Mercer interpolation weights for the trigram model —
#: trigram/bigram/unigram. Fixed (not tuned) so the model stays
#: deterministic and oracle-reproducible; 0.6/0.3/0.1 is the textbook
#: "most mass on the longest context" shape.
LAMBDA3, LAMBDA2, LAMBDA1 = 0.6, 0.3, 0.1


def trigram_keys(tok: Column) -> Column:
    """Array of space-joined trigram keys (empty for docs with fewer
    than three tokens — same guard as :func:`bigram_keys`)."""
    idx = F.sequence(F.lit(0), F.size(tok) - F.lit(3))
    triples = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.get(tok, i), F.get(tok, i + 1), F.get(tok, i + 2)
        ),
    )
    return F.when(F.size(tok) >= 3, triples)


def trigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    release_tokens: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, int, int]:
    """Train the interpolated trigram model:
    ``(tri_counts (tg, c3), tri_ctx (w12, ctx3), bigram_counts (bg, c),
    context_counts (w1, ctx), uni_counts (w, c1), n_tokens, V)``.

    The trigram layer is two more partially aggregated groupBys over
    the SAME persisted token pass the bigram trainer uses (the
    trigram-context counts re-aggregate the trigram counts —
    model-sized input); the unigram table and the token total come off
    the same pass. Every table is model-sized; like the bigram
    trainer, nothing corpus-sized survives training.

    With ``release_tokens`` (default — :func:`bigram_lm`'s contract)
    the five model tables are materialized (persisted + forced, all
    model-sized) and the corpus-sized token cache is dropped before
    returning: every later scoring action then joins five CACHED
    model tables instead of re-running the training aggregates, and
    repeated trainings hold only model-sized cache blocks — the right
    trade at 100 TB, where caching the tokenized corpus is infeasible
    anyway. Cost: scoring the training corpus re-tokenizes it once per
    scoring pass. Pass ``False`` to keep the token cache live instead
    (the :func:`lm_score`/:func:`lm3_score` contract — the caller owns
    its lifetime).
    """
    toked = rebalance(docs).select(
        F.col(id_col).alias("_doc"), tokens(F.col(text_col)).alias("_tok")
    ).persist()
    tg = toked.select(F.explode(trigram_keys(F.col("_tok"))).alias("tg"))
    tri_counts = tg.groupBy("tg").agg(F.count(F.lit(1)).alias("c3"))
    tri_ctx = (
        tri_counts.select(
            F.concat_ws(
                " ",
                F.split(F.col("tg"), " ").getItem(0),
                F.split(F.col("tg"), " ").getItem(1),
            ).alias("w12"),
            "c3",
        )
        .groupBy("w12")
        .agg(F.sum("c3").alias("ctx3"))
    )
    bg = toked.select(F.explode(bigram_keys(F.col("_tok"))).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    ctx = (
        counts.select(F.split(F.col("bg"), " ").getItem(0).alias("w1"), "c")
        .groupBy("w1")
        .agg(F.sum("c").alias("ctx"))
    )
    uni = toked.select(F.explode("_tok").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c1")
    )
    if release_tokens:
        tables = [tri_counts, tri_ctx, counts, ctx, uni]
        for t in tables:
            t.persist()
        # forcing uni via the totals action is not enough — force the
        # other four too, THEN drop the corpus-sized token cache. The
        # five forcing actions are independent jobs over the same
        # persisted token pass: run them concurrently (guide §2.6)
        # instead of serially paying five job latencies; the collected
        # totals and every cached count are deterministic either way
        from informixcdc_spark.session import overlap_jobs

        totals = overlap_jobs(
            lambda: uni.agg(
                F.sum("c1").alias("_n"), F.count(F.lit(1)).alias("_v")
            ).first(),
            *[t.count for t in tables[:-1]],
        )[0]
        toked.unpersist()
    else:
        totals = uni.agg(
            F.sum("c1").alias("_n"), F.count(F.lit(1)).alias("_v")
        ).first()
    return tri_counts, tri_ctx, counts, ctx, uni, int(totals["_n"]), int(
        totals["_v"]
    )


def lm3_log_prob(n_tokens: int, vocab: int) -> Column:
    """Per-trigram interpolated log-probability over
    ``c3/ctx3/c/ctx/c1`` columns (nulls = unseen):
    ``ln(λ3·P3(w3|w1w2) + λ2·P2(w3|w2) + λ1·P1(w3))`` with each term
    Laplace-smoothed. Operation order pinned (each P is one int-ratio
    division; weighted terms summed left to right) and mirrored
    verbatim by :func:`sql_lm3_log_prob` so any engine reproduces the
    doubles bit-for-bit."""
    def _p(c: Column, d: Column) -> Column:
        return (F.coalesce(c, F.lit(0)) + F.lit(1.0)) / (d + F.lit(vocab))

    p3 = _p(F.col("c3"), F.coalesce(F.col("ctx3"), F.lit(0)))
    p2 = _p(F.col("c"), F.coalesce(F.col("ctx"), F.lit(0)))
    p1 = _p(F.col("c1"), F.lit(n_tokens))
    return F.log(
        F.lit(LAMBDA3) * p3 + F.lit(LAMBDA2) * p2 + F.lit(LAMBDA1) * p1
    )


def sql_lm3_log_prob(n_expr: str, vocab_expr: str) -> str:
    """ANSI-SQL rendering of :func:`lm3_log_prob` for a DuckDB oracle."""
    return (
        f"ln({LAMBDA3}::DOUBLE * ((COALESCE(c3, 0) + 1.0)"
        f" / (COALESCE(ctx3, 0) + {vocab_expr}))"
        f" + {LAMBDA2}::DOUBLE * ((COALESCE(c, 0) + 1.0)"
        f" / (COALESCE(ctx, 0) + {vocab_expr}))"
        f" + {LAMBDA1}::DOUBLE * ((COALESCE(c1, 0) + 1.0)"
        f" / ({n_expr} + {vocab_expr})))"
    )


def lm3_cross_entropy(
    docs: DataFrame,
    model: tuple,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, n_trigrams, lm3_cross_entropy)`` per document under a
    :func:`trigram_lm` model (NULL entropy for documents with fewer
    than three tokens). The candidate corpus joins five MODEL-sized
    tables — trigram counts (trigram key), trigram contexts (leading
    word pair), bigram counts (trailing word pair), bigram contexts
    (middle word), unigram counts (final word) — all broadcastable
    while they fit, with the per-document decimal sum as the only
    corpus-keyed aggregation."""
    tri_counts, tri_ctx, counts, ctx, uni, n_tokens, vocab = model
    s = F.split(F.col("tg"), " ")
    per_tg = (
        rebalance(docs)
        .select(
            F.col(id_col).alias("_doc"), tokens(F.col(text_col)).alias("_tok")
        )
        .select("_doc", F.explode(trigram_keys(F.col("_tok"))).alias("tg"))
        .join(tri_counts, "tg", "left")
        .withColumn("w12", F.concat_ws(" ", s.getItem(0), s.getItem(1)))
        .join(tri_ctx, "w12", "left")
        .withColumn("bg", F.concat_ws(" ", s.getItem(1), s.getItem(2)))
        .join(counts, "bg", "left")
        .withColumn("w1", s.getItem(1))
        .join(ctx, "w1", "left")
        .withColumn("w", s.getItem(2))
        .join(uni, "w", "left")
    )
    per_doc = per_tg.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum(
            lm3_log_prob(n_tokens, vocab).cast("decimal(18,6)")
        ).alias("_lp"),
    )
    scored = per_doc.select(
        "_doc",
        "n_trigrams",
        (-F.col("_lp").cast("double") / F.col("n_trigrams")).alias(
            "lm3_cross_entropy"
        ),
    )
    return (
        docs.select(F.col(id_col).alias("_doc"))
        .join(scored, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("int").alias(
                "n_trigrams"
            ),
            "lm3_cross_entropy",
        )
    )


def lm3_score(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end interpolated-trigram scoring: train on ``train``,
    cross-entropy score every document of ``score``. Same token-cache
    contract as :func:`lm_score` (token cache kept live for the
    plan-identical scoring subtree)."""
    model = trigram_lm(train, id_col, text_col, release_tokens=False)
    return lm3_cross_entropy(score, model, id_col, text_col)


def lm_score(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end: train the bigram LM on ``train``, cross-entropy
    score every document of ``score``.

    Keeps the trainer's token cache live (``release_tokens=False``):
    when ``score`` IS the training corpus the scorer's tokenization
    subtree is plan-identical and served from that cache — one corpus
    tokenization for the whole train+score pass. The cache is
    plan-keyed (Spark's CacheManager dedups identical plans, so
    repeated calls on the same input reuse one entry, they don't
    accumulate); it lives until the session drops it — call
    :func:`bigram_lm` directly with ``release_tokens=True`` when
    training many DIFFERENT corpora in one session."""
    counts, ctx, vocab = bigram_lm(train, id_col, text_col, release_tokens=False)
    return lm_cross_entropy(score, counts, ctx, vocab, id_col, text_col)


def ppl_thresholds(
    sample: DataFrame,
    ce_col: str = "lm_cross_entropy",
    max_sample: int | None = 1_000_000,
) -> tuple[float, float] | None:
    """The (t1, t2) tercile cutoffs :func:`bucket_by_perplexity`
    derives from a scored sample — exposed so a STREAMING gate can
    compute them once offline and pass them as literals into every
    micro-batch instead of re-running the sample job per batch. None
    when the sample has no scored rows.

    The sample's scores collapse to ONE sorted array on a single task,
    so the sample must be bounded by construction (a fixed-count or
    corpus-size-scaled predicate — thousands of documents, never a
    constant fraction of the corpus). ``max_sample`` is the fail-loud
    backstop: if the collected sample exceeds it, raise instead of
    silently handing a multi-GB array to one task next time the corpus
    doubles. The check is post-hoc (same single job — a pre-count would
    re-run the scoring pass), so it catches the mis-sized-predicate
    case, not a sample so large the collect itself cannot complete;
    pass ``None`` to disable."""
    ce = F.col(ce_col)
    arr = F.array_sort(F.collect_list(ce_col))
    row = (
        sample.where(ce.isNotNull())
        .agg(arr.alias("_a"))
        .select(
            F.size("_a").alias("_n"),
            F.when(
                F.size("_a") > 0,
                F.element_at("_a", F.ceil(F.size("_a") / 3).cast("int")),
            ).alias("_t1"),
            F.when(
                F.size("_a") > 0,
                F.element_at("_a", F.ceil(F.size("_a") * 2 / 3).cast("int")),
            ).alias("_t2"),
        )
        .first()
    )
    if row is None or row["_t1"] is None:
        return None
    if max_sample is not None and row["_n"] > max_sample:
        raise ValueError(
            f"ppl_thresholds sample has {row['_n']} scored rows "
            f"(> max_sample={max_sample}): the tercile sort runs on ONE "
            "task, so the sample predicate must bound it independently "
            "of corpus size — tighten the predicate or raise max_sample"
        )
    return float(row["_t1"]), float(row["_t2"])


def bucket_by_perplexity(
    scored: DataFrame,
    sample: DataFrame | None = None,
    ce_col: str = "lm_cross_entropy",
    out_col: str = "ppl_bucket",
    thresholds: tuple[float, float] | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §4.3): split the corpus at the terciles of the LM
    cross-entropy distribution — 'head' is the most-fluent third the
    pipeline keeps outright, 'tail' the third it drops or down-weights.

    ``scored`` is the per-document output of :func:`lm_cross_entropy`
    (or :func:`lm3_cross_entropy`); ``sample`` — defaulting to
    ``scored`` itself — is the (usually much smaller) scored subset the
    thresholds are estimated from, mirroring CCNet's practice of fitting
    the cutoffs on a held-out slice rather than the whole crawl. The
    default is only safe on small corpora: :func:`ppl_thresholds` sorts
    the whole sample on one task and fails loudly past its
    ``max_sample`` backstop, so at scale ALWAYS pass a bounded
    ``sample`` (or precomputed ``thresholds``).

    Thresholds are exact ORDER STATISTICS of the sample (elements
    ceil(n/3) and ceil(2n/3) of the sorted values), not interpolated
    percentiles — both this and the DuckDB twin pick the same array
    element, so the graded arm never depends on engines agreeing about
    interpolation arithmetic. Documents with a NULL score (< 2 tokens)
    get a NULL bucket.

    Scale shape: the sample's scores collapse to ONE sorted array on
    one task — bounded by the sample predicate the caller chose, the
    same boundary as the k-means / PQ codebook training samples
    (operators/quantization.py). The two thresholds are then COLLECTED
    (two doubles — the module's metadata-sized-action convention, like
    the quantizers' codebooks) and inlined as plan-time literals, so
    the bucketing pass adds ZERO plan growth to the scoring pass — a
    pure row-local CASE that fuses wherever the scores were going
    anyway: at 100 TB you sample thousands of documents, not billions.

    Pass precomputed ``thresholds`` (from :func:`ppl_thresholds`) to
    skip the sample job entirely — the streaming-gate calling
    convention, where cutoffs are fitted once offline and every
    micro-batch applies them as literals.
    """
    ce = F.col(ce_col)
    if thresholds is None:
        thresholds = ppl_thresholds(
            scored if sample is None else sample, ce_col
        )
    if thresholds is None:
        return scored.withColumn(out_col, F.lit(None).cast("string"))
    t1, t2 = thresholds
    bucket = (
        F.when(ce.isNull(), F.lit(None).cast("string"))
        .when(ce <= F.lit(float(t1)), "head")
        .when(ce <= F.lit(float(t2)), "middle")
        .otherwise("tail")
    )
    return scored.withColumn(out_col, bucket)
