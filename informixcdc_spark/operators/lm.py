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
    vocab = (
        toked.select(F.explode("_tok").alias("t")).agg(
            F.count_distinct("t")
        ).first()[0]
    )
    if release_tokens:
        counts = counts.persist()
        ctx = ctx.persist()
        counts.count()
        ctx.count()
        toked.unpersist()
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
