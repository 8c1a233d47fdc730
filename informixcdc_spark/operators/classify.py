"""Distributed multinomial Naive Bayes text classification.

The fastText-style quality/domain classifier of a training-data
pipeline (CCNet / GPT-3 / Llama corpus prep all gate documents with a
lightweight linear text classifier trained on weak labels): training is
pure aggregation — ONE token-explode groupBy for the (term, label)
count table, model-sized re-aggregates for label totals — and scoring
is one broadcast join of the (vocab-sized) model against the corpus
token stream plus one per-document aggregate. Nothing corpus-sized ever
shuffles twice, and there is no Python in the loop: train and score are
both whole-stage-codegen column expressions.

Determinism: per-(doc, term, label) log-likelihood contributions are
pinned double expressions rounded to DECIMAL(18,6) and summed exactly
(the order-insensitive decimal-sum pattern from
``functions/numeric.py``); the log-prior is rounded to the same quantum
and the argmax compares the DECIMAL scores — so a SQL oracle reproduces
scores AND predictions bit-for-bit.

Reference anchor: the reference engine (aford4074/informixcdc) has no
classification surface — extension charter, same as
``operators/textstats.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.catalog import rebalance
from informixcdc_spark.functions.text import tokens


@dataclass(frozen=True)
class NBModel:
    """Trained multinomial NB model.

    ``term_table`` is vocab-sized: one row per term with a ``c_<i>``
    count column per label (broadcastable). ``labels`` fixes the class
    order (ties in scoring break toward the EARLIEST label);
    ``n_docs`` / ``n_tokens`` align with it. ``vocab`` is |V| for
    Laplace smoothing.
    """

    term_table: DataFrame
    labels: tuple[str, ...]
    n_docs: tuple[int, ...]
    n_tokens: tuple[int, ...]
    vocab: int


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str,
    labels: list[str] | None = None,
) -> NBModel:
    """Train multinomial NB with Laplace smoothing.

    One corpus pass: explode tokens, groupBy (term, label) with a
    map-side-combined count. Everything downstream of that aggregate is
    model-sized (label totals, document priors, |V|), so the collects
    here are metadata-sized — the same contract as the k-means codebook
    trainers in ``operators/similarity.py``. Pass ``labels`` when the
    class set is known (skips one distinct scan and PINS the tie-break
    order); otherwise distinct labels are collected sorted.

    Cache lifetime: the returned model's term table stays persisted
    (it is the model — every ``nb_score`` call broadcasts it), holding
    VOCAB-sized cache blocks, not corpus-sized; repeated training on
    the same input reuses one plan-keyed entry.
    """
    toked = rebalance(docs).select(
        F.col(label_col).alias("_y"), tokens(F.col(text_col)).alias("_tok")
    )
    if labels is None:
        labels = [
            r[0] for r in toked.select("_y").distinct().orderBy("_y").collect()
        ]
    labels = list(labels)
    pairs = toked.select("_y", F.explode("_tok").alias("_t"))
    tc = (
        pairs.groupBy("_t")
        .agg(
            *[
                F.sum(F.when(F.col("_y") == lg, 1).otherwise(0)).alias(f"c_{i}")
                for i, lg in enumerate(labels)
            ]
        )
        .persist()
    )
    tot = tc.agg(
        F.count(F.lit(1)).alias("_v"),
        *[F.sum(f"c_{i}").alias(f"n_{i}") for i in range(len(labels))],
    ).collect()[0]
    dc = {
        r["_y"]: r["n"]
        for r in toked.groupBy("_y").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # A label present in the data but absent from an explicit `labels`
    # list would contribute 0 to every c_<i> column while still
    # inflating the vocab and n_tokens denominators — silently skewed
    # scores. The per-label doc counts are collected anyway, so the
    # check is free; fail loudly instead.
    unlisted = sorted(str(y) for y in dc if y not in set(labels))
    if unlisted:
        raise ValueError(
            f"labels {unlisted} appear in {label_col!r} but not in the "
            "provided labels list; list every observed class (or filter "
            "the unlisted rows out before training)"
        )
    return NBModel(
        term_table=tc,
        labels=tuple(labels),
        n_docs=tuple(int(dc.get(lg, 0)) for lg in labels),
        n_tokens=tuple(int(tot[f"n_{i}"] or 0) for i in range(len(labels))),
        vocab=int(tot["_v"]),
    )


def _log_prior6(model: NBModel, i: int):
    """Label i's log-prior as a DECIMAL(18,6) column expression — both
    the division and the log evaluate engine-side from integer
    literals, so the oracle states the identical expression."""
    total = sum(model.n_docs)
    return F.log(
        F.lit(model.n_docs[i]).cast("double") / F.lit(total)
    ).cast("decimal(18,6)")


def nb_score(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: ``(id, score_<label>... , nb_pred)``.

    The corpus token stream left-joins the BROADCAST term table (unseen
    terms smooth to count 0), each label's per-term log-likelihood
    rounds to DECIMAL(18,6), and the per-doc sums shuffle once on the
    doc id. Prediction is the argmax of (prior + likelihood) DECIMAL
    scores with ties breaking toward the earliest label in
    ``model.labels``; token-free documents score on priors alone.
    """
    k = len(model.labels)
    toked = rebalance(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    joined = toked.join(F.broadcast(model.term_table), "_t", "left")
    contribs = [
        F.log(
            (F.coalesce(F.col(f"c_{i}"), F.lit(0)) + F.lit(1)).cast("double")
            / F.lit(model.n_tokens[i] + model.vocab)
        ).cast("decimal(18,6)")
        for i in range(k)
    ]
    sums = joined.groupBy(id_col).agg(
        *[F.sum(contribs[i]).alias(f"_s{i}") for i in range(k)]
    )
    base = docs.select(F.col(id_col))
    scored = base.join(sums, id_col, "left")
    score_cols = [
        (
            _log_prior6(model, i)
            + F.coalesce(F.col(f"_s{i}"), F.lit(0).cast("decimal(18,6)"))
        ).alias(f"_sc{i}")
        for i in range(k)
    ]
    scored = scored.select(id_col, *score_cols)
    best = F.greatest(*[F.col(f"_sc{i}") for i in range(k)])
    pred = None
    for i in reversed(range(k)):
        cond = F.col(f"_sc{i}") == best
        lg = model.labels[i]
        pred = F.when(cond, lg) if pred is None else F.when(cond, lg).otherwise(pred)
    return scored.select(
        id_col,
        *[
            F.col(f"_sc{i}").cast("double").alias(f"nb_score_{lg}")
            for i, lg in enumerate(model.labels)
        ],
        pred.alias("nb_pred"),
    )


def nb_gate(
    docs: DataFrame,
    model: NBModel,
    keep_labels: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality GATE: keep only the documents the (pre-trained) NB model
    predicts into ``keep_labels`` — every input column passes through,
    plus ``nb_pred``.

    This is the shape a production pipeline runs CONTINUOUSLY: the
    model is a static vocab-sized table that broadcasts, and scoring a
    slice of documents touches only that slice. For streams, call this
    inside ``foreachBatch`` (each micro-batch carries whole documents,
    so the per-doc score aggregate is complete within the batch) — see
    tests/test_streaming.py::test_nb_quality_gate_composes_with_streams
    for the sink ≡ batch pin.
    """
    unknown = [lg for lg in keep_labels if lg not in model.labels]
    if unknown:
        raise ValueError(f"keep_labels {unknown} not in model labels {model.labels}")
    scored = nb_score(docs, model, id_col, text_col).select(id_col, "nb_pred")
    return docs.join(scored, id_col).where(
        F.col("nb_pred").isin(list(keep_labels))
    )


def nb_train_score(
    docs: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str = "doc_id",
    labels: list[str] | None = None,
) -> DataFrame:
    """End-to-end: train on ``docs``'s labels, score the same corpus —
    the weak-label self-training shape (train on heuristic verdicts,
    let the statistical model generalize past them)."""
    model = nb_train(docs, label_col, text_col, labels=labels)
    return nb_score(docs, model, id_col, text_col)
